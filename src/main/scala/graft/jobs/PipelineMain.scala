package graft.jobs

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import graft.GraftSession
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's primary entry point re-expressed on Spark (SURVEY
  * §1.5/§3.1): pipeline.py:1142-1144 kicks off three independent
  * scrape→stage→load branches in parallel under Airflow; here each branch
  * is a named Spark JOB GROUP running on its own driver thread — the
  * scheduler interleaves their stages across the shared executors, the
  * Spark UI groups them exactly like the reference DAG's task boxes, and
  * `sc.cancelJobGroup(name)` can kill one branch without touching the
  * others (Airflow's per-task retry/kill semantics, driver-side).
  *
  * Fan-in (the reference's warehouse load + reporting views) follows once
  * every branch has staged: the flagship price aggregate and the
  * air-quality join read the staged parquet, not the scrape lineage —
  * the same stage→load cut pipeline.py makes at :842-844.
  */
object PipelineMain {

  /** Run the DAG: 3 concurrent named branches → barrier → 2 fan-in
    * aggregates. Returns output row counts by stage name. */
  def run(spark: SparkSession, outDir: String): Map[String, Long] = {
    val sc = spark.sparkContext
    val branches: Seq[(String, () => DataFrame)] = Seq(
      ("zoopla_listings", () => Jobs.zooplaListings(spark)),
      ("dexters_listings", () => Jobs.dextersListings(spark)),
      ("air_quality", () => Jobs.airQualityReadings(spark)))
    // one thread per branch: setJobGroup is THREAD-local, so each branch's
    // Spark jobs carry its own group id concurrently
    val pool = Executors.newFixedThreadPool(branches.size)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val staged =
      try Await.result(Future.sequence(branches.map { case (name, mk) =>
        Future {
          sc.setJobGroup(name, s"branch $name: scrape -> clean -> stage",
            interruptOnCancel = true)
          try {
            mk().write.mode("overwrite").parquet(s"$outDir/$name")
            name -> spark.read.parquet(s"$outDir/$name").count()
          } finally sc.clearJobGroup()
        }
      }), 30.minutes)
      finally pool.shutdown()
    // fan-in: aggregates over every branch's output, one job group
    sc.setJobGroup("warehouse_load", "fan-in: flagship + air-quality marts",
      interruptOnCancel = true)
    val marts =
      try Seq(
        "flagship_avg_price" -> Jobs.flagshipAvgPrice(spark),
        "air_quality_by_station" -> Jobs.airQualityByStation(spark)
      ).map { case (name, df) =>
        df.write.mode("overwrite").parquet(s"$outDir/$name")
        name -> spark.read.parquet(s"$outDir/$name").count()
      }
      finally sc.clearJobGroup()
    (staged ++ marts).toMap
  }

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("target/pipeline_out")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.create(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val counts = run(spark, outDir)
    counts.toSeq.sortBy(_._1).foreach { case (n, c) => println(s"$n: $c rows") }
    spark.stop()
  }
}
