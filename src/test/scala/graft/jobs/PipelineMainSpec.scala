package graft.jobs

import java.io.File

import scala.jdk.CollectionConverters._

import graft.SparkSpec
import org.apache.commons.io.FileUtils
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** The DAG entry point: three scrape branches must run as three NAMED
  * concurrent job groups (the reference's parallel Airflow tasks,
  * pipeline.py:1142-1144), then the warehouse fan-in runs over the staged
  * parquet. */
class PipelineMainSpec extends SparkSpec {

  test("three branches run as their own job groups; fan-in loads the marts") {
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        Option(js.properties.getProperty("spark.jobGroup.id")).foreach(seen.add)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val out = "/root/repo/target/tmp/spec_pipeline"
      FileUtils.deleteQuietly(new File(out))
      val statuses = PipelineMain.run(spark, out)
      val gateNames = Set("gate_zoopla_volume", "gate_dexters_volume", "gate_air_volume")
      assert(statuses.keySet == Set("zoopla_listings", "dexters_listings",
        "air_quality", "flagship_avg_price", "air_quality_by_station") ++ gateNames)
      assert(statuses.values.forall(_.ok), statuses)
      // staging + mart stages carry row counts; gates are pass/trip only
      assert(statuses.filterNot(k => gateNames(k._1))
        .values.forall(s => s.rows.exists(_ > 0) && s.attempts === 1), statuses)
      // every stage staged real parquet
      assert(new File(out, "flagship_avg_price").exists())
      // listener delivery is async — poll until the groups landed
      val want = Set("zoopla_listings", "dexters_listings", "air_quality",
        "quality_gates", "warehouse_load")
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (!want.subsetOf(seen.asScala.toSet) && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(want.subsetOf(seen.asScala.toSet),
        s"job groups seen: ${seen.asScala.toSet}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("a poisoned branch retries once, the others land, the report names it") {
    import spark.implicits._
    val out = "/root/repo/target/tmp/spec_pipeline_poison"
    FileUtils.deleteQuietly(new File(out))
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val statuses = PipelineMain.runWith(spark, out,
      branches = Seq(
        ("good_a", () => Seq((1L, "a")).toDF("id", "v")),
        ("good_b", () => Seq((2L, "b")).toDF("id", "v")),
        ("poisoned", () => {
          attempts.incrementAndGet()
          sys.error("scrape target unreachable")
        })),
      marts = Seq(
        // reads only the healthy branches' staged parquet
        ("mart_union", () => spark.read.parquet(s"$out/good_a")
          .unionByName(spark.read.parquet(s"$out/good_b"))),
        // depends on the poisoned branch: fails, but is REPORTED
        ("mart_poisoned", () => spark.read.parquet(s"$out/poisoned"))))
    // the failure did not abort the DAG: both healthy sinks landed
    assert(new File(out, "good_a").exists() && new File(out, "good_b").exists())
    assert(statuses("good_a").ok && statuses("good_b").ok)
    assert(statuses("mart_union").rows.contains(2L), statuses("mart_union"))
    // the poisoned branch got its one retry (Airflow retries=1) ...
    assert(attempts.get() === 2, s"expected 2 attempts, got ${attempts.get()}")
    val p = statuses("poisoned")
    assert(!p.ok && p.attempts === 2 && p.rows.isEmpty)
    // ... and the report names the failure
    assert(p.error.exists(_.contains("scrape target unreachable")), p)
    assert(!statuses("mart_poisoned").ok)
  }

  test("a tripped drift gate reports and SKIPS the marts; bad data never loads") {
    import spark.implicits._
    import graft.operators.Profiling
    val out = "/root/repo/target/tmp/spec_pipeline_gate"
    FileUtils.deleteQuietly(new File(out))
    val reference = (1 to 100).map(i => ("m", (i % 10).toLong)).toDF("g", "v")
    val statuses = PipelineMain.runWith(spark, out,
      branches = Seq(
        // a drifted batch: every value piles on 9 where the reference is uniform
        ("ingest", () => Seq.fill(50)(("m", 9L)).toDF("g", "v"))),
      gates = Seq(
        ("gate_drift", () => {
          val tv = Profiling.histogramDrift(reference,
              spark.read.parquet(s"$out/ingest"), "g", "v", buckets = 10)
            .head().getAs[Long]("tv_q")
          if (tv <= 200000L) None else Some(s"drift tv_q=$tv over 200000")
        })),
      marts = Seq(
        ("mart", () => spark.read.parquet(s"$out/ingest"))))
    assert(statuses("ingest").ok)                         // staging itself landed
    val g = statuses("gate_drift")
    assert(!g.ok && g.error.exists(_.contains("drift tv_q=")), g)
    val m = statuses("mart")
    assert(!m.ok && m.attempts === 0, m)                  // skipped, not attempted
    assert(m.error.exists(_.contains("gate_drift")), m)
    assert(!new File(out, "mart").exists())               // nothing reached the mart
    // same DAG with an in-distribution batch passes the gate and loads
    FileUtils.deleteQuietly(new File(out))
    val ok = PipelineMain.runWith(spark, out,
      branches = Seq(("ingest", () => reference)),
      gates = Seq(
        ("gate_drift", () => {
          val tv = Profiling.histogramDrift(reference,
              spark.read.parquet(s"$out/ingest"), "g", "v", buckets = 10)
            .head().getAs[Long]("tv_q")
          if (tv <= 200000L) None else Some(s"drift tv_q=$tv over 200000")
        })),
      marts = Seq(("mart", () => spark.read.parquet(s"$out/ingest"))))
    assert(ok.values.forall(_.ok), ok)
    assert(ok("mart").rows.contains(100L))
  }
}
