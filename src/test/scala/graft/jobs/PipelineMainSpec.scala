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
      assert(statuses.keySet == Set("zoopla_listings", "dexters_listings",
        "air_quality", "flagship_avg_price", "air_quality_by_station"))
      assert(statuses.values.forall(s => s.ok && s.rows.exists(_ > 0)), statuses)
      assert(statuses.values.forall(_.attempts === 1), statuses)
      // every stage staged real parquet
      assert(new File(out, "flagship_avg_price").exists())
      // listener delivery is async — poll until the groups landed
      val want = Set("zoopla_listings", "dexters_listings", "air_quality",
        "warehouse_load")
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
}
