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
      val counts = PipelineMain.run(spark, out)
      assert(counts.keySet == Set("zoopla_listings", "dexters_listings",
        "air_quality", "flagship_avg_price", "air_quality_by_station"))
      assert(counts.values.forall(_ > 0), counts)
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
}
