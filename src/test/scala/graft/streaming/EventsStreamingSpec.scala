package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class EventsStreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming hourly counts equal the batch rollup") {
    val streamed = EventsStreaming.hourlyCounts(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = Tables.events(spark, sfDir)
      .groupBy(date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:00").as("h"),
        $"event_type")
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed === batch)
  }

  test("streaming dedup drops duplicate event ids across batches") {
    // duplicate-bearing corpus: the same events parquet staged twice makes
    // every event_id arrive twice; dropDuplicates must collapse them
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Paths.get("/root/repo/target/tmp/stream/dup_case")
    Files.createDirectories(dir)
    val src = Paths.get(s"$sfDir/events.parquet")
    Files.copy(src, dir.resolve("events_a.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Files.copy(src, dir.resolve("events_b.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val name = s"dup_test_${System.nanoTime()}"
    val q = spark.readStream.schema(EventsStreaming.rawSchema).parquet(dir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")
      .groupBy().agg(count(lit(1)).as("cnt"))
      .writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val deduped = spark.table(name).head().getLong(0)
    assert(deduped === Tables.events(spark, sfDir).count())
  }
}
