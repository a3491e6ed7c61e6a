package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** transformWithState (Spark 4 arbitrary-state API) behavior pins:
  * stream == batch on one shot, and batch-split invariance across
  * maxFilesPerTrigger=1 micro-batches — the profile counters are
  * integer-exact so equality is literal, not approximate. */
class TwsStreamingSpec extends SparkSpec {
  import spark.implicits._

  private def asTuples(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getString(4), r.getLong(5))).toSet

  private def batchExpected = {
    val per = Tables.events(spark, sfDir)
      .groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("c"),
        sum(floor($"value" * 100).cast("long")).as("vc"))
    val agg = per.groupBy("user_id")
      .agg(sum("c").cast("long").as("n_events"),
        sum("vc").cast("long").as("value_cents"),
        count(lit(1)).as("n_types"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy($"c".desc, $"event_type")
    val top = per.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"user_id".as("u"), $"event_type".as("top_type"),
        $"c".as("top_cnt"))
    agg.join(top, agg("user_id") === top("u"))
      .select("user_id", "n_events", "value_cents", "n_types",
        "top_type", "top_cnt")
  }

  test("transformWithState profile equals the batch replay") {
    val streamed = asTuples(TwsStreaming.userProfiles(spark, sfDir))
    val batch = asTuples(batchExpected)
    assert(streamed === batch)
  }

  test("warm start: batch-seeded state equals streaming all of history") {
    val warm = asTuples(TwsStreaming.userProfilesWarmStart(spark, sfDir))
    val full = asTuples(TwsStreaming.userProfiles(spark, sfDir))
    val active = Tables.events(spark, sfDir)
      .filter($"ts" >= to_timestamp(lit("2024-01-15")))
      .select("user_id").distinct().as[Long].collect().toSet
    assert(warm === full.filter(t => active(t._1)),
      "bootstrapped profiles must equal the full-history stream for " +
        "every stream-active user")
    // the split is real: both halves of the cut carry events
    val nHist = Tables.events(spark, sfDir)
      .filter($"ts" < to_timestamp(lit("2024-01-15"))).count()
    val nStream = Tables.events(spark, sfDir)
      .filter($"ts" >= to_timestamp(lit("2024-01-15"))).count()
    assert(warm.nonEmpty && nHist > 0 && nStream > 0)
  }

  test("timer-closed sessions equal the batch gaps-and-islands rollup") {
    val streamed = TwsStreaming.timedSessions(spark, sfDir, gapMinutes = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_sec")
    val e = Tables.events(spark, sfDir)
      .select($"user_id", $"ts".cast("long").as("ts_sec"))
    val batch = e
      .withColumn("prev", lag("ts_sec", 1).over(w))
      .withColumn("ns", when($"prev".isNull || $"ts_sec" - $"prev" > 1800, 1)
        .otherwise(0))
      .withColumn("sid", sum("ns").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sid")
      .agg(min("ts_sec").as("start_sec"), max("ts_sec").as("end_sec"),
        count(lit(1)).as("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(streamed === batch,
      "timer-emitted sessions must include EVERY session, tails included")
  }

  test("profiles are batch-split invariant (maxFilesPerTrigger=1, 3 batches)") {
    val dir = new java.io.File("/root/repo/target/tmp/stream/tws_multibatch")
    org.apache.commons.io.FileUtils.deleteDirectory(dir)
    dir.mkdirs()
    val flat = new java.io.File(dir, "flat"); flat.mkdirs()
    val events = Tables.events(spark, sfDir).orderBy("ts").collect()
    val third = events.length / 3
    def epochNanos(ts: Any): Long = ts match {
      case t: java.sql.Timestamp =>
        t.getTime / 1000 * 1000000000L + t.getNanos
      case l: java.time.LocalDateTime =>
        l.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L + l.getNano
    }
    Seq(events.take(third),
        events.slice(third, 2 * third),
        events.drop(2 * third)).zipWithIndex.foreach { case (chunk, i) =>
      val rows = chunk.map(r => (r.getLong(0), epochNanos(r.get(1)),
        r.getLong(2), r.getString(3), r.getDouble(4), r.getString(5)))
      rows.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/part_$i")
      val src = new java.io.File(s"$dir/part_$i").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(src.toPath,
        new java.io.File(flat, f"chunk_$i%02d.parquet").toPath)
      new java.io.File(flat, f"chunk_$i%02d.parquet").setLastModified(1000000L * (i + 1))
    }
    val multi = asTuples(TwsStreaming.userProfiles(spark, sfDir,
      inputDir = Some(flat.toString), maxFilesPerTrigger = Some(1)))
    val single = asTuples(TwsStreaming.userProfiles(spark, sfDir))
    assert(multi === single,
      "transformWithState profiles differ across batching")

    // timer sessionization across the same 3 time-ordered micro-batches:
    // sessions spanning a chunk boundary must merge through state, and
    // re-armed timers must supersede their predecessors
    def sess(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val multiSess = sess(TwsStreaming.timedSessions(spark, sfDir, 30,
      inputDir = Some(flat.toString), maxFilesPerTrigger = Some(1)))
    val singleSess = sess(TwsStreaming.timedSessions(spark, sfDir, 30))
    assert(multiSess === singleSess,
      "timer sessions differ across batching")
  }

  test("streaming HLL equals the batch sketch bit-for-bit, any batching") {
    def ests(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val single = ests(TwsStreaming.typeDistinctUsers(spark, sfDir))
    // two time-ordered chunks forced through as separate micro-batches:
    // register state must carry across, and max-merge must make the
    // result batching-invariant
    val dir = new java.io.File("/root/repo/target/tmp/stream/hll_multibatch")
    org.apache.commons.io.FileUtils.deleteDirectory(dir)
    val flat = new java.io.File(dir, "flat"); flat.mkdirs()
    val ev = Tables.events(spark, sfDir)
      .select("event_type", "user_id").collect()
    val half = ev.length / 2
    Seq(ev.take(half), ev.drop(half)).zipWithIndex.foreach { case (chunk, i) =>
      chunk.map(r => (0L, 1700000000000000000L + i, r.getLong(1),
          r.getString(0), 0.0, "{}")).toSeq
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/part_$i")
      val src = new java.io.File(s"$dir/part_$i").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(src.toPath,
        new java.io.File(flat, f"chunk_$i%02d.parquet").toPath)
      new java.io.File(flat, f"chunk_$i%02d.parquet")
        .setLastModified(1000000L * (i + 1))
    }
    val multi = ests(TwsStreaming.typeDistinctUsers(spark, sfDir,
      inputDir = Some(flat.toString), maxFilesPerTrigger = Some(1)))
    assert(multi === single, "streaming HLL differs across batching")
    // and both equal the batch aggregator exactly (register-max merging)
    val hll = udaf(new graft.functions.HllAggregator(11))
    val batch = ests(Tables.events(spark, sfDir)
      .groupBy("event_type").agg(hll(col("user_id")).as("est")))
    assert(single === batch, "streaming HLL diverged from the batch sketch")
    // accuracy contract on the fixture
    val exact = ests(Tables.events(spark, sfDir).groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n")))
    exact.foreach { case (t, n) =>
      assert(math.abs(single(t) - n).toDouble / n < 0.05, s"$t estimate off")
    }
  }

  test("streaming cms top-k is batch-split invariant and needs no batch probe") {
    def top(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        .sortBy(_._1)
    // the same top-k out of 1, 4, and 7 forced micro-batch splits — the
    // candidate set and every estimate live in tws state, so any split
    // must yield the identical rows
    val one = top(TwsStreaming.cmsTopKTws(spark, sfDir, 10, nSplits = 1))
    val four = top(TwsStreaming.cmsTopKTws(spark, sfDir, 10, nSplits = 4))
    val seven = top(TwsStreaming.cmsTopKTws(spark, sfDir, 10, nSplits = 7))
    assert(one === four, "1-batch vs 4-batch top-k differ")
    assert(four === seven, "4-batch vs 7-batch top-k differ")
    // count-min estimates upper-bound the exact counts
    val exact = Tables.events(spark, sfDir).groupBy("user_id")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    four.foreach { case (_, u, est) =>
      assert(est >= exact(u), s"estimate below exact count for $u")
    }
    // the top estimate is sane: at least the true max count
    assert(four.head._3 >= exact.values.max)
    // EVICTION path: with candCap below per-bucket cardinality the
    // result is an approximation, but a DETERMINISTIC one — identical
    // across runs at the same split (the (est asc, id desc) evict order
    // has no ties left to chance), and still a heavy-hitter superset:
    // the true top-1 recurs often enough to survive every eviction
    val capA = top(TwsStreaming.cmsTopKTws(spark, sfDir, 10, candCap = 8))
    val capB = top(TwsStreaming.cmsTopKTws(spark, sfDir, 10, candCap = 8))
    assert(capA === capB, "eviction path must be deterministic per split")
    val trueTop = exact.maxBy { case (u, n) => (n, -u) }._1
    assert(capA.exists(_._2 == trueTop),
      "true top-1 must survive capped candidate eviction")
  }
}
