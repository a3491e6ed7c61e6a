package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class EventsStreamingSpec extends SparkSpec {
  import spark.implicits._

  /** Exact epoch nanos from a collected ts value — the external type is
    * java.sql.Timestamp for LTZ columns (nanos-generation testdata) and
    * java.time.LocalDateTime for NTZ ones (micros generation, read under
    * the UTC session); full microsecond precision either way. */
  private def epochNanos(v: Any): Long = v match {
    case t: java.sql.Timestamp =>
      t.getTime / 1000 * 1000000000L + t.getNanos
    case ldt: java.time.LocalDateTime =>
      val ins = ldt.toInstant(java.time.ZoneOffset.UTC)
      ins.getEpochSecond * 1000000000L + ins.getNano
    case other => sys.error(s"unexpected ts external type: $other")
  }

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

  test("sessionization stays correct across multiple batches (maxFilesPerTrigger=1)") {
    // split events into 3 time-ordered files → AvailableNow processes them
    // as 3 micro-batches; both state operators must produce the same
    // result as the single-batch run (the operators' documented contract:
    // batch order follows event time)
    val dir = new java.io.File("/root/repo/target/tmp/stream/multibatch_case")
    org.apache.commons.io.FileUtils.deleteDirectory(dir)
    dir.mkdirs()
    val events = Tables.events(spark, sfDir).orderBy("ts").collect()
    val third = events.length / 3
    Seq(events.take(third),
        events.slice(third, 2 * third),
        events.drop(2 * third)).zipWithIndex.foreach { case (chunk, i) =>
      // re-create the raw long-ns shape the streaming schema expects,
      // at full microsecond precision (the CDC tie-break orders on µs)
      val rows = chunk.map(r => (r.getLong(0),
        epochNanos(r.get(1)),
        r.getLong(2), r.getString(3), r.getDouble(4), r.getString(5)))
      rows.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/part_$i")
    }
    // flatten the part dirs into sequential files so listing order = time order
    val flat = new java.io.File(dir, "flat"); flat.mkdirs()
    Seq(0, 1, 2).foreach { i =>
      val src = new java.io.File(s"$dir/part_$i").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(src.toPath,
        new java.io.File(flat, f"chunk_$i%02d.parquet").toPath)
      new java.io.File(flat, f"chunk_$i%02d.parquet").setLastModified(1000000L * (i + 1))
    }

    val multi = EventsStreaming.userSessions(spark, sfDir, 30,
        inputDir = Some(flat.toString), maxFilesPerTrigger = Some(1))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val single = EventsStreaming.userSessions(spark, sfDir, 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(multi === single, "mapGroupsWithState cumulative sessions differ across batching")

    val multiClosed = EventsStreaming.completedSessions(spark, sfDir, 30,
        inputDir = Some(flat.toString), maxFilesPerTrigger = Some(1))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val singleClosed = EventsStreaming.completedSessions(spark, sfDir, 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(multiClosed === singleClosed, "flatMapGroupsWithState closed sessions differ across batching")
  }

  test("CDC snapshot equals the batch last-event window under adverse batch order") {
    // REVERSE-time file split: the final micro-batch carries the EARLIEST
    // events — blind batch-arrival overwrite would roll the snapshot back;
    // latest-wins by (event time, event_id) must not
    val dir = new java.io.File("/root/repo/target/tmp/stream/cdc_reverse_case")
    org.apache.commons.io.FileUtils.deleteDirectory(dir)
    dir.mkdirs()
    val events = Tables.events(spark, sfDir).orderBy("ts").collect()
    val third = events.length / 3
    val flat = new java.io.File(dir, "flat"); flat.mkdirs()
    Seq(events.drop(2 * third),              // latest third FIRST
        events.slice(third, 2 * third),
        events.take(third)).zipWithIndex.foreach { case (chunk, i) =>
      val rows = chunk.map(r => (r.getLong(0),
        epochNanos(r.get(1)),
        r.getLong(2), r.getString(3), r.getDouble(4), r.getString(5)))
      rows.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/part_$i")
      val src = new java.io.File(s"$dir/part_$i").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(src.toPath,
        new java.io.File(flat, f"chunk_$i%02d.parquet").toPath)
      new java.io.File(flat, f"chunk_$i%02d.parquet").setLastModified(1000000L * (i + 1))
    }
    val multi = EventsStreaming.cdcUserSnapshot(spark, sfDir,
        maxFilesPerTrigger = Some(1), stagedDir = Some(flat.toString))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      .orderBy($"ts".desc, $"event_id".desc)
    val batch = Tables.events(spark, sfDir)
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"user_id", $"event_id", $"event_type", $"value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSet
    assert(multi === batch, "CDC snapshot diverged from the batch last-event window")
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
      .withColumn("ts", EventsStreaming.rawTs(EventsStreaming.tsDivisor(spark, dir.toString)))
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

  test("stateful aggregation runs on the RocksDB state store (production backend)") {
    // the default HDFSBackedStateStore keeps state on the JVM heap — at
    // 100 TB the store must be RocksDB (off-heap, incremental-checkpoint);
    // prove the engine's stateful ops are backend-clean by running the
    // hourly window on it and matching the batch rollup exactly
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val staged = {
      import java.nio.file.{Files, Paths, StandardCopyOption}
      val dir = Paths.get("/root/repo/target/tmp/stream/rocksdb_case")
      Files.createDirectories(dir)
      Files.copy(Paths.get(s"$sfDir/events.parquet"),
        dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
      dir.toString
    }
    val name = s"rocksdb_test_${System.nanoTime()}"
    val q = ss.readStream.schema(EventsStreaming.rawSchema).parquet(staged)
      .withColumn("ts", EventsStreaming.rawTs(EventsStreaming.tsDivisor(ss, staged)))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = ss.table(name)
      .select(col("window.start").as("h"), col("event_type"), col("cnt"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val want = Tables.events(spark, sfDir)
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == want)
  }

  test("watermarked dedup gives exact distinct counts across batches") {
    // the operator under test evicts state at the watermark; the planted
    // early-hour duplicate file is closed under the 1-hour bound, so the
    // result must still be EXACTLY the batch distinct counts
    val got = EventsStreaming.dedupWithinWatermarkCounts(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Tables.events(spark, sfDir)
      .groupBy("event_type").agg(countDistinct("event_id").as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("tsDivisor: nanos and micros vintages detected by value range") {
    val base = new java.io.File("/root/repo/target/tmp/stream/tsdiv_spec")
    org.apache.commons.io.FileUtils.deleteDirectory(base)
    val epochUs = 1704067200000000L // 2024-01-01 in µs
    // nanos vintage: plain INT64 column carrying ns
    Seq((1L, epochUs * 1000L, 1L, "a", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$base/ns")
    // micros vintage: a real timestamp column written as INT64
    // TIMESTAMP(MICROS) — Spark's write default is legacy INT96, which
    // no generation of the testdata uses, so pin the modern type
    val ssUs = spark.newSession()
    ssUs.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    locally {
      import ssUs.implicits._
      Seq((1L, new java.sql.Timestamp(epochUs / 1000), 1L, "a", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(s"$base/us")
    }
    assert(EventsStreaming.tsDivisor(spark, s"$base/ns") === 1000L)
    assert(EventsStreaming.tsDivisor(spark, s"$base/us") === 1L)
    // an unknown unit (e.g. a millis restage — below the µs range) must
    // fail loudly, not silently misconvert every timestamp
    Seq((1L, epochUs / 1000L, 1L, "a", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$base/ms")
    val exUnit = intercept[IllegalArgumentException] {
      EventsStreaming.tsDivisor(spark, s"$base/ms")
    }
    assert(exUnit.getMessage.contains("unrecognized ts unit"))
    // an all-null ts column must fail with a clear message, not NPE
    Seq((1L, null.asInstanceOf[java.lang.Long], 1L, "a", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$base/nullts")
    val exNull = intercept[IllegalArgumentException] {
      EventsStreaming.tsDivisor(spark, s"$base/nullts")
    }
    assert(exNull.getMessage.contains("no non-null ts"))
  }

  test("native session_window stream equals the batch rollup, single and multi batch") {
    import org.apache.spark.sql.functions._
    def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select(col("user_id"), col("session_start").cast("long"),
          col("session_end").cast("long"), col("n_events"))
        .collect().map(_.mkString("|")).toSet
    val batch = canon(Tables.events(spark, sfDir)
      .groupBy(col("user_id"), session_window(col("ts"), "6 hours").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events")))
    // single batch: one staged file + sentinel
    val single = canon(EventsStreaming.sessionWindowAgg(spark, sfDir))
    assert(single === batch)
    // multi batch: time-ordered chunk files, one per micro-batch — sessions
    // spanning a chunk boundary must merge in the session state store
    val dir = new java.io.File("/root/repo/target/tmp/stream/swagg_chunks")
    org.apache.commons.io.FileUtils.deleteDirectory(dir)
    dir.mkdirs()
    val events = Tables.events(spark, sfDir).orderBy("ts").collect()
    val n = events.length
    Seq(events.take(n / 3), events.slice(n / 3, 2 * n / 3),
        events.drop(2 * n / 3)).zipWithIndex.foreach { case (chunk, i) =>
      val rows = chunk.map(r => (r.getLong(0), epochNanos(r.get(1)),
        r.getLong(2), r.getString(3), r.getDouble(4), r.getString(5)))
      val scratch = new java.io.File(dir, s"build_$i")
      rows.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(scratch.getAbsolutePath)
      val part = scratch.listFiles().find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(dir, f"chunk_$i%02d.parquet")
      java.nio.file.Files.copy(part.toPath, dst.toPath)
      dst.setLastModified(1000000L * (i + 1))
      org.apache.commons.io.FileUtils.deleteDirectory(scratch)
    }
    val multi = canon(EventsStreaming.sessionWindowAgg(spark, sfDir,
      inputDir = Some(dir.toString), maxFilesPerTrigger = Some(1)))
    assert(multi === batch)
  }

  test("txn sink: one atomic commit per micro-batch, replay is a no-op") {
    import graft.sources.TxnTable
    // stage two disjoint time-ordered chunk files → maxFilesPerTrigger=1
    // forces two real micro-batches → two table versions
    val dir = new java.io.File("/root/repo/target/tmp/stream/txnsink_case")
    org.apache.commons.io.FileUtils.deleteDirectory(dir)
    dir.mkdirs()
    val events = Tables.events(spark, sfDir).orderBy("ts").collect()
    val half = events.length / 2
    Seq(events.take(half), events.drop(half)).zipWithIndex.foreach { case (chunk, i) =>
      val rows = chunk.map(r => (r.getLong(0), epochNanos(r.get(1)),
        r.getLong(2), r.getString(3), r.getDouble(4), r.getString(5)))
      rows.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/part_$i")
    }
    val flat = new java.io.File(dir, "flat"); flat.mkdirs()
    Seq(0, 1).foreach { i =>
      val src = new java.io.File(s"$dir/part_$i").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(src.toPath,
        new java.io.File(flat, f"chunk_$i%02d.parquet").toPath)
      new java.io.File(flat, f"chunk_$i%02d.parquet").setLastModified(1000000L * (i + 1))
    }
    val landed = EventsStreaming.txnSinkIngest(spark, sfDir,
      inputDir = Some(flat.toString), maxFilesPerTrigger = Some(1))
    val table = s"/root/repo/target/tmp/stream/txn_sink_" +
      sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    // two micro-batches really ran → two commits
    assert(TxnTable.currentVersion(table) === 2)
    // landed content equals the batch source exactly (ids are unique)
    assert(landed.select("event_id").collect().map(_.getLong(0)).sorted.toSeq ===
      events.map(_.getLong(0)).sorted.toSeq)
    // replaying an already-committed batch id must no-op, not duplicate:
    // the same guarded commit path the sink uses
    val replay = landed.limit(5)
    try TxnTable.commit(spark, replay, table, overwrite = false,
      expectedVersion = Some(1))
    catch { case _: java.util.ConcurrentModificationException => () }
    assert(TxnTable.currentVersion(table) === 2)
    assert(TxnTable.read(spark, table).count() === events.length.toLong)
  }

  test("txn sink conflict adjudication: own-tag retry no-ops, foreign commit fails loudly") {
    import graft.sources.TxnTable
    val dir = new java.io.File("/root/repo/target/tmp/stream/txnsink_conflict")
    org.apache.commons.io.FileUtils.deleteDirectory(dir)
    dir.mkdirs()
    val events = Tables.events(spark, sfDir).orderBy("ts").collect()
    val half = events.length / 2
    def writeChunk(chunk: Array[org.apache.spark.sql.Row], name: String): Unit = {
      val rows = chunk.map(r => (r.getLong(0), epochNanos(r.get(1)),
        r.getLong(2), r.getString(3), r.getDouble(4), r.getString(5)))
      val scratch = new java.io.File(dir, s"build_$name")
      rows.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(scratch.getAbsolutePath)
      val part = scratch.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(dir, s"$name.parquet").toPath)
      org.apache.commons.io.FileUtils.deleteDirectory(scratch)
    }
    writeChunk(events.take(half), "chunk_00")
    EventsStreaming.txnSinkIngest(spark, sfDir, inputDir = Some(dir.toString))
    val table = s"/root/repo/target/tmp/stream/txn_sink_" +
      sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    assert(TxnTable.currentVersion(table) === 1)

    // CASE 1 — own-tag conflict (a prior attempt of batch 1 landed but the
    // checkpoint missed the ack): the resumed run must treat it as the
    // exactly-once retry and NOT double-append
    writeChunk(events.slice(half, half + 10), "chunk_01")
    TxnTable.commit(spark, spark.read.parquet(s"$dir/chunk_01.parquet"),
      table, overwrite = false, expectedVersion = Some(2),
      tag = Some("stream-batch-1"))
    EventsStreaming.txnSinkIngest(spark, sfDir,
      inputDir = Some(dir.toString), resume = true)
    assert(TxnTable.currentVersion(table) === 2) // no duplicate commit

    // CASE 2 — FOREIGN commit occupies the batch's version slot: the sink
    // must fail loudly, never silently no-op (that would drop the batch)
    writeChunk(events.slice(half + 10, half + 20), "chunk_02")
    TxnTable.commit(spark, Seq(-1L).toDF("event_id"), table,
      overwrite = false, expectedVersion = Some(3),
      tag = Some("out-of-band-writer"))
    val ex = intercept[Exception] {
      EventsStreaming.txnSinkIngest(spark, sfDir,
        inputDir = Some(dir.toString), resume = true)
    }
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ rootMessages(e.getCause))
    assert(rootMessages(ex).exists(_.contains("out-of-band commit")),
      s"expected loud out-of-band failure, got: ${rootMessages(ex)}")
  }

  test("catalog sink: both tables land atomically per batch, in lockstep") {
    import graft.sources.TxnCatalog
    val dir = new java.io.File("/root/repo/target/tmp/stream/catsink_chunks")
    org.apache.commons.io.FileUtils.deleteDirectory(dir)
    dir.mkdirs()
    val events = Tables.events(spark, sfDir).orderBy("ts").collect()
    val half = events.length / 2
    def writeChunk(chunk: Array[org.apache.spark.sql.Row], name: String,
                   mtime: Long): Unit = {
      val rows = chunk.map(r => (r.getLong(0), epochNanos(r.get(1)),
        r.getLong(2), r.getString(3), r.getDouble(4), r.getString(5)))
      val scratch = new java.io.File(dir, s"build_$name")
      rows.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(scratch.getAbsolutePath)
      val part = scratch.listFiles().find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(dir, s"$name.parquet")
      java.nio.file.Files.copy(part.toPath, dst.toPath)
      dst.setLastModified(mtime)
      org.apache.commons.io.FileUtils.deleteDirectory(scratch)
    }
    writeChunk(events.take(half), "chunk_00", 1000000L)
    writeChunk(events.drop(half), "chunk_01", 2000000L)
    val (raw, stats) = EventsStreaming.catalogSinkIngest(spark, sfDir,
      inputDir = Some(dir.toString), maxFilesPerTrigger = Some(1))
    val catalog = s"/root/repo/target/tmp/stream/txn_catalog_" +
      sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    // two batches → two catalog txns; BOTH tables at version 2 (lockstep)
    assert(TxnCatalog.currentTxn(catalog) === 2)
    assert(TxnCatalog.tableVersions(catalog) === Map("raw" -> 2, "stats" -> 2))
    assert(raw.count() === events.length.toLong)
    // stats rows sum to the same per-type counts as the raw table
    val fromStats = stats.groupBy("event_type").agg(sum("cnt").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fromRaw = raw.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fromStats === fromRaw)
    // an out-of-band catalog txn steals the next batch's slot → loud failure
    TxnCatalog.commitAll(spark, catalog,
      Seq(TxnCatalog.Write("raw", Seq(-1L).toDF("event_id"))),
      tag = Some("out-of-band-writer"))
    writeChunk(events.take(10), "chunk_02", 3000000L)
    val ex = intercept[Exception] {
      EventsStreaming.catalogSinkIngest(spark, sfDir,
        inputDir = Some(dir.toString), resume = true)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("out-of-band commit")),
      s"expected loud out-of-band failure, got: ${msgs(ex)}")
  }

  test("txn sink resume: a later run processes only newly-arrived files") {
    import graft.sources.TxnTable
    val dir = new java.io.File("/root/repo/target/tmp/stream/txnsink_resume")
    org.apache.commons.io.FileUtils.deleteDirectory(dir)
    dir.mkdirs()
    val events = Tables.events(spark, sfDir).orderBy("ts").collect()
    val half = events.length / 2
    def writeChunk(chunk: Array[org.apache.spark.sql.Row], name: String): Unit = {
      val rows = chunk.map(r => (r.getLong(0), epochNanos(r.get(1)),
        r.getLong(2), r.getString(3), r.getDouble(4), r.getString(5)))
      val scratch = new java.io.File(dir, s"build_$name")
      rows.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(scratch.getAbsolutePath)
      val part = scratch.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(dir, s"$name.parquet").toPath)
      org.apache.commons.io.FileUtils.deleteDirectory(scratch)
    }
    // day one: only the first half exists
    writeChunk(events.take(half), "chunk_00")
    val run1 = EventsStreaming.txnSinkIngest(spark, sfDir,
      inputDir = Some(dir.toString))
    val table = s"/root/repo/target/tmp/stream/txn_sink_" +
      sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    assert(run1.count() === half.toLong)
    val v1 = TxnTable.currentVersion(table)
    // day two: the second half arrives; the RESUMED run must process
    // only it (checkpoint ledger) and append as the next version(s)
    writeChunk(events.drop(half), "chunk_01")
    val run2 = EventsStreaming.txnSinkIngest(spark, sfDir,
      inputDir = Some(dir.toString), resume = true)
    assert(run2.count() === events.length.toLong)
    assert(TxnTable.currentVersion(table) > v1)
    // no duplicates: every event id exactly once
    assert(run2.select("event_id").distinct().count() === events.length.toLong)
  }

  test("compacting sink: files bounded, content exact, lost-checkpoint restart no-ops by tag") {
    import graft.sources.TxnTable
    // forced multi-batch stage (one file per batch)
    val stage = new java.io.File("/root/repo/target/tmp/stream/compact_spec_stage")
    org.apache.commons.io.FileUtils.deleteQuietly(stage)
    spark.read.parquet(s"$sfDir/events.parquet")
      .repartition(5).write.parquet(stage.getPath)
    val (landed, table) = EventsStreaming.txnSinkIngestCompacting(
      spark, sfDir, maxLiveFiles = 2, inputDir = Some(stage.getPath),
      maxFilesPerTrigger = Some(1))
    val want = Tables.events(spark, sfDir).count()
    assert(landed.count() === want)
    assert(TxnTable.liveFiles(table, None).size <= 2, "file count bounded")
    val versions = TxnTable.currentVersion(table)
    val ingests = (1 to versions).count(v =>
      TxnTable.commitTag(table, v).exists(_.startsWith("stream-batch-")))
    assert(versions > ingests, "compaction versions interleaved")
    // the restart the TAG adjudication exists for: checkpoint LOST,
    // table kept — batch ids restart at 0, every replayed batch finds
    // its own published tag and no-ops; zero double-ingest
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$table.ckpt"))
    val (again, _) = EventsStreaming.txnSinkIngestCompacting(
      spark, sfDir, maxLiveFiles = 2, inputDir = Some(stage.getPath),
      maxFilesPerTrigger = Some(1), resume = true)
    assert(again.count() === want, "replay must not double-ingest")
    assert(TxnTable.currentVersion(table) === versions,
      "no new versions on a pure tag-replay run")
  }

  test("streaming count-min sketch is batch-split invariant and bit-equal to batch") {
    import graft.operators.CountMin
    val dir = new java.io.File("/root/repo/target/tmp/stream/cms_multibatch")
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    val flat = new java.io.File(dir, "flat"); flat.mkdirs()
    val events = Tables.events(spark, sfDir).collect()
    val third = events.length / 3
    // NOT time-ordered on purpose: vector-sum state must not care
    Seq(events.drop(2 * third), events.take(third),
        events.slice(third, 2 * third)).zipWithIndex.foreach { case (chunk, i) =>
      chunk.map(r => (r.getLong(0), epochNanos(r.get(1)), r.getLong(2),
          r.getString(3), r.getDouble(4), r.getString(5))).toSeq
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/part_$i")
      val src = new java.io.File(s"$dir/part_$i").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(src.toPath,
        new java.io.File(flat, f"chunk_$i%02d.parquet").toPath)
      new java.io.File(flat, f"chunk_$i%02d.parquet").setLastModified(1000000L * (i + 1))
    }
    def cells(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val multi = cells(EventsStreaming.cmsSketch(spark, sfDir,
      inputDir = Some(flat.toString), maxFilesPerTrigger = Some(1)))
    val single = cells(EventsStreaming.cmsSketch(spark, sfDir))
    val batch = cells(CountMin.sketch(Tables.events(spark, sfDir), "user_id"))
    assert(multi === batch, "3-batch streaming sketch differs from batch sketch")
    assert(single === batch, "1-batch streaming sketch differs from batch sketch")
    // the estimate's one-sided guarantee: est >= exact count, every user
    val exact = Tables.events(spark, sfDir).groupBy("user_id")
      .agg(count(lit(1)).as("exact"))
    val est = CountMin.estimate(
      Tables.events(spark, sfDir).select("user_id").distinct(),
      CountMin.sketch(Tables.events(spark, sfDir), "user_id"), "user_id")
    val under = est.join(exact, "user_id")
      .filter(col("est_cnt") < col("exact")).count()
    assert(under === 0L, "count-min must never underestimate")
  }
}
