package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured-Streaming surface over the `events` table (SURVEY §2.11).
  *
  * The reference is batch-only (monthly Airflow + a 1-day incremental API
  * window, pipeline.py:773-779); this module makes those semantics
  * first-class: a file-source stream with `Trigger.AvailableNow` is exactly
  * "process everything new since last run" — incremental batch with
  * streaming bookkeeping, the 100 TB ingest shape.
  */
object EventsStreaming {

  /** events.parquet raw schema — ts read as a raw INT64 (the file's own
    * unit: TIMESTAMP(NANOS) generations surface nanos via the
    * nanosAsLong conf, TIMESTAMP(MICROS) generations surface micros),
    * converted after scan via [[tsDivisor]]. */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Stateful streams commit one state-store delta PER SHUFFLE PARTITION
    * per micro-batch — and a stream-stream join keeps four stores per
    * partition, so at 32 shuffle partitions a single AvailableNow batch
    * pays 128 store commits before touching data. Stateful queries
    * therefore run on a derived session with a smaller state-partition
    * count (the knob a real deployment sizes to its cluster — it is
    * fixed for the life of a checkpoint, so it's a per-query choice, not
    * a global one). Measured at sf0.1: q_stream_join 19.8 s → ~5 s. */
  private[streaming] def streamSession(spark: SparkSession): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTITIONS", "8"))
    s
  }

  /** The file streaming source requires a directory; the testdata ships
    * single-file tables. Stage events.parquet into a scratch dir keyed by
    * the sf dir (copy once, reuse). */
  private[graft] def stageDir(sfDir: String): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val key = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val dir = Paths.get(s"/root/repo/target/tmp/stream/$key")
    Files.createDirectories(dir)
    val src = Paths.get(s"$sfDir/events.parquet")
    val dst = dir.resolve("events.parquet")
    // COPY_ATTRIBUTES preserves the source mtime, so size+mtime equality
    // detects a regenerated same-size source (size alone would miss it)
    if (!Files.exists(dst) || Files.size(dst) != Files.size(src) ||
        Files.getLastModifiedTime(dst) != Files.getLastModifiedTime(src))
      Files.copy(src, dst, StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.COPY_ATTRIBUTES)
    dir.toString
  }

  /** Raw-long → micros divisor for the `ts` column of every parquet file
    * under `dir`, detected by VALUE RANGE (one footer-stats job). The
    * testdata's timestamp physical unit changed across driver
    * generations — TIMESTAMP(NANOS) read as long nanos vs
    * TIMESTAMP(MICROS) read as long micros through the same
    * [[rawSchema]] projection — and the footer TYPE cannot distinguish a
    * plain-INT64 restage, so the unit test is numeric: a 2024 epoch is
    * ~1.7e18 ns but ~1.7e15 µs; anything above 1e17 is nanos. */
  private[graft] def tsDivisor(spark: SparkSession, dir: String): Long = {
    val row = spark.read.schema(rawSchema).parquet(dir).agg(max("ts")).head()
    require(!row.isNullAt(0),
      s"cannot detect ts unit: no non-null ts values under $dir " +
        "(empty input dir or all-null column)")
    val maxTs = row.getLong(0)
    // a modern epoch is ~1.7e18 ns / ~1.7e15 µs; anything below ~1e14
    // (≈ year 1973 in µs) is some OTHER unit (e.g. a millis or seconds
    // restage) — fail loudly rather than silently misconvert
    require(maxTs > 100000000000000L,
      s"unrecognized ts unit: max raw value $maxTs under $dir is below " +
        "the µs range — a new testdata vintage needs an explicit divisor")
    if (maxTs > 100000000000000000L) 1000L else 1L
  }

  /** The detected-unit ts conversion: raw long → TIMESTAMP (micros). */
  private[graft] def rawTs(div: Long) = timestamp_micros(expr(s"ts div $div"))

  /** Tumbling 1-hour window counts per event_type, computed as a stream:
    * file source → watermark → windowed agg → memory sink, AvailableNow.
    * Complete mode so the single-batch run emits every window (append mode
    * would hold all windows back: the watermark only advances between
    * batches). */
  def hourlyCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = streamSession(spark)
    val name = s"stream_hourly_${System.nanoTime()}"
    val dir = stageDir(sfDir)
    val stream = ss.readStream.schema(rawSchema).parquet(dir)
      .withColumn("ts", rawTs(tsDivisor(ss, dir)))
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:00").as("hour_ts"),
        col("event_type"), col("cnt"))
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    ss.table(name)
  }

  /** Sliding-window counts per event_type (SURVEY §2.11's second window
    * form): 1-hour windows advancing every 15 minutes, so each event lands
    * in windowLen/slide = 4 overlapping windows. Same stream shape as
    * `hourlyCounts`; only the window spec differs — the scale cost is 4×
    * the grouped rows, not 4× the scan. */
  def slidingCounts(spark: SparkSession, sfDir: String,
                    windowLen: String = "1 hour",
                    slide: String = "15 minutes"): DataFrame = {
    val ss = streamSession(spark)
    val name = s"stream_sliding_${System.nanoTime()}"
    val dir = stageDir(sfDir)
    val stream = ss.readStream.schema(rawSchema).parquet(dir)
      .withColumn("ts", rawTs(tsDivisor(ss, dir)))
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("win_start"),
        col("event_type"), col("cnt"))
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    ss.table(name)
  }

  case class SessionSummary(user_id: Long, n_sessions: Long, n_events: Long)

  /** Custom streaming state (SURVEY §2.11 engine-added surface):
    * per-user sessionization via `mapGroupsWithState` — events within
    * `gapMinutes` of the previous event share a session. The state API is
    * the point (KeyValueGroupedDataset custom state, the brief's
    * mapGroupsWithState row). State and emitted rows are both cumulative,
    * and the Update-mode memory sink (which appends one row per user per
    * batch, no upsert) is post-aggregated with a monotone max per user —
    * so the result is the latest cumulative row even when the file source
    * splits the input across several batches. Events are only
    * sessionized correctly across batches if batch order follows event
    * time (true for AvailableNow over a single staged file; a production
    * deployment would partition input files by time). */
  def userSessions(spark: SparkSession, sfDir: String, gapMinutes: Int = 30,
                   inputDir: Option[String] = None,
                   maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val ss = streamSession(spark)
    import ss.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val name = s"stream_sessions_${System.nanoTime()}"
    val reader = ss.readStream.schema(rawSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val dir = inputDir.getOrElse(stageDir(sfDir))
    val stream = reader.parquet(dir)
      .withColumn("ts", rawTs(tsDivisor(ss, dir)))
      .select($"user_id", $"ts".cast("long").as("ts_sec"))
      .as[(Long, Long)]
    val gapSec = gapMinutes * 60L
    val sessions = stream
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Long, Long), SessionSummary](GroupStateTimeout.NoTimeout) {
        case (user, events, state: GroupState[(Long, Long, Long)]) =>
          // state = (n_sessions so far, last event time, n_events so far);
          // events within one batch arrive unordered — sort locally per user
          val ts = events.map(_._2).toArray.sorted
          var (nSessions, lastTs, nEvents) = state.getOption.getOrElse((0L, Long.MinValue, 0L))
          ts.foreach { t =>
            if (lastTs == Long.MinValue || t - lastTs > gapSec) nSessions += 1
            lastTs = t
            nEvents += 1
          }
          state.update((nSessions, lastTs, nEvents))
          SessionSummary(user, nSessions, nEvents)
      }
    val q = sessions.toDF().writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // keep the latest cumulative row per user: both counters are monotone
    // nondecreasing across batches, so max == last
    ss.table(name).groupBy("user_id")
      .agg(max("n_sessions").as("n_sessions"), max("n_events").as("n_events"))
  }

  /** NATIVE streaming session-window aggregation — the built-in
    * `session_window` under a watermark, completing the trio next to the
    * batch form (q_sessionize_native) and the custom-state forms
    * ([[userSessions]]/[[completedSessions]]): Spark's own merging
    * session state store, append mode, sessions final the moment the
    * watermark passes their end.
    *
    * Determinism: append mode only EMITS a session once the watermark
    * (max event time − gap) passes `last_event + gap`, so each run's
    * tail sessions would stay trapped in state. The staging therefore
    * adds one far-future SENTINEL row (user_id −1): after its batch the
    * watermark clears every real session and the terminal no-data
    * micro-batch flushes them all; the sentinel's own still-open session
    * is filtered out. With the watermark delay EQUAL to the gap and
    * time-ordered input files, no real event can ever be late for an
    * already-emitted session (merge needs ts ≤ last+gap, emission needs
    * last+gap < maxSeen−gap ≤ ts — contradiction), so multi-batch runs
    * equal the batch rollup exactly. */
  def sessionWindowAgg(spark: SparkSession, sfDir: String, gapHours: Int = 6,
                       inputDir: Option[String] = None,
                       maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val ss = streamSession(spark)
    import org.apache.spark.sql.streaming.OutputMode
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val name = s"stream_swagg_${System.nanoTime()}"
    val src = inputDir.getOrElse(stageDir(sfDir))
    val div = tsDivisor(ss, src)
    // fresh per-run staging: the source file(s) plus the sentinel (written
    // LAST — latest mtime — so maxFilesPerTrigger runs see it in the
    // final batch, after every real event)
    val dir = new java.io.File(
      s"/root/repo/target/tmp/stream/swagg_${System.nanoTime()}")
    org.apache.commons.io.FileUtils.deleteDirectory(dir)
    dir.mkdirs()
    Option(new java.io.File(src).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
      .foreach(f => Files.copy(f.toPath, Paths.get(dir.getPath, f.getName),
        StandardCopyOption.COPY_ATTRIBUTES))
    val maxRaw = ss.read.schema(rawSchema).parquet(src)
      .agg(max("ts")).head().getLong(0)
    locally {
      import ss.implicits._
      Seq((-1L, maxRaw * 2, -1L, "sentinel", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(dir.getPath)
    }
    val reader = ss.readStream.schema(rawSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val agg = reader.parquet(dir.getPath)
      .withColumn("ts", rawTs(div))
      .withWatermark("ts", s"$gapHours hours")
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapHours hours").as("sw"))
      .agg(count(lit(1)).as("n_events"))
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = ss.table(name).filter(col("user_id") >= 0L)
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))
      .cache()
    out.count() // pin: the memory table is per-run, the result outlives it
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    out
  }

  case class OpenSession(start: Long, last: Long, n: Long)
  case class ClosedSession(user_id: Long, session_start: Long,
                           session_end: Long, n_events: Long)

  /** flatMapGroupsWithState sessionization (the second custom-state API
    * next to [[userSessions]]'s mapGroupsWithState): emits each session
    * the moment a later event CLOSES it (gap > `gapMinutes`), keeping only
    * the open session in state — the emit-on-close shape that lets
    * downstream consumers see finished sessions without waiting for
    * timeouts. A user's final (still-open) session is never emitted;
    * the oracle mirrors that by dropping each user's last island. Same
    * batch-order caveat as [[userSessions]]: correct when batch order
    * follows event time (AvailableNow over one staged file). */
  def completedSessions(spark: SparkSession, sfDir: String,
                        gapMinutes: Int = 30,
                        inputDir: Option[String] = None,
                        maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val ss = streamSession(spark)
    import ss.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val name = s"stream_closed_${System.nanoTime()}"
    val reader = ss.readStream.schema(rawSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val dir = inputDir.getOrElse(stageDir(sfDir))
    val stream = reader.parquet(dir)
      .withColumn("ts", rawTs(tsDivisor(ss, dir)))
      .select($"user_id", $"ts".cast("long").as("ts_sec"))
      .as[(Long, Long)]
    val gapSec = gapMinutes * 60L
    val closed = stream
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (user, events, state: GroupState[OpenSession]) =>
          val ts = events.map(_._2).toArray.sorted
          var open = state.getOption
          val out = scala.collection.mutable.ArrayBuffer[ClosedSession]()
          ts.foreach { t =>
            open = open match {
              case Some(o) if t - o.last > gapSec =>
                out += ClosedSession(user, o.start, o.last, o.n)
                Some(OpenSession(t, t, 1))
              case Some(o) => Some(o.copy(last = t, n = o.n + 1))
              case None => Some(OpenSession(t, t, 1))
            }
          }
          open.foreach(state.update)
          out.iterator
      }
    val q = closed.toDF().writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    ss.table(name)
  }

  /** Stream-stream inner join (engine-added §2.11 surface): each click
    * joined to the purchases that follow it within `withinMinutes` for the
    * same user — the attribution-join shape. Both sides carry watermarks
    * and the join condition time-bounds p_ts to [c_ts, c_ts + within]:
    * exactly the event-time constraint Spark requires to bound join state
    * retention (without it, both sides' state grows forever). Append mode —
    * inner-join matches are final the moment they are emitted. */
  def clickPurchaseJoin(spark: SparkSession, sfDir: String,
                        withinMinutes: Int = 30): DataFrame = {
    val ss = streamSession(spark)
    val name = s"stream_join_${System.nanoTime()}"
    val dir = stageDir(sfDir)
    val div = tsDivisor(ss, dir)
    def src = ss.readStream.schema(rawSchema).parquet(dir)
      .withColumn("ts", rawTs(div))
    val clicks = src.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val joined = clicks.join(purchases,
        expr(s"user_id = p_user AND p_ts >= c_ts AND p_ts <= c_ts + interval $withinMinutes minutes"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("gap_us"))
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    ss.table(name)
  }

  /** Cross-run dedup semantics (pipeline.py:215 as a stream): streaming
    * dropDuplicates on the event key within the watermark horizon. Returns
    * the deduplicated count per event_type. */
  /** LEFT OUTER stream-stream join — the attribution form of
    * [[clickPurchaseJoin]] that also emits clicks with NO purchase
    * within the window. Matched pairs emit immediately; an unmatched
    * click can only emit once the WATERMARK proves no purchase can still
    * arrive for it (state eviction), so the staging appends two
    * far-future sentinel rows (one per side, user −1) whose batch pushes
    * both watermarks past every real event — the terminal no-data
    * micro-batch then flushes every held null row, making the bounded
    * run equal the batch LEFT JOIN exactly. */
  def clickPurchaseLeftJoin(spark: SparkSession, sfDir: String,
                            withinMinutes: Int = 30): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val ss = streamSession(spark)
    val name = s"stream_ljoin_${System.nanoTime()}"
    val src0 = stageDir(sfDir)
    val div = tsDivisor(ss, src0)
    val dir = new java.io.File(
      s"/root/repo/target/tmp/stream/ljoin_${System.nanoTime()}")
    org.apache.commons.io.FileUtils.deleteDirectory(dir)
    dir.mkdirs()
    Option(new java.io.File(src0).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
      .foreach(f => Files.copy(f.toPath, Paths.get(dir.getPath, f.getName),
        StandardCopyOption.COPY_ATTRIBUTES))
    val maxRaw = ss.read.schema(rawSchema).parquet(src0)
      .agg(max("ts")).head().getLong(0)
    locally {
      import ss.implicits._
      Seq((-1L, maxRaw * 2, -1L, "click", 0.0, "{}"),
          (-2L, maxRaw * 2, -1L, "purchase", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(dir.getPath)
    }
    def src = ss.readStream.schema(rawSchema).parquet(dir.getPath)
      .withColumn("ts", rawTs(div))
    val clicks = src.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val joined = clicks.join(purchases,
        expr(s"user_id = p_user AND p_ts >= c_ts AND p_ts <= c_ts + interval $withinMinutes minutes"),
        "left_outer")
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("gap_us"))
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // the sentinel filter must NOT ride the streaming plan: Catalyst
    // pushes it below the watermark operator, eliminating the sentinel
    // before it can advance the watermark — filter the sink instead
    val out = ss.table(name).filter(col("user_id") >= 0L).cache()
    out.count() // pin: the memory table is per-run, the result outlives it
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    out
  }

  /** FULL OUTER stream-stream join — [[clickPurchaseLeftJoin]] completed
    * to both sides: clicks with no purchase in the window AND purchases
    * no click attributed emit with the other side null, each only once
    * its side's watermark proves no match can still arrive. The sentinel
    * discipline is unchanged (one far-future row per side pushes both
    * watermarks past every real event; the sentinel filter applies at
    * the SINK read — inside the plan Catalyst would push it below the
    * watermark operator and kill the flush). The emitted user_id is
    * COALESCEd across sides, so unmatched purchases keep their user. */
  def clickPurchaseFullJoin(spark: SparkSession, sfDir: String,
                            withinMinutes: Int = 30): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val ss = streamSession(spark)
    val name = s"stream_fjoin_${System.nanoTime()}"
    val src0 = stageDir(sfDir)
    val div = tsDivisor(ss, src0)
    val dir = new java.io.File(
      s"/root/repo/target/tmp/stream/fjoin_${System.nanoTime()}")
    org.apache.commons.io.FileUtils.deleteDirectory(dir)
    dir.mkdirs()
    Option(new java.io.File(src0).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
      .foreach(f => Files.copy(f.toPath, Paths.get(dir.getPath, f.getName),
        StandardCopyOption.COPY_ATTRIBUTES))
    val maxRaw = ss.read.schema(rawSchema).parquet(src0)
      .agg(max("ts")).head().getLong(0)
    locally {
      import ss.implicits._
      Seq((-1L, maxRaw * 2, -1L, "click", 0.0, "{}"),
          (-2L, maxRaw * 2, -1L, "purchase", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(dir.getPath)
    }
    def src = ss.readStream.schema(rawSchema).parquet(dir.getPath)
      .withColumn("ts", rawTs(div))
    val clicks = src.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val joined = clicks.join(purchases,
        expr(s"user_id = p_user AND p_ts >= c_ts AND p_ts <= c_ts + interval $withinMinutes minutes"),
        "full_outer")
      .select(coalesce(col("user_id"), col("p_user")).as("user_id"),
        col("click_id"), col("purchase_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("gap_us"))
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = ss.table(name).filter(col("user_id") >= 0L).cache()
    out.count() // pin: the memory table is per-run, the result outlives it
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    out
  }

  def streamingDedupCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = streamSession(spark)
    val name = s"stream_dedup_${System.nanoTime()}"
    val dir = stageDir(sfDir)
    val stream = ss.readStream.schema(rawSchema).parquet(dir)
      .withColumn("ts", rawTs(tsDivisor(ss, dir)))
    val deduped = stream
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")
      .groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
    val q = deduped.writeStream.format("memory").queryName(name)
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    ss.table(name)
  }

  /** Cross-batch streaming dedup with BOUNDED state
    * (`dropDuplicatesWithinWatermark`): plain `dropDuplicates` on a stream
    * keeps every key it has ever seen — unbounded state, the thing that
    * kills a forever-running ingest. The watermarked form evicts a key
    * once the watermark passes its event time + delay, trading "dedups
    * forever" for "dedups duplicates that arrive within the lateness
    * bound" — the right contract for at-least-once sources, whose retries
    * are near-immediate.
    *
    * The stage dir plants a second file duplicating every event in the
    * stream's EARLIEST hour, and `maxFilesPerTrigger=1` forces the files
    * through as separate micro-batches, so the dedup is genuinely
    * cross-batch state, not within-batch distinct. The planted set is
    * closed under the 1-hour bound in both batch orders (dups-first: every
    * main-file row the advancing watermark late-drops is already counted
    * from the dup file; main-first: every dup is either late-dropped or
    * state-deduped), so the result is EXACTLY per-type distinct counts —
    * oracle-equal to batch COUNT(DISTINCT). */
  def dedupWithinWatermarkCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = streamSession(spark)
    val dir = wmStageDir(spark, sfDir)
    val name = s"stream_dedup_wm_${System.nanoTime()}"
    val stream = ss.readStream.schema(rawSchema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .withColumn("ts", rawTs(tsDivisor(ss, dir)))
    val deduped = stream
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
    val q = deduped.writeStream.format("memory").queryName(name)
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    ss.table(name)
  }

  /** Staging dir for the watermarked-dedup stream: events.parquet plus a
    * one-time duplicate file of every event in the earliest hour (raw
    * nanos arithmetic — the file must byte-match the source rows so the
    * dedup key and event time agree exactly). */
  private def wmStageDir(spark: SparkSession, sfDir: String): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val key = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val dir = Paths.get(s"/root/repo/target/tmp/stream_wm/$key")
    Files.createDirectories(dir)
    val src = Paths.get(s"$sfDir/events.parquet")
    val dst = dir.resolve("events.parquet")
    val dupDst = dir.resolve("early_dups.parquet")
    if (!Files.exists(dst) || Files.size(dst) != Files.size(src) ||
        Files.getLastModifiedTime(dst) != Files.getLastModifiedTime(src)) {
      Files.copy(src, dst, StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.COPY_ATTRIBUTES)
      // the dup file derives from the source — a re-copied (regenerated)
      // source invalidates it, or the dir would mix timestamp units
      Files.deleteIfExists(dupDst)
    }
    if (!Files.exists(dupDst)) {
      val raw = spark.read.schema(rawSchema).parquet(src.toString)
      val minTs = raw.agg(min("ts")).head().getLong(0)
      val scratch = s"$dir.dupbuild"
      // one hour in the FILE'S raw unit (the dup file is written from the
      // same long projection, so it inherits that unit byte-exactly)
      raw.filter(col("ts") <= minTs + 3600L * 1000 * 1000 * tsDivisor(spark, src.toString))
        .coalesce(1).write.mode("overwrite").parquet(scratch)
      val part = Option(new java.io.File(scratch).listFiles()).getOrElse(Array.empty)
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file in $scratch"))
      Files.move(part.toPath, dupDst, StandardCopyOption.REPLACE_EXISTING)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(scratch))
    }
    dir.toString
  }

  /** CDC-style streaming snapshot maintenance: every micro-batch MERGEs
    * "latest event per user" into a keyed parquet snapshot via
    * `foreachBatch` + the staged-swap upsert
    * ([[graft.sources.Sources.upsertParquet]]) — the streaming side of
    * the reference's warehouse-maintenance split (drop-and-reload vs
    * append, pipeline.py:59/88), and the standard lakehouse CDC shape.
    *
    * Latest-wins is decided by (event time, event_id) — NOT batch
    * arrival order — so the snapshot is correct under any file/batch
    * split (the multi-batch spec drives maxFilesPerTrigger=1 over
    * time-split files). Event time is compared at micros (`ts div
    * 1000`): the nanos tail is below the oracle engine's resolution, so
    * tie-breaks must not depend on it. Returns the final snapshot:
    * (user_id, last_event_id, last_type, last_value). */
  def cdcUserSnapshot(spark: SparkSession, sfDir: String,
                      maxFilesPerTrigger: Option[Int] = None,
                      stagedDir: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ss = streamSession(spark)
    val key = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val snap = s"/root/repo/target/tmp/stream/cdc_snap_$key"
    val ckpt = s"$snap.ckpt"
    Seq(snap, ckpt, snap + ".old", snap + ".staging").foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us").desc, col("event_id").desc)
    def lastPerUser(df: DataFrame): DataFrame = df
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .drop("__rn")
    val reader = ss.readStream.schema(rawSchema)
    val dir = stagedDir.getOrElse(stageDir(sfDir))
    val div = tsDivisor(ss, dir)
    val src = maxFilesPerTrigger.fold(reader)(n =>
        reader.option("maxFilesPerTrigger", n.toString))
      .parquet(dir)
      .select(col("user_id"), expr(s"ts div $div").as("ts_us"),
        col("event_id"), col("event_type"), col("value"))
    val q = src.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val bs = batch.sparkSession
        val current =
          if (new java.io.File(snap, "_SUCCESS").exists()) bs.read.parquet(snap)
          else bs.createDataFrame(bs.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            batch.schema)
        // winners across snapshot ∪ batch — correct even if a later batch
        // carries earlier event times; upsertParquet stages then swaps
        graft.sources.Sources.upsertParquet(bs, snap,
          lastPerUser(current.unionByName(batch)), Seq("user_id"))
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.read.parquet(snap)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_type"), col("value").as("last_value"))
  }

  /** Streaming ingest into the transaction-log table — the lakehouse
    * sink: every micro-batch lands as one ATOMIC [[graft.sources.TxnTable]]
    * commit whose version is pinned to the batch id
    * (`expectedVersion = batchId + 1`). That equation is the
    * exactly-once contract: a replayed batch (restart, speculative
    * retry) targets an already-published version, loses the put-if-
    * absent log rename, and becomes a no-op instead of a duplicate
    * append — transactional-sink idempotence from the table's own
    * commit protocol, no extra ledger. Readers never see a torn batch
    * (the data dir is fully written before the log entry publishes) and
    * time travel gives per-batch snapshots for free.
    *
    * Returns the final table snapshot. `inputDir`/`maxFilesPerTrigger`
    * let specs drive a genuine multi-batch run.
    *
    * `resume = true` keeps the table AND the stream checkpoint from the
    * previous invocation — the AvailableNow lifecycle as actually
    * deployed: each run processes ONLY the files that arrived since the
    * last one (the checkpoint's file ledger decides), batch ids continue
    * where they left off, and every new batch lands as the next table
    * version. A fresh run (`resume = false`, the default) wipes both. */
  def txnSinkIngest(spark: SparkSession, sfDir: String,
                    inputDir: Option[String] = None,
                    maxFilesPerTrigger: Option[Int] = None,
                    resume: Boolean = false): DataFrame = {
    import graft.sources.TxnTable
    val ss = streamSession(spark)
    val key = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val table = s"/root/repo/target/tmp/stream/txn_sink_$key"
    val ckpt = s"$table.ckpt"
    if (!resume)
      Seq(table, ckpt).foreach(p =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    val dir = inputDir.getOrElse(stageDir(sfDir))
    val div = tsDivisor(ss, dir)
    val reader = ss.readStream.schema(rawSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val src = reader.parquet(dir)
      .withColumn("ts", rawTs(div))
    val q = src.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val batchTag = s"stream-batch-$batchId"
        try TxnTable.commit(batch.sparkSession, batch, table,
          overwrite = false, expectedVersion = Some(batchId.toInt + 1),
          tag = Some(batchTag))
        catch {
          // Version already published: ONLY a no-op if the published
          // entry carries OUR batch tag (an earlier attempt of this
          // same batch landed — the exactly-once retry case). A foreign
          // tag means an out-of-band writer took our version slot:
          // swallowing that would silently drop every subsequent batch,
          // so fail loudly instead.
          case e: java.util.ConcurrentModificationException =>
            val published = TxnTable.commitTag(table, batchId.toInt + 1)
            if (!published.contains(batchTag))
              throw new IllegalStateException(
                s"txn sink lost version ${batchId + 1} of $table to an " +
                s"out-of-band commit (published tag: $published); refusing " +
                "to silently drop this batch", e)
        }
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    TxnTable.read(spark, table)
  }

  /** SELF-COMPACTING transactional stream sink — [[txnSinkIngest]] plus
    * the steady-state lifecycle a forever-running ingest needs: every
    * micro-batch lands one commit, and whenever the live file count
    * exceeds `maxLiveFiles` the sink folds a
    * [[graft.sources.TxnTable.compactSmall]] in right behind it — the
    * small-file problem cured inline instead of by an out-of-band
    * nightly job. Because compaction versions interleave with ingest
    * versions, exactly-once switches from version-pinning to TAG
    * adjudication: a batch first scans the log for its own
    * `stream-batch-N` tag and no-ops on a hit (the replay case), so
    * version numbers are free to drift. Readers mid-scan keep their
    * snapshot (compaction removes bytes only at vacuum) and the change
    * feed across a compaction version cancels to zero rows — both
    * already spec-pinned on the primitives. Returns the landed table
    * AND its path, so callers inspecting the lifecycle (file counts,
    * version tags) don't re-derive the scratch location.
    *
    * `resume = true` keeps the table and stream checkpoint — the
    * deployed AvailableNow lifecycle ([[txnSinkIngest]]'s resume), and
    * the case the TAG adjudication exists for: an operator who loses the
    * CHECKPOINT but keeps the TABLE restarts with batch ids back at 0;
    * every replayed batch finds its own tag already published and
    * no-ops, so the table never double-ingests (spec-pinned). */
  def txnSinkIngestCompacting(spark: SparkSession, sfDir: String,
                              maxLiveFiles: Int = 4,
                              inputDir: Option[String] = None,
                              maxFilesPerTrigger: Option[Int] = None,
                              resume: Boolean = false)
      : (DataFrame, String) = {
    import graft.sources.TxnTable
    require(maxLiveFiles >= 1, s"maxLiveFiles must be >= 1, got $maxLiveFiles")
    val ss = streamSession(spark)
    val key = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val table = s"/root/repo/target/tmp/stream/txn_sink_compact_$key"
    val ckpt = s"$table.ckpt"
    if (!resume)
      Seq(table, ckpt).foreach(p =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    val dir = inputDir.getOrElse(stageDir(sfDir))
    val div = tsDivisor(ss, dir)
    val reader = ss.readStream.schema(rawSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val src = reader.parquet(dir).withColumn("ts", rawTs(div))
    // the replay probe scans each log entry's tag ONCE across the whole
    // run (versions only append): a fresh rescan per batch would be
    // O(V²) driver IO over a long ingest
    var scannedTo = 0
    val seenTags = scala.collection.mutable.Set.empty[String]
    val q = src.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val batchTag = s"stream-batch-$batchId"
        val head = TxnTable.currentVersion(table)
        ((scannedTo + 1) to head).foreach(v =>
          TxnTable.commitTag(table, v).foreach(seenTags.add))
        scannedTo = head
        if (!seenTags.contains(batchTag)) {
          TxnTable.commit(batch.sparkSession, batch, table,
            overwrite = false, tag = Some(batchTag))
          if (TxnTable.liveFiles(table, None).size > maxLiveFiles)
            TxnTable.compactSmall(batch.sparkSession, table,
              smallBytes = 1L << 30, numFiles = 1)
        }
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    (TxnTable.read(spark, table), table)
  }

  /** MULTI-TABLE transactional stream sink — the cross-table
    * exactly-once [[txnSinkIngest]] cannot give: every micro-batch lands
    * BOTH derived tables (raw rows + per-type batch stats) through ONE
    * TxnCatalog transaction pinned to `batchId + 1`. A crash between
    * the per-table stages leaves only catalog-invisible orphans, so the
    * replayed batch re-commits both tables consistently; a conflict is
    * adjudicated by tag exactly like the single-table sink (own tag ⇒
    * retry no-op, foreign tag ⇒ loud failure). This is the reference's
    * six-tables-per-run warehouse load made honestly atomic
    * (reference pipeline.py:1068-1144). */
  def catalogSinkIngest(spark: SparkSession, sfDir: String,
                        inputDir: Option[String] = None,
                        maxFilesPerTrigger: Option[Int] = None,
                        resume: Boolean = false): (DataFrame, DataFrame) = {
    import graft.sources.TxnCatalog
    import graft.sources.TxnCatalog.Write
    val ss = streamSession(spark)
    val key = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val catalog = s"/root/repo/target/tmp/stream/txn_catalog_$key"
    val ckpt = s"$catalog.ckpt"
    if (!resume)
      Seq(catalog, ckpt).foreach(p =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    val dir = inputDir.getOrElse(stageDir(sfDir))
    val div = tsDivisor(ss, dir)
    val reader = ss.readStream.schema(rawSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val src = reader.parquet(dir).withColumn("ts", rawTs(div))
    val q = src.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val batchTag = s"stream-batch-$batchId"
        val raw = batch.select("event_id", "user_id", "event_type", "value")
        val stats = batch.groupBy("event_type")
          .agg(count(lit(1)).as("cnt"))
          .withColumn("batch_id", lit(batchId))
        try TxnCatalog.commitAll(batch.sparkSession, catalog,
          Seq(Write("raw", raw), Write("stats", stats)),
          expectedTxn = Some(batchId.toInt + 1), tag = Some(batchTag))
        catch {
          case e: java.util.ConcurrentModificationException =>
            val published = TxnCatalog.commitTag(catalog, batchId.toInt + 1)
            if (!published.contains(batchTag))
              throw new IllegalStateException(
                s"catalog sink lost txn ${batchId + 1} of $catalog to an " +
                s"out-of-band commit (published tag: $published)", e)
        }
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    (TxnCatalog.read(spark, catalog, "raw"),
      TxnCatalog.read(spark, catalog, "stats"))
  }

  /** CONTINUOUS CDC view maintenance — the commit-to-live-view loop
    * closed with Spark's own machinery. Every TxnTable commit publishes
    * exactly one immutable `vNNNNN.json`, so the table's own log IS an
    * append-only file stream: this query watches it, and each
    * micro-batch folds the newly published versions' CHANGE FEED into
    * an aggregate view that is itself a TxnTable — one tagged commit
    * per refresh, exactly-once by the same version-pin + tag
    * adjudication as the ingest sinks. Signed CDC contributions compose
    * additively across versions, so a batch of N commits needs ONE
    * feed aggregate, not N.
    *
    * The view's grouped measures are `countCol` plus `sums` (view
    * measure → source column), maintained through inserts, updates,
    * deletes, overwrites, restores — anything the feed expresses.
    * Single-writer source assumed (versions publish in order), the
    * stream's own checkpoint carries resume. */
  /** Streaming DEAD-LETTER ingest — contracts at the stream boundary:
    * every micro-batch splits on the rule expressions (violating rows
    * tagged with their pipe-joined rule names) and BOTH routes land
    * through ONE atomic catalog transaction per batch — clean table and
    * quarantine stay version-locked, replay adjudicates by tag exactly
    * like [[catalogSinkIngest]]. The streaming form of
    * `TxnTable.commitQuarantined`, with the two-table atomicity that
    * form doesn't have. Returns (clean frame, quarantine frame). */
  def quarantineSinkIngest(spark: SparkSession, sfDir: String,
                           rules: Seq[graft.operators.Contracts.Rule],
                           inputDir: Option[String] = None,
                           maxFilesPerTrigger: Option[Int] = None): (DataFrame, DataFrame) = {
    import graft.operators.Contracts
    import graft.sources.TxnCatalog
    import graft.sources.TxnCatalog.Write
    require(rules.nonEmpty &&
      !rules.exists(_.isInstanceOf[Contracts.Unique]),
      "scan-evaluable rules only")
    val ss = streamSession(spark)
    val key = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val catalog = s"/root/repo/target/tmp/stream/quarantine_catalog_$key"
    val ckpt = s"$catalog.ckpt"
    Seq(catalog, ckpt).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    val dir = inputDir.getOrElse(stageDir(sfDir))
    val div = tsDivisor(ss, dir)
    val reader = ss.readStream.schema(rawSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val src = reader.parquet(dir).withColumn("ts", rawTs(div))
    val q = src.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val batchTag = s"quarantine-batch-$batchId"
        val flags = rules.map(r =>
          when(Contracts.violation(r) === 1L, lit(r.name)).otherwise(lit(null)))
        val tagged = batch.withColumn("__broke",
          array_join(array(flags: _*), "|"))
        val clean = tagged.filter(col("__broke") === "").drop("__broke")
        val bad = tagged.filter(col("__broke") =!= "")
          .withColumnRenamed("__broke", "violated_rules")
        try TxnCatalog.commitAll(batch.sparkSession, catalog,
          Seq(Write("clean", clean), Write("quarantine", bad)),
          expectedTxn = Some(batchId.toInt + 1), tag = Some(batchTag))
        catch {
          case e: java.util.ConcurrentModificationException =>
            val published = TxnCatalog.commitTag(catalog, batchId.toInt + 1)
            if (!published.contains(batchTag))
              throw new IllegalStateException(
                s"quarantine sink lost txn ${batchId + 1} of $catalog " +
                  s"(published tag: $published)", e)
        }
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    (TxnCatalog.read(spark, catalog, "clean"),
      TxnCatalog.read(spark, catalog, "quarantine"))
  }

  /** [[cdcViewMaintenance]] for a STAR view: each published version's
    * signed change feed flows THROUGH the broadcast dimension joins —
    * every change row picks up its dim attributes exactly as the fact
    * row did — before folding into the live aggregate, so the
    * maintained view can group by DIMENSION attributes while each
    * refresh stays O(Δ · broadcast dim lookup): the stream reads the
    * log, the feed, and the summary, never the fact history. Dims are
    * the STATIC side of the contract (the
    * [[graft.plans.Mv.refreshStarTxnCdc]] framing — a changed dim
    * invalidates history the feed can't see; rebuild, or model it as
    * SCD); each dim's key uniqueness is checked once at stream start so
    * a fanning join fails loudly instead of silently multiplying
    * deltas. `joinTypes` aligned with `dims` ("inner"/"left"; empty =
    * all inner): an INNER dim drops unmatched change rows — exactly the
    * rows an inner star never stored — while a LEFT dim null-extends
    * them into NULL-attribute groups, matching the left-star summary. */
  def cdcStarViewMaintenance(spark: SparkSession, sourceTable: String,
                             viewTable: String, keys: Seq[String],
                             groupKeys: Seq[String], countCol: String,
                             sums: Map[String, String],
                             dims: Seq[(DataFrame, String, String)],
                             joinTypes: Seq[String] = Nil,
                             resume: Boolean = false): DataFrame = {
    import graft.plans.Mv
    val jts = Mv.checkJoinTypes(joinTypes, dims.size)
    dims.foreach { case (dim, _, dimKey) =>
      Mv.requireDimUnique(dim, dimKey,
        "the feed join would fan out change rows")
    }
    cdcViewMaintenance(spark, sourceTable, viewTable, keys, groupKeys,
      countCol, sums, resume,
      through = f => Mv.joinThroughDims(f, dims, jts))
  }

  /** Fold a DIMENSION-side change feed into a maintained star view —
    * the refresh [[cdcStarViewMaintenance]] alone can't do (its dims
    * are the static side; a dim update invalidates attributes the fact
    * feed never re-delivers). The trick that makes it O(Δ) is GRAIN:
    * when the view's group keys retain the dim's fact-side join key
    * (`leftKey`), every fact row's contribution is addressable BY dim
    * key inside the view itself, so a dim change folds as signed view
    * rows with no fact scan at all:
    *   - retract every view row whose `leftKey` is a changed dim key
    *     (its stored attributes are the pre-image by maintenance
    *     invariant — including the NULL-attribute rows a LEFT star
    *     keeps for unmatched keys);
    *   - re-emit the same measures re-attributed to the key's POST
    *     state: the new image's attributes, or (LEFT) NULL-extended
    *     when the key was deleted, or (INNER) nothing — an inner star
    *     never stored unmatched rows.
    * A dim INSERT folds from the view alone only for LEFT stars (the
    * measures live in the NULL-attribute rows); an INNER star's
    * previously-unmatched fact rows were never stored, so any key
    * absent at `fromVersion` that ends up present — including one
    * inserted and then UPDATED (or deleted and reinserted) inside the
    * window, whose first feed event is the insert — needs OUTSIDE
    * information. With `fact` (+ `sums` naming each non-count
    * measure's fact column, the [[cdcViewMaintenance]] contract), the
    * refresh COMPOSES the key's net effect: the fact is read ONCE,
    * filtered to the inserted keys by a broadcast join against the
    * dim delta's post-images, and aggregated at the view grain — a
    * pruned fact pass for exactly the keys the view lacks, still no
    * rebuild (which would re-join and re-aggregate EVERY key). Without
    * `fact` the refresh refuses loudly instead of silently
    * under-counting: rebuild that view or pass the fact.
    *
    * `dimTable` is a [[graft.sources.TxnTable]]; the delta is its
    * change feed over `(fromVersion, toVersion]` with update images,
    * collapsed to one final state per key (intermediate flips cancel).
    * `measureCols` are the view's additive measure columns (count +
    * sums). Scale shape: broadcast the dim delta, one semi-join-sized
    * pass over the view, merge, commit — never the fact. */
  def dimDeltaStarRefresh(spark: SparkSession, viewTable: String,
                          groupKeys: Seq[String], measureCols: Seq[String],
                          leftKey: String, dimKey: String,
                          dimTable: String, fromVersion: Int,
                          toVersion: Int,
                          joinType: String = "left",
                          fact: Option[DataFrame] = None,
                          sums: Map[String, String] = Map.empty): DataFrame = {
    import graft.operators.Incremental
    import graft.sources.TxnTable
    import org.apache.spark.sql.expressions.Window
    require(Seq("left", "inner").contains(joinType),
      s"joinType must be left|inner, got $joinType")
    require(groupKeys.contains(leftKey),
      s"dim-delta maintenance needs the dim's fact-side key '$leftKey' " +
        "in the view grain — group keys that drop it cannot reallocate " +
        "measures between attribute values; rebuild instead")
    val feed = TxnTable.changeFeed(spark, dimTable, fromVersion, toVersion,
      Seq(dimKey), updateImages = true)
    val dimAttrCols = feed.columns
      .filterNot(Set(dimKey, "version", "change")).filter(groupKeys.contains)
    require(dimAttrCols.nonEmpty,
      s"no view group key is a '$dimTable' attribute — nothing to refresh")
    // one FINAL state per key: the newest new-state image wins; a key
    // whose newest row is an old-state image ended up deleted
    val isNew = col("change").isin("insert", "update_postimage")
    val last = feed
      .withColumn("__isnew", isNew)
      .withColumn("__rn", row_number().over(Window.partitionBy(dimKey)
        .orderBy(col("version").desc, col("__isnew").desc)))
      .filter(col("__rn") === 1)
    val insertContrib: Option[DataFrame] = if (joinType == "inner") {
      // existence at fromVersion is decided by the key's FIRST feed
      // event, not by "has any old-state event": a key inserted and
      // then updated (or inserted, deleted, reinserted) inside the
      // window has update_preimage/delete rows too, but its first
      // event is the insert — it did NOT exist at fromVersion, its
      // fact rows were never stored by the inner star, and folding
      // from the view alone would silently under-count. Old-state
      // events order before new-state within a version (__isnew asc),
      // so an update's preimage ranks ahead of its postimage.
      val firstEvent = feed
        .withColumn("__isnew", isNew)
        .withColumn("__rn", row_number().over(Window.partitionBy(dimKey)
          .orderBy(col("version").asc, col("__isnew").asc)))
        .filter(col("__rn") === 1)
        .select(col(dimKey), (!col("__isnew")).as("__existed"))
      // NET-inserted keys (absent at fromVersion, present at the end) —
      // dim-delta-sized, pinned once for the guard and the fold
      val insertedKeys = last.filter(col("__isnew"))
        .join(firstEvent.filter(col("__existed")).select(dimKey),
          Seq(dimKey), "left_anti")
        .select(dimKey).localCheckpoint(true)
      if (insertedKeys.isEmpty) None
      else {
        require(fact.nonEmpty,
          s"${insertedKeys.count()} dim key(s) absent at version " +
            s"$fromVersion now present: an INNER star never stored " +
            "their fact rows, so the view alone cannot absorb the " +
            "insert — rebuild it, or pass fact= (+ sums=) to fold the " +
            "inserted keys from one pruned fact pass")
        require(measureCols.tail.forall(sums.contains),
          s"folding inserted keys needs a sums= entry per non-count " +
            s"measure; missing ${measureCols.tail.filterNot(sums.contains).mkString(",")}")
        val f = fact.get
        val factKeys = groupKeys.filterNot(dimAttrCols.contains)
        factKeys.foreach(k => require(f.columns.contains(k),
          s"view group key '$k' is neither a '$dimTable' attribute nor " +
            "a fact column — a multi-dim grain folds per dim, rebuild"))
        // the inserted keys' POST images attribute their fact rows; the
        // fact is read once, pruned by the broadcast dim delta — the
        // exact rows the inner view was missing, nothing else
        val newImg = last.filter(col("__isnew"))
          .join(insertedKeys, Seq(dimKey), "left_semi")
          .select(col(dimKey).as("__ik") +:
            dimAttrCols.map(c => col(c).as(s"__ins_$c")): _*)
        val proj = f.join(broadcast(newImg), col(leftKey) === col("__ik"),
            "inner")
          .select(groupKeys.map(k =>
            if (dimAttrCols.contains(k)) col(s"__ins_$k").as(k) else col(k)) ++
            measureCols.tail.map(mc => col(sums(mc)).as(s"__m_$mc")): _*)
        Some(proj.groupBy(groupKeys.map(col): _*)
          .agg(count(lit(1)).as(measureCols.head),
            measureCols.tail.map(mc => sum(col(s"__m_$mc")).as(mc)): _*))
      }
    } else None
    val lastR = last.select(col(dimKey).as("__dk") +:
      col("__isnew") +: dimAttrCols.map(c => col(c).as(s"__new_$c")): _*)
    val view = TxnTable.read(spark, viewTable)
    val touched = view.join(broadcast(lastR),
      col(leftKey) === col("__dk"), "inner")
    val retract = touched.select(groupKeys.map(col) ++
      measureCols.map(c => (-col(c)).as(c)): _*)
    def reattributed(rows: DataFrame, attr: String => org.apache.spark.sql.Column) =
      rows.select(groupKeys.map(k =>
        if (dimAttrCols.contains(k)) attr(k).as(k) else col(k)) ++
        measureCols.map(col): _*)
    val emitMatched = reattributed(
      touched.filter(col("__isnew")), k => col(s"__new_$k"))
    val emitDeleted =
      if (joinType == "left")
        reattributed(touched.filter(!col("__isnew")),
          k => lit(null).cast(view.schema(k).dataType))
      else emitMatched.limit(0)
    val delta = insertContrib.foldLeft(
      retract.unionByName(emitMatched).unionByName(emitDeleted))(
      _.unionByName(_))
    val countCol = measureCols.head
    val next = Incremental.mergeAdditive(view, delta, groupKeys)
      .filter(col(countCol) > 0)
    TxnTable.commit(spark, next, viewTable, overwrite = true,
      tag = Some(s"dim-delta-${new java.io.File(dimTable).getName}-v$toVersion"))
    TxnTable.read(spark, viewTable)
  }

  def cdcViewMaintenance(spark: SparkSession, sourceTable: String,
                         viewTable: String, keys: Seq[String],
                         groupKeys: Seq[String], countCol: String,
                         sums: Map[String, String] = Map.empty,
                         resume: Boolean = false,
                         through: DataFrame => DataFrame = identity)
      : DataFrame = {
    import graft.sources.TxnTable
    import graft.operators.Incremental
    val ss = streamSession(spark)
    val ckpt = s"$viewTable.ckpt"
    if (!resume)
      Seq(viewTable, ckpt).foreach(p =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    val entrySchema = StructType(Seq(StructField("version", LongType)))
    val q = ss.readStream.schema(entrySchema)
      .json(s"$sourceTable/_graft_log/v*.json")
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val versions = batch.select("version").collect()
          .map(_.getLong(0).toInt).sorted
        if (versions.nonEmpty) {
          require(versions.last - versions.head == versions.length - 1,
            s"non-contiguous version batch ${versions.mkString(",")} — " +
              "a concurrent writer reordered the log")
          val sess = batch.sparkSession
          val feed = through(TxnTable.changeFeed(sess, sourceTable,
            versions.head - 1, versions.last, keys, updateImages = true))
          val delta = Incremental.cdcDelta(feed, groupKeys, countCol, sums)
          val next =
            if (TxnTable.currentVersion(viewTable) >= 1)
              Incremental.mergeAdditive(
                TxnTable.read(sess, viewTable), delta, groupKeys)
            else delta
          val batchTag = s"stream-batch-$batchId"
          // replay idempotence by TAG, not version pin: an acked-but-
          // unrecorded refresh already advanced the view version, so a
          // pin alone would happily double-fold the same feed
          val current = TxnTable.currentVersion(viewTable)
          val alreadyLanded = (1 to current)
            .exists(v => TxnTable.commitTag(viewTable, v).contains(batchTag))
          if (!alreadyLanded)
            try TxnTable.commit(sess, next.filter(col(countCol) > 0),
              viewTable, overwrite = true,
              expectedVersion = Some(current + 1), tag = Some(batchTag))
            catch {
              case e: java.util.ConcurrentModificationException =>
                if (!TxnTable.commitTag(viewTable, current + 1).contains(batchTag))
                  throw new IllegalStateException(
                    s"view refresh lost version ${current + 1} of $viewTable " +
                      "to an out-of-band commit", e)
            }
        }
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    TxnTable.read(spark, viewTable)
  }

  /** Streaming tolerant ingest: the quarantine split
    * ([[graft.sources.Sources.readJsonQuarantined]]) as a CONTINUOUS
    * pipeline — every micro-batch routes parse-clean rows to the live
    * table and corrupt rows (with their raw line) to a quarantine sink
    * for replay, both as idempotent appends under the stream checkpoint.
    * This is the ingest-edge shape at scale: malformed upstream records
    * never stop the stream and are never silently dropped.
    *
    * Returns the combined post-stream state tagged `status` ok /
    * quarantined (golden-oracled on the messy fixture, same contract as
    * the batch q_src_quarantine). */
  def quarantinedIngest(spark: SparkSession, fixturePath: String,
                        schema: StructType): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val ss = streamSession(spark)
    val key = new java.io.File(fixturePath).getName.replaceAll("[^A-Za-z0-9.]", "_")
    val base = s"/root/repo/target/tmp/stream/quarantine_$key"
    val (in, good, quar, ckpt) = (s"$base/in", s"$base/good", s"$base/quar", s"$base/ckpt")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    Files.createDirectories(Paths.get(in))
    Files.copy(Paths.get(fixturePath), Paths.get(s"$in/${new java.io.File(fixturePath).getName}"),
      StandardCopyOption.REPLACE_EXISTING)
    val src = ss.readStream
      .schema(schema.add("_corrupt_record", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(in)
    val q = src.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val dataCols = schema.fieldNames.map(col).toSeq
        batch.filter(col("_corrupt_record").isNull)
          .select(dataCols: _*)
          .write.mode("append").parquet(good)
        batch.filter(col("_corrupt_record").isNotNull)
          .select(dataCols :+ col("_corrupt_record").as("raw"): _*)
          .write.mode("append").parquet(quar)
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val okRows = spark.read.parquet(good)
      .withColumn("status", lit("ok")).withColumn("raw", lit(null).cast("string"))
    val badRows = spark.read.parquet(quar)
      .withColumn("status", lit("quarantined"))
    okRows.unionByName(badRows)
  }

  /** Streaming ENFORCE-AT-INGEST: a parquet file source drains through
    * [[graft.sources.TableConstraints.commitEnforced]] per micro-batch —
    * conforming rows append to `table` as txn versions, violators land
    * in `quarantineTable` with a `reason` column naming what they broke.
    * The lifecycle completion of the declared-constraint family: enforce
    * here, RELY in the optimizer, audit in O(Δ). Replay-idempotent by
    * batch tag (an acked-but-unrecorded micro-batch re-delivers after a
    * crash; its tag already landed, so the re-append is skipped).
    * Returns (table rows, quarantine rows — empty-schema'd when nothing
    * violated). */
  def constrainedIngest(spark: SparkSession, inDir: String,
                        schema: StructType, table: String,
                        quarantineTable: String)
      : (DataFrame, DataFrame) = {
    import graft.sources.TableConstraints
    val ss = streamSession(spark)
    val ckpt = s"$table.ckpt"
    // the replay tag is scoped to THIS checkpoint's identity: batchIds
    // restart at 0 when a checkpoint is reset or a second stream feeds
    // the same table, and an unscoped "enforced-<batchId>" would then
    // match an OLD batch's landed tag and silently drop genuinely new
    // data as a phantom replay. The UUID lives in the checkpoint dir,
    // so checkpoint-consistent restarts keep their tags and a reset
    // mints fresh ones.
    val idFile = new java.io.File(ckpt, "_graft_ingest_id")
    val streamId =
      if (idFile.isFile)
        new String(java.nio.file.Files.readAllBytes(idFile.toPath), "UTF-8")
      else {
        val id = java.util.UUID.randomUUID.toString.take(12)
        idFile.getParentFile.mkdirs()
        java.nio.file.Files.write(idFile.toPath, id.getBytes("UTF-8"))
        id
      }
    val q = ss.readStream.schema(schema).parquet(inDir)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        TableConstraints.commitEnforced(batch.sparkSession, batch, table,
          quarantineTable, tag = Some(s"enforced-$streamId-$batchId"))
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    def readOrEmpty(t: String, s: StructType) =
      if (graft.sources.TxnTable.currentVersion(t) > 0)
        graft.sources.TxnTable.read(spark, t)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
    (readOrEmpty(table, schema),
      readOrEmpty(quarantineTable, schema.add("reason", StringType)))
  }

  /** Streaming COUNT-MIN SKETCH accumulation over `user_id` — the
    * order-independent heavy-hitters state ([[graft.operators.CountMin]];
    * Misra-Gries counts are merge-order-sensitive, so this is the form a
    * streaming top-k can hash against a batch oracle with). Each event
    * explodes to its Depth cell indices; the streaming aggregate sums per
    * cell — state is the bounded Depth·Width counter vector no matter how
    * many distinct users flow past, and because the sketch is a vector
    * sum, ANY micro-batch split (`maxFilesPerTrigger`) produces the
    * bit-identical sketch. Complete mode: the memory table always holds
    * the full latest sketch. */
  def cmsSketch(spark: SparkSession, sfDir: String,
                inputDir: Option[String] = None,
                maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import graft.operators.CountMin
    val ss = streamSession(spark)
    val name = s"stream_cms_${System.nanoTime()}"
    val dir = inputDir.getOrElse(stageDir(sfDir))
    val reader = ss.readStream.schema(rawSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val cells = reader.parquet(dir)
      .select(explode(array(
        (0 until CountMin.Depth).map(r => CountMin.cell(col("user_id"), r)): _*))
        .as("cell"))
      .groupBy("cell").agg(count(lit(1)).as("cnt"))
    val q = cells.writeStream.format("memory").queryName(name)
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = ss.table(name).cache()
    out.count() // pin: the memory table is per-run, the result outlives it
    out
  }
}
