package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, Trigger, ValueState}

/** Spark 4's `transformWithState` — the arbitrary-stateful-processing API
  * that supersedes mapGroupsWithState: NAMED, independently-typed state
  * variables (ValueState / ListState / MapState) per key instead of one
  * monolithic state blob, timers, TTL, and a RocksDB-only store. The
  * reference has no streaming at all; this is the engine-added modern
  * form of its per-user aggregation loops (reference `pipeline.py`
  * monthly batch), kept exactly-oracle-able by integer arithmetic.
  *
  * Why the API matters at 100 TB: with mapGroupsWithState every state
  * update rewrites the whole per-key blob (and the HDFS-backed store
  * rewrites the whole partition file per batch); transformWithState's
  * typed variables update independently — a MapState entry write touches
  * one RocksDB key — so per-batch state I/O is O(touched values), not
  * O(state size).
  */
object TwsStreaming {

  /** One user's running activity profile. Counters are monotone across
    * batches; `top_type` is the argmax by (count, then lexicographic) of
    * the per-type MapState at emit time. */
  case class UserProfile(user_id: Long, n_events: Long, value_cents: Long,
                         n_types: Long, top_type: String, top_cnt: Long)

  /** Per-user profile maintenance: a ValueState holds the (n_events,
    * value_cents) totals, a MapState holds per-event-type counts — two
    * independently-updated named state variables, the shape the old API
    * could only fake by packing everything into one tuple. Values are
    * quantized to integer cents BEFORE summation so the running sum is
    * order- and batch-split-invariant (exact, like every oracled sum in
    * this engine). */
  private class UserProfileProcessor
      extends StatefulProcessor[Long, (Long, String, Long), UserProfile] {

    @transient private var totals: ValueState[(Long, Long)] = _
    @transient private var byType: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      totals = getHandle.getValueState[(Long, Long)](
        "totals", Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE)
      byType = getHandle.getMapState[String, Long](
        "byType", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(user: Long,
                                 rows: Iterator[(Long, String, Long)],
                                 timerValues: TimerValues): Iterator[UserProfile] =
      foldProfileRows(user, rows, totals, byType)
  }

  /** The shared per-batch profile fold (used by the cold-start and the
    * warm-start processor — Scala's single inheritance keeps them
    * separate classes, the logic is one function). */
  private def foldProfileRows(user: Long, rows: Iterator[(Long, String, Long)],
                              totals: ValueState[(Long, Long)],
                              byType: MapState[String, Long]): Iterator[UserProfile] = {
    var (n, cents) = if (totals.exists()) totals.get() else (0L, 0L)
    rows.foreach { case (_, t, c) =>
      n += 1
      cents += c
      val prev = if (byType.containsKey(t)) byType.getValue(t) else 0L
      byType.updateValue(t, prev + 1L)
    }
    totals.update((n, cents))
    val entries = byType.iterator().toArray
    val (topT, topC) = entries.maxBy { case (t, c) => (c, t) }(
      Ordering.Tuple2(Ordering.Long, Ordering.String.reverse))
    Iterator.single(UserProfile(user, n, cents, entries.length.toLong, topT, topC))
  }

  /** One user's bootstrapped state: the batch-computed history profile a
    * stream run starts from. */
  case class InitProfile(n_events: Long, value_cents: Long,
                         types: Map[String, Long])

  /** The warm-start variant: identical stream logic, but state is SEEDED
    * from a batch table before the first micro-batch — the
    * batch-to-streaming migration path (StatefulProcessorWithInitialState),
    * which the old APIs covered only by replaying all of history through
    * the stream. */
  private class WarmStartProfileProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
        Long, (Long, String, Long), UserProfile, InitProfile] {

    @transient private var totals: ValueState[(Long, Long)] = _
    @transient private var byType: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      totals = getHandle.getValueState[(Long, Long)](
        "totals", Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE)
      byType = getHandle.getMapState[String, Long](
        "byType", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInitialState(user: Long, init: InitProfile,
                                    timerValues: TimerValues): Unit = {
      totals.update((init.n_events, init.value_cents))
      init.types.foreach { case (t, c) => byType.updateValue(t, c) }
    }

    override def handleInputRows(user: Long,
                                 rows: Iterator[(Long, String, Long)],
                                 timerValues: TimerValues): Iterator[UserProfile] =
      foldProfileRows(user, rows, totals, byType)
  }

  /** 2024-01-15T00:00:00Z — the history/stream cut for the warm start. */
  private val BootCutoffMicros = 1705276800000000L

  /** Warm-started profiles: everything before the cutoff is folded into
    * per-user initial state by ONE batch aggregation (never streamed);
    * only post-cutoff events flow through micro-batches. Output covers
    * users active in the stream window, with their FULL history in the
    * profile — the contract a deployed bootstrap has. */
  def userProfilesWarmStart(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = EventsStreaming.streamSession(spark)
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import ss.implicits._
    val name = s"stream_tws_boot_${System.nanoTime()}"
    val src = EventsStreaming.stageDir(sfDir)
    val div = EventsStreaming.tsDivisor(ss, src)
    val rawUs = ss.read.schema(EventsStreaming.rawSchema).parquet(src)
      .withColumn("ts", expr(s"ts div $div"))
    val hist = rawUs.filter(col("ts") < BootCutoffMicros)
    val initState = hist
      .groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("c"),
        sum(floor($"value" * 100).cast("long")).as("vc"))
      .groupBy($"user_id")
      .agg(sum("c").cast("long").as("n_events"),
        sum("vc").cast("long").as("value_cents"),
        map_from_entries(collect_list(struct($"event_type", $"c"))).as("types"))
      .as[(Long, Long, Long, Map[String, Long])]
      .groupByKey(_._1)
      .mapValues { case (_, n, vc, m) => InitProfile(n, vc, m) }
    val dir = new java.io.File(
      s"/root/repo/target/tmp/stream/twsboot_${System.nanoTime()}")
    org.apache.commons.io.FileUtils.deleteDirectory(dir)
    rawUs.filter(col("ts") >= BootCutoffMicros)
      .coalesce(1).write.parquet(dir.getPath)
    val stream = ss.readStream.schema(EventsStreaming.rawSchema)
      .parquet(dir.getPath)
      .select($"user_id", $"event_type",
        floor($"value" * 100).cast("long").as("cents"))
      .as[(Long, String, Long)]
    val profiles = stream
      .groupByKey(_._1)
      .transformWithState(new WarmStartProfileProcessor,
        TimeMode.None(), OutputMode.Update(), initState)
    val q = profiles.toDF().writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = ss.table(name)
      .groupBy("user_id")
      .agg(max_by(
        struct(col("n_events"), col("value_cents"), col("n_types"),
          col("top_type"), col("top_cnt")),
        col("n_events")).as("r"))
      .select(col("user_id"), col("r.n_events"), col("r.value_cents"),
        col("r.n_types"), col("r.top_type"), col("r.top_cnt"))
      .cache()
    out.count() // pin: the memory table is per-run, the result outlives it
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    out
  }

  case class TimedSession(user_id: Long, start_sec: Long, end_sec: Long,
                          n_events: Long)

  /** Per-user gap sessionization with EVENT-TIME TIMERS — the
    * transformWithState capability the old APIs could only approximate
    * with GroupStateTimeout: a session that no later event ever closes is
    * emitted by a registered timer the moment the WATERMARK passes
    * `last + gap`, not when a lucky next event happens to arrive for that
    * user. In-batch closures emit immediately; the open session and its
    * pending timer live in named state.
    *
    * Timer discipline: one pending timer per key, re-armed on every
    * batch (explicit deleteTimer — transformWithState timers don't
    * auto-replace). With watermark delay == gap and time-ordered input,
    * no event can be late for a session the timer already closed (same
    * contradiction proof as sessionWindowAgg), so the output is exactly
    * the batch gaps-and-islands rollup — every session, timer-flushed by
    * the staging sentinel's watermark push. */
  private class TimedSessionProcessor(gapSec: Long)
      extends StatefulProcessor[Long, (Long, java.sql.Timestamp), TimedSession] {

    // open session (start_sec, last_sec, n) and its armed timer (ms)
    @transient private var open: ValueState[(Long, Long, Long)] = _
    @transient private var armed: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      open = getHandle.getValueState[(Long, Long, Long)]("open",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE)
      armed = getHandle.getValueState[Long]("armed",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(user: Long,
                                 rows: Iterator[(Long, java.sql.Timestamp)],
                                 timerValues: TimerValues): Iterator[TimedSession] = {
      val ts = rows.map(_._2.getTime / 1000L).toArray.sorted
      val closed = scala.collection.mutable.ArrayBuffer.empty[TimedSession]
      var cur = if (open.exists()) Some(open.get()) else None
      ts.foreach { t =>
        cur match {
          case Some((s0, l0, n0)) if t - l0 <= gapSec =>
            cur = Some((s0, math.max(l0, t), n0 + 1))
          case Some((s0, l0, n0)) =>
            closed += TimedSession(user, s0, l0, n0)
            cur = Some((t, t, 1L))
          case None =>
            cur = Some((t, t, 1L))
        }
      }
      cur.foreach { c =>
        open.update(c)
        if (armed.exists()) getHandle.deleteTimer(armed.get())
        val at = (c._2 + gapSec) * 1000L + 1L
        getHandle.registerTimer(at)
        armed.update(at)
      }
      closed.iterator
    }

    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
                                    expired: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[TimedSession] = {
      // a freshly re-armed timer deletes its predecessor, so any firing
      // timer IS the current one — emit the open session and clear
      if (open.exists() && armed.exists() &&
          armed.get() == expired.getExpiryTimeInMs) {
        val (s0, l0, n0) = open.get()
        open.clear(); armed.clear()
        Iterator.single(TimedSession(user, s0, l0, n0))
      } else Iterator.empty
    }
  }

  /** Run the timer-closed sessionizer: staged events + a far-future
    * sentinel (user −1, written last) whose batch pushes the watermark
    * past every real `last + gap`, firing all pending timers — every real
    * session emits, deterministically, in a bounded AvailableNow run. */
  def timedSessions(spark: SparkSession, sfDir: String, gapMinutes: Int = 30,
                    inputDir: Option[String] = None,
                    maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val ss = EventsStreaming.streamSession(spark)
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import ss.implicits._
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val name = s"stream_tws_timer_${System.nanoTime()}"
    val src = inputDir.getOrElse(EventsStreaming.stageDir(sfDir))
    val div = EventsStreaming.tsDivisor(ss, src)
    // per-run staging with the sentinel written LAST (latest mtime) so
    // maxFilesPerTrigger runs see it in the final batch
    val dir = new java.io.File(
      s"/root/repo/target/tmp/stream/twstimer_${System.nanoTime()}")
    org.apache.commons.io.FileUtils.deleteDirectory(dir)
    dir.mkdirs()
    Option(new java.io.File(src).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
      .foreach(f => Files.copy(f.toPath, Paths.get(dir.getPath, f.getName),
        StandardCopyOption.COPY_ATTRIBUTES))
    val maxRaw = ss.read.schema(EventsStreaming.rawSchema).parquet(src)
      .agg(max("ts")).head().getLong(0)
    Seq((-1L, maxRaw * 2, -1L, "sentinel", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(dir.getPath)
    val reader = ss.readStream.schema(EventsStreaming.rawSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val stream = reader.parquet(dir.getPath)
      .withColumn("ts", EventsStreaming.rawTs(div))
      .withWatermark("ts", s"$gapMinutes minutes")
      .select($"user_id", $"ts")
      .as[(Long, java.sql.Timestamp)]
    val sessions = stream
      .groupByKey(_._1)
      .transformWithState(new TimedSessionProcessor(gapMinutes * 60L),
        TimeMode.EventTime(), OutputMode.Append())
    val q = sessions.toDF().writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = ss.table(name).filter(col("user_id") >= 0L).cache()
    out.count() // pin: the memory table is per-run, the result outlives it
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    out
  }

  /** Run the profile processor over the staged events stream and return
    * the final per-user profiles. transformWithState requires the RocksDB
    * state store (typed column families are a RocksDB capability), so the
    * derived session pins the provider — which also makes this query the
    * production-backend path the RocksDB spec used to cover alone.
    *
    * Update-mode memory sink appends one row per (user, batch); the final
    * profile is the row at each user's max n_events — n_events strictly
    * increases on every batch that emits for a user, so max_by is unique
    * even across multi-batch (maxFilesPerTrigger) runs. */
  def userProfiles(spark: SparkSession, sfDir: String,
                   inputDir: Option[String] = None,
                   maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val ss = EventsStreaming.streamSession(spark)
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import ss.implicits._
    val name = s"stream_tws_${System.nanoTime()}"
    val dir = inputDir.getOrElse(EventsStreaming.stageDir(sfDir))
    val reader = ss.readStream.schema(EventsStreaming.rawSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val stream = reader.parquet(dir)
      .select($"user_id", $"event_type",
        floor($"value" * 100).cast("long").as("cents"))
      .as[(Long, String, Long)]
    val profiles = stream
      .groupByKey(_._1)
      .transformWithState(new UserProfileProcessor,
        TimeMode.None(), OutputMode.Update())
    val q = profiles.toDF().writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = ss.table(name)
      .groupBy("user_id")
      .agg(max_by(
        struct(col("n_events"), col("value_cents"), col("n_types"),
          col("top_type"), col("top_cnt")),
        col("n_events")).as("r"))
      .select(col("user_id"), col("r.n_events"), col("r.value_cents"),
        col("r.n_types"), col("r.top_type"), col("r.top_cnt"))
      .cache()
    out.count() // pin: the memory table is per-run, the result outlives it
    out
  }

  case class TypeDistinct(event_type: String, est: Long)

  /** Per-event-type streaming distinct-user count: HyperLogLog registers
    * held in a ValueState, updated per row with the SAME reduce the
    * batch [[graft.functions.HllAggregator]] uses. Register-max merging
    * is order- and batching-INDEPENDENT, so after the last batch the
    * streaming estimate is BIT-EQUAL to the batch aggregator's — a
    * sketch whose streaming form is exactly-checkable, unlike any
    * decayed or order-sensitive summary. State is m = 2^p bytes per key,
    * bounded forever — the streaming-distinct shape that survives an
    * unbounded stream where exact per-key sets cannot. */
  private class HllDistinctProcessor(p: Int)
      extends StatefulProcessor[String, (String, Long), TypeDistinct] {

    @transient private var regs: ValueState[Array[Byte]] = _
    private val hll = new graft.functions.HllAggregator(p)

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      regs = getHandle.getValueState[Array[Byte]](
        "regs", Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(t: String, rows: Iterator[(String, Long)],
                                 timerValues: TimerValues): Iterator[TypeDistinct] = {
      val buf = if (regs.exists()) regs.get() else hll.zero
      rows.foreach { case (_, uid) => hll.reduce(buf, uid) }
      regs.update(buf)
      Iterator.single(TypeDistinct(t, hll.finish(buf)))
    }
  }

  /** Run the streaming HLL over the staged events and return one row per
    * event type with the FINAL estimate (registers only grow, so the
    * estimate is monotone across update-mode emissions — max is the
    * last). `maxFilesPerTrigger` splits batches to prove the cross-batch
    * state path in specs. */
  def typeDistinctUsers(spark: SparkSession, sfDir: String, p: Int = 11,
                        inputDir: Option[String] = None,
                        maxFilesPerTrigger: Option[Int] = None,
                        onQuery: org.apache.spark.sql.streaming.StreamingQuery
                          => Unit = _ => ()): DataFrame = {
    val ss = EventsStreaming.streamSession(spark)
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import ss.implicits._
    val name = s"stream_hll_${System.nanoTime()}"
    val dir = inputDir.getOrElse(EventsStreaming.stageDir(sfDir))
    val reader = ss.readStream.schema(EventsStreaming.rawSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val stream = reader.parquet(dir)
      .select($"event_type", $"user_id")
      .as[(String, Long)]
    val ests = stream
      .groupByKey(_._1)
      .transformWithState(new HllDistinctProcessor(p),
        TimeMode.None(), OutputMode.Update())
    val q = ests.toDF().writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    onQuery(q) // profiler hook: recentProgress (micro-batch count/times)
    val out = ss.table(name)
      .groupBy("event_type").agg(max("est").as("est"))
      .cache()
    out.count() // pin: the memory table is per-run, the result outlives it
    out
  }

  case class TopKCand(bkt: Long, seq: Long, user_id: Long, est_cnt: Long)

  /** FULLY-streaming heavy-hitter candidates: per BUCKET (item mod NB —
    * every occurrence of an item lands on one state key, so the bucket's
    * state sees the item's complete history), two named state variables:
    * a count-min sketch as a MapState (cell → count; the vector-sum merge
    * is order- and batch-split-invariant, see
    * [[graft.operators.CountMin]]) and the current CANDIDATE set as a
    * MapState capped at `candCap` (evictions drop the lowest
    * last-estimate, ties to the larger id — deterministic). This closes
    * the r9 gap where candidates were probed from the batch table at
    * read time: here the candidate set itself lives in stream state, so
    * an unbounded key universe never needs a batch-side pass. Each batch
    * the bucket re-estimates its candidates against the updated sketch
    * and emits them with a per-bucket SEQUENCE (cumulative row count) —
    * a bucket's sketch only changes in batches that touch it, so the
    * max-seq emission per bucket IS its final state.
    *
    * Scale shape: state per bucket ≤ 4·distinct cells + candCap entries,
    * bounded forever; buckets spread the universe across partitions. The
    * oracle replays exactly while no bucket exceeds candCap distinct
    * items (no eviction → candidates = all seen items, estimates pure
    * arithmetic); past the cap the result degrades to approximate
    * heavy-hitters, the documented production trade. */
  private class CmsTopKProcessor(candCap: Int)
      extends StatefulProcessor[Long, Long, TopKCand] {
    import graft.operators.CountMin

    @transient private var sketch: MapState[Long, Long] = _
    @transient private var cand: MapState[Long, Long] = _
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      sketch = getHandle.getMapState[Long, Long](
        "sketch", Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
      cand = getHandle.getMapState[Long, Long](
        "cand", Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
      seen = getHandle.getValueState[Long](
        "seen", Encoders.scalaLong, TTLConfig.NONE)
    }

    private def estimate(item: Long): Long =
      (0 until CountMin.Depth).map { r =>
        val c = CountMin.cellOf(item, r)
        if (sketch.containsKey(c)) sketch.getValue(c) else 0L
      }.min

    override def handleInputRows(bkt: Long, rows: Iterator[Long],
                                 timerValues: TimerValues): Iterator[TopKCand] = {
      // fold the batch to per-item counts first: the merge into the
      // sketch is then one vector add per item — row order irrelevant
      val batch = scala.collection.mutable.HashMap.empty[Long, Long]
      var n = 0L
      rows.foreach { u => batch.update(u, batch.getOrElse(u, 0L) + 1L); n += 1 }
      batch.foreach { case (u, c) =>
        var r = 0
        while (r < CountMin.Depth) {
          val cl = CountMin.cellOf(u, r)
          val prev = if (sketch.containsKey(cl)) sketch.getValue(cl) else 0L
          sketch.updateValue(cl, prev + c)
          r += 1
        }
      }
      batch.keysIterator.foreach(u => cand.updateValue(u, estimate(u)))
      val entries = cand.iterator().toArray
      if (entries.length > candCap)
        entries.sortBy { case (u, e) => (e, -u) }
          .take(entries.length - candCap)
          .foreach { case (u, _) => cand.removeKey(u) }
      val s = (if (seen.exists()) seen.get() else 0L) + n
      seen.update(s)
      cand.iterator().map { case (u, _) => TopKCand(bkt, s, u, estimate(u)) }
    }
  }

  /** Streaming top-k heavy hitters with NO batch-side probe: the staged
    * events stream through [[CmsTopKProcessor]] buckets (forced into
    * `nSplits` micro-batches via a repartitioned stage +
    * maxFilesPerTrigger=1 — the result is batch-split-invariant, which
    * the spec pins by varying the split), each bucket's final emission
    * carries its candidates estimated against its final sketch, and the
    * global top-k ranks the tiny union by (estimate desc, id asc).
    * Output: (rank, user_id, est_cnt). */
  def cmsTopKTws(spark: SparkSession, sfDir: String, k: Int,
                 buckets: Int = 32, candCap: Int = 4096,
                 nSplits: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ss = EventsStreaming.streamSession(spark)
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import ss.implicits._
    val name = s"stream_cms_tws_${System.nanoTime()}"
    val key = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val dir = new java.io.File(
      s"/root/repo/target/tmp/stream/cms_split${nSplits}_$key")
    graft.DerivedCache.ensure(dir,
        Seq(new java.io.File(s"$sfDir/events.parquet")), "_SUCCESS") {
      ss.read.schema(EventsStreaming.rawSchema)
        .parquet(s"$sfDir/events.parquet")
        .repartition(nSplits)
        .write.mode("overwrite").parquet(dir.getPath)
    }
    val stream = ss.readStream.schema(EventsStreaming.rawSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.getPath)
      .select($"user_id").as[Long]
    val cands = stream
      .groupByKey(_ % buckets)
      .transformWithState(new CmsTopKProcessor(candCap),
        TimeMode.None(), OutputMode.Update())
    val q = cands.toDF().writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val tbl = ss.table(name)
    // latest emission per bucket = its final candidates + final sketch
    val last = tbl
      .withColumn("mx", max("seq").over(Window.partitionBy("bkt")))
      .filter(col("seq") === col("mx"))
    val out = last
      .orderBy(col("est_cnt").desc, col("user_id")).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("est_cnt").desc, col("user_id"))).cast("long"))
      .select(col("rank"), col("user_id"), col("est_cnt"))
      .cache()
    out.count() // pin: the memory table is per-run, the result outlives it
    out
  }
}
