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
                                 timerValues: TimerValues): Iterator[UserProfile] = {
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
}
