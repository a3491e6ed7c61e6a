package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization (engine-added): the pandas
  * `resample/asfreq + ffill` pair the reference's analytics stack gets
  * for free and SQL engines make you build — aggregate onto a fixed
  * grid, materialize the EMPTY buckets, and carry the last observation
  * forward across gaps.
  *
  * Scale shape: the spine (key × hour grid) is generated, not stored —
  * one row per key from the aggregate, exploded by `sequence()`, so the
  * expensive side is exactly the aggregate the caller already pays for.
  * The forward fill is a running `last(ignoreNulls)` window partitioned
  * by key: each key's series sorts independently (no global-order
  * funnel), and a key's history at 100 TB is bounded by the grid, not by
  * the event count.
  */
object TimeSeries {

  /** Hourly resample of `df` with forward-filled gaps.
    *
    * Aggregates `valCol` (caller-quantized if cross-engine exactness
    * matters — sums happen here) per (`keyCol`, hour), then left-joins a
    * per-key spine covering every hour from the KEY'S first to its last
    * observation and forward-fills missing sums. Output:
    * (keyCol, hour_ts, val, is_filled) — `val` is never null because
    * every key's spine starts at an observed hour. */
  /** Gap-based sessionization: assign each row a per-key `session_idx`
    * (1-based) that increments whenever the gap to the key's previous
    * event exceeds `gapSeconds` (strictly greater — an event exactly at
    * the threshold still belongs to the running session). The classic
    * batch complement of Structured Streaming's `session_window`.
    *
    * Scale shape: ONE window partitioned by key ordered by
    * (`tsCol`, `tieCol`) computes both the lag and the running sum —
    * each key's history sorts independently, no global order. The gap
    * test runs on integer microseconds so both engines agree exactly. */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
                 tieCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(tsCol, tieCol)
    val us = unix_micros(col(tsCol))
    val prevUs = lag(us, 1).over(w)
    val newSession = when(
      prevUs.isNull || us - prevUs > gapSeconds * 1000000L, 1L).otherwise(0L)
    df.withColumn("session_idx",
      sum(newSession).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session rollup of [[sessionize]]: one row per (key, session)
    * with event count, start/end timestamps, and exact integer duration
    * in microseconds. */
  def sessionSummaries(df: DataFrame, keyCol: String, tsCol: String,
                       tieCol: String, gapSeconds: Long): DataFrame =
    sessionize(df, keyCol, tsCol, tieCol, gapSeconds)
      .groupBy(col(keyCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        (unix_micros(max(col(tsCol))) - unix_micros(min(col(tsCol))))
          .as("duration_us"))

  def hourlyResampleFfill(df: DataFrame, keyCol: String, tsCol: String,
                          valCol: String): DataFrame = {
    val hourly = df
      .groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("hour_ts"))
      .agg(sum(col(valCol)).as("__v"))
    // per-key spine: sequence() over the key's own [min, max] hour range —
    // generated from the aggregate's 2-column summary, never from raw data
    val spine = hourly
      .groupBy(col(keyCol))
      .agg(min(col("hour_ts")).as("__lo"), max(col("hour_ts")).as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"), expr("INTERVAL 1 HOUR")))
          .as("hour_ts"))
    val w = Window.partitionBy(keyCol).orderBy("hour_ts")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .join(hourly, Seq(keyCol, "hour_ts"), "left")
      .select(col(keyCol), col("hour_ts"),
        last(col("__v"), ignoreNulls = true).over(w).as("val"),
        col("__v").isNull.as("is_filled"))
  }

  /** Hourly resample with LINEAR interpolation — the pandas
    * asfreq/interpolate pair next to [[hourlyResampleFfill]]'s ffill:
    * each gap hour takes `prev + (next − prev)·(h − h_prev) div
    * (h_next − h_prev)` over integer hour indexes and long-quantized
    * values, so the fill is exact and cross-engine bit-stable
    * (truncating integer division both sides — DuckDB's `//` and
    * Spark's `div` agree on negatives too). The per-key spine spans
    * [min, max] known hours, so every gap has both neighbors. Two
    * per-key windows (prev-carry, next-carry), no global funnel. */
  def hourlyResampleInterp(df: DataFrame, keyCol: String, tsCol: String,
                           valCol: String): DataFrame = {
    val hourly = df
      .groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("hour_ts"))
      .agg(sum(col(valCol)).as("__v"))
    val spine = hourly
      .groupBy(col(keyCol))
      .agg(min(col("hour_ts")).as("__lo"), max(col("hour_ts")).as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"), expr("INTERVAL 1 HOUR")))
          .as("hour_ts"))
    val wPrev = Window.partitionBy(keyCol).orderBy("hour_ts")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(keyCol).orderBy("hour_ts")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    spine
      .join(hourly, Seq(keyCol, "hour_ts"), "left")
      .withColumn("__h", expr("unix_micros(hour_ts) div 3600000000"))
      .withColumn("__pv", last(col("__v"), ignoreNulls = true).over(wPrev))
      .withColumn("__ph", last(when(col("__v").isNotNull, col("__h")),
        ignoreNulls = true).over(wPrev))
      .withColumn("__nv", first(col("__v"), ignoreNulls = true).over(wNext))
      .withColumn("__nh", first(when(col("__v").isNotNull, col("__h")),
        ignoreNulls = true).over(wNext))
      .select(col(keyCol), col("hour_ts"),
        when(col("__v").isNotNull, col("__v"))
          .otherwise(expr("__pv + ((__nv - __pv) * (__h - __ph)) div (__nh - __ph)"))
          .as("val"),
        col("__v").isNull.as("is_filled"))
  }

  /** Coalesce overlapping-or-touching intervals per key — coverage
    * merging (uptime windows, validity ranges, span dedup): the classic
    * gaps-and-islands form on intervals rather than points. An interval
    * starts a new island iff its `lo` exceeds the running MAX of all
    * previous `hi` in its key (a plain lag(hi) is WRONG — an earlier
    * long interval can swallow several later ones); islands then
    * aggregate to (min lo, max hi, n_merged).
    *
    * Scale shape: ONE window partitioned by key (each key's intervals
    * sort independently, no global order) + one hash aggregate. Integer
    * bounds keep both engines bit-equal. Touching intervals
    * ([1,5],[5,9]) merge — `hi` is inclusive coverage. */
  def mergeIntervals(df: DataFrame, keyCol: String, loCol: String,
                     hiCol: String): DataFrame = {
    val wPrev = Window.partitionBy(keyCol).orderBy(col("__lo"), col("__hi"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(keyCol).orderBy(col("__lo"), col("__hi"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(keyCol), col(loCol).cast("long").as("__lo"),
        col(hiCol).cast("long").as("__hi"))
      .withColumn("__new",
        when(col("__lo") > coalesce(max("__hi").over(wPrev), lit(Long.MinValue)),
          lit(1L)).otherwise(lit(0L)))
      .withColumn("__island", sum("__new").over(wRun))
      .groupBy(col(keyCol), col("__island"))
      .agg(min("__lo").as("lo"), max("__hi").as("hi"),
        count(lit(1)).as("n_merged"))
      .select(col(keyCol), col("lo"), col("hi"), col("n_merged"))
  }

  /** Lagged cross-correlation of two event streams on an hourly grid —
    * "does series B follow series A, and by how many hours?" (lead-lag
    * analysis: clicks→purchases, deploys→errors). For each lag
    * k ∈ [0, maxLag], `score(k) = Σ_h a(h) · b(h+k)` over hourly COUNTS,
    * so every score is an exact BIGINT and the whole correlogram
    * replays on any engine; the caller reads the argmax off the top.
    *
    * Scale shape: the raw streams collapse to hourly counts FIRST (one
    * map-side-combined aggregate each — the only pass over the data);
    * the lag expansion multiplies the ROLLED-UP series (O(hours·lags)
    * rows, independent of event count) and aligns with one hash
    * equi-join on the shifted hour. Lags with no overlap emit score 0
    * rather than vanishing — the spine left-join keeps the correlogram
    * rectangular. */
  def crossCorrelation(events: DataFrame, tsCol: String, typeCol: String,
                       typeA: String, typeB: String, maxLag: Int): DataFrame = {
    require(maxLag >= 0, s"maxLag must be >= 0, got $maxLag")
    def hourly(t: String, cnt: String) = events
      .filter(col(typeCol) === t)
      .select(expr(s"unix_micros($tsCol) div 1000000 div 3600").as("h"))
      .groupBy("h").agg(count(lit(1)).as(cnt))
    val ca = hourly(typeA, "ca")
    val cb = hourly(typeB, "cb")
    val lagged = ca
      .select(col("h"), col("ca"),
        explode(sequence(lit(0L), lit(maxLag.toLong))).as("lag"))
      .select((col("h") + col("lag")).as("hb"), col("lag"), col("ca"))
    val scores = lagged.join(cb.withColumnRenamed("h", "hb"), "hb")
      .groupBy("lag").agg(sum(col("ca") * col("cb")).as("score"))
    val spine = events.sparkSession.range(1)
      .select(explode(sequence(lit(0L), lit(maxLag.toLong))).as("lag"))
    spine.join(scores, Seq("lag"), "left")
      .select(col("lag"), coalesce(col("score"), lit(0L)).as("score"))
  }
}
