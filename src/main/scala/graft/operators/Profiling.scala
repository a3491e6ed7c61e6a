package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table profiling — the ANALYZE-style statistics pass every warehouse
  * maintains (row counts, null counts, distinct counts, min/max per
  * column). The reference profiles implicitly (pandas `.describe()` /
  * `.info()` during cleaning); here it is one DISTRIBUTED aggregation
  * over the table producing a long-format stats frame that can feed
  * cost-based decisions (broadcast-ability, skew suspicion, pruning
  * bounds) or data-quality gates.
  *
  * Scale shape: ONE scan, all columns' aggregates computed together.
  * With `approxNdv` (the 100 TB default) distinct counts are HLL
  * (`approx_count_distinct`) and the plan is a single partial+final
  * aggregate — no shuffle of data rows, only of sketch buffers. Exact
  * NDV (the oracle-checkable form) pays Spark's multi-distinct Expand:
  * one duplicated pass per distinct column — fine at audit scale,
  * documented as the expensive form.
  */
object Profiling {

  /** Long-format column stats: (column_name, n, n_null, ndv, min_v,
    * max_v), one row per requested column. `n` counts non-null values
    * (SQL COUNT(col) semantics); min/max are rendered as strings so the
    * frame is uniform across column types — keep to integer/string/date
    * columns when cross-engine string equality matters (double
    * formatting differs between engines).
    *
    * Plan shapes (both Expand- and SortAggregate-free — a naive
    * `agg(countDistinct(a), countDistinct(b), …)` becomes a 5×-row
    * Expand into a sort aggregate keyed on every profiled column,
    * measured 5× slower at sf0.1):
    *  - approxNdv=true: ONE scan, one hash aggregate, HLL buffers.
    *  - exact: scan 1 aggregates n/n_null/min/max for all columns
    *    together; scan 2 melts values to (column, value) pairs and
    *    counts distinct per column as two hash aggregates (map-side
    *    dedup first, so the shuffle carries unique pairs, not rows). */
  def columnStats(df: DataFrame, cols: Seq[String],
                  approxNdv: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__n_null"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max")) ++
        (if (approxNdv) Seq(approx_count_distinct(col(c)).as(s"${c}__ndv"))
         else Seq.empty)
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    if (approxNdv) {
      val stacked = cols.map(c =>
        s"'$c', `${c}__n`, `${c}__n_null`, `${c}__ndv`, `${c}__min`, `${c}__max`")
        .mkString(", ")
      row.select(expr(
        s"stack(${cols.size}, $stacked) AS (column_name, n, n_null, ndv, min_v, max_v)"))
    } else {
      val stacked = cols.map(c =>
        s"'$c', `${c}__n`, `${c}__n_null`, `${c}__min`, `${c}__max`")
        .mkString(", ")
      val basic = row.select(expr(
        s"stack(${cols.size}, $stacked) AS (column_name, n, n_null, min_v, max_v)"))
      val pairs = cols.map(c =>
        s"'$c', CAST(`$c` AS STRING)").mkString(", ")
      val ndv = df
        .select(expr(s"stack(${cols.size}, $pairs) AS (column_name, v)"))
        .filter(col("v").isNotNull)
        .groupBy("column_name", "v").agg(lit(1))
        .groupBy("column_name").agg(count(lit(1)).as("ndv"))
      basic.join(ndv, Seq("column_name"))
        .select("column_name", "n", "n_null", "ndv", "min_v", "max_v")
    }
  }

  /** Winsorization — clip a numeric column to its [pLo, pHi] quantiles,
    * the robust-scaling step of numeric feature cleaning (a fat-fingered
    * price or a sensor spike otherwise dominates every mean/variance
    * downstream). The cut points are EXACT (Spark `percentile`
    * semantics — linear interpolation, bit-identical to DuckDB's
    * quantile_cont on the gated data), then the clip is a pure
    * scan-side projection with the two scalars inlined — the 100 TB
    * pass never shuffles.
    *
    * Cut-point plan: winsorize cuts are TAIL quantiles, and the exact
    * value at ascending rank r needs only the r+2 smallest (or n−r
    * largest) values — a heap-based TakeOrdered of a few thousand rows,
    * not `percentile`'s full value buffer (which sorts every value per
    * cut: 5 s at sf0.1 where the TakeOrdered pair costs well under 1).
    * Falls back to one `percentile(col, array(lo, hi))` aggregate
    * (single shared buffer) when a cut sits too deep for a bounded
    * driver pull, and to `approx_percentile` when `approx` is set (the
    * only honest knob once n·p outgrows any single buffer). */
  def winsorize(df: DataFrame, column: String, pLo: Double, pHi: Double,
                approx: Boolean = false): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, "need 0 <= pLo < pHi <= 1")
    val cuts =
      if (approx) {
        val r = df.agg(expr(s"approx_percentile($column, array($pLo, $pHi))")).head()
        if (r.isNullAt(0)) None
        else { val s = r.getSeq[Double](0); Some((s(0), s(1))) }
      } else exactTailCuts(df, column, pLo, pHi)
    cuts match {
      case None => df.withColumn(column, col(column).cast("double"))
      case Some((lo, hi)) =>
        df.withColumn(column,
          when(col(column) < lo, lo)
            .when(col(column) > hi, hi)
            .otherwise(col(column).cast("double")))
    }
  }

  /** Largest rank-window a cut may pull to the driver on the TakeOrdered
    * path: 4 M doubles ≈ 32 MB. Deeper cuts fall back to the aggregate. */
  private val maxCutPull = 4000000L

  /** Exact [pLo, pHi] cut points with Spark-`percentile` interpolation:
    * position p·(n−1), value (f+1−pos)·v[f] + (pos−f)·v[f+1] on the
    * ascending order statistics — replicated verbatim (differential
    * spec pins equality against the aggregate), computed from two
    * bounded TakeOrdered pulls when the ranks are tail-shallow. */
  private def exactTailCuts(df: DataFrame, column: String,
                            pLo: Double, pHi: Double): Option[(Double, Double)] = {
    val vals = df.select(col(column).cast("double").as("v")).filter(col("v").isNotNull)
    val n = vals.count()
    if (n == 0) return None
    val posLo = pLo * (n - 1); val fLo = math.floor(posLo).toLong
    val posHi = pHi * (n - 1); val fHi = math.floor(posHi).toLong
    val pullLo = fLo + 2       // ascending ranks 0 .. fLo+1
    val pullHi = n - fHi       // descending ranks covering fHi, fHi+1
    def interp(pos: Double, f: Long, vf: Double, vf1: Double): Double =
      if (pos == f) vf else (f + 1 - pos) * vf + (pos - f) * vf1
    if (pullLo <= maxCutPull && pullHi <= maxCutPull) {
      val asc = vals.orderBy(col("v")).limit(pullLo.toInt)
        .collect().map(_.getDouble(0))
      val desc = vals.orderBy(col("v").desc).limit(pullHi.toInt)
        .collect().map(_.getDouble(0))
      val lo =
        if (fLo >= n - 1) asc.last
        else interp(posLo, fLo, asc(fLo.toInt), asc(fLo.toInt + 1))
      val hi =
        if (fHi >= n - 1) desc.head
        else interp(posHi, fHi, desc((n - 1 - fHi).toInt), desc((n - 2 - fHi).toInt))
      Some((lo, hi))
    } else {
      val cuts = df.agg(expr(s"percentile($column, array($pLo, $pHi))"))
        .head().getSeq[Any](0).map(_.toString.toDouble)
      Some((cuts(0), cuts(1)))
    }
  }

  /** Robust per-group outlier detection via median absolute deviation —
    * the screen a feature pipeline runs where mean/stddev would be dragged
    * by the very outliers it hunts (one 1e9 row moves a z-score fence;
    * the median fence doesn't move).
    *
    * Flags x where |x - median| > k·MAD. Two aggregate passes (medians,
    * then deviation medians) + one scan — each is a hash aggregate on
    * `groupCol`, no window, no per-group sort buffer beyond `percentile`'s
    * own, so the shape survives a 100× scale-up (swap `percentile` for
    * `approx_percentile` past memory, as winsorize documents). Exact
    * `percentile` is bit-identical to DuckDB's quantile_cont, which keeps
    * the operator hash-gateable. Output: one row per group with the fence
    * (median, mad) and the outlier count against the group's population. */
  def madOutliers(df: DataFrame, groupCol: String, column: String,
                  k: Double): DataFrame = {
    // reserved __-prefixed internals + Column-op expressions (no string
    // SQL), so an input that already carries a med/mad column — or a name
    // needing backticks — can't collide or break parsing
    val v = col(column)
    val med = df.groupBy(groupCol)
      .agg(percentile(v, lit(0.5)).as("__med"))
    val fences = df.join(med, groupCol)
      .groupBy(groupCol)
      .agg(percentile(abs(v - col("__med")), lit(0.5)).as("__mad"),
        first(col("__med")).as("__med"))
    df.join(fences, groupCol)
      .groupBy(groupCol)
      .agg(
        first(col("__med")).as("med"),
        first(col("__mad")).as("mad"),
        sum(when(abs(v - col("__med")) > lit(k) * col("__mad"), 1L)
          .otherwise(0L)).as("n_outliers"),
        count(lit(1)).as("n_rows"))
  }

  /** EXACT deep-rank order statistics (median included) per group WITHOUT
    * a global sort — the complement of [[exactTailCuts]], whose
    * TakeOrdered trick only reaches tail-shallow ranks. The classic
    * histogram-pruning selection:
    *
    *  1. one hash aggregate → per-group (count, min, max);
    *  2. one hash aggregate → per-group bucket histogram over `buckets`
    *     equi-width integer buckets (collected: ≤ groups×buckets bounded
    *     rows — a MODEL input, like a codebook, never "the data");
    *  3. the driver walks each group's cumulative counts to find the one
    *     bucket holding each target rank k = floor(q·(n−1)) + 1;
    *  4. one more scan keeps ONLY rows in the ≤ groups×|qs| target
    *     buckets (broadcast-joined plan targets) and a windowed
    *     row_number over that ~n/buckets-sized remnant reads off the
    *     exact rank-k value.
    *
    * Total: three scans + one shuffle of the pruned remnant, each group's
    * sort buffer ~n_g/buckets rows — survives a 100× scale-up where
    * `ORDER BY` over the table would not, and stays EXACT where
    * `approx_percentile` gives rank-error bars. Values are longs
    * (pre-quantize doubles — the repo's oracle discipline: an exact rank
    * statistic over longs is engine-portable; cents, not pounds).
    *
    * Output: (group, q_pct, n, v) — `q_pct` an integer percentage,
    * `v` the exact value at 1-based ascending rank floor(q·(n−1))+1. */
  def exactQuantilesByHistogram(df: DataFrame, groupCol: String,
                                valueCol: String, qPcts: Seq[Int],
                                buckets: Int = 1024,
                                maxGroups: Int = 4096): DataFrame = {
    require(qPcts.nonEmpty && qPcts.forall(p => p >= 0 && p <= 100),
      s"q percentages must be in [0,100], got $qPcts")
    require(buckets >= 2, s"need >= 2 buckets, got $buckets")
    val spark = df.sparkSession
    import spark.implicits._
    val v = col(valueCol)
    val rows = df.select(col(groupCol).as("__g"), v.as("__v")).filter($"__v".isNotNull)

    val stats = rows.groupBy("__g")
      .agg(count(lit(1)).as("n"), min("__v").as("lo"), max("__v").as("hi"))
      .as[(String, Long, Long, Long)].collect()
    require(stats.length <= maxGroups,
      s"${stats.length} groups exceed maxGroups=$maxGroups — histogram collect " +
        "would not be model-sized; aggregate further or raise the bound")
    val statMap = stats.map { case (g, n, lo, hi) => g -> ((n, lo, hi)) }.toMap

    // equi-width integer bucket: ((v-lo)*buckets) div (range+1) — monotone
    // in v, branch-free, overflow-safe while range*buckets fits a long
    val statsDf = stats.toSeq.toDF("__g", "__n", "__lo", "__hi")
    def bucketOf = expr(s"((__v - __lo) * $buckets) div (__hi - __lo + 1)")
    val hist = rows.join(broadcast(statsDf), "__g")
      .select($"__g", bucketOf.cast("long").as("__b"))
      .groupBy("__g", "__b").agg(count(lit(1)).as("__c"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).map { case (g, bs) =>
        g -> bs.map(t => t._2 -> t._3).sortBy(_._1)
      }

    // driver walk: per (group, q) → (bucket holding rank k, rank within bucket)
    val targets = for {
      (g, (n, _, _)) <- statMap.toSeq
      qp <- qPcts
    } yield {
      val k = math.floor((qp / 100.0) * (n - 1)).toLong + 1
      var cum = 0L
      var hit = (-1L, -1L)
      hist(g).foreach { case (b, c) =>
        if (hit._1 < 0 && cum + c >= k) hit = (b, k - cum)
        cum += c
      }
      (g, qp.toLong, n, hit._1, hit._2)
    }
    val targetDf = targets.toDF("__g", "q_pct", "__n", "__b", "__j")

    val w = Window.partitionBy("__g", "q_pct").orderBy("__v")
    rows.join(broadcast(statsDf.select("__g", "__lo", "__hi")), "__g")
      .select($"__g", $"__v", bucketOf.cast("long").as("__b"))
      .join(broadcast(targetDf), Seq("__g", "__b"))
      .withColumn("__rn", row_number().over(w))
      .filter($"__rn" === $"__j")
      .select($"__g".as(groupCol), $"q_pct", $"__n".as("n"), $"__v".as("v"))
  }

  /** Distribution-drift monitor: per-group total-variation distance
    * between a REFERENCE table's value distribution and a CURRENT batch,
    * over the reference's frozen equi-width binning (the standard PSI
    * practice: bins come from the baseline; current values outside the
    * reference range clamp into the edge bins, so range drift is visible
    * as edge-bin mass). The gate a training-data pipeline runs on every
    * ingest: "does today's crawl still look like the corpus?"
    *
    * TV = ½·Σ_b |p_b − q_b| stays in integers as
    * `(Σ_b |ref_c·N_cur − cur_c·N_ref|) · 500000 div (N_ref·N_cur)`,
    * reported as `tv_q` in millionths (0 = identical, 1000000 = disjoint;
    * a group absent from `cur` reports the full 1000000). `top_bucket` /
    * `top_delta_q` localize the worst bin (largest |p−q|, smaller bucket
    * id on ties).
    *
    * Scale shape: reference stats are a broadcast model; each side is one
    * scan + one hash aggregate on (group, bucket); the join/agg that
    * follows runs over ≤ groups×buckets bounded rows. Nothing collects.
    * Integer arithmetic throughout → DuckDB-replayable. */
  def histogramDrift(ref: DataFrame, cur: DataFrame, groupCol: String,
                     valueCol: String, buckets: Int = 64): DataFrame = {
    val rstats = referenceStats(ref, groupCol, valueCol)
    driftFromHistogram(
      histogramCounts(ref, rstats, groupCol, valueCol, buckets, clamp = false),
      rstats, cur, groupCol, valueCol, buckets)
  }

  /** Frozen reference binning: per-group (lo, hi) of `valueCol` —
    * computed once from the baseline corpus and then carried, so bins
    * never move under the monitor. Output: (__g, __lo, __hi). */
  def referenceStats(ref: DataFrame, groupCol: String,
                     valueCol: String): DataFrame =
    ref.select(col(groupCol).as("__g"), col(valueCol).as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy("__g")
      .agg(min("__v").as("__lo"), max("__v").as("__hi"))

  /** Bucket counts of `df` under a FROZEN binning (`stats` from
    * [[referenceStats]]): one scan + one hash aggregate. With `clamp`,
    * out-of-range values land in the edge bins (any table other than the
    * one that defined the binning needs it). Counts are additive per
    * (__g, __b), so snapshots maintain incrementally via
    * [[Incremental.mergeAdditive]] — the reference histogram of a
    * growing corpus updates O(|delta|), never rescanning the base.
    * Output: (__g, __b, __c). */
  def histogramCounts(df: DataFrame, stats: DataFrame, groupCol: String,
                      valueCol: String, buckets: Int,
                      clamp: Boolean): DataFrame = {
    require(buckets >= 2, s"need >= 2 buckets, got $buckets")
    val bucketOf = expr(s"((__v - __lo) * $buckets) div (__hi - __lo + 1)")
    val b = if (clamp) least(greatest(bucketOf, lit(0L)), lit(buckets - 1L)) else bucketOf
    df.select(col(groupCol).as("__g"), col(valueCol).as("__v"))
      .filter(col("__v").isNotNull)
      .join(broadcast(stats), "__g")
      .select(col("__g"), b.cast("long").as("__b"))
      .groupBy("__g", "__b").agg(count(lit(1)).as("__c"))
  }

  /** [[histogramDrift]] against a PRE-BUILT reference histogram
    * (__g, __b, __c) + its frozen stats — the maintained-snapshot form:
    * the reference side costs nothing per batch beyond reading the
    * bounded count table. */
  def driftFromHistogram(refHist: DataFrame, refStats: DataFrame,
                         cur: DataFrame, groupCol: String, valueCol: String,
                         buckets: Int = 64): DataFrame = {
    val spark = cur.sparkSession
    import spark.implicits._
    val rb = refHist.withColumnRenamed("__c", "__rc")
    val cb = histogramCounts(cur, refStats, groupCol, valueCol, buckets, clamp = true)
      .withColumnRenamed("__c", "__cc")
    val joined = rb.join(cb, Seq("__g", "__b"), "full_outer")
      .select($"__g", $"__b",
        coalesce($"__rc", lit(0L)).as("__rc"), coalesce($"__cc", lit(0L)).as("__cc"))
    val totals = joined.groupBy("__g")
      .agg(sum("__rc").as("__nr"), sum("__cc").as("__nc"))
    joined.join(broadcast(totals), "__g")
      .groupBy("__g")
      .agg(
        first($"__nr").as("n_ref"), first($"__nc").as("n_cur"),
        sum(abs($"__rc" * $"__nc" - $"__cc" * $"__nr")).as("__s"),
        min(struct((-abs($"__rc" * $"__nc" - $"__cc" * $"__nr")).as("__d"),
          $"__b")).as("__top"))
      .select(
        $"__g".as(groupCol), $"n_ref", $"n_cur",
        when($"n_cur" === 0 || $"n_ref" === 0, lit(1000000L))
          .otherwise(expr("(__s * 500000) div (n_ref * n_cur)")).as("tv_q"),
        $"__top.__b".as("top_bucket"),
        when($"n_cur" === 0 || $"n_ref" === 0, lit(1000000L))
          .otherwise(expr("((-__top.__d) * 1000000) div (n_ref * n_cur)"))
          .as("top_delta_q"))
  }

  /** Per-group min-max feature scaling — the standard ML normalization
    * pass: each value of the LONG column `valCol` maps to its integer
    * percentage position inside its group's [min, max] range
    * (`div` truncation, 0 for a constant group). Two-pass shape: one
    * hash aggregate builds the per-group stats (group-count-sized — a
    * broadcast model, like a codebook), then the apply is a scan-side
    * projection behind a broadcast join. No window, no sort; integer
    * arithmetic end to end so both engines agree bit-for-bit. */
  def minMaxScale(df: DataFrame, keyCol: String, valCol: String,
                  outCol: String = "scaled_pct"): DataFrame = {
    require(df.schema(valCol).dataType ==
      org.apache.spark.sql.types.LongType,
      s"$valCol must be LONG (quantize doubles first — integer scaling " +
        "is what keeps the result engine-exact)")
    val stats = df.groupBy(col(keyCol))
      .agg(min(col(valCol)).as("__mn"), max(col(valCol)).as("__mx"))
    df.join(broadcast(stats), keyCol)
      .withColumn(outCol,
        when(col("__mx") === col("__mn"), lit(0L))
          .otherwise(expr(s"(100 * ($valCol - __mn)) div (__mx - __mn)")))
      .drop("__mn", "__mx")
  }

  /** Exact per-group OLS slope components — the least-squares building
    * block as pure integer sums: for y = a + b·x,
    * `b = b_num / b_den` with `b_num = n·Σxy − Σx·Σy` and
    * `b_den = n·Σxx − (Σx)²`, every term a BIGINT over the caller's
    * QUANTIZED x/y (the engine-exact discipline: the division is the
    * caller's, the components hash bit-for-bit on any engine). One
    * map-side-combined hash aggregate — the trend-per-segment pass a
    * feature pipeline runs at full scale. A constant-x group has
    * b_den = 0 (slope undefined); emitting the raw components makes
    * that case explicit instead of a NaN. Inputs must be LONG and
    * small enough that n·Σxy stays under 2⁶³ — quantize accordingly.
    * Rows with a NULL x or y are excluded up front so n counts exactly
    * the points that feed the sums (a count(1) over all rows would
    * make the components inconsistent with OLS over non-null points). */
  def linearFitComponents(df: DataFrame, keyCol: String, xCol: String,
                          yCol: String): DataFrame = {
    Seq(xCol, yCol).foreach { c =>
      require(df.schema(c).dataType ==
        org.apache.spark.sql.types.LongType,
        s"$c must be LONG (quantize doubles first)")
    }
    df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col(xCol)).as("__sx"), sum(col(yCol)).as("__sy"),
        sum(col(xCol) * col(yCol)).as("__sxy"),
        sum(col(xCol) * col(xCol)).as("__sxx"))
      .select(col(keyCol), col("n"),
        (col("n") * col("__sxy") - col("__sx") * col("__sy")).as("b_num"),
        (col("n") * col("__sxx") - col("__sx") * col("__sx")).as("b_den"))
  }

  /** floor(1000 · log10(1 + 1/d)) for d = 1..9 — Benford's law in
    * permille, precomputed so no engine evaluates a transcendental. */
  val BenfordPermille: Seq[Long] =
    Seq(301L, 176L, 125L, 97L, 79L, 67L, 58L, 51L, 46L)

  /** Benford first-digit screen — the classic fabricated-numbers /
    * broken-ETL tripwire: naturally-occurring multi-magnitude amounts
    * follow log-uniform first digits, and a column that suddenly
    * doesn't (constant defaults, truncated loads, synthetic padding)
    * jumps out as per-digit deviation. One scan-side digit projection
    * (first character of the floored value — no log, no division per
    * row), one 9-bucket aggregate, observed frequencies in integer
    * permille against the precomputed expectation. Non-positive values
    * are out of Benford's domain and are excluded (reported share is
    * the caller's concern). Output: (digit, cnt, obs_permille,
    * exp_permille, dev_permille), one row per digit 1..9 always. */
  def benfordFirstDigit(df: DataFrame, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val digits = df
      .select(substring(floor(col(valueCol)).cast("long").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .filter(col("digit").between(1, 9))
    val counts = digits.groupBy("digit").agg(count(lit(1)).as("cnt"))
    val total = digits.agg(count(lit(1)).as("__n"))
    val expected = BenfordPermille.zipWithIndex
      .map { case (p, i) => (i + 1, p) }.toDF("digit", "exp_permille")
    expected
      .join(counts, Seq("digit"), "left")
      .crossJoin(broadcast(total))
      .select(col("digit"), coalesce(col("cnt"), lit(0L)).as("cnt"),
        expr("(coalesce(cnt, 0L) * 1000) div __n").as("obs_permille"),
        col("exp_permille"),
        abs(expr("(coalesce(cnt, 0L) * 1000) div __n") - col("exp_permille"))
          .as("dev_permille"))
      .orderBy("digit")
  }
}
