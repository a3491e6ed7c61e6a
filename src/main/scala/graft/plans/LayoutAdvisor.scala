package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{coalesce, col, collect_list, concat,
  concat_ws, count, countDistinct, floor, least, lit, max, sort_array, sum}

/** WORKLOAD-DRIVEN physical-layout advisor — the data-placement sibling
  * of [[MvAdvisor]]: given the queries a deployment runs, recommend per
  * (table, column) the layout move that makes those queries prune —
  * partitioning, Z-order clustering, a file-level bloom index, or
  * bucketing. The MV advisor caches ANSWERS; this one reorganizes the
  * BYTES so the untouched queries read less of them, which at 100 TB is
  * the first lever anyone pulls (a partition-pruned scan is free, a
  * full scan of 100 TB is not).
  *
  * Per query, [[columnUses]] walks the ANALYZED plan (the user's
  * declared shape, before pushdown rewrites it) and attributes each
  * predicate to the single parquet scan that owns its column:
  *  - `col = lit` / `col IN (lits…)`   → an EQUALITY use;
  *  - `col {<,<=,>,>=} lit`            → a RANGE use;
  *  - `colA = colB` join conditions    → a JOIN-KEY use on both sides.
  * Anything else (functions of columns, OR-trees, non-foldable
  * comparands) is ignored — the advisor under-counts rather than
  * guesses, and an unused column is simply never recommended.
  *
  * [[recommend]] then measures each used column's NDV on the actual
  * data (the decision input a catalog would hold as statistics) and
  * applies the standard placement rules, first match wins:
  *  - filtered AND ndv ≤ maxPartitions → `partition` (directory
  *    pruning: the planner never lists the other partitions — the
  *    cheapest possible skip, but only viable at low cardinality or
  *    the small-files problem eats the win);
  *  - range-filtered                   → `zorder` (cluster + min-max
  *    file skipping: range predicates skip files whose stats exclude
  *    them — [[graft.operators.Layout.zorderWrite]] +
  *    `buildMinMaxIndex` is the apply path);
  *  - equality-filtered (high ndv)     → `bloom` (point lookups on an
  *    unclustered column, where min-max can't help —
  *    `Layout.buildBloomIndex`);
  *  - join-key only                    → `bucket` (co-located joins,
  *    no per-query shuffle — the bucketed-join path q_bucketed_join
  *    pins).
  * Every decision input (the use counts, the measured ndv, row counts)
  * is emitted alongside the verdict so the output is auditable — and
  * oracle-checkable: the DuckDB replica recomputes ndv from the same
  * parquet and must land on the same action.
  */
object LayoutAdvisor {

  /** One (base, column) usage row aggregated over the workload. */
  final case class ColUse(base: String, basePath: String, column: String,
                          nEq: Long, nRange: Long, nJoin: Long)

  /** exprId → (base file name, base root path, column name) for every
    * single-root parquet leaf — the ownership map predicates resolve
    * against. Non-parquet / multi-root leaves contribute nothing, so
    * their predicates are ignored rather than misattributed. */
  private def owners(p: LogicalPlan): Map[ExprId, (String, String, String)] =
    p.collect { case lr: LogicalRelation =>
      lr.relation match {
        case fs: HadoopFsRelation
            if fs.location.rootPaths.size == 1 &&
              fs.fileFormat.isInstanceOf[
                org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat] &&
              // a txn snapshot's one-file list is not a stable layout
              // target (the next commit moves it) — decline those
              !MvAdvisor.underTxnTable(fs.location.rootPaths.head) =>
          val root = fs.location.rootPaths.head
          lr.output.map(a => a.exprId -> (root.getName, root.toString, a.name))
        case _ => Seq.empty
      }
    }.flatten.toMap

  private object Conjuncts {
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case other => Seq(other)
    }
  }

  /** The per-column predicate uses of ONE query:
    * (basePath → column → (nEq, nRange, nJoin)). */
  def columnUses(df: DataFrame): Seq[ColUse] = {
    val plan = df.queryExecution.analyzed
    val own = owners(plan)
    // see through implicit casts (type coercion wraps the COLUMN when a
    // TIMESTAMP_NTZ scan meets an LTZ literal, an INT column meets a
    // BIGINT literal, …): a cast is monotonic for these orderings, so
    // the underlying column is still the prunable one
    def attr(e: Expression): Option[AttributeReference] = e match {
      case ar: AttributeReference => Some(ar)
      case c: Cast => attr(c.child)
      case _ => None
    }
    val uses = scala.collection.mutable.ArrayBuffer
      .empty[(ExprId, Int)] // 0 = eq, 1 = range, 2 = join
    def classify(cond: Expression, inJoin: Boolean): Unit =
      Conjuncts.split(cond).foreach {
        case EqualTo(a, b) if attr(a).isDefined && attr(b).isDefined =>
          if (inJoin) { uses += ((attr(a).get.exprId, 2))
                        uses += ((attr(b).get.exprId, 2)) }
        case EqualTo(a, l) if attr(a).isDefined && l.foldable =>
          uses += ((attr(a).get.exprId, 0))
        case EqualTo(l, a) if attr(a).isDefined && l.foldable =>
          uses += ((attr(a).get.exprId, 0))
        case In(a, vs) if attr(a).isDefined && vs.forall(_.foldable) =>
          uses += ((attr(a).get.exprId, 0))
        case GreaterThan(a, l) if attr(a).isDefined && l.foldable =>
          uses += ((attr(a).get.exprId, 1))
        case GreaterThanOrEqual(a, l) if attr(a).isDefined && l.foldable =>
          uses += ((attr(a).get.exprId, 1))
        case LessThan(a, l) if attr(a).isDefined && l.foldable =>
          uses += ((attr(a).get.exprId, 1))
        case LessThanOrEqual(a, l) if attr(a).isDefined && l.foldable =>
          uses += ((attr(a).get.exprId, 1))
        case GreaterThan(l, a) if attr(a).isDefined && l.foldable =>
          uses += ((attr(a).get.exprId, 1))
        case GreaterThanOrEqual(l, a) if attr(a).isDefined && l.foldable =>
          uses += ((attr(a).get.exprId, 1))
        case LessThan(l, a) if attr(a).isDefined && l.foldable =>
          uses += ((attr(a).get.exprId, 1))
        case LessThanOrEqual(l, a) if attr(a).isDefined && l.foldable =>
          uses += ((attr(a).get.exprId, 1))
        case _ => ()
      }
    plan.foreach {
      case Filter(cond, _) => classify(cond, inJoin = false)
      case j: Join => j.condition.foreach(classify(_, inJoin = true))
      case _ => ()
    }
    uses.flatMap { case (id, kind) => own.get(id).map(o => (o, kind)) }
      .groupBy(_._1).toSeq
      .map { case ((base, path, column), ks) =>
        ColUse(base, path, column,
          ks.count(_._2 == 0).toLong, ks.count(_._2 == 1).toLong,
          ks.count(_._2 == 2).toLong)
      }
  }

  /** Merge the workload's column uses, measure NDV per used column (ONE
    * aggregate per base — |bases| scans total, driver holds only the
    * |used columns| stats row), and emit one recommendation row per
    * (base, column), ordered. Columns: (base, col_name, n_eq, n_range,
    * n_join, ndv, base_rows, action).
    *
    * NDV is measured with `approx_count_distinct` (HLL++, relative
    * error `rsd`) by default — advisory statistics over a 100 TB base
    * must not themselves cost an expand-shuffle per column, and a
    * sketch error never changes WHICH columns the workload filters on,
    * only where the partition/bloom cardinality boundary falls. The
    * boundary is therefore taken ERROR-AWARE in approx mode: partition
    * is admitted only when `ndv·(1 + 2·rsd) ≤ maxPartitions` — the
    * failure directions are asymmetric (partitioning a column whose
    * true NDV overshoots the budget mints runaway directories and the
    * small-files problem; falling back to bloom/zorder on a column that
    * would just have fit merely skips a minor win), so the band is
    * one-sided. `exactNdv = true` keeps the exact `countDistinct` path
    * with the exact boundary — the oracle-gated test configuration,
    * and fine at any sf a test runs. */
  def recommend(spark: SparkSession, queries: Seq[DataFrame],
                maxPartitions: Long = 1024L,
                exactNdv: Boolean = false,
                rsd: Double = 0.05): DataFrame =
    measured(spark, queries, maxPartitions, exactNdv, rsd,
      clipRatio = 0.0).drop("skewed", "concentrated", "unsupported")

  /** [[recommend]] plus an internal per-column OUTLIER-SKEW flag
    * (`skewed`): with `clipRatio` > 0, a numeric column whose full
    * [min, max] span exceeds `clipRatio` × its [p1, p99] span is
    * dominated by a handful of extreme values — the regime where plain
    * range quantization squeezes the bulk into one bucket and the
    * apply path should pass `clipQuantile` (see
    * [[graft.operators.Layout.measureRanges]]). Measured in the SAME
    * per-base aggregate as NDV (min/max + two approx percentiles per
    * column — no extra scan); non-numeric columns and clipRatio = 0
    * flag false. */
  private def measured(spark: SparkSession, queries: Seq[DataFrame],
                       maxPartitions: Long, exactNdv: Boolean,
                       rsd: Double, clipRatio: Double): DataFrame = {
    val merged = queries.flatMap(columnUses)
      .groupBy(u => (u.basePath, u.column)).toSeq
      .map { case (_, us) =>
        us.head.copy(nEq = us.map(_.nEq).sum, nRange = us.map(_.nRange).sum,
          nJoin = us.map(_.nJoin).sum)
      }
    val rows = merged.groupBy(_.basePath).toSeq.flatMap { case (path, us) =>
      val cols = us.map(_.column).distinct.sorted
      val rel = spark.read.parquet(path)
      // the skew/concentration probes run on a column's double-cast
      // ORDINAL: numerics directly, temporal columns via their epoch
      // ordinal (Layout.ordinalExpr) — a timestamp is the FIRST column
      // a 100 TB fact clusters on, so the advice must probe it too
      def probeCol(c: String): Option[org.apache.spark.sql.Column] =
        rel.schema.find(_.name == c).flatMap { f =>
          import org.apache.spark.sql.types._
          f.dataType match {
            case _: NumericType => Some(col(c).cast("double"))
            case DateType | TimestampType | TimestampNTZType | StringType =>
              // strings probe through the same binary-prefix ordinal
              // the clustering write would use — skew advice covers the
              // URL-host / source-label dimension too
              Some(graft.operators.Layout.ordinalExpr(col(c), f.dataType)
                .cast("double"))
            case _ => None
          }
        }
      val st = rel.agg(count(lit(1)).as("_n"),
        cols.map { c =>
          val d = if (exactNdv) countDistinct(col(c))
                  else org.apache.spark.sql.functions
                    .approx_count_distinct(col(c), rsd)
          d.as(s"_ndv_$c")
        }: _*).head()
      // the skew probe runs as its OWN aggregate pass: one
      // array-percentile sketch + min/max per numeric column. Folding
      // it into the NDV aggregate looks cheaper but is not — multiple
      // DISTINCT aggregates plan through an Expand, and every
      // non-distinct sketch then processes the expanded row stream
      // (measured 1.6 s → 11 s on the advice query at sf0.1); two
      // narrow scans are far cheaper than one multiplied one.
      val skewCols =
        if (clipRatio <= 0.0) Nil else cols.filter(probeCol(_).isDefined)
      val fracs = Seq(0.01, 0.25, 0.75, 0.99)
      def qAgg(c: String) =
        org.apache.spark.sql.functions.percentile_approx(probeCol(c).get,
          org.apache.spark.sql.functions.typedLit(fracs), lit(10000))
          .as(s"_q_$c")
      val sk: Option[org.apache.spark.sql.Row] =
        if (skewCols.isEmpty) None
        else Some(rel.agg(qAgg(skewCols.head),
          skewCols.tail.map(qAgg) ++
            skewCols.flatMap(c => Seq(
              org.apache.spark.sql.functions.min(probeCol(c).get)
                .as(s"_mn_$c"),
              max(probeCol(c).get).as(s"_mx_$c"))): _*).head())
      val baseRows = st.getAs[Long]("_n")
      us.map { u =>
        val ndv = st.getAs[Long](s"_ndv_${u.column}")
        val partitionable =
          if (exactNdv) ndv <= maxPartitions
          else ndv * (1 + 2 * rsd) <= maxPartitions
        val action =
          if (u.nEq + u.nRange > 0 && partitionable) "partition"
          else if (u.nRange > 0) "zorder"
          else if (u.nEq > 0) "bloom"
          else "bucket"
        val c = u.column
        val qs: Option[Seq[Double]] = sk.flatMap { row =>
          if (probeCol(c).isEmpty || row.isNullAt(row.fieldIndex(s"_q_$c")) ||
              row.isNullAt(row.fieldIndex(s"_mn_$c"))) None
          else Some(row.getSeq[Double](row.fieldIndex(s"_q_$c")))
        }
        val skewed = qs.exists { q =>
          val span = sk.get.getAs[Double](s"_mx_$c") -
            sk.get.getAs[Double](s"_mn_$c")
          val bulk = q(3) - q(0) // p99 − p1
          span > clipRatio * math.max(bulk, java.lang.Double.MIN_NORMAL)
        }
        // value CONCENTRATION (the equi-depth trigger, distinct from
        // outlier skew): a collapsed interquartile range means at
        // least half the rows tie over (nearly) one value — range
        // scaling would put that mass in one bucket no range partition
        // can split; quantile buckets spread it
        val concentrated = qs.exists(q => q(2) == q(1)) // p75 == p25
        val refusal = rel.schema.find(_.name == c)
          .map(f => ordinalRefusal(f.dataType)).getOrElse("")
        (u.base, u.column, u.nEq, u.nRange, u.nJoin, ndv, baseRows, action,
          skewed, concentrated, refusal)
      }
    }.sortBy(r => (r._1, r._2))
    import spark.implicits._
    rows.toDF("base", "col_name", "n_eq", "n_range", "n_join", "ndv",
      "base_rows", "action", "skewed", "concentrated", "unsupported")
  }

  /** Why a column's type cannot feed the clustering ordinal
    * ([[graft.operators.Layout.ordinalExpr]]) — empty when it can. The
    * advisor surfaces this as NAMED advice (column, reason, workaround
    * cast) instead of recommending a composite the apply path would
    * refuse with a bare exception. */
  private def ordinalRefusal(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType | DateType |
           TimestampType | TimestampNTZType | StringType => ""
      case d: DecimalType if d.precision <= 18 => ""
      case d: DecimalType =>
        s"DECIMAL(${d.precision},${d.scale}) unscaled values exceed the " +
          s"63-bit ordinal domain; cast to DECIMAL(18,${d.scale}) " +
          "or a scaled LONG surrogate"
      case FloatType | DoubleType =>
        "floating-point has no total-order ordinal (NaN, -0.0); " +
          "cast to DECIMAL(18,s) or a scaled LONG surrogate"
      case other =>
        s"$other has no monotone long ordinal; add an integral " +
          "surrogate column"
    }
  }

  /** COMPOSITE Z-ORDER recommendation — the multi-dimension form
    * [[recommend]]'s per-column rows cannot express: a base whose
    * workload range-filters SEVERAL high-NDV columns wants ONE
    * [[graft.operators.Layout.zorderWriteN]] layout over all of them
    * together (a box filter then prunes on every dimension's per-file
    * interval; k separate single-column recommendations would fight
    * over the one physical sort order). Reuses the same plan
    * extraction and NDV measurement; columns already served by
    * `partition` (low NDV) stay out of the composite — directory
    * pruning beats clustering wherever it fits. One row per base with
    * any surviving range-filtered column: (base, cols — sorted csv —,
    * n_cols, n_range, base_rows, recommend), recommending exactly when
    * 2 ≤ n_cols ≤ maxCols: one range column is a plain sort, and past
    * ~4 dimensions bit-interleaving dilutes each dimension's per-file
    * interval until min/max stops excluding anything. */
  def zorderAdvice(spark: SparkSession, queries: Seq[DataFrame],
                   maxPartitions: Long = 1024L, exactNdv: Boolean = false,
                   rsd: Double = 0.05, maxCols: Int = 4,
                   clipRatio: Double = 10.0): DataFrame = {
    val m = measured(spark, queries, maxPartitions, exactNdv, rsd, clipRatio)
      .filter(col("action") === "zorder")
    // a column whose TYPE the clustering ordinal refuses (DECIMAL past
    // 18 digits, floats) must never enter the composite — the apply
    // path would throw on the advisor's own recommendation. It
    // surfaces as NAMED advice instead: column, reason, workaround
    // cast, per base, in `unsupported_cols` — so the operator sees WHY
    // the dimension is absent and what cast would admit it
    val unsup = m.filter(col("unsupported") =!= "")
      .groupBy("base")
      .agg(concat_ws("; ", sort_array(collect_list(
        concat(col("col_name"), lit(" ("), col("unsupported"), lit(")")))))
        .as("unsupported_cols"))
    m.filter(col("unsupported") === "")
      .groupBy("base")
      .agg(sort_array(collect_list("col_name")).as("cs"),
        count(lit(1)).as("n_cols"),
        sum("n_range").as("n_range"),
        max("base_rows").as("base_rows"),
        // quantization advice: ANY composite column dominated by
        // outliers (full span ≫ p1–p99 span) wants winsorized bounds —
        // the apply path's clipQuantile knob — or plain range scaling
        // squeezes the bulk into one bucket (see
        // Layout.measureRanges/rangeScale); ANY value-concentrated
        // column (collapsed IQR: half the rows tie) wants the
        // equi-depth mode outright
        max(col("skewed").cast("int")).as("_any_skew"),
        max(col("concentrated").cast("int")).as("_any_conc"))
      .select(col("base"), concat_ws(",", col("cs")).as("cols"),
        col("n_cols"), col("n_range"), col("base_rows"),
        (col("n_cols") >= 2 && col("n_cols") <= maxCols).as("recommend"),
        // per-column quantization width the APPLY path must use:
        // n_cols × bits has to fit a signed long (mortonCodeN /
        // HilbertCode both require n·bits ≤ 63), so a 4-column
        // recommendation cannot ride the default 16 — advising the
        // width here is what keeps every advisor row applyable
        // end-to-end (LayoutAdvisorSpec applies the 4-column row)
        least(lit(16L), floor(lit(63L) / col("n_cols")).cast("long"))
          .as("bits"),
        (col("_any_skew") === 1).as("clip_recommended"),
        org.apache.spark.sql.functions
          .when(col("_any_conc") === 1, "equidepth").otherwise("range")
          .as("quant_mode"),
        // curve choice: at 2 dims Morton's cheap bit-interleave is
        // within a few percent of Hilbert's pruning; from 3 dims the
        // Morton curve's diagonal jumps widen per-file intervals enough
        // that Hilbert's continuity pays for its encoder
        // ([[graft.operators.Layout.hilbertWriteN]] is the apply path)
        org.apache.spark.sql.functions
          .when(col("n_cols") >= 3, "hilbert").otherwise("morton")
          .as("curve"))
      // FULL outer: a base whose every zorder candidate is unsupported
      // still surfaces (the named refusals ARE its advice row) — the
      // supported-side columns default to the empty recommendation
      .join(unsup, Seq("base"), "full_outer")
      .select(col("base"),
        coalesce(col("cols"), lit("")).as("cols"),
        coalesce(col("n_cols"), lit(0L)).as("n_cols"),
        coalesce(col("n_range"), lit(0L)).as("n_range"),
        coalesce(col("base_rows"), lit(0L)).as("base_rows"),
        coalesce(col("recommend"), lit(false)).as("recommend"),
        coalesce(col("bits"), lit(16L)).as("bits"),
        coalesce(col("clip_recommended"), lit(false)).as("clip_recommended"),
        coalesce(col("quant_mode"), lit("range")).as("quant_mode"),
        coalesce(col("curve"), lit("morton")).as("curve"),
        coalesce(col("unsupported_cols"), lit("")).as("unsupported_cols"))
      .orderBy("base")
  }

  /** Small-file health of a parquet directory, measured in ROWS per
    * file — deterministic across environments, unlike byte sizes, so
    * the verdict is oracle-checkable. One scan, two aggregates (per
    * file, then totals); output one row: (n_files, total_rows,
    * avg_rows_per_file, recommend_compact). Recommend when the average
    * file carries under HALF the target and there is more than one
    * file — the small-files problem is the first thing that kills a
    * 100 TB table (every query pays per-file open + footer + task
    * overhead; at millions of tiny files the driver's file listing
    * alone dominates). Apply path: [[graft.operators.Layout.compact]]
    * (crash-safe swap) or `compactSmall` for txn tables. */
  def compactionAdvice(spark: SparkSession, path: String,
                       targetRowsPerFile: Long): DataFrame = {
    require(targetRowsPerFile > 0, "targetRowsPerFile must be positive")
    val t = spark.read.parquet(path)
      .groupBy(org.apache.spark.sql.functions.input_file_name().as("file"))
      .agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_files"),
        org.apache.spark.sql.functions.sum("n").as("total_rows")).head()
    adviceRow(spark, t.getAs[Long]("n_files"), t.getAs[Long]("total_rows"),
      targetRowsPerFile)
  }

  /** [[compactionAdvice]] for a [[graft.sources.TxnTable]] snapshot,
    * computed WITHOUT a scan: the live data files and their row counts
    * come off the txn log's commit-time stats sidecars (parquet footers
    * for pre-stats files) — at 100 TB the advice itself must be a
    * metadata read, because the table it diagnoses is exactly the one
    * too expensive to rescan per health check. Same output shape and
    * same verdict rule as the scanning form; the apply path is
    * `TxnTable.compactSmall` / `optimize`. */
  def compactionAdviceTxn(spark: SparkSession, table: String,
                          targetRowsPerFile: Long,
                          asOf: Option[Int] = None): DataFrame = {
    require(targetRowsPerFile > 0, "targetRowsPerFile must be positive")
    val counts = graft.sources.TxnTable.liveFileRowCounts(table, asOf)
    adviceRow(spark, counts.size.toLong, counts.map(_._2).sum,
      targetRowsPerFile)
  }

  /** VACUUM advisor — what a `TxnTable.vacuum(retainFrom)` would
    * reclaim, priced WITHOUT deleting (or scanning) anything: the
    * dry-run orphan set from the log, its row weight from footer
    * metadata. One row: (n_referenced_files, n_reclaimable_files,
    * reclaimable_rows, recommend_vacuum) — recommend when the
    * reclaimable rows weigh at least half the HEAD snapshot (dead
    * bytes ≥ ~⅓ of the table dir: the point where time-travel debt,
    * not data, dominates storage). At 100 TB retention is a real bill;
    * this is the measurement an operator acts on, with `vacuum` as the
    * one-call apply path. */
  def vacuumAdvice(spark: SparkSession, table: String,
                   retainFrom: Int): DataFrame = {
    import graft.sources.TxnTable
    val (keep, doomed) = TxnTable.reclaimable(table, retainFrom)
    // orphans include CRASH DEBRIS (truncated part files a dying writer
    // left, no log entry) — exactly what vacuum cleans; an unreadable
    // footer prices as 0 rows rather than killing the health report
    val reclaimRows = doomed.map(f =>
      scala.util.Try(TxnTable.footerRowCount(f)).getOrElse(0L)).sum
    val headRows = TxnTable.snapshotRowCount(table)
    import spark.implicits._
    Seq((keep.size.toLong, doomed.size.toLong, reclaimRows,
      doomed.nonEmpty && reclaimRows * 2L >= headRows))
      .toDF("n_referenced_files", "n_reclaimable_files",
        "reclaimable_rows", "recommend_vacuum")
  }

  /** CLUSTER-HEALTH advisor for a [[graft.sources.TxnLayout]]-maintained
    * table — metadata only, like every txn advisor here (sidecar + the
    * log's row-count stats): one row naming the clustering (curve,
    * columns) and the live set's clustered/stale split. Stale files are
    * opened by every pruned scan, so `stale_rows / total_rows` is
    * exactly the pruning quality ingest has eroded; recommend when it
    * reaches `maxStaleFraction` (the threshold
    * `TxnLayout.maintainClustered` applies). A never-clustered table
    * reports curve='none' and never recommends — whether to cluster AT
    * ALL is [[zorderAdvice]]'s question, this row answers whether to
    * MAINTAIN what exists.
    *
    * NOTE the one write this advisor defaults to: the clamped-mass
    * measure freshens the quant columns' min-max sidecars first
    * (O(files since the last refresh), footer metadata — but a WRITE
    * into the table directory). Fresh ingest is exactly what carries
    * clamped mass, so the default keeps the advice current; on a
    * read-only mount pass `refreshStats = false` for a strictly
    * read-only call — files committed since the last refresh then
    * count 0 clamped (the measure under-reports, never falsely
    * recommends). */
  def clusterAdvice(spark: SparkSession, table: String,
                    maxStaleFraction: Double = 0.2,
                    maxClampedFraction: Double = 0.5,
                    maxFileSkew: Double = 8.0,
                    minFilesForSkew: Int = 4,
                    refreshStats: Boolean = true): DataFrame = {
    import spark.implicits._
    import graft.sources.TxnLayout
    TxnLayout.readSpec(table) match {
      case None =>
        Seq(("none", "", 0L, 0L, 0L, 0L, false, 0L, "none"))
          .toDF("curve", "cols", "n_clustered_files", "n_stale_files",
            "stale_rows", "total_rows", "recommend_recluster",
            "clamped_rows", "action")
      case specOpt @ Some(spec) =>
        // one sidecar read: the split below measures the SAME spec the
        // row names (no re-read between naming and measuring)
        val (cl, st, staleRows, totalRows) =
          TxnLayout.stalenessOf(table, specOpt)
        val recommend = st > 0 && staleRows >= maxStaleFraction * totalRows
        // the ACTION column mirrors maintainClustered's decision order
        // exactly (clamped regrow → skew escalation → incremental →
        // healthy), so the advice names what the policy will do —
        // every measure footer-metadata only, like the staleness split
        val (clamped, clTotal) =
          TxnLayout.boundsStaleness(spark, table, refresh = refreshStats)
        val action =
          if (clTotal > 0 && clamped > maxClampedFraction * clTotal)
            if (spec.qbounds.nonEmpty) "reoptimize_equidepth"
            else "reoptimize_bounds"
          else if (spec.quant.nonEmpty && spec.ranges.size >= minFilesForSkew &&
              TxnLayout.fileSkew(table) > maxFileSkew)
            "escalate_equidepth"
          else if (spec.qbounds.nonEmpty && !spec.salt &&
              spec.ranges.size >= minFilesForSkew &&
              TxnLayout.fileSkew(table) > maxFileSkew)
            // tied VALUES past quantile resolution: the partitioner
            // tiebreak is the remaining lever (maintainClustered rung 2)
            "escalate_salt"
          else if (recommend) "recluster_incremental"
          else "healthy"
        Seq((spec.curve, spec.cols.mkString(","), cl.toLong, st.toLong,
          staleRows, totalRows, recommend, clamped, action))
          .toDF("curve", "cols", "n_clustered_files", "n_stale_files",
            "stale_rows", "total_rows", "recommend_recluster",
            "clamped_rows", "action")
    }
  }

  private def adviceRow(spark: SparkSession, nFiles: Long, rows: Long,
                        targetRowsPerFile: Long): DataFrame = {
    val avg = rows / math.max(1L, nFiles)
    import spark.implicits._
    Seq((nFiles, rows, avg,
      nFiles > 1L && avg < targetRowsPerFile / 2L))
      .toDF("n_files", "total_rows", "avg_rows_per_file",
        "recommend_compact")
  }
}
