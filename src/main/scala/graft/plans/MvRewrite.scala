package graft.plans

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, count, countDistinct, lit, max, min, sum}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Materialized-view auto-rewrite (engine-added): an optimizer rule that
  * answers GROUP-BY aggregates over a registered base table FROM its
  * pre-aggregated summary — the classic OLAP cube/rollup-cache trade,
  * done where a Spark-native engine should do it: in Catalyst, so USER
  * QUERIES DON'T CHANGE. A query that groups by a subset of the view's
  * keys re-aggregates the summary (sums of sums, min of mins, sum of
  * counts) and never touches the fact scan — at 100 TB that is the
  * difference between re-reading the table and reading a few thousand
  * rows.
  *
  * Soundness gates (anything else falls through to the base scan):
  *  - grouping columns ⊆ the view's key columns;
  *  - WHERE clauses are DETERMINISTIC and reference key columns only
  *    (filter-then-aggregate commutes with re-aggregation exactly when
  *    the predicate is constant within each summary row; a
  *    non-deterministic predicate such as rand() < 0.5 would silently
  *    sample GROUPS instead of rows, so it is refused outright);
  *  - aggregates over registered measure columns:
  *    `SUM(intCol)` → `SUM(sum_col)` (views store BIGINT sums — integer
  *    SUM composes losslessly, which is why [[Mv.build]] refuses
  *    non-integral inputs); `MIN`/`MAX` → `MIN(min_col)`/`MAX(max_col)`
  *    (kept in the base column's type, so result types are unchanged);
  *    `AVG` → exact `SUM(sum_col) / SUM(cnt_col)` pair (cnt_col counts
  *    the NON-NULL measure rows, preserving AVG's null semantics; the
  *    integer sums are exact, so the single final division is
  *    bit-reproducible); `COUNT(*)`/`COUNT(lit)` → `COALESCE(SUM(cnt),
  *    0)` (the coalesce preserves COUNT's zero-on-empty contract).
  *    A summary built before a capability existed simply lacks the
  *    column and the rewrite declines — never a wrong answer.
  *
  * JOIN-AWARE rewrites ([[MvStarDef]]): a summary built over a
  * star/snowflake join answers aggregates over that same all-INNER
  * equi-join tree — the OLAP summary cache. The match compares the
  * flattened LEAF SET and CONDITION SET (unordered name pairs), so
  * Catalyst's join reordering cannot break it; every soundness gate
  * above then applies with the joined relation as "the base". Each
  * dimension's key uniqueness is enforced at build time — the one
  * property that makes pre-aggregating through joins sound.
  *
  * The rewrite preserves every output name AND exprId, so the
  * downstream plan never knows. Staleness: a view registered against a
  * plain parquet path is the registrar's contract (rebuild +
  * re-register after base loads); a view registered against a
  * [[graft.sources.TxnTable]] via [[Mv.registerTxn]] matches the scan's
  * exact FILE SET, so the moment the table commits past the
  * summarized version the live read's files differ and queries fall
  * back to the base scan automatically — stale answers are structurally
  * impossible, and [[Mv.refreshTxn]] (additive merge over the appended
  * files, [[graft.operators.Incremental.mergeAdditive]]) is the
  * re-validation path. Kill switch:
  * `spark.graft.mvRewrite.enabled=false`.
  */
object MvRewrite extends Rule[LogicalPlan] {

  /** One registered summary. A `fileSet` registration (txn tables)
    * matches scans whose root-path set is EXACTLY those files; a
    * `baseSuffix` registration matches scans whose root path ends with
    * the suffix at a path-segment boundary (so `lineitem.parquet`
    * cannot claim `my_lineitem.parquet`). `template` is the analyzed
    * relation of the summary parquet (re-instanced per rewrite so
    * attribute ids never collide across subtrees). */
  final case class MvDef(baseSuffix: String, keys: Seq[String],
                         sumCols: Seq[String], template: LogicalRelation,
                         fileSet: Option[Set[String]] = None)

  /** A JOIN-AWARE summary: a pre-aggregated star/snowflake join — the
    * OLAP summary cache. `suffixes` names every participating scan
    * (fact + dims, each segment-anchored, all distinct); `edges` is the
    * INNER join equi-condition set as UNORDERED column-name pairs.
    * Matches an Aggregate over an equi-join tree whose LEAF SET and
    * CONDITION SETS equal the registration — set equality, so Catalyst's
    * join reordering cannot break the match. Column names must be
    * unique across the star (the build projects them into one flat
    * summary; TPC-H-style per-table prefixes give this for free), and
    * every join must be non-fanning on its dimension side
    * ([[Mv.buildStar]] enforces key uniqueness per dim at build time) —
    * the one property that makes pre-aggregating through joins sound.
    *
    * `leftEdges` carries the LEFT-OUTER dimension joins as
    * (unordered pair, dim suffix, dim-side key): unlike an inner edge,
    * a left edge is DIRECTIONAL (which relation null-extends matters —
    * `F LEFT JOIN D` and `D LEFT JOIN F` share the pair but differ
    * semantically), so the registration also names the null-extended
    * side and the match verifies the query's preserved/extended sides
    * agree. The summary then holds NULL-key groups for unmatched fact
    * rows, exactly as the query would produce them, so re-aggregation
    * stays exact. A view built all-INNER refuses a LEFT query — but a
    * LEFT-built view ALSO answers the INNER form when every left dim's
    * KEY is among the view keys: matched rows are exactly the summary
    * groups with a non-null dim key (an equi-join never matches a null
    * key), so the rewrite adds `IsNotNull(dimKey)` and re-aggregates —
    * one summary serving both join shapes. */
  final case class MvStarDef(suffixes: Seq[String],
                             edges: Set[Set[String]],
                             keys: Seq[String], sumCols: Seq[String],
                             template: LogicalRelation,
                             leftEdges: Set[(Set[String], String, String)] =
                               Set.empty)

  private val registry = new ConcurrentHashMap[String, MvDef]()
  private val starRegistry = new ConcurrentHashMap[String, MvStarDef]()

  def register(name: String, d: MvDef): Unit = registry.put(name, d)
  def registerStar(name: String, d: MvStarDef): Unit = starRegistry.put(name, d)
  def deregister(name: String): Unit = {
    registry.remove(name); starRegistry.remove(name); ()
  }
  def clear(): Unit = { registry.clear(); starRegistry.clear() }

  private def enabled: Boolean =
    conf.getConfString("spark.graft.mvRewrite.enabled", "true").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled || (registry.isEmpty && starRegistry.isEmpty)) plan
    else plan.transformUp {
      case agg: Aggregate =>
        tryRewrite(agg).orElse(tryStarRewrite(agg)).getOrElse(agg)
    }

  /** Peel pure-projection and filter nodes off the aggregate's child;
    * anything else disqualifies the subtree. */
  private def strip(p: LogicalPlan, fs: Seq[Expression])
      : Option[(LogicalRelation, Seq[Expression])] = p match {
    case lr: LogicalRelation => Some((lr, fs))
    case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      strip(c, fs)
    case Filter(cond, c) => strip(c, fs :+ cond)
    case _ => None
  }

  private def suffixMatches(lr: LogicalRelation, suffix: String): Boolean =
    lr.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.map(_.toString)
          .exists(p => p == suffix || p.endsWith("/" + suffix))
      case _ => false
    }

  private def baseMatches(lr: LogicalRelation, d: MvDef): Boolean =
    d.fileSet match {
      case Some(files) => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.map(_.toString).toSet == files
        case _ => false
      }
      case None => suffixMatches(lr, d.baseSuffix)
    }

  /** Several views may summarize the same base (a coarse (region) rollup
    * next to a fine (region, day) one); all that MATCH are tried in
    * ascending summary size — optimizer file-stats, name tie-break for
    * determinism — and the first whose soundness gates pass wins, so a
    * query answerable by both reads the smallest summary that can serve
    * it. */
  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] =
    strip(agg.child, Nil).flatMap { case (lr, filters) =>
      registry.asScala.toSeq
        .filter { case (_, d) => baseMatches(lr, d) }
        .sortBy { case (name, d) =>
          (d.template.computeStats().sizeInBytes, name) }
        .iterator
        .map { case (_, d) => rewriteWith(agg, filters, d) }
        .collectFirst { case Some(p) => p }
    }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** The equi-condition name pairs of a join condition, or None if any
    * conjunct is not a plain column-to-column equality. */
  private def equiPairs(cond: Expression): Option[Set[Set[String]]] = {
    val cs = conjuncts(cond).map {
      case EqualTo(x: AttributeReference, y: AttributeReference) =>
        Some(Set(x.name, y.name))
      case _ => None
    }
    if (cs.forall(_.isDefined)) Some(cs.flatten.toSet) else None
  }

  /** The bare dimension leaf of a LEFT join's null-extended side:
    * projections peel; the ONLY admissible filter is a conjunction of
    * `IsNotNull(<join key>)` — the optimizer infers exactly that on the
    * right side of a left outer join (null-keyed dim rows never match,
    * so dropping them is free) and it carries no semantics the summary
    * must honor. ANY other dim-side node disqualifies: a real dim-side
    * filter runs BEFORE the join (turning matched rows into null-extended
    * ones), which re-applying above the summary cannot express. */
  private def leftDimLeaf(p: LogicalPlan, keyNames: Set[String])
      : Option[LogicalRelation] = p match {
    case lr: LogicalRelation => Some(lr)
    case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      leftDimLeaf(c, keyNames)
    case Filter(cond, c) if conjuncts(cond).forall {
        case IsNotNull(ar: AttributeReference) => keyNames.contains(ar.name)
        case _ => false
      } => leftDimLeaf(c, keyNames)
    case _ => None
  }

  /** Flatten a projection/filter/equi-join tree to its leaf scans, its
    * INNER equi-condition name pairs, its LEFT-OUTER edges (pair + the
    * null-extended leaf), and every filter predicate found on the
    * preserved spine. Inner joins recurse on both sides (filters commute
    * freely through them); a LEFT join recurses only on its PRESERVED
    * side — the null-extended side must be a bare leaf (modulo inferred
    * IsNotNull prefilters, see [[leftDimLeaf]]), which both pins the
    * direction the match must verify and excludes the nested-outer
    * shapes where set-matching stops being sound. Any other join type,
    * non-equi condition, or foreign node disqualifies the subtree. */
  private def flattenJoin(p: LogicalPlan)
      : Option[(Seq[LogicalRelation], Set[Set[String]],
                Set[(Set[String], LogicalRelation)], Seq[Expression])] = {
    import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
    import org.apache.spark.sql.catalyst.plans.logical.Join
    p match {
      case j: Join if j.joinType == Inner =>
        for {
          cond <- j.condition
          pairs <- equiPairs(cond)
          (lLeaves, lPairs, lLeft, lFs) <- flattenJoin(j.left)
          (rLeaves, rPairs, rLeft, rFs) <- flattenJoin(j.right)
        } yield (lLeaves ++ rLeaves, pairs ++ lPairs ++ rPairs,
          lLeft ++ rLeft, lFs ++ rFs)
      case j: Join if j.joinType == LeftOuter =>
        for {
          cond <- j.condition
          pairs <- equiPairs(cond)
          if pairs.size == 1 // one single-column key per dimension
          dim <- leftDimLeaf(j.right, pairs.head)
          (lLeaves, lPairs, lLeft, lFs) <- flattenJoin(j.left)
        } yield (lLeaves :+ dim, lPairs,
          lLeft + ((pairs.head, dim)), lFs)
      case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        flattenJoin(c)
      case Filter(cond, c) =>
        flattenJoin(c).map { case (ls, ps, le, fs) => (ls, ps, le, fs :+ cond) }
      case lr: LogicalRelation => Some((Seq(lr), Set.empty, Set.empty, Nil))
      case _ => None
    }
  }

  /** Rewrite `Aggregate(…, star-join)` from a registered star summary:
    * the flattened leaf set must match the registered suffixes one-to-one
    * and the equi-condition set must equal the registered edges — SET
    * comparisons, so the optimizer's join reordering is irrelevant. The
    * aggregate/filter gates of [[rewriteWith]] then apply unchanged (the
    * joined relation is just "the base table" from the summary's view);
    * constraint-inferred IsNotNull conjuncts on join keys are tautologies
    * over the summarized rows (inner joins proved the keys non-null) and
    * drop before gating. */
  private def tryStarRewrite(agg: Aggregate): Option[LogicalPlan] =
    flattenJoin(agg.child).filter(_._1.size >= 2).flatMap {
      case (leaves, pairs, leftPairs, filters) =>
        def leavesClaimed(d: MvStarDef): Boolean = {
          // every registered suffix claims exactly one distinct leaf
          val claimed = d.suffixes.map(sfx =>
            leaves.filter(suffixMatches(_, sfx)))
          claimed.forall(_.size == 1) &&
            claimed.map(_.head).distinct.size == leaves.size
        }
        def matchesExact(d: MvStarDef): Boolean =
          leaves.size == d.suffixes.size && pairs == d.edges &&
            leftPairs.map(_._1) == d.leftEdges.map(_._1) &&
            leavesClaimed(d) &&
            d.leftEdges.forall { case (pair, dimSfx, _) =>
              // DIRECTION: the query's null-extended leaf for this edge
              // must be the registered dimension (F LEFT JOIN D and
              // D LEFT JOIN F share the pair but differ semantically)
              leftPairs.exists { case (p, leaf) =>
                p == pair && suffixMatches(leaf, dimSfx) }
            }
        // an all-INNER query over a LEFT-built view: matched rows are
        // exactly the summary groups whose dim KEY is non-null, so the
        // rewrite is sound whenever every left dim's key is a view key
        def matchesInnerized(d: MvStarDef): Boolean =
          d.leftEdges.nonEmpty && leftPairs.isEmpty &&
            leaves.size == d.suffixes.size &&
            pairs == d.edges ++ d.leftEdges.map(_._1) &&
            d.leftEdges.forall { case (_, _, dimKey) =>
              d.keys.contains(dimKey) } &&
            leavesClaimed(d)
        starRegistry.asScala.toSeq
          .collect {
            case (name, d) if matchesExact(d) => (name, d, false)
            case (name, d) if matchesInnerized(d) => (name, d, true)
          }
          .sortBy { case (name, d, _) =>
            (d.template.computeStats().sizeInBytes, name) }
          .iterator
          .map { case (_, d, innerized) =>
            // IsNotNull(key) conjuncts are tautologies ONLY over INNER
            // edges (the join proved those keys non-null); a left edge's
            // keys CAN be null in the result — fact-side null keys
            // survive, dim-side keys null-extend — so an IsNotNull there
            // is a real predicate and stays for rewriteWith's gates.
            // In the INNERIZED mode every edge is inner in the QUERY, so
            // all its IsNotNull(key) conjuncts are tautologies — and the
            // rewrite itself re-adds the load-bearing dim-key IsNotNull.
            val innerKeyNames =
              if (innerized) d.edges.flatten ++ d.leftEdges.flatMap(_._1)
              else d.edges.flatten -- d.leftEdges.flatMap(_._1)
            val fs = filters.flatMap(conjuncts).filterNot {
              case IsNotNull(ar: AttributeReference) =>
                innerKeyNames.contains(ar.name)
              case _ => false
            }
            // resolve the dim-key attrs from the leaves; a miss fails
            // THIS candidate only (Option, not return — a non-local
            // return would abort the whole candidate iteration)
            val extra: Option[Seq[Expression]] =
              if (!innerized) Some(Nil)
              else {
                val es = d.leftEdges.toSeq.map { case (_, _, dimKey) =>
                  leaves.flatMap(_.output).find(_.name == dimKey)
                    .map(IsNotNull(_): Expression)
                }
                if (es.forall(_.isDefined)) Some(es.flatten) else None
              }
            extra.flatMap(ex => rewriteWith(agg, fs ++ ex,
              MvDef(d.suffixes.head, d.keys, d.sumCols, d.template)))
          }
          .collectFirst { case Some(p) => p }
    }

  private def rewriteWith(agg: Aggregate, filters: Seq[Expression],
                          d: MvDef): Option[LogicalPlan] = {
    val gAttrs = agg.groupingExpressions.map {
      case ar: AttributeReference if d.keys.contains(ar.name) => ar
      case _ => return None
    }
    if (!filters.forall(f => f.deterministic &&
        f.references.forall(r => d.keys.contains(r.name))))
      return None
    val fresh = d.template.newInstance()
    val mvAttr: Map[String, Attribute] = fresh.output.map(a => a.name -> a).toMap
    // a measure rewrite needs its summary column to EXIST (older views
    // lack min_/max_/cnt_ columns) — missing column = decline, not crash
    // (the `return None` evaluates in the caller's closure, escaping
    // rewriteWith)
    def attr(n: String): Option[Attribute] = mvAttr.get(n)

    def isPlain(ae: AggregateExpression): Boolean =
      ae.mode == Complete && !ae.isDistinct && ae.filter.isEmpty

    def measure(e: Expression): Option[String] = e match {
      case ar: AttributeReference if d.sumCols.contains(ar.name) => Some(ar.name)
      case _ => None
    }

    val newAggList: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case ar: AttributeReference if d.keys.contains(ar.name) =>
        Alias(mvAttr(ar.name), ar.name)(exprId = ar.exprId)
      case al @ Alias(ar: AttributeReference, name)
          if d.keys.contains(ar.name) =>
        Alias(mvAttr(ar.name), name)(exprId = al.exprId)
      case al @ Alias(ae: AggregateExpression, name) if isPlain(ae) =>
        ae.aggregateFunction match {
          case s: Sum =>
            val c = measure(s.child).getOrElse(return None)
            Alias(Sum(attr(s"sum_$c").getOrElse(return None)).toAggregateExpression(),
              name)(exprId = al.exprId)
          case m: Min =>
            val c = measure(m.child).getOrElse(return None)
            Alias(Min(attr(s"min_$c").getOrElse(return None)).toAggregateExpression(),
              name)(exprId = al.exprId)
          case m: Max =>
            val c = measure(m.child).getOrElse(return None)
            Alias(Max(attr(s"max_$c").getOrElse(return None)).toAggregateExpression(),
              name)(exprId = al.exprId)
          case a: Average =>
            if (!conf.getConfString(
                "spark.graft.mvRewrite.avg.enabled", "true").toBoolean)
              return None
            val c = measure(a.child).getOrElse(return None)
            // exact integer sums, one final IEEE division — numerator is
            // NULL exactly when cnt_c sums to 0, matching AVG's
            // null-on-no-rows contract without a zero-divide. NOTE:
            // Spark's own Average accumulates integral inputs in DOUBLE,
            // so past 2^53 of per-group sum its low bits depend on
            // partitioning; this rewrite is the exact value instead —
            // equal whenever the base AVG is itself exact (sums < 2^53),
            // strictly more accurate beyond. Callers needing
            // bit-identity-with-base at any magnitude can disable just
            // this rewrite via spark.graft.mvRewrite.avg.enabled=false.
            Alias(Divide(
              Cast(Sum(attr(s"sum_$c").getOrElse(return None)).toAggregateExpression(), DoubleType),
              Cast(Sum(attr(s"cnt_$c").getOrElse(return None)).toAggregateExpression(), DoubleType)),
              name)(exprId = al.exprId)
          case c: Count if c.children.forall(
              ch => ch.isInstanceOf[Literal] && ch.asInstanceOf[Literal].value != null) =>
            Alias(Coalesce(Seq(
              Sum(attr("cnt").getOrElse(return None)).toAggregateExpression(), Literal(0L))),
              name)(exprId = al.exprId)
          case _ => return None
        }
      case _ => return None
    }
    val newChild = filters.foldRight(fresh: LogicalPlan) { (c, p) =>
      Filter(c.transform {
        case ar: AttributeReference => mvAttr(ar.name)
      }, p)
    }
    Some(Aggregate(gAttrs.map(a => mvAttr(a.name)), newAggList, newChild))
  }
}

/** Build + register half of the materialized-view surface. */
object Mv {

  /** Write the summary parquet for `base` grouped by `keys`: per
    * requested measure column a BIGINT `sum_<col>`, a BIGINT
    * `cnt_<col>` (non-null rows — what AVG divides by), and
    * `min_<col>`/`max_<col>` kept in the column's own type (so
    * rewritten MIN/MAX result types match the base exactly); plus the
    * group row count `cnt`. Integral inputs only — integer SUM composes
    * losslessly across the two aggregation levels; a double sum would
    * re-associate and drift. */
  def build(base: DataFrame, keys: Seq[String], sumCols: Seq[String],
            mvPath: String): Unit = {
    require(keys.nonEmpty, "a materialized view needs at least one key")
    val schema = base.schema
    sumCols.foreach { c =>
      val dt = schema(c).dataType
      require(dt == LongType || dt == IntegerType,
        s"mv sum column $c must be integral, got $dt")
    }
    val aggs = count(lit(1)).as("cnt") +:
      sumCols.flatMap(c => Seq(
        sum(col(c)).cast("long").as(s"sum_$c"),
        count(col(c)).as(s"cnt_$c"),
        min(col(c)).as(s"min_$c"),
        max(col(c)).as(s"max_$c")))
    base.groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(mvPath)
  }

  private def analyzedRelation(spark: SparkSession,
                               mvPath: String): LogicalRelation =
    spark.read.parquet(mvPath).queryExecution.analyzed
      .collectFirst { case lr: LogicalRelation => lr }
      .getOrElse(throw new IllegalStateException(
        s"$mvPath did not analyze to a file relation"))

  private def requireCols(rel: LogicalRelation, mvPath: String,
                          keys: Seq[String], sumCols: Seq[String]): Unit = {
    val missing = (keys ++ sumCols.map("sum_" + _) :+ "cnt")
      .filterNot(rel.output.map(_.name).toSet)
    require(missing.isEmpty, s"mv at $mvPath lacks columns: $missing")
  }

  /** Register `mvPath` as the summary of the base table whose scan root
    * ends with `baseSuffix` (segment-anchored: the suffix must cover
    * whole path segments). Reads the summary once to capture its
    * relation; queries rewrite from the NEXT planning on. */
  def register(spark: SparkSession, name: String, baseSuffix: String,
               mvPath: String, keys: Seq[String],
               sumCols: Seq[String]): Unit = {
    val rel = analyzedRelation(spark, mvPath)
    requireCols(rel, mvPath, keys, sumCols)
    MvRewrite.register(name,
      MvRewrite.MvDef(baseSuffix, keys, sumCols, rel))
  }

  private def checkJoinTypes(joinTypes: Seq[String], nDims: Int): Seq[String] = {
    val jts = if (joinTypes.isEmpty) Seq.fill(nDims)("inner") else joinTypes
    require(jts.size == nDims,
      s"joinTypes must align with dims: ${jts.size} types for $nDims dims")
    jts.foreach(jt => require(jt == "inner" || jt == "left",
      s"star join type must be 'inner' or 'left', got '$jt'"))
    jts
  }

  /** Build the STAR/SNOWFLAKE summary: `fact` joined with each
    * `(dim, leftKey, dimKey)` in chain order (leftKey resolves against
    * the accumulated join, so a snowflake dim may key off an earlier
    * dim's column). Every dim must be unique on its join key (checked
    * here: a fanning join would multiply fact rows and the summary
    * would be silently wrong) and the star's column names must be
    * globally unambiguous. Same summary layout as [[build]]
    * (sum_/cnt_/min_/max_ per measure + cnt).
    *
    * `joinTypes` (aligned with `dims`; empty = all inner) admits "left"
    * per dim — the reference's own dimension joins are LEFT joins
    * (unmatched fact rows kept with null dim attributes), and the
    * summary then carries NULL-key groups for them, which is exactly
    * what re-aggregation needs to answer the LEFT query. Key uniqueness
    * matters identically (a fanning left join multiplies matched rows). */
  def buildStar(fact: DataFrame, dims: Seq[(DataFrame, String, String)],
                keys: Seq[String], sumCols: Seq[String],
                mvPath: String, joinTypes: Seq[String] = Nil): Unit = {
    require(dims.nonEmpty, "a star needs at least one dimension")
    val jts = checkJoinTypes(joinTypes, dims.size)
    val joined = dims.zip(jts).foldLeft(fact) {
      case (acc, ((dim, leftKey, dimKey), jt)) =>
        // one aggregate job: non-null keys must be distinct (null keys
        // never equi-match, so they cannot fan and don't count)
        val r = dim.agg(count(col(dimKey)).as("nk"),
          countDistinct(col(dimKey)).as("nd")).head()
        require(r.getLong(0) == r.getLong(1),
          s"dim is not unique on $dimKey (${r.getLong(0)} non-null keys, " +
            s"${r.getLong(1)} distinct) — the join would fan out fact rows " +
            "and the summary would be wrong")
        acc.join(dim, acc(leftKey) === dim(dimKey),
          if (jt == "left") "left" else "inner")
    }
    val dup = joined.columns.groupBy(identity)
      .collect { case (n, a) if a.length > 1 => n }
    require(dup.isEmpty,
      s"star column names must be unique, duplicated: ${dup.mkString(", ")}")
    build(joined, keys, sumCols, mvPath)
  }

  /** One-dimension convenience form of [[buildStar]]. */
  def buildJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                dimKey: String, keys: Seq[String], sumCols: Seq[String],
                mvPath: String, joinType: String = "inner"): Unit =
    buildStar(fact, Seq((dim, factKey, dimKey)), keys, sumCols, mvPath,
      Seq(joinType))

  /** Register `mvPath` as the summary of the star `factSuffix ⋈ dims`
    * (each dim as (dimSuffix, leftKey, dimKey); all suffixes
    * segment-anchored and distinct). Queries aggregating that exact
    * equi-join tree — in ANY join order — rewrite from the NEXT
    * planning on. `joinTypes` (aligned with `dims`; empty = all inner)
    * must state the SAME types the summary was built with: a left edge
    * registers directionally (pair + dim suffix) so an inner-built view
    * refuses a LEFT query and vice versa. */
  def registerStar(spark: SparkSession, name: String, factSuffix: String,
                   dims: Seq[(String, String, String)], mvPath: String,
                   keys: Seq[String], sumCols: Seq[String],
                   joinTypes: Seq[String] = Nil): Unit = {
    val suffixes = factSuffix +: dims.map(_._1)
    require(suffixes.distinct.size == suffixes.size,
      s"star suffixes must be distinct: $suffixes")
    val jts = checkJoinTypes(joinTypes, dims.size)
    val allEdges = dims.map(d => Set(d._2, d._3))
    require(allEdges.toSet.size == dims.size,
      "star join edges must be distinct unordered key pairs")
    val edges = dims.zip(jts).collect {
      case ((_, lk, dk), "inner") => Set(lk, dk) }.toSet
    val leftEdges = dims.zip(jts).collect {
      case ((sfx, lk, dk), "left") => (Set(lk, dk), sfx, dk) }.toSet
    val rel = analyzedRelation(spark, mvPath)
    requireCols(rel, mvPath, keys, sumCols)
    MvRewrite.registerStar(name,
      MvRewrite.MvStarDef(suffixes, edges, keys, sumCols, rel, leftEdges))
  }

  /** One-dimension convenience form of [[registerStar]]. */
  def registerJoin(spark: SparkSession, name: String, factSuffix: String,
                   dimSuffix: String, factKey: String, dimKey: String,
                   mvPath: String, keys: Seq[String],
                   sumCols: Seq[String], joinType: String = "inner"): Unit =
    registerStar(spark, name, factSuffix,
      Seq((dimSuffix, factKey, dimKey)), mvPath, keys, sumCols, Seq(joinType))

  /** Build AND register a summary of txn table `table`'s CURRENT
    * snapshot, keyed to the snapshot's exact live-file set: a query
    * reading the table at this version rewrites; the moment a commit
    * advances the table, live reads scan a different file set and fall
    * back to base — structural staleness protection, no registrar
    * discipline needed. Returns the summarized version (feed it to
    * [[refreshTxn]]). */
  def registerTxn(spark: SparkSession, name: String, table: String,
                  mvPath: String, keys: Seq[String],
                  sumCols: Seq[String]): Int = {
    import graft.sources.TxnTable
    val v = TxnTable.currentVersion(table)
    build(TxnTable.read(spark, table, asOf = Some(v)), keys, sumCols, mvPath)
    registerTxnAt(spark, name, table, v, mvPath, keys, sumCols)
    v
  }

  /** Advance a txn-table view from `builtVersion` to the current head
    * by aggregating ONLY the appended files and additively merging into
    * the existing summary (sum/cnt add, min/max re-min/re-max) — the
    * O(Δ) refresh. The delta is the LIVE-FILE DIFF between the two
    * snapshots, not a log replay: a metadata-only re-list version in
    * the range (checkpoint squash, the catalog lineage cap) would make
    * `TxnTable.addedFiles` re-count every pre-existing row, while the
    * diff stays exactly the appends. Any file REMOVED since
    * `builtVersion` (delete/overwrite/compaction) fails loudly —
    * min/max cannot be retracted additively; rebuild via
    * [[registerTxn]]. Re-registers against the new head's file set and
    * returns it. */
  def refreshTxn(spark: SparkSession, name: String, table: String,
                 builtVersion: Int, mvPath: String, keys: Seq[String],
                 sumCols: Seq[String]): Int = {
    import graft.sources.TxnTable
    recoverSwap(mvPath)
    val head = TxnTable.currentVersion(table)
    if (head != builtVersion) {
      val preLive = TxnTable.liveFiles(table, Some(builtVersion)).toSet
      val headLive = TxnTable.liveFiles(table, Some(head))
      val gone = preLive.diff(headLive.toSet)
      require(gone.isEmpty,
        s"$table removed ${gone.size} file(s) since v$builtVersion — the " +
          "range is not append-only; rebuild the view via registerTxn")
      val added = headLive.filterNot(preLive)
        .map(f => new java.io.File(table, f).getPath)
      if (added.nonEmpty) {
        val deltaDir = mvPath + s"_delta_v$head"
        build(spark.read.parquet(added: _*), keys, sumCols, deltaDir)
        val merges = sumCols.flatMap(c => Seq(
          s"min_$c" -> "min", s"max_$c" -> "max")).toMap
        val merged = graft.operators.Incremental.mergeAdditive(
          spark.read.parquet(mvPath), spark.read.parquet(deltaDir),
          keys, merges)
        // stage the merge (it READS mvPath), then install via the
        // recoverable rename-swap ([[installSwap]]); sweep the delta
        // scratch last
        val staging = new java.io.File(mvPath + s"_v$head")
        merged.write.mode("overwrite").parquet(staging.getPath)
        MvRewrite.deregister(name)
        installSwap(mvPath, staging, head)
        org.apache.commons.io.FileUtils.deleteDirectory(
          new java.io.File(deltaDir))
      }
    }
    registerTxnAt(spark, name, table, head, mvPath, keys, sumCols)
    head
  }

  /** Install `staging` at `mvPath` by renaming the old summary aside,
    * moving staging in, then deleting the old dir. The two renames are
    * not jointly atomic: a crash between them leaves mvPath ABSENT with
    * both halves intact on disk — which is why every entry point runs
    * [[recoverSwap]] first, making the DURABLE contract "old or new
    * summary after recovery", never a half-written dir and never silent
    * data loss. */
  private def installSwap(mvPath: String, staging: java.io.File,
                          head: Int): Unit = {
    val target = new java.io.File(mvPath)
    val retired = new java.io.File(mvPath + s"_retired_v$head")
    org.apache.commons.io.FileUtils.deleteQuietly(retired)
    org.apache.commons.io.FileUtils.moveDirectory(target, retired)
    org.apache.commons.io.FileUtils.moveDirectory(staging, target)
    org.apache.commons.io.FileUtils.deleteDirectory(retired)
  }

  /** Heal a crashed [[installSwap]]: when mvPath is missing, restore the
    * newest COMPLETE staged summary (`<mv>_vN` carrying parquet's
    * _SUCCESS — fully written before any swap began), else the retired
    * old summary (`<mv>_retired_vN`, complete by construction). A crash
    * mid-`merged.write` leaves no _SUCCESS, so a torn staging dir is
    * never promoted. No-op when mvPath exists. */
  private[graft] def recoverSwap(mvPath: String): Unit = {
    val target = new java.io.File(mvPath)
    if (target.exists()) return
    val (parent, base) = (target.getParentFile, target.getName)
    val siblings = Option(parent.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory)
    def newest(prefix: String, complete: Boolean): Option[java.io.File] =
      siblings.filter(f => f.getName.startsWith(prefix) &&
          f.getName.stripPrefix(prefix).forall(_.isDigit) &&
          (!complete || new java.io.File(f, "_SUCCESS").exists()))
        .sortBy(f => f.getName.stripPrefix(prefix).toInt).lastOption
    newest(base + "_v", complete = true)
      .orElse(newest(base + "_retired_v", complete = false))
      .foreach(f => org.apache.commons.io.FileUtils.moveDirectory(f, target))
  }

  /** Advance a txn-table view across commits that REMOVE or REWRITE
    * rows — the refresh [[refreshTxn]] refuses. Deletes, MERGE updates,
    * and compactions retract additively for SUM/COUNT (a removed row's
    * contribution subtracts exactly), so the view stays O(Δ-rows) via
    * the row-level change feed; MIN/MAX cannot retract without history,
    * so the refreshed summary DROPS its `min_`/`max_` columns — a
    * MIN/MAX query then declines the rewrite (missing column = fall
    * back to base, never a wrong answer) while SUM/AVG/COUNT keep
    * answering from the view. `rowKeys` is the table's unique row key
    * ([[graft.sources.TxnTable.changeFeed]]'s keyed-table contract — the
    * MERGE invariant). Re-registers against the head's file set and
    * returns it. */
  def refreshTxnCdc(spark: SparkSession, name: String, table: String,
                    builtVersion: Int, mvPath: String, keys: Seq[String],
                    sumCols: Seq[String], rowKeys: Seq[String]): Int = {
    import graft.sources.TxnTable
    recoverSwap(mvPath)
    val head = TxnTable.currentVersion(table)
    require(head >= builtVersion,
      s"$table is at v$head, below the view's v$builtVersion — restore " +
        "rewinds are not refreshable; rebuild via registerTxn")
    if (head != builtVersion) {
      val feed0 = TxnTable.changeFeed(spark, table, builtVersion, head,
        rowKeys, updateImages = true)
      // per-measure non-null indicator rides the feed so cnt_<c> (what
      // AVG divides by) retracts with the same signed aggregate as cnt
      val feed = sumCols.foldLeft(feed0) { (f, c) =>
        f.withColumn(s"__nn_$c",
          org.apache.spark.sql.functions.when(
            org.apache.spark.sql.functions.col(c).isNotNull, 1L)
            .otherwise(0L))
      }
      val mv = spark.read.parquet(mvPath)
      val slimCols = (keys :+ "cnt") ++
        sumCols.flatMap(c => Seq(s"sum_$c", s"cnt_$c"))
      val slim = mv.select(slimCols.map(col): _*)
      val sums = sumCols.flatMap(c =>
        Seq(s"sum_$c" -> c, s"cnt_$c" -> s"__nn_$c")).toMap
      val merged = graft.operators.Incremental.applyCdc(
        slim, feed, keys, "cnt", sums)
      val staging = new java.io.File(mvPath + s"_v$head")
      merged.write.mode("overwrite").parquet(staging.getPath)
      MvRewrite.deregister(name)
      installSwap(mvPath, staging, head)
    }
    registerTxnAt(spark, name, table, head, mvPath, keys, sumCols)
    head
  }

  /** Build AND register a summary of a [[graft.sources.TxnCatalog]]
    * table's CURRENT snapshot, pinned to the exact file set the
    * catalog's head transaction resolves for it — the warehouse-level
    * sibling of [[registerTxn]]: the moment ANY catalog transaction
    * changes the table (commitAll, restore, WAP publish, forget), a
    * live read's file set differs and queries fall back to base —
    * stale answers structurally impossible across the whole catalog
    * protocol, with zero registrar discipline. Returns the summarized
    * catalog txn (re-register after it advances). */
  def registerCatalog(spark: SparkSession, name: String, catalog: String,
                      table: String, mvPath: String, keys: Seq[String],
                      sumCols: Seq[String]): Int = {
    import graft.sources.TxnCatalog
    val txn = TxnCatalog.currentTxn(catalog)
    val snap = TxnCatalog.read(spark, catalog, table, Some(txn))
    build(snap, keys, sumCols, mvPath)
    val files = snap.queryExecution.analyzed
      .collect { case lr: LogicalRelation => lr.relation }
      .collect { case fs: HadoopFsRelation =>
        fs.location.rootPaths.map(_.toString) }
      .flatten.toSet
    require(files.nonEmpty, s"$catalog/$table txn $txn reads no files")
    val rel = analyzedRelation(spark, mvPath)
    requireCols(rel, mvPath, keys, sumCols)
    MvRewrite.register(name,
      MvRewrite.MvDef(table, keys, sumCols, rel, fileSet = Some(files)))
    txn
  }

  private def registerTxnAt(spark: SparkSession, name: String, table: String,
                            version: Int, mvPath: String, keys: Seq[String],
                            sumCols: Seq[String]): Unit = {
    import graft.sources.TxnTable
    recoverSwap(mvPath)
    val snap = TxnTable.read(spark, table, asOf = Some(version))
    val files = snap.queryExecution.analyzed
      .collect { case lr: LogicalRelation => lr.relation }
      .collect { case fs: HadoopFsRelation =>
        fs.location.rootPaths.map(_.toString) }
      .flatten.toSet
    require(files.nonEmpty, s"$table v$version reads no files")
    val rel = analyzedRelation(spark, mvPath)
    requireCols(rel, mvPath, keys, sumCols)
    MvRewrite.register(name,
      MvRewrite.MvDef(table, keys, sumCols, rel, fileSet = Some(files)))
  }
}
