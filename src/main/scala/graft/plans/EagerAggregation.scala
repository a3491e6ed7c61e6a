package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.sources.TableConstraints

/** EAGER AGGREGATION (join-aggregation reorder, Yan & Larson '95): an
  * aggregate above a fact⋈dim join pre-aggregates the FACT side below
  * the join, keyed by (fact grouping columns ∪ fact join keys), and
  * merges the partials above — classic warehouse plan surgery no stock
  * Spark rule performs. At 100 TB the difference is the join and its
  * shuffle processing |distinct keys| pre-aggregated rows instead of
  * |fact| raw rows: `GROUP BY dim.attr` over a billion-row fact joined
  * to a thousand-row dim shuffles a thousand partials instead of a
  * billion rows.
  *
  * Soundness rests on ONE property: the join must not fan the fact side
  * out (a fact row matching two dim rows would count its partial
  * twice). That is exactly what a declared RELY unique key on the dim's
  * join columns guarantees ([[TableConstraints]]), checked through the
  * same head-snapshot gate as [[ConstraintRules]]. Further gates:
  *  - INNER or fact-preserving OUTER joins only, plain `EqualTo`
  *    conjuncts (an unmatched partial drops (inner) or null-extends
  *    (outer) exactly as its raw rows would — one partial row per
  *    group, never split);
  *  - the dim side is a bare scan (Projects / IsNotNull-on-key
  *    filters);
  *  - grouping expressions are plain attributes (either side);
  *  - every aggregate is an undistinct, unfiltered SUM / MIN / MAX /
  *    COUNT / AVG over FACT-side expressions: these decompose exactly
  *    (SUM of partial SUMs, MIN of MINs, COUNT as SUM of partial
  *    COUNTs, AVG as the (sum, non-null count) pair Spark's own
  *    distributed Average accumulates — with an explicit zero-count
  *    guard so an all-null group stays NULL instead of raising ANSI
  *    DIVIDE_BY_ZERO). DISTINCT cannot be pre-counted, DECIMAL
  *    sums/averages widen twice (a partial decimal(p+10) would
  *    re-widen — refused to keep result types identical);
  *  - the fact side is not itself an Aggregate (also the fixed-point
  *    terminator: one application produces exactly that shape).
  *
  * Whether eager aggregation WINS is a cost call — the pre-aggregation
  * pays a pass over the fact, repaid only when the partial key space is
  * much smaller than the fact (at 1000× compression it is the largest
  * single-join win a warehouse plan can take; at 1× it is pure loss).
  * `spark.graft.eagerAgg.enabled` picks the decision mode:
  *  - `false` (default): never fires;
  *  - `true`: fires wherever sound — the blunt session-wide opt-in;
  *  - `auto`: PER-PLAN cost decision from persisted stats — fires only
  *    where the fact's recorded row count compresses at least
  *    `spark.graft.eagerAgg.minCompression` (default 4)× onto the
  *    partial key tuple's persisted NDV
  *    ([[graft.sources.TxnStats.refreshNdv]] sketches, one driver-side
  *    JSON read per candidate — no stats job inside the optimizer).
  *    Missing, incomplete, or non-root stats decline conservatively.
  *    This is the closed advisor loop: [[WorkloadAdvisor]] prices the
  *    reorder and names the key columns; `refreshNdv` persists their
  *    NDV; `auto` then fires exactly where it compresses instead of a
  *    human flipping a global flag. NDV staleness is advisory (the
  *    rewrite is CORRECT regardless — stats only decide profit).
  */
object EagerAggregation extends Rule[LogicalPlan] with PredicateHelper {

  private def mode: String =
    conf.getConfString("spark.graft.eagerAgg.enabled", "false")

  private def minCompression: Long =
    conf.getConfString("spark.graft.eagerAgg.minCompression", "4").toLong

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (mode != "true" && mode != "auto") plan
    else ConstraintRules.withRootCache(plan.transformUp {
      case a @ Aggregate(_, _, j: Join, _) =>
        rewrite(a, j).getOrElse(a)
      // column pruning leaves an attribute-only Project between the
      // aggregate and the join — transparent for this rewrite (the new
      // aggregate references partial outputs and dim attrs, all present
      // in the join's own output), so it is dropped with the reorder
      case a @ Aggregate(_, _, p: Project, _)
          if p.projectList.forall(_.isInstanceOf[AttributeReference]) &&
            p.child.isInstanceOf[Join] =>
        rewrite(a, p.child.asInstanceOf[Join]).getOrElse(a)
    })

  private def decomposable(x: AggregateExpression): Boolean =
    x.filter.isEmpty && !x.isDistinct && (x.aggregateFunction match {
      case s: Sum => !s.dataType.isInstanceOf[DecimalType]
      // AVG must land on DoubleType: decimals re-widen (refused like
      // SUM), and interval averages have bespoke sum types this
      // decomposition does not reproduce
      case a: Average => a.dataType == DoubleType
      case _: Min | _: Max | _: Count => true
      case _ => false
    })

  private def rewrite(a: Aggregate, j: Join): Option[LogicalPlan] = {
    if (j.condition.isEmpty) return None
    if (!a.groupingExpressions.forall(_.isInstanceOf[AttributeReference]))
      return None
    val sides: Seq[(LogicalPlan, LogicalPlan, Boolean)] = j.joinType match {
      case Inner => Seq((j.left, j.right, true), (j.right, j.left, false))
      case LeftOuter => Seq((j.left, j.right, true))
      case RightOuter => Seq((j.right, j.left, false))
      case _ => return None
    }
    val conj = splitConjunctivePredicates(j.condition.get)
    sides.view.flatMap { case (fact, dim, factLeft) =>
      tryRewrite(a, j, fact, dim, factLeft, conj)
    }.headOption
  }

  private def tryRewrite(a: Aggregate, j: Join, fact: LogicalPlan,
                         dim: LogicalPlan, factLeft: Boolean,
                         conj: Seq[Expression]): Option[LogicalPlan] = {
    if (fact.isInstanceOf[Aggregate]) return None // applied already
    // every conjunct a plain fact-attr = dim-attr equality
    val pairsOpt = conj.map {
      case EqualTo(x: AttributeReference, y: AttributeReference) =>
        if (fact.outputSet.contains(x) && dim.outputSet.contains(y)) Some((x, y))
        else if (fact.outputSet.contains(y) && dim.outputSet.contains(x)) Some((y, x))
        else None
      case _ => None
    }
    if (pairsOpt.exists(_.isEmpty) || pairsOpt.isEmpty) return None
    val pairs = pairsOpt.flatten
    // non-fanning guarantee: dim join keys declared RELY unique
    val dimOk = ConstraintRules.stripDim(dim, AttributeSet(pairs.map(_._2)))
      .flatMap(ConstraintRules.constraintRoot(_))
      .exists(root =>
        TableConstraints.isUniqueOn(root, pairs.map(_._2.name).toSet))
    if (!dimOk) return None
    // every aggregate decomposable and over FACT-side inputs only
    val aggs = a.aggregateExpressions.flatMap(_.collect {
      case x: AggregateExpression => x
    }).distinct
    if (aggs.isEmpty || !aggs.forall(decomposable)) return None
    if (!aggs.forall(_.references.subsetOf(fact.outputSet))) return None
    if (!a.aggregateExpressions.forall(_.deterministic)) return None

    // partial aggregate below the join: keyed by the fact-side grouping
    // attrs ∪ fact join keys, one named partial per distinct aggregate
    val geAttrs = a.groupingExpressions.map(_.asInstanceOf[AttributeReference])
    val partialKeys = (geAttrs.filter(fact.outputSet.contains) ++
      pairs.map(_._1)).distinct
    // auto mode: fire only where the persisted stats PROVE compression
    if (mode == "auto" && !autoProfitable(fact, partialKeys)) return None
    val partialAliases: Seq[Seq[Alias]] = aggs.zipWithIndex.map { case (x, i) =>
      x.aggregateFunction match {
        // AVG decomposes as a (sum, non-null count) pair — exactly how
        // Spark's own distributed Average accumulates, INCLUDING its
        // sum type: native Average sums non-decimal input as DOUBLE
        // (Average.sumDataType), so the partial casts the child to
        // double too. A raw integral Sum here would raise ANSI
        // ARITHMETIC_OVERFLOW on group sums past Long.MaxValue that
        // the native AVG handles fine
        case f: Average => Seq(
          Alias(Sum(Cast(f.child, DoubleType)).toAggregateExpression(),
            s"_eager_p${i}s")(),
          Alias(Count(f.child).toAggregateExpression(), s"_eager_p${i}c")())
        case _ => Seq(Alias(x, s"_eager_p$i")())
      }
    }
    val partial = Aggregate(partialKeys,
      (partialKeys: Seq[NamedExpression]) ++ partialAliases.flatten, fact)
    val merged: Map[Expression, Expression] = aggs.zip(partialAliases).map {
      case (x, ps) =>
        val attr = ps.head.toAttribute
        val fin: Expression = x.aggregateFunction match {
          case _: Sum => Sum(attr).toAggregateExpression()
          case _: Min => Min(attr).toAggregateExpression()
          case _: Max => Max(attr).toAggregateExpression()
          case _: Count =>
            // COUNT is non-null LONG; SUM over partials is nullable —
            // coalesce restores both the type contract and the
            // zero-on-empty behavior
            Coalesce(Seq(Sum(attr).toAggregateExpression(), Literal(0L)))
          case f: Average =>
            val s = Sum(attr).toAggregateExpression()
            val c = Sum(ps(1).toAttribute).toAggregateExpression()
            // the zero-count guard matters under ANSI: an all-null
            // measure group has c = 0 (not null), and a bare Divide
            // would raise DIVIDE_BY_ZERO where AVG returns null
            If(EqualTo(c, Literal(0L)), Literal(null, f.dataType),
              Divide(Cast(s, f.dataType), Cast(c, f.dataType)))
          case other => throw new IllegalStateException(
            s"unreachable: $other gated by decomposable")
        }
        (x: Expression) -> fin
    }.toMap
    val newAe = a.aggregateExpressions.map(ne =>
      ne.transform {
        case x: AggregateExpression if merged.contains(x) => merged(x)
      }.asInstanceOf[NamedExpression])
    val newJoin =
      if (factLeft) j.copy(left = partial)
      else j.copy(right = partial)
    Some(Aggregate(a.groupingExpressions, newAe, newJoin))
  }

  /** The auto-mode cost gate: the fact must be a bare constraint-capable
    * root with a COMPLETE persisted NDV summary for exactly the partial
    * key tuple, and its recorded row count must compress at least
    * `minCompression`× onto that NDV. Driver-side metadata reads only
    * (two small JSONs) — an optimizer rule must never launch a stats
    * job. A fact behind real filters declines: the table-level NDV and
    * row count no longer describe the filtered input, and a wrong guess
    * here costs performance both ways. */
  private def autoProfitable(fact: LogicalPlan,
                             partialKeys: Seq[AttributeReference]): Boolean = {
    import graft.sources.{TxnStats, TxnTable}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project}
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    // near-bare: attribute Projects and IsNotNull-only Filters (the
    // join's own inference plants those; dropping null rows barely
    // moves a key NDV). A real predicate declines — the table-level
    // stats no longer describe the filtered input.
    def bareish(p: LogicalPlan): Boolean = p match {
      case _: LogicalRelation => true
      case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        bareish(c)
      case Filter(cond, c) if splitConjunctivePredicates(cond).forall {
          case IsNotNull(_: AttributeReference) => true
          case _ => false
        } => bareish(c)
      case _ => false
    }
    if (!bareish(fact)) return false
    ConstraintRules.chaseScan(fact)
      .flatMap(ConstraintRules.constraintRoot(_, declaredOnly = false))
      .exists { root =>
        TxnStats.ndvOf(root, partialKeys.map(_.name)) match {
          case Some((ndv, _, complete)) if complete && ndv > 0 =>
            // divide, don't multiply: minCompression × ndv can wrap
            // Long and a negative bar would fire on every plan —
            // floor(rows / m) >= ndv  ⟺  rows >= m × ndv for m > 0
            TxnTable.snapshotRowCount(root) /
              math.max(1L, minCompression) >= ndv
          case _ => false
        }
      }
  }

  // ── advisor support ────────────────────────────────────────────────

  /** One aggregate-over-join the rule COULD reorder: where to measure
    * the compression (fact root + the partial key columns) and whether
    * the non-fanning guarantee is already declared. `factRoot` is a
    * constraint-capable root whose data the advisor may price against
    * (fact sides deeper than a Project/Filter chain decline — their NDV
    * is not measurable from any one table). */
  private[plans] final case class EagerCandidate(
      factRoot: String, dimRoot: String, partialKeyCols: Seq[String],
      dimKeyCols: Seq[String], dimDeclared: Boolean)

  /** Walk a DEFAULT-optimized plan (rule off) for reorder candidates —
    * the workload advisor's raw material for pricing
    * `spark.graft.eagerAgg.enabled`. */
  private[plans] def adviceCandidates(plan: LogicalPlan): Seq[EagerCandidate] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[EagerCandidate]
    def chaseRoot(p: LogicalPlan): Option[String] =
      ConstraintRules.chaseScan(p)
        .flatMap(ConstraintRules.constraintRoot(_, declaredOnly = false))
    def scan(a: Aggregate, j: Join): Unit = {
      if (j.condition.isEmpty) return
      if (!a.groupingExpressions.forall(_.isInstanceOf[AttributeReference]))
        return
      val sides: Seq[(LogicalPlan, LogicalPlan)] = j.joinType match {
        case Inner => Seq((j.left, j.right), (j.right, j.left))
        case LeftOuter => Seq((j.left, j.right))
        case RightOuter => Seq((j.right, j.left))
        case _ => return
      }
      val conj = splitConjunctivePredicates(j.condition.get)
      sides.foreach { case (fact, dim) =>
        val pairsOpt = conj.map {
          case EqualTo(x: AttributeReference, y: AttributeReference) =>
            if (fact.outputSet.contains(x) && dim.outputSet.contains(y))
              Some((x, y))
            else if (fact.outputSet.contains(y) && dim.outputSet.contains(x))
              Some((y, x))
            else None
          case _ => None
        }
        if (!pairsOpt.exists(_.isEmpty) && pairsOpt.nonEmpty) {
          val pairs = pairsOpt.flatten
          val aggs = a.aggregateExpressions.flatMap(_.collect {
            case x: AggregateExpression => x
          }).distinct
          val aggsOk = aggs.nonEmpty && aggs.forall(decomposable) &&
            aggs.forall(_.references.subsetOf(fact.outputSet))
          if (aggsOk) {
            for {
              dimLr <- ConstraintRules.stripDim(dim, AttributeSet(pairs.map(_._2)))
              dimRoot <- ConstraintRules.constraintRoot(dimLr,
                declaredOnly = false)
              factRoot <- chaseRoot(fact)
            } {
              val geAttrs = a.groupingExpressions
                .map(_.asInstanceOf[AttributeReference])
              val partialKeys = (geAttrs.filter(fact.outputSet.contains) ++
                pairs.map(_._1)).distinct
              out += EagerCandidate(factRoot, dimRoot,
                partialKeys.map(_.name), pairs.map(_._2.name),
                TableConstraints.isUniqueOn(dimRoot,
                  pairs.map(_._2.name).toSet))
            }
          }
        }
      }
    }
    plan.foreach {
      case a @ Aggregate(_, _, j: Join, _) => scan(a, j)
      case a @ Aggregate(_, _, p: Project, _)
          if p.projectList.forall(_.isInstanceOf[AttributeReference]) &&
            p.child.isInstanceOf[Join] =>
        scan(a, p.child.asInstanceOf[Join])
      case _ => ()
    }
    out.toSeq
  }
}
