package graft.plans

import java.io.File

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat

import graft.sources.{TableConstraints, TxnTable}

/** Constraint-driven rewrites (engine-added): the optimizer side of
  * [[graft.sources.TableConstraints]] — declared RELY keys turn into
  * plan surgery the way Delta/Snowflake use informational constraints,
  * because at 100 TB the properties themselves are unaffordable to
  * re-derive per query:
  *
  *  1. JOIN ELIMINATION — a join whose dimension side contributes no
  *     output column disappears when the dim key is declared UNIQUE
  *     (the join cannot fan out) and the join type preserves the fact
  *     side: LEFT/RIGHT-outer joins drop outright; INNER joins drop
  *     when a declared FOREIGN KEY guarantees every non-null fact key a
  *     match, leaving only an `IsNotNull(factKey)` filter (pushed next
  *     to the fact scan so it reaches the parquet reader). The classic
  *     view-over-star case: `SELECT fact.cols FROM view` where the view
  *     joins five dimensions the query never touches — at scale, five
  *     shuffles and five dimension scans gone.
  *  2. DEDUP ELIMINATION — `dropDuplicates(pk)` over a row-preserving
  *     chain (Project/Filter) on a table whose `pk` is declared unique
  *     is a no-op: the two-shuffle distinct vanishes.
  *  3. DISTINCT ELIMINATION — the `Aggregate(out, out, child)` form
  *     Spark plans for `.distinct()`, same argument.
  *  4. GROUP-BY ELIMINATION — an aggregate whose grouping keys include
  *     a declared-unique key has exactly one row per group, so every
  *     supported aggregate is a per-row expression: `SUM(x) → x`,
  *     `MIN/MAX/FIRST/LAST(x) → x`, `AVG(x) → CAST(x)`,
  *     `COUNT(x) → IF(x IS NULL, 0, 1)` — the aggregation shuffle
  *     replaced by a projection.
  *
  * Soundness gates, each spec-pinned in ConstraintRulesSpec:
  *  - only `rely = true` constraints feed the rewrites (a non-RELY
  *    declaration is documentation, not a contract);
  *  - a [[graft.sources.TxnTable]] scan must read EXACTLY the head
  *    snapshot's live file set with no live deletion vectors —
  *    constraints describe the table NOW, and an `asOf` read of an
  *    older snapshot carries no such contract (a key present today may
  *    be missing then, which would make inner-join elimination invent
  *    rows). Plain parquet directories match by root identity, the same
  *    registrar's contract as [[MvRewrite]] suffix registrations;
  *  - the dimension side must be a bare scan (Project of attributes /
  *    `IsNotNull` filters on the join keys only — the shapes column
  *    pruning and the join's own constraint inference plant); any real
  *    dim-side filter disqualifies (it could unmatch fact rows);
  *  - every join conjunct must be a plain `EqualTo` across the sides
  *    (`<=>` would match null keys, changing the elimination math), and
  *    for INNER the conjunct set must equal the declared FK pairs
  *    exactly — an extra equality beyond the FK is not guaranteed a
  *    match;
  *  - dedup/distinct/group-by elimination require the unique key's
  *    attributes to reach the operator UNALIASED from the scan through
  *    Project/Filter only (attribute identity — a join in between could
  *    fan the key out).
  *
  * Kill switch: `spark.graft.constraintRewrite.enabled=false`.
  */
object ConstraintRules extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.constraintRewrite.enabled", "true") == "true"

  /** Per-optimization-pass memo for [[constraintRoot]]: the root
    * resolution does real filesystem IO (canonical paths, a txn-log
    * replay for file-list scans), and one optimizer pass probes the
    * same relations from several rules and fixed-point rounds. Scoped
    * to one `apply` (or one advisor walk) so a commit between queries
    * is always observed — a global cache would serve stale snapshots. */
  private val rootCache = new ThreadLocal[
    scala.collection.mutable.Map[(LogicalRelation, Boolean), Option[String]]]

  /** Per-pass memo of each root's RELY NOT NULL column set: the Filter
    * tautology case consults it per IsNotNull conjunct per fixed-point
    * round, and an unmemoized lookup re-reads + re-parses the
    * constraints JSON every time. Same lifecycle as [[rootCache]]. */
  private val notNullCache =
    new ThreadLocal[scala.collection.mutable.Map[String, Set[String]]]

  /** Per-pass memo of each (root, scan)'s RELY CHECK predicates,
    * RESOLVED against that scan's own attributes (exprIds matter for
    * semanticEquals) and constant-folded to the same form the optimizer
    * leaves a user filter in — paired with each predicate's SIMPLIFIED
    * NEGATION (BooleanSimplification turns a user's `NOT (q > 0)` into
    * `q <= 0` before this rule runs, so the violation probe must
    * compare against the same normal form). Same lifecycle as
    * [[rootCache]]. */
  private val checkCache = new ThreadLocal[
    scala.collection.mutable.Map[(String, LogicalRelation),
      Seq[(Expression, Expression)]]]

  private[plans] def relyNotNullCols(root: String): Set[String] = {
    def compute = TableConstraints.notNulls(root)
      .filter(_.rely).flatMap(_.cols).toSet
    val memo = notNullCache.get()
    if (memo == null) compute
    else memo.getOrElseUpdate(root, compute)
  }

  private[plans] def withRootCache[T](body: => T): T = {
    val prev = rootCache.get()
    val prevNn = notNullCache.get()
    val prevCk = checkCache.get()
    rootCache.set(scala.collection.mutable.Map.empty)
    notNullCache.set(scala.collection.mutable.Map.empty)
    checkCache.set(scala.collection.mutable.Map.empty)
    try body
    finally {
      rootCache.set(prev); notNullCache.set(prevNn); checkCache.set(prevCk)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else withRootCache(plan.transformUp {
      case p @ Project(_, j: Join) =>
        elimJoin(p.references, j).map(c => p.copy(child = c)).getOrElse(p)
      case a @ Aggregate(_, _, j: Join, _) =>
        elimJoin(a.references, j).map(c => a.copy(child = c)).getOrElse(a)
      // EXISTS/NOT-EXISTS under a declared FK: a semi join to the FK's
      // target keeps exactly the non-null-key fact rows (every one
      // matches), an anti join keeps exactly the null-key ones — both
      // become filters, no dim scan, no join. Uniqueness is not even
      // needed (semi/anti joins never fan out), and the join's output
      // IS the fact side, so the rewrite needs no parent cooperation.
      case j @ Join(fact, dim, LeftSemi, Some(_), _) =>
        semiAntiElim(j, fact, dim, anti = false).getOrElse(j)
      case j @ Join(fact, dim, LeftAnti, Some(_), _) =>
        semiAntiElim(j, fact, dim, anti = true).getOrElse(j)
      case d @ Deduplicate(keys, child)
          if coveredByUnique(AttributeSet(keys), child) =>
        child
      case a: Aggregate =>
        distinctElim(a).orElse(aggElim(a)).getOrElse(a)
      // IS NOT NULL on a declared-NOT-NULL column is a tautology —
      // whether the user wrote it or join inference planted it, the
      // conjunct drops (the filter row-count cost is trivial; what this
      // buys is plan hygiene and, for a filter that becomes empty, the
      // whole node). Likewise a conjunct equal to a declared RELY CHECK
      // (STRICT: every row TRUE) is a tautology; and NOT(check) makes
      // the whole filter PROVABLY EMPTY — a 100 TB violation audit
      // answered from metadata. RELY contract like every rewrite here.
      case f @ Filter(cond, child) =>
        val conj = splitConjunctivePredicates(cond)
        if (conj.exists(e => declaredCheckViolation(child, e) ||
            checkContradicts(child, e)))
          org.apache.spark.sql.catalyst.plans.logical.LocalRelation(f.output)
        else {
          val kept = conj.filterNot {
            case IsNotNull(a: AttributeReference) => declaredNotNull(child, a)
            case c => declaredCheck(child, c) || checkImplies(child, c)
          }
          if (kept.length == conj.length) f
          else if (kept.isEmpty) child
          else Filter(kept.reduce(And), child)
        }
    })

  /** True when `a` reaches its scan UNALIASED through row-preserving
    * operators and the scan's root declares a RELY NOT NULL on it — or
    * a RELY CHECK *implies* it: a strict check being TRUE on every row
    * proves non-null for any attribute the predicate reaches through
    * null-intolerant operators only (were it NULL, the conjunct would
    * evaluate NULL, not TRUE). Without the implication, the IsNotNull
    * the optimizer itself infers from the user's predicate would
    * survive the tautology drop and keep the column in the scan. */
  private def declaredNotNull(plan: LogicalPlan, a: AttributeReference): Boolean =
    chaseScan(plan).exists { lr =>
      lr.outputSet.contains(a) && constraintRoot(lr).exists { root =>
        relyNotNullCols(root).contains(a.name) ||
          relyChecksFor(root, lr).exists { case (ck, _) =>
            impliedNotNull(ck).exists(_.semanticEquals(a)) }
      }
    }

  /** Attributes a TRUE strict predicate proves non-null: each conjunct
    * is TRUE, so any attribute it reaches through exclusively
    * null-intolerant operators cannot be NULL (the same walk Spark's
    * own InferFiltersFromConstraints does over query predicates). */
  private def impliedNotNull(e: Expression): Seq[Attribute] = {
    def scan(x: Expression): Seq[Attribute] = x match {
      case a: Attribute => Seq(a)
      // In/InSet don't carry Spark's nullIntolerant flag, but both ARE
      // null-intolerant in the sense this walk needs: a NULL value (or
      // NULL list element) evaluates to NULL, never TRUE — so a strict
      // check `a IN (…)` being TRUE proves a non-null
      case In(v, _) => scan(v)
      case InSet(v, _) => scan(v)
      case y if y.nullIntolerant => y.children.flatMap(scan)
      case _ => Nil
    }
    splitConjunctivePredicates(e).flatMap(scan)
  }

  /** True when `e` is semantically one of the scan root's declared RELY
    * CHECK predicates — the row-preserving chase and bare-scan gates
    * are [[declaredNotNull]]'s; the declared expression is resolved
    * against the SCAN'S OWN attributes (same exprIds the user's
    * conjunct carries when it reached the scan unaliased), so
    * semanticEquals compares like with like. */
  private def declaredCheck(plan: LogicalPlan, e: Expression): Boolean =
    chaseScan(plan).exists { lr =>
      constraintRoot(lr).exists { root =>
        relyChecksFor(root, lr).exists(_._1.semanticEquals(e))
      }
    }

  /** True when `e` is semantically the NEGATION of a declared RELY
    * check — every row satisfies the check (STRICT: TRUE), so a filter
    * carrying `e` as a conjunct is provably empty. */
  private def declaredCheckViolation(plan: LogicalPlan, e: Expression): Boolean =
    chaseScan(plan).exists { lr =>
      constraintRoot(lr).exists { root =>
        relyChecksFor(root, lr).exists(_._2.semanticEquals(e))
      }
    }

  // ── interval implication for comparison conjuncts ────────────────────
  //
  // Equality matching alone leaves the obvious cases on the table:
  // `x < 10` under a declared `x < 5` is a tautology, `x > 10` under it
  // is provably empty. Both directions reduce to interval arithmetic on
  // single-attribute comparisons against literals of the attribute's own
  // type (the analyzer has folded casts by the time the rule runs):
  // the declared STRICT check is TRUE on every row — so the attribute is
  // non-null (comparisons are null-intolerant) and its value lies in the
  // check's interval — hence a user conjunct whose interval CONTAINS the
  // check's is TRUE on every row (drop it), and one DISJOINT from it is
  // FALSE on every row (the filter is empty). NaN follows Spark's own
  // comparison order (largest double), which the interpreted ordering
  // reproduces, so the reasoning holds on NaN-carrying columns too.

  /** One-sided or two-sided interval: (value, inclusive?) bounds. */
  private case class Interval(lo: Option[(Any, Boolean)],
                              hi: Option[(Any, Boolean)])

  /** `e` as (attribute, interval) when it is a comparison of a bare
    * attribute against a non-null literal of the SAME type — the only
    * shape the arithmetic is sound for (a cast on the attribute side
    * could change comparison semantics; conservative, never wrong). */
  private def boundOf(e: Expression): Option[(AttributeReference, Interval)] = {
    def mk(a: AttributeReference, l: Literal,
           lo: Option[(Any, Boolean)], hi: Option[(Any, Boolean)]) =
      if (l.value == null || l.dataType != a.dataType) None
      else Some((a, Interval(lo, hi)))
    e match {
      case LessThan(a: AttributeReference, l: Literal) =>
        mk(a, l, None, Some((l.value, false)))
      case LessThanOrEqual(a: AttributeReference, l: Literal) =>
        mk(a, l, None, Some((l.value, true)))
      case GreaterThan(a: AttributeReference, l: Literal) =>
        mk(a, l, Some((l.value, false)), None)
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
        mk(a, l, Some((l.value, true)), None)
      case EqualTo(a: AttributeReference, l: Literal) =>
        mk(a, l, Some((l.value, true)), Some((l.value, true)))
      case LessThan(l: Literal, a: AttributeReference) =>
        mk(a, l, Some((l.value, false)), None)
      case LessThanOrEqual(l: Literal, a: AttributeReference) =>
        mk(a, l, Some((l.value, true)), None)
      case GreaterThan(l: Literal, a: AttributeReference) =>
        mk(a, l, None, Some((l.value, false)))
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
        mk(a, l, None, Some((l.value, true)))
      case EqualTo(l: Literal, a: AttributeReference) =>
        mk(a, l, Some((l.value, true)), Some((l.value, true)))
      case _ => None
    }
  }

  private def orderingFor(dt: org.apache.spark.sql.types.DataType): Option[Ordering[Any]] = {
    // getInterpretedOrdering throws on unorderable types — conservative
    // None, the conjunct simply never matches
    try Some(org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(dt))
    catch { case scala.util.control.NonFatal(_) => None }
  }

  /** inner ⊆ outer under `ord` (bound-by-bound: an absent outer bound
    * contains everything; equal values need the outer bound inclusive
    * or the inner one exclusive). */
  private def subsumes(outer: Interval, inner: Interval, ord: Ordering[Any]): Boolean = {
    val loOk = outer.lo.forall { case (ov, oi) =>
      inner.lo.exists { case (iv, ii) =>
        val c = ord.compare(iv, ov)
        c > 0 || (c == 0 && (oi || !ii))
      }
    }
    val hiOk = outer.hi.forall { case (ov, oi) =>
      inner.hi.exists { case (iv, ii) =>
        val c = ord.compare(iv, ov)
        c < 0 || (c == 0 && (oi || !ii))
      }
    }
    loOk && hiOk
  }

  /** a ∩ b = ∅ under `ord` (one's upper bound falls below the other's
    * lower; touching bounds intersect only when both are inclusive). */
  private def disjoint(a: Interval, b: Interval, ord: Ordering[Any]): Boolean = {
    def below(hi: Option[(Any, Boolean)], lo: Option[(Any, Boolean)]): Boolean =
      (hi, lo) match {
        case (Some((hv, hi0)), Some((lv, li0))) =>
          val c = ord.compare(hv, lv)
          c < 0 || (c == 0 && !(hi0 && li0))
        case _ => false
      }
    below(a.hi, b.lo) || below(b.hi, a.lo)
  }

  /** `e` as (attribute, finite value set) when it constrains a bare
    * attribute to an explicit list of same-type, non-null literals —
    * `a IN (…)`, its post-[[OptimizeIn]] `InSet` form, and equality
    * (a singleton set). The finite-set sibling of [[boundOf]]: a
    * declared STRICT check of this shape proves every row's value is
    * IN the set, which supports implication arithmetic intervals
    * cannot express. NOT IN stays out (its NULL semantics don't reduce
    * to set arithmetic under STRICT truth). */
  private def inSetOf(e: Expression): Option[(AttributeReference, Seq[Any])] =
    e match {
      case In(a: AttributeReference, vs) if vs.nonEmpty && vs.forall {
          case l: Literal => l.value != null && l.dataType == a.dataType
          case _ => false
        } => Some((a, vs.map(_.asInstanceOf[Literal].value)))
      case InSet(a: AttributeReference, hs)
          if hs.nonEmpty && !hs.contains(null) => Some((a, hs.toSeq))
      case EqualTo(a: AttributeReference, l: Literal)
          if l.value != null && l.dataType == a.dataType => Some((a, Seq(l.value)))
      case EqualTo(l: Literal, a: AttributeReference)
          if l.value != null && l.dataType == a.dataType => Some((a, Seq(l.value)))
      case _ => None
    }

  /** Declared-check intervals for `a` at its scan: every comparison
    * conjunct of every RELY check naming this attribute. */
  private def checkIntervalsFor(plan: LogicalPlan,
                                a: AttributeReference): Seq[Interval] =
    checkConjunctsFor(plan, a).flatMap(boundOf).collect {
      case (ka, iv) if ka.semanticEquals(a) => iv
    }

  /** Declared-check FINITE SETS for `a` at its scan: every IN/equality
    * conjunct of every RELY check naming this attribute. */
  private def checkSetsFor(plan: LogicalPlan,
                           a: AttributeReference): Seq[Seq[Any]] =
    checkConjunctsFor(plan, a).flatMap(inSetOf).collect {
      case (ka, s) if ka.semanticEquals(a) => s
    }

  private def checkConjunctsFor(plan: LogicalPlan,
                                a: AttributeReference): Seq[Expression] =
    chaseScan(plan).toSeq.flatMap { lr =>
      if (!lr.outputSet.contains(a)) Nil
      else constraintRoot(lr).toSeq.flatMap { root =>
        relyChecksFor(root, lr).flatMap { case (ck, _) =>
          splitConjunctivePredicates(ck)
        }
      }
    }

  private def inIv(v: Any, iv: Interval, ord: Ordering[Any]): Boolean = {
    val loOk = iv.lo.forall { case (lv, li) =>
      val c = ord.compare(v, lv); c > 0 || (c == 0 && li) }
    val hiOk = iv.hi.forall { case (hv, hi) =>
      val c = ord.compare(v, hv); c < 0 || (c == 0 && hi) }
    loOk && hiOk
  }

  private def inSet(v: Any, s: Seq[Any], ord: Ordering[Any]): Boolean =
    s.exists(ord.compare(_, v) == 0)

  /** True when a declared check PROVES `e` TRUE on every row — the
    * conjunct drops. Interval vs interval (containment), plus the
    * finite-set forms: a declared `a IN S` under a user interval that
    * contains every element of S, a declared set S under a user
    * `a IN T` with S ⊆ T, and a declared point interval inside a user
    * IN-list. */
  private def checkImplies(plan: LogicalPlan, e: Expression): Boolean = {
    val byInterval = boundOf(e).exists { case (a, userIv) =>
      orderingFor(a.dataType).exists { ord =>
        checkIntervalsFor(plan, a).exists(kIv => subsumes(userIv, kIv, ord)) ||
          checkSetsFor(plan, a).exists(s => s.forall(inIv(_, userIv, ord)))
      }
    }
    byInterval || inSetOf(e).exists { case (a, userSet) =>
      orderingFor(a.dataType).exists { ord =>
        checkSetsFor(plan, a).exists(s => s.forall(inSet(_, userSet, ord))) ||
          checkIntervalsFor(plan, a).exists {
            // an interval only implies a finite list when it is a POINT
            case Interval(Some((lv, true)), Some((hv, true)))
                if ord.compare(lv, hv) == 0 => inSet(lv, userSet, ord)
            case _ => false
          }
      }
    }
  }

  /** True when a declared check PROVES `e` FALSE on every row — the
    * filter is provably empty. Interval disjointness, plus the finite
    * sets: declared S with no element satisfying the user interval /
    * inside the user IN-list, and a user IN-list with no element in
    * the declared interval. */
  private def checkContradicts(plan: LogicalPlan, e: Expression): Boolean = {
    val byInterval = boundOf(e).exists { case (a, userIv) =>
      orderingFor(a.dataType).exists { ord =>
        checkIntervalsFor(plan, a).exists(kIv => disjoint(kIv, userIv, ord)) ||
          checkSetsFor(plan, a).exists(s => !s.exists(inIv(_, userIv, ord)))
      }
    }
    byInterval || inSetOf(e).exists { case (a, userSet) =>
      orderingFor(a.dataType).exists { ord =>
        checkSetsFor(plan, a).exists(s => !s.exists(inSet(_, userSet, ord))) ||
          checkIntervalsFor(plan, a).exists(kIv =>
            !userSet.exists(inIv(_, kIv, ord)))
      }
    }
  }

  /** The root's RELY checks parsed, analyzed against `lr.output`, and
    * constant-folded — the exact form an optimizer-resident user
    * conjunct has by the time this rule sees it (the analyzer has
    * inserted literal casts, constant folding has collapsed them). A
    * check that fails to parse, resolve, or analyze here simply never
    * matches (its columns may be pruned from this scan, or it may use
    * syntax the bare resolver can't take) — conservative, never wrong. */
  private def relyChecksFor(root: String,
                            lr: LogicalRelation): Seq[(Expression, Expression)] = {
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    def fold(e: Expression): Expression = e.transformUp {
      // IN coercion wraps EVERY child uniformly — including a same-type
      // no-op cast on the attribute (cast(sz AS bigint) over a bigint
      // column) that the optimizer's SimplifyCasts strips from the
      // user's conjunct; strip it here too or the two forms never match
      case c: Cast if c.dataType == c.child.dataType => c.child
      case x if x.foldable && !x.isInstanceOf[Literal] =>
        Literal.create(x.eval(EmptyRow), x.dataType)
    }
    // the negation, pushed through the SAME simplification the user's
    // own `!pred` goes through before this rule sees it
    def simplifiedNot(c: Expression): Expression =
      org.apache.spark.sql.catalyst.optimizer.BooleanSimplification(
        Filter(Not(c), LocalRelation(lr.output))) match {
        case Filter(n, _) => fold(n)
        case _ => Not(c)
      }
    def compute: Seq[(Expression, Expression)] =
      TableConstraints.checks(root).filter(_.rely).flatMap { ck =>
        try {
          val parsed = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
            .parseExpression(ck.expr)
          val analyzed = org.apache.spark.sql.catalyst.analysis.SimpleAnalyzer
            .execute(Filter(parsed, LocalRelation(lr.output)))
          analyzed match {
            case Filter(c, _) if c.resolved =>
              val folded = fold(c)
              Some((folded, simplifiedNot(folded)))
            case _ => None
          }
        } catch { case scala.util.control.NonFatal(_) => None }
      }
    val memo = checkCache.get()
    if (memo == null) compute
    else memo.getOrElseUpdate((root, lr), compute)
  }

  /** The directory whose declared constraints govern this scan, or None.
    * A plain single-directory parquet scan matches by root identity; a
    * file-list scan must be EXACTLY some txn table's head live data set
    * (no live deletion vectors — a DV'd read is not a bare scan anyway). */
  /** `declaredOnly = true` (the rewrite paths) fast-exits BEFORE the
    * txn-log replay when the root carries no constraints file at all —
    * the common case for every scan in a deployment that never declared
    * anything, which must not pay a log replay per optimizer pass. The
    * advisor walks pass false: an UNDECLARED root is exactly what they
    * advise about. */
  private[plans] def constraintRoot(lr: LogicalRelation,
                                    declaredOnly: Boolean = true): Option[String] = {
    val memo = rootCache.get()
    if (memo == null) resolveConstraintRoot(lr, declaredOnly)
    else memo.getOrElseUpdate((lr, declaredOnly),
      resolveConstraintRoot(lr, declaredOnly))
  }

  private def resolveConstraintRoot(lr: LogicalRelation,
                                    declaredOnly: Boolean): Option[String] =
    lr.relation match {
      case fs: HadoopFsRelation
          if fs.location.rootPaths.nonEmpty &&
            fs.fileFormat.isInstanceOf[ParquetFileFormat] =>
        val roots = fs.location.rootPaths.map(p => new File(p.toUri.getPath))
        if (roots.size == 1 && roots.head.isDirectory) {
          // a directory scan of a txn ROOT would see every version's
          // files — not a snapshot of anything; refuse
          if (new File(roots.head, "_graft_log").isDirectory) None
          else Some(roots.head.getPath)
        } else {
          TxnTable.tableRootOf(roots.head.getParentFile).flatMap { t =>
            // nothing declared: skip the log replay below
            if (declaredOnly &&
                !new File(t, "_graft_constraints.json").isFile) None
            else {
            val prefix = t.getCanonicalPath + File.separator
            val rel = roots.foldLeft(Option(Set.empty[String])) { (acc, f) =>
              acc.flatMap { s =>
                val p = f.getCanonicalPath
                if (p.startsWith(prefix)) Some(s + p.substring(prefix.length))
                else None
              }
            }
            rel.flatMap { files =>
              val (data, dv) = TxnTable.liveSplit(t.getPath)
              if (dv.isEmpty && files == data.toSet) Some(t.getPath) else None
            }
            }
          }
        }
      case _ => None
    }

  // ── join elimination ───────────────────────────────────────────────

  private def elimJoin(used: AttributeSet, j: Join): Option[LogicalPlan] = {
    if (j.condition.isEmpty) return None
    val candidates: Seq[(LogicalPlan, LogicalPlan)] = j.joinType match {
      case Inner => Seq((j.left, j.right), (j.right, j.left))
      case LeftOuter => Seq((j.left, j.right))
      case RightOuter => Seq((j.right, j.left))
      case _ => return None
    }
    val conj = splitConjunctivePredicates(j.condition.get)
    candidates.view
      .flatMap { case (fact, dim) => tryElim(used, j, fact, dim, conj) }
      .headOption
  }

  /** The STRUCTURAL half of elimination, shared with the advisor's
    * candidate walk: dim output unused, every conjunct a plain cross-
    * side equality, dim a bare constraint-rooted scan. Returns the
    * (factKey, dimKey) pairs and the dim's constraint root. */
  private def admissible(used: AttributeSet, fact: LogicalPlan,
                         dim: LogicalPlan, conj: Seq[Expression],
                         declaredOnly: Boolean = true)
      : Option[(Seq[(AttributeReference, AttributeReference)], String)] = {
    if (used.intersect(dim.outputSet).nonEmpty) return None
    val pairsOpt = conj.map {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        if (fact.outputSet.contains(a) && dim.outputSet.contains(b)) Some((a, b))
        else if (fact.outputSet.contains(b) && dim.outputSet.contains(a)) Some((b, a))
        else None
      case _ => None
    }
    if (pairsOpt.exists(_.isEmpty) || pairsOpt.isEmpty) return None
    val pairs = pairsOpt.flatten
    for {
      lr <- stripDim(dim, AttributeSet(pairs.map(_._2)))
      dimRoot <- constraintRoot(lr, declaredOnly)
    } yield (pairs, dimRoot)
  }

  private def tryElim(used: AttributeSet, j: Join, fact: LogicalPlan,
                      dim: LogicalPlan, conj: Seq[Expression])
      : Option[LogicalPlan] = {
    for {
      (pairs, dimRoot) <- admissible(used, fact, dim, conj)
      if TableConstraints.isUniqueOn(dimRoot, pairs.map(_._2.name).toSet)
      result <- j.joinType match {
        case LeftOuter | RightOuter =>
          Some(fact) // fact rows preserved verbatim; dim output unused
        case Inner =>
          fkGate(fact, pairs, dimRoot).map { case (keys, factRoot) =>
            notNullResidual(fact, keys, factRoot) }
        case _ => None
      }
    } yield result
  }

  /** Semi/anti-join elimination under an exact-cover FK. The fact rows
    * a semi join keeps are those with a match — under the FK, exactly
    * those whose keys are ALL non-null; the anti join keeps the
    * complement (any-key-null rows: an equality against NULL never
    * matches). Gates mirror [[tryElim]] minus uniqueness (semi/anti
    * never fan): bare head-snapshot dim, plain equalities, pairs ==
    * the declared FK exactly, FK-clean fact provenance. */
  private def semiAntiElim(j: Join, fact: LogicalPlan, dim: LogicalPlan,
                           anti: Boolean): Option[LogicalPlan] = {
    val conj = splitConjunctivePredicates(j.condition.get)
    for {
      // used = ∅: a semi/anti join's output IS its fact side
      (pairs, dimRoot) <- admissible(AttributeSet.empty, fact, dim, conj)
      (factKeys, factRoot) <- fkGate(fact, pairs, dimRoot)
    } yield {
      if (anti) {
        // kept rows: any FK column null (they can never match) — a
        // declared RELY NOT NULL counts as non-null even when the
        // parquet type says nullable
        val nullable = factKeys.filterNot(knownNotNull(factRoot, _))
        if (nullable.isEmpty)
          // non-nullable keys: the anti join is provably empty (the
          // provenance walk refused null-extension, so the flag holds)
          org.apache.spark.sql.catalyst.plans.logical.LocalRelation(fact.output)
        else
          // pushed to the owning scan like the semi residual — sound to
          // commute through exactly the operators fkCleanScan admitted,
          // and the parquet reader then prunes the (usually tiny)
          // null-key complement instead of the whole fact flowing
          // through the fact side's own joins first
          insertFilter(fact, AttributeSet(factKeys),
            nullable.map(IsNull(_): Expression).reduce(Or))
      } else notNullResidual(fact, factKeys, factRoot)
    }
  }

  /** FK-CLEAN provenance: the key attrs' values above `p` are a
    * sub-multiset of the owning scan's column values — rows may be
    * filtered or duplicated on the way up, never null-extended
    * (outer-join sides), unioned with another source (Union reuses its
    * first child's exprIds, so a scan match would claim the other
    * children's unconstrained values), expanded, limited, or windowed
    * (a row dropped early under a Limit/Window changes which rows
    * survive / what the frames compute — the residual filter would not
    * commute). Whitelist walk; anything unrecognized refuses. Returns
    * the owning scan when clean. */
  private def fkCleanScan(p: LogicalPlan, keys: AttributeSet)
      : Option[LogicalRelation] = p match {
    case lr: LogicalRelation if keys.subsetOf(lr.outputSet) => Some(lr)
    case Project(_, c) if keys.subsetOf(c.outputSet) => fkCleanScan(c, keys)
    case Filter(_, c) => fkCleanScan(c, keys)
    case jn: Join =>
      val side: Option[LogicalPlan] = jn.joinType match {
        case Inner | org.apache.spark.sql.catalyst.plans.Cross |
             LeftSemi | LeftAnti | LeftOuter =>
          // keys must live on the preserved (left) side for outer; for
          // inner/cross either side preserves provenance — pick by
          // ownership
          if (keys.subsetOf(jn.left.outputSet)) Some(jn.left)
          else if ((jn.joinType == Inner ||
              jn.joinType == org.apache.spark.sql.catalyst.plans.Cross) &&
            keys.subsetOf(jn.right.outputSet)) Some(jn.right)
          else None
        case RightOuter =>
          if (keys.subsetOf(jn.right.outputSet)) Some(jn.right) else None
        case _ => None
      }
      side.flatMap(fkCleanScan(_, keys))
    case _ => None
  }

  /** The FK half shared by inner and semi/anti elimination: the join
    * pairs must exactly cover a declared RELY FK whose fact keys reach
    * their owning scan through FK-clean provenance. Returns the fact
    * key attrs and the fact's constraint root (whose NOT NULL
    * declarations refine the residual). */
  private def fkGate(fact: LogicalPlan,
                     pairs: Seq[(AttributeReference, AttributeReference)],
                     dimRoot: String)
      : Option[(Seq[AttributeReference], String)] = {
    val factKeys = pairs.map(_._1)
    fkCleanScan(fact, AttributeSet(factKeys))
      .flatMap(constraintRoot(_))
      .filter(factRoot => TableConstraints.fkCovers(factRoot,
        pairs.map(p => (p._1.name, p._2.name)).toSet, dimRoot))
      .map(factRoot => (factKeys, factRoot))
  }

  /** A key is known non-null when its TYPE says so or a RELY NOT NULL
    * is declared on it at the fact root — the declaration upgrades
    * nullable-typed parquet columns (the usual case: parquet readers
    * type everything nullable) to the same contract. */
  private def knownNotNull(factRoot: String, a: AttributeReference): Boolean =
    !a.nullable || relyNotNullCols(factRoot).contains(a.name)

  /** FK constrains non-null keys only: the dropped join also dropped
    * null-keyed fact rows, so the rewrite must too — except keys a
    * fact-side filter already pins non-null (the join's own inference
    * usually has), which would duplicate the pushed filter, and keys
    * DECLARED NOT NULL (no null rows exist to drop). Sound to place at
    * the scan because [[fkCleanScan]] admitted only operators a
    * key-null filter commutes with. */
  private def notNullResidual(fact: LogicalPlan,
                              factKeys: Seq[AttributeReference],
                              factRoot: String): LogicalPlan = {
    val already = fact.collect { case Filter(c, _) =>
      splitConjunctivePredicates(c).collect {
        case IsNotNull(a: AttributeReference) => a.exprId
      }
    }.flatten.toSet
    val notNull = factKeys.filter(a =>
      !knownNotNull(factRoot, a) && !already.contains(a.exprId))
    if (notNull.isEmpty) fact
    else insertFilter(fact, AttributeSet(factKeys),
      notNull.map(IsNotNull(_): Expression).reduce(And))
  }

  /** Place the residual IsNotNull next to the scan that owns the keys —
    * below any Project — so FileSourceStrategy still pushes it into the
    * parquet reader. */
  private def insertFilter(fact: LogicalPlan, keys: AttributeSet,
                           cond: Expression): LogicalPlan = {
    var done = false
    val out = fact.transformUp {
      case lr: LogicalRelation if !done && keys.subsetOf(lr.outputSet) =>
        done = true
        Filter(cond, lr)
    }
    if (done) out else Filter(cond, fact)
  }

  /** Chase through attribute-only Projects and Filters to the scan —
    * the provenance-preserving prefix every metadata consumer
    * (requireDimUnique, the eager advisor's fact walk) shares. */
  private[plans] def chaseScan(p: LogicalPlan): Option[LogicalRelation] =
    p match {
      case lr: LogicalRelation => Some(lr)
      case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        chaseScan(c)
      case Filter(_, c) => chaseScan(c)
      case _ => None
    }

  /** Bare dimension scan: Projects of plain attributes and Filters whose
    * conjuncts are all IsNotNull on the JOIN KEYS (the inference the
    * inner join itself plants; such rows could never match, so dropping
    * them changes neither join shape). Anything else disqualifies. */
  private[plans] def stripDim(p: LogicalPlan, keyAttrs: AttributeSet)
      : Option[LogicalRelation] = p match {
    case lr: LogicalRelation => Some(lr)
    case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      stripDim(c, keyAttrs)
    case Filter(cond, c) if splitConjunctivePredicates(cond).forall {
        case IsNotNull(a: AttributeReference) => keyAttrs.contains(a)
        case _ => false
      } =>
      stripDim(c, keyAttrs)
    case _ => None
  }

  // ── dedup / distinct / group-by elimination ────────────────────────

  /** True when `attrs` contains, UNALIASED, every column of some RELY
    * unique constraint of the scan under `plan` — reached through
    * row-multiplicity-preserving operators only (Project never
    * duplicates, Filter only drops). */
  private def coveredByUnique(attrs: AttributeSet, plan: LogicalPlan): Boolean = {
    def chase(p: LogicalPlan): Option[LogicalRelation] = p match {
      case lr: LogicalRelation => Some(lr)
      case Project(_, c) => chase(c)
      case Filter(_, c) => chase(c)
      case _ => None
    }
    chase(plan).exists { lr =>
      constraintRoot(lr).exists { root =>
        TableConstraints.uniques(root).exists(u => u.rely &&
          u.cols.forall(cn =>
            lr.output.exists(a => a.name == cn && attrs.contains(a))))
      }
    }
  }

  /** `.distinct()` plans as Aggregate(out, out, child): a no-op when the
    * child rows are already unique on a declared key. */
  private def distinctElim(a: Aggregate): Option[LogicalPlan] = {
    val ae = a.aggregateExpressions
    if (a.groupingExpressions.length == ae.length &&
        ae.forall(_.isInstanceOf[Attribute]) &&
        a.groupingExpressions.zip(ae).forall { case (g, x) => g.semanticEquals(x) } &&
        coveredByUnique(AttributeSet(ae.map(_.asInstanceOf[Attribute])), a.child)) {
      val attrs = ae.map(_.asInstanceOf[Attribute])
      Some(
        if (a.child.output.map(_.exprId) == attrs.map(_.exprId)) a.child
        else Project(ae, a.child))
    } else None
  }

  /** Grouping on a declared-unique key ⇒ one row per group ⇒ aggregates
    * become per-row expressions and the shuffle becomes a Project. */
  private def aggElim(a: Aggregate): Option[LogicalPlan] = {
    val ge = a.groupingExpressions
    if (ge.isEmpty || !ge.forall(_.isInstanceOf[AttributeReference])) return None
    // cheap shape gates first — the uniqueness check below reads the
    // filesystem (constraint file + txn log), so it must come last
    val aggs = a.aggregateExpressions.flatMap(_.collect {
      case x: AggregateExpression => x
    })
    if (aggs.isEmpty || !aggs.forall(rewritableAgg)) return None
    if (!a.aggregateExpressions.forall(_.deterministic)) return None
    if (!coveredByUnique(
        AttributeSet(ge.map(_.asInstanceOf[AttributeReference])), a.child))
      return None
    val newList = a.aggregateExpressions.map(ne =>
      ne.transform { case x: AggregateExpression => rewriteAgg(x) }
        .asInstanceOf[NamedExpression])
    Some(Project(newList, a.child))
  }

  private def rewritableAgg(x: AggregateExpression): Boolean =
    x.filter.isEmpty && (x.aggregateFunction match {
      case _: Sum | _: Min | _: Max | _: Average | _: First | _: Last |
           _: Count => true
      case _ => false
    })

  /** The single-row value of each aggregate. Result types follow the
    * aggregate's own dataType (SUM(int) is BIGINT, AVG(int) is DOUBLE,
    * SUM(decimal) widens — the casts are exact on one value), so the
    * rewritten Project is schema-identical to the Aggregate. DISTINCT
    * flags are irrelevant on one row; FILTER clauses were refused. */
  private def rewriteAgg(x: AggregateExpression): Expression =
    x.aggregateFunction match {
      case f: Sum => Cast(f.child, f.dataType)
      case f: Average => Cast(f.child, f.dataType)
      case f: Min => f.child
      case f: Max => f.child
      case f: First => f.child
      case f: Last => f.child
      case f: Count =>
        val nullable = f.children.filter(_.nullable)
        if (nullable.isEmpty) Literal(1L)
        else If(nullable.map(IsNull(_): Expression).reduce(Or),
          Literal(0L), Literal(1L))
      case other =>
        throw new IllegalStateException(s"unreachable: $other gated by rewritableAgg")
    }

  // ── advisor support ────────────────────────────────────────────────

  /** One join the rules COULD eliminate if the right constraints were
    * declared — the workload advisor's raw material. `factRoot` is None
    * for outer joins (no FK needed) and for facts that are not
    * constraint-capable roots. */
  private[plans] final case class JoinAdvice(
      inner: Boolean, dimRoot: String, dimKeys: Seq[String],
      factRoot: Option[String], factKeys: Seq[String])

  /** Walk an OPTIMIZED plan for structurally eliminable joins. Run on
    * the optimized plan on purpose: a join whose constraints ARE
    * declared has already been eliminated by the time this walk sees
    * the plan, so whatever joins remain are exactly the missing-
    * declaration candidates. */
  private[plans] def adviceCandidates(plan: LogicalPlan): Seq[JoinAdvice] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[JoinAdvice]
    def scanJoin(used: AttributeSet, j: Join): Unit = {
      if (j.condition.isEmpty) return
      val sides: Seq[(LogicalPlan, LogicalPlan)] = j.joinType match {
        case Inner => Seq((j.left, j.right), (j.right, j.left))
        case LeftOuter => Seq((j.left, j.right))
        case RightOuter => Seq((j.right, j.left))
        case _ => return
      }
      val conj = splitConjunctivePredicates(j.condition.get)
      sides.foreach { case (fact, dim) =>
        admissible(used, fact, dim, conj, declaredOnly = false)
            .foreach { case (pairs, dimRoot) =>
          val inner = j.joinType == Inner
          val factKeys = pairs.map(_._1)
          val factRoot =
            if (!inner) None
            else fkCleanScan(fact, AttributeSet(factKeys))
              .flatMap(constraintRoot(_, declaredOnly = false))
          // an inner candidate with no constraint-capable fact root can
          // never be declared for — not a candidate
          if (!inner || factRoot.isDefined)
            out += JoinAdvice(inner, dimRoot, pairs.map(_._2.name),
              factRoot, factKeys.map(_.name))
        }
      }
    }
    plan.foreach {
      case p @ Project(_, j: Join) => scanJoin(p.references, j)
      case a @ Aggregate(_, _, j: Join, _) => scanJoin(a.references, j)
      case _ => ()
    }
    out.toSeq
  }

  /** One declare_check candidate: a deterministic, subquery-free filter
    * conjunct whose references all reach ONE constrainable scan. */
  final case class CheckAdvice(root: String, cols: Seq[String], sql: String)

  /** Workload CHECK-advice extraction — the filter-predicate sibling of
    * [[adviceCandidates]]: each qualifying conjunct of each Filter is a
    * candidate strict check on its scan's root. IsNotNull conjuncts are
    * excluded (the NOT NULL family owns them, and the optimizer plants
    * them by inference), as is anything non-deterministic or carrying a
    * subquery. A conjunct whose check is ALREADY declared never appears
    * — the tautology drop removed it from the optimized plan before
    * this walk sees it, which is exactly the advisor's closed loop. */
  private[plans] def checkCandidates(plan: LogicalPlan): Seq[CheckAdvice] =
    plan.collect {
      case Filter(cond, child) =>
        chaseScan(child).toSeq
          .flatMap(lr => constraintRoot(lr, declaredOnly = false)
            .map(root => (lr, root)))
          .flatMap { case (lr, root) =>
            splitConjunctivePredicates(cond)
              .filter { c =>
                c.deterministic && c.references.nonEmpty &&
                  c.references.subsetOf(lr.outputSet) &&
                  !c.isInstanceOf[IsNotNull] &&
                  !c.exists(_.isInstanceOf[
                    org.apache.spark.sql.catalyst.expressions.SubqueryExpression]) &&
                  !c.sql.contains("\"") // must round-trip declareCheck
              }
              .map(c => CheckAdvice(root,
                c.references.toSeq.map(_.name).sorted, c.sql))
          }
    }.flatten
}
