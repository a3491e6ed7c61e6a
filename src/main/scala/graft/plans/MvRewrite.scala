package graft.plans

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, count, lit, sum}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Materialized-view auto-rewrite (engine-added): an optimizer rule that
  * answers GROUP-BY aggregates over a registered base table FROM its
  * pre-aggregated summary — the classic OLAP cube/rollup-cache trade,
  * done where a Spark-native engine should do it: in Catalyst, so USER
  * QUERIES DON'T CHANGE. A query that groups by a subset of the view's
  * keys re-aggregates the summary (sums of sums, sum of counts) and
  * never touches the fact scan — at 100 TB that is the difference
  * between re-reading the table and reading a few thousand rows.
  *
  * Soundness gates (anything else falls through to the base scan):
  *  - grouping columns ⊆ the view's key columns;
  *  - WHERE clauses reference key columns only (filter-then-aggregate
  *    commutes with re-aggregation exactly when the predicate is
  *    constant within each summary row);
  *  - aggregates are plain `SUM(intCol)` over registered columns (views
  *    store them as BIGINT — `SUM` composes losslessly over integers,
  *    which is why [[Mv.build]] refuses non-integral inputs) or
  *    `COUNT(*)`/`COUNT(lit)` (answered as `COALESCE(SUM(cnt), 0)` — the
  *    coalesce preserves COUNT's zero-on-empty contract).
  *
  * The rewrite preserves every output name AND exprId, so the
  * downstream plan never knows. Staleness is the registrar's contract
  * (rebuild + re-register after base loads — the incremental-view
  * operators in `graft.operators.Incremental` are the refresh path);
  * kill switch: `spark.graft.mvRewrite.enabled=false`.
  */
object MvRewrite extends Rule[LogicalPlan] {

  /** One registered summary: match scans whose root path ends with
    * `baseSuffix`; `template` is the analyzed relation of the summary
    * parquet (re-instanced per rewrite so attribute ids never collide
    * across subtrees). */
  final case class MvDef(baseSuffix: String, keys: Seq[String],
                         sumCols: Seq[String], template: LogicalRelation)

  private val registry = new ConcurrentHashMap[String, MvDef]()

  def register(name: String, d: MvDef): Unit = registry.put(name, d)
  def deregister(name: String): Unit = registry.remove(name)
  def clear(): Unit = registry.clear()

  private def enabled: Boolean =
    conf.getConfString("spark.graft.mvRewrite.enabled", "true").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled || registry.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
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

  private def baseMatches(lr: LogicalRelation, d: MvDef): Boolean =
    lr.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.exists(_.toString.endsWith(d.baseSuffix))
      case _ => false
    }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] =
    for {
      (lr, filters) <- strip(agg.child, Nil)
      d <- registry.values.asScala.find(baseMatches(lr, _))
      out <- rewriteWith(agg, filters, d)
    } yield out

  private def rewriteWith(agg: Aggregate, filters: Seq[Expression],
                          d: MvDef): Option[LogicalPlan] = {
    val gAttrs = agg.groupingExpressions.map {
      case ar: AttributeReference if d.keys.contains(ar.name) => ar
      case _ => return None
    }
    if (!filters.forall(_.references.forall(r => d.keys.contains(r.name))))
      return None
    val fresh = d.template.newInstance()
    val mvAttr: Map[String, Attribute] = fresh.output.map(a => a.name -> a).toMap

    def isPlain(ae: AggregateExpression): Boolean =
      ae.mode == Complete && !ae.isDistinct && ae.filter.isEmpty

    val newAggList: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case ar: AttributeReference if d.keys.contains(ar.name) =>
        Alias(mvAttr(ar.name), ar.name)(exprId = ar.exprId)
      case al @ Alias(ar: AttributeReference, name)
          if d.keys.contains(ar.name) =>
        Alias(mvAttr(ar.name), name)(exprId = al.exprId)
      case al @ Alias(ae: AggregateExpression, name) if isPlain(ae) =>
        ae.aggregateFunction match {
          case s: Sum =>
            s.child match {
              case ar: AttributeReference if d.sumCols.contains(ar.name) =>
                Alias(Sum(mvAttr(s"sum_${ar.name}")).toAggregateExpression(),
                  name)(exprId = al.exprId)
              case _ => return None
            }
          case c: Count if c.children.forall(
              ch => ch.isInstanceOf[Literal] && ch.asInstanceOf[Literal].value != null) =>
            Alias(Coalesce(Seq(
              Sum(mvAttr("cnt")).toAggregateExpression(), Literal(0L))),
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

  /** Write the summary parquet for `base` grouped by `keys`: BIGINT
    * `sum_<col>` per requested column plus the group `cnt`. Integral
    * inputs only — integer SUM composes losslessly across the two
    * aggregation levels; a double sum would re-associate and drift. */
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
      sumCols.map(c => sum(col(c)).cast("long").as(s"sum_$c"))
    base.groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(mvPath)
  }

  /** Register `mvPath` as the summary of the base table whose scan root
    * ends with `baseSuffix`. Reads the summary once to capture its
    * relation; queries rewrite from the NEXT planning on. */
  def register(spark: SparkSession, name: String, baseSuffix: String,
               mvPath: String, keys: Seq[String],
               sumCols: Seq[String]): Unit = {
    val rel = spark.read.parquet(mvPath).queryExecution.analyzed
      .collectFirst { case lr: LogicalRelation => lr }
      .getOrElse(throw new IllegalStateException(
        s"$mvPath did not analyze to a file relation"))
    val missing = (keys ++ sumCols.map("sum_" + _) :+ "cnt")
      .filterNot(rel.output.map(_.name).toSet)
    require(missing.isEmpty, s"mv at $mvPath lacks columns: $missing")
    MvRewrite.register(name,
      MvRewrite.MvDef(baseSuffix, keys, sumCols, rel))
  }
}
