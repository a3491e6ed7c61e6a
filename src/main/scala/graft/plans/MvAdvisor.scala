package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{IntegerType, LongType}

/** WORKLOAD-DRIVEN summary advisor: given the queries a deployment
  * actually runs, recommend the materialized views worth building —
  * the classic warehouse sizing exercise, done from the query PLANS so
  * the recommendations are exactly the shapes [[MvRewrite]] accepts
  * (keys ⊇ every grouping and filter column, measures integral, one
  * view per base serving its whole key-subset lattice).
  *
  * Per query, [[candidate]] extracts (base scan, key set, measure set):
  *  - keys = the grouping columns (bare attributes only) ∪ every
  *    column a deterministic WHERE references (the rewrite requires
  *    filter columns among the view keys);
  *  - measures = children of SUM/MIN/MAX/AVG and of COUNT over
  *    integral columns ([[Mv.build]] refuses non-integral measures —
  *    integer sums compose losslessly, doubles would re-associate);
  *    COUNT(*) needs no measure (`cnt` is always built); DISTINCT
  *    aggregates and COUNT over non-integral columns route their
  *    column into the KEYS instead (the rewrite answers those from the
  *    grain, not from sums);
  *  - a query declines (None) when any shape falls outside what the
  *    rewrite could ever serve: grouping by an expression, a
  *    non-deterministic filter, MIN/MAX/AVG over a non-integral
  *    column, an exotic aggregate, or an aggregate over a join (the
  *    star advisor is the natural extension).
  *
  * [[recommend]] then merges candidates per base — the KEY-SUBSET
  * rewrite makes the union view serve every contributing query — and
  * prices each recommendation with its exact summary cardinality
  * (`SELECT COUNT(*) FROM (SELECT DISTINCT keys…)`, computed on the
  * engine): a summary near base size caches nothing, so `recommend`
  * is flagged only when est_rows ≤ maxRowsFraction · base_rows. At
  * 100 TB this ratio IS the decision — a 10⁴× reduction turns every
  * matching dashboard query into a few thousand summary rows.
  */
object MvAdvisor {

  final case class Candidate(base: String, keys: Seq[String],
                             measures: Seq[String], basePath: String)

  private def strip(p: LogicalPlan, fs: Seq[Expression])
      : Option[(LogicalRelation, Seq[Expression])] = p match {
    case lr: LogicalRelation => Some((lr, fs))
    case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      strip(c, fs)
    case Filter(cond, c) => strip(c, fs :+ cond)
    case _ => None
  }

  /** (last path segment, full root path) of a single-root PARQUET scan
    * — the advisor re-reads the base to price the summary, so only
    * re-readable scans qualify. */
  private def baseOf(lr: LogicalRelation): Option[(String, String)] =
    lr.relation match {
      case fs: HadoopFsRelation
          if fs.location.rootPaths.size == 1 &&
            fs.fileFormat.isInstanceOf[
              org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat] =>
        fs.location.rootPaths.headOption.map(p => (p.getName, p.toString))
      case _ => None
    }

  /** The summary shape of one query, or None when no single-base view
    * could serve it (see the object doc for the decline list). */
  def candidate(df: DataFrame): Option[Candidate] = {
    val integral = Set[org.apache.spark.sql.types.DataType](IntegerType, LongType)
    df.queryExecution.analyzed.collectFirst { case a: Aggregate => a }
      .flatMap { a =>
        strip(a.child, Nil).flatMap { case (lr, filters) =>
          baseOf(lr).flatMap { case (base, basePath) =>
            val groupKeys = a.groupingExpressions.map {
              case ar: AttributeReference => Some(ar.name)
              case _ => None
            }
            if (groupKeys.exists(_.isEmpty) ||
                !filters.forall(_.deterministic)) None
            else {
            val filterKeys = filters.flatMap(_.references.map(_.name))
            // (isKey additions, measure additions) per aggregate call
            val classified: Seq[Option[(Seq[String], Seq[String])]] =
              a.aggregateExpressions
                .flatMap(_.collect { case ae: AggregateExpression => ae })
                .map { ae =>
                  def attr(e: Expression): Option[AttributeReference] =
                    e match { case ar: AttributeReference => Some(ar); case _ => None }
                  ae.aggregateFunction match {
                    case _ if ae.isDistinct =>
                      // DISTINCT answers from the view GRAIN → keys
                      val as = ae.aggregateFunction.children.map(attr)
                      if (as.forall(_.isDefined))
                        Some((as.flatten.map(_.name), Nil))
                      else None
                    case c: Count if c.children.forall(ch =>
                        ch.isInstanceOf[Literal] &&
                          ch.asInstanceOf[Literal].value != null) =>
                      Some((Nil, Nil)) // COUNT(*): cnt is always built
                    case c: Count => c.children match {
                      case Seq(e) => attr(e).map(ar =>
                        if (integral(ar.dataType)) (Nil, Seq(ar.name))
                        else (Seq(ar.name), Nil))
                      case _ => None
                    }
                    case s: Sum => attr(s.child)
                      .filter(ar => integral(ar.dataType))
                      .map(ar => (Nil, Seq(ar.name)))
                    case m: Min => attr(m.child)
                      .filter(ar => integral(ar.dataType))
                      .map(ar => (Nil, Seq(ar.name)))
                    case m: Max => attr(m.child)
                      .filter(ar => integral(ar.dataType))
                      .map(ar => (Nil, Seq(ar.name)))
                    case av: Average => attr(av.child)
                      .filter(ar => integral(ar.dataType))
                      .map(ar => (Nil, Seq(ar.name)))
                    case _ => None
                  }
                }
            if (classified.exists(_.isEmpty)) None
            else {
              val (extraKeys, measures) = classified.flatten.unzip
              Some(Candidate(base,
                (groupKeys.flatten ++ filterKeys ++ extraKeys.flatten)
                  .distinct.sorted,
                measures.flatten.distinct.sorted, basePath))
            }
            }
          }
        }
      }
  }

  /** Merge the workload's candidates into ONE recommendation per base
    * (keys/measures union — the key-subset rewrite makes the merged
    * view serve every contributor) and price it exactly. Output one
    * row per base, ordered: (base, view_keys, view_measures,
    * n_queries, est_rows, base_rows, recommend). Queries no view could
    * serve are simply not counted — the advisor proposes, the
    * [[MvRewrite]] gates dispose. */
  def recommend(spark: SparkSession, queries: Seq[DataFrame],
                maxRowsFraction: Double = 0.5): DataFrame = {
    val cands = queries.flatMap(candidate)
    val rows = cands.groupBy(_.base).toSeq.sortBy(_._1).map {
      case (base, cs) =>
        val keys = cs.flatMap(_.keys).distinct.sorted
        val measures = cs.flatMap(_.measures).distinct.sorted
        val rel = spark.read.parquet(cs.head.basePath)
        val estRows = rel.select(keys.map(col): _*).distinct().count()
        val baseRows = rel.count()
        (base, keys.mkString(","), measures.mkString(","),
          cs.size.toLong, estRows, baseRows,
          estRows <= maxRowsFraction * baseRows)
    }
    import spark.implicits._
    rows.toDF("base", "view_keys", "view_measures", "n_queries",
      "est_rows", "base_rows", "recommend")
  }
}
