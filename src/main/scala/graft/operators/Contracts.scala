package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data contracts — the expectation checks an ingest runs
  * before anything downstream trusts a batch (not-null, domain, range,
  * pattern, uniqueness), reported as violation COUNTS per rule rather
  * than a thrown error: the caller (e.g. a [[graft.jobs.PipelineMain]]
  * quality gate) decides what tolerance means.
  *
  * Scale shape: every scalar rule compiles into one `sum(when(...))`
  * over a SINGLE shared scan — adding rules adds expressions, not
  * passes; the one-row aggregate then unpivots to rule rows via `stack`
  * (plan-side, nothing collects). Uniqueness is the exception and is
  * priced honestly: each `Unique` rule is its own `count − countDistinct`
  * aggregate (a shuffle of distinct values), unioned in.
  *
  * A NULL fails every scalar rule it appears under (range/set/pattern
  * checks on a null are vacuously violations, not passes) — add an
  * explicit `NotNull` rule to see the null count separately. */
object Contracts {

  sealed trait Rule { def name: String }
  final case class NotNull(column: String) extends Rule {
    def name = s"not_null($column)"
  }
  final case class InRange(column: String, lo: Long, hi: Long) extends Rule {
    def name = s"in_range($column)"
  }
  final case class InSet(column: String, values: Seq[String]) extends Rule {
    def name = s"in_set($column)"
  }
  final case class Matches(column: String, pattern: String) extends Rule {
    def name = s"matches($column)"
  }
  final case class Unique(column: String) extends Rule {
    def name = s"unique($column)"
  }

  /** Per-row violation flag (0/1) for a scan-evaluable rule — shared with
    * TxnTable.commitChecked, which folds these into write-job Observation
    * metrics (CHECK constraints without a second scan). */
  private[graft] def violation(r: Rule): Column = r match {
    case NotNull(c) => when(col(c).isNull, 1L).otherwise(0L)
    case InRange(c, lo, hi) =>
      when(col(c).isNull || col(c) < lo || col(c) > hi, 1L).otherwise(0L)
    case InSet(c, vs) =>
      when(col(c).isNull || !col(c).isInCollection(vs), 1L).otherwise(0L)
    case Matches(c, p) =>
      when(col(c).isNull || !col(c).rlike(p), 1L).otherwise(0L)
    case _: Unique => lit(0L)
  }

  /** Validate `df` against `rules`. Output: one row per rule —
    * (rule, n_rows, n_violations, pass) with `pass` = 1 iff zero
    * violations (tolerances are the caller's policy). */
  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val scalarRules = rules.filter(!_.isInstanceOf[Unique])
    val uniqueRules = rules.collect { case u: Unique => u }
    val parts = Seq.newBuilder[DataFrame]
    if (scalarRules.nonEmpty) {
      val aggCols = count(lit(1)).as("__n") +:
        scalarRules.zipWithIndex.map { case (r, i) => sum(violation(r)).as(s"__v$i") }
      val one = df.agg(aggCols.head, aggCols.tail: _*)
      val stackArgs = scalarRules.zipWithIndex
        .map { case (r, i) => s"'${r.name}', __v$i" }.mkString(", ")
      parts += one.select(
        expr(s"stack(${scalarRules.size}, $stackArgs) AS (rule, n_violations)"),
        col("__n").as("n_rows"))
    }
    uniqueRules.foreach { u =>
      parts += df.agg(
          (count(col(u.column)) - countDistinct(col(u.column))).as("n_violations"),
          count(lit(1)).as("n_rows"))
        .select(lit(u.name).as("rule"), col("n_violations"), col("n_rows"))
    }
    parts.result().reduce(_ unionByName _)
      .select(col("rule"), col("n_rows"), col("n_violations"),
        (col("n_violations") === 0).cast("long").as("pass"))
  }

  /** Referential-integrity expectation — the two-table rule [[validate]]
    * can't express: fact rows whose `keyCol` has no match in
    * `dim.refCol` are orphans (a null key is an orphan too — it
    * references nothing). One LEFT ANTI join, dimension broadcast by
    * default (pass `broadcastDim = false` when the dim outgrows it);
    * output matches [[validate]]'s row shape so checks union into one
    * report. */
  def foreignKey(fact: DataFrame, keyCol: String, dim: DataFrame,
                 refCol: String, broadcastDim: Boolean = true): DataFrame = {
    val dimKeys = dim.select(col(refCol).as(keyCol)).distinct()
    val dimSide = if (broadcastDim) broadcast(dimKeys) else dimKeys
    val orphans = fact.select(col(keyCol))
      .join(dimSide, Seq(keyCol), "left_anti")
    val nRows = fact.agg(count(lit(1)).as("__n"))
    orphans.agg(count(lit(1)).as("n_violations"))
      .crossJoin(nRows)
      .select(lit(s"foreign_key($keyCol -> $refCol)").as("rule"),
        col("__n").as("n_rows"), col("n_violations"),
        (col("n_violations") === 0).cast("long").as("pass"))
  }
}
