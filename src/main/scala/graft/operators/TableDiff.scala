package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.TxnTable

/** Keyed TABLE DIFF — set reconciliation between two relations sharing
  * a schema: one output row per key present in either side, classified
  * `added` / `removed` / `changed` / `unchanged`, with the exact value
  * columns that moved. The operation every large deployment runs
  * between pipeline generations (did the rewrite change anything?),
  * environments (staging vs prod), and snapshots (what did last night's
  * load actually do?) — the reference has no machine answer to any of
  * these: its pipeline reloads tables wholesale each run
  * (`pipeline.py`'s full-table to_sql loads), so "what changed" is
  * answerable only by eyeballing row counts.
  *
  * Semantics: `keys` identifies rows (the caller guarantees per-side
  * uniqueness — under duplicate keys a diff is ill-posed, and the join
  * would multiply); every non-key column participates in change
  * detection with NULL-safe equality (`<=>`), so NULL→value, value→NULL
  * and NULL→NULL classify correctly. `changed_cols` lists the moved
  * columns comma-joined in sorted-name order ("" for added/removed
  * rows, whose columns have no counterpart to compare).
  *
  * Scale shape: ONE shuffle — a full-outer hash join on the key
  * columns; comparison and classification are scan-side expressions
  * inside whole-stage codegen (no UDFs, no driver involvement, output
  * row count ≤ |left| + |right|). Skewed keys are AQE's skew-join
  * problem, co-location is bucketing's — both orthogonal and both
  * compose. At 100 TB the usual deployment diffs PARTITIONS of the two
  * sides in parallel (the key set is normally partition-stable), or two
  * versions of a [[TxnTable]] via [[diffVersions]], where time travel
  * makes both sides immutable file sets of ONE table.
  */
object TableDiff {

  /** Diff `right` against `left` (left = the before side: a row only in
    * `right` is `added`, only in `left` is `removed`). Output columns:
    * the keys, `change`, `changed_cols` — pass `includeUnchanged` to
    * keep the (normally dominant, normally dropped) unchanged class. */
  def diff(left: DataFrame, right: DataFrame, keys: Seq[String],
           includeUnchanged: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "diff needs at least one key column")
    require(left.columns.toSet == right.columns.toSet,
      s"schemas differ: ${left.columns.toSeq.sorted} vs ${right.columns.toSeq.sorted}")
    require(keys.forall(left.columns.contains),
      s"keys $keys missing from ${left.columns.toSeq.sorted}")
    val valueCols = left.columns.filterNot(keys.contains).toSeq.sorted
    val l = left.select((keys ++ valueCols).map(col): _*)
      .withColumn("__l", lit(true))
    val r = right.select(
        keys.map(col) ++ valueCols.map(c => col(c).as(s"${c}__r")): _*)
      .withColumn("__r", lit(true))
    val j = l.join(r, keys, "full_outer")
    val bothSides = col("__l").isNotNull && col("__r").isNotNull
    // sorted-name order is built statically, so no array_sort at runtime
    val moved: Seq[Column] = valueCols.map(c =>
      when(!(col(c) <=> col(s"${c}__r")), lit(c)))
    val changedCols = when(bothSides,
      concat_ws(",", filter(array(moved: _*), x => x.isNotNull)))
      .otherwise(lit(""))
    val change = when(col("__l").isNull, lit("added"))
      .when(col("__r").isNull, lit("removed"))
      .when(changedCols =!= "", lit("changed"))
      .otherwise(lit("unchanged"))
    val out = j.select(keys.map(col) :+ change.as("change") :+
      changedCols.as("changed_cols"): _*)
    if (includeUnchanged) out else out.filter(col("change") =!= "unchanged")
  }

  /** The diff rolled up to an audit report: one row per change class
    * (`added` / `removed` / `changed` / `unchanged`) plus one
    * `col:<name>` row per value column that moved anywhere, each with
    * its row count. Two aggregations over the one-shuffle diff. */
  def diffSummary(left: DataFrame, right: DataFrame,
                  keys: Seq[String]): DataFrame = {
    val d = diff(left, right, keys, includeUnchanged = true)
    val byChange = d.groupBy(col("change").as("metric"))
      .agg(count(lit(1)).as("n"))
    val byCol = d.filter(col("change") === "changed")
      .select(explode(split(col("changed_cols"), ",")).as("c"))
      .groupBy(concat(lit("col:"), col("c")).as("metric"))
      .agg(count(lit(1)).as("n"))
    byChange.unionByName(byCol)
  }

  /** Diff two committed versions of one [[TxnTable]] — reconciliation
    * over time travel: both sides are immutable file sets, so the
    * answer is stable no matter when it runs. The row-level complement
    * of [[TxnTable.changeFeed]]: the feed replays WHAT each commit did
    * (file-granular, O(Δ)); this compares two chosen points regardless
    * of how many commits separate them, keyed and column-attributed. */
  def diffVersions(spark: SparkSession, table: String, fromVersion: Int,
                   toVersion: Int, keys: Seq[String],
                   includeUnchanged: Boolean = false): DataFrame =
    diff(TxnTable.read(spark, table, asOf = Some(fromVersion)),
      TxnTable.read(spark, table, asOf = Some(toVersion)),
      keys, includeUnchanged)
}
