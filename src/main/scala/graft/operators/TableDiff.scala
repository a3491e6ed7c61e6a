package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed snapshot diff (engine-added, builder brief): what changed between
  * two versions of a table — the reconciliation/audit pass behind CDC
  * validation, warehouse-load verification (the reference reloads whole
  * tables and trusts the load; a diff is how you'd check one), and
  * incremental-pipeline debugging ("which docs changed since the last
  * curation run?").
  *
  * Scale shape: each side is reduced to (key, fingerprint) BEFORE the
  * join — the full-outer join shuffles two narrow columns, never payloads,
  * so a 100-column 100 TB table diffs at the cost of its key column plus
  * one hash. The fingerprint is xxhash64 over the non-key columns in
  * sorted-name order (layout-independent); fingerprint equality stands in
  * for row equality with the usual ~1e-19 per-pair collision odds.
  */
object TableDiff {

  /** Diff `after` against `before` on `keys`: one row per key whose row
    * set changed, classified `added` / `removed` / `changed`. Keys are
    * assumed unique per side (snapshot semantics — dedupe first if not). */
  def diff(before: DataFrame, after: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    require(before.columns.sorted.sameElements(after.columns.sorted),
      s"schema mismatch: ${before.columns.mkString(",")} vs ${after.columns.mkString(",")}")
    val payload = before.columns.filterNot(keys.contains).sorted
    // xxhash64 SKIPS null arguments (the running hash passes through), so
    // (null, "x") and ("x", null) would collide. No in-band sentinel is
    // safe — a string column can legally hold ANY value, including NUL —
    // so null-ness travels as its own hash argument: (isnull-flag, value)
    // per column, both never-null, keeps every position firm
    def fingered(df: DataFrame, fp: String) = df.select(
      keys.map(col) :+
        xxhash64(payload.flatMap(c => Seq(
          isnull(col(c)).cast("string"),
          coalesce(col(c).cast("string"), lit("")))): _*).as(fp): _*)
    val b = fingered(before, "__fp_b")
    val a = fingered(after, "__fp_a")
    b.join(a, keys, "full_outer")
      .withColumn("change",
        when(col("__fp_b").isNull, lit("added"))
          .when(col("__fp_a").isNull, lit("removed"))
          .when(col("__fp_a") =!= col("__fp_b"), lit("changed")))
      .filter(col("change").isNotNull)
      .select(keys.map(col) :+ col("change"): _*)
  }
}
