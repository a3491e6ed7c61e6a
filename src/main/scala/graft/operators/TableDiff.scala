package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.TxnTable

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
  *
  * Three escalating forms, all keyed on caller-guaranteed-unique keys
  * (under duplicates a diff is multiset-ambiguous — dedupe first):
  *  - [[diff]]: WHICH keys changed (added/removed/changed) — the narrow
  *    hash join above; the first-pass tool at any scale.
  *  - [[diffDetailed]]: which COLUMNS moved per changed key — payloads
  *    travel only for the (normally tiny) changed-key set, which the
  *    narrow pass identifies first.
  *  - [[diffVersionsIncremental]]: the same answer priced O(Δ) from a
  *    [[TxnTable]] change feed — an untouched key never enters the plan.
  */
object TableDiff {

  /** Diff `after` against `before` on `keys`: one row per key whose row
    * set changed, classified `added` / `removed` / `changed`. Keys are
    * assumed unique per side (snapshot semantics — dedupe first if not). */
  def diff(before: DataFrame, after: DataFrame, keys: Seq[String]): DataFrame =
    classified(before, after, keys)
      .filter(col("change").isNotNull)
      .select(keys.map(col) :+ col("change"): _*)

  /** The narrow (key, fingerprint) full-outer join; `change` is NULL for
    * unchanged keys so each caller picks its own keep/drop/label. */
  private def classified(before: DataFrame, after: DataFrame,
                         keys: Seq[String]): DataFrame = {
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
    fingered(before, "__fp_b").join(fingered(after, "__fp_a"), keys, "full_outer")
      .withColumn("change",
        when(col("__fp_b").isNull, lit("added"))
          .when(col("__fp_a").isNull, lit("removed"))
          .when(col("__fp_a") =!= col("__fp_b"), lit("changed")))
  }

  /** [[diff]] with per-column CHANGE ATTRIBUTION: adds `changed_cols` —
    * the moved value columns, comma-joined in sorted-name order ("" for
    * added/removed rows, whose columns have no counterpart) — and, with
    * `includeUnchanged`, the (normally dominant, normally dropped)
    * unchanged class. Comparison is NULL-safe (`<=>`) per column.
    *
    * Scale shape: the narrow hash pass runs first; full payloads are
    * then semi-joined down to the CHANGED keys only before the
    * column-level compare — attribution costs what changed, not what
    * the table weighs. */
  def diffDetailed(before: DataFrame, after: DataFrame, keys: Seq[String],
                   includeUnchanged: Boolean = false): DataFrame = {
    val base = classified(before, after, keys)
    val payload = before.columns.filterNot(keys.contains).toSeq.sorted
    val changedKeys = base.filter(col("change") === "changed")
      .select(keys.map(col): _*)
    val l = before.join(changedKeys, keys, "left_semi")
    val r = after.join(changedKeys, keys, "left_semi")
      .select(keys.map(col) ++ payload.map(c => col(c).as(s"${c}__r")): _*)
    val moved: Seq[Column] = payload.map(c =>
      when(!(col(c) <=> col(s"${c}__r")), lit(c)))
    val det = l.join(r, keys, "inner")
      .select(keys.map(col) :+ lit("changed").as("change") :+
        concat_ws(",", filter(array(moved: _*), x => x.isNotNull))
          .as("changed_cols"): _*)
    val rest = base
      .withColumn("change", coalesce(col("change"), lit("unchanged")))
      .filter(col("change") =!= "changed")
      .select(keys.map(col) :+ col("change") :+
        lit("").as("changed_cols"): _*)
    val out = rest.unionByName(det)
    if (includeUnchanged) out else out.filter(col("change") =!= "unchanged")
  }

  /** The diff rolled up to an audit report: one row per change class
    * (`added` / `removed` / `changed` / `unchanged`) plus one
    * `col:<name>` row per value column that moved anywhere, each with
    * its row count. */
  def diffSummary(before: DataFrame, after: DataFrame,
                  keys: Seq[String]): DataFrame = {
    val d = diffDetailed(before, after, keys, includeUnchanged = true)
    val byChange = d.groupBy(col("change").as("metric"))
      .agg(count(lit(1)).as("n"))
    val byCol = d.filter(col("change") === "changed")
      .select(explode(split(col("changed_cols"), ",")).as("c"))
      .groupBy(concat(lit("col:"), col("c")).as("metric"))
      .agg(count(lit(1)).as("n"))
    byChange.unionByName(byCol)
  }

  /** Order-independent per-row fingerprint over EVERY column (sorted
    * name order, the diff's null-firm (isnull, value) encoding) — what
    * [[suspectPartitions]] sums per partition: any row change, add, or
    * remove moves the partition digest. */
  private def rowHash(columns: Seq[String]): Column =
    xxhash64(columns.sorted.flatMap(c => Seq(
      isnull(col(c)).cast("string"),
      coalesce(col(c).cast("string"), lit("")))): _*)

  /** The partitions whose content DIFFERS between the sides: compare
    * one (xor-of-row-hashes, count) digest row per partition — two
    * narrow aggregates and a partitions-sized join, no row-level work.
    * XOR is commutative, so the digest is layout- and order-independent
    * (and never overflows under ANSI arithmetic — the same set-hash
    * idiom as the txn log's version index). Blind spot: any change set
    * whose per-row hash deltas XOR to zero cancels — ~2⁻⁶⁴ per
    * partition for random edits, the same probabilistic class as the
    * xxhash64 fingerprint-collision caveat on [[diff]] (and, like it,
    * adversarially constructible). The count guards the
    * empty-vs-empty degenerate. */
  private[operators] def suspectPartitions(before: DataFrame,
                                           after: DataFrame,
                                           partCol: String): DataFrame = {
    def digest(df: DataFrame, tag: String) = df
      .select(col(partCol), rowHash(df.columns.toSeq).as("__rh"))
      .groupBy(partCol)
      .agg(expr("bit_xor(__rh)").as(s"__d$tag"), count(lit(1)).as(s"__n$tag"))
    digest(before, "b").join(digest(after, "a"), Seq(partCol), "full_outer")
      .filter(col("__db").isNull || col("__da").isNull ||
        col("__db") =!= col("__da") || col("__nb") =!= col("__na"))
      .select(partCol)
  }

  /** [[diffDetailed]] with MERKLE-STYLE partition pruning: compare one
    * digest per `partCol` value first, then run the row-level diff on
    * the suspect partitions ONLY — the daily-churn reconciliation
    * shape, where a 100 TB date-partitioned table differs in a handful
    * of recent partitions and the other thousands never leave their
    * digest aggregate. A row that MOVES between partitions flags both
    * its partitions, so it still classifies correctly (partCol is an
    * ordinary compared column). Same fingerprint-equality caveat as
    * [[diff]], plus the ~2⁻⁶⁴-per-partition XOR-cancellation odds of
    * [[suspectPartitions]] (a changed partition pruned as clean). */
  def diffPartitioned(before: DataFrame, after: DataFrame,
                      keys: Seq[String], partCol: String): DataFrame = {
    require(before.columns.contains(partCol),
      s"partition column $partCol missing from ${before.columns.toSeq.sorted}")
    val suspects = suspectPartitions(before, after, partCol)
      .withColumnRenamed(partCol, "__suspect_p")
    // NULL-SAFE semi join: the NULL partition is a legal partition
    // value (and a classic dumping ground for exactly the rows that
    // change) — a plain equi-semi-join would silently prune it
    def keep(df: DataFrame) = df.join(broadcast(suspects),
      col(partCol) <=> col("__suspect_p"), "left_semi")
    // changes only (no includeUnchanged): rows in pruned partitions
    // never reach the row level, so an unchanged class here would lie
    diffDetailed(keep(before), keep(after), keys)
  }

  /** SCHEMA diff — the metadata half of reconciliation ([[diff]] covers
    * the rows): one row per column whose presence or type moved between
    * the two relations, (col_name, change ∈ added|removed|type_changed,
    * before_type, after_type). Driver-side over the StructTypes —
    * nothing runs. Nullability is layout, not schema, here: it changes
    * with join shapes and file merges without moving a single value, so
    * it never flags. */
  def schemaDiff(spark: SparkSession, before: DataFrame,
                 after: DataFrame): DataFrame = {
    import spark.implicits._
    val b = before.schema.map(f => f.name -> f.dataType.sql).toMap
    val a = after.schema.map(f => f.name -> f.dataType.sql).toMap
    val rows =
      (b.keySet -- a.keySet).toSeq.sorted.map(c =>
        (c, "removed", b(c), "")) ++
      (a.keySet -- b.keySet).toSeq.sorted.map(c =>
        (c, "added", "", a(c))) ++
      (b.keySet & a.keySet).toSeq.sorted.collect {
        case c if b(c) != a(c) => (c, "type_changed", b(c), a(c))
      }
    rows.sortBy(r => (r._1, r._2))
      .toDF("col_name", "change", "before_type", "after_type")
  }

  /** [[diffDetailed]] across two committed versions of one [[TxnTable]]
    * — reconciliation over time travel: both sides are immutable file
    * sets, so the answer is stable no matter when it runs. */
  def diffVersions(spark: SparkSession, table: String, fromVersion: Int,
                   toVersion: Int, keys: Seq[String],
                   includeUnchanged: Boolean = false): DataFrame =
    diffDetailed(TxnTable.read(spark, table, asOf = Some(fromVersion)),
      TxnTable.read(spark, table, asOf = Some(toVersion)),
      keys, includeUnchanged)

  /** [[diffVersions]] priced by WHAT CHANGED, not table size: fold the
    * row-level change feed over (fromVersion, toVersion] into one
    * first/last event per touched key — an untouched key never enters
    * the plan, so the reconciliation is O(Δ) where the snapshot join is
    * O(table) (appends, merges, CoW/MOR deletes; an overwrite commit's
    * feed is itself O(table), the documented [[TxnTable.changeFeed]]
    * trade). Emits exactly the rows [[diffVersions]] would: a key
    * touched but RESTORED (updated away and back) folds to unchanged
    * and is dropped; a key inserted then deleted inside the range never
    * appears. One shuffle over feed rows; first/last selection is
    * min_by/max_by on (version, pre/post rank), which is unique per key
    * per version, so there is no tie ambiguity. */
  def diffVersionsIncremental(spark: SparkSession, table: String,
                              fromVersion: Int, toVersion: Int,
                              keys: Seq[String]): DataFrame = {
    val feed = TxnTable.changeFeed(spark, table, fromVersion, toVersion,
      keys, updateImages = true)
    val valueCols = feed.columns
      .filterNot((keys ++ Seq("version", "change")).contains).toSeq.sorted
    // pre-side events (the key existed BEFORE the version) rank under
    // post-side ones, so min picks the v1 image and max the v2 image
    val rank = when(col("change").isin("delete", "update_preimage"), 0)
      .otherwise(1)
    val ev = feed.select(keys.map(col) ++ Seq(
      (col("version") * 2 + rank).as("__o"),
      struct(col("change") +: valueCols.map(col): _*).as("__img")): _*)
    val folded = ev.groupBy(keys.map(col): _*).agg(
      min_by(col("__img"), col("__o")).as("__first"),
      max_by(col("__img"), col("__o")).as("__last"))
    val presentV1 = col("__first.change").isin("delete", "update_preimage")
    val presentV2 = col("__last.change").isin("insert", "update_postimage")
    val moved: Seq[Column] = valueCols.map(c =>
      when(!(col(s"__first.$c") <=> col(s"__last.$c")), lit(c)))
    val changedCols = when(presentV1 && presentV2,
      concat_ws(",", filter(array(moved: _*), x => x.isNotNull)))
      .otherwise(lit(""))
    val change = when(!presentV1 && presentV2, lit("added"))
      .when(presentV1 && !presentV2, lit("removed"))
      .when(changedCols =!= "", lit("changed"))
      .otherwise(lit("unchanged")) // touched but restored — not a change
    folded.select(keys.map(col) :+ change.as("change") :+
        changedCols.as("changed_cols"): _*)
      .filter(col("change").isin("added", "removed", "changed"))
  }
}
