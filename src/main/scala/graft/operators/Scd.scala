package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension maintenance (engine-added): the warehouse
  * lifecycle the reference sidesteps by drop-and-reloading its dimension
  * tables every run (pipeline.py's load split). SCD Type 2 keeps the
  * history instead: a changed attribute CLOSES the current version row
  * (`valid_to` = effective time, `is_current` = false) and OPENS a new
  * one, so every fact can join the dimension AS OF its own event time.
  *
  * Scale shape: the dimension NEVER shuffles. A full-outer join would be
  * the obvious formulation, but Spark cannot broadcast a full-outer
  * build side (it plans SortMergeJoin — a full shuffle+sort of the
  * dimension), so the apply splits into two broadcast-able legs:
  * a LEFT join of the current slice against the broadcast batch emits
  * 0–2 versions per dimension row via one inline'd array, and inserts
  * come from a broadcast LEFT ANTI of the batch against its own matched
  * keys (bounded by the batch, never by the dimension). Closed history
  * rows pass through untouched; at 100 TB the cost is two dimension
  * scans with map-side joins — no dimension-sized shuffle anywhere.
  */
object Scd {

  /** Apply a change batch to an SCD2 dimension.
    *
    * `dim` carries `key`, `attrs...`, `valid_from`, `valid_to`
    * (null = open), `is_current`; `changes` carries `key`, `attrs...` —
    * the new attribute values effective at `effectiveTs`.
    *
    *  - attribute change (any attr differs, null-safe) → current row
    *    closes at `effectiveTs`, a new current row opens;
    *  - identical attrs or key absent from the batch → row unchanged;
    *  - key new to the dimension → inserted as current;
    *  - non-current history rows pass through untouched.
    */
  def scd2Apply(dim: DataFrame, changes: DataFrame, key: String,
                attrs: Seq[String], effectiveTs: Column): DataFrame = {
    require(attrs.nonEmpty, "need at least one tracked attribute")
    val meta = Seq("valid_from", "valid_to", "is_current")
    val outCols = (key +: attrs) ++ meta
    val history = dim.filter(!col("is_current")).select(outCols.map(col): _*)
    val current = dim.filter(col("is_current"))

    val chg = changes.select(
      col(key).as("__ck") +: attrs.map(a => col(a).as(s"__c_$a")): _*)
    // the change batch is the daily delta — broadcast it, keep the
    // dimension shuffle-free (LEFT join: broadcast full-outer is not a
    // plannable shape, see the scale note above)
    val j = current.join(broadcast(chg), col(key) === col("__ck"), "left")

    val differs = attrs
      .map(a => !(col(a) <=> col(s"__c_$a")))
      .reduce(_ || _)
    def version(keyCol: Column, attrCols: Seq[Column], from: Column,
                to: Column, cur: Column): Column =
      struct(
        (keyCol.as(key) +:
          attrCols.zip(attrs).map { case (c, a) => c.as(a) }) ++
          Seq(from.as("valid_from"), to.as("valid_to"),
            cur.as("is_current")): _*)

    val oldAttrs = attrs.map(col)
    val newAttrs = attrs.map(a => col(s"__c_$a"))
    // the open-row sentinel takes the DIMENSION's own valid_to type —
    // effective "time" may be a timestamp or an integer version/epoch
    // (the change-feed composition drives SCD2 by commit version)
    val nullTs = lit(null).cast(dim.schema("valid_to").dataType)
    val versions = when(col("__ck").isNull, // no change for this key
        array(version(col(key), oldAttrs, col("valid_from"), col("valid_to"), col("is_current"))))
      .when(differs, // real change: close + open
        array(
          version(col(key), oldAttrs, col("valid_from"), effectiveTs, lit(false)),
          version(col(key), newAttrs, effectiveTs, nullTs, lit(true))))
      .otherwise( // batch row carried identical attrs
        array(version(col(key), oldAttrs, col("valid_from"), col("valid_to"), col("is_current"))))
    val fromCurrent = j.select(inline(versions))

    // brand-new keys: batch minus the keys the dimension matched — the
    // anti side is ≤ |batch| rows (derived from the broadcast join, never
    // the dimension itself), so it broadcasts too
    val matchedKeys = j.filter(col("__ck").isNotNull)
      .select(col("__ck")).distinct()
    val inserted = chg
      .join(broadcast(matchedKeys), Seq("__ck"), "left_anti")
      .select(inline(array(
        version(col("__ck"), newAttrs, effectiveTs, nullTs, lit(true)))))

    history.unionByName(fromCurrent).unionByName(inserted)
  }
}
