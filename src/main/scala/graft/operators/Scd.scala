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
  * Scale shape: one equi-join of the dimension's CURRENT slice against
  * the (typically tiny) change batch — broadcast the batch, never the
  * dimension — then a single pass emits 0–2 output versions per joined
  * row via an inline'd array (no second scan per branch, no window).
  * Closed history rows pass through untouched; at 100 TB the cost is
  * O(|current| + |batch|), independent of history depth.
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
    // dimension shuffle-free
    val j = current.join(broadcast(chg), col(key) === col("__ck"), "full_outer")

    val differs = attrs
      .map(a => !(col(a) <=> col(s"__c_$a")))
      .reduce(_ || _)
    def version(attrCols: Seq[Column], from: Column, to: Column,
                cur: Column): Column =
      struct(
        (coalesce(col(key), col("__ck")).as(key) +:
          attrCols.zip(attrs).map { case (c, a) => c.as(a) }) ++
          Seq(from.as("valid_from"), to.as("valid_to"),
            cur.as("is_current")): _*)

    val oldAttrs = attrs.map(col)
    val newAttrs = attrs.map(a => col(s"__c_$a"))
    val nullTs = lit(null).cast("timestamp")
    val versions = when(col("__ck").isNull, // no change for this key
        array(version(oldAttrs, col("valid_from"), col("valid_to"), col("is_current"))))
      .when(col(key).isNull, // brand-new key
        array(version(newAttrs, effectiveTs, nullTs, lit(true))))
      .when(differs, // real change: close + open
        array(
          version(oldAttrs, col("valid_from"), effectiveTs, lit(false)),
          version(newAttrs, effectiveTs, nullTs, lit(true))))
      .otherwise( // batch row carried identical attrs
        array(version(oldAttrs, col("valid_from"), col("valid_to"), col("is_current"))))

    history.unionByName(
      j.select(inline(versions)))
  }
}
