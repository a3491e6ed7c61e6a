package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark lacks natively
  * (engine-added; the brief's canonical example). For each left row, the
  * right row with the greatest timestamp ≤ the left timestamp within the
  * same key.
  *
  * Implementation is the merge-scan shape, not a range crossJoin: tag and
  * union both sides, then one window pass per key ordered by (ts, side)
  * carrying the last-seen right payload forward. Cost = one shuffle on
  * the key + one sort — the same envelope as a sort-merge join, and it
  * degrades linearly at 100 TB instead of quadratically like an
  * inequality join.
  */
object AsOfJoin {

  /** @param payload right-side columns carried to matched left rows
    *                (null when no right row precedes the left row) */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String,
           payload: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(p => right.schema(p)))
    val lTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(payloadType))
    val rTagged = right
      .select((keys.map(col) :+ col(rightTs).as("__ts")) :+
        struct(payload.map(col): _*).as("__p"): _*)
      .withColumn("__side", lit(0))
    val merged = lTagged.select(
        (keys.map(col) :+ col("__ts") :+ col("__side") :+ col("__p")) ++
          lCols.filterNot(keys.contains).map(col): _*)
      .unionByName(rTagged, allowMissingColumns = true)
    // right rows (__side=0) sort before left rows at equal ts → the
    // as-of match is inclusive (right.ts == left.ts matches). The payload
    // struct closes the ordering: several right rows sharing (key, ts)
    // would otherwise make `last` pick a partition-order-dependent winner —
    // with __p in the orderBy the greatest payload wins, deterministically.
    // (Left rows all carry a null __p, which sorts first within a tie group
    // and can't displace a right row.)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = merged.withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
    val out = carried.filter(col("__side") === 1)
      .select(lCols.map(col) ++
        payload.map(p => col(s"__match.$p").as(s"asof_$p")): _*)
    out
  }

  /** FORWARD as-of — the mirror: for each left row, the right row with
    * the SMALLEST timestamp ≥ the left timestamp within the key (the
    * label-lookahead join: "next purchase after this click"). Same
    * merge-scan shape with the window flipped to `first` over the
    * FOLLOWING frame; at equal timestamps left rows sort before right
    * rows, so a simultaneous right row matches (inclusive, like the
    * backward form), and ties among right rows resolve to the smallest
    * payload deterministically. */
  def asOfForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTs: String, rightTs: String,
                  payload: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(p => right.schema(p)))
    val lTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(0))
      .withColumn("__p", lit(null).cast(payloadType))
    val rTagged = right
      .select((keys.map(col) :+ col(rightTs).as("__ts")) :+
        struct(payload.map(col): _*).as("__p"): _*)
      .withColumn("__side", lit(1))
    val merged = lTagged.select(
        (keys.map(col) :+ col("__ts") :+ col("__side") :+ col("__p")) ++
          lCols.filterNot(keys.contains).map(col): _*)
      .unionByName(rTagged, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__p"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = merged.withColumn("__match",
      first(col("__p"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 0)
      .select(lCols.map(col) ++
        payload.map(p => col(s"__match.$p").as(s"asof_$p")): _*)
  }
}
