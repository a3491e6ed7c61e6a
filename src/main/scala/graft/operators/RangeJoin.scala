package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join — with [[AsOfJoin]], the second
  * interval-temporal operator Spark lacks natively (the brief's canonical
  * custom-operator examples).
  *
  * The naive form is an inequality join (`p BETWEEN lo AND hi`), which
  * Catalyst can only execute as a nested-loop cross product — quadratic,
  * dead at scale. This operator bucketizes instead: each interval is
  * exploded onto the fixed-width grid cells it covers (ceil(span/width)+1
  * rows), each point maps to exactly ONE cell, and the join becomes an
  * equi-join on the cell id — shuffle-partitionable, broadcast-able,
  * AQE-splittable like any other equi-join — followed by the exact
  * containment filter. A true pair is emitted exactly once (in the
  * point's cell), so no post-dedup is needed.
  *
  * `width` trades interval replication against cell selectivity: set it
  * near the typical interval span so most intervals land in 1-2 cells.
  * Both bound columns must be non-negative numerics on the same scale as
  * the point column (epoch days, epoch seconds, …).
  */
object RangeJoin {

  /** All (point, interval) pairs with `points(pointCol)` inside
    * `[intervals(loCol), intervals(hiCol)]` (inclusive). Output carries
    * every column of both inputs; the caller disambiguates name clashes
    * before the call. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      width: Long): DataFrame = {
    require(width > 0, "bucket width must be positive")
    val pts = points.withColumn("__cell",
      floor(col(pointCol) / width).cast("long"))
    val ivs = intervals.withColumn("__cell",
      explode(sequence(
        floor(col(loCol) / width).cast("long"),
        floor(col(hiCol) / width).cast("long"))))
    pts.join(ivs, Seq("__cell"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__cell")
  }

  /** Interval-overlap join: all (left, right) pairs whose closed intervals
    * intersect (`loA <= hiB AND loB <= hiA`). Same grid trick as
    * [[pointInInterval]], generalized to both sides being intervals: each
    * interval explodes onto the cells it covers, the join is an equi-join
    * on the cell id, and a pair — which now meets in EVERY cell the
    * overlap region covers — is kept only in the cell that contains the
    * overlap's left edge (`max(lo_a, lo_b)`), so it is emitted exactly
    * once with no distinct pass.
    *
    * Column names must already be disjoint between the two inputs. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      loA: String, hiA: String, loB: String, hiB: String,
                      width: Long): DataFrame = {
    require(width > 0, "bucket width must be positive")
    val l = left.withColumn("__cell",
      explode(sequence(
        floor(col(loA) / width).cast("long"),
        floor(col(hiA) / width).cast("long"))))
    val r = right.withColumn("__cell",
      explode(sequence(
        floor(col(loB) / width).cast("long"),
        floor(col(hiB) / width).cast("long"))))
    l.join(r, Seq("__cell"))
      .filter(col(loA) <= col(hiB) && col(loB) <= col(hiA))
      .filter(floor(greatest(col(loA), col(loB)) / width).cast("long") === col("__cell"))
      .drop("__cell")
  }
}
