package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Nearest-neighbour (argmin-distance) join — SURVEY §2.4 J3.
  *
  * The reference maps every subway station to the closest air-quality site by
  * L1 lat/lon distance with a per-row full scan
  * (`LondonAir_sites_subway_station_mapping.ipynb:46-80`). Re-expressed for
  * Spark:
  *
  *  - `broadcastArgmin` — right side small (the reference's case: ~100
  *    sites): crossJoin(broadcast(right)) + one hash aggregate
  *    `min(struct(dist, tieBreak, payload…))`. `min(struct)` orders
  *    lexicographically, so the aggregate is a deterministic argmin with
  *    map-side partial aggregation — no window, no extra shuffle; scales
  *    linearly in |left| on any cluster.
  *  - `gridArgmin` — both sides large: bucket 2-D coordinates into grid
  *    cells, equi-join each left row against right rows in its 3×3 cell
  *    neighbourhood, local argmin, broadcast-fallback for rows whose
  *    neighbourhood is empty. Turns O(n·m) into a shuffle-partitioned
  *    equi-join — the 100 TB path.
  */
object NearestNeighbourJoin {

  /** Argmin join for a broadcastable right side.
    *
    * @param dist     distance expression over columns of `left` and `right`
    * @param tieBreak deterministic tie-break columns from `right` (must make
    *                 the ordering total, e.g. a unique key)
    * @param payload  (outputName, rightColumn) pairs carried to the output
    */
  def broadcastArgmin(
      left: DataFrame, right: DataFrame,
      leftKeys: Seq[String],
      dist: Column,
      tieBreak: Seq[Column],
      payload: Seq[(String, Column)]): DataFrame = {
    val packed = struct(
      (dist.as("__dist") +:
        tieBreak.zipWithIndex.map { case (c, i) => c.as(s"__tb$i") }) ++
        payload.map { case (n, c) => c.as(n) }: _*)
    // Pre-partition the left by the group keys: a compact left (one parquet
    // split) would otherwise push the full |left|·|right| cross-join output
    // through a single task. Hash-partitioning on the keys both spreads the
    // nested-loop join across the cluster and already satisfies the
    // aggregate's distribution, so no second shuffle follows the join. The
    // explicit partition count pins the fan-out (AQE would coalesce a
    // small-by-bytes left back to one partition).
    val shufflePartitions =
      left.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    left.repartition(shufflePartitions, leftKeys.map(col): _*)
      .crossJoin(broadcast(right))
      .groupBy(leftKeys.map(col): _*)
      .agg(min(packed).as("__best"))
      .select(leftKeys.map(col) ++
        payload.map { case (n, _) => col(s"__best.$n").as(n) } :+
        col("__best.__dist").as("dist"): _*)
  }

  /** Grid-bucketed argmin for large × large inputs (L1 over 2-D coords).
    *
    * Unconditionally correct: a local 3×3-cell argmin is PROVEN optimal only
    * when its distance ≤ cellWidth (any point outside the neighbourhood is
    * > cellWidth away in L1). Rows with an empty neighbourhood, or whose local
    * winner is farther than cellWidth, are re-routed through the broadcast
    * full argmin — exactly the rows whose local result is unproven, rare by
    * construction when cellWidth ≳ typical NN distance. Skew note: a hot cell
    * (dense region) is a skewed join key — AQE skew-join handling covers it
    * at scale (spark.sql.adaptive.enabled, on by default in Spark 4).
    */
  def gridArgmin(
      left: DataFrame, leftKey: String, lx: String, ly: String,
      right: DataFrame, rightPayload: String, rx: String, ry: String,
      cellWidth: Double): DataFrame = {
    val cw = lit(cellWidth)
    val offsets = Seq(-1, 0, 1)
    // Right side replicated to its 3×3 neighbourhood so the join is a plain
    // equi-join on cell id (one shuffle, partitioned by cell).
    val cells = explode(array(
      (for { dx <- offsets; dy <- offsets } yield struct(
        (floor(col(rx) / cw) + dx).as("cx"),
        (floor(col(ry) / cw) + dy).as("cy"))): _*)).as("cell")
    val r = right.select(col(rightPayload), col(rx), col(ry), cells)
      .select(col(rightPayload), col(rx), col(ry),
        col("cell.cx").as("cx"), col("cell.cy").as("cy"))
    val l = left.select(col(leftKey), col(lx), col(ly),
      floor(col(lx) / cw).as("cx"), floor(col(ly) / cw).as("cy"))

    def argmin(in: DataFrame): DataFrame =
      in.groupBy(col(leftKey))
        .agg(min(struct(
          (abs(col(lx) - col(rx)) + abs(col(ly) - col(ry))).as("__dist"),
          col(rightPayload).as("__p"))).as("__best"))
        .select(col(leftKey), col("__best.__p").as(rightPayload),
          col("__best.__dist").as("dist"))

    val local = argmin(l.join(r, Seq("cx", "cy")))
    // Proven winners: closer than one cell width, so no point outside the
    // 3×3 neighbourhood can beat them.
    val proven = local.filter(col("dist") <= cellWidth)
    val unproven = left
      .join(proven.select(col(leftKey)), Seq(leftKey), "left_anti")
      .select(col(leftKey), col(lx), col(ly))
    val fallback = argmin(unproven.crossJoin(
      broadcast(right.select(col(rightPayload), col(rx), col(ry)))))
    proven.unionByName(fallback)
  }
}
