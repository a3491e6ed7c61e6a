package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial containment join (engine-added, builder brief): assign points to
  * region polygons — the housing-map question "which borough is this
  * listing in" (the reference keys its map screens on station/area; a
  * polygon join is the general form of that assignment).
  *
  * Everything is integer arithmetic on quantized coordinates (the reference
  * stores lat/lng as doubles; quantizing to a fixed grid ~1e-7 deg is
  * lossless for containment at street scale), so the crossing-number test
  * is EXACT — no epsilon, no float reduction-order sensitivity, and an
  * oracle can hash-match it bit for bit.
  */
object Geo {

  /** Crossing-number (ray cast) parity for one point against one polygon,
    * as a single codegen-friendly expression tree.
    *
    * Edge i runs (xs[i],ys[i]) → (xs[i%n+1],ys[i%n+1]) (1-indexed arrays,
    * closing edge implied). The PNPOLY upward-ray test
    *   (y1 > py) != (y2 > py)  &&  px < x1 + (x2-x1)·(py-y1)/(y2-y1)
    * is made exact by cross-multiplying: with dy = y2-y1 (nonzero when the
    * first conjunct holds), the x comparison is
    *   (px-x1)·dy < (x2-x1)·(py-y1)   when dy > 0
    *   (px-x1)·dy > (x2-x1)·(py-y1)   when dy < 0
    * — pure BIGINT compares, summation-order independent.
    *
    * PRECONDITION: |px-x1| and |y2-y1| (and the rhs pair) must each stay
    * under 2^31 so the products fit a long — at the 1e-7-deg global
    * quantization that is ~214° of extent, far beyond any real region
    * polygon, but a malformed polygon could overflow SILENTLY.
    * [[pointInPolygon]] validates it against the dim at plan time; callers
    * using this expression directly own the same check. */
  def insidePolygon(px: Column, py: Column, xs: Column, ys: Column): Column = {
    val n = size(xs)
    val crossings = aggregate(
      sequence(lit(1), n),
      lit(0L),
      (acc: Column, i: Column) => {
        val x1 = element_at(xs, i)
        val y1 = element_at(ys, i)
        val x2 = element_at(xs, (i % n) + 1)
        val y2 = element_at(ys, (i % n) + 1)
        val straddles = (y1 > py) =!= (y2 > py)
        val lhs = (px - x1) * (y2 - y1)
        val rhs = (x2 - x1) * (py - y1)
        val crosses = straddles && when(y2 > y1, lhs < rhs).otherwise(lhs > rhs)
        acc + when(crosses, 1L).otherwise(0L)
      })
    crossings % 2 === 1
  }

  /** Grid-bucketed containment join.
    *
    * `points` carries integer coords (`pxCol`, `pyCol`); `polygons` is a
    * small dim (poly_id, xs: array<long>, ys: array<long>, vertices in
    * ring order). Scale shape:
    *
    *   1. each polygon is exploded to the grid cells its bbox covers —
    *      |polys|·cells rows, still dim-sized, broadcast;
    *   2. each point computes its ONE cell (a zero-shuffle projection) and
    *      equi-joins the broadcast cell table — never a cross join, and no
    *      dedup pass is needed because a point has exactly one cell;
    *   3. candidates run the exact parity test above.
    *
    * At 100 TB the point side stays a scan; cost is |points|·(avg polygons
    * per cell), tuned by `cellSize` against polygon extent. Output: all
    * point columns + `poly_id` for each (point, containing polygon) pair
    * (a point in k overlapping polygons emits k rows; a point in none
    * emits none). */
  def pointInPolygon(points: DataFrame, pxCol: String, pyCol: String,
                     polygons: DataFrame, cellSize: Long): DataFrame = {
    require(cellSize > 0, s"cellSize must be positive, got $cellSize")
    // overflow guard for the exact parity test: candidates sit inside a
    // polygon's bbox cells, so every factor is bounded by extent+cellSize;
    // keeping that under 2^31 keeps the cross-multiplied products inside
    // a long. One tiny aggregate over the (broadcast-sized) dim at plan
    // time — a malformed polygon fails loudly here instead of silently
    // flipping parity bits at runtime.
    val ext = polygons.agg(
      max(array_max(col("xs")) - array_min(col("xs"))).as("dx"),
      max(array_max(col("ys")) - array_min(col("ys"))).as("dy")).head()
    val bound = (1L << 31) - cellSize
    require(!ext.isNullAt(0) && ext.getLong(0) < bound && ext.getLong(1) < bound,
      s"polygon extent (${ext.get(0)}, ${ext.get(1)}) + cellSize $cellSize " +
        "exceeds 2^31 quantized units; the exact BIGINT parity test would overflow")
    // polygon-side columns travel under reserved __-prefixed names so a
    // point table that happens to carry xs/ys/cx/cy never collides
    val cellsOf = polygons.select(
        col("poly_id"), col("xs").as("__xs"), col("ys").as("__ys"),
        explode(sequence(
          floorDiv(array_min(col("xs")), cellSize),
          floorDiv(array_max(col("xs")), cellSize))).as("__pcx"))
      .select(col("poly_id"), col("__xs"), col("__ys"), col("__pcx"),
        explode(sequence(
          floorDiv(array_min(col("__ys")), cellSize),
          floorDiv(array_max(col("__ys")), cellSize))).as("__pcy"))
    val px = col(pxCol).cast("long")
    val py = col(pyCol).cast("long")
    points
      .withColumn("__cx", floorDiv(px, cellSize))
      .withColumn("__cy", floorDiv(py, cellSize))
      .join(broadcast(cellsOf),
        col("__cx") === col("__pcx") && col("__cy") === col("__pcy"))
      .filter(insidePolygon(px, py, col("__xs"), col("__ys")))
      .drop("__cx", "__cy", "__pcx", "__pcy", "__xs", "__ys")
  }

  /** Floor division that matches SQL `//` on negatives (long `div`
    * truncates toward zero; grid cells need floor): subtract the positive
    * mod first, then the division is exact. Quantized coordinates are
    * well under 2^53 so the double round-trip of `/` cannot lose bits. */
  private def floorDiv(a: Column, b: Long): Column =
    ((a - pmod(a, lit(b))) / b).cast("long")
}
