package graft.operators

import graft.SparkSpec

/** Behavior specs for the integer point-in-polygon join: hand-checked
  * containment on convex and non-convex rings, bucketing invariance (the
  * grid is an optimization, never a semantics knob), and overlap/miss
  * emission counts.
  */
class GeoSpec extends SparkSpec {

  import spark.implicits._

  // unit square ring + a non-convex "L" (notch at the top right)
  private val polys = Seq(
    (1L, Seq(0L, 10L, 10L, 0L), Seq(0L, 0L, 10L, 10L)),
    (2L, Seq(20L, 30L, 30L, 26L, 26L, 20L), Seq(0L, 0L, 10L, 10L, 4L, 4L)))
    .toDF("poly_id", "xs", "ys")

  private def assign(pts: Seq[(Long, Long, Long)], cell: Long = 4L): Set[(Long, Long)] =
    Geo.pointInPolygon(pts.toDF("id", "px", "py"), "px", "py", polys, cell)
      .select("id", "poly_id").as[(Long, Long)].collect().toSet

  test("convex and non-convex containment, misses, and the notch") {
    val got = assign(Seq(
      (1L, 5L, 5L),   // square interior
      (2L, 15L, 5L),  // between the polygons
      (3L, 25L, 2L),  // L interior (below the notch)
      (4L, 23L, 7L),  // inside the notch cut-out -> in neither
      (5L, 28L, 7L),  // L interior (right arm)
      (6L, 50L, 50L)  // far outside every bbox
    ))
    assert(got == Set((1L, 1L), (3L, 2L), (5L, 2L)))
  }

  test("cell size never changes the answer, only the candidate fan-out") {
    val pts = (0L until 200L).map(i => (i, (i * 13) % 35, (i * 7) % 12))
    val byCell = Seq(1L, 3L, 100L).map(c => assign(pts, c))
    assert(byCell.distinct.size == 1)
  }

  test("point tables carrying xs/ys/cx/cy columns never collide") {
    val pts = Seq((1L, 5L, 5L, Seq(9L), Seq(9L), 99L, 99L))
      .toDF("id", "px", "py", "xs", "ys", "cx", "cy")
    val got = Geo.pointInPolygon(pts, "px", "py", polys, 4L)
      .select("id", "poly_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L)))
  }

  test("a polygon wide enough to overflow the exact test fails loudly") {
    // extent ~3.6e9 > 2^31: the cross-multiplied parity products would
    // exceed Long.MaxValue and silently flip — must be rejected at plan time
    val planet = Seq(
      (1L, Seq(-1800000000L, 1800000000L, 1800000000L, -1800000000L),
           Seq(-900000000L, -900000000L, 900000000L, 900000000L)))
      .toDF("poly_id", "xs", "ys")
    val e = intercept[IllegalArgumentException] {
      Geo.pointInPolygon(Seq((1L, 0L, 0L)).toDF("id", "px", "py"),
        "px", "py", planet, 1000000L)
    }
    assert(e.getMessage.contains("overflow"))
  }

  test("overlapping polygons emit one row per containing polygon") {
    val overlapping = Seq(
      (7L, Seq(0L, 10L, 10L, 0L), Seq(0L, 0L, 10L, 10L)),
      (8L, Seq(5L, 15L, 15L, 5L), Seq(5L, 5L, 15L, 15L)))
      .toDF("poly_id", "xs", "ys")
    val got = Geo.pointInPolygon(
        Seq((1L, 7L, 7L)).toDF("id", "px", "py"), "px", "py", overlapping, 4L)
      .select("id", "poly_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 7L), (1L, 8L)))
  }
}
