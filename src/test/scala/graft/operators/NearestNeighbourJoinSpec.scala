package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NearestNeighbourJoinSpec extends SparkSpec {
  import spark.implicits._

  // Seeded points covering the three grid paths at cellWidth=2:
  //  - proven local winner (dist ≤ cw): left 10, 11, 14
  //  - UNPROVEN local winner (a right row sits in the 3×3 neighbourhood but
  //    the true NN lies outside it — the VERDICT-r1 silent-wrong-answer
  //    edge): left 12 sees right 2 (d=2.9) locally, true NN is right 3
  //    (d=2.2) two cells away
  //  - empty neighbourhood → broadcast fallback: left 13
  private val right = Seq(
    (1L, 0.0, 0.0), (2L, 9.0, 0.0), (3L, 3.9, 0.0),
    (4L, 100.0, 100.0), (5L, -50.0, 7.0)
  ).toDF("s_id", "rx", "ry")

  private val left = Seq(
    (10L, 0.1, 0.1), (11L, 2.1, 0.0), (12L, 6.1, 0.0),
    (13L, 60.0, 60.0), (14L, -49.0, 6.0)
  ).toDF("c_id", "lx", "ly")

  private def brute(): Map[Long, (Long, Double)] =
    NearestNeighbourJoin.broadcastArgmin(
        left, right, Seq("c_id"),
        dist = abs($"lx" - $"rx") + abs($"ly" - $"ry"),
        tieBreak = Seq($"s_id"), payload = Seq("s_id" -> $"s_id"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

  test("broadcastArgmin finds exact nearest neighbours") {
    val got = brute()
    val expected = Map(
      10L -> (1L, 0.2), 11L -> (3L, 1.8), 12L -> (3L, 2.2),
      13L -> (4L, 80.0), 14L -> (5L, 2.0))
    assert(got.keySet === expected.keySet)
    expected.foreach { case (k, (id, d)) =>
      assert(got(k)._1 === id, s"left $k neighbour")
      assert(math.abs(got(k)._2 - d) < 1e-9, s"left $k distance")
    }
  }

  test("gridArgmin equals broadcastArgmin for every cell width, including " +
       "widths that trigger the unproven-local-winner fallback") {
    val bc = brute()
    for (cw <- Seq(2.0, 5.0, 8.0, 50.0)) {
      val got = NearestNeighbourJoin.gridArgmin(
          left, "c_id", "lx", "ly", right, "s_id", "rx", "ry", cw)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(got === bc, s"cellWidth=$cw")
    }
  }

  test("gridArgmin on testdata coords equals broadcast at sf0.001") {
    val l = graft.Tables.customer(spark, sfDir).select($"c_custkey",
      ($"c_acctbal" / 100).as("lx"), ($"c_custkey" % 89).cast("double").as("ly"))
    val r = graft.Tables.supplier(spark, sfDir).select($"s_suppkey",
      ($"s_acctbal" / 100).as("rx"), ($"s_suppkey" % 89).cast("double").as("ry"))
    val grid = NearestNeighbourJoin.gridArgmin(
        l, "c_custkey", "lx", "ly", r, "s_suppkey", "rx", "ry", 8.0)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val bc = NearestNeighbourJoin.broadcastArgmin(
        l, r, Seq("c_custkey"),
        dist = abs($"lx" - $"rx") + abs($"ly" - $"ry"),
        tieBreak = Seq($"s_suppkey"), payload = Seq("s" -> $"s_suppkey"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(grid === bc)
  }
}
