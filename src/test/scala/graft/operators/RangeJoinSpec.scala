package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def pts = Seq(
    (1L, 5L), (2L, 10L), (3L, 31L), (4L, 32L), (5L, 63L), (6L, 100L), (7L, 0L)
  ).toDF("pid", "p")

  private def ivs = Seq(
    (10L, 0L, 9L),     // covers p=5, 0
    (11L, 10L, 10L),   // single-point interval, covers p=10
    (12L, 30L, 33L),   // straddles the width-32 cell boundary: p=31, 32
    (13L, 60L, 70L),   // covers p=63
    (14L, 101L, 110L)  // covers nothing
  ).toDF("iid", "lo", "hi")

  test("bucketized range join equals the naive inequality join, once per pair") {
    val got = RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", width = 32L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val naive = pts.crossJoin(ivs).filter($"p" >= $"lo" && $"p" <= $"hi")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.sorted === naive.sorted)
    assert(got.distinct.size === got.size, "each true pair exactly once")
  }

  test("range join equals the inequality join on real tables at several widths") {
    val epoch = lit("1970-01-01").cast("date")
    val iv = graft.Tables.orders(spark, sfDir).filter($"o_orderkey" % 20 === 0)
      .select($"o_orderkey".as("win_id"),
        datediff(to_date($"o_orderdate"), epoch).cast("long").as("lo"),
        (datediff(to_date($"o_orderdate"), epoch) + $"o_orderkey" % 30 + 1)
          .cast("long").as("hi"))
    val pt = graft.Tables.lineitem(spark, sfDir).filter($"l_orderkey" % 20 === 1)
      .select($"l_orderkey", $"l_linenumber",
        datediff(to_date($"l_shipdate"), epoch).cast("long").as("p"))
    val naive = pt.crossJoin(iv).filter($"p" >= $"lo" && $"p" <= $"hi")
      .select("l_orderkey", "l_linenumber", "win_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    Seq(1L, 7L, 32L, 1000L).foreach { w =>
      val got = RangeJoin.pointInInterval(pt, iv, "p", "lo", "hi", w)
        .select("l_orderkey", "l_linenumber", "win_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(got === naive, s"width $w")
    }
  }

  test("the plan is an equi-join on the cell id, not a nested loop") {
    val plan = RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", width = 32L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"range join fell back to an all-pairs join:\n$plan")
  }

  private def ivsB = Seq(
    (20L, 0L, 0L),     // point interval at the origin
    (21L, 8L, 35L),    // spans two width-32 cells, overlaps 10 and 12
    (22L, 31L, 31L),   // inside 12's cell-straddling span
    (23L, 64L, 64L),   // touches 13's cell but not its span
    (24L, 200L, 210L)  // overlaps nothing
  ).toDF("jid", "jlo", "jhi")

  test("interval overlap equals the naive inequality join, once per pair") {
    val naive = ivs.crossJoin(ivsB)
      .filter($"lo" <= $"jhi" && $"jlo" <= $"hi")
      .select("iid", "jid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    Seq(1L, 5L, 32L, 1000L).foreach { w =>
      val got = RangeJoin.intervalOverlap(ivs, ivsB, "lo", "hi", "jlo", "jhi", w)
        .select("iid", "jid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got.sorted === naive.sorted, s"width $w")
      assert(got.distinct.size === got.size, s"pair emitted more than once at width $w")
    }
  }

  test("interval overlap matches the inequality join on real tables") {
    val epoch = lit("1970-01-01").cast("date")
    def wins(m: Int, span: Int) = graft.Tables.orders(spark, sfDir)
      .filter($"o_orderkey" % 40 === m)
      .select($"o_orderkey".as(s"id_$m"),
        datediff(to_date($"o_orderdate"), epoch).cast("long").as(s"lo_$m"),
        (datediff(to_date($"o_orderdate"), epoch) + $"o_orderkey" % span + 1)
          .cast("long").as(s"hi_$m"))
    val a = wins(0, 30); val b = wins(1, 45)
    val naive = a.crossJoin(b).filter($"lo_0" <= $"hi_1" && $"lo_1" <= $"hi_0")
      .select("id_0", "id_1").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = RangeJoin.intervalOverlap(a, b, "lo_0", "hi_0", "lo_1", "hi_1", 32L)
      .select("id_0", "id_1").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.toSet === naive)
    assert(got.distinct.size === got.size)
  }

  test("interval overlap plans as an equi-join, not a nested loop") {
    val plan = RangeJoin.intervalOverlap(ivs, ivsB, "lo", "hi", "jlo", "jhi", 32L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"interval overlap fell back to an all-pairs join:\n$plan")
  }
}
