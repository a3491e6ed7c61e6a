package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Behavior specs for the ordered funnel: the at-or-after gate is the
  * whole point — out-of-order completions must not count.
  */
class FunnelSpec extends SparkSpec {

  import spark.implicits._

  private def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")

  private val stages = Seq("signup", "click", "purchase")

  private def reach(rows: Seq[(Long, Timestamp, String)]): Map[String, Long] =
    Funnel.stageReach(rows.toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", stages)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap

  test("stages gate on order: early clicks don't convert") {
    val got = reach(Seq(
      // user 1 completes the full ordered funnel
      (1L, ts(1), "signup"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
      // user 2 clicked BEFORE signing up and never clicked again
      (2L, ts(1), "click"), (2L, ts(2), "signup"), (2L, ts(3), "purchase"),
      // user 3 signs up, clicks, never purchases
      (3L, ts(1), "signup"), (3L, ts(2), "click"),
      // user 4 only purchases — reaches nothing without a signup
      (4L, ts(1), "purchase")))
    assert(got == Map("signup" -> 3L, "click" -> 2L, "purchase" -> 1L))
  }

  test("simultaneous events satisfy the at-or-after gate") {
    val got = reach(Seq(
      (1L, ts(1), "signup"), (1L, ts(1), "click"), (1L, ts(1), "purchase")))
    assert(got == Map("signup" -> 1L, "click" -> 1L, "purchase" -> 1L))
  }

  test("later re-occurrences rescue an early out-of-order event") {
    // user clicked before signup AND again after: the second click counts,
    // and the purchase between them does not (it precedes the valid click)
    val got = reach(Seq(
      (1L, ts(1), "click"), (1L, ts(2), "signup"), (1L, ts(3), "purchase"),
      (1L, ts(4), "click")))
    assert(got == Map("signup" -> 1L, "click" -> 1L, "purchase" -> 0L))
  }
}
