package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private val right = Seq(
    (1L, 10L, 100L), (1L, 20L, 101L), (1L, 30L, 102L),
    (2L, 15L, 200L)
  ).toDF("k", "ts", "payload_id")

  private val left = Seq(
    (1L, 5L, 900L),   // before any right row → null match
    (1L, 10L, 901L),  // equal ts → inclusive match 100
    (1L, 25L, 902L),  // between 20 and 30 → 101
    (1L, 99L, 903L),  // after all → 102
    (2L, 14L, 904L),  // before key-2's only row → null
    (3L, 50L, 905L)   // key with no right rows at all → null
  ).toDF("k", "ts", "event_id")

  test("asOf picks the greatest right ts <= left ts per key, inclusive") {
    val got = AsOfJoin.asOf(left, right, Seq("k"), "ts", "ts", Seq("payload_id"))
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        (if (r.isNullAt(r.fieldIndex("asof_payload_id"))) null
         else r.getAs[Long]("asof_payload_id"))).toMap
    assert(got === Map(
      900L -> null, 901L -> 100L, 902L -> 101L,
      903L -> 102L, 904L -> null, 905L -> null))
  }

  test("every left row survives (left-outer semantics)") {
    val out = AsOfJoin.asOf(left, right, Seq("k"), "ts", "ts", Seq("payload_id"))
    assert(out.count() === left.count())
    assert(out.columns.toSeq === Seq("k", "ts", "event_id", "asof_payload_id"))
  }

  test("asOfForward picks the smallest right ts >= left ts, inclusive") {
    val got = AsOfJoin.asOfForward(left, right, Seq("k"), "ts", "ts",
        Seq("payload_id"))
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        (if (r.isNullAt(r.fieldIndex("asof_payload_id"))) null
         else r.getAs[Long]("asof_payload_id"))).toMap
    assert(got === Map(
      900L -> 100L,   // next right at ts 10
      901L -> 100L,   // equal ts → inclusive
      902L -> 102L,   // next after 25 is 30
      903L -> null,   // nothing after 99
      904L -> 200L,   // key 2's row at 15
      905L -> null))  // key with no right rows
    assert(AsOfJoin.asOfForward(left, right, Seq("k"), "ts", "ts",
      Seq("payload_id")).count() === left.count())
  }
}
