package graft.operators

import graft.SparkSpec
import graft.operators.Contracts._

class ContractsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Some("a"), 5L, "1-URGENT"),
    (2L, Some("a"), 50L, "5-LOW"),
    (3L, None, -1L, "9-BOGUS"),
    (3L, Some("x"), 200L, "2-HIGH"))
    .toDF("id", "s", "v", "pr")

  test("every rule kind counts its violations; nulls violate scalar rules") {
    val out = Contracts.validate(df, Seq(
        NotNull("s"),
        InSet("s", Seq("a", "b")),
        InRange("v", 0L, 100L),
        Matches("pr", "^[1-5]-"),
        Unique("id"),
        Unique("s")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out("not_null(s)") == ((4L, 1L, 0L)))
    assert(out("in_set(s)") == ((4L, 2L, 0L)))      // null AND "x" both violate
    assert(out("in_range(v)") == ((4L, 2L, 0L)))    // -1 and 200
    assert(out("matches(pr)") == ((4L, 1L, 0L)))    // 9-BOGUS
    assert(out("unique(id)") == ((4L, 1L, 0L)))     // one duplicated id
    assert(out("unique(s)") == ((4L, 1L, 0L)))      // "a" twice; null not counted
  }

  test("a clean batch passes every rule") {
    val out = Contracts.validate(df.filter($"id" === 1L), Seq(
        NotNull("s"), InRange("v", 0L, 100L), Unique("id")))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out.values.forall(_ === 1L), out)
  }

  test("all scalar rules share ONE scan; each unique rule pays its own") {
    def scans(rules: Seq[Rule]): Int = {
      val plan = Contracts.validate(df, rules).queryExecution.executedPlan.toString
      "LocalTableScan".r.findAllIn(plan).size
    }
    assert(scans(Seq(NotNull("s"), InSet("s", Seq("a")), InRange("v", 0L, 1L),
      Matches("pr", "x"))) === 1)
    assert(scans(Seq(NotNull("s"), Unique("id"))) === 2)
  }
}
