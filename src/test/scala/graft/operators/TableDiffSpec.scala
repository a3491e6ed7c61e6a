package graft.operators

import graft.SparkSpec

/** Behavior specs for the keyed snapshot diff: classification, null
  * payloads (the xxhash64 null-skip trap), composite keys, and the
  * no-change fast exit.
  */
class TableDiffSpec extends SparkSpec {

  import spark.implicits._

  test("added / removed / changed / unchanged classify correctly") {
    val before = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "v")
    val after = Seq((2L, "b", 20.0), (3L, "c", 99.0), (4L, "d", 40.0))
      .toDF("id", "name", "v")
    val got = TableDiff.diff(before, after, Seq("id"))
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "removed"), (3L, "changed"), (4L, "added")))
  }

  test("null payloads diff by position, not by hash pass-through") {
    val before = Seq((1L, Option.empty[String], Option("x"))).toDF("id", "a", "b")
    val after = Seq((1L, Option("x"), Option.empty[String])).toDF("id", "a", "b")
    // (null, x) -> (x, null): xxhash64 skips nulls, so without the
    // sentinel these would hash equal and the change would vanish
    val got = TableDiff.diff(before, after, Seq("id"))
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "changed")))
  }

  test("no data value collides with the null encoding — not even NUL") {
    // a literal NUL-byte string vs NULL: an in-band sentinel would hash
    // them identical and the change would vanish
    val before = Seq((1L, Option("\u0000")), (2L, Option("")))
      .toDF("id", "a")
    val after = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("id", "a")
    val got = TableDiff.diff(before, after, Seq("id"))
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "changed"), (2L, "changed")))
  }

  test("composite keys and identical snapshots") {
    val snap = Seq((1L, 1L, "x"), (1L, 2L, "y")).toDF("k1", "k2", "v")
    assert(TableDiff.diff(snap, snap, Seq("k1", "k2")).isEmpty)
    val moved = Seq((1L, 1L, "x"), (2L, 2L, "y")).toDF("k1", "k2", "v")
    val got = TableDiff.diff(snap, moved, Seq("k1", "k2"))
      .select("k1", "k2", "change").as[(Long, Long, String)].collect().toSet
    assert(got == Set((1L, 2L, "removed"), (2L, 2L, "added")))
  }

  test("column order never matters; schema mismatch fails loudly") {
    val before = Seq((1L, "a", 2L)).toDF("id", "s", "n")
    val after = Seq((1L, 2L, "a")).toDF("id", "n", "s") // same data, reordered
    assert(TableDiff.diff(before, after, Seq("id")).isEmpty)
    val other = Seq((1L, "a")).toDF("id", "s")
    intercept[IllegalArgumentException] {
      TableDiff.diff(before, other, Seq("id"))
    }
  }
}
