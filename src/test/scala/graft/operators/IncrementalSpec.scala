package graft.operators

import graft.SparkSpec

/** Behavior specs for incremental additive-aggregate maintenance:
  * merge == recompute, new groups appear, split point is irrelevant.
  */
class IncrementalSpec extends SparkSpec {

  import spark.implicits._

  test("merging a delta equals recomputing from scratch, at any split") {
    val rows = (1 to 100).map(i => (s"g${i % 7}", i.toLong))
    val full = rows.toDF("g", "v").groupBy("g")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("cnt"),
        org.apache.spark.sql.functions.sum("v").as("sum_v"))
      .as[(String, Long, Long)].collect().toSet
    for (split <- Seq(1, 37, 99)) {
      def agg(part: Seq[(String, Long)]) = part.toDF("g", "v").groupBy("g")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("cnt"),
          org.apache.spark.sql.functions.sum("v").as("sum_v"))
      val merged = Incremental.mergeAdditive(
          agg(rows.take(split)), agg(rows.drop(split)), Seq("g"))
        .as[(String, Long, Long)].collect().toSet
      assert(merged == full, s"split=$split")
    }
  }

  test("declared min/max measures merge by min/max, undeclared default to sum") {
    val base = Seq(("a", 3L, 30L, 2L, 9L)).toDF("g", "cnt", "sum_v", "min_v", "max_v")
    val delta = Seq(("a", 2L, 12L, 5L, 7L), ("b", 1L, 4L, 4L, 4L))
      .toDF("g", "cnt", "sum_v", "min_v", "max_v")
    val got = Incremental.mergeAdditive(base, delta, Seq("g"),
        merges = Map("min_v" -> "min", "max_v" -> "max"))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(("a", 5L, 42L, 2L, 9L), ("b", 1L, 4L, 4L, 4L)))
    // bad inputs fail loudly, never silently corrupt
    intercept[IllegalArgumentException] {
      Incremental.mergeAdditive(base, delta, Seq("g"), Map("min_v" -> "avg"))
    }
    intercept[IllegalArgumentException] {
      Incremental.mergeAdditive(base, delta, Seq("g"), Map("g" -> "min"))
    }
  }

  test("groups new in the delta appear; schema mismatch fails loudly") {
    val base = Seq(("a", 1L, 10L)).toDF("g", "cnt", "sum_v")
    val delta = Seq(("a", 2L, 5L), ("b", 1L, 7L)).toDF("g", "cnt", "sum_v")
    val got = Incremental.mergeAdditive(base, delta, Seq("g"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("a", 3L, 15L), ("b", 1L, 7L)))
    intercept[IllegalArgumentException] {
      Incremental.mergeAdditive(base, delta.drop("sum_v"), Seq("g"))
    }
  }
}
