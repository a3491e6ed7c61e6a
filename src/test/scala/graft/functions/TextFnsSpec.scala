package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](text: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): T =
    Seq(text).toDF("t").select(c(col("t")).as("r")).head().getAs[T]("r")

  test("shingles produce n-grams, deduplicated, empty below n") {
    assert(one[Seq[String]]("a b c d", TextFns.shingles(_, 2)) === Seq("a b", "b c", "c d"))
    assert(one[Seq[String]]("a b a b a b", TextFns.shingles(_, 2)) === Seq("a b", "b a"))
    assert(one[Seq[String]]("a b", TextFns.shingles(_, 5)) === Seq())
  }

  test("token counting and BPE estimate") {
    assert(one[Long]("the quick brown fox", TextFns.tokenCount) === 4L)
    assert(one[Long]("abcd", TextFns.tokenEstimate) === 1L)
    assert(one[Long]("abcde", TextFns.tokenEstimate) === 2L)
  }

  test("stopwordRatio") {
    assert(one[Double]("the cat and the dog", TextFns.stopwordRatio(_, Seq("the", "and"))) === 0.6)
  }

  test("langId picks the marker-richest language with priority tie-break") {
    assert(one[String]("the fast cat", TextFns.langId) === "en")
    assert(one[String]("el gato la casa", TextFns.langId) === "es")
    assert(one[String]("xyzzy quux", TextFns.langId) === "und")
    // 'la' is both es and fr — es wins by priority order
    assert(one[String]("la la", TextFns.langId) === "es")
  }

  test("fingerprint is whitespace/case insensitive but content sensitive") {
    val a = one[String]("The  Quick\tFox", TextFns.fingerprint)
    val b = one[String]("the quick fox", TextFns.fingerprint)
    val c = one[String]("the quick cat", TextFns.fingerprint)
    assert(a === b)
    assert(a !== c)
  }
}
