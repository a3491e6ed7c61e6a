package graft.operators

import graft.SparkSpec

/** Behavior specs for BPE merge learning: hand-computed merge sequences,
  * overlapping-pair counting (Sennrich counts all adjacent index pairs),
  * the greedy double-replace equivalence on runs, tie-breaking, and the
  * early-exhaustion stop. */
class BpeTrainSpec extends SparkSpec {

  import spark.implicits._

  private def learn(text: String, n: Int): Seq[(Long, String, String, String, Long)] =
    BpeTrain.learnMerges(Seq((1L, text)).toDF("doc_id", "text"), "text", n)
      .as[(Long, String, String, String, Long)].collect().toSeq.sortBy(_._1)

  test("hand fixture: merge order follows weighted pair counts; stops when dry") {
    // hist: aa:3, ab:2 -> (a,a) wins round 1 (3 > 2), then (a,b)
    val got = learn("aa ab aa ab aa", 5)
    assert(got == Seq(
      (1L, "a", "a", "aa", 3L),
      (2L, "a", "b", "ab", 2L)))
  }

  test("runs: overlapping pairs count per index; double-replace merges greedily") {
    // [a,a,a,a]: three (a,a) index pairs; greedy merge -> [aa,aa] so round 2
    // sees exactly one (aa,aa) pair
    val got = learn("aaaa", 2)
    assert(got == Seq(
      (1L, "a", "a", "aa", 3L),
      (2L, "aa", "aa", "aaaa", 1L)))
  }

  test("ties break on (left, right) ascending — deterministic replay contract") {
    // xy and ab both appear twice; (a,b) < (x,y) lexicographically
    val got = learn("ab xy ab xy", 1)
    assert(got == Seq((1L, "a", "b", "ab", 2L)))
  }

  test("non-ASCII and separator-unsafe tokens never enter training") {
    val got = learn("café café ok ok", 1)
    // café is filtered (non-ASCII); only "ok" trains
    assert(got == Seq((1L, "o", "k", "ok", 2L)))
  }
}
