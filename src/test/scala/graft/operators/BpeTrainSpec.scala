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

  private def encode(docs: Seq[(Long, String)],
                     merges: Seq[(String, String)]): Map[Long, (Long, Long, Long)] =
    BpeTrain.encodeStats(docs.toDF("doc_id", "text"), "text", "doc_id", merges)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, w, c, t) => id -> ((w, c, t)) }.toMap

  test("encode hand fixture: merges apply in rank order, per word") {
    // merges (a,a)->aa then (aa,b)->aab:
    //   "aab"  -> [aa, b] -> [aab]          = 1 token
    //   "aba"  -> [a, b, a]                 = 3 tokens (no adjacent aa)
    //   "aaaa" -> [aa, aa]                  = 2 tokens
    val got = encode(Seq((1L, "aab aba aaaa")), Seq(("a", "a"), ("aa", "b")))
    assert(got(1L) == ((3L, 10L, 6L)))
  }

  test("encode with zero merges: every char is a token; boundary docs are zeros") {
    val got = encode(Seq((1L, "ab cde"), (2L, ""), (3L, "café")), Seq.empty)
    assert(got(1L) == ((2L, 5L, 5L)))
    assert(got(2L) == ((0L, 0L, 0L)))   // no printable-ASCII words
    assert(got(3L) == ((0L, 0L, 0L)))   // non-ASCII word filtered, like training
  }

  test("encode never merges across word boundaries") {
    // merge (a,b): "a b" must stay 2 tokens; "ab" becomes 1
    val got = encode(Seq((1L, "a b"), (2L, "ab")), Seq(("a", "b")))
    assert(got(1L) == ((2L, 2L, 2L)))
    assert(got(2L) == ((1L, 2L, 1L)))
  }

  test("trainAndEncode composes: learned merges compress the training corpus") {
    val docs = Seq((1L, "aa ab aa ab aa"), (2L, "aa aa"))
    val stats = BpeTrain.trainAndEncode(docs.toDF("doc_id", "text"), "text", "doc_id", 2)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // merges: (a,a), (a,b) -> every word is 1 token
    assert(stats(1L) == ((1L, 5L, 10L, 5L)))
    assert(stats(2L) == ((2L, 2L, 4L, 2L)))
  }
}
