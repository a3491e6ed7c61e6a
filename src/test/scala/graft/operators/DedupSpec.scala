package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir)

  private def pairKey(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("exact dedup keeps one row per fingerprint with min id") {
    val corpus = docs.select("doc_id", "text").unionByName(
      docs.select("doc_id", "text").filter($"doc_id" % 3 === 0)
        .withColumn("doc_id", $"doc_id" + 100000))
    val out = Dedup.exactByFingerprint(corpus, "doc_id", "text")
    val copies = out.filter($"n_copies" === 2).count()
    val singles = out.filter($"n_copies" === 1).count()
    assert(copies === docs.filter($"doc_id" % 3 === 0).count())
    assert(copies + singles === docs.count())
    // keepers are always the original ids, never the planted +100000 ones
    assert(out.filter($"keeper_id" >= 100000).count() === 0)
  }

  test("minhash LSH near-dups equal brute-force Jaccard pairs at tau=0.5") {
    val lsh = pairKey(Dedup.minHashNearDups(docs, "doc_id", "text",
      shingleSize = 5, numHashes = 64, bands = 16, tau = 0.5))
    val brute = pairKey(Dedup.bruteForceJaccardPairs(docs, "doc_id", "text",
      shingleSize = 5, tau = 0.5))
    assert(brute.nonEmpty, "testdata should contain planted near-dup pairs")
    assert(lsh === brute)
  }

  test("simhash near-dups find the high-similarity planted pairs") {
    val sim = pairKey(Dedup.simHashNearDups(docs, "doc_id", "text",
      shingleSize = 5, tau = 0.3))
    val strong = pairKey(Dedup.bruteForceJaccardPairs(docs, "doc_id", "text",
      shingleSize = 5, tau = 0.9))
    // precision: everything reported passed exact verification ≥ 0.3
    val brute03 = pairKey(Dedup.bruteForceJaccardPairs(docs, "doc_id", "text",
      shingleSize = 5, tau = 0.3))
    assert(sim.subsetOf(brute03))
    // recall on near-identical docs: banded 16-bit chunks must catch J≥0.9
    assert(strong.subsetOf(sim))
  }

  test("near-dup clustering resolves chains and separates components") {
    // chain 1~2~3~4 (diameter 3, no direct 1~4 edge) + island 10~11
    val pairs = Seq((2L, 3L), (1L, 2L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L)
    // driver union-find regime
    val viaDriver = Dedup.nearDupClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDriver === expected)
    // distributed label-propagation regime (forced via the threshold)
    val viaDistributed = Dedup.nearDupClusters(pairs, maxDriverEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDistributed === expected)
  }

  test("distributed clustering: pointer doubling bounds rounds on a long chain") {
    // a 512-node PATH (diameter 511) — the pathological pairwise-drift
    // chain. Plain min-label propagation needs ~511 rounds and would
    // blow the bound; pointer doubling (label := label(label) each
    // round) converges in O(log diameter), comfortably inside 20, with
    // the every-3-rounds localCheckpoint keeping the plan DAG bounded.
    val chain = (1L to 512L).sliding(2).map(s => (s.head, s.last)).toSeq
      .toDF("id_a", "id_b")
    val got = Dedup.nearDupClusters(chain, maxIter = 20, maxDriverEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 512)
    assert(got.values.forall(_ == 1L),
      s"every chain member labels to the min id: ${got.filter(_._2 != 1L).take(5)}")
  }

  test("near-dup clustering fails loudly when the iteration bound is hit") {
    val chain = (1L to 6L).sliding(2).map(s => (s.head, s.last)).toSeq
      .toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      Dedup.nearDupClusters(chain, maxIter = 1, maxDriverEdges = 0)
    }
  }

  test("incremental LSH near-dup equals brute-force cross Jaccard on the index split") {
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val idxDir = java.nio.file.Files.createTempDirectory("mh_idx").toString
    Dedup.writeMinHashIndex(corpus, "doc_id", "text",
      shingleSize = 5, numHashes = 64, bands = 16, idxDir)
    val inc = Dedup.incrementalNearDups(batch, idxDir, "doc_id", "text",
        shingleSize = 5, numHashes = 64, bands = 16, tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // brute-force ground truth over the same hashed shingle sets
    def sh(df: org.apache.spark.sql.DataFrame, id: String, s: String) =
      df.filter(size(graft.functions.TextFns.tokens(col("text"))) >= 5)
        .select(col("doc_id").as(id), Dedup.shingleHashes(col("text"), 5).as(s))
    val brute = sh(batch, "id_new", "a").crossJoin(sh(corpus, "id_corpus", "b"))
      .withColumn("jac", Dedup.jaccard(col("a"), col("b")))
      .filter(col("jac") >= 0.5)
      .select("id_new", "id_corpus", "jac")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(inc === brute)
    assert(inc.nonEmpty, "fixture should contain planted cross-split near-dups")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(idxDir))
  }

  test("simhash values are stable and bucket near-identical docs together") {
    val sh = Dedup.simHash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val again = Dedup.simHash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh === again)
    assert(sh.values.toSet.size > 1)
  }

  test("duplicate spans: cross-doc runs merge, within-doc repeats don't count") {
    import spark.implicits._
    // n=3 grams; letters are tokens
    val run = "x1 x2 x3 x4 x5"          // shared 5-token run → one span
    val fixture = Seq(
      (1L, s"a1 a2 $run b1 b2"),        // run at positions 3..7
      (2L, s"$run c1 c2 c3 c4"),        // run at positions 1..5
      // doc 3 repeats a 3-gram INSIDE itself only — not a cross-doc dup
      (3L, "p q r s p q r t u"),
      // doc 4 shares two runs with doc 5 separated by one token → two
      // spans (gap of 1 still breaks: adjacency is s == prev_e + 1)
      (4L, "m1 m2 m3 z9 n1 n2 n3"),
      (5L, "m1 m2 m3 y8 y7 n1 n2 n3")
    ).toDF("doc_id", "text")
    val got = Dedup.duplicateSpans(fixture, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(
      (1L, 3L, 7L), (2L, 1L, 5L),
      (4L, 1L, 3L), (4L, 5L, 7L),
      (5L, 1L, 3L), (5L, 6L, 8L)))
  }

  test("duplicate spans on planted copies cover the whole duplicated doc") {
    val corpus = docs.select("doc_id", "text").unionByName(
      docs.select("doc_id", "text").filter($"doc_id" % 7 === 0)
        .withColumn("doc_id", $"doc_id" + 100000))
    val spans = Dedup.duplicateSpans(corpus, "doc_id", "text", n = 8)
    // every planted copy long enough to shingle is one full-doc span
    val copies = corpus.filter($"doc_id" >= 100000)
      .select($"doc_id", size(graft.functions.TextFns.tokens($"text")).as("len"))
      .filter($"len" >= 8)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byDoc = spans.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    copies.foreach { case (id, len) =>
      val ss = byDoc.getOrElse(id, Array.empty)
      assert(ss.exists(s => s._2 == 1L && s._3 == len.toLong),
        s"copy $id (len $len) not fully covered: ${ss.mkString(",")}")
    }
  }

  test("keepBest: highest quality wins, ties break to the smallest id") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "cluster_id")
    val quality = Seq((1L, 5L), (2L, 9L), (3L, 9L), (10L, 4L), (11L, 4L))
      .toDF("doc_id", "quality")
    val got = Dedup.keepBest(clusters, quality, "doc_id", "quality")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // cluster 1: quality tie 9 between 2 and 3 → smallest id 2;
    // cluster 10: tie 4 between 10 and 11 → 10
    assert(got == Set((1L, 3L, 2L, 9L), (10L, 2L, 10L, 4L)))

    // a member with no quality row stays a MEMBER (left join), ranked
    // last — n_members is honest and the scored doc keeps
    val sparse = Dedup.keepBest(
        Seq((1L, 1L), (2L, 1L)).toDF("doc_id", "cluster_id"),
        Seq((2L, 7L)).toDF("doc_id", "quality"), "doc_id", "quality")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(sparse == Set((1L, 2L, 2L)))

    // duplicate doc_id rows in `quality` must not fan the join: n_members
    // stays the true cluster size and the keeper is the max-score argmax
    val dupQ = Seq((1L, 5L), (1L, 8L), (2L, 7L)).toDF("doc_id", "quality")
    val deduped = Dedup.keepBest(
        Seq((1L, 1L), (2L, 1L)).toDF("doc_id", "cluster_id"),
        dupQ, "doc_id", "quality")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(deduped == Set((1L, 2L, 1L, 8L)),
      "dup quality rows collapsed to max; n_members not inflated")
  }
}
