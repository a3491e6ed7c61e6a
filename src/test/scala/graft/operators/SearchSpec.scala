package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SearchSpec extends SparkSpec {
  import spark.implicits._

  private val terms = Seq("spark", "shuffle")

  test("termCountsExpr: one pass yields per-term tfs plus doc length") {
    val df = Seq(
      (1L, "spark shuffle spark"),
      (2L, "no matches here at all"),
      (3L, "SPARK Shuffle"), // lowercased before matching
      (4L, "")).toDF("id", "text")
    val rows = df.select($"id", Search.termCountsExpr($"text", terms).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(rows(1L) === Seq(2L, 1L, 3L))
    assert(rows(2L) === Seq(0L, 0L, 5L))
    assert(rows(3L) === Seq(1L, 1L, 2L))
    // split(trim("")) yields one empty token — documented, matches DuckDB
    assert(rows(4L) === Seq(0L, 0L, 1L))
  }

  test("bm25TopK: matches a hand-computed score on a fixed corpus") {
    // 4 docs, dl=4 each so avgdl=4 and the length norm collapses to 1:
    // tf_norm = tf*2.25/(tf+1.25), idf(t) = (4-df+0.5)/(df+0.5)
    val df = Seq(
      (1L, "spark spark spark spark"),   // tf(spark)=4
      (2L, "spark shuffle x y"),         // tf=1 each
      (3L, "shuffle a b c"),             // tf(shuffle)=1
      (4L, "nothing to see here")).toDF("doc_id", "text")
    val out = Search.bm25TopK(df, "doc_id", "text", terms, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def q(idf: Double, tf: Double) = math.floor(idf * (tf * 2.25 / (tf + 1.25)) * 1e6).toLong
    val idfSpark = (4 - 2 + 0.5) / (2 + 0.5)   // df(spark)=2
    val idfShuffle = (4 - 2 + 0.5) / (2 + 0.5) // df(shuffle)=2
    val expected = Map(
      1L -> (q(idfSpark, 4), 1L),
      2L -> (q(idfSpark, 1) + q(idfShuffle, 1), 2L),
      3L -> (q(idfShuffle, 1), 1L))
    assert(out.map(r => r._1 -> ((r._2, r._3))).toMap === expected)
    // doc 4 matches nothing and is absent; doc 2 ranks first — two matched
    // terms (2·900k) beat one term at tf=4 (tf saturation: 4·2.25/5.25 ≈
    // 1.71 of a single hit's weight), exactly BM25's diminishing-returns
    // contract
    assert(out.map(_._1).toSeq === Seq(2L, 1L, 3L))
  }

  test("bm25TopK: rarer terms out-score common ones at equal tf") {
    val docs = (1L to 20L).map(i => (i, if (i <= 1) "rare common" else "common filler"))
      .toDF("doc_id", "text")
    val out = Search.bm25TopK(docs, "doc_id", "text", Seq("rare", "common"), topK = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // doc 1 holds the only 'rare' hit -> strictly highest score
    assert(out.head._1 === 1L)
    assert(out.head._2 > out(1)._2)
  }

  test("tfidfTopTerms: rare terms rank above ubiquitous ones, k bounds per doc") {
    // 'the' appears in every doc (df=3 -> idf=1); each doc's unique term
    // has df=1 -> idf=2: unique terms must rank first despite equal tf
    val docs = Seq(
      (1L, "the aardvark the"),
      (2L, "the banana"),
      (3L, "the cherry the cherry")).toDF("doc_id", "text")
    val out = Search.tfidfTopTerms(docs, "doc_id", "text", k = 1)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out === Map(1L -> "aardvark", 2L -> "banana", 3L -> "cherry"))
    val all = Search.tfidfTopTerms(docs, "doc_id", "text", k = 2)
    assert(all.groupBy("doc_id").count().collect().forall(_.getLong(1) <= 2))
  }

  test("phraseSearch: counts exact occurrences incl. overlaps from the index") {
    val docs = Seq(
      (1L, "a b a b a"),     // 'a b a' occurs at 0 and 2 (overlapping)
      (2L, "a b c"),          // no 'a b a'
      (3L, "x a b a y"),      // one occurrence
      (4L, "A B A")           // case-folded -> one occurrence
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("inv_idx").toString
    Search.writeInvertedIndex(docs, "doc_id", "text", dir)
    val hits = Search.phraseSearch(spark, dir, "doc_id", Seq("a", "b", "a"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits === Map(1L -> 2L, 3L -> 1L, 4L -> 1L))
    // single-token phrase degenerates to term lookup with tf
    val one = Search.phraseSearch(spark, dir, "doc_id", Seq("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one === Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("rrfFuse: agreement wins — a doc on both lists beats single-list docs at every rank") {
    import spark.implicits._
    // doc 100 is rank 3 on both lists; docs 1-2 / 11-12 lead one list each
    val lex = Seq((1L, 1L), (2L, 2L), (100L, 3L)).toDF("doc_id", "rank")
    val sem = Seq((11L, 1L), (12L, 2L), (100L, 3L)).toDF("doc_id", "rank")
    val out = Search.rrfFuse(Seq(lex, sem), k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.head._1 === 100L, s"expected the both-lists doc first, got ${out.head}")
    assert(out.head._3 === 2L)
    // 2/(60+3) > 1/(60+1): agreement at rank 3 beats a single rank-1
    assert(out.head._2 === 2 * (1000000000000L / 63))
    assert(out.tail.forall(_._3 === 1L))
    // ranks tie (1 beats 2), ids break ties
    assert(out.map(_._1).toSeq === Seq(100L, 1L, 11L, 2L, 12L))
  }

  test("groupSplit: groups never straddle splits and assignment is layout-invariant") {
    val docs = graft.Tables.documents(spark, sfDir)
    val out = Sampling.groupSplit(docs, "source",
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
    val perGroup = out.groupBy("source").agg(countDistinct("split").as("k"))
      .collect().map(_.getLong(1))
    assert(perGroup.forall(_ === 1L), "a source straddled two splits")
    val a = out.select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.groupSplit(docs.repartition(7), "source",
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
  }
}
