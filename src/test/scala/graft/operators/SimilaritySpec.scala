package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val embs = Tables.embeddings(spark, sfDir)
  private lazy val queries = embs.filter($"vec_id" < 20)

  test("quantizedDot matches a manual computation") {
    val df = Seq(
      (1L, Seq(0.5f, -0.25f, 0.0f)),
      (2L, Seq(1.0f, 0.5f, -1.0f))
    ).toDF("vec_id", "embedding")
    val a = df.filter($"vec_id" === 1).select($"embedding".as("ea"))
    val b = df.filter($"vec_id" === 2).select($"embedding".as("eb"))
    val got = a.crossJoin(b)
      .select(Similarity.quantizedDot($"ea", $"eb").as("q")).head().getLong(0)
    // floor(0.5e6)*floor(1e6) + floor(-0.25e6)*floor(0.5e6) + floor(0)*floor(-1e6)
    val expected = 500000L * 1000000L + -250000L * 500000L + 0L * -1000000L
    assert(got === expected)
  }

  test("native QuantizedDot expression equals the HOF reference on real embeddings") {
    val a = embs.select($"vec_id".as("id_a"), $"embedding".as("ea")).limit(50)
    val b = embs.select($"vec_id".as("id_b"), $"embedding".as("eb")).limit(50)
    val both = a.crossJoin(b)
      .select(
        Similarity.quantizedDot($"ea", $"eb").as("native"),
        Similarity.quantizedDotHof($"ea", $"eb").as("hof"))
    assert(both.filter($"native" =!= $"hof").count() === 0)
    // codegen actually engaged for the native form: a projection of ONLY
    // quantized_dot sits inside a WholeStageCodegen span (starred in the
    // final plan). The HOF form can't — higher-order functions are
    // CodegenFallback, which is exactly why the native expression exists.
    val nativeOnly = a.crossJoin(b).select(Similarity.quantizedDot($"ea", $"eb").as("q"))
    val qe = nativeOnly.queryExecution
    nativeOnly.collect()
    val projLine = qe.executedPlan.toString.linesIterator
      .find(_.contains("quantizeddot")).getOrElse("")
    assert(projLine.contains("*("), s"native projection not codegen'd: $projLine")
  }

  test("brute-force top-k is exact, self-free, and correctly ranked") {
    val out = Similarity.bruteForceTopK(embs, queries, k = 5).collect()
    assert(out.length === 20 * 5)
    assert(!out.exists(r => r.getLong(0) == r.getLong(2)), "no self-pairs")
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        "sim non-increasing in rank")
    }
  }

  test("LSH ANN recall@5 vs brute force is usable at 16 tables × 4 bits") {
    val brute = Similarity.bruteForceTopK(embs, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = Similarity.lshTopK(embs, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    info(f"LSH recall@5 = $recall%.3f (candidates vs 500-vector corpus)")
    assert(recall >= 0.5, f"recall@5 $recall%.3f below floor")
  }

  test("IVF ANN recall@5 vs brute force is usable at 16 clusters × 4 probes") {
    val brute = Similarity.bruteForceTopK(embs, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Similarity.ivfTopK(embs, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    info(f"IVF recall@5 = $recall%.3f")
    assert(recall >= 0.3, f"recall@5 $recall%.3f below floor")
  }

  test("PQ ANN recall@5 vs brute force is usable after exact re-rank") {
    val brute = Similarity.bruteForceTopK(embs, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val pq = Similarity.pqTopK(embs, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute & pq).size.toDouble / brute.size
    info(f"PQ recall@5 = $recall%.3f")
    assert(recall >= 0.3, f"recall@5 $recall%.3f below floor")
  }

  test("IVFPQ recall@5 vs brute force is usable at default knobs") {
    val brute = Similarity.bruteForceTopK(embs, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val got = Similarity.ivfPqTopK(embs, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute & got).size.toDouble / brute.size
    info(f"IVFPQ recall@5 = $recall%.3f")
    // compounds IVF's probe miss with PQ's quantization noise — floor is
    // intentionally below either alone
    assert(recall >= 0.2, f"recall@5 $recall%.3f below floor")
  }

  test("PQ codes are complete and deterministic across layouts") {
    val subs = Similarity.pqSubvectors(embs, m = 8, dim = 64)
    val cb = Similarity.pqCodebooks(embs, m = 8, ksub = 16, iters = 2, dim = 64)
    val codes = Similarity.pqAssign(subs, cb)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    // every vector gets exactly one code per subspace
    val n = embs.count()
    assert(codes.size === n * 8)
    assert(codes.groupBy(c => (c._1, c._2)).forall(_._2.size == 1))
    val again = Similarity.pqAssign(
        Similarity.pqSubvectors(embs.repartition(7), m = 8, dim = 64),
        Similarity.pqCodebooks(embs.repartition(3), m = 8, ksub = 16, iters = 2, dim = 64))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(again === codes)
    // the map-side inlined-codebook form assigns the identical codes
    val mapSide = Similarity.pqAssignQ(
        Similarity.quantizeCorpus(embs), cb, m = 8, dim = 64)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(mapSide === codes)
    // and its plan is shuffle-free: no exchange below the scan projection
    val plan = Similarity.pqAssignQ(Similarity.quantizeCorpus(embs), cb, 8, 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"map-side assign should not shuffle:\n$plan")
  }

  test("JL projection: copies project identically; neighbourhoods survive 64→16") {
    val proj = Similarity.randomProject(embs, outDim = 16)
    // rebuild arrays, then projected-space brute top-5
    // projected components are ~1e12-scale longs — rescale to ~1e6
    // before dotting or the products overflow (see randomProject doc)
    val pv = proj.groupBy("vec_id")
      .agg(transform(array_sort(collect_list(struct($"dim", $"value_q"))),
        x => floor(x.getField("value_q").cast("double") / 1000000.0d)
          .cast("long")).as("pv"))
    val a = pv.select($"vec_id".as("q_id"), $"pv".as("qa"))
    val b = pv.select($"vec_id".as("n_id"), $"pv".as("nb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(desc("sim"), $"n_id")
    val projTop = a.filter($"q_id" < 20).crossJoin(b)
      .filter($"q_id" =!= $"n_id")
      .withColumn("sim", Similarity.dotQVec($"qa", $"nb"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select("q_id", "n_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.bruteForceTopK(embs, embs.filter($"vec_id" < 20), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute & projTop).size.toDouble / brute.size
    info(f"JL 64->16 neighbourhood recall@5 = $recall%.3f (chance = 0.01)")
    // near-orthogonal random testdata is JL's WORST case: top-5 cosines
    // ≈ 0.3 vs ±0.25 distortion at 16 dims, so absolute recall is low by
    // construction (measured 0.10 — 10× above the 5/500 chance level).
    // The floor pins "structure survives well above chance"; real
    // clustered corpora preserve far more, and production flows re-rank
    // in full dim anyway (as SQ8 does)
    assert(recall >= 0.05, f"recall $recall%.3f not above chance")
    // exact copies project exactly equally (pure integer arithmetic)
    val p0 = proj.filter($"vec_id" === 0).orderBy("dim")
      .collect().map(_.getLong(2)).toSeq
    val copy = embs.filter($"vec_id" === 0).withColumn("vec_id", lit(77777L))
    val p1 = Similarity.randomProject(copy, outDim = 16).orderBy("dim")
      .collect().map(_.getLong(2)).toSeq
    assert(p0 === p1)
  }

  test("SQ8 ANN recall@5 vs brute force is near-exact after re-rank") {
    val qs = embs.filter($"vec_id" < 20)
    val brute = Similarity.bruteForceTopK(embs, qs, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val sq8 = Similarity.sq8TopK(embs, qs, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute & sq8).size.toDouble / brute.size
    info(f"SQ8 recall@5 = $recall%.3f")
    // int8 keeps ~7 bits of each component: far tighter than PQ codes
    assert(recall >= 0.9, f"recall@5 $recall%.3f below floor")
  }

  test("SQ8-within-IVF recall@5 tracks the IVF probe ceiling") {
    val qs = embs.filter($"vec_id" < 20)
    val brute = Similarity.bruteForceTopK(embs, qs, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Similarity.ivfTopK(embs, qs, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val composed = Similarity.ivfSq8TopK(embs, qs, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute & composed).size.toDouble / brute.size
    val ivfRecall = (brute & ivf).size.toDouble / brute.size
    info(f"IVF+SQ8 recall@5 = $recall%.3f (IVF alone $ivfRecall%.3f)")
    // pruning decides recall; int8 scoring within the probed lists
    // gives back nearly everything the probes admit
    assert(recall >= ivfRecall - 0.05,
      f"composed recall $recall%.3f fell below the IVF ceiling $ivfRecall%.3f")
    assert(recall >= 0.7, f"recall@5 $recall%.3f below floor")
  }

  test("persisted IVFPQ index round-trips: indexed query == direct ivfPqTopK") {
    val dir = java.nio.file.Files.createTempDirectory("ann_index_spec").toString
    Similarity.writeIvfPqIndex(embs, dir)
    val qs = embs.filter($"vec_id" < 10)
    val direct = Similarity.ivfPqTopK(embs, qs, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val indexed = Similarity.ivfPqTopKIndexed(qs, dir, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(indexed === direct)
    // the deployment point: the persisted model is broadcast-sized and the
    // compressed corpus is m codes/vector
    assert(spark.read.parquet(s"$dir/centroids").count() <= 16L)
    assert(spark.read.parquet(s"$dir/codes").count() === embs.count() * 8)
  }

  test("index append: planted copies are immediately the top-1 neighbour") {
    val dir = java.nio.file.Files.createTempDirectory("ann_append_spec").toString
    Similarity.writeIvfPqIndex(embs, dir)
    // "today's batch": exact copies of the first 10 vectors under new ids
    val copies = embs.filter($"vec_id" < 10)
      .withColumn("vec_id", $"vec_id" + 100000)
    Similarity.appendToIvfPqIndex(copies, dir)
    // an identical vector lands in the same cluster with the same codes,
    // tops the ADC shortlist, and wins the exact re-rank at sim ≈ 1e12
    val top1 = Similarity.ivfPqTopKIndexed(embs.filter($"vec_id" < 10), dir, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(top1.length === 10)
    top1.foreach { case (qId, nId, sim) =>
      assert(nId === qId + 100000, s"q$qId top-1 was $nId, not its planted copy")
      assert(sim >= 990000000000L, s"q$qId copy sim $sim below ~1e12")
    }
  }

  test("index lifecycle degenerate inputs: tiny corpus, empty append, oversized k") {
    // corpus smaller than nClusters/ksub: k-means degrades to one
    // cluster per vector instead of failing
    val tiny = embs.filter($"vec_id" < 5)
    val dir = java.nio.file.Files.createTempDirectory("ann_tiny_spec").toString
    Similarity.writeIvfPqIndex(tiny, dir)
    // an empty batch append is a no-op, not an error
    Similarity.appendToIvfPqIndex(tiny.filter($"vec_id" < 0), dir)
    // k larger than the corpus returns every available neighbour (4:
    // self excluded), ranked
    val out = Similarity.ivfPqTopKIndexed(tiny, dir, k = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).distinct.length === 5)
    out.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.length <= 4, s"q$q returned ${rows.length} > 4 neighbours")
      assert(!rows.exists(_._3 == q), s"q$q returned itself")
    }
  }

  test("index health trips on a shifted append and rebuildIfStale re-trains") {
    val dir = java.nio.file.Files.createTempDirectory("ann_health_spec").toString
    val base = embs.select("vec_id", "embedding")
    val baseN = base.count()
    Similarity.writeIvfPqIndex(base, dir)
    val fresh = Similarity.indexHealth(spark, dir)
    assert(fresh.appendFraction === 0.0, fresh)
    assert(fresh.baseTotal === baseN, fresh)
    // a healthy build over ~uniform data: nothing trips, nothing rewrites
    assert(!Similarity.rebuildIfStale(base, dir), s"fresh index flagged stale: $fresh")

    // "the distribution moved": a same-size batch of DIVERSE vectors
    // pushed hard along e1 — under the old model the +4 on the first
    // component dominates every centroid dot, so the batch piles into
    // the max-e1 list(s). Batch ids sit BELOW the base ids so the
    // deterministic smallest-id training sample seeds inside the new
    // mass on rebuild (the operational analogue: a rebuild whose
    // training set ignores the drifted region can't fix the skew).
    val shifted = base
      .select(($"vec_id" - 100000).as("vec_id"),
        transform($"embedding",
          (x, i) => when(i === 0, x + lit(4.0f)).otherwise(x).cast("float"))
          .as("embedding"))
    Similarity.appendToIvfPqIndex(shifted, dir)
    val drifted = Similarity.indexHealth(spark, dir)
    assert(drifted.appendFraction >= 0.49 && drifted.appendFraction <= 0.51, drifted)
    assert(drifted.skewRatio > 4.0,
      s"piled-up list should dominate the mean: $drifted")

    // the trigger: re-trains on the CURRENT corpus, stamp resets
    val corpusNow = base.select("vec_id", "embedding")
      .unionByName(shifted.select("vec_id", "embedding"))
    assert(Similarity.rebuildIfStale(corpusNow, dir))
    val rebuilt = Similarity.indexHealth(spark, dir)
    assert(rebuilt.appendFraction === 0.0, rebuilt)
    assert(rebuilt.total === 2 * baseN, rebuilt)
    // and the rebuilt MODEL has actually seen the new mass: the batch
    // ids are the smallest, so the retrained seeds come from inside it
    // (the old model's centroids were all base ids). Skew itself is not
    // guaranteed to improve in one rebuild — k-means keeps identical-
    // looking far points under one centroid — which is exactly why the
    // trigger measures and re-measures instead of assuming.
    val rebuiltCents = spark.read.parquet(s"$dir/centroids")
      .select("cluster").collect().map(_.getInt(0)).toSet
    assert(rebuiltCents.forall(_ < -99000),
      s"rebuilt seeds should come from the drifted batch: $rebuiltCents")
  }

  test("IVF clustering is deterministic") {
    val a = Similarity.ivfCentroids(embs, 8, 2).collect()
      .map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val b = Similarity.ivfCentroids(embs, 8, 2).collect()
      .map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(a.keySet === b.keySet)
    a.keys.foreach(k => assert(a(k) === b(k), s"cluster $k"))
  }

  test("LSH near-dup path equals the brute-force path at the copy threshold, without a cross join") {
    val corpus = embs.select("vec_id", "embedding").unionByName(
      embs.select("vec_id", "embedding").filter($"vec_id" % 50 === 0)
        .withColumn("vec_id", $"vec_id" + 100000))
    val brute = Similarity.nearDupPairs(corpus, tauQ = 900000000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val lshDf = Similarity.nearDupPairsLsh(corpus, tauQ = 900000000000L)
    val lsh = lshDf.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(lsh === brute, "bucketed output must be deterministically complete for exact copies")
    // the point of the scale path: candidates come from an equi-join on
    // (table, bucket) — the plan must contain no all-pairs join
    val plan = lshDf.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"LSH near-dup plan contains an all-pairs join:\n$plan")
  }

  test("transactional index: equals the dir index, atomic append, time travel exact") {
    import graft.sources.TxnCatalog
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val base = embs.filter($"vec_id" >= 10)
    val batch = embs.filter($"vec_id" < 10)
    // dir-backed ground truth (the already-oracled machinery)
    val dir = java.nio.file.Files.createTempDirectory("ann_txn_dir").toString
    Similarity.writeIvfPqIndex(base, dir)
    val wantBefore = rows(Similarity.ivfPqTopKIndexed(batch, dir, k = 5))
    Similarity.appendToIvfPqIndex(batch, dir)
    val wantAfter = rows(Similarity.ivfPqTopKIndexed(batch, dir, k = 5))

    val cat = "/root/repo/target/tmp/spec_ann_txn_cat"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(cat))
    val t1 = Similarity.writeIvfPqIndexTxn(spark, base, cat)
    assert(rows(Similarity.ivfPqTopKIndexedTxn(spark, batch, cat, k = 5))
      == wantBefore, "txn index must equal the dir index before append")
    val t2 = Similarity.appendToIvfPqIndexTxn(spark, batch, cat)
    assert(t2 == t1 + 1, "append is ONE catalog txn across all three tables")
    assert(rows(Similarity.ivfPqTopKIndexedTxn(spark, batch, cat, k = 5))
      == wantAfter, "txn index must equal the dir index after append")
    // time travel: searching AS OF the pre-append txn reproduces the
    // pre-append answer exactly, even though the head index moved on
    assert(rows(Similarity.ivfPqTopKIndexedTxn(spark, batch, cat, k = 5,
      asOf = Some(t1))) == wantBefore)
    // health reads from the same snapshots: fresh at t1, appendFraction
    // = |batch|/|base| at head, and AS OF t1 it is fresh again — the
    // rebuild decision time-travels with the index it measures
    val baseN = base.count(); val batchN = batch.count()
    val hHead = Similarity.indexHealthTxn(spark, cat)
    assert(hHead.baseTotal == baseN && hHead.total == baseN + batchN, hHead)
    assert(math.abs(hHead.appendFraction -
      batchN.toDouble / (baseN + batchN)) < 1e-9, hHead)
    val hT1 = Similarity.indexHealthTxn(spark, cat, asOf = Some(t1))
    assert(hT1.appendFraction == 0.0 && hT1.total == baseN, hT1)
    // the catalog snapshot is consistent per txn: lists and vectors
    // agree on membership at BOTH versions (no vector without codes)
    for (t <- Seq(t1, t2)) {
      val l = TxnCatalog.read(spark, cat, "lists", Some(t))
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val v = TxnCatalog.read(spark, cat, "vectors", Some(t))
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(l == v, s"lists/vectors disagree at txn $t")
    }
  }

  test("transactional index: tombstone deletes are versioned and compacted by rebuild") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batch = embs.filter($"vec_id" < 10)
    val cat = "/root/repo/target/tmp/spec_ann_del_cat"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(cat))
    val t1 = Similarity.writeIvfPqIndexTxn(spark, embs, cat)
    val before = rows(Similarity.ivfPqTopKIndexedTxn(spark, batch, cat, k = 5))
    // delete every non-query neighbour in the pre-delete top-5 — the
    // post-delete answer MUST differ, not merely may
    val deadIds = before.map(_._3).filter(_ >= 10)
    assert(deadIds.nonEmpty)
    Similarity.deleteFromIvfPqIndexTxn(spark,
      deadIds.toSeq.toDF("vec_id"), cat)
    val after = rows(Similarity.ivfPqTopKIndexedTxn(spark, batch, cat, k = 5))
    assert(after.map(_._3).intersect(deadIds).isEmpty,
      "a tombstoned id must never be returned")
    assert(after != before)
    // each query still finds a full k=5 from the surviving corpus
    assert(after.groupBy(_._1).forall(_._2.size == 5), after.size.toString)
    // versioned: AS OF the build txn the deleted vectors are still found
    assert(rows(Similarity.ivfPqTopKIndexedTxn(spark, batch, cat, k = 5,
      asOf = Some(t1))) == before)
    // health: deleteFraction counts head markers; as-of t1 it is clean
    val h = Similarity.indexHealthTxn(spark, cat)
    assert(math.abs(h.deleteFraction - deadIds.size.toDouble / h.total) < 1e-9, h.toString)
    assert(Similarity.indexHealthTxn(spark, cat, asOf = Some(t1))
      .deleteFraction == 0.0)
    // compaction trigger: below the delete threshold nothing happens…
    val live = embs.filter(!$"vec_id".isin(deadIds.toSeq.map(Long.box): _*))
    assert(!Similarity.rebuildTxnIfStale(spark, live, cat,
      maxSkewRatio = 1e9, maxAppendFraction = 1e9,
      maxDeleteFraction = h.deleteFraction + 0.01))
    assert(Similarity.indexHealthTxn(spark, cat).deleteFraction > 0)
    // …past it the rebuild IS the compaction: markers cleared, deleted
    // ids stay gone because they left the rebuild corpus
    assert(Similarity.rebuildTxnIfStale(spark, live, cat,
      maxSkewRatio = 1e9, maxAppendFraction = 1e9,
      maxDeleteFraction = h.deleteFraction / 2))
    val h2 = Similarity.indexHealthTxn(spark, cat)
    assert(h2.deleteFraction == 0.0, h2.toString)
    val rebuilt = rows(Similarity.ivfPqTopKIndexedTxn(spark, batch, cat, k = 5))
    assert(rebuilt.map(_._3).intersect(deadIds).isEmpty)
  }

  test("txn upsert: shadow, revive, upsert-again, delete-after-upsert; rebuild compacts") {
    def top1(df: org.apache.spark.sql.DataFrame) = df.filter($"rank" === 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // an upsert batch: ids re-defined to EXACT copies of a query vector
    // — the unambiguous assertion (top-1 at sim ≈ 1e12)
    def copyOf(qid: Long, asId: Long) = embs.filter($"vec_id" === qid)
      .withColumn("vec_id", lit(asId))
    val batch = embs.filter($"vec_id" < 10)
    val cat = "/root/repo/target/tmp/spec_ann_upsert_cat"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(cat))
    val t1 = Similarity.writeIvfPqIndexTxn(spark, embs, cat)
    val before = pairs(Similarity.ivfPqTopKIndexedTxn(spark, batch, cat, k = 5))
    // delete 42, then REVIVE it via upsert (insert→delete→reinsert),
    // and CORRECT the live 57 — both redefined as exact query copies
    Similarity.deleteFromIvfPqIndexTxn(spark, Seq(42L).toDF("vec_id"), cat)
    val t2 = graft.sources.TxnCatalog.currentTxn(cat)
    val afterDel = pairs(Similarity.ivfPqTopKIndexedTxn(spark, batch, cat, k = 5))
    assert(!afterDel.exists(_._3 == 42L))
    Similarity.upsertIntoIvfPqIndexTxn(spark,
      copyOf(3L, 42L).unionByName(copyOf(5L, 57L)), cat)
    val t3 = graft.sources.TxnCatalog.currentTxn(cat)
    val up1 = Similarity.ivfPqTopKIndexedTxn(spark, batch, cat, k = 5)
    val up1Top = top1(up1)
    assert(up1Top(3L)._1 == 42L && up1Top(3L)._2 >= 990000000000L,
      s"revived 42 must be q3's exact-copy top-1: ${up1Top(3L)}")
    assert(up1Top(5L)._1 == 57L && up1Top(5L)._2 >= 990000000000L,
      s"corrected 57 must be q5's exact-copy top-1: ${up1Top(5L)}")
    // upsert-again: 42 re-redefined as a copy of q7 — newest gen wins
    Similarity.upsertIntoIvfPqIndexTxn(spark, copyOf(7L, 42L), cat)
    val up2Top = top1(Similarity.ivfPqTopKIndexedTxn(spark, batch, cat, k = 5))
    assert(up2Top(7L)._1 == 42L && up2Top(7L)._2 >= 990000000000L)
    assert(up2Top(3L)._1 != 42L || up2Top(3L)._2 < 990000000000L,
      "the older generation of 42 must be shadowed")
    // delete AFTER upsert kills the delta row (and base stays dead)
    Similarity.deleteFromIvfPqIndexTxn(spark, Seq(57L).toDF("vec_id"), cat)
    val afterDel2 = pairs(Similarity.ivfPqTopKIndexedTxn(spark, batch, cat, k = 5))
    assert(!afterDel2.exists(_._3 == 57L), "deleted-after-upsert id returned")
    // as-of pins: every historical stage is exact
    assert(pairs(Similarity.ivfPqTopKIndexedTxn(spark, batch, cat, k = 5,
      asOf = Some(t1))) == before)
    assert(pairs(Similarity.ivfPqTopKIndexedTxn(spark, batch, cat, k = 5,
      asOf = Some(t2))) == afterDel)
    assert(pairs(Similarity.ivfPqTopKIndexedTxn(spark, batch, cat, k = 5,
      asOf = Some(t3))) == pairs(up1))
    // health: deltaFraction counts distinct upserted ids; the rebuild
    // folds the corrections into the base and clears the overlay
    val h = Similarity.indexHealthTxn(spark, cat)
    assert(h.deltaFraction > 0.0, h.toString)
    val corrected = embs.filter($"vec_id" =!= 42L && $"vec_id" =!= 57L)
      .unionByName(copyOf(7L, 42L))
    assert(Similarity.rebuildTxnIfStale(spark, corrected, cat,
      maxSkewRatio = 1e9, maxAppendFraction = 1e9, maxDeleteFraction = 1e9,
      maxDeltaFraction = h.deltaFraction / 2))
    val h2 = Similarity.indexHealthTxn(spark, cat)
    assert(h2.deltaFraction == 0.0 && h2.deleteFraction == 0.0, h2.toString)
    val rebuiltTop = top1(Similarity.ivfPqTopKIndexedTxn(spark, batch, cat, k = 5))
    assert(rebuiltTop(7L)._1 == 42L && rebuiltTop(7L)._2 >= 990000000000L,
      "the folded-in correction must survive the rebuild")
    // a post-rebuild upsert keeps working against the cleared overlay
    Similarity.upsertIntoIvfPqIndexTxn(spark, copyOf(2L, 99L), cat)
    val again = top1(Similarity.ivfPqTopKIndexedTxn(spark, batch, cat, k = 5))
    assert(again(2L)._1 == 99L && again(2L)._2 >= 990000000000L)
  }

  test("upsert overlay routes by table name: a meta column named 'cluster' cannot mis-route") {
    // the overlay once inferred the delta table from base COLUMN NAMES —
    // metadata carrying a column named 'cluster' or 'code' would join
    // dmeta against dlists winners. Pin the by-name routing.
    val corpus = embs.withColumnRenamed("label", "cluster")
    val cat = "/root/repo/target/tmp/spec_ann_metaclash_cat"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(cat))
    Similarity.writeIvfPqIndexTxn(spark, corpus, cat)
    Similarity.upsertIntoIvfPqIndexTxn(spark,
      corpus.filter($"vec_id" === 3L).withColumn("vec_id", lit(77L)), cat)
    val eligible = corpus.filter($"cluster" % 2 === 0)
      .select("vec_id").as[Long].collect().toSet + 77L
    val got = Similarity.ivfPqTopKIndexedTxn(spark,
        corpus.filter($"vec_id" < 10), cat, k = 5, nprobe = 8,
        predicate = Some((col("cluster") % 2 === 0) || col("vec_id") === 77L))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.nonEmpty && got.forall(p => eligible(p._2)), got.take(5).toSeq)
    // …and a schema-poor upsert batch is refused AT the mutation, not
    // at some later filtered search's unionByName
    val e = intercept[IllegalArgumentException] {
      Similarity.upsertIntoIvfPqIndexTxn(spark,
        corpus.filter($"vec_id" === 4L).select("vec_id", "embedding"), cat)
    }
    assert(e.getMessage.contains("meta"), e.getMessage)
  }

  test("filtered ANN: predicate prunes candidate generation, recall vs filtered brute force") {
    val dir = java.nio.file.Files.createTempDirectory("ann_filter_spec").toString
    Similarity.writeIvfPqIndex(embs, dir)
    val qs = embs.filter($"vec_id" < 20)
    val pred = col("label") % 2 === 0
    val eligible = embs.filter(pred).select("vec_id").as[Long].collect().toSet
    // widened knobs: a ~50%-selective filter halves each probed list's
    // eligible population, so nprobe/rerank widen to keep k eligible
    // candidates in reach — the documented recovery lever
    val got = Similarity.ivfPqTopKIndexed(qs, dir, k = 5,
      nprobe = 8, rerank = 128, predicate = Some(pred))
    val rows = got.collect()
    // every returned neighbour satisfies the predicate
    assert(rows.forall(r => eligible(r.getLong(2))),
      "a returned neighbour violates the predicate")
    // PRE-filtering proof: every query still returns a FULL k=5 of
    // eligible neighbours — post-filtering a finished unfiltered top-5
    // would keep only the ~half that happened to pass (under-return)
    assert(rows.groupBy(_.getLong(0)).forall(_._2.length == 5),
      "filtered search must return k eligible results, not post-filter k")
    // recall vs FILTERED brute force (ground truth over eligible corpus)
    val truth = Similarity.bruteForceTopK(embs.filter(pred), qs, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val gotSet = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (truth & gotSet).size.toDouble / truth.size
    info(f"filtered IVFPQ recall@5 = $recall%.3f (nprobe=8, rerank=128)")
    assert(recall >= 0.4, f"filtered recall@5 $recall%.3f below floor")
    // plan: candidates come from a semi-join prune, never a cross join,
    // and the predicate is evaluated at the LISTS — before ADC/rerank
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(got.queryExecution.optimizedPlan.toString.contains("LeftSemi"),
      "the predicate must prune candidate generation via a semi-join")
  }

  test("filtered ANN on the txn index composes with tombstones and as-of") {
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val batch = embs.filter($"vec_id" < 10)
    val pred = col("label") % 2 === 0
    val cat = "/root/repo/target/tmp/spec_ann_filter_cat"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(cat))
    val t1 = Similarity.writeIvfPqIndexTxn(spark, embs, cat)
    val before = pairs(Similarity.ivfPqTopKIndexedTxn(spark, batch, cat,
      k = 5, nprobe = 8, rerank = 128, predicate = Some(pred)))
    val eligible = embs.filter(pred).select("vec_id").as[Long].collect().toSet
    assert(before.forall(p => eligible(p._2)))
    // tombstone some of the filtered answers: the filtered search must
    // now exclude BOTH the tombstones and the predicate-failers
    val dead = before.map(_._2).filter(_ >= 10)
    assert(dead.nonEmpty)
    Similarity.deleteFromIvfPqIndexTxn(spark, dead.toSeq.toDF("vec_id"), cat)
    val after = pairs(Similarity.ivfPqTopKIndexedTxn(spark, batch, cat,
      k = 5, nprobe = 8, rerank = 128, predicate = Some(pred)))
    assert(after.forall(p => eligible(p._2) && !dead(p._2)))
    // as-of the build txn: the tombstoned ids come back, the predicate
    // still applies (meta resolves from the same pinned snapshot)
    assert(pairs(Similarity.ivfPqTopKIndexedTxn(spark, batch, cat, k = 5,
      nprobe = 8, rerank = 128, asOf = Some(t1),
      predicate = Some(pred))) == before)
  }

  test("autoWiden recovers filtered recall from measured selectivity") {
    val dir = java.nio.file.Files.createTempDirectory("ann_widen_spec").toString
    Similarity.writeIvfPqIndex(embs, dir)
    val qs = embs.filter($"vec_id" < 20)
    val pred = col("label") % 8 === 0 // ~12.5% selective
    val truth = Similarity.bruteForceTopK(embs.filter(pred), qs, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      (truth & got).size.toDouble / truth.size
    }
    // deliberately starved knobs: the filter thins each probed list ~8×
    val narrow = Similarity.ivfPqTopKIndexed(qs, dir, k = 5,
      nprobe = 1, rerank = 8, predicate = Some(pred))
    val wide = Similarity.ivfPqTopKIndexed(qs, dir, k = 5,
      nprobe = 1, rerank = 8, predicate = Some(pred), autoWiden = true)
    val (rN, rW) = (recall(narrow), recall(wide))
    info(f"filtered recall: narrow=$rN%.3f autoWiden=$rW%.3f")
    assert(rW >= rN, "widening must never lose recall")
    assert(rW >= 0.5, f"auto-widened recall $rW%.3f below floor")
    assert(wide.collect().groupBy(_.getLong(0)).forall(_._2.length == 5),
      "auto-widened search must return a full k per query")
    // the knob arithmetic itself
    assert(Similarity.widenedKnobs(1, 8, 1000, 125, 32) == ((8, 64)))
    assert(Similarity.widenedKnobs(4, 64, 1000, 1000, 32) == ((4, 64)),
      "a non-selective predicate leaves the user's knobs untouched")
    assert(Similarity.widenedKnobs(4, 64, 1000, 3, 32)._1 == 32,
      "nprobe clamps to the cluster count")
    assert(Similarity.widenedKnobs(4, 64, 1000, 0, 32)._2 == 64 * 64,
      "empty eligible set: the 64x cap bounds the blowup")
  }

  test("correlated predicate: per-list adaptive probing recovers where global widening starves") {
    // a deterministic DOT LADDER of 10 blobs, 50 vectors each: blob 0
    // is 2·e0, blob j≥1 is e_j + γ_j·e0 with γ_j strictly decreasing,
    // so a blob-0 query's centroid-dot order is exactly blob order —
    // and ids go round-robin (id % 10 = blob) so the k-means seeds
    // (the 10 smallest ids) start one-per-blob and converge there.
    // Blobs 8 and 9 — the two FARTHEST from a blob-0 query — carry
    // label 'b': the predicate (label='b') is PERFECTLY correlated
    // with cluster assignment, the regime a single global widening
    // factor gets wrong: global selectivity says 20% (widen ×5), but
    // the query's 5 nearest lists are 'a' lists with ZERO eligible
    // vectors. Per-blob magnitudes (1 + 0.3u) make the within-blob
    // ranking strict.
    def vec(id: Long): Seq[Float] = {
      val blob = (id % 10).toInt
      val scale = 1.0f + 0.3f * (id / 10).toFloat / 50.0f
      (0 until 64).map { d =>
        val base =
          if (blob == 0) { if (d == 0) 2.0f else 0.0f }
          else if (d == blob) 1.0f
          else if (d == 0) 0.8f - 0.08f * blob
          else 0.0f
        base * scale
      }
    }
    val corpus = (0L until 500L)
      .map(i => (i, vec(i), if (i % 10 >= 8) "b" else "a"))
      .toDF("vec_id", "embedding", "label")
      .repartition(4).localCheckpoint(true)
    val dir = java.nio.file.Files.createTempDirectory("ann_corr_spec").toString
    Similarity.writeIvfPqIndex(corpus, dir, nClusters = 10)
    val qs = corpus.filter($"vec_id".isin(0L, 10L, 20L, 30L, 40L)) // blob-0 queries
    val pred = col("label") === "b"
    val truth = Similarity.bruteForceTopK(corpus.filter(pred), qs, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      (truth & got).size.toDouble / truth.size
    }
    // what the old GLOBAL widening would do: selectivity 100/500 → ×5,
    // nprobe 1→5, rerank 16→80 — probes 5 'a' lists, finds nothing
    val global = recall(Similarity.ivfPqTopKIndexed(qs, dir, k = 5,
      nprobe = 5, rerank = 80, predicate = Some(pred)))
    // adaptive: same user knobs, autoWiden measures per-list eligible
    // mass and deepens past the empty 'a' lists until 'b' mass covers
    // the window
    val adaptive = recall(Similarity.ivfPqTopKIndexed(qs, dir, k = 5,
      nprobe = 1, rerank = 16, predicate = Some(pred), autoWiden = true))
    info(f"correlated-predicate recall: global=$global%.3f adaptive=$adaptive%.3f")
    assert(adaptive > global,
      f"per-list probing must beat the global factor here: $adaptive%.3f <= $global%.3f")
    assert(adaptive >= 0.8, f"adaptive recall $adaptive%.3f below floor")
    // zero eligible rows: short-circuits to an empty result, never a
    // 64×-widened probe of a guaranteed-empty join
    assert(Similarity.ivfPqTopKIndexed(qs, dir, k = 5, nprobe = 1,
      rerank = 8, predicate = Some(lit(false)), autoWiden = true).isEmpty)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("filtered search evaluates the predicate on UPSERTED metadata") {
    val q3 = embs.filter($"vec_id" === 3L)
    val pred = col("label") % 2 === 0
    val cat = "/root/repo/target/tmp/spec_ann_filter_upsert_cat"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(cat))
    Similarity.writeIvfPqIndexTxn(spark, embs, cat)
    def top1(): (Long, Long) = {
      val r = Similarity.ivfPqTopKIndexedTxn(spark, q3, cat, k = 3,
        nprobe = 8, rerank = 128, predicate = Some(pred))
        .filter($"rank" === 1).head()
      (r.getLong(2), r.getLong(3))
    }
    // id 142 redefined as q3's EXACT vector copy but with an ODD label:
    // the perfect-similarity candidate must stay invisible — the
    // predicate reads the upserted row's NEW metadata, not the base's
    Similarity.upsertIntoIvfPqIndexTxn(spark,
      q3.withColumn("vec_id", lit(142L)).withColumn("label", lit(1)), cat)
    val (hid1, _) = top1()
    assert(hid1 != 142L,
      "an upserted-ineligible exact copy leaked through the filter")
    // newest generation wins: re-upsert 142 with an EVEN label — now it
    // is the eligible exact copy and must dominate the filtered top-1
    Similarity.upsertIntoIvfPqIndexTxn(spark,
      q3.withColumn("vec_id", lit(142L)).withColumn("label", lit(2)), cat)
    val (hid2, sim2) = top1()
    assert(hid2 == 142L && sim2 >= 990000000000L,
      s"eligible upserted exact copy must be top-1, got ($hid2, $sim2)")
  }

  test("rebalanceIvfPqTxn splits mega-lists: skew bounded, searches unchanged, overlay refused") {
    import graft.sources.TxnCatalog
    // the DRIFT shape, constructed exactly: the index trains on eight
    // one-hot "naturals" (dims 8..15, ids 5000+); a 160-vector blob
    // then APPENDS — appends assign against yesterday's centroids, the
    // blob's dims (0..4) are orthogonal to every centroid, so all 160
    // dot-tie to the smallest cluster id: one deterministic mega-list.
    // The blob carries four ORTHOGONAL sub-directions (4.0 at dim
    // 1 + id % 4 over a 10.0 dim-0 base), so sub-training has real
    // structure to find — all arithmetic exact under the 1e-6
    // quantization, no sampling anywhere.
    def oneHot(at: org.apache.spark.sql.Column, v: Float) =
      transform(sequence(lit(0), lit(63)), i =>
        when(i === at, lit(v)).otherwise(lit(0.0f)))
    val naturals = spark.range(0, 8).select(
      (col("id") + 5000L).as("vec_id"),
      oneHot(lit(8) + (col("id") % 8).cast("int"), 1.0f).as("embedding"))
    val blob = spark.range(1000, 1160).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), i =>
        when(i === 0, lit(10.0f))
          .when(i === lit(1) + (col("id") % 4).cast("int"), lit(4.0f))
          .otherwise(lit(0.0f))).as("embedding"))
    val cat = "/root/repo/target/tmp/spec_ann_rebalance"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(cat))
    Similarity.writeIvfPqIndexTxn(spark, naturals, cat, nClusters = 4,
      ksub = 4)
    Similarity.appendToIvfPqIndexTxn(spark, blob, cat)
    val h1 = Similarity.indexHealthTxn(spark, cat)
    assert(h1.skewRatio > 2.0, s"the appended blob must form a mega-list: $h1")
    // full-probe search results BEFORE (nprobe = every list ⇒ the PQ
    // rerank over the whole corpus — list boundaries cancel out)
    val queries = naturals.limit(5)
    def full(np: Int) = Similarity
      .ivfPqTopKIndexedTxn(spark, queries, cat, k = 5, nprobe = np)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val before = full(h1.nLists)

    val split = Similarity.rebalanceIvfPqTxn(spark, cat, maxListFactor = 2.0,
      subK = 4)
    assert(split == 1, s"exactly the mega-list splits, got $split")
    val h2 = Similarity.indexHealthTxn(spark, cat)
    assert(h2.total == h1.total, "rebalance moves rows, never loses them")
    assert(h2.nLists > h1.nLists)
    assert(h2.skewRatio < h1.skewRatio * 0.75,
      s"max-list/mean must drop: ${h1.skewRatio} -> ${h2.skewRatio}")
    // structural integrity: every vector in exactly one list, every
    // list's cluster id resolved by exactly one centroid
    val lists = TxnCatalog.read(spark, cat, "lists", None)
    assert(lists.count() == lists.select("vec_id").distinct().count())
    val cents = TxnCatalog.read(spark, cat, "centroids", None)
    assert(cents.select("cluster").distinct().count() == cents.count())
    assert(lists.join(cents, "cluster").count() == lists.count(),
      "every assignment must reference a live centroid")
    // the full-probe answer is unchanged — splitting list boundaries
    // must never change WHAT the index can return
    assert(full(h2.nLists) == before)
    // healthy now: a second pass is a no-op, no txn committed
    val t = TxnCatalog.currentTxn(cat)
    assert(Similarity.rebalanceIvfPqTxn(spark, cat, maxListFactor = 2.0) == 0)
    assert(TxnCatalog.currentTxn(cat) == t)
    // an upsert overlay refuses: its dlists rows were assigned against
    // the old centroids and a split would orphan them from every probe
    Similarity.upsertIntoIvfPqIndexTxn(spark,
      embs.limit(1).select("vec_id", "embedding"), cat)
    val e = intercept[IllegalArgumentException] {
      Similarity.rebalanceIvfPqTxn(spark, cat, maxListFactor = 2.0)
    }
    assert(e.getMessage.contains("overlay"), e.getMessage)
  }

  test("rebalance allocates fresh ids past EMPTY centroids too (no id collision)") {
    import graft.sources.TxnCatalog
    import graft.sources.TxnCatalog.Write
    // same drift shape as above: one deterministic mega-list
    def oneHot(at: org.apache.spark.sql.Column, v: Float) =
      transform(sequence(lit(0), lit(63)), i =>
        when(i === at, lit(v)).otherwise(lit(0.0f)))
    val naturals = spark.range(0, 8).select(
      (col("id") + 5000L).as("vec_id"),
      oneHot(lit(8) + (col("id") % 8).cast("int"), 1.0f).as("embedding"))
    val blob = spark.range(1000, 1160).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), i =>
        when(i === 0, lit(10.0f))
          .when(i === lit(1) + (col("id") % 4).cast("int"), lit(4.0f))
          .otherwise(lit(0.0f))).as("embedding"))
    val cat = "/root/repo/target/tmp/spec_ann_rebalance_empty"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(cat))
    Similarity.writeIvfPqIndexTxn(spark, naturals, cat, nClusters = 4,
      ksub = 4)
    Similarity.appendToIvfPqIndexTxn(spark, blob, cat)
    // k-means can leave a centroid MEMBERLESS; simulate the worst case:
    // its id exceeds every LISTED id, so a lists-only max would hand
    // the first fresh sub-cluster the same id — duplicate centroid ids,
    // ambiguous probes. The empty centroid points far from every query.
    val cents0 = TxnCatalog.read(spark, cat, "centroids", None)
    val maxListed = TxnCatalog.read(spark, cat, "lists", None)
      .agg(max(col("cluster"))).head().getInt(0)
    val emptyId = maxListed + 7
    val emptyCq: Seq[Long] = Seq.tabulate(64)(i => if (i == 30) 1000000L else 0L)
    TxnCatalog.commitAll(spark, cat, Seq(Write("centroids",
      cents0.unionByName(Seq((emptyId, emptyCq)).toDF("cluster", "cq")),
      overwrite = true)))
    val queries = naturals.limit(5)
    def full() = {
      val np = TxnCatalog.read(spark, cat, "centroids", None).count().toInt
      Similarity.ivfPqTopKIndexedTxn(spark, queries, cat, k = 5, nprobe = np)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    val before = full()
    assert(Similarity.rebalanceIvfPqTxn(spark, cat, maxListFactor = 2.0,
      subK = 4) == 1)
    val cents = TxnCatalog.read(spark, cat, "centroids", None)
    assert(cents.select("cluster").distinct().count() == cents.count(),
      "fresh sub-cluster ids must clear the memberless centroid's id")
    val fresh = cents.select("cluster").as[Int].collect().toSet --
      cents0.select("cluster").as[Int].collect().toSet - emptyId
    assert(fresh.nonEmpty && fresh.forall(_ > emptyId),
      s"fresh ids must allocate past $emptyId: $fresh")
    // every assignment still resolves to exactly one centroid, and the
    // full-probe answer is unchanged
    val lists = TxnCatalog.read(spark, cat, "lists", None)
    assert(lists.join(cents, "cluster").count() == lists.count())
    assert(full() == before)
  }

  test("maintenance ladder: skew-only rebalances (vectors/codes untouched), delta-stale rebuilds, healthy rests") {
    import graft.sources.{TxnCatalog, TxnTable}
    // the drift shape again: trained naturals + an appended mega-list
    def oneHot(at: org.apache.spark.sql.Column, v: Float) =
      transform(sequence(lit(0), lit(63)), i =>
        when(i === at, lit(v)).otherwise(lit(0.0f)))
    val naturals = spark.range(0, 8).select(
      (col("id") + 5000L).as("vec_id"),
      oneHot(lit(8) + (col("id") % 8).cast("int"), 1.0f).as("embedding"))
    val blob = spark.range(1000, 1160).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), i =>
        when(i === 0, lit(10.0f))
          .when(i === lit(1) + (col("id") % 4).cast("int"), lit(4.0f))
          .otherwise(lit(0.0f))).as("embedding"))
    val corpus = naturals.unionByName(blob)
    val cat = "/root/repo/target/tmp/spec_ann_ladder"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(cat))
    Similarity.writeIvfPqIndexTxn(spark, naturals, cat, nClusters = 4,
      ksub = 4)
    Similarity.appendToIvfPqIndexTxn(spark, blob, cat)
    val h1 = Similarity.indexHealthTxn(spark, cat)
    assert(h1.skewRatio > 2.0, h1.toString)
    def tableV(n: String) =
      TxnTable.currentVersion(new java.io.File(cat, s"tables/$n").getPath)
    val (vVec0, vCode0) = (tableV("vectors"), tableV("codes"))
    val queries = naturals.limit(5)
    def full() = {
      val np = Similarity.indexHealthTxn(spark, cat).nLists
      Similarity.ivfPqTopKIndexedTxn(spark, queries, cat, k = 5, nprobe = np)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    val before = full()
    // SKEW-ONLY (append fraction deliberately allowed): the ladder
    // answers with the O(oversized) rebalance, NOT the full retrain —
    // lists/centroids move, vectors and codes are never rewritten
    val m1 = Similarity.maintainTxnIndex(spark, corpus, cat,
      maxSkewRatio = 2.0, maxAppendFraction = 1e9, subK = 4)
    assert(m1.decision == "rebalance" && m1.listsSplit == 1, m1.toString)
    assert(tableV("vectors") == vVec0 && tableV("codes") == vCode0,
      "a rebalance must never rewrite the vector or code tables")
    assert(Similarity.indexHealthTxn(spark, cat).skewRatio < h1.skewRatio)
    assert(full() == before, "full-probe answers survive the rebalance")
    // healthy now: rest, no txn
    val t = TxnCatalog.currentTxn(cat)
    val m2 = Similarity.maintainTxnIndex(spark, corpus, cat,
      maxSkewRatio = 2.0, maxAppendFraction = 1e9)
    assert(m2.decision == "rest" && TxnCatalog.currentTxn(cat) == t, m2.toString)
    // DELTA-STALE: an upsert overlay past its bar still takes the full
    // rebuild (only the retrain folds the overlay), never the rebalance
    Similarity.upsertIntoIvfPqIndexTxn(spark,
      embs.limit(2).select("vec_id", "embedding"), cat)
    val m3 = Similarity.maintainTxnIndex(spark,
      corpus.unionByName(embs.limit(2).select("vec_id", "embedding")), cat,
      maxSkewRatio = 1e9, maxAppendFraction = 1e9, maxDeltaFraction = 0.0,
      nClusters = 4, ksub = 4)
    assert(m3.decision == "rebuild" &&
      m3.reason.contains("deltaFraction"), m3.toString)
    assert(Similarity.indexHealthTxn(spark, cat).deltaFraction == 0.0)
    // SKEW WITH AN OVERLAY rebuilds too (rebalance refuses over an
    // overlay by contract): overlay one row and trip ONLY the skew bar
    // (skewRatio ≥ 1 by construction, so 0.99 always trips) — the
    // ladder must route to the retrain, never throw the refusal
    Similarity.upsertIntoIvfPqIndexTxn(spark,
      embs.limit(1).select("vec_id", "embedding"), cat)
    val m4 = Similarity.maintainTxnIndex(spark, corpus, cat,
      maxSkewRatio = 0.99, maxAppendFraction = 1e9, maxDeleteFraction = 1e9,
      maxDeltaFraction = 1e9, nClusters = 4, ksub = 4)
    assert(m4.decision == "rebuild" && m4.reason.contains("overlay"),
      m4.toString)
  }

  test("near-dup pairs find planted exact copies with sim ≈ 1e12") {
    val corpus = embs.select("vec_id", "embedding").unionByName(
      embs.select("vec_id", "embedding").filter($"vec_id" % 50 === 0)
        .withColumn("vec_id", $"vec_id" + 100000))
    val out = Similarity.nearDupPairs(corpus, tauQ = 900000000000L).collect()
    val planted = embs.filter($"vec_id" % 50 === 0).count()
    assert(out.length >= planted.toInt)
    assert(out.forall(_.getLong(2) >= 900000000000L))
  }

  test("semantic dedup drops exactly the smaller-id-near rows of each k-means block") {
    val corpus = embs.select("vec_id", "embedding")
    val tau = 450000000000L // low enough to catch natural pairs too
    val centroids = Similarity.ivfCentroids(corpus, 16, 2)
    val member = Similarity.assignClusters(corpus, centroids)
      .join(corpus, "vec_id")
    // naive reference: enumerate within-cluster pairs, drop the larger id
    val naiveDropped = member.as("x").join(member.as("y"),
        $"x.cluster" === $"y.cluster" && $"x.vec_id" < $"y.vec_id")
      .filter(Similarity.quantizedDot($"x.embedding", $"y.embedding") >= tau)
      .select($"y.vec_id").collect().map(_.getLong(0)).toSet
    val survivors = Similarity.semanticDedup(corpus, tau)
      .collect().map(_.getLong(0)).toSet
    val all = corpus.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(survivors === (all -- naiveDropped))
  }

  test("semantic dedup never drops across clusters, and drops all planted copies") {
    val corpus = embs.select("vec_id", "embedding").unionByName(
      embs.select("vec_id", "embedding").filter($"vec_id" % 50 === 0)
        .withColumn("vec_id", $"vec_id" + 100000))
    val tau = 900000000000L
    val survivors = Similarity.semanticDedup(corpus, tau)
      .collect().map(_.getLong(0)).toSet
    val originals = embs.select("vec_id").collect().map(_.getLong(0)).toSet
    // identical vectors share a cluster, so every planted copy is dropped;
    // no natural pair reaches 0.9e12, so nothing else is
    assert(survivors === originals)
    // a dropped id must have a smaller-id near neighbour SOMEWHERE — the
    // global near-dup pairs are a superset of the cluster-scoped ones
    val globalPairs = Similarity.nearDupPairs(corpus, tau)
      .select("id_b").collect().map(_.getLong(0)).toSet
    val dropped = corpus.select("vec_id").collect().map(_.getLong(0)).toSet -- survivors
    assert(dropped.subsetOf(globalPairs))
  }

  test("meanPoolQuantized: exact quantized sums/means, partitioning-invariant") {
    import spark.implicits._
    val chunks = Seq(
      (1L, Array(0.5f, -0.25f)),
      (1L, Array(0.5f, 0.75f)),
      (2L, Array(1.0f, 0.0f))).toDF("doc_id", "embedding")
    val out = Similarity.meanPoolQuantized(chunks, "doc_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out((1L, 0L)) == ((2L, 1000000L, 500000L)))
    assert(out((1L, 1L)) == ((2L, 500000L, 250000L)))   // -250000 + 750000
    assert(out((2L, 0L)) == ((1L, 1000000L, 1000000L)))
    val repart = Similarity.meanPoolQuantized(
        chunks.repartition(7), "doc_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(repart == out.map { case (k, v) => k -> v._2 })
  }

  test("MMR picks the diverse candidate over a higher-relevance duplicate") {
    // query [1,0]: c10/c11 are identical (rel 0.6, unit sim 1.0), c12 is
    // near-orthogonal with rel 0.28. Round 1 takes c10 (smaller id of the
    // tied pair). Round 2: dup scores 2·0.6 − 1.0 = 0.2; diverse scores
    // 2·0.28 − (−0.6) = 1.16 → diversity beats raw relevance. Round 3
    // takes the remaining dup. Pure top-3 by relevance would be 10,11,12.
    val data = Seq(
      (1L, Array(1.0f, 0.0f)),
      (10L, Array(0.6f, 0.8f)),
      (11L, Array(0.6f, 0.8f)),
      (12L, Array(0.28f, -0.96f))).toDF("vec_id", "embedding")
    val corpus = data.filter($"vec_id" >= 10)
    val out = Similarity.mmrRerank(corpus, data.filter($"vec_id" === 1),
        kCand = 3, kSelect = 3)
      .orderBy("mmr_rank").collect()
    assert(out.map(_.getAs[Long]("n_id")).toSeq === Seq(10L, 12L, 11L))
    // round-1 score is 2·rel; the duplicate's final score is 2·rel − sim
    assert(out(0).getAs[Long]("score") === 2L * out(0).getAs[Long]("rel"))
    assert(out(2).getAs[Long]("score") < out(2).getAs[Long]("rel"))
  }

  test("triplet mining: best positive, hardest negative, ambiguity band, dropped anchors") {
    // corpus: c10..c13; anchors 1=[1,0], 2=[0,1], 3=[-1,0]
    //  anchor 1: positives {c10 0.6e12, c11 0.96e12} → c11; negatives
    //            {c12 0.28e12, c13 0} → hardest is c12 (closest below negT)
    //  anchor 2: pos = c13 (1.0e12), hardest neg = c11 (0.28e12)
    //  anchor 3: nothing reaches posT → no triplet
    val data = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)), (3L, Array(-1.0f, 0.0f)),
      (10L, Array(0.6f, 0.8f)), (11L, Array(0.96f, 0.28f)),
      (12L, Array(0.28f, -0.96f)), (13L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.tripletMine(
        data.filter($"vec_id" >= 10), data.filter($"vec_id" <= 3),
        posT = 500000000000L, negT = 300000000000L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.keySet === Set(1L, 2L))
    // 0.96f rounds down as a float: floor(0.95999997…·10⁶) = 959999
    assert(out(1L) == ((11L, 959999000000L, 12L, 280000000000L)))
    assert(out(2L) == ((13L, 1000000000000L, 11L, 280000000000L)))
  }

  test("MMR composes with ANY candidate generator: IVF-fed selection is well-formed") {
    val corpus = embs
    val qs = embs.filter($"vec_id" < 6)
    val ivfCands = Similarity.ivfTopK(corpus, qs, k = 16)
    val out = Similarity.mmrRerankCandidates(corpus, ivfCands, kSelect = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val candTop = ivfCands.filter($"rank" === 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    (0L until 6L).foreach { q =>
      // four picks per query, and pick 1 is the generator's most relevant
      assert((1L to 4L).forall(k => out.contains((q, k))), s"picks for query $q")
      assert(out((q, 1L)) === candTop(q), s"rank-1 pick for query $q")
    }
    // brute-fed wrapper ≡ explicitly brute-fed composition (same contract)
    val viaWrapper = Similarity.mmrRerank(corpus, qs, kCand = 16, kSelect = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toSet
    val viaCands = Similarity.mmrRerankCandidates(corpus,
        Similarity.bruteForceTopK(corpus, qs, 16), kSelect = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toSet
    assert(viaWrapper === viaCands)
  }

  test("MMR degenerates gracefully: fewer candidates than kSelect selects them all") {
    val data = Seq(
      (1L, Array(1.0f, 0.0f)),
      (10L, Array(0.6f, 0.8f)),
      (11L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = Similarity.mmrRerank(data.filter($"vec_id" >= 10),
        data.filter($"vec_id" === 1), kCand = 5, kSelect = 5)
      .orderBy("mmr_rank").collect()
    assert(out.length === 2)
    assert(out.map(_.getAs[Long]("mmr_rank")).toSeq === Seq(1L, 2L))
  }
}
