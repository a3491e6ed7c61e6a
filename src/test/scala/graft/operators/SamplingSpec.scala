package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir)

  test("bernoulli sample is identical across partition layouts (df.sample is not)") {
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sampling.bernoulli(df, "doc_id", 0.10).select("doc_id")
        .collect().map(_.getLong(0)).toSet
    val a = ids(docs)
    val b = ids(docs.repartition(13))
    val c = ids(docs.coalesce(1))
    assert(a === b)
    assert(b === c)
    assert(a.nonEmpty)
    // rate lands near 10% (hash uniformity, not exactness)
    val n = docs.count().toDouble
    assert(a.size > n * 0.05 && a.size < n * 0.18, s"${a.size} of $n")
  }

  test("bernoulli is monotone in rate: a 5% sample is a subset of a 20% sample") {
    val small = Sampling.bernoulli(docs, "doc_id", 0.05)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val big = Sampling.bernoulli(docs, "doc_id", 0.20)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big))
  }

  test("weighted bernoulli: exact nesting in exponent and rate, layout-invariant") {
    def ids(df: org.apache.spark.sql.DataFrame, rate: Double,
            p: Int, q: Int): Set[Long] =
      Sampling.weightedBernoulli(df, "doc_id", "n_chars", rate, p, q)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    // layout invariance — the defining property vs df.sample
    assert(ids(docs, 0.5, 3, 2) === ids(docs.repartition(13), 0.5, 3, 2))
    // a steeper exponent keeps strictly fewer: (w/W)^a decreasing in a,
    // SAME bucket per row → selection sets nest EXACTLY (not just sizes)
    val flat = ids(docs, 0.8, 1, 2)   // α = 0.5
    val lin = ids(docs, 0.8, 1, 1)    // α = 1
    val steep = ids(docs, 0.8, 3, 2)  // α = 1.5
    assert(steep.subsetOf(lin) && lin.subsetOf(flat))
    assert(steep.nonEmpty && flat.size > steep.size)
    // rate nests too
    assert(ids(docs, 0.3, 1, 1).subsetOf(ids(docs, 0.6, 1, 1)))
    // at rate=1 every max-weight row survives any exponent:
    // bucket^q·W^p < W^p·B^q reduces to bucket < B, always true
    val wMax = docs.agg(max("n_chars")).head().getLong(0)
    val maxIds = docs.filter(col("n_chars") === wMax)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(maxIds.subsetOf(ids(docs, 1.0, 3, 2)))
    // SCALE INVARIANCE through the DECIMAL(38) wide path: pre-scaling
    // every weight by a constant leaves (w/W)^α — and so the selected
    // set — EXACTLY unchanged, even though the products now exceed
    // 64 bits and route through decimal arithmetic
    val scaled = docs.withColumn("big", col("n_chars") * 1000000L)
    val bigIds = Sampling.weightedBernoulli(scaled, "doc_id", "big", 0.5, 3, 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(bigIds === ids(docs, 0.5, 3, 2),
      "scaled weights must select the identical rows via the wide path")
    // beyond DECIMAL(38) the combination fails loudly, never wraps
    intercept[IllegalArgumentException] {
      Sampling.weightedBernoulli(scaled, "doc_id", "big", 1.0, 6, 6).count()
    }
  }

  test("epoch shuffle heads: distinct permutations, layout-invariant, no global sort") {
    def head(df: org.apache.spark.sql.DataFrame, e: Int): Seq[Long] =
      Sampling.epochShuffleHead(df, "doc_id", e, 50)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
    val e1 = head(docs, 1)
    assert(e1 == head(docs.repartition(13), 1), "layout-invariant order")
    assert(e1 != head(docs, 2), "epochs must be different permutations")
    assert(e1.toSet != head(docs, 2).toSet, "and pick different heads")
    val plan = Sampling.epochShuffleHead(docs, "doc_id", 1, 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"head must plan as per-partition top-k, got:\n$plan")
  }

  test("rational temperature (1/2) is the exact-boundary form of the sqrt sampler") {
    def idSet(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val viaSqrt = idSet(Sampling.sqrtTemperatureSample(docs, "lang", "doc_id"))
    val viaRational = idSet(
      Sampling.rationalTemperatureSample(docs, "lang", "doc_id", 1, 2))
    // the sqrt form floors its per-stratum cap (bucket < floor(x)); the
    // raised-power form compares exactly (bucket < x) — so rational ⊇
    // sqrt, differing only on each stratum's single boundary bucket
    assert(viaSqrt.subsetOf(viaRational))
    val nLangs = docs.select("lang").distinct().count()
    val extra = viaRational -- viaSqrt
    // at most a handful of rows sit exactly on a boundary bucket
    assert(extra.size <= nLangs * 3, s"${extra.size} extras for $nLangs strata")
    // flatter keep-exponent keeps more, exact nesting per row
    val third = idSet(
      Sampling.rationalTemperatureSample(docs, "lang", "doc_id", 1, 3))
    assert(viaRational.subsetOf(third))
  }

  test("stratified cap keeps at most k per stratum, small strata whole, deterministically") {
    val out = Sampling.stratifiedCap(docs, Seq("lang"), "doc_id", k = 25)
    val sizes = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    full.foreach { case (lang, n) =>
      assert(sizes(lang) === math.min(n, 25L), s"$lang: ${sizes(lang)} of $n")
    }
    val again = Sampling.stratifiedCap(docs.repartition(7), Seq("lang"), "doc_id", k = 25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === out.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("bernoulli plan is a pure scan-side filter: no shuffle") {
    val plan = Sampling.bernoulli(docs, "doc_id", 0.10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1500))
  }

  test("token-budget mix equals the naive one-window-per-stratum form") {
    import org.apache.spark.sql.expressions.Window
    val targets = Map("en" -> 3000L, "de" -> 1500L, "es" -> 1500L,
      "fr" -> 1000L, "zh" -> 1500L)
    val in = docs.select("doc_id", "lang", "n_chars")
    val buckets = 256
    val naiveW = Window.partitionBy($"lang")
      .orderBy(Sampling.hashBucket($"doc_id", buckets),
        md5($"doc_id".cast("string").cast("binary")), $"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val targetCol = targets.tail.foldLeft(
      when($"lang" === targets.head._1, targets.head._2)) {
      case (acc, (l, t)) => acc.when($"lang" === l, t)
    }
    val naive = in
      .withColumn("cum", sum($"n_chars".cast("long")).over(naiveW))
      .filter($"cum" <= targetCol)
      .select("doc_id", "cum").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = Sampling.tokenBudgetMix(in, "lang", "doc_id", "n_chars",
        targets, buckets)
      .select("doc_id", "cum_size").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === naive)
    assert(got.nonEmpty)
  }

  test("token-budget mix respects every stratum's budget and is layout-invariant") {
    val targets = Map("en" -> 3000L, "de" -> 1500L, "es" -> 1500L,
      "fr" -> 1000L, "zh" -> 1500L)
    val in = docs.select("doc_id", "lang", "n_chars")
    val out = Sampling.tokenBudgetMix(in, "lang", "doc_id", "n_chars", targets)
    val sums = out.groupBy("lang").agg(sum($"n_chars").as("s")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sums.foreach { case (l, s) => assert(s <= targets(l), s"$l over budget: $s") }
    assert(sums.values.sum > 0)
    val again = Sampling.tokenBudgetMix(in.repartition(11), "lang", "doc_id",
        "n_chars", targets)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === out.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("topic-balanced cap bounds every emergent cluster, layout-invariant") {
    val embs = Tables.embeddings(spark, sfDir)
    val out = Sampling.topicBalancedCap(embs, perTopic = 10)
    val picked = out.collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(picked.groupBy(_._2).forall(_._2.length <= 10),
      "a cluster exceeded its cap")
    assert(picked.nonEmpty && picked.map(_._1).distinct.length === picked.length)
    // clustering + cap are content-hash/integer arithmetic — partition
    // layout must not change the selection
    val again = Sampling.topicBalancedCap(embs.repartition(7), perTopic = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(again.toSet === picked.toSet)
  }

  test("sequence packing: greedy first-fit, oversized docs isolated, layout-stable") {
    // budget 10; group g: 4+5 fit (pack 0), 3 overflows -> pack 1 with 6,
    // a 25-token doc overflows -> its OWN pack 2 (fill may exceed the
    // budget for a single oversized doc), then 2+8 share pack 3
    val docs = Seq(
      (1L, "g", 4L), (2L, "g", 5L), (3L, "g", 3L), (4L, "g", 6L),
      (5L, "g", 25L), (6L, "g", 2L), (7L, "g", 8L),
      (10L, "h", 10L), (11L, "h", 1L))
      .toDF("doc_id", "grp", "tok")
    val out = Packing.packSequences(docs, "doc_id", $"tok",
        groupCols = Seq("grp"), budget = 10L)
      .collect()
      .map(r => r.getLong(1) -> (r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) === ((0L, 4L)) && out(2L) === ((0L, 9L)))
    assert(out(3L) === ((1L, 3L)) && out(4L) === ((1L, 9L)))
    assert(out(5L) === ((2L, 25L)))
    assert(out(6L) === ((3L, 2L)) && out(7L) === ((3L, 10L)))
    // exact-fit first doc fills pack 0; the next one opens pack 1
    assert(out(10L) === ((0L, 10L)) && out(11L) === ((1L, 1L)))
    // deterministic across partition layouts
    val again = Packing.packSequences(docs.repartition(5), "doc_id", $"tok",
        groupCols = Seq("grp"), budget = 10L)
      .collect().map(r => r.getLong(1) -> (r.getLong(3), r.getLong(4))).toMap
    assert(again === out)
  }

  test("curriculum phases: exact tercile cuts; cut values stay in the lower tier") {
    import spark.implicits._
    // a: 1..9 → cuts at ranks 3 and 6 (values 3, 6): tiers {1,2,3},{4,5,6},{7,8,9}
    // c: constant 42 → both cuts 42, everything collapses into phase 1
    val df = ((1 to 9).map(i => ("a", i.toLong)) ++ Seq.fill(5)(("c", 42L)))
      .toDF("g", "v")
    val out = Sampling.curriculumPhases(df, "g", "v", phases = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(("a", 1L)) == ((3L, 6L)))
    assert(out(("a", 2L)) == ((3L, 15L)))
    assert(out(("a", 3L)) == ((3L, 24L)))
    assert(out(("c", 1L)) == ((5L, 210L)))
    assert(!out.contains(("c", 2L)) && !out.contains(("c", 3L)))
  }

  test("release manifest detects any single-row tamper shard-locally") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "lang")
    def manifest(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Packing.releaseManifest(df, "doc_id",
          Seq("text", "lang"), nShards = 4)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val base = manifest(docs)
    assert(base.keySet == Set(0L, 1L, 2L, 3L))
    // altering one row's content moves exactly its shard's checksum
    val tampered = manifest(docs.withColumn("text",
      when(col("doc_id") === 7L, lit("evil")).otherwise(col("text"))))
    val changed = base.keySet.filter(k => base(k) != tampered(k))
    assert(changed.size == 1, s"expected one shard to move, got $changed")
    assert(base(changed.head)._1 == tampered(changed.head)._1,
      "row count unchanged — only the checksum moves")
    // dropping a row moves its shard's count AND checksum
    val dropped = manifest(docs.filter(col("doc_id") =!= 7L))
    assert(dropped(changed.head)._1 == base(changed.head)._1 - 1)
    // layout invariance: the manifest is repartition-proof
    assert(manifest(docs.repartition(13)) == base)
  }
}
