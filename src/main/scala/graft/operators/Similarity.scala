package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * Two paths, same contract:
  *  - `bruteForceTopK` — exact: queries × corpus, dot product, windowed
  *    top-k. Correct at any recall but O(|Q|·|C|): the baseline and the
  *    small-|Q| path (broadcast the queries, stream the corpus).
  *  - `lshTopK` — random-hyperplane LSH: L tables × B bits per table;
  *    vectors sharing a bucket in any table are candidates, then exact
  *    rank within candidates. Scale shape: equi-join on (table, bucket) —
  *    shuffle on an 8-byte key instead of all-pairs.
  *
  * Embeddings in the testdata are unit-normalized, so dot product == cosine.
  */
object Similarity {

  /** Exact double-precision dot product (engine-native path). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  /** Quantized dot product: floor(x·1e6) per element, integer products,
    * long sum. Exact and summation-order-independent — the form used for
    * oracle-checked queries (a double sum's low bits depend on partition
    * order; integers don't). Unit vectors → value ≈ cosine · 1e12.
    *
    * Dispatches to the native `QuantizedDot` expression (fused primitive
    * loop, whole-stage codegen) — the HOF form below allocates a zipped
    * intermediate array per pair. */
  def quantizedDot(a: Column, b: Column): Column = {
    graft.plans.GraftExtensions.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("quantized_dot", a, b)
  }

  /** HOF reference implementation of `quantizedDot` — kept as the
    * differential-test baseline for the native expression. */
  def quantizedDotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        floor(x * 1000000.0d).cast("long") * floor(y * 1000000.0d).cast("long")),
      lit(0L), (acc, v) => acc + v)

  /** Exact top-k: for each query vector, the k nearest corpus vectors by
    * `sim` (descending, id tie-break), self-pairs excluded.
    * Output: (q_id, rank, n_id, sim). */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      sim: (Column, Column) => Column = quantizedDot): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val w = Window.partitionBy("q_id").orderBy(desc("sim"), col("n_id"))
    c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", sim(col("q_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "sim")
  }

  /** Deterministic random hyperplanes: L tables × bits planes each, unit
    * Gaussian components from a fixed seed. */
  def hyperplanes(dim: Int, tables: Int, bits: Int, seed: Long = 42L): Seq[Seq[Seq[Double]]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(tables)(Seq.fill(bits)(Seq.fill(dim)(rng.nextGaussian())))
  }

  /** (id, table, bucket) signature rows: bucket = sign-bit integer of the
    * table's hyperplane dots, all tables computed by ONE fused
    * `lsh_bucket_array` expression per row (quantizes the embedding once,
    * loops over a precomputed quantized plane matrix). The previous form
    * carried tables×bits separate `quantized_dot` expressions (128 for
    * near-dup), each re-quantizing the embedding — the expression forest
    * dominated both Janino compile time and the scan. Bucket bits are
    * arithmetically identical (`Σ floor(eᵢ·10⁶)·floor(pᵢ·10⁶) > 0`,
    * differential spec), so candidates and measured recall are unchanged.
    * Sign quantization can only flip a bit for dots within ~1e-6 of the
    * hyperplane, which changes nothing structural (any consistent sign
    * function is a valid LSH; identical vectors still collide
    * everywhere). Null vectors (none in the corpus contract) drop out of
    * the explode rather than hashing to bucket 0. */
  def lshBuckets(df: DataFrame, planes: Seq[Seq[Seq[Double]]]): DataFrame = {
    graft.plans.GraftExtensions.register(
      org.apache.spark.sql.SparkSession.active)
    val bits = planes.head.size
    val flat: Seq[Seq[Float]] = planes.flatten.map(_.map(_.toFloat))
    val buckets = call_function("lsh_bucket_array",
      col("embedding"), typedLit(flat), lit(bits))
    df.select(col("vec_id"), posexplode(buckets).as(Seq("table", "bucket")))
  }

  /** ANN top-k via LSH candidates + exact re-rank. Candidates are corpus
    * vectors sharing any (table, bucket) with the query. Recall depends on
    * (tables, bits); the spec tests measure it against bruteForceTopK.
    *
    * Default 16×4 is tuned for the near-orthogonal random testdata (top-5
    * cosines ≈ 0.3 → per-bit agreement ≈ 0.61, so long buckets miss):
    * p(candidate) = 1-(1-0.61⁴)¹⁶ ≈ 0.9. Real embedding corpora cluster
    * far tighter; raise `bits` there for selectivity. */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      tables: Int = 16, bits: Int = 4, dim: Int = 64,
      sim: (Column, Column) => Column = quantizedDot): DataFrame = {
    val planes = hyperplanes(dim, tables, bits)
    val cB = lshBuckets(corpus, planes)
      .select(col("vec_id").as("n_id"), col("table"), col("bucket"))
    val qB = lshBuckets(queries, planes)
      .select(col("vec_id").as("q_id"), col("table"), col("bucket"))
    val cand = qB.join(cB, Seq("table", "bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .select("q_id", "n_id").distinct()
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val w = Window.partitionBy("q_id").orderBy(desc("sim"), col("n_id"))
    cand.join(broadcast(q), "q_id").join(c, "n_id")
      .withColumn("sim", sim(col("q_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "sim")
  }

  /** Whole-vector quantization: floor(x·1e6) per element, array<float> →
    * array<long> — the QuantizedDot discipline applied to vectors that
    * participate in *training* (centroids, codebooks), not just scoring. */
  def quantizeVec(c: Column): Column =
    transform(c, x => floor(x.cast("double") * 1000000.0d).cast("long"))

  /** Integer dot of two pre-quantized long vectors — exact, reduction-
    * order independent, and replayable verbatim by the DuckDB oracle. */
  def dotQVec(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** IVF (inverted-file) ANN — the clustering alternative to
    * hyperplane LSH. Centroids come from a deterministic distributed
    * k-means (first `k` vectors seed, `iters` Lloyd rounds, all
    * DataFrame ops: assignment is a broadcast-centroid argmin, the
    * update is a posexplode → per-(cluster, dim) mean). Queries probe
    * the `nprobe` nearest centroids and exact-rank only those lists —
    * the corpus-side shuffle is one groupBy on cluster id.
    *
    * The whole training loop is INTEGER arithmetic: vectors quantize to
    * floor(x·1e6) longs once, the assignment metric is the integer dot,
    * and the centroid update is the per-dimension `sum div count`
    * (truncating long division) at the same 1e6 scale. Exact and
    * reduction-order independent — so q_ann_ivf's DuckDB oracle replays
    * the two Lloyd rounds bit-for-bit (`//` truncates toward zero like
    * `div`), where any float/decimal mean would drift in the last bit.
    * The 1e-6 metric quantization is far below the inter-centroid
    * spacing, so cluster quality is unchanged (recall specs). Returns
    * (cluster: int, cq: array<long>). */
  def ivfCentroids(corpus: DataFrame, k: Int, iters: Int): DataFrame = {
    var centroids = corpus.orderBy("vec_id").limit(k)
      .select(col("vec_id").cast("int").as("cluster"),
        quantizeVec(col("embedding")).as("cq"))
    (1 to iters).foreach { _ =>
      val assigned = assignClusters(corpus, centroids)
      centroids = assigned
        .join(corpus, "vec_id")
        .select(col("cluster"),
          posexplode(quantizeVec(col("embedding"))).as(Seq("dim", "v")))
        .groupBy("cluster", "dim")
        .agg(expr("sum(v) div count(1)").as("m"))
        .groupBy("cluster")
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
          x => x.getField("m")).as("cq"))
    }
    centroids
  }

  /** (vec_id, cluster) assignment: nearest centroid by integer dot of
    * the quantized vectors (broadcast centroids, map-side only). */
  def assignClusters(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(desc("d"), col("cluster"))
    corpus.select(col("vec_id"), quantizeVec(col("embedding")).as("__eq"))
      .crossJoin(broadcast(centroids))
      .withColumn("d", dotQVec(col("__eq"), col("cq")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cluster"))
  }

  /** IVF top-k: probe the `nprobe` closest centroids per query, exact
    * re-rank within their lists. Recall measured in specs vs brute. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nClusters: Int = 16, iters: Int = 2, nprobe: Int = 4): DataFrame = {
    // centroids feed probes AND list assignment; lists feed the candidate
    // join — materialize both (k rows / |corpus| ids — tiny tables) so the
    // iterated k-means lineage isn't recomputed per consumer
    val centroids = ivfCentroids(corpus, nClusters, iters)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lists = assignClusters(corpus, centroids)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wProbe = Window.partitionBy("q_id").orderBy(desc("d"), col("cluster"))
    val probes = queries.select(col("vec_id").as("q_id"),
        quantizeVec(col("embedding")).as("__qq"))
      .crossJoin(broadcast(centroids))
      .withColumn("d", dotQVec(col("__qq"), col("cq")))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nprobe)
      .select("q_id", "cluster")
    val cand = probes
      .join(lists.withColumnRenamed("vec_id", "n_id"), "cluster")
      .filter(col("q_id") =!= col("n_id"))
      .select("q_id", "n_id").distinct()
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val w = Window.partitionBy("q_id").orderBy(desc("sim"), col("n_id"))
    cand.join(broadcast(q), "q_id").join(c, "n_id")
      .withColumn("sim", quantizedDot(col("q_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "sim")
  }

  /** Embedding-cosine near-dup pairs above `tauQ` (quantized threshold,
    * ≈ cosine·1e12), exact within the given frame. The native expression
    * fuses quantize+multiply+sum into one primitive loop per pair — no
    * intermediate arrays in the 2M-pair inner join.
    *
    * This is the all-pairs crossJoin: O(N²), correct at any threshold,
    * right only when exactness IS the contract (oracle baselines, small
    * frames). For a corpus, use [[nearDupPairsLsh]] — same output contract,
    * bucketed candidate generation instead of all pairs. */
  def nearDupPairs(df: DataFrame, tauQ: Long): DataFrame = {
    val a = df.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val b = df.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("sim", quantizedDot(col("emb_a"), col("emb_b")))
      .filter(col("sim") >= tauQ)
      .select("id_a", "id_b", "sim")
  }

  /** Near-dup pairs via LSH candidate generation + exact verify — the
    * 100 TB shape of [[nearDupPairs]]. Candidates are pairs sharing any
    * (table, bucket): an equi-join on an 8-byte key, never all pairs; each
    * candidate is then exact-verified with the native quantized dot, so a
    * surviving pair is never a false positive.
    *
    * Completeness is probabilistic in general: a true pair must agree on
    * all `bits` hyperplane signs of at least one table
    * (p = 1-(1-aᵇⁱᵗˢ)ᵗᵃᵇˡᵉˢ, a = 1 - θ/π). Exact duplicates collide in
    * every table, so on corpora whose near-dups are copies (the planted-
    * copy oracle; common-crawl-style exact reposts) the output is
    * deterministically identical to the brute-force path. Defaults: 16-bit
    * buckets (selective even for ~uniform random vectors), 8 tables. */
  def nearDupPairsLsh(df: DataFrame, tauQ: Long,
                      tables: Int = 8, bits: Int = 16, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(dim, tables, bits, seed = 7L)
    val buckets = lshBuckets(df, planes)
    val cand = buckets.as("x").join(buckets.as("y"),
        col("x.table") === col("y.table") && col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"))
      .distinct()
    val a = df.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val b = df.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    cand.join(a, "id_a").join(b, "id_b")
      .withColumn("sim", quantizedDot(col("emb_a"), col("emb_b")))
      .filter(col("sim") >= tauQ)
      .select("id_a", "id_b", "sim")
  }

  /** (vec_id, j, sq): the corpus exploded into `m` contiguous subvectors
    * of dim/m components each, pre-quantized to floor(x·1e6) longs — the
    * product-quantization decomposition in the integer domain. */
  def pqSubvectors(df: DataFrame, m: Int, dim: Int): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    df.select(col("vec_id"),
      posexplode(transform(sequence(lit(0), lit(m - 1)),
        j => slice(quantizeVec(col("embedding")), j * sub + 1, lit(sub))))
        .as(Seq("j", "sq")))
  }

  /** Squared L2 between two quantized long arrays — exact integers
    * (assignment metric for PQ codebooks; subvectors are not unit, so
    * dot won't do). Magnitude ≤ (dim/m)·(2e6)² ≈ 3e13 — no overflow. */
  private def l2sqQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)

  /** (vec_id, j, code): each subvector assigned to its nearest codeword
    * (integer L2, code tie-break). Broadcast codebook, map-side only. */
  def pqAssign(subs: DataFrame, codebooks: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id", "j").orderBy(col("d"), col("code"))
    subs.join(broadcast(codebooks), "j")
      .withColumn("d", l2sqQ(col("sq"), col("cq")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("vec_id", "j", "code")
  }

  /** Product-quantization codebooks: `ksub` codewords per subspace,
    * trained by the same deterministic Lloyd scheme as [[ivfCentroids]]
    * (seeds = the ksub smallest vec_ids' subvectors; per-dimension
    * `sum div count` integer means at the 1e6 scale), ALL subspaces in
    * one DataFrame job per iteration — the subspace id `j` is just
    * another grouping key. A codeword that loses every member simply
    * drops out (standard k-means shrinkage). All-integer training makes
    * q_ann_pq's DuckDB oracle an exact unrolled replay.
    * Returns (j, code, cq: array<long>). At 100 TB codebooks are
    * trained on a deterministic hash-sample of the corpus ([[Sampling
    * .bernoulli]] upstream), never the full data. */
  def pqCodebooks(corpus: DataFrame, m: Int, ksub: Int, iters: Int,
                  dim: Int): DataFrame = {
    val subs = pqSubvectors(corpus, m, dim)
    // seed codes via a broadcast join on vec_id — flat at any ksub, where
    // a when-chain's expression tree deepens linearly (fine at 16, a
    // Janino hazard at 256)
    val seedIds = corpus.select("vec_id").orderBy("vec_id").limit(ksub)
      .collect().map(_.getLong(0)).zipWithIndex
    val seeds = corpus.sparkSession
      .createDataFrame(seedIds.toSeq.map { case (id, c) => (id, c) })
      .toDF("vec_id", "code")
    var cb = subs.join(broadcast(seeds), "vec_id")
      .select(col("j"), col("code"), col("sq").as("cq"))
    (1 to iters).foreach { _ =>
      val assigned = pqAssign(subs, cb)
      cb = assigned.join(subs, Seq("vec_id", "j"))
        .select(col("j"), col("code"), posexplode(col("sq")).as(Seq("dim", "v")))
        .groupBy("j", "code", "dim")
        .agg(expr("sum(v) div count(1)").as("mu"))
        .groupBy("j", "code")
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("mu")))),
          x => x.getField("mu")).as("cq"))
    }
    cb
  }

  /** Per-query ADC lookup table: (q_id, j, code, partial) where partial
    * is the INTEGER dot of the quantized query subvector and the
    * quantized codeword (both at the 1e6 scale → partial ≈ cos·1e12/m)
    * — exact longs, so downstream sums are summation-order-independent
    * and the oracle replays them. |Q|·m·ksub rows — always
    * broadcastable. */
  private def pqLut(queries: DataFrame, cb: DataFrame, m: Int,
                    dim: Int): DataFrame =
    pqSubvectors(queries, m, dim)
      .withColumnRenamed("vec_id", "q_id").withColumnRenamed("sq", "qsq")
      .join(broadcast(cb), "j")
      .select(col("q_id"), col("j"), col("code"),
        dotQVec(col("qsq"), col("cq")).as("partial"))

  /** PQ-compressed ANN (asymmetric distance computation): the corpus is
    * stored as `m` byte-ish codes per vector — at 100 TB this is the
    * memory story (64 floats → 8 codes, a 32× shrink; real deployments
    * keep codes in RAM and raw vectors only for the re-rank). A query
    * builds its per-(subspace, codeword) dot-product lookup table
    * (|Q|·m·ksub rows, broadcast), the approximate score is one
    * equi-join + sum over the codes table — no vector math per
    * candidate — and the top `rerank` candidates are re-scored exactly.
    * Partial LUT dots are floor-quantized to longs so the approx ranking
    * is summation-order-independent (the repo's determinism discipline).
    * Recall vs [[bruteForceTopK]] is measured in specs. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
             m: Int = 8, ksub: Int = 16, iters: Int = 2,
             rerank: Int = 64, dim: Int = 64): DataFrame = {
    val cb = pqCodebooks(corpus, m, ksub, iters, dim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val codes = pqAssign(pqSubvectors(corpus, m, dim), cb)
      .withColumnRenamed("vec_id", "n_id")
    val lut = pqLut(queries, cb, m, dim)
    val wA = Window.partitionBy("q_id").orderBy(desc("approx"), col("n_id"))
    val cand = codes.join(broadcast(lut), Seq("j", "code"))
      .groupBy("q_id", "n_id").agg(sum("partial").as("approx"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("rn", row_number().over(wA))
      .filter(col("rn") <= rerank)
      .select("q_id", "n_id")
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val w = Window.partitionBy("q_id").orderBy(desc("sim"), col("n_id"))
    cand.join(broadcast(q), "q_id").join(c, "n_id")
      .withColumn("sim", quantizedDot(col("q_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "sim")
  }

  /** IVFPQ — the production ANN shape (Jégou et al., the FAISS default):
    * IVF cluster lists prune the candidate set, PQ codes score what's
    * left. The corpus is touched as (cluster id, m codes) only; raw
    * vectors surface for the final exact re-rank. This variant encodes
    * raw vectors, not residuals (one codebook pass instead of per-list
    * residual training — documented simplification; recall is measured,
    * not assumed, in specs). Scale: candidates = nprobe/nClusters of the
    * corpus, each scored by m LUT lookups — both knobs independent. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                nClusters: Int = 16, iters: Int = 2, nprobe: Int = 4,
                m: Int = 8, ksub: Int = 16, rerank: Int = 64,
                dim: Int = 64): DataFrame = {
    val centroids = ivfCentroids(corpus, nClusters, iters)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lists = assignClusters(corpus, centroids)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wProbe = Window.partitionBy("q_id").orderBy(desc("d"), col("cluster"))
    val probes = queries.select(col("vec_id").as("q_id"),
        quantizeVec(col("embedding")).as("__qq"))
      .crossJoin(broadcast(centroids))
      .withColumn("d", dotQVec(col("__qq"), col("cq")))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nprobe)
      .select("q_id", "cluster")
    val cb = pqCodebooks(corpus, m, ksub, iters, dim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val codes = pqAssign(pqSubvectors(corpus, m, dim), cb)
      .withColumnRenamed("vec_id", "n_id")
    val lut = pqLut(queries, cb, m, dim)
    val cand = probes
      .join(lists.withColumnRenamed("vec_id", "n_id"), "cluster")
      .filter(col("q_id") =!= col("n_id"))
      .select("q_id", "n_id")
    val wA = Window.partitionBy("q_id").orderBy(desc("approx"), col("n_id"))
    val shortlist = cand
      .join(codes, "n_id")
      .join(broadcast(lut), Seq("q_id", "j", "code"))
      .groupBy("q_id", "n_id").agg(sum("partial").as("approx"))
      .withColumn("rn", row_number().over(wA))
      .filter(col("rn") <= rerank)
      .select("q_id", "n_id")
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val w = Window.partitionBy("q_id").orderBy(desc("sim"), col("n_id"))
    shortlist.join(broadcast(q), "q_id").join(c, "n_id")
      .withColumn("sim", quantizedDot(col("q_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "sim")
  }

  /** Persist the IVFPQ index — build ONCE, query many (the production
    * deployment shape; the sibling of `Dedup.writeMinHashIndex`). Five
    * tables: `centroids` (nClusters rows) and `codebooks` (≤ m·ksub
    * rows) are the trained model; `lists` (vec_id → cluster) and
    * `codes` (vec_id, j, code — m rows/vector, the 32× compressed
    * corpus) are the scan-side state; `vectors` holds raw embeddings
    * for the exact re-rank (in production that's the corpus table
    * itself, bucketed by vec_id — kept here so a query session needs
    * only the index dir). Training cost is paid once; the recurring
    * cost is [[ivfPqTopKIndexed]]'s probe + code join. */
  def writeIvfPqIndex(corpus: DataFrame, dir: String,
                      nClusters: Int = 16, iters: Int = 2,
                      m: Int = 8, ksub: Int = 16, dim: Int = 64): Unit = {
    val centroids = ivfCentroids(corpus, nClusters, iters)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cb = pqCodebooks(corpus, m, ksub, iters, dim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      centroids.write.mode("overwrite").parquet(s"$dir/centroids")
      cb.write.mode("overwrite").parquet(s"$dir/codebooks")
      assignClusters(corpus, centroids)
        .write.mode("overwrite").parquet(s"$dir/lists")
      pqAssign(pqSubvectors(corpus, m, dim), cb)
        .write.mode("overwrite").parquet(s"$dir/codes")
      corpus.select("vec_id", "embedding")
        .write.mode("overwrite").parquet(s"$dir/vectors")
    } finally { centroids.unpersist(); cb.unpersist() }
  }

  /** IVFPQ top-k against a [[writeIvfPqIndex]] directory: probes and the
    * ADC LUT come from the persisted model (broadcast-sized), candidates
    * from the persisted lists × codes — the corpus is never re-read and
    * nothing is re-trained. Output is IDENTICAL to [[ivfPqTopK]] over
    * the indexed corpus (differential spec; q_ann_ivfpq_index shares
    * q_ann_ivfpq's replay oracle verbatim). */
  def ivfPqTopKIndexed(queries: DataFrame, dir: String, k: Int,
                       nprobe: Int = 4, rerank: Int = 64,
                       m: Int = 8, dim: Int = 64): DataFrame = {
    val spark = queries.sparkSession
    val centroids = spark.read.parquet(s"$dir/centroids")
    val cb = spark.read.parquet(s"$dir/codebooks")
    val lists = spark.read.parquet(s"$dir/lists")
    val codes = spark.read.parquet(s"$dir/codes")
      .withColumnRenamed("vec_id", "n_id")
    val vectors = spark.read.parquet(s"$dir/vectors")
    val wProbe = Window.partitionBy("q_id").orderBy(desc("d"), col("cluster"))
    val probes = queries.select(col("vec_id").as("q_id"),
        quantizeVec(col("embedding")).as("__qq"))
      .crossJoin(broadcast(centroids))
      .withColumn("d", dotQVec(col("__qq"), col("cq")))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nprobe)
      .select("q_id", "cluster")
    val lut = pqLut(queries, cb, m, dim)
    val cand = probes
      .join(lists.withColumnRenamed("vec_id", "n_id"), "cluster")
      .filter(col("q_id") =!= col("n_id"))
      .select("q_id", "n_id")
    val wA = Window.partitionBy("q_id").orderBy(desc("approx"), col("n_id"))
    val shortlist = cand
      .join(codes, "n_id")
      .join(broadcast(lut), Seq("q_id", "j", "code"))
      .groupBy("q_id", "n_id").agg(sum("partial").as("approx"))
      .withColumn("rn", row_number().over(wA))
      .filter(col("rn") <= rerank)
      .select("q_id", "n_id")
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = vectors.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val w = Window.partitionBy("q_id").orderBy(desc("sim"), col("n_id"))
    shortlist.join(broadcast(q), "q_id").join(c, "n_id")
      .withColumn("sim", quantizedDot(col("q_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "sim")
  }

  /** Johnson–Lindenstrauss random projection: dim → outDim via a seeded
    * Gaussian plane matrix (the same deterministic family as the LSH
    * hyperplanes — JL is what LSH sign-buckets before truncating to a
    * bit), computed in the quantized-integer domain: out_j =
    * Σᵢ floor(xᵢ·10⁶)·floor(pⱼᵢ·10⁶) ≈ (x·pⱼ)·10¹². The standard
    * dimensionality-reduction preprocessing before clustering/ANN when
    * the raw embedding dim is large — distances concentrate within
    * (1±ε) at outDim = O(log n / ε²), and the integer output keeps the
    * projected vectors engine-exact for the replay oracle.
    *
    * Returns the EXPLODED form (vec_id, dim, value_q) — one row per
    * projected component, scan-side, zero shuffle. NOTE the scale:
    * value_q ≈ projection·10¹², so rescale (e.g. `value_q div 10⁶`)
    * before feeding projected vectors to an integer dot — squaring
    * 10¹²-scale longs overflows. */
  def randomProject(df: DataFrame, outDim: Int, dim: Int = 64,
                    seed: Long = 99L): DataFrame = {
    val planesQ: Seq[Seq[Long]] = projectionPlanesQ(outDim, dim, seed)
    df.select(col("vec_id"),
      posexplode(transform(typedLit(planesQ),
        p => dotQVec(quantizeVec(col("embedding")), p))).as(Seq("dim", "value_q")))
      .select(col("vec_id"), col("dim").cast("long").as("dim"), col("value_q"))
  }

  /** The quantized JL plane matrix (outDim rows × dim longs at the 1e6
    * scale) — exposed so the oracle inlines the exact same literals. */
  def projectionPlanesQ(outDim: Int, dim: Int, seed: Long = 99L): Seq[Seq[Long]] =
    hyperplanes(dim, 1, outDim, seed).head
      .map(_.map(p => math.floor(p * 1000000.0d).toLong))

  /** Scalar int8 quantization (the FAISS SQ8 shape): each component
    * maps to floor(x·127 + 0.5) — unit-normalized corpus, so the scale
    * is the STATIC 127, no per-vector min/max state to carry. 4×
    * compression vs float32 next to PQ's 32×, with far better raw
    * fidelity — the first rung of the memory ladder. Deterministic
    * integer output (the float→double widening and FLOOR are exact),
    * so SQ8 scoring replays in the oracle like everything else. */
  def sq8Encode(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * 127.0d + 0.5d).cast("int"))

  /** ANN top-k over the SQ8-compressed corpus: approximate scores are
    * the integer dot of the int8 codes (≈ cosine·127², exact longs),
    * the top `rerank` per query re-score with the full-precision
    * quantized dot. No training and no bucketing — the corpus IS
    * scanned per query batch (one broadcast-LUT-free pass), which is
    * the honest trade SQ8 makes: memory shrinks 4×, scan cost stays
    * O(|corpus|·dim/4 bytes); compose with IVF lists when scan cost
    * matters too. Recall vs brute is spec-measured. */
  def sq8TopK(corpus: DataFrame, queries: DataFrame, k: Int,
              rerank: Int = 64): DataFrame = {
    val c8 = corpus.select(col("vec_id").as("n_id"),
      sq8Encode(col("embedding")).as("c8"))
    val q8 = queries.select(col("vec_id").as("q_id"),
      sq8Encode(col("embedding")).as("q8"))
    val approxDot = aggregate(zip_with(col("q8"), col("c8"),
      (x, y) => (x.cast("long")) * (y.cast("long"))), lit(0L), (acc, v) => acc + v)
    val wA = Window.partitionBy("q_id").orderBy(desc("approx"), col("n_id"))
    val shortlist = c8.crossJoin(broadcast(q8))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("approx", approxDot)
      .withColumn("rn", row_number().over(wA))
      .filter(col("rn") <= rerank)
      .select("q_id", "n_id")
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val w = Window.partitionBy("q_id").orderBy(desc("sim"), col("n_id"))
    shortlist.join(broadcast(q), "q_id").join(c, "n_id")
      .withColumn("sim", quantizedDot(col("q_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "sim")
  }

  /** Append a NEW batch to a persisted IVFPQ index WITHOUT re-training
    * (the daily-ingest half of the index lifecycle, paired with a
    * periodic [[writeIvfPqIndex]] rebuild): the batch is assigned to
    * the EXISTING centroids and codebooks — broadcast map-side work,
    * O(|batch|) — and its lists/codes/vectors rows append. Queries then
    * see base ∪ batch through the original model; model staleness is
    * the standard IVF trade (rebuild cadence), orthogonal to
    * correctness, and the assignment arithmetic is the same integer
    * path, so an appended index stays replay-oracle-able
    * (q_ann_index_append trains its CTEs on the base slice and
    * lists/codes the union). */
  def appendToIvfPqIndex(batch: DataFrame, dir: String,
                         m: Int = 8, dim: Int = 64): Unit = {
    val spark = batch.sparkSession
    val centroids = spark.read.parquet(s"$dir/centroids")
    val cb = spark.read.parquet(s"$dir/codebooks")
    assignClusters(batch, centroids)
      .write.mode("append").parquet(s"$dir/lists")
    pqAssign(pqSubvectors(batch, m, dim), cb)
      .write.mode("append").parquet(s"$dir/codes")
    batch.select("vec_id", "embedding")
      .write.mode("append").parquet(s"$dir/vectors")
  }

  /** Semantic dedup (the SemDeDup shape: arXiv:2303.09540): k-means the
    * embedding space, then prune near-duplicates ONLY within each cluster
    * — the all-pairs O(N²) becomes k independent O((N/k)²) blocks, the
    * third candidate-generation strategy next to hyperplane LSH
    * ([[nearDupPairsLsh]]) and banded MinHash (text-side `Dedup`).
    *
    * Deterministic contract: a vector is dropped iff some SMALLER-id
    * vector in its cluster has quantized cosine >= `tauQ` (greedy keep-
    * min-id; identical vectors always share a cluster, because identical
    * dots give the identical argmin centroid). Clusters come from
    * [[ivfCentroids]] — seeded by the k smallest vec_ids, integer
    * `sum div count` means — so the output is a pure function of the
    * corpus.
    *
    * Scale shape: clustering is broadcast-centroid map-side work; the
    * pair join shuffles on the cluster id, and k scales with the corpus
    * to bound each block (SemDeDup used k = O(√N) on LAION). Returns the
    * SURVIVORS (vec_id), one row per kept vector. */
  def semanticDedup(corpus: DataFrame, tauQ: Long,
                    nClusters: Int = 16, iters: Int = 2): DataFrame = {
    val centroids = ivfCentroids(corpus, nClusters, iters)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val member = assignClusters(corpus, centroids)
      .join(corpus.select(col("vec_id"), col("embedding")), "vec_id")
    val dropped = member.as("x").join(member.as("y"),
        col("x.cluster") === col("y.cluster") &&
          col("x.vec_id") < col("y.vec_id"))
      .filter(quantizedDot(col("x.embedding"), col("y.embedding")) >= tauQ)
      .select(col("y.vec_id").as("vec_id"))
      .distinct()
    corpus.select("vec_id").join(dropped, Seq("vec_id"), "left_anti")
  }

  /** Quantized mean-pooling: chunk embeddings → one parent embedding per
    * `groupCol` (doc from its chunks, doc from its frames — the step that
    * turns a chunk-level index into a doc-level one). Elements quantize to
    * floor(x·10⁶) longs FIRST (the QuantizedDot discipline), so per-
    * dimension sums are order-independent and the pooled vector is
    * hash-stable across engines and partitionings; mean_q is one integer
    * division.
    *
    * Output is the exploded form (group, dim, n_vecs, sum_q, mean_q) —
    * one row per dimension. Scale shape: posexplode → hash aggregate on
    * (group, dim); map-side combine collapses each group's chunks before
    * the shuffle, and no row ever carries more than 16 bytes of state.
    * (`array_agg(... ORDER BY dim)` back into vectors is one more
    * hash-free projection if a consumer needs arrays; comparisons and
    * oracles want the exploded form.) */
  def meanPoolQuantized(chunks: DataFrame, groupCol: String,
                        vecCol: String): DataFrame = {
    chunks
      .select(col(groupCol), posexplode(col(vecCol)).as(Seq("dim", "__x")))
      .groupBy(col(groupCol), col("dim").cast("long").as("dim"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(floor(col("__x").cast("double") * 1000000.0d).cast("long")).as("sum_q"))
      .select(col(groupCol), col("dim"), col("n_vecs"),
        col("sum_q"), expr("sum_q div n_vecs").as("mean_q"))
  }
}
