package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication family for the LLM-data-pipeline surface: exact
  * (fingerprint hash-groupBy), MinHash+LSH banded near-dup, SimHash.
  *
  * Scale shape: every operator is a hash-partitioned groupBy/equi-join on a
  * short key (16-byte digest, 8-byte band hash, 8-byte simhash chunk) —
  * never an all-pairs comparison, never a driver-side collect. Candidate
  * pairs are verified with exact Jaccard before being reported, so LSH
  * recall/precision tuning can't produce false positives.
  */
object Dedup {

  /** Exact dedup: group by content fingerprint, keep the smallest id
    * (deterministic keep-first, SURVEY §7.5). Output:
    * (fingerprint, keeper_id, n_copies). */
  def exactByFingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("fp", TextFns.fingerprint(col(textCol)))
      .groupBy("fp")
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature expression: for each of `numHashes` seeded xxhash64
    * functions, the min over the shingle array. NOTE: only for small/test
    * use — inside a query plan, projection collapse inlines the shingle
    * construction into every one of the 64 lambdas (and again per band),
    * recomputing it ~10³× per row. Use `minHashSignatures` (the
    * aggregation form) in pipelines. */
  def minHashSignature(shingles: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingles, s => xxhash64(i, s))))

  /** MinHash signatures as a distributed aggregation: explode shingles,
    * one hash per (row, seed), map-side partial min, groupBy id. One pass
    * over the data, one shuffle on the id — the aggregation barrier also
    * stops Catalyst from inlining shingle construction into each seed.
    * Output: (idCol, sig array<long>). */
  def minHashSignatures(df: DataFrame, idCol: String, textCol: String,
                        shingleSize: Int, numHashes: Int): DataFrame = {
    val exploded = df.select(col(idCol),
      explode(TextFns.shingles(col(textCol), shingleSize)).as("s"))
    val mins = (0 until numHashes).map(i => min(xxhash64(lit(i), col("s"))).as(s"m$i"))
    exploded.groupBy(col(idCol))
      .agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** LSH banding: split the signature into `bands` bands and hash each —
    * docs sharing any band hash become candidates. Returns
    * (idCol, band, band_hash), one row per band. */
  def lshBands(df: DataFrame, idCol: String, sigCol: String, bands: Int): DataFrame = {
    // `/` on Columns is DOUBLE division — a fractional rowsPerBand would
    // silently overlap/skip signature positions; floor to int and let
    // minHashNearDups enforce divisibility up front
    val rowsPerBand = floor(size(col(sigCol)) / bands).cast("int")
    df.select(col(idCol),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(b, slice(col(sigCol), b * rowsPerBand + 1, rowsPerBand)))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")
  }

  /** Candidate pairs from banded signatures: equi-join on (band, band_hash),
    * `a < b` to orient, distinct to collapse multi-band hits. The join key
    * is 12 bytes — this is the shuffle, and the only one. */
  def candidatePairs(bandsDf: DataFrame, idCol: String): DataFrame = {
    val a = bandsDf.select(col(idCol).as("id_a"), col("band"), col("band_hash"))
    val b = bandsDf.select(col(idCol).as("id_b"), col("band"), col("band_hash"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact Jaccard between two pre-deduplicated shingle arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter.cast("double") / (size(a) + size(b) - inter)
  }

  /** Full MinHash/LSH near-dup pipeline over (idCol, textCol):
    * shingle → sign → band → candidate join → exact-Jaccard verify ≥ tau.
    * Output: (id_a, id_b, jac), one row per verified near-dup pair.
    *
    * With numHashes=64, bands=16 (4 rows/band) the miss probability for a
    * true pair at J=0.8 is (1-0.8⁴)¹⁶ ≈ 2e-4, and at J=0.9 ≈ 3e-8 — the
    * verify step then makes reported pairs exact.
    */
  /** Estimated Jaccard from two MinHash signatures: fraction of agreeing
    * positions. 64 long comparisons — ~100× cheaper than an exact
    * set-intersect on shingle arrays. */
  def estimatedJaccard(sigA: Column, sigB: Column): Column =
    aggregate(zip_with(sigA, sigB, (a, b) => when(a === b, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / size(sigA)

  def minHashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 5, numHashes: Int = 64, bands: Int = 16,
      tau: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0,
      s"numHashes ($numHashes) must be divisible by bands ($bands) — " +
        "fractional banding skips signature positions")
    val shingled = df
      .select(col(idCol), TextFns.shingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // aggregation form: the agg barrier materializes sig once — the
    // projection form re-inlined shingling into every band slice
    // (measured at sf0.1: bands 177s → sub-second)
    val signed = minHashSignatures(df, idCol, textCol, shingleSize, numHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = candidatePairs(lshBands(signed, idCol, "sig", bands), idCol)
    // Band collisions at moderate background similarity produce far more
    // candidates than true pairs (word-soup corpora: ~1M candidates for
    // ~10 true pairs at sf0.1). Verify in two stages: signature-estimate
    // prune at tau - 3σ (σ = √(τ(1-τ)/H) ≈ 0.06 → no real pair lost),
    // then exact Jaccard only on survivors.
    val sigEst = signed.select(col(idCol), col("sig"))
    val estCut = math.max(0.0, tau - 3 * math.sqrt(tau * (1 - tau) / numHashes))
    val estimated = pairs
      .join(sigEst.select(col(idCol).as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigEst.select(col(idCol).as("id_b"), col("sig").as("sig_b")), "id_b")
      .filter(estimatedJaccard(col("sig_a"), col("sig_b")) >= estCut)
      .select("id_a", "id_b")
    val left = shingled.select(col(idCol).as("id_a"), col("sh").as("sh_a"))
    val right = shingled.select(col(idCol).as("id_b"), col("sh").as("sh_b"))
    estimated.join(left, "id_a").join(right, "id_b")
      .withColumn("jac", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jac") >= tau)
      .select("id_a", "id_b", "jac")
  }

  /** 64-bit SimHash, computed distributively: explode token hashes, one
    * partial-aggregating groupBy with 64 signed bit-counters, reassemble.
    * Scales as a single map-side-combined shuffle on the id. */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hashed = df.select(col(idCol),
        explode(TextFns.tokens(col(textCol))).as("tok"))
      .select(col(idCol), xxhash64(col("tok")).as("h"))
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"b$j")
    }
    val assembled = (0 until 64)
      .map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    hashed.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
      .select(col(idCol), assembled.as("simhash"))
  }

  /** SimHash near-dup candidates: band the 64-bit simhash into eight 8-bit
    * chunks; docs sharing any chunk are candidates (Hamming ≤ 7 guarantee
    * by pigeonhole — unigram simhashes of near-identical word-soup docs
    * land at Hamming 4-8, so 16-bit bands missed real pairs) — then
    * exact-verify like MinHash. */
  /** @param bandBits width of each simhash band. Candidates scale as
    *                  O(n²/2^bandBits) per band — widen with log₂(corpus):
    *                  8 suits ~10³-10⁴ docs, 16 suits ~10⁶+. Must divide 64.
    * @param hammingMax full-simhash Hamming cutoff before the exact verify.
    *                   SimHash recall is inherently approximate for mid-J
    *                   pairs; measured on the sf0.1 corpus: true J≥0.3
    *                   pairs sit at Hamming 0-12 concentrated ≤4, while
    *                   candidates grow 10× between cutoff 8 (92k) and 12
    *                   (951k). Strong pairs (J≥0.9, the dedup targets) sit
    *                   at Hamming ≤3 — the default 8 keeps them with wide
    *                   margin at a tenth of the verify cost. */
  def simHashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 5, tau: Double = 0.5, bandBits: Int = 8,
      hammingMax: Int = 8): DataFrame = {
    // Both subtrees feed a self-join plus verification joins — without a
    // barrier the shingle projection and the simhash aggregation re-run
    // once per consumer (3× each; measured 83 s → 9 s at sf0.1). The
    // cached tables are id + one long / one small array per doc — at
    // 100 TB this is the (tiny) signature table, not the corpus.
    val sh = df.select(col(idCol), TextFns.shingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sim = simHash(df, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nBands = 64 / bandBits
    val mask = (1L << bandBits) - 1
    val banded = sim.select(col(idCol),
        posexplode(array((0 until nBands).map(b =>
          shiftright(col("simhash"), b * bandBits).bitwiseAND(lit(mask))): _*)))
      .select(col(idCol), col("pos").as("band"), col("col").as("band_hash"))
    val pairs = candidatePairs(banded, idCol)
    // 8-bit bands collide freely at corpus scale (256 values/band), so
    // candidates ≫ true pairs. Prune with the full-simhash Hamming
    // distance (two longs, a popcount — trivially cheap) before the
    // exact-Jaccard verify touches shingle arrays.
    val hams = sim.select(col(idCol), col("simhash"))
    val prefiltered = pairs
      .join(hams.select(col(idCol).as("id_a"), col("simhash").as("h_a")), "id_a")
      .join(hams.select(col(idCol).as("id_b"), col("simhash").as("h_b")), "id_b")
      .filter(bit_count(col("h_a").bitwiseXOR(col("h_b"))) <= hammingMax)
      .select("id_a", "id_b")
    prefiltered
      .join(sh.select(col(idCol).as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jac", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jac") >= tau)
      .select("id_a", "id_b", "jac")
  }

  /** Brute-force n-gram Jaccard pairs — the small-data oracle baseline the
    * LSH paths are tested against (never the 100 TB path; documented as
    * such). */
  def bruteForceJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int, tau: Double): DataFrame = {
    val sh = df.select(col(idCol), TextFns.shingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
    val a = sh.select(col(idCol).as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col(idCol).as("id_b"), col("sh").as("sh_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("jac", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jac") >= tau)
      .select("id_a", "id_b", "jac")
  }
}
