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

  /** Exploded long-hash shingle rows (idCol, h): each n-token window is
    * hashed ONCE via xxhash64 over the token slice — no per-shingle string
    * building and no re-hashing of text per MinHash seed. Distinctness is
    * taken on the 64-bit hashes; a collision (birthday odds ~1e-7 at 10⁶
    * distinct shingles) only perturbs candidate recall, never the exact
    * verify. */
  def hashedShingleRows(df: DataFrame, idCol: String, textCol: String,
                        n: Int): DataFrame = {
    val ws = TextFns.tokens(col(textCol))
    val hs = when(size(ws) >= n,
      array_distinct(transform(sequence(lit(1), size(ws) - (n - 1)),
        i => xxhash64(slice(ws, i, lit(n))))))
      .otherwise(array().cast("array<long>"))
    df.select(col(idCol), explode(hs).as("h"))
  }

  /** MinHash signatures as a distributed aggregation over pre-hashed
    * shingle rows: the i-th hash function is a seeded re-hash of the one
    * 8-byte base hash (xxhash64(i, h) — fixed-width input), so a signature
    * costs 64 constant-size hashes per shingle instead of 64 full string
    * hashes. (Kirsch–Mitzenmacher h+i·h2 would be cheaper still, but long
    * overflow wraps are an error under ANSI mode, Spark 4's default.)
    * Map-side partial min, one shuffle on the id; the aggregation barrier
    * also stops Catalyst from inlining shingle construction into each seed
    * (projection collapse measured at ~10³× recompute).
    * Output: (idCol, sig array<long>). */
  def minHashSignaturesFromHashes(hashed: DataFrame, idCol: String,
                                  numHashes: Int): DataFrame = {
    val mins = (0 until numHashes)
      .map(i => min(xxhash64(lit(i), col("h"))).as(s"m$i"))
    hashed.groupBy(col(idCol))
      .agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** MinHash signatures straight from (idCol, textCol). */
  def minHashSignatures(df: DataFrame, idCol: String, textCol: String,
                        shingleSize: Int, numHashes: Int): DataFrame =
    minHashSignaturesFromHashes(
      hashedShingleRows(df, idCol, textCol, shingleSize), idCol, numHashes)

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

  /** Exact string-shingle verification of candidate pairs: build string
    * shingles ONLY for docs that appear in a candidate pair (a left-semi
    * join — the candidate set is tiny relative to the corpus by LSH
    * construction), join both sides onto the pairs, keep exact
    * Jaccard ≥ tau. Shared by the MinHash and SimHash pipelines so both
    * report exact, byte-identical-to-brute-force pairs. */
  private def verifyPairsExact(
      df: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, shingleSize: Int, tau: Double): DataFrame = {
    val candIds = pairs.select(col("id_a").as(idCol))
      .union(pairs.select(col("id_b").as(idCol))).distinct()
    // candIds is small by construction → broadcast semi-join, so the
    // corpus is never shuffled; shingles are computed for candidate docs
    // only. (At a pathological dup-rate where candidates ≈ corpus, drop
    // the hint and let AQE pick the join.)
    val candSh = df.join(broadcast(candIds), Seq(idCol), "left_semi")
      .select(col(idCol), TextFns.shingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
    pairs
      .join(candSh.select(col(idCol).as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(candSh.select(col(idCol).as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jac", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jac") >= tau)
      .select("id_a", "id_b", "jac")
  }

  /** Full MinHash/LSH near-dup pipeline over (idCol, textCol):
    * hash-shingle → sign → band → candidate equi-join → exact-Jaccard
    * verify ≥ tau. Output: (id_a, id_b, jac), one row per verified
    * near-dup pair.
    *
    * With numHashes=64, bands=16 (4 rows/band) the miss probability for a
    * true pair at J=0.8 is (1-0.8⁴)¹⁶ ≈ 2e-4, and at J=0.9 ≈ 3e-8 — the
    * verify step then makes reported pairs exact. Every candidate goes
    * straight to the exact verify (no signature-estimate prune: it saved
    * little once candidates were measured in the hundreds, and its
    * probabilistic cut could drop a borderline true pair).
    */
  def minHashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 5, numHashes: Int = 64, bands: Int = 16,
      tau: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0,
      s"numHashes ($numHashes) must be divisible by bands ($bands) — " +
        "fractional banding skips signature positions")
    // persisted: the band table feeds both sides of the candidate
    // self-join (id + 64 longs per doc — the signature table, not the
    // corpus; exchange reuse would cover it, but an explicit persist
    // doesn't depend on plan canonicalization)
    val signed = minHashSignatures(df, idCol, textCol, shingleSize, numHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // persisted: consumed by the candidate-id semi-join and the verify join
    val pairs = candidatePairs(lshBands(signed, idCol, "sig", bands), idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    verifyPairsExact(df, idCol, textCol, pairs, shingleSize, tau)
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
    // The simhash table feeds a self-join plus the Hamming prefilter —
    // without a barrier the aggregation re-runs once per consumer
    // (measured 83 s → 9 s at sf0.1). The cached table is id + one long
    // per doc — at 100 TB this is the (tiny) signature table, not the
    // corpus.
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
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    verifyPairsExact(df, idCol, textCol, prefiltered, shingleSize, tau)
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
