package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profiling of the near-dup pipelines at a given sf — times
  * each phase separately so the bottleneck is visible instead of guessed,
  * and dumps the corpus similarity geometry (true-pair Jaccard vs simhash
  * Hamming) that the banding parameters are tuned against.
  * `runMain graft.Profile <sfDir>`. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.create(32)
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    val docs = Tables.documents(spark, sfDir)
    println(s"[profile] docs = ${docs.count()}")

    val hashed = Dedup.hashedShingleRows(docs, "doc_id", "text", 5)
    t("hash-shingle")(hashed.write.format("noop").mode("overwrite").save())

    val signed = Dedup.minHashSignatures(docs, "doc_id", "text", 5, 64)
    t("shingle+sign")(signed.write.format("noop").mode("overwrite").save())

    val bands = Dedup.lshBands(signed, "doc_id", "sig", 16)
    val pairs = Dedup.candidatePairs(bands, "doc_id")
    println(s"[profile] minhash candidates = ${t("candidate pairs")(pairs.count())}")

    val full = Dedup.minHashNearDups(docs, "doc_id", "text")
    println(s"[profile] minhash verified = ${t("minhash full")(full.count())}")
    spark.catalog.clearCache()

    val simFull = Dedup.simHashNearDups(docs, "doc_id", "text", shingleSize = 5, tau = 0.3)
    println(s"[profile] simhash verified = ${t("simhash full")(simFull.count())}")
    spark.catalog.clearCache()

    // ── similarity geometry: exact J (brute force) × simhash Hamming for
    //    every pair above background — the data behind bandBits/hammingMax
    val brute = Dedup.bruteForceJaccardPairs(docs, "doc_id", "text", 5, 0.25)
    val sim = Dedup.simHash(docs, "doc_id", "text")
    val joined = brute
      .join(sim.select(col("doc_id").as("id_a"), col("simhash").as("h_a")), "id_a")
      .join(sim.select(col("doc_id").as("id_b"), col("simhash").as("h_b")), "id_b")
      .select(col("id_a"), col("id_b"), col("jac"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).as("ham"))
      .persist()
    println("[profile] true-pair geometry (J>=0.25): jac decile x hamming")
    joined.groupBy((floor(col("jac") * 10) / 10).as("j_bin"))
      .agg(count(lit(1)).as("n"), min("ham").as("ham_min"),
        max("ham").as("ham_max"), expr("percentile(ham, 0.5)").as("ham_med"))
      .orderBy("j_bin").show(50, truncate = false)
    println("[profile] pairs J>=0.5 with hamming > 6:")
    joined.filter(col("jac") >= 0.5 && col("ham") > 6).show(50, truncate = false)

    // simhash banding candidate volume at 8-bit bands, by hamming cutoff
    val banded = sim.select(col("doc_id"),
      posexplode(array((0 until 8).map(b =>
        shiftright(col("simhash"), b * 8).bitwiseAND(lit(255L))): _*)))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("band_hash"))
    val cand = Dedup.candidatePairs(banded, "doc_id")
      .join(sim.select(col("doc_id").as("id_a"), col("simhash").as("h_a")), "id_a")
      .join(sim.select(col("doc_id").as("id_b"), col("simhash").as("h_b")), "id_b")
      .select(bit_count(col("h_a").bitwiseXOR(col("h_b"))).as("ham"))
      .persist()
    println(s"[profile] simhash raw candidates = ${cand.count()}")
    Seq(4, 6, 7, 8, 12).foreach { c =>
      println(s"[profile] simhash candidates ham<=$c = ${cand.filter(col("ham") <= c).count()}")
    }
    spark.stop()
  }
}
