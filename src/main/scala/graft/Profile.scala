package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Stage-level profiling of the near-dup pipelines at a given sf — times
  * each phase separately so the bottleneck is visible instead of guessed,
  * and dumps the corpus similarity geometry (true-pair Jaccard vs shingle-
  * simhash Hamming) that the banding parameters are tuned against.
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

    // ── minhash stages on the pipeline's own persisted frames
    val signed = Dedup.minHashSignatures(docs, "doc_id", "text", 5, 64)
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("mh sign")(signed.count())
    val pairs = Dedup.candidatePairs(
        Dedup.lshBands(signed, "doc_id", "sig", 16), "doc_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    println(s"[profile] mh candidates = ${t("mh band+join")(pairs.count())}")
    val verified = Dedup.verifyPairsExact(docs, "doc_id", "text", pairs, 5, 0.5)
      .persist(StorageLevel.MEMORY_AND_DISK)
    println(s"[profile] mh verified = ${t("mh verify")(verified.count())}")
    spark.catalog.clearCache()

    // ── end-to-end, fresh caches, as Bench measures them
    t("minhash e2e")(Dedup.minHashNearDups(docs, "doc_id", "text")
      .write.format("noop").mode("overwrite").save())
    spark.catalog.clearCache()
    t("simhash e2e")(Dedup.simHashNearDups(docs, "doc_id", "text")
      .write.format("noop").mode("overwrite").save())
    spark.catalog.clearCache()

    // ── similarity geometry: true pairs' (exact J × shingle-simhash
    //    Hamming) — the data behind the bandBits/hammingMax defaults.
    //    Printed via collect (console truncation can't hide rows).
    val simShg = docs
      .filter(size(split(trim(col("text")), "\\s+")) >= 5)
      .select(col("doc_id"),
        call_function("simhash64", Dedup.shingleHashes(col("text"), 5)).as("simhash"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val verified2 = Dedup.minHashNearDups(docs, "doc_id", "text")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val g = verified2
      .join(simShg.select(col("doc_id").as("id_a"), col("simhash").as("h_a")), "id_a")
      .join(simShg.select(col("doc_id").as("id_b"), col("simhash").as("h_b")), "id_b")
      .select(col("jac"), bit_count(col("h_a").bitwiseXOR(col("h_b"))).as("ham"))
    g.groupBy((floor(col("jac") * 10) / 10).as("j_bin"))
      .agg(count(lit(1)).as("n"), min("ham").as("ham_min"),
        max("ham").as("ham_max"), avg("ham").as("ham_avg"))
      .orderBy("j_bin").collect()
      .foreach(r => println(s"[profile] jbin=${r.get(0)} n=${r.get(1)} " +
        s"ham_min=${r.get(2)} ham_max=${r.get(3)} ham_avg=${r.get(4)}"))
    spark.stop()
  }
}
