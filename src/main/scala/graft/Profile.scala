package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profiling of the near-dup pipeline at a given sf — times
  * each phase separately so the bottleneck is visible instead of guessed.
  * `runMain graft.Profile <sfDir>`. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.create(32)
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFns
    import graft.operators.Dedup

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    val docs = Tables.documents(spark, sfDir)
    println(s"[profile] docs = ${docs.count()}")

    val shingled = docs
      .select(col("doc_id"), TextFns.shingles(col("text"), 5).as("sh"))
      .filter(size(col("sh")) > 0)
    t("shingle")(shingled.write.format("noop").mode("overwrite").save())

    val signed = Dedup.minHashSignatures(docs, "doc_id", "text", 5, 64)
    t("shingle+sign")(signed.write.format("noop").mode("overwrite").save())

    val bands = Dedup.lshBands(signed, "doc_id", "sig", 16)
    t("bands")(bands.write.format("noop").mode("overwrite").save())

    val pairs = Dedup.candidatePairs(bands, "doc_id")
    val nPairs = t("candidate pairs")(pairs.count())
    println(s"[profile] candidates = $nPairs")

    val full = Dedup.minHashNearDups(docs, "doc_id", "text")
    val nOut = t("full pipeline")(full.count())
    println(s"[profile] verified pairs = $nOut")
    spark.stop()
  }
}
