package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided synthetic tables (TESTDATA.md).
  *
  * All engine queries take an `sfDir` (e.g. /root/testdata/sf0.01) and read
  * the parquet tables from it. At cluster scale these would be catalog tables
  * (partitioned / bucketed parquet); the loader shape is the same either way —
  * `spark.read.parquet` gives Catalyst a pushdown-capable columnar scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, d: String): DataFrame     = load(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame     = load(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame   = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame   = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame       = load(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame     = load(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame   = load(spark, d, "lineitem")
  /** events.ts normalized to a real (LTZ) TimestampType whatever the
    * testdata generation wrote:
    *  - TIMESTAMP(NANOS) reads as a long (nanosAsLong=true, set in
    *    Verify/Bench/tests) → integer ns→µs division — `div` (not `/`)
    *    because ns-epoch values exceed 2^53 and a double round-trip would
    *    lose precision; truncation matches DuckDB's own ns→µs read;
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) reads as TIMESTAMP_NTZ
    *    → cast to TIMESTAMP (exact under the UTC session, and functions
    *    like unix_micros only accept the LTZ type). */
  def events(spark: SparkSession, d: String): DataFrame = {
    val raw = load(spark, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, d: String): DataFrame  = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")

  /** Register every table as a temp view so `spark.sql(...)` works — the
    * SQL entry point (SURVEY §3.2): the reference delegates ad-hoc SQL to
    * Postgres; we delegate to Catalyst over the same logical schema. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
