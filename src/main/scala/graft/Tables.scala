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

  /** Timestamp columns vary by testdata vintage: TIMESTAMP(NANOS) reads as
    * `bigint` under nanosAsLong, TIMESTAMP(MICROS, utc=false) as
    * `timestamp_ntz`, adjusted-to-UTC as `timestamp` — all accepted; the
    * accessors normalize. */
  private val ts = Set("timestamp", "timestamp_ntz", "bigint")

  /** The schema FINGERPRINT each accessor asserts before handing the frame
    * to a query: column name -> accepted Spark `simpleString` types, in
    * table order. The driver regenerates the testdata between rounds and
    * has already changed timestamp physical units once — a renamed, added,
    * or retyped column must fail HERE with a named diff, not as an
    * unresolved-attribute analysis error three operators into a query. */
  private val expected: Map[String, Seq[(String, Set[String])]] = Map(
    "region" -> Seq("r_regionkey" -> Set("int"), "r_name" -> Set("string")),
    "nation" -> Seq("n_nationkey" -> Set("int"), "n_name" -> Set("string"),
      "n_regionkey" -> Set("int")),
    "customer" -> Seq("c_custkey" -> Set("bigint"), "c_name" -> Set("string"),
      "c_nationkey" -> Set("int"), "c_acctbal" -> Set("double"),
      "c_mktsegment" -> Set("string")),
    "supplier" -> Seq("s_suppkey" -> Set("bigint"), "s_name" -> Set("string"),
      "s_nationkey" -> Set("int"), "s_acctbal" -> Set("double")),
    "part" -> Seq("p_partkey" -> Set("bigint"), "p_name" -> Set("string"),
      "p_brand" -> Set("string"), "p_type" -> Set("string"),
      "p_size" -> Set("int"), "p_retailprice" -> Set("double")),
    "orders" -> Seq("o_orderkey" -> Set("bigint"), "o_custkey" -> Set("bigint"),
      "o_orderstatus" -> Set("string"), "o_totalprice" -> Set("double"),
      "o_orderdate" -> ts, "o_orderpriority" -> Set("string")),
    "lineitem" -> Seq("l_orderkey" -> Set("bigint"), "l_partkey" -> Set("bigint"),
      "l_suppkey" -> Set("bigint"), "l_linenumber" -> Set("int"),
      "l_quantity" -> Set("double"), "l_extendedprice" -> Set("double"),
      "l_discount" -> Set("double"), "l_tax" -> Set("double"),
      "l_returnflag" -> Set("string"), "l_linestatus" -> Set("string"),
      "l_shipdate" -> ts),
    "events" -> Seq("event_id" -> Set("bigint"), "ts" -> ts,
      "user_id" -> Set("bigint"), "event_type" -> Set("string"),
      "value" -> Set("double"), "props" -> Set("string")),
    "documents" -> Seq("doc_id" -> Set("bigint"), "text" -> Set("string"),
      "lang" -> Set("string"), "source" -> Set("string"),
      "n_chars" -> Set("bigint")),
    "embeddings" -> Seq("vec_id" -> Set("bigint"),
      "embedding" -> Set("array<float>"), "label" -> Set("int")))

  /** Assert `df`'s schema matches the fingerprint for `name`; the failure
    * message names exactly what moved (missing / unexpected / retyped
    * columns) so a new testdata vintage is a one-look diagnosis. Footer
    * metadata only — no data is read. */
  private def checkSchema(name: String, df: DataFrame): DataFrame = {
    expected.get(name).foreach { exp =>
      val actual = df.schema.fields.map(f => f.name -> f.dataType.simpleString)
      val actualNames = actual.map(_._1).toSeq
      val expNames = exp.map(_._1)
      val missing = expNames.diff(actualNames)
      val unexpected = actualNames.diff(expNames)
      val byName = exp.toMap
      val retyped = actual.collect {
        case (n, t) if byName.contains(n) && !byName(n).contains(t) =>
          s"$n: $t (expected ${byName(n).mkString("|")})"
      }
      if (missing.nonEmpty || unexpected.nonEmpty || retyped.nonEmpty)
        throw new IllegalStateException(
          s"schema drift in table '$name': " +
            s"missing=${missing.mkString("[", ",", "]")} " +
            s"unexpected=${unexpected.mkString("[", ",", "]")} " +
            s"retyped=${retyped.mkString("[", ",", "]")} — the testdata " +
            "vintage changed; update Tables.expected (and any affected " +
            "accessor normalization) deliberately")
    }
    df
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    checkSchema(name, spark.read.parquet(s"$sfDir/$name.parquet"))

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
