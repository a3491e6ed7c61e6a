package graft.plans

import java.io.File

import graft.SparkSpec
import org.apache.commons.io.FileUtils
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Behavior specs for the materialized-view auto-rewrite: answered-from-
  * summary equality, the scan really switching to the view, and every
  * soundness gate falling through to the base table.
  */
class MvRewriteSpec extends SparkSpec {

  import spark.implicits._

  private val root = "/root/repo/target/tmp/spec_mv"
  private val basePath = s"$root/facts_base.parquet"
  private val mvPath = s"$root/facts_mv.parquet"

  private def scanPaths(df: DataFrame): String =
    df.queryExecution.executedPlan.toString()

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftPlanner.register(spark)
    FileUtils.deleteQuietly(new File(root))
    // 3 keys × values, integral measures; written as the "fact table"
    val base = (1L to 400L).map(i =>
      (s"k${i % 4}", s"s${i % 3}", i % 10, i)).toDF("ka", "kb", "m", "id")
    base.write.parquet(basePath)
    Mv.build(spark.read.parquet(basePath), Seq("ka", "kb"), Seq("m"), mvPath)
    Mv.register(spark, "facts", "facts_base.parquet", mvPath,
      Seq("ka", "kb"), Seq("m"))
  }

  override def afterAll(): Unit = {
    MvRewrite.clear()
    super.afterAll()
  }

  private def baseDf = spark.read.parquet(basePath)

  test("a subset group-by answers from the view — and answers correctly") {
    val q = baseDf.groupBy("ka")
      .agg(sum("m").as("sm"), count(lit(1)).as("n"))
    val plan = scanPaths(q)
    assert(plan.contains("facts_mv"), plan.take(2000))
    assert(!plan.contains("facts_base"), plan.take(2000))
    // ground truth computed with the rule disabled
    spark.conf.set("spark.graft.mvRewrite.enabled", "false")
    val want = baseDf.groupBy("ka")
      .agg(sum("m").as("sm"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    spark.conf.unset("spark.graft.mvRewrite.enabled")
    val got = q.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("key-column filters ride the view; non-key filters fall through") {
    val onKey = baseDf.filter(col("kb") =!= "s0").groupBy("ka")
      .agg(sum("m").as("sm"))
    assert(scanPaths(onKey).contains("facts_mv"))
    spark.conf.set("spark.graft.mvRewrite.enabled", "false")
    val want = baseDf.filter(col("kb") =!= "s0").groupBy("ka")
      .agg(sum("m").as("sm")).collect().map(r => (r.getString(0), r.getLong(1))).toSet
    spark.conf.unset("spark.graft.mvRewrite.enabled")
    assert(onKey.collect().map(r => (r.getString(0), r.getLong(1))).toSet == want)

    // m is a measure, not a key: filtering on it must scan the base
    val onMeasure = baseDf.filter(col("m") > 5).groupBy("ka")
      .agg(sum("m").as("sm"))
    assert(scanPaths(onMeasure).contains("facts_base"))
  }

  test("unanswerable shapes fall through: non-key grouping, non-sum aggs, distinct") {
    val badGroup = baseDf.groupBy("m").agg(count(lit(1)).as("n"))
    assert(scanPaths(badGroup).contains("facts_base"))
    val badAgg = baseDf.groupBy("ka").agg(max("m").as("mx"))
    assert(scanPaths(badAgg).contains("facts_base"))
    val distinct = baseDf.groupBy("ka").agg(countDistinct("m").as("nd"))
    assert(scanPaths(distinct).contains("facts_base"))
    val unregistered = baseDf.groupBy("ka").agg(sum("id").as("si"))
    assert(scanPaths(unregistered).contains("facts_base"))
  }

  test("the kill switch and a global COUNT over an empty base behave") {
    spark.conf.set("spark.graft.mvRewrite.enabled", "false")
    try assert(scanPaths(baseDf.groupBy("ka").agg(sum("m").as("s")))
      .contains("facts_base"))
    finally spark.conf.unset("spark.graft.mvRewrite.enabled")

    // empty base: COUNT must stay 0, not NULL (the coalesce contract)
    val emptyBase = s"$root/empty_base.parquet"
    val emptyMv = s"$root/empty_mv.parquet"
    Seq.empty[(String, Long)].toDF("k", "m").write.parquet(emptyBase)
    Mv.build(spark.read.parquet(emptyBase), Seq("k"), Seq("m"), emptyMv)
    Mv.register(spark, "empty", "empty_base.parquet", emptyMv, Seq("k"), Seq("m"))
    val q = spark.read.parquet(emptyBase).agg(count(lit(1)).as("n"))
    assert(scanPaths(q).contains("empty_mv"))
    assert(q.head().getLong(0) == 0L)
    MvRewrite.deregister("empty")
  }

  test("build refuses non-integral measures") {
    intercept[IllegalArgumentException] {
      Mv.build(Seq((1.0, "a")).toDF("d", "k"), Seq("k"), Seq("d"), s"$root/bad_mv")
    }
  }
}
