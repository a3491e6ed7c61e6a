package graft.plans

import java.io.File

import graft.SparkSpec
import org.apache.commons.io.FileUtils
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The advisor's contract, including the closing of the loop: building
  * and registering EXACTLY what it recommends makes every servable
  * workload query answer from the summary. */
class MvAdvisorSpec extends SparkSpec {

  import spark.implicits._

  private val root = "/root/repo/target/tmp/spec_mvadvisor"
  private val basePath = s"$root/afact_base.parquet"

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftPlanner.register(spark)
    FileUtils.deleteQuietly(new File(root))
    (1L to 500L).map(i => (s"k${i % 5}", s"s${i % 3}", i % 11, i % 7))
      .toDF("ka", "kb", "m1", "m2")
      .write.parquet(basePath)
  }

  override def afterAll(): Unit = {
    MvRewrite.clear()
    super.afterAll()
  }

  private def base = spark.read.parquet(basePath)

  test("candidate extraction: keys from groupings+filters+distincts, measures integral-only") {
    val c = MvAdvisor.candidate(
      base.filter(col("kb") === "s1").groupBy("ka")
        .agg(sum("m1").as("s"), count(lit(1)).as("n"),
          countDistinct("kb").as("d"))).get
    assert(c.base == "afact_base.parquet")
    assert(c.keys == Seq("ka", "kb")) // grouping + filter + distinct target
    assert(c.measures == Seq("m1"))   // COUNT(*) and DISTINCT add none
  }

  test("unservable shapes decline: join, expression grouping, nondeterministic filter") {
    assert(MvAdvisor.candidate(
      base.join(base.select(col("ka").as("ka2")), col("ka") === col("ka2"))
        .groupBy("ka").agg(sum("m1"))).isEmpty)
    assert(MvAdvisor.candidate(
      base.groupBy((col("m1") % 2).as("parity")).agg(sum("m2"))).isEmpty)
    assert(MvAdvisor.candidate(
      base.filter(rand() < 0.5).groupBy("ka").agg(sum("m1"))).isEmpty)
  }

  test("closing the loop: build what the advisor recommends and the workload rewrites") {
    // thunks: a Dataset memoizes its plan at creation, so the
    // from_mv probe and the rule-disabled ground truth each need a
    // FRESH frame built under the current registration state
    val workload = Seq[() => DataFrame](
      () => base.filter(col("kb") === "s1").groupBy("ka")
        .agg(sum("m1").as("s1")),
      () => base.groupBy("ka", "kb").agg(min("m2").as("mn"), avg("m1").as("av")),
      () => base.groupBy("kb").agg(count(lit(1)).as("n")))
    val rec = MvAdvisor.recommend(spark, workload.map(_())).collect()
    assert(rec.length == 1)
    val r = rec.head
    assert(r.getAs[String]("base") == "afact_base.parquet")
    assert(r.getAs[String]("view_keys") == "ka,kb")
    assert(r.getAs[String]("view_measures") == "m1,m2")
    assert(r.getAs[Long]("n_queries") == 3L)
    assert(r.getAs[Long]("est_rows") == 15L) // 5 ka × 3 kb, all present
    assert(r.getAs[Long]("base_rows") == 500L)
    assert(r.getAs[Boolean]("recommend"))
    // build + register EXACTLY the recommendation…
    val mvPath = s"$root/advised_mv.parquet"
    val keys = r.getAs[String]("view_keys").split(",").toSeq
    val measures = r.getAs[String]("view_measures").split(",").toSeq
    Mv.build(base, keys, measures, mvPath)
    Mv.register(spark, "advised", r.getAs[String]("base"), mvPath,
      keys, measures)
    try workload.foreach { mk =>
      // …and every workload query answers from the summary, correctly
      val q = mk()
      val plan = q.queryExecution.executedPlan.toString()
      assert(plan.contains("advised_mv") && !plan.contains("afact_base"),
        plan.take(2000))
      spark.conf.set("spark.graft.mvRewrite.enabled", "false")
      val want = try mk().collect().map(_.toSeq).toSet
      finally spark.conf.unset("spark.graft.mvRewrite.enabled")
      assert(q.collect().map(_.toSeq).toSet == want)
    } finally MvRewrite.deregister("advised")
  }
}
