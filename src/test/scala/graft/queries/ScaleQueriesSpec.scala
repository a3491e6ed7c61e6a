package graft.queries

import graft.{SparkSpec, Tables}
import graft.functions.HllAggregator
import org.apache.spark.sql.functions._

class ScaleQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("HLL aggregator estimates within 5% of exact on several columns") {
    val hll = udaf(new HllAggregator(11))
    val li = Tables.lineitem(spark, sfDir)
    Seq("l_partkey", "l_suppkey", "l_orderkey").foreach { c =>
      val row = li.agg(
        countDistinct(col(c)).as("exact"),
        hll(col(c)).as("est")).head()
      val exact = row.getLong(0)
      val est = row.getLong(1)
      val err = math.abs(est - exact).toDouble / exact
      info(f"$c: exact=$exact est=$est err=${err * 100}%.2f%%")
      assert(err < 0.05, s"$c estimate $est vs exact $exact")
    }
  }

  test("HLL estimate is deterministic across partition layouts") {
    val hll = udaf(new HllAggregator(11))
    val li = Tables.lineitem(spark, sfDir).select("l_partkey")
    val a = li.repartition(3).agg(hll($"l_partkey")).head().getLong(0)
    val b = li.repartition(17).agg(hll($"l_partkey")).head().getLong(0)
    val c = li.coalesce(1).agg(hll($"l_partkey")).head().getLong(0)
    assert(a === b)
    assert(b === c)
  }

  test("AQE splits a skewed join partition at runtime, result unchanged") {
    // 90% of the left rows share one key — the shape where a static plan
    // funnels one task. With skew-join thresholds scaled to the test data,
    // AQE must split that partition (SortMergeJoin(skew=true)) and the
    // result must equal the static plan's.
    // probe ends in a GLOBAL aggregate: a per-key groupBy on the join key
    // would impose a hash distribution on the join output, which makes
    // OptimizeSkewedJoin decline (splitting would break the guarantee) —
    // that refusal is itself correct behavior, but not what this test shows
    def skewedJoin() = {
      val left = spark.range(200000)
        .select(when($"id" < 180000, 0L).otherwise($"id" % 1000).as("k"), $"id".as("v"))
      val right = spark.range(1000).select($"id".as("k"), ($"id" * 2).as("w"))
      left.join(right, "k").agg(count(lit(1)).as("n"), sum($"v" + $"w").as("s"))
    }
    val aqeConfs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = aqeConfs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      aqeConfs.foreach { case (k, v) => spark.conf.set(k, v) }
      val adaptive = skewedJoin()
      val aRow = adaptive.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val plan = adaptive.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"no skew-split in adaptive plan:\n${plan.take(2000)}")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val sRow = skewedJoin().collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(aRow === sRow)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed join shuffles on neither join key") {
    // force a non-broadcast join so bucketing (not broadcast) is what
    // avoids the shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val fn = ScaleQueries.all.find(_.name == "q_bucketed_join").get.fn
      val df = fn(spark, sfDir)
      df.collect() // materialize bucket tables + final plan
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(800))
      // groupBy/orderBy exchanges are expected; an exchange partitioned on
      // either JOIN key would mean bucketing failed
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey"), plan.take(1500))
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey"), plan.take(1500))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
