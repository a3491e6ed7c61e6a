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

  test("histogram quantile sketch: within one grid cell of exact, layout-invariant") {
    import graft.functions.HistogramQuantileAgg
    val li = Tables.lineitem(spark, sfDir)
    val w = 110000.0 / 4096
    val sketch = udaf(new HistogramQuantileAgg(0.0, 110000.0, 4096, Seq(0.5, 0.9, 0.99)))
    def run(df: org.apache.spark.sql.DataFrame): Seq[Double] =
      df.agg(sketch($"l_extendedprice").as("qs")).head().getSeq[Double](0)
    val est = run(li)
    val exact = li.agg(
      expr("percentile(l_extendedprice, 0.5)"),
      expr("percentile(l_extendedprice, 0.9)"),
      expr("percentile(l_extendedprice, 0.99)")).head()
    Seq(0, 1, 2).foreach { i =>
      val err = math.abs(est(i) - exact.getDouble(i))
      info(f"q${Seq(50, 90, 99)(i)}: sketch=${est(i)}%.2f exact=${exact.getDouble(i)}%.2f err=$err%.2f (cell $w%.2f)")
      assert(err <= w, s"quantile $i off by $err > cell width $w")
    }
    assert(run(li.repartition(13)) === est, "layout must not change the sketch")
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

  test("runtime bloom filter prunes the probe side of a selective join") {
    // a selective dimension filter should inject a bloom filter on the
    // fact-side scan (runtime row-group pruning at 100 TB); thresholds are
    // scaled down to the test tables
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    def join() = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir).filter($"o_orderpriority" === "1-URGENT"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val df = join()
      val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.toLowerCase.contains("bloom"),
        s"no runtime bloom filter injected:\n${optimized.take(2000)}")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      assert(join().collect().map(r => (r.getString(0), r.getLong(1))).toSet === got)
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
