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
