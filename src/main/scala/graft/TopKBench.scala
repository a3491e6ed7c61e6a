package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Micro-bench: native WindowGroupLimit path vs the custom TopKPerKey
  * operator on the rank-limit idiom, same data, alternating runs. */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.create(32)
    spark.sparkContext.setLogLevel("WARN")
    // GraftSession pre-registers the planner — strip it so the "native"
    // runs actually measure the WindowGroupLimit path
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == graft.plans.RankLimitRewrite)
    spark.experimental.extraStrategies =
      spark.experimental.extraStrategies.filterNot(_ == graft.plans.TopKPerKeyStrategy)

    def q() = {
      val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), col("o_orderkey"))
      Tables.orders(spark, sfDir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    }
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[topk] $label%-10s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    // warm-up
    q().write.format("noop").mode("overwrite").save()
    (1 to 3).foreach { i =>
      time(s"native-$i")(q().write.format("noop").mode("overwrite").save())
      graft.plans.GraftPlanner.register(spark)
      time(s"custom-$i")(q().write.format("noop").mode("overwrite").save())
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == graft.plans.RankLimitRewrite)
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies.filterNot(_ == graft.plans.TopKPerKeyStrategy)
    }
    spark.stop()
  }
}
