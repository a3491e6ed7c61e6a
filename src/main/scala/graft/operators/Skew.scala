package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling aggregation (builder brief: "salting for skew").
  *
  * A hot grouping key sends its whole group through one reducer; AQE's
  * skew-join split covers joins but not aggregations. Salting splits each
  * key into `saltFactor` subkeys for a partial aggregate, then merges the
  * partials — the classic two-phase shape. Only works for aggregates with
  * a partial/merge decomposition; sums/counts/min/max are provided.
  */
object Skew {

  /** Two-phase salted sum/count aggregation.
    *
    * @param sums (outputName, column) pairs aggregated as exact sums
    *             (cast your doubles to DECIMAL first if you need
    *             order-independent results — see QueryDef's discipline)
    * @return one row per key: the requested sums plus `cnt`
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String],
                     sums: Seq[(String, Column)], saltFactor: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltFactor)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__cnt"),
        sums.map { case (n, c) => sum(c).as(s"__s_$n") }: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__cnt")).as("cnt"),
        sums.map { case (n, _) => sum(col(s"__s_$n")).as(n) }: _*)
  }
}
