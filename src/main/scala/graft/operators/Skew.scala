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

  /** Salted equi-join for skewed FACT keys: the fact side gets a
    * deterministic content-derived salt in [0, saltFactor), the dimension
    * side is replicated saltFactor× (explode over the salt range), and the
    * join key becomes (key, salt) — a hot key's rows now spread over
    * `saltFactor` reducers instead of one. The result is EXACTLY the
    * plain inner join (every fact row meets every matching dim row at
    * exactly its own salt), which is what the oracle checks; the salt is
    * derived from fact content (hash of `saltFrom`), not an RNG, so runs
    * are reproducible. Use when the dim side is too big to broadcast but
    * small enough that ×saltFactor replication is cheaper than a
    * straggler — the manual form of what AQE's skew split does at
    * runtime (both are in this engine; AQE needs no dim replication but
    * only fires past size thresholds).
    */
  def saltedJoin(facts: DataFrame, dims: DataFrame, keys: Seq[String],
                 saltFrom: String, saltFactor: Int = 16): DataFrame = {
    val saltedFacts = facts.withColumn("__salt",
      pmod(xxhash64(col(saltFrom)), lit(saltFactor)).cast("int"))
    val replicatedDims = dims
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    saltedFacts.join(replicatedDims, keys :+ "__salt").drop("__salt")
  }

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
