package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines (engine-added).
  *
  * Spark's `df.sample()` draws from a per-partition RNG: the selected set
  * changes with partition layout, retries, and scale-ups — useless for a
  * reproducible training corpus. These operators hash row CONTENT instead:
  * the same row is in or out of the sample on every run, every cluster
  * size, every engine (the oracle recomputes the same md5 arithmetic in
  * DuckDB).
  *
  * At 100 TB both are embarrassingly parallel: `bernoulli` is a pure
  * scan-side filter (no shuffle at all); `stratifiedCap` shuffles once on
  * the stratum key — and because it is the rank-limit window idiom, it
  * rides Spark's WindowGroupLimit partial pruning (or this engine's
  * TopKPerKeyExec when registered) instead of sorting whole strata.
  */
object Sampling {

  /** Stable per-row bucket in [0, buckets): first 8 md5 hex chars of the
    * id rendered AS TEXT (text form is engine-portable; raw integer bytes
    * are not). */
  def hashBucket(id: Column, buckets: Int = 10000): Column =
    conv(substring(md5(id.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Bernoulli-style deterministic sample: keeps the rows whose bucket
    * falls below `rate`·10000 (rate quantized to 1/10000ths). */
  def bernoulli(df: DataFrame, idCol: String, rate: Double): DataFrame = {
    require(rate >= 0 && rate <= 1, "rate in [0,1]")
    df.filter(hashBucket(col(idCol)) < math.round(rate * 10000).toInt)
  }

  /** Stratified cap: at most `k` rows per stratum, chosen as the k
    * smallest (md5(id), id) — a deterministic class-balancing downsample
    * (cap the over-represented language/source, keep small strata whole). */
  def stratifiedCap(df: DataFrame, strataCols: Seq[String], idCol: String,
                    k: Int): DataFrame = {
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }
}
