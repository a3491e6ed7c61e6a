package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable quantile sketch as a typed `Aggregator` (the UDAF surface's
  * second showcase next to [[HllAggregator]]): a fixed-grid histogram over
  * a declared [lo, hi) range. 8·bins bytes of state, merge = counter add
  * (commutative/associative), so the estimate is DETERMINISTIC — unlike
  * t-digest/GK sketches whose state depends on arrival order. That
  * determinism is what lets the driver hash-gate this sketch against a
  * DuckDB replication of the same grid arithmetic, where rows-only checks
  * are all an order-sensitive sketch could get.
  *
  * quantile(q) = midpoint of the first bucket whose cumulative count
  * reaches ceil(q·n); max error = (hi-lo)/bins (half-width from the
  * midpoint convention, full width worst-case at the boundaries).
  * Out-of-range values clamp into the edge buckets.
  */
class HistogramQuantileAgg(lo: Double, hi: Double, bins: Int, qs: Seq[Double])
    extends Aggregator[Double, Array[Long], Seq[Double]] {
  require(hi > lo && bins > 0 && qs.forall(q => q > 0 && q <= 1))
  private val w = (hi - lo) / bins

  override def zero: Array[Long] = new Array[Long](bins)

  override def reduce(b: Array[Long], x: Double): Array[Long] = {
    val i = math.min(bins - 1, math.max(0, math.floor((x - lo) / w).toInt))
    b(i) += 1
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bins) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Seq[Double] = {
    var n = 0L
    var i = 0
    while (i < bins) { n += b(i); i += 1 }
    qs.map { q =>
      if (n == 0) Double.NaN
      else {
        val rank = math.max(1L, math.ceil(q * n).toLong)
        var cum = 0L
        var j = 0
        while (j < bins - 1 && cum + b(j) < rank) { cum += b(j); j += 1 }
        lo + (j + 0.5) * w
      }
    }
  }

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}
