package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` showcase (SURVEY §2.12): a from-scratch HyperLogLog
  * distinct-count sketch — the engine-added A2 parity check
  * (`approx_count_distinct` exists, but the typed Aggregator surface is
  * part of the engine's UDAF story, and this one's estimate is fully
  * deterministic: register-max merging is order-independent).
  *
  * Standard HLL (Flajolet et al.): p index bits → m = 2^p byte registers,
  * register ← max(rank of remaining hash bits); harmonic-mean estimate
  * with small-range (linear counting) correction. splitmix64 as the hash —
  * deterministic across JVMs, no dependency.
  */
class HllAggregator(p: Int = 11) extends Aggregator[Long, Array[Byte], Long] {
  private val m = 1 << p
  private val alpha = p match {
    case 4 => 0.673; case 5 => 0.697; case 6 => 0.709
    case _ => 0.7213 / (1 + 1.079 / m)
  }

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  override def zero: Array[Byte] = new Array[Byte](m)

  override def reduce(buf: Array[Byte], value: Long): Array[Byte] = {
    val h = splitmix64(value)
    val idx = (h >>> (64 - p)).toInt
    val rest = h << p
    val rank = (java.lang.Long.numberOfLeadingZeros(rest) + 1).min(64 - p + 1)
    if (rank > buf(idx)) buf(idx) = rank.toByte
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Byte]): Long = {
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      invSum += 1.0 / (1L << buf(i))
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m * m / invSum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) // linear counting
      else raw
    math.round(est)
  }

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
