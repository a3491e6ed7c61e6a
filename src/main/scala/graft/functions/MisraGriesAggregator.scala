package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Misra-Gries heavy-hitters sketch as a typed `Aggregator` — the
  * frequent-items companion to the HLL and histogram-quantile sketches
  * in the engine's UDAF surface.
  *
  * Buffer = at most `capacity` (item, lower-bound count) entries.
  * reduce: resident item +1; vacancy → insert; full → decrement ALL
  * (dropping zeros) — the classic one-pass summary. merge: sum counts,
  * then subtract the (capacity+1)-th largest count from every entry and
  * drop ≤0 (Agarwal et al., mergeable-summaries form).
  *
  * The POINT of the sketch is its deterministic superset guarantee:
  * every item with true frequency > n/(capacity+1) survives ANY reduce /
  * merge order — only the surviving counts are order-sensitive. So the
  * engine's heavy-hitter operator treats the output as a candidate set
  * and re-counts candidates exactly in a second pass (the same
  * candidates-then-verify shape as the LSH dedup family), making the
  * end result exact and order-independent — see
  * [[graft.operators.Curation.heavyHitterTokens]]. A full token groupBy
  * shuffles the whole vocabulary; this shuffles `capacity` entries per
  * partition, then |candidates| exact counts.
  */
class MisraGriesAggregator(capacity: Int)
    extends Aggregator[String, mutable.HashMap[String, Long], Map[String, Long]] {
  require(capacity >= 1, "capacity >= 1")

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  override def reduce(buf: mutable.HashMap[String, Long],
                      item: String): mutable.HashMap[String, Long] = {
    buf.get(item) match {
      case Some(c) => buf.update(item, c + 1)
      case None if buf.size < capacity => buf.update(item, 1L)
      case None =>
        // decrement-all: cancels one occurrence of `capacity` distinct
        // items against this one — the counter invariant behind the
        // n/(capacity+1) survival bound
        val dead = mutable.ArrayBuffer.empty[String]
        buf.mapValuesInPlace((_, c) => c - 1)
        buf.foreach { case (k, c) => if (c <= 0) dead += k }
        dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
                     b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest count from all, drop <=0:
      // at most `capacity` survivors, error grows by that count only
      val kth = a.values.toArray.sorted(Ordering[Long].reverse)(capacity)
      val dead = mutable.ArrayBuffer.empty[String]
      a.mapValuesInPlace((_, c) => c - kth)
      a.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(a.remove)
    }
    a
  }

  override def finish(buf: mutable.HashMap[String, Long]): Map[String, Long] =
    buf.toMap

  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
}
