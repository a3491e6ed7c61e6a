package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** EQUI-DEPTH bucket index — the rank-quantization building block for
  * curve clustering over SKEWED natural domains
  * ([[graft.sources.TxnLayout.optimizeClustered]] `quantMode =
  * "equidepth"`). Range scaling (`Layout.rangeScale`) keeps bucket
  * WIDTH uniform, so a value-concentrated column (90% of rows sharing
  * a handful of values, a zipf tail) collapses most of its mass into
  * one bucket: `repartitionByRange` then cannot split the tied code
  * and one file swallows the dense region — a box filter touching it
  * reads most of the table. Equi-depth boundaries are the column's own
  * quantiles, so bucket POPULATION is uniform instead: the dense
  * region spreads over many buckets, files balance, and box pruning
  * holds under any marginal distribution (ties beyond quantile
  * resolution are the only residue).
  *
  * The expression maps `v ↦ |{ b ∈ boundaries : b ≤ v }|` over a
  * STRICTLY-INCREASING boundary array — a binary search per row
  * (O(log B), one static call, whole-stage codegen via a codegen-time
  * reference object, same pattern as [[HilbertCode]]). Monotone
  * non-decreasing by construction, output in [0, boundaries.length]
  * — callers size `boundaries.length ≤ 2^bits − 1` so the curve's
  * low-bit mask never aliases. Values beyond the last boundary clamp
  * into the top bucket, below the first into bucket 0 — the same
  * edge-clamping contract as rangeScale (later out-of-distribution
  * ingest degrades layout, never correctness). NULL in → NULL out. */
case class RankBucket(child: Expression, boundaries: Array[Long])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    if (boundaries.isEmpty)
      TypeCheckResult.TypeCheckFailure("rank_bucket needs at least one boundary")
    else if (boundaries.sliding(2).exists(w => w.length == 2 && w(0) >= w(1)))
      TypeCheckResult.TypeCheckFailure(
        "rank_bucket boundaries must be strictly increasing")
    else child.dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"rank_bucket expects an integral input, got ${other.simpleString}")
    }
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    RankBucket.bucket(boundaries,
      input.asInstanceOf[java.lang.Number].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bs = ctx.addReferenceObj("rankBounds", boundaries, "long[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.RankBucket.bucket($bs, (long) $v);")
  }

  override protected def withNewChildInternal(newChild: Expression): RankBucket =
    copy(child = newChild)
}

object RankBucket {
  /** |{ b : b ≤ v }| over strictly-increasing `bs` — binary search. */
  def bucket(bs: Array[Long], v: Long): Long = {
    val i = java.util.Arrays.binarySearch(bs, v)
    if (i >= 0) (i + 1).toLong else (-i - 1).toLong
  }
}
