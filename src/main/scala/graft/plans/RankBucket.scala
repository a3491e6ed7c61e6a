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
  * The base expression maps `v ↦ |{ b ∈ boundaries : b ≤ v }|` over a
  * STRICTLY-INCREASING boundary array — a binary search per row
  * (O(log B), one static call, whole-stage codegen via a codegen-time
  * reference object, same pattern as [[HilbertCode]]). Monotone
  * non-decreasing by construction, output in [0, boundaries.length]
  * — callers size `boundaries.length ≤ 2^bits − 1` so the curve's
  * low-bit mask never aliases. Values beyond the last boundary clamp
  * into the top bucket, below the first into bucket 0 — the same
  * edge-clamping contract as rangeScale (later out-of-distribution
  * ingest degrades layout, never correctness). NULL in → NULL out.
  *
  * `subBits > 0` COMPOSES a within-bucket range position under the
  * rank: `code = (rank << subBits) | pos`, where `pos` range-scales
  * `v` inside its bucket's own value interval (edge buckets use the
  * measured [domLo, domHi] domain). This is what breaks the ~255-
  * boundary ceiling a single `approx_percentile` pass imposes: rank
  * codes alone stall box-pruning granularity at 1/(B+1) of the MASS
  * per distinct code — `repartitionByRange` cannot cut inside a tied
  * code, so no layout over them can hold more than B+1 target-sized
  * files — while the composed code spreads every non-tied bucket over
  * 2^subBits sub-positions and file counts scale to 2^bits again.
  * Still monotone end to end (rank is monotone; within one rank the
  * scaled position is monotone, and clamping at bucket edges keeps
  * the composition weakly increasing), so incremental rounds bucket
  * stale rows identically from the recorded (boundaries, subBits,
  * domain) triple. Genuinely tied values stay unsplittable — the
  * irreducible residue every value-monotone code shares. */
case class RankBucket(child: Expression, boundaries: Seq[Long],
                      subBits: Int = 0, domLo: Long = 0L, domHi: Long = 0L)
    extends UnaryExpression {

  // boundaries is a Seq, NOT an Array: a case class over an Array gets
  // reference-identity equals/hashCode, so two semantically identical
  // rank_bucket expressions would never compare equal — breaking
  // semanticEquals, canonicalization, and subexpression elimination.
  // The eval/codegen hot path still binary-searches a primitive array,
  // materialized once here.
  private lazy val boundArr: Array[Long] = boundaries.toArray

  override def checkInputDataTypes(): TypeCheckResult = {
    if (boundaries.isEmpty)
      TypeCheckResult.TypeCheckFailure("rank_bucket needs at least one boundary")
    else if (boundaries.sliding(2).exists(w => w.length == 2 && w(0) >= w(1)))
      TypeCheckResult.TypeCheckFailure(
        "rank_bucket boundaries must be strictly increasing")
    else if (subBits < 0 || subBits > 31)
      TypeCheckResult.TypeCheckFailure(
        s"rank_bucket subBits must be in [0, 31], got $subBits")
    else child.dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"rank_bucket expects an integral input, got ${other.simpleString}")
    }
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    RankBucket.code(boundArr,
      input.asInstanceOf[java.lang.Number].longValue(), subBits, domLo, domHi)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bs = ctx.addReferenceObj("rankBounds", boundArr, "long[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.RankBucket.code($bs, (long) $v, " +
        s"$subBits, ${domLo}L, ${domHi}L);")
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

  /** The composed code: rank in the high bits, the within-bucket range
    * position in the low `subBits` (0 sub-bits = the bare rank). The
    * position arithmetic is the double path of `Layout.rangeScale` —
    * overflow-free and monotone; an empty or inverted bucket interval
    * (tied values, an edge bucket with a degenerate domain) positions
    * 0. */
  def code(bs: Array[Long], v: Long, subBits: Int,
           domLo: Long, domHi: Long): Long = {
    val rank = bucket(bs, v)
    if (subBits == 0) return rank
    val lo = if (rank == 0L) domLo else bs(rank.toInt - 1)
    val hi = if (rank.toInt == bs.length) domHi else bs(rank.toInt)
    val pos =
      if (hi <= lo) 0L
      else {
        val top = (1L << subBits) - 1
        val raw = math.floor((v - lo.toDouble) / (hi.toDouble - lo.toDouble) *
          (1L << subBits).toDouble).toLong
        math.min(top, math.max(0L, raw))
      }
    (rank << subBits) | pos
  }
}
