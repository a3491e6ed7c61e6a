package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Hilbert-curve index of N coordinates — the locality-preserving
  * alternative to the Morton interleave
  * ([[graft.operators.Layout.mortonCodeN]]) for multi-dimensional
  * clustering: a Morton curve takes long diagonal jumps at power-of-two
  * boundaries (adjacent codes can be far apart in space, widening each
  * file's per-dimension [min,max]), while the Hilbert curve is
  * CONTINUOUS — consecutive codes are always spatially adjacent — so a
  * range of codes covers a tighter box and per-file stats prune more.
  * The gap grows with dimension count, which is why
  * [[LayoutAdvisor.zorderAdvice]] names `hilbert` for 3+ columns.
  *
  * Encoding is Skilling's transpose algorithm (John Skilling,
  * "Programming the Hilbert curve", AIP Conf. Proc. 707, 2004 — the
  * standard public formulation): Gray-code untwisting over the
  * coordinate axes followed by a bit transpose. Pure long bit-twiddling
  * — exactly reproducible anywhere, like the Morton code.
  *
  * The expression is variadic (`hilbert_code(bits, c1, c2, …)`), masks
  * each coordinate to its low `bits`, returns LONG, and nulls out if
  * any coordinate is null (a layout key groups nulls together under the
  * range partitioner). n·bits must fit a signed long. Codegen emits a
  * call to the shared static encoder — one method call per row, no
  * boxing, no UDF.
  */
object HilbertCode {

  /** coords (each already masked to `bits`) → Hilbert index. Mutates a
    * private copy. */
  def encode(coords: Array[Long], bits: Int): Long = {
    val n = coords.length
    val x = new Array[Long](n)
    System.arraycopy(coords, 0, x, 0, n)
    // inverse undo excess work (AxesToTranspose)
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p // invert
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t } // exchange
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) { if ((x(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // transpose to a single index: x(0) holds each bit-group's most
    // significant bit
    var out = 0L
    var j = bits - 1
    while (j >= 0) {
      var k = 0
      while (k < n) {
        out = (out << 1) | ((x(k) >> j) & 1L)
        k += 1
      }
      j -= 1
    }
    out
  }
}

case class HilbertCode(children: Seq[Expression], bits: Int)
    extends Expression {

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.size < 2)
      TypeCheckResult.TypeCheckFailure(
        s"hilbert_code needs at least 2 coordinates, got ${children.size}")
    else if (children.size * bits > 63)
      TypeCheckResult.TypeCheckFailure(
        s"hilbert_code: ${children.size} coordinates × $bits bits " +
          "overflows a long")
    else if (bits < 1 || bits > 31)
      TypeCheckResult.TypeCheckFailure(s"hilbert_code: bits=$bits out of [1,31]")
    else {
      val bad = children.map(_.dataType).filterNot {
        case LongType | IntegerType | ShortType | ByteType => true
        case _ => false
      }
      if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"hilbert_code expects integral coordinates, got " +
          bad.map(_.simpleString).mkString(", "))
    }
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  private def mask: Long = (1L << bits) - 1

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val coords = new Array[Long](children.size)
    var i = 0
    while (i < coords.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      coords(i) = (v match {
        case l: java.lang.Long => l.longValue()
        case n: java.lang.Number => n.longValue()
      }) & mask
      i += 1
    }
    HilbertCode.encode(coords, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("coords")
    val loads = children.zip(evals).zipWithIndex.map { case ((c, e), i) =>
      val cast = if (c.dataType == LongType) e.value.code
                 else s"(long) ${e.value.code}"
      s"""
         |if (!${ev.isNull.code}) {
         |  ${e.code.toString}
         |  if (${e.isNull.code}) { ${ev.isNull.code} = true; }
         |  else { $arr[$i] = ($cast) & ${mask}L; }
         |}
       """.stripMargin
    }.mkString("\n")
    val resultCode =
      code"""
            |boolean ${ev.isNull} = false;
            |long ${ev.value} = 0L;
            |long[] $arr = new long[${children.size.toString}];
            |$loads
            |if (!${ev.isNull}) {
            |  ${ev.value} = graft.plans.HilbertCode.encode($arr, ${bits.toString});
            |}
          """.stripMargin
    ev.copy(code = resultCode)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HilbertCode =
    copy(children = newChildren)
}
