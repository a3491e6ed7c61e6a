package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the quantized integer dot product used by
  * the similarity ops: Σ floor(aᵢ·10⁶)·floor(bᵢ·10⁶) over two float
  * vectors (exact, summation-order independent — ≈ cosine·10¹² on unit
  * vectors).
  *
  * The `zip_with + aggregate` HOF form allocates an intermediate struct
  * array per row and walks three lambda layers; this is a single fused
  * primitive loop with full whole-stage codegen (`doGenCode`) — the
  * preference order is built-ins > native Expression > UDF, and built-ins
  * can't express this without the intermediate. eval() mirrors the
  * generated code for the interpreted path.
  */
case class QuantizedDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quantized_dot expects two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = LongType

  // Null slots contribute 0 (parquet array schemas carry containsNull=true
  // even for dense vectors, so the type can't be rejected up front — but a
  // blind getFloat on a null slot would read undefined buffer data).
  // Mismatched lengths fail fast: embeddings are fixed-dimension, so a
  // mismatch is a wiring bug, and silent truncation would hide it.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (ys.numElements() != n)
      throw new IllegalArgumentException(
        s"quantized_dot: vector length mismatch ($n vs ${ys.numElements()})")
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i) && !ys.isNullAt(i)) {
        acc += math.floor(xs.getFloat(i) * 1000000.0d).toLong *
               math.floor(ys.getFloat(i) * 1000000.0d).toLong
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "quantized_dot: vector length mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |long ${ev.value}_acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    ${ev.value}_acc +=
         |      (long) java.lang.Math.floor($a.getFloat($i) * 1000000.0d) *
         |      (long) java.lang.Math.floor($b.getFloat($i) * 1000000.0d);
         |  }
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedDot =
    copy(left = newLeft, right = newRight)
}
