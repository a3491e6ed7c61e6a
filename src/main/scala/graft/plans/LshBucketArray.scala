package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `lsh_bucket_array(embedding, planes, bits)`: all hyperplane-LSH bucket
  * ids for one embedding in ONE fused pass — element t of the output is
  * table t's bucket (a `bits`-bit integer whose b-th bit is the sign of
  * the quantized dot with plane t·bits+b).
  *
  * This replaces the tables×bits separate `quantized_dot` expressions the
  * bucketing projection previously carried (16 tables × 4 bits = 64
  * expressions for ANN, 8 × 16 = 128 for near-dup): one expression per
  * row quantizes the embedding ONCE (the per-plane form re-quantized it
  * per plane), loops over a precomputed quantized plane matrix, and emits
  * tiny generated code (three nested loops) instead of an unrolled
  * expression forest that dominates Janino compile time.
  *
  * Arithmetic is bit-identical to the per-plane `QuantizedDot` form
  * (`Σ floor(eᵢ·10⁶)·floor(pᵢ·10⁶) > 0`, null embedding slots contribute
  * 0), so bucket ids — and therefore LSH candidates and measured recall —
  * are unchanged (asserted by a differential spec).
  *
  * `planes` must be a foldable `array<array<float>>` of tables·bits rows
  * (row-major: table-0 bit-0 first) and `bits` a literal int dividing its
  * length; the quantized matrix is computed once per expression instance
  * and shipped to generated code as a reference object.
  */
case class LshBucketArray(emb: Expression, planes: Expression, bitsExpr: Expression)
    extends Expression {

  override def prettyName: String = "lsh_bucket_array"
  override def children: Seq[Expression] = Seq(emb, planes, bitsExpr)
  override def nullable: Boolean = emb.nullable
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    val embOk = emb.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val planesOk = planes.foldable && (planes.dataType match {
      case ArrayType(ArrayType(FloatType, _), _) => true
      case _ => false
    })
    val bitsOk = bitsExpr.foldable && bitsExpr.dataType == IntegerType
    if (embOk && planesOk && bitsOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "lsh_bucket_array expects (array<float>, literal array<array<float>>, literal int), got " +
        s"(${emb.dataType.simpleString}, ${planes.dataType.simpleString}, ${bitsExpr.dataType.simpleString})")
  }

  @transient private lazy val bits: Int = {
    val b = bitsExpr.eval(null).asInstanceOf[Int]
    require(b >= 1 && b <= 62, s"lsh_bucket_array: bits must be in [1, 62], got $b")
    b
  }

  /** Quantized plane matrix, computed once: qᵢ = floor(pᵢ(float)·10⁶) —
    * the identical arithmetic QuantizedDot applies to its right side. */
  @transient private lazy val planeQ: Array[Array[Long]] = {
    val ad = planes.eval(null).asInstanceOf[ArrayData]
    require(ad != null && ad.numElements() > 0, "lsh_bucket_array: planes must be non-empty")
    require(ad.numElements() % bits == 0,
      s"lsh_bucket_array: ${ad.numElements()} planes not divisible by bits=$bits")
    Array.tabulate(ad.numElements()) { i =>
      val p = ad.getArray(i)
      Array.tabulate(p.numElements())(j =>
        math.floor(p.getFloat(j) * 1000000.0d).toLong)
    }
  }
  @transient private lazy val nTables: Int = planeQ.length / bits

  /** Shared by eval and (via reference object) generated code. */
  def bucketsOf(xs: ArrayData): Array[Long] = {
    val dim = planeQ(0).length
    if (xs.numElements() != dim)
      throw new IllegalArgumentException(
        s"lsh_bucket_array: vector length mismatch (${xs.numElements()} vs $dim)")
    val eq = new Array[Long](dim)
    var j = 0
    while (j < dim) {
      eq(j) = if (xs.isNullAt(j)) 0L
              else math.floor(xs.getFloat(j) * 1000000.0d).toLong
      j += 1
    }
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var b = 0
      while (b < bits) {
        val p = planeQ(t * bits + b)
        var acc = 0L
        var i = 0
        while (i < dim) { acc += eq(i) * p(i); i += 1 }
        bucket = bucket * 2 + (if (acc > 0) 1L else 0L)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    out
  }

  override def eval(input: InternalRow): Any = {
    val e = emb.eval(input)
    if (e == null) null
    else new GenericArrayData(bucketsOf(e.asInstanceOf[ArrayData]))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the quantized plane matrix and the loop both live in this instance —
    // generated code delegates to bucketsOf, so the two paths cannot diverge
    val self = ctx.addReferenceObj("lshBuckets", this, classOf[LshBucketArray].getName)
    val embCode = emb.genCode(ctx)
    val resultCode =
      code"""
            |${embCode.code}
            |boolean ${ev.isNull} = ${embCode.isNull};
            |ArrayData ${ev.value} = null;
            |if (!${ev.isNull}) {
            |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
            |    $self.bucketsOf(${embCode.value}));
            |}
          """.stripMargin
    ev.copy(code = resultCode)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LshBucketArray =
    copy(emb = newChildren(0), planes = newChildren(1), bitsExpr = newChildren(2))
}
