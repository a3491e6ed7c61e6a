package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_shingles(text, n)` — de-duplicated word n-gram shingles,
  * arithmetically identical to the HOF form
  *
  * {{{ array_distinct(when(size(split(trim(c), "\\s+")) >= n,
  *       transform(sequence(1, size - n + 1),
  *         i => array_join(slice(ws, i, n), " ")))
  *       .otherwise(array())) }}}
  *
  * but one fused pass per row: a single tokenizer walk, one reused
  * StringBuilder for the windows, and first-occurrence dedup inline —
  * where the HOF chain materializes the token array, then a slice array
  * and a joined string per window, then re-hashes everything in
  * array_distinct. Shingle construction dominates the decontamination
  * scans (3.7 s of q_text_decontaminate's 4.7 at sf0.1).
  *
  * Semantics notes, each pinned by the differential spec:
  *  - trim strips SPACES only (SQL `trim`, not Java's `String.trim`);
  *  - tokens come from the same `\s+` regex family the HOF used;
  *  - NULL text yields an EMPTY array, not null (size(null) is null, so
  *    the HOF's `when` falls through to the empty-array branch).
  */
object WordShingles {
  def shingles(s: UTF8String, n: Int): GenericArrayData = {
    if (s == null) return new GenericArrayData(Array.empty[Any])
    // SQL trim: spaces only, both ends
    val str = s.toString
    var lo = 0; var hi = str.length
    while (lo < hi && str.charAt(lo) == ' ') lo += 1
    while (hi > lo && str.charAt(hi - 1) == ' ') hi -= 1
    val toks: Array[String] = str.substring(lo, hi).split("\\s+", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val m = toks.length - n + 1
    val seen = new java.util.LinkedHashSet[String](m * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = i
      while (j < i + n) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def prettyName: String = "word_shingles"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false // null text -> empty array (HOF parity)

  // null input maps to an empty array, so eval overrides the null-
  // propagating UnaryExpression default
  override def eval(input: InternalRow): Any =
    WordShingles.shingles(child.eval(input).asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    val resultCode =
      code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.plans.WordShingles.shingles(
            ${c.isNull} ? null : ${c.value}, $n);
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}
