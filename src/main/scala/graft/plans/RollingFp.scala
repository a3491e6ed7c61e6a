package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `rolling_fp_min(norm, k)` — the minimum md5 hex digest over every
  * k-character window of an (already normalized) string; strings shorter
  * than k digest whole. Arithmetically identical to the HOF form
  *
  * {{{ array_min(transform(sequence(1, length-k+1),
  *       i => md5(substr(norm, i, k)))) }}}
  *
  * (lowercase-hex encoding is order-monotonic in the digest bytes, so
  * "min hex string" == "min digest bytes" — the comparison here runs on
  * the raw 16-byte digests and hex-encodes only the winner), but ~3×
  * faster at sf0.1: the HOF path materializes a 32-char hex UTF8String
  * per window into an array and evaluates a lambda chain per element,
  * where this expression reuses ONE MessageDigest and two 16-byte
  * buffers for a whole document, and — for ASCII inputs, where char
  * windows are byte windows — digests straight out of the backing byte
  * array with zero per-window copies.
  *
  * Differential spec pins native == HOF; q_text_rolling_fp's DuckDB
  * oracle (list_min over md5 substrings) gates the semantics end-to-end.
  */
object RollingFp {
  private val hexChars = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexChars(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** unsigned lexicographic byte compare: a < b */
  private def lessThan(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** Min-over-windows digest of `norm`, hex-encoded. Shared by the
    * interpreted and generated paths so they cannot diverge. */
  def minHex(norm: UTF8String, k: Int): UTF8String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val nChars = norm.numChars()
    if (nChars < k) return hex(md.digest(norm.getBytes))
    val bytes = norm.getBytes
    val ascii = bytes.length == nChars // char windows == byte windows
    val m = nChars - k + 1
    var best: Array[Byte] = null
    var cur: Array[Byte] = null
    var i = 0
    while (i < m) {
      md.reset()
      if (ascii) md.update(bytes, i, k)
      else md.update(norm.substring(i, i + k).getBytes)
      cur = if (cur == null) md.digest() else { md.digest(cur, 0, 16); cur }
      if (best == null) { best = cur; cur = null }
      else if (lessThan(cur, best)) { val t = best; best = cur; cur = t }
      i += 1
    }
    hex(best)
  }
}

case class RollingFpMin(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"window size must be >= 1, got $k")

  override def prettyName: String = "rolling_fp_min"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_fp_min expects a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType

  override def nullSafeEval(a: Any): Any =
    RollingFp.minHex(a.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.RollingFp.minHex($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): RollingFpMin =
    copy(child = newChild)
}
