package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native sketch expressions for the near-dup family: one pass over a
  * row's hashed-shingle array computes the full MinHash signature /
  * 64-bit SimHash with no row explosion and no shuffle.
  *
  * The previous formulation exploded shingles to one row each and
  * aggregated (64 `min` columns / 64 signed bit-counters) — a groupBy
  * shuffle of |corpus|·|shingles| rows whose only purpose was to dodge
  * Catalyst's projection collapse (the HOF form re-inlined shingle
  * construction into every lambda, measured ~10³× recompute). A single
  * native expression has one consumer for the shingle array, so neither
  * problem exists: signatures are computed where the data sits, and the
  * first shuffle in the pipeline is the (tiny) band-key candidate join.
  *
  * Hashing: the i-th MinHash function is the affine family
  * `mix₁(h) + i·(mix₂(h)|1)` over the 64-bit shingle hash — the same
  * per-seed-affine construction Spark MLlib's MinHashLSH uses, with
  * splitmix64/murmur3 finalizers as the mixers. Evaluated incrementally
  * (one add per seed per shingle). Java arithmetic wraps, so ANSI mode
  * can't see an overflow error — this is exactly the trick that is NOT
  * expressible in SQL arithmetic under Spark 4's default ANSI.
  */
object SketchHash {
  /** splitmix64 finalizer (public-domain constant schedule). */
  @inline final def mix1(h0: Long): Long = {
    var z = h0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  /** murmur3 fmix64 finalizer over a salted input; forced odd so the
    * affine step cycles all 2⁶⁴ residues. */
  @inline final def mix2(h0: Long): Long = {
    var z = h0 ^ 0xff51afd7ed558ccdL
    z = (z ^ (z >>> 33)) * 0xc4ceb9fe1a85ec53L
    z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
    (z ^ (z >>> 33)) | 1L
  }

  /** First-occurrence in-place dedup of a[0, len): open-addressed linear
    * probing over primitive longs — no autoboxing, no generics, so the
    * call is safe from Janino-generated code (generic `HashSet<Long>` is
    * exactly the construct Spark's own codegen avoids). Returns the
    * deduped count; a[0, count) holds survivors in first-occurrence
    * order. Shared by ShingleHashes' interpreted and codegen paths so the
    * two can't diverge. */
  final def dedupFirstOccurrence(a: Array[Long], len: Int): Int = {
    if (len <= 1) return len
    var cap = 8
    while (cap < len * 2) cap <<= 1
    val keys = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val mask = cap - 1
    var k = 0
    var i = 0
    while (i < len) {
      val h = a(i)
      var idx = mix1(h).toInt & mask
      var isDup = false
      var probing = true
      while (probing) {
        if (!used(idx)) { used(idx) = true; keys(idx) = h; probing = false }
        else if (keys(idx) == h) { isDup = true; probing = false }
        else idx = (idx + 1) & mask
      }
      if (!isDup) { a(k) = h; k += 1 }
      i += 1
    }
    k
  }
}

trait SketchInputCheck { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${prettyName} expects array<bigint>, got ${other.simpleString}")
  }
  // empty / all-null-element arrays map to NULL output even for a
  // non-nullable child
  override def nullable: Boolean = true
}

/** `shingle_hashes(tokens, n)`: de-duplicated 64-bit hashes of every
  * n-token window, one fused pass — each window folds its tokens through
  * XXH64 exactly like Spark's own `xxhash64(array<string>)` (null tokens
  * skipped, seed 42). NULL when there are fewer than n tokens.
  *
  * This exists because the HOF formulation
  * (`transform(sequence(...), i => xxhash64(slice(ws, i, n)))`) is
  * CodegenFallback: one HOF in a projection drops the WHOLE projection —
  * including the downstream MinHash/SimHash sketches — out of
  * whole-stage codegen. */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def prettyName: String = "shingle_hashes"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // short docs shingle to NULL

  override def nullSafeEval(a: Any): Any = {
    val toks = a.asInstanceOf[ArrayData]
    val len = toks.numElements()
    if (len < n) null
    else {
      val m = len - n + 1
      val out = new Array[Long](m)
      var i = 0
      while (i < m) {
        var h = 42L
        var j = i
        while (j < i + n) {
          if (!toks.isNullAt(j)) h = XXH64.hashUTF8String(toks.getUTF8String(j), h)
          j += 1
        }
        out(i) = h
        i += 1
      }
      val k = SketchHash.dedupFirstOccurrence(out, m)
      new GenericArrayData(if (k == m) out else java.util.Arrays.copyOf(out, k))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val len = ctx.freshName("len")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val xxh = classOf[XXH64].getName
      s"""
         |int $len = $a.numElements();
         |if ($len < $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $m = $len - ${n - 1};
         |  long[] $out = new long[$m];
         |  for (int $i = 0; $i < $m; $i++) {
         |    long $h = 42L;
         |    for (int $j = $i; $j < $i + $n; $j++) {
         |      if (!$a.isNullAt($j)) $h = $xxh.hashUTF8String($a.getUTF8String($j), $h);
         |    }
         |    $out[$i] = $h;
         |  }
         |  int $k = graft.plans.SketchHash.dedupFirstOccurrence($out, $m);
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    $k == $m ? $out : java.util.Arrays.copyOf($out, $k));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** `minhash_sigs(hashes, k)`: array<long> of the k per-seed minima.
  * NULL when the input has no non-null element (a doc too short to
  * shingle has no signature; callers filter on isNotNull). */
case class MinHashSigs(child: Expression, numHashes: Int)
    extends UnaryExpression with SketchInputCheck {
  require(numHashes >= 1 && numHashes <= 1024,
    s"numHashes must be in [1, 1024], got $numHashes")

  override def prettyName: String = "minhash_sigs"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i)) {
        any = true
        val h = xs.getLong(i)
        var v = SketchHash.mix1(h)
        val step = SketchHash.mix2(h)
        var j = 0
        while (j < numHashes) {
          if (v < sig(j)) sig(j) = v
          v += step
          j += 1
        }
      }
      i += 1
    }
    if (any) new GenericArrayData(sig) else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val sig = ctx.freshName("sig")
      val any = ctx.freshName("any")
      val h = ctx.freshName("h")
      val z = ctx.freshName("z")
      val v = ctx.freshName("v")
      val step = ctx.freshName("step")
      s"""
         |int $n = $a.numElements();
         |long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |boolean $any = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    $any = true;
         |    long $h = $a.getLong($i);
         |    long $z = $h + 0x9e3779b97f4a7c15L;
         |    $z = ($z ^ ($z >>> 30)) * 0xbf58476d1ce4e5b9L;
         |    $z = ($z ^ ($z >>> 27)) * 0x94d049bb133111ebL;
         |    long $v = $z ^ ($z >>> 31);
         |    $z = $h ^ 0xff51afd7ed558ccdL;
         |    $z = ($z ^ ($z >>> 33)) * 0xc4ceb9fe1a85ec53L;
         |    $z = ($z ^ ($z >>> 33)) * 0xff51afd7ed558ccdL;
         |    long $step = ($z ^ ($z >>> 33)) | 1L;
         |    for (int $j = 0; $j < $numHashes; $j++) {
         |      if ($v < $sig[$j]) $sig[$j] = $v;
         |      $v += $step;
         |    }
         |  }
         |}
         |if ($any) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

/** `simhash64(hashes)`: 64-bit SimHash — per bit position, +1/-1 votes
  * over the feature hashes, bit set where the sum is positive. NULL when
  * the input has no non-null element. */
case class SimHash64(child: Expression)
    extends UnaryExpression with SketchInputCheck {

  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val cnt = new Array[Int](64)
    var any = false
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i)) {
        any = true
        val h = xs.getLong(i)
        var j = 0
        while (j < 64) {
          cnt(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    if (!any) null
    else {
      var out = 0L
      var j = 0
      while (j < 64) {
        if (cnt(j) > 0) out |= (1L << j)
        j += 1
      }
      out
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt")
      val any = ctx.freshName("any")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |int[] $cnt = new int[64];
         |boolean $any = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    $any = true;
         |    long $h = $a.getLong($i);
         |    for (int $j = 0; $j < 64; $j++) {
         |      $cnt[$j] += ((($h >>> $j) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |}
         |if ($any) {
         |  long $out = 0L;
         |  for (int $j = 0; $j < 64; $j++) {
         |    if ($cnt[$j] > 0) $out |= (1L << $j);
         |  }
         |  ${ev.value} = $out;
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
