package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `greedy_tokenize(text)`: subword tokenization by greedy longest match
  * against a fixed vocabulary — the WordPiece/BPE-inference algorithm (at
  * inference time both reduce to longest-match segmentation; merges/scores
  * only matter during vocab TRAINING). The training-data pipeline runs
  * exactly this to measure sequence lengths, pack context windows, and
  * price a corpus in tokens, so it belongs scan-side as one codegen-safe
  * expression, not a driver-side library call.
  *
  * Semantics, chosen to be independently checkable: at each position take
  * the LONGEST vocab entry matching there; if none matches, emit id -1
  * (unknown) and advance one char. This is bit-equal to scanning with a
  * leftmost-first regex alternation ordered longest-first (verified
  * against DuckDB's RE2 in the q_text_subword oracle) — the segmentation
  * has an engine-independent ground truth, unlike real BPE vocabs with
  * merge-rank tie-breaks.
  *
  * The vocab is a constructor literal: the trie is built once per
  * executor (lazy, off the serialized string array) and shared by the
  * interpreted and generated paths through [[GreedyTokenize.tokenize]],
  * so the two cannot diverge. Matching walks UTF-16 chars of the decoded
  * string; ids are vocab positions (longs, for painless SQL arithmetic
  * downstream).
  */
case class GreedyTokenize(child: Expression, vocab: Seq[String])
    extends UnaryExpression {
  require(vocab.nonEmpty, "vocab must not be empty")
  require(vocab.forall(_.nonEmpty), "vocab entries must be non-empty")
  require(vocab.distinct.size == vocab.size, "vocab entries must be unique")

  override def prettyName: String = "greedy_tokenize"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"greedy_tokenize expects a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val trie = GreedyTokenize.buildTrie(vocab)

  /** Shared by nullSafeEval and the generated code. */
  def tokenize(s: UTF8String): GenericArrayData =
    GreedyTokenize.tokenize(s.toString, trie)

  override def nullSafeEval(a: Any): Any = tokenize(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("greedyTokenize", this, classOf[GreedyTokenize].getName)
    defineCodeGen(ctx, ev, c => s"$self.tokenize($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): GreedyTokenize =
    copy(child = newChild)
}

object GreedyTokenize {

  /** Flat-array trie: node i's children live in a char→node map; a
    * negative id means non-terminal. Vocabularies are small (≤ tens of
    * thousands), so per-node HashMaps are fine — the hot loop's cost is
    * the char lookups, which are O(1) each. */
  final class Trie(val children: Array[java.util.HashMap[Character, Integer]],
                   val ids: Array[Int])

  def buildTrie(vocab: Seq[String]): Trie = {
    val children = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val ids = scala.collection.mutable.ArrayBuffer(-1)
    vocab.zipWithIndex.foreach { case (w, id) =>
      var node = 0
      w.foreach { ch =>
        val next = children(node).get(ch)
        node = if (next != null) next.intValue()
        else {
          children += new java.util.HashMap[Character, Integer]()
          ids += -1
          children(node).put(ch, children.size - 1)
          children.size - 1
        }
      }
      ids(node) = id
    }
    new Trie(children.toArray, ids.toArray)
  }

  def tokenize(s: String, trie: Trie): GenericArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[Any](s.length / 4 + 4)
    var p = 0
    while (p < s.length) {
      // walk the trie as far as the text allows, remembering the last
      // terminal — that's the longest match at p
      var node = 0
      var q = p
      var bestId = -1
      var bestEnd = p
      var walking = true
      while (walking && q < s.length) {
        val next = trie.children(node).get(s.charAt(q))
        if (next == null) walking = false
        else {
          node = next.intValue()
          q += 1
          if (trie.ids(node) >= 0) { bestId = trie.ids(node); bestEnd = q }
        }
      }
      if (bestId >= 0) { out += bestId.toLong; p = bestEnd }
      else { out += -1L; p += 1 } // unknown char
    }
    new GenericArrayData(out.toArray)
  }
}
