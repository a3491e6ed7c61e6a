package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom `Generator` (UDTF) — the third leg of the custom-function
  * surface next to the scalar expressions (QuantizedDot, sketches) and the
  * typed Aggregators (HLL, histogram quantile). Realizes the reference's
  * `list_divider` (google_maps_api.ipynb:426-438) as a genuine
  * table-valued expression: one input array of strings → one output row
  * per non-sentinel element, tagged with the sentinel-delimited group id
  * and the position within its group. Sentinel elements (full regex
  * match) open a new group and are dropped.
  *
  * Two deliberate divergences from the reference's Python loop: (1) the
  * reference detects sentinels by substring containment
  * (`'Travelcard' in i`) — this Generator requires a FULL regex match,
  * which is strictly more expressive (containment = `'.*Travelcard.*'`);
  * (2) the reference renumbers groups compactly (an empty group between
  * consecutive sentinels is never yielded), while this Generator's group
  * ids count sentinels seen, so consecutive sentinels leave group-id gaps
  * — callers needing the reference's compact numbering can
  * `dense_rank() OVER (ORDER BY group_id)` downstream.
  *
  * Registered as `list_divider(arr, sentinelRegex)`; used in a `select`
  * it plans as a `Generate` node like `explode`/`posexplode` — the
  * per-partition streaming shape, no shuffle of its own.
  */
case class ListDivider(child: Expression, sentinel: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, sentinel)

  override def elementSchema: StructType = StructType(Seq(
    StructField("group_id", IntegerType, nullable = false),
    StructField("pos", IntegerType, nullable = false),
    StructField("item", StringType)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if sentinel.dataType == StringType && sentinel.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "list_divider expects (array<string>, literal string regex)")
  }

  @transient private lazy val pattern = {
    val s = sentinel.eval(null)
    require(s != null, "list_divider sentinel must not be null")
    java.util.regex.Pattern.compile(s.asInstanceOf[UTF8String].toString)
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val data = child.eval(input)
    if (data == null) return Nil
    val arr = data.asInstanceOf[ArrayData]
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
    var group = 0
    var pos = 0
    var i = 0
    while (i < arr.numElements()) {
      val item = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      if (item != null && pattern.matcher(item.toString).matches()) {
        group += 1
        pos = 0
      } else {
        out += InternalRow(group, pos, item)
        pos += 1
      }
      i += 1
    }
    out
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ListDivider =
    copy(child = newChildren(0), sentinel = newChildren(1))
}
