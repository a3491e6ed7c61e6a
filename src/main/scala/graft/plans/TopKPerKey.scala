package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Custom whole-operator stack (builder-brief tier c): top-k rows per key.
  *
  * `row_number() OVER (PARTITION BY key ORDER BY ord) <= k` — the W1/O3
  * reference shape — makes Spark shuffle EVERY row, then sort every group
  * in full, then discard all but k. At 100 TB that's a full-data sort for
  * a k·|keys|-row answer. This operator keeps a size-k heap per key:
  *  - partial pass on the map side (pre-shuffle): each partition reduces
  *    to ≤ k rows per locally-seen key;
  *  - the shuffle then moves only surviving candidates (EnsureRequirements
  *    inserts it from the final pass's ClusteredDistribution requirement);
  *  - final pass per key emits the k best in order.
  * Same partial/final split as HashAggregateExec, same correctness
  * argument as map-side combine: top-k is a semigroup.
  *
  * Memory envelope (documented, not spill-proof): each pass holds ≤ k
  * copied rows per distinct key seen in its partition — the same
  * no-spill envelope as a hash aggregate buffer of k rows per group.
  * For key cardinalities where k·|keys|/partition exceeds executor
  * memory, fall back to the native window path (unregister the rule);
  * adding UnsafeExternalSorter-style spill is the known follow-up.
  */
case class TopKPerKeyNode(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int, child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int, partial: Boolean,
    child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(keys))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrd = RowOrdering.create(sortOrder, childOutput)
      // max-heap on the sort order: the heap head is the WORST retained
      // row, evicted when a better candidate arrives
      val heaps = scala.collection.mutable.LinkedHashMap[UnsafeRow,
        scala.collection.mutable.PriorityQueue[InternalRow]]()
      iter.foreach { row =>
        val key = keyProj(row)
        // copy the key only on first sight — getOrElseUpdate(key.copy(),…)
        // would allocate a fresh UnsafeRow per input row even on hits
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = scala.collection.mutable.PriorityQueue.empty[InternalRow](rowOrd)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (rowOrd.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      heaps.valuesIterator.flatMap(_.dequeueAll.reverse.iterator) // ascending
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
