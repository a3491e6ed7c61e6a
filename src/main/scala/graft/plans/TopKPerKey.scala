package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Custom whole-operator stack (builder-brief tier c): top-k rows per key.
  *
  * `row_number() OVER (PARTITION BY key ORDER BY ord) <= k` — the W1/O3
  * reference shape — makes Spark shuffle EVERY row, then sort every group
  * in full, then discard all but k. At 100 TB that's a full-data sort for
  * a k·|keys|-row answer. This operator:
  *  - partial pass on the map side (pre-shuffle): each partition reduces
  *    to ≤ k rows per locally-seen key via a size-k heap;
  *  - the shuffle then moves only surviving candidates (EnsureRequirements
  *    inserts it from the final pass's ClusteredDistribution requirement);
  *  - final pass requires input sorted by (keys, order) — the SortExec
  *    EnsureRequirements inserts is Spark's spillable external sort — and
  *    streams the first k rows of each key group in O(1) memory.
  * Same partial/final split as HashAggregateExec, same correctness
  * argument as map-side combine: top-k is a semigroup.
  *
  * Memory safety: the final pass holds one key and a counter (the sort
  * below it spills); the partial pass caps its heap map at
  * `maxPartialKeys` distinct keys — past the cap, rows of unseen keys
  * pass through unpruned (partial pruning is advisory; the final pass is
  * what's exact), so a high-cardinality partition degrades to shuffling
  * more rows instead of OOMing. */
case class TopKPerKeyNode(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int, child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int, partial: Boolean,
    maxPartialKeys: Int, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(keys))

  private def keySortOrder: Seq[SortOrder] = keys.map(SortOrder(_, Ascending))

  /** Final pass streams sorted key groups; the sort below it (inserted by
    * EnsureRequirements) is Spark's spillable UnsafeExternalSorter. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (partial) Seq(Nil) else Seq(keySortOrder ++ order)

  override def outputOrdering: Seq[SortOrder] =
    if (partial) Nil else keySortOrder ++ order

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val maxKeys = maxPartialKeys
    if (partial) {
      child.execute().mapPartitions { iter =>
        val keyProj = UnsafeProjection.create(keyExprs, childOutput)
        val rowOrd = RowOrdering.create(sortOrder, childOutput)
        // max-heap on the sort order: the heap head is the WORST retained
        // row, evicted when a better candidate arrives
        val heaps = scala.collection.mutable.LinkedHashMap[UnsafeRow,
          scala.collection.mutable.PriorityQueue[InternalRow]]()
        val passedThrough = iter.flatMap { row =>
          val key = keyProj(row)
          heaps.get(key) match {
            case Some(heap) =>
              if (heap.size < limit) heap.enqueue(row.copy())
              else if (rowOrd.compare(row, heap.head) < 0) {
                heap.dequeue(); heap.enqueue(row.copy())
              }
              Iterator.empty
            case None if heaps.size < maxKeys =>
              val h = scala.collection.mutable.PriorityQueue.empty[InternalRow](rowOrd)
              // copy the key only on first sight — getOrElseUpdate(key.copy(),…)
              // would allocate a fresh UnsafeRow per input row even on hits
              heaps.put(key.copy(), h)
              h.enqueue(row.copy())
              Iterator.empty
            case None =>
              // heap map at capacity: ship the row unpruned rather than
              // grow without bound — the final pass stays exact
              Iterator.single(row)
          }
        }
        // `++` is by-name: the heap drain builds after input is consumed
        passedThrough ++ heaps.valuesIterator.flatMap(_.dequeueAll.reverse.iterator)
      }
    } else {
      child.execute().mapPartitions { iter =>
        val keyProj = UnsafeProjection.create(keyExprs, childOutput)
        var curKey: UnsafeRow = null
        var emitted = 0
        iter.filter { row =>
          val key = keyProj(row)
          if (curKey == null || key != curKey) {
            curKey = key.copy()
            emitted = 0
          }
          emitted += 1
          emitted <= limit
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
