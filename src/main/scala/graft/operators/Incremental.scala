package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of additive aggregates (engine-added): the
  * materialized-view refresh a 100 TB warehouse lives by. A COUNT/SUM
  * rollup is a commutative monoid per group, so yesterday's aggregate
  * TABLE plus today's delta BATCH merge into the new aggregate without
  * ever rescanning the base data — cost O(|delta| + |groups|) instead of
  * O(|history|). (The reference reloads its warehouse tables from
  * scratch each run, pipeline.py's drop-and-reload split — this is the
  * shape that survives when the history stops fitting a reload.)
  *
  * Only additive measures qualify (count, sum, min, max merge; avg must
  * travel as sum+count and divide at read time; distinct needs a sketch —
  * see HllAggregator). The merge is one unionByName + hash aggregate on
  * the group keys: map-side combine absorbs the delta, and the base side
  * is already one row per group.
  */
object Incremental {

  /** Merge an existing aggregate snapshot with a same-schema delta
    * aggregate: rows share group `keys`; every other column must be an
    * additive measure and is summed. */
  def mergeAdditive(baseAgg: DataFrame, deltaAgg: DataFrame,
                    keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one group key")
    require(baseAgg.columns.sorted.sameElements(deltaAgg.columns.sorted),
      s"schema mismatch: ${baseAgg.columns.mkString(",")} vs ${deltaAgg.columns.mkString(",")}")
    val measures = baseAgg.columns.filterNot(keys.contains)
    require(measures.nonEmpty, "no measure columns to merge")
    baseAgg.unionByName(deltaAgg)
      .groupBy(keys.map(col): _*)
      .agg(sum(col(measures.head)).as(measures.head),
        measures.tail.map(m => sum(col(m)).as(m)): _*)
  }
}
