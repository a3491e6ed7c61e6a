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
  * Only mergeable measures qualify: count/sum merge by `sum`, min/max by
  * their own function (declared via `merges`); avg must travel as
  * sum+count and divide at read time; distinct needs a sketch — see
  * HllAggregator. The merge is one unionByName + hash aggregate on the
  * group keys: map-side combine absorbs the delta, and the base side is
  * already one row per group.
  */
object Incremental {

  private val mergeFns = Set("sum", "min", "max")

  /** Merge an existing aggregate snapshot with a same-schema delta
    * aggregate: rows share group `keys`; every other column is a measure
    * merged by its entry in `merges` — `"sum"` (the default, correct for
    * count/sum columns), `"min"`, or `"max"`. A min/max measure MUST be
    * declared, or the sum default silently corrupts it — which is why
    * the map is validated against the measure list.
    *
    * avg example: carry `sum_x` and `cnt` (both default-sum), derive
    * `sum_x / cnt` at read time. */
  def mergeAdditive(baseAgg: DataFrame, deltaAgg: DataFrame,
                    keys: Seq[String],
                    merges: Map[String, String] = Map.empty): DataFrame = {
    require(keys.nonEmpty, "need at least one group key")
    require(baseAgg.columns.sorted.sameElements(deltaAgg.columns.sorted),
      s"schema mismatch: ${baseAgg.columns.mkString(",")} vs ${deltaAgg.columns.mkString(",")}")
    val measures = baseAgg.columns.filterNot(keys.contains)
    require(measures.nonEmpty, "no measure columns to merge")
    val unknownCols = merges.keySet.diff(measures.toSet)
    require(unknownCols.isEmpty,
      s"merge functions for non-measure columns: ${unknownCols.mkString(",")}")
    val badFns = merges.values.filterNot(mergeFns).toSeq
    require(badFns.isEmpty,
      s"unsupported merge functions ${badFns.mkString(",")}; use one of ${mergeFns.mkString("/")}")
    def mergeCol(m: String) = merges.getOrElse(m, "sum") match {
      case "sum" => sum(col(m)).as(m)
      case "min" => min(col(m)).as(m)
      case "max" => max(col(m)).as(m)
    }
    baseAgg.unionByName(deltaAgg)
      .groupBy(keys.map(col): _*)
      .agg(mergeCol(measures.head), measures.tail.map(mergeCol): _*)
  }

  /** Refresh an additive aggregate view from a row-level CHANGE FEED —
    * the CDC form of [[mergeAdditive]], and the step past it: appends
    * are all mergeAdditive can absorb (TxnTable.addedFiles refuses
    * removal ranges), while a feed with updates and deletes maintains
    * the view through ANY keyed mutation. Each change row contributes a
    * SIGNED measure — +x for insert/update_postimage, −x for
    * delete/update_preimage — so the delta is one hash aggregate over
    * the feed, merged into the view by the same additive monoid; groups
    * whose count reaches zero leave the view. Cost stays O(|feed| +
    * |groups|), never O(history).
    *
    * `changes` must carry BOTH update images
    * (`TxnTable.changeFeed(updateImages = true)`); a single-image
    * `update` row cannot retract its old contribution, so it fails the
    * job at scan time (`raise_error`), never corrupts the view.
    *
    * `sums` maps view measure → feed source column; `countCol` is the
    * view's row count. */
  def applyCdc(viewAgg: DataFrame, changes: DataFrame, keys: Seq[String],
               countCol: String,
               sums: Map[String, String] = Map.empty): DataFrame =
    mergeAdditive(viewAgg, cdcDelta(changes, keys, countCol, sums), keys)
      .filter(col(countCol) > 0)

  /** The SIGNED delta aggregate of a change feed on its own — what
    * [[applyCdc]] merges into the view. Exposed because a brand-new view
    * (no base yet) IS this delta: signed contributions across any
    * version range compose additively, so one aggregate covers a whole
    * batch of commits. */
  def cdcDelta(changes: DataFrame, keys: Seq[String], countCol: String,
               sums: Map[String, String] = Map.empty): DataFrame = {
    require(keys.nonEmpty, "need at least one group key")
    val sign = when(col("change").isin("insert", "update_postimage"), 1L)
      .when(col("change").isin("delete", "update_preimage"), -1L)
      .otherwise(raise_error(concat(
        lit("applyCdc needs both update images, got change type: "),
        col("change"))).cast("long"))
    val aggs = sum(sign).as(countCol) +: sums.toSeq.sortBy(_._1).map {
      case (m, src) => sum(sign * col(src)).as(m)
    }
    changes.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Incremental maintenance of an equi-JOIN view under fact appends —
    * the raw-row sibling of [[mergeAdditive]]. A join view over an
    * append-only fact is distributive: new_view = old_view ∪ (Δfact ⋈
    * dim), so refreshing after an ingest batch touches O(|Δ| · dim
    * lookup) rows, never the fact history. The dimension side is
    * broadcast by default (the daily-batch shape); callers whose dim
    * outgrows broadcast pass `broadcastDim = false` and pre-bucket.
    *
    * Correct only while the dimension is static between refreshes
    * (changed dim rows invalidate old_view rows — that is SCD territory,
    * [[Scd.scd2Apply]]); the schema check pins that the delta join
    * produced exactly the view's columns. */
  def appendJoinView(baseView: DataFrame, factDelta: DataFrame,
                     dim: DataFrame, joinKeys: Seq[String],
                     broadcastDim: Boolean = true): DataFrame = {
    require(joinKeys.nonEmpty, "need at least one join key")
    val dimSide = if (broadcastDim) broadcast(dim) else dim
    val deltaView = factDelta.join(dimSide, joinKeys)
    require(baseView.columns.sorted.sameElements(deltaView.columns.sorted),
      s"view/delta schema mismatch: ${baseView.columns.sorted.mkString(",")} " +
        s"vs ${deltaView.columns.sorted.mkString(",")}")
    baseView.unionByName(deltaView)
  }
}
