package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over an INTEGER item column — the order-independent
  * heavy-hitters sketch the streaming surface needs (engine-added; the
  * reference has no frequency sketches at all).
  *
  * [[graft.functions.MisraGriesAggregator]] is a deterministic-superset
  * candidate generator, but its surviving COUNTS depend on reduce/merge
  * order, so a streaming Misra-Gries can never hash against a batch
  * oracle. The count-min sketch is a plain VECTOR SUM: `Depth` rows of
  * `Width` counters, each item incrementing one counter per row through
  * a fixed affine hash `((item·A_r + B_r) mod P) mod Width`. Addition
  * commutes, so ANY batching/merge order — micro-batch splits included —
  * yields the identical sketch, and the integer hash replays in any
  * engine (the DuckDB oracle computes the same cells from the same
  * constants). Estimates read back as the MIN over the item's `Depth`
  * counters: always ≥ the true count, within n/Width per row in
  * expectation.
  *
  * Scale shape: the sketch is `Depth·Width` cells TOTAL (16 K counters
  * here) regardless of item cardinality — the whole point at 100 TB:
  * state stays bounded while a per-key exact count grows with the
  * universe. Building it is one map-side-combined aggregate over
  * `Depth` cells per row; estimating candidates broadcast-joins the
  * tiny sketch against them.
  */
object CountMin {

  val Depth = 4
  val Width = 4096
  /** Mersenne prime 2³¹−1; with items ≤ [[MaxItem]] (~8.4·10⁹ — see its
    * formula) the affine products stay under 2⁶³. */
  val P = 2147483647L
  val A: Seq[Long] = Seq(1103515245L, 22695477L, 1664525L, 69069L)
  val B: Seq[Long] = Seq(12345L, 1L, 1013904223L, 362437L)

  /** Largest admissible item: item·max(A)+max(B) must stay under 2⁶³
    * (Spark would wrap silently while the DuckDB oracle throws — the
    * guard makes both engines fail identically and loudly). */
  val MaxItem: Long = (Long.MaxValue - B.max) / A.max

  /** The flat cell index of `item` in row `r` (0-based): rows concatenate,
    * so one (cell → count) map is the whole sketch. Items must be in
    * [0, MaxItem]: negatives would make `%` return a negative remainder
    * and bleed into the previous row's index range; larger items would
    * wrap the affine product. Both raise at execution instead. */
  def cell(item: Column, r: Int): Column = {
    val checked = when(item < 0 || item > MaxItem,
      raise_error(concat(lit(s"count-min item out of [0, $MaxItem]: "),
        item.cast("string")))).otherwise(item)
    lit(r.toLong * Width) + ((checked * A(r) + B(r)) % P) % Width
  }

  /** JVM-side mirror of [[cell]] — the same flat index computed eagerly,
    * for stateful processors that keep a sketch in streaming state
    * ([[graft.streaming.TwsStreaming.cmsTopKTws]]). Must stay formula-
    * identical to [[cell]]: both feed the same DuckDB oracle. */
  def cellOf(item: Long, r: Int): Long = {
    require(item >= 0 && item <= MaxItem,
      s"count-min item out of [0, $MaxItem]: $item")
    r.toLong * Width + ((item * A(r) + B(r)) % P) % Width
  }

  private def cellRows(df: DataFrame, itemCol: String): DataFrame =
    df.select(explode(array(
      (0 until Depth).map(r => cell(col(itemCol), r)): _*)).as("cell"))

  /** Build the sketch: (cell, cnt), at most Depth·Width rows. */
  def sketch(df: DataFrame, itemCol: String): DataFrame =
    cellRows(df, itemCol).groupBy("cell").agg(count(lit(1)).as("cnt"))

  /** Point-estimate every row of `candidates` (distinct values of
    * `itemCol`) against a built sketch: min over the item's Depth cells.
    * The sketch side is tiny and broadcasts; candidates never shuffle
    * more than their own distinct-aggregation. A cell the sketch never
    * touched counts as 0 (LEFT join + coalesce) — an inner join would
    * silently DROP a candidate the sketch's input never saw instead of
    * reporting its correct zero estimate (candidates and sketch may
    * come from different sources). */
  def estimate(candidates: DataFrame, sk: DataFrame,
               itemCol: String): DataFrame = {
    val withCells = candidates.select(col(itemCol),
      explode(array((0 until Depth).map(r => cell(col(itemCol), r)): _*))
        .as("cell"))
    withCells.join(broadcast(sk), Seq("cell"), "left")
      .groupBy(itemCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
  }

  /** Top-k heavy hitters of `df[itemCol]` by sketch estimate, with the
    * deterministic (est desc, item asc) tiebreak — the full
    * candidates-then-estimate read path over a sketch built elsewhere
    * (e.g. accumulated by a stream). */
  def topK(df: DataFrame, sk: DataFrame, itemCol: String,
           k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val est = estimate(df.select(itemCol).distinct(), sk, itemCol)
    // orderBy+limit plans TakeOrderedAndProject (a per-partition heap +
    // driver merge of k rows) — the global row_number then runs over k
    // rows only, never the full candidate set
    est.orderBy(col("est_cnt").desc, col(itemCol)).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("est_cnt").desc, col(itemCol)))
          .cast("long"))
      .select(col("rank"), col(itemCol), col("est_cnt"))
  }
}
