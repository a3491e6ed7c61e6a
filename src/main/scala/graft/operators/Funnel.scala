package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered funnel analysis (engine-added): how many users reach each
  * stage of a required event sequence, where stage N counts only if it
  * happens AT OR AFTER the user's stage-N-1 time — the conversion query
  * behind every product-analytics dashboard, and a sequence-mining
  * primitive the reference's pandas stack would hand-roll.
  *
  * Shape: one filtered min-aggregate per stage, each joined user-to-user
  * against the previous stage's result — hash aggregates and equi-joins
  * only, no window over a user's full history and nothing ever sorts the
  * event stream. Stage frames shrink monotonically, so the chain's cost
  * is bounded by stage 1; at 100 TB each stage is a semi-join-shaped
  * pass over an already-filtered event type.
  */
object Funnel {

  /** Per-stage reach: (stage index, stage name, n_users, and each user's
    * earliest completion time folded in via the join chain). A user
    * completes stage i at the earliest `tsCol` of an `eventCol == stages(i)`
    * row at-or-after their stage i-1 completion. */
  def stageReach(events: DataFrame, userCol: String, tsCol: String,
                 eventCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "need at least one stage")
    val done = stages.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (stage, _)) =>
        val candidates = events.filter(col(eventCol) === stage)
          .select(col(userCol), col(tsCol).as("__t"))
        val gated = prev match {
          case None => candidates
          case Some(p) => candidates
            .join(p.select(col(userCol), col("__stage_t")), userCol)
            .filter(col("__t") >= col("__stage_t"))
            .select(col(userCol), col("__t"))
        }
        Some(gated.groupBy(userCol).agg(min(col("__t")).as("__stage_t")))
    }.flatten
    val counts = done.zip(stages).zipWithIndex.map { case ((df, name), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("stage"), lit(name).as("stage_name"), col("n_users"))
    }
    counts.reduce(_ unionByName _)
  }
}
