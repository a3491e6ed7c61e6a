package graft.plans

import org.apache.spark.SparkException
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Operational guard against ACCIDENTAL no-partition windows (engine-
  * added, conf-gated OFF by default — the tripwire sibling of
  * [[CrossJoinGuard]]): a `Window.orderBy(...)` without a partitionBy
  * funnels EVERY row through one task — at 100 TB that is not a slow
  * query, it is an executor OOM after an hours-long single-threaded
  * sort. Spark only logs `WindowExec: No Partition Defined` at WARN and
  * runs it anyway, and in a large job that line scrolls past unread.
  *
  * The rule fails planning (never execution) when a window with an
  * empty partitionSpec sits on a child whose optimizer-stats size
  * exceeds `maxBytes`. The engine's own documented small-data forms
  * (q_join_index_aligned's dimension row-numbering, q_window_groupid's
  * reference-shaped sentinel scan, Jobs.stationDimension's wiki rows —
  * each with a `_perkey` 100 TB-primary sibling) pass untouched via the
  * size gate, exactly like dimension crosses under CrossJoinGuard.
  *
  *  - `spark.graft.globalWindowGuard.enabled`  (default false)
  *  - `spark.graft.globalWindowGuard.maxBytes` (default 10 MiB)
  */
object GlobalWindowGuard extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.globalWindowGuard.enabled", "false").toBoolean)
      return plan
    val maxBytes = BigInt(conf.getConfString(
      "spark.graft.globalWindowGuard.maxBytes", (10L * 1024 * 1024).toString))
    plan.foreach {
      case w @ Window(_, partitionSpec, _, child, _) if partitionSpec.isEmpty =>
        val size = child.stats.sizeInBytes
        if (size > maxBytes)
          throw new SparkException(
            s"globalWindowGuard: no-partition window over a large input " +
              s"($size bytes by optimizer stats, guard at $maxBytes) — every row " +
              s"funnels through one task. Add a partitionBy (see the _perkey " +
              s"query forms), pre-aggregate below the guard size, or disable " +
              s"spark.graft.globalWindowGuard.enabled. Window: ${w.windowExpressions.mkString(", ")}")
      case _ =>
    }
    plan
  }
}
