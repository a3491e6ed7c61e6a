package graft.plans

import org.apache.spark.SparkException
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Operational guard against ACCIDENTAL cartesian products (engine-added,
  * conf-gated OFF by default): at 100 TB an unintended cross join is an
  * outage, not a slow query — |L|·|R| rows materialize before anyone
  * notices the missing join key. Spark's own `spark.sql.crossJoin.enabled`
  * defaults to permissive since 3.0, so a fleet wants its own tripwire.
  *
  * The rule fails planning (never execution) when BOTH sides of a
  * condition-less inner/cross join exceed `maxBytes` by optimizer stats
  * AND the join carries no explicit hint — a `broadcast()` hint on either
  * side is read as intent (the engine's own NN join and exact near-dup
  * baselines declare themselves this way). Small-dim crosses (grid
  * seeding, centroid tables) pass untouched via the size gate.
  *
  *  - `spark.graft.crossJoinGuard.enabled`  (default false)
  *  - `spark.graft.crossJoinGuard.maxBytes` (default 10 MiB per side)
  */
object CrossJoinGuard extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.crossJoinGuard.enabled", "false").toBoolean)
      return plan
    val maxBytes = BigInt(conf.getConfString(
      "spark.graft.crossJoinGuard.maxBytes", (10L * 1024 * 1024).toString))
    plan.foreach {
      case j @ Join(left, right, Cross | Inner, None, hint)
          if hint.leftHint.isEmpty && hint.rightHint.isEmpty =>
        val (l, r) = (left.stats.sizeInBytes, right.stats.sizeInBytes)
        if (l > maxBytes && r > maxBytes)
          throw new SparkException(
            s"crossJoinGuard: condition-less ${j.joinType} join between two large relations " +
              s"($l and $r bytes by optimizer stats, guard at $maxBytes). " +
              "Add a join condition, broadcast() the intended small side, or disable " +
              "spark.graft.crossJoinGuard.enabled.")
      case _ =>
    }
    plan
  }
}
