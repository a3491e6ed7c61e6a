package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** The one `private[sql]` escape hatch this engine uses: wrap an
  * optimizer-held [[LogicalPlan]] back into a [[DataFrame]] so a
  * planning-time rule ([[graft.plans.AutoFilePrune]]) can evaluate a
  * SUBPLAN it discovered (the filtered dim side of a join) through the
  * ordinary public Dataset API. Spark offers no public constructor from
  * a plan; the conventional extension answer — used by every major
  * open-source Spark extension that plans against subtrees — is a shim
  * in an `org.apache.spark.sql` subpackage, which satisfies
  * `private[sql]`. Nothing else may live here: keep the surface to this
  * single forwarding call so the private-API exposure stays auditable. */
object PlanDataFrame {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)
}
