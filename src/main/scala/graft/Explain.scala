package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: `runMain graft.Explain <sfDir> <query...>` prints the
  * formatted physical plan of each named query (all queries if none named).
  * Used to check the things the optimizer should be doing for us:
  * PushedFilters on scans, BroadcastHashJoin for dims, partial aggregation,
  * WholeStageCodegen spans.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.create(4)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
