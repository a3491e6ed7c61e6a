package graft

/** Dev tool: `runMain graft.Show <sfDir> <query...>` runs each named query
  * and prints its rows — the quick feedback loop between editing a query
  * and running the full Verify/oracle gate.
  */
object Show {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q01_flagship")
    val spark = GraftSession.create(4)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).show(100, truncate = false)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
