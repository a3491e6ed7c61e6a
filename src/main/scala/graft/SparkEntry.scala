package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 is registered here as a named
  * query; `oracleSql` carries the DuckDB-equivalent SQL for the driver's
  * hash compare (omitted only for non-SQL-expressible ops, which get a
  * rows-only check).
  */
object SparkEntry {

  /** All registered queries, aggregated from the per-family modules. */
  val defs: Seq[QueryDef] =
    RelationalQueries.all ++ CleaningQueries.all ++ NnQueries.all ++
      TextQueries.all ++ AnnQueries.all ++ SourceQueries.all ++
      E2eQueries.all ++ ScaleQueries.all ++ JoinQueries.all ++
      CompositeQueries.all ++ SampleQueries.all ++ CurationQueries.all ++
      WebCurationQueries.all ++ WarehouseQueries.all ++ OptimizerQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A1-shaped: filter → two broadcast dim joins → group-avg → order → limit
    * (reference README.md:4, webapplication_screens.png). */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_flagship")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.collect { case QueryDef(n, _, Some(o)) => n -> o }.toMap
}
