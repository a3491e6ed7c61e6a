package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-verifiable query: a Spark DataFrame program plus (where the
  * semantics are SQL-expressible) an equivalent ANSI SQL text the driver runs
  * in DuckDB over the same parquet tables. Column names MUST match between
  * the two — the driver sorts columns by name and hashes values.
  *
  * Discipline for hash-stable oracles (learned the hard way at sf0.01):
  *  - every output column is explicitly typed the same on both sides
  *    (DOUBLE / BIGINT / VARCHAR / TIMESTAMP — never DECIMAL or HUGEINT
  *    outputs: Spark's decimal widening and DuckDB's SUM(BIGINT)→HUGEINT
  *    would diverge);
  *  - double aggregates are computed exactly: sums go through
  *    DECIMAL(18,2) (exact, order-independent) and are cast back to DOUBLE,
  *    so partition order can't flip low bits;
  *  - results carry a total deterministic ORDER BY (unique key last);
  *  - LIMIT only ever follows a total ORDER BY.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))
  /** Non-SQL-expressible op → driver records a weaker rows-only check. */
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
