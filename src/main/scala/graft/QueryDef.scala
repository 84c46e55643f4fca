package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: a DataFrame program plus (when SQL-expressible)
  * the equivalent ANSI SQL the driver runs in DuckDB as the oracle.
  *
  * Contract (driver): Spark result and oracle result must agree on
  * column NAMES, row values, and (after the driver's canonicalization)
  * content hash — so every computed column is aliased identically on
  * both sides and every query ends in a deterministic ORDER BY.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(fn: (SparkSession, String) => DataFrame, oracle: String): QueryDef =
    QueryDef(fn, Some(oracle))
}
