package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named operator/query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) the DuckDB oracle the driver runs
  * over the same parquet tables. Column names and row order must agree
  * between the two — every query orders by a unique key and aliases every
  * computed column identically on both sides.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)

object QueryDef {
  /** Convenience for oracle-backed queries. */
  def apply(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, Some(oracle))

  /** For ops whose semantics DuckDB can't replay (streaming, approximate
    * algorithms) — driver records a weaker rows-only check. */
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, None)
}
