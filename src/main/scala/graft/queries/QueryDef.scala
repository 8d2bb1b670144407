package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: a Spark plan + (when SQL-expressible) the ANSI SQL
  * the driver runs in DuckDB over the same parquet tables as the oracle.
  * Column names/aliases MUST match between `fn` output and `oracle` —
  * the driver sorts columns by name before hashing values.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryModule {
  def defs: Seq[QueryDef]
}
