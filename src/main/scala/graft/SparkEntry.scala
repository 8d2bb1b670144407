package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared query lives in a [[graft.queries.QueryModule]]; this
  * object is only the aggregation point the driver calls into.
  */
object SparkEntry {

  private def modules: Seq[QueryModule] = Seq(
    Relational,
    Relational2,
    Relational3,
    Relational4,
    Relational5,
    Relational6,
    EventsQueries,
    WordCount,
    graft.ops.TextAnalysis,
    graft.ops.Dedup,
    graft.ops.Similarity,
    graft.ops.Multimodal,
    graft.ops.Profiling,
    graft.ops.Sampling,
    graft.ops.SemDedup,
    graft.streaming.StreamingGate,
    graft.streaming.IngestPipeline,
  )

  private lazy val all: Seq[QueryDef] = modules.flatMap(_.defs)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The production prep pipeline: text analysis, filtering, exact +
    * cluster (connected-components) dedup, and deterministic split
    * assignment in one plan; its stage funnel is non-empty on any corpus.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("p06_prod_prep_pipeline")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
