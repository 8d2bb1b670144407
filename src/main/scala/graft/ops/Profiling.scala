package graft.ops

import graft.core.Tables
import graft.queries.{QueryDef, QueryModule}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality profiling: per-column stats in ONE scan of the fact
  * table (the agg computes every column's stats in a single pass, then an
  * inline explode unpivots to a row per column — vs the naive
  * one-scan-per-column loop). The shape any ingest-validation step runs
  * before a 100 TB training job.
  */
object Profiling extends QueryModule {

  private val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  private def p01(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}_nonnull"),
        countDistinct(col(c)).as(s"${c}_distinct"),
        min(col(c)).as(s"${c}_min"),
        max(col(c)).as(s"${c}_max"))
    }
    val total = count(lit(1)).as("n_rows")
    val one = li.agg(total, aggs: _*)
    val rows: Seq[Column] = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("n_rows"),
        col(s"${c}_nonnull").as("n_nonnull"),
        col(s"${c}_distinct").as("n_distinct"),
        col(s"${c}_min").as("min_v"),
        col(s"${c}_max").as("max_v"))
    }
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  private val p01Sql = cols.map { c =>
    s"""SELECT '$c' AS col_name, count(*) AS n_rows, count($c) AS n_nonnull,
       |  count(DISTINCT $c) AS n_distinct, min($c) AS min_v, max($c) AS max_v
       |FROM lineitem""".stripMargin
  }.mkString("\nUNION ALL\n")

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("p01_profile", p01, Some(p01Sql)),
  )
}
