package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The partition-layout techniques that matter at warehouse scale,
  * demonstrated and plan-asserted at test scale: bucketed co-located
  * joins (no shuffle) and partition-pruned scans.
  */
class ScaleTechniquesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("bucketed tables join without a shuffle exchange") {
    // saveAsTable writes under the default warehouse dir
    // (<repo>/spark-warehouse, gitignored); tables dropped at the end
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    graft.core.Tables.lineitem(spark, dir)
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_b")
    graft.core.Tables.orders(spark, dir)
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey").saveAsTable("o_b")

    val joined = spark.table("li_b").join(spark.table("o_b"),
      col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle either side:\n$plan")
    assert(joined.count() === graft.core.Tables.lineitem(spark, dir).count())
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
  }

  test("hive-partitioned parquet prunes partitions at scan") {
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString + "/docs"
    graft.core.Tables.documents(spark, dir)
      .write.partitionBy("lang").parquet(out)
    val read = spark.read.parquet(out).filter(col("lang") === "en")
    val formatted = read.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("PartitionFilters: [isnotnull(lang"),
      s"lang filter must prune partitions:\n$formatted")
    val expected = graft.core.Tables.documents(spark, dir)
      .filter(col("lang") === "en").count()
    assert(read.count() === expected)
  }

  test("salted two-stage aggregation equals direct aggregation under key skew") {
    import spark.implicits._
    // heavily skewed: 90% of rows share one key
    val rows = (0 until 20000).map(i => (if (i % 10 == 0) s"k${i % 50}" else "hot", 1L))
    val df = rows.toDF("k", "v")
    val direct = df.groupBy(col("k")).agg(sum(col("v")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // stage 1: salt the key; stage 2: strip the salt and combine
    val salted = df
      .withColumn("salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(8)))
      .groupBy(col("k"), col("salt")).agg(sum(col("v")).as("ps"))
      .groupBy(col("k")).agg(sum(col("ps")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted === direct)
  }
}
