package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet star schema (TESTDATA.md).
  *
  * All queries take the scale-factor directory as a parameter so the same
  * plan runs at sf0.001 (smoke), sf0.01 (oracle), sf0.1 (bench) — and, by
  * design, on a 100 TB warehouse: the reads are plain parquet scans, so
  * Catalyst pushes filters/column pruning into the scan and partition
  * pruning applies unchanged on a partitioned production layout.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark only reads as a
    * raw long under spark.sql.legacy.parquet.nanosAsLong (set in every
    * session builder here). Normalize to a true TimestampType at
    * microsecond precision — same truncation DuckDB applies via epoch_us.
    */
  /** ns-long → microsecond TimestampType, shared by the batch loader and
    * the streaming source (one place for the truncation rule).
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    if (df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df

  def events(s: SparkSession, d: String): DataFrame = {
    // defensive: callers may hand us a session built without the flag
    // (it is a runtime SQL conf; if a future Spark makes it static this
    // no-ops and our own mains still set it at build time)
    try s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }
    normalizeEventTs(table(s, d, "events"))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
