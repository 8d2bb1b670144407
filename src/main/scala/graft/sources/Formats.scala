package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source/sink surface matching the reference's file formats (SURVEY.md
  * §1.1, §2.5):
  *
  *   - newline text input (`Split` reads line-aligned chunks,
  *     `mapreduce.go:72-110`) → `spark.read.textFile`
  *   - newline-JSON KeyValue intermediate files (`mapreduce.go:199-209`)
  *     → json source/sink over a (key, value) schema — provided for
  *     file-format parity; the engine itself shuffles via Tungsten
  *   - sorted `key: value` text output (`mapreduce.go:319-328`) →
  *     MapReduceJob.writeSortedText
  *
  * plus the modern formats (parquet/csv) the testdata and any real
  * warehouse use. All of these are Spark's own connectors; the value here
  * is the declared, typed surface + round-trip tests.
  */
object Formats {

  /** Newline-delimited text, one dataset element per line (reference input
    * format). Partition count is governed by maxPartitionBytes — the
    * reference's nMap chunking (`Split`) has no Spark-side analogue to
    * reimplement.
    */
  def readTextLines(spark: SparkSession, path: String): Dataset[String] =
    spark.read.textFile(path)

  /** The reference's intermediate record shape. */
  private val kvSchema = "key STRING NOT NULL, value STRING"

  /** Newline-JSON KeyValue files, the reference's shuffle wire format. */
  def writeKvJson(kvs: Dataset[(String, String)], path: String): Unit =
    kvs.toDF("key", "value").write.mode(SaveMode.Overwrite).json(path)

  def readKvJson(spark: SparkSession, path: String): Dataset[(String, String)] = {
    import spark.implicits._
    spark.read.schema(StructType.fromDDL(kvSchema)).json(path)
      .select(col("key"), col("value")).as[(String, String)]
  }

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, ddl: String): DataFrame =
    spark.read.option("header", "true").schema(StructType.fromDDL(ddl)).csv(path)

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** XML (built into Spark 4's sql core): the semi-structured feed format
    * legacy ingest pipelines still emit. rowTag names the repeated record
    * element.
    */
  def writeXml(df: DataFrame, path: String, rowTag: String = "row"): Unit =
    df.write.mode(SaveMode.Overwrite).option("rowTag", rowTag).format("xml").save(path)

  def readXml(spark: SparkSession, path: String, ddl: String, rowTag: String = "row"): DataFrame =
    spark.read.option("rowTag", rowTag).schema(StructType.fromDDL(ddl)).format("xml").load(path)

  /** Binary-file ingestion — how a multimodal pipeline actually reads
    * image/audio/video objects from a lake: one row per file with
    * (path, modificationTime, length, content BINARY), the schema the
    * m01–m11 ops consume downstream. `pathGlobFilter` prunes at the
    * LISTING (files that don't match are never opened — the multimodal
    * analogue of partition pruning), and the source is splittable at
    * file granularity so a directory of millions of objects fans out
    * across the cluster.
    */
  def readBinaryFiles(spark: SparkSession, path: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
}
