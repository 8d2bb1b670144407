package graft

import graft.sources.Formats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-trip tests for every source/sink surface. */
class FormatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory(s"graft-$name").toString + "/out"

  test("KeyValue newline-JSON round-trips (reference intermediate format)") {
    import spark.implicits._
    val kvs = Seq(("a", "1"), ("b", "2"), ("c", "x y")).toDS()
    val path = tmp("kvjson")
    Formats.writeKvJson(kvs, path)
    assert(Formats.readKvJson(spark, path).collect().toSet === kvs.collect().toSet)
  }

  test("csv round-trips the documents table") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val path = tmp("csv")
    Formats.writeCsv(docs, path)
    val back = Formats.readCsv(spark, path, "doc_id BIGINT, lang STRING, n_chars BIGINT")
    assert(back.collect().toSet === docs.collect().toSet)
  }

  test("parquet round-trips with schema intact") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val path = tmp("parquet")
    Formats.writeParquet(docs, path)
    val back = Formats.readParquet(spark, path)
    assert(back.schema === docs.schema)
    assert(back.count() === docs.count())
  }

  test("orc round-trips with schema intact") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val path = tmp("orc")
    Formats.writeOrc(docs, path)
    val back = Formats.readOrc(spark, path)
    assert(back.schema === docs.schema)
    assert(back.count() === docs.count())
  }

  test("xml round-trips values (Spark 4 built-in xml source)") {
    import org.apache.spark.sql.functions.col
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("lang")) // flat columns; xml has no binary
    val path = tmp("xml")
    Formats.writeXml(docs, path)
    val back = Formats.readXml(spark, path, "doc_id BIGINT, lang STRING")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want = docs.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back === want)
  }

  test("malformed JSON rows are captured, not silently dropped (PERMISSIVE + corrupt column)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_badjson")
    val f = tmp.resolve("in.jsonl")
    java.nio.file.Files.write(f,
      """{"id": 1, "v": "ok"}
        |{"id": 2, "v": "also ok"}
        |{"id": 3, "v": BROKEN
        |not json at all
        |{"id": 4, "v": "fine"}""".stripMargin.getBytes("UTF-8"))
    val df = spark.read
      .schema("id LONG, v STRING, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(f.toString)
      .cache() // corrupt-record column requires materialization before filtering
    assert(df.count() === 5, "every input line accounted for")
    assert(df.filter(org.apache.spark.sql.functions.col("_corrupt_record").isNotNull).count() === 2)
    assert(df.filter(org.apache.spark.sql.functions.col("_corrupt_record").isNull).count() === 3)
    df.unpersist()
    org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
  }

  test("text lines read one element per line (reference input format)") {
    import spark.implicits._
    val path = tmp("text")
    Seq("line one", "line two", "line three").toDS().write.text(path)
    assert(Formats.readTextLines(spark, path).count() === 3)
  }

  test("binaryFile reads object bytes verbatim and the glob prunes at listing") {
    val dir = java.nio.file.Files.createTempDirectory("graft-binary")
    val payloads = Map("a.img" -> Array[Byte](1, 2, 3, -1),
      "b.img" -> Array[Byte](9), "c.wav" -> Array[Byte](4, 5))
    payloads.foreach { case (n, bytes) =>
      java.nio.file.Files.write(dir.resolve(n), bytes)
    }
    val all = Formats.readBinaryFiles(spark, dir.toString)
      .select(col("path"), col("length"), col("content")).collect()
    assert(all.length === 3)
    all.foreach { r =>
      val name = r.getString(0).split('/').last
      assert(r.getAs[Array[Byte]]("content").toSeq === payloads(name).toSeq,
        s"bytes verbatim for $name")
      assert(r.getLong(1) === payloads(name).length.toLong)
    }
    // glob filter: only .img files are listed (never opened, not filtered after)
    val imgs = Formats.readBinaryFiles(spark, dir.toString, "*.img").count()
    assert(imgs === 2)
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }
}
