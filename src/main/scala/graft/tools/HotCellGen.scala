package graft.tools

import org.apache.spark.sql.functions._

/** Writes a synthetic embeddings corpus whose rows ALL land in one
  * quantizer cell (identical non-zero vectors: every similarity ties at
  * 1.0 and the shared smallest-cid tiebreak sends all 1200 rows to one
  * cell of ~2.3× CellCap), so d08's rank-chained chunk path — inert on
  * the driver testdata, whose cells never exceed the cap — runs ACTIVE
  * end-to-end and can be checked against the DuckDB oracle:
  *
  *   runMain graft.tools.HotCellGen /tmp/hotcorpus
  *   runMain graft.Verify /tmp/hotcorpus /tmp/hotout d08_semantic_dedup
  *   python3 tools/localcheck.py /tmp/hotcorpus /tmp/hotout
  *
  * Expected: PASS (1200 rows, every row labeled with the global min
  * vec_id — all pairs tie above threshold and connected components
  * stitches the three chunks into one cluster).
  */
object HotCellGen {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/hotcorpus")
    val n = if (args.length > 1) args(1).toInt else 1200
    val spark = graft.core.Sessions.builder("local[8]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // single FILE (not a part-file directory): the DuckDB oracle's view
    // registration reads '<dir>/embeddings.parquet' as one file, like
    // the driver testdata layout
    val stage = s"$out/_stage"
    spark.range(n).select(
      col("id").as("vec_id"),
      transform(sequence(lit(1), lit(graft.ops.Similarity.Dim)),
        _ => lit(0.1f)).as("embedding"),
      (col("id") % 10).cast("int").as("label"))
      .coalesce(1)
      .write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$out/embeddings.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(stage))
    println(s"[hotcellgen] wrote $n identical-vector rows to $out/embeddings.parquet")
    spark.stop()
  }
}
