package graft.tools

/** Ad-hoc profiler for the stream-stream join gates (VERDICT r9 #4):
  * times named gate queries at the current SPARK_GRAFT_STREAM_PARTS
  * setting. Usage:
  *   SPARK_GRAFT_STREAM_PARTS=4 sbt "runMain graft.tools.StreamProf es05_interval_pairs es14_interval_left_outer"
  */
object StreamProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq
                else Seq("es05_interval_pairs", "es14_interval_left_outer")
    val spark = graft.core.Sessions.builder("local[32]", "32")
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").count()
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      for (i <- 0 until 3) {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[streamprof] $name run$i $dt%.2f s (parts=${sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "8")})")
      }
    }
    spark.stop()
  }
}
