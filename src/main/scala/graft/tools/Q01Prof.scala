package graft.tools

/** Scratch profiling main for the q01 bench outlier investigation (round-1
  * verdict item 9): repeats q01 in one JVM with the bench session config
  * to separate plan cost from first-run JIT/codegen warmup.
  */
object Q01Prof {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.builder("local[32]", "32")
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.sql.files.openCostInBytes", "262144")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (i <- 1 to 5) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q01_agg_lineitem")(spark, "/root/testdata/sf0.1")
        .write.format("noop").mode("overwrite").save()
      println(f"[q01prof] run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
