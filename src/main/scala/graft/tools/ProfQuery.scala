package graft.tools

/** Scratch profiling main: repeat named SparkEntry queries in a single
  * JVM with the bench session config, separating steady-state plan cost
  * from first-run JIT/codegen warmup. A comma-separated name list runs
  * the queries interleaved (a, b, c, a, b, c, ...) with the bench's
  * inter-run cache/checkpoint sweep — reproducing bench-order effects
  * (e.g. a query slowed by its alphabetical predecessor's leftover
  * state) that single-query repetition hides.
  *
  * Usage: runMain graft.tools.ProfQuery <name>[,<name>...] [sfDir] [repeats]
  */
object ProfQuery {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 3
    val spark = graft.core.Sessions.builder("local[32]", "32")
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.sql.files.openCostInBytes", "262144")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (i <- 1 to n; name <- names) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"[prof] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      graft.core.Sessions.sweepPersistedState(spark)
    }
    spark.stop()
  }
}
