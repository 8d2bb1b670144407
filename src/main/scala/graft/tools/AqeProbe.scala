package graft.tools

/** Scratch experiment: per-query cost of AQE's runtime re-planning at
  * bench scale. AQE stays ON in the shipped config (it is the scale
  * story: runtime coalescing + skew splits); this quantifies what that
  * choice costs on a tiny local corpus, where every re-planned stage is
  * pure overhead.
  */
object AqeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val subset = Seq("q01_agg_lineitem", "q04_broadcast_join_agg", "q12_rollup",
      "d01_dedup_exact", "e03_sessionize", "t05_tf_df", "q30_outer_join")
    for (aqe <- Seq("true", "false")) {
      val spark = org.apache.spark.sql.SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.adaptive.enabled", aqe)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "2m")
        .config("spark.sql.files.openCostInBytes", "262144")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      spark.range(1000000).selectExpr("sum(id)").collect()
      // one warm pass then a timed pass, per config
      for (pass <- 1 to 2) {
        val t0 = System.nanoTime()
        subset.foreach { n =>
          graft.SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
          spark.sharedState.cacheManager.clearCache()
        }
        val sec = (System.nanoTime() - t0) / 1e9
        if (pass == 2) println(f"[aqeprobe] aqe=$aqe subset(${subset.size}) warm: $sec%.2f s")
      }
      spark.stop()
    }
  }
}
