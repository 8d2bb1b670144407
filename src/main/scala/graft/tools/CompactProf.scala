package graft.tools

/** Scratch profiling main for the compaction lifecycle entries
  * (p29-p33): times each internal stage of a bench sample so the
  * commit-log rewrite's cost is attributable to a stage, not a guess.
  * Usage: runMain graft.tools.CompactProf [sfDir] [repeats]
  */
object CompactProf {
  def main(args: Array[String]): Unit = {
    sys.props("graft.compact.prof") = "1"
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val n = if (args.length > 1) args(1).toInt else 3
    val spark = graft.core.Sessions.builder("local[32]", "32")
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.sql.files.openCostInBytes", "262144")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
        sys.env.getOrElse("GRAFT_COMMITTER_V", "1"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = for {s <- si.submissionTime; c <- si.completionTime} yield c - s
        System.err.println(f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%4d " +
          f"dur=${dur.getOrElse(-1L)}%6d ms  ${si.name.take(80)}")
      }
    })
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[cprof] $label%-32s ${(System.nanoTime() - t0) / 1e9}%7.3f s"); r
    }
    for (i <- 1 to n) {
      println(s"=== iteration $i ===")
      for (q <- Seq("p29_compact_manifest", "p30_optimize_where",
          "p31_optimize_zorder", "p32_maintain_where", "p33_maintain_recluster")) {
        val t0 = System.nanoTime()
        val df = time(s"$q fn()") { graft.SparkEntry.queries(q)(spark, dir) }
        time(s"$q noop") { df.write.format("noop").mode("overwrite").save() }
        println(f"[cprof] $q TOTAL ${(System.nanoTime() - t0) / 1e9}%7.3f s")
        graft.core.Sessions.sweepPersistedState(spark)
      }
    }
    spark.stop()
  }
}
