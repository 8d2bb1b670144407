package graft.tools

/** Stage-level profiling main for arbitrary SparkEntry queries: runs
  * each named query with the bench session config and prints every
  * completed stage's task count and duration, plus the fn()/noop wall
  * split. Usage: runMain graft.tools.QProf <name>[,<name>...] [sfDir] [repeats]
  */
object QProf {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 2
    val spark = graft.core.Sessions.builder("local[32]", "32")
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.sql.files.openCostInBytes", "262144")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var show = false
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = if (show) {
        val si = sc.stageInfo
        val dur = for {s <- si.submissionTime; c <- si.completionTime} yield c - s
        if (dur.exists(_ >= 50))
          System.err.println(f"[stage] id=${si.stageId}%5d tasks=${si.numTasks}%4d " +
            f"dur=${dur.getOrElse(-1L)}%6d ms  ${si.name.take(70)}")
      }
    })
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (i <- 1 to n; name <- names) {
      println(s"=== $name run $i ===")
      show = i == n // stages for the last (warm) run only
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"[qprof] $name run $i: fn=${(t1 - t0) / 1e9}%.2f s noop=${(t2 - t1) / 1e9}%.2f s")
      graft.core.Sessions.sweepPersistedState(spark)
    }
    spark.stop()
  }
}
