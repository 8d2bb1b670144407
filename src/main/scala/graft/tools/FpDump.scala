package graft.tools
/** Scratch probe: write a query's NORMALIZED canonical plan string (the
  * exact text Bench.planFp hashes) to a file, under an optional warm-up
  * prefix of other queries — diff two dumps to localize residual
  * fingerprint instability (round 15).
  * Usage: FpDump <outFile> <query> [warmQuery ...]
  */
object FpDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.builder(
      sys.env.getOrElse("FPDUMP_MASTER", "local[8]"),
      sys.env.getOrElse("FPDUMP_SHUFFLE", "8")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    args.drop(2).foreach { w =>
      graft.SparkEntry.queries(w)(spark, dir).write.format("noop").mode("overwrite").save()
      graft.core.Sessions.sweepPersistedState(spark)
    }
    // bench protocol: cold + three warm runs, sweep between, fp from
    // the LAST run's DataFrame
    var df: org.apache.spark.sql.DataFrame = null
    (1 to sys.env.getOrElse("FPDUMP_RUNS", "1").toInt).foreach { _ =>
      df = graft.SparkEntry.queries(args(1))(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      df.queryExecution.optimizedPlan // the bench's forcing rule: pre-sweep
      graft.core.Sessions.sweepPersistedState(spark)
    }
    val norm = graft.Bench.normalize(graft.Bench.fpPlan(df).toString)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(args(0)), norm)
    println(s"DUMPED ${args(1)} fp=${graft.Bench.planFp(df)} chars=${norm.length}")
    spark.stop()
  }
}
