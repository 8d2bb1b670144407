package graft.tools
/** Scratch probe: print a query's Bench.planFp in a cold vs pre-warmed
  * session, to localize fp instability (round 15).
  */
object FpProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.builder("local[8]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    if (args.contains("warm")) {
      graft.SparkEntry.queries("q01_agg_lineitem")(spark, dir).write.format("noop").mode("overwrite").save()
      graft.SparkEntry.queries("d07_dedup_clusters")(spark, dir).write.format("noop").mode("overwrite").save()
      graft.core.Sessions.sweepPersistedState(spark)
    }
    val df = graft.SparkEntry.queries(args(0))(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    println(s"FP ${args(0)} ${graft.Bench.planFp(df)}")
    spark.stop()
  }
}
