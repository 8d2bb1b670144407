package graft.tools

/** Single-query runner for interactive use:
  *
  *   sbt "runMain graft.tools.Run q01_agg_lineitem /root/testdata/sf0.01"
  *   sbt "runMain graft.tools.Run q01_agg_lineitem /root/testdata/sf0.01 --explain"
  *
  * Prints the first 50 rows (deterministic queries order their own
  * output; unordered results are shown as-is) and, with --explain, the
  * formatted physical plan — the ".explain and iterate" loop for one
  * query without editing Verify/Bench.
  */
object Run {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: graft.tools.Run <query_name|list> <sf_dir> [--explain]")
      sys.exit(2)
    }
    val (name, dir) = (args(0), args(1))
    if (name == "list") {
      graft.SparkEntry.queries.keys.toSeq.sorted.foreach(println)
      return
    }
    val fn = graft.SparkEntry.queries.getOrElse(name, {
      System.err.println(s"unknown query '$name' — try: graft.tools.Run list <dir>")
      sys.exit(2)
    })
    val spark = graft.core.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("WARN")
    val df = fn(spark, dir).persist() // show + count: one execution
    if (args.contains("--explain")) df.explain("formatted")
    df.show(50, truncate = false)
    println(s"[run] $name: ${df.count()} rows")
    df.unpersist()
    spark.stop()
  }
}
