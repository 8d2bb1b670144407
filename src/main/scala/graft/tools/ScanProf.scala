package graft.tools

import org.apache.spark.sql.functions._

/** Micro-experiments for the scan+agg floor: per-task time composition
  * of a q01-shaped aggregate under different split configs.
  * Usage: runMain graft.tools.ScanProf [sfDir]
  */
object ScanProf {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.core.Sessions.builder("local[32]", "32")
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.sql.files.openCostInBytes", "262144")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val acc = spark.sparkContext.longAccumulator("taskTime")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        acc.add(te.taskInfo.duration)
      }
    })
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time(label: String, reps: Int = 3)(f: => Unit): Unit = {
      for (i <- 1 to reps) {
        acc.reset()
        val t0 = System.nanoTime()
        f
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"[scanprof] $label%-44s run $i wall=$wall%6.2f s taskSum=${acc.value / 1000.0}%6.2f s")
      }
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val q01 = graft.SparkEntry.queries("q01_agg_lineitem")
    time("q01 (2m splits)") { noop(q01(spark, dir)) }
    spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")
    spark.conf.set("spark.sql.files.minPartitionNum", "1")
    time("q01 (128m splits, minPartitionNum=1)") { noop(q01(spark, dir)) }
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2m")
    spark.conf.unset("spark.sql.files.minPartitionNum")

    val li = graft.core.Tables.lineitem(spark, dir)
    time("scan only (all cols count via noop)") { noop(li) }
    time("sum(double) x4") {
      noop(li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast("double")),
          sum(col("l_extendedprice").cast("double")),
          sum(col("l_discount").cast("double")),
          avg(col("l_tax").cast("double"))))
    }
    time("sum(decimal) x4") {
      noop(li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")),
          sum(col("l_extendedprice").cast("decimal(18,2)")),
          sum(col("l_discount").cast("decimal(18,2)")),
          avg(col("l_tax").cast("decimal(18,2)"))))
    }
    spark.stop()
  }
}
