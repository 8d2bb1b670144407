package graft.tools

import org.apache.spark.sql.functions._

/** Scratch stage-level profile of q25's component costs: times each
  * subtree (distinct aggs, sketch agg, global-order band) separately so
  * optimization effort lands on the dominant one.
  *
  * Usage: runMain graft.tools.Q25Prof [sfDir] [repeats]
  */
object Q25Prof {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val n = if (args.length > 1) args(1).toInt else 3
    val spark = graft.core.Sessions.builder("local[32]", "32")
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.sql.files.openCostInBytes", "262144")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[q25prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      graft.core.Sessions.sweepPersistedState(spark)
    }
    for (_ <- 1 to n) {
      time("aggP (countDistinct+approx partkey)") {
        li.groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_partkey")), approx_count_distinct(col("l_partkey")))
          .write.format("noop").mode("overwrite").save()
      }
      time("aggS (countDistinct+approx+percentile suppkey)") {
        li.groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_suppkey")), approx_count_distinct(col("l_suppkey")),
            percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)),
            count(lit(1)))
          .write.format("noop").mode("overwrite").save()
      }
      time("combined one-pass agg (Expand 3x)") {
        li.groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_partkey")), approx_count_distinct(col("l_partkey")),
            countDistinct(col("l_suppkey")), approx_count_distinct(col("l_suppkey")),
            percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)),
            count(lit(1)))
          .write.format("noop").mode("overwrite").save()
      }
      time("globalOrder band (2 cols)") {
        val ord = Seq(col("l_returnflag"), col("l_extendedprice"))
        val (numbered, _) = graft.plans.GlobalOrder.withGlobalRowNumber(
          li.select(ord: _*), ord, "rn")
        numbered.filter(col("rn") % 100000 === 0)
          .write.format("noop").mode("overwrite").save()
      }
      time("full q25") {
        graft.SparkEntry.queries("q25_approx_sketches")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
