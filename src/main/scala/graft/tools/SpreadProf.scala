package graft.tools

import org.apache.spark.sql.functions._

/** Scan-parallelism experiment: the driver's testdata writes each table
  * as ONE parquet file with ONE row group, so every scan stage has one
  * effective task regardless of split count — the per-task breakdown
  * below proves it, and the A/B measures what a scale-adaptive
  * repartition after the read (guide §2.5 "unsplittable input") buys
  * for kernel-heavy consumers.
  * Usage: runMain graft.tools.SpreadProf [sfDir]
  */
object SpreadProf {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
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
        val dur = for { s <- si.submissionTime; c <- si.completionTime } yield c - s
        if (dur.exists(_ >= 30))
          System.err.println(f"[stage] id=${si.stageId}%5d tasks=${si.numTasks}%4d " +
            f"dur=${dur.getOrElse(-1L)}%6d ms  ${si.name.take(70)}")
      }
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (show && te.taskInfo.duration >= 100)
          System.err.println(f"[task ] stage=${te.stageId}%5d dur=${te.taskInfo.duration}%6d ms")
    })
    spark.range(1000000).selectExpr("sum(id)").collect()

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String, reps: Int = 3)(f: => Unit): Unit =
      for (i <- 1 to reps) {
        show = i == reps
        val t0 = System.nanoTime()
        f
        println(f"[spreadprof] $label%-52s run $i wall=${(System.nanoTime() - t0) / 1e9}%6.2f s")
        show = false
        graft.core.Sessions.sweepPersistedState(spark)
      }

    val docs = graft.core.Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    println(s"[spreadprof] documents scan partitions = ${docs.rdd.getNumPartitions}")
    val li = graft.core.Tables.lineitem(spark, dir)
    println(s"[spreadprof] lineitem scan partitions = ${li.rdd.getNumPartitions}")

    // A) tokenize+bigram partial-agg kernel (t14's hot stage), as-is vs spread
    def bigrams(d: org.apache.spark.sql.DataFrame) = d
      .select(col("doc_id"), graft.ops.TextAnalysis.toks(col("text")).as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(w)-1), i -> struct(w[i-1] AS prev, w[i] AS cur))")).as("bg"))
      .groupBy(col("doc_id"), col("bg.prev"), col("bg.cur")).agg(count(lit(1)).as("k"))
    time("bigram kernel, scan partitions") { noop(bigrams(docs)) }
    time("bigram kernel, repartition(32)") { noop(bigrams(docs.repartition(32))) }

    // B) full t14 via registry, as committed
    val t14 = graft.SparkEntry.queries("t14_bigram_surprise")
    time("t14 full (registry)") { noop(t14(spark, dir)) }

    // C) q01-shaped decimal agg on lineitem, as-is vs spread
    def q01ish(d: org.apache.spark.sql.DataFrame) = d
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")),
        sum(col("l_extendedprice").cast("decimal(18,2)")),
        sum(col("l_discount").cast("decimal(18,2)")),
        avg(col("l_tax").cast("decimal(18,2)")))
    time("decimal agg x4, scan partitions") { noop(q01ish(li)) }
    time("decimal agg x4, repartition(32)") { noop(q01ish(li.repartition(32))) }

    // D) 5-gram md5 kernel (d25/d28's gram stream), as-is vs spread
    def grams(d: org.apache.spark.sql.DataFrame) = d
      .select(col("doc_id"), graft.ops.TextAnalysis.toks(col("text")).as("w"))
      .filter(size(col("w")) >= 5)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w)-5), i -> struct(i AS gpos, " +
          "conv(substring(md5(concat_ws(' ', slice(w, i+1, 5))), 1, 15), 16, 10) AS gk))")).as("g"))
      .groupBy(col("g.gk")).agg(count(lit(1)).as("c"))
    time("5-gram md5 kernel, scan partitions") { noop(grams(docs)) }
    time("5-gram md5 kernel, repartition(32)") { noop(grams(docs.repartition(32))) }

    spark.stop()
  }
}
