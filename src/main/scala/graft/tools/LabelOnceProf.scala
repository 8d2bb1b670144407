package graft.tools

import org.apache.spark.sql.functions._

/** Attribution tool for the d07/d10/p06 label cost: measures the bench's
  * LABEL-PER-QUERY shape (each query recomputes its own connected-
  * component labels — what BENCH_rN records) against the LABEL-ONCE
  * production shape (one labeling per ingest, materialized; every
  * consumer reads the label frame). A real deployment runs the second
  * shape, so the bench totals for d07+d10+p06 overstate the steady-state
  * cost by roughly two extra labelings — this tool prints the exact
  * split, recorded per round in docs/SCALE.md.
  *
  * d07 and d10 share one label frame (CC over the d03 pair graph of the
  * raw corpus). p06's labels cover its FILTERED survivor corpus, so they
  * are a second, pipeline-specific frame — materialized once here and
  * its back half (representative join + split assignment + stage rollup)
  * timed separately.
  *
  * Round 9: the measured label-once shape is now the SHIPPED shape —
  * d07/d10/p06 share labels through Graph.materializedOnce (build-once
  * parquet, read-many), so the "per-query" numbers below only show the
  * old relabeling cost on the FIRST call per (dir, edge-set) key; repeat
  * calls in one process read the materialized frame.
  *
  * Usage: runMain graft.tools.LabelOnceProf [sfDir]
  */
object LabelOnceProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Sessions.builder("local[32]", "32")
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.sql.files.openCostInBytes", "262144")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def sweep(): Unit = graft.core.Sessions.sweepPersistedState(spark)

    // ---- label-per-query (the bench contract): warm run, then measured
    def runQ(name: String): Double = {
      noop(graft.SparkEntry.queries(name)(spark, dir)); sweep()
      val t = time(noop(graft.SparkEntry.queries(name)(spark, dir))); sweep(); t
    }
    val tD07 = runQ("d07_dedup_clusters")
    val tD10 = runQ("d10_cluster_sizes")
    val tP06 = runQ("p06_prod_prep_pipeline")

    // ---- label-once: the d07/d10 frame materializes once (CC runs its
    // hop actions eagerly, so CONSTRUCTION belongs inside the timing)
    var labels: org.apache.spark.sql.DataFrame = null
    val tLabel = time {
      labels = graft.ops.Dedup.docClusterLabels(spark, dir).persist()
      noop(labels)
    }
    val tD07From = time(noop(labels)) // d07's output IS the label frame
    val tD10From = time(noop(graft.ops.Dedup.clusterHistogram(labels)))
    labels.unpersist(blocking = true)
    sweep()

    // ... and p06's survivor-corpus frame materializes once (funnel
    // scoring + exact dedup + pair generation + CC, all inside)
    var funnel: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = null
    var p6labels: org.apache.spark.sql.DataFrame = null
    val tP06Label = time {
      funnel = graft.ops.Profiling.funnelFrames(spark, dir)
      p6labels = graft.ops.Graph.connectedComponents(
        funnel._3.select(col("doc_id")),
        graft.ops.Profiling.nearDupPairs(funnel._3)).persist()
      noop(p6labels)
    }
    val tP06Rest = time(noop(
      graft.ops.Profiling.p06Stages(funnel._1, funnel._2, funnel._3, p6labels)))
    p6labels.unpersist(blocking = true)
    sweep()

    val perQuery = tD07 + tD10 + tP06
    val labelOnce = tLabel + tD07From + tD10From + tP06Label + tP06Rest
    println(f"[labelonce] per-query : d07=$tD07%.2f d10=$tD10%.2f p06=$tP06%.2f  total=$perQuery%.2f s")
    println(f"[labelonce] label-once: corpus_labels=$tLabel%.2f d07=$tD07From%.2f d10=$tD10From%.2f " +
      f"p06_labels=$tP06Label%.2f p06_rest=$tP06Rest%.2f  total=$labelOnce%.2f s")
    println(f"[labelonce] delta: ${perQuery - labelOnce}%.2f s saved by labeling once (sf dir $dir)")
    spark.stop()
  }
}
