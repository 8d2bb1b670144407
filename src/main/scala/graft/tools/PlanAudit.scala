package graft.tools

/** Dumps executed-plan red-flag summaries for the round-2+ queries —
  * the ".explain and iterate" discipline, kept runnable.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = graft.core.Sessions.local("8")
    val names = Seq("q20_ntile", "q26_exact_percentiles", "q27_array_map_funcs",
      "s03_ann_lsh", "s05_bucketed_neardup", "s06_ann_ivf",
      "d03_ngram_jaccard", "d05_simhash", "e05_interval_join", "e06_sliding_window",
      // round 3
      "d07_dedup_clusters", "d08_semantic_dedup", "d09_dup_coverage",
      "p06_prod_prep_pipeline", "q35_range_frame", "e08_funnel", "m04_record_assembly",
      // round 4
      "q39_stats_agg", "q40_recursive_cte", "q41_nested_struct",
      "t10_bigram_pairs", "e10_top_paths", "p09_split_drift", "s07_quantized_knn",
      // round 7 (distinct-agg rebuilds + the capped d08 pair stage)
      "p01_profile", "q11_distinct_agg", "q34_null_handling", "q25_approx_sketches",
      // round 8 (PQ/ADC ladder, scrub/surprise/k-means, composed tail)
      "d11_decontamination", "d12_segment_scrub", "t13_unigram_surprise",
      "s08_pq_ann", "s09_two_stage_ann", "s10_kmeans_step",
      "p13_clean_chunk_pipeline")
    for (n <- names) {
      val p = graft.SparkEntry.queries(n)(spark, dir).queryExecution.executedPlan.toString
      val flags = Seq(
        "CartesianProduct" -> p.contains("CartesianProduct"),
        "SinglePartition"  -> p.contains("SinglePartition"),
        "SortMergeJoin"    -> p.contains("SortMergeJoin"),
        "BroadcastNLJ"     -> p.contains("BroadcastNestedLoopJoin"))
        .collect { case (k, true) => k }
      println(s"[audit] $n: ${if (flags.isEmpty) "clean" else flags.mkString(", ")}")
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
