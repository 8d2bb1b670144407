package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions: the properties that make these queries
  * scale (pushdown, pruning, broadcast, top-k without global sort) must
  * not silently regress.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  private def formatted(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q01: shipdate filter is pushed into the parquet scan and columns pruned") {
    val f = formatted("q01_agg_lineitem")
    assert(f.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(!f.contains("l_orderkey"), "scan must not read unused columns")
  }

  test("q02: both predicates pushed to the scan") {
    val f = formatted("q02_filter_project")
    assert(f.contains("GreaterThanOrEqual(l_discount,0.05)"))
    assert(f.contains("LessThan(l_quantity,25.0)"))
  }

  test("q04: dimension join is a broadcast hash join, no shuffle of the fact side") {
    val p = plan("q04_broadcast_join_agg")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q05: all dimension joins broadcast") {
    val p = plan("q05_multi_join")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q06/q07: semi and anti joins planned as such") {
    assert(plan("q06_semi_join").contains("LeftSemi"))
    assert(plan("q07_anti_join").contains("LeftAnti"))
  }

  test("q10: global top-k is TakeOrderedAndProject, not a full sort") {
    val p = plan("q10_topk")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Exchange rangepartitioning"), "no global sort shuffle for top-k")
  }

  test("q36: null-ordered top-k is a bounded aggregate, not a 2-partition window sort") {
    val p = plan("q36_null_ordering")
    assert(!p.contains("Window"), "the |groups|=2 window sort is the scale killer q36 replaced")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      "the BottomKTuples Aggregator must plan as partial+final aggregation")
  }

  test("q51: keyset page is TakeOrderedAndProject over a pushed range filter") {
    val p = plan("q51_keyset_pagination")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Exchange rangepartitioning"), "no global sort for a 20-row page")
  }

  test("s18/s19: search query batches broadcast; corpus sides never do") {
    for (n <- Seq("s18_filtered_search", "s19_tombstone_search")) {
      val p = plan(n)
      assert(p.contains("BroadcastExchange"), s"$n: the LIMIT-capped batch must broadcast")
      assert(!p.contains("CartesianProduct"), s"$n: no unbounded cartesian")
    }
  }

  test("s28: the label predicate is a JOIN key on the corpus leg, never a post-scoring filter") {
    // the round-13 contract: filtered trained-IVF search applies the
    // metadata predicate IN the search — rows with the wrong label must
    // be dropped by the candidate equi-join (cell AND label), so no
    // Filter node anywhere references the label column (post-filtering
    // would pay the distance work first and under-fill top-k)
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}
    val plan = SparkEntry.queries("s28_filtered_trained")(spark, dir)
      .queryExecution.optimizedPlan
    try {
      val labelJoins = plan.collect {
        case j: Join if j.condition.exists(_.references.exists(
          _.name.toLowerCase.contains("label"))) => j
      }
      assert(labelJoins.nonEmpty, "the label equality must ride in a join condition")
      // Catalyst inserts isnotnull(label) null guards BELOW the join for
      // its keys — that is pushdown, the opposite of the hazard. Flag
      // only filters that COMPARE labels (a post-hoc qlabel = label
      // residual would surface here as an EqualTo conjunct).
      import org.apache.spark.sql.catalyst.expressions.IsNotNull
      def conjuncts(e: org.apache.spark.sql.catalyst.expressions.Expression)
          : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = e match {
        case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
          conjuncts(l) ++ conjuncts(r)
        case x => Seq(x)
      }
      val labelFilters = plan.collect {
        case f: Filter if conjuncts(f.condition).exists {
          case _: IsNotNull => false
          case c => c.references.exists(_.name.toLowerCase.contains("label"))
        } => f
      }
      assert(labelFilters.isEmpty,
        s"label must never be a post-hoc comparison filter:\n${labelFilters.mkString("\n")}")
    } finally graft.core.Sessions.sweepPersistedState(spark)
  }

  test("s29: the tombstone predicate sits on join INPUTS, never after scoring") {
    // the round-13 contract: the deletion check rides the index leg of
    // the candidate join — every Filter carrying the del_ hash compare
    // must have a join-free subtree (it filters a join input), so a
    // tombstoned vector is excluded BEFORE any distance work. A
    // post-scoring exclusion would surface as a hash Filter sitting
    // above the scoring joins.
    import org.apache.spark.sql.catalyst.expressions.Md5
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}
    val plan = SparkEntry.queries("s29_tombstone_trained")(spark, dir)
      .queryExecution.optimizedPlan
    try {
      val hashFilters = plan.collect {
        case f: Filter if f.condition.exists(_.isInstanceOf[Md5]) => f
      }
      assert(hashFilters.nonEmpty, "the tombstone hash filter must exist")
      for (f <- hashFilters)
        assert(f.collect { case j: Join => j }.isEmpty,
          s"tombstone filter must precede every join:\n$f")
    } finally graft.core.Sessions.sweepPersistedState(spark)
  }

  test("d20: the sweep reuses d03's inverted-index shape — no cartesian, no global window") {
    val p = plan("d20_jaccard_sweep")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("Window"), "bucketing + literal-frame suffix sums replace any window")
  }

  test("q45: lateral top-k decorrelates to WindowGroupLimit, never a nested loop") {
    val p = plan("q45_lateral_topk")
    assert(p.contains("WindowGroupLimit"),
      "the correlated LIMIT must lower to a group-limit, pruned map-side")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "per-outer-row re-execution would be quadratic at scale")
  }

  test("wc01: word count aggregates partially before the shuffle (map-side combine)") {
    val p = plan("wc01_wordcount")
    assert(p.contains("HashAggregate"))
    // partial agg appears below the exchange: two HashAggregate nodes
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("q20: two-pass ntile has no single-partition exchange or global window") {
    val p = plan("q20_ntile")
    assert(!p.contains("SinglePartition"),
      "global ntile must not funnel rows through one partition")
    // the surviving window is per-range-partition (partitionBy the pid)
    assert(p.contains("Window"))
  }

  test("q26: exact percentiles have no single-partition exchange (two-pass rank)") {
    val p = plan("q26_exact_percentiles")
    assert(!p.contains("SinglePartition"),
      "exact percentile must not sort the column on one partition")
  }

  test("e05: interval join is an equi-join on (user_id, bucket), not user_id alone") {
    val p = plan("e05_interval_join")
    assert(p.contains("bkt"), "join keys must include the time bucket")
    assert(!p.contains("CartesianProduct"))
  }

  test("s05/s06: bucketed similarity paths contain no cartesian product") {
    for (q <- Seq("s05_bucketed_neardup", "s06_ann_ivf", "s03_ann_lsh")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q must generate candidates via bucket equi-joins, not all-pairs")
    }
  }

  test("q40: recursion lowers to UnionLoop, the spine join broadcasts, one shuffle total") {
    val p = plan("q40_recursive_cte")
    assert(p.contains("UnionLoop"), "WITH RECURSIVE must plan as UnionLoop")
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      "the 84-row month spine must broadcast onto orders")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      "only the final month aggregation may shuffle")
  }

  test("q42: both window functions ride ONE shuffle on the compaction key") {
    val p = plan("q42_changelog_compact")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      "row_number and the version count must share the o_custkey exchange")
  }

  test("t10/e10: per-doc pairing and path assembly reuse partitioning; top-k never global-sorts") {
    for (q <- Seq("t10_bigram_pairs", "e10_top_paths")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"), s"$q top-k must not global-sort")
      assert(!p.contains("Exchange rangepartitioning"), s"$q must not range-shuffle")
      assert("Exchange hashpartitioning".r.findAllIn(p).size == 2,
        s"$q: window exchange + final aggregation exchange only " +
          "(the groupBy over the window's keys reuses its partitioning)")
    }
  }

  test("scale-lint rule flags global windows and cartesian joins, passes clean plans") {
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions._
    import graft.plans.ScaleLint
    spark.experimental.extraOptimizations = Seq(ScaleLint)
    try {
      ScaleLint.reset()
      val df = spark.range(100).toDF("id")
      df.select(col("id"), row_number().over(W.orderBy(col("id"))).as("rn"))
        .queryExecution.optimizedPlan // triggers the optimizer
      assert(ScaleLint.findings.toArray.exists(_.toString.contains("no PARTITION BY")))

      // big × big cartesian: flagged
      ScaleLint.reset()
      val big = spark.range(100000000L).toDF("id") // stats ≫ broadcast threshold
      big.as("a").crossJoin(big.as("b")).queryExecution.optimizedPlan
      assert(ScaleLint.findings.toArray.exists(_.toString.contains("cartesian")))

      // broadcast-size side: a legitimate streamed product, NOT flagged
      ScaleLint.reset()
      big.as("a").crossJoin(broadcast(df.as("b"))).queryExecution.optimizedPlan
      assert(ScaleLint.findings.isEmpty,
        s"broadcast cross join must be lint-clean, got: ${ScaleLint.findings}")

      // fixed-point iterations / repeated optimization dedupe to one finding
      ScaleLint.reset()
      big.as("a").crossJoin(big.as("b")).queryExecution.optimizedPlan
      big.as("a").crossJoin(big.as("b")).queryExecution.optimizedPlan
      assert(ScaleLint.findings.size() == 1,
        s"identical plan must record once, got ${ScaleLint.findings.size()}")

      // multi-distinct (two different columns in one agg): flagged
      ScaleLint.reset()
      spark.range(100).toDF("id")
        .agg(countDistinct(col("id")), countDistinct(col("id") + 1))
        .queryExecution.optimizedPlan
      assert(ScaleLint.findings.toArray.exists(_.toString.contains("DISTINCT")),
        s"multi-distinct Expand must be flagged, got: ${ScaleLint.findings}")
      // ONE finding per hazard: the pre-rewrite Aggregate and the
      // post-rewrite Expand are different nodes over the same child —
      // the child-keyed dedup must collapse them
      assert(ScaleLint.findings.size() == 1,
        s"one multi-distinct hazard must record once, got: ${ScaleLint.findings}")

      // single distinct + non-distinct aggs, and a rollup's Expand
      // (spark_grouping_id, not gid): both legitimate, NOT flagged
      ScaleLint.reset()
      spark.range(100).toDF("id")
        .agg(countDistinct(col("id")), count(lit(1))).queryExecution.optimizedPlan
      spark.range(100).toDF("id")
        .rollup(col("id")).agg(count(lit(1))).queryExecution.optimizedPlan
      // a USER column literally named gid riding through a rollup Expand
      // (the SemDedup coarse-group name) must not trip the gid heuristic
      spark.range(100).selectExpr("id", "id % 3 AS gid")
        .rollup(col("gid")).agg(count(lit(1))).queryExecution.optimizedPlan
      // canonicalization: a+b and b+a are ONE semantic distinct group
      // (Catalyst plans no Expand), so the lint must agree
      spark.range(100).selectExpr("id AS a", "id + 1 AS b")
        .agg(countDistinct(col("a") + col("b")), countDistinct(col("b") + col("a")))
        .queryExecution.optimizedPlan
      assert(ScaleLint.findings.isEmpty,
        s"single-distinct, rollup, gid-named column and canonical-equal " +
          s"distincts must be lint-clean, got: ${ScaleLint.findings}")

      // broadcast HINT on an uncapped corpus-table scan: flagged (Spark
      // obeys explicit hints regardless of size — at 100 TB the frame
      // rides into every executor)
      ScaleLint.reset()
      val docs = graft.core.Tables.documents(spark, dir).select("doc_id", "lang")
      spark.range(10).toDF("doc_id").join(broadcast(docs), "doc_id")
        .queryExecution.optimizedPlan
      assert(ScaleLint.findings.toArray.exists(_.toString.contains("UNCAPPED")),
        s"uncapped corpus broadcast must be flagged, got: ${ScaleLint.findings}")

      // the capped shapes pass: a limit, and an aggregate
      ScaleLint.reset()
      spark.range(10).toDF("doc_id").join(broadcast(docs.limit(100)), "doc_id")
        .queryExecution.optimizedPlan
      spark.range(10).toDF("n").crossJoin(broadcast(docs.agg(count(lit(1)).as("cnt"))))
        .queryExecution.optimizedPlan
      assert(ScaleLint.findings.isEmpty,
        s"limit/aggregate-capped corpus broadcasts must be lint-clean, got: ${ScaleLint.findings}")

      // a scale-safe plan triggers nothing
      ScaleLint.reset()
      SparkEntry.queries("q20_ntile")(spark, dir).queryExecution.optimizedPlan
      assert(ScaleLint.findings.isEmpty,
        s"two-pass ntile must be lint-clean, got: ${ScaleLint.findings}")
    } finally {
      spark.experimental.extraOptimizations = Nil
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("s01: knn scoring runs through the native codegen dot product") {
    val p = plan("s01_cosine_knn")
    assert(p.contains("dotproduct") || p.contains("DotProduct"))
    assert(!p.contains("aggregate(zip_with"), "no interpreted HOF fold in the hot path")
  }

  test("s25: hybrid retrieval BUILD — query frames broadcast, semantic top-k aggregated not windowed") {
    // since the retrieval lists materialize once per process, the
    // retrieval pass's scale shape lives in the BUILD plans — pin those
    // (the s25 consumer plan is two parquet list scans + the RRF tail)
    val (lex, sem) = graft.ops.Similarity.buildHybridLists(spark, dir)
    val pl = lex.queryExecution.executedPlan.toString
    val ps = sem.queryExecution.executedPlan.toString
    // the corpus meets the constant-size query batch only through
    // broadcasts: a plain CartesianProduct would be corpus x corpus
    assert(!pl.contains("CartesianProduct") && !ps.contains("CartesianProduct"),
      "hybrid stages must broadcast the query side")
    assert(ps.toLowerCase.contains("dotproduct"), "cosine must run the native kernel")
    // the semantic per-query top-k is the bounded TopKNeighbors partial+
    // final aggregate (<= k rows per query cross the shuffle) — a window
    // ordered by sim would sort the whole scored corpus per query
    val windowLines = ps.linesIterator.filter(_.contains("Window ")).toSeq
    assert(windowLines.forall(!_.contains("sim#")),
      s"no window may sort the raw scored corpus:\n${windowLines.mkString("\n")}")
    assert(ps.contains("ObjectHashAggregate"), "semantic top-k must be the typed Aggregator")
    // the fusion consumer itself stays cartesian-free
    assert(!plan("s25_hybrid_rrf").contains("CartesianProduct"))
    spark.sharedState.cacheManager.clearCache()
  }

  test("round-12 family plans: no cartesian, gram generate row-local, sketch joins broadcast") {
    // d25: the overlapping-gram stream must be a row-local Generate (an
    // Exchange before it would shuffle corpus tokens twice), and the
    // dup marking a semi-join
    val p25 = plan("d25_dup_spans")
    assert(p25.contains("Generate"), "gram stream must be a generator")
    assert(p25.contains("LeftSemi"), "dup marking must be a semi-join")
    assert(!p25.contains("CartesianProduct"))
    // d24/s26: the only corpus meetings are hash/broadcast joins
    for (q <- Seq("d24_shard_sketch_merge", "s26_cluster_cards")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q must not plan a cartesian")
      assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
        s"$q should broadcast its small side")
    }
    // s27 consumes the materialized retrieval lists (the corpus pass is
    // pinned in the s25 BUILD test) — its own plan stays cartesian-free
    assert(!plan("s27_mined_pairs").contains("CartesianProduct"),
      "s27 must not plan a cartesian")
  }

  test("q32: lateral positional explode is a codegen Generate with no shuffle") {
    val p = plan("q32_lateral_explode")
    assert(p.contains("Generate"))
    assert(!p.contains("Exchange"), "row-local generator must not shuffle")
  }

  test("t11: token chunking is a row-local generate with no shuffle") {
    // windows are generated per row (sequence + slice): the whole chunker
    // must stream at scan speed — an Exchange would mean per-chunk work
    // got hoisted into a shuffle stage
    val p = plan("t11_token_chunks")
    assert(p.contains("Generate"), p.take(400))
    assert(!p.contains("Exchange"), "chunking must be shuffle-free")
  }

  test("t12: bigram count and top-1 window ride the lead-window's doc_id exchange") {
    // the (doc_id, pair) groupBy and both doc_id windows are all satisfied
    // by ONE hash(doc_id) partitioning; the only other shuffle allowed is
    // the stats branch meeting the join — a third exchange means the pair
    // path re-shuffled per stage
    val p = plan("t12_repetition")
    val nShuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(nShuffles <= 2, s"expected <=2 hash exchanges, got $nShuffles:\n$p")
    spark.sharedState.cacheManager.clearCache()
  }

  test("q33/t09: tiny aggregate sides broadcast, never sort-merge") {
    for (q <- Seq("q33_string_agg", "t09_vocab_coverage")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), q)
      assert(!p.contains("SortMergeJoin"), q)
    }
  }

  test("p03/p05/t08: row-local prep ops read only the columns they emit") {
    // split assignment and scrubbing are projections: one scan, no join
    for (q <- Seq("p03_split_assign", "t08_scrub")) {
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q must be scan-speed (no shuffle)")
      assert(!p.contains("Join"), q)
    }
    val f = formatted("p03_split_assign")
    assert(!f.contains("text"), "p03 scan must prune the fat text column")
  }

  test("d22: band-index probe is an equi-join; best-match top-1 runs as WindowGroupLimit") {
    val p = plan("d22_incremental_lsh")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"delta-vs-index candidates must meet on the (band, bucket) equi-key:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"the rn=1 best-match filter must push down as a partial group limit:\n$p")
    spark.sharedState.cacheManager.clearCache()
  }

  test("p26: thresholds ride one broadcast; counts computed once and reused") {
    val p = plan("p26_temperature_mixture")
    assert(p.contains("BroadcastHashJoin"),
      s"per-doc keep decision must broadcast the |langs|-row threshold table:\n$p")
    assert(p.contains("InMemoryTableScan"),
      s"the counts aggregate must be persisted and reused by the min branch, not recomputed:\n$p")
    spark.sharedState.cacheManager.clearCache()
  }

  test("runtime bloom-filter join: Catalyst injects a bloom probe into the fact scan") {
    // The 100 TB shuffle-reducer: a selective dim-side predicate becomes
    // a bloom filter probed on the FACT side before the shuffle, so
    // non-matching fact rows never cross the wire. Injection is gated on
    // size estimates (correctly absent at test scale), so the test
    // lowers the application-side threshold to force the decision and
    // pins BOTH the plan shape and result equality with the filter off.
    import org.apache.spark.sql.functions._
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // injection only pays before a SHUFFLE: at test scale the dim side
      // would broadcast (no shuffle to save), so force the shuffle-join
      // regime the rule targets at 100 TB
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      def q = graft.core.Tables.lineitem(spark, dir)
        .join(graft.core.Tables.orders(spark, dir)
          .filter(col("o_totalprice") > 400000.0), // selective creation side
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.toLowerCase.contains("bloom"),
        s"no bloom filter injected into the fact side:\n$plan")
      val on = q.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val off = q.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(on === off, "runtime filtering must be semantics-free")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("lint sweep: every declared query optimizes ScaleLint-clean, waivers trip by name") {
    // Any new query that sneaks in an unpartitioned window or a big-big
    // cartesian fails here by name. The recorded waivers (s01/s02 exact
    // O(n²) baselines) are held to the OPPOSITE contract: they MUST trip
    // the corpus×corpus lint — if a refactor makes one bucketed, the
    // stale waiver fails here and gets deleted.
    import graft.plans.ScaleLint
    spark.experimental.extraOptimizations = Seq(ScaleLint)
    try {
      val flagged = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
        ScaleLint.reset()
        SparkEntry.queries(name)(spark, dir).queryExecution.optimizedPlan
        val fs = ScaleLint.findings.toArray.toSeq
        spark.sharedState.cacheManager.clearCache()
        if (fs.nonEmpty) Some(name -> fs) else None
      }.toMap
      // a waiver excuses ONLY the corpus-cartesian (kind-5) shape it was
      // recorded for — any OTHER lint kind on a waived query still fails
      val unwaived = flagged.flatMap { case (name, fs) =>
        val excused =
          if (ScaleLint.waivers.contains(name))
            fs.filterNot(_.toString.contains("corpus x corpus"))
          else fs
        if (excused.nonEmpty) Some(name -> excused) else None
      }
      assert(unwaived.isEmpty, s"lint findings without a waiver: $unwaived")
      // The sanctioned corpus-cartesian inventory is EXACTLY the two
      // declared exact baselines. Growing this set requires editing this
      // pin — a new waiver quietly added next to a new query cannot
      // launder an accidental cartesian through the sweep.
      assert(ScaleLint.waivers.keySet === Set("s01_cosine_knn", "s02_cosine_neardup"),
        s"sanctioned kind-5 inventory changed: ${ScaleLint.waivers.keySet}")
      for ((name, why) <- ScaleLint.waivers) {
        assert(SparkEntry.queries.contains(name), s"waiver for unknown query $name ($why)")
        assert(flagged.contains(name) &&
            flagged(name).exists(_.toString.contains("corpus x corpus")),
          s"$name carries a waiver but no longer trips the corpus-cartesian lint - delete the stale waiver")
      }
    } finally {
      spark.experimental.extraOptimizations = Nil
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("e08: three sequential funnel windows share ONE user-partition exchange") {
    val p = plan("e08_funnel")
    assert("Window ".r.findAllIn(p).size >= 3, p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      s"funnel must shuffle once on user_id, not per stage:\n$p")
  }

  test("s07: query batch is limit-bounded under the broadcast; scoring is native integer dot") {
    val p = plan("s07_quantized_knn")
    // the ONLY corpus-derived frame that broadcasts must be capped by a
    // limit (TakeOrderedAndProject = orderBy(md5)+limit) — a
    // corpus-proportional broadcast side grows with the corpus at 100 TB
    assert(p.contains("TakeOrderedAndProject"),
      "query batch must come from a deterministic fixed-size limit")
    // integer scoring stays on the codegen native expression, not the
    // interpreted aggregate(zip_with(...)) lambda path
    assert(p.contains("dotproductlong") || p.contains("DotProductLong"), p.take(500))
    assert(!p.contains("aggregate(zip_with"), "no interpreted HOF fold in the hot path")
  }

  test("s08: codebook and query tables are limit-capped broadcasts; corpus side never broadcasts") {
    // every broadcast side in the PQ pipeline descends from a LIMIT
    // (md5-order sample of PqK vectors / PqQueries queries) — the coded
    // corpus itself must stay the streamed probe side at 100 TB
    val p = plan("s08_pq_ann")
    val nTop = "TakeOrderedAndProject".r.findAllIn(p).size
    val nBcast = "BroadcastExchange".r.findAllIn(p).size
    val nSmj = "SortMergeJoin".r.findAllIn(p).size
    // counts include persisted subplan bodies the string inlines; they
    // are deterministic for this plan shape. nSmj == 0: every join is
    // broadcast-side-capped, so the coded corpus never shuffles through
    // a join. nTop pins the two md5-order LIMIT samples (and their
    // inlined reprints); nBcast bounds the broadcast population — a NEW
    // broadcast (e.g. the corpus codes frame) breaks the bound and must
    // be re-justified here, not silently absorbed
    assert(nSmj === 0, s"all s08 joins must be broadcast joins:\n${p.take(600)}")
    assert(nTop === 7, s"limit-cap count changed (nTop=$nTop): a sample limit was dropped or added")
    assert(nBcast <= 8, s"broadcast population grew (nBcast=$nBcast): corpus-side broadcast?")
    spark.sharedState.cacheManager.clearCache()
  }

  test("s09: re-rank joins are all broadcast-capped; corpus side streams") {
    // stage 2 fetches candidate vectors by broadcasting the shortlist
    // (<= PqQueries*PqShort rows by construction: LIMIT sample x rk
    // filter) against the persisted corpus — the corpus must never
    // broadcast or sort-merge through the two-stage pipeline
    val p = plan("s09_two_stage_ann")
    val nSmj = "SortMergeJoin".r.findAllIn(p).size
    assert(nSmj === 0, s"all s09 joins must be broadcast joins:\n${p.take(600)}")
    assert(p.contains("TakeOrderedAndProject"),
      "shortlist must descend from the md5-order LIMIT samples")
    spark.sharedState.cacheManager.clearCache()
  }

  test("s10: argmin is row-local under one broadcast array — no vec_id shuffle, one corpus exchange") {
    // the k-means assignment must NOT materialize corpus x K rows and
    // window them on vec_id (that plan shuffles 16x the corpus); the
    // centroid array broadcasts as one row and the fold happens in the
    // projection, so the only corpus-fed exchange is the (cid, pos)
    // recompute aggregate
    val p = plan("s10_kmeans_step")
    assert(!p.contains("hashpartitioning(vec_id"),
      s"corpus-wide vec_id shuffle in the assignment:\n${p.take(600)}")
    val nSmj = "SortMergeJoin".r.findAllIn(p).size
    assert(nSmj === 0, s"centroid join must stay broadcast:\n${p.take(600)}")
    assert(p.contains("TakeOrderedAndProject"), "seed sample must be the md5-order LIMIT")
    spark.sharedState.cacheManager.clearCache()
  }

  test("s06/s20: IVF assignment+probing is row-local — no corpus×K rows through a vec_id exchange") {
    // the coarse-quantizer stage must rank cells inside the row (the
    // rankCells sort-slice over one broadcast centroid array), never by
    // materializing corpus×K (vec, cell) rows and ranking them with
    // row_number() OVER (PARTITION BY vec_id) — that window's exchange
    // shuffles K× the corpus and was the round-10 verdict's top finding.
    // The only legitimate vec_id hash ops downstream are qid/nid joins
    // on the bounded candidate set, which rename away from vec_id.
    for (q <- Seq("s06_ann_ivf", "s20_trained_ivf")) {
      val p = plan(q)
      assert(!p.contains("hashpartitioning(vec_id"),
        s"$q: corpus-wide vec_id exchange in cell assignment:\n${p.take(800)}")
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("s22: IVF-PQ never builds an un-broadcast product; capped sides broadcast") {
    // candidates come from the cell equi-join, ADC codes by cand_id
    // equi-join, tables/query-batch by capped broadcast — a
    // CartesianProduct anywhere means a stage regressed to
    // corpus×batch scoring (the s08 full-scan shape this composition
    // exists to avoid)
    val p = plan("s22_ivfpq_search")
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(p.contains("BroadcastHashJoin"), "capped sides must broadcast-join")
    spark.sharedState.cacheManager.clearCache()
  }

  test("m12: survivor selection is a struct-extremum aggregate, never a per-cluster window") {
    // the rollup AFTER the CC labels must be the d19/q49 argmax shape:
    // one cluster_id hash aggregate carrying the survivor as a struct
    // max — a row_number window here would re-sort every cluster.
    // (The plan is the post-labeling consumer over the CC LogicalRDD,
    // so a Window anywhere in it is the survivor stage's.)
    val p = plan("m12_perceptual_clusters")
    assert(!p.contains("Window"), s"per-cluster window in the survivor rollup:\n${p.take(600)}")
    assert(!p.contains("CartesianProduct"), p.take(600))
    spark.sharedState.cacheManager.clearCache()
  }

  test("d12: df aggregate is single-distinct (no Expand); no cartesian; no broadcast hint") {
    // countDistinct(doc_id) grouped by seg plans as a two-phase agg, not
    // a grouping-sets Expand; the dup-segment side is corpus-derived so
    // the join must carry no explicit broadcast hint (stats may still
    // pick broadcast at this SF — that's the planner's call, not ours)
    val p = plan("d12_segment_scrub")
    assert(!p.contains("Expand"), s"multi-distinct Expand appeared:\n${p.take(600)}")
    assert(!p.contains("CartesianProduct"), p.take(600))
    val lp = SparkEntry.queries("d12_segment_scrub")(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(!lp.contains("ResolvedHint"), "no broadcast hint on a corpus-derived side")
    spark.sharedState.cacheManager.clearCache()
  }

  test("t13: vocab join unhinted; only the 1-row corpus total broadcasts by construction") {
    val p = plan("t13_unigram_surprise")
    assert(!p.contains("Expand"), p.take(600))
    // the 1-row total rides a BroadcastNestedLoopJoin cross join — fine;
    // an unbroadcast CartesianProduct is not
    assert(!p.contains("CartesianProduct"), p.take(600))
    val lp = SparkEntry.queries("t13_unigram_surprise")(spark, dir)
      .queryExecution.optimizedPlan.toString
    // exactly one hint: the 1-row total (p11's capped-totals contract);
    // the corpus-derived vocab frame must not be hinted
    val hints = "ResolvedHint".r.findAllIn(lp).size
    assert(hints <= 1, s"unexpected broadcast hints ($hints):\n${lp.take(600)}")
    spark.sharedState.cacheManager.clearCache()
  }

  test("q25: gate has no Expand, no range shuffle, and only a sampled percentile") {
    // two distinct columns in one agg would Expand every row 3x through
    // the sketch buffers (round 5's gate cost); a band from the two-pass
    // global order would range-shuffle the whole table for two values
    // per group (round 6-interim's). The sampled band keeps both out:
    // percentile() is allowed ONLY over the md5-threshold sample, whose
    // agg buffer is bounded at BandSampleK rows per group.
    val p = plan("q25_approx_sketches")
    assert(!p.contains("Expand"), s"multi-distinct Expand is back:\n${p.take(800)}")
    assert(!p.contains("Exchange rangepartitioning"),
      "band must come from the sampled percentile, not a full-table global order")
    // the sample filter sits under the percentile agg: the shared
    // md5-fold hash compared against the broadcast per-group threshold
    assert(p.contains("conv(substring(md5"), "md5-threshold sample filter missing")
    assert(p.contains("percentile("), "sampled exact percentile band missing")
    spark.sharedState.cacheManager.clearCache() // aggP persists
  }

  test("p01/q11/q34: distinct-agg queries carry no multi-distinct Expand") {
    // p01 is the round-6 regression (4 countDistinct in one agg = 5x row
    // amplification through every buffer); q11/q34 had the same latent
    // shape. All three now run one distinct agg per column (p01 via the
    // unpivot, q11/q34 via split + broadcast-join-back).
    for (q <- Seq("p01_profile", "q11_distinct_agg", "q34_null_handling")) {
      val p = plan(q)
      assert(!p.contains("Expand"), s"$q: multi-distinct Expand is back:\n${p.take(800)}")
    }
    // p01 specifically: the unpivot is one Generate over ONE scan
    val p01 = plan("p01_profile")
    assert(p01.contains("Generate"), "p01 unpivot explode missing")
    assert("Scan parquet".r.findAllIn(p01).size == 1, "p01 must stay a single scan")
  }

  test("d08: two-level cell assignment never shuffles or windows the corpus") {
    // centroid-side exchanges (the K-row groupBy(gid) building the
    // nested broadcast) are fine; the CORPUS must reach its cell with
    // zero vec_id exchanges and no window — both levels are row-local
    // folds under one nested broadcast since the round-11 migration
    val base = graft.ops.Similarity.vecs(spark, dir)
    val p = graft.ops.SemDedup.cellAssignments(base, base.count())
      .queryExecution.executedPlan.toString
    assert(!p.contains("hashpartitioning(vec_id"),
      s"assignment must not shuffle the corpus:\n${p.take(800)}")
    assert(!p.contains("Window"), "argmax must be the broadcast-array fold, not a window")
    spark.sharedState.cacheManager.clearCache()
  }

  test("d08/p06: cluster-dedup pipelines contain no cartesian product") {
    for (q <- Seq("d08_semantic_dedup", "p06_prod_prep_pipeline")) {
      // executedPlan forces the CC loop to run; optimized logical plan of
      // the first round's frames suffices for the shape check, so build
      // the full query plan lazily via explain on the final frame
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), q)
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("d13/t14: incremental dedup and bigram model are join/agg-shaped, no cartesian, no global window") {
    for (q <- Seq("d13_incremental_dedup", "t14_bigram_surprise")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q: delta-vs-corpus / model joins must stay key-equi, never all-pairs")
      // a partitionBy-less window would funnel the corpus through ONE
      // task; d13's best-match window partitions by d_id, t14 has none
      assert(!p.contains("Window [") || p.contains("windowspecdefinition(d_id"),
        s"$q: no single-partition window allowed:\n${p.take(800)}")
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("s12: the audit's query batch is LIMIT-capped, never a corpus fraction") {
    // the s07/s11 contract: the ONLY exact-search query side is a
    // deterministic fixed-size batch (TakeOrderedAndProject = orderBy(md5)
    // + limit) — a fractional sample would re-quadratize the audit
    val p = plan("s12_ann_recall")
    assert(p.contains("TakeOrderedAndProject"),
      s"exact side must draw from a fixed-size md5-order batch:\n${p.take(800)}")
    spark.sharedState.cacheManager.clearCache()
  }

  test("t17/p20: capped frames broadcast; corpus sides never sort-merge against them") {
    // t17's top-20 boilerplate set and p20's <=10-row bucket aggregate
    // are the LIMIT/aggregate-capped sides — each must ride a broadcast
    // into the corpus-sized probe, not drag it through a sort-merge
    for (q <- Seq("t17_boilerplate", "p20_quality_sweep")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
        s"$q: capped side must broadcast:\n${p.take(600)}")
      assert(!p.contains("SortMergeJoin"), s"$q must not sort-merge the capped join")
    }
    spark.sharedState.cacheManager.clearCache()
  }

  test("t24: the merge loop never windows or cartesians the corpus; selections broadcast") {
    // per training step: one map-side-combined pair aggregate, a
    // TakeOrdered top-1, and a row-local rewrite under a 1-row
    // broadcast — no doc_id window anywhere (the t10 shape would pay a
    // per-doc sort per step) and no un-broadcast product
    val p = plan("t24_bpe_merge_loop")
    assert(!p.contains("Window"), s"doc-keyed window in the merge loop:\n${p.take(600)}")
    assert(!p.contains("CartesianProduct"), p.take(600))
    assert(!p.contains("SortMergeJoin"),
      s"1-row merge selections must broadcast:\n${p.take(600)}")
    assert(p.contains("TakeOrderedAndProject"), "top-1 selection must be TakeOrdered")
    spark.sharedState.cacheManager.clearCache()
  }

  test("e15: the calendar-bounded day list broadcasts; distinct pairs never self-sort-merge") {
    val p = plan("e15_dau_wau")
    // range condition => nested-loop, but against the BROADCAST day list
    // only — the corpus-derived distinct-pair side must stream through it
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(600))
    spark.sharedState.cacheManager.clearCache()
  }

  test("s20/s21/s22/d08: the two-level rank kernel never breaks whole-stage codegen") {
    // TwoLevelRankCells was CodegenFallback in round 11, which ejected the
    // entire corpus-scan stage from whole-stage codegen for the four
    // consumers. Now it has a real doGenCode: walk the EXECUTED plan
    // (descending adaptive stages, reused exchanges, and materialized
    // cached plans) and require every kernel-bearing node to live inside
    // a WholeStageCodegenExec subtree.
    import org.apache.spark.sql.execution.{InputAdapter, SparkPlan, WholeStageCodegenExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def walk(p: SparkPlan, inWscg: Boolean, q: String): Int = p match {
      case a: AdaptiveSparkPlanExec  => walk(a.executedPlan, false, q)
      case s: QueryStageExec         => walk(s.plan, false, q)
      case r: ReusedExchangeExec     => walk(r.child, false, q)
      case im: InMemoryTableScanExec => walk(im.relation.cachedPlan, false, q)
      case w: WholeStageCodegenExec  => w.children.map(walk(_, true, q)).sum
      case i: InputAdapter           => walk(i.child, false, q)
      case other =>
        val has = other.expressions.exists(
          _.exists(_.isInstanceOf[graft.functions.TwoLevelRankCells]))
        if (has) assert(inWscg,
          s"$q: kernel node outside whole-stage codegen: ${other.nodeName}\n${other.toString.take(600)}")
        (if (has) 1 else 0) + other.children.map(walk(_, inWscg, q)).sum
    }
    // d08's assignment runs before the CC loop's checkpoint truncates
    // lineage, so its kernel nodes can vanish from the FINAL plan — the
    // walk still proves no out-of-WSCG node. Since round 14 the trained
    // family reads the STORED index artifact, so s20/s21/s22/s23's
    // executed plans carry no kernel either (training ranks once, in
    // the store build); the kernel still runs LIVE wherever arrivals or
    // queries rank against the frozen codebook — presence is asserted
    // on those serve/assign paths.
    // s34 serves through the generation pointer but probes the arrivals
    // LIVE, same as s32; s33/s35/s36 EMIT a stored membership (their
    // ranking ran inside the eager publish), so their final plans are
    // pointer-resolved parquet scans with no kernel
    val liveKernel = Set("s24_frozen_assign", "s30_serve_arrivals",
      "s32_artifact_serve", "s34_generation_serve")
    for (q <- Seq("s20_trained_ivf", "s21_trained_recall", "s22_ivfpq_search",
        "d08_semantic_dedup", "s23_index_maintenance") ++ liveKernel.toSeq.sorted) {
      val df = SparkEntry.queries(q)(spark, dir)
      df.collect() // materialize: finalizes adaptive plans and cache builds
      val n = walk(df.queryExecution.executedPlan, inWscg = false, q)
      if (liveKernel.contains(q))
        assert(n > 0, s"$q: expected the native kernel somewhere in the executed plan")
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("q47: both windows ride the ONE seeded suppkey exchange") {
    // repartition(l_suppkey) satisfies the (suppkey, partkey) window's
    // clustering too (subset rule) — a naive plan pays two exchanges
    val p = plan("q47_window_distinct")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"first-occurrence flag and running sum must share hash(l_suppkey):\n$p")
    assert("Window ".r.findAllIn(p).size >= 2, p)
  }
}
