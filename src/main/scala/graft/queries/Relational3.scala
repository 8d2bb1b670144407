package graft.queries

import graft.core.Num
import graft.core.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Third wave: non-equi joins and exact scalar math — closing the last
  * rows of the SURVEY.md §2.5 join/function inventory.
  */
object Relational3 extends QueryModule {

  /** q21: range/theta (band) join — orders classified into price bands via
    * a BETWEEN predicate against an inline dimension. Planned as a
    * broadcast nested-loop join: with a broadcast-size band table that is
    * exactly the right plan at any fact-side scale.
    */
  private def q21(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bands = Seq(
      ("low", 0.0, 100000.0),
      ("mid", 100000.0, 250000.0),
      ("high", 250000.0, 1e9)
    ).toDF("band", "lo", "hi")
    orders(s, dir)
      .join(broadcast(bands),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_orders"), Num.dsum(col("o_totalprice")).as("band_rev"))
  }

  private val q21Sql =
    """SELECT band, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS band_rev
      |FROM orders
      |JOIN (VALUES ('low', 0.0, 100000.0),
      |             ('mid', 100000.0, 250000.0),
      |             ('high', 250000.0, 1000000000.0)) AS bands(band, lo, hi)
      |  ON o_totalprice >= lo AND o_totalprice < hi
      |GROUP BY band""".stripMargin

  /** q22: exact scalar math functions (abs/mod/floor/ceil/sqrt/sign/
    * greatest/least — all IEEE-exact, no libm transcendentals, so values
    * are bit-identical cross-engine; DETERMINISM.md).
    */
  private def q22(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .filter(col("l_linenumber") <= 2)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_quantity") - 25.0).as("abs_dev"),
        pmod(col("l_orderkey"), lit(7)).cast("long").as("key_mod7"),
        floor(col("l_extendedprice") / 1000.0).cast("long").as("price_kfloor"),
        // round, not ceil: 0.07*100.0 is 7.000000000000001 in binary, and
        // ceil would report 8 percent for half of all 2-dp discounts
        round(col("l_discount") * 100.0).cast("long").as("disc_pct"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        signum(col("l_quantity") - 25.0).as("qty_sign"),
        greatest(col("l_quantity"), col("l_discount") * 100.0).as("g"),
        least(col("l_tax"), col("l_discount")).as("l"))

  private val q22Sql =
    """SELECT l_orderkey, l_linenumber,
      |  abs(l_quantity - 25.0) AS abs_dev,
      |  CAST(l_orderkey % 7 AS BIGINT) AS key_mod7,
      |  CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS price_kfloor,
      |  CAST(round(l_discount * 100.0) AS BIGINT) AS disc_pct,
      |  sqrt(l_quantity) AS qty_sqrt,
      |  CAST(sign(l_quantity - 25.0) AS DOUBLE) AS qty_sign,
      |  greatest(l_quantity, l_discount * 100.0) AS g,
      |  least(l_tax, l_discount) AS l
      |FROM lineitem
      |WHERE l_linenumber <= 2""".stripMargin

  /** q23: pivot — per-linestatus quantity totals fanned out by return
    * flag. Spark's .pivot plans the same conditional aggregation the
    * oracle spells out.
    */
  private def q23(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(Num.dsum(col("l_quantity")))

  private val q23Sql =
    """SELECT l_linestatus,
      |  CAST(sum(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS A,
      |  CAST(sum(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS N,
      |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS R
      |FROM lineitem
      |GROUP BY l_linestatus""".stripMargin

  /** q24: scalar subquery — orders above the global mean price. The
    * threshold is an exact-decimal sum divided in double (identical bits
    * both engines), so the comparison is deterministic (DETERMINISM.md
    * rule 3: never a plain avg() of doubles as a filter boundary).
    */
  private def q24(s: SparkSession, dir: String): DataFrame = {
    val o = orders(s, dir)
    val thresh = o.agg((Num.dsum(col("o_totalprice")) / count(lit(1))).as("t"))
    o.join(broadcast(thresh))
      .filter(col("o_totalprice") > col("t"))
      .select(col("o_orderkey"), col("o_totalprice"))
  }

  private val q24Sql =
    """SELECT o_orderkey, o_totalprice
      |FROM orders
      |WHERE o_totalprice > (
      |  SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
      |  FROM orders)""".stripMargin

  /** q25: sketch aggregates — HyperLogLog++ distinct counts and an
    * approximate quantile, the 100 TB replacements for exact distinct /
    * exact percentile (docs/SCALE.md). Sketch internals differ across
    * engines, so the raw approx values cannot be equality-checked; what
    * CAN be checked exactly is the sketch's error CONTRACT. The query
    * therefore emits the exact answers plus `*_within_bound` booleans
    * (|approx − exact| ≤ bound, computed inside Spark), and the DuckDB
    * oracle emits the same exact answers with literal TRUE bounds — the
    * hash gate then verifies both the exact sides and that every sketch
    * honored its bound.
    *
    * Bounds: 15% relative for HLL, and a sampled p40..p60 VALUE band
    * for the median sketch (accuracy=1000 guarantees 0.1% rank error;
    * the band's own rank uncertainty is ~0.8%/1σ, so the sketch median
    * sits inside it with >10σ margin). BOTH bounds are PROBABILISTIC
    * over the data — deterministic for a fixed dataset, but a future SF
    * or data-generator change could legitimately push an estimate
    * outside with no code bug; if q25 alone starts failing the gate
    * after a data refresh, triage as data-shift and re-widen, not as a
    * regression.
    *
    * The band comes from a deterministic md5-threshold sample (the
    * SemDedup centroid-selection machinery): ~[[BandSampleK]] rows per
    * group pass a map-side `hash60(pk) < 2^60·K/cnt` filter — the
    * per-group thresholds ride a broadcast join off the group counts —
    * and an exact percentile over THE SAMPLE yields the p40/p60 values.
    * Unlike round 5's exact percentile() (every group's values in one
    * agg buffer — 7× the query it gated) or round 6-interim's two-pass
    * global order (a full-table range shuffle for two values per
    * group), the sample band scans once map-side and sorts ≤K rows per
    * group however large the corpus — gate instrumentation that stays
    * O(groups·K) at 100 TB. It needs no DuckDB mirror: the oracle emits
    * literal TRUE, so the band only has to be deterministic and
    * actually contain the sketch median. The exact-distinct columns
    * stay: they are the oracle-checked output; at 100 TB the sketches
    * are the answer and the exact sides drop away.
    *
    * Job overlap: the band and aggS subtrees are both broadcast sides
    * of the final join, so their exchange futures materialize
    * concurrently; aggP (the probe) is persisted and pre-computed by
    * the band's threshold branch, leaving the main job a cache read.
    */
  private val BandSampleK = 4096
  // 2^60 * BandSampleK as an exact decimal literal: the per-group
  // threshold 2^60*K/cnt overflows a long for small cnt, so the
  // division runs in decimal(38) and floors via the long cast
  private val BandThreshNum = (BigInt(BandSampleK) << 60).toString

  private def q25(s: SparkSession, dir: String): DataFrame = {
    // three pruned parquet scans (aggP, aggS, band sample), NOT one
    // persisted shared projection: measured 4.3-5.8 s cached vs 2.4-2.8 s
    // re-scanned at sf0.1 — the band and aggS subtrees are broadcast
    // sides whose jobs run CONCURRENTLY against independent vectorized
    // column-pruned scans, while a shared InMemoryRelation serializes
    // them on the cache build. At warehouse scale the exact-distinct
    // gate columns drop away entirely (the sketches are the answer), so
    // the scan count is gate instrumentation, not the production cost
    // NOT spread (round-17): the three legs' broadcast-side jobs run
    // concurrently against independent scans; a parallelism floor put a
    // round-robin exchange under each leg and measured 2.2 s → 3.0 s.
    val li = lineitem(s, dir)
    // one distinct column per aggregation: TWO distinct columns in one
    // agg make Catalyst Expand every input row 3x through the sketch
    // buffers; split, each plans as a plain two-phase agg (partial
    // dedup map-side), and the 3-row results broadcast-join back up
    val aggP = li.groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_partkey")).as("ap"),
        count(lit(1)).as("cnt")) // group sizes drive the band thresholds
      .persist() // 3 rows; two consumers (result probe + band thresholds)
    val aggS = li.groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("exact_supps"),
        approx_count_distinct(col("l_suppkey")).as("asup"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("am"))
    // per-group sample threshold: floor(2^60 * K / cnt), with cnt <= K
    // routed to the past-every-hash constant 2^60 OUTSIDE the division —
    // the quotient itself is >= 2^63 once cnt <= K/8 (e.g. a tiny or
    // filtered group), and the decimal -> long cast of that would throw
    // CAST_OVERFLOW under ANSI rather than clamp
    val thresholds = aggP.select(col("l_returnflag").as("tflag"),
      when(col("cnt") <= BandSampleK, lit(1L << 60))
        .otherwise((lit(new java.math.BigDecimal(BandThreshNum)) / col("cnt")).cast("long"))
        .as("thr"))
    // deterministic ~K-row per-group sample: map-side filter on the
    // shared 60-bit md5 fold of the lineitem PK, thresholds broadcast
    val sample = li
      .select(col("l_returnflag"), col("l_extendedprice"),
        graft.ops.Sampling.hash60(
          concat_ws("_", col("l_orderkey"), col("l_linenumber"))).as("h"))
      .join(broadcast(thresholds), col("l_returnflag") === col("tflag"))
      .filter(col("h") < col("thr"))
    // exact percentile over the BOUNDED sample: <= K values per agg
    // buffer at any corpus size (the full-table version of this
    // aggregate is exactly what q25 exists to replace)
    val band = sample.groupBy(col("tflag"))
      .agg(percentile(col("l_extendedprice"), lit(0.40)).as("plo"),
        percentile(col("l_extendedprice"), lit(0.60)).as("phi"))
    aggP.drop("cnt").join(broadcast(aggS), "l_returnflag")
      .join(broadcast(band), col("l_returnflag") === col("tflag"))
      .select(col("l_returnflag"), col("exact_parts"), col("exact_supps"),
        (abs(col("ap") - col("exact_parts")) <= col("exact_parts") * 0.15)
          .as("parts_within_bound"),
        (abs(col("asup") - col("exact_supps")) <= col("exact_supps") * 0.15)
          .as("supps_within_bound"),
        (col("am") >= col("plo") && col("am") <= col("phi"))
          .as("median_within_bound"))
  }

  private val q25Sql =
    """SELECT l_returnflag,
      |  count(DISTINCT l_partkey) AS exact_parts,
      |  count(DISTINCT l_suppkey) AS exact_supps,
      |  TRUE AS parts_within_bound,
      |  TRUE AS supps_within_bound,
      |  TRUE AS median_within_bound
      |FROM lineitem
      |GROUP BY l_returnflag""".stripMargin

  /** q53: the DISTINCT-COUNT merge law, q25's contract style — the
    * sketch-algebra counterpart to d24's integer-exact MinHash law:
    * per-shard Datasketches HLL sketches (`hll_sketch_agg`, lgK 12)
    * union into the corpus estimate (`hll_union_agg`) without any
    * shard re-reading another's rows. Unlike MinHash min-merge, HLL
    * union is NOT value-exact: the union re-materializes registers in
    * the target HLL mode, so the merged estimate drifts from the
    * one-pass estimate WITHIN the sketch's own error (measured here:
    * 1991 vs 1999 on exact 2000). The emitted contract therefore has
    * three booleans the oracle pins TRUE: one-pass within 3% of exact,
    * merged within 3% of exact, and |merged − one-pass| ≤ 1% of exact
    * (the mode-conversion drift bound). At 100 TB the exact column
    * drops away and the merged sketch IS the nightly distinct count —
    * each shard ships ~2^12 registers, the union is register-wise.
    *
    * Scale shape: each shard's sketch is one partial+final aggregate
    * over its split; the union aggregates S sketch blobs; no stage
    * touches another shard's rows. Same probabilistic-bound triage
    * note as q25: a data refresh can legitimately move an estimate —
    * re-widen, don't debug.
    */
  private def q53(s: SparkSession, dir: String): DataFrame = {
    val li = spread(lineitem(s, dir))
    val shardSketches = (0 until 4).map(i =>
        li.filter(col("l_orderkey") % 4 === i)
          .groupBy(col("l_returnflag"))
          .agg(hll_sketch_agg(col("l_partkey"), lit(12)).as("sk")))
      .reduce(_ unionByName _)
    val merged = shardSketches.groupBy(col("l_returnflag"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_m"))
    li.groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        hll_sketch_estimate(hll_sketch_agg(col("l_partkey"), lit(12))).as("est_1"))
      .join(broadcast(merged), "l_returnflag")
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("est_1") - col("exact_parts")) <= col("exact_parts") * 0.03)
          .as("onepass_within_bound"),
        (abs(col("est_m") - col("exact_parts")) <= col("exact_parts") * 0.03)
          .as("merged_within_bound"),
        (abs(col("est_m") - col("est_1")) <= col("exact_parts") * 0.01)
          .as("merge_drift_small"))
  }

  private val q53Sql =
    """SELECT l_returnflag,
      |  count(DISTINCT l_partkey) AS exact_parts,
      |  TRUE AS onepass_within_bound,
      |  TRUE AS merged_within_bound,
      |  TRUE AS merge_drift_small
      |FROM lineitem
      |GROUP BY l_returnflag""".stripMargin

  /** q54: the HEAVY-HITTERS merge law — the last member of the sketch
    * family (q25 HLL/quantile contracts, q53 HLL union, d24 MinHash
    * min-merge): per-shard bounded top-k summaries in the
    * Misra–Gries/SpaceSaving style, merged WITHOUT any shard re-reading
    * another's rows, contract-gated against the exact q23-style counts.
    *
    * The summary is the deterministic mergeable form (Agarwal et al.,
    * "Mergeable Summaries", PODS'12): each shard keeps its top-
    * [[HhCap]] words by EXACT in-shard count (ties broken on the word)
    * plus one error scalar ε_s = the largest dropped count. Merging
    * sums the kept counts; a word's estimate `est` under-counts by at
    * most Σ ε_s over the shards that dropped it — so for every true
    * heavy hitter: est ≤ exact ≤ est + bound, and any word with
    * exact > Σ ε_s is guaranteed kept somewhere. Those three
    * inequalities ARE the emitted contract (q25's style: the oracle
    * pins exact columns byte-for-byte and the law booleans TRUE); the
    * shard-count replay invariance is pinned in Round13Spec.
    *
    * Scale shape: per-shard counts are one map-side-combined aggregate;
    * the per-shard top-k window runs over the AGGREGATED (shard, word)
    * frame partitioned by shard (vocabulary-bounded — Heaps-law sized,
    * not corpus-sized; the production form at extreme vocabularies is
    * a bounded-memory TopK aggregator, s01's machinery); the merged
    * summary is ≤ shards×[[HhCap]] rows, broadcast back onto the
    * exact top-[[HhK]]. At 100 TB the exact leg drops away and the
    * merged summary IS the nightly top-k — each shard ships HhCap
    * (word, count) pairs + one ε, nothing else crosses shards.
    *
    * Determinism: counts and ε are exact integers, every rank ties on
    * the word — both the summary and the booleans are reproducible on
    * any shard count, which is exactly what the law test replays.
    */
  private val HhShards = 4
  private val HhCap    = 16 // per-shard summary capacity (vocab here is ~31)
  private val HhK      = 10 // heavy hitters reported

  /** The whole pipeline with an injectable shard count — Round13Spec
    * replays it at S ∈ {1, 2, 8} and asserts the contract booleans
    * hold on every split (d24's shard-invariance discipline).
    */
  private[graft] def heavyHitterReport(docs: DataFrame, shards: Int): DataFrame = {
    val words = docs
      .select((col("doc_id") % shards).as("shard"),
        explode(split(col("text"), " ")).as("word"))
      .where(length(col("word")) > 0)
    val perShard = words.groupBy(col("shard"), col("word"))
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("cnt").desc, col("word"))
    // two consumers (kept summary + dropped-side ε): persist the ranked
    // frame so the corpus aggregate runs once
    val ranked = perShard.withColumn("rn", row_number().over(w)).persist()
    val kept = ranked.filter(col("rn") <= HhCap)
    val eps = ranked.groupBy(col("shard"))
      .agg(max(when(col("rn") > HhCap, col("cnt")).otherwise(lit(0L))).as("eps"))
    val epsTotal = eps.agg(sum(col("eps")).as("eps_total"))
    // bound(word) = Σ ε over the shards that did NOT keep the word
    //             = eps_total − Σ ε over the shards that did
    val summary = kept.join(broadcast(eps), "shard")
      .groupBy(col("word"))
      .agg(sum(col("cnt")).as("est"), sum(col("eps")).as("eps_kept"))
      .crossJoin(broadcast(epsTotal))
      .select(col("word"), col("est"),
        (col("eps_total") - col("eps_kept")).as("bound"))
    val exactTop = words.groupBy(col("word")).agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("word")).limit(HhK)
    // rank window over the LIMIT-capped 10-row frame (lint-silent)
    val wr = org.apache.spark.sql.expressions.Window
      .orderBy(col("exact_cnt").desc, col("word"))
    exactTop.withColumn("rk", row_number().over(wr).cast("long"))
      .join(broadcast(summary), Seq("word"), "left_outer")
      .select(col("word"), col("exact_cnt"), col("rk"),
        col("est").isNotNull.as("found_in_summary"),
        coalesce(col("est") <= col("exact_cnt"), lit(false)).as("underestimate_ok"),
        coalesce(col("exact_cnt") <= col("est") + col("bound"), lit(false))
          .as("within_bound"))
  }

  private def q54(s: SparkSession, dir: String): DataFrame =
    heavyHitterReport(documents(s, dir), HhShards)

  private val q54Sql =
    s"""WITH w AS (
       |  SELECT word, count(*) AS exact_cnt
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
       |  WHERE length(word) > 0
       |  GROUP BY 1)
       |SELECT word, exact_cnt, rk,
       |  TRUE AS found_in_summary,
       |  TRUE AS underestimate_ok,
       |  TRUE AS within_bound
       |FROM (
       |  SELECT word, exact_cnt,
       |    CAST(row_number() OVER (ORDER BY exact_cnt DESC, word) AS BIGINT) AS rk
       |  FROM w)
       |WHERE rk <= $HhK""".stripMargin

  /** q55: the QUANTILE-sketch merge law — the sketch family's fourth
    * member (q25 contracts, q53 HLL union, q54 heavy hitters, d24
    * MinHash): per-shard equi-width HISTOGRAMS of l_extendedprice,
    * merged by elementwise addition (the mergeable-summaries shape —
    * each shard ships one [[QhBins]]-long count vector, nothing else
    * crosses shards), and nearest-rank quantiles read off the merged
    * cumulative histogram. The contract: the merged sketch loses no
    * mass (Σ merged counts == n) and brackets every exact quantile to
    * one bin — the exact rank-r value bins into EXACTLY the bin the
    * merged cumulative histogram predicts (`bin_match`), which bounds
    * the estimate error by one bin width by construction. The exact
    * side reuses q26's two-pass range-partitioned global order, so the
    * law is checked against values that never transit a single
    * partition either.
    *
    * Scale shape: the per-shard histogram is one map-side-combined
    * (shard, bin) aggregate (bin is a row-local double fold under a
    * broadcast 1-row stats frame); each shard reduces to ONE row
    * holding its count vector, the merge is an S-element fold of
    * zip_with(+) on a 1-row frame, and the quantile read-off is
    * row-local array arithmetic — at 100 TB the exact leg drops away
    * and the merged vector IS the nightly distribution snapshot
    * (Σ bytes crossing shards: S × 8·[[QhBins]]). Shard-count
    * invariance (the merged vector and the whole report are identical
    * at S ∈ {1, 2, 8} — addition is associative and bins are
    * data-independent given the global stats) is replayed in
    * Round13Spec, d24's discipline.
    *
    * Determinism: the booleans compare INTEGER bin ids computed by the
    * same floor arithmetic on both legs (never float-vs-float at a bin
    * edge); the emitted value columns are q26's raw rank rows, exact in
    * both engines; the oracle pins them byte-for-byte and the law
    * booleans TRUE.
    */
  private val QhBins   = 64
  private val QhShards = 4

  private[graft] def histQuantileReport(li: DataFrame, shards: Int): DataFrame = {
    val s2 = li.sparkSession
    import s2.implicits._
    val xd = col("l_extendedprice").cast("double")
    val stats = li.agg(min(xd).as("lo"), max(xd).as("hi"), count(lit(1)).as("nn"))
    // width clamped away from zero: on a degenerate column (hi == lo)
    // every x - lo is 0 and the clamp sends it to bin 0 instead of the
    // silent floor(NaN) -> null -> bin_match false the raw division gives
    // (clamp the WIDTH, after the /QhBins — clamping the range first
    // underflows back to zero when divided by the bin count)
    def binOf(x: org.apache.spark.sql.Column) =
      least(floor((x - col("lo")) /
          greatest((col("hi") - col("lo")) / QhBins, lit(Double.MinPositiveValue))),
        lit(QhBins - 1)).cast("int")
    val perShard = li
      .select((col("l_orderkey") % shards).as("shard"), xd.as("x"))
      .crossJoin(broadcast(stats))
      .select(col("shard"), binOf(col("x")).as("bin"))
      .groupBy(col("shard"), col("bin")).agg(count(lit(1)).as("cnt"))
    // one count vector per shard — the sketch a shard would ship
    val shardHist = perShard.groupBy(col("shard"))
      .agg(map_from_entries(collect_list(struct(col("bin"), col("cnt")))).as("m"))
      .select(transform(sequence(lit(0), lit(QhBins - 1)),
        b => coalesce(element_at(col("m"), b), lit(0L))).as("hist"))
    // THE MERGE: elementwise addition of the shard vectors, then the
    // cumulative read-off — all on a 1-row frame
    val merged = shardHist.agg(collect_list(col("hist")).as("hs"))
      .select(aggregate(col("hs"), array_repeat(lit(0L), QhBins),
        (acc, h) => zip_with(acc, h, (a, c) => a + c)).as("hist"))
      .select(col("hist"),
        transform(sequence(lit(1), lit(QhBins)),
          k => aggregate(slice(col("hist"), lit(1), k), lit(0L), (a, c) => a + c)).as("cum"))
      .crossJoin(broadcast(stats))
    // exact leg: q26's machinery verbatim
    val (numbered, n) = graft.plans.GlobalOrder.withGlobalRowNumber(
      li.select(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber")),
      Seq(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber")), "rn")
    val targets = Seq(
      ("p25", (n + 3) / 4),
      ("p50", (n + 1) / 2),
      ("p75", (3 * n + 3) / 4)).toDF("pct", "target_rn")
    val estBin = array_min(filter(
      transform(sequence(lit(1), lit(QhBins)),
        k => when(element_at(col("cum"), k) >= col("target_rn"), k)),
      e => e.isNotNull)) - 1
    numbered.join(broadcast(targets), col("rn") === col("target_rn"))
      .crossJoin(broadcast(merged))
      .select(col("pct"), col("rn"), col("l_extendedprice").as("val"),
        (binOf(col("l_extendedprice").cast("double")) === estBin).as("bin_match"),
        (element_at(col("cum"), QhBins) === col("nn")).as("mass_ok"))
  }

  private def q55(s: SparkSession, dir: String): DataFrame =
    histQuantileReport(lineitem(s, dir), QhShards)

  private val q55Sql =
    """WITH o AS (
      |  SELECT l_extendedprice, l_orderkey, l_linenumber,
      |    row_number() OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn
      |  FROM lineitem)
      |SELECT 'p25' AS pct, CAST(rn AS BIGINT) AS rn, l_extendedprice AS val,
      |  TRUE AS bin_match, TRUE AS mass_ok
      |FROM o WHERE rn = (SELECT (count(*) + 3) // 4 FROM lineitem)
      |UNION ALL
      |SELECT 'p50', CAST(rn AS BIGINT), l_extendedprice, TRUE, TRUE
      |FROM o WHERE rn = (SELECT (count(*) + 1) // 2 FROM lineitem)
      |UNION ALL
      |SELECT 'p75', CAST(rn AS BIGINT), l_extendedprice, TRUE, TRUE
      |FROM o WHERE rn = (SELECT (3 * count(*) + 3) // 4 FROM lineitem)""".stripMargin

  /** q26: EXACT percentiles (nearest-rank p25/p50/p75) at scale — the
    * exact counterpart to q25's sketches, built on the same two-pass
    * range-partitioned global order as q20 (plans/GlobalOrder): no
    * single-partition sort, no percentile() aggregate materializing the
    * whole column on one node. The selected rank rows are emitted as-is
    * (raw column values, no arithmetic), so the oracle compare is exact.
    */
  private def q26(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // NOT spread (round-17): the range exchange's sampling pass would
    // re-read through the extra round-robin exchange; measured
    // 1.1 s → 1.4-1.7 s at sf0.1 (q55's two-pass report likewise).
    val base = lineitem(s, dir)
      .select(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    val (numbered, n) = graft.plans.GlobalOrder.withGlobalRowNumber(
      base, Seq(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber")), "rn")
    // nearest-rank (ceil(p*n)) in overflow-safe integer arithmetic
    val targets = Seq(
      ("p25", (n + 3) / 4),
      ("p50", (n + 1) / 2),
      ("p75", (3 * n + 3) / 4)).toDF("pct", "target_rn")
    numbered.join(broadcast(targets), col("rn") === col("target_rn"))
      .select(col("pct"), col("rn"), col("l_extendedprice").as("val"),
        col("l_orderkey"), col("l_linenumber"))
  }

  private val q26Sql =
    """WITH o AS (
      |  SELECT l_extendedprice, l_orderkey, l_linenumber,
      |    row_number() OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn
      |  FROM lineitem)
      |SELECT 'p25' AS pct, CAST(rn AS BIGINT) AS rn, l_extendedprice AS val, l_orderkey, l_linenumber
      |FROM o WHERE rn = (SELECT (count(*) + 3) // 4 FROM lineitem)
      |UNION ALL
      |SELECT 'p50', CAST(rn AS BIGINT), l_extendedprice, l_orderkey, l_linenumber
      |FROM o WHERE rn = (SELECT (count(*) + 1) // 2 FROM lineitem)
      |UNION ALL
      |SELECT 'p75', CAST(rn AS BIGINT), l_extendedprice, l_orderkey, l_linenumber
      |FROM o WHERE rn = (SELECT (3 * count(*) + 3) // 4 FROM lineitem)""".stripMargin

  /** q27: array & map scalar functions — the §2.5 scalar-function family
    * round 1 left implicit (string q15, date q16, math q22, JSON e01).
    * All codegen'd built-ins over the token array of each document; the
    * map lookup is mirrored in DuckDB as vs[list_position(ks, k)] since
    * its map type extracts differently.
    */
  private def q27(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    documents(s, dir)
      .select(col("doc_id"), toks.as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_toks"),
        // array outputs are serialized to strings: the external gate's row
        // canonicalization (pandas sort_values) cannot hash list cells
        array_join(slice(col("toks"), 1, 3), ",").as("first3"),
        // sorted-distinct: array_distinct alone keeps first-occurrence
        // order, which DuckDB's list_distinct does not guarantee —
        // sorting makes the contract engine-independent
        array_join(sort_array(array_distinct(slice(col("toks"), 1, 8))), ",")
          .as("first8_distinct"),
        array_join(sort_array(slice(col("toks"), 1, 5)), ",").as("first5_sorted"),
        array_contains(col("toks"), "the").as("has_the"),
        array_position(col("toks"), "the").cast("long").as("the_pos"),
        // literal map lookup (duplicate-key-safe; map_from_arrays over
        // data tokens would throw under ANSI on a repeated token)
        element_at(
          map(lit("the"), lit(1L), lit("a"), lit(2L), lit("of"), lit(3L)),
          element_at(col("toks"), 1)).as("map_hit"))
  }

  private val q27Sql =
    """SELECT doc_id,
      |  CAST(len(toks) AS BIGINT) AS n_toks,
      |  array_to_string(toks[1:3], ',') AS first3,
      |  array_to_string(list_sort(list_distinct(toks[1:8])), ',') AS first8_distinct,
      |  array_to_string(list_sort(toks[1:5]), ',') AS first5_sorted,
      |  list_contains(toks, 'the') AS has_the,
      |  CAST(coalesce(list_position(toks, 'the'), 0) AS BIGINT) AS the_pos,
      |  CASE toks[1] WHEN 'the' THEN CAST(1 AS BIGINT) WHEN 'a' THEN 2 WHEN 'of' THEN 3 END AS map_hit
      |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)""".stripMargin

  /** q28: the full analytic window family over per-nation customer
    * balances — dense_rank, percent_rank, cume_dist, lead with default,
    * nth_value. percent_rank/cume_dist are exact small-integer divisions
    * (identical doubles both engines); the (acctbal, custkey) tiebreak
    * totalizes the order.
    */
  private def q28(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal").desc, col("c_custkey"))
    customer(s, dir).select(
      col("c_nationkey"), col("c_custkey"),
      dense_rank().over(w).cast("long").as("drank"),
      percent_rank().over(w).as("prank"),
      cume_dist().over(w).as("cdist"),
      lead(col("c_custkey"), 1, -1L).over(w).as("next_cust"),
      nth_value(col("c_custkey"), 3).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("third_cust"))
  }

  private val q28Sql =
    """SELECT c_nationkey, c_custkey,
      |  CAST(dense_rank() OVER w AS BIGINT) AS drank,
      |  percent_rank() OVER w AS prank,
      |  cume_dist() OVER w AS cdist,
      |  lead(c_custkey, 1, -1) OVER w AS next_cust,
      |  nth_value(c_custkey, 3) OVER (PARTITION BY c_nationkey
      |    ORDER BY c_acctbal DESC, c_custkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_cust
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)""".stripMargin

  /** q29: multiset set operations (INTERSECT ALL / EXCEPT ALL) over
    * per-order line counts — duplicates preserved, complementing q14's
    * distinct-set variants.
    */
  private def q29(s: SparkSession, dir: String): DataFrame = {
    val a = lineitem(s, dir).filter(col("l_linenumber") <= 2).select(col("l_orderkey"))
    val b = lineitem(s, dir).filter(col("l_linenumber") >= 2).select(col("l_orderkey"))
    a.intersectAll(b).withColumn("op", lit("intersect_all"))
      .unionAll(a.exceptAll(b).withColumn("op", lit("except_all")))
  }

  private val q29Sql =
    """SELECT l_orderkey, 'intersect_all' AS op FROM
      |  ((SELECT l_orderkey FROM lineitem WHERE l_linenumber <= 2)
      |   INTERSECT ALL
      |   (SELECT l_orderkey FROM lineitem WHERE l_linenumber >= 2))
      |UNION ALL
      |SELECT l_orderkey, 'except_all' AS op FROM
      |  ((SELECT l_orderkey FROM lineitem WHERE l_linenumber <= 2)
      |   EXCEPT ALL
      |   (SELECT l_orderkey FROM lineitem WHERE l_linenumber >= 2))""".stripMargin

  /** q30: outer joins — TPC-H Q13 flavor. Left outer customer⋈orders
    * (customers with no orders survive with count 0 via the null-group
    * count), then the distribution of customers per order count. The
    * one join family (outer) the inner/semi/anti/cross coverage lacked;
    * count(o_orderkey) vs count(*) exercises null-skipping aggregation
    * semantics identically in both engines.
    */
  private def q30(s: SparkSession, dir: String): DataFrame =
    customer(s, dir)
      .join(orders(s, dir), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))

  private val q30Sql =
    """SELECT c_count, count(*) AS custdist
      |FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey)
      |GROUP BY c_count""".stripMargin

  /** q31: regex scalar functions — extract/match/replace/count with
    * deliberately conservative patterns (digit/word classes and anchors
    * mean the same thing to Java's regex and DuckDB's RE2; fancier
    * syntax — lookbehind, \\s, possessives — diverges and is avoided,
    * see DETERMINISM.md on Java-vs-RE2).
    */
  private def q31(s: SparkSession, dir: String): DataFrame =
    orders(s, dir).select(
      col("o_orderkey"),
      regexp_extract(col("o_orderpriority"), "^([0-9]+)", 1).as("prio_num"),
      col("o_orderstatus").rlike("^[FO]$").as("status_final_or_open"),
      regexp_replace(col("o_orderpriority"), "[0-9]+", "#").as("prio_masked"),
      size(split(col("o_orderpriority"), "[0-9]+")).cast("long").minus(1).as("n_number_runs"))

  private val q31Sql =
    """SELECT o_orderkey,
      |  regexp_extract(o_orderpriority, '^([0-9]+)', 1) AS prio_num,
      |  regexp_matches(o_orderstatus, '^[FO]$') AS status_final_or_open,
      |  regexp_replace(o_orderpriority, '[0-9]+', '#', 'g') AS prio_masked,
      |  CAST(len(string_split_regex(o_orderpriority, '[0-9]+')) - 1 AS BIGINT) AS n_number_runs
      |FROM orders""".stripMargin

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("q21_band_join", q21, Some(q21Sql)),
    QueryDef("q22_math_funcs", q22, Some(q22Sql)),
    QueryDef("q23_pivot", q23, Some(q23Sql)),
    QueryDef("q24_scalar_subquery", q24, Some(q24Sql)),
    QueryDef("q25_approx_sketches", q25, Some(q25Sql)),
    QueryDef("q26_exact_percentiles", q26, Some(q26Sql)),
    QueryDef("q27_array_map_funcs", q27, Some(q27Sql)),
    QueryDef("q28_window_suite", q28, Some(q28Sql)),
    QueryDef("q29_multiset_ops", q29, Some(q29Sql)),
    QueryDef("q30_outer_join", q30, Some(q30Sql)),
    QueryDef("q31_regex_funcs", q31, Some(q31Sql)),
    QueryDef("q53_hll_merge", q53, Some(q53Sql)),
    QueryDef("q54_heavy_hitters", q54, Some(q54Sql)),
    QueryDef("q55_quantile_merge", q55, Some(q55Sql)),
  )
}
