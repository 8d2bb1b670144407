package graft.ops

import graft.core.Tables
import graft.plans.GlobalOrder
import graft.queries.{QueryDef, QueryModule}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting / ordering for training-data prep.
  *
  * All randomness derives from the shared cross-engine 60-bit md5 fold
  * (docs/DETERMINISM.md rules 8-10): u(key) = md5-prefix(key)/2^60 is a
  * uniform double BOTH engines compute bit-identically, so splits and
  * sample membership are reproducible forever and oracle-checkable —
  * the property a production pipeline wants anyway (re-runs must not
  * reshuffle examples between train and test).
  *
  * Scale shape: u is a row-local projection (no shuffle, no RNG state);
  * the split/sample ops are therefore scan-speed and trivially parallel.
  * Only p04's global ordering shuffles, via the two-pass range plan.
  */
object Sampling extends QueryModule {

  /** 2^60 as a double (exact): the divisor turning the 15-hex-char md5
    * prefix into a uniform [0,1) double.
    */
  private val Pow60 = 1152921504606846976.0

  /** THE 60-bit md5 prefix fold, as a long in [0, 2^60) — every
    * cross-engine uniform-hash decision (splits, samples, d08 centroid
    * membership) derives from this one expression so the
    * determinism-critical formula cannot drift between call sites.
    * DuckDB twin: OracleSql.hex60.
    */
  private[graft] def hash60(key: Column): Column =
    conv(substring(md5(key), 1, 15), 16, 10).cast("long")

  /** Uniform-[0,1) hash of `key`, salted so independent decisions
    * (split vs sample) use independent bits.
    */
  private[ops] def uhash(salt: String, key: Column): Column =
    hash60(concat(lit(salt), key.cast("string"))) / lit(Pow60)

  /** The DuckDB mirror of [[uhash]] (hex-digit fold of the md5 prefix). */
  private[ops] def uhashSql(salt: String, key: String): String =
    s"""CAST(${OracleSql.hex60(s"'$salt' || $key")} AS DOUBLE)
       |  / 1152921504606846976.0""".stripMargin

  /** THE train/val/test assignment rule, defined once: `u` must be
    * `uhash("split_", key)` (Scala) / `uhashSql("split_", key)` aliased
    * `u` (SQL). p03 emits it, p06 (Profiling) and p09 audit it — all
    * three reference these definitions so a ratio retune cannot leave a
    * stale copy behind.
    */
  private[graft] def splitOf(u: Column): Column =
    when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test")

  private[graft] val splitCaseSql =
    "CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val' ELSE 'test' END"

  /** p03: deterministic 80/10/10 train/val/test split assignment. */
  private def p03(s: SparkSession, dir: String): DataFrame = {
    val u = uhash("split_", col("doc_id"))
    Tables.documents(s, dir).select(
      col("doc_id"),
      u.as("u"),
      splitOf(u).as("split"))
  }

  private val p03Sql =
    s"""SELECT doc_id, u, $splitCaseSql AS split
       |FROM (SELECT doc_id, ${uhashSql("split_", "doc_id")} AS u FROM documents)""".stripMargin

  /** p04: deterministic global shuffle order — the "randomize example
    * order, reproducibly" step before sharding a training set. Global
    * position via the two-pass range-partitioned plan (GlobalOrder):
    * no single-partition sort or window anywhere in the plan.
    */
  private def p04(s: SparkSession, dir: String): DataFrame =
    GlobalOrder.withGlobalRowNumber(
      Tables.documents(s, dir).select(col("doc_id")),
      Seq(md5(col("doc_id").cast("string")), col("doc_id")),
      "pos")._1

  private val p04Sql =
    """SELECT doc_id,
      |  CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS pos
      |FROM documents""".stripMargin

  /** p05: balanced per-language subsample — k docs per language, chosen
    * by hash order (deterministic, unbiased within stratum). The window
    * is PARTITIONED by the stratum, so this is a parallel per-group
    * top-k, not a global sort; at 100 TB swap row_number for the
    * bounded-memory TopK Aggregator if strata are huge.
    */
  private val PerLang = 20

  private def p05(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= PerLang)
  }

  private val p05Sql =
    s"""SELECT doc_id, lang, rk FROM (
       |  SELECT doc_id, lang,
       |    CAST(row_number() OVER (PARTITION BY lang
       |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
       |  FROM documents)
       |WHERE rk <= $PerLang""".stripMargin

  /** p09: split drift report — does the train/test split preserve the
    * language mix? Per-language counts and proportions in each split plus
    * the absolute proportion gap (the total-variation contribution). The
    * check a pipeline runs after p03 before trusting eval numbers.
    *
    * Determinism: counts are ints and each proportion is ONE IEEE
    * division (int/int), the drift ONE subtraction — bit-identical across
    * engines with no rounding (DETERMINISM.md), which is why the metric
    * is TV-style |Δp| and not a PSI/KL log-ratio (libm log is not pinned
    * across engines). Scale shape: scan + one tiny hash aggregate; the
    * totals join is a broadcast of a 1-row frame.
    */
  private def p09(s: SparkSession, dir: String): DataFrame = {
    val u = uhash("split_", col("doc_id"))
    val byLang = Tables.documents(s, dir)
      .select(col("lang"), splitOf(u).as("split"))
      .filter(col("split") =!= "val")
      .groupBy(col("lang"))
      .agg(
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"))
    val totals = byLang.groupBy()
      .agg(sum(col("n_train")).as("tot_train"), sum(col("n_test")).as("tot_test"))
    // a degenerate corpus can land every doc in one split (tot = 0 on
    // the other): the share is then undefined — null, not an ANSI
    // DIVIDE_BY_ZERO throw; drift goes null with it on both engines
    val pTrain = when(col("tot_train") > 0,
      col("n_train").cast("double") / col("tot_train").cast("double"))
    val pTest = when(col("tot_test") > 0,
      col("n_test").cast("double") / col("tot_test").cast("double"))
    byLang.crossJoin(broadcast(totals))
      .select(col("lang"), col("n_train"), col("n_test"),
        pTrain.as("p_train"), pTest.as("p_test"),
        abs(pTrain - pTest).as("drift"))
  }

  private val p09Sql =
    s"""WITH spl AS (
       |  SELECT lang, $splitCaseSql AS split
       |  FROM (SELECT lang, doc_id, ${uhashSql("split_", "doc_id")} AS u FROM documents)),
       |b AS (
       |  SELECT lang,
       |    CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
       |    CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test
       |  FROM spl WHERE split <> 'val' GROUP BY 1),
       |t AS (SELECT CAST(sum(n_train) AS BIGINT) AS tot_train,
       |             CAST(sum(n_test) AS BIGINT) AS tot_test FROM b)
       |SELECT lang, n_train, n_test,
       |  CASE WHEN tot_train > 0 THEN CAST(n_train AS DOUBLE) / CAST(tot_train AS DOUBLE) END AS p_train,
       |  CASE WHEN tot_test > 0 THEN CAST(n_test AS DOUBLE) / CAST(tot_test AS DOUBLE) END AS p_test,
       |  abs(CASE WHEN tot_train > 0 THEN CAST(n_train AS DOUBLE) / CAST(tot_train AS DOUBLE) END
       |    - CASE WHEN tot_test > 0 THEN CAST(n_test AS DOUBLE) / CAST(tot_test AS DOUBLE) END) AS drift
       |FROM b CROSS JOIN t""".stripMargin

  /** p10: training-batch packing — the deterministic global shuffle
    * order (p04's two-pass GlobalOrder plan: no single-partition sort)
    * chopped into fixed-size batches, with the per-batch composition
    * stats (docs, distinct langs, char volume) a data-loader audits for
    * balance before training. Batch membership is a pure function of the
    * md5 order, so re-runs pack identical batches — the reproducibility
    * requirement for resumable training.
    */
  private val BatchSize = 64

  /** THE batch-packing kernel: p04's deterministic global order (two-
    * pass GlobalOrder range plan — no single-partition sort) chopped
    * into [[BatchSize]]-doc batches with per-batch composition stats.
    * `docs` must be (doc_id, lang, vol); the volume sum is emitted as
    * `sumName`. Defined once so p10 (raw corpus, char volume) and p27
    * (remixed survivors, token volume) cannot drift.
    */
  private def batchPack(docs: DataFrame, sumName: String): DataFrame =
    GlobalOrder.withGlobalRowNumber(
      docs, Seq(md5(col("doc_id").cast("string")), col("doc_id")), "pos")._1
      .select(expr(s"(pos - 1) DIV $BatchSize").as("batch_id"),
        col("lang"), col("vol"))
      .groupBy(col("batch_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("vol")).as(sumName))

  /** The [[batchPack]] oracle tail over an arbitrary (doc_id, lang,
    * `volCol`) source — the literal text p10Sql and p27Sql share (the
    * p13 composition law).
    */
  private def packSql(src: String, volCol: String, sumName: String): String =
    s"""SELECT (pos - 1) // $BatchSize AS batch_id,
       |  count(*) AS n_docs,
       |  count(DISTINCT lang) AS n_langs,
       |  CAST(sum($volCol) AS BIGINT) AS $sumName
       |FROM (SELECT doc_id, lang, $volCol,
       |        CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS pos
       |      FROM $src)
       |GROUP BY 1""".stripMargin

  private def p10(s: SparkSession, dir: String): DataFrame =
    batchPack(
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("n_chars").as("vol")),
      "sum_chars")

  private val p10Sql =
    packSql("documents", "n_chars", "sum_chars")

  /** p26: temperature-flattened domain mixture — the multilingual-
    * pretraining resampling rule p_d ∝ s_d^α with α = 1/2: rare
    * languages keep everything, dominant ones downsample toward a
    * flatter mix. Per-language keep fraction F_d = sqrt(c_min / c_d)
    * (the α=1/2 weights normalized so the rarest stratum's fraction is
    * exactly 1 — downsampling only, never fabricating rows), applied as
    * a deterministic md5-hash threshold per doc: the same doc keeps or
    * drops identically on every run, engine, and cluster.
    *
    * α = 1/2 is chosen deliberately over the literature's free τ: the
    * threshold needs only /, sqrt, *, floor — all IEEE-exactly-rounded
    * in BOTH engines — where a general pow() is a libm call with
    * engine-varying last ulps (DETERMINISM.md). The comparison itself
    * runs on exact 60-bit integers.
    *
    * Scale shape: one count aggregate (|langs| rows) broadcast back;
    * the keep decision is a row-local hash compare — one scan, one
    * tiny broadcast, no second shuffle.
    */
  /** THE temperature gate kernel over an arbitrary frame carrying
    * (doc_id, lang, ...): every input column plus the deterministic
    * `kept` decision. One count aggregate (|langs| rows, consumed by
    * both the min branch and the threshold projection — persisted so
    * the input is scanned once for counts, the p16 pattern), one tiny
    * broadcast back, a row-local hash compare. Defined once so p26
    * (raw corpus mixture) and p27 (the composed pipeline's remix
    * stage) cannot drift.
    */
  private def temperatureKeep(docs: DataFrame): DataFrame = {
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("c")).persist()
    val thr = counts
      .crossJoin(broadcast(counts.agg(min(col("c")).as("cmin"))))
      .select(col("lang"),
        floor(lit(Pow60) *
          sqrt(col("cmin").cast("double") / col("c").cast("double")))
          .cast("long").as("thr"))
    docs.join(broadcast(thr), "lang")
      .select(docs.columns.map(col) :+
        (hash60(concat(lit("mix_"), col("doc_id").cast("string"))) < col("thr"))
          .as("kept"): _*)
  }

  /** The [[temperatureKeep]] oracle block over an arbitrary
    * (doc_id, lang, ...) CTE `src` → `remix` (src.* plus `kept`) — the
    * literal text p26Sql and p27Sql share (the p13 composition law).
    */
  private def mixtureCtes(src: String): String =
    s"""mixc AS (SELECT lang, count(*) AS c FROM $src GROUP BY 1),
       |mixm AS (SELECT min(c) AS cmin FROM mixc),
       |mixt AS (SELECT lang,
       |  CAST(floor(1152921504606846976.0 *
       |    sqrt(CAST(cmin AS DOUBLE) / CAST(c AS DOUBLE))) AS BIGINT) AS thr
       |  FROM mixc, mixm),
       |remix AS (
       |  SELECT d.*,
       |    ${OracleSql.hex60("'mix_' || CAST(doc_id AS VARCHAR)")} < mixt.thr AS kept
       |  FROM $src d JOIN mixt USING (lang))""".stripMargin

  private def p26(s: SparkSession, dir: String): DataFrame =
    temperatureKeep(Tables.documents(s, dir).select(col("doc_id"), col("lang")))
      .select(col("doc_id"), col("lang"), col("kept"))

  private val p26Sql =
    s"""WITH d AS (SELECT doc_id, lang FROM documents),
       |${mixtureCtes("d")}
       |SELECT doc_id, lang, kept FROM remix""".stripMargin

  /** p27: the composed production remix pipeline — clean → dedup →
    * remix → pack, the order a real pretraining prep job runs: the
    * funnel's survivors (p02 stages 1–3: quality/language filter +
    * exact dedup, [[Profiling.funnelFrames]] verbatim) flow through
    * p26's temperature gate ON THE PREDICTED language ([[temperatureKeep]]
    * verbatim), and the kept docs pack into p10's deterministic batches
    * ([[batchPack]] verbatim, token volume). Per-batch composition
    * stats are the training-readiness report: after remix, batches
    * should mix languages far more evenly than the raw p10 packing.
    *
    * The oracle is the literal composition of the three constituents'
    * CTE blocks (funnelCtes + mixtureCtes + packSql — the p13 law), so
    * the composed entry can not drift from its parts.
    *
    * Scale shape: inherited wholesale — the funnel's one persisted
    * scoring pass, the gate's tiny count-broadcast + row-local compare,
    * GlobalOrder's two-pass range plan; no new join shapes.
    */
  private def p27(s: SparkSession, dir: String): DataFrame = {
    val (_, _, survivors) = Profiling.funnelFrames(s, dir)
    val remixed = temperatureKeep(
      survivors.select(col("doc_id"), col("pred_lang").as("lang"), col("n_tokens")))
    batchPack(
      remixed.filter(col("kept"))
        .select(col("doc_id"), col("lang"), col("n_tokens").as("vol")),
      "sum_tokens")
  }

  // LAZY: p27Sql is the one cross-module SQL splice that points "up"
  // the module init order (Sampling → Profiling → Dedup → Sampling is
  // a cycle during object initialization — an eager val here left
  // Profiling.p13Sql reading a still-null Dedup.segScrubCte). Deferring
  // evaluation to the defs build breaks the nesting; everything is
  // fully initialized by then.
  private lazy val p27Sql =
    s"""WITH ${Profiling.funnelCtes},
       |sv AS (SELECT doc_id, pred_lang AS lang, n_tokens FROM survivors),
       |${mixtureCtes("sv")},
       |pk AS (SELECT doc_id, lang, n_tokens FROM remix WHERE kept)
       |${packSql("pk", "n_tokens", "sum_tokens")}""".stripMargin

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("p03_split_assign", p03, Some(p03Sql)),
    QueryDef("p04_shuffle_order", p04, Some(p04Sql)),
    QueryDef("p05_balanced_sample", p05, Some(p05Sql)),
    QueryDef("p09_split_drift", p09, Some(p09Sql)),
    QueryDef("p10_batch_pack", p10, Some(p10Sql)),
    QueryDef("p26_temperature_mixture", p26, Some(p26Sql)),
    QueryDef("p27_remix_pipeline", p27, Some(p27Sql)),
  )
}
