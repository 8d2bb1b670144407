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

  /** Uniform-[0,1) hash of `key`, salted so independent decisions
    * (split vs sample) use independent bits.
    */
  private[ops] def uhash(salt: String, key: Column): Column =
    conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 15), 16, 10)
      .cast("long") / lit(Pow60)

  /** The DuckDB mirror of [[uhash]] (hex-digit fold of the md5 prefix). */
  private[ops] def uhashSql(salt: String, key: String): String =
    s"""CAST(${OracleSql.hex60(s"'$salt' || $key")} AS DOUBLE)
       |  / 1152921504606846976.0""".stripMargin

  /** p03: deterministic 80/10/10 train/val/test split assignment. */
  private def p03(s: SparkSession, dir: String): DataFrame = {
    val u = uhash("split_", col("doc_id"))
    Tables.documents(s, dir).select(
      col("doc_id"),
      u.as("u"),
      when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test").as("split"))
  }

  private val p03Sql =
    s"""SELECT doc_id, u,
       |  CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split
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

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("p03_split_assign", p03, Some(p03Sql)),
    QueryDef("p04_shuffle_order", p04, Some(p04Sql)),
    QueryDef("p05_balanced_sample", p05, Some(p05Sql)),
  )
}
