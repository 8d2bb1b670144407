package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Fifth wave of relational surface: statistical aggregates, recursive
  * CTEs (Spark 4's UnionLoop), and nested struct/array-of-struct ops.
  */
object Relational5 extends QueryModule {

  private val D = DecimalType(18, 2)

  /** q39: statistical aggregates per return flag.
    *
    * Determinism split (docs/DETERMINISM.md): `corr`/`stddev_samp` are
    * irrational (sqrt) so a 6-dp round is tie-safe; the rational moments
    * (covariance, variance, regression slope) are computed from EXACT
    * decimal power sums cast to double — a fixed IEEE expression tree
    * over identical inputs, bit-identical across engines with NO
    * rounding. StatsAggSpec pins the built-in covar_samp/var_pop/
    * regr_slope to these manual forms, so the built-ins are covered even
    * though the oracle hashes the deterministic formulas.
    *
    * Scale shape: one partial+final hash aggregate over lineitem — every
    * moment is algebraic (sum-shaped), so map-side combine applies.
    */
  private def q39(s: SparkSession, dir: String): DataFrame = {
    val x = col("l_quantity").cast(D)      // qty, 2-dp exact
    val y = col("l_discount").cast(D)      // discount, 2-dp exact
    val p = col("l_extendedprice").cast(D) // price, 2-dp exact
    val agg = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
        round(stddev_samp(col("l_discount")), 6).as("sd_disc"),
        sum(x * y).as("sxy"), sum(x * p).as("sxp"),
        sum(x).as("sx"), sum(y).as("sy"), sum(p).as("sp"),
        sum(x * x).as("sx2"))
    val n = col("n").cast("double")
    val (sxy, sxp, sx, sy, sp, sx2) =
      (col("sxy").cast("double"), col("sxp").cast("double"), col("sx").cast("double"),
        col("sy").cast("double"), col("sp").cast("double"), col("sx2").cast("double"))
    agg.select(
      col("l_returnflag"), col("n"), col("corr_qp"), col("sd_disc"),
      ((sxy - sx * sy / n) / (n - lit(1.0))).as("cov_qd"),
      ((sx2 - sx * sx / n) / n).as("var_qty"),
      ((n * sxp - sx * sp) / (n * sx2 - sx * sx)).as("slope_pq"))
  }

  private val q39Sql =
    """SELECT l_returnflag, n, corr_qp, sd_disc,
      |  (sxy - sx * sy / n) / (n - 1.0) AS cov_qd,
      |  (sx2 - sx * sx / n) / n AS var_qty,
      |  (n * sxp - sx * sp) / (n * sx2 - sx * sx) AS slope_pq
      |FROM (
      |  SELECT l_returnflag,
      |    count(*) AS n,
      |    round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
      |    round(stddev_samp(l_discount), 6) AS sd_disc,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxp,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sp,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx2
      |  FROM lineitem GROUP BY 1)""".stripMargin
  // n appears as DOUBLE in the outer arithmetic in both engines: Spark
  // casts explicitly; DuckDB promotes BIGINT n to double on first use
  // with a double operand — both produce the identical IEEE value.

  /** q40: recursive CTE (Spark 4 UnionLoop) — a generated month spine
    * LEFT-JOINed to orders so empty months appear with zero counts (the
    * classic calendar-fill that plain GROUP BY cannot express). The
    * recursion is a fixed 84-step integer loop (1995-01..2001-12, the
    * testdata's full o_orderdate range at every SF): data-independent,
    * so the loop itself is O(1) work and the only real cost is one scan
    * + hash aggregate of orders against a broadcast 84-row spine.
    */
  private def q40(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("graft_q40_orders")
    s.sql(
      """WITH RECURSIVE ms(m) AS (
        |  SELECT 0
        |  UNION ALL
        |  SELECT m + 1 FROM ms WHERE m < 83
        |)
        |SELECT mm.month AS month, CAST(count(o.o_orderkey) AS BIGINT) AS n_orders
        |FROM (SELECT date_format(add_months(DATE '1995-01-01', m), 'yyyy-MM') AS month FROM ms) mm
        |LEFT JOIN graft_q40_orders o
        |  ON date_format(CAST(o.o_orderdate AS DATE), 'yyyy-MM') = mm.month
        |GROUP BY mm.month""".stripMargin)
  }

  private val q40Sql =
    """WITH RECURSIVE ms(m) AS (
      |  SELECT 0
      |  UNION ALL
      |  SELECT m + 1 FROM ms WHERE m < 83
      |)
      |SELECT mm.month AS month, CAST(count(o.o_orderkey) AS BIGINT) AS n_orders
      |FROM (SELECT strftime(DATE '1995-01-01' + INTERVAL (m) MONTH, '%Y-%m') AS month FROM ms) mm
      |LEFT JOIN orders o
      |  ON strftime(CAST(o.o_orderdate AS DATE), '%Y-%m') = mm.month
      |GROUP BY mm.month""".stripMargin

  /** q41: nested types end-to-end — per-order array of line structs,
    * sorted BY STRUCT (field-order comparison), positional access from
    * both ends, and a higher-order decimal fold over the struct array.
    * All the array work is row-local (post-aggregation projection); the
    * only shuffle is the groupBy on l_orderkey.
    */
  private def q41(s: SparkSession, dir: String): DataFrame = {
    val arrs = Tables.lineitem(s, dir)
      .filter(col("l_orderkey") % 100 === 0)
      .select(col("l_orderkey"),
        struct(col("l_linenumber").as("ln"), col("l_quantity").cast(D).as("qty")).as("st"))
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_list(col("st"))).as("arr"))
    arrs.select(
      col("l_orderkey"),
      size(col("arr")).cast("long").as("n_lines"),
      element_at(col("arr"), 1).getField("ln").as("first_ln"),
      element_at(col("arr"), 1).getField("qty").cast("double").as("first_qty"),
      element_at(col("arr"), -1).getField("qty").cast("double").as("last_qty"),
      aggregate(col("arr"), lit(BigDecimal(0)).cast(D),
        (acc, x) => (acc + x.getField("qty")).cast(D))
        .cast("double").as("total_qty"))
  }

  private val q41Sql =
    """WITH arrs AS (
      |  SELECT l_orderkey,
      |    list_sort(list(struct_pack(ln := l_linenumber, qty := CAST(l_quantity AS DECIMAL(18,2))))) AS arr
      |  FROM lineitem WHERE l_orderkey % 100 = 0 GROUP BY 1)
      |SELECT l_orderkey,
      |  CAST(len(arr) AS BIGINT) AS n_lines,
      |  arr[1].ln AS first_ln,
      |  CAST(arr[1].qty AS DOUBLE) AS first_qty,
      |  CAST(arr[-1].qty AS DOUBLE) AS last_qty,
      |  CAST(CAST(list_sum(list_transform(arr, x -> x.qty)) AS DECIMAL(18,2)) AS DOUBLE) AS total_qty
      |FROM arrs""".stripMargin
  // list_sort on structs compares fields in declaration order — the same
  // (ln, qty) lexicographic order Spark's array_sort applies; both folds
  // stay in DECIMAL so total_qty is exact on both sides.

  /** q42: changelog compaction — treat orders as a per-customer change
    * stream and keep each key's LATEST version (SCD-1 / upsert-ingest
    * compaction, the step before serving a snapshot table). One shuffle
    * on the key; version count rides the same window partition, so no
    * second aggregate. Deterministic tiebreak: (day, o_orderkey) DESC —
    * same-day orders resolve by key, never by arrival order.
    */
  private def q42(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("day").desc, col("o_orderkey").desc)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("o_custkey"))
    Tables.orders(s, dir)
      .select(col("o_custkey"),
        expr("datediff(cast(o_orderdate as date), date'1970-01-01')").cast("long").as("day"),
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_versions", count(lit(1)).over(wAll))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("n_versions"),
        col("day").as("last_day"), col("o_orderkey").as("last_orderkey"),
        col("o_orderstatus").as("last_status"), col("o_totalprice").as("last_price"))
  }

  private val q42Sql =
    """SELECT o_custkey, n_versions, day AS last_day, o_orderkey AS last_orderkey,
      |  o_orderstatus AS last_status, o_totalprice AS last_price
      |FROM (
      |  SELECT o_custkey,
      |    datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day,
      |    o_orderkey, o_orderstatus, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) DESC,
      |        o_orderkey DESC) AS rn,
      |    CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n_versions
      |  FROM orders)
      |WHERE rn = 1""".stripMargin

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("q39_stats_agg", q39, Some(q39Sql)),
    QueryDef("q40_recursive_cte", q40, Some(q40Sql)),
    QueryDef("q41_nested_struct", q41, Some(q41Sql)),
    QueryDef("q42_changelog_compact", q42, Some(q42Sql)),
  )
}
