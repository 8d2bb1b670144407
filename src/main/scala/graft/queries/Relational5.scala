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

  /** q39: statistical aggregates per return flag — correlation, sample
    * stddev, sample covariance, population variance, regression slope.
    *
    * Every moment is computed from EXACT decimal power sums cast to
    * double and combined in a fixed IEEE expression tree (sqrt is
    * correctly rounded on both engines), so all five values are
    * bit-identical across engines with NO rounding anywhere — the gate
    * stays exact-by-construction (docs/DETERMINISM.md; a first cut used
    * round(corr(...), 6), which reintroduces merge-order-dependent
    * double aggregation and the round()-tie hazard). Round4Spec pins the
    * built-in corr/stddev_samp/covar_samp/var_pop/regr_slope to these
    * manual forms, so the built-in surface is covered even though the
    * oracle hashes the deterministic formulas.
    *
    * Magnitude guard: a DECIMAL(38,s) → DOUBLE cast is only correctly
    * rounded in DuckDB while the SCALED integer fits 2^53 (above that
    * its double(int128)/double(10^s) double-rounds — measured at
    * sf0.001), so the two sums whose scaled values can exceed it
    * (Σ qty·price, Σ price²) go through floor() to DECIMAL(38,0) first:
    * floor is tie-free and exact on both engines, and the value range
    * then stays within 2^53 through sf1.
    *
    * Scale shape: one partial+final hash aggregate over lineitem — every
    * moment is algebraic (sum-shaped), so map-side combine applies.
    */
  private def q39(s: SparkSession, dir: String): DataFrame = {
    val x = col("l_quantity").cast(D)      // qty, 2-dp exact
    val y = col("l_discount").cast(D)      // discount, 2-dp exact
    val p = col("l_extendedprice").cast(D) // price, 2-dp exact
    val agg = Tables.spread(Tables.lineitem(s, dir))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(x * y).as("sxy"), floor(sum(x * p)).as("sxp"),
        sum(x).as("sx"), sum(y).as("sy"), sum(p).as("sp"),
        sum(x * x).as("sx2"), sum(y * y).as("sy2"), floor(sum(p * p)).as("sp2"))
    val n = col("n").cast("double")
    val (sxy, sxp, sx, sy, sp, sx2, sy2, sp2) =
      (col("sxy").cast("double"), col("sxp").cast("double"), col("sx").cast("double"),
        col("sy").cast("double"), col("sp").cast("double"), col("sx2").cast("double"),
        col("sy2").cast("double"), col("sp2").cast("double"))
    agg.select(
      col("l_returnflag"), col("n"),
      ((n * sxp - sx * sp) / (sqrt(n * sx2 - sx * sx) * sqrt(n * sp2 - sp * sp)))
        .as("corr_qp"),
      sqrt((sy2 - sy * sy / n) / (n - lit(1.0))).as("sd_disc"),
      ((sxy - sx * sy / n) / (n - lit(1.0))).as("cov_qd"),
      ((sx2 - sx * sx / n) / n).as("var_qty"),
      ((n * sxp - sx * sp) / (n * sx2 - sx * sx)).as("slope_pq"))
  }

  private val q39Sql =
    """SELECT l_returnflag, n,
      |  (n * sxp - sx * sp) / (sqrt(n * sx2 - sx * sx) * sqrt(n * sp2 - sp * sp)) AS corr_qp,
      |  sqrt((sy2 - sy * sy / n) / (n - 1.0)) AS sd_disc,
      |  (sxy - sx * sy / n) / (n - 1.0) AS cov_qd,
      |  (sx2 - sx * sx / n) / n AS var_qty,
      |  (n * sxp - sx * sp) / (n * sx2 - sx * sx) AS slope_pq
      |FROM (
      |  SELECT l_returnflag,
      |    count(*) AS n,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
      |    CAST(floor(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)))) AS DOUBLE) AS sxp,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sp,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx2,
      |    CAST(sum(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sy2,
      |    CAST(floor(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)))) AS DOUBLE) AS sp2
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

  /** q43: ANSI error-handling surface — `try_divide`/`try_cast` turn
    * ANSI runtime errors (divide-by-zero, bad casts) into NULLs, the
    * ingest-robustness idiom under Spark 4's ANSI-on default. The
    * DuckDB mirror encodes the SAME null semantics with guards
    * (TRY_CAST exists there; try_divide does not), so the oracle pins
    * exactly when each expression nulls. min() over the guarded ratio
    * is an exact selection of single-IEEE-op values — deterministic
    * without rounding. One partial+final hash aggregate.
    *
    * Scale lesson (measured): try_*'s CATCH path materializes a Spark
    * error per failing row — a naked try_divide with a 1.9% zero-divisor
    * rate plus an always-failing try_cast ran ~5 s for 600k rows at
    * sf0.1, ~15x the plan's real cost. So expected error classes are
    * guarded to null BY CONSTRUCTION (nullif for the divisor, a regex
    * gate for the cast) and try_* stays what it should be at 100 TB:
    * the safety net for the unexpected residue, not a per-row control-
    * flow mechanism.
    */
  private def q43(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(
        col("l_returnflag"),
        try_divide(col("l_extendedprice"), nullif(col("l_quantity") - lit(25.0), lit(0.0)))
          .as("ratio"),
        // gate: only strings that LOOK integral reach the cast; the rest
        // are null without exercising the error machinery per row. The
        // oracle mirrors the SAME regex gate (not a naked TRY_CAST) so
        // the null rule stays pinned even for signed/padded/fractional
        // strings the two engines' bare casts treat differently
        when(col("l_returnflag").rlike("^-?[0-9]+$"), col("l_returnflag"))
          .try_cast("int").as("flag_int"),
        col("l_linenumber").cast("string").try_cast("bigint").as("ln"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        count(col("ratio")).as("n_div_ok"),
        count(col("flag_int")).as("n_flag_int"),
        sum(col("ln")).as("sum_ln"),
        min(col("ratio")).as("min_ratio"))

  private val q43Sql =
    """SELECT l_returnflag,
      |  count(*) AS n,
      |  count(CASE WHEN l_quantity <> 25 THEN 1 END) AS n_div_ok,
      |  count(TRY_CAST(CASE WHEN regexp_matches(l_returnflag, '^-?[0-9]+$')
      |                      THEN l_returnflag END AS INTEGER)) AS n_flag_int,
      |  CAST(sum(TRY_CAST(CAST(l_linenumber AS VARCHAR) AS BIGINT)) AS BIGINT) AS sum_ln,
      |  min(CASE WHEN l_quantity <> 25
      |        THEN l_extendedprice / (l_quantity - 25.0) END) AS min_ratio
      |FROM lineitem GROUP BY 1""".stripMargin

  /** q44: aggregate FILTER clause — per-group conditional aggregates in
    * ONE pass without CASE-wrapping every input (the ANSI surface for
    * "count the subset while you aggregate the whole"): filtered COUNT,
    * a filtered DECIMAL-exact SUM, a filtered MAX over dates, and ONE
    * filtered COUNT(DISTINCT) kept single so the plan stays Expand-free
    * (the q11/q34 split-agg rule; ScaleLint kind-3 watches the sweep —
    * and caught the first cut's `COUNT(DISTINCT) FILTER`, which Catalyst
    * CAN only plan through the Expand rewrite; the filter lives in the
    * distinct's CASE argument instead, null-ignoring and Expand-free).
    *
    * Determinism: the sum stays in DECIMAL(18,2) until the final cast
    * (order-independent); comparisons are literal IEEE compares both
    * engines parse identically; the date max casts to string for a
    * type-stable hash.
    *
    * Scale shape: one hash-partitioned aggregate over the fact scan —
    * FILTER folds into the aggregate's update path, so the conditional
    * families add zero extra scans or shuffles at 100 TB.
    */
  private def q44(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("graft_q44_lineitem")
    s.sql(
      """SELECT l_returnflag,
        |  COUNT(*) AS n_all,
        |  COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_hi_disc,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'F')
        |       AS DOUBLE) AS qty_f,
        |  CAST(MAX(CAST(l_shipdate AS DATE)) FILTER (WHERE l_quantity < 5.0)
        |       AS STRING) AS last_small_ship,
        |  COUNT(DISTINCT CASE WHEN l_quantity >= 25.0 THEN l_suppkey END) AS n_bulk_supps
        |FROM graft_q44_lineitem
        |GROUP BY l_returnflag""".stripMargin)
  }

  private val q44Sql =
    """SELECT l_returnflag,
      |  COUNT(*) AS n_all,
      |  COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_hi_disc,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'F')
      |       AS DOUBLE) AS qty_f,
      |  CAST(MAX(CAST(l_shipdate AS DATE)) FILTER (WHERE l_quantity < 5.0)
      |       AS VARCHAR) AS last_small_ship,
      |  COUNT(DISTINCT CASE WHEN l_quantity >= 25.0 THEN l_suppkey END) AS n_bulk_supps
      |FROM lineitem
      |GROUP BY l_returnflag""".stripMargin

  /** q45: correlated LATERAL derived-table join — "for each customer,
    * its top-2 orders by price" stated as a per-row subquery (the
    * LATERAL surface q32's UNNEST form doesn't cover: a correlated,
    * ordered, LIMITed relation per outer row). Catalyst decorrelates
    * this into the plan you'd hand-write at 100 TB: a WindowGroupLimit
    * chain that prunes to ≤2 rows per key map-side BEFORE the exchange
    * (no per-outer-row re-execution, no nested loop — plan-asserted in
    * PlanSpec), then one join back to customers. Deterministic tiebreak
    * (o_totalprice DESC, o_orderkey) so the LIMIT is stable; customers
    * with no orders drop out (inner lateral), which both engines agree
    * on by construction.
    */
  private def q45(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("graft_q45_customer")
    Tables.orders(s, dir).createOrReplaceTempView("graft_q45_orders")
    s.sql(
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM graft_q45_customer c, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM graft_q45_orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t""".stripMargin)
  }

  private val q45Sql =
    """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      |FROM customer c, LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders o
      |  WHERE o.o_custkey = c.c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t""".stripMargin

  /** q46: UNPIVOT — wide-to-long reshaping as a first-class relational
    * clause (the melt step feeding per-metric profiling like p01, which
    * uses the same Expand-one-row-per-metric plan internally). NULL
    * metrics are excluded by default in BOTH engines — stated here as
    * the contract. Row-local: the reshape is a Generate/Expand over the
    * scan, no shuffle at any scale.
    */
  private def q46(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("graft_q46_customer")
    s.sql(
      """SELECT c_custkey, metric, val
        |FROM (SELECT c_custkey, c_acctbal AS acctbal,
        |             CAST(c_nationkey AS DOUBLE) AS nationd
        |      FROM graft_q46_customer)
        |UNPIVOT (val FOR metric IN (acctbal, nationd))""".stripMargin)
  }

  private val q46Sql =
    """SELECT c_custkey, metric, val
      |FROM (SELECT c_custkey, c_acctbal AS acctbal,
      |             CAST(c_nationkey AS DOUBLE) AS nationd
      |      FROM customer)
      |UNPIVOT (val FOR metric IN (acctbal, nationd))""".stripMargin

  /** q47: running COUNT(DISTINCT) over an ordered window — "distinct
    * parts shipped by this supplier so far", the cumulative-cardinality
    * shape neither engine's window operator accepts directly (DISTINCT
    * doesn't decompose over frames). Standard rewrite, mirrored in both
    * engines: flag each (supplier, part)'s FIRST row by ship order
    * (row_number = 1), then running-sum the flags per supplier. The
    * (shipdate, orderkey, linenumber) order key is total (orderkey,
    * linenumber is the table PK), so both windows are deterministic.
    *
    * Scale shape: the two windows partition by (suppkey, partkey) and
    * (suppkey) — planned naively that's two exchanges, because the
    * finer hash can't serve the coarser key. The explicit
    * `repartition(suppkey)` seeds hash(suppkey) ONCE, which satisfies
    * BOTH windows' clustering (suppkey ⊂ both partition specs), so the
    * plan carries one exchange and two sorts — PlanSpec pins it. The
    * suppkey ≤ 50 slice keeps the gate dump bounded; the plan shape is
    * slice-independent.
    */
  private def q47(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val l = Tables.lineitem(s, dir)
      .filter(col("l_suppkey") <= 50)
      .select(col("l_suppkey"), col("l_partkey"), col("l_shipdate"),
        col("l_orderkey"), col("l_linenumber"))
      .repartition(col("l_suppkey"))
    val firstW = Window.partitionBy(col("l_suppkey"), col("l_partkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    val runW = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.withColumn("is_first",
        when(row_number().over(firstW) === 1, 1L).otherwise(0L))
      .withColumn("run_distinct_parts", sum(col("is_first")).over(runW))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("run_distinct_parts"))
  }

  private val q47Sql =
    """WITH l AS (
      |  SELECT l_suppkey, l_partkey, l_shipdate, l_orderkey, l_linenumber
      |  FROM lineitem WHERE l_suppkey <= 50),
      |f AS (
      |  SELECT *, CASE WHEN row_number() OVER (
      |      PARTITION BY l_suppkey, l_partkey
      |      ORDER BY l_shipdate, l_orderkey, l_linenumber) = 1
      |    THEN 1 ELSE 0 END AS is_first
      |  FROM l)
      |SELECT l_suppkey, l_orderkey, l_linenumber,
      |  CAST(sum(is_first) OVER (
      |    PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_distinct_parts
      |FROM f""".stripMargin

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("q39_stats_agg", q39, Some(q39Sql)),
    QueryDef("q40_recursive_cte", q40, Some(q40Sql)),
    QueryDef("q41_nested_struct", q41, Some(q41Sql)),
    QueryDef("q42_changelog_compact", q42, Some(q42Sql)),
    QueryDef("q43_try_funcs", q43, Some(q43Sql)),
    QueryDef("q44_filter_clause", q44, Some(q44Sql)),
    QueryDef("q45_lateral_topk", q45, Some(q45Sql)),
    QueryDef("q46_unpivot", q46, Some(q46Sql)),
    QueryDef("q47_window_distinct", q47, Some(q47Sql)),
    QueryDef("q48_nullsafe_join", q48, Some(q48Sql)),
  )

  /** q48: null-safe equality join (`<=>` / IS NOT DISTINCT FROM) — the
    * join semantic ordinary equality can't express: a NULL key matches a
    * NULL key. Two aggregates with deliberately nullable group keys
    * (nullif on the flag columns) are joined null-safely; the NULL↔NULL
    * row in the output exists ONLY under this semantic, so the gate
    * hash distinguishes `<=>` from `=` directly. Planner note: Spark
    * plans null-safe equality as a hash join key (Coalesce/isnull
    * wrapping), not a nested loop — same shuffle budget as a plain
    * equi-join at any scale.
    */
  private def q48(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val a = li.groupBy(nullif(col("l_returnflag"), lit("N")).as("k"))
      .agg(count(lit(1)).as("na"))
    val b = li.groupBy(nullif(col("l_linestatus"), lit("F")).as("k2"))
      .agg(count(lit(1)).as("nb"))
    a.join(b, col("k") <=> col("k2"))
      .select(col("k"), col("na"), col("nb"))
  }

  private val q48Sql =
    """WITH a AS (
      |  SELECT nullif(l_returnflag, 'N') AS k, count(*) AS na
      |  FROM lineitem GROUP BY 1),
      |b AS (
      |  SELECT nullif(l_linestatus, 'F') AS k2, count(*) AS nb
      |  FROM lineitem GROUP BY 1)
      |SELECT a.k, a.na, b.nb
      |FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k2""".stripMargin
}
