package graft.queries

import graft.core.Num
import graft.core.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Second wave of relational coverage: distinct aggregation, rollup/cube/
  * grouping sets, set operations, scalar string functions, date functions,
  * conditional aggregation, having, ntile. All absent from the reference
  * (SURVEY.md §2.5) — expressible there only inside user Map/Reduce
  * closures; here each is a single declarative plan.
  */
object Relational2 extends QueryModule {

  /** Distinct aggregation: per-flag distinct part/supplier counts.
    * One distinct column per aggregate: TWO distinct columns in one agg
    * make Catalyst Expand every input row 3x through every buffer
    * (ScaleLint flags the shape). Split, each side plans as the plain
    * two-phase distinct agg (map-side dedup), and the per-flag results
    * broadcast-join back — at 100 TB swap in approx_count_distinct when
    * exactness isn't required.
    */
  private def q11(s: SparkSession, dir: String): DataFrame = {
    val li = lineitem(s, dir)
    val parts = li.groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_rows"))
    val supps = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_suppkey")).as("n_supps"))
      .withColumnRenamed("l_returnflag", "rf2")
    // null-SAFE equi-join: both sides group by the same key, so every
    // group (including a NULL flag group, which a plain inner join's
    // NULL != NULL would silently drop while the oracle's GROUP BY
    // keeps it) appears exactly once on each side
    parts.join(broadcast(supps), col("l_returnflag") <=> col("rf2"))
      .select(col("l_returnflag"), col("n_parts"), col("n_supps"), col("n_rows"))
  }

  private val q11Sql =
    """SELECT l_returnflag,
      |  count(DISTINCT l_partkey) AS n_parts,
      |  count(DISTINCT l_suppkey) AS n_supps,
      |  count(*) AS n_rows
      |FROM lineitem
      |GROUP BY l_returnflag""".stripMargin

  /** Rollup: subtotals over (returnflag, linestatus) hierarchy. */
  private def q12(s: SparkSession, dir: String): DataFrame =
    spread(lineitem(s, dir))
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(Num.dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))

  private val q12Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  count(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  /** Cube: all grouping combinations over order status/priority. */
  private def q13(s: SparkSession, dir: String): DataFrame =
    spread(orders(s, dir))
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(Num.dsum(col("o_totalprice")).as("sum_price"), count(lit(1)).as("n"))

  private val q13Sql =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |  count(*) AS n
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin

  /** Set operations: customer nations vs supplier nations. The tag column
    * makes one deterministic result of INTERSECT + EXCEPT + UNION branches.
    */
  private def q14(s: SparkSession, dir: String): DataFrame = {
    val cn = customer(s, dir).select(col("c_nationkey").as("nationkey")).distinct()
    val sn = supplier(s, dir).select(col("s_nationkey").as("nationkey")).distinct()
    cn.intersect(sn).withColumn("op", lit("intersect"))
      .unionAll(cn.except(sn).withColumn("op", lit("except")))
      .unionAll(cn.union(sn).distinct().withColumn("op", lit("union")))
  }

  private val q14Sql =
    """SELECT nationkey, 'intersect' AS op FROM
      |  ((SELECT DISTINCT c_nationkey AS nationkey FROM customer)
      |   INTERSECT
      |   (SELECT DISTINCT s_nationkey AS nationkey FROM supplier))
      |UNION ALL
      |SELECT nationkey, 'except' AS op FROM
      |  ((SELECT DISTINCT c_nationkey AS nationkey FROM customer)
      |   EXCEPT
      |   (SELECT DISTINCT s_nationkey AS nationkey FROM supplier))
      |UNION ALL
      |SELECT nationkey, 'union' AS op FROM
      |  ((SELECT DISTINCT c_nationkey AS nationkey FROM customer)
      |   UNION
      |   (SELECT DISTINCT s_nationkey AS nationkey FROM supplier))""".stripMargin

  /** Scalar string functions — all codegen'd built-ins, no UDFs. */
  private def q15(s: SparkSession, dir: String): DataFrame =
    part(s, dir).select(
      col("p_partkey"),
      upper(col("p_name")).as("up_name"),
      lower(col("p_brand")).as("lo_brand"),
      length(col("p_name")).cast("long").as("name_len"),
      substring(col("p_type"), 1, 4).as("type_pre"),
      concat(col("p_brand"), lit("|"), col("p_type")).as("brand_type"),
      regexp_replace(col("p_name"), " ", "_").as("snake_name"),
      lpad(col("p_size").cast("string"), 4, "0").as("size_pad"))

  private val q15Sql =
    """SELECT p_partkey,
      |  upper(p_name) AS up_name,
      |  lower(p_brand) AS lo_brand,
      |  CAST(length(p_name) AS BIGINT) AS name_len,
      |  substring(p_type, 1, 4) AS type_pre,
      |  concat(p_brand, '|', p_type) AS brand_type,
      |  replace(p_name, ' ', '_') AS snake_name,
      |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad
      |FROM part""".stripMargin

  /** Date/time functions: order volume by year/month (ints, not
    * timestamps, for cross-engine hash safety — DETERMINISM.md rule 6).
    */
  private def q16(s: SparkSession, dir: String): DataFrame =
    orders(s, dir)
      .groupBy(
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mth"))
      .agg(
        count(lit(1)).as("n_orders"),
        Num.dsum(col("o_totalprice")).as("month_rev"))

  private val q16Sql =
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
      |  CAST(month(o_orderdate) AS BIGINT) AS mth,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS month_rev
      |FROM orders
      |GROUP BY 1, 2""".stripMargin

  /** Conditional aggregation: CASE WHEN pivot-style measures. */
  private def q17(s: SparkSession, dir: String): DataFrame = {
    val D = DecimalType(18, 2)
    orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(when(col("o_orderstatus") === "F", lit(1)).otherwise(lit(0))).as("n_finished"),
        sum(when(col("o_orderstatus") === "O", lit(1)).otherwise(lit(0))).as("n_open"),
        sum(when(col("o_orderstatus") === "F", col("o_totalprice").cast(D))
          .otherwise(lit(0).cast(D))).cast("double").as("finished_rev"))
  }

  private val q17Sql =
    """SELECT o_orderpriority,
      |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
      |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
      |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS finished_rev
      |FROM orders
      |GROUP BY o_orderpriority""".stripMargin

  /** Having: post-aggregation filter. */
  private def q18(s: SparkSession, dir: String): DataFrame =
    orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), Num.dsum(col("o_totalprice")).as("spend"))
      .filter(col("n_orders") >= 15)

  private val q18Sql =
    """SELECT o_custkey, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
      |FROM orders
      |GROUP BY o_custkey
      |HAVING count(*) >= 15""".stripMargin

  /** Grouping sets: independent subtotals by flag and by status. */
  private def q19(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))

  private val q19Sql =
    """SELECT l_returnflag, l_linestatus, count(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin

  /** ntile quartiles over exact per-customer spend (deterministic order).
    * A bare `ntile(4).over(Window.orderBy(...))` funnels every row through
    * one task (the WindowExec warning); this is the two-pass
    * range-partitioned plan instead — identical result, no
    * single-partition exchange (see [[graft.plans.GlobalOrder]]).
    */
  private def q20(s: SparkSession, dir: String): DataFrame = {
    val spend = orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(Num.dsum(col("o_totalprice")).as("spend"))
    graft.plans.GlobalOrder
      .withGlobalNtile(spend, Seq(col("spend").desc, col("o_custkey")), 4, "quartile")
      .select(col("o_custkey"), col("spend"), col("quartile").cast("long").as("quartile"))
  }

  private val q20Sql =
    """SELECT o_custkey, spend, CAST(ntile(4) OVER (ORDER BY spend DESC, o_custkey) AS BIGINT) AS quartile
      |FROM (SELECT o_custkey,
      |        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
      |      FROM orders GROUP BY o_custkey)""".stripMargin

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("q11_distinct_agg", q11, Some(q11Sql)),
    QueryDef("q12_rollup", q12, Some(q12Sql)),
    QueryDef("q13_cube", q13, Some(q13Sql)),
    QueryDef("q14_set_ops", q14, Some(q14Sql)),
    QueryDef("q15_string_funcs", q15, Some(q15Sql)),
    QueryDef("q16_date_funcs", q16, Some(q16Sql)),
    QueryDef("q17_conditional_agg", q17, Some(q17Sql)),
    QueryDef("q18_having", q18, Some(q18Sql)),
    QueryDef("q19_grouping_sets", q19, Some(q19Sql)),
    QueryDef("q20_ntile", q20, Some(q20Sql)),
  )
}
