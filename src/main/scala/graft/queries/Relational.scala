package graft.queries

import graft.core.Num
import graft.core.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Declared relational queries over the TPC-H-ish testdata (SURVEY.md §2.5).
  *
  * The reference has no relational operators at all — projection/filter/join/
  * agg are only expressible inside its user Map/Reduce closures
  * (`/root/reference/src/worker.go:12-13`). Here each capability is a
  * first-class declarative Spark plan so Catalyst gets pushdown, pruning,
  * partial aggregation, and join-strategy selection for free.
  *
  * Numeric determinism vs the DuckDB oracle follows docs/DETERMINISM.md:
  * money math in DECIMAL (exact in both engines), emitted as double; full
  * tiebreak chains on every rank/top-k.
  */
object Relational extends QueryModule {

  /** TPC-H Q1 flavor: scan + filter + hash agg (partial+final) over
    * lineitem. At 100 TB this is the canonical map-side-combine query; the
    * filter and the projection are pushed into the parquet scan.
    */
  private def q01(s: SparkSession, dir: String): DataFrame =
    spread(lineitem(s, dir))
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Num.dsum(col("l_quantity")).as("sum_qty"),
        Num.dsum(col("l_extendedprice")).as("sum_base_price"),
        Num.revSum(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
        Num.dsum(col("l_discount")).as("sum_disc"),
        count(lit(1)).as("count_order"))

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** Projection + predicate pushdown: row-level arithmetic, no shuffle.
    * net_price is computed in exact decimal then emitted as double.
    */
  private def q02(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .filter(col("l_discount") >= 0.05 && col("l_quantity") < 25)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        Num.netPrice(col("l_extendedprice"), col("l_discount")).as("net_price"))

  private val q02Sql =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS net_price
      |FROM lineitem
      |WHERE l_discount >= 0.05 AND l_quantity < 25""".stripMargin

  /** TPC-H Q3 flavor: 3-way join + agg + deterministic top-k.
    * customer is the small side (broadcast at any scale where it fits;
    * at 100 TB orders⋈lineitem stays a shuffle join on l_orderkey — both
    * sides are huge — and AQE handles skew).
    */
  private def q03(s: SparkSession, dir: String): DataFrame = {
    val c = customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = orders(s, dir).filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val l = lineitem(s, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"))
      .agg(Num.revSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  private val q03Sql =
    """SELECT o_orderkey, o_orderpriority,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY o_orderkey, o_orderpriority
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 10""".stripMargin

  /** Broadcast join: part is a dimension table — broadcast() keeps the fact
    * scan shuffle-free; the agg is partial+final on p_brand.
    */
  private def q04(s: SparkSession, dir: String): DataFrame =
    spread(lineitem(s, dir))
      .join(broadcast(part(s, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        Num.dsum(col("l_extendedprice")).as("brand_revenue"),
        Num.dsum(col("l_quantity")).as("brand_qty"),
        count(lit(1)).as("n_items"))

  private val q04Sql =
    """SELECT p_brand,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS brand_revenue,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS brand_qty,
      |  count(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand""".stripMargin

  /** TPC-H Q5 flavor: 6-table join. region/nation/supplier/customer are all
    * broadcast-size dims; only orders⋈lineitem shuffles.
    */
  private def q05(s: SparkSession, dir: String): DataFrame = {
    val r = region(s, dir).filter(col("r_name") === "ASIA")
    val n = nation(s, dir)
    val c = customer(s, dir)
    val o = orders(s, dir)
    val l = lineitem(s, dir)
    val sup = supplier(s, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(c),
        col("o_custkey") === col("c_custkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(Num.revSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
  }

  private val q05Sql =
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name""".stripMargin

  /** Left-semi join (EXISTS): customers having at least one urgent order. */
  private def q06(s: SparkSession, dir: String): DataFrame = {
    val o = orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
    customer(s, dir)
      .join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  private val q06Sql =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_orderpriority = '1-URGENT')""".stripMargin

  /** Left-anti join (NOT EXISTS): customers with no high-value order.
    * c_acctbal is a raw 2-dp column, so it is emitted unrounded.
    */
  private def q07(s: SparkSession, dir: String): DataFrame = {
    val o = orders(s, dir).filter(col("o_totalprice") > 150000.0)
    customer(s, dir)
      .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
  }

  private val q07Sql =
    """SELECT c_custkey, c_name, c_acctbal
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_totalprice > 150000.0)""".stripMargin

  /** Window ranking: top-3 line items per supplier by price, fully
    * tiebroken so row_number is deterministic across engines.
    */
  private def q08(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    lineitem(s, dir)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
  }

  private val q08Sql =
    """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, rn
      |FROM (
      |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
      |    row_number() OVER (PARTITION BY l_suppkey
      |                       ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
      |  FROM lineitem)
      |WHERE rn <= 3""".stripMargin

  /** Analytic window frame: per-customer running order total. Summed in
    * exact decimal: engines are free to evaluate window aggregates in any
    * combination order (DuckDB uses segment trees), so even a
    * deterministic frame order doesn't pin a double sum's bits
    * (DETERMINISM.md rule 1).
    */
  private def q09(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .over(w).cast("double").as("running_total"))
  }

  private val q09Sql =
    """SELECT o_custkey, o_orderkey,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey
      |        ORDER BY o_orderdate, o_orderkey
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
      |FROM orders""".stripMargin

  /** Global deterministic top-k: planned as TakeOrderedAndProject — no full
    * sort, each partition keeps k rows, driver merges. Scale-safe.
    */
  private def q10(s: SparkSession, dir: String): DataFrame =
    orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  private val q10Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 10""".stripMargin

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("q01_agg_lineitem", q01, Some(q01Sql)),
    QueryDef("q02_filter_project", q02, Some(q02Sql)),
    QueryDef("q03_join_topk", q03, Some(q03Sql)),
    QueryDef("q04_broadcast_join_agg", q04, Some(q04Sql)),
    QueryDef("q05_multi_join", q05, Some(q05Sql)),
    QueryDef("q06_semi_join", q06, Some(q06Sql)),
    QueryDef("q07_anti_join", q07, Some(q07Sql)),
    QueryDef("q08_window_rank", q08, Some(q08Sql)),
    QueryDef("q09_window_running_sum", q09, Some(q09Sql)),
    QueryDef("q10_topk", q10, Some(q10Sql)),
  )
}
