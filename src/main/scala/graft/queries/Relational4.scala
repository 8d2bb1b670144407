package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fourth wave of relational surface: lateral/generator output with
  * ordinality, ordered string aggregation, and null-semantics scalars.
  */
object Relational4 extends QueryModule {

  /** q32: lateral positional explode — each document's first 5 tokens
    * WITH their ordinal (generator + ordinality, the LATERAL UNNEST
    * surface; wc01's explode is the position-less special case).
    * Generate runs inside whole-stage codegen; no shuffle at all.
    */
  private def q32(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      posexplode(slice(filter(split(col("text"), " "), w => length(w) > 0), 1, 5))
        .as(Seq("pos0", "tok")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"), col("tok"))

  private val q32Sql =
    """SELECT doc_id, CAST(x.i AS BIGINT) AS pos, d.w[x.i] AS tok
      |FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> len(t) > 0) AS w
      |      FROM documents) d,
      |  LATERAL (SELECT unnest(range(1, least(coalesce(len(d.w), 0), 5) + 1)) AS i) x""".stripMargin
  // coalesce: DuckDB's least() IGNORES a NULL argument (returns 5 for
  // NULL text) while Spark's generator emits nothing — without the guard
  // a NULL text row would diverge

  /** q33: ordered string aggregation (LISTAGG / string_agg) — top-bal
    * customer names per nation, comma-joined in deterministic name
    * order. Spark's collect_list is order-nondeterministic across
    * retries/partitions, so the canonical scalable form is
    * array_join(array_sort(collect_list(...))) — sort on the FINISHED
    * per-group array, not the input — mirrored by DuckDB's
    * string_agg(... ORDER BY ...).
    */
  private def q33(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).filter(col("c_acctbal") > 9000)
    cust.join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_rich"),
        array_join(array_sort(collect_list(col("c_name"))), ",").as("names"))
  }

  private val q33Sql =
    """SELECT n_name, count(*) AS n_rich,
      |  string_agg(c_name, ',' ORDER BY c_name) AS names
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |WHERE c_acctbal > 9000
      |GROUP BY n_name""".stripMargin

  /** q34: null-semantics scalars — NULLIF carving nulls out of a dense
    * column, COALESCE restoring them, and the COUNT(*) / COUNT(col) /
    * COUNT(DISTINCT col) distinctions over the result. The whole query
    * is one partial+final hash aggregate.
    */
  private def q34(s: SparkSession, dir: String): DataFrame = {
    val rf = nullif(col("l_returnflag"), lit("N"))
    val base = Tables.lineitem(s, dir)
      .select(col("l_linestatus"), rf.as("rf"), col("l_quantity"))
    // one distinct column per aggregate (rf here, coalesce(rf) below):
    // both distincts in one agg would Expand every row 3x through every
    // buffer (ScaleLint flags the shape) — split, each plans as the
    // plain two-phase distinct, and the tiny per-status results
    // broadcast-join back
    val main = base.groupBy(col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("rf")).as("n_flagged"),
        count_distinct(col("rf")).as("n_flags"),
        // exact decimal sum + floor so the double→integer rounding rule is
        // pinned on both engines (Spark casts double→long by truncation,
        // DuckDB by round-to-nearest — DETERMINISM.md rule 1)
        floor(sum(when(col("rf").isNull,
          col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 2)))))
          .cast("long").as("qty_unflagged"))
    val all = base.groupBy(col("l_linestatus"))
      .agg(count_distinct(coalesce(col("rf"), lit("N"))).as("n_flags_all"))
      .withColumnRenamed("l_linestatus", "ls2")
    // null-safe join for the same reason as q11: a NULL group key must
    // survive the recombination exactly as the oracle's GROUP BY keeps it
    main.join(broadcast(all), col("l_linestatus") <=> col("ls2"))
      .select(col("l_linestatus"), col("n_rows"), col("n_flagged"),
        col("n_flags"), col("n_flags_all"), col("qty_unflagged"))
  }

  private val q34Sql =
    """SELECT l_linestatus,
      |  count(*) AS n_rows,
      |  count(nullif(l_returnflag, 'N')) AS n_flagged,
      |  count(DISTINCT nullif(l_returnflag, 'N')) AS n_flags,
      |  count(DISTINCT coalesce(nullif(l_returnflag, 'N'), 'N')) AS n_flags_all,
      |  CAST(floor(sum(CASE WHEN nullif(l_returnflag, 'N') IS NULL THEN CAST(l_quantity AS DECIMAL(18,2)) END)) AS BIGINT) AS qty_unflagged
      |FROM lineitem
      |GROUP BY l_linestatus""".stripMargin

  /** q35: RANGE-interval window frame — per-customer trailing-30-day
    * spend at each order. The frame is defined on VALUES of the sort key
    * (epoch days), not row counts: same-day peer orders are always all
    * in-frame, so the result is order-insensitive within ties
    * (deterministic without a full tiebreak chain). Money through the
    * decimal path (DETERMINISM.md rule 1); partitioned window — no
    * global sort.
    */
  private def q35(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("day"))
      .rangeBetween(-30, 0)
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        // o_orderdate is TIMESTAMP_NTZ: go through DATE (timezone-free)
        expr("datediff(cast(o_orderdate as date), date'1970-01-01')").cast("long").as("day"),
        col("o_totalprice"))
      .withColumn("spend_30d",
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .over(w).cast("double"))
      .drop("o_totalprice")
  }

  private val q35Sql =
    """SELECT o_orderkey, o_custkey, day,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY day
      |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_30d
      |FROM (SELECT o_orderkey, o_custkey,
      |        datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day,
      |        o_totalprice
      |      FROM orders)""".stripMargin

  /** q36: explicit NULL ordering — the classic cross-engine trap: Spark's
    * default is NULLS FIRST for ASC / NULLS LAST for DESC, DuckDB's is
    * the opposite, so every oracle-checked ORDER BY over nullable keys
    * must pin placement explicitly. This query pins DESC NULLS FIRST on
    * a NULLIF-carved column and takes the per-group head, putting the
    * null rows in the OUTPUT where silent divergence would flip the hash.
    *
    * Plan shape: `l_linestatus` has TWO values, so the natural
    * `row_number().over(partitionBy(status))` window sorts the entire
    * table inside two partitions — benched at 2.9 s at sf0.1 and a
    * non-starter at 100 TB. Instead the whole ORDER BY (null placement,
    * DESC direction, tiebreaks) is ENCODED into an ascending long tuple
    * — rf DESC NULLS FIRST becomes class 0/1/2 — and a bounded
    * [[graft.functions.BottomKTuples]] Aggregator takes the per-group
    * head through partial+final hash aggregation: each input partition
    * ships ≤5 rows per group, no global sort exists, and the result is
    * provably the window form's (the encoding is order-isomorphic).
    */
  private def q36(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // rf DESC NULLS FIRST == ascending class: null(was 'N') → 0, 'R' → 1,
    // 'A' → 2. The encoding is order-isomorphic ONLY on the {A, N, R}
    // domain (which p08's returnflag_in_domain constraint validates), so
    // an out-of-domain value fails LOUDLY here instead of silently
    // mis-sorting and re-emitting as 'A'.
    val cls = when(col("l_returnflag") === "N", 0L)
      .when(col("l_returnflag") === "R", 1L)
      .when(col("l_returnflag") === "A", 2L)
      .otherwise(raise_error(concat(
        lit("q36: l_returnflag outside the encoded {A,N,R} domain: "),
        col("l_returnflag"))).cast("long"))
    Tables.lineitem(s, dir)
      .select(col("l_linestatus"), cls.as("k1"),
        col("l_orderkey").as("k2"), col("l_linenumber").as("k3"))
      .as[(String, Long, Long, Long)]
      .groupByKey(_._1)
      .mapValues(t => graft.functions.TupRow(t._2, t._3, t._4))
      .agg(new graft.functions.BottomKTuples(5).toColumn.name("top"))
      .flatMap { case (st, top) =>
        top.items.iterator.zipWithIndex.map { case (t, i) =>
          (st, t.k2, t.k3, t.k1, (i + 1).toLong)
        }
      }
      .toDF("l_linestatus", "l_orderkey", "l_linenumber", "cls", "rk")
      .select(col("l_linestatus"), col("l_orderkey"), col("l_linenumber"),
        when(col("cls") === 1L, "R").when(col("cls") === 2L, "A").as("rf"),
        col("rk"))
  }

  private val q36Sql =
    """SELECT l_linestatus, l_orderkey, l_linenumber, rf, rk FROM (
      |  SELECT l_linestatus, l_orderkey, l_linenumber,
      |    nullif(l_returnflag, 'N') AS rf,
      |    CAST(row_number() OVER (PARTITION BY l_linestatus
      |      ORDER BY nullif(l_returnflag, 'N') DESC NULLS FIRST,
      |        l_orderkey, l_linenumber) AS BIGINT) AS rk
      |  FROM lineitem)
      |WHERE rk <= 5""".stripMargin

  /** q37: FULL OUTER join — the outer-join variant q30 (left) doesn't
    * cover, with both sides deliberately filtered to create unmatched
    * rows in BOTH directions and null-flag columns putting the outer
    * semantics in the hashed output.
    */
  private def q37(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey"), col("c_mktsegment"))
    val ords = Tables.orders(s, dir).filter(col("o_custkey") % 3 =!= 1)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
    cust.join(ords, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_mktsegment").as("segment"),
        coalesce(col("cnt"), lit(0L)).as("n_orders"),
        col("c_custkey").isNull.cast("long").as("cust_missing"),
        col("o_custkey").isNull.cast("long").as("orders_missing"))
  }

  private val q37Sql =
    """SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
      |  c.c_mktsegment AS segment,
      |  coalesce(o.cnt, 0) AS n_orders,
      |  CAST(c.c_custkey IS NULL AS BIGINT) AS cust_missing,
      |  CAST(o.o_custkey IS NULL AS BIGINT) AS orders_missing
      |FROM (SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 3 = 0) c
      |FULL OUTER JOIN (SELECT o_custkey, count(*) AS cnt FROM orders
      |                 WHERE o_custkey % 3 <> 1 GROUP BY 1) o
      |ON c.c_custkey = o.o_custkey""".stripMargin

  /** q38: schema-evolution union — two sources with overlapping but
    * different column sets merged BY NAME with null fill
    * (`unionByName(allowMissingColumns)`, the ingest shape when a feed
    * adds or drops columns mid-stream), null-count audit per column in
    * the output. DuckDB mirrors with UNION ALL BY NAME.
    */
  private def q38(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val oldFeed = o.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    val newFeed = o.filter(col("o_orderkey") % 2 =!= 0)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderstatus"))
    oldFeed.unionByName(newFeed, allowMissingColumns = true)
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("o_totalprice").isNull.cast("long")).as("n_null_price"),
        sum(col("o_orderpriority").isNull.cast("long")).as("n_null_priority"))
  }

  private val q38Sql =
    """SELECT o_orderstatus, count(*) AS n_rows,
      |  CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_price,
      |  CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_priority
      |FROM (
      |  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders WHERE o_orderkey % 2 = 0
      |  UNION ALL BY NAME
      |  SELECT o_orderkey, o_orderpriority, o_orderstatus FROM orders WHERE o_orderkey % 2 <> 0)
      |GROUP BY 1""".stripMargin

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("q32_lateral_explode", q32, Some(q32Sql)),
    QueryDef("q35_range_frame", q35, Some(q35Sql)),
    QueryDef("q36_null_ordering", q36, Some(q36Sql)),
    QueryDef("q37_full_outer_join", q37, Some(q37Sql)),
    QueryDef("q38_union_by_name", q38, Some(q38Sql)),
    QueryDef("q33_string_agg", q33, Some(q33Sql)),
    QueryDef("q34_null_handling", q34, Some(q34Sql)),
  )
}
