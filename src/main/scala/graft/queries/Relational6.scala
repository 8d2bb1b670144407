package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sixth wave of relational surface: ordered-argument aggregates
  * (mode / max_by / min_by) expressed as single-pass struct-extrema —
  * the one-aggregation shape that replaces a window + filter at scale.
  */
object Relational6 extends QueryModule {

  /** q49: per-brand argmax/argmin/mode suite over `part` — the
    * most-frequent type (mode), the priciest part, and the cheapest
    * part, all WITHOUT a window: `max(struct(key, tiebreak))` is a
    * single hash aggregate with map-side partials, whereas the naive
    * `row_number() = 1` shape shuffles every row into a sorted window
    * partition first. At 100 TB the struct-extremum is one exchange of
    * |groups| partial rows; the window shape is one exchange of ALL
    * rows plus a per-partition sort.
    *
    * Determinism: Spark's native mode()/max_by break ties arbitrarily,
    * so every extremum here carries an explicit tiebreak inside the
    * struct — (cnt, type): larger count then lexicographically larger
    * type; (price, key): higher price then larger key for top, lower
    * price then SMALLER key for cheap (min-struct order) — matching the
    * oracle's ORDER BY ... DESC/ASC rules bit for bit.
    */
  private def q49(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
    val mode = p.groupBy(col("p_brand"), col("p_type"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("p_brand"))
      .agg(max(struct(col("cnt"), col("p_type"))).as("m"))
      .select(col("p_brand"), col("m.p_type").as("mode_type"),
        col("m.cnt").as("mode_n"))
    p.groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_parts"),
        max(struct(col("p_retailprice"), col("p_partkey"))).as("hi"),
        min(struct(col("p_retailprice"), col("p_partkey"))).as("lo"))
      .select(col("p_brand"), col("n_parts"),
        col("hi.p_partkey").as("top_partkey"),
        col("hi.p_retailprice").as("top_price"),
        col("lo.p_partkey").as("cheap_partkey"),
        col("lo.p_retailprice").as("cheap_price"))
      .join(mode, "p_brand")
  }

  private val q49Sql =
    """WITH c AS (SELECT p_brand, p_type, count(*) AS cnt FROM part GROUP BY 1, 2),
      |m AS (
      |  SELECT p_brand, p_type AS mode_type, cnt AS mode_n FROM (
      |    SELECT p_brand, p_type, cnt,
      |      row_number() OVER (PARTITION BY p_brand ORDER BY cnt DESC, p_type DESC) AS rn
      |    FROM c) WHERE rn = 1),
      |hi AS (
      |  SELECT p_brand, p_partkey AS top_partkey, p_retailprice AS top_price FROM (
      |    SELECT p_brand, p_partkey, p_retailprice,
      |      row_number() OVER (PARTITION BY p_brand
      |                         ORDER BY p_retailprice DESC, p_partkey DESC) AS rn
      |    FROM part) WHERE rn = 1),
      |lo AS (
      |  SELECT p_brand, p_partkey AS cheap_partkey, p_retailprice AS cheap_price FROM (
      |    SELECT p_brand, p_partkey, p_retailprice,
      |      row_number() OVER (PARTITION BY p_brand
      |                         ORDER BY p_retailprice ASC, p_partkey ASC) AS rn
      |    FROM part) WHERE rn = 1),
      |n AS (SELECT p_brand, count(*) AS n_parts FROM part GROUP BY 1)
      |SELECT n.p_brand, n.n_parts, m.mode_type, m.mode_n,
      |  hi.top_partkey, hi.top_price, lo.cheap_partkey, lo.cheap_price
      |FROM n JOIN m USING (p_brand) JOIN hi USING (p_brand) JOIN lo USING (p_brand)""".stripMargin

  /** q50: latest-record compaction — the CDC/SCD-1 "latest wins" shape:
    * collapse each customer's order history to the single most recent
    * row (by order date, orderkey tiebreak) plus the history length.
    * The upsert-log → current-state step every lakehouse MERGE performs;
    * expressed as ONE struct-extremum hash aggregate — the whole
    * candidate row rides inside max(struct(date, key, payload…)), so
    * compaction is one exchange of |keys| partial rows with map-side
    * combine, not a full-log window sort (the q49 scale argument, here
    * applied to whole-row argmax rather than per-column extrema).
    *
    * Determinism: (epoch-day, orderkey) is unique per customer, so the
    * trailing struct fields never participate in comparison; the date
    * is emitted as an epoch-day long (DETERMINISM.md rule 6).
    */
  private def q50(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_custkey"),
        unix_date(to_date(col("o_orderdate"))).cast("long").as("od"),
        col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        max(struct(col("od"), col("o_orderkey"), col("o_totalprice"),
          col("o_orderstatus"))).as("m"))
      .select(col("o_custkey"), col("n_orders"),
        col("m.od").as("latest_day"),
        col("m.o_orderkey").as("latest_orderkey"),
        col("m.o_totalprice").as("latest_totalprice"),
        col("m.o_orderstatus").as("latest_status"))

  private val q50Sql =
    """WITH r AS (
      |  SELECT o_custkey,
      |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS od,
      |    o_orderkey, o_totalprice, o_orderstatus,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) DESC,
      |               o_orderkey DESC) AS rn,
      |    count(*) OVER (PARTITION BY o_custkey) AS n
      |  FROM orders)
      |SELECT o_custkey, n AS n_orders, od AS latest_day,
      |  o_orderkey AS latest_orderkey, o_totalprice AS latest_totalprice,
      |  o_orderstatus AS latest_status
      |FROM r WHERE rn = 1""".stripMargin

  /** q51: keyset (cursor) pagination — the page-N-of-a-100-TB-table
    * access pattern done right: `WHERE (sort key) > cursor ORDER BY
    * sort key LIMIT page`, which plans as a pushed-down range filter +
    * distributed TakeOrderedAndProject (top-k per partition, k-merge on
    * the driver) — O(page) result work no matter how deep the cursor
    * sits. The OFFSET form a naive port would write re-scans and
    * re-sorts everything before the page (O(offset + page) per request,
    * unbounded for deep pages) and is exactly what this operator
    * replaces. Cursor = (1996-01-01, key 0); the tuple comparison is
    * decomposed as `od > c OR (od = c AND key > k)` — the equivalent
    * sargable form both engines index/prune on.
    */
  private def q51(s: SparkSession, dir: String): DataFrame = {
    val cursorDay = expr("unix_date(DATE'1996-01-01')").cast("long")
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        unix_date(to_date(col("o_orderdate"))).cast("long").as("od"))
      .filter(col("od") > cursorDay ||
        (col("od") === cursorDay && col("o_orderkey") > 0L))
      .orderBy(col("od"), col("o_orderkey"))
      .limit(20)
  }

  private val q51Sql =
    """WITH base AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice,
      |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS od
      |  FROM orders),
      |c AS (SELECT CAST(DATE '1996-01-01' - DATE '1970-01-01' AS BIGINT) AS cd)
      |SELECT o_orderkey, o_custkey, o_totalprice, od
      |FROM base, c
      |WHERE od > c.cd OR (od = c.cd AND o_orderkey > 0)
      |ORDER BY od, o_orderkey
      |LIMIT 20""".stripMargin

  /** Salt fanout from the MEASURED top-key load (p16's `x_avg` — the
    * hot key's multiple-of-average): spreading the hot key over
    * ceil(x_avg) reducers brings its per-reducer load down to ~the
    * average key's. Clamped to [1, shuffle partitions]: fanout beyond
    * the partition count buys nothing, and a uniform corpus (x_avg ≈ 1)
    * degenerates to the plain join — the adaptive behavior a constant-8
    * salt could not express (round-9 advice #8).
    */
  private[graft] def saltFor(xAvg: Double, shufflePartitions: Int): Int =
    math.min(shufflePartitions, math.max(1, math.ceil(xAvg).toInt))

  /** q52: SALTED skew join — the manual remedy for a hot join key, run
    * as a declared operator so its semantics-preservation is
    * oracle-PROVEN, not assumed: the fact side adds a row-local salt in
    * [0, salt), the (small) dimension side replicates salt× with every
    * salt value, and the join key becomes (key, salt) — a hot key
    * spreads over `salt` reducers instead of melting one. The salt
    * fanout is ADAPTIVE: the top key's measured multiple-of-average
    * load from p16's skew report ([[graft.ops.Profiling.skewReport]])
    * feeds [[saltFor]] — diagnostic and remedy composed exactly as a
    * production pipeline runs them. The oracle is the PLAIN join +
    * aggregate (no salt anywhere): the gate's hash match is the proof
    * that salting changed the partitioning and nothing else.
    *
    * When to reach for it: AQE's skew-join split covers sort-merge
    * joins automatically, but salting is the remedy that also works for
    * skewed AGGREGATION keys, for stream-stream joins (no AQE), and
    * when the skew is known ahead of planning. The salt is derived from
    * l_orderkey (uniform, stable across retries — never rand(), which
    * breaks retry determinism and the oracle). Dim replication costs
    * salt×|dim| rows — cheap exactly when the dim is broadcast-small,
    * which is also when the plain join would NOT shuffle the fact side;
    * the salted form targets the shuffle-join regime, so the dim side
    * is deliberately unhinted.
    */
  /** Measured salt per data dir, memoized: the skew-stats pass is a real
    * Spark job, and the query function is invoked once per bench sample,
    * plan-fingerprint capture and lint sweep — the statistic is a
    * property of the DATA, so it is paid once per (dir, partitions).
    * An empty report (empty/absent fact table) degrades to salt = 1
    * (the plain join) instead of throwing.
    */
  private val saltCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), Integer]()

  private def measuredSalt(s: SparkSession, dir: String): Int = {
    val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
    saltCache.computeIfAbsent((dir, parts), { _ =>
      val top = graft.ops.Profiling.skewReport(s, dir)
        .select(col("x_avg")).head(1).headOption
      Integer.valueOf(top.map(r => saltFor(r.getDouble(0), parts)).getOrElse(1))
    }).intValue()
  }

  private def q52(s: SparkSession, dir: String): DataFrame = {
    val salt = measuredSalt(s, dir)
    val li = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"),
        pmod(col("l_orderkey"), lit(salt.toLong)).as("salt"))
    val pt = Tables.part(s, dir)
      .select(col("p_partkey"), col("p_brand"))
      .crossJoin(s.range(0, salt).select(col("id").as("salt")))
    li.join(pt, col("l_partkey") === col("p_partkey") && li("salt") === pt("salt"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"),
        graft.core.Num.dsum(col("l_quantity")).as("sum_qty"),
        graft.core.Num.dsum(col("l_extendedprice")).as("sum_price"))
  }

  private val q52Sql =
    """SELECT p.p_brand, count(*) AS n_items,
      |  CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |GROUP BY 1""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q49_argmax_mode", q49, Some(q49Sql)),
    QueryDef("q50_latest_compaction", q50, Some(q50Sql)),
    QueryDef("q51_keyset_pagination", q51, Some(q51Sql)),
    QueryDef("q52_salted_skew_join", q52, Some(q52Sql)),
  )
}
