package graft.streaming

import graft.queries.{QueryDef, QueryModule}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Gate (DuckDB-oracle) entries for streaming twins whose FINALIZED
  * output is batch-expressible.
  *
  * The twins run append-mode with a watermark, so by stream end they have
  * emitted exactly the windows/days the final watermark CLOSED — a
  * deterministic set: the final watermark is `max(event time) - delay`
  * regardless of how the file source batched the input. That makes the
  * finalized output an ANSI-SQL-expressible function of the events table
  * (the batch twin's aggregation plus a closed-under-watermark
  * predicate), which moves the streaming convergence property from
  * ScalaTest-only into the driver's row/schema/hash-matched gate.
  *
  * Each query here RUNS a bounded stream to completion (memory sink,
  * `processAllAvailable`) and returns the sink table. That is the honest
  * cost of the operator — the gate and bench both see the stream
  * actually execute, state, watermark and all. The gate readers ingest
  * ALL available files in the first batch (readEventsWith(None)): with
  * no intermediate watermark, no row can be discarded as late mid-
  * stream, so the finalized set depends on the data alone and the
  * oracles stay correct under any file layout the driver generates
  * (the multi-batch/late-arrival behavior is separately exercised by
  * the StreamingSpec replay harnesses).
  *
  * Watermark arithmetic mirrored in the oracles: Spark tracks event-time
  * stats in MILLISECONDS (each row contributes `ts_us DIV 1000`), so the
  * final watermark is `(max(epoch_us(ts)) // 1000 - delay_ms)` ms. A
  * tumbling window is emitted once `window.end <= watermark`; a
  * flatMapGroupsWithState day closes when its event-time timeout at the
  * day's end millisecond fires, i.e. `watermark > (day+1)*86400000`
  * (strict — the same predicate StreamingSpec pins against the twin).
  */
object StreamingGate extends QueryModule {

  /** Run a (bounded) streaming frame to completion into a memory sink
    * and return the sink's table. The temp view is dropped first so
    * re-runs in one session (bench cold + warm samples) don't collide.
    */
  private def runToTable(s: SparkSession, name: String)(out: => DataFrame): DataFrame = {
    try s.catalog.dropTempView(name) catch { case _: Throwable => () }
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    s.table(name)
  }

  /** es02: the e02 tumbling-window twin's finalized (closed-window)
    * output — EventStream.tumblingAgg in append mode, 2 h watermark.
    */
  private def es02(s: SparkSession, dir: String): DataFrame =
    runToTable(s, "es02_sink") {
      EventStream.tumblingAgg(EventStream.readEventsWith(s, dir, maxFilesPerTrigger = None))
    }

  private val es02Sql =
    """WITH wm AS (
      |  SELECT (epoch_us(max(ts)) // 1000 - 7200000) * 1000 AS wm_us FROM events)
      |SELECT epoch_us(date_trunc('hour', ts)) AS bucket_us, event_type,
      |  count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events, wm
      |WHERE epoch_us(date_trunc('hour', ts)) + 3600000000 <= wm.wm_us
      |GROUP BY 1, 2, wm.wm_us""".stripMargin

  /** es10: the e10 daily-paths twin's finalized (closed-day) output —
    * EventStream.dailyPaths in append mode, 0 s watermark delay, one
    * (user_id, day, path) row per day the final watermark passed.
    */
  private def es10(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    runToTable(s, "es10_sink") {
      EventStream.dailyPaths(s, EventStream.readEventsWith(s, dir, maxFilesPerTrigger = None))
        .select(col("user_id"), col("day"), col("path"))
    }
  }

  private val es10Sql =
    s"""WITH wm AS (SELECT epoch_us(max(ts)) // 1000 AS wm_ms FROM events),
       |ev AS (
       |  SELECT user_id, CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day, event_type,
       |    row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
       |                       ORDER BY epoch_us(ts), event_id) AS rn
       |  FROM events)
       |SELECT user_id, day, string_agg(event_type, '>' ORDER BY rn) AS path
       |FROM ev, wm
       |WHERE rn <= ${graft.queries.EventsQueries.PathLen}
       |  AND (day + 1) * 86400000 < wm.wm_ms
       |GROUP BY 1, 2, wm.wm_ms""".stripMargin

  /** es03: the e03 sessionize twin's finalized (closed-session) output —
    * EventStream.sessionize in append mode, 0 s watermark delay. A
    * session is closed either by the user's next event arriving more
    * than the 30-min gap later (then the batch rule splits there too) or
    * by its event-time timeout at `end + gap + 1 ms` firing, which needs
    * the final watermark STRICTLY past it. So the closed set is every
    * batch session except a user's LAST one whose timeout the watermark
    * has not strictly exceeded — the same predicate StreamingSpec pins.
    */
  private def es03(s: SparkSession, dir: String): DataFrame =
    runToTable(s, "es03_sink") {
      EventStream.sessionize(s, EventStream.readEventsWith(s, dir, maxFilesPerTrigger = None)).toDF()
    }

  private val es03Sql =
    """WITH wm AS (SELECT epoch_us(max(ts)) // 1000 AS wm_ms FROM events),
      |t AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
      |  FROM events),
      |s AS (
      |  SELECT user_id, event_id, ts_us,
      |    CAST(sum(CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM t),
      |sess AS (
      |  SELECT user_id, session_id, count(*) AS n_events,
      |    min(ts_us) AS start_us, max(ts_us) AS end_us,
      |    max(session_id) OVER (PARTITION BY user_id) AS last_sid
      |  FROM s GROUP BY user_id, session_id)
      |SELECT user_id, session_id, n_events, start_us, end_us
      |FROM sess, wm
      |WHERE NOT (session_id = last_sid AND end_us // 1000 + 1800001 >= wm.wm_ms)""".stripMargin

  /** es07: the e07 retention twin's finalized (user, cohort, offset)
    * pairs — EventStream.retention in append mode, 2 h watermark. The
    * buffered harness finalizes exactly the events strictly below the
    * final watermark (`ts_us < wm_ms * 1000`); over that subset the
    * cohort is the user's min day and every distinct (cohort, day)
    * activity pair emits once — a plain SQL function of the finalized
    * event set.
    */
  private def es07(s: SparkSession, dir: String): DataFrame =
    runToTable(s, "es07_sink") {
      EventStream.retention(s,
        EventStream.readEventsWith(s, dir, maxFilesPerTrigger = None)).toDF()
    }

  private val es07Sql =
    """WITH wm AS (SELECT epoch_us(max(ts)) // 1000 - 7200000 AS wm_ms FROM events),
      |fin AS (
      |  SELECT user_id, CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day
      |  FROM events, wm WHERE epoch_us(ts) < wm.wm_ms * 1000),
      |coh AS (SELECT user_id, min(day) AS cohort_day FROM fin GROUP BY 1)
      |SELECT DISTINCT f.user_id, c.cohort_day, f.day - c.cohort_day AS day_offset
      |FROM fin f JOIN coh c USING (user_id)""".stripMargin

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("es02_tumbling_closed", es02, Some(es02Sql)),
    QueryDef("es03_sessions_closed", es03, Some(es03Sql)),
    QueryDef("es07_retention_closed", es07, Some(es07Sql)),
    QueryDef("es10_daily_paths_closed", es10, Some(es10Sql)),
  )
}
