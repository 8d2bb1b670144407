package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming versions of the event-table computations.
  *
  * The reference is strictly batch (SURVEY.md §2.5 — `Run` is a one-shot
  * pipeline, `/root/reference/src/mapreduce.go:344-355`), so streaming is
  * pure extension surface: the same `events` parquet drives a file-source
  * stream, and each query's batch twin (EventsQueries e02/e03) is the gold
  * result the streaming output must converge to — asserted in
  * StreamingSpec.
  *
  * At production scale the source would be Kafka/queue-backed; everything
  * from the watermark down is unchanged.
  */
object EventStream {

  /** The parquet file schema under nanosAsLong (ts is raw nanos). */
  private val rawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over the events table, ts normalized ns→µs via
    * the same helper the batch loader uses.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    // same defensive conf-set as Tables.events: the raw-long schema below
    // only reads if nanosAsLong is on
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }
    graft.core.Tables.normalizeEventTs(
      spark.readStream
        .schema(rawSchema)
        .option("maxFilesPerTrigger", "1")
        // file source requires a directory: stream the sf dir, filtered to
        // the events table file(s)
        .option("pathGlobFilter", "events*.parquet")
        .parquet(dir))
  }

  /** Tumbling 1-hour window counts/sums with a 2-hour watermark —
    * streaming twin of e02_tumbling_window. Late data beyond the watermark
    * is dropped; in append mode a window only emits once it is closed by
    * the watermark.
    */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        graft.core.Num.dsum(col("value")).as("sum_value"))
      .select(
        unix_micros(col("w.start")).as("bucket_us"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding 1-hour/30-minute window aggregation — streaming twin of
    * e06_sliding_window. Same watermark semantics as [[tumblingAgg]];
    * each event contributes to two overlapping windows.
    */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        graft.core.Num.dsum(col("value")).as("sum_value"))
      .select(
        unix_micros(col("w.start")).as("bucket_us"),
        col("event_type"), col("n"), col("sum_value"))

  /** Exactly-once ingestion dedup: duplicate event_ids (e.g. a replayed
    * source file) are dropped, with state evicted by the watermark so an
    * unbounded stream doesn't accumulate every id forever — the streaming
    * counterpart of d01's batch dedup.
    */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval self-join — the streaming twin of e05: each
    * event pairs with the same user's other events within ±5 minutes.
    * Both sides carry watermarks and the join condition bounds event
    * time, so Spark can evict join state once the watermark passes an
    * event's ±5-minute reach — bounded state on an unbounded stream (an
    * unbounded-time stream-stream join would hoard every row forever).
    */
  def intervalJoin(events: DataFrame): DataFrame = {
    val a = events.withWatermark("ts", "1 hour")
      .select(col("user_id"), col("event_id").as("eid"), col("ts").as("ta"))
    val b = events.withWatermark("ts", "1 hour")
      .select(col("user_id").as("user_b"), col("event_id").as("oid"), col("ts").as("tb"))
    a.join(b, expr(
      """user_id = user_b AND eid != oid AND
        |tb BETWEEN ta - INTERVAL 5 MINUTES AND ta + INTERVAL 5 MINUTES""".stripMargin))
      .select(col("user_id"), col("eid"), col("oid"))
  }

  // ---- stateful sessionization (flatMapGroupsWithState) ----------------

  /** ts is carried (unused by the lambda) because the watermark tag lives
    * on that column and must survive into the grouped Dataset.
    */
  case class Ev(user_id: Long, event_id: Long, ts_us: Long, ts: java.sql.Timestamp)
  case class SessionState(events: Seq[Long], lastTs: Long)
  case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
                        start_us: Long, end_us: Long)

  private val GapUs = 30L * 60 * 1000 * 1000

  /** Streaming sessionization with explicit state: a >30-min gap closes a
    * session. Streaming twin of e03_sessionize (same gap rule). Event-time
    * timeout does the two things that make this viable on an unbounded
    * stream: a session whose gap has passed the watermark is emitted
    * without waiting for the user's next event, and the quiet user's state
    * is then evicted instead of growing forever.
    */
  def sessionize(spark: SparkSession, events: DataFrame): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .withWatermark("ts", "0 seconds")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"), col("ts"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Vector[Long]), SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[Ev], state: GroupState[(Long, Vector[Long])]) =>
          if (state.hasTimedOut) {
            // the open session's gap has passed the watermark: close it.
            // Keep the advanced counter (a remove() would restart a
            // returning user at session_id 1, colliding with an emitted
            // key) — residual state shrinks to one counter per user;
            // full eviction would need memoryless ids (e.g. start_us).
            val (sessionId, open) = state.get
            state.update((sessionId + 1, Vector.empty))
            if (open.nonEmpty)
              Iterator.single(SessionOut(user, sessionId, open.size.toLong, open.head, open.last))
            else Iterator.empty
          } else {
            // batch iterator order is not guaranteed: sort by (ts, id)
            val evs = it.toVector.sortBy(e => (e.ts_us, e.event_id))
            var (nextSession, open) = state.getOption.getOrElse((1L, Vector.empty[Long]))
            val out = Vector.newBuilder[SessionOut]
            for (e <- evs) {
              if (open.nonEmpty && e.ts_us - open.last > GapUs) {
                out += SessionOut(user, nextSession, open.size.toLong, open.head, open.last)
                nextSession += 1
                open = Vector.empty
              }
              open = open :+ e.ts_us
            }
            state.update((nextSession, open))
            if (open.nonEmpty)
              state.setTimeoutTimestamp(open.last / 1000 + GapUs / 1000 + 1)
            out.result().iterator
          }
      }
  }

  case class EvT(user_id: Long, event_id: Long, event_type: String,
                 ts_us: Long, ts: java.sql.Timestamp)
  case class TransOut(src_type: String, dst_type: String)

  /** Streaming twin of e09: per-user adjacent-event bigrams, one output
    * row per transition (the spec/consumer aggregates counts). State is
    * just the user's LAST event, carried across batches so the boundary
    * transition between two batches is emitted exactly once. The carried
    * event is SORT-MERGED with the batch (not prepended), so a
    * same-timestamp tie straddling the batch boundary still emits in
    * batch e09's (ts, event_id) order. No watermark: NoTimeout state
    * needs none, and a watermark here would silently drop any event
    * below the running max instead of processing it. Deeper cross-batch
    * disorder (an event sorting before the PENULTIMATE already-emitted
    * event) is assumed away for file replay; a production source with
    * late arrivals would buffer by watermark before emitting, exactly
    * as [[sessionize]] does. That assumption is not silent: any event
    * sorting before the carried (ts_us, event_id) state — i.e. one whose
    * boundary bigram was already emitted against a later event — is
    * counted into `outOfOrder`, so divergence from batch e09 on a real
    * source is observable as a non-zero metric instead of a wrong matrix.
    */
  def transitions(spark: SparkSession, events: DataFrame,
                  outOfOrder: Option[org.apache.spark.util.LongAccumulator] = None): Dataset[TransOut] = {
    import spark.implicits._
    events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("ts"))
      .as[EvT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long, String), TransOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[EvT], state: GroupState[(Long, Long, String)]) =>
          val evs = it.map(e => (e.ts_us, e.event_id, e.event_type)).toVector
          for ((sts, sid, _) <- state.getOption; acc <- outOfOrder) {
            val late = evs.count(e => e._1 < sts || (e._1 == sts && e._2 < sid))
            if (late > 0) acc.add(late.toLong)
          }
          val seq = (state.getOption.toVector ++ evs).sortBy(e => (e._1, e._2))
          if (seq.nonEmpty) state.update(seq.last)
          seq.sliding(2).collect {
            case Vector(a, b) => TransOut(a._3, b._3)
          }.toVector.iterator
      }
  }

  case class FunnelOut(user_id: Long, first_view_us: Option[Long],
                       first_click_us: Option[Long], first_purchase_us: Option[Long])
  /** fv/fc/fp are the three funnel min-timestamps; (lastTs, lastId) is the
    * order marker the disorder metric compares against.
    */
  case class FunnelState(fv: Option[Long], fc: Option[Long], fp: Option[Long],
                         lastTs: Long, lastId: Long)

  /** Streaming twin of e08: the view → click → purchase funnel as THREE
    * MIN-TIMESTAMPS of state per user (O(1), no event buffer): first
    * view, first click at-or-after it, first purchase at-or-after that.
    * Each batch runs three STAGE-ORDERED passes (all views, then all
    * clicks, then all purchases), so every stage's threshold is
    * batch-complete before any dependent event is tested — including
    * the equal-timestamp case batch e08's value-based `ts >= fv`
    * comparison admits (a click TIED with its qualifying view counts;
    * a (ts, event_id)-ordered single pass would drop it when the click
    * sorts first). All three mins are nonincreasing over time, so the
    * row emitted whenever a user's batch arrives converges
    * monotonically — the final (equivalently, per-column min) row per
    * user IS the batch e08 row. Same in-order-arrival assumption as
    * [[transitions]], and the same observability: an event at or
    * before the carried max-(ts, event_id) marker — one whose stage
    * threshold may already have been fixed too high in an earlier
    * batch (`<=` because an equal-ts view can retro-qualify an
    * already-discarded equal-ts click) — counts into `outOfOrder`
    * instead of silently diverging; a production source would buffer
    * by watermark first, as [[sessionize]] does.
    */
  def funnel(spark: SparkSession, events: DataFrame,
             outOfOrder: Option[org.apache.spark.util.LongAccumulator] = None): Dataset[FunnelOut] = {
    import spark.implicits._
    events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("ts"))
      .as[EvT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[EvT], state: GroupState[FunnelState]) =>
          val evs = it.map(e => (e.ts_us, e.event_id, e.event_type)).toVector
          val st = state.getOption.getOrElse(
            FunnelState(None, None, None, Long.MinValue, Long.MinValue))
          for (acc <- outOfOrder) {
            val late = evs.count(_._1 <= st.lastTs)
            if (late > 0) acc.add(late.toLong)
          }
          var (fv, fc, fp) = (st.fv, st.fc, st.fp)
          for ((ts, _, t) <- evs if t == "view")
            if (fv.forall(ts < _)) fv = Some(ts)
          for ((ts, _, t) <- evs if t == "click")
            if (fv.exists(ts >= _) && fc.forall(ts < _)) fc = Some(ts)
          for ((ts, _, t) <- evs if t == "purchase")
            if (fc.exists(ts >= _) && fp.forall(ts < _)) fp = Some(ts)
          if (evs.isEmpty) Iterator.empty
          else {
            val (mts, mid, _) = evs.maxBy(e => (e._1, e._2))
            val keep = mts < st.lastTs || (mts == st.lastTs && mid < st.lastId)
            state.update(
              if (keep) FunnelState(fv, fc, fp, st.lastTs, st.lastId)
              else FunnelState(fv, fc, fp, mts, mid))
            Iterator.single(FunnelOut(user, fv, fc, fp))
          }
      }
  }

  /** Streaming twin of e01: the JSON-prop extraction is stateless (the
    * same projection the batch query runs), and the per-event-type
    * rollup is a plain streaming aggregation — state is ONE row per
    * event type (no watermark needed; the key domain, not time, bounds
    * it). Complete/update sinks read the converged snapshot.
    */
  def jsonAgg(events: DataFrame): DataFrame =
    events
      .select(
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"))

  case class AsofOut(event_id: Long, user_id: Long, last_signup_id: Option[Long])

  /** Carried as-of state: the APPLIED signup's (ts_us, event_id) — not
    * just its id — plus the (ts, event_id) order marker. Carrying the
    * signup's own event time is what lets a LATE signup (one sorting
    * before the carried signup) be recognized and contained instead of
    * silently regressing the state.
    */
  case class AsofState(sigTs: Option[Long], sigId: Option[Long],
                       lastTs: Long, lastId: Long)

  /** Streaming twin of e04: the as-of lookup (most recent signup
    * at-or-before each event, per user) carried as O(1) state — the
    * applied signup's (ts_us, event_id) plus the (ts, event_id) order
    * marker. Each batch sort-merges in (ts_us, event_id) order and emits
    * one row per event, updating the carried signup BEFORE emitting (the
    * batch window's frame includes the current row, so a signup is its
    * own as-of match). A signup OLDER than the carried applied signup
    * never replaces it (that would regress state and corrupt every
    * subsequent in-order event's match with a too-old id); it applies
    * exactly to its own emitted row (a signup is always its own as-of
    * match). Note the containment is relative to the carried SIGNUP, not
    * the order marker: a late-arriving signup that is still NEWER than
    * the carried one (sigTs < ts < lastTs) does advance the state — and
    * that is the batch-correct answer for every subsequent event. Late
    * arrivals of either kind are counted into `outOfOrder` via the
    * marker comparison. Same in-order-arrival assumption and disorder
    * accumulator as [[transitions]] for non-signup late events: an event
    * sorting before the carried marker may have been emitted against a
    * too-new signup upstream — counted, never silent; a production
    * source buffers by watermark first, as [[sessionize]] does.
    */
  def asofSignup(spark: SparkSession, events: DataFrame,
                 outOfOrder: Option[org.apache.spark.util.LongAccumulator] = None): Dataset[AsofOut] = {
    import spark.implicits._
    events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("ts"))
      .as[EvT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofState, AsofOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[EvT], state: GroupState[AsofState]) =>
          val evs = it.map(e => (e.ts_us, e.event_id, e.event_type)).toVector
            .sortBy(e => (e._1, e._2))
          val st = state.getOption.getOrElse(
            AsofState(None, None, Long.MinValue, Long.MinValue))
          for (acc <- outOfOrder) {
            val late = evs.count(e => e._1 < st.lastTs || (e._1 == st.lastTs && e._2 < st.lastId))
            if (late > 0) acc.add(late.toLong)
          }
          var (sigTs, sigId) = (st.sigTs, st.sigId)
          val out = evs.map { case (ts, id, t) =>
            if (t == "signup") {
              // only a NEWER signup advances the carried state; an older
              // (late) one matches its own row and nothing after it
              if (sigTs.forall(sts => ts > sts || (ts == sts && id > sigId.getOrElse(Long.MinValue)))) {
                sigTs = Some(ts); sigId = Some(id)
              }
              AsofOut(id, user, Some(id))
            } else AsofOut(id, user, sigId)
          }
          val (mts, mid) = evs.lastOption
            .collect { case (ts, id, _) if ts > st.lastTs || (ts == st.lastTs && id > st.lastId) => (ts, id) }
            .getOrElse((st.lastTs, st.lastId))
          state.update(AsofState(sigTs, sigId, mts, mid))
          out.iterator
      }
  }

  case class RetOut(user_id: Long, cohort_day: Long, day_offset: Long)

  /** Streaming twin of e07's per-user stage: each user's cohort is the
    * epoch day of their FIRST event, and every newly active (cohort,
    * day-offset) pair emits exactly once — the downstream
    * (cohort_day, day_offset) user count (e07's final aggregate) is then
    * a plain count over the emitted rows, one per (user, offset).
    *
    * State per user: the cohort day plus the set of offsets already
    * emitted — O(distinct active days since signup), the retention
    * horizon, NOT the event count; a production deployment bounds it
    * hard by evicting users idle past the horizon with an event-time
    * timeout, exactly as [[dailyPaths]] closes days. In-order arrival
    * fixes the cohort at the first-seen event (within a batch the
    * sort-merge makes that the true minimum); an event from BEFORE the
    * carried marker is counted into `outOfOrder`, and then processed
    * like any other: if its offset against the fixed cohort is >= 0 and
    * unseen, its pair IS emitted (correct whenever the cohort was fixed
    * right — day-level offsets are far coarser than event-level
    * disorder); only a NEGATIVE offset — an event from before the
    * recorded cohort day, i.e. the cohort itself was fixed too late —
    * is skipped, since the batch query would have re-based every offset
    * on the earlier cohort and no single emitted pair can repair that.
    */
  def retention(spark: SparkSession, events: DataFrame,
                outOfOrder: Option[org.apache.spark.util.LongAccumulator] = None): Dataset[RetOut] = {
    import spark.implicits._
    events
      .select(col("user_id"),
        graft.queries.EventsQueries.epochDay(col("ts")).as("day"),
        col("event_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"), col("ts"))
      .as[PathEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Seq[Long], Long, Long), RetOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[PathEv], state: GroupState[(Long, Seq[Long], Long, Long)]) =>
          val evs = it.map(e => (e.ts_us, e.event_id, e.day)).toVector
            .sortBy(e => (e._1, e._2))
          if (evs.isEmpty) Iterator.empty
          else {
            val st = state.getOption
            for (acc <- outOfOrder; (_, _, lts, lid) <- st) {
              val late = evs.count(e => e._1 < lts || (e._1 == lts && e._2 < lid))
              if (late > 0) acc.add(late.toLong)
            }
            val cohort = st.map(_._1).getOrElse(evs.head._3)
            var seen = st.map(_._2.toSet).getOrElse(Set.empty[Long])
            val out = Vector.newBuilder[RetOut]
            for ((_, _, d) <- evs) {
              val off = d - cohort
              if (off >= 0 && !seen(off)) {
                seen += off
                out += RetOut(user, cohort, off)
              }
            }
            val (mts, mid) = {
              val m = evs.last
              st.collect { case (_, _, lts, lid) if lts > m._1 || (lts == m._1 && lid > m._2) =>
                (lts, lid) }.getOrElse((m._1, m._2))
            }
            state.update((cohort, seen.toSeq.sorted, mts, mid))
            out.result().iterator
          }
      }
  }

  case class PathEv(user_id: Long, day: Long, event_id: Long,
                    event_type: String, ts_us: Long, ts: java.sql.Timestamp)
  case class PathOut(user_id: Long, day: Long, path: String)

  /** Streaming twin of e10's per-(user, day) path stage: the first
    * `pathLen` event types of each user-day, FINALIZED by the watermark.
    *
    * State per open (user, day) key is the bounded min-`pathLen` prefix
    * under (ts, event_id) — merging each batch keeps only the smallest
    * `pathLen` entries, so state is O(pathLen) per key no matter how many
    * events the day has, and an out-of-order event that belongs in the
    * prefix still displaces the right entry as long as it arrives before
    * the day closes. The path is emitted exactly once, when the event-
    * time timeout fires after the watermark passes the END of the day —
    * the point where the prefix can no longer change (in-watermark data
    * for that day is complete by definition); the state is then removed,
    * so closed days hold zero state. The downstream top-k (e10's second
    * stage) is a plain aggregation any sink-side batch query runs over
    * the emitted paths.
    */
  def dailyPaths(spark: SparkSession, events: DataFrame,
                 pathLen: Int = graft.queries.EventsQueries.PathLen): Dataset[PathOut] = {
    import spark.implicits._
    // day boundaries follow the SESSION timezone (same rule as the batch
    // twin, EventsQueries.epochDay); capture the zone at plan time so the
    // timeout below closes a day at ITS midnight, not UTC's — under a
    // non-UTC session a UTC-fixed (day+1)*86400000 would fire hours early,
    // truncating paths and double-emitting keys
    val zone = java.time.ZoneId.of(spark.sessionState.conf.sessionLocalTimeZone)
    events
      .withWatermark("ts", "0 seconds")
      .select(col("user_id"),
        graft.queries.EventsQueries.epochDay(col("ts")).as("day"),
        col("event_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"), col("ts"))
      .as[PathEv]
      .groupByKey(e => (e.user_id, e.day))
      .flatMapGroupsWithState[Vector[(Long, Long, String)], PathOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((user, day), it: Iterator[PathEv], state: GroupState[Vector[(Long, Long, String)]]) =>
          if (state.hasTimedOut) {
            val prefix = state.get
            state.remove()
            Iterator.single(PathOut(user, day, prefix.map(_._3).mkString(">")))
          } else {
            val merged =
              (state.getOption.getOrElse(Vector.empty) ++
                it.map(e => (e.ts_us, e.event_id, e.event_type)))
                .sortBy(t => (t._1, t._2))
                .take(pathLen)
            state.update(merged)
            // fire when the watermark passes the day boundary (in the
            // session zone); the max() guard keeps the timestamp legal if
            // this batch's events are already behind the current watermark
            val dayEndMs = java.time.LocalDate.ofEpochDay(day + 1)
              .atStartOfDay(zone).toInstant.toEpochMilli
            state.setTimeoutTimestamp(
              math.max(dayEndMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** Flush helper for tests/finite streams: emit still-open sessions from
    * the final state by running the same gap rule over a batch view.
    * (On an unbounded stream these would emit via timeout instead.)
    */
  def sessionizeBatchEquivalent(spark: SparkSession, events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > GapUs, lit(1L)).otherwise(lit(0L)))
      .withColumn("session_id", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"), min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"))
  }
}
