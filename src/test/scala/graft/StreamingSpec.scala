package graft

import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming results must converge to their batch twins (the oracle-checked
  * e02/e03 queries) once all input is processed.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("streaming tumbling window converges to the batch gold result (e02)") {
    val stream = EventStream.tumblingAgg(EventStream.readEvents(spark, dir))
    val q = stream.writeStream
      .format("memory").queryName("tumbling_out")
      .outputMode("complete")
      .start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("tumbling_out")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val want = SparkEntry.queries("e02_tumbling_window")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(want.nonEmpty)
    assert(got === want)
  }

  test("stateful sessionization (flatMapGroupsWithState) emits exactly the closed sessions") {
    val stream = EventStream.sessionize(spark, EventStream.readEvents(spark, dir))
    val q = stream.writeStream
      .format("memory").queryName("sessions_out")
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("sessions_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet

    // gold: every batch session except ones still legitimately open at
    // stream end — a user's last session whose gap timeout lies beyond the
    // final watermark (= max event time, delay 0s)
    val batch = EventStream.sessionizeBatchEquivalent(
      spark, graft.core.Tables.events(spark, dir))
    val wmMs = graft.core.Tables.events(spark, dir)
      .agg(max(unix_micros(col("ts")))).collect()(0).getLong(0) / 1000
    val lastPerUser = batch.groupBy(col("user_id"))
      .agg(max(col("session_id")).as("session_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = batch.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      // still-open iff the state's timeout timestamp (end + gap + 1, see
      // EventStream) has not been STRICTLY exceeded by the final watermark
      // — Spark fires event-time timeouts only on watermark > timestamp,
      // so the boundary case (== wmMs) is still open and must be excluded
      .filterNot(t => lastPerUser.contains((t._1, t._2)) &&
        t._5 / 1000 + 30 * 60 * 1000 + 1 >= wmMs)
      .toSet
    assert(want.nonEmpty)
    assert(got === want)
  }
}
