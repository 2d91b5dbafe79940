package graft

import java.sql.Timestamp
import graft.streaming.Sessionize
import graft.streaming.Sessionize.{Event, SessionOut}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Streaming sessionization (flatMapGroupsWithState, event-time
  * timeout) must produce exactly the sessions of the batch window-
  * function formulation — the same differential contract the judged
  * `q_sessionize` query proves against DuckDB for the batch side.
  */
class SessionizeSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // nonzero base: the initial watermark is epoch 0 and drops rows at or
  // before it, so minute 0 must not be epoch 0
  private val base = 1577836800000L // 2020-01-01
  private def ts(minutes: Long): Timestamp = new Timestamp(base + minutes * 60000L)

  test("stream sessions equal the batch formulation on the closed prefix") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = Sessionize.stream(
      input.toDS().withWatermark("ts", "0 seconds"), gapMinutes = 30)

    val query = sessions.writeStream
      .format("memory")
      .queryName("sessions_out")
      .outputMode(OutputMode.Append)
      .start()
    try {
      // user 1: two sessions (gap 45 min); user 2: one session
      input.addData(
        Event(1, ts(0)), Event(1, ts(10)), Event(1, ts(20)),
        Event(2, ts(5)))
      query.processAllAvailable()
      input.addData(
        Event(1, ts(65)), Event(1, ts(70)), // 45 min after ts(20): new session
        Event(2, ts(25)))
      query.processAllAvailable()
      // push the watermark far past every open session's gap horizon so
      // all sessions close via event-time timeout
      input.addData(Event(99, ts(100000)))
      query.processAllAvailable()
      input.addData(Event(99, ts(200000)))
      query.processAllAvailable()

      val streamed = spark.table("sessions_out")
        .as[SessionOut].collect()
        .filter(_.key != 99L)
        .map(s => (s.key, s.session_start.getTime, s.session_end.getTime, s.n_events))
        .sortBy(identity).toSeq

      val batchInput = Seq(
        (1L, ts(0)), (1L, ts(10)), (1L, ts(20)), (2L, ts(5)),
        (1L, ts(65)), (1L, ts(70)), (2L, ts(25)))
        .toDF("key", "ts").withColumn("tie", monotonically_increasing_id())
      val batched = Sessionize.batch(batchInput, "key", "ts", "tie", 30)
        .select(col("key").as[Long],
          col("session_start").cast("timestamp").as[Timestamp],
          col("session_end").cast("timestamp").as[Timestamp],
          col("n_events").as[Long])
        .collect()
        .map(r => (r._1, r._2.getTime, r._3.getTime, r._4))
        .sortBy(identity).toSeq

      assert(streamed == batched)
      assert(streamed == Seq(
        (1L, ts(0).getTime, ts(20).getTime, 3L),
        (1L, ts(65).getTime, ts(70).getTime, 2L),
        (2L, ts(5).getTime, ts(25).getTime, 2L)))
    } finally query.stop()
  }

  test("session closes inline when a later-batch event exceeds the gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = Sessionize.stream(
      input.toDS().withWatermark("ts", "0 seconds"), gapMinutes = 10)
    val query = sessions.writeStream
      .format("memory").queryName("sessions_inline")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Event(7, ts(0)), Event(7, ts(5)))
      query.processAllAvailable()
      // same key, 100 min later: the open session must close immediately
      // (no timeout needed) and a new one open
      input.addData(Event(7, ts(105)))
      query.processAllAvailable()
      val got = spark.table("sessions_inline").as[SessionOut].collect()
      assert(got.length == 1)
      assert(got.head == SessionOut(7, ts(0), ts(5), 2))
    } finally query.stop()
  }
}
