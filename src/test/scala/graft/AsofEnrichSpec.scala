package graft

import java.sql.Timestamp

import graft.streaming.AsofEnrich
import graft.streaming.AsofEnrich.{Enriched, In}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** The streaming as-of enrichment must equal the batch
  * Temporal.asofJoin on in-order input — the stream≡batch differential
  * contract every streaming operator here carries.
  */
class AsofEnrichSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val base = 1577836800000L // 2020-01-01
  private def ts(minutes: Long): Timestamp =
    new Timestamp(base + minutes * 60000L)

  test("stream enrichment equals the batch asof join on in-order input") {
    implicit val sqlCtx = spark.sqlContext
    val tol = 60L * 60000000L // 60 minutes in micros
    val input = MemoryStream[In]
    val out = AsofEnrich.stream(input.toDS(), toleranceUs = Some(tol))

    val query = out.writeStream.format("memory")
      .queryName("asof_out").outputMode(OutputMode.Append).start()
    // two batches, delivered in event-time order; covers: simultaneous
    // ref+fact (matches), ref-id tie at equal ts (higher id wins),
    // fact with no ref yet, tolerance expiry, cross-batch state carry
    val b1 = Seq(
      In(1, ts(0), 1, 100, 0.0),          // fact before any ref: no match
      In(1, ts(5), 0, 1, 1.5),
      In(1, ts(5), 0, 2, 2.5),            // tie: id 2 wins
      In(1, ts(5), 1, 101, 0.0),          // simultaneous: matches ref 2
      In(2, ts(10), 0, 3, 3.5))
    val b2 = Seq(
      In(1, ts(30), 1, 102, 0.0),         // carries ref 2 across batches
      In(2, ts(80), 1, 103, 0.0),         // ref 4 (ts 60) precedes it in
      In(2, ts(60), 0, 4, 4.5),           //   EVENT time: matches despite
      In(2, ts(90), 1, 104, 0.0),         //   arriving later in the Seq
      In(2, ts(200), 1, 105, 0.0))        // 140 min after ref 4: > tol
    try {
      input.addData(b1: _*)
      query.processAllAvailable()
      input.addData(b2: _*)
      query.processAllAvailable()
      val streamed = spark.table("asof_out").as[Enriched].collect()
        .map(e => (e.key, e.id, e.matched_id, e.matched_value))
        .sortBy(e => (e._1, e._2)).toSeq

      val all = (b1 ++ b2)
      val left = all.filter(_.side == 1)
        .map(e => (e.key, e.ts, e.id)).toDF("key", "ts", "id")
      val right = all.filter(_.side == 0)
        .map(e => (e.key, e.ts, e.id, e.value))
        .toDF("key", "rts", "rid", "rvalue")
        .select(col("key"), col("rts").as("ts"), col("rid"), col("rvalue"))
      val batch = graft.operators.Temporal.asofJoin(left, right,
          keys = Seq("key"), leftTime = "ts", rightTime = "ts",
          rightPayload = Seq("rid", "rvalue"), matchedTimeCol = "mts",
          toleranceUs = Some(tol), rightTieBreak = Seq("rid"))
        .select("key", "id", "rid", "rvalue").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Double])))
        .sortBy(e => (e._1, e._2)).toSeq

      assert(streamed == batch,
        s"stream != batch:\n stream=$streamed\n batch=$batch")
      // the hand-expected shape, pinned explicitly
      assert(streamed == Seq(
        (1L, 100L, None, None),
        (1L, 101L, Some(2L), Some(2.5)),
        (1L, 102L, Some(2L), Some(2.5)),
        (2L, 103L, Some(4L), Some(4.5)),
        (2L, 104L, Some(4L), Some(4.5)),
        (2L, 105L, None, None)))
    } finally query.stop()
  }

  test("toUs floors pre-1970 timestamps like unix_micros") {
    import graft.streaming.AsofEnrich.{toTs, toUs}
    // -1 ms = 1969-12-31 23:59:59.999: getTime = -1, nanos = 999000000.
    // unix_micros = -1000; a truncating getTime/1000 would give 999000
    val t = new java.sql.Timestamp(-1L)
    assert(toUs(t) == -1000L, s"got ${toUs(t)}")
    // round-trip + agreement with Spark's own unix_micros on a sweep
    // of negative and positive epoch offsets with sub-ms precision
    import spark.implicits._
    val samples = Seq(-1L, -999L, -1000L, -86400000L + 123L, 0L, 1L,
      999L, 86400000L + 456L)
    val ts = samples.map { ms =>
      val t = new java.sql.Timestamp(ms)
      t.setNanos(((Math.floorMod(ms, 1000L)) * 1000000L + 789000L).toInt)
      t
    }
    val sparkUs = ts.toDF("t")
      .select(org.apache.spark.sql.functions.unix_micros(org.apache.spark
        .sql.functions.col("t")))
      .collect().map(_.getLong(0)).toSeq
    assert(ts.map(toUs) == sparkUs)
    ts.foreach(t => assert(toTs(toUs(t)) == t))
  }
}
