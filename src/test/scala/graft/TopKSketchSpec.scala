package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming windowed heavy hitters (streaming/TopKSketch): per
  * event-time window one k-entry Misra–Gries table of state, closed
  * once on watermark; with k ≥ distinct items the counts are exact and
  * the stream equals the batch `approx_top_items` over the same rows.
  */
class TopKSketchSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("stream equals batch approx_top_items per closed window") {
    import graft.streaming.TopKSketch
    import graft.streaming.TopKSketch.{In, Out}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext

    val base = 1577836800000L // 2020-01-01
    def ts(minutes: Long) = new java.sql.Timestamp(base + minutes * 60000L)
    val types = Seq("view", "click", "purchase", "error", "scroll")
    val rows =
      (0 until 300).map(i => In(ts(i % 25), types(i % 5))) ++
      (0 until 200).map(i => In(ts(30 + i % 25), types(i * 3 % 5))) ++
      Seq(In(ts(40), null)) // null skips the counter, counts the row

    val input = MemoryStream[In]
    val q = graft.streaming.TopKSketch.stream(
        input.toDS().withWatermark("ts", "0 seconds"),
        windowMinutes = 30, k = 16)
      .writeStream.format("memory").queryName("topk_out")
      .outputMode(OutputMode.Append).start()
    try {
      // split at the window boundary: batch 1 carries only window-1
      // rows, so the 0s watermark (max event time = minute 24) stays
      // BELOW window 2 and its rows aren't late-dropped on arrival
      input.addData(rows.take(300): _*)
      q.processAllAvailable()
      input.addData(rows.drop(300): _*)
      q.processAllAvailable()
      input.addData(In(ts(100000), "z")) // push watermark: close all
      q.processAllAvailable()
      input.addData(In(ts(200000), "z"))
      q.processAllAvailable()

      val streamed = spark.table("topk_out").as[Out].collect()
        .filter(_.n_rows > 1)
        .map(o => (o.window_start.getTime, o.n_rows,
          o.items.map(i => (i.item, i.count))))
        .sortBy(_._1).toSeq

      // batch twin: same floor-window keying, approx_top_items with
      // the same k (>= distinct, so exact), same row counting
      def topk(c: org.apache.spark.sql.Column) =
        org.apache.spark.sql.GraftBridge.column(
          graft.functions.ApproxTopKAgg(
            org.apache.spark.sql.GraftBridge.expression(c),
            16).toAggregateExpression())
      val batch = rows.toDF("ts", "item")
        .groupBy((floor(unix_millis(col("ts").cast("timestamp")) /
          lit(1800000L)).cast("long") * 1800000L).as("w"))
        .agg(count(lit(1)).as("n"), topk(col("item")).as("tk"))
        .collect().map { r =>
          (r.getLong(0), r.getLong(1),
            r.getSeq[org.apache.spark.sql.Row](2)
              .map(x => (x.getString(0), x.getLong(1))))
        }.sortBy(_._1).toSeq
      assert(streamed == batch,
        s"stream != batch:\n $streamed\n vs\n $batch")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("small k keeps the Misra-Gries sub-n/(k+1) guarantee") {
    import graft.streaming.TopKSketch.{In, Out}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val base = 1577836800000L
    def ts(minutes: Long) = new java.sql.Timestamp(base + minutes * 60000L)
    // zipf-ish single window: "hot" dominates, long tail of singletons
    val rows = (0 until 600).map(i => In(ts(i % 20),
      if (i % 3 != 2) "hot" else s"tail${i}"))
    val truth = rows.groupBy(_.item).map { case (k, v) => k -> v.size.toLong }
    val n = rows.size.toLong

    val input = MemoryStream[In]
    val q = graft.streaming.TopKSketch.stream(
        input.toDS().withWatermark("ts", "0 seconds"),
        windowMinutes = 30, k = 4)
      .writeStream.format("memory").queryName("topk_small")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      input.addData(In(ts(100000), "z"))
      q.processAllAvailable()
      input.addData(In(ts(200000), "z"))
      q.processAllAvailable()
      val out = spark.table("topk_small").as[Out].collect()
        .filter(_.n_rows > 1)
      assert(out.length == 1)
      val got = out(0).items.map(i => i.item -> i.count).toMap
      // every frequent item (true count > n/(k+1)) must surface
      val bound = n / 5
      truth.filter(_._2 > bound).keys.foreach { k =>
        assert(got.contains(k), s"frequent item $k missing: $got")
      }
      // every reported count undercounts by at most n/(k+1)
      got.foreach { case (k, c) =>
        val t = truth.getOrElse(k, 0L)
        assert(c <= t && t - c <= bound, s"$k: sketch $c vs true $t")
      }
    } finally q.stop()
  }
}
