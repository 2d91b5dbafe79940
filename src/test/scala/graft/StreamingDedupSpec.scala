package graft

import java.sql.Timestamp
import graft.streaming.StreamingDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Streaming first-writer-wins dedup must keep exactly the rows the
  * batch formulation keeps when the stream arrives in id order, and
  * the watermarked variant must expire its state (a duplicate past the
  * horizon is kept again).
  */
class StreamingDedupSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val base = 1577836800000L // 2020-01-01; watermark 0 drops epoch-0 rows
  private def ts(minutes: Long): Timestamp = new Timestamp(base + minutes * 60000L)

  test("stream keeps exactly the batch twin's rows when fed in id order") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (0L, "alpha beta gamma"), (1L, "delta epsilon"),
      (2L, "Alpha  beta   GAMMA"), // normalizes to doc 0's fingerprint
      (3L, "zeta"), (4L, "delta epsilon"), (5L, "eta theta"))

    val input = MemoryStream[(Long, String)]
    val kept = StreamingDedup.exact(
      input.toDF().toDF("doc_id", "text"), "text")
    val query = kept.writeStream
      .format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      // one batch per doc so arrival order is exactly id order
      docs.foreach { d => input.addData(d); query.processAllAvailable() }

      val streamed = spark.table("dedup_out")
        .select("doc_id").as[Long].collect().sorted.toSeq
      val batch = StreamingDedup.batchTwin(
          docs.toDF("doc_id", "text"), "doc_id", "text")
        .select("doc_id").as[Long].collect().sorted.toSeq

      assert(streamed == batch)
      assert(streamed == Seq(0L, 1L, 3L, 5L))
    } finally query.stop()
  }

  test("watermarked state expires: far-future duplicate is kept again") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val kept = StreamingDedup.exactWithinWatermark(
      input.toDF().toDF("doc_id", "text", "ts"), "text", "ts", "10 minutes")
    val query = kept.writeStream
      .format("memory").queryName("dedup_wm_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((0L, "alpha beta", ts(0)))
      query.processAllAvailable()
      // inside the horizon: suppressed
      input.addData((1L, "alpha beta", ts(5)))
      query.processAllAvailable()
      // advance the watermark far past the horizon, expiring the state
      input.addData((2L, "other doc", ts(1000)))
      query.processAllAvailable()
      // same fingerprint, but its state expired: kept again
      input.addData((3L, "alpha beta", ts(1005)))
      query.processAllAvailable()

      val ids = spark.table("dedup_wm_out")
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(ids == Seq(0L, 2L, 3L))
    } finally query.stop()
  }

  test("stateless ML gate composes into the streaming ingest: twin of batch gate+dedup") {
    // Classifier.keepRule is a pure per-row predicate, so the quality
    // gate slots into a streaming pipeline ahead of the stateful dedup
    // with no new state store — and must keep exactly the docs the
    // batch composition keeps
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.df(spark, "/root/testdata/sf0.001", "documents")
      .limit(40).select("doc_id", "text")
      .as[(Long, String)].collect().toSeq.sortBy(_._1)

    val input = MemoryStream[(Long, String)]
    val gated = input.toDF().toDF("doc_id", "text")
      .withColumn("__ws", split(lower(col("text")), " "))
      .filter(graft.operators.Classifier.keepRule("__ws"))
      .drop("__ws")
    val kept = StreamingDedup.exact(gated, "text")
    val query = kept.writeStream
      .format("memory").queryName("gate_dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      docs.foreach { d => input.addData(d); query.processAllAvailable() }
      val streamed = spark.table("gate_dedup_out")
        .select("doc_id").as[Long].collect().sorted.toSeq
      val batch = StreamingDedup.batchTwin(
          docs.toDF("doc_id", "text")
            .withColumn("__ws", split(lower(col("text")), " "))
            .filter(graft.operators.Classifier.keepRule("__ws"))
            .drop("__ws"),
          "doc_id", "text")
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(streamed == batch)
      assert(streamed.nonEmpty && streamed.size < docs.size,
        s"degenerate gate: ${streamed.size}/${docs.size}")
    } finally query.stop()
  }

  test("stateless perplexity gate composes into streaming ingest: twin of batch") {
    // LangModel.scoreLocal folds the backoff score per row with the
    // bounded model inside the expression — no join, no state store —
    // so the CCNet-style gate runs at ingest time and must keep
    // exactly the batch composition's docs
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.LangModel
    val fixture = Tables.df(spark, "/root/testdata/sf0.001", "documents")
    val model = LangModel.collectModel(
      LangModel.trainBackoff(fixture, "text"))
    val docs = fixture.limit(40).select("doc_id", "text")
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    // τ = the batch median average log-prob, so the gate splits the set
    val avgs = docs.toDF("doc_id", "text")
      .withColumn("sc", LangModel.scoreLocal(col("text"), model))
      .filter(col("sc.n_scored") > 0)
      .select((col("sc.logprob_u").cast("double") / col("sc.n_scored"))
        .as("a")).as[Double].collect().sorted
    val tau = avgs(avgs.length / 2)
    def gate(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("sc", LangModel.scoreLocal(col("text"), model))
      .filter(col("sc.n_scored") > 0 &&
        col("sc.logprob_u").cast("double") / col("sc.n_scored") >= tau)
      .drop("sc")

    val input = MemoryStream[(Long, String)]
    val kept = StreamingDedup.exact(
      gate(input.toDF().toDF("doc_id", "text")), "text")
    val query = kept.writeStream
      .format("memory").queryName("ppl_gate_out")
      .outputMode(OutputMode.Append).start()
    try {
      docs.foreach { d => input.addData(d); query.processAllAvailable() }
      val streamed = spark.table("ppl_gate_out")
        .select("doc_id").as[Long].collect().sorted.toSeq
      val batch = StreamingDedup.batchTwin(
          gate(docs.toDF("doc_id", "text")), "doc_id", "text")
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(streamed == batch)
      assert(streamed.nonEmpty && streamed.size < docs.size,
        s"degenerate gate: ${streamed.size}/${docs.size}")
    } finally query.stop()
  }
}
