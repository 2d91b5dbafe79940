package graft

import graft.functions.Hll
import org.apache.spark.sql.GraftBridge.{column => gc, expression => ge}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mergeable HLL sketches: accuracy against exact distinct counts,
  * union-merge identity, and both estimate branches.
  */
class HllSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def sk(c: org.apache.spark.sql.Column) =
    gc(graft.functions.HllSketchAgg(ge(c.cast("string")))
      .toAggregateExpression())
  private def comb(c: org.apache.spark.sql.Column) =
    gc(graft.functions.HllCombineAgg(ge(c)).toAggregateExpression())

  private def sketchOf(ids: Seq[Long]): Array[Byte] =
    ids.toDF("v").agg(sk(col("v")).as("s")).collect()(0)
      .getAs[Array[Byte]](0)

  test("byte-path hash60 equals the hex-string definition") {
    val md = java.security.MessageDigest.getInstance("MD5")
    for (s <- (0 until 500).map("hll" + _) ++ Seq("", "hllnull", "héllo")) {
      val hex = md.digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      assert(Hll.hash60(s) == java.lang.Long.parseLong(hex, 16),
        s"hash60 diverges for '$s'")
    }
  }

  test("estimate tracks exact distinct within HLL error, both branches") {
    // small-range branch (linear counting): n << m
    for (n <- Seq(50, 200)) {
      val (_, v, est) = Hll.stats(sketchOf(1L to n.toLong))
      assert(v > 0, "small cardinality must leave zero registers")
      assert(math.abs(est - n) / n < 0.15, s"n=$n est=$est")
    }
    // raw branch: n >> 2.5m
    for (n <- Seq(5000, 20000)) {
      val (_, _, est) = Hll.stats(sketchOf(1L to n.toLong))
      // 1.04/sqrt(512) ~ 4.6% standard error; allow 4 sigma
      assert(math.abs(est - n) / n < 0.2, s"n=$n est=$est")
    }
  }

  test("merge of sketches equals the sketch of the union") {
    val a = sketchOf(1L to 3000L)
    val b = sketchOf(2000L to 6000L)
    val merged = Seq(a, b).toDF("s").agg(comb(col("s")).as("m"))
      .collect()(0).getAs[Array[Byte]](0)
    val direct = sketchOf((1L to 3000L) ++ (2000L to 6000L))
    assert(merged.toSeq == direct.toSeq,
      "register-wise max must equal the union sketch exactly")
  }

  test("streaming windowed sketches equal the batch aggregate") {
    import graft.streaming.DistinctSketch
    import graft.streaming.DistinctSketch.{In, Out}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext

    val base = 1577836800000L // 2020-01-01
    def ts(minutes: Long) = new java.sql.Timestamp(base + minutes * 60000L)
    val rows =
      (0 until 300).map(i => In(ts(i % 25), s"u${i % 40}")) ++
      (0 until 200).map(i => In(ts(30 + i % 25), s"u${i % 90}"))

    val input = MemoryStream[In]
    val q = DistinctSketch.stream(
        input.toDS().withWatermark("ts", "0 seconds"), windowMinutes = 30)
      .writeStream.format("memory").queryName("sketch_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(rows.take(300): _*)
      q.processAllAvailable()
      input.addData(rows.drop(300): _*)
      q.processAllAvailable()
      input.addData(In(ts(100000), "z")) // push watermark: close all
      q.processAllAvailable()
      input.addData(In(ts(200000), "z"))
      q.processAllAvailable()

      val streamed = spark.table("sketch_out").as[Out].collect()
        .filter(_.n_rows > 1)
        .map(o => (o.window_start.getTime, o.n_rows, o.sketch.toSeq, o.est))
        .sortBy(_._1).toSeq

      val batch = rows.toDF("ts", "value")
        .groupBy((floor(unix_millis(col("ts").cast("timestamp")) /
          lit(1800000L)).cast("long") * 1800000L).as("w"))
        .agg(count(lit(1)).as("n"), sk(col("value")).as("s"))
        .collect().map { r =>
          val (_, _, est) = Hll.stats(r.getAs[Array[Byte]]("s"))
          (r.getLong(0), r.getLong(1), r.getAs[Array[Byte]]("s").toSeq, est)
        }.sortBy(_._1).toSeq
      assert(streamed == batch,
        s"stream != batch:\n ${streamed.map(_._2)} vs ${batch.map(_._2)}")
    } finally q.stop()
  }

  test("sketch is insensitive to partitioning and duplication") {
    val base = (1L to 4000L).toDF("v")
    val s1 = base.repartition(37).agg(sk(col("v"))).collect()(0)
      .getAs[Array[Byte]](0)
    val s2 = base.union(base).repartition(3).agg(sk(col("v")))
      .collect()(0).getAs[Array[Byte]](0)
    assert(s1.toSeq == s2.toSeq)
  }
}
