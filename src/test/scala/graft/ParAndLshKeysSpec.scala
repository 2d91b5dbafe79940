package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Focused pins for the r15 optimization internals:
  *  - [[graft.operators.Par.spread]] must be a pure physical hint —
  *    same multiset of rows, more partitions on a small input;
  *  - the native [[graft.functions.LshBandKeys]] band keys that
  *    [[graft.operators.Similarity.lshTopK]]/`lshCosinePairs` now use
  *    must be bit-identical to the packed [[Similarity.signature]] +
  *    shiftright extraction they replaced (any drift silently changes
  *    every LSH candidate set downstream).
  */
class ParAndLshKeysSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import graft.operators.{Par, PipelineParams, Similarity}

  test("Par.spread preserves the row multiset and raises partitioning") {
    val df = spark.range(0, 1000).selectExpr("id", "id % 7 AS k")
    val out = Par.spread(df)
    assert(out.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    val a = df.groupBy("k").count().collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = out.groupBy("k").count().collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b)
  }

  test("native LshBandKeys equal the packed-signature shiftright bands") {
    val sf = "/root/testdata/sf0.001"
    val e = Tables.df(spark, sf, "embeddings")
    val viaSignature = e
      .withColumn("sig", Similarity.signature("embedding"))
      .select(col("vec_id"), posexplode(expr(
        (0 until PipelineParams.LshBands).map(j =>
          s"(shiftright(sig, ${j * PipelineParams.LshRowsPerBand}) & " +
            s"${(1L << PipelineParams.LshRowsPerBand) - 1})")
          .mkString("array(", ",", ")"))).as(Seq("band", "key")))
    val viaKernel = e.select(col("vec_id"), posexplode(
      org.apache.spark.sql.GraftBridge.column(graft.functions.LshBandKeys(
        org.apache.spark.sql.GraftBridge.expression(col("embedding")),
        PipelineParams.hyperplanes, PipelineParams.LshRowsPerBand)))
      .as(Seq("band", "key")))
    val diff = viaSignature.except(viaKernel)
      .union(viaKernel.except(viaSignature))
    assert(diff.isEmpty, "band keys diverge between kernel and signature")
  }
}
