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

  test("sketch is insensitive to partitioning and duplication") {
    val base = (1L to 4000L).toDF("v")
    val s1 = base.repartition(37).agg(sk(col("v"))).collect()(0)
      .getAs[Array[Byte]](0)
    val s2 = base.union(base).repartition(3).agg(sk(col("v")))
      .collect()(0).getAs[Array[Byte]](0)
    assert(s1.toSeq == s2.toSeq)
  }
}
