package graft

import graft.operators._
import org.scalatest.funsuite.AnyFunSuite

/** Scratch probe for SCALE.md (run manually, not part of CI). */
class ScaleProbeSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  test("time fixed vs auto LSH pairs at sf1", org.scalatest.Tag("probe")) {
    assume(sys.env.contains("GRAFT_SCALE_PROBE"))
    val dir = sys.env.getOrElse("GRAFT_SCALE_PROBE", "/tmp/testdata-sf1")
    val e = Tables.df(spark, dir, "embeddings")
    val n = e.count()
    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = body
      println(f"PROBE $label n=$n pairs=$c t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val (bands, rows) = Similarity.lshAutoParams(n)
    println(s"PROBE auto shape: bands=$bands rows=$rows")
    time("auto") {
      Similarity.lshCosinePairsScaled(e, "vec_id", "embedding",
        PipelineParams.CosineNearDup, bands, rows).count()
    }
    time("fixed4x4") {
      Similarity.lshCosinePairs(e, "vec_id", "embedding").count()
    }
  }

  test("time round-8 text ops at sf1", org.scalatest.Tag("probe")) {
    assume(sys.env.contains("GRAFT_SCALE_PROBE"))
    val dir = sys.env.getOrElse("GRAFT_SCALE_PROBE", "/tmp/testdata-sf1")
    import org.apache.spark.sql.functions._
    val d = Tables.df(spark, dir, "documents")
    // noop-write, not count(): count() lets Catalyst prune the
    // reassembly projections and times an emptier plan
    def time(label: String)(body: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      body.write.format("noop").mode("overwrite").save()
      println(f"PROBE $label t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("dedup-lines") {
      val withLines = d.withColumn("ws", TextOps.words(col("text")))
        .withColumn("lines", expr(
          """transform(sequence(0, cast(ceil(size(ws) / 10.0) as int) - 1),
            |  i -> array_join(slice(ws, i * 10 + 1, 10), ' '))""".stripMargin))
      Dedup.dedupLines(withLines, "doc_id", col("lines"), 1, " ")
    }
    time("span-cut") {
      Dedup.cutSpans(d, "doc_id", "text")
    }
    time("budget-select") {
      Sampling.selectByBudget(
        d.withColumn("ws", TextOps.words(col("text"))), "doc_id",
        TextOps.wordRatio("ws", PipelineParams.stopwords.head._2),
        TextOps.tokenCount(col("text")), budget = 2000000L)
    }
    val t0 = System.nanoTime()
    val m = Bpe.train(d, "text", PipelineParams.BpeMerges)
    println(f"PROBE bpe-train24 merges=${m.size} " +
      f"t=${(System.nanoTime() - t0) / 1e9}%.2f s")
  }

  test("time uncapped vs capped ngram join at sf1", org.scalatest.Tag("probe")) {
    assume(sys.env.contains("GRAFT_SCALE_PROBE"))
    val dir = sys.env.getOrElse("GRAFT_SCALE_PROBE", "/tmp/testdata-sf1")
    val d = Tables.df(spark, dir, "documents")
    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = body
      println(f"PROBE $label pairs=$c t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("ngram-uncapped") {
      Dedup.ngramJaccardPairs(d, "doc_id", "text", 0.5).count()
    }
    time("ngram-capped") {
      Dedup.ngramJaccardPairsCapped(d, "doc_id", "text", 0.5,
        graft.operators.PipelineParams.NgramMaxDf * 10).count()
    }
  }

  test("time LM operators at sf1", org.scalatest.Tag("probe")) {
    assume(sys.env.contains("GRAFT_SCALE_PROBE"))
    val dir = sys.env.getOrElse("GRAFT_SCALE_PROBE", "/tmp/testdata-sf1")
    val d = Tables.df(spark, dir, "documents")
    var t0 = System.nanoTime()
    val bm = LangModel.trainBackoff(d, "text")
    val out = LangModel.perplexity(d, "doc_id", "text", bm)
    out.write.format("noop").mode("overwrite").save()
    println(f"PROBE perplexity(train+score) " +
      f"t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    t0 = System.nanoTime()
    val vocab = Unigram.train(d, "text")
    println(f"PROBE unigram-train pieces=${vocab.size} " +
      f"t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    t0 = System.nanoTime()
    import org.apache.spark.sql.functions._
    d.withColumn("ws", TextOps.words(col("text")))
      .select(col("doc_id"), explode(col("ws")).as("w"))
      .filter(length(col("w")) > 0)
      .withColumn("ps", Unigram.segment(col("w"), vocab))
      .write.format("noop").mode("overwrite").save()
    println(f"PROBE unigram-encode t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    t0 = System.nanoTime()
    val target = d.filter(col("doc_id") %
      PipelineParams.DsirTargetStride === PipelineParams.DsirTargetSel)
    val lam = Dsir.importanceTable(target, d, "text")
    Dsir.select(d, "doc_id", "text", lam)
      .write.format("noop").mode("overwrite").save()
    println(f"PROBE dsir-select t=${(System.nanoTime() - t0) / 1e9}%.2f s")
  }
}
