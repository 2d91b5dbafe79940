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

  test("time wordpiece/weighted-sample/ivfpq/editdist sf0.1 vs sf1",
      org.scalatest.Tag("probe")) {
    assume(sys.env.contains("GRAFT_SCALE_PROBE"))
    import org.apache.spark.sql.functions._
    for (dir <- Seq("/root/testdata/sf0.1", "/root/testdata/sf0.1",
        sys.env.getOrElse("GRAFT_SCALE_PROBE", "/tmp/testdata-sf1"))) {
      val d = Tables.df(spark, dir, "documents")
      val e = Tables.df(spark, dir, "embeddings")
      val n = d.count()
      def time(label: String)(body: => Unit): Unit = {
        val t0 = System.nanoTime()
        body
        println(f"PROBE $label n=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      time("wordpiece-train12") {
        WordPiece.train(d, "text", 12)
      }
      time("weighted-sample") {
        Sampling.sampleWeighted(d, "doc_id",
            (TextOps.tokenCount(col("text")) + lit(1)).cast("double"),
            k = 100, seed = "sw1")
          .write.format("noop").mode("overwrite").save()
      }
      time("ivfpq-topk") {
        Similarity.ivfPqTopK(
            e.filter(col("vec_id") < PipelineParams.NumQueryVectors),
            e, "vec_id", "embedding")
          .write.format("noop").mode("overwrite").save()
      }
      time("pagerank3") {
        // node universe scales with the corpus (n/100), edge count with n
        val ev = Tables.df(spark, dir, "events")
        val m = ev.count() / 100
        val edges = ev.select((col("event_id") % m).as("src"),
            ((col("event_id") * 7 + 3) % m).as("dst"))
          .unionByName(ev.select((col("event_id") % m).as("src"),
            ((col("event_id") * 31 + 11) % (m / 2)).as("dst")))
        Graph.pageRank(edges, "src", "dst", iters = 3)
          .write.format("noop").mode("overwrite").save()
      }
      time("editdist-join") {
        // distinct-string count scales with the corpus (n/4); q from
        // GRAFT_EDQ — dense ID universes need q matched to alphabet
        // entropy (see SCALE.md)
        val ev = Tables.df(spark, dir, "events")
        val mod = ev.count() / 4
        val q = sys.env.getOrElse("GRAFT_EDQ", "2").toInt
        val strs = ev.select(
          concat(lit("s"), (col("event_id") % mod).cast("string")).as("w"))
        Dedup.editDistancePairs(strs, "w", maxDist = 1, q = q)
          .write.format("noop").mode("overwrite").save()
      }
    }
  }

  test("time round-9 search + wide-LSH operators sf0.1 vs sf1",
      org.scalatest.Tag("probe")) {
    assume(sys.env.contains("GRAFT_SCALE_PROBE"))
    import org.apache.spark.sql.functions._
    for (dir <- Seq("/root/testdata/sf0.1",
        sys.env.getOrElse("GRAFT_SCALE_PROBE", "/tmp/testdata-sf1"))) {
      val d = Tables.df(spark, dir, "documents")
      val e = Tables.df(spark, dir, "embeddings")
      val n = d.count()
      def time(label: String)(body: => Unit): Unit = {
        val t0 = System.nanoTime()
        body
        println(f"PROBE $label n=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      time("bm25-topk") {
        val q = d.filter(col("doc_id") % PipelineParams.Bm25QueryStride ===
            PipelineParams.Bm25QuerySel)
          .select(col("doc_id").as("query_id"),
            expr("array_join(slice(split(lower(text), ' '), 1, 4), ' ')")
              .as("qtext"))
        Search.bm25TopK(d, "doc_id", "text", q, "query_id", "qtext")
          .write.format("noop").mode("overwrite").save()
      }
      time("lsh-wide-pairs") {
        Similarity.lshCosinePairsScaled(e, "vec_id", "embedding",
            PipelineParams.CosineNearDup, PipelineParams.LshWideBands,
            PipelineParams.LshWideRows)
          .write.format("noop").mode("overwrite").save()
      }
      time("classifier-score") {
        Classifier.scoreRule(d, "doc_id", "text")
          .write.format("noop").mode("overwrite").save()
      }
      time("char-entropy") {
        d.filter(length(col("text")) > 0)
          .select(col("doc_id"), TextOps.charEntropy(col("text")))
          .write.format("noop").mode("overwrite").save()
      }
    }
  }

  test("time temporal + spatial-join operators sf0.1 vs sf1",
      org.scalatest.Tag("probe")) {
    assume(sys.env.contains("GRAFT_SCALE_PROBE"))
    import org.apache.spark.sql.functions._
    graft.functions.PgFunctions.register(spark)
    // first sf0.1 pass is discarded warmup (codegen + JIT dominate the
    // sub-second sf0.1 timings otherwise)
    for (dir <- Seq("/root/testdata/sf0.1", "/root/testdata/sf0.1",
        sys.env.getOrElse("GRAFT_SCALE_PROBE", "/tmp/testdata-sf1"))) {
      val ev = Tables.df(spark, dir, "events")
      val n = ev.count()
      def time(label: String)(body: => org.apache.spark.sql.DataFrame): Unit = {
        val t0 = System.nanoTime()
        body.write.format("noop").mode("overwrite").save()
        println(f"PROBE $label n=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      time("asof-join") {
        val l = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        val r = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts"), col("event_id").as("vid"))
        Temporal.asofJoin(l, r, Seq("user_id"), "ts", "ts", Seq("vid"),
          "vts", toleranceUs = Some(7L * 86400000000L),
          rightTieBreak = Seq("vid"))
      }
      time("range-join") {
        val bands = spark.range(0, 2100).select(col("id").as("band_id"),
          (col("id") * lit(50.0)).as("lo"),
          (col("id") * lit(50.0) + lit(200.0)).as("hi"))
        Temporal.rangeJoin(Tables.df(spark, dir, "lineitem"),
            "l_extendedprice", bands, "lo", "hi", 200.0)
          .groupBy("band_id").agg(count(lit(1)).as("n"))
      }
      time("spatial-grid-join") {
        // constant point density, box count scaling with the corpus:
        // output pairs grow linearly with n
        val pts = ev.select(col("event_id").as("pid"),
          expr("st_point(CAST((event_id * 3) % 1000 AS DOUBLE), " +
            "CAST((user_id * 7) % 1000 AS DOUBLE))").as("pgeom"))
        val boxes = ev.filter(col("event_id") % 50 === 0)
          .select(col("event_id").as("bid"),
            expr("st_makeenvelope(" +
              "CAST((event_id * 13) % 990 AS DOUBLE), " +
              "CAST((event_id * 29) % 990 AS DOUBLE), " +
              "CAST((event_id * 13) % 990 + (event_id % 5) + 2 AS DOUBLE), " +
              "CAST((event_id * 29) % 990 + (event_id % 7) + 2 AS DOUBLE))")
              .as("bgeom"))
        SpatialJoin.intersectsJoin(pts, "pgeom", boxes, "bgeom", 8.0)
          .groupBy("bid").agg(count(lit(1)).as("n_pts"))
      }
      time("gapfill") {
        val daily = ev.groupBy(col("user_id"),
            date_trunc("DAY", col("ts")).as("d"))
          .agg(sum(col("value").cast("decimal(18,2)"))
            .cast("double").as("v"))
        Temporal.gapFill(daily, Seq("user_id"), "d", "v")
      }
    }
  }

  test("time corpus-overlap exact vs kmv sketch sf0.1 vs sf1",
      org.scalatest.Tag("probe")) {
    assume(sys.env.contains("GRAFT_SCALE_PROBE"))
    import org.apache.spark.sql.functions._
    for (dir <- Seq("/root/testdata/sf0.1",
        sys.env.getOrElse("GRAFT_SCALE_PROBE", "/tmp/testdata-sf1"))) {
      val d = Tables.df(spark, dir, "documents")
      val n = d.count()
      def time(label: String)(body: => Unit): Unit = {
        val t0 = System.nanoTime()
        body
        println(f"PROBE $label n=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      time("overlap-exact") {
        CorpusOverlap.overlapExact(d, "source", "text")
          .write.format("noop").mode("overwrite").save()
      }
      time("overlap-kmv") {
        CorpusOverlap.overlapSketch(d, "source", "text", k = 1024)
          .write.format("noop").mode("overwrite").save()
      }
    }
  }

  test("time quantified/3VL rewrite layer at sf1",
    org.scalatest.Tag("probe")) {
    assume(sys.env.contains("GRAFT_SCALE_PROBE"))
    val dir = sys.env("GRAFT_SCALE_PROBE")
    graft.functions.PgFunctions.register(spark)
    Tables.registerAll(spark, dir)
    def time(label: String)(body: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      body.write.format("noop").mode("overwrite").save()
      println(f"PROBE $label t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // full-table quantified projection: correlated < ANY collapses to
    // per-nation max + broadcast hash join, = ANY to hash existence +
    // scalar null-member subquery — should scale with customer count
    time("quantified-any-full") {
      QueryDef.pgSql(spark,
        """SELECT c_custkey,
          |  c_acctbal < ANY (SELECT s_acctbal FROM supplier s
          |                   WHERE s.s_nationkey = customer.c_nationkey)
          |    AS below_some_supplier,
          |  c_nationkey = ANY (SELECT nullif(s2.s_nationkey, 7)
          |                     FROM supplier s2) AS nation_has_supplier
          |FROM customer""".stripMargin)
    }
    // projected NOT IN over a NULL-bearing big-side subquery: match
    // leg is a hash existence join orders×customer, UNKNOWN leg is a
    // scalar null-member check — no nested-loop coupling
    time("not-in-null-aware-full") {
      QueryDef.pgSql(spark,
        """SELECT o_orderkey,
          |  o_custkey NOT IN (SELECT nullif(c_custkey, 7) FROM customer
          |                    WHERE c_acctbal > 0) AS nonmember
          |FROM orders""".stripMargin)
    }
  }

  test("time row-id lineage at 2M vs 20M rows", org.scalatest.Tag("probe")) {
    assume(sys.env.contains("GRAFT_SCALE_PROBE"))
    import graft.lake._
    import org.apache.spark.sql.functions._
    // self-scaling: the lineage paths are fixture-independent. Probes
    // the three shapes that must stay linear at 100 TB: the broadcast
    // range-join read, the copy-on-write materialized rewrite, and the
    // _row_id-sorted compaction + run re-derivation.
    for (n <- Seq(2000000L, 20000000L)) {
      val df = spark.range(1, n + 1).repartition(32)
        .selectExpr("id AS x", "id % 97 AS y")
      val t = LakeTable.create(spark,
        LakeEngine.tempLocation(s"probe_rid_$n"), "t", df.schema,
        properties = Map("row_ids" -> "true"))
      def time(label: String)(body: => Unit): Unit = {
        val t0 = System.nanoTime(); body
        info(f"$label%-28s n=$n%9d ${(System.nanoTime - t0) / 1e9}%8.2f s")
      }
      time("append")(t.append(df))
      time("readWithRowIds.count")(assert(t.readWithRowIds().count() == n))
      time("delete 1%")(t.delete(col("x") % 100 === 0))
      time("compact + rederive")(
        t.compact(smallBytes = 1L << 40, targetBytes = 1L << 40))
      val mappings = t.rowIdMappings.count()
      info(s"mappings after compact: $mappings (rows=${n - n / 100})")
      // run table stays metadata-sized: ~1 run per delete hole, never
      // O(rows)
      assert(mappings <= n / 100 + 64, s"mapping explosion: $mappings")
      t.drop()
    }
  }

  test("merge-on-read vs copy-on-write delete cost", org.scalatest.Tag("probe")) {
    assume(sys.env.contains("GRAFT_SCALE_PROBE"))
    import graft.lake._
    import org.apache.spark.sql.functions._
    // the 100 TB argument in one number: deleting 0.1% of the rows must
    // cost proportional to the DELETED rows (position batch), not the
    // table bytes (full rewrite). Self-scaling, fixture-independent.
    for (n <- Seq(2000000L, 20000000L)) {
      def mk(props: Map[String, String]) = {
        val df = spark.range(1, n + 1).repartition(32)
          .selectExpr("id AS x", "CAST(id % 97 AS STRING) AS y")
        val t = LakeTable.create(spark,
          LakeEngine.tempLocation(s"probe_mor_$n"), "t", df.schema,
          properties = props)
        t.append(df)
        t
      }
      def time(label: String)(body: => Unit): Unit = {
        val t0 = System.nanoTime(); body
        info(f"$label%-28s n=$n%9d ${(System.nanoTime - t0) / 1e9}%8.2f s")
      }
      val mor = mk(Map.empty)
      time("delete 0.1% merge-on-read")(mor.delete(col("x") % 1000 === 0))
      assert(mor.meta.currentSnapshot.get.deleteFiles.nonEmpty)
      time("read after MoR delete")(
        assert(mor.read().count() == n - n / 1000))
      val cow = mk(Map("copy_on_write_threshold" -> "0"))
      time("delete 0.1% copy-on-write")(cow.delete(col("x") % 1000 === 0))
      time("fold deletes (compact)")(
        mor.compact(smallBytes = 1L << 40, targetBytes = 1L << 40))
      mor.drop(); cow.drop()
    }
  }

  test("time persisted ANN index vs fresh-build IVF at sf1",
      org.scalatest.Tag("probe")) {
    assume(sys.env.contains("GRAFT_SCALE_PROBE"))
    val dir = sys.env.getOrElse("GRAFT_SCALE_PROBE", "/tmp/testdata-sf1")
    import org.apache.spark.sql.functions._
    val e = Tables.df(spark, dir, "embeddings")
    val queries =
      e.filter(col("vec_id") < PipelineParams.NumQueryVectors)
    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = body
      println(f"PROBE $label rows=$c " +
        f"t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // fresh build re-encodes the whole corpus EVERY query run
    time("ivf-fresh") {
      Similarity.ivfTopK(queries, e, "vec_id", "embedding").count()
    }
    val eng = LakeEngine(spark)
    val base = java.nio.file.Files
      .createTempDirectory("annprobe").toString
    val split = PipelineParams.IvfCentroidStride.toLong *
      PipelineParams.IvfCentroids
    time("ann-build(once)") {
      AnnIndex.buildIvf(eng, "annprobe", base,
        e.filter(col("vec_id") < split), "vec_id", "embedding"); 0L
    }
    time("ann-append(batch)") {
      AnnIndex.appendIvf(eng, "annprobe",
        e.filter(col("vec_id") >= split), "vec_id", "embedding"); 0L
    }
    // the claim under probe: query cost is independent of corpus
    // re-encoding — the persisted path reads postings + centroids only
    time("ann-query") {
      AnnIndex.ivfTopK(eng, "annprobe", queries,
        "vec_id", "embedding").count()
    }
    time("ann-query(repeat)") {
      AnnIndex.ivfTopK(eng, "annprobe", queries,
        "vec_id", "embedding").count()
    }
  }
}
