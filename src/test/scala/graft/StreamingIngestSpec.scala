package graft

import graft.LakeEngine
import graft.lake.LakeTable
import graft.streaming.LakeSink
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Continuous deduplicated ingestion: micro-batches filtered against
  * the corpus signature state — exact dups and near-dups are dropped
  * across batch boundaries without ever re-reading the corpus, and the
  * signature table stays in lockstep with the document table.
  */
class StreamingIngestSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // ~30 words so a one-word edit keeps shingle jaccard well above 0.7
  private val baseA = (1 to 30).map(i => s"alpha$i").mkString(" ")
  private val nearA = ((1 to 29).map(i => s"alpha$i") :+ "CHANGED").mkString(" ")
  private val baseB = (1 to 30).map(i => s"beta$i").mkString(" ")
  private val baseZ = (1 to 30).map(i => s"zeta$i").mkString(" ")

  test("cross-batch exact + near dedup against stored signatures") {
    implicit val sqlCtx = spark.sqlContext
    val docTable = LakeTable.create(spark, LakeEngine.tempLocation("ingd"),
      "docs", StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType))))
    val sigTable = LakeTable.create(spark, LakeEngine.tempLocation("ings"),
      "sigs", StructType(Seq(
        StructField("id", LongType), StructField("fingerprint", StringType),
        StructField("hs", ArrayType(LongType)),
        StructField("sig", ArrayType(LongType)))))

    val input = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("ingest-ckpt").toString

    def runBatch(rows: (Long, String)*): Unit = {
      input.addData(rows: _*)
      val q = LakeSink.appendDeduped(
        input.toDF().toDF("doc_id", "text"), docTable, sigTable,
        "doc_id", "text", ckpt)
      q.awaitTermination()
    }

    // batch 1: A and B land; an in-batch near-dup of A (id 2) dropped
    runBatch((0L, baseA), (1L, baseB), (2L, nearA))
    assert(docTable.read().select("doc_id").as[Long].collect().sorted
      .toSeq == Seq(0L, 1L))

    // batch 2: exact dup of B dropped, near-dup of A dropped ACROSS
    // batches (via stored signatures), fresh Z lands
    runBatch((3L, baseB), (4L, nearA), (5L, baseZ))
    assert(docTable.read().select("doc_id").as[Long].collect().sorted
      .toSeq == Seq(0L, 1L, 5L))

    // signature table tracks exactly the surviving docs
    assert(sigTable.read().select("id").as[Long].collect().sorted
      .toSeq == Seq(0L, 1L, 5L))
    // stored fingerprints match recomputed ones for the kept texts
    val storedFp = sigTable.read().select("id", "fingerprint")
      .as[(Long, String)].collect().toMap
    val expectFp = docTable.read()
      .select(col("doc_id"),
        graft.operators.TextOps.fingerprint(col("text")))
      .as[(Long, String)].collect().toMap
    assert(storedFp == expectFp)
  }

  test("cross-batch line dedup against persisted line frequencies") {
    implicit val sqlCtx = spark.sqlContext
    val docTable = LakeTable.create(spark, LakeEngine.tempLocation("lind"),
      "cleandocs", StructType(Seq(
        StructField("id", LongType), StructField("clean_text", StringType),
        StructField("n_kept", LongType), StructField("n_removed", LongType))))
    val statsTable = LakeTable.create(spark, LakeEngine.tempLocation("lins"),
      "linestats", StructType(Seq(
        StructField("lh", LongType), StructField("docs", LongType))))

    val input = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("linededup-ckpt").toString

    def runBatch(rows: (Long, String)*): Unit = {
      input.addData(rows: _*)
      val q = LakeSink.appendLineDeduped(
        input.toDF().toDF("doc_id", "text"), docTable, statsTable,
        "doc_id", split(col("text"), "/"), ckpt, maxDocs = 1, lineSep = "/")
      q.awaitTermination()
    }

    // batch 1: "footer" repeats across docs 0 and 1 -> removed from
    // both (in-batch df = 2 > 1); unique lines survive in order
    runBatch((0L, "alpha/footer"), (1L, "beta/footer/gamma"))
    val b1 = docTable.read().orderBy("id")
      .select("id", "clean_text").as[(Long, String)].collect().toSeq
    assert(b1 == Seq((0L, "alpha"), (1L, "beta/gamma")), s"got $b1")

    // batch 2: "alpha" is now boilerplate ACROSS batches (doc 0 had it,
    // doc 2 brings it again -> corpus+batch df = 2 > 1); "delta" fresh
    runBatch((2L, "alpha/delta"))
    val b2 = docTable.read().orderBy("id")
      .select("id", "clean_text").as[(Long, String)].collect().toSeq
    assert(b2 == Seq((0L, "alpha"), (1L, "beta/gamma"), (2L, "delta")),
      s"got $b2")

    // the stats table aggregates to the full corpus line frequencies
    val statDocs = statsTable.read().groupBy("lh")
      .agg(sum("docs").as("docs")).select("docs").as[Long]
      .collect().sorted.toSeq
    // lines: alpha(2 docs), footer(2), beta(1), gamma(1), delta(1)
    assert(statDocs == Seq(1L, 1L, 1L, 2L, 2L), s"got $statDocs")
  }

  test("compaction cadence folds streaming small files; appenders race safely") {
    implicit val sqlCtx = spark.sqlContext
    val table = LakeTable.create(spark, LakeEngine.tempLocation("ingc"),
      "evts", StructType(Seq(
        StructField("id", LongType), StructField("v", LongType))))
    val input = MemoryStream[(Long, Long)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("compact-ckpt").toString

    // direct appenders racing the streaming sink's compaction cadence
    // (the ConcurrencySpec cluster-vs-append pattern): compaction is
    // CAS-guarded + retrying, so appends always land and compaction
    // rewrites only the files it read
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val failures =
      new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    (0 until 2).foreach { a =>
      pool.submit(new Runnable {
        override def run(): Unit = try {
          (0 until 4).foreach { i =>
            table.append(Seq((10000L + a * 100 + i, 1L)).toDF("id", "v"))
          }
        } catch { case e: Throwable => failures.add(e) }
      })
    }

    // 6 micro-batches at compactEvery = 2 → the sink compacts on
    // batch ids 2 and 4 while the appenders run
    (0 until 6).foreach { b =>
      input.addData((0 until 20).map(i => (b * 100L + i, 0L)): _*)
      LakeSink.append(input.toDF().toDF("id", "v"), table, ckpt,
        compactEvery = 2).awaitTermination()
    }
    pool.shutdown()
    assert(pool.awaitTermination(120,
      java.util.concurrent.TimeUnit.SECONDS), "appenders timed out")
    assert(failures.isEmpty,
      s"appender failed: ${Option(failures.peek())}")

    // no lost rows from either writer
    assert(table.read().filter(col("v") === 0L).count() == 6 * 20)
    assert(table.read().filter(col("v") === 1L).count() == 2 * 4)
    // the cadence actually folded files: without compaction the
    // stream + appenders leave >= 14 files (one per commit); after
    // two compactions the live file count must be clearly below that
    val live = table.meta.currentSnapshot.get.files.size
    assert(live < 10, s"compaction never folded: $live live files")
    // every live file still exists on disk (no compaction data loss)
    table.meta.currentSnapshot.get.files.foreach(f =>
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(f.path)),
        s"lost file ${f.path}"))
  }
}
