package graft

import graft.operators.CorpusOverlap
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CorpusOverlap: the exact report's invariants (its values are judged
  * against the DuckDB oracle via q_corpus_overlap), and the KMV-sketch
  * scale path pinned against the exact path on the fixture.
  */
class CorpusOverlapSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"
  private def docs = Tables.df(spark, sf, "documents")

  test("exact report: metric invariants and self-consistency") {
    val r = CorpusOverlap.overlapExact(docs, "lang", "text").collect()
    assert(r.nonEmpty, "expected overlapping language slices")
    r.foreach { row =>
      val (na, nb, c) = (row.getLong(2), row.getLong(3), row.getLong(4))
      val j = row.getDouble(5)
      assert(c <= math.min(na, nb))
      assert(j >= 0 && j <= 1)
      val expect = c.toDouble / (na + nb - c)
      assert(math.abs(j - expect) < 1e-6)
      assert(math.abs(row.getDouble(6) - c.toDouble / na) < 1e-6)
      assert(math.abs(row.getDouble(7) - c.toDouble / nb) < 1e-6)
      assert(row.getString(0) < row.getString(1), "pairs are ordered")
    }
  }

  test("identical slices: jaccard and containments are exactly 1") {
    // duplicate the corpus under two slice labels: overlap must be total
    val twin = docs.select(lit("a").as("sl"), col("text"))
      .union(docs.select(lit("b").as("sl"), col("text")))
    val r = CorpusOverlap.overlapExact(twin, "sl", "text").collect()
    assert(r.length == 1)
    assert(r.head.getDouble(5) == 1.0 && r.head.getDouble(6) == 1.0 &&
      r.head.getDouble(7) == 1.0)
  }

  test("kmv sketch: exact when k exceeds the distinct count") {
    // k larger than any slice's distinct-shingle count => the sketch
    // holds the full set and every estimate collapses to the exact value
    val exact = CorpusOverlap.overlapExact(docs, "lang", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    val est = CorpusOverlap.overlapSketch(docs, "lang", "text",
      k = 1 << 20).collect()
    assert(est.length == exact.size)
    est.foreach { row =>
      val (na, nb, c, j) = exact((row.getString(0), row.getString(1)))
      assert(math.abs(row.getDouble(2) - na) < 1e-6)
      assert(math.abs(row.getDouble(3) - nb) < 1e-6)
      assert(math.abs(row.getDouble(4) - c) < 1e-3)
      // exact path rounds jaccard to 6 decimals; sketch does not
      assert(math.abs(row.getDouble(5) - j) < 1e-6)
    }
  }

  test("kmv sketch: estimates within KMV error bounds at k=1024") {
    val exact = CorpusOverlap.overlapExact(docs, "lang", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(5))).toMap
    val est = CorpusOverlap.overlapSketch(docs, "lang", "text",
      k = 1024).collect()
    assert(est.length == exact.size)
    est.foreach { row =>
      val (na, nb, j) = exact((row.getString(0), row.getString(1)))
      // KMV relative error ~1/sqrt(k) ≈ 3.1%; allow ~4 sigma on sizes
      assert(math.abs(row.getDouble(2) - na) / na < 0.15,
        s"size est ${row.getDouble(2)} vs $na")
      assert(math.abs(row.getDouble(3) - nb) / nb < 0.15)
      // jaccard estimator sigma ≈ sqrt(j(1-j)/k) ≤ 0.016; the fixture
      // cross-language overlap is small, so bound absolutely
      assert(math.abs(row.getDouble(5) - j) < 0.08,
        s"jaccard est ${row.getDouble(5)} vs $j")
    }
    // and the sketch path must actually be sketching at this k: at
    // least one slice has more distinct shingles than k
    val sk = CorpusOverlap.kmvSketches(docs, "lang", "text", k = 1024)
    assert(sk.select(max(size(col("sketch")))).head.getInt(0) == 1024,
      "fixture too small for the k=1024 sketch to estimate")
  }

  test("kmv sketches merge exactly: merge(sk(A), sk(B)) == sk(A union B)") {
    // split the corpus arbitrarily; the slice label is shared so the
    // merged per-part sketches must equal the whole-corpus sketch
    val k = 256
    val whole = docs.withColumn("sl", col("lang"))
    val partA = whole.where(col("doc_id") % 2 === 0)
    val partB = whole.where(col("doc_id") % 2 =!= 0)
    def sk(df: org.apache.spark.sql.DataFrame) =
      CorpusOverlap.kmvSketches(df, "sl", "text", k = k)
        .select(col("slice"), col("sketch"))
    val merged = sk(partA).toDF("slice", "sa")
      .join(sk(partB).toDF("slice", "sb"), Seq("slice"), "full")
      .select(col("slice"),
        CorpusOverlap.mergeSketch(
          coalesce(col("sa"), array()), coalesce(col("sb"), array()), k)
          .as("sketch"))
    val direct = sk(whole)
    assert(merged.join(direct.toDF("slice", "expect"), "slice")
      .where(col("sketch") =!= col("expect")).isEmpty,
      "merged per-part sketches differ from the whole-corpus sketch")
    assert(direct.count() == merged.count())
  }

  test("exact report plan: size joins broadcast, no cartesian") {
    val p = CorpusOverlap.overlapExact(docs, "source", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), "cartesian in overlap plan")
    assert(p.contains("BroadcastHashJoin"),
      "slice-size joins must broadcast (S rows, never shuffle the pairs)")
    assert(!p.contains("SortMergeJoin"),
      "no shuffle join belongs in the overlap plan")
  }

  test("kmv sketch build: window partitions are salt-bounded") {
    // the bottom-k build must never sort a whole slice in one window
    // partition: stage-1 windows are keyed by (slice, bucket)
    val plan = CorpusOverlap.kmvSketches(docs, "lang", "text", k = 64,
      buckets = 8).queryExecution.executedPlan.toString
    val windowSpecs = plan.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(windowSpecs.nonEmpty)
    assert(plan.contains("pmod") || windowSpecs.exists(_.contains("b#")),
      "stage-1 window is not salted by hash bucket")
  }
}
