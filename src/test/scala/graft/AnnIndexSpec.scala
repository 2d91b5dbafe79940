package graft

import graft.operators._
import graft.operators.PipelineParams._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted ANN index lifecycle ([[graft.operators.AnnIndex]]):
  * build persists the trained artifacts as lake tables, append encodes
  * a new batch against them WITHOUT re-training, and the persisted
  * query path answers exactly what the fresh-build operators
  * ([[Similarity.ivfTopK]]/[[Similarity.ivfPqTopK]]) answer over the
  * same corpus.
  */
class AnnIndexSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("annidx").toString

  private val split = IvfCentroidStride.toLong * IvfCentroids // 496

  test("persisted IVF: build prefix + append rest == fresh build; " +
      "append re-trains nothing and only appends") {
    val e = Tables.df(spark, sf, "embeddings")
    val eng = LakeEngine(spark)
    val base = tmp()
    AnnIndex.buildIvf(eng, "ivf1", base,
      e.filter(col("vec_id") < split), "vec_id", "embedding")
    val centBefore = eng.table(AnnIndex.centroidsTable("ivf1")).read()
      .select("cid").collect().map(_.getLong(0)).sorted.toSeq
    val postSnaps = eng.table(AnnIndex.postingsTable("ivf1"))
      .meta.snapshots.size
    AnnIndex.appendIvf(eng, "ivf1",
      e.filter(col("vec_id") >= split), "vec_id", "embedding")
    // no re-training: the centroid table did not change
    val centAfter = eng.table(AnnIndex.centroidsTable("ivf1")).read()
      .select("cid").collect().map(_.getLong(0)).sorted.toSeq
    assert(centAfter == centBefore, "append re-trained the centroids")
    // incremental: ONE new append snapshot on the postings
    val postMeta = eng.table(AnnIndex.postingsTable("ivf1")).meta
    assert(postMeta.snapshots.size == postSnaps + 1)
    assert(postMeta.snapshots.maxBy(_.id).operation == "append",
      "append rewrote the postings instead of appending")
    // every corpus vector has exactly one posting
    assert(eng.table(AnnIndex.postingsTable("ivf1")).read().count() ==
      e.count())
    // the persisted answer is the fresh-build answer, row for row
    val queries = e.filter(col("vec_id") < NumQueryVectors)
    val persisted = AnnIndex.ivfTopK(eng, "ivf1", queries,
      "vec_id", "embedding").orderBy("query_id", "rank").collect()
    val fresh = Similarity.ivfTopK(queries, e, "vec_id", "embedding")
      .orderBy("query_id", "rank").collect()
    assert(persisted.toSeq == fresh.toSeq,
      "persisted-index top-k diverged from the fresh build")
  }

  test("persisted IVF-PQ: codes + codebooks persist, append encodes " +
      "against them, answers match the fresh build") {
    val e = Tables.df(spark, sf, "embeddings")
    val eng = LakeEngine(spark)
    val base = tmp()
    AnnIndex.buildIvfPq(eng, "pq1", base,
      e.filter(col("vec_id") < split), "vec_id", "embedding")
    val cbBefore = eng.table(AnnIndex.codebooksTable("pq1")).read()
      .select("j", "c").collect().map(r => (r.getInt(0), r.getInt(1)))
      .sorted.toSeq
    AnnIndex.appendIvfPq(eng, "pq1",
      e.filter(col("vec_id") >= split), "vec_id", "embedding")
    val cbAfter = eng.table(AnnIndex.codebooksTable("pq1")).read()
      .select("j", "c").collect().map(r => (r.getInt(0), r.getInt(1)))
      .sorted.toSeq
    assert(cbAfter == cbBefore, "append re-trained the codebooks")
    assert(eng.table(AnnIndex.postingsTable("pq1")).read().count() ==
      e.count())
    val queries = e.filter(col("vec_id") < NumQueryVectors)
    val persisted = AnnIndex.ivfPqTopK(eng, "pq1", queries,
      "vec_id", "embedding").orderBy("query_id", "rank").collect()
    val fresh = Similarity.ivfPqTopK(queries, e, "vec_id", "embedding")
      .orderBy("query_id", "rank").collect()
    assert(persisted.toSeq == fresh.toSeq,
      "persisted IVF-PQ top-k diverged from the fresh build")
  }

  /** Production-centroid build: the persisted index accepts an
    * EXPLICIT coarse quantizer (Similarity.kmeans output) instead of
    * the stride rule. Correctness invariant regardless of the
    * quantizer: probing EVERY list makes IVF exact — the full-probe
    * persisted query must equal the brute-force top-k.
    */
  test("k-means-trained persisted index: full-probe query equals the " +
      "exact brute-force top-k; append still needs no retraining") {
    val e = Tables.df(spark, sf, "embeddings")
    val eng = LakeEngine(spark)
    val cents = Similarity.kmeans(e, "vec_id", "embedding",
      k = IvfCentroids, iters = 2)
    AnnIndex.buildIvfFrom(eng, "ivfkm", tmp(),
      e.filter(col("vec_id") < split), "vec_id", "embedding", cents)
    AnnIndex.appendIvf(eng, "ivfkm",
      e.filter(col("vec_id") >= split), "vec_id", "embedding")
    assert(eng.table(AnnIndex.postingsTable("ivfkm")).read().count() ==
      e.count())
    val queries = e.filter(col("vec_id") < NumQueryVectors)
    val persisted = AnnIndex.ivfTopK(eng, "ivfkm", queries,
        "vec_id", "embedding", nprobe = IvfCentroids)
      .orderBy("query_id", "rank").collect()
    val exact = Similarity.bruteForceTopK(queries, e,
        "vec_id", "embedding")
      .orderBy("query_id", "rank").collect()
    assert(persisted.toSeq == exact.toSeq,
      "full-probe IVF over k-means centroids diverged from exact top-k")
  }

  test("postings are partitioned by cid and the query scan prunes to " +
      "the probed lists") {
    val e = Tables.df(spark, sf, "embeddings")
    val eng = LakeEngine(spark)
    AnnIndex.buildIvf(eng, "ivfp", tmp(), e, "vec_id", "embedding")
    val t = eng.table(AnnIndex.postingsTable("ivfp"))
    assert(t.meta.partitionSpec.nonEmpty, "postings not partitioned")
    val allCids = t.read().select("cid").distinct().count()
    assert(allCids > IvfNProbe, "fixture too small to prove pruning")
    // ONE query probes nprobe lists; the collected-cid IN filter the
    // query path pushes must file-prune the partitioned postings scan
    AnnIndex.ivfTopK(eng, "ivfp",
      e.filter(col("vec_id") === 0), "vec_id", "embedding").collect()
    val (kept, skipped) = t.scanReport
    assert(skipped > 0 && kept < kept + skipped,
      s"postings scan not pruned: kept=$kept skipped=$skipped " +
        s"(lists=$allCids, nprobe=$IvfNProbe)")
  }
}
