package graft.operators

import graft.LakeEngine
import org.apache.spark.sql.GraftBridge
import graft.operators.PipelineParams._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted ANN index lifecycle over managed lake tables — the 100 TB
  * path for [[Similarity.ivfTopK]] / [[Similarity.ivfPqTopK]], which
  * derive centroids, assignments and PQ codes per query run. Here the
  * trained artifacts persist once and queries only READ them:
  *
  *   - `<name>_centroids` — (cid, cv): the coarse quantizer (small,
  *     broadcast at query time);
  *   - `<name>_codebooks` — (j, c, cbv): PQ sub-quantizers (PQ only;
  *     m·pqK rows, driver-bounded and corpus-size-independent);
  *   - `<name>_postings` — (cid, neighbor_id, nv, nn) or
  *     (cid, neighbor_id, codes): the inverted lists, PARTITIONED BY
  *     cid, so a query's nprobe lists prune at the file level.
  *
  * [[appendIvf]]/[[appendIvfPq]] encode ONLY the new batch against the
  * persisted artifacts (no re-training, no corpus re-encode — the
  * incremental pattern of [[Dedup.minhashSignatures]] applied to ANN),
  * and land it as one lake-table append. Query cost is independent of
  * how the corpus was ingested: probes broadcast against the centroid
  * table, the postings join prunes to the probed lists (the probed cid
  * set is collected — bounded by the centroid count, never the corpus).
  *
  * With the deterministic stride-rule training of
  * [[PipelineParams.IvfCentroidStride]], a persisted-index query is
  * value-identical to the fresh-build operators (same round-6 cosine,
  * same tie-breaks) — `q_sim_ivf_persisted` proves it against the same
  * DuckDB oracle as `q_sim_ivf`, and AnnIndexSpec pins persisted ≡
  * fresh for IVF-PQ plus append-without-retraining.
  */
object AnnIndex {

  def centroidsTable(name: String): String = s"${name}_centroids"
  def codebooksTable(name: String): String = s"${name}_codebooks"
  def postingsTable(name: String): String = s"${name}_postings"

  private def dot = (Similarity.dot _)

  /** (id → neighbor_id, vec → nv double-widened, nn) — the posting
    * shape. Widening float→double is exact, so persisted postings are
    * value-identical to computing on the raw vectors.
    */
  private def postingRows(batch: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    batch.select(col(idCol).cast("long").as("neighbor_id"),
        col(vecCol).cast("array<double>").as("nv"))
      .withColumn("nn", sqrt(dot(col("nv"), col("nv"))))

  private def centroids(engine: LakeEngine, name: String): DataFrame =
    engine.table(centroidsTable(name)).read()
      .withColumn("cn", sqrt(dot(col("cv"), col("cv"))))

  /** Nearest persisted centroid per batch row (max round-6 cosine,
    * lowest cid on ties) — identical assignment rule to
    * [[Similarity.ivfTopK]]. Centroids broadcast; the argmax is a
    * partial-aggregated `max_by`, no batch shuffle beyond the group.
    */
  private def assign(engine: LakeEngine, name: String,
      batch: DataFrame, idCol: String, vecCol: String): DataFrame =
    postingRows(batch, idCol, vecCol)
      .crossJoin(broadcast(centroids(engine, name)))
      .withColumn("ccos",
        round(dot(col("nv"), col("cv")) / (col("nn") * col("cn")), 6))
      .groupBy("neighbor_id")
      .agg(max_by(col("cid"), struct(col("ccos"), (-col("cid")).as("nc")))
          .as("cid"),
        any_value(col("nv")).as("nv"), any_value(col("nn")).as("nn"))

  /** Train (stride-rule coarse quantizer) and persist the IVF index,
    * encoding `corpus` as its initial postings. The stride rule keeps
    * the index oracle-reproducible; production deployments pass
    * [[Similarity.kmeans]] centroids to [[buildIvfFrom]] instead —
    * the persisted layout and query path are identical.
    */
  def buildIvf(engine: LakeEngine, name: String, baseDir: String,
      corpus: DataFrame, idCol: String, vecCol: String,
      stride: Int = IvfCentroidStride,
      numCentroids: Int = IvfCentroids): Unit =
    buildIvfFrom(engine, name, baseDir, corpus, idCol, vecCol,
      corpus.filter(col(idCol) % stride === 0 &&
          col(idCol) < stride.toLong * numCentroids)
        .select(col(idCol).cast("long").as("cid"),
          col(vecCol).cast("array<double>").as("cv")))

  /** Persist the IVF index from an EXPLICIT coarse quantizer — e.g.
    * [[Similarity.kmeans]] output `(cid, cv)` — and encode `corpus`
    * as its initial postings. Same layout, append path and query path
    * as the stride-rule build.
    */
  def buildIvfFrom(engine: LakeEngine, name: String, baseDir: String,
      corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): Unit = {
    engine.createTableAsSelect(centroidsTable(name),
      s"$baseDir/${centroidsTable(name)}",
      centroids.select(col("cid").cast("long").as("cid"),
        col("cv").cast("array<double>").as("cv")))
    engine.createTableAsSelect(postingsTable(name),
      s"$baseDir/${postingsTable(name)}",
      assign(engine, name, corpus, idCol, vecCol)
        .select("cid", "neighbor_id", "nv", "nn"),
      partitionBy = Seq("cid"))
  }

  /** Encode a new batch against the PERSISTED centroids (no
    * re-training) and append it to the inverted lists.
    */
  def appendIvf(engine: LakeEngine, name: String, batch: DataFrame,
      idCol: String, vecCol: String): Unit =
    engine.table(postingsTable(name)).append(
      assign(engine, name, batch, idCol, vecCol)
        .select("cid", "neighbor_id", "nv", "nn"))

  /** Top-k over the persisted IVF index: probes broadcast against the
    * centroid table; the postings scan prunes to the probed cid
    * partitions (the probed set is collected — bounded by the centroid
    * count, corpus-size-independent); re-rank is the exact round-6
    * cosine, identical to [[Similarity.ivfTopK]].
    */
  def ivfTopK(engine: LakeEngine, name: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int = TopK,
      nprobe: Int = IvfNProbe): DataFrame = {
    val probes = probeLists(engine, name, queries, idCol, vecCol, nprobe)
    val cids = probes.select("cid").distinct()
      .collect().map(_.getLong(0))
    val posts = engine.table(postingsTable(name)).readIndexed()
      .filter(col("cid").isin(cids: _*))
    val candidates = probes.join(posts, Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        round(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    candidates.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** query → its nprobe nearest persisted centroids. */
  private def probeLists(engine: LakeEngine, name: String,
      queries: DataFrame, idCol: String, vecCol: String,
      nprobe: Int): DataFrame = {
    val wProbe = Window.partitionBy("query_id")
      .orderBy(col("ccos").desc, col("cid"))
    queries.select(col(idCol).cast("long").as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .withColumn("qn", sqrt(dot(col("qv"), col("qv"))))
      .crossJoin(broadcast(centroids(engine, name)))
      .withColumn("ccos",
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
      .withColumn("crn", row_number().over(wProbe))
      .filter(col("crn") <= nprobe)
      .select(col("query_id"), col("qv"), col("qn"), col("cid"))
  }

  // ------------------------------------------------------------ IVF-PQ

  /** Train (stride-rule centroids + codebooks) and persist the IVF-PQ
    * index: postings carry `m` PQ code ids per vector instead of the
    * vector — the shuffle/storage win PQ exists for.
    */
  def buildIvfPq(engine: LakeEngine, name: String, baseDir: String,
      corpus: DataFrame, idCol: String, vecCol: String,
      stride: Int = IvfCentroidStride, numCentroids: Int = IvfCentroids,
      m: Int = PqM, pqK: Int = PqK, pqStride: Int = PqStride): Unit = {
    val cent = corpus
      .filter(col(idCol) % stride === 0 &&
        col(idCol) < stride.toLong * numCentroids)
      .select(col(idCol).cast("long").as("cid"),
        col(vecCol).cast("array<double>").as("cv"))
    engine.createTableAsSelect(centroidsTable(name),
      s"$baseDir/${centroidsTable(name)}", cent)
    // sub-quantizer rows: (subspace j, code c, codebook slice)
    val sess = corpus.sparkSession
    import sess.implicits._
    val cbRows = corpus
      .filter(col(idCol) % pqStride === 0 &&
        col(idCol) < pqStride.toLong * pqK)
      .select((col(idCol) / pqStride).cast("int").as("c"),
        col(vecCol).cast("array<double>").as("v"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1)).sortBy(_._1)
    require(cbRows.nonEmpty, "no codebook rows under the stride rule")
    val dim = cbRows.head._2.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    val slices = for {
      (c, v) <- cbRows.toSeq
      j <- 0 until m
    } yield (j, c, v.slice(j * subDim, (j + 1) * subDim))
    engine.createTableAsSelect(codebooksTable(name),
      s"$baseDir/${codebooksTable(name)}",
      slices.toDF("j", "c", "cbv"))
    engine.createTableAsSelect(postingsTable(name),
      s"$baseDir/${postingsTable(name)}",
      encodePq(engine, name, corpus, idCol, vecCol),
      partitionBy = Seq("cid"))
  }

  /** The persisted sub-quantizers, reshaped to `codebooks(j)(c)` for
    * [[graft.functions.PqEncode]]/[[graft.functions.PqAdc]]. Bounded:
    * m·pqK rows regardless of corpus size.
    */
  private def loadCodebooks(engine: LakeEngine,
      name: String): Seq[Seq[Seq[Double]]] = {
    val rows = engine.table(codebooksTable(name)).read()
      .select("j", "c", "cbv").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
    val m = rows.map(_._1).max + 1
    (0 until m).map(j =>
      rows.filter(_._1 == j).sortBy(_._2).map(_._3.toSeq).toSeq)
  }

  private def encodePq(engine: LakeEngine, name: String,
      batch: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val codebooks = loadCodebooks(engine, name)
    assign(engine, name, batch, idCol, vecCol)
      .withColumn("codes", GraftBridge.column(graft.functions.PqEncode(
        GraftBridge.expression(col("nv")), codebooks)))
      .select("cid", "neighbor_id", "codes")
  }

  /** Encode a new batch against the PERSISTED centroids and codebooks
    * (no re-training) and append its codes to the inverted lists.
    */
  def appendIvfPq(engine: LakeEngine, name: String, batch: DataFrame,
      idCol: String, vecCol: String): Unit =
    engine.table(postingsTable(name)).append(
      encodePq(engine, name, batch, idCol, vecCol))

  /** Top-k over the persisted IVF-PQ index: asymmetric distance of the
    * query vector to each probed list entry's persisted codes —
    * identical values to [[Similarity.ivfPqTopK]].
    */
  def ivfPqTopK(engine: LakeEngine, name: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int = TopK,
      nprobe: Int = IvfNProbe): DataFrame = {
    val codebooks = loadCodebooks(engine, name)
    val probes = probeLists(engine, name, queries, idCol, vecCol, nprobe)
    val cids = probes.select("cid").distinct()
      .collect().map(_.getLong(0))
    val posts = engine.table(postingsTable(name)).readIndexed()
      .filter(col("cid").isin(cids: _*))
    val candidates = probes.join(posts, Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("dist", GraftBridge.column(graft.functions.PqAdc(
        GraftBridge.expression(col("qv")),
        GraftBridge.expression(col("codes")), codebooks)))
    val w = Window.partitionBy("query_id")
      .orderBy(col("dist").asc, col("neighbor_id"))
    candidates.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        col("dist"))
  }
}
