package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search (SURVEY.md §7 M6): exact cosine (the
  * correctness baseline) and hyperplane-LSH bucketing (the scale path).
  *
  * Vectors are `array<float>` columns; arithmetic is element-cast to
  * double and folded LEFT-TO-RIGHT (`aggregate` over `zip_with`), so
  * the result is bit-reproducible across engines for the differential
  * oracle — and deterministic across partitionings, which matters for
  * repeatable pipeline runs.
  */
object Similarity {
  import PipelineParams._
  import org.apache.spark.sql.GraftBridge

  /** Sequential-fold dot product as a native codegen'd expression
    * ([[graft.functions.ArrayDotD]]): identical accumulation order to
    * `aggregate(zip_with(...))` and the oracle's `list_reduce` — bit
    * exact — but a tight generated loop instead of per-element
    * interpreted lambdas (the difference between 150 s and 2 s on the
    * sf0.1 all-pairs query).
    */
  def dot(x: Column, y: Column): Column =
    GraftBridge.column(graft.functions.ArrayDotD(
      GraftBridge.expression(x), GraftBridge.expression(y)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Attach the per-vector norm ONCE (`<pre>n`) — recomputing norms per
    * candidate pair would triple the hot-loop work; precomputing keeps
    * the oracle's `dot/(sqrt·sqrt)` value bit-identical because the
    * same doubles flow through the same operation order.
    */
  private def withNorm(df: DataFrame, vec: String, n: String): DataFrame =
    df.withColumn(n, norm(col(vec)))

  /** Exact top-k neighbors for each query vector: broadcast the (small)
    * query set against the (large) corpus — one corpus scan, no corpus
    * shuffle — then per-query top-k via window. Ranking key is cosine
    * rounded to 6 decimals with id tie-break, which makes ranks stable
    * under FP noise. Output: (query_id, neighbor_id, rank, cos).
    */
  /** Symmetric int8 quantization of an embedding column: per-vector
    * scale 127/max|v|, values floor(v·scale + 0.5) — 4× smaller on
    * disk with bounded reconstruction error ≤ 0.5/scale per dim. All
    * arithmetic is per-row IEEE on exact inputs (floor, not round, so
    * the oracle reproduces ties bit-for-bit); zero vectors quantize to
    * zeros. Scale shape: pure projection, no shuffle.
    */
  def quantizeInt8(vec: String): Column =
    expr(
      s"""CASE WHEN array_max(transform($vec, v -> abs(cast(v as double)))) = 0.0
         |  THEN transform($vec, v -> 0)
         |  ELSE transform($vec, v -> cast(floor(
         |    cast(v as double) *
         |      (127.0 / array_max(transform($vec, x -> abs(cast(x as double)))))
         |    + 0.5d) as int))
         |  END""".stripMargin)

  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int = TopK): DataFrame = {
    val q = withNorm(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")), "qv", "qn")
    val c = withNorm(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")), "cv", "cn")
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** All pairs with cosine ≥ `minCos` (embedding near-dup dedup). The
    * fixture-scale implementation is the exact broadcast product; at
    * corpus scale, generate candidates with [[signature]] buckets first
    * and verify only within buckets.
    */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String,
      minCos: Double = CosineNearDup): DataFrame = {
    val a = withNorm(
      df.select(col(idCol).as("a_id"), col(vecCol).as("va")), "va", "na")
    val b = withNorm(
      df.select(col(idCol).as("b_id"), col(vecCol).as("vb")), "vb", "nb")
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("cos",
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("cos") >= minCos)
      .select("a_id", "b_id", "cos")
  }

  /** The operator users should call: size-dispatched near-dup pairs.
    * Exact all-pairs is better below `exactLimit` rows (no signature
    * pass, perfect recall, and n² is tiny); above it the LSH-banded
    * join is the only shape that survives corpus scale. The count is
    * one columnar scan of the id column — negligible against either
    * branch — and keeps the choice data-driven instead of caller-
    * guessed.
    */
  def cosinePairsAuto(df: DataFrame, idCol: String, vecCol: String,
      minCos: Double = CosineNearDup,
      exactLimit: Long = 10000L): DataFrame = {
    val n = df.select(idCol).count()
    if (n <= exactLimit) cosinePairs(df, idCol, vecCol, minCos)
    else {
      val (bands, rows) = lshAutoParams(n)
      lshCosinePairsScaled(df, idCol, vecCol, minCos, bands, rows)
    }
  }

  /** Corpus-size-driven LSH shape: rows-per-band grows with log2(n) so
    * expected bucket occupancy stays at [[PipelineParams.LshTargetBucket]]
    * (constant occupancy ⇒ candidate volume linear in n, the property
    * the fixed 4×4 contract loses the moment the corpus outgrows its
    * 16-value key space — the sf1 smoke measured that cliff at 46×
    * for a 10× scale-up); band count then grows to hold ≥95% detection
    * at the cos≈0.9 design point via the standard S-curve
    * 1−(1−p^r)^b with p = 1 − acos(s)/π. Wider signatures cost only
    * scan-local plane dot products — linear, the right trade against a
    * quadratic join.
    */
  def lshAutoParams(n: Long, targetBucket: Int = LshTargetBucket,
      designCos: Double = 0.9, designRecall: Double = 0.95): (Int, Int) = {
    val rows = math.max(LshRowsPerBand, math.min(20,
      math.ceil(math.log(math.max(1.0, n.toDouble / targetBucket)) /
        math.log(2.0)).toInt))
    val p = 1.0 - math.acos(designCos) / math.Pi
    val pBand = math.pow(p, rows)
    val bands = math.max(LshBands, math.min(32,
      math.ceil(math.log(1.0 - designRecall) / math.log(1.0 - pBand)).toInt))
    (bands, rows)
  }

  /** [[lshCosinePairs]] with an explicit (bands × rowsPerBand) shape.
    * Band j's key is built from its own plane slice
    * (planes j·r .. j·r+r−1, bit i weighted 2^i) — at (4, 4) this is
    * bit-identical to the fixed packed-signature contract, which the
    * spec pins; beyond it the per-band keys avoid packing more than 64
    * bits into one long.
    */
  def lshCosinePairsScaled(df: DataFrame, idCol: String, vecCol: String,
      minCos: Double, bands: Int, rowsPerBand: Int): DataFrame = {
    val planes = hyperplanesN(bands * rowsPerBand)
    val base = withNorm(
      df.select(col(idCol).as("id"), col(vecCol).as("v")), "v", "n")
    val keys = GraftBridge.column(graft.functions.LshBandKeys(
      GraftBridge.expression(col("v")), planes, rowsPerBand))
    val bandRows = base.select(col("id"),
      posexplode(keys).as(Seq("band", "key")))
    verifyCandidates(base, bandRows, minCos)
  }

  /** LSH-bucketed near-dup pairs — the corpus-scale path for
    * [[cosinePairs]]: candidates share at least one signature band
    * (shuffle-join on small keys, no n² product), verified by exact
    * cosine. Approximate: recall vs. the exact pass is asserted in
    * PipelineSpec; raise [[PipelineParams.LshBands]] to trade shuffle
    * volume for recall.
    */
  def lshCosinePairs(df: DataFrame, idCol: String, vecCol: String,
      minCos: Double = CosineNearDup): DataFrame = {
    val base = withNorm(
      df.select(col(idCol).as("id"), col(vecCol).as("v")), "v", "n")
    // band rows are (id, band, key) ONLY — the banded self-join and the
    // candidate distinct never shuffle the embedding arrays; vectors
    // join back per candidate id below, where ReuseExchange computes the
    // norm'd projection once for both sides. Keys come from the native
    // [[graft.functions.LshBandKeys]] kernel — bit-identical to the
    // packed [[signature]]/shiftright formulation (same planes, same
    // >= 0 rule, same 2^i weights; spec-pinned), without the
    // interpreted aggregate/zip_with lambda per plane per row.
    val bands = base.select(col("id"), posexplode(
        GraftBridge.column(graft.functions.LshBandKeys(
          GraftBridge.expression(col("v")), hyperplanes, LshRowsPerBand)))
        .as(Seq("band", "key")))
    verifyCandidates(base, bands, minCos)
  }

  /** Shared tail of the banded paths: self-join the narrow
    * (id, band, key) rows, dedup candidate pairs, then verify by exact
    * cosine with the vectors joined back per id.
    */
  private def verifyCandidates(base: DataFrame, bands: DataFrame,
      minCos: Double): DataFrame = {
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id")).distinct()
    val withA = cand.join(base, cand("a_id") === base("id"))
      .select(col("a_id"), col("b_id"), col("v").as("va"), col("n").as("na"))
    withA.join(base, withA("b_id") === base("id"))
      .withColumn("cos",
        round(dot(col("va"), col("v")) / (col("na") * col("n")), 6))
      .filter(col("cos") >= minCos)
      .select("a_id", "b_id", "cos")
  }

  /** IVF (inverted-file) approximate top-k — the partition-pruned ANN
    * path: a small centroid set splits the corpus into inverted lists
    * (each vector joins its nearest centroid's list, chosen by
    * max-cosine with centroid-id tie-break); a query is re-ranked by
    * exact cosine against only the lists of its `nprobe` nearest
    * centroids, so the scanned fraction is ~nprobe/numCentroids of the
    * corpus instead of all of it.
    *
    * Centroids here are the deterministic stride rule
    * ([[PipelineParams.IvfCentroidStride]]) so the differential oracle
    * can rebuild the identical index; production k-means centroids
    * drop into the same plan by swapping the centroid frame.
    *
    * Scale shape: centroids broadcast (K rows); corpus assignment is a
    * map-side `max_by` aggregation — no corpus shuffle for the argmax —
    * followed by one hash join on centroid id. With K ~ sqrt(n) the
    * lists stay balanced; AQE skew-split covers hot lists.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int = TopK, stride: Int = IvfCentroidStride,
      numCentroids: Int = IvfCentroids, nprobe: Int = IvfNProbe): DataFrame = {
    val cent = withNorm(
      corpus.filter(col(idCol) % stride === 0 &&
          col(idCol) < stride.toLong * numCentroids)
        .select(col(idCol).as("cid"), col(vecCol).as("cv")), "cv", "cn")

    def centScored(df: DataFrame, id: String, vec: String, n: String) =
      withNorm(df.select(col(idCol).as(id), col(vecCol).as(vec)), vec, n)
        .crossJoin(broadcast(cent))
        .withColumn("ccos",
          round(dot(col(vec), col("cv")) / (col(n) * col("cn")), 6))

    // corpus → nearest centroid: partial-aggregated argmax, not a window
    val assigned = centScored(corpus, "neighbor_id", "nv", "nn")
      .groupBy(col("neighbor_id"))
      .agg(max_by(col("cid"), struct(col("ccos"), (-col("cid")).as("nc")))
          .as("cid"),
        any_value(col("nv")).as("nv"), any_value(col("nn")).as("nn"))

    // query → nprobe nearest centroids (query set is small: window fine)
    val wProbe = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("ccos").desc, col("cid"))
    val probes = centScored(queries, "query_id", "qv", "qn")
      .withColumn("crn", row_number().over(wProbe))
      .filter(col("crn") <= nprobe)
      .select(col("query_id"), col("qv"), col("qn"), col("cid"))

    val candidates = probes.join(assigned,
        probes("cid") === assigned("cid") &&
          col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        round(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    candidates.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** IVF-PQ approximate top-k (Jégou, Douze & Schmid, TPAMI 2011 — the
    * FAISS `IVFPQ` shape): coarse inverted lists exactly as in
    * [[ivfTopK]], but the list entries carry only `m` PQ code bytes
    * instead of the vector — at 100 TB the candidate join moves
    * codes, not embeddings — and the re-rank is the asymmetric
    * distance (ADC) of the query vector to each candidate's codes.
    *
    * Codebooks use the deterministic stride rule (like the IVF
    * centroids) so the differential oracle rebuilds the identical
    * index; k-means codebooks drop into the same plan by swapping the
    * codebook rows. The driver holds m·pqK·(dim/m) doubles —
    * corpus-size independent.
    */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int = TopK, stride: Int = IvfCentroidStride,
      numCentroids: Int = IvfCentroids, nprobe: Int = IvfNProbe,
      m: Int = PqM, pqK: Int = PqK, pqStride: Int = PqStride): DataFrame = {
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
    val codebooks: Seq[Seq[Seq[Double]]] =
      (0 until m).map(j => cbRows.toSeq.map { case (_, v) =>
        v.slice(j * subDim, (j + 1) * subDim) })

    val cent = withNorm(
      corpus.filter(col(idCol) % stride === 0 &&
          col(idCol) < stride.toLong * numCentroids)
        .select(col(idCol).as("cid"), col(vecCol).as("cv")), "cv", "cn")
    def centScored(df: DataFrame, id: String, vec: String, n: String) =
      withNorm(df.select(col(idCol).as(id), col(vecCol).as(vec)), vec, n)
        .crossJoin(broadcast(cent))
        .withColumn("ccos",
          round(dot(col(vec), col("cv")) / (col(n) * col("cn")), 6))

    // inverted lists carry (cid, codes) — the vector is dropped after
    // encoding, which is the memory/shuffle win PQ exists for
    val assigned = centScored(corpus, "neighbor_id", "nv", "nn")
      .groupBy(col("neighbor_id"))
      .agg(max_by(col("cid"), struct(col("ccos"), (-col("cid")).as("nc")))
          .as("cid"),
        any_value(col("nv")).as("nv"))
      .withColumn("codes", GraftBridge.column(graft.functions.PqEncode(
        GraftBridge.expression(col("nv")), codebooks)))
      .drop("nv")

    val wProbe = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("ccos").desc, col("cid"))
    val probes = centScored(queries, "query_id", "qv", "qn")
      .withColumn("crn", row_number().over(wProbe))
      .filter(col("crn") <= nprobe)
      .select(col("query_id"), col("qv"), col("cid"))

    val candidates = probes.join(assigned,
        probes("cid") === assigned("cid") &&
          col("query_id") =!= col("neighbor_id"))
      .withColumn("dist", GraftBridge.column(graft.functions.PqAdc(
        GraftBridge.expression(col("qv")),
        GraftBridge.expression(col("codes")), codebooks)))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("dist").asc, col("neighbor_id"))
    candidates.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("dist"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al., arXiv:2303.09540):
    * cluster embeddings around a small centroid set, then mark a
    * document as a semantic duplicate if its cosine to a LOWER-id
    * member of the same cluster is ≥ `tau` — one representative per
    * semantic near-dup set survives (the lowest id), and the pairwise
    * comparison never leaves a cluster, which is the whole point: the
    * quadratic term is Σ|cluster|², not n².
    *
    * Centroids use the deterministic stride rule so the differential
    * oracle can rebuild the identical clustering (same trick as
    * [[ivfTopK]]); production k-means centroids drop into the same
    * plan. Scale shape: centroids broadcast, assignment is a map-side
    * argmax aggregation, then ONE shuffle on cluster id for the
    * in-cluster self-join. Grow `numCentroids` ~ n/⟨cluster⟩ to keep
    * cluster sizes bounded as the corpus grows. Recall is clustering-
    * local by design (a cross-cluster near-dup pair is not a semantic
    * duplicate under SemDeDup's definition).
    *
    * Output: (id, cid, dup) — every input row, its cluster, and
    * whether it would be dropped.
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      tau: Double = CosineNearDup, stride: Int = IvfCentroidStride,
      numCentroids: Int = IvfCentroids,
      centroids: Option[DataFrame] = None): DataFrame = {
    val cent = withNorm(
      centroids.getOrElse(
        df.filter(col(idCol) % stride === 0 &&
            col(idCol) < stride.toLong * numCentroids)
          .select(col(idCol).as("cid"), col(vecCol).as("cv"))),
      "cv", "cn")
    // nearest centroid by (round-6 cosine, lowest cid) — the argmax is
    // a partial-aggregated max_by, so the corpus is never shuffled for
    // the assignment itself
    val assigned = withNorm(
        df.select(col(idCol).as("id"), col(vecCol).as("v")), "v", "n")
      .crossJoin(broadcast(cent))
      .withColumn("ccos",
        round(dot(col("v"), col("cv")) / (col("n") * col("cn")), 6))
      .groupBy("id")
      .agg(max_by(col("cid"), struct(col("ccos"), (-col("cid")).as("nc")))
          .as("cid"),
        any_value(col("v")).as("v"), any_value(col("n")).as("n"))
    // in-cluster pairs only; both sides are the SAME projection keyed
    // by cid, so ReuseExchange materializes the assignment once
    val a = assigned.select(col("cid"), col("id").as("a_id"),
      col("v").as("av"), col("n").as("an"))
    val b = assigned.select(col("cid"), col("id").as("b_id"),
      col("v").as("bv"), col("n").as("bn"))
    val dupIds = a.join(b, "cid")
      .filter(col("a_id") < col("b_id"))
      .withColumn("cos",
        round(dot(col("av"), col("bv")) / (col("an") * col("bn")), 6))
      .filter(col("cos") >= tau)
      .select(col("b_id").as("id")).distinct()
    assigned.join(dupIds.withColumn("dup", lit(true)), Seq("id"), "left")
      .select(col("id"), col("cid"), coalesce(col("dup"), lit(false)).as("dup"))
  }

  /** Distributed Lloyd's k-means over embedding columns — the
    * production centroid path for [[semanticDedup]] and [[ivfTopK]]
    * (both accept any centroid frame; the stride rule is only the
    * oracle-reproducible default). Deterministic end to end: seeded
    * stride init, round-6 cosine argmax with lowest-cid tie-break,
    * and per-dimension means from exact sums in a fixed positional
    * order — repartitioning cannot change the result.
    *
    * Scale shape per iteration: centroids broadcast (K rows), the
    * assignment argmax is map-side partial-aggregated, and the
    * centroid update is ONE shuffle of (cid, pos, value) triples —
    * O(n·d) rows but map-side combined to O(K·d) per partition before
    * the exchange. K·d accumulators per executor core, never the
    * corpus.
    *
    * The per-dimension accumulation quantizes each component to the
    * dyadic 2^-24 grid (x·2^24 is an exact double product for float
    * inputs; round-half-away ties match across engines) and sums the
    * resulting LONGs — exact, hence order-independent:
    * partition-invariance holds by construction, not by luck, and the
    * whole loop is portable enough for a bit-exact differential oracle
    * (`q_sim_kmeans`). The grid sits at/below float ulp for |x| ≥ 0.5,
    * so the quantization is lossless there and sub-ulp elsewhere.
    *
    * Returns the refined centroid frame (cid, cv).
    */
  def kmeans(df: DataFrame, idCol: String, vecCol: String,
      k: Int = IvfCentroids, iters: Int = 3,
      stride: Int = IvfCentroidStride): DataFrame = {
    var cent = df.filter(col(idCol) % stride === 0 &&
        col(idCol) < stride.toLong * k)
      .select(col(idCol).as("cid"), col(vecCol).as("cv"))
    var i = 0
    while (i < iters) {
      cent = kmeansStep(df, idCol, vecCol, cent)
        .localCheckpoint(eager = true)
      i += 1
    }
    cent
  }

  /** One Lloyd iteration (exposed for the plan-quality lock): returns
    * the refined centroid frame for the given centroids.
    */
  private[graft] def kmeansStep(df: DataFrame, idCol: String,
      vecCol: String, cent: DataFrame): DataFrame = {
    val cn = withNorm(cent, "cv", "cn")
    val assigned = withNorm(
        df.select(col(idCol).as("id"), col(vecCol).as("v")), "v", "n")
      .crossJoin(broadcast(cn))
      .withColumn("ccos",
        round(dot(col("v"), col("cv")) / (col("n") * col("cn")), 6))
      .groupBy("id")
      .agg(max_by(col("cid"), struct(col("ccos"), (-col("cid")).as("nc")))
          .as("cid"),
        any_value(col("v")).as("v"))
    // per-dimension mean: positional explode, map-side-combined sums
    assigned
      .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("cid", "pos")
      .agg(sum(round(col("x").cast("double") * 16777216.0)
          .cast("long")).as("sx"),
        count(lit(1)).as("cnt"))
      .withColumn("m",
        (col("sx").cast("double") / (col("cnt") * 16777216.0))
          .cast("float"))
      .groupBy("cid")
      .agg(array_sort(collect_list(struct(col("pos"), col("m"))))
        .as("pm"))
      .select(col("cid"), expr("transform(pm, p -> p.m)").as("cv"))
  }

  /** Hyperplane-LSH bit signature: bit i = sign(v · plane_i). Planes
    * are deterministic ([[PipelineParams.hyperplanes]]).
    */
  def signature(v: String): Column = {
    val planes = hyperplanes.map(p => sparkDoubleArray(p))
    val bits = planes.zipWithIndex.map { case (p, i) =>
      s"""CASE WHEN aggregate(zip_with($v, $p,
         |  (x, y) -> cast(x as double) * y), 0D, (a, b) -> a + b) >= 0
         |  THEN ${1L << i} ELSE 0L END""".stripMargin
    }
    expr(bits.mkString("(", " + ", ")"))
  }

  /** LSH-bucketed approximate top-k: candidates are corpus vectors
    * sharing at least one signature BAND with the query (union over
    * [[PipelineParams.LshBands]] bands), re-ranked by exact cosine
    * within the candidate set. Shuffle-join on small band keys; the
    * corpus product never materializes. Recall vs. the exact baseline
    * is asserted in SimilaritySpec.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int = TopK): DataFrame = {
    // native band keys (see [[lshCosinePairs]]): bit-identical to the
    // packed signature + shiftright extraction, no interpreted lambdas
    def bandRows(df: DataFrame, id: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as("__v"))
        .select(col(id), posexplode(
          GraftBridge.column(graft.functions.LshBandKeys(
            GraftBridge.expression(col("__v")), hyperplanes, LshRowsPerBand)))
          .as(Seq("band", "key")))

    // candidate ids from narrow (id, band, key) rows; embeddings join
    // back after the distinct, so band shuffle and dedup never carry
    // the arrays
    val cand = bandRows(queries, "query_id").join(
        bandRows(corpus, "neighbor_id"),
        Seq("band", "key"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id")).distinct()

    val q = withNorm(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv")), "qv", "qn")
    val c = withNorm(corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cv")), "cv", "cn")
    val candidates = cand.join(broadcast(q), "query_id")
      .join(c, "neighbor_id")
      .withColumn("cos",
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    candidates.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }
}
