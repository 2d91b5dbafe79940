package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text relevance retrieval over a document corpus: Okapi BM25
  * scoring with per-query top-k (Robertson & Zaragoza 2009, "The
  * Probabilistic Relevance Framework: BM25 and Beyond") — the lexical
  * search leg a curation/RAG pipeline runs next to the embedding ANN
  * operators in [[Similarity]].
  *
  * Spark-native shape: one tokenize pass feeds the per-(doc, term)
  * tf aggregation; document frequency and document length derive from
  * it with map-side-combined aggregations; the corpus-level (N, avgdl)
  * is a ONE-ROW frame cross-joined in (a broadcast, not a driver
  * collect). Query terms broadcast into the postings join, so the
  * per-query candidate set is bounded by the posting lists of its
  * terms — there is no corpus × queries product and no inverted index
  * on the driver. Top-k is a per-query window over those bounded
  * candidates. The wide exchanges are the linear aggregations plus one
  * hash join keyed by term and one by doc id — all O(corpus tokens),
  * all skew-tolerant (AQE splits a hot term's postings).
  *
  * Determinism contract (the DuckDB oracle recomputes scores): each
  * per-(doc, term) contribution is built from the SAME expression tree
  * with the same double literals on both engines, so per-row IEEE
  * arithmetic is bit-identical, then quantized to an integer MICRO-unit
  * BIGINT via floor(x·1e6 + 0.5) (the [[Graph.pageRank]] contract —
  * exactly-rounded IEEE ops only, no double→DECIMAL cast whose
  * rounding rule is an engine-build property); the cross-term
  * accumulation is an order-independent BIGINT sum; ranking uses the
  * exact integer score with doc-id tie-break.
  */
object Search {
  import PipelineParams._

  /** BM25 top-k: `queries` is a (query id, query text) frame — small
    * relative to the corpus (it broadcasts). Returns one row per
    * (query_id, doc id) in the query's top `k`, with the exact integer
    * micro-unit score `sd` and the 1-based rank.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, queryTextCol: String,
      k: Int = Bm25TopK, k1: Double = Bm25K1, b: Double = Bm25B): DataFrame = {
    val tok = docs.select(col(idCol).as("id"),
      explode(TextOps.words(col(textCol))).as("w"))
    val tf = tok.groupBy("id", "w").agg(count(lit(1)).as("tf"))
    val dl = tok.groupBy("id").agg(count(lit(1)).as("dl"))
    // term df counts distinct docs: tf already has one row per (doc,
    // term), so a plain count is the document frequency
    val dfreq = tf.groupBy("w").agg(count(lit(1)).as("df"))
    // explicit sum/count (not avg) so the oracle's avgdl is the same
    // exact-integer-sum-over-count division
    val corpus = dl.agg(count(lit(1)).as("n"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val qterms = queries.select(col(queryIdCol).as("query_id"),
      explode(array_distinct(TextOps.words(col(queryTextCol)))).as("w"))
    // postings for query terms only — broadcast the query side first so
    // the df/dl joins run on the bounded candidate set
    val idf = log(lit(1.0) +
      (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val denom = col("tf") + lit(k1) *
      (lit(1.0 - b) + (lit(b) * col("dl")) / col("avgdl"))
    val contrib = floor((idf * ((col("tf") * lit(k1 + 1)) / denom)) *
      lit(1e6) + lit(0.5)).cast("long")
    val scored = tf
      .join(broadcast(qterms), "w")
      .join(dfreq, "w")
      .join(dl, "id")
      .crossJoin(broadcast(corpus))
      .withColumn("c", contrib)
      .groupBy("query_id", "id")
      .agg(sum(col("c")).as("sd"))
    val rk = row_number().over(
      Window.partitionBy("query_id").orderBy(col("sd").desc, col("id")))
    scored.withColumn("rk", rk.cast("long")).filter(col("rk") <= k)
  }

  /** Reciprocal Rank Fusion (Cormack, Clarke & Büttner, SIGIR 2009):
    * merge per-query rankings from heterogeneous retrieval legs
    * (lexical BM25, vector ANN, …) by summing 1/(k0 + rank) per leg
    * (quantized to integer PICO-units — no libm anywhere, so the
    * quantized value is bit-identical in any engine) —
    * the standard hybrid-search combiner, score-scale-free by
    * construction. Each leg frame is (query_id, id, rank); output is
    * the per-query top-`topK` by (rrf desc, id) with the exact integer
    * pico-unit fused score and the number of contributing legs.
    *
    * Scale shape: the legs are already per-query top-k (bounded), so
    * the union + one (query_id, id) aggregation + one query-partitioned
    * window all run on candidate-sized data, never the corpus.
    */
  def rrfFuse(legs: Seq[DataFrame], topK: Int,
      k0: Double = 60.0): DataFrame = {
    require(legs.nonEmpty)
    val contribs = legs.map(_.select(col("query_id"), col("id"),
      floor((lit(1.0) / (lit(k0) + col("rank"))) * lit(1e12) + lit(0.5))
        .cast("long").as("c")))
    val fused = contribs.reduce(_ unionAll _)
      .groupBy("query_id", "id")
      .agg(sum("c").as("rrf"), count(lit(1)).cast("int").as("legs"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf").desc, col("id"))
    fused.withColumn("hybrid_rank", row_number().over(w).cast("long"))
      .filter(col("hybrid_rank") <= topK)
  }
}
