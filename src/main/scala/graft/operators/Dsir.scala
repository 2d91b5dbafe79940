package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data Selection with Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169 — DSIR): select raw-corpus documents whose hashed
  * n-gram distribution looks like a target domain. Both corpora are
  * reduced to bucket counts over a FIXED hashed-bigram feature space;
  * each bucket gets the log likelihood ratio
  * λ(b) = ln p̂_target(b) − ln p̂_raw(b) (Laplace-smoothed); a
  * document's importance weight is the sum of λ over its bigram
  * occurrences, and the top-k by weight are selected.
  *
  * Scale shape: the feature space is `buckets`-bounded, so the λ table
  * is broadcastable no matter the corpus size; scoring is one
  * scan-local explode + a broadcast join + ONE map-side-combined
  * aggregation; selection is a global top-k (TakeOrdered — no serial
  * window) whose ids broadcast back as the `selected` flag. Nothing
  * corpus-sized reaches the driver.
  *
  * Determinism: buckets come from the portable 60-bit md5 hash, counts
  * are exact integers, each λ is two ln's on engine-identical doubles
  * quantized to integer MICRO-units — floor(x·1e6 + 0.5) as BIGINT,
  * the [[Graph.pageRank]] contract: only exactly-rounded IEEE ops, no
  * double→DECIMAL cast whose rounding rule could vary across engine
  * builds — and the per-doc BIGINT sum is order-independent — so the
  * DuckDB oracle rebuilds the whole pipeline and matches
  * hash-for-hash.
  */
object Dsir {
  import PipelineParams._

  /** Hashed-bigram bucket counts of a corpus: (b, cnt), plus one total
    * row is derived by the caller. One exploded aggregation, output
    * bounded by `buckets`.
    */
  private def bucketCounts(df: DataFrame, textCol: String,
      buckets: Int): DataFrame =
    df.withColumn("__ws", TextOps.words(col(textCol)))
      .select(explode(TextOps.bigrams("__ws")).as("g"))
      .select((TextOps.hash60(col("g")) % buckets).as("b"))
      .groupBy("b").agg(count(lit(1)).as("cnt"))

  /** λ table: (b, lam_u BIGINT micro-units) over the union of buckets
    * either corpus touched, with Laplace(+1) smoothing over `buckets`
    * cells. Bounded at `buckets` rows — broadcastable at any corpus
    * size.
    */
  def importanceTable(target: DataFrame, raw: DataFrame, textCol: String,
      buckets: Int = DsirBuckets): DataFrame = {
    val tc = bucketCounts(target, textCol, buckets)
      .withColumnRenamed("cnt", "ct")
    val rc = bucketCounts(raw, textCol, buckets)
      .withColumnRenamed("cnt", "cr")
    val tn = tc.agg(sum("ct").as("nt"))
    val rn = rc.agg(sum("cr").as("nr"))
    tc.join(rc, Seq("b"), "full_outer")
      .crossJoin(broadcast(tn)).crossJoin(broadcast(rn))
      .select(col("b"),
        floor((log((coalesce(col("ct"), lit(0L)) + lit(1L)).cast("double") /
            (col("nt") + lit(buckets))) -
          log((coalesce(col("cr"), lit(0L)) + lit(1L)).cast("double") /
            (col("nr") + lit(buckets)))) * lit(1e6) + lit(0.5))
          .cast("long").as("lam_u"))
  }

  /** Per-document importance weights + top-`keep` selection flag:
    * (id, n_grams, importance_u BIGINT micro-units, selected). Documents
    * under 2 words carry no bigrams and are absent (nothing to
    * estimate a ratio from — same posture as the perplexity scorer).
    */
  def select(raw: DataFrame, idCol: String, textCol: String,
      lam: DataFrame, keep: Int = DsirKeep,
      buckets: Int = DsirBuckets): DataFrame = {
    val scored = raw.withColumn("__ws", TextOps.words(col(textCol)))
      .select(col(idCol).as("id"), explode(TextOps.bigrams("__ws")).as("g"))
      .select(col("id"), (TextOps.hash60(col("g")) % buckets).as("b"))
      .join(broadcast(lam), Seq("b"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_grams"),
        sum("lam_u").as("importance_u"))
    val top = scored.orderBy(col("importance_u").desc, col("id").asc)
      .limit(keep).select(col("id"), lit(true).as("__sel"))
    scored.join(broadcast(top), Seq("id"), "left")
      .withColumn("selected", coalesce(col("__sel"), lit(false)))
      .drop("__sel")
  }
}
