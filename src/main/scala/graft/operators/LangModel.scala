package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level n-gram language-model scoring — the cheap,
  * model-free quality signal pretraining pipelines use before any
  * neural filter: documents whose bigrams rarely occur in the corpus's
  * dominant bigram vocabulary are boilerplate, OCR noise, or wrong-
  * language text.
  *
  * Two-pass shape that survives 100 TB: pass 1 aggregates bigram
  * counts (one shuffle, map-side combined — bigram vocabulary, not
  * corpus size, bounds the shuffle) and keeps only the top-K model
  * bigrams (K fixed ⇒ bounded, broadcastable regardless of corpus
  * size); pass 2 re-reads the corpus once and scores each document
  * against the BROADCAST model with no corpus-side shuffle before the
  * final per-doc partial-aggregated count.
  */
object LangModel {
  import PipelineParams._

  /** Top-`k` corpus bigram model: (g, cnt), ordered by (cnt desc, g) —
    * the deterministic tie-break makes the model, and every score
    * derived from it, reproducible in the oracle.
    */
  def bigramModel(df: DataFrame, textCol: String,
      k: Int = LmModelK): DataFrame =
    df.withColumn("__ws", TextOps.words(col(textCol)))
      .select(explode(TextOps.bigrams("__ws")).as("g"))
      .groupBy("g").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("g")).limit(k)

  /** Per-document model coverage: (id, total_bigrams, covered_bigrams,
    * lm_coverage) where `lm_coverage` is the fraction of the doc's
    * bigram OCCURRENCES found in `model` (0.0 for docs under 2 words).
    * Integer counts plus one per-row division keep the differential
    * bit-exact.
    */
  def coverage(df: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame =
    df.withColumn("__ws", TextOps.words(col(textCol)))
      .select(col(idCol).as("id"),
        explode_outer(TextOps.bigrams("__ws")).as("g"))
      .join(broadcast(model.select(col("g"), lit(1).as("__hit"))),
        Seq("g"), "left")
      .groupBy("id")
      .agg(count(col("g")).as("total_bigrams"),
        count(col("__hit")).as("covered_bigrams"))
      .withColumn("lm_coverage",
        when(col("total_bigrams") > 0,
          col("covered_bigrams").cast("double") / col("total_bigrams"))
          .otherwise(lit(0.0)))
}
