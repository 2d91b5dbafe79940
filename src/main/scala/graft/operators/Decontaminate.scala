package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag corpus documents that share any
  * word n-gram with an evaluation/benchmark set — the standard
  * pre-training hygiene step that keeps eval answers out of the
  * training corpus (the n-gram-overlap rule used by GPT-3 appendix C /
  * The Pile / Dolma; n wider than the dedup shingle so incidental
  * 3-gram collisions don't flag whole documents).
  *
  * Scale shape (the only one that works at 100 TB corpus × MB-scale
  * benchmark): the benchmark side is exploded to DISTINCT n-grams and
  * broadcast — eval suites are tiny compared to the corpus, so the
  * corpus is read ONCE, streamed through a broadcast hash join with
  * zero corpus-side shuffle before the final per-doc count, whose
  * map-side partial aggregation reduces shuffle volume to one row per
  * contaminated (doc, partition). No driver materialization; the
  * benchmark never leaves executor memory once broadcast.
  */
object Decontaminate {
  import PipelineParams._

  /** Per-corpus-document contamination report:
    * (id, contaminated_ngrams, contaminated). `contaminated_ngrams`
    * counts DISTINCT corpus-doc n-grams that appear anywhere in the
    * benchmark set; 0 ⇒ the doc is clean and safe to train on.
    */
  def scan(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String,
      n: Int = DecontamN): DataFrame = {
    val grams = benchmark
      .withColumn("__ws", TextOps.words(col(benchTextCol)))
      .select(explode(TextOps.shingles("__ws", n)).as("g"))
      .distinct()
      .withColumn("__hit", lit(1))
    corpus
      .withColumn("__ws", TextOps.words(col(textCol)))
      // shingles() is already distinct per doc, so count(__hit) below
      // counts distinct overlapping n-grams
      .select(col(idCol).as("id"),
        explode_outer(TextOps.shingles("__ws", n)).as("g"))
      .join(broadcast(grams), Seq("g"), "left")
      .groupBy("id")
      .agg(count(col("__hit")).as("contaminated_ngrams"))
      .withColumn("contaminated", col("contaminated_ngrams") > 0)
  }
}
