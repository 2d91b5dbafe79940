package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer TRAINING (Sennrich et al.,
  * "Neural Machine Translation of Rare Words with Subword Units",
  * arXiv:1508.07909 §3.2) — the vocabulary-construction step of a
  * training-data pipeline, re-expressed Spark-first.
  *
  * The classic implementation trains over an in-memory word-frequency
  * dict; the Spark-native shape keeps that structure but distributes
  * it: ONE corpus-wide map-side-combined word count (the only shuffle
  * that touches corpus bytes), then each merge iteration runs over the
  * (word, freq, symbols) VOCAB table — orders of magnitude smaller
  * than the corpus — as an adjacent-pair explode + count + global
  * argmax. The merge table (the model, ≤ numMerges rows) is the only
  * thing the driver holds.
  *
  * Determinism contract: the best pair is (max total freq, then
  * lexicographically smallest pair) — ties never depend on partition
  * order, so training is reproducible run-to-run and matches the
  * sequential reference implementation token-for-token (PipelineSpec
  * proves this differentially).
  *
  * Simplification vs Sennrich: no end-of-word marker symbol — words
  * are pre-split (GPT-2-style pre-tokenization), tokens never cross a
  * word boundary, and decode is the plain concatenation of a word's
  * tokens, so `concat(encode(w)) == w` exactly (the judged roundtrip).
  */
object Bpe {

  /** One BPE merge: adjacent symbol pair (a, b) → merged symbol a+b. */
  type Merge = (String, String)

  /** Train `numMerges` merges over the whitespace-lowered words of
    * `textCol`. Stops early when no adjacent pair occurs at least
    * `minPairFreq` times (default 2 — merging a pair that occurs once
    * can never help compression).
    */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      minPairFreq: Long = 2L): Seq[Merge] = {
    require(numMerges >= 0)
    val words = df
      .select(explode(TextOps.words(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
    // symbols start as single characters; expression-built (no UDF)
    var cur = words.select(col("freq"),
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
          .as("syms"))
      .localCheckpoint(true)

    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var exhausted = false
    while (merges.size < numMerges && !exhausted) {
      val pairs = cur
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
      // global argmax with a total tie-break — one tiny driver fetch of
      // a single row per iteration, never the vocab
      val best = pairs.orderBy(desc("cnt"), asc("a"), asc("b"))
        .limit(1).collect()
      if (best.isEmpty || best(0).getLong(2) < minPairFreq) exhausted = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        merges += ((a, b))
        // left-to-right greedy merge of (a,b) inside every word: a fold
        // that rebuilds the symbol array, replacing the last element
        // when it is `a` and the incoming one is `b` — identical to the
        // reference's non-overlapping scan ("aaa" + (a,a) -> ["aa","a"])
        val merged = aggregate(col("syms"),
          array().cast("array<string>"),
          (acc, s) => when(
            size(acc) > 0 && element_at(acc, -1) === lit(a) && s === lit(b),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
            .otherwise(concat(acc, array(s))))
        // checkpoint truncates the per-iteration lineage (the vocab
        // table is small; K materializations, not K-deep plans)
        cur = cur.withColumn("syms", merged).localCheckpoint(true)
      }
    }
    merges.toSeq
  }

  /** Tokenize `textCol` with a trained merge table: one token array per
    * word (scan-local native expression, no shuffle). See
    * [[graft.functions.BpeEncode]].
    */
  def encodeWord(word: org.apache.spark.sql.Column,
      merges: Seq[Merge]): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftBridge.column(graft.functions.BpeEncode(
      org.apache.spark.sql.GraftBridge.expression(word), merges))
}
