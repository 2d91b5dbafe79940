package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed WordPiece tokenizer training (Schuster & Nakajima,
  * "Japanese and Korean Voice Search", ICASSP 2012 — the BERT
  * vocabulary builder), completing the tokenizer family next to
  * [[Bpe]] and [[Unigram]].
  *
  * Same Spark shape as BPE training — ONE corpus-wide word count is
  * the only shuffle touching corpus bytes; every iteration then runs
  * over the small (word, freq, symbols) vocab table — but the merge
  * objective is the likelihood ratio score
  * `count(ab) / (count(a) · count(b))` instead of raw pair frequency,
  * so each iteration adds one bounded unit-count aggregate and two
  * broadcast joins of that (≤ alphabet + merges)-row table onto the
  * pair counts. The driver only ever holds the vocabulary.
  *
  * Symbols carry BERT's `##` continuation convention: the first
  * character of a word is plain, every later one is `##`-prefixed,
  * and merging (a, b) concatenates a with b minus its `##`.
  *
  * Determinism: best pair = (max score, then lexicographically
  * smallest (a, b)) — reproducible and equal to the sequential
  * reference (PipelineSpec proves it merge-for-merge).
  */
object WordPiece {

  /** Train and return the vocabulary: the initial alphabet (sorted)
    * followed by the merged pieces in creation order.
    */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      minPairFreq: Long = 2L): Seq[String] = {
    require(numMerges >= 0)
    val words = df
      .select(explode(TextOps.words(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
    var cur = words.select(col("freq"),
        expr("""transform(sequence(1, length(w)), i ->
          |  CASE WHEN i = 1 THEN substring(w, 1, 1)
          |       ELSE '##' || substring(w, i, 1) END)""".stripMargin)
          .as("syms"))
      .localCheckpoint(true)
    val alphabet = cur.select(explode(col("syms")).as("s"))
      .distinct().orderBy("s").collect().map(_.getString(0)).toSeq

    val merges = scala.collection.mutable.ArrayBuffer.empty[String]
    var exhausted = false
    while (merges.size < numMerges && !exhausted) {
      val units = cur.select(explode(col("syms")).as("s"), col("freq"))
        .groupBy("s").agg(sum("freq").as("ucnt"))
      val pairs = cur
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
      // minPairFreq FILTERS candidates (the likelihood score favors
      // rare pairs — a hapax pair scores 1.0 and would otherwise top
      // the ranking and stop training while frequent merges remain)
      val scored = pairs
        .filter(col("cnt") >= minPairFreq)
        .join(broadcast(units.select(col("s").as("a"),
          col("ucnt").as("ca"))), "a")
        .join(broadcast(units.select(col("s").as("b"),
          col("ucnt").as("cb"))), "b")
        .withColumn("score", col("cnt").cast("double") /
          (col("ca").cast("double") * col("cb").cast("double")))
      val best = scored.orderBy(desc("score"), asc("a"), asc("b"))
        .limit(1).select("a", "b", "cnt").collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        val m = a + (if (b.startsWith("##")) b.substring(2) else b)
        merges += m
        val merged = aggregate(col("syms"),
          array().cast("array<string>"),
          (acc, s) => when(
            size(acc) > 0 && element_at(acc, -1) === lit(a) && s === lit(b),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(m))))
            .otherwise(concat(acc, array(s))))
        cur = cur.withColumn("syms", merged).localCheckpoint(true)
      }
    }
    alphabet ++ merges.toSeq
  }

  /** Greedy longest-match-first encoding of one word column against a
    * trained vocabulary (the standard WordPiece inference — NOT a
    * merge replay); a word with any unmatchable position becomes the
    * single `unk` token. Scan-local, no shuffle.
    */
  def encodeWord(word: Column, vocab: Seq[String],
      unk: String = "[UNK]"): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.WordPieceEncode(
        org.apache.spark.sql.GraftBridge.expression(word), vocab, unk))
}
