package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer training (Kudo 2018, "Subword
  * Regularization: Improving Neural Network Translation Models with
  * Multiple Subword Candidates" — the SentencePiece unigram model),
  * the second of the two tokenizers real pretraining pipelines train
  * (next to [[Bpe]]): seed a large substring pool, then alternate
  * Viterbi-EM re-estimation with pruning until the vocabulary reaches
  * its target size.
  *
  * Spark-native shape, sized for a 100 TB corpus: the corpus is
  * scanned ONCE into the (word, freq) table — every later pass runs
  * over that vocabulary-bounded table, not the corpus. Seeding is one
  * substring-explode aggregation (map-side combined; substring count
  * per word is O(len·maxPieceLen)); each EM round is one scan-local
  * Viterbi segmentation ([[graft.functions.UnigramSegment]], the
  * current model rides inside the expression) plus one piece-count
  * aggregation whose result is at most the CURRENT vocabulary — only
  * those bounded counts ever reach the driver. No corpus-sized state,
  * no driver-side corpus loop.
  *
  * Determinism: counts are exact integers; every ordering carries a
  * total (count desc, piece asc) tie-break; Viterbi ties prefer the
  * longer final piece; log-probabilities are ln(cnt/total) on the
  * driver — so training is reproducible bit-for-bit and PipelineSpec
  * proves it equal, round-for-round, to an independent sequential
  * reference implementation.
  */
object Unigram {
  import PipelineParams._

  /** Trained model: (piece, ln p(piece)), sorted (piece asc); contains
    * every single character seen in training plus the surviving
    * multi-character pieces.
    */
  def train(df: DataFrame, textCol: String,
      vocabSize: Int = UnigramVocab, seedSize: Int = UnigramSeedSize,
      maxPieceLen: Int = UnigramMaxPiece, emIters: Int = UnigramEmIters,
      shrink: Double = UnigramShrink): Seq[(String, Double)] = {
    require(vocabSize > 0 && seedSize > 0 && maxPieceLen >= 1)
    val words = df.select(explode(TextOps.words(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .localCheckpoint(true) // reused by seeding + every EM round

    // seed pool: every substring occurrence up to maxPieceLen wide,
    // weighted by word frequency — one exploded aggregation
    val subs = words.select(col("freq"), explode(expr(
      s"""flatten(transform(sequence(1, length(w)),
         |  s -> transform(sequence(s, least(length(w), s + ${maxPieceLen - 1})),
         |    e -> substring(w, s, e - s + 1))))""".stripMargin)).as("p"))
      .groupBy("p").agg(sum("freq").as("cnt"))
      .localCheckpoint(true)
    // alphabet (bounded by the character set) — always kept
    val singles: Seq[(String, Long)] = subs
      .filter(length(col("p")) === 1)
      .orderBy(desc("cnt"), asc("p"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    // multi-char candidates: top `seedSize` (bounded, driver-safe)
    var multis: Seq[(String, Long)] = subs
      .filter(length(col("p")) >= 2)
      .orderBy(desc("cnt"), asc("p")).limit(seedSize)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq

    val multiTarget = math.max(0, vocabSize - singles.size)
    def model(sing: Seq[(String, Long)],
        mult: Seq[(String, Long)]): Seq[(String, Double)] = {
      val total = (sing.iterator ++ mult.iterator).map(_._2).sum
      (sing.iterator ++ mult.iterator)
        .map { case (p, c) => p -> math.log(c.toDouble / total) }
        .toSeq.sortBy(_._1)
    }

    var curSingles = singles
    var vocab = model(curSingles, multis)
    var iter = 0
    while (iter < emIters) {
      // E-step: Viterbi piece counts over the word table (scan-local
      // segmentation, one bounded aggregation)
      val counts: Map[String, Long] = words
        .select(col("freq"), explode(segment(col("w"), vocab,
          maxPieceLen)).as("p"))
        .groupBy("p").agg(sum("freq").as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // M-step + prune: singles always survive (count floor 1 keeps
      // ln finite); multis shrink toward the target on (cnt desc, p)
      curSingles = curSingles.map { case (p, _) =>
        p -> math.max(counts.getOrElse(p, 0L), 1L)
      }
      val keep =
        if (iter == emIters - 1) multiTarget
        else math.max(multiTarget, (multis.size * shrink).floor.toInt)
      multis = multis.map { case (p, _) => p -> counts.getOrElse(p, 0L) }
        .filter(_._2 > 0)
        .sortBy { case (p, c) => (-c, p) }
        .take(keep)
      vocab = model(curSingles, multis)
      iter += 1
    }
    vocab
  }

  /** Viterbi-encode one word column with a trained model. */
  def segment(word: Column, vocab: Seq[(String, Double)],
      maxPieceLen: Int = UnigramMaxPiece): Column =
    org.apache.spark.sql.GraftBridge.column(graft.functions.UnigramSegment(
      org.apache.spark.sql.GraftBridge.expression(word), vocab,
      maxPieceLen, UnigramUnkScore))
}
