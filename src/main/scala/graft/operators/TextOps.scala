package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text-analysis primitives for large-scale corpus
  * pipelines: tokenization, shingling, portable 60-bit hashing,
  * MinHash signatures, SimHash, language ID, quality stats, and
  * document fingerprints.
  *
  * Everything is built from `org.apache.spark.sql.functions` /
  * higher-order SQL functions — no UDFs — so expressions stay inside
  * Catalyst, get optimized (pushdown/pruning around them), and run on
  * executors with no driver involvement. Hashes derive from md5 so the
  * DuckDB differential oracle can reproduce them bit-for-bit
  * (graft.queries.Pipeline).
  */
object TextOps {
  import PipelineParams._

  /** Lower-cased whitespace tokens. */
  def words(text: Column): Column = split(lower(text), " ")

  /** Distinct `n`-word shingles ("a b c" style). `ws` is a SQL
    * fragment (usually a materialized column name) naming a
    * string-array value — splice-by-text because Spark 4 no longer
    * exposes Column→SQL for unresolved columns.
    */
  def shingles(w: String, n: Int = ShingleN): Column = {
    expr(
      s"""array_distinct(CASE WHEN size($w) >= $n
         |  THEN transform(sequence(0, size($w) - $n),
         |         i -> array_join(slice($w, i + 1, $n), ' '))
         |  ELSE array() END)""".stripMargin)
  }

  /** Portable 60-bit hash: first 15 hex chars of md5, as a long.
    * Fits a signed 64-bit integer exactly; identical in DuckDB as
    * `('0x' || substring(md5(x),1,15))::BIGINT`.
    */
  def hash60(e: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.Md5Hash60(
        org.apache.spark.sql.GraftBridge.expression(e.cast("string"))))

  /** Hash every element of a string array (for shingle/word sets). */
  def hashAll(a: String): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.Md5Hash60All(
        org.apache.spark.sql.GraftBridge.expression(expr(a))))

  /** MinHash signature (length [[PipelineParams.MinhashK]]) over a
    * hashed-shingle array: sig[i] = min over shingles of the i-th
    * affine permutation `(a_i*(h%P)+b_i) % P`. One pass per doc, all
    * in codegen-able builtin expressions.
    */
  def minhashSig(hs: String): Column = {
    val a = sparkLongArray(hashA)
    val b = sparkLongArray(hashB)
    expr(
      s"""transform(sequence(0, ${MinhashK - 1}), i ->
         |  array_min(transform($hs, h ->
         |    (element_at($a, i + 1) * (h % $P) + element_at($b, i + 1)) % $P)))""".stripMargin)
  }

  /** 60-bit SimHash over hashed words: bit b of the result is set when
    * the signed count of words having bit b set is non-negative.
    * Single pass over the word list (array-state fold), pure integer
    * arithmetic — reproducible in the oracle.
    */
  def simhash60(ws: String): Column = {
    val counts =
      s"""aggregate($ws, array_repeat(0L, $SimhashBits), (acc, h) ->
         |  zip_with(acc, sequence(0, ${SimhashBits - 1}), (c, b) ->
         |    c + CASE WHEN (shiftright(h, b) & 1) = 1 THEN 1 ELSE -1 END))""".stripMargin
    expr(
      s"""aggregate(
         |  zip_with($counts, sequence(0, ${SimhashBits - 1}), (c, b) ->
         |    CASE WHEN c >= 0 THEN shiftleft(1L, b) ELSE 0L END),
         |  0L, (x, y) -> x + y)""".stripMargin)
  }

  /** Whole-document fingerprint: md5 of the whitespace-normalized,
    * lower-cased text (exact-dup detection key).
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** Winnowing fingerprint (rolling k-gram hashes, window minima):
    * near-dup detection robust to local edits, unlike the exact md5
    * fingerprint. See [[graft.functions.WinnowSig]].
    */
  def winnowFingerprint(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(graft.functions.WinnowSig(
      org.apache.spark.sql.GraftBridge.expression(text)))

  // ---- quality / stats --------------------------------------------------

  def nChars(text: Column): Column = length(text)

  def nWords(ws: Column): Column = size(ws)

  /** Fraction of words found in `list`. */
  def wordRatio(w: String, list: Seq[String]): Column = {
    val arr = sparkStringArray(list)
    expr(s"size(filter($w, x -> array_contains($arr, x)))").cast("double") /
      expr(s"size($w)")
  }

  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[.,;:!?]"), lit(0)))

  /** BPE-ish token count: letter runs, single digits, other symbols. */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]|[^a-z0-9 ]"), lit(0)))

  def avgWordLen(w: String): Column =
    expr(s"aggregate(transform($w, x -> length(x)), 0L, (a, b) -> a + b)")
      .cast("double") / expr(s"size($w)")

  /** Overlapping word-window chunks: array of structs
    * (chunk_no, chunk_text) of `size` words every `stride` words —
    * the RAG/training prep split. Scan-local expression; pair with
    * `explode` for one row per chunk. The final partial window is
    * emitted iff it adds new words (stride < size ⇒ overlap).
    */
  def chunks(w: String, size: Int, stride: Int): Column = {
    require(size > 0 && stride > 0 && stride <= size,
      s"chunks: need 0 < stride <= size (got size=$size stride=$stride)")
    expr(
      s"""transform(
         |  sequence(0, greatest(0, cast(ceil((size($w) - $size)
         |    / cast($stride as double)) as int))),
         |  i -> struct(i as chunk_no,
         |    array_join(slice($w, i * $stride + 1, $size), ' ')
         |      as chunk_text))""".stripMargin)
  }

  /** Gopher-style repetition: fraction of word occurrences that repeat
    * an earlier word (1 − distinct/total).
    */
  def dupWordRatio(w: String): Column =
    lit(1.0) - expr(s"size(array_distinct($w))").cast("double") /
      expr(s"size($w)")

  /** Adjacent word bigrams ("a b"); empty below 2 words. */
  def bigrams(w: String): Column =
    expr(
      s"""CASE WHEN size($w) >= 2
         |  THEN transform(sequence(0, size($w) - 2),
         |    i -> concat(element_at($w, i + 1), ' ', element_at($w, i + 2)))
         |  ELSE array() END""".stripMargin)

  /** Shannon character entropy (nats, DECIMAL(38,6)) — see
    * [[graft.functions.CharEntropy]]; null for empty text.
    */
  def charEntropy(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(graft.functions.CharEntropy(
      org.apache.spark.sql.GraftBridge.expression(text)))

  /** Adjacent word trigrams ("a b c"); empty below 3 words. */
  def trigrams(w: String): Column =
    expr(
      s"""CASE WHEN size($w) >= 3
         |  THEN transform(sequence(0, size($w) - 3),
         |    i -> concat(element_at($w, i + 1), ' ', element_at($w, i + 2),
         |      ' ', element_at($w, i + 3)))
         |  ELSE array() END""".stripMargin)

  /** Fraction of bigram occurrences taken by the most frequent bigram
    * (0.0 under 2 words) — the Gopher "top n-gram fraction" repetition
    * signal. Sort + one run-length pass: O(d log d) per row instead of
    * the naive O(d²) distinct×filter scan (which measured 2.8 s over
    * sf0.1's corpus vs ~1 s for this shape). Scan-local, zero shuffles.
    */
  def topBigramRatio(g: String): Column =
    expr(
      s"""CASE WHEN size($g) = 0 THEN cast(0.0 as double)
         |  ELSE cast(aggregate(array_sort($g),
         |      named_struct('prev', '', 'run', 0, 'best', 0),
         |      (st, x) -> named_struct(
         |        'prev', x,
         |        'run', IF(x = st.prev, st.run + 1, 1),
         |        'best', greatest(st.best,
         |          IF(x = st.prev, st.run + 1, 1))),
         |      st -> st.best) as double) / size($g)
         |  END""".stripMargin)

  /** Unicode NFC normalization (composed canonical form) — canonicalize
    * decomposed accents/compatibility sequences before fingerprinting,
    * so byte-different but visually-identical text dedups together.
    * Native codegen'd expression; PG-name `normalize(text, form)` is
    * registered in [[graft.functions.PgFunctions]].
    */
  def normalizeNfc(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(graft.functions.UnicodeNormalize(
      org.apache.spark.sql.GraftBridge.expression(text), "NFC"))

  /** PII scrubbing: redact email addresses and phone-number-shaped
    * digit runs (training-corpus hygiene). Pure regexp_replace —
    * codegen'd, reproducible in the oracle.
    */
  def scrubPii(text: Column): Column = {
    val emails = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    regexp_replace(emails,
      "\\+?[0-9][0-9() -]{7,}[0-9]", "<PHONE>")
  }

  /** Language ID: CJK by codepoint ratio, else argmax of per-language
    * stopword hit ratio with a fixed tie-break order; "und" when no
    * profile scores above zero.
    */
  def langId(text: Column, ws: String): Column = {
    val cjk = size(regexp_extract_all(text, lit("[\\x{4e00}-\\x{9fff}]"), lit(0)))
      .cast("double") / length(text)
    val scores = stopwords.map { case (l, list) => l -> wordRatio(ws, list) }
    val best = scores.foldRight(lit("und")) { case ((l, s), els) =>
      val beatsAll = scores.filter(_._1 != l)
        .map { case (_, o) => s >= o }.reduce(_ && _)
      when(s > 0 && beatsAll, lit(l)).otherwise(els)
    }
    when(cjk >= CjkRatio, lit("zh")).otherwise(best)
  }
}
