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

  // ------------------------------------------------ stupid backoff LM

  /** Pruned stupid-backoff trigram model (Brants et al. 2007 — the
    * distributed-counting LM that scales where Kneser–Ney's
    * continuation counts don't): per order the top-K n-grams by
    * (count desc, gram) — K fixed ⇒ every model frame is bounded and
    * broadcastable at any corpus size. The model is PREFIX-CLOSED: a
    * bigram survives only if its first word is a kept unigram, a
    * trigram only if its context bigram is kept — so every kept
    * n-gram's relative frequency has its denominator inside the model
    * and scoring needs no unpruned count table.
    *
    * `uni` = (w, p1 = c(w)/N), `bi` = (g2 "a b", p2 = c(ab)/c(a)),
    * `tri` = (g3 "a b c", p3 = c(abc)/c(ab)), `corpus` = one row (n).
    * Every p is one integer/integer IEEE division — bit-identical in
    * any engine replaying the same counts.
    */
  final case class BackoffModel(uni: DataFrame, bi: DataFrame,
      tri: DataFrame, corpus: DataFrame)

  def trainBackoff(df: DataFrame, textCol: String,
      k1: Int = LmUniK, k2: Int = LmBiK, k3: Int = LmTriK): BackoffModel = {
    val w = df.withColumn("__ws", TextOps.words(col(textCol)))
    val tok = w.select(explode(col("__ws")).as("w"))
    val corpus = tok.agg(count(lit(1)).as("n"))
    val uniTop = tok.groupBy("w").agg(count(lit(1)).as("cu"))
      .orderBy(col("cu").desc, col("w")).limit(k1)
    val uni = uniTop.crossJoin(broadcast(corpus))
      .select(col("w"), (col("cu").cast("double") / col("n")).as("p1"),
        col("cu"))
    val biTop = w.select(explode(TextOps.bigrams("__ws")).as("g2"))
      .groupBy("g2").agg(count(lit(1)).as("cb"))
      .orderBy(col("cb").desc, col("g2")).limit(k2)
    val bi = biTop
      .withColumn("__wa", split(col("g2"), " ").getItem(0))
      .join(broadcast(uni.select(col("w").as("__wa"), col("cu"))), "__wa")
      .select(col("g2"), (col("cb").cast("double") / col("cu")).as("p2"),
        col("cb"))
    val triTop = w.select(explode(TextOps.trigrams("__ws")).as("g3"))
      .groupBy("g3").agg(count(lit(1)).as("ct"))
      .orderBy(col("ct").desc, col("g3")).limit(k3)
    val tri = triTop
      .withColumn("__p", split(col("g3"), " "))
      .withColumn("__ctx",
        concat(col("__p").getItem(0), lit(" "), col("__p").getItem(1)))
      .join(broadcast(bi.select(col("g2").as("__ctx"), col("cb"))), "__ctx")
      .select(col("g3"), (col("ct").cast("double") / col("cb")).as("p3"))
    // materialize the bounded model frames ONCE: without this, every
    // scoring join replays the whole corpus-count subtree (three extra
    // corpus scans per scoring pass at 100 TB); each frame is ≤ top-K
    // rows, so the checkpoint is a constant-size spill
    BackoffModel(uni.select("w", "p1").localCheckpoint(true),
      bi.select("g2", "p2").localCheckpoint(true),
      tri.localCheckpoint(true), corpus.localCheckpoint(true))
  }

  /** Materialized model for scan-local / streaming scoring: every
    * frame is top-K-bounded by construction, so collecting it is a
    * bounded driver fetch (the same justification as the k-means
    * centroid and BPE merge tables).
    */
  final case class BackoffModelLocal(uni: Seq[(String, Double)],
      bi: Seq[(String, Double)], tri: Seq[(String, Double)], n: Long)

  def collectModel(m: BackoffModel): BackoffModelLocal = {
    def pairs(df: DataFrame, k: String, v: String) =
      df.select(k, v).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toSeq
    BackoffModelLocal(
      pairs(m.uni, "w", "p1"), pairs(m.bi, "g2", "p2"),
      pairs(m.tri, "g3", "p3"),
      m.corpus.collect()(0).getLong(0))
  }

  /** Scan-local fold of the backoff score — struct(n_scored, logprob),
    * provably equal to [[perplexity]]'s aggregation (decimal sums are
    * order-independent; pinned by PipelineSpec). Being a pure per-row
    * expression, it gates STREAMING pipelines with no state store —
    * the CCNet filter at ingest time.
    */
  def scoreLocal(text: org.apache.spark.sql.Column, m: BackoffModelLocal,
      backoff: Double = LmBackoff): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftBridge.column(graft.functions.BackoffScore(
      org.apache.spark.sql.GraftBridge.expression(text),
      m.uni, m.bi, m.tri, m.n, backoff))

  /** Per-document stupid-backoff score: every trigram position scores
    * S(c|a,b) = p3 if "a b c" is in the model, else 0.4·p2("b c"),
    * else 0.4²·p1(c), else 0.4²/N for an unseen word — the paper's
    * backoff chain with the pruned-model floor. Output per doc (docs
    * with ≥ 1 trigram): `n_scored` positions, `logprob_u` = Σ ln S in
    * integer MICRO-nat units, each per-position ln quantized as
    * floor(ln(S)·1e6 + 0.5) BIGINT (the [[Graph.pageRank]] contract:
    * S itself is an engine-identical integer-ratio double; the ·1e6,
    * +0.5, floor chain is exactly-rounded IEEE arithmetic identical in
    * any engine, and there is NO double→DECIMAL cast whose rounding
    * rule could differ between engine builds) — the integer sum is
    * order-independent AND engine-exact — `avg_logprob` (micro-nats
    * per position), `perplexity` = e^(−avg/1e6), and
    * the CCNet-style `ppl_bucket` (ntile semantics over avg_logprob
    * desc: bucket 1 = head/lowest perplexity, `buckets` = tail).
    *
    * ONE corpus scan: trigrams explode scan-locally, the three model
    * joins and the corpus row are all broadcasts, then one per-doc
    * aggregation — no corpus-side shuffle before the final group-by.
    * The bucket split does NOT use a serial global window: the global
    * rank comes from the same two-phase parallel prefix as
    * [[Sampling.selectByBudget]] (range partition → per-partition
    * row_number → B-row offsets broadcast back), and the ntile bucket
    * is derived arithmetically from (rank, total).
    */
  def perplexity(df: DataFrame, idCol: String, textCol: String,
      model: BackoffModel, backoff: Double = LmBackoff,
      buckets: Int = LmPplBuckets): DataFrame = {
    val trips = df.withColumn("__ws", TextOps.words(col(textCol)))
      .select(col(idCol).as("id"),
        explode(TextOps.trigrams("__ws")).as("g3"))
      .withColumn("__p", split(col("g3"), " "))
      .withColumn("__sb",
        concat(col("__p").getItem(1), lit(" "), col("__p").getItem(2)))
      .withColumn("__wc", col("__p").getItem(2))
    val s = coalesce(
      col("p3"),
      lit(backoff) * coalesce(
        col("p2"),
        lit(backoff) * coalesce(col("p1"), lit(1.0) / col("n"))))
    val scored = trips
      .join(broadcast(model.tri), Seq("g3"), "left")
      .join(broadcast(model.bi.withColumnRenamed("g2", "__sb")),
        Seq("__sb"), "left")
      .join(broadcast(model.uni.withColumnRenamed("w", "__wc")),
        Seq("__wc"), "left")
      .crossJoin(broadcast(model.corpus))
      .groupBy("id")
      .agg(count(lit(1)).as("n_scored"),
        sum(floor(log(s) * lit(1e6) + lit(0.5)).cast("long"))
          .as("logprob_u"))
      .withColumn("avg_logprob",
        col("logprob_u").cast("double") / col("n_scored"))
    // distributed global rank by (avg_logprob desc, id): range exchange
    // + per-partition row_number + B-row partition offsets broadcast —
    // the ntile bucket is then pure arithmetic on (rank, total)
    val parted = scored
      .withColumn("perplexity", exp(-(col("avg_logprob") / lit(1e6))))
      .repartitionByRange(32, col("avg_logprob").desc, col("id").asc)
      .withColumn("__pid", spark_partition_id())
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy(col("avg_logprob").desc, col("id"))
    val ranked = parted.withColumn("__rn_in", row_number().over(wIn))
    val totals = parted.groupBy("__pid").agg(count(lit(1)).as("__pcnt"))
    val wp = org.apache.spark.sql.expressions.Window.orderBy("__pid")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val prefixes = totals
      .withColumn("__prefix", coalesce(sum("__pcnt").over(wp), lit(0L)))
      .withColumn("__total", sum("__pcnt").over(
        org.apache.spark.sql.expressions.Window.orderBy(lit(1))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.unboundedFollowing)))
      .select("__pid", "__prefix", "__total")
    // SQL NTILE over rank rn of N rows: the first N%k buckets hold
    // ⌈N/k⌉ rows, the rest ⌊N/k⌋ (integer `div`, not Spark's
    // double-valued `/`)
    ranked.join(broadcast(prefixes), "__pid")
      .withColumn("__rn", col("__prefix") + col("__rn_in"))
      .withColumn("ppl_bucket", expr(
        s"""CASE WHEN __total < $buckets THEN __rn
           |  WHEN __rn <= (__total % $buckets) * (__total div $buckets + 1)
           |  THEN (__rn - 1) div (__total div $buckets + 1) + 1
           |  ELSE (__total % $buckets) +
           |    (__rn - (__total % $buckets) * (__total div $buckets + 1) - 1)
           |      div (__total div $buckets) + 1
           |END""".stripMargin).cast("int"))
      .drop("__pid", "__rn_in", "__prefix", "__total", "__rn")
  }
}
