package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composed pass a training-data
  * pipeline runs over raw documents before tokenization:
  *
  *   1. quality gate (C4/Gopher rules: length, repetition, word shape),
  *   2. exact dedup (first-writer-wins on the normalized fingerprint),
  *   3. deterministic subsample (portable hash-mod, reproducible across
  *      partitionings and engines).
  *
  * Scale shape: one projection pass for the quality metrics (scan-local
  * lambdas), ONE window shuffle on the fingerprint for dedup, and a
  * scan-local hash filter — no joins, no driver state, nothing that
  * widens at 100 TB. Near-dup removal composes on top via
  * [[Dedup.minhashPairs]] → [[Dedup.dedupGroups]] when needed (kept
  * out of this pass so the whole chain stays one-shuffle).
  */
object Curate {

  /** Stages 1+2 (quality gate + exact dedup), keeping every original
    * column plus `n_words` and `fingerprint` so downstream stages (mix,
    * pack, near-dup) can compose.
    */
  def qualityDedup(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val survivors = df
      .withColumn("__ws", TextOps.words(col(textCol)))
      .withColumn("n_words", size(col("__ws")))
      .withColumn("__dup", TextOps.dupWordRatio("__ws"))
      .withColumn("__awl", TextOps.avgWordLen("__ws"))
      .filter(col("n_words") >= 20 && col("__dup") <= 0.55 &&
        col("__awl") >= 2.0 && col("__awl") <= 10.0)
      .withColumn("fingerprint", TextOps.fingerprint(col(textCol)))
    survivors
      .withColumn("__rep",
        min(col(idCol)).over(Window.partitionBy("fingerprint")))
      .filter(col(idCol) === col("__rep"))
      .drop("__ws", "__dup", "__awl", "__rep")
  }

  def curate(df: DataFrame, idCol: String, textCol: String,
      sampleMod: Int, seed: String): DataFrame =
    qualityDedup(df, idCol, textCol)
      .filter(TextOps.hash60(
        concat(lit(seed), col(idCol).cast("string"))) % sampleMod === 0)
      .select(col(idCol), col("fingerprint"), col("n_words"))

  /** [[curate]] with the hashed-feature ML gate
    * ([[Classifier.keepRule]]) in place of the C4/Gopher rules — the
    * classifier score folds scan-locally per row, so the composition
    * keeps the rule path's shuffle budget exactly: one fingerprint
    * window, zero joins.
    */
  def curateMl(df: DataFrame, idCol: String, textCol: String,
      sampleMod: Int, seed: String): DataFrame = {
    val survivors = df
      .withColumn("__ws", TextOps.words(col(textCol)))
      .withColumn("n_words", size(col("__ws")))
      .filter(Classifier.keepRule("__ws"))
      .withColumn("fingerprint", TextOps.fingerprint(col(textCol)))
    survivors
      .withColumn("__rep",
        min(col(idCol)).over(Window.partitionBy("fingerprint")))
      .filter(col(idCol) === col("__rep"))
      .filter(TextOps.hash60(
        concat(lit(seed), col(idCol).cast("string"))) % sampleMod === 0)
      .select(col(idCol), col("fingerprint"), col("n_words"))
  }

  /** [[curate]] with the CCNet perplexity gate in place of the
    * C4/Gopher rules: train the stupid-backoff model on the corpus
    * itself ([[LangModel.trainBackoff]]), keep documents whose
    * perplexity tercile is within `keepBuckets` (1 = head only,
    * 2 = head+middle — CCNet's usual cut), then exact dedup +
    * deterministic subsample. Unlike the scan-local rule/ML gates this
    * gate is a corpus-level aggregate, so the composition pays one
    * id-keyed hash join of the keep-set — the model itself stays
    * top-K-bounded and broadcast, and no driver state appears.
    */
  def curatePpl(df: DataFrame, idCol: String, textCol: String,
      sampleMod: Int, seed: String,
      keepBuckets: Int = PipelineParams.PplKeepBuckets): DataFrame = {
    val model = LangModel.trainBackoff(df, textCol)
    val keep = LangModel.perplexity(df, idCol, textCol, model)
      .filter(col("ppl_bucket") <= keepBuckets)
      .select(col("id").as("__kid"))
    df.join(keep, col(idCol) === col("__kid")).drop("__kid")
      .withColumn("__ws", TextOps.words(col(textCol)))
      .withColumn("n_words", size(col("__ws")))
      .withColumn("fingerprint", TextOps.fingerprint(col(textCol)))
      .withColumn("__rep",
        min(col(idCol)).over(Window.partitionBy("fingerprint")))
      .filter(col(idCol) === col("__rep"))
      .filter(TextOps.hash60(
        concat(lit(seed), col(idCol).cast("string"))) % sampleMod === 0)
      .select(col(idCol), col("fingerprint"), col("n_words"))
  }

  /** The full training-prep composition: quality gate → exact dedup →
    * temperature mix over the CLEAN corpus's domain counts → sequence
    * packing of the mixed survivors. Each stage is the already-proven
    * operator; the composition adds no new shuffle class (one
    * fingerprint window, one count broadcast, the bucketed pack
    * cumsum). Output: one row per surviving doc with its domain and
    * sequence assignment.
    */
  def curateForTraining(df: DataFrame, idCol: String, textCol: String,
      domainCol: String, targetFrac: Double, seqLen: Int,
      seed: String): DataFrame = {
    val clean = qualityDedup(df, idCol, textCol)
    val mixed = Sampling.mixTemperature(clean, domainCol, idCol,
      targetFrac, seed)
    Pack.packSequences(mixed, idCol, textCol, seqLen, buckets = 8,
      seed = seed + "p", keep = Seq(domainCol))
  }
}
