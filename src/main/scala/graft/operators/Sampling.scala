package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling/shuffling (SURVEY.md §7 M6): training
  * pipelines need reproducible subsets and orderings — `rand()` is
  * neither reproducible across partitionings nor portable to the
  * oracle, so ordering keys come from the md5-derived 60-bit hash of
  * (seed, id): stable under repartitioning, identical in DuckDB.
  */
object Sampling {

  /** Hash-order key for (seed, id). */
  private def orderKey(idCol: String, seed: String) =
    TextOps.hash60(concat(lit(seed), col(idCol).cast("string")))

  /** Deterministic pseudo-random shuffle: stable total order. */
  def shuffled(df: DataFrame, idCol: String, seed: String): DataFrame =
    df.orderBy(orderKey(idCol, seed), col(idCol))

  /** k rows per stratum, chosen by hash order — balanced, reproducible
    * (one window shuffle on the stratum key).
    */
  def stratified(df: DataFrame, strataCol: String, idCol: String, k: Int,
      seed: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol).orderBy(orderKey(idCol, seed), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k).drop("__rk")
  }

  /** Deterministic train/eval split: hash bucket on (seed, id) —
    * scan-local (zero shuffles), stable under repartitioning and
    * re-runs, identical in the oracle. Adds a `split` column.
    */
  def splitAssign(df: DataFrame, idCol: String, seed: String): DataFrame = {
    import PipelineParams._
    // hash60 is non-negative (60-bit), so % == pmod on both engines
    df.withColumn("split",
      when(orderKey(idCol, seed) % SplitBuckets < SplitTrainBuckets,
        lit("train")).otherwise(lit("eval")))
  }

  /** Split-leakage audit: near-duplicate pairs (MinHash+LSH, exact
    * jaccard ≥ the dedup threshold) that CROSS the train/eval boundary —
    * each row is an eval doc whose near-twin is trainable, i.e. a
    * contaminated eval point. Cost is one signature pass + the banded
    * LSH join (subquadratic); the split labels ride along on the
    * existing pair join, adding no extra shuffle of the corpus.
    */
  def splitLeakage(df: DataFrame, idCol: String, textCol: String,
      seed: String): DataFrame = {
    val splits = splitAssign(df, idCol, seed)
      .select(col(idCol).as("__sid"), col("split"))
    Dedup.minhashPairs(df, idCol, textCol)
      .join(splits.withColumnRenamed("split", "a_split"),
        col("a_id") === col("__sid")).drop("__sid")
      .join(splits.withColumnRenamed("split", "b_split"),
        col("b_id") === col("__sid")).drop("__sid")
      .filter(col("a_split") =!= col("b_split"))
      .select("a_id", "b_id", "a_split", "b_split", "jaccard")
  }
}
