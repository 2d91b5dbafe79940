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
}
