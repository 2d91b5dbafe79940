package graft.operators

import org.apache.spark.sql.DataFrame

/** Scale-adaptive input spreading for compute-heavy per-row stages
  * (guide §2.5 "input skew: one huge unsplittable file — repartition
  * immediately after the read").
  *
  * The expensive text/embedding kernels (shingling, MinHash, SimHash)
  * are fused into the SCAN stage by whole-stage codegen, so their
  * parallelism is the scan's parallelism. A single-row-group parquet
  * file scans as ONE task no matter the cluster size — the bench
  * fixtures are exactly that shape, and any real corpus has stragglers
  * of the same kind (one fat unsplittable file). `spread` inserts a
  * round-robin repartition to `defaultParallelism` ONLY when the
  * optimizer's size estimate says the scan cannot fill the cluster by
  * itself; a 100 TB input (bytes ≫ cores × maxPartitionBytes) passes
  * through untouched, so this never adds a corpus-wide shuffle at
  * scale. Decision is from plan statistics — no job is run.
  */
object Par {
  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism.toLong
    val maxPartitionBytes =
      spark.sessionState.conf.filesMaxPartitionBytes
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes >= BigInt(maxPartitionBytes) * target) df
    else df.repartition(target.toInt)
  }
}
