package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Scale-exact order statistics. Spark's exact `percentile_cont`
  * buffers every group's values in executor memory (the documented
  * wall in docs/SCALE.md); the approx sketch is the usual answer, but
  * when EXACT quantiles are required at corpus scale this implements
  * the selection-by-range-partition algorithm instead:
  *
  *   1. range-partition the column (one shuffle, the same machinery
  *      as a distributed sort's exchange),
  *   2. count each partition (scan-local),
  *   3. locate the partition holding each target rank (driver math
  *      over P counts),
  *   4. sort ONLY the hit partitions locally and pick the order
  *      statistics.
  *
  * Memory is bounded by one partition, never the column; the quantile
  * is bit-exact `PERCENTILE_CONT` (floor/ceil order statistics with
  * linear interpolation).
  */
object Stats {

  /** Exact PERCENTILE_CONT of `colName` for each q in `qs` (global,
    * ungrouped — the grouped case at scale is partitionBy + this per
    * group of interest). One count pass + one range shuffle.
    */
  def exactQuantiles(df: DataFrame, colName: String,
      qs: Seq[Double], partitions: Int = 64): Seq[Double] = {
    require(qs.forall(q => q >= 0.0 && q <= 1.0), "q in [0,1]")
    val vals = df.select(col(colName).cast("double").as("v"))
      .filter(col("v").isNotNull)
    val n = vals.count()
    require(n > 0, "exactQuantiles of an empty column")
    // target order statistics: PERCENTILE_CONT interpolates between
    // floor and ceil of rank (n-1)*q (0-based)
    val wanted: Seq[(Double, Long, Long, Double)] = qs.map { q =>
      val r = (n - 1) * q
      val lo = math.floor(r).toLong
      val hi = math.ceil(r).toLong
      (q, lo, hi, r - lo)
    }
    val neededRanks = wanted.flatMap(w => Seq(w._2, w._3)).distinct.sorted

    val parted = vals.repartitionByRange(partitions, col("v"))
    parted.cache()
    try {
      // per-partition counts, in partition order (range partitions are
      // ordered by construction)
      val counts = parted.rdd
        .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
        .collect().sortBy(_._1).map(_._2)
      val offsets = counts.scanLeft(0L)(_ + _) // offsets(i) = rows before i
      // rank -> partition holding it
      val byPartition = neededRanks.groupBy { k =>
        val p = offsets.indexWhere(_ > k) - 1
        if (p < 0) counts.length - 1 else p
      }
      // sort only the hit partitions locally, pick the order stats —
      // ONE job over all hit partitions (broadcast partition -> local
      // ranks), not one scan per partition
      val localRanks: Map[Int, Seq[Long]] = byPartition.map {
        case (p, ranks) => (p, ranks.map(k => k - offsets(p)))
      }
      val bcRanks = df.sparkSession.sparkContext.broadcast(localRanks)
      val offs = offsets
      val found: Map[Long, Double] = parted.rdd
        .mapPartitionsWithIndex { (i, it) =>
          bcRanks.value.get(i) match {
            case Some(locals) =>
              val sorted = it.map(_.getDouble(0)).toArray
              java.util.Arrays.sort(sorted)
              locals.iterator.map(l => (l + offs(i), sorted(l.toInt)))
            case None => Iterator.empty
          }
        }
        .collect().toMap
      wanted.map { case (_, lo, hi, frac) =>
        val a = found(lo); val b = found(hi)
        // the engines' PERCENTILE_CONT interpolation is
        // (1-f)*lower + f*higher — `a + (b-a)*f` differs in final ulps
        (1.0 - frac) * a + frac * b
      }
    } finally { parted.unpersist(); () }
  }

  /** Convenience: one q. */
  def exactQuantile(df: DataFrame, colName: String, q: Double): Double =
    exactQuantiles(df, colName, Seq(q)).head

  /** Grouped exact quantiles for LOW-cardinality group columns (report
    * dimensions: status flags, channels): one selection pass per
    * group, so cost is groups × (count + range shuffle of that group's
    * rows). Guarded — a high-cardinality group column means you want
    * the sketch (`approx_percentile`), not per-group selection.
    * Rows whose group is NULL are excluded (an equality predicate
    * could never select them; callers wanting the null group should
    * bucket it explicitly first).
    */
  def exactQuantilesBy(df: DataFrame, groupCol: String, colName: String,
      qs: Seq[Double], maxGroups: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val groups = df.filter(col(groupCol).isNotNull)
      .select(groupCol).distinct().limit(maxGroups + 1)
      .collect().map(_.get(0))
    require(groups.length <= maxGroups,
      s"more than $maxGroups groups — use approx_percentile at this " +
        "cardinality")
    groups.sortBy(_.toString).toSeq.map { g =>
      val sub = df.filter(col(groupCol) === lit(g))
      (g.toString, exactQuantiles(sub, colName, qs))
    }.toDF(groupCol, "quantiles")
  }
}
