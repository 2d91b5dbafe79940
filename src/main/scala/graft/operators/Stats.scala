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
    * ungrouped — [[exactQuantilesBy]] handles the grouped case in one
    * job). One count pass + one range shuffle.
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
    * dimensions: status flags, channels) in a CONSTANT number of jobs —
    * not one selection pass per group:
    *
    *   1. ONE range shuffle on `(group, v)`: each group occupies a
    *      contiguous partition span, values range-ordered across it,
    *   2. one pass counting `(partition, group)` cells → per-group
    *      totals and per-partition offsets (driver math over ≤ P×G
    *      tiny tuples),
    *   3. one selection pass sorting only the hit groups of the hit
    *      partitions.
    *
    * Guarded — a high-cardinality group column means you want the
    * sketch (`approx_percentile`), not per-group selection. Rows whose
    * group or value is NULL are excluded (PERCENTILE_CONT semantics;
    * callers wanting the null group should bucket it explicitly).
    *
    * Memory posture: the narrow `(group, value)` projection — two
    * columns, not the input rows — is cached across the count and
    * selection passes and unpersisted before returning; it is
    * range-partitioned over `partitions` partitions, so per-executor
    * residency is ~rows/partitions × 16 bytes and spills gracefully
    * under memory pressure (MEMORY_AND_DISK default). Raise
    * `partitions` with input size. The returned frame is driver-built
    * but bounded at `maxGroups`×|qs| doubles by the cardinality guard.
    */
  def exactQuantilesBy(df: DataFrame, groupCol: String, colName: String,
      qs: Seq[Double], maxGroups: Int = 64,
      partitions: Int = 64): DataFrame = {
    require(qs.forall(q => q >= 0.0 && q <= 1.0), "q in [0,1]")
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.filter(col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        col(colName).cast("double").as("v"))
      .filter(col("v").isNotNull)
    // cheap cardinality guard BEFORE any wide collect
    val nGroups = vals.select("g").distinct().limit(maxGroups + 1).count()
    require(nGroups <= maxGroups,
      s"more than $maxGroups groups — use approx_percentile at this " +
        "cardinality")
    require(nGroups > 0, "exactQuantilesBy of an empty input")
    // ONE range shuffle: lexicographic (g, v) keys mean each group's
    // rows form a contiguous run of partitions, range-ordered by v
    val parted = vals.repartitionByRange(partitions, col("g"), col("v"))
    parted.cache()
    try {
      // (partition, group) cell counts — tiny (≤ partitions × groups)
      val cells: Array[(Int, String, Long)] = parted.rdd
        .mapPartitionsWithIndex { (i, it) =>
          val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
          it.foreach { r =>
            val g = r.getString(0); m(g) = m.getOrElse(g, 0L) + 1L
          }
          m.iterator.map { case (g, c) => (i, g, c) }
        }.collect()
      // per group: total n and (partition, rows-of-g-before-it) offsets
      val groupMeta: Map[String, (Long, Array[(Int, Long)])] =
        cells.groupBy(_._2).map { case (g, cs) =>
          val inOrder = cs.sortBy(_._1)
          var acc = 0L
          val offs = inOrder.map { case (p, _, c) =>
            val o = acc; acc += c; (p, o)
          }
          g -> (acc, offs)
        }
      // PERCENTILE_CONT rank rule per group: interpolate between floor
      // and ceil of (n-1)q
      val wanted: Map[String, Seq[(Long, Long, Double)]] =
        groupMeta.map { case (g, (n, _)) =>
          g -> qs.map { q =>
            val r = (n - 1) * q
            (math.floor(r).toLong, math.ceil(r).toLong, r - math.floor(r))
          }
        }
      // partition -> (group, local rank, global rank) needs
      val byPartition: Map[Int, Seq[(String, Long, Long)]] = (for {
        (g, ws) <- wanted.toSeq
        k <- ws.flatMap(w => Seq(w._1, w._2)).distinct
      } yield {
        val offs = groupMeta(g)._2
        val idx = offs.lastIndexWhere(_._2 <= k)
        val (p, off) = offs(idx)
        (p, (g, k - off, k))
      }).groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2)) }
      val bc = spark.sparkContext.broadcast(byPartition)
      // one selection job: sort ONLY the needed groups of hit partitions
      val found: Map[(String, Long), Double] = parted.rdd
        .mapPartitionsWithIndex { (i, it) =>
          bc.value.get(i) match {
            case Some(needs) =>
              val needGroups = needs.map(_._1).toSet
              val buf = scala.collection.mutable.Map
                .empty[String, scala.collection.mutable.ArrayBuffer[Double]]
              it.foreach { r =>
                val g = r.getString(0)
                if (needGroups(g))
                  buf.getOrElseUpdate(g,
                    scala.collection.mutable.ArrayBuffer.empty) += r.getDouble(1)
              }
              val sorted = buf.map { case (g, b) =>
                val a = b.toArray; java.util.Arrays.sort(a); (g, a)
              }
              needs.iterator.map { case (g, local, global) =>
                ((g, global), sorted(g)(local.toInt))
              }
            case None => Iterator.empty
          }
        }.collect().toMap
      wanted.toSeq.sortBy(_._1).map { case (g, ws) =>
        (g, ws.map { case (lo, hi, f) =>
          (1.0 - f) * found((g, lo)) + f * found((g, hi))
        })
      }.toDF(groupCol, "quantiles")
    } finally { parted.unpersist(); () }
  }
}
