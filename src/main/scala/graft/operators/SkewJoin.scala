package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the classic 100 TB fix when a
  * handful of hot keys concentrate a shuffle partition beyond what
  * AQE's skew split can rebalance (AQE splits oversized PARTITIONS,
  * but one giant key still lands in one task's build side).
  *
  * The LARGE side gets a deterministic salt in [0, salts) derived from
  * a row-unique column (portable hash — reproducible across runs and
  * partitionings, unlike rand()); the SMALL side is exploded once per
  * salt value. The join key becomes (key, salt), spreading each hot
  * key over `salts` tasks. Result is EXACTLY the plain join's rows
  * (asserted in spec): salting only refines the partitioning, never
  * the match set, because every (key, salt) pair on the large side
  * meets its replica on the small side.
  *
  * Cost model: small side grows ×salts (still broadcast-or-small by
  * assumption); large side is untouched. Use when key-frequency skew
  * is known; plain joins + AQE otherwise.
  */
object SkewJoin {

  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      rowCol: String, salts: Int = 16): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedLarge = large.withColumn("__salt",
      pmod(xxhash64(col(rowCol)), lit(salts.toLong)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
