package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GROUPS window frames via the dense-rank ≡ peer-group-index
  * identity (`q_window_groups_frame`'s emulation), pinned against the
  * SQL standard's GROUPS semantics hand-computed on a fixture with
  * real ties — the local DuckDB build's parser lacks GROUPS mode, so
  * the judged oracle can only differential the emulation arithmetic;
  * THIS spec is what pins the emulation to GROUPS itself.
  *
  * Fixture: one partition, ORDER BY k with peer groups
  * g1 = {10, 20} (k=1), g2 = {30} (k=2), g3 = {40, 50} (k=3).
  * GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW sums whole peer groups:
  * rows of g1 → 30, g2 → 60 (g1+g2), g3 → 120 (g2+g3).
  * GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING counts:
  * g1 rows → 3 (g1+g2), g2 → 5 (all), g3 → 3 (g2+g3).
  */
class WindowGroupsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("dense-rank RANGE emulation equals hand-computed GROUPS truth") {
    val df = Seq((1, 10), (1, 20), (2, 30), (3, 40), (3, 50)).toDF("k", "v")
    val withDr = df.withColumn("dr",
      dense_rank().over(Window.orderBy("k")))
    val wg = Window.orderBy("dr")
    val out = withDr.select(col("k"), col("v"),
      sum(col("v")).over(wg.rangeBetween(-1, Window.currentRow)).as("s"),
      count(lit(1)).over(wg.rangeBetween(-1, 1)).as("c"))
      .orderBy("v")
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (1, 30L, 3L), (1, 30L, 3L),   // g1: {g1}; count g1+g2
      (2, 60L, 5L),                 // g2: g1+g2; count all
      (3, 120L, 3L), (3, 120L, 3L)  // g3: g2+g3; count g2+g3
    ))
  }

  test("unbounded and zero-offset GROUPS bounds degenerate correctly") {
    val df = Seq((1, 10), (1, 20), (2, 30)).toDF("k", "v")
    val withDr = df.withColumn("dr",
      dense_rank().over(Window.orderBy("k")))
    val wg = Window.orderBy("dr")
    // GROUPS BETWEEN CURRENT ROW AND CURRENT ROW = the full peer group
    val cur = withDr.select(col("v"),
      sum(col("v")).over(wg.rangeBetween(Window.currentRow,
        Window.currentRow)).as("s"))
      .orderBy("v").collect().map(_.getLong(1)).toSeq
    assert(cur === Seq(30L, 30L, 30L))
    // GROUPS UNBOUNDED PRECEDING..CURRENT ROW = cumulative whole groups
    val cum = withDr.select(col("v"),
      sum(col("v")).over(wg.rangeBetween(Window.unboundedPreceding,
        Window.currentRow)).as("s"))
      .orderBy("v").collect().map(_.getLong(1)).toSeq
    assert(cum === Seq(30L, 30L, 60L))
  }
}
