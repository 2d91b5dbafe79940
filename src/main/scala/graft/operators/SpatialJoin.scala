package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.functions._

import graft.functions.{StGeomPredicate, StGeomScalar}

/** Distributed spatial join by grid partitioning (PBSM — Patel &
  * DeWitt, SIGMOD 1996). The reference answers `JOIN ON st_intersects`
  * with a pushed-down nested loop inside one process
  * (pg_lake_engine delegates to DuckDB-spatial's RTree-less blocked
  * loop); at cluster scale a nested loop over two large sides is a
  * cross product, so this operator makes the join an EQUI join on grid
  * cells instead:
  *
  *   1. each row lands on every `cellSize`-wide grid cell its envelope
  *      covers (a bounded explode — replication is envelope area / cell
  *      area),
  *   2. candidates meet by (cx, cy) — an ordinary hash-partitioned
  *      equi join Catalyst can broadcast or sort-merge,
  *   3. the exact `st_intersects` re-filters, and
  *   4. the duplicate-elimination rule keeps each pair ONLY in the
  *      cell holding the lower-left corner of the envelope overlap —
  *      every surviving pair is emitted exactly once with no DISTINCT
  *      shuffle.
  *
  * Output: the joined rows with all caller columns (geometry column
  * names must be distinct across the sides).
  */
object SpatialJoin {

  private def geomScalar(name: String, g: Column): Column =
    GraftBridge.column(StGeomScalar(name, GraftBridge.expression(g)))
  private def geomPred(name: String, a: Column, b: Column): Column =
    GraftBridge.column(
      StGeomPredicate(name, GraftBridge.expression(a), GraftBridge.expression(b)))

  /** All (left, right) pairs whose geometries intersect, computed with
    * one equi join on grid cells — no BroadcastNestedLoopJoin, no
    * CartesianProduct (PlanQualitySpec locks the shape).
    */
  def intersectsJoin(
      left: DataFrame, leftGeom: String,
      right: DataFrame, rightGeom: String,
      cellSize: Double): DataFrame = {
    require(cellSize > 0, "cellSize must be positive")
    require(leftGeom != rightGeom,
      "geometry columns must carry distinct names")
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty, s"column names collide across sides: $shared")

    val cs = lit(cellSize)
    def binned(df: DataFrame, g: String, p: String): DataFrame =
      df.withColumn(s"__${p}x0", geomScalar("st_xmin", col(g)))
        .withColumn(s"__${p}y0", geomScalar("st_ymin", col(g)))
        .withColumn(s"__${p}cx", explode(sequence(
          floor(col(s"__${p}x0") / cs).cast("long"),
          floor(geomScalar("st_xmax", col(g)) / cs).cast("long"))))
        .withColumn(s"__${p}cy", explode(sequence(
          floor(col(s"__${p}y0") / cs).cast("long"),
          floor(geomScalar("st_ymax", col(g)) / cs).cast("long"))))
    val l = binned(left, leftGeom, "l")
    val r = binned(right, rightGeom, "r")

    // reference-cell rule: the envelope overlap's lower-left corner is
    // max of the two mins per axis; only the cell containing it emits
    val refCell =
      floor(greatest(col("__lx0"), col("__rx0")) / cs).cast("long") ===
        col("__lcx") &&
      floor(greatest(col("__ly0"), col("__ry0")) / cs).cast("long") ===
        col("__lcy")

    l.join(r,
        col("__lcx") === col("__rcx") && col("__lcy") === col("__rcy") &&
          refCell &&
          geomPred("st_intersects", col(leftGeom), col(rightGeom)))
      .drop("__lx0", "__ly0", "__lcx", "__lcy",
        "__rx0", "__ry0", "__rcx", "__rcy")
  }
}
