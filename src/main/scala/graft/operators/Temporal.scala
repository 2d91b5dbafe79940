package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Time-aligned joins and series repair — the temporal operators a
  * feature/training pipeline needs that neither Spark nor the reference
  * expose as primitives (the reference's users hand-roll them as
  * correlated subqueries; pg_lake ships no ASOF/range join —
  * pg_lake_table/src/planner/query_pushdown.c pushes only the standard
  * join shapes). Each operator here is a declarative composition that
  * Catalyst plans with ONE key-hash shuffle — no nested-loop, no
  * per-key driver work — so the plan survives a 1000-executor corpus.
  */
object Temporal {

  /** unix_micros over either timestamp flavor (the fixture tables carry
    * TIMESTAMP_NTZ; sessions here run UTC so the NTZ->LTZ cast is the
    * identity on the underlying micros).
    */
  private[operators] def micros(c: Column): Column =
    unix_micros(c.cast("timestamp"))

  /** As-of join: for every left row, the single most recent right row
    * with the same key and `rightTime <= leftTime` (or the earliest
    * with `rightTime >= leftTime` when `forward`), optionally within
    * `toleranceUs` microseconds.
    *
    * Shape: tag both sides, union, ONE window over (keys, time) —
    * exactly one hash-partition exchange plus a partition-local sort,
    * the same cost as one sort-merge join, with no per-key driver
    * loop and no time-range blowup (PlanQualitySpec locks the shape).
    * Ties on the right side resolve deterministically by
    * `rightTieBreak`, favoring the row nearest in iteration
    * direction: backward takes the HIGHEST tie-break (matching
    * `ORDER BY ts DESC, tiebreak DESC LIMIT 1`), forward the LOWEST
    * (matching `ORDER BY ts ASC, tiebreak ASC LIMIT 1`).
    *
    * `rightPayload` columns are carried onto the matched left rows and
    * must not collide with left column names; the matched right
    * timestamp lands in `matchedTimeCol`.
    *
    * NULL times: right rows with a null time can never be "most
    * recent" and are dropped; left rows with a null time are kept,
    * unmatched (DuckDB ASOF JOIN semantics — a null probe matches
    * nothing).
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      matchedTimeCol: String,
      toleranceUs: Option[Long] = None,
      forward: Boolean = false,
      rightTieBreak: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    val leftRest =
      left.columns.toSeq.filterNot(c => keys.contains(c) || c == leftTime)
    val overlap = rightPayload.toSet.intersect(left.columns.toSet)
    require(overlap.isEmpty, s"right payload collides with left: $overlap")
    require(rightTieBreak.forall(rightPayload.contains),
      "tie-break columns must be in rightPayload")

    // union schema: keys ++ __t ++ __side ++ __m (one STRUCT carrying
    // the right row's time + payload — null payload CELLS stay inside
    // their row's struct, so a match can never mix columns from
    // different right rows) ++ leftRest
    val mStruct = struct(
      col(rightTime).as("__rt") +: rightPayload.map(col): _*)
    val rSide = right.filter(col(rightTime).isNotNull).select(
      keys.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__side"),
          mStruct.as("__m")) ++
        leftRest.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val mType = StructType(
      StructField("__rt", right.schema(rightTime).dataType) +:
        rightPayload.map(c => StructField(c, right.schema(c).dataType)))
    val lSide = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__side"),
          lit(null).cast(mType).as("__m")) ++
        leftRest.map(col): _*)

    // At equal timestamps right rows sort before left rows in match
    // direction, so an exactly-simultaneous right row IS a match
    // (<= / >= semantics) in both directions.
    // tie-break columns live inside the __m struct (null for left
    // rows — harmless: the tie-break only orders within side 0)
    val ord: Seq[Column] =
      if (forward)
        (col("__t").desc +: col("__side").asc_nulls_first +:
          rightTieBreak.map(c => col("__m").getField(c).desc))
      else
        (col("__t").asc +: col("__side").asc_nulls_first +:
          rightTieBreak.map(c => col("__m").getField(c).asc))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = rSide.unionByName(lSide)
      .withColumn("__match", last(col("__m"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    // tolerance: null out the whole match when the gap exceeds it
    val inTol: Column = toleranceUs match {
      // null-probe guard: with a tolerance the micros comparison is
      // null-safe by itself; without one, require the probe time
      case None => col("__t").isNotNull && col("__match.__rt").isNotNull
      case Some(t) if forward =>
        micros(col("__match.__rt")) - micros(col("__t")) <= t
      case Some(t) =>
        micros(col("__t")) - micros(col("__match.__rt")) <= t
    }
    val out = matched.select(
      keys.map(col) ++
        Seq(col("__t").as(leftTime)) ++
        leftRest.map(col) ++
        Seq(when(inTol, col("__match.__rt")).as(matchedTimeCol)) ++
        rightPayload.map(c => when(inTol, col(s"__match.$c")).as(c)): _*)
    out
  }

  /** Value-in-interval join without a nested loop: each right interval
    * `[loCol, hiCol)` is exploded onto the fixed-width bins it covers
    * and each left row lands on the single bin holding `valueCol`, so
    * the pair meets on an EQUI key (exactly once — the left row's bin
    * is unique) and the exact predicate re-filters. Catalyst picks
    * broadcast-hash for a small interval side and sort-merge on the
    * bin key for a large one; either way there is no
    * BroadcastNestedLoopJoin (PlanQualitySpec forbids it).
    *
    * Pick `binWidth` near the typical interval width: replication is
    * `ceil(width/binWidth)+1` bins per interval.
    */
  def rangeJoin(
      left: DataFrame, valueCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val shared = left.columns.toSet.intersect(intervals.columns.toSet)
    require(shared.isEmpty, s"column names collide across sides: $shared")
    val binned = intervals.withColumn("__bin",
      explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    val keyed = left.withColumn("__bin",
      floor(col(valueCol) / binWidth).cast("long"))
    keyed.join(binned,
        keyed("__bin") === binned("__bin") &&
          col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bin")
  }

  /** Interval-overlap join without a nested loop — the 1-D analogue of
    * [[graft.operators.SpatialJoin.intersectsJoin]]: both sides explode
    * onto the fixed-width bins their `[lo, hi)` interval covers,
    * candidates meet on the bin (plus any `keys` equi pairs), the exact
    * half-open overlap predicate `l.lo < r.hi && r.lo < l.hi`
    * re-filters, and the reference-bin rule (the bin holding the
    * overlap's left edge, `max(l.lo, r.lo)`) emits each pair exactly
    * once with no DISTINCT shuffle.
    */
  def intervalJoin(
      left: DataFrame, leftLo: String, leftHi: String,
      right: DataFrame, rightLo: String, rightHi: String,
      binWidth: Double,
      keys: Seq[(String, String)] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty, s"column names collide across sides: $shared")
    def binned(df: DataFrame, lo: String, hi: String, b: String) =
      df.withColumn(b, explode(sequence(
        floor(col(lo) / binWidth).cast("long"),
        floor(col(hi) / binWidth).cast("long"))))
    val l = binned(left, leftLo, leftHi, "__lbin")
    val r = binned(right, rightLo, rightHi, "__rbin")
    val overlap =
      col(leftLo) < col(rightHi) && col(rightLo) < col(leftHi)
    val refBin =
      floor(greatest(col(leftLo), col(rightLo)) / binWidth)
        .cast("long") === col("__lbin")
    val keyCond = keys.map { case (a, b) => col(a) === col(b) }
      .foldLeft(lit(true))(_ && _)
    l.join(r, col("__lbin") === col("__rbin") && keyCond &&
        overlap && refBin)
      .drop("__lbin", "__rbin")
  }

  /** Regular-grid gap filling with last-observation-carried-forward and
    * linear interpolation. Input is one row per (keys, tsCol) on an
    * already-aligned grid (e.g. daily buckets); output is the DENSE
    * per-key grid from each key's first to last observation, stepping
    * by `stepExpr` (a SQL interval), with:
    *
    *   - `observed`  — whether the grid point had a row,
    *   - `<valueCol>_locf` — last non-null value at or before the point,
    *   - `<valueCol>_interp` — linear interpolation between the
    *     surrounding observations (the observed value itself on hits;
    *     null when an endpoint is missing, which on this grid only
    *     happens outside [first, last] and therefore never).
    *
    * Interpolation is plain IEEE double arithmetic over exact integer
    * microsecond gaps — the identical expression tree in any engine
    * reproduces it bit-for-bit (+,-,*,/ are exactly rounded; no libm).
    * Cost: one grouped agg for the bounds, a distributed explode for
    * the grid, one equi join back, one window — all on the key hash.
    */
  def gapFill(
      df: DataFrame, keys: Seq[String], tsCol: String, valueCol: String,
      stepExpr: String = "interval 1 day"): DataFrame = {
    require(keys.nonEmpty, "gapFill needs at least one key column")
    val bounds = df.groupBy(keys.map(col): _*)
      .agg(min(col(tsCol)).as("__lo"), max(col(tsCol)).as("__hi"))
    val grid = bounds.select(
      keys.map(col) :+
        explode(sequence(col("__lo"), col("__hi"), expr(stepExpr)))
          .as(tsCol): _*)
    val joined = grid.join(df, keys :+ tsCol, "left")

    val upTo = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val after = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = col(valueCol)
    val obsTs = when(v.isNotNull, col(tsCol))
    val prevV = last(v, ignoreNulls = true).over(upTo)
    val prevT = last(obsTs, ignoreNulls = true).over(upTo)
    val nextV = first(v, ignoreNulls = true).over(after)
    val nextT = first(obsTs, ignoreNulls = true).over(after)
    val frac = (micros(col(tsCol)) - micros(prevT)).cast("double") /
      (micros(nextT) - micros(prevT)).cast("double")
    joined.select(
      keys.map(col) ++ Seq(
        col(tsCol),
        v.isNotNull.as("observed"),
        prevV.as(s"${valueCol}_locf"),
        when(v.isNotNull, v)
          .when(prevV.isNotNull && nextV.isNotNull,
            prevV + (nextV - prevV) * frac)
          .as(s"${valueCol}_interp")): _*)
  }
}
