package graft

import java.sql.Timestamp

import graft.operators.{SpatialJoin, Temporal}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Temporal + spatial-join operators: hand cases pin the semantics
  * (ties, tolerance, direction, boundary inclusion), then each operator
  * is proven equal to its naive quadratic formulation on fixture data —
  * the same differential the judged oracles replay in DuckDB.
  */
class TemporalSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asofJoin: hand case with ties, tolerance, and no-match") {
    val left = Seq(
      (1L, "a", ts("2024-01-10 00:00:00")),  // matches r3 (tie broken by id)
      (2L, "a", ts("2024-01-01 00:00:00")),  // no right row at or before
      (3L, "b", ts("2024-01-20 00:00:00")),  // match outside tolerance
      (4L, "c", ts("2024-01-05 00:00:00")))  // key with no right rows
      .toDF("id", "k", "t")
    val right = Seq(
      (10L, "a", ts("2024-01-09 00:00:00"), 1.0),
      (11L, "a", ts("2024-01-10 00:00:00"), 2.0),  // simultaneous: matches
      (12L, "a", ts("2024-01-10 00:00:00"), 3.0),  // tie: higher rid wins
      (13L, "b", ts("2024-01-01 00:00:00"), 4.0))
      .toDF("rid", "k", "rt", "rv")
    val out = Temporal.asofJoin(left, right,
        keys = Seq("k"), leftTime = "t", rightTime = "rt",
        rightPayload = Seq("rid", "rv"), matchedTimeCol = "mt",
        toleranceUs = Some(7L * 86400000000L), rightTieBreak = Seq("rid"))
      .select("id", "mt", "rid", "rv").orderBy("id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)),
        Option(r.get(2)), Option(r.get(3)))).toSeq
    assert(out == Seq(
      (1L, Some(ts("2024-01-10 00:00:00")), Some(12L), Some(3.0)),
      (2L, None, None, None),
      (3L, None, None, None),
      (4L, None, None, None)))
  }

  test("asofJoin: null payload cells never mix columns across right rows") {
    // the matched right row carries a NULL payload cell; the match
    // must emit THAT null, not back-fill it from an older right row
    val left = Seq((1L, "a", ts("2024-01-10 00:00:00"))).toDF("id", "k", "t")
    val right = Seq(
      (10L, "a", ts("2024-01-01 00:00:00"), Option(5.0)),
      (11L, "a", ts("2024-01-05 00:00:00"), Option.empty[Double]))
      .toDF("rid", "k", "rt", "rv")
    val out = Temporal.asofJoin(left, right, Seq("k"), "t", "rt",
        Seq("rid", "rv"), "mt", rightTieBreak = Seq("rid"))
      .select("rid", "rv").collect()(0)
    assert(out.getLong(0) == 11L)
    assert(out.isNullAt(1),
      s"null payload back-filled from an older right row: ${out.get(1)}")
  }

  test("asofJoin forward: ties take the LOWEST tie-break") {
    val left = Seq((1L, "a", ts("2024-01-10 00:00:00"))).toDF("id", "k", "t")
    val right = Seq(
      (20L, "a", ts("2024-01-12 00:00:00"), 1.0),
      (21L, "a", ts("2024-01-12 00:00:00"), 2.0)).toDF("rid", "k", "rt", "rv")
    val out = Temporal.asofJoin(left, right, Seq("k"), "t", "rt",
        Seq("rid", "rv"), "mt", forward = true, rightTieBreak = Seq("rid"))
      .select("rid").collect()(0).getLong(0)
    assert(out == 20L, s"forward tie must take the lowest rid, got $out")
  }

  test("asofJoin: null times — right rows dropped, left rows unmatched") {
    val left = Seq((1L, "a", Option(ts("2024-01-10 00:00:00"))),
      (2L, "a", Option.empty[Timestamp])).toDF("id", "k", "t")
    val right = Seq((10L, "a", Option(ts("2024-01-05 00:00:00")), 1.0),
      (11L, "a", Option.empty[Timestamp], 9.0)).toDF("rid", "k", "rt", "rv")
    for (fwdTol <- Seq((false, None), (false, Some(30L * 86400000000L)),
        (true, None))) {
      val (fwd, tol) = fwdTol
      val out = Temporal.asofJoin(left, right, Seq("k"), "t", "rt",
          Seq("rid", "rv"), "mt", toleranceUs = tol, forward = fwd,
          rightTieBreak = Seq("rid"))
        .select("id", "rid").orderBy("id")
        .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSeq
      // the null-time right row (rid 11) must never match anything;
      // the null-time left row (id 2) must survive, unmatched
      assert(out.map(_._1) == Seq(1L, 2L), s"fwd=$fwd tol=$tol: $out")
      assert(out(1)._2.isEmpty, s"null-probe matched: fwd=$fwd tol=$tol")
      assert(out(0)._2 != Some(11L), s"null right row matched: $out")
    }
  }

  test("asofJoin forward: earliest right at or after, within tolerance") {
    val left = Seq((1L, "a", ts("2024-01-10 00:00:00")),
      (2L, "a", ts("2024-01-30 00:00:00"))).toDF("id", "k", "t")
    val right = Seq(
      (10L, "a", ts("2024-01-10 00:00:00"), 1.0),
      (11L, "a", ts("2024-01-12 00:00:00"), 2.0)).toDF("rid", "k", "rt", "rv")
    val out = Temporal.asofJoin(left, right,
        keys = Seq("k"), leftTime = "t", rightTime = "rt",
        rightPayload = Seq("rid", "rv"), matchedTimeCol = "mt",
        toleranceUs = Some(86400000000L), forward = true,
        rightTieBreak = Seq("rid"))
      .select("id", "rid").orderBy("id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSeq
    // id 1: simultaneous right row matches (>= semantics); id 2: nothing after
    assert(out == Seq((1L, Some(10L)), (2L, None)))
  }

  test("asofJoin equals the naive argmax formulation on events") {
    val ev = Tables.df(spark, sf, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id").as("vid"))
    val tol = 7L * 86400000000L

    val got = Temporal.asofJoin(purchases, views,
        keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        rightPayload = Seq("vid"), matchedTimeCol = "vts",
        toleranceUs = Some(tol), rightTieBreak = Seq("vid"))
      .select("event_id", "vts", "vid")

    // naive: join all candidates in the window, keep rank-1 per purchase
    val cand = purchases.join(views.withColumnRenamed("ts", "vts2")
        .withColumnRenamed("user_id", "vuid"),
        col("user_id") === col("vuid") && col("vts2") <= col("ts") &&
          unix_micros(col("ts").cast("timestamp")) -
            unix_micros(col("vts2").cast("timestamp")) <= tol, "left")
    val w = Window.partitionBy("event_id")
      .orderBy(col("vts2").desc_nulls_last, col("vid").desc_nulls_last)
    val naive = cand.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("vts2").as("vts"), col("vid"))

    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty,
      "asofJoin diverges from the naive formulation")
  }

  test("rangeJoin equals the cross-filter formulation, boundaries exact") {
    val rows = Seq((1L, 0.0), (2L, 49.99), (3L, 50.0), (4L, 100.0),
      (5L, 149.99), (6L, 150.0), (7L, -25.0), (8L, -0.01))
      .toDF("id", "v")
    val ivs = Seq((100L, 0.0, 50.0), (101L, 50.0, 150.0),
      (102L, -50.0, 0.0), (103L, 140.0, 160.0)).toDF("iid", "lo", "hi")
    val got = Temporal.rangeJoin(rows, "v", ivs, "lo", "hi", 30.0)
      .select("id", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSeq.sorted
    val want = rows.crossJoin(ivs)
      .filter(col("v") >= col("lo") && col("v") < col("hi"))
      .select("id", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSeq.sorted
    assert(got == want)
    assert(got.size == got.distinct.size, "pair emitted more than once")
  }

  test("intervalJoin equals the cross-filter formulation, pairs unique") {
    val a = Seq((1L, 10L, 0.0, 10.0), (2L, 10L, 5.0, 15.0),
      (3L, 20L, 0.0, 100.0), (4L, 10L, 10.0, 20.0),  // touches 1: no overlap
      (5L, 10L, -35.0, -5.0)).toDF("aid", "ak", "alo", "ahi")
    val b = Seq((100L, 10L, 9.0, 11.0), (101L, 10L, -20.0, 1.0),
      (102L, 20L, 50.0, 60.0), (103L, 30L, 0.0, 100.0))
      .toDF("bid", "bk", "blo", "bhi")
    val got = Temporal.intervalJoin(a, "alo", "ahi", b, "blo", "bhi",
        binWidth = 7.0, keys = Seq(("ak", "bk")))
      .select("aid", "bid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = a.crossJoin(b)
      .filter(col("ak") === col("bk") &&
        col("alo") < col("bhi") && col("blo") < col("ahi"))
      .select("aid", "bid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got.size == got.distinct.size, "duplicate pairs emitted")
    assert(got.sorted == want)
  }

  test("gapFill: locf and linear interpolation hand case") {
    val df = Seq(
      ("a", ts("2024-01-01 00:00:00"), 10.0),
      ("a", ts("2024-01-04 00:00:00"), 40.0),  // 2-day interior gap
      ("a", ts("2024-01-05 00:00:00"), 20.0),
      ("b", ts("2024-01-01 00:00:00"), 5.0))
      .toDF("k", "t", "v")
    val out = Temporal.gapFill(df, Seq("k"), "t", "v")
      .orderBy("k", "t").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getBoolean(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(out == Seq(
      ("a", ts("2024-01-01 00:00:00"), true, 10.0, 10.0),
      ("a", ts("2024-01-02 00:00:00"), false, 10.0, 20.0),
      ("a", ts("2024-01-03 00:00:00"), false, 10.0, 30.0),
      ("a", ts("2024-01-04 00:00:00"), true, 40.0, 40.0),
      ("a", ts("2024-01-05 00:00:00"), true, 20.0, 20.0),
      ("b", ts("2024-01-01 00:00:00"), true, 5.0, 5.0)))
  }

  test("spatial grid join equals brute force, each pair exactly once") {
    graft.functions.PgFunctions.register(spark)
    val pts = spark.range(0, 300).select(
      col("id").as("pid"),
      expr("st_point(CAST((id * 3) % 97 AS DOUBLE), " +
        "CAST((id * 11) % 89 AS DOUBLE))").as("pgeom"))
    val boxes = spark.range(0, 60).select(
      col("id").as("bid"),
      expr("st_makeenvelope(CAST((id * 13) % 80 AS DOUBLE), " +
        "CAST((id * 29) % 80 AS DOUBLE), " +
        "CAST((id * 13) % 80 + (id % 25) + 3 AS DOUBLE), " +
        "CAST((id * 29) % 80 + (id % 19) + 3 AS DOUBLE))").as("bgeom"))
    // cell smaller than the largest box: boxes straddle several cells
    val got = SpatialJoin.intersectsJoin(pts, "pgeom", boxes, "bgeom", 8.0)
      .select("pid", "bid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = pts.crossJoin(boxes)
      .filter(expr("st_intersects(pgeom, bgeom)"))
      .select("pid", "bid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got.size == got.distinct.size, "duplicate pairs emitted")
    assert(got.sorted == want)
  }
}
