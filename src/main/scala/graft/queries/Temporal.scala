package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

import graft.operators.{SpatialJoin, Temporal => Top}

/** Temporal alignment + spatial-join operators (beyond the reference's
  * SQL surface — its users write these as correlated subqueries /
  * nested-loop joins; see operators/Temporal.scala and
  * operators/SpatialJoin.scala for the one-shuffle formulations).
  * Oracles replay the semantics with the naive SQL shape (LATERAL
  * argmax, inequality join) so the scalable plan is differentially
  * proven against the textbook definition.
  */
object Temporal {

  private val SevenDaysUs = 7L * 24 * 3600 * 1000000L

  val defs: Seq[QueryDef] = Seq(

    // ---- as-of join: latest view <= each purchase, per user, 7d tol ----
    QueryDef(
      "q_join_asof",
      """SELECT e.event_id, e.user_id, e.ts, m.view_ts, m.view_event_id,
        |  m.view_value, epoch_us(e.ts) - epoch_us(m.view_ts) AS gap_us
        |FROM events e
        |LEFT JOIN LATERAL (
        |  SELECT v.ts AS view_ts, v.event_id AS view_event_id,
        |         v.value AS view_value
        |  FROM events v
        |  WHERE v.user_id = e.user_id AND v.event_type = 'view'
        |    AND v.ts <= e.ts AND v.ts >= e.ts - INTERVAL 7 DAY
        |  ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) m ON true
        |WHERE e.event_type = 'purchase'
        |ORDER BY e.event_id""".stripMargin) { (s, dir) =>
      val ev = Tables.df(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"),
          col("event_id").as("view_event_id"),
          col("value").as("view_value"))
      Top.asofJoin(purchases, views,
          keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
          rightPayload = Seq("view_event_id", "view_value"),
          matchedTimeCol = "view_ts",
          toleranceUs = Some(SevenDaysUs),
          rightTieBreak = Seq("view_event_id"))
        .select(col("event_id"), col("user_id"), col("ts"), col("view_ts"),
          col("view_event_id"), col("view_value"),
          (unix_micros(col("ts").cast("timestamp")) -
            unix_micros(col("view_ts").cast("timestamp"))).as("gap_us"))
        .orderBy("event_id")
    },

    // ---- forward as-of: next purchase after each signup, 3d window ----
    QueryDef(
      "q_join_asof_fwd",
      """SELECT e.event_id, e.user_id, e.ts, m.p_ts, m.p_event_id,
        |  epoch_us(m.p_ts) - epoch_us(e.ts) AS wait_us
        |FROM events e
        |LEFT JOIN LATERAL (
        |  SELECT v.ts AS p_ts, v.event_id AS p_event_id
        |  FROM events v
        |  WHERE v.user_id = e.user_id AND v.event_type = 'purchase'
        |    AND v.ts >= e.ts AND v.ts <= e.ts + INTERVAL 3 DAY
        |  ORDER BY v.ts ASC, v.event_id ASC LIMIT 1) m ON true
        |WHERE e.event_type = 'signup'
        |ORDER BY e.event_id""".stripMargin) { (s, dir) =>
      val ev = Tables.df(s, dir, "events")
      val signups = ev.filter(col("event_type") === "signup")
        .select("event_id", "user_id", "ts")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("event_id").as("p_event_id"))
      Top.asofJoin(signups, purchases,
          keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
          rightPayload = Seq("p_event_id"), matchedTimeCol = "p_ts",
          toleranceUs = Some(3L * 86400000000L), forward = true,
          rightTieBreak = Seq("p_event_id"))
        .select(col("event_id"), col("user_id"), col("ts"), col("p_ts"),
          col("p_event_id"),
          (unix_micros(col("p_ts").cast("timestamp")) -
            unix_micros(col("ts").cast("timestamp"))).as("wait_us"))
        .orderBy("event_id")
    },

    // ---- edit-distance similarity self-join over id-like strings ----
    QueryDef(
      "q_join_editdist",
      """WITH v AS (
        |  SELECT DISTINCT 's' || CAST(event_id % 2500 AS VARCHAR) AS w
        |  FROM events)
        |SELECT a.w AS s1, b.w AS s2,
        |  CAST(levenshtein(a.w, b.w) AS BIGINT) AS dist
        |FROM v a JOIN v b
        |  ON a.w < b.w AND abs(length(a.w) - length(b.w)) <= 1
        | AND levenshtein(a.w, b.w) <= 1
        |ORDER BY s1, s2""".stripMargin) { (s, dir) =>
      val strs = Tables.df(s, dir, "events").select(
        concat(lit("s"), (col("event_id") % 2500).cast("string")).as("w"))
      graft.operators.Dedup.editDistancePairs(strs, "w", maxDist = 1)
        .select(col("s1"), col("s2"), col("dist").cast("bigint").as("dist"))
        .orderBy("s1", "s2")
    },

    // ---- binned range join: overlapping price bands over lineitem ----
    QueryDef(
      "q_join_range_bin",
      """WITH bands AS (
        |  SELECT CAST(r AS BIGINT) AS band_id, r * 50.0 AS lo,
        |         r * 50.0 + 200.0 AS hi
        |  FROM range(0, 2100) t(r))
        |SELECT band_id, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM bands JOIN lineitem
        |  ON l_extendedprice >= lo AND l_extendedprice < hi
        |GROUP BY band_id
        |ORDER BY band_id""".stripMargin) { (s, dir) =>
      val bands = s.range(0, 2100).select(
        col("id").as("band_id"),
        (col("id") * lit(50.0)).as("lo"),
        (col("id") * lit(50.0) + lit(200.0)).as("hi"))
      Top.rangeJoin(Tables.df(s, dir, "lineitem"), "l_extendedprice",
          bands, "lo", "hi", binWidth = 200.0)
        .groupBy("band_id")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)"))
            .cast("double").as("qty"))
        .orderBy("band_id")
    },

    // ---- interval-overlap join: same-customer order windows ----
    QueryDef(
      "q_join_interval",
      """SELECT a.o_orderkey AS k1, b.o_orderkey AS k2,
        |  a.o_custkey AS custkey
        |FROM orders a JOIN orders b
        |  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
        | AND a.o_orderdate < b.o_orderdate + INTERVAL 10 DAY
        | AND b.o_orderdate < a.o_orderdate + INTERVAL 10 DAY
        |ORDER BY k1, k2""".stripMargin) { (s, dir) =>
      val o = Tables.df(s, dir, "orders")
      def days = datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).cast("double")
      val a = o.select(col("o_orderkey").as("k1"),
        col("o_custkey").as("c1"), days.as("lo1"),
        (days + 10.0).as("hi1"))
      val b = o.select(col("o_orderkey").as("k2"),
        col("o_custkey").as("c2"), days.as("lo2"),
        (days + 10.0).as("hi2"))
      Top.intervalJoin(a, "lo1", "hi1", b, "lo2", "hi2",
          binWidth = 10.0, keys = Seq(("c1", "c2")))
        .filter(col("k1") < col("k2"))
        .select(col("k1"), col("k2"), col("c1").as("custkey"))
        .orderBy("k1", "k2")
    },

    // ---- gap fill: dense daily per-user series, locf + linear ----
    QueryDef(
      "q_ts_gapfill",
      """WITH daily AS (
        |  SELECT user_id, date_trunc('day', ts) AS d,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        |  FROM events GROUP BY 1, 2),
        |bounds AS (
        |  SELECT user_id, MIN(d) AS lo, MAX(d) AS hi FROM daily GROUP BY 1),
        |grid AS (
        |  SELECT user_id,
        |    UNNEST(GENERATE_SERIES(lo, hi, INTERVAL 1 DAY)) AS d
        |  FROM bounds),
        |j AS (
        |  SELECT g.user_id, g.d, daily.v
        |  FROM grid g
        |  LEFT JOIN daily ON daily.user_id = g.user_id AND daily.d = g.d)
        |SELECT user_id, d, v IS NOT NULL AS observed,
        |  last_value(v IGNORE NULLS) OVER w_up AS v_locf,
        |  CASE WHEN v IS NOT NULL THEN v
        |    ELSE last_value(v IGNORE NULLS) OVER w_up
        |      + (first_value(v IGNORE NULLS) OVER w_dn
        |         - last_value(v IGNORE NULLS) OVER w_up)
        |      * (CAST(epoch_us(d) - epoch_us(last_value(
        |            CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
        |            OVER w_up) AS DOUBLE)
        |         / CAST(epoch_us(first_value(
        |            CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
        |            OVER w_dn) - epoch_us(last_value(
        |            CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
        |            OVER w_up) AS DOUBLE))
        |  END AS v_interp
        |FROM j
        |WINDOW w_up AS (PARTITION BY user_id ORDER BY d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  w_dn AS (PARTITION BY user_id ORDER BY d
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id, d""".stripMargin) { (s, dir) =>
      val daily = Tables.df(s, dir, "events")
        .groupBy(col("user_id"), date_trunc("DAY", col("ts")).as("d"))
        .agg(sum(col("value").cast("decimal(18,2)"))
          .cast("double").as("v"))
      Top.gapFill(daily, Seq("user_id"), "d", "v", "interval 1 day")
        .orderBy("user_id", "d")
    },

    // ---- PageRank over a synthesized link graph: 3 unrolled
    // iterations, per-edge contributions quantized to integer
    // pico-units (floor(x*1e12+0.5) — pure exactly-rounded IEEE ops,
    // no decimal tie-breaking) and summed as BIGINT, so the oracle's
    // unrolled CTEs reproduce every rank bit-for-bit ----
    QueryDef(
      "q_graph_pagerank", {
        def iter(prev: String, cur: String): String =
          s"""$cur AS (
             |  SELECT n.node,
             |    (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))
             |        / (SELECT n FROM meta)
             |      + CAST(0.85 AS DOUBLE) *
             |        (CAST(COALESCE(s.s, 0) AS DOUBLE) / 1e12) AS rank
             |  FROM nodes n LEFT JOIN (
             |    SELECT e.dst,
             |      CAST(SUM(CAST(floor(r.rank / CAST(od.od AS DOUBLE)
             |        * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS s
             |    FROM e JOIN $prev r ON r.node = e.src
             |    JOIN od ON od.src = e.src
             |    GROUP BY e.dst) s ON s.dst = n.node)"""
            .stripMargin
        s"""WITH e AS (
           |  SELECT DISTINCT src, dst FROM (
           |    SELECT event_id % 1000 AS src,
           |           (event_id * 7 + 3) % 1000 AS dst FROM events
           |    UNION ALL
           |    SELECT event_id % 1000, (event_id * 31 + 11) % 500
           |    FROM events
           |    UNION ALL
           |    SELECT (event_id * 3) % 500, (event_id * 17 + 1) % 1000
           |    FROM events) t),
           |nodes AS (SELECT DISTINCT node FROM (
           |  SELECT src AS node FROM e UNION ALL SELECT dst FROM e) t),
           |meta AS (SELECT COUNT(*) AS n FROM nodes),
           |od AS (SELECT src, COUNT(*) AS od FROM e GROUP BY src),
           |r0 AS (SELECT node,
           |  CAST(1 AS DOUBLE) / (SELECT n FROM meta) AS rank FROM nodes),
           |${iter("r0", "r1")},
           |${iter("r1", "r2")},
           |${iter("r2", "r3")}
           |SELECT node, rank FROM r3 ORDER BY node""".stripMargin
      }) { (s, dir) =>
      val ev = Tables.df(s, dir, "events")
      val edges = ev.select((col("event_id") % 1000).as("src"),
          ((col("event_id") * 7 + 3) % 1000).as("dst"))
        .unionByName(ev.select((col("event_id") % 1000).as("src"),
          ((col("event_id") * 31 + 11) % 500).as("dst")))
        .unionByName(ev.select(((col("event_id") * 3) % 500).as("src"),
          ((col("event_id") * 17 + 1) % 1000).as("dst")))
      graft.operators.Graph.pageRank(edges, "src", "dst", iters = 3)
        .orderBy("node")
    },

    // ---- grid-partitioned spatial join: points in boxes ----
    QueryDef(
      "q_spatial_grid_join",
      """WITH p AS (
        |  SELECT event_id AS pid,
        |    CAST((event_id * 3) % 97 AS DOUBLE) AS px,
        |    CAST((user_id * 7) % 89 AS DOUBLE) AS py
        |  FROM events WHERE event_id < 2000),
        |b AS (
        |  SELECT event_id AS bid,
        |    CAST((event_id * 13) % 80 AS DOUBLE) AS bx0,
        |    CAST((event_id * 29) % 80 AS DOUBLE) AS by0,
        |    CAST((event_id * 13) % 80 + (event_id % 15) + 3 AS DOUBLE) AS bx1,
        |    CAST((event_id * 29) % 80 + (event_id % 11) + 3 AS DOUBLE) AS by1
        |  FROM events WHERE event_id < 200)
        |SELECT bid, COUNT(*) AS n_pts,
        |  CAST(SUM(pid) AS BIGINT) AS sum_pid
        |FROM b JOIN p
        |  ON px >= bx0 AND px <= bx1 AND py >= by0 AND py <= by1
        |GROUP BY bid
        |ORDER BY bid""".stripMargin) { (s, dir) =>
      graft.functions.PgFunctions.register(s)
      val ev = Tables.df(s, dir, "events")
      val pts = ev.filter(col("event_id") < 2000).select(
        col("event_id").as("pid"),
        expr("st_point(CAST((event_id * 3) % 97 AS DOUBLE), " +
          "CAST((user_id * 7) % 89 AS DOUBLE))").as("pgeom"))
      val boxes = ev.filter(col("event_id") < 200).select(
        col("event_id").as("bid"),
        expr("st_makeenvelope(" +
          "CAST((event_id * 13) % 80 AS DOUBLE), " +
          "CAST((event_id * 29) % 80 AS DOUBLE), " +
          "CAST((event_id * 13) % 80 + (event_id % 15) + 3 AS DOUBLE), " +
          "CAST((event_id * 29) % 80 + (event_id % 11) + 3 AS DOUBLE))")
          .as("bgeom"))
      SpatialJoin.intersectsJoin(pts, "pgeom", boxes, "bgeom",
          cellSize = 16.0)
        .groupBy("bid")
        .agg(count(lit(1)).as("n_pts"),
          sum(col("pid")).cast("bigint").as("sum_pid"))
        .orderBy("bid")
    })
}
