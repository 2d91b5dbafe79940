package graft.queries

import graft.QueryDef

/** Spatial operator surface (SURVEY.md §2.7 "Spatial"; reference ships
  * 74 st_* functions via PostGIS + DuckDB-spatial,
  * pg_lake_engine/src/pgduck/shippable_spatial_functions.c). Our layer is
  * the pure-Scala [[graft.functions.Geometry]] core exposed as st_*
  * Catalyst expressions.
  *
  * Oracle strategy: no spatial extension exists in the offline DuckDB, so
  * each judged query derives INTEGER-VALUED coordinates from fixture keys
  * and the oracle recomputes the same cartesian math in plain SQL.
  * On integer-valued doubles every product/sum below is exact IEEE
  * arithmetic and sqrt is correctly rounded on identical inputs, so
  * results are bit-identical by construction, not by tolerance.
  */
object Spatial {

  val defs: Seq[QueryDef] = Seq(

    // ---- point constructors, accessors, distance, dwithin, WKT ----
    QueryDef.sql(
      "q_spatial_point",
      """WITH d AS (
        |  SELECT event_id,
        |    CAST(event_id % 100 AS DOUBLE) AS x1,
        |    CAST(user_id % 100 AS DOUBLE) AS y1,
        |    CAST((event_id * 7 + 13) % 100 AS DOUBLE) AS x2,
        |    CAST((user_id * 11 + 5) % 100 AS DOUBLE) AS y2
        |  FROM events WHERE event_id < 2000),
        |g AS (
        |  SELECT event_id, st_point(x1, y1) AS p1, st_point(x2, y2) AS p2
        |  FROM d)
        |SELECT event_id,
        |  st_x(p1) AS x1_v, st_y(p1) AS y1_v,
        |  st_distance(p1, p2) AS dist_v,
        |  st_dwithin(p1, p2, 25.0) AS near_v,
        |  st_astext(p1) AS wkt_v,
        |  st_astext(st_difference(p1,
        |    st_makeenvelope(20.0, 20.0, 60.0, 60.0))) AS diff_v
        |FROM g ORDER BY event_id""".stripMargin,
      oracle =
        """WITH d AS (
          |  SELECT event_id,
          |    CAST(event_id % 100 AS DOUBLE) AS x1,
          |    CAST(user_id % 100 AS DOUBLE) AS y1,
          |    CAST((event_id * 7 + 13) % 100 AS DOUBLE) AS x2,
          |    CAST((user_id * 11 + 5) % 100 AS DOUBLE) AS y2,
          |    event_id % 100 AS ix1, user_id % 100 AS iy1
          |  FROM events WHERE event_id < 2000)
          |SELECT event_id,
          |  x1 AS x1_v, y1 AS y1_v,
          |  sqrt((x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2)) AS dist_v,
          |  sqrt((x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2)) <= 25.0 AS near_v,
          |  'POINT(' || CAST(ix1 AS VARCHAR) || ' ' || CAST(iy1 AS VARCHAR) || ')' AS wkt_v,
          |  CASE WHEN x1 BETWEEN 20 AND 60 AND y1 BETWEEN 20 AND 60
          |    THEN 'POINT EMPTY'
          |    ELSE 'POINT(' || CAST(ix1 AS VARCHAR) || ' ' || CAST(iy1 AS VARCHAR) || ')'
          |  END AS diff_v
          |FROM d ORDER BY event_id""".stripMargin),

    // ---- envelopes: area/perimeter/centroid + exact predicates ----
    QueryDef.sql(
      "q_spatial_box",
      """WITH d AS (
        |  SELECT event_id,
        |    CAST(event_id % 50 AS DOUBLE) AS ax,
        |    CAST(user_id % 50 AS DOUBLE) AS ay,
        |    CAST(event_id % 50 + event_id % 7 + 1 AS DOUBLE) AS bx,
        |    CAST(user_id % 50 + user_id % 5 + 1 AS DOUBLE) AS by,
        |    CAST((event_id * 3) % 60 AS DOUBLE) AS px,
        |    CAST((user_id * 3) % 60 AS DOUBLE) AS py
        |  FROM events WHERE event_id < 2500),
        |g AS (
        |  SELECT event_id,
        |    st_makeenvelope(ax, ay, bx, by) AS env,
        |    st_makeenvelope(px, py, px + 5, py + 5) AS env2,
        |    st_point(px, py) AS p
        |  FROM d)
        |SELECT event_id,
        |  st_area(env) AS area_v,
        |  st_perimeter(env) AS perim_v,
        |  st_contains(env, p) AS contains_v,
        |  st_covers(env, p) AS covers_v,
        |  st_intersects(env, env2) AS intersects_v,
        |  st_xmin(env) AS xmin_v, st_ymax(env) AS ymax_v,
        |  st_x(st_centroid(env)) AS cx_v
        |FROM g ORDER BY event_id""".stripMargin,
      oracle =
        """WITH d AS (
          |  SELECT event_id,
          |    CAST(event_id % 50 AS DOUBLE) AS ax,
          |    CAST(user_id % 50 AS DOUBLE) AS ay,
          |    CAST(event_id % 50 + event_id % 7 + 1 AS DOUBLE) AS bx,
          |    CAST(user_id % 50 + user_id % 5 + 1 AS DOUBLE) AS by,
          |    CAST((event_id * 3) % 60 AS DOUBLE) AS px,
          |    CAST((user_id * 3) % 60 AS DOUBLE) AS py
          |  FROM events WHERE event_id < 2500)
          |SELECT event_id,
          |  (bx - ax) * (by - ay) AS area_v,
          |  (bx - ax) + (by - ay) + (bx - ax) + (by - ay) AS perim_v,
          |  (px > ax AND px < bx AND py > ay AND py < by) AS contains_v,
          |  (px >= ax AND px <= bx AND py >= ay AND py <= by) AS covers_v,
          |  (ax <= px + 5 AND px <= bx AND ay <= py + 5 AND py <= by) AS intersects_v,
          |  ax AS xmin_v, by AS ymax_v,
          |  (ax + bx) / 2 AS cx_v
          |FROM d ORDER BY event_id""".stripMargin),

    // ---- polygons parsed from WKT: shoelace area, exact point-in-
    //      triangle (division-free sign tests on both sides) ----
    QueryDef.sql(
      "q_spatial_poly",
      """WITH d AS (
        |  SELECT event_id,
        |    event_id % 40 AS ax, user_id % 40 AS ay,
        |    event_id % 40 + 1 + event_id % 13 AS bx,
        |    user_id % 40 + event_id % 3 AS by,
        |    event_id % 40 + event_id % 5 AS cx,
        |    user_id % 40 + 2 + user_id % 11 AS cy,
        |    event_id % 40 + 1 AS px, user_id % 40 + 1 AS py
        |  FROM events WHERE event_id < 2500),
        |g AS (
        |  SELECT event_id, ax, bx, cx,
        |    st_geomfromtext(concat('POLYGON((',
        |      CAST(ax AS STRING), ' ', CAST(ay AS STRING), ', ',
        |      CAST(bx AS STRING), ' ', CAST(by AS STRING), ', ',
        |      CAST(cx AS STRING), ' ', CAST(cy AS STRING), ', ',
        |      CAST(ax AS STRING), ' ', CAST(ay AS STRING), '))')) AS tri,
        |    st_geomfromtext(concat('MULTIPOINT(',
        |      CAST(ax AS STRING), ' ', CAST(ay AS STRING), ', ',
        |      CAST(bx AS STRING), ' ', CAST(by AS STRING), ', ',
        |      CAST(cx AS STRING), ' ', CAST(cy AS STRING), ')')) AS mp,
        |    st_point(CAST(px AS DOUBLE), CAST(py AS DOUBLE)) AS p
        |  FROM d)
        |SELECT event_id,
        |  st_area(tri) AS area_v,
        |  st_perimeter(tri) AS perim_v,
        |  st_npoints(tri) AS np_v,
        |  st_x(st_centroid(mp)) AS cx_v,
        |  st_y(st_centroid(mp)) AS cy_v,
        |  st_contains(tri, p) AS contains_v,
        |  st_within(p, tri) AS within_v,
        |  st_geometrytype(tri) AS type_v
        |FROM g ORDER BY event_id""".stripMargin,
      oracle =
        """WITH d AS (
          |  SELECT event_id,
          |    event_id % 40 AS ax, user_id % 40 AS ay,
          |    event_id % 40 + 1 + event_id % 13 AS bx,
          |    user_id % 40 + event_id % 3 AS by,
          |    event_id % 40 + event_id % 5 AS cx,
          |    user_id % 40 + 2 + user_id % 11 AS cy,
          |    event_id % 40 + 1 AS px, user_id % 40 + 1 AS py
          |  FROM events WHERE event_id < 2500),
          |s AS (
          |  SELECT event_id, ax, ay, bx, by, cx, cy, px, py,
          |    (bx - ax) * (py - ay) - (by - ay) * (px - ax) AS c1,
          |    (cx - bx) * (py - by) - (cy - by) * (px - bx) AS c2,
          |    (ax - cx) * (py - cy) - (ay - cy) * (px - cx) AS c3
          |  FROM d)
          |SELECT event_id,
          |  abs(CAST(ax * by - bx * ay + bx * cy - cx * by + cx * ay - ax * cy
          |      AS DOUBLE)) / 2 AS area_v,
          |  sqrt(CAST((bx - ax) * (bx - ax) + (by - ay) * (by - ay) AS DOUBLE))
          |    + sqrt(CAST((cx - bx) * (cx - bx) + (cy - by) * (cy - by) AS DOUBLE))
          |    + sqrt(CAST((ax - cx) * (ax - cx) + (ay - cy) * (ay - cy) AS DOUBLE)) AS perim_v,
          |  4 AS np_v,
          |  CAST(ax + bx + cx AS DOUBLE) / 3 AS cx_v,
          |  CAST(ay + by + cy AS DOUBLE) / 3 AS cy_v,
          |  ((c1 > 0 AND c2 > 0 AND c3 > 0) OR (c1 < 0 AND c2 < 0 AND c3 < 0)) AS contains_v,
          |  ((c1 > 0 AND c2 > 0 AND c3 > 0) OR (c1 < 0 AND c2 < 0 AND c3 < 0)) AS within_v,
          |  'ST_Polygon' AS type_v
          |FROM s ORDER BY event_id""".stripMargin),

    // ---- DE-9IM predicates (touches/overlaps/containsproperly/
    // crosses) on integer boxes + a horizontal probe line; the oracle
    // is interval arithmetic in plain SQL, exact by construction ----
    QueryDef.sql(
      "q_spatial_relate",
      """WITH d AS (
        |  SELECT event_id,
        |    CAST(event_id % 40 AS DOUBLE) AS ax,
        |    CAST(user_id % 40 AS DOUBLE) AS ay,
        |    CAST(event_id % 40 + 6 AS DOUBLE) AS ax2,
        |    CAST(user_id % 40 + 6 AS DOUBLE) AS ay2,
        |    CAST((event_id * 3 + 2) % 40 AS DOUBLE) AS bx,
        |    CAST((user_id * 5 + 1) % 40 AS DOUBLE) AS by,
        |    CAST((event_id * 3 + 2) % 40 + 4 AS DOUBLE) AS bx2,
        |    CAST((user_id * 5 + 1) % 40 + 4 AS DOUBLE) AS by2,
        |    CAST((event_id * 7) % 40 AS DOUBLE) AS lx,
        |    CAST((event_id * 7) % 40 + 10 AS DOUBLE) AS lx2,
        |    CAST((user_id * 7 + 3) % 40 AS DOUBLE) AS ly
        |  FROM events WHERE event_id < 2500),
        |g AS (
        |  SELECT event_id,
        |    st_makeenvelope(ax, ay, ax2, ay2) AS a,
        |    st_makeenvelope(bx, by, bx2, by2) AS b,
        |    st_makeline(st_point(lx, ly), st_point(lx2, ly)) AS l
        |  FROM d)
        |SELECT event_id,
        |  st_touches(a, b) AS touches_v,
        |  st_overlaps(a, b) AS overlaps_v,
        |  st_containsproperly(a, b) AS cp_v,
        |  st_crosses(l, a) AS crosses_v,
        |  st_area(st_intersection(a, b)) AS clip_area_v
        |FROM g ORDER BY event_id""".stripMargin,
      oracle =
        """WITH d AS (
          |  SELECT event_id,
          |    CAST(event_id % 40 AS DOUBLE) AS ax,
          |    CAST(user_id % 40 AS DOUBLE) AS ay,
          |    CAST(event_id % 40 + 6 AS DOUBLE) AS ax2,
          |    CAST(user_id % 40 + 6 AS DOUBLE) AS ay2,
          |    CAST((event_id * 3 + 2) % 40 AS DOUBLE) AS bx,
          |    CAST((user_id * 5 + 1) % 40 AS DOUBLE) AS by,
          |    CAST((event_id * 3 + 2) % 40 + 4 AS DOUBLE) AS bx2,
          |    CAST((user_id * 5 + 1) % 40 + 4 AS DOUBLE) AS by2,
          |    CAST((event_id * 7) % 40 AS DOUBLE) AS lx,
          |    CAST((event_id * 7) % 40 + 10 AS DOUBLE) AS lx2,
          |    CAST((user_id * 7 + 3) % 40 AS DOUBLE) AS ly
          |  FROM d0),
          |m AS (
          |  SELECT event_id,
          |    (ax <= bx2 AND bx <= ax2 AND ay <= by2 AND by <= ay2) AS inter,
          |    (ax < bx2 AND bx < ax2 AND ay < by2 AND by < ay2) AS ii,
          |    (bx >= ax AND bx2 <= ax2 AND by >= ay AND by2 <= ay2) AS a_cov_b,
          |    (ax >= bx AND ax2 <= bx2 AND ay >= by AND ay2 <= by2) AS b_cov_a,
          |    (bx > ax AND bx2 < ax2 AND by > ay AND by2 < ay2) AS a_cp_b,
          |    (ly > ay AND ly < ay2 AND lx < ax2 AND ax < lx2) AS l_ii,
          |    (ly >= ay AND ly <= ay2 AND lx >= ax AND lx2 <= ax2) AS l_cov,
          |    GREATEST(0.0, LEAST(ax2, bx2) - GREATEST(ax, bx)) AS clip_w,
          |    GREATEST(0.0, LEAST(ay2, by2) - GREATEST(ay, by)) AS clip_h
          |  FROM d)
          |SELECT event_id,
          |  (inter AND NOT ii) AS touches_v,
          |  (ii AND NOT a_cov_b AND NOT b_cov_a) AS overlaps_v,
          |  a_cp_b AS cp_v,
          |  (l_ii AND NOT l_cov) AS crosses_v,
          |  clip_w * clip_h AS clip_area_v
          |FROM m ORDER BY event_id""".stripMargin
          .replace("FROM d0",
            "FROM events WHERE event_id < 2500")),

    // ---- general (non-convex) overlay: an integer-coordinate L-shape
    // against a half-integer-offset box (generic position by
    // construction, so the Greiner–Hormann path never refuses). The
    // oracle decomposes the L into two rectangles and recomputes every
    // area with interval arithmetic: intersection directly,
    // union/difference via inclusion–exclusion. True areas are exact
    // multiples of 0.25, so round(·,6) absorbs the crossing-point
    // constructions' final-ulp noise and the compare is exact. --------
    QueryDef.sql(
      "q_spatial_overlay",
      """WITH d AS (
        |  SELECT event_id,
        |    6 + event_id % 7 AS w, 1 + event_id % 5 AS w1,
        |    1 + user_id % 5 AS h1, 2 + user_id % 5 + user_id % 7 AS h2,
        |    CAST((event_id * 3) % 10 AS DOUBLE) + 0.5 AS qx1,
        |    CAST((user_id * 3) % 10 AS DOUBLE) + 0.5 AS qy1,
        |    CAST((event_id * 3) % 10 + 2 + event_id % 5 AS DOUBLE) + 0.5 AS qx2,
        |    CAST((user_id * 3) % 10 + 2 + user_id % 5 AS DOUBLE) + 0.5 AS qy2
        |  FROM events WHERE event_id < 2000),
        |g AS (
        |  SELECT event_id,
        |    st_geomfromtext(concat('POLYGON((0 0, ',
        |      CAST(w AS STRING), ' 0, ',
        |      CAST(w AS STRING), ' ', CAST(h1 AS STRING), ', ',
        |      CAST(w1 AS STRING), ' ', CAST(h1 AS STRING), ', ',
        |      CAST(w1 AS STRING), ' ', CAST(h2 AS STRING), ', ',
        |      '0 ', CAST(h2 AS STRING), ', 0 0))')) AS l,
        |    st_makeenvelope(qx1, qy1, qx2, qy2) AS q
        |  FROM d)
        |SELECT event_id,
        |  round(st_area(st_intersection(q, l)), 6) AS ia_v,
        |  round(st_area(st_union(l, q)), 6) AS ua_v,
        |  round(st_area(st_difference(l, q)), 6) AS da_v,
        |  st_geometrytype(st_union(l, q)) AS utype_v
        |FROM g ORDER BY event_id""".stripMargin,
      oracle =
        """WITH d AS (
          |  SELECT event_id,
          |    CAST(6 + event_id % 7 AS DOUBLE) AS w,
          |    CAST(1 + event_id % 5 AS DOUBLE) AS w1,
          |    CAST(1 + user_id % 5 AS DOUBLE) AS h1,
          |    CAST(2 + user_id % 5 + user_id % 7 AS DOUBLE) AS h2,
          |    CAST((event_id * 3) % 10 AS DOUBLE) + 0.5 AS qx1,
          |    CAST((user_id * 3) % 10 AS DOUBLE) + 0.5 AS qy1,
          |    CAST((event_id * 3) % 10 + 2 + event_id % 5 AS DOUBLE) + 0.5 AS qx2,
          |    CAST((user_id * 3) % 10 + 2 + user_id % 5 AS DOUBLE) + 0.5 AS qy2
          |  FROM events WHERE event_id < 2000),
          |m AS (
          |  SELECT event_id,
          |    GREATEST(0, LEAST(w, qx2) - GREATEST(0, qx1)) *
          |      GREATEST(0, LEAST(h1, qy2) - GREATEST(0, qy1))
          |    + GREATEST(0, LEAST(w1, qx2) - GREATEST(0, qx1)) *
          |      GREATEST(0, LEAST(h2, qy2) - GREATEST(h1, qy1)) AS ia,
          |    w * h1 + w1 * (h2 - h1) AS la,
          |    (qx2 - qx1) * (qy2 - qy1) AS qa
          |  FROM d)
          |SELECT event_id,
          |  round(ia, 6) AS ia_v,
          |  round(la + qa - ia, 6) AS ua_v,
          |  round(la - ia, 6) AS da_v,
          |  CASE WHEN ia = 0 THEN 'ST_MultiPolygon' ELSE 'ST_Polygon' END
          |    AS utype_v
          |FROM m ORDER BY event_id""".stripMargin),

    // ---- degenerate boundary contact: the noded overlay path.
    // Rectangle b touches a along the x=w edge (full, partial, or
    // corner-only contact depending on y1), rectangle c sits inside a
    // sharing the origin corner's two edges. Every output has a
    // closed-form oracle: union/difference areas are exact integer
    // arithmetic, and the union type flips to MultiPolygon exactly
    // when the contact degenerates to the corner point (y1 = h). ----
    QueryDef.sql(
      "q_spatial_overlay_touch",
      """WITH d0 AS (
        |  SELECT event_id, user_id,
        |    3 + CAST(event_id % 5 AS INT) AS w,
        |    2 + CAST(user_id % 4 AS INT) AS h,
        |    1 + CAST(event_id % 4 AS INT) AS v,
        |    1 + CAST(user_id % 3 AS INT) AS u
        |  FROM events WHERE event_id < 2000),
        |d AS (
        |  SELECT event_id, w, h, v, u,
        |    CAST(event_id % (h + 1) AS INT) AS y1,
        |    1 + CAST(event_id % (w - 1) AS INT) AS c1,
        |    1 + CAST(user_id % (h - 1) AS INT) AS c2
        |  FROM d0),
        |g AS (
        |  SELECT event_id, w, h, v, u, y1, c1, c2,
        |    st_makeenvelope(0, 0, w, h) AS a,
        |    st_makeenvelope(w, y1, w + v, y1 + u) AS b,
        |    st_makeenvelope(0, 0, c1, c2) AS c
        |  FROM d)
        |SELECT event_id,
        |  round(st_area(st_union(a, b)), 6) AS ub_v,
        |  round(st_area(st_difference(a, b)), 6) AS dab_v,
        |  st_geometrytype(st_union(a, b)) AS ut_v,
        |  round(st_area(st_intersection(a, c)), 6) AS iac_v,
        |  round(st_area(st_union(a, c)), 6) AS uac_v,
        |  round(st_area(st_difference(a, c)), 6) AS dac_v
        |FROM g ORDER BY event_id""".stripMargin,
      oracle =
        """WITH d0 AS (
          |  SELECT event_id, user_id,
          |    3 + CAST(event_id % 5 AS INT) AS w,
          |    2 + CAST(user_id % 4 AS INT) AS h,
          |    1 + CAST(event_id % 4 AS INT) AS v,
          |    1 + CAST(user_id % 3 AS INT) AS u
          |  FROM events WHERE event_id < 2000),
          |d AS (
          |  SELECT event_id, w, h, v, u,
          |    CAST(event_id % (h + 1) AS INT) AS y1,
          |    1 + CAST(event_id % (w - 1) AS INT) AS c1,
          |    1 + CAST(user_id % (h - 1) AS INT) AS c2
          |  FROM d0)
          |SELECT event_id,
          |  round(CAST(w * h + v * u AS DOUBLE), 6) AS ub_v,
          |  round(CAST(w * h AS DOUBLE), 6) AS dab_v,
          |  CASE WHEN y1 < h THEN 'ST_Polygon'
          |       ELSE 'ST_MultiPolygon' END AS ut_v,
          |  round(CAST(c1 * c2 AS DOUBLE), 6) AS iac_v,
          |  round(CAST(w * h AS DOUBLE), 6) AS uac_v,
          |  round(CAST(w * h - c1 * c2 AS DOUBLE), 6) AS dac_v
          |FROM d ORDER BY event_id""".stripMargin),

    // ---- line buffer: the round-join capsule outline has closed-form
    // area and perimeter (rectangle + two inscribed half-2q-gon caps:
    // 2rL + 16 r² sin(π/16), 2L + 64 r sin(π/32)), so the oracle
    // recomputes both in plain SQL. round(·,4) absorbs the ~1e-12
    // shoelace-vs-formula float noise; vertex count is structural. ----
    QueryDef.sql(
      "q_spatial_buffer",
      """WITH d AS (
        |  SELECT event_id,
        |    CAST(event_id % 30 AS DOUBLE) AS x1,
        |    CAST(user_id % 30 AS DOUBLE) AS y1,
        |    CAST(event_id % 30 + 1 + event_id % 7 AS DOUBLE) AS x2,
        |    CAST(user_id % 30 + event_id % 5 AS DOUBLE) AS y2,
        |    CAST(1 + event_id % 3 AS DOUBLE) AS r
        |  FROM events WHERE event_id < 2000),
        |g AS (
        |  SELECT event_id, r,
        |    sqrt((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1)) AS len,
        |    st_buffer(st_makeline(st_point(x1, y1), st_point(x2, y2)), r)
        |      AS b
        |  FROM d)
        |SELECT event_id,
        |  round(st_area(b), 4) AS area_v,
        |  round(st_perimeter(b), 4) AS perim_v,
        |  st_npoints(b) AS np_v
        |FROM g ORDER BY event_id""".stripMargin,
      oracle =
        """WITH d AS (
          |  SELECT event_id,
          |    CAST(event_id % 30 AS DOUBLE) AS x1,
          |    CAST(user_id % 30 AS DOUBLE) AS y1,
          |    CAST(event_id % 30 + 1 + event_id % 7 AS DOUBLE) AS x2,
          |    CAST(user_id % 30 + event_id % 5 AS DOUBLE) AS y2,
          |    CAST(1 + event_id % 3 AS DOUBLE) AS r
          |  FROM events WHERE event_id < 2000),
          |m AS (
          |  SELECT event_id, r,
          |    sqrt((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1)) AS len
          |  FROM d)
          |SELECT event_id,
          |  round(2 * r * len + 16 * r * r * sin(pi() / 16), 4) AS area_v,
          |  round(2 * len + 64 * r * sin(pi() / 32), 4) AS perim_v,
          |  35 AS np_v
          |FROM m ORDER BY event_id""".stripMargin),

    // ---- mixed-dimension overlay ops: a half-integer horizontal
    // probe against the integer L-shape (line ∩ polygon keeps the
    // inside span, line − polygon the outside stubs) and a crossing
    // vertical probe (line ∩ line = the crossing point). The oracle is
    // case arithmetic: inside length is w below the foot, w1 in the
    // arm band, 0 above; the probes always cross at (px, py). --------
    QueryDef.sql(
      "q_spatial_lineops",
      """WITH d AS (
        |  SELECT event_id,
        |    6 + event_id % 7 AS w, 1 + event_id % 5 AS w1,
        |    1 + user_id % 5 AS h1, 2 + user_id % 5 + user_id % 7 AS h2,
        |    CAST(user_id % 12 AS DOUBLE) + 0.5 AS py,
        |    CAST(event_id % 6 AS DOUBLE) + 0.5 AS px
        |  FROM events WHERE event_id < 2000),
        |g AS (
        |  SELECT event_id, w, py, px,
        |    st_geomfromtext(concat('POLYGON((0 0, ',
        |      CAST(w AS STRING), ' 0, ',
        |      CAST(w AS STRING), ' ', CAST(h1 AS STRING), ', ',
        |      CAST(w1 AS STRING), ' ', CAST(h1 AS STRING), ', ',
        |      CAST(w1 AS STRING), ' ', CAST(h2 AS STRING), ', ',
        |      '0 ', CAST(h2 AS STRING), ', 0 0))')) AS l,
        |    st_makeline(st_point(-0.5, py),
        |      st_point(CAST(w AS DOUBLE) + 1.5, py)) AS hl,
        |    st_makeline(st_point(px, -0.5), st_point(px, 13.5)) AS vl
        |  FROM d)
        |SELECT event_id,
        |  round(st_length(st_intersection(hl, l)), 6) AS il_v,
        |  round(st_length(st_difference(hl, l)), 6) AS dl_v,
        |  round(st_x(st_intersection(hl, vl)), 6) AS xx_v,
        |  round(st_y(st_intersection(hl, vl)), 6) AS xy_v
        |FROM g ORDER BY event_id""".stripMargin,
      oracle =
        """WITH d AS (
          |  SELECT event_id,
          |    CAST(6 + event_id % 7 AS DOUBLE) AS w,
          |    CAST(1 + event_id % 5 AS DOUBLE) AS w1,
          |    CAST(1 + user_id % 5 AS DOUBLE) AS h1,
          |    CAST(2 + user_id % 5 + user_id % 7 AS DOUBLE) AS h2,
          |    CAST(user_id % 12 AS DOUBLE) + 0.5 AS py,
          |    CAST(event_id % 6 AS DOUBLE) + 0.5 AS px
          |  FROM events WHERE event_id < 2000),
          |m AS (
          |  SELECT event_id, w, py, px,
          |    CASE WHEN py < h1 THEN w WHEN py < h2 THEN w1
          |      ELSE 0.0 END AS il
          |  FROM d)
          |SELECT event_id,
          |  round(il, 6) AS il_v,
          |  round(w + 2 - il, 6) AS dl_v,
          |  round(px, 6) AS xx_v,
          |  round(py, 6) AS xy_v
          |FROM m ORDER BY event_id""".stripMargin),

    // ---- zero-area contact residue: touching rectangles intersect to
    // their lower-dimensional contact (GEOS semantics). Rectangle b
    // touches a along the x=w edge: the shared stretch [y1, min(h,
    // y1+u)] comes back as a LINESTRING (length closed-form), and when
    // y1 = h the contact degenerates to the corner POINT. Rectangle l
    // shares a's full left edge → LINESTRING of length exactly h. ----
    QueryDef.sql(
      "q_spatial_overlay_residue",
      """WITH d0 AS (
        |  SELECT event_id, user_id,
        |    3 + CAST(event_id % 5 AS INT) AS w,
        |    2 + CAST(user_id % 4 AS INT) AS h,
        |    1 + CAST(event_id % 4 AS INT) AS v,
        |    1 + CAST(user_id % 3 AS INT) AS u
        |  FROM events WHERE event_id < 2000),
        |d AS (
        |  SELECT event_id, w, h, v, u,
        |    CAST(event_id % (h + 1) AS INT) AS y1
        |  FROM d0),
        |g AS (
        |  SELECT event_id, w, h, v, u, y1,
        |    st_makeenvelope(0, 0, w, h) AS a,
        |    st_makeenvelope(w, y1, w + v, y1 + u) AS b,
        |    st_makeenvelope(-v, 0, 0, h) AS l
        |  FROM d)
        |SELECT event_id,
        |  st_geometrytype(st_intersection(a, b)) AS rt_v,
        |  round(st_length(st_intersection(a, b)), 6) AS rl_v,
        |  st_npoints(st_intersection(a, b)) AS rn_v,
        |  st_geometrytype(st_intersection(a, l)) AS lt_v,
        |  round(st_length(st_intersection(a, l)), 6) AS ll_v
        |FROM g ORDER BY event_id""".stripMargin,
      oracle =
        """WITH d0 AS (
          |  SELECT event_id, user_id,
          |    3 + CAST(event_id % 5 AS INT) AS w,
          |    2 + CAST(user_id % 4 AS INT) AS h,
          |    1 + CAST(event_id % 4 AS INT) AS v,
          |    1 + CAST(user_id % 3 AS INT) AS u
          |  FROM events WHERE event_id < 2000),
          |d AS (
          |  SELECT event_id, w, h, v, u,
          |    CAST(event_id % (h + 1) AS INT) AS y1
          |  FROM d0)
          |SELECT event_id,
          |  CASE WHEN y1 < h THEN 'ST_LineString' ELSE 'ST_Point' END
          |    AS rt_v,
          |  round(CAST(CASE WHEN y1 < h
          |    THEN LEAST(h, y1 + u) - y1 ELSE 0 END AS DOUBLE), 6) AS rl_v,
          |  CAST(CASE WHEN y1 < h THEN 2 ELSE 1 END AS INT) AS rn_v,
          |  'ST_LineString' AS lt_v,
          |  round(CAST(h AS DOUBLE), 6) AS ll_v
          |FROM d ORDER BY event_id""".stripMargin),

    // ---- multipolygon operands: m = two disjoint rectangles built by
    // st_union (disjoint union → MULTIPOLYGON), overlaid with a low
    // strip b that spans both components and the gap. Intersection is
    // componentwise ((w + w2) * hb, two pieces), the union is one
    // connected polygon (b bridges the gap), and the difference is the
    // two above-strip remainders. All areas are closed-form; hb is
    // half-integer and < min(h, h2) so nothing degenerates. ----------
    QueryDef.sql(
      "q_spatial_overlay_multi",
      """WITH d AS (
        |  SELECT event_id,
        |    2 + CAST(event_id % 4 AS INT) AS w,
        |    2 + CAST(user_id % 3 AS INT) AS h,
        |    1 + CAST(event_id % 3 AS INT) AS w2,
        |    2 + CAST((event_id + user_id) % 3 AS INT) AS h2,
        |    CAST(event_id % 2 AS DOUBLE) + 0.5 AS hb
        |  FROM events WHERE event_id < 2000),
        |g AS (
        |  SELECT event_id, w, h, w2, h2, hb,
        |    st_union(st_makeenvelope(0, 0, w, h),
        |      st_makeenvelope(w + 2, 0, w + 2 + w2, h2)) AS m,
        |    st_makeenvelope(0, 0, w + 2 + w2, hb) AS b
        |  FROM d)
        |SELECT event_id,
        |  st_geometrytype(m) AS mt_v,
        |  round(st_area(st_intersection(m, b)), 6) AS ia_v,
        |  st_geometrytype(st_intersection(m, b)) AS it_v,
        |  round(st_area(st_union(m, b)), 6) AS ua_v,
        |  st_geometrytype(st_union(m, b)) AS ut_v,
        |  round(st_area(st_difference(m, b)), 6) AS da_v,
        |  st_geometrytype(st_difference(m, b)) AS dt_v
        |FROM g ORDER BY event_id""".stripMargin,
      oracle =
        """WITH d AS (
          |  SELECT event_id,
          |    2 + CAST(event_id % 4 AS INT) AS w,
          |    2 + CAST(user_id % 3 AS INT) AS h,
          |    1 + CAST(event_id % 3 AS INT) AS w2,
          |    2 + CAST((event_id + user_id) % 3 AS INT) AS h2,
          |    CAST(event_id % 2 AS DOUBLE) + 0.5 AS hb
          |  FROM events WHERE event_id < 2000)
          |SELECT event_id,
          |  'ST_MultiPolygon' AS mt_v,
          |  round((w + w2) * hb, 6) AS ia_v,
          |  'ST_MultiPolygon' AS it_v,
          |  round(w * h + w2 * h2 + (w + 2 + w2) * hb
          |    - (w + w2) * hb, 6) AS ua_v,
          |  'ST_Polygon' AS ut_v,
          |  round(w * h + w2 * h2 - (w + w2) * hb, 6) AS da_v,
          |  'ST_MultiPolygon' AS dt_v
          |FROM d ORDER BY event_id""".stripMargin),

    // ---- CRS registry: EPSG:3857 forward is closed-form in plain SQL
    // (spherical mercator), so the oracle recomputes it; every
    // projected CRS is judged by the 4326 → crs → 4326 round-trip
    // landing back on the integer-degree input (registry round-trips
    // are sub-mm ≈ 1e-8 deg, absorbed by round(·,6)); and the ETRS89
    // UTM alias must agree with WGS84 UTM to sub-mm (the datums are
    // realized as equivalent; the ellipsoids differ in 1/f only at the
    // 9th digit). Domains per CRS: France (2154), GB (27700), Europe
    // (3035), CONUS (5070), Arctic (3413), Borneo (the caller-
    // REGISTERED Hotine RSO zone: the run hook registers EPSG:29873
    // from PROJ-string constants via Crs.registerCustom before the
    // SQL resolves st_transform against it — the registration API is
    // part of the judged surface). -----------------------------------
    QueryDef(
      "q_spatial_crs",
      // the SQL text both engines see is identical; only the Spark
      // side needs the pre-registration hook, so the run function
      // registers then delegates to spark.sql
      run = (s, dir) => {
        graft.functions.PgFunctions.register(s)
        graft.Tables.registerAll(s, dir)
        graft.functions.Crs.registerCustom(29873,
          "+proj=omerc +lat_0=4 " +
            s"+lonc=115 +alpha=${53.0 + 18.0 / 60 + 56.9537 / 3600} " +
            s"+gamma=${53.0 + 7.0 / 60 + 48.3685 / 3600} +k=0.99984 " +
            "+x_0=590476.87 +y_0=442857.65 +ellps=evrstSS " +
            "+towgs84=-679,669,-48")
        s.sql(SpatialCrsSql)
      },
      oracle = Some(SpatialCrsOracle)))

  private def SpatialCrsSql: String =
      ("""WITH d AS (
        |  SELECT event_id,
        |    CAST(-5 + event_id % 12 AS DOUBLE) AS lon_fr,
        |    CAST(42 + user_id % 8 AS DOUBLE) AS lat_fr,
        |    CAST(-6 + event_id % 7 AS DOUBLE) AS lon_gb,
        |    CAST(50 + user_id % 9 AS DOUBLE) AS lat_gb,
        |    CAST(-10 + event_id % 40 AS DOUBLE) AS lon_eu,
        |    CAST(36 + user_id % 33 AS DOUBLE) AS lat_eu,
        |    CAST(-120 + event_id % 45 AS DOUBLE) AS lon_us,
        |    CAST(26 + user_id % 22 AS DOUBLE) AS lat_us,
        |    CAST(event_id % 359 - 179 AS DOUBLE) AS lon_po,
        |    CAST(61 + user_id % 28 AS DOUBLE) AS lat_po,
        |    CAST(113 + event_id % 5 AS DOUBLE) AS lon_bo,
        |    CAST(1 + user_id % 6 AS DOUBLE) AS lat_bo
        |  FROM events WHERE event_id < 2000),
        |g AS (
        |  SELECT event_id,
        |    lon_fr, lat_fr, lon_gb, lat_gb, lon_eu, lat_eu,
        |    lon_us, lat_us, lon_po, lat_po, lon_bo, lat_bo,
        |    st_setsrid(st_point(lon_bo, lat_bo), 4326) AS pbo,
        |    st_setsrid(st_point(lon_fr, lat_fr), 4326) AS pfr,
        |    st_setsrid(st_point(lon_gb, lat_gb), 4326) AS pgb,
        |    st_setsrid(st_point(lon_eu, lat_eu), 4326) AS peu,
        |    st_setsrid(st_point(lon_us, lat_us), 4326) AS pus,
        |    st_setsrid(st_point(lon_po, lat_po), 4326) AS ppo
        |  FROM d)
        |SELECT event_id,
        |  round(st_x(st_transform(pfr, 3857)), 4) AS mx_v,
        |  round(st_y(st_transform(pfr, 3857)), 4) AS my_v,
        |  round(st_x(st_transform(st_transform(pfr, 2154), 4326)), 6) AS fx_v,
        |  round(st_y(st_transform(st_transform(pfr, 2154), 4326)), 6) AS fy_v,
        |  round(st_x(st_transform(st_transform(pgb, 27700), 4326)), 6) AS gx_v,
        |  round(st_y(st_transform(st_transform(pgb, 27700), 4326)), 6) AS gy_v,
        |  round(st_x(st_transform(st_transform(peu, 3035), 4326)), 6) AS ex_v,
        |  round(st_y(st_transform(st_transform(peu, 3035), 4326)), 6) AS ey_v,
        |  round(st_x(st_transform(st_transform(pus, 5070), 4326)), 6) AS ux_v,
        |  round(st_y(st_transform(st_transform(pus, 5070), 4326)), 6) AS uy_v,
        |  round(st_x(st_transform(st_transform(ppo, 3413), 4326)), 6) AS px_v,
        |  round(st_y(st_transform(st_transform(ppo, 3413), 4326)), 6) AS py_v,
        |  round(st_x(st_transform(st_transform(pbo, 29873), 4326)), 6) AS bx_v,
        |  round(st_y(st_transform(st_transform(pbo, 29873), 4326)), 6) AS by_v,
        |  round(abs(st_x(st_transform(pfr, 25831))
        |    - st_x(st_transform(pfr, 32631))), 2) AS za_v
        |FROM g ORDER BY event_id""").stripMargin

  private def SpatialCrsOracle: String =
        """WITH d AS (
          |  SELECT event_id,
          |    CAST(-5 + event_id % 12 AS DOUBLE) AS lon_fr,
          |    CAST(42 + user_id % 8 AS DOUBLE) AS lat_fr,
          |    CAST(-6 + event_id % 7 AS DOUBLE) AS lon_gb,
          |    CAST(50 + user_id % 9 AS DOUBLE) AS lat_gb,
          |    CAST(-10 + event_id % 40 AS DOUBLE) AS lon_eu,
          |    CAST(36 + user_id % 33 AS DOUBLE) AS lat_eu,
          |    CAST(-120 + event_id % 45 AS DOUBLE) AS lon_us,
          |    CAST(26 + user_id % 22 AS DOUBLE) AS lat_us,
          |    CAST(event_id % 359 - 179 AS DOUBLE) AS lon_po,
          |    CAST(61 + user_id % 28 AS DOUBLE) AS lat_po,
          |    CAST(113 + event_id % 5 AS DOUBLE) AS lon_bo,
          |    CAST(1 + user_id % 6 AS DOUBLE) AS lat_bo
          |  FROM events WHERE event_id < 2000)
          |SELECT event_id,
          |  round(6378137.0 * radians(lon_fr), 4) AS mx_v,
          |  round(6378137.0 * ln(tan(pi() / 4 + radians(lat_fr) / 2)), 4)
          |    AS my_v,
          |  round(lon_fr, 6) AS fx_v,
          |  round(lat_fr, 6) AS fy_v,
          |  round(lon_gb, 6) AS gx_v,
          |  round(lat_gb, 6) AS gy_v,
          |  round(lon_eu, 6) AS ex_v,
          |  round(lat_eu, 6) AS ey_v,
          |  round(lon_us, 6) AS ux_v,
          |  round(lat_us, 6) AS uy_v,
          |  round(lon_po, 6) AS px_v,
          |  round(lat_po, 6) AS py_v,
          |  round(lon_bo, 6) AS bx_v,
          |  round(lat_bo, 6) AS by_v,
          |  0.0 AS za_v
          |FROM d ORDER BY event_id""".stripMargin
}
