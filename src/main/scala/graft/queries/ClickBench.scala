package graft.queries

import graft.QueryDef

/** ClickBench-style web-analytics suite over the `events` fixture —
  * the reference ships ClickBench as its third benchmark harness
  * (pg_lake_benchmark/tests/pytests/test_clickbench.py:4,
  * pg_lake_benchmark/README.md:9-13; 43 queries over a `hits` table).
  * The fixture `events` table carries the same shape of workload
  * (user/event/time/value/JSON-props), so this suite adapts the
  * representative ClickBench query patterns: whole-table counts,
  * grouped top-k with distinct users, time-bucketed histograms, and
  * JSON property extraction.
  *
  * Same determinism contract as [[Tpch]]: DECIMAL-cast money sums,
  * total ORDER BY ending in a unique key, identical aliases both sides.
  */
object ClickBench {

  val defs: Seq[QueryDef] = Seq(

    // CB Q0-3 shapes: whole-table scan aggregates
    QueryDef.sql(
      "q_cb_counts",
      """SELECT count(*) AS hits, count(DISTINCT user_id) AS users,
        |  count(DISTINCT event_type) AS kinds,
        |  min(ts) AS first_ts, max(ts) AS last_ts
        |FROM events""".stripMargin),

    // CB Q8/Q13 shape: group + top-k by count with distinct users
    QueryDef.sql(
      "q_cb_top_types",
      """SELECT event_type, count(*) AS cnt,
        |  count(DISTINCT user_id) AS users,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY event_type
        |ORDER BY cnt DESC, event_type""".stripMargin),

    // CB Q17 shape: heavy-hitter users on a filtered event class
    QueryDef.sql(
      "q_cb_top_users",
      """SELECT user_id, count(*) AS cnt
        |FROM events
        |WHERE event_type = 'click'
        |GROUP BY user_id
        |ORDER BY cnt DESC, user_id
        |LIMIT 10""".stripMargin),

    // CB Q20-22 shape: time-bucketed histogram
    QueryDef.sql(
      "q_cb_hourly",
      """SELECT date_trunc('hour', ts) AS h, count(*) AS cnt,
        |  count(DISTINCT user_id) AS users
        |FROM events
        |GROUP BY date_trunc('hour', ts)
        |ORDER BY h""".stripMargin),

    // Funnel analysis: strictly-ordered view -> click -> purchase per
    // user, counted per stage (the product-analytics staple; each stage
    // is a min-aggregate + join, no window over the full stream)
    QueryDef.sql(
      "q_cb_funnel",
      """WITH v AS (
        |  SELECT user_id, min(ts) AS t_view FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS t_click
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.t_view
        |  GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS t_buy
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        |  GROUP BY e.user_id)
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |  (SELECT count(*) FROM c) AS n_click,
        |  (SELECT count(*) FROM p) AS n_buy""".stripMargin),

    // Cohort retention: users grouped by first-seen week, activity
    // counted per week offset (dialects diverge only on day-diff)
    QueryDef.sql(
      "q_cb_retention",
      """WITH firstw AS (
        |  SELECT user_id, date_trunc('week', min(ts)) AS cohort
        |  FROM events GROUP BY user_id),
        |act AS (
        |  SELECT DISTINCT e.user_id, f.cohort,
        |    CAST(datediff(CAST(date_trunc('week', e.ts) AS DATE),
        |                  CAST(f.cohort AS DATE)) / 7 AS INT) AS week_n
        |  FROM events e JOIN firstw f ON e.user_id = f.user_id)
        |SELECT CAST(cohort AS DATE) AS cohort, week_n,
        |  count(*) AS active_users
        |FROM act GROUP BY cohort, week_n
        |ORDER BY cohort, week_n""".stripMargin,
      oracle =
        """WITH firstw AS (
          |  SELECT user_id, date_trunc('week', min(ts)) AS cohort
          |  FROM events GROUP BY user_id),
          |act AS (
          |  SELECT DISTINCT e.user_id, f.cohort,
          |    CAST(date_diff('day', CAST(f.cohort AS DATE),
          |                   CAST(date_trunc('week', e.ts) AS DATE)) / 7
          |      AS INT) AS week_n
          |  FROM events e JOIN firstw f ON e.user_id = f.user_id)
          |SELECT CAST(cohort AS DATE) AS cohort, week_n,
          |  count(*) AS active_users
          |FROM act GROUP BY cohort, week_n
          |ORDER BY cohort, week_n""".stripMargin),

    // Heavy hitters via the Misra-Gries mergeable sketch
    // (graft.functions.ApproxTopKAgg): with k >= distinct(event_type)
    // no decrement ever fires, so the sketch counts are EXACT and the
    // plain GROUP BY oracle must hash-match. The sub-n/(k+1) guarantee
    // on genuinely skewed high-cardinality data is property-tested in
    // PipelineSpec.
    QueryDef.sql(
      "q_cb_heavyhitters",
      """SELECT e.item, e.count FROM (
        |  SELECT explode(approx_top_items(event_type, 8)) AS e
        |  FROM events) t
        |ORDER BY item""".stripMargin,
      oracle =
        """SELECT event_type AS item, count(*) AS count
          |FROM events GROUP BY event_type
          |ORDER BY item""".stripMargin),

    // JSON property extraction + bucketing (ClickBench's URL/referrer
    // string slicing, adapted to the props JSON column)
    QueryDef.sql(
      "q_cb_props_hist",
      """SELECT CAST(GET_JSON_OBJECT(props, '$.k') AS BIGINT) DIV 10
        |    AS k_bucket,
        |  count(*) AS cnt
        |FROM events
        |GROUP BY CAST(GET_JSON_OBJECT(props, '$.k') AS BIGINT) DIV 10
        |ORDER BY k_bucket""".stripMargin,
      oracle =
        """SELECT CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) // 10
          |    AS k_bucket,
          |  count(*) AS cnt
          |FROM events
          |GROUP BY CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) // 10
          |ORDER BY k_bucket""".stripMargin))
}
