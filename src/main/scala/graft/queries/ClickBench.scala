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
          |ORDER BY k_bucket""".stripMargin),

    // CB daily-active shape: uniques per day plus a per-type breakdown
    // via FILTER counts
    QueryDef.sql(
      "q_cb_daily_active",
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
        |  count(DISTINCT user_id) AS dau,
        |  count(*) FILTER (WHERE event_type = 'view') AS views,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS buys
        |FROM events
        |GROUP BY date_trunc('day', ts)
        |ORDER BY d""".stripMargin),

    // CB value-distribution report: exact ordered-set percentiles per
    // event class
    QueryDef.sql(
      "q_cb_value_bands",
      """SELECT event_type,
        |  round(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY value), 6)
        |    AS p50,
        |  round(PERCENTILE_CONT(0.9) WITHIN GROUP (ORDER BY value), 6)
        |    AS p90,
        |  round(CAST(min(value) AS DOUBLE), 6) AS lo,
        |  round(CAST(max(value) AS DOUBLE), 6) AS hi
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin),

    // per-user activity span: first/last event, active days, events
    // per active user bucketed (the CB user-engagement shape)
    QueryDef.sql(
      "q_cb_user_span",
      """WITH u AS (
        |  SELECT user_id, count(*) AS n_events,
        |    count(DISTINCT CAST(date_trunc('day', ts) AS DATE))
        |      AS active_days
        |  FROM events GROUP BY user_id)
        |SELECT active_days, count(*) AS users,
        |  CAST(SUM(n_events) AS BIGINT) AS events
        |FROM u
        |GROUP BY active_days
        |ORDER BY active_days""".stripMargin),

    // event-type transition matrix: lag over each user's stream
    // (the Markov/journey analysis shape — one window shuffle on user)
    QueryDef.sql(
      "q_cb_transitions",
      """SELECT prev_type, event_type AS next_type, count(*) AS cnt
        |FROM (
        |  SELECT event_type,
        |    lag(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_type
        |  FROM events) t
        |WHERE prev_type IS NOT NULL
        |GROUP BY prev_type, event_type
        |ORDER BY prev_type, next_type""".stripMargin),

    // hourly error-rate report: conditional ratio with exact counts
    QueryDef.sql(
      "q_cb_error_rate",
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
        |  count(*) FILTER (WHERE event_type = 'error') AS errors,
        |  count(*) AS total,
        |  round(count(*) FILTER (WHERE event_type = 'error')
        |    * 1000000 DIV count(*) / 1e6, 6) AS err_rate
        |FROM events
        |GROUP BY date_trunc('day', ts)
        |ORDER BY d""".stripMargin,
      oracle =
        """SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
          |  count(*) FILTER (event_type = 'error') AS errors,
          |  count(*) AS total,
          |  round(count(*) FILTER (event_type = 'error')
          |    * 1000000 // count(*) / 1e6, 6) AS err_rate
          |FROM events
          |GROUP BY date_trunc('day', ts)
          |ORDER BY d""".stripMargin),

    // CB LIKE-filter shape (URL/referrer matching, adapted to the
    // props JSON string)
    QueryDef.sql(
      "q_cb_like",
      """SELECT event_type, count(*) AS cnt
        |FROM events
        |WHERE props LIKE '%"k": 4%'
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin),

    // CB whole-table arithmetic aggregates: decimal-exact sum and the
    // derived average on cents-grid values
    QueryDef.sql(
      "q_cb_sum_avg",
      """SELECT count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |    / count(*), 6) AS avg_value
        |FROM events
        |WHERE event_type <> 'error'""".stripMargin),

    // CB minute-resolution histogram on a filtered event class
    QueryDef.sql(
      "q_cb_minutes",
      """SELECT date_trunc('minute', ts) AS m, count(*) AS cnt
        |FROM events
        |WHERE event_type = 'click'
        |GROUP BY date_trunc('minute', ts)
        |ORDER BY m""".stripMargin),

    // CB multi-column grouped top-k (the user x type breakdown)
    QueryDef.sql(
      "q_cb_top_pairs",
      """SELECT user_id, event_type, count(*) AS cnt
        |FROM events
        |GROUP BY user_id, event_type
        |ORDER BY cnt DESC, user_id, event_type
        |LIMIT 20""".stripMargin),

    // CB first/last event per user via two opposed row_number windows
    // joined back (the entry/exit-page shape)
    QueryDef.sql(
      "q_cb_first_last",
      """WITH o AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS ra,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rd
        |  FROM events)
        |SELECT a.user_id, a.event_type AS first_type,
        |  d.event_type AS last_type
        |FROM o a JOIN o d ON a.user_id = d.user_id
        |WHERE a.ra = 1 AND d.rd = 1
        |ORDER BY a.user_id""".stripMargin),

    // Sessionization report: 30-minute-gap session counts per user,
    // histogrammed (lag + epoch arithmetic; dialect twin for epoch)
    QueryDef.sql(
      "q_cb_sessions",
      """WITH d AS (
        |  SELECT user_id,
        |    unix_seconds(CAST(ts AS TIMESTAMP))
        |      - lag(unix_seconds(CAST(ts AS TIMESTAMP))) OVER (
        |        PARTITION BY user_id ORDER BY ts, event_id) AS gap
        |  FROM events),
        |s AS (
        |  SELECT user_id,
        |    count(*) FILTER (WHERE gap IS NULL OR gap > 1800)
        |      AS sessions,
        |    count(*) AS n_events
        |  FROM d GROUP BY user_id)
        |SELECT sessions, count(*) AS users,
        |  CAST(SUM(n_events) AS BIGINT) AS events
        |FROM s GROUP BY sessions
        |ORDER BY sessions""".stripMargin,
      oracle =
        """WITH d AS (
          |  SELECT user_id,
          |    CAST(floor(epoch(ts)) AS BIGINT)
          |      - lag(CAST(floor(epoch(ts)) AS BIGINT))
          |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
          |  FROM events),
          |s AS (
          |  SELECT user_id,
          |    count(*) FILTER (WHERE gap IS NULL OR gap > 1800)
          |      AS sessions,
          |    count(*) AS n_events
          |  FROM d GROUP BY user_id)
          |SELECT sessions, count(*) AS users,
          |  CAST(SUM(n_events) AS BIGINT) AS events
          |FROM s GROUP BY sessions
          |ORDER BY sessions""".stripMargin),

    // CB day x type value pivot via CASE decimal sums
    QueryDef.sql(
      "q_cb_day_pivot",
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
        |  CAST(SUM(CASE WHEN event_type = 'purchase'
        |      THEN CAST(value AS DECIMAL(18,2))
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |    AS purchase_value,
        |  CAST(SUM(CASE WHEN event_type = 'click'
        |      THEN CAST(value AS DECIMAL(18,2))
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |    AS click_value
        |FROM events
        |GROUP BY date_trunc('day', ts)
        |ORDER BY d""".stripMargin),

    // Day-of-week activity profile (Monday = 0 on both sides via the
    // dialect twin: Spark weekday vs DuckDB isodow - 1)
    QueryDef.sql(
      "q_cb_dow",
      """SELECT CAST(weekday(ts) AS INT) AS dow, count(*) AS cnt,
        |  count(DISTINCT user_id) AS users
        |FROM events
        |GROUP BY weekday(ts)
        |ORDER BY dow""".stripMargin,
      oracle =
        """SELECT CAST(isodow(ts) - 1 AS INT) AS dow, count(*) AS cnt,
          |  count(DISTINCT user_id) AS users
          |FROM events
          |GROUP BY isodow(ts) - 1
          |ORDER BY dow""".stripMargin),

    // JSON-property cardinality per event class (distinct extraction)
    QueryDef.sql(
      "q_cb_props_card",
      """SELECT event_type,
        |  count(DISTINCT GET_JSON_OBJECT(props, '$.k')) AS k_values,
        |  count(DISTINCT user_id) AS users
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
      oracle =
        """SELECT event_type,
          |  count(DISTINCT JSON_EXTRACT_STRING(props, '$.k')) AS k_values,
          |  count(DISTINCT user_id) AS users
          |FROM events
          |GROUP BY event_type
          |ORDER BY event_type""".stripMargin),

    // CB paginated raw-scan shape: ORDER BY a non-key column with
    // LIMIT + OFFSET (top-N pagination over the raw table)
    QueryDef.sql(
      "q_cb_paginate",
      """SELECT event_id, user_id, event_type,
        |  CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value
        |FROM events
        |ORDER BY value DESC, event_id
        |LIMIT 25 OFFSET 50""".stripMargin),

    // CB top-k by summed metric (not count): heaviest users by total
    // event value, decimal-exact
    QueryDef.sql(
      "q_cb_top_value_users",
      """SELECT user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  count(*) AS cnt
        |FROM events
        |GROUP BY user_id
        |ORDER BY total DESC, user_id
        |LIMIT 15""".stripMargin),

    // CB argmax shape: each user's single highest-value event. A
    // top-1 window over (DECIMAL value desc, event_id desc) — exact
    // decimal ordering, deterministic ties, and no packed-BIGINT key
    // that could overflow/collide as values or ids grow (a
    // cents*10^12+id key wraps silently in Spark but raises in
    // DuckDB — the engines would diverge instead of failing together)
    QueryDef.sql(
      "q_cb_argmax",
      """SELECT user_id, event_id AS top_event,
        |  CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS top_value
        |FROM (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY CAST(value AS DECIMAL(18,2)) DESC, event_id DESC)
        |      AS rn
        |  FROM events) t
        |WHERE rn = 1
        |ORDER BY user_id""".stripMargin),

    // CB per-day p95 latency report: exact ordered-set percentile per
    // day over the value column
    QueryDef.sql(
      "q_cb_daily_p95",
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
        |  round(PERCENTILE_CONT(0.95) WITHIN GROUP (ORDER BY value), 6)
        |    AS p95,
        |  count(*) AS n
        |FROM events
        |GROUP BY date_trunc('day', ts)
        |ORDER BY d""".stripMargin),

    // CB engagement distribution: per-user event counts histogrammed
    // by power-of-two bucket. floor(log2(n)) = length(bin(n)) - 1 —
    // pure integer/string arithmetic in BOTH dialects; an ln-based
    // floor would park every exact power of two on a libm rounding
    // boundary (the r8 failure class the integer contracts eliminate)
    QueryDef.sql(
      "q_cb_engagement_hist",
      """WITH u AS (
        |  SELECT user_id, count(*) AS n FROM events GROUP BY user_id)
        |SELECT CAST(length(bin(n)) - 1 AS BIGINT) AS bucket_log2,
        |  count(*) AS users,
        |  CAST(SUM(n) AS BIGINT) AS events
        |FROM u
        |GROUP BY CAST(length(bin(n)) - 1 AS BIGINT)
        |ORDER BY bucket_log2""".stripMargin),

    // CB sliding 7-day active-user window: per-day distinct users plus
    // the trailing-week count via a RANGE frame over day numbers
    QueryDef.sql(
      "q_cb_rolling_active",
      """WITH d AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    datediff(CAST(date_trunc('day', ts) AS DATE),
        |      DATE '1970-01-01') AS dn,
        |    count(DISTINCT user_id) AS dau,
        |    count(*) AS n
        |  FROM events
        |  GROUP BY date_trunc('day', ts))
        |SELECT day, dau,
        |  CAST(SUM(n) OVER (ORDER BY dn
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS events_7d
        |FROM d ORDER BY day""".stripMargin,
      oracle =
        """WITH d AS (
          |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
          |    date_diff('day', DATE '1970-01-01',
          |      CAST(date_trunc('day', ts) AS DATE)) AS dn,
          |    count(DISTINCT user_id) AS dau,
          |    count(*) AS n
          |  FROM events
          |  GROUP BY date_trunc('day', ts))
          |SELECT day, dau,
          |  CAST(SUM(n) OVER (ORDER BY dn
          |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
          |    AS events_7d
          |FROM d ORDER BY day""".stripMargin),

    // CB distinct-pair cardinality: how many (user, day) active cells
    // per event type (the uniq-by-multiple-columns shape)
    QueryDef.sql(
      "q_cb_active_cells",
      """SELECT event_type,
        |  count(DISTINCT struct(user_id, CAST(date_trunc('day', ts)
        |    AS DATE))) AS user_days
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
      oracle =
        """SELECT event_type,
          |  count(DISTINCT (user_id, CAST(date_trunc('day', ts)
          |    AS DATE))) AS user_days
          |FROM events
          |GROUP BY event_type
          |ORDER BY event_type""".stripMargin),

    // CB conditional-value contrast: value stats of error events vs
    // the rest in one pass (FILTER aggregates, decimal-exact)
    QueryDef.sql(
      "q_cb_error_contrast",
      """SELECT
        |  CAST(SUM(CAST(value AS DECIMAL(18,2)))
        |    FILTER (WHERE event_type = 'error') AS DOUBLE) AS err_value,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2)))
        |    FILTER (WHERE event_type <> 'error') AS DOUBLE) AS ok_value,
        |  count(*) FILTER (WHERE event_type = 'error') AS err_n,
        |  count(*) FILTER (WHERE event_type <> 'error') AS ok_n
        |FROM events""".stripMargin),

    // CB substring-grouping shape (URL-prefix reports adapted to the
    // props JSON text)
    QueryDef.sql(
      "q_cb_substr_group",
      """SELECT substring(props, 1, 8) AS prefix, count(*) AS cnt
        |FROM events
        |GROUP BY substring(props, 1, 8)
        |ORDER BY cnt DESC, prefix
        |LIMIT 10""".stripMargin),

    // CB dimension-matrix shape: event type x k-decile with distinct
    // users per cell
    QueryDef.sql(
      "q_cb_type_k_matrix",
      """SELECT event_type,
        |  CAST(GET_JSON_OBJECT(props, '$.k') AS BIGINT) DIV 25
        |    AS k_quartile,
        |  count(*) AS cnt, count(DISTINCT user_id) AS users
        |FROM events
        |GROUP BY event_type,
        |  CAST(GET_JSON_OBJECT(props, '$.k') AS BIGINT) DIV 25
        |ORDER BY event_type, k_quartile""".stripMargin,
      oracle =
        """SELECT event_type,
          |  CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) // 25
          |    AS k_quartile,
          |  count(*) AS cnt, count(DISTINCT user_id) AS users
          |FROM events
          |GROUP BY event_type,
          |  CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) // 25
          |ORDER BY event_type, k_quartile""".stripMargin),

    // CB hour-of-day band filter (the business-hours slice)
    QueryDef.sql(
      "q_cb_hour_band",
      """SELECT hour(ts) AS h, event_type, count(*) AS cnt
        |FROM events
        |WHERE hour(ts) BETWEEN 9 AND 17
        |GROUP BY hour(ts), event_type
        |ORDER BY h, event_type""".stripMargin),

    // CB hottest-minutes leaderboard
    QueryDef.sql(
      "q_cb_top_minutes",
      """SELECT date_trunc('minute', ts) AS m, count(*) AS cnt
        |FROM events
        |GROUP BY date_trunc('minute', ts)
        |ORDER BY cnt DESC, m
        |LIMIT 10""".stripMargin),

    // CB fixed-width value histogram (floor bucketing — floor, not a
    // bare int cast, whose rounding differs between the engines)
    QueryDef.sql(
      "q_cb_value_hist",
      """SELECT CAST(floor(value / 50.0) AS BIGINT) AS bucket,
        |  count(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events
        |GROUP BY CAST(floor(value / 50.0) AS BIGINT)
        |ORDER BY bucket""".stripMargin),

    // CB weekly uniques trend with week-over-week delta via lag
    QueryDef.sql(
      "q_cb_weekly_trend",
      """WITH w AS (
        |  SELECT CAST(date_trunc('week', ts) AS DATE) AS wk,
        |    count(DISTINCT user_id) AS wau
        |  FROM events
        |  GROUP BY date_trunc('week', ts))
        |SELECT wk, wau,
        |  wau - lag(wau) OVER (ORDER BY wk) AS delta
        |FROM w ORDER BY wk""".stripMargin),

    // CB regexp-extraction shape (URL-component pulls adapted to the
    // props JSON text; same regexp_extract signature both dialects)
    QueryDef.sql(
      "q_cb_regex_extract",
      """SELECT CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)
        |    AS k_val,
        |  count(*) AS cnt
        |FROM events
        |WHERE event_type = 'view'
        |GROUP BY CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)
        |ORDER BY cnt DESC, k_val
        |LIMIT 15""".stripMargin),

    // CB raw multi-column sort scan with LIMIT
    QueryDef.sql(
      "q_cb_multi_sort",
      """SELECT event_id, user_id, event_type, ts
        |FROM events
        |ORDER BY user_id, ts DESC, event_id
        |LIMIT 30""".stripMargin),

    // CB complex OR-of-ANDs count (the multi-condition traffic slice)
    QueryDef.sql(
      "q_cb_count_or",
      """SELECT count(*) AS n,
        |  count(DISTINCT user_id) AS users
        |FROM events
        |WHERE (event_type = 'click' AND value > 100)
        |   OR (event_type = 'purchase' AND value > 300)
        |   OR (event_type = 'error' AND hour(ts) < 6)""".stripMargin),

    // CB device-split analogue: k-parity x type count matrix
    QueryDef.sql(
      "q_cb_dim_split",
      """SELECT event_type,
        |  CAST(GET_JSON_OBJECT(props, '$.k') AS BIGINT) % 2 AS k_parity,
        |  count(*) AS cnt
        |FROM events
        |GROUP BY event_type,
        |  CAST(GET_JSON_OBJECT(props, '$.k') AS BIGINT) % 2
        |ORDER BY event_type, k_parity""".stripMargin,
      oracle =
        """SELECT event_type,
          |  CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) % 2
          |    AS k_parity,
          |  count(*) AS cnt
          |FROM events
          |GROUP BY event_type,
          |  CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) % 2
          |ORDER BY event_type, k_parity""".stripMargin),

    // CB traffic-share report: each type's share of total events via
    // a window sum over exact counts
    QueryDef.sql(
      "q_cb_share",
      """WITH c AS (
        |  SELECT event_type, count(*) AS cnt FROM events
        |  GROUP BY event_type)
        |SELECT event_type, cnt,
        |  round(CAST(cnt AS DOUBLE) * 100 /
        |    CAST(SUM(cnt) OVER () AS DOUBLE), 6) AS share_pct
        |FROM c
        |ORDER BY event_type""".stripMargin),

    // CB exclusion-filter shape: non-view events of high-value users
    QueryDef.sql(
      "q_cb_excluding",
      """WITH hv AS (
        |  SELECT user_id FROM events
        |  GROUP BY user_id
        |  HAVING CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) > 5000)
        |SELECT e.event_type, count(*) AS cnt
        |FROM events e JOIN hv ON e.user_id = hv.user_id
        |WHERE e.event_type <> 'view'
        |GROUP BY e.event_type
        |ORDER BY e.event_type""".stripMargin),

    // CB engagement-breadth histogram: users by how many distinct
    // event types they touched
    QueryDef.sql(
      "q_cb_type_breadth",
      """WITH u AS (
        |  SELECT user_id, count(DISTINCT event_type) AS kinds
        |  FROM events GROUP BY user_id)
        |SELECT kinds, count(*) AS users
        |FROM u
        |GROUP BY kinds
        |ORDER BY kinds""".stripMargin))
}
