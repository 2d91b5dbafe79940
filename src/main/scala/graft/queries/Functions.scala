package graft.queries

import graft.QueryDef

/** Scalar-function surface (SURVEY.md §2.7 — the shippability contract).
  * Grouped into wide queries per family; every expression stays inside
  * whole-stage codegen (built-ins or PgFunctions expression
  * compositions, no UDFs). Oracles diverge from the Spark SQL text where
  * DuckDB spells a function differently.
  */
object Functions {

  val defs: Seq[QueryDef] = Seq(

    // ---- math (§2.7 math list) ----
    QueryDef.sql(
      "q_fn_math",
      """SELECT l_orderkey, l_linenumber,
        |  ABS(l_quantity - 25) AS v_abs,
        |  CAST(CEIL(l_discount * 100) AS BIGINT) AS v_ceil,
        |  CAST(FLOOR(l_tax * 100) AS BIGINT) AS v_floor,
        |  ROUND(l_extendedprice / 1000, 2) AS v_round,
        |  CAST(l_quantity AS INT) % 7 AS v_mod,
        |  l_orderkey DIV 100 AS v_div,
        |  ROUND(SQRT(l_quantity), 8) AS v_sqrt,
        |  ROUND(CBRT(l_extendedprice), 8) AS v_cbrt,
        |  ROUND(EXP(l_discount), 10) AS v_exp,
        |  ROUND(LN(l_extendedprice), 10) AS v_ln,
        |  ROUND(LOG10(l_extendedprice), 10) AS v_log10,
        |  ROUND(POWER(l_quantity, 2), 4) AS v_pow,
        |  CAST(SIGN(l_quantity - 25) AS DOUBLE) AS v_sign,
        |  ROUND(DEGREES(l_discount), 10) AS v_deg,
        |  ROUND(RADIANS(l_quantity), 10) AS v_rad,
        |  GREATEST(l_quantity, 25.0) AS v_greatest,
        |  LEAST(l_quantity, 25.0) AS v_least
        |FROM lineitem
        |WHERE l_orderkey <= 200
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax""".stripMargin,
      oracle =
        """SELECT l_orderkey, l_linenumber,
          |  ABS(l_quantity - 25) AS v_abs,
          |  CAST(CEIL(l_discount * 100) AS BIGINT) AS v_ceil,
          |  CAST(FLOOR(l_tax * 100) AS BIGINT) AS v_floor,
          |  ROUND(l_extendedprice / 1000, 2) AS v_round,
          |  CAST(l_quantity AS INT) % 7 AS v_mod,
          |  l_orderkey // 100 AS v_div,
          |  ROUND(SQRT(l_quantity), 8) AS v_sqrt,
          |  ROUND(CBRT(l_extendedprice), 8) AS v_cbrt,
          |  ROUND(EXP(l_discount), 10) AS v_exp,
          |  ROUND(LN(l_extendedprice), 10) AS v_ln,
          |  ROUND(LOG10(l_extendedprice), 10) AS v_log10,
          |  ROUND(POWER(l_quantity, 2), 4) AS v_pow,
          |  CAST(SIGN(l_quantity - 25) AS DOUBLE) AS v_sign,
          |  ROUND(DEGREES(l_discount), 10) AS v_deg,
          |  ROUND(RADIANS(l_quantity), 10) AS v_rad,
          |  GREATEST(l_quantity, 25.0) AS v_greatest,
          |  LEAST(l_quantity, 25.0) AS v_least
          |FROM lineitem
          |WHERE l_orderkey <= 200
          |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax""".stripMargin),

    // ---- trigonometry incl. PG degree variants (PgFunctions) ----
    QueryDef.sql(
      "q_fn_trig",
      """SELECT p_partkey,
        |  ROUND(SIN(p_size), 8) AS v_sin,
        |  ROUND(COS(p_size), 8) AS v_cos,
        |  ROUND(TAN(p_size / 10.0), 8) AS v_tan,
        |  ROUND(COT(p_size + 0.5), 8) AS v_cot,
        |  ROUND(ASIN(p_size / 100.0), 8) AS v_asin,
        |  ROUND(ACOS(p_size / 100.0), 8) AS v_acos,
        |  ROUND(ATAN(p_size), 8) AS v_atan,
        |  ROUND(ATAN2(p_size, 10), 8) AS v_atan2,
        |  ROUND(SIND(p_size), 8) AS v_sind,
        |  ROUND(COSD(p_size), 8) AS v_cosd,
        |  ROUND(ATAND(p_size), 8) AS v_atand,
        |  ROUND(ATAN2D(p_size, 10), 8) AS v_atan2d,
        |  ROUND(SINH(p_size / 25.0), 8) AS v_sinh,
        |  ROUND(COSH(p_size / 25.0), 8) AS v_cosh,
        |  ROUND(TANH(p_size / 25.0), 8) AS v_tanh
        |FROM part
        |WHERE p_partkey <= 100
        |ORDER BY p_partkey""".stripMargin,
      oracle =
        """SELECT p_partkey,
          |  ROUND(SIN(p_size), 8) AS v_sin,
          |  ROUND(COS(p_size), 8) AS v_cos,
          |  ROUND(TAN(p_size / 10.0), 8) AS v_tan,
          |  ROUND(COT(p_size + 0.5), 8) AS v_cot,
          |  ROUND(ASIN(p_size / 100.0), 8) AS v_asin,
          |  ROUND(ACOS(p_size / 100.0), 8) AS v_acos,
          |  ROUND(ATAN(p_size), 8) AS v_atan,
          |  ROUND(ATAN2(p_size, 10), 8) AS v_atan2,
          |  ROUND(SIN(RADIANS(p_size)), 8) AS v_sind,
          |  ROUND(COS(RADIANS(p_size)), 8) AS v_cosd,
          |  ROUND(DEGREES(ATAN(p_size)), 8) AS v_atand,
          |  ROUND(DEGREES(ATAN2(p_size, 10)), 8) AS v_atan2d,
          |  ROUND((EXP(p_size / 25.0) - EXP(-(p_size / 25.0))) / 2, 8) AS v_sinh,
          |  ROUND((EXP(p_size / 25.0) + EXP(-(p_size / 25.0))) / 2, 8) AS v_cosh,
          |  ROUND((EXP(2 * p_size / 25.0) - 1) / (EXP(2 * p_size / 25.0) + 1), 8) AS v_tanh
          |FROM part
          |WHERE p_partkey <= 100
          |ORDER BY p_partkey""".stripMargin),

    // ---- strings (§2.7 string list) ----
    QueryDef.sql(
      "q_fn_string",
      """SELECT c_custkey,
        |  LENGTH(c_name) AS v_len,
        |  BIT_LENGTH(c_name) AS v_bitlen,
        |  ASCII(c_name) AS v_ascii,
        |  CHR(65 + CAST(c_custkey % 26 AS INT)) AS v_chr,
        |  LOWER(c_name) AS v_lower,
        |  UPPER(c_name) AS v_upper,
        |  INITCAP(c_mktsegment) AS v_initcap,
        |  LEFT(c_name, 5) AS v_left,
        |  RIGHT(c_name, 3) AS v_right,
        |  REPEAT(c_mktsegment, 2) AS v_repeat,
        |  REPLACE(c_name, 'Customer', 'Cust') AS v_replace,
        |  REVERSE(c_mktsegment) AS v_reverse,
        |  BTRIM(CONCAT('  ', c_name, '  ')) AS v_btrim,
        |  LTRIM(CONCAT('xx', c_name), 'x') AS v_ltrim,
        |  RTRIM(CONCAT(c_name, 'yy'), 'y') AS v_rtrim,
        |  LPAD(c_mktsegment, 12, '.') AS v_lpad,
        |  RPAD(c_mktsegment, 12, '.') AS v_rpad,
        |  STRPOS(c_name, '0') AS v_strpos,
        |  SUBSTR(c_name, 1, 8) AS v_substr,
        |  SPLIT_PART(c_name, '0', 1) AS v_split,
        |  STARTS_WITH(c_name, 'Customer') AS v_starts,
        |  CONCAT(c_name, '|', c_mktsegment) AS v_concat,
        |  CONCAT_WS('-', c_name, c_mktsegment) AS v_concat_ws,
        |  MD5(c_name) AS v_md5,
        |  TRANSLATE(c_mktsegment, 'AEIOU', 'aeiou') AS v_translate
        |FROM customer
        |WHERE c_custkey <= 100
        |ORDER BY c_custkey""".stripMargin,
      oracle =
        """SELECT c_custkey,
          |  LENGTH(c_name) AS v_len,
          |  BIT_LENGTH(c_name) AS v_bitlen,
          |  ASCII(c_name) AS v_ascii,
          |  CHR(65 + CAST(c_custkey % 26 AS INT)) AS v_chr,
          |  LOWER(c_name) AS v_lower,
          |  UPPER(c_name) AS v_upper,
          |  CONCAT(UPPER(LEFT(c_mktsegment, 1)), LOWER(SUBSTR(c_mktsegment, 2))) AS v_initcap,
          |  LEFT(c_name, 5) AS v_left,
          |  RIGHT(c_name, 3) AS v_right,
          |  REPEAT(c_mktsegment, 2) AS v_repeat,
          |  REPLACE(c_name, 'Customer', 'Cust') AS v_replace,
          |  REVERSE(c_mktsegment) AS v_reverse,
          |  TRIM(CONCAT('  ', c_name, '  ')) AS v_btrim,
          |  LTRIM(CONCAT('xx', c_name), 'x') AS v_ltrim,
          |  RTRIM(CONCAT(c_name, 'yy'), 'y') AS v_rtrim,
          |  LPAD(c_mktsegment, 12, '.') AS v_lpad,
          |  RPAD(c_mktsegment, 12, '.') AS v_rpad,
          |  STRPOS(c_name, '0') AS v_strpos,
          |  SUBSTR(c_name, 1, 8) AS v_substr,
          |  SPLIT_PART(c_name, '0', 1) AS v_split,
          |  STARTS_WITH(c_name, 'Customer') AS v_starts,
          |  CONCAT(c_name, '|', c_mktsegment) AS v_concat,
          |  CONCAT_WS('-', c_name, c_mktsegment) AS v_concat_ws,
          |  MD5(c_name) AS v_md5,
          |  TRANSLATE(c_mktsegment, 'AEIOU', 'aeiou') AS v_translate
          |FROM customer
          |WHERE c_custkey <= 100
          |ORDER BY c_custkey""".stripMargin),

    // ---- LIKE / ILIKE / regex operators (§2.2 operator set) ----
    QueryDef.sql(
      "q_fn_like_regex",
      """SELECT p_partkey, p_type,
        |  p_type LIKE '%BRASS%' AS v_like,
        |  p_type NOT LIKE '%COPPER%' AS v_notlike,
        |  ILIKE(p_type, '%brass%') AS v_ilike,
        |  REGEXP_LIKE(p_type, '^[A-Z]+ [A-Z]+') AS v_regex,
        |  REGEXP_REPLACE(p_type, '[AEIOU]', '_') AS v_re_repl,
        |  REGEXP_EXTRACT(p_type, '([A-Z]+)$', 1) AS v_re_extr,
        |  CASE WHEN p_size < 10 THEN 'small'
        |       WHEN p_size < 30 THEN 'medium'
        |       ELSE 'large' END AS v_case,
        |  COALESCE(NULLIF(p_brand, 'Brand#1'), 'OTHER') AS v_coal
        |FROM part
        |WHERE p_partkey <= 150
        |ORDER BY p_partkey""".stripMargin,
      oracle =
        """SELECT p_partkey, p_type,
          |  p_type LIKE '%BRASS%' AS v_like,
          |  p_type NOT LIKE '%COPPER%' AS v_notlike,
          |  p_type ILIKE '%brass%' AS v_ilike,
          |  REGEXP_MATCHES(p_type, '^[A-Z]+ [A-Z]+') AS v_regex,
          |  REGEXP_REPLACE(p_type, '[AEIOU]', '_', 'g') AS v_re_repl,
          |  COALESCE(REGEXP_EXTRACT(p_type, '([A-Z]+)$', 1), '') AS v_re_extr,
          |  CASE WHEN p_size < 10 THEN 'small'
          |       WHEN p_size < 30 THEN 'medium'
          |       ELSE 'large' END AS v_case,
          |  COALESCE(NULLIF(p_brand, 'Brand#1'), 'OTHER') AS v_coal
          |FROM part
          |WHERE p_partkey <= 150
          |ORDER BY p_partkey""".stripMargin),

    // ---- date/time (§2.7 date/time list) ----
    QueryDef.sql(
      "q_fn_datetime",
      """SELECT o_orderkey,
        |  CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS v_year,
        |  CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS v_month,
        |  CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT) AS v_day,
        |  CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS v_quarter,
        |  CAST((EXTRACT(DOW FROM o_orderdate) + 6) % 7 AS BIGINT) AS v_dow,
        |  CAST(EXTRACT(DOY FROM o_orderdate) AS BIGINT) AS v_doy,
        |  CAST(EXTRACT(WEEK FROM o_orderdate) AS BIGINT) AS v_week,
        |  UNIX_SECONDS(CAST(o_orderdate AS TIMESTAMP)) AS v_epoch,
        |  CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS v_trunc_month,
        |  CAST(DATE_TRUNC('quarter', o_orderdate) AS DATE) AS v_trunc_q,
        |  CAST(DATE_TRUNC('week', o_orderdate) AS DATE) AS v_trunc_w,
        |  CAST(DATE_TRUNC('year', o_orderdate) AS DATE) AS v_trunc_y,
        |  CAST(o_orderdate AS DATE) AS v_date,
        |  CAST(DATE_DIFF(DAY, TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS v_diff_days
        |FROM orders
        |WHERE o_orderkey <= 300
        |ORDER BY o_orderkey""".stripMargin,
      oracle =
        """SELECT o_orderkey,
          |  CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS v_year,
          |  CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS v_month,
          |  CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT) AS v_day,
          |  CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS v_quarter,
          |  CAST(EXTRACT(DOW FROM o_orderdate) AS BIGINT) AS v_dow,
          |  CAST(EXTRACT(DOY FROM o_orderdate) AS BIGINT) AS v_doy,
          |  CAST(EXTRACT(WEEK FROM o_orderdate) AS BIGINT) AS v_week,
          |  CAST(EXTRACT(EPOCH FROM o_orderdate) AS BIGINT) AS v_epoch,
          |  CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS v_trunc_month,
          |  CAST(DATE_TRUNC('quarter', o_orderdate) AS DATE) AS v_trunc_q,
          |  CAST(DATE_TRUNC('week', o_orderdate) AS DATE) AS v_trunc_w,
          |  CAST(DATE_TRUNC('year', o_orderdate) AS DATE) AS v_trunc_y,
          |  CAST(o_orderdate AS DATE) AS v_date,
          |  DATE_DIFF('day', TIMESTAMP '1995-01-01', o_orderdate) AS v_diff_days
          |FROM orders
          |WHERE o_orderkey <= 300
          |ORDER BY o_orderkey""".stripMargin),

    // ---- PG extract/date_part/date_trunc field completion (reference
    // test_time_functions.py pushes the full set down): century/decade/
    // millennium/isodow/isoyear/epoch/microseconds/milliseconds +
    // PG-origin century/millennium truncation (xx01, not xx00 — the
    // reference adds INTERVAL 1 YEAR to the engine's trunc,
    // rewrite_query.c:1262; the oracle does the same, exact for every
    // non-xx00 year, and the fixtures contain none). DuckDB's extract
    // fields already match PG; its milliseconds TRUNCATES where PG
    // keeps the fraction, so the Spark side floors for comparison
    // (PG-faithful fractional value pinned in DatePartsSpec). epoch
    // floors before the BIGINT cast on both sides because the engines'
    // double→int casts round differently (Spark truncates, DuckDB
    // rounds). ----
    QueryDef.sql(
      "q_fn_extract_fields",
      """SELECT event_id,
        |  CAST(EXTRACT(CENTURY FROM ts) AS BIGINT) AS v_century,
        |  CAST(EXTRACT(DECADE FROM ts) AS BIGINT) AS v_decade,
        |  CAST(EXTRACT(MILLENNIUM FROM ts) AS BIGINT) AS v_millennium,
        |  CAST(EXTRACT(ISODOW FROM ts) AS BIGINT) AS v_isodow,
        |  CAST(EXTRACT(ISOYEAR FROM ts) AS BIGINT) AS v_isoyear,
        |  CAST(FLOOR(EXTRACT(EPOCH FROM ts)) AS BIGINT) AS v_epoch,
        |  CAST(EXTRACT(MICROSECONDS FROM ts) AS BIGINT) AS v_us,
        |  CAST(FLOOR(EXTRACT(MILLISECONDS FROM ts)) AS BIGINT) AS v_ms,
        |  CAST(DATE_PART('century', ts) AS BIGINT) AS v_century_dp,
        |  CAST(DATE_TRUNC('century', ts) AS DATE) AS v_tc,
        |  CAST(DATE_TRUNC('decade', ts) AS DATE) AS v_td,
        |  CAST(DATE_TRUNC('millennium', ts) AS DATE) AS v_tm
        |FROM events
        |WHERE event_id < 300
        |ORDER BY event_id""".stripMargin,
      oracle =
        """SELECT event_id,
          |  CAST(EXTRACT(CENTURY FROM ts) AS BIGINT) AS v_century,
          |  CAST(EXTRACT(DECADE FROM ts) AS BIGINT) AS v_decade,
          |  CAST(EXTRACT(MILLENNIUM FROM ts) AS BIGINT) AS v_millennium,
          |  CAST(EXTRACT(ISODOW FROM ts) AS BIGINT) AS v_isodow,
          |  CAST(EXTRACT(ISOYEAR FROM ts) AS BIGINT) AS v_isoyear,
          |  CAST(FLOOR(EXTRACT(EPOCH FROM ts)) AS BIGINT) AS v_epoch,
          |  CAST(EXTRACT(MICROSECONDS FROM ts) AS BIGINT) AS v_us,
          |  CAST(EXTRACT(MILLISECONDS FROM ts) AS BIGINT) AS v_ms,
          |  CAST(DATE_PART('century', ts) AS BIGINT) AS v_century_dp,
          |  CAST(DATE_TRUNC('century', ts) + INTERVAL 1 YEAR AS DATE) AS v_tc,
          |  CAST(DATE_TRUNC('decade', ts) AS DATE) AS v_td,
          |  CAST(DATE_TRUNC('millennium', ts) + INTERVAL 1 YEAR AS DATE) AS v_tm
          |FROM events
          |WHERE event_id < 300
          |ORDER BY event_id""".stripMargin),

    // ---- date_bin + generate_series + to_char (PgFunctions) ----
    QueryDef.sql(
      "q_fn_datebin_series",
      """SELECT g.d AS bucket_start,
        |  COUNT(e.event_id) AS n_events
        |FROM (SELECT GENERATE_SERIES(
        |        TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-30',
        |        INTERVAL '1' DAY) AS d) g
        |LEFT JOIN events e
        |  ON DATE_BIN(INTERVAL '1' DAY, e.ts, TIMESTAMP '2024-01-01') = g.d
        |GROUP BY g.d
        |ORDER BY g.d""".stripMargin,
      oracle =
        """SELECT g.d AS bucket_start,
          |  COUNT(e.event_id) AS n_events
          |FROM (SELECT UNNEST(GENERATE_SERIES(
          |        TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-30',
          |        INTERVAL '1' DAY)) AS d) g
          |LEFT JOIN events e
          |  ON TIME_BUCKET(INTERVAL '1' DAY, e.ts, TIMESTAMP '2024-01-01') = g.d
          |GROUP BY g.d
          |ORDER BY g.d""".stripMargin),

    QueryDef.sql(
      "q_fn_tochar",
      """SELECT o_orderkey,
        |  TO_CHAR(o_orderdate, 'YYYY-MM-DD') AS v_iso,
        |  TO_CHAR(o_orderdate, 'DD/MM/YYYY') AS v_eu,
        |  TO_CHAR(o_orderdate, 'Mon DD, YYYY') AS v_us,
        |  TO_CHAR(o_orderdate, 'YYYY "Q"Q') AS v_quarter,
        |  TO_CHAR(o_orderdate, 'Day') AS v_dayname
        |FROM orders
        |WHERE o_orderkey <= 100
        |ORDER BY o_orderkey""".stripMargin,
      oracle =
        """SELECT o_orderkey,
          |  STRFTIME(o_orderdate, '%Y-%m-%d') AS v_iso,
          |  STRFTIME(o_orderdate, '%d/%m/%Y') AS v_eu,
          |  CONCAT(STRFTIME(o_orderdate, '%b '), LPAD(STRFTIME(o_orderdate, '%d'), 2, '0'), STRFTIME(o_orderdate, ', %Y')) AS v_us,
          |  STRFTIME(o_orderdate, '%Y Q') || CAST(EXTRACT(QUARTER FROM o_orderdate) AS VARCHAR) AS v_quarter,
          |  STRFTIME(o_orderdate, '%A') AS v_dayname
          |FROM orders
          |WHERE o_orderkey <= 100
          |ORDER BY o_orderkey""".stripMargin),

    // ---- casts (§2.7 cast list) ----
    // v_f4 / v_num keep the FLOAT / DECIMAL casts under test but widen
    // the result to DOUBLE: the driver's pandas comparator renders
    // DECIMAL as decimal.Decimal('x.x0') on the Spark side but float64
    // on the DuckDB side (trailing-zero hash drift), so green queries
    // always surface money columns as DOUBLE.
    QueryDef.sql(
      "q_fn_cast",
      """SELECT l_orderkey, l_linenumber,
        |  CAST(l_quantity AS SMALLINT) AS v_i2,
        |  CAST(l_quantity AS INT) AS v_i4,
        |  CAST(l_quantity AS BIGINT) AS v_i8,
        |  CAST(CAST(l_quantity AS FLOAT) AS DOUBLE) AS v_f4,
        |  CAST(l_extendedprice AS DOUBLE) AS v_f8,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS v_num,
        |  CAST(l_orderkey AS STRING) AS v_text,
        |  CAST(l_quantity > 25 AS BOOLEAN) AS v_bool,
        |  CAST(CAST(l_quantity AS INT) AS STRING) AS v_int_text,
        |  CAST('1996-07-04' AS DATE) AS v_date,
        |  CAST('1996-07-04 12:30:00' AS TIMESTAMP_NTZ) AS v_ts
        |FROM lineitem
        |WHERE l_orderkey <= 100
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin,
      oracle =
        """SELECT l_orderkey, l_linenumber,
          |  CAST(l_quantity AS SMALLINT) AS v_i2,
          |  CAST(l_quantity AS INT) AS v_i4,
          |  CAST(l_quantity AS BIGINT) AS v_i8,
          |  CAST(CAST(l_quantity AS FLOAT) AS DOUBLE) AS v_f4,
          |  CAST(l_extendedprice AS DOUBLE) AS v_f8,
          |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS v_num,
          |  CAST(l_orderkey AS VARCHAR) AS v_text,
          |  CAST(l_quantity > 25 AS BOOLEAN) AS v_bool,
          |  CAST(CAST(l_quantity AS INT) AS VARCHAR) AS v_int_text,
          |  CAST('1996-07-04' AS DATE) AS v_date,
          |  CAST('1996-07-04 12:30:00' AS TIMESTAMP) AS v_ts
          |FROM lineitem
          |WHERE l_orderkey <= 100
          |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin),

    // ---- arrays (§2.7 array list) over the embeddings fixture ----
    QueryDef.sql(
      "q_fn_array",
      """SELECT vec_id,
        |  CARDINALITY(embedding) AS v_card,
        |  ROUND(CAST(ELEMENT_AT(embedding, 1) AS DOUBLE), 6) AS v_first,
        |  ROUND(CAST(ELEMENT_AT(embedding, 64) AS DOUBLE), 6) AS v_last,
        |  CARDINALITY(ARRAY_APPEND(embedding, CAST(0.0 AS FLOAT))) AS v_append_len,
        |  CARDINALITY(ARRAY_PREPEND(CAST(0.0 AS FLOAT), embedding)) AS v_prepend_len,
        |  CARDINALITY(ARRAY_CAT(embedding, embedding)) AS v_cat_len,
        |  ROUND(CAST(ELEMENT_AT(SLICE(embedding, 3, 5), 1) AS DOUBLE), 6) AS v_slice_first,
        |  ARRAY_CONTAINS(ARRAY(CAST(label AS INT), 1, 2), 1) AS v_contains,
        |  ROUND(CAST(ARRAY_MAX(embedding) AS DOUBLE), 6) AS v_max,
        |  ROUND(CAST(ARRAY_MIN(embedding) AS DOUBLE), 6) AS v_min,
        |  ARRAY_LENGTH(embedding, 1) AS v_len1,
        |  ARRAY_LENGTH(embedding, 2) AS v_len2
        |FROM embeddings
        |WHERE vec_id < 100
        |ORDER BY vec_id""".stripMargin,
      oracle =
        """SELECT vec_id,
          |  CAST(LEN(embedding) AS INT) AS v_card,
          |  ROUND(CAST(embedding[1] AS DOUBLE), 6) AS v_first,
          |  ROUND(CAST(embedding[64] AS DOUBLE), 6) AS v_last,
          |  CAST(LEN(LIST_APPEND(embedding, 0.0)) AS INT) AS v_append_len,
          |  CAST(LEN(LIST_PREPEND(0.0, embedding)) AS INT) AS v_prepend_len,
          |  CAST(LEN(LIST_CONCAT(embedding, embedding)) AS INT) AS v_cat_len,
          |  ROUND(CAST(embedding[3] AS DOUBLE), 6) AS v_slice_first,
          |  LIST_CONTAINS([CAST(label AS INT), 1, 2], 1) AS v_contains,
          |  ROUND(CAST(LIST_MAX(embedding) AS DOUBLE), 6) AS v_max,
          |  ROUND(CAST(LIST_MIN(embedding) AS DOUBLE), 6) AS v_min,
          |  CAST(LEN(embedding) AS INT) AS v_len1,
          |  CAST(NULL AS INT) AS v_len2
          |FROM embeddings
          |WHERE vec_id < 100
          |ORDER BY vec_id""".stripMargin),

    // ---- unnest / explode (§2.6) ----
    QueryDef.sql(
      "q_unnest",
      """SELECT vec_id, pos, ROUND(CAST(val AS DOUBLE), 6) AS val
        |FROM (
        |  SELECT vec_id, POSEXPLODE(SLICE(embedding, 1, 8)) AS (pos, val)
        |  FROM embeddings WHERE vec_id < 20) t
        |ORDER BY vec_id, pos""".stripMargin,
      oracle =
        """SELECT vec_id,
          |  CAST(g AS INT) - 1 AS pos,
          |  ROUND(CAST(embedding[g] AS DOUBLE), 6) AS val
          |FROM (SELECT vec_id, embedding, UNNEST(GENERATE_SERIES(1, 8)) AS g
          |      FROM embeddings WHERE vec_id < 20) t
          |ORDER BY vec_id, pos""".stripMargin),

    // ---- JSON (§2.7 JSON list) over events.props ----
    QueryDef.sql(
      "q_fn_json",
      """SELECT event_id,
        |  GET_JSON_OBJECT(props, '$.k') AS v_k,
        |  CAST(GET_JSON_OBJECT(props, '$.k') AS BIGINT) AS v_k_int,
        |  GET_JSON_OBJECT(props, '$.missing') AS v_missing,
        |  JSON_ARRAY_LENGTH(CONCAT('[1,2,', GET_JSON_OBJECT(props, '$.k'), ']')) AS v_arr_len
        |FROM events
        |WHERE event_id < 200
        |ORDER BY event_id""".stripMargin,
      oracle =
        """SELECT event_id,
          |  JSON_EXTRACT_STRING(props, '$.k') AS v_k,
          |  CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS v_k_int,
          |  JSON_EXTRACT_STRING(props, '$.missing') AS v_missing,
          |  CAST(JSON_ARRAY_LENGTH(CONCAT('[1,2,', JSON_EXTRACT_STRING(props, '$.k'), ']')) AS INT) AS v_arr_len
          |FROM events
          |WHERE event_id < 200
          |ORDER BY event_id""".stripMargin),

    // ---- map type (§1.2 pg_map → native MapType) ----
    QueryDef.sql(
      "q_fn_map",
      """SELECT event_id,
        |  ELEMENT_AT(m, 'type') AS v_type,
        |  ELEMENT_AT(m, 'missing') AS v_missing,
        |  CAST(CARDINALITY(m) AS INT) AS v_card,
        |  CAST(SIZE(MAP_ENTRIES(m)) AS INT) AS v_entries
        |FROM (SELECT event_id,
        |        MAP('type', event_type, 'k', GET_JSON_OBJECT(props, '$.k')) AS m
        |      FROM events WHERE event_id < 100) t
        |ORDER BY event_id""".stripMargin,
      oracle =
        """SELECT event_id,
          |  ELEMENT_AT(m, 'type')[1] AS v_type,
          |  CAST(NULL AS VARCHAR) AS v_missing,
          |  CAST(CARDINALITY(m) AS INT) AS v_card,
          |  CAST(LEN(MAP_ENTRIES(m)) AS INT) AS v_entries
          |FROM (SELECT event_id,
          |        MAP(['type', 'k'], [event_type, JSON_EXTRACT_STRING(props, '$.k')]) AS m
          |      FROM events WHERE event_id < 100) t
          |ORDER BY event_id""".stripMargin),

    // ---- pg_map operator + map_type.* spellings (reference pg_map
    //      extension, test_map_extract.py: `map_col -> 'key'` and
    //      map_type.extract/cardinality/entries; MapTypeRewrite +
    //      JsonArrow's MAP dispatch) ----
    QueryDef.sql(
      "q_fn_map_ops",
      """SELECT event_id,
        |  (m -> 'type') AS v_arrow,
        |  map_type.extract(m, 'k') AS v_extract,
        |  map_type.extract(m, 'missing') AS v_missing,
        |  CAST(map_type.cardinality(m) AS INT) AS v_card,
        |  CAST(SIZE(map_type.entries(m)) AS INT) AS v_entries
        |FROM (SELECT event_id,
        |        MAP('type', event_type, 'k', GET_JSON_OBJECT(props, '$.k')) AS m
        |      FROM events WHERE event_id < 100) t
        |ORDER BY event_id""".stripMargin,
      oracle =
        """SELECT event_id,
          |  ELEMENT_AT(m, 'type')[1] AS v_arrow,
          |  ELEMENT_AT(m, 'k')[1] AS v_extract,
          |  CAST(NULL AS VARCHAR) AS v_missing,
          |  CAST(CARDINALITY(m) AS INT) AS v_card,
          |  CAST(LEN(MAP_ENTRIES(m)) AS INT) AS v_entries
          |FROM (SELECT event_id,
          |        MAP(['type', 'k'], [event_type, JSON_EXTRACT_STRING(props, '$.k')]) AS m
          |      FROM events WHERE event_id < 100) t
          |ORDER BY event_id""".stripMargin),

    // ---- PG row-wise comparison + IS DISTINCT FROM (reference
    //      test_select_expressions.py: ROW(a,b,c) > ROW(...) and
    //      IS DISTINCT FROM compose in pushdown-shaped selects) ----
    QueryDef.sql(
      "q_fn_row_compare",
      """SELECT o_orderkey,
        |  (ROW(o_custkey, o_totalprice) > ROW(500, 100000.0)) AS row_gt,
        |  (ROW(o_orderstatus, o_orderpriority) =
        |   ROW('O', '1-URGENT')) AS row_eq,
        |  (ROW(o_custkey, o_totalprice) <= ROW(o_custkey, 50000.0)) AS row_le,
        |  (ROW(o_orderstatus, o_custkey) <> ROW('F', 10)) AS row_ne,
        |  (o_orderstatus IS DISTINCT FROM 'O') AS isdf,
        |  (NULLIF(o_orderstatus, 'O') IS NOT DISTINCT FROM NULL) AS nullsafe
        |FROM orders
        |WHERE o_orderkey < 300
        |ORDER BY o_orderkey""".stripMargin),

    // ---- VALUES list (§2.6) ----
    QueryDef.sql(
      "q_values",
      """SELECT v.status, v.label, COUNT(o_orderkey) AS n
        |FROM (VALUES ('O', 'open'), ('F', 'finished'), ('P', 'pending'), ('X', 'none'))
        |  AS v(status, label)
        |LEFT JOIN orders ON o_orderstatus = v.status
        |GROUP BY v.status, v.label
        |ORDER BY v.status""".stripMargin),

    // ---- width_bucket (the reference's canonical NOT-shippable
    //      function — ours executes natively; docs/iceberg-tables.md:498) --
    QueryDef.sql(
      "q_fn_width_bucket",
      """SELECT CAST(WIDTH_BUCKET(o_totalprice, 0, 500000, 10) AS BIGINT) AS bucket,
        |  COUNT(*) AS n
        |FROM orders
        |GROUP BY 1
        |ORDER BY bucket""".stripMargin,
      oracle =
        """SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0
          |            WHEN o_totalprice >= 500000 THEN 11
          |            ELSE FLOOR(o_totalprice / 50000) + 1 END AS BIGINT) AS bucket,
          |  COUNT(*) AS n
          |FROM orders
          |GROUP BY 1
          |ORDER BY bucket""".stripMargin),

    // ---- SIMILAR TO (§2.7): PG pattern language (the reference's
    // compat suite runs it PG-side, test_postgres_compat_sql.py:63) —
    // % and _ are wildcards, regex |*+?(){}[] keep their meaning, but
    // '.' is LITERAL, the match is anchored, and ESCAPE quotes the
    // next character. Spark has no SIMILAR TO (plans/SimilarToRewrite
    // expands it onto RLIKE); DuckDB HAS one but it deviates from PG
    // ('.' is a metachar, '%' is not a wildcard — plain full-regex
    // match), so the oracle uses regexp_full_match with the PG
    // translation derived by hand from the PG docs, independently of
    // the engine's translator.
    QueryDef.sql(
      "q_fn_similar_to",
      """SELECT n_nationkey, n_name,
        |  n_name SIMILAR TO '%(IA|IL)' AS ends_ia_il,
        |  n_name SIMILAR TO 'UNITED_%' AS united_x,
        |  n_name SIMILAR TO '[A-F]%' AS first_a_f,
        |  n_name NOT SIMILAR TO '%A%' AS no_a,
        |  n_name SIMILAR TO '[A-Z]{4}' AS four_caps,
        |  'U.S.' SIMILAR TO 'U.S.' AS lit_dot_hit,
        |  'UXSY' SIMILAR TO 'U.S.' AS lit_dot_miss,
        |  'A_B' SIMILAR TO '%!_%' ESCAPE '!' AS esc_underscore,
        |  'AxB' SIMILAR TO '%!_%' ESCAPE '!' AS esc_underscore_miss
        |FROM nation
        |ORDER BY n_nationkey""".stripMargin,
      oracle = """SELECT n_nationkey, n_name,
        |  regexp_full_match(n_name, '.*(IA|IL)') AS ends_ia_il,
        |  regexp_full_match(n_name, 'UNITED..*') AS united_x,
        |  regexp_full_match(n_name, '[A-F].*') AS first_a_f,
        |  NOT regexp_full_match(n_name, '.*A.*') AS no_a,
        |  regexp_full_match(n_name, '[A-Z]{4}') AS four_caps,
        |  regexp_full_match('U.S.', 'U\.S\.') AS lit_dot_hit,
        |  regexp_full_match('UXSY', 'U\.S\.') AS lit_dot_miss,
        |  regexp_full_match('A_B', '.*_.*') AS esc_underscore,
        |  regexp_full_match('AxB', '.*_.*') AS esc_underscore_miss
        |FROM nation
        |ORDER BY n_nationkey""".stripMargin),

    // ---- POSIX regex operators + regex SUBSTRING (§2.7): PG's
    // `~ ~* !~ !~*` substring-match family and
    // `SUBSTRING(x FROM 'pat')` (reference text-search suite,
    // test_regex_text_search.py). DuckDB's own `~` is
    // regexp_full_match (NOT PG's substring search) and it has no
    // `~*` or regex-FROM substring — so the oracle spells
    // regexp_matches/regexp_extract with the PG semantics
    // (group-1-if-parenthesized, NULL on no match) explicitly.
    QueryDef.sql(
      "q_fn_posix_regex",
      """SELECT n_nationkey, n_name,
        |  n_name ~ 'A.*A' AS re_hit,
        |  n_name ~* 'united.*' AS ci_hit,
        |  n_name !~ '[AEIOU]$' AS no_vowel_end,
        |  concat('id-', CAST(n_nationkey AS STRING)) ~ '^id-[0-9]+$'
        |    AS id_like,
        |  SUBSTRING(concat('n', CAST(n_nationkey * 7 AS STRING), 'x')
        |    FROM '[0-9]+') AS digits,
        |  SUBSTRING(n_name FROM '([A-Z]+) ') AS first_word
        |FROM nation
        |ORDER BY n_nationkey""".stripMargin,
      oracle = """SELECT n_nationkey, n_name,
        |  regexp_matches(n_name, 'A.*A') AS re_hit,
        |  regexp_matches(n_name, '(?i)united.*') AS ci_hit,
        |  NOT regexp_matches(n_name, '[AEIOU]$') AS no_vowel_end,
        |  regexp_matches(concat('id-', CAST(n_nationkey AS VARCHAR)),
        |    '^id-[0-9]+$') AS id_like,
        |  CASE WHEN regexp_matches(
        |      concat('n', CAST(n_nationkey * 7 AS VARCHAR), 'x'), '[0-9]+')
        |    THEN regexp_extract(
        |      concat('n', CAST(n_nationkey * 7 AS VARCHAR), 'x'),
        |      '[0-9]+', 0) END AS digits,
        |  CASE WHEN regexp_matches(n_name, '([A-Z]+) ')
        |    THEN regexp_extract(n_name, '([A-Z]+) ', 1) END AS first_word
        |FROM nation
        |ORDER BY n_nationkey""".stripMargin),

    // ---- PG cast syntax (::int2/4/8, ::float4/8, ::numeric(p,s),
    // ::bpchar, ::text, bool::int4 — the spelling the reference's type
    // suites use throughout; PgCastRewrite maps the names Spark-side,
    // DuckDB accepts the PG aliases natively, so the SAME text is
    // differentially judged) ----
    QueryDef.sql(
      "q_fn_pg_casts",
      """SELECT n_nationkey,
        |  n_nationkey::int2 AS v_i2,
        |  n_nationkey::int8 AS v_i8,
        |  (n_nationkey * 2)::float4 AS v_f4,
        |  (n_nationkey / 4.0)::float8 AS v_f8,
        |  CAST((n_nationkey * 1.5)::numeric(10,2) AS DOUBLE) AS v_num,
        |  n_name::bpchar AS v_bp,
        |  n_nationkey::text AS v_txt,
        |  (n_nationkey > 10)::int4 AS v_b2i
        |FROM nation
        |ORDER BY n_nationkey""".stripMargin),

    // ---- PG json operators -> ->> #> #>> (§2.7 JSON; the reference's
    // jsonb suite uses the operators directly and pushes them down,
    // test_jsonb_pushdown.py). JsonArrowRewrite maps them onto native
    // expressions Spark-side; DuckDB has -> and ->> natively (same
    // compact rendering) but no #>/#>>, so the oracle spells the path
    // forms as json_extract[_string]. Negative from-the-end indices are
    // PG-only (DuckDB returns NULL) and stay in JsonOpsSpec. ----
    QueryDef.sql(
      "q_fn_json_ops",
      """SELECT event_id,
        |  j -> 'k' AS v_k_json,
        |  j ->> 'k' AS v_k_text,
        |  j -> 'obj' AS v_obj,
        |  j -> 'obj' ->> 's' AS v_s,
        |  j ->> 'missing' AS v_missing,
        |  j -> 'arr' -> 0 AS v_a0,
        |  j -> 'arr' ->> 2 AS v_a2,
        |  j -> 'obj' ->> 'n' AS v_null,
        |  j #> '{obj,s}' AS v_path,
        |  j #>> '{arr,1}' AS v_path_text
        |FROM (
        |  SELECT event_id,
        |    CONCAT('{"k":', CAST(event_id % 100 AS STRING),
        |      ',"arr":[', CAST(event_id % 7 AS STRING),
        |      ',11,12],"obj":{"s":"v', CAST(event_id % 5 AS STRING),
        |      '","n":null}}') AS j
        |  FROM events WHERE event_id < 300) t
        |ORDER BY event_id""".stripMargin,
      oracle =
        """SELECT event_id,
          |  CAST(j -> 'k' AS VARCHAR) AS v_k_json,
          |  j ->> 'k' AS v_k_text,
          |  CAST(j -> 'obj' AS VARCHAR) AS v_obj,
          |  (j -> 'obj') ->> 's' AS v_s,
          |  j ->> 'missing' AS v_missing,
          |  CAST((j -> 'arr') -> 0 AS VARCHAR) AS v_a0,
          |  (j -> 'arr') ->> 2 AS v_a2,
          |  (j -> 'obj') ->> 'n' AS v_null,
          |  CAST(json_extract(j, '$.obj.s') AS VARCHAR) AS v_path,
          |  json_extract_string(j, '$.arr[1]') AS v_path_text
          |FROM (
          |  SELECT event_id,
          |    CONCAT('{"k":', CAST(event_id % 100 AS VARCHAR),
          |      ',"arr":[', CAST(event_id % 7 AS VARCHAR),
          |      ',11,12],"obj":{"s":"v', CAST(event_id % 5 AS VARCHAR),
          |      '","n":null}}') AS j
          |  FROM events WHERE event_id < 300) t
          |ORDER BY event_id""".stripMargin),

    // ---- encode/decode bytea formats (§2.7; reference
    // test_encode_decode_pushdown.py — hex/base64 push down, escape is
    // PG-local). PG hex is lowercase; base64 unwrapped (fixture values
    // are far under the 76-char MIME wrap). The escape column is
    // ASCII-only here so it equals the input; octal/backslash escape
    // behavior is pinned in JsonOpsSpec. DuckDB's own encode() is
    // VARCHAR→BLOB (a different function), hence the hex/to_base64
    // spellings in the oracle. ----
    QueryDef.sql(
      "q_fn_encode",
      """SELECT c_custkey,
        |  encode(c_name::bytea, 'hex') AS v_hex,
        |  encode(c_name::bytea, 'base64') AS v_b64,
        |  CAST(decode(encode(c_name::bytea, 'hex'), 'hex') AS STRING) AS v_rt_hex,
        |  CAST(decode(encode(c_name::bytea, 'base64'), 'base64') AS STRING) AS v_rt_b64,
        |  encode(c_name::bytea, 'escape') AS v_escape
        |FROM customer
        |WHERE c_custkey <= 200
        |ORDER BY c_custkey""".stripMargin,
      oracle =
        """SELECT c_custkey,
          |  lower(hex(encode(c_name))) AS v_hex,
          |  to_base64(encode(c_name)) AS v_b64,
          |  decode(from_hex(lower(hex(encode(c_name))))) AS v_rt_hex,
          |  decode(from_base64(to_base64(encode(c_name)))) AS v_rt_b64,
          |  c_name AS v_escape
          |FROM customer
          |WHERE c_custkey <= 200
          |ORDER BY c_custkey""".stripMargin))
}
