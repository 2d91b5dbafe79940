package graft.queries

import graft.QueryDef

/** Per-type operator matrix (SURVEY.md §2.2; the reference runs one
  * pytest suite per column type — tests/pytests/operator_pushdown/
  * test_{int2,int4,int8,float4,float8,bool,text,date,...}.py). Each
  * query derives typed columns from the fixtures and exercises the
  * comparison / arithmetic / predicate operator set for that type;
  * single SQL text, oracle-differential in DuckDB.
  */
object TypeMatrix {

  val defs: Seq[QueryDef] = Seq(

    // integers: + - * / % comparisons, BETWEEN, IN, CASE, NULLIF/COALESCE
    QueryDef.sql(
      "q_ops_int",
      """SELECT l_orderkey, l_linenumber,
        |  l_orderkey + l_linenumber AS add_v,
        |  l_orderkey - l_linenumber AS sub_v,
        |  l_orderkey * 3 AS mul_v,
        |  CAST(l_orderkey / 7 AS DOUBLE) AS div_v,
        |  l_orderkey % 7 AS mod_v,
        |  -l_linenumber AS neg_v,
        |  l_orderkey = 17 AS eq_v, l_orderkey <> 17 AS ne_v,
        |  l_orderkey < 17 AS lt_v, l_orderkey <= 17 AS le_v,
        |  l_orderkey > 17 AS gt_v, l_orderkey >= 17 AS ge_v,
        |  l_orderkey BETWEEN 10 AND 30 AS btw_v,
        |  l_linenumber IN (1, 3, 5) AS in_v,
        |  CASE WHEN l_orderkey % 2 = 0 THEN 'even' ELSE 'odd' END AS case_v,
        |  COALESCE(NULLIF(l_linenumber, 1), -1) AS nullif_v,
        |  GREATEST(l_orderkey, 100) AS greatest_v,
        |  LEAST(l_linenumber, 2) AS least_v
        |FROM lineitem WHERE l_orderkey < 60
        |ORDER BY l_orderkey, l_linenumber""".stripMargin),

    // floats/doubles: arithmetic, rounding boundary ops, sign/abs,
    // null-safe comparisons
    QueryDef.sql(
      "q_ops_float",
      """SELECT o_orderkey,
        |  CAST(o_totalprice + 1.5 AS DOUBLE) AS add_v,
        |  CAST(o_totalprice * 0.5 AS DOUBLE) AS mul_v,
        |  CAST(-o_totalprice AS DOUBLE) AS neg_v,
        |  abs(-o_totalprice) AS abs_v,
        |  CAST(sign(o_totalprice - 100000) AS BIGINT) AS sign_v,
        |  CAST(floor(o_totalprice) AS BIGINT) AS floor_v,
        |  CAST(ceil(o_totalprice) AS BIGINT) AS ceil_v,
        |  o_totalprice > 100000 AS gt_v,
        |  o_totalprice IS NULL AS isnull_v,
        |  o_totalprice IS NOT NULL AS notnull_v,
        |  CAST(o_totalprice AS DECIMAL(18,2)) = CAST(o_totalprice AS DECIMAL(18,2)) AS self_eq
        |FROM orders WHERE o_orderkey < 100
        |ORDER BY o_orderkey""".stripMargin),

    // text: concat, LIKE/ILIKE shapes, case ops, trim/pad, comparisons
    QueryDef.sql(
      "q_ops_text",
      """SELECT c_custkey,
        |  c_name || '/' || c_mktsegment AS concat_v,
        |  upper(c_mktsegment) AS upper_v, lower(c_mktsegment) AS lower_v,
        |  length(c_name) AS len_v,
        |  c_mktsegment LIKE 'BUILD%' AS like_v,
        |  c_mktsegment NOT LIKE '%ING' AS notlike_v,
        |  c_mktsegment = 'MACHINERY' AS eq_v,
        |  c_mktsegment < 'FURNITURE' AS lt_v,
        |  substring(c_name, 1, 8) AS substr_v,
        |  replace(c_mktsegment, 'A', '@') AS replace_v,
        |  trim('  x  ') AS trim_v,
        |  lpad(c_mktsegment, 12, '.') AS lpad_v,
        |  starts_with(c_mktsegment, 'HOUSE') AS startswith_v,
        |  position('E' IN c_mktsegment) AS pos_v
        |FROM customer WHERE c_custkey < 80
        |ORDER BY c_custkey""".stripMargin),

    // date/timestamp: comparisons, truncation, extraction, interval math
    QueryDef.sql(
      "q_ops_date",
      """SELECT o_orderkey,
        |  o_orderdate = TIMESTAMP '1996-06-01' AS eq_v,
        |  o_orderdate < TIMESTAMP '1997-01-01' AS lt_v,
        |  o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31' AS btw_v,
        |  CAST(o_orderdate AS DATE) AS date_v,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS trunc_v,
        |  EXTRACT(year FROM o_orderdate) AS year_v,
        |  EXTRACT(month FROM o_orderdate) AS month_v,
        |  EXTRACT(day FROM o_orderdate) AS day_v,
        |  o_orderdate + INTERVAL '30' DAY AS plus30_v,
        |  o_orderdate - INTERVAL '1' MONTH AS minus1m_v
        |FROM orders WHERE o_orderkey < 100
        |ORDER BY o_orderkey""".stripMargin),

    // booleans: AND/OR/NOT, IS [NOT] DISTINCT FROM, boolean aggregation
    QueryDef.sql(
      "q_ops_bool",
      """SELECT l_orderkey, l_linenumber,
        |  (l_quantity > 25) AND (l_discount > 0.05) AS and_v,
        |  (l_quantity > 25) OR (l_discount > 0.05) AS or_v,
        |  NOT (l_quantity > 25) AS not_v,
        |  (l_returnflag = 'A') IS NOT DISTINCT FROM (l_linestatus = 'F') AS nds_v,
        |  (l_returnflag = 'A') IS DISTINCT FROM (l_linestatus = 'F') AS ds_v,
        |  CASE WHEN l_quantity > 25 THEN NULL ELSE l_quantity > 10 END IS NULL AS null_bool_v
        |FROM lineitem WHERE l_orderkey < 40
        |ORDER BY l_orderkey, l_linenumber""".stripMargin),

    // three-valued logic: fixtures carry no NULLs, so inject them with
    // NULLIF and exercise comparison/arith/boolean/aggregate semantics
    QueryDef.sql(
      "q_ops_null",
      """SELECT l_orderkey, l_linenumber,
        |  NULLIF(l_linenumber, 2) AS maybe_null,
        |  NULLIF(l_linenumber, 2) + 1 AS null_arith,
        |  NULLIF(l_linenumber, 2) = 3 AS null_eq,
        |  (NULLIF(l_linenumber, 2) = 3) IS NULL AS null_eq_isnull,
        |  NULLIF(l_linenumber, 2) IS DISTINCT FROM 2 AS null_distinct,
        |  (NULLIF(l_linenumber, 2) > 1) AND (l_quantity > 0) AS null_and,
        |  (NULLIF(l_linenumber, 2) > 1) OR (l_quantity > 0) AS null_or,
        |  COALESCE(NULLIF(l_linenumber, 2), -1) AS coalesce_v,
        |  CASE WHEN NULLIF(l_linenumber, 2) IS NULL THEN 'n' ELSE 'v' END AS case_v
        |FROM lineitem WHERE l_orderkey < 30
        |ORDER BY l_orderkey, l_linenumber""".stripMargin),

    // null-aware aggregates over injected nulls: count skips, sum/avg
    // ignore, count(*) keeps
    QueryDef.sql(
      "q_agg_null",
      """SELECT l_returnflag,
        |  count(*) AS n_all,
        |  count(NULLIF(l_linenumber, 2)) AS n_nonnull,
        |  CAST(SUM(CAST(NULLIF(l_linenumber, 2) AS BIGINT)) AS BIGINT) AS sum_nn,
        |  CAST(MIN(NULLIF(l_linenumber, 2)) AS BIGINT) AS min_nn,
        |  count(DISTINCT NULLIF(l_linenumber, 2)) AS nd_nn
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin),

    // binary/encoding: hex + base64 encode/decode, md5, length over bytes
    // (PG encode/decode family — shippable via DuckDB to_hex/to_base64,
    // rewrite_query.c:170-171)
    QueryDef.sql(
      "q_ops_encode",
      """SELECT c_custkey,
        |  hex(encode(c_mktsegment, 'UTF-8')) AS hex_v,
        |  base64(encode(c_mktsegment, 'UTF-8')) AS b64_v,
        |  decode(unbase64(base64(encode(c_mktsegment, 'UTF-8'))), 'UTF-8') AS roundtrip_v,
        |  md5(c_mktsegment) AS md5_v,
        |  length(encode(c_name, 'UTF-8')) AS bytelen_v
        |FROM customer WHERE c_custkey < 60
        |ORDER BY c_custkey""".stripMargin,
      oracle =
        """SELECT c_custkey,
          |  hex(c_mktsegment::BLOB) AS hex_v,
          |  to_base64(c_mktsegment::BLOB) AS b64_v,
          |  from_base64(to_base64(c_mktsegment::BLOB))::VARCHAR AS roundtrip_v,
          |  md5(c_mktsegment) AS md5_v,
          |  octet_length(c_name::BLOB) AS bytelen_v
          |FROM customer WHERE c_custkey < 60
          |ORDER BY c_custkey""".stripMargin),

    // arrays (over embeddings fixture): subscript, size, contains, slice
    QueryDef.sql(
      "q_ops_array",
      """SELECT vec_id,
        |  CAST(element_at(embedding, 1) AS DOUBLE) AS first_v,
        |  size(embedding) AS size_v,
        |  CAST(element_at(embedding, 3) AS DOUBLE) AS elem3_v,
        |  size(slice(embedding, 1, 4)) AS slice_len_v,
        |  array_contains(array(label, 1, 2), 1) AS contains_v
        |FROM embeddings WHERE vec_id < 50
        |ORDER BY vec_id""".stripMargin,
      oracle =
        """SELECT vec_id,
          |  embedding[1]::DOUBLE AS first_v,
          |  len(embedding) AS size_v,
          |  embedding[3]::DOUBLE AS elem3_v,
          |  len(embedding[1:4]) AS slice_len_v,
          |  list_contains([label, 1, 2], 1) AS contains_v
          |FROM embeddings WHERE vec_id < 50
          |ORDER BY vec_id""".stripMargin),

    // time convention (SURVEY §1.2): TIME has no Spark type — the
    // documented storage is micros-of-day as LongType. Exercised end to
    // end: derive, range-filter, bucket to hour-of-day, aggregate.
    QueryDef.sql(
      "q_type_time",
      """SELECT CAST(FLOOR((unix_micros(CAST(ts AS TIMESTAMP)) % 86400000000)
        |         / 3600000000) AS BIGINT) AS hour_of_day,
        |  COUNT(*) AS n,
        |  MIN(unix_micros(CAST(ts AS TIMESTAMP)) % 86400000000) AS min_micros,
        |  MAX(unix_micros(CAST(ts AS TIMESTAMP)) % 86400000000) AS max_micros
        |FROM events
        |WHERE (unix_micros(CAST(ts AS TIMESTAMP)) % 86400000000)
        |      BETWEEN 6 * 3600000000 AND 18 * 3600000000
        |GROUP BY 1 ORDER BY hour_of_day""".stripMargin,
      oracle =
        """SELECT CAST(FLOOR((epoch_us(ts) % 86400000000)
          |         / 3600000000) AS BIGINT) AS hour_of_day,
          |  COUNT(*) AS n,
          |  MIN(epoch_us(ts) % 86400000000) AS min_micros,
          |  MAX(epoch_us(ts) % 86400000000) AS max_micros
          |FROM events
          |WHERE (epoch_us(ts) % 86400000000)
          |      BETWEEN 6 * 3600000000 AND 18 * 3600000000
          |GROUP BY 1 ORDER BY hour_of_day""".stripMargin),

    // uuid convention (SURVEY §1.2): canonical-form StringType. A
    // deterministic v4-shaped uuid is derived from each key (md5 hex
    // resected into 8-4-4-4-12), then filtered/ordered as text — the
    // operations a uuid column actually sees.
    QueryDef.sql(
      "q_type_uuid",
      """SELECT concat(substring(md5(CAST(o_orderkey AS STRING)), 1, 8), '-',
        |       substring(md5(CAST(o_orderkey AS STRING)), 9, 4), '-',
        |       substring(md5(CAST(o_orderkey AS STRING)), 13, 4), '-',
        |       substring(md5(CAST(o_orderkey AS STRING)), 17, 4), '-',
        |       substring(md5(CAST(o_orderkey AS STRING)), 21, 12)) AS uuid,
        |  o_orderkey
        |FROM orders
        |WHERE substring(md5(CAST(o_orderkey AS STRING)), 1, 1) = 'a'
        |ORDER BY uuid, o_orderkey""".stripMargin,
      oracle =
        """SELECT concat(substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8), '-',
          |       substring(md5(CAST(o_orderkey AS VARCHAR)), 9, 4), '-',
          |       substring(md5(CAST(o_orderkey AS VARCHAR)), 13, 4), '-',
          |       substring(md5(CAST(o_orderkey AS VARCHAR)), 17, 4), '-',
          |       substring(md5(CAST(o_orderkey AS VARCHAR)), 21, 12)) AS uuid,
          |  o_orderkey
          |FROM orders
          |WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = 'a'
          |ORDER BY uuid, o_orderkey""".stripMargin))
}
