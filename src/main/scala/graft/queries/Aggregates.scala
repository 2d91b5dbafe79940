package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregation surface (SURVEY.md §2.4): distinct/FILTER aggregates,
  * statistical aggregates, ordered-set percentiles, string/array agg,
  * grouping sets / rollup / cube, DISTINCT ON. All map-side-combinable
  * built-ins — partial aggregation happens before the shuffle, so these
  * scale linearly with executor count at 100 TB.
  */
object Aggregates {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  val defs: Seq[QueryDef] = Seq(

    // count(*) / count(x) / count(DISTINCT x) / FILTER (§2.4)
    QueryDef.sql(
      "q_agg_distinct_filter",
      """SELECT o_orderstatus,
        |  COUNT(*) AS n_all,
        |  COUNT(DISTINCT o_custkey) AS n_cust,
        |  COUNT(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
        |  COUNT(DISTINCT o_orderpriority) AS n_prio
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin),

    // approx count-distinct — the mergeable-sketch (HLL) path for
    // count(DISTINCT) at 100 TB: constant memory per group, map-side
    // partial merge, no distinct-expand shuffle. Same band-check oracle
    // pattern as q_agg_percentile_approx: each engine asserts its OWN
    // sketch lands inside its own band, so the compared rows are
    // deterministic booleans while the sketches themselves (different
    // algorithms) never need to agree bit-for-bit. Spark runs rsd=0.02
    // against a ±8% band (≈4σ): rsd=0.01 made HLL++ pathologically
    // slow at bench scale (45 s at sf0.1 vs ~1 s at 0.02). The sketch
    // and the exact side aggregate separately and join on the group
    // key: one aggregate mixing distinct-expand with sketch buffers
    // plans ~3× slower than the two clean passes.
    QueryDef.sql(
      "q_agg_approx_distinct",
      """WITH ex AS (
        |  SELECT o_orderstatus,
        |    COUNT(DISTINCT o_custkey) AS dc, COUNT(DISTINCT o_orderkey) AS dk
        |  FROM orders GROUP BY o_orderstatus),
        |ap AS (
        |  SELECT o_orderstatus,
        |    approx_count_distinct(o_custkey, 0.02) AS ac,
        |    approx_count_distinct(o_orderkey, 0.02) AS ak
        |  FROM orders GROUP BY o_orderstatus)
        |SELECT ap.o_orderstatus,
        |  (ac BETWEEN CAST(0.92 * dc AS BIGINT)
        |          AND CAST(1.08 * dc AS BIGINT)) AS cust_in_band,
        |  (ak BETWEEN CAST(0.92 * dk AS BIGINT)
        |          AND CAST(1.08 * dk AS BIGINT)) AS order_in_band
        |FROM ap JOIN ex USING (o_orderstatus)
        |ORDER BY o_orderstatus""".stripMargin,
      oracle =
        """SELECT o_orderstatus,
          |  (approx_count_distinct(o_custkey)
          |     BETWEEN CAST(0.95 * COUNT(DISTINCT o_custkey) AS BIGINT)
          |         AND CAST(1.05 * COUNT(DISTINCT o_custkey) AS BIGINT))
          |    AS cust_in_band,
          |  (approx_count_distinct(o_orderkey)
          |     BETWEEN CAST(0.95 * COUNT(DISTINCT o_orderkey) AS BIGINT)
          |         AND CAST(1.05 * COUNT(DISTINCT o_orderkey) AS BIGINT))
          |    AS order_in_band
          |FROM orders
          |GROUP BY o_orderstatus
          |ORDER BY o_orderstatus""".stripMargin),

    // min/max over numerics, text, timestamps; any_value on a
    // functionally-dependent column (deterministic); bool_and/bool_or
    QueryDef.sql(
      "q_agg_minmax_bool",
      """SELECT n_nationkey,
        |  ANY_VALUE(n_name) AS nation_name,
        |  MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal,
        |  MIN(c_name) AS first_name, MAX(c_name) AS last_name,
        |  BOOL_AND(c_acctbal > -1000) AS all_above,
        |  BOOL_OR(c_acctbal > 9000) AS any_rich
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_nationkey
        |ORDER BY n_nationkey""".stripMargin),

    // statistical aggregates (float-tolerant in the reference's own
    // tests, shippability.md:35 — we round to 6dp on both sides)
    QueryDef.sql(
      "q_agg_stats",
      """SELECT l_returnflag,
        |  ROUND(STDDEV_SAMP(l_quantity), 6) AS sd_qty,
        |  ROUND(VAR_SAMP(l_quantity), 6) AS var_qty,
        |  ROUND(STDDEV_POP(l_discount), 6) AS sdp_disc,
        |  ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qp,
        |  ROUND(COVAR_POP(l_quantity, l_extendedprice), 4) AS covp_qp,
        |  ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 4) AS covs_qp,
        |  ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 6) AS slope,
        |  ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 4) AS icept,
        |  ROUND(REGR_R2(l_extendedprice, l_quantity), 6) AS r2
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin),

    // ordered-set aggregates: percentile_cont / percentile_disc
    QueryDef.sql(
      "q_agg_percentile",
      """SELECT l_linestatus,
        |  ROUND(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY l_quantity), 6) AS median_qty,
        |  ROUND(PERCENTILE_CONT(0.9) WITHIN GROUP (ORDER BY l_extendedprice), 6) AS p90_price,
        |  PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY l_quantity) AS q1_qty
        |FROM lineitem
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin),

    // approx percentile — the 100×-viable path: a mergeable sketch
    // (constant memory per group) instead of exact percentile's
    // buffer-all-values sort. The differential is tolerance-checked:
    // each engine asserts ITS OWN sketch lands inside its own exact
    // [p40,p60] band, so the compared rows are deterministic booleans
    // while raw sketch outputs (different algorithms) never need to
    // match bit-for-bit.
    QueryDef.sql(
      "q_agg_percentile_approx",
      """WITH ex AS (
        |  SELECT l_linestatus,
        |    PERCENTILE_CONT(0.40) WITHIN GROUP (ORDER BY l_quantity) AS q40,
        |    PERCENTILE_CONT(0.60) WITHIN GROUP (ORDER BY l_quantity) AS q60,
        |    PERCENTILE_CONT(0.85) WITHIN GROUP (ORDER BY l_extendedprice) AS p85,
        |    PERCENTILE_CONT(0.95) WITHIN GROUP (ORDER BY l_extendedprice) AS p95
        |  FROM lineitem GROUP BY l_linestatus),
        |ap AS (
        |  SELECT l_linestatus,
        |    approx_percentile(l_quantity, 0.5) AS aq,
        |    approx_percentile(l_extendedprice, 0.9) AS apx
        |  FROM lineitem GROUP BY l_linestatus)
        |SELECT ap.l_linestatus,
        |  (aq BETWEEN q40 AND q60) AS median_in_band,
        |  (apx BETWEEN p85 AND p95) AS p90_in_band
        |FROM ap JOIN ex USING (l_linestatus)
        |ORDER BY l_linestatus""".stripMargin,
      oracle = """SELECT l_linestatus,
        |  (approx_quantile(l_quantity, 0.5)
        |     BETWEEN PERCENTILE_CONT(0.40) WITHIN GROUP (ORDER BY l_quantity)
        |         AND PERCENTILE_CONT(0.60) WITHIN GROUP (ORDER BY l_quantity)) AS median_in_band,
        |  (approx_quantile(l_extendedprice, 0.9)
        |     BETWEEN PERCENTILE_CONT(0.85) WITHIN GROUP (ORDER BY l_extendedprice)
        |         AND PERCENTILE_CONT(0.95) WITHIN GROUP (ORDER BY l_extendedprice)) AS p90_in_band
        |FROM lineitem
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin),

    // scale-exact quantiles: the selection-by-range-partition operator
    // (Stats.exactQuantiles — memory bounded by one partition, never
    // the column) against DuckDB's sort-based quantile_cont. Both
    // implement PERCENTILE_CONT's (n-1)q rank rule; round(·,6)
    // absorbs the engines' final-ulp interpolation differences.
    QueryDef(
      "q_stats_quantiles",
      """WITH v AS (
        |  SELECT quantile_cont(CAST(l_extendedprice AS DOUBLE),
        |    [0.01, 0.25, 0.5, 0.75, 0.99]) AS vs FROM lineitem),
        |u AS (
        |  SELECT CAST(unnest([0.01, 0.25, 0.5, 0.75, 0.99]) AS DOUBLE) AS q,
        |    unnest([1, 2, 3, 4, 5]) AS i)
        |SELECT u.q, round(v.vs[u.i], 6) AS value
        |FROM u, v ORDER BY u.q""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions._
      val li = graft.Tables.df(s, dir, "lineitem")
      val qs = Seq(0.01, 0.25, 0.5, 0.75, 0.99)
      val vals = graft.operators.Stats.exactQuantiles(
        li, "l_extendedprice", qs)
      import s.implicits._
      qs.zip(vals).toDF("q", "value")
        .select(col("q"), round(col("value"), 6).as("value"))
        .orderBy("q")
    },

    // grouped scale-exact quantiles: Stats.exactQuantilesBy — ONE
    // range shuffle + one selection pass covering ALL groups (the r6
    // implementation looped count+selection jobs per group), against
    // DuckDB's per-group quantile_cont. Same rank rule + round(·,6)
    // ulp absorption as q_stats_quantiles.
    QueryDef(
      "q_stats_quantiles_by",
      """WITH v AS (
        |  SELECT l_linestatus, quantile_cont(CAST(l_extendedprice AS DOUBLE),
        |    [0.01, 0.25, 0.5, 0.75, 0.99]) AS vs
        |  FROM lineitem GROUP BY l_linestatus),
        |u AS (
        |  SELECT CAST(unnest([0.01, 0.25, 0.5, 0.75, 0.99]) AS DOUBLE) AS q,
        |    unnest([1, 2, 3, 4, 5]) AS i)
        |SELECT v.l_linestatus, u.q, round(v.vs[u.i], 6) AS value
        |FROM u, v ORDER BY v.l_linestatus, u.q""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions._
      import s.implicits._
      val li = graft.Tables.df(s, dir, "lineitem")
      val qs = Seq(0.01, 0.25, 0.5, 0.75, 0.99)
      val by = graft.operators.Stats.exactQuantilesBy(
        li, "l_linestatus", "l_extendedprice", qs)
      // unnest the per-group quantile vector WITHOUT a driver collect:
      // posexplode pairs each value with its q by position
      val qlit = array(qs.map(lit): _*)
      by.select(col("l_linestatus"), posexplode(col("quantiles")))
        .select(col("l_linestatus"),
          element_at(qlit, col("pos").cast("int") + 1).as("q"),
          round(col("col"), 6).as("value"))
        .orderBy("l_linestatus", "q")
    },

    // string_agg with deterministic order + array_agg with order.
    // The ordered ARRAY_AGG is projected through ARRAY_TO_STRING on both
    // sides: the driver's pandas comparator cannot sort a raw array
    // column (unhashable ndarray), and the string rendering exercises
    // identical ordered-aggregation semantics. The raw-array variant
    // stays covered in AggregatesSpec.
    QueryDef(
      "q_agg_string_array",
      """SELECT r_regionkey,
        |  STRING_AGG(n_name, ',' ORDER BY n_name) AS nations,
        |  ARRAY_TO_STRING(ARRAY_AGG(n_nationkey ORDER BY n_nationkey), ',') AS nation_keys
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_regionkey
        |ORDER BY r_regionkey""".stripMargin) { (s, dir) =>
      val n = Tables.df(s, dir, "nation")
      val r = Tables.df(s, dir, "region")
      n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_regionkey")
        .agg(
          concat_ws(",", sort_array(collect_list(col("n_name")))).as("nations"),
          array_join(sort_array(collect_list(col("n_nationkey"))), ",").as("nation_keys"))
        .orderBy("r_regionkey")
    },

    // array_agg keeps NULL inputs (PG + DuckDB semantics; stock Spark
    // aliases it to collect_list which drops them — PgFunctions
    // re-registers the PG-faithful struct-wrapped form). n_kept ==
    // n_rows is the retention proof; the sorted values — rendered as a
    // comma-joined string with explicit 'NULL' markers so the judged
    // output schema stays scalar — pin the contents exactly (both
    // engines sort NULLS FIRST here, and the NULL→'NULL' mapping runs
    // after the numeric sort so ordering is engine-identical).
    QueryDef.sql(
      "q_agg_array_nulls",
      """SELECT c_nationkey,
        |  CAST(size(array_agg(nullif(c_mktsegment, 'BUILDING'))) AS BIGINT)
        |    AS n_kept,
        |  count(*) AS n_rows,
        |  array_join(transform(
        |      sort_array(array_agg(nullif(c_custkey % 5, 2))),
        |      x -> coalesce(CAST(x AS STRING), 'NULL')), ',') AS vals
        |FROM customer
        |WHERE c_custkey <= 100
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,
      oracle = """SELECT c_nationkey,
        |  CAST(len(array_agg(nullif(c_mktsegment, 'BUILDING'))) AS BIGINT)
        |    AS n_kept,
        |  count(*) AS n_rows,
        |  array_to_string(list_transform(
        |      list_sort(array_agg(nullif(c_custkey % 5, 2)),
        |        'ASC', 'NULLS FIRST'),
        |      x -> coalesce(CAST(x AS VARCHAR), 'NULL')), ',') AS vals
        |FROM customer
        |WHERE c_custkey <= 100
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin),

    // mode() — single clear winner per group in the fixture
    QueryDef.sql(
      "q_agg_mode",
      """SELECT l_returnflag, MODE(l_linestatus) AS top_status
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
      oracle =
        """SELECT l_returnflag, MODE(l_linestatus) AS top_status
          |FROM lineitem
          |GROUP BY l_returnflag
          |ORDER BY l_returnflag""".stripMargin),

    // GROUPING SETS + GROUPING() (§2.4; reference
    // test_grouping_set_pushdown.py)
    QueryDef.sql(
      "q_grouping_sets",
      """SELECT o_orderstatus, o_orderpriority,
        |  GROUPING(o_orderstatus) AS g_status,
        |  GROUPING(o_orderpriority) AS g_prio,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        |ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin),

    QueryDef.sql(
      "q_rollup",
      """SELECT r_name, n_name, COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin),

    QueryDef(
      "q_cube",
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.df(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },

    // DISTINCT ON equivalent: row_number()=1 per key (§2.4)
    QueryDef.sql(
      "q_distinct_on",
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin),

    // DISTINCT over multiple columns
    QueryDef(
      "q_distinct",
      """SELECT DISTINCT l_returnflag, l_linestatus
        |FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Tables.df(s, dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .dropDuplicates()
        .orderBy("l_returnflag", "l_linestatus")
    },

    // HAVING (pushed with the aggregate in the reference,
    // pg_lake_table.c:4805-5040)
    QueryDef(
      "q_having",
      """SELECT l_suppkey, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem
        |GROUP BY l_suppkey
        |HAVING COUNT(*) > 550 AND SUM(CAST(l_quantity AS DECIMAL(18,2))) > 14000
        |ORDER BY l_suppkey""".stripMargin) { (s, dir) =>
      Tables.df(s, dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("n"), sum(dec(col("l_quantity"))).as("qty_dec"))
        .filter(col("n") > 550 && col("qty_dec") > 14000)
        .select(col("l_suppkey"), col("n"), col("qty_dec").cast("double").as("qty"))
        .orderBy("l_suppkey")
    })
}
