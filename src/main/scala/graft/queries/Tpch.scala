package graft.queries

import graft.QueryDef

/** TPC-H query suite adapted to the fixture star schema (SURVEY.md §5
  * test plan item c; the reference ships the same suite as its primary
  * benchmark — pg_lake_benchmark/src/tpch.c). The fixtures carry the
  * TPC-H core columns but not every attribute (no partsupp, no
  * commit/receipt dates, no comments/phones), so queries needing those
  * are adapted to equivalent plan SHAPES on available columns; Q1 is
  * `q1_agg`. Filter constants are tuned to the fixture domains
  * (dates 1995–2001, segments/priorities/brands as generated).
  *
  * Determinism contract (same as everywhere): money aggregates cast
  * per-row to DECIMAL before SUM (exact, engine-independent), final
  * values cast back to DOUBLE; every ORDER BY ends in a unique key.
  * Each query is one SQL text that parses identically in Spark and
  * DuckDB — the whole suite is oracle-differential.
  */
object Tpch {

  private val rev =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"

  val defs: Seq[QueryDef] = Seq(

    // Q3: shipping-priority — 3-way join, group, top-k by revenue
    QueryDef.sql(
      "q_tpch3",
      s"""SELECT o_orderkey, CAST(SUM($rev) AS DOUBLE) AS revenue, o_orderdate
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |  JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '2000-03-15'
         |  AND l_shipdate > TIMESTAMP '2000-03-15'
         |GROUP BY o_orderkey, o_orderdate
         |ORDER BY revenue DESC, o_orderkey
         |LIMIT 10""".stripMargin),

    // Q4: order-priority checking — EXISTS semi-join (adapted: late
    // shipment = shipped after order date + 60 days)
    QueryDef.sql(
      "q_tpch4",
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL '60' DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin),

    // Q5: local-supplier volume — 6-way star join through region
    QueryDef.sql(
      "q_tpch5",
      s"""SELECT n_name, CAST(SUM($rev) AS DOUBLE) AS revenue
         |FROM customer
         |  JOIN orders ON c_custkey = o_custkey
         |  JOIN lineitem ON l_orderkey = o_orderkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin),

    // Q6: forecasting revenue change — pure scan-filter-agg
    QueryDef.sql(
      "q_tpch6",
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |  CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin),

    // Q10: returned-item reporting — group by customer over returns
    QueryDef.sql(
      "q_tpch10",
      s"""SELECT c_custkey, c_name, CAST(SUM($rev) AS DOUBLE) AS revenue,
         |  n_name
         |FROM customer
         |  JOIN orders ON c_custkey = o_custkey
         |  JOIN lineitem ON l_orderkey = o_orderkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1996-07-01'
         |GROUP BY c_custkey, c_name, n_name
         |ORDER BY revenue DESC, c_custkey
         |LIMIT 20""".stripMargin),

    // Q13: customer order-count distribution — outer join + double agg
    QueryDef.sql(
      "q_tpch13",
      """SELECT c_count, count(*) AS custdist
        |FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey
        |) c_orders
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin),

    // Q14: promotion effect — conditional ratio aggregate
    QueryDef.sql(
      "q_tpch14",
      s"""SELECT CAST(100.00 * CAST(SUM(CASE WHEN p_type = 'PROMO'
         |    THEN $rev ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         |  / CAST(SUM($rev) AS DOUBLE) AS DOUBLE) AS promo_revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1996-02-01'""".stripMargin),

    // Q17: small-quantity-order revenue — correlated per-part average
    QueryDef.sql(
      "q_tpch17",
      """SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |    AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#13'
        |  AND l_quantity < (
        |    SELECT 0.5 * avg(l_quantity) FROM lineitem
        |    WHERE l_partkey = p_partkey)""".stripMargin),

    // Q18: large-volume customers — HAVING subquery + 3-way join
    QueryDef.sql(
      "q_tpch18",
      """SELECT c_custkey, c_name, o_orderkey, o_orderdate,
        |  CAST(o_totalprice AS DOUBLE) AS o_totalprice,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM customer
        |  JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150)
        |GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin))
}
