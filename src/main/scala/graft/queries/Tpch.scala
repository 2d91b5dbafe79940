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

    // Q2: min-cost supplier — correlated scalar MIN over a 5-way join,
    // re-joined (adapted: no partsupp, so "cost" is the unit price a
    // supplier actually charged on lineitem; division is per-row IEEE,
    // identical in both engines, so the MIN-equality is exact)
    QueryDef.sql(
      "q_tpch2",
      """SELECT DISTINCT s.s_acctbal, s.s_name, n.n_name, p.p_partkey,
        |  p.p_name
        |FROM part p
        |  JOIN lineitem l ON p.p_partkey = l.l_partkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE p.p_size = 15 AND r.r_name = 'EUROPE'
        |  AND l.l_extendedprice / l.l_quantity = (
        |    SELECT min(l2.l_extendedprice / l2.l_quantity)
        |    FROM lineitem l2
        |      JOIN supplier s2 ON l2.l_suppkey = s2.s_suppkey
        |      JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        |      JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        |    WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin),

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

    // Q7: volume shipping between two nations — double nation join with
    // a symmetric OR pair filter, year extraction, group
    QueryDef.sql(
      "q_tpch7",
      s"""SELECT supp_nation, cust_nation, l_year,
         |  CAST(SUM(volume) AS DOUBLE) AS revenue
         |FROM (
         |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |    CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
         |    $rev AS volume
         |  FROM supplier
         |    JOIN lineitem ON s_suppkey = l_suppkey
         |    JOIN orders ON o_orderkey = l_orderkey
         |    JOIN customer ON c_custkey = o_custkey
         |    JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |    JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
         |    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
         |      AND TIMESTAMP '1997-12-31'
         |) shipping
         |GROUP BY supp_nation, cust_nation, l_year
         |ORDER BY supp_nation, cust_nation, l_year""".stripMargin),

    // Q8: national market share — 8-way join, conditional share ratio
    QueryDef.sql(
      "q_tpch8",
      s"""SELECT o_year,
         |  CAST(CAST(SUM(CASE WHEN nation = 'NATION_2' THEN volume
         |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         |    / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
         |FROM (
         |  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
         |    $rev AS volume, n2.n_name AS nation
         |  FROM part
         |    JOIN lineitem ON p_partkey = l_partkey
         |    JOIN supplier ON s_suppkey = l_suppkey
         |    JOIN orders ON l_orderkey = o_orderkey
         |    JOIN customer ON o_custkey = c_custkey
         |    JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |    JOIN region ON n1.n_regionkey = r_regionkey
         |    JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
         |    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
         |      AND TIMESTAMP '1997-12-31'
         |) all_nations
         |GROUP BY o_year
         |ORDER BY o_year""".stripMargin),

    // Q9: product-type profit — 5-way join, profit expression per line
    // (adapted: no ps_supplycost, cost modeled as 0.4 × retail × qty;
    // all factors cast to DECIMAL so the sum is exact in both engines)
    QueryDef.sql(
      "q_tpch9",
      s"""SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
         |FROM (
         |  SELECT n_name AS nation,
         |    CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
         |    $rev - CAST(p_retailprice AS DECIMAL(18,2))
         |      * CAST(l_quantity AS DECIMAL(18,2))
         |      * CAST(0.4 AS DECIMAL(2,1)) AS amount
         |  FROM part
         |    JOIN lineitem ON p_partkey = l_partkey
         |    JOIN supplier ON s_suppkey = l_suppkey
         |    JOIN orders ON l_orderkey = o_orderkey
         |    JOIN nation ON s_nationkey = n_nationkey
         |  WHERE p_name LIKE '%gear%'
         |) profit
         |GROUP BY nation, o_year
         |ORDER BY nation, o_year DESC""".stripMargin),

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

    // Q11: important stock — group + HAVING against a scalar subquery
    // share of the global total (adapted: no partsupp, value is what the
    // nation's suppliers actually shipped per part)
    QueryDef.sql(
      "q_tpch11",
      """SELECT l_partkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS value
        |FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_3'
        |GROUP BY l_partkey
        |HAVING SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * CAST(l_quantity AS DECIMAL(18,2)))
        |  > (SELECT SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |        * CAST(l_quantity AS DECIMAL(18,2)))
        |        * CAST(0.001 AS DECIMAL(4,3))
        |     FROM lineitem
        |       JOIN supplier ON l_suppkey = s_suppkey
        |       JOIN nation ON s_nationkey = n_nationkey
        |     WHERE n_name = 'NATION_3')
        |ORDER BY value DESC, l_partkey""".stripMargin),

    // Q12: shipping-mode priority classes — CASE-sum pivot over a join
    // (adapted: no l_shipmode/commit/receipt dates; "late" = shipped
    // more than 30 days after the order date, pivoted on linestatus)
    QueryDef.sql(
      "q_tpch12",
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL '30' DAY
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin),

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

    // Q15: top supplier — CTE revenue view + scalar MAX equality (the
    // DECIMAL sum makes the MAX comparison exact in both engines)
    QueryDef.sql(
      "q_tpch15",
      s"""WITH revenue0 AS (
         |  SELECT l_suppkey AS supplier_no, SUM($rev) AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate < TIMESTAMP '1996-04-01'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name,
         |  CAST(total_revenue AS DOUBLE) AS total_revenue
         |FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
         |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
         |ORDER BY s_suppkey""".stripMargin),

    // Q16: parts/supplier relationship — count(DISTINCT) + NOT IN
    // anti-join (adapted: "complaints" = suppliers with negative balance)
    QueryDef.sql(
      "q_tpch16",
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 7, 10, 15, 23, 45, 49)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin),

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
    QueryDef(
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
        |LIMIT 100""".stripMargin) { (s, dir) =>
      // DataFrame plan for the same semantics (oracle SQL above is
      // unchanged). The SQL plan evaluated the HAVING subquery as TWO
      // broadcast semi-joins — one on orders, one (redundantly, via
      // predicate inference) on lineitem — each with its own
      // scan-fused single-task partial aggregation of lineitem. Here:
      // the qualifying set is computed ONCE (an RR spread of the
      // partial agg was probed and REJECTED: 7.9 CPU-s/0.5 s GC across
      // 32 tasks vs 1.1 CPU-s fused — concurrent decimal-agg hash maps
      // thrash), and since IN-qualifying orders are by construction a
      // tiny set (sum(qty) > 150 per order), qualifying orders join
      // customer and BROADCAST into one probe pass over lineitem — the
      // big side is never shuffled and never probed twice.
      import org.apache.spark.sql.functions._
      val l = graft.Tables.df(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"))
      // plain double SUM: every l_quantity is an integer in [1,50] and
      // per-order sums stay far below 2^53, so the double sum is EXACT
      // under any accumulation order — identical to the decimal-cast
      // sum the oracle computes, without per-row Decimal allocation
      val qual = l
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity")).as("__sq"))
        .filter(col("__sq") > 150)
        .select(col("l_orderkey").as("__qk"))
      val o = graft.Tables.df(s, dir, "orders")
        .join(broadcast(qual), col("o_orderkey") === col("__qk"), "left_semi")
      val oc = o.join(graft.Tables.df(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"))
      l.join(broadcast(oc), col("l_orderkey") === col("o_orderkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate",
          "o_totalprice")
        .agg(sum(col("l_quantity").cast("decimal(18,2)"))
          .cast("double").as("sum_qty"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"),
          col("o_totalprice").cast("double").as("o_totalprice"),
          col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    // Q19: discounted revenue — disjunction of conjunctive brand/size/
    // quantity ranges (adapted: p_container → p_size ranges)
    QueryDef.sql(
      "q_tpch19",
      s"""SELECT CAST(SUM($rev) AS DOUBLE) AS revenue
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
         |    AND l_quantity >= 1 AND l_quantity <= 11)
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
         |    AND l_quantity >= 10 AND l_quantity <= 20)
         |   OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 35
         |    AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin),

    // Q20: potential part promotion — nested IN over a grouped HAVING
    // subquery (adapted: no partsupp availqty, threshold on shipped qty)
    QueryDef.sql(
      "q_tpch20",
      """SELECT s_suppkey, s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_4'
        |  AND s_suppkey IN (
        |    SELECT l_suppkey
        |    FROM lineitem JOIN part ON l_partkey = p_partkey
        |    WHERE p_name LIKE 'small%'
        |      AND l_shipdate >= TIMESTAMP '1996-01-01'
        |      AND l_shipdate < TIMESTAMP '1997-01-01'
        |    GROUP BY l_suppkey
        |    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 100)
        |ORDER BY s_name, s_suppkey""".stripMargin),

    // Q21: suppliers who kept orders waiting — EXISTS + NOT EXISTS over
    // the same fact table with outer-column correlation (adapted: late =
    // shipped >45 days after order date)
    QueryDef.sql(
      "q_tpch21",
      """SELECT s_name, count(*) AS numwait
        |FROM supplier
        |  JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |  JOIN orders ON o_orderkey = l1.l_orderkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F'
        |  AND n_name = 'NATION_0'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL '45' DAY
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o_orderdate + INTERVAL '45' DAY)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin),

    // Q22: global sales opportunity — scalar-subquery threshold + anti-
    // join (adapted: no c_phone, country code = nationkey; the average-
    // balance comparison is cross-multiplied into DECIMAL×COUNT > SUM so
    // both engines compare exactly, with no double-division drift)
    QueryDef.sql(
      "q_tpch22",
      """SELECT cntrycode, count(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    AS totacctbal
        |FROM (
        |  SELECT CAST(c_nationkey AS INT) AS cntrycode, c_acctbal,
        |    c_custkey
        |  FROM customer
        |  WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
        |    AND CAST(c_acctbal AS DECIMAL(18,2))
        |        * (SELECT count(*) FROM customer
        |           WHERE c_acctbal > 0.0
        |             AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
        |      > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2)))
        |         FROM customer
        |         WHERE c_acctbal > 0.0
        |           AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
        |    AND NOT EXISTS (SELECT 1 FROM orders
        |                    WHERE o_custkey = c_custkey
        |                      AND o_orderdate >= TIMESTAMP '1999-01-01')
        |) custsale
        |GROUP BY cntrycode
        |ORDER BY cntrycode""".stripMargin))
}
