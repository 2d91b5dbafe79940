package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function surface (SURVEY.md §2.5; reference shippable window
  * list shippable_builtin_functions.c:388-401 and frame tests
  * test_window_function_pushdown.py). Window ORDER BY keys are unique
  * within each partition wherever ties would make results
  * nondeterministic (row_number, ntile, lag/lead).
  */
object Windows {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  val defs: Seq[QueryDef] = Seq(

    // ranking family over a partition
    QueryDef(
      "q_window_rank",
      """SELECT o_custkey, o_orderkey,
        |  RANK()         OVER w AS rnk,
        |  DENSE_RANK()   OVER w AS drnk,
        |  ROW_NUMBER()   OVER w AS rn,
        |  ROUND(PERCENT_RANK() OVER w, 8) AS prnk,
        |  ROUND(CUME_DIST()    OVER w, 8) AS cd,
        |  NTILE(4)       OVER w AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.df(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          row_number().over(w).as("rn"),
          round(percent_rank().over(w), 8).as("prnk"),
          round(cume_dist().over(w), 8).as("cd"),
          ntile(4).over(w).as("quartile"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // lag / lead (1- and 3-arg), first_value / last_value / nth_value
    QueryDef(
      "q_window_offset",
      """SELECT user_id, event_id,
        |  LAG(event_type) OVER w AS prev_type,
        |  LEAD(event_type) OVER w AS next_type,
        |  LAG(value, 2, -1.0) OVER w AS lag2,
        |  FIRST_VALUE(event_id) OVER w AS first_ev,
        |  LAST_VALUE(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ev,
        |  NTH_VALUE(event_id, 3) OVER w AS third_ev
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.df(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          lag(col("event_type"), 1).over(w).as("prev_type"),
          lead(col("event_type"), 1).over(w).as("next_type"),
          lag(col("value"), 2, -1.0).over(w).as("lag2"),
          first(col("event_id")).over(w).as("first_ev"),
          last(col("event_id")).over(wFull).as("last_ev"),
          nth_value(col("event_id"), 3).over(w).as("third_ev"))
        .orderBy("user_id", "event_id")
    },

    // ROWS frame: running + sliding aggregates (exact decimal sums)
    QueryDef(
      "q_window_rows_frame",
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER
        |    (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER
        |    (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        |     ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING) AS DOUBLE) AS sliding_qty,
        |  COUNT(*) OVER
        |    (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        |     ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING) AS sliding_n
        |FROM lineitem
        |WHERE l_suppkey <= 20
        |ORDER BY l_suppkey, l_orderkey, l_linenumber, l_quantity, l_shipdate""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      Tables.df(s, dir, "lineitem")
        .filter(col("l_suppkey") <= 20)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          sum(dec(col("l_quantity")))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_qty"),
          sum(dec(col("l_quantity")))
            .over(w.rowsBetween(-2, 1)).cast("double").as("sliding_qty"),
          count(lit(1)).over(w.rowsBetween(-2, 1)).as("sliding_n"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
    },

    // RANGE frame over a numeric key
    QueryDef(
      "q_window_range_frame",
      """SELECT o_orderkey, o_totalprice,
        |  COUNT(*) OVER
        |    (ORDER BY o_totalprice RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) AS n_near,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
        |    (ORDER BY o_totalprice RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_near
        |FROM orders
        |WHERE o_custkey <= 30
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.orderBy(col("o_totalprice"))
      Tables.df(s, dir, "orders")
        .filter(col("o_custkey") <= 30)
        .select(col("o_orderkey"), col("o_totalprice"),
          count(lit(1)).over(w.rangeBetween(-1000, 1000)).as("n_near"),
          sum(dec(col("o_totalprice")))
            .over(w.rangeBetween(-1000, Window.currentRow))
            .cast("double").as("cum_near"))
        .orderBy("o_orderkey")
    },

    // GROUPS frames (SURVEY §2.5): the third SQL-standard frame mode —
    // PG ships it, Spark has only ROWS and RANGE. A GROUPS frame with
    // offsets (p, f) contains exactly the rows whose peer-group INDEX
    // lies in [g−p, g+f], and dense_rank() IS the peer-group index —
    // so GROUPS over `ORDER BY k` is a RANGE frame over dense_rank(k)
    // with the same offsets, exactly (including the peer-aligned
    // CURRENT ROW bound). The GROUPS ≡ dense-rank-RANGE identity is
    // pinned against hand-computed GROUPS truth in
    // WindowGroupsSpec (this DuckDB build's parser lacks GROUPS, so
    // the oracle differentials the same dense-rank formulation).
    QueryDef(
      "q_window_groups_frame",
      """WITH t AS (SELECT o_orderkey, o_totalprice, o_custkey % 8 AS grp,
        |             CAST(date_trunc('month', o_orderdate) AS DATE) AS mon
        |           FROM orders WHERE o_custkey <= 120),
        |d AS (SELECT *, dense_rank() OVER
        |        (PARTITION BY grp ORDER BY mon) AS dr FROM t)
        |SELECT o_orderkey, grp, mon,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
        |    (PARTITION BY grp ORDER BY dr
        |     RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS g_sum,
        |  COUNT(*) OVER
        |    (PARTITION BY grp ORDER BY dr
        |     RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS g_cnt
        |FROM d
        |ORDER BY grp, o_orderkey""".stripMargin) { (s, dir) =>
      val base = Tables.df(s, dir, "orders")
        .filter(col("o_custkey") <= 120)
        .select(col("o_orderkey"), col("o_totalprice"),
          (col("o_custkey") % 8).as("grp"),
          date_trunc("month", col("o_orderdate")).cast("date").as("mon"))
      val withDr = base.withColumn("dr",
        dense_rank().over(Window.partitionBy("grp").orderBy("mon")))
      val wg = Window.partitionBy("grp").orderBy("dr")
      withDr.select(col("o_orderkey"), col("grp"), col("mon"),
        sum(dec(col("o_totalprice")))
          .over(wg.rangeBetween(-2, Window.currentRow))
          .cast("double").as("g_sum"),
        count(lit(1)).over(wg.rangeBetween(-1, 1)).as("g_cnt"))
        .orderBy("grp", "o_orderkey")
    },

    // frame EXCLUDE CURRENT ROW / GROUP / TIES (SURVEY §2.5; reference
    // ships these via DuckDB, test_window_function_pushdown.py). Spark has
    // no EXCLUDE clause, so we emulate it compositionally. The emulation
    // is exact for RANGE frames because a RANGE frame always contains the
    // current row's full peer group (frame bounds in RANGE mode are peer-
    // group-aligned), hence:
    //   EXCLUDE CURRENT ROW = frame_agg - current_value
    //   EXCLUDE GROUP       = frame_agg - peer_group_agg
    //   EXCLUDE TIES        = frame_agg - peer_group_agg + current_value
    // with count guards reproducing SUM's NULL-on-empty-frame semantics.
    // For ROWS frames the identity holds when the ordering key is unique
    // (peer group == current row), which the rows_ex_* columns use.
    // The DuckDB oracle runs the native EXCLUDE syntax — a true
    // differential of the emulation against a reference implementation.
    QueryDef(
      "q_window_exclude",
      """SELECT l_orderkey, l_linenumber, l_partkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) OVER
        |    (PARTITION BY l_returnflag ORDER BY l_quantity
        |     RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE CURRENT ROW) AS DOUBLE) AS ex_cur_sum,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) OVER
        |    (PARTITION BY l_returnflag ORDER BY l_quantity
        |     RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP) AS DOUBLE) AS ex_grp_sum,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) OVER
        |    (PARTITION BY l_returnflag ORDER BY l_quantity
        |     RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE TIES) AS DOUBLE) AS ex_ties_sum,
        |  COUNT(*) OVER
        |    (PARTITION BY l_returnflag ORDER BY l_quantity
        |     RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE CURRENT ROW) AS ex_cur_n,
        |  COUNT(*) OVER
        |    (PARTITION BY l_returnflag ORDER BY l_quantity
        |     RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP) AS ex_grp_n,
        |  COUNT(*) OVER
        |    (PARTITION BY l_returnflag ORDER BY l_quantity
        |     RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE TIES) AS ex_ties_n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) OVER
        |    (PARTITION BY l_returnflag ORDER BY l_quantity, l_orderkey, l_linenumber, l_partkey
        |     ROWS BETWEEN 3 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) AS DOUBLE) AS rows_ex_cur_sum
        |FROM lineitem
        |WHERE l_suppkey <= 10
        |ORDER BY l_orderkey, l_linenumber, l_partkey""".stripMargin) { (s, dir) =>
      val price = col("l_extendedprice").cast("decimal(18,2)")
      val wR = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
        .rangeBetween(-2, 2)
      val wPeer = Window.partitionBy(col("l_returnflag"), col("l_quantity"))
      val wRows = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity"), col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"))
        .rowsBetween(-3, 1)
      val frameSum = sum(price).over(wR)
      val frameN   = count(lit(1)).over(wR)
      val peerSum  = sum(price).over(wPeer)
      val peerN    = count(lit(1)).over(wPeer)
      val rowsSum  = sum(price).over(wRows)
      val rowsN    = count(lit(1)).over(wRows)
      Tables.df(s, dir, "lineitem")
        .filter(col("l_suppkey") <= 10)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          when(frameN > 1, frameSum - price).cast("double").as("ex_cur_sum"),
          when(frameN > peerN, frameSum - peerSum).cast("double").as("ex_grp_sum"),
          (frameSum - peerSum + price).cast("double").as("ex_ties_sum"),
          (frameN - 1).as("ex_cur_n"),
          (frameN - peerN).as("ex_grp_n"),
          (frameN - peerN + 1).as("ex_ties_n"),
          when(rowsN > 1, rowsSum - price).cast("double").as("rows_ex_cur_sum"))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey")
    },

    // aggregate-as-window + FILTER-equivalent (sum(CASE WHEN)) + window
    // over the result of a group-by (window-over-agg composition)
    QueryDef(
      "q_window_over_agg",
      """SELECT l_suppkey, n_lines,
        |  CAST(SUM(CAST(qty AS DECIMAL(28,2))) OVER
        |    (ORDER BY l_suppkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_qty,
        |  CAST(SUM(CASE WHEN n_lines > 550 THEN CAST(qty AS DECIMAL(28,2)) END) OVER
        |    (ORDER BY l_suppkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_big_qty
        |FROM (
        |  SELECT l_suppkey, COUNT(*) AS n_lines,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |  FROM lineitem GROUP BY l_suppkey) t
        |ORDER BY l_suppkey""".stripMargin) { (s, dir) =>
      val agg = Tables.df(s, dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("n_lines"),
          sum(dec(col("l_quantity"))).cast("double").as("qty"))
      val w = Window.orderBy(col("l_suppkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      agg.select(col("l_suppkey"), col("n_lines"),
          sum(col("qty").cast("decimal(28,2)")).over(w).cast("double").as("cum_qty"),
          sum(when(col("n_lines") > 550, col("qty").cast("decimal(28,2)")))
            .over(w).cast("double").as("cum_big_qty"))
        .orderBy("l_suppkey")
    },

    // gap-based sessionization (streaming.Sessionize batch formulation:
    // lag -> new-session flag -> running sum -> group; the streaming
    // flatMapGroupsWithState twin is proven equal in SessionizeSpec)
    QueryDef(
      "q_sessionize",
      """WITH marked AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |      THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
        |  FROM marked)
        |SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
        |  MIN(ts) AS session_start, MAX(ts) AS session_end,
        |  COUNT(*) AS n_events
        |FROM sess GROUP BY user_id, session_no
        |ORDER BY user_id, session_no""".stripMargin) { (s, dir) =>
      graft.streaming.Sessionize
        .batch(Tables.df(s, dir, "events"), "user_id", "ts", "event_id", 30)
        .select(col("user_id"),
          col("session_no").cast("bigint").as("session_no"),
          col("session_start"), col("session_end"), col("n_events"))
        .orderBy("user_id", "session_no")
    })
}
