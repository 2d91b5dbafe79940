package graft.queries

import graft.QueryDef
import scala.util.Random

/** Generated expression-fuzz differential — the reference's own test
  * philosophy (differential execution, comparisons.py) scaled past
  * hand-curated cases: a seeded grammar emits a few hundred random
  * integer expressions over the nation table, rendered as ONE SQL text
  * both engines parse, so every operator combination in the grammar is
  * proven value-equal against the oracle. The grammar is closed over
  * BIGINT (leaves cast up, literals small, depth bounded) so no
  * overflow/widening/dialect edge can differ:
  *
  *   leaf   := CAST(col AS BIGINT) | 0..9
  *   unary  := abs(e) | (- e)
  *   binary := e + e | e - e | e * e | e % (1 + abs(e))
  *   cond   := CASE WHEN e < e THEN e ELSE e END
  *   misc   := greatest(e, e) | least(e, e) | coalesce(nullif(e, e), e)
  *
  * Changing the seed or count regenerates a different (still
  * deterministic) matrix; a cross-engine semantics break in ANY of the
  * grammar's operators shows up as a hash mismatch on this query.
  */
object Fuzz {

  private val Seed = 20260812
  private val NumExprs = 160
  private val MaxDepth = 4

  private val NationLeaves: Seq[Random => String] = Seq(
    _ => "CAST(n_nationkey AS BIGINT)",
    _ => "CAST(n_regionkey AS BIGINT)",
    rnd => rnd.nextInt(10).toString)

  private def gen(rnd: Random, depth: Int,
      leaves: Seq[Random => String] = NationLeaves): String = {
    if (depth >= MaxDepth) leaves(rnd.nextInt(leaves.size))(rnd)
    else rnd.nextInt(10) match {
      case 0 | 1 => leaves(rnd.nextInt(leaves.size))(rnd)
      case 2 => s"abs(${gen(rnd, depth + 1, leaves)})"
      case 3 => s"(- ${gen(rnd, depth + 1, leaves)})"
      case 4 => s"(${gen(rnd, depth + 1, leaves)} + ${gen(rnd, depth + 1, leaves)})"
      case 5 => s"(${gen(rnd, depth + 1, leaves)} - ${gen(rnd, depth + 1, leaves)})"
      case 6 => s"(${gen(rnd, depth + 1, leaves)} * ${gen(rnd, depth + 1, leaves)})"
      case 7 =>
        s"(${gen(rnd, depth + 1, leaves)} % (1 + abs(${gen(rnd, depth + 1, leaves)})))"
      case 8 =>
        s"(CASE WHEN ${gen(rnd, depth + 1, leaves)} < ${gen(rnd, depth + 1, leaves)} " +
          s"THEN ${gen(rnd, depth + 1, leaves)} ELSE ${gen(rnd, depth + 1, leaves)} END)"
      case 9 => rnd.nextInt(3) match {
        case 0 => s"greatest(${gen(rnd, depth + 1, leaves)}, ${gen(rnd, depth + 1, leaves)})"
        case 1 => s"least(${gen(rnd, depth + 1, leaves)}, ${gen(rnd, depth + 1, leaves)})"
        case 2 =>
          s"coalesce(nullif(${gen(rnd, depth + 1, leaves)}, ${gen(rnd, depth + 1, leaves)}), " +
            s"${gen(rnd, depth + 1, leaves)})"
      }
    }
  }

  /** Double grammar: every op is IEEE-correctly-rounded in both
    * engines (+ - * / sqrt), literals are exactly representable, the
    * divisor guard keeps denominators ≥ 1 and sqrt sees abs — no NaN,
    * no infinity, no rounding divergence anywhere in the tree. Two
    * edges the first fuzz run CAUGHT and the grammar now sidesteps:
    * bare decimal literals parse as DECIMAL in both engines but their
    * decimal-division scale rules differ (7th-decimal drift), so every
    * literal is cast to DOUBLE; and least/greatest break the IEEE
    * +0.0 = -0.0 tie differently, so the emitted column adds +0.0 to
    * normalize zero signs identically.
    */
  private def genD(rnd: Random, depth: Int): String = {
    val leaves = Seq(
      () => "CAST(n_nationkey AS DOUBLE)",
      () => "CAST(n_regionkey AS DOUBLE)",
      () => s"CAST(${Seq("0.5", "2.0", "3.25", "1.0", "7.5")(
        rnd.nextInt(5))} AS DOUBLE)")
    if (depth >= MaxDepth) leaves(rnd.nextInt(leaves.size))()
    else rnd.nextInt(10) match {
      case 0 | 1 => leaves(rnd.nextInt(leaves.size))()
      case 2 => s"abs(${genD(rnd, depth + 1)})"
      case 3 => s"sqrt(abs(${genD(rnd, depth + 1)}))"
      case 4 => s"(${genD(rnd, depth + 1)} + ${genD(rnd, depth + 1)})"
      case 5 => s"(${genD(rnd, depth + 1)} - ${genD(rnd, depth + 1)})"
      case 6 => s"(${genD(rnd, depth + 1)} * ${genD(rnd, depth + 1)})"
      case 7 =>
        s"(${genD(rnd, depth + 1)} / " +
          s"(CAST(1.0 AS DOUBLE) + abs(${genD(rnd, depth + 1)})))"
      case 8 =>
        s"(CASE WHEN ${genD(rnd, depth + 1)} < ${genD(rnd, depth + 1)} " +
          s"THEN ${genD(rnd, depth + 1)} ELSE ${genD(rnd, depth + 1)} END)"
      case 9 =>
        if (rnd.nextBoolean())
          s"greatest(${genD(rnd, depth + 1)}, ${genD(rnd, depth + 1)})"
        else s"least(${genD(rnd, depth + 1)}, ${genD(rnd, depth + 1)})"
    }
  }

  /** String grammar over the portable subset (1-based substr with
    * positive literal bounds, ASCII case ops, concat — semantics
    * identical in PG/DuckDB/Spark).
    */
  private def genS(rnd: Random, depth: Int): String = {
    val leaves = Seq(
      () => "n_name",
      () => s"'${Seq("ab", "xyz", "Q", "mn0")(rnd.nextInt(4))}'")
    if (depth >= 3) leaves(rnd.nextInt(leaves.size))()
    else rnd.nextInt(8) match {
      case 0 | 1 => leaves(rnd.nextInt(leaves.size))()
      case 2 => s"upper(${genS(rnd, depth + 1)})"
      case 3 => s"lower(${genS(rnd, depth + 1)})"
      case 4 => s"reverse(${genS(rnd, depth + 1)})"
      case 5 => s"trim(${genS(rnd, depth + 1)})"
      case 6 => s"substr(${genS(rnd, depth + 1)}, ${1 + rnd.nextInt(3)}, " +
        s"${1 + rnd.nextInt(5)})"
      case 7 => s"concat(${genS(rnd, depth + 1)}, ${genS(rnd, depth + 1)})"
    }
  }

  /** Timestamp grammar: date_trunc fields, interval day/hour
    * arithmetic, comparisons — the temporal subset whose semantics the
    * three engines share exactly (no months arithmetic: end-of-month
    * clamping rules diverge).
    */
  private def genT(rnd: Random, depth: Int): String = {
    val leaves = Seq(
      () => "o_orderdate",
      () => "TIMESTAMP '1997-06-15 12:30:00'",
      () => "TIMESTAMP '1999-01-02 03:04:05'")
    if (depth >= 3) leaves(rnd.nextInt(leaves.size))()
    else rnd.nextInt(8) match {
      case 0 | 1 => leaves(rnd.nextInt(leaves.size))()
      // cast: DuckDB's date_trunc returns DATE for day-or-coarser
      // fields where Spark returns TIMESTAMP
      case 2 => s"CAST(date_trunc('${Seq("year", "month", "day", "hour")(
        rnd.nextInt(4))}', ${genT(rnd, depth + 1)}) AS TIMESTAMP)"
      case 3 => s"(${genT(rnd, depth + 1)} + INTERVAL ${1 + rnd.nextInt(40)} DAY)"
      case 4 => s"(${genT(rnd, depth + 1)} - INTERVAL ${1 + rnd.nextInt(20)} HOUR)"
      case 5 => s"greatest(${genT(rnd, depth + 1)}, ${genT(rnd, depth + 1)})"
      case 6 => s"least(${genT(rnd, depth + 1)}, ${genT(rnd, depth + 1)})"
      case 7 =>
        s"(CASE WHEN ${genT(rnd, depth + 1)} < ${genT(rnd, depth + 1)} " +
          s"THEN ${genT(rnd, depth + 1)} ELSE ${genT(rnd, depth + 1)} END)"
    }
  }

  val defs: Seq[QueryDef] = {
    val rnd = new Random(Seed)
    val cols = (0 until NumExprs)
      .map(i => s"  ${gen(rnd, 0)} AS e$i")
      .mkString(",\n")
    val rndD = new Random(Seed + 1)
    val colsD = (0 until NumExprs)
      .map(i => s"  (${genD(rndD, 0)} + CAST(0.0 AS DOUBLE)) AS d$i")
      .mkString(",\n")
    Seq(
      QueryDef.sql(
        "q_fn_fuzz_int",
        s"""SELECT n_nationkey,
           |$cols
           |FROM nation
           |ORDER BY n_nationkey""".stripMargin),
      QueryDef.sql(
        "q_fn_fuzz_double",
        s"""SELECT n_nationkey,
           |$colsD
           |FROM nation
           |ORDER BY n_nationkey""".stripMargin),
      QueryDef.sql(
        "q_fn_fuzz_string", {
          val rndS = new Random(Seed + 2)
          val colsS = (0 until NumExprs)
            .map(i => s"  ${genS(rndS, 0)} AS s$i")
            .mkString(",\n")
          s"""SELECT n_nationkey,
             |$colsS
             |FROM nation
             |ORDER BY n_nationkey""".stripMargin
        }),
      QueryDef.sql(
        "q_fn_fuzz_agg", {
          // aggregate semantics over the int grammar: exact BIGINT
          // sums, min/max, counts, bool aggregates of generated
          // comparisons — grouped, so partial-aggregation planning is
          // also under differential test
          val rndA = new Random(Seed + 4)
          val aggs = (0 until 60).map { i =>
            val e = gen(rndA, 1)
            rndA.nextInt(6) match {
              // CAST: DuckDB sum(BIGINT) widens to HUGEINT (a no-op
              // cast on Spark); values are bounded far below 2^63
              case 0 => s"  CAST(sum($e) AS BIGINT) AS a$i"
              case 1 => s"  min($e) AS a$i"
              case 2 => s"  max($e) AS a$i"
              case 3 => s"  count($e) AS a$i"
              case 4 => s"  bool_and($e < ${gen(rndA, 1)}) AS a$i"
              case 5 => s"  bool_or($e > ${gen(rndA, 1)}) AS a$i"
            }
          }.mkString(",\n")
          s"""SELECT n_regionkey,
             |$aggs,
             |  count(*) AS a_rows
             |FROM nation
             |GROUP BY n_regionkey
             |ORDER BY n_regionkey""".stripMargin
        }),
      QueryDef.sql(
        "q_fn_fuzz_window", {
          // window semantics over the int grammar: ranking with a
          // total order (unique-key tiebreak), offsets with defaults,
          // frame aggregates — partitioned and global
          val rndW = new Random(Seed + 5)
          val wins = (0 until 40).map { i =>
            val e = gen(rndW, 1)
            val part = if (rndW.nextBoolean()) "PARTITION BY n_regionkey " else ""
            rndW.nextInt(6) match {
              case 0 => s"  row_number() OVER (${part}ORDER BY $e, n_nationkey) AS w$i"
              case 1 => s"  rank() OVER (${part}ORDER BY $e, n_nationkey) AS w$i"
              case 2 => s"  dense_rank() OVER (${part}ORDER BY $e) AS w$i"
              case 3 => s"  lag($e, 1, -1) OVER (${part}ORDER BY n_nationkey) AS w$i"
              case 4 => s"  lead($e, ${1 + rndW.nextInt(2)}, 0) " +
                s"OVER (${part}ORDER BY n_nationkey) AS w$i"
              // CAST as in the agg grammar: DuckDB windowed sum is HUGEINT
              case 5 => s"  CAST(sum($e) OVER (${part}ORDER BY n_nationkey " +
                s"ROWS BETWEEN ${rndW.nextInt(4)} PRECEDING AND CURRENT ROW) " +
                s"AS BIGINT) AS w$i"
            }
          }.mkString(",\n")
          s"""SELECT n_nationkey,
             |$wins
             |FROM nation
             |ORDER BY n_nationkey""".stripMargin
        }),
      QueryDef.sql(
        "q_fn_fuzz_join", {
          // join dimension: fuzzed BIGINT expressions on BOTH sides of
          // an equi-join condition and in the projection — planner
          // join-key normalization and null-safe equality are under
          // differential test, not just scalar evaluation
          val rndJ = new Random(Seed + 6)
          val aL: Seq[Random => String] = Seq(
            _ => "CAST(a.n_nationkey AS BIGINT)",
            _ => "CAST(a.n_regionkey AS BIGINT)",
            r => r.nextInt(10).toString)
          val bL: Seq[Random => String] = Seq(
            _ => "CAST(b.n_nationkey AS BIGINT)",
            _ => "CAST(b.n_regionkey AS BIGINT)",
            r => r.nextInt(10).toString)
          val abL = aL.dropRight(1) ++ bL
          val cols = (0 until 40)
            .map(i => s"  ${gen(rndJ, 1, abL)} AS j$i")
            .mkString(",\n")
          val ea = gen(rndJ, 1, aL)
          val eb = gen(rndJ, 1, bL)
          s"""SELECT a.n_nationkey AS nk1, b.n_nationkey AS nk2,
             |$cols
             |FROM nation a JOIN nation b
             |  ON ($ea % 3) = ($eb % 3)
             |ORDER BY nk1, nk2""".stripMargin
        }),
      QueryDef.sql(
        "q_fn_fuzz_leftjoin", {
          // outer-join dimension: fuzzed expressions evaluate over the
          // null-extended side — NULL propagation through the whole
          // int grammar is the property under test. NULLS FIRST is
          // explicit: the engines' default null order differs.
          val rndL = new Random(Seed + 7)
          val aL: Seq[Random => String] = Seq(
            _ => "CAST(a.n_nationkey AS BIGINT)",
            _ => "CAST(a.n_regionkey AS BIGINT)",
            r => r.nextInt(10).toString)
          val rL: Seq[Random => String] = Seq(
            _ => "CAST(r.r_regionkey AS BIGINT)",
            r2 => r2.nextInt(10).toString)
          val mixed = aL ++ rL.dropRight(1)
          val cols = (0 until 30)
            .map(i => s"  ${gen(rndL, 1, mixed)} AS l$i")
            .mkString(",\n")
          val ea = gen(rndL, 1, aL)
          val er = gen(rndL, 1, rL)
          s"""SELECT a.n_nationkey AS nk1, r.r_regionkey AS rk,
             |$cols
             |FROM nation a LEFT JOIN region r
             |  ON ($ea % 11) = ($er % 11)
             |ORDER BY nk1, rk NULLS FIRST""".stripMargin
        }),
      QueryDef.sql(
        "q_fn_fuzz_scalar_subq", {
          // correlated-scalar-subquery dimension: each column is an
          // aggregated subquery whose correlation predicate and
          // aggregand are fuzzed — decorrelation planning is under
          // differential test; empty groups yield NULL on both sides
          val rndS = new Random(Seed + 8)
          val rL: Seq[Random => String] = Seq(
            _ => "CAST(r.r_regionkey AS BIGINT)",
            rr => rr.nextInt(10).toString)
          val cols = (0 until 12).map { i =>
            val em = gen(rndS, 2, rL)
            val er = gen(rndS, 2, rL)
            val en = gen(rndS, 2)
            s"""  (SELECT min($em) FROM region r
               |   WHERE ($er % 3) = (($en) % 3)) AS s$i""".stripMargin
          }.mkString(",\n")
          s"""SELECT n_nationkey,
             |$cols
             |FROM nation
             |ORDER BY n_nationkey""".stripMargin
        }),
      QueryDef.sql(
        "q_fn_fuzz_exists", {
          // correlated-EXISTS dimension: each projected column is a
          // correlated [NOT] EXISTS against region whose correlation
          // predicate mixes fuzzed inner and outer expressions —
          // EXISTS decorrelation (semi/anti-join rewrites, including
          // under NOT) is under differential test both projected and
          // as one WHERE gate combining both polarities
          val rndE = new Random(Seed + 14)
          val rL: Seq[Random => String] = Seq(
            _ => "CAST(r.r_regionkey AS BIGINT)",
            rr => rr.nextInt(10).toString)
          val cols = (0 until 16).map { i =>
            val er = gen(rndE, 2, rL)
            val en = gen(rndE, 2)
            val neg = if (rndE.nextBoolean()) "NOT " else ""
            s"""  ${neg}EXISTS (SELECT 1 FROM region r
               |    WHERE ($er % 4) = (($en) % 4)) AS e$i""".stripMargin
          }.mkString(",\n")
          val (g1, g2) = (gen(rndE, 2, rL), gen(rndE, 2))
          val (g3, g4) = (gen(rndE, 2, rL), gen(rndE, 2))
          s"""SELECT n_nationkey,
             |$cols
             |FROM nation
             |WHERE EXISTS (SELECT 1 FROM region r
             |    WHERE ($g1 % 2) = (($g2) % 2))
             |  OR NOT EXISTS (SELECT 1 FROM region r
             |    WHERE ($g3 % 5) = (($g4) % 5))
             |ORDER BY n_nationkey""".stripMargin
        }),
      QueryDef.sql(
        "q_fn_fuzz_setops", {
          // set-operation dimension: UNION / INTERSECT / EXCEPT over
          // fuzzed BIGINT pair projections — distinct-semantics
          // planning (dedup, set difference ordering) under
          // differential test; the result is a set, so (a, b) is a
          // total order
          val rndO = new Random(Seed + 9)
          def pair(): String =
            s"SELECT ${gen(rndO, 1)} AS a, ${gen(rndO, 1)} AS b FROM nation"
          // the INTERSECT operand REUSES two of the union branches, so
          // the overlap is structural and the result is never empty
          val (p1, p2, p3, p4) = (pair(), pair(), pair(), pair())
          s"""SELECT a, b FROM (
             |  $p1
             |  UNION
             |  $p2
             |  UNION
             |  $p3
             |  EXCEPT
             |  $p4
             |) t
             |INTERSECT
             |SELECT a, b FROM (
             |  $p1
             |  UNION
             |  $p3
             |) t2
             |ORDER BY a, b""".stripMargin
        }),
      QueryDef.sql(
        "q_fn_fuzz_timestamp", {
          val rndT = new Random(Seed + 3)
          val colsT = (0 until NumExprs)
            .map { i =>
              val e = genT(rndT, 0)
              // every third column projects an extracted int instead
              // of the raw timestamp, covering year/month/day too
              if (i % 3 == 0)
                s"  ${Seq("year", "month", "day")(i % 9 / 3)}($e) AS t$i"
              else s"  $e AS t$i"
            }
            .mkString(",\n")
          s"""SELECT o_orderkey,
             |$colsT
             |FROM orders
             |WHERE o_orderkey < 500
             |ORDER BY o_orderkey""".stripMargin
        }),
      QueryDef.sql(
        "q_fn_fuzz_predicates", {
          // predicate grammar over the int expressions: comparisons,
          // BETWEEN, IN lists, IS [NOT] NULL on nullif-made nulls,
          // AND/OR/NOT composition — three-valued logic is under
          // differential test both as projected booleans and as one
          // WHERE filter
          val rndP = new Random(Seed + 10)
          def pred(depth: Int): String =
            if (depth >= 2) leafPred(rndP)
            else rndP.nextInt(6) match {
              case 0 => leafPred(rndP)
              case 1 => s"(NOT ${pred(depth + 1)})"
              case 2 => s"(${pred(depth + 1)} AND ${pred(depth + 1)})"
              case 3 => s"(${pred(depth + 1)} OR ${pred(depth + 1)})"
              case 4 => s"(nullif(${gen(rndP, 2)}, ${gen(rndP, 2)}) " +
                "IS NULL)"
              case 5 => s"(nullif(${gen(rndP, 2)}, ${gen(rndP, 2)}) " +
                "IS NOT NULL)"
            }
          def leafPred(r: Random): String = r.nextInt(4) match {
            case 0 => s"(${gen(r, 2)} ${Seq("<", "<=", "=", "<>", ">",
              ">=")(r.nextInt(6))} ${gen(r, 2)})"
            case 1 => s"(${gen(r, 2)} BETWEEN ${gen(r, 2)} " +
              s"AND ${gen(r, 2)})"
            case 2 => s"(${gen(r, 2)} IN (${r.nextInt(5)}, " +
              s"${r.nextInt(9)}, ${gen(r, 2)}))"
            case 3 => s"(nullif(${gen(r, 2)}, ${r.nextInt(9)}) " +
              s"> ${gen(r, 2)})"
          }
          val colsP = (0 until 100)
            .map(i => s"  ${pred(0)} AS p$i").mkString(",\n")
          // filter-POSITION coverage without starving the projected
          // columns: all 25 rows keep evaluating p0..p99, while three
          // scalar-subquery counts run generated predicates in a real
          // WHERE — a filter-evaluation divergence changes w_cnt*
          val wcs = (0 until 3)
            .map(i => s"  (SELECT count(*) FROM nation n2 " +
              s"WHERE ${pred(1)}) AS w_cnt$i").mkString(",\n")
          s"""SELECT n_nationkey,
             |$colsP,
             |$wcs
             |FROM nation
             |ORDER BY n_nationkey""".stripMargin
        }),
      QueryDef.sql(
        "q_fn_fuzz_grouping_sets", {
          // grouping-set planning over fuzzed aggregates: the full
          // lattice ((g1,g2),(g1),(g2),()) with GROUPING() markers and
          // exact sums — partial aggregation, NULL grouping keys, and
          // the marker arithmetic all under differential test
          val rndG = new Random(Seed + 11)
          val aggs = (0 until 24).map { i =>
            val e = gen(rndG, 1)
            rndG.nextInt(4) match {
              case 0 => s"  CAST(sum($e) AS BIGINT) AS g$i"
              case 1 => s"  min($e) AS g$i"
              case 2 => s"  max($e) AS g$i"
              case 3 => s"  count(nullif($e, ${rndG.nextInt(9)})) AS g$i"
            }
          }.mkString(",\n")
          s"""SELECT n_regionkey, n_nationkey % 3 AS k2,
             |  CAST(GROUPING(n_regionkey) AS INT) AS gr,
             |  CAST(GROUPING(n_nationkey % 3) AS INT) AS gk,
             |$aggs,
             |  count(*) AS g_rows
             |FROM nation
             |GROUP BY GROUPING SETS ((n_regionkey, n_nationkey % 3),
             |  (n_regionkey), (n_nationkey % 3), ())
             |ORDER BY gr, gk, n_regionkey NULLS FIRST, k2 NULLS FIRST"""
            .stripMargin
        }),
      QueryDef.sql(
        "q_fn_fuzz_range_frames", {
          // RANGE-frame window aggregates ordered by NON-unique fuzzed
          // expressions: peer-row inclusion, numeric offsets, and
          // unbounded edges — the frame semantics the ROWS fuzz can't
          // reach (HUGEINT-widening CAST as elsewhere)
          val rndR = new Random(Seed + 12)
          val wins = (0 until 30).map { i =>
            val e = gen(rndR, 1)
            val v = gen(rndR, 1)
            val part =
              if (rndR.nextBoolean()) "PARTITION BY n_regionkey " else ""
            val frame = rndR.nextInt(3) match {
              case 0 => s"RANGE BETWEEN ${1 + rndR.nextInt(5)} PRECEDING " +
                s"AND ${rndR.nextInt(5)} FOLLOWING"
              case 1 => "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
              case 2 => s"RANGE BETWEEN CURRENT ROW AND " +
                s"${1 + rndR.nextInt(6)} FOLLOWING"
            }
            rndR.nextInt(3) match {
              case 0 => s"  CAST(sum($v) OVER (${part}ORDER BY $e $frame) " +
                s"AS BIGINT) AS r$i"
              case 1 => s"  min($v) OVER (${part}ORDER BY $e $frame) AS r$i"
              case 2 => s"  count(*) OVER (${part}ORDER BY $e $frame) AS r$i"
            }
          }.mkString(",\n")
          s"""SELECT n_nationkey,
             |$wins
             |FROM nation
             |ORDER BY n_nationkey""".stripMargin
        }),
      QueryDef.sql(
        "q_fn_fuzz_decimal", {
          // fixed-scale DECIMAL(18,3) grammar closed under + and -
          // (scale-preserving ⇒ exact in both engines; × and ÷ scale
          // rules DIFFER between engines and stay out by design),
          // with abs/negate/greatest/least/CASE — decimal comparison
          // and arithmetic under differential test, output re-cast to
          // one declared type so schemas agree
          val rndC = new Random(Seed + 13)
          def genC(depth: Int): String = {
            val leaves = Seq(
              () => "CAST(n_nationkey AS DECIMAL(18,3))",
              () => "CAST(n_regionkey AS DECIMAL(18,3))",
              () => s"CAST('${Seq("0.125", "2.500", "3.750", "1.001",
                "7.333")(rndC.nextInt(5))}' AS DECIMAL(18,3))")
            if (depth >= 3) leaves(rndC.nextInt(leaves.size))()
            else rndC.nextInt(8) match {
              case 0 | 1 => leaves(rndC.nextInt(leaves.size))()
              case 2 => s"abs(${genC(depth + 1)})"
              case 3 => s"(- ${genC(depth + 1)})"
              case 4 => s"(${genC(depth + 1)} + ${genC(depth + 1)})"
              case 5 => s"(${genC(depth + 1)} - ${genC(depth + 1)})"
              case 6 => s"greatest(${genC(depth + 1)}, ${genC(depth + 1)})"
              case 7 => s"(CASE WHEN ${genC(depth + 1)} < " +
                s"${genC(depth + 1)} THEN ${genC(depth + 1)} " +
                s"ELSE ${genC(depth + 1)} END)"
            }
          }
          // output leaves the decimal domain entirely: every grammar
          // value has exact scale 3 (leaves are DECIMAL(18,3) and the
          // grammar is closed under scale-preserving + and -), so
          // (value * 1000) is exactly integral and CAST .. AS BIGINT
          // is lossless in both engines — truncate-vs-round cast
          // behavior never fires on integral inputs. A BIGINT output
          // column sidesteps DECIMAL column decoding/rendering
          // variation across driver builds (observed r10: the only two
          // hash-red judged queries were exactly the two with DECIMAL
          // output columns).
          val colsC = (0 until 100)
            .map(i => s"  CAST((${genC(0)}) * 1000 AS BIGINT) AS c$i")
            .mkString(",\n")
          s"""SELECT n_nationkey,
             |$colsC
             |FROM nation
             |ORDER BY n_nationkey""".stripMargin
        }),
      QueryDef.sql(
        "q_fn_fuzz_in", {
          // [NOT] IN subquery dimension — the NULL-aware semi/anti
          // join rewrites the EXISTS dimension can't reach. Four
          // 3VL traps, each in both polarities:
          //   - inner set carrying a NULL (nullif on the inner value):
          //     no-match goes UNKNOWN, so NOT IN is never TRUE;
          //   - NULL probe against a sometimes-EMPTY correlated set
          //     (NULL IN empty = FALSE, NULL IN nonempty = NULL);
          //   - correlated membership (outer expression in the inner
          //     WHERE), the decorrelation-to-null-aware-join path;
          //   - literal IN lists containing NULL.
          // Columns project the raw nullable BOOLEAN; the WHERE gate
          // combines both polarities without filtering to empty.
          val rndI = new Random(Seed + 15)
          val rL: Seq[Random => String] = Seq(
            _ => "CAST(r.r_regionkey AS BIGINT)",
            rr => rr.nextInt(10).toString)
          val cols = (0 until 16).map { i =>
            val neg = if (rndI.nextBoolean()) "NOT " else ""
            val body = rndI.nextInt(4) match {
              case 0 => // inner NULL via nullif, uncorrelated set
                val en = gen(rndI, 2)
                val er = gen(rndI, 2, rL)
                val k = rndI.nextInt(5)
                s"""(($en) % 7) ${neg}IN (SELECT
                   |    nullif(($er) % 7, $k) FROM region r)""".stripMargin
              case 1 => // NULL probe vs sometimes-empty correlated set
                val en = gen(rndI, 2)
                val eg = gen(rndI, 2)
                val er = gen(rndI, 2, rL)
                val k = 1 + rndI.nextInt(4)
                s"""nullif(($en) % 5, $k) ${neg}IN (SELECT ($er) % 5
                   |    FROM region r
                   |    WHERE (($er) % 6) = (($eg) % 6))""".stripMargin
              case 2 => // correlated membership, plain values
                val en = gen(rndI, 2)
                val eg = gen(rndI, 2)
                val er = gen(rndI, 2, rL)
                val ew = gen(rndI, 2, rL)
                s"""(($en) % 4) ${neg}IN (SELECT ($er) % 4 FROM region r
                   |    WHERE (($ew) % 2) = (($eg) % 2))""".stripMargin
              case 3 => // literal list with NULL member
                val en = gen(rndI, 2)
                val lits = Seq.fill(3)(rndI.nextInt(9).toString) :+ "NULL"
                s"(($en) % 9) ${neg}IN (${lits.mkString(", ")})"
            }
            s"  ($body) AS i$i"
          }.mkString(",\n")
          val (w1, w2) = (gen(rndI, 2), gen(rndI, 2, rL))
          val (w3, w4) = (gen(rndI, 2), gen(rndI, 2, rL))
          s"""SELECT n_nationkey,
             |$cols
             |FROM nation
             |WHERE (($w1) % 3) IN (SELECT ($w2) % 3 FROM region r)
             |   OR (($w3) % 8) NOT IN (SELECT ($w4) % 4 FROM region r)
             |ORDER BY n_nationkey""".stripMargin
        }),
      QueryDef.sql(
        "q_fn_fuzz_quantified", {
          // quantified-comparison dimension: `op ANY/ALL (SELECT …)`
          // across all six comparison operators, correlated and not,
          // with nullif-made NULL members — DuckDB executes the
          // native quantified syntax, Spark goes through the
          // QuantifiedSubqueries expansion (operand extraction,
          // min/max collapse for order ops, decomposed UNKNOWN
          // branch), so the whole rewrite path is under differential
          // test on generated shapes, not just the hand-picked specs
          val rndQ = new Random(Seed + 16)
          val rL: Seq[Random => String] = Seq(
            _ => "CAST(r.r_regionkey AS BIGINT)",
            rr => rr.nextInt(10).toString)
          val ops = Seq("=", "<>", "<", "<=", ">", ">=")
          val cols = (0 until 14).map { i =>
            val quant = if (rndQ.nextBoolean()) "ALL" else "ANY"
            val op = ops(rndQ.nextInt(ops.size))
            val eo = gen(rndQ, 2)
            val ei = gen(rndQ, 2, rL)
            val inner =
              if (rndQ.nextBoolean())
                s"nullif(($ei) % 7, ${rndQ.nextInt(5)})"
              else s"($ei) % 7"
            val corr = rndQ.nextInt(3) match {
              case 0 => ""
              case 1 =>
                val (ew, eg) = (gen(rndQ, 2, rL), gen(rndQ, 2))
                s" WHERE (($ew) % 2) = (($eg) % 2)"
              case 2 => // sometimes-empty correlated set
                val (ew, eg) = (gen(rndQ, 2, rL), gen(rndQ, 2))
                s" WHERE (($ew) % 5) = (($eg) % 5)"
            }
            s"  ((($eo) % 7) $op $quant (SELECT $inner" +
              s" FROM region r$corr)) AS a$i"
          }.mkString(",\n")
          val (g1, g2) = (gen(rndQ, 2), gen(rndQ, 2, rL))
          s"""SELECT n_nationkey,
             |$cols
             |FROM nation
             |WHERE (($g1) % 3) <= ANY (SELECT ($g2) % 4 FROM region r)
             |   OR n_nationkey < 5
             |ORDER BY n_nationkey""".stripMargin
        }), {
        // json-operator dimension: random -> / ->> / #> / #>> chains
        // over a per-row nested document — the JsonArrowRewrite pass +
        // JsonOps expressions under differential test on generated
        // navigation shapes (key/index/missing/out-of-bounds/scalar
        // traps), not just the hand-picked q_fn_json_ops columns.
        // DuckDB has -> and ->> natively with identical semantics on
        // every shape here; #>/#>> spell as json_extract[_string] in
        // the oracle (path steps: digits ⇒ [i], else .key). Two PG
        // edges stay OUT of the grammar and live in JsonOpsSpec
        // instead: json-null leaves (PG renders `null`, DuckDB's
        // operators return SQL NULL) and negative from-the-end
        // indices (DuckDB has none).
        val rndJ = new Random(Seed + 17)
        val keys = Seq("k", "arr", "o", "s", "deep", "b", "v", "missing")
        def chain(): (String, String) = {
          if (rndJ.nextInt(3) == 0) {
            // path form
            val parts = (0 to rndJ.nextInt(3)).map { _ =>
              if (rndJ.nextBoolean()) keys(rndJ.nextInt(keys.size))
              else rndJ.nextInt(5).toString
            }
            val asText = rndJ.nextBoolean()
            val pg = parts.mkString("{", ",", "}")
            val duckPath = "$" + parts.map(p =>
              if (p.forall(_.isDigit)) s"[$p]" else s".$p").mkString
            val spark = s"(j ${if (asText) "#>>" else "#>"} '$pg')"
            val duck =
              if (asText) s"json_extract_string(j, '$duckPath')"
              else s"CAST(json_extract(j, '$duckPath') AS VARCHAR)"
            (spark, duck)
          } else {
            val steps = 1 + rndJ.nextInt(3)
            var expr = "j"
            var lastText = false
            (0 until steps).foreach { i =>
              val last = i == steps - 1
              val asText = last && rndJ.nextBoolean()
              val op = if (asText) "->>" else "->"
              val rhs =
                if (rndJ.nextBoolean()) s"'${keys(rndJ.nextInt(keys.size))}'"
                else rndJ.nextInt(5).toString
              expr = s"($expr $op $rhs)"
              lastText = asText
            }
            (expr, if (lastText) expr else s"CAST($expr AS VARCHAR)")
          }
        }
        // (json dimension continues below; the datetime-field dimension
        // is appended after it)
        val pairs = (0 until 60).map(i => (i, chain()))
        val sparkCols = pairs.map { case (i, (s, _)) => s"  $s AS j$i" }
          .mkString(",\n")
        val duckCols = pairs.map { case (i, (_, d)) => s"  $d AS j$i" }
          .mkString(",\n")
        def doc(str: String): String =
          s"""CONCAT('{"k":', CAST(n_nationkey AS $str),
             |      ',"arr":[', CAST(n_nationkey % 5 AS $str),
             |      ',', CAST(n_regionkey AS $str),
             |      ',9,"s', CAST(n_nationkey % 3 AS $str),
             |      '"],"o":{"s":"x', CAST(n_regionkey AS $str),
             |      '","deep":{"v":', CAST(n_nationkey % 7 AS $str),
             |      '},"b":[', CAST(n_regionkey AS $str),
             |      ',2]}}') AS j""".stripMargin
        QueryDef.sql(
          "q_fn_fuzz_json",
          s"""SELECT n_nationkey,
             |$sparkCols
             |FROM (SELECT n_nationkey, ${doc("STRING")}
             |  FROM nation) t
             |ORDER BY n_nationkey""".stripMargin,
          oracle =
            s"""SELECT n_nationkey,
               |$duckCols
               |FROM (SELECT n_nationkey, ${doc("VARCHAR")}
               |  FROM nation) t
               |ORDER BY n_nationkey""".stripMargin)
      }, {
        // datetime-field dimension: random extract-field × input-shape
        // combos over events.ts put the DateParts completion (century/
        // decade/millennium/isodow/isoyear/epoch/micro-/milliseconds +
        // the delegated Spark fields) under generated differential
        // test — DuckDB evaluates every one of these fields with PG
        // semantics natively (probed: era grid, from-minute micros,
        // truncating ms), so the SAME text judges both engines.
        // Excluded by design: date_trunc('century'/'millennium') inputs
        // (DuckDB's xx00 grid needs the reference's +1-year rewrite —
        // pinned in q_fn_extract_fields instead) and timezone fields
        // (session-dependent). epoch floors (engine cast rounding
        // differs) and milliseconds is integral in DuckDB, so both
        // wrap in FLOOR and cast BIGINT.
        val rndT = new Random(Seed + 18)
        val fields = Seq("century", "decade", "millennium", "isodow",
          "isoyear", "epoch", "microseconds", "milliseconds", "year",
          "month", "day", "quarter", "week", "doy", "hour", "minute")
        def input(): String = rndT.nextInt(6) match {
          case 0 => "ts"
          case 1 => s"ts + INTERVAL ${1 + rndT.nextInt(400)} DAY"
          case 2 => s"ts - INTERVAL ${1 + rndT.nextInt(5000)} HOUR"
          case 3 => s"CAST(ts AS DATE) + ${rndT.nextInt(300)}"
          case 4 => s"CAST(date_trunc('${Seq("year", "month", "day",
            "hour")(rndT.nextInt(4))}', ts) AS TIMESTAMP)"
          case 5 => s"ts + INTERVAL ${1 + rndT.nextInt(100000)} SECOND"
        }
        val colsT = (0 until 48).map { i =>
          val f = fields(rndT.nextInt(fields.size))
          s"  CAST(FLOOR(EXTRACT($f FROM ${input()})) AS BIGINT) AS t$i"
        }.mkString(",\n")
        QueryDef.sql(
          "q_fn_fuzz_datetime",
          s"""SELECT event_id,
             |$colsT
             |FROM events
             |WHERE event_id < 500
             |ORDER BY event_id""".stripMargin)
      }, {
        // dimension 20: the dialect-rewrite chain ITSELF under
        // composition fuzz. Every prior dimension exercises ONE
        // surface; this one generates random compositions of
        // double-quoted identifiers + ::casts + json arrows +
        // quantified predicates + SIMILAR TO + POSIX regex + 3VL IN
        // inside single expressions, with string literals stuffed
        // with operator LOOKALIKES ('a::b -> c', 'ANY (SELECT 1',
        // doubled quotes) that the 8-pass token chain must carry as
        // content. DuckDB parses the same text natively (it speaks
        // the PG dialect), so a composition bug in any rewrite —
        // operand scans crossing each other's splices, literal
        // leakage, precedence mis-association — lands as a parse
        // error or a hash mismatch here.
        // The generator emits LOCKSTEP (spark, duck) twins: every node
        // is textually identical on both sides EXCEPT the PG operators
        // DuckDB evaluates with different semantics — `~` family
        // (DuckDB: full match; PG/us: search) and SIMILAR TO (DuckDB:
        // raw regex; PG/us: %/_ wildcards) — which the duck twin
        // spells as regexp_matches / regexp_full_match with the
        // translated pattern, exactly like the hand-written
        // q_fn_posix_regex / q_fn_similar_to oracles.
        val rndX = new Random(Seed + 19)
        val lits = Seq("a::b -> c", "x ~ y!", "SIMILAR TO",
          "ANY (SELECT 1", "it''s \"fine\"", "%_%", "NOT IN (1,",
          "-> ->> end")
        val rePats = Seq("A.*A", "[AEIOU]$", "::", "->", "N", "v[0-9]")
        // (PG SIMILAR TO pattern, equivalent full-match regex)
        val simPats = Seq(
          ("%(A|I)N%", ".*(A|I)N.*"), ("__%", "...*"),
          ("%::%", ".*::.*"), ("%v_%", ".*v..*"))
        def lit(): (String, String) = {
          val l = s"'${lits(rndX.nextInt(lits.size))}'"
          (l, l)
        }
        def qnum(): (String, String) = {
          val c = Seq("\"n_nationkey\"", "n_nationkey",
            "\"n_regionkey\"", "n_regionkey")(rndX.nextInt(4))
          (c, c)
        }
        def pair(f: String => String)(e: (String, String))
            : (String, String) = (f(e._1), f(e._2))
        def pair2(f: (String, String) => String)(a: (String, String),
            b: (String, String)): (String, String) =
          (f(a._1, b._1), f(a._2, b._2))
        def numLeaf(): (String, String) = {
          val k = rndX.nextInt(5)
          pair(c => s"($c + $k)::int8")(qnum())
        }
        def num(d: Int): (String, String) =
          if (d >= 3) numLeaf()
          else rndX.nextInt(5) match {
            case 0 => numLeaf()
            case 1 =>
              val k = 1 + rndX.nextInt(3)
              pair(e => s"(($e) * $k)::int8")(num(d + 1))
            case 2 =>
              val z = rndX.nextInt(9)
              pair(c => s"(concat('{\"k\":', $c::text, " +
                s"',\"z\":$z}') ->> 'k')::int8")(qnum())
            case 3 =>
              val (b, t, e) = (bool(d + 1), num(d + 1), num(d + 1))
              (s"(CASE WHEN ${b._1} THEN ${t._1} ELSE ${e._1} END)",
                s"(CASE WHEN ${b._2} THEN ${t._2} ELSE ${e._2} END)")
            case 4 =>
              val k = 2 + rndX.nextInt(6)
              pair(c => s"($c::int4 % $k)::int8")(qnum())
          }
        def txt(d: Int): (String, String) =
          if (d >= 3) (if (rndX.nextBoolean())
            ("\"n_name\"", "\"n_name\"") else lit())
          else rndX.nextInt(5) match {
            case 0 => ("\"n_name\"", "\"n_name\"")
            case 1 => lit()
            case 2 => pair(e => s"($e)::text")(num(d + 1))
            case 3 => pair2((a, b) => s"concat($a, '|', $b)")(
              txt(d + 1), txt(d + 1))
            case 4 => pair(c => s"(concat('{\"s\":\"v', $c::text, " +
              s"'\"}') ->> 's')")(qnum())
          }
        def bool(d: Int): (String, String) =
          if (d >= 3) {
            val k = rndX.nextInt(20)
            pair(c => s"($c > $k)")(qnum())
          } else rndX.nextInt(8) match {
            case 0 =>
              val s = txt(d + 1)
              val p = rePats(rndX.nextInt(rePats.size))
              rndX.nextInt(4) match {
                case 0 => (s"(${s._1} ~ '$p')",
                  s"regexp_matches(${s._2}, '$p')")
                case 1 => (s"(${s._1} ~* '$p')",
                  s"regexp_matches(${s._2}, '(?i)$p')")
                case 2 => (s"(${s._1} !~ '$p')",
                  s"(NOT regexp_matches(${s._2}, '$p'))")
                case 3 => (s"(${s._1} !~* '$p')",
                  s"(NOT regexp_matches(${s._2}, '(?i)$p'))")
              }
            case 1 =>
              val s = txt(d + 1)
              val (pg, rx) = simPats(rndX.nextInt(simPats.size))
              if (rndX.nextBoolean())
                (s"(${s._1} SIMILAR TO '$pg')",
                  s"regexp_full_match(${s._2}, '$rx')")
              else
                (s"(${s._1} NOT SIMILAR TO '$pg')",
                  s"(NOT regexp_full_match(${s._2}, '$rx'))")
            case 2 =>
              val neg = if (rndX.nextBoolean()) "" else "NOT "
              val k = rndX.nextInt(20)
              pair(e => s"(($e) ${neg}IN (1, NULL, $k))")(num(d + 1))
            case 3 =>
              val op = Seq("=", "<>", "<", ">=")(rndX.nextInt(4))
              val q = if (rndX.nextBoolean()) "ANY" else "ALL"
              val k = 1 + rndX.nextInt(4)
              pair(e => s"(($e) $op $q (SELECT r_regionkey * " +
                s"$k FROM region))")(num(d + 1))
            case 4 =>
              val (k1, k2) = (rndX.nextInt(9), rndX.nextInt(30))
              pair(e => s"(($e) = ANY (ARRAY[$k1, NULL, $k2]))")(
                num(d + 1))
            case 5 => pair2((a, b) => s"($a AND $b)")(
              bool(d + 1), bool(d + 1))
            case 6 => pair2((a, b) => s"($a OR $b)")(
              bool(d + 1), bool(d + 1))
            case 7 => pair(e => s"(NOT $e)")(bool(d + 1))
          }
        val colsX = (0 until 36).map { i =>
          val e = rndX.nextInt(3) match {
            case 0 => num(0)
            case 1 => txt(0)
            case 2 => bool(0)
          }
          (s"  ${e._1} AS x$i", s"  ${e._2} AS x$i")
        }
        def stmt(cols: Seq[String]): String =
          s"""SELECT n_nationkey, "n_name" AS "Nation Name",
             |${cols.mkString(",\n")}
             |FROM nation
             |ORDER BY n_nationkey""".stripMargin
        QueryDef.sql(
          "q_fn_fuzz_dialect",
          stmt(colsX.map(_._1)),
          oracle = stmt(colsX.map(_._2)))
      }, {
        // dimension 21: string-function composition — the text half of
        // the 330-entry scalar contract under generated differential
        // test. Grammar restricted to the PG∩Spark∩DuckDB-identical
        // subset (positions ≥ 1, non-negative lengths, ASCII inputs):
        // upper/lower/trim family, replace, substr, lpad/rpad, left/
        // right, reverse, repeat, translate, split_part, concat/`||`,
        // and length/ascii/strpos as the numeric leaves. One text
        // judges both engines.
        val rndS = new Random(Seed + 20)
        val litsS = Seq("Abc", "  pad  ", "x-y-z", "QQ", "a,b,c", "Zz0")
        def slit(): String = s"'${litsS(rndS.nextInt(litsS.size))}'"
        def sbase(): String =
          if (rndS.nextBoolean()) "n_name" else slit()
        def stx(d: Int): String =
          if (d >= 3) sbase()
          else rndS.nextInt(12) match {
            case 0 => s"upper(${stx(d + 1)})"
            case 1 => s"lower(${stx(d + 1)})"
            case 2 => Seq("trim", "ltrim", "rtrim")(rndS.nextInt(3)) +
              s"(${stx(d + 1)})"
            case 3 => s"replace(${stx(d + 1)}, '${Seq("A", "N", "-", " ")(
              rndS.nextInt(4))}', '${Seq("", "_", "xx")(rndS.nextInt(3))}')"
            case 4 => s"substr(${stx(d + 1)}, ${1 + rndS.nextInt(4)}, " +
              s"${rndS.nextInt(8)})"
            case 5 => Seq("lpad", "rpad")(rndS.nextInt(2)) +
              s"(${stx(d + 1)}, ${rndS.nextInt(16)}, " +
              s"'${Seq(".", "ab", "*")(rndS.nextInt(3))}')"
            case 6 => Seq("left", "right")(rndS.nextInt(2)) +
              s"(${stx(d + 1)}, ${rndS.nextInt(6)})"
            case 7 => s"reverse(${stx(d + 1)})"
            case 8 => s"repeat(${stx(d + 1)}, ${rndS.nextInt(3)})"
            case 9 => s"translate(${stx(d + 1)}, 'ANE', " +
              s"'${Seq("xyz", "12", "")(rndS.nextInt(3))}')"
            case 10 => s"split_part(${stx(d + 1)}, '-', " +
              s"${1 + rndS.nextInt(3)})"
            case 11 => s"concat(${stx(d + 1)}, ${stx(d + 1)})"
          }
        def snum(d: Int): String = rndS.nextInt(3) match {
          case 0 => s"CAST(length(${stx(d)}) AS BIGINT)"
          case 1 => s"CAST(ascii(substr(${stx(d)} || 'Q', 1, 1)) AS BIGINT)"
          case 2 => s"CAST(strpos(${stx(d)}, '${Seq("A", "N", "z")(
            rndS.nextInt(3))}') AS BIGINT)"
        }
        val colsS = (0 until 40).map { i =>
          if (rndS.nextInt(4) == 3) s"  ${snum(1)} AS s$i"
          else s"  ${stx(0)} AS s$i"
        }.mkString(",\n")
        QueryDef.sql(
          "q_fn_fuzz_strings",
          s"""SELECT n_nationkey,
             |$colsS
             |FROM nation
             |ORDER BY n_nationkey""".stripMargin)
      }, {
        // dimension 22: to_char FORMAT STRINGS under generated
        // differential test. The to_char port is the largest
        // hand-written translation table in the function layer
        // (reference pg_lake_engine/src/pgduck/to_char.c is 1,378 LoC)
        // and was judged by one hand-picked query; here random format
        // strings compose from the SUPPORTED specifier set over
        // events.ts, and the DuckDB twin spells each specifier via the
        // reference's own strftime-equivalent rules (piecewise CONCAT —
        // one STRFTIME per specifier, quarter via EXTRACT). Specifiers
        // whose PG/Java/strftime renderings are locale- or
        // convention-divergent (WW/W/IW/Y/YYY — week-numbering and
        // minimum-digit-year rules differ) stay out of the pool, the
        // same posture as the timestamp grammar's no-months rule.
        // The ISO-8601 family (IW/ID/IYYY, r13) IS in the pool: both
        // engines agree on ISO week numbering, spelled piecewise via
        // DuckDB's EXTRACT(WEEK/ISODOW/ISOYEAR).
        val rndF = new Random(Seed + 21)
        val toks: Seq[(String, String)] = Seq(
          "YYYY" -> "%Y", "YY" -> "%y", "MM" -> "%m",
          "DD" -> "%d", "DDD" -> "%j", "HH24" -> "%H",
          "HH12" -> "%I", "MI" -> "%M", "SS" -> "%S",
          "Mon" -> "%b", "Month" -> "%B", "Day" -> "%A",
          "Dy" -> "%a", "AM" -> "%p",
          // non-strftime pieces: quarter, ISO-8601 fields, and a
          // quoted-literal span
          "Q" -> "", "IW" -> "", "ID" -> "", "IYYY" -> "",
          "\"wk\"" -> "")
        val seps = Seq("-", "/", " ", ":", ".", ", ")
        def duckPiece(tok: String): String = tok match {
          case "Q" => "CAST(EXTRACT(QUARTER FROM ts) AS VARCHAR)"
          // DuckDB's WEEK is the ISO week number; PG's IW zero-pads
          case "IW" =>
            "LPAD(CAST(EXTRACT(WEEK FROM ts) AS VARCHAR), 2, '0')"
          case "ID" => "CAST(EXTRACT(ISODOW FROM ts) AS VARCHAR)"
          case "IYYY" => "CAST(EXTRACT(ISOYEAR FROM ts) AS VARCHAR)"
          case "\"wk\"" => "'wk'"
          case t => s"STRFTIME(ts, '${toks.toMap.apply(t)}')"
        }
        val colsF = (0 until 40).map { i =>
          val n = 2 + rndF.nextInt(3)
          val picked = Seq.fill(n)(toks(rndF.nextInt(toks.size))._1)
          val sepSeq = Seq.fill(n - 1)(seps(rndF.nextInt(seps.size)))
          // FM exercises the modifier-skip path: our translation (and
          // the reference's) treats it as a no-op for these patterns
          val fm = if (rndF.nextInt(5) == 0) "FM" else ""
          val fmtStr = fm + picked.head +
            sepSeq.zip(picked.tail).map { case (s, t) => s + t }.mkString
          val duck = "CONCAT(" + (Seq(duckPiece(picked.head)) ++
            sepSeq.zip(picked.tail).flatMap { case (s, t) =>
              Seq(s"'$s'", duckPiece(t))
            }).mkString(", ") + ")"
          (s"  TO_CHAR(ts, '$fmtStr') AS f$i", s"  $duck AS f$i")
        }
        def stmtF(cols: Seq[String]): String =
          s"""SELECT event_id,
             |${cols.mkString(",\n")}
             |FROM events
             |WHERE event_id < 200
             |ORDER BY event_id""".stripMargin
        QueryDef.sql(
          "q_fn_fuzz_tochar",
          stmtF(colsF.map(_._1)),
          oracle = stmtF(colsF.map(_._2)))
      }, {
        // dimension 23: generated ROW-wise comparisons — ONE text on
        // both engines. DuckDB evaluates row comparison natively, we
        // via RowCompareRewrite's lexicographic expansion, so every
        // column is a direct differential of the expansion INCLUDING
        // the standard's 3VL (probed: DuckDB's NULL row semantics
        // match the standard — (1,NULL)<(2,0) is true, (1,NULL)=(1,2)
        // is null). Per position the two sides stay type-compatible;
        // NULLIF-made nulls land on either side.
        val rndR = new Random(Seed + 22)
        // (lhs pool, rhs pool) per element type
        val pools: Seq[(Seq[String], Seq[String])] = Seq(
          (Seq("o_orderkey", "o_custkey", "100", "2500"),
            Seq("o_custkey", "o_orderkey", "500", "NULLIF(o_custkey, 370)")),
          (Seq("o_totalprice", "100000.0", "NULLIF(o_totalprice, 0.0)"),
            Seq("o_totalprice", "150000.0", "50000.0")),
          (Seq("o_orderstatus", "'O'", "NULLIF(o_orderstatus, 'F')"),
            Seq("o_orderstatus", "'F'", "'P'")),
          (Seq("o_orderpriority", "'3-MEDIUM'"),
            Seq("o_orderpriority", "'1-URGENT'")))
        val ops = Seq("=", "<>", "<", "<=", ">", ">=")
        val colsR = (0 until 30).map { i =>
          val n = 2 + rndR.nextInt(2)
          val picks = Seq.fill(n)(pools(rndR.nextInt(pools.size)))
          val op = ops(rndR.nextInt(ops.size))
          // =/<> restrict to null-free elements: PG's any-pair-decides
          // rule for row =/<> ((NULL,1) <> ('a',2) is TRUE) diverges
          // from DuckDB's strict lexicographic NULL short-circuit
          // (NULL) — we implement PG, so those combinations can't
          // share one judged text. Ordered comparisons stop at the
          // first unequal-or-null pair in BOTH engines and keep their
          // NULLIF elements.
          def pick(side: Seq[String]): String = {
            val cand =
              if (op == "=" || op == "<>")
                side.filterNot(_.contains("NULLIF"))
              else side
            cand(rndR.nextInt(cand.size))
          }
          val lhs = picks.map(p => pick(p._1))
          val rhs = picks.map(p => pick(p._2))
          s"  (ROW(${lhs.mkString(", ")}) $op " +
            s"ROW(${rhs.mkString(", ")})) AS r$i"
        }
        QueryDef.sql(
          "q_fn_fuzz_rowcmp",
          s"""SELECT o_orderkey,
             |${colsR.mkString(",\n")}
             |FROM orders
             |WHERE o_orderkey < 400
             |ORDER BY o_orderkey""".stripMargin)
      })
  }
}
