package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Statement-level dialect fuzz for DML — the complement of the judged
  * `q_fn_fuzz_dialect` (SELECT-side, DuckDB oracle): generated
  * UPDATE/DELETE statements whose WHERE/SET surfaces compose POSIX
  * regex, SIMILAR TO, `::casts`, double-quoted identifiers, json
  * arrows, and 3VL IN — plus RETURNING — run through the engine's full
  * text-rewrite + DML machinery, and the outcome is checked against an
  * INDEPENDENT evaluation path: the same predicate built directly as a
  * Spark Column (no SQL text anywhere), applied to a driver-maintained
  * expected state. A rewrite-chain composition bug on the DML side —
  * operand scans crossing the RETURNING clause, literal leakage into
  * SET lists, mis-associated predicates — lands as a row-set mismatch
  * here, not just a parse error.
  */
class DmlDialectFuzzSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- paired (sql text, Column) predicate generator -----------------
  private final case class P(text: String, col: Column)

  private val rnd = new Random(20260815)

  private val rePats = Seq("a.*a", "[0-9]$", "x-", "msg", "v[12]")
  // (PG SIMILAR TO pattern, full-match regex twin)
  private val simPats = Seq(
    ("%a%", ".*a.*"), ("row-_%", "row-..*"), ("%(x|y)%", ".*(x|y).*"))

  private def pred(d: Int): P =
    if (d >= 3) {
      val k = rnd.nextInt(40)
      P(s"(\"id\" > $k)", col("id") > k)
    } else rnd.nextInt(11) match {
      case 0 =>
        val p = rePats(rnd.nextInt(rePats.size))
        rnd.nextInt(3) match {
          case 0 => P(s"(msg ~ '$p')", col("msg").rlike(p))
          case 1 => P(s"(msg !~ '$p')", !col("msg").rlike(p))
          case 2 => P(s"(msg ~* '$p')", col("msg").rlike(s"(?i)$p"))
        }
      case 1 =>
        val (pg, rx) = simPats(rnd.nextInt(simPats.size))
        if (rnd.nextBoolean())
          P(s"(msg SIMILAR TO '$pg')", col("msg").rlike(s"^(?:$rx)$$"))
        else
          P(s"(msg NOT SIMILAR TO '$pg')",
            !col("msg").rlike(s"^(?:$rx)$$"))
      case 2 =>
        val (k1, k2) = (rnd.nextInt(40), rnd.nextInt(40))
        if (rnd.nextBoolean())
          P(s"(id IN ($k1, NULL, $k2))",
            col("id").isin(k1, null, k2))
        else
          P(s"(id NOT IN ($k1, NULL, $k2))",
            !col("id").isin(k1, null, k2))
      case 3 =>
        val m = 2 + rnd.nextInt(5)
        val k = rnd.nextInt(m)
        P(s"((\"id\"::int8 % $m) = $k)",
          col("id").cast("long") % m === k)
      case 4 =>
        // json arrow over a constructed doc, composed with a ::cast
        val m = 3 + rnd.nextInt(4)
        P(s"((concat('{\"k\":', (id % $m)::text, '}') ->> 'k')::int8 = 1)",
          get_json_object(
            concat(lit("{\"k\":"), (col("id") % m).cast("string"),
              lit("}")), "$.k").cast("long") === 1)
      case 5 =>
        val (a, b) = (pred(d + 1), pred(d + 1))
        P(s"(${a.text} AND ${b.text})", a.col && b.col)
      case 6 =>
        val (a, b) = (pred(d + 1), pred(d + 1))
        P(s"(${a.text} OR ${b.text})", a.col || b.col)
      case 7 =>
        val a = pred(d + 1)
        P(s"(NOT ${a.text})", !a.col)
      case 8 =>
        // to_char through the chain: the literal format string holds
        // '-'-separators and pattern letters operand scans must not
        // touch; ::casts compose around it. Twin = date_format with
        // the translated Java pattern, no SQL text anywhere.
        val k = rnd.nextInt(5)
        P("(to_char(('2024-01-01'::date + (\"id\" % 5)::int4)" +
          f"::timestamp, 'DD') = '${k + 1}%02d')",
          date_format(date_add(lit("2024-01-01").cast("date"),
            (col("id") % 5).cast("int")), "dd") === f"${k + 1}%02d")
      case 9 =>
        // COLLATE "C" strip + quantified ARRAY form
        val (k1, k2) = (rnd.nextInt(40), rnd.nextInt(40))
        if (rnd.nextBoolean())
          P(s"""((msg COLLATE "C") > 'm')""", col("msg") > "m")
        else
          P(s"(id = ANY (ARRAY[$k1, $k2]))", col("id").isin(k1, k2))
      case 10 =>
        // row-wise comparison through the chain (RowCompareRewrite):
        // twin = the standard's lexicographic expansion as Columns
        val k = rnd.nextInt(40)
        val m = 'a' + rnd.nextInt(26)
        val ms = m.toChar.toString
        if (rnd.nextBoolean())
          P(s"(ROW(\"id\", msg) > ROW($k, '$ms'))",
            col("id") > k || (col("id") === k && col("msg") > ms))
        else
          P(s"(ROW(id, msg) = ROW($k, '$ms'))",
            col("id") === k && col("msg") === ms)
    }

  // ---- driver-maintained expected state ------------------------------
  private def df(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("id", "msg")

  private def collectRows(d: DataFrame): Seq[(Long, String)] =
    d.select("id", "msg").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq

  test("generated dialect DML matches the independent Column path") {
    val e = LakeEngine(spark)
    val init: Seq[(Long, String)] = (0L until 60L).map { i =>
      val tag = Seq("alpha", "x-9", "Msg", "v1", "v2", "row-7", "data")(
        (i % 7).toInt)
      (i, s"$tag-$i")
    }
    e.createTableAsSelect("fz_dml", LakeEngine.tempLocation("fzdml"),
      df(init))
    var expected = init

    var updates = 0
    var deletes = 0
    for (step <- 0 until 14) {
      val p = pred(0)
      // the WHERE gate in DML keeps only TRUE rows (UNKNOWN stays /
      // is not affected) — same as filter(coalesce(p, false))
      val gate = coalesce(p.col, lit(false))
      if (step % 2 == 0) {
        // UPDATE ... SET msg (dialect expr) ... RETURNING id
        val ret = e.sql(
          s"""UPDATE fz_dml SET msg = concat('u', "msg")
             |WHERE ${p.text} RETURNING id""".stripMargin)
          .collect().map(_.getLong(0)).sorted.toSeq
        val expHit = collectRows(df(expected).filter(gate)).map(_._1)
        assert(ret == expHit,
          s"step $step UPDATE RETURNING mismatch for ${p.text}: " +
            s"engine=$ret expected=$expHit")
        expected = collectRows(df(expected).withColumn("msg",
          when(gate, concat(lit("u"), col("msg"))).otherwise(col("msg"))))
        updates += ret.size
      } else {
        // DELETE ... WHERE (dialect) RETURNING id
        val ret = e.sql(
          s"DELETE FROM fz_dml WHERE ${p.text} RETURNING id")
          .collect().map(_.getLong(0)).sorted.toSeq
        val expHit = collectRows(df(expected).filter(gate)).map(_._1)
        assert(ret == expHit,
          s"step $step DELETE RETURNING mismatch for ${p.text}: " +
            s"engine=$ret expected=$expHit")
        expected = collectRows(df(expected).filter(!gate))
        deletes += ret.size
      }
      // full-state check every step: the table equals the
      // independently-evolved expected rows
      val actual = collectRows(e.sql("SELECT id, msg FROM fz_dml"))
      assert(actual == expected,
        s"step $step state diverged after ${p.text}")
    }
    // the run must have really exercised both paths
    assert(updates > 10 && deletes > 5,
      s"degenerate fuzz run: $updates updates, $deletes deletes — " +
        "tune the seed so predicates hit rows")
    e.dropTable("fz_dml")
  }
}
