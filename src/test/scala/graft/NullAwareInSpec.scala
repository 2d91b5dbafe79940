package graft

import org.scalatest.funsuite.AnyFunSuite

/** Three-valued `[NOT] IN (subquery)` in value positions — the
  * standard-SQL truth table [[graft.plans.NullAwareIn]] restores over
  * stock Spark's exists-flag conflation (projected `1 NOT IN {NULL,3}`
  * is NULL per the standard and both reference engines, FALSE in
  * stock Spark). Each case pins the full column against the
  * hand-computed standard semantics, plus plan shape: exempt
  * positions keep Spark's native single-join plan.
  */
class NullAwareInSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private def rows(sql: String): Seq[Option[Boolean]] = {
    val df = QueryDef.pgSql(spark, sql)
    df.collect().toSeq.map(r =>
      if (r.isNullAt(r.length - 1)) None
      else Some(r.getBoolean(r.length - 1)))
  }

  // probe side: v ∈ {1, 2, NULL}; set builders below vary the inner side
  private val probe = "VALUES (1), (2), (CAST(NULL AS INT)) s(v)"

  test("IN: match TRUE, no-match vs NULL-bearing set UNKNOWN, null probe UNKNOWN") {
    // set {1, NULL}: v=1 → TRUE; v=2 → no match + NULL member → NULL;
    // v=NULL → nonempty set → NULL
    val r = rows(s"""SELECT v, v IN (SELECT x FROM
      VALUES (1), (CAST(NULL AS INT)) t(x)) FROM $probe ORDER BY v NULLS LAST""")
    assert(r === Seq(Some(true), None, None))
  }

  test("IN: clean set keeps two-valued results") {
    // set {1, 3}: v=1 → TRUE; v=2 → FALSE; v=NULL → nonempty → NULL
    val r = rows(s"""SELECT v, v IN (SELECT x FROM
      VALUES (1), (3) t(x)) FROM $probe ORDER BY v NULLS LAST""")
    assert(r === Seq(Some(true), Some(false), None))
  }

  test("NOT IN: NULL-bearing set is never TRUE") {
    // set {1, NULL}: v=1 → FALSE; v=2 → NULL; v=NULL → NULL
    val r = rows(s"""SELECT v, v NOT IN (SELECT x FROM
      VALUES (1), (CAST(NULL AS INT)) t(x)) FROM $probe ORDER BY v NULLS LAST""")
    assert(r === Seq(Some(false), None, None))
  }

  test("empty set: FALSE / TRUE even for a NULL probe") {
    // NULL IN (empty) is FALSE (no comparison ever happens)
    val in = rows(s"""SELECT v, v IN (SELECT x FROM
      VALUES (1) t(x) WHERE x > 99) FROM $probe ORDER BY v NULLS LAST""")
    assert(in === Seq(Some(false), Some(false), Some(false)))
    val notIn = rows(s"""SELECT v, v NOT IN (SELECT x FROM
      VALUES (1) t(x) WHERE x > 99) FROM $probe ORDER BY v NULLS LAST""")
    assert(notIn === Seq(Some(true), Some(true), Some(true)))
  }

  test("correlated set: emptiness varies per outer row") {
    // set is {v+1 paired} — for v=1 the correlated set is {2}, for
    // v=2 it is empty, so NULL-probe handling depends on correlation
    val r = rows(s"""SELECT v, (v + 1) IN (SELECT x FROM
      VALUES (2), (CAST(NULL AS INT)) t(x) WHERE x = v + 1)
      FROM $probe ORDER BY v NULLS LAST""")
    // v=1: set {2}, probe 2 → TRUE; v=2: set empty (3 ∉, NULL row
    // dropped by the correlation predicate) → FALSE; v=NULL: probe
    // NULL, correlated predicate x = NULL keeps nothing → empty → FALSE
    assert(r === Seq(Some(true), Some(false), Some(false)))
  }

  test("multi-column probe composes through conjunction 3VL") {
    // (1, NULL) vs {(1, 5)}: a=x TRUE, b=y UNKNOWN → row UNKNOWN → NULL
    // (1, NULL) vs {(2, 5)}: a=x FALSE → row FALSE → set has no
    //   match and no unknown → FALSE
    val unknown = rows("""SELECT (1, CAST(NULL AS INT)) IN
      (SELECT * FROM VALUES (1, 5) t(x, y))""")
    assert(unknown === Seq(None))
    val falseCase = rows("""SELECT (1, CAST(NULL AS INT)) IN
      (SELECT * FROM VALUES (2, 5) t(x, y))""")
    assert(falseCase === Seq(Some(false)))
  }

  test("coalesce over NOT IN under WHERE sees the restored NULL") {
    // stock Spark: NOT IN yields FALSE, coalesce never fires, zero
    // rows survive; standard: NULL → coalesce → TRUE keeps all three
    val df = QueryDef.pgSql(spark, s"""SELECT v FROM $probe
      WHERE coalesce(v NOT IN (SELECT x FROM
        VALUES (9), (CAST(NULL AS INT)) t(x)), true)""")
    assert(df.count() === 3)
  }

  test("aggregate argument position is rewritten") {
    val r = QueryDef.pgSql(spark, s"""SELECT
        count(CASE WHEN v NOT IN (SELECT x FROM
          VALUES (9), (CAST(NULL AS INT)) t(x)) THEN 1 END) AS n
      FROM $probe""").collect()
    assert(r.head.getLong(0) === 0L) // every NOT IN is NULL → no TRUE branch
  }

  test("top-level filter conjuncts keep the native join plan") {
    val df = QueryDef.pgSql(spark, s"""SELECT v FROM $probe
      WHERE v IN (SELECT x FROM VALUES (1), (CAST(NULL AS INT)) t(x))""")
    assert(df.collect().map(_.getInt(0)).toSeq === Seq(1))
    val p = df.queryExecution.optimizedPlan.toString
    assert(!p.contains("CASE WHEN"), p) // exempt position: no expansion
  }

  test("join ON: non-top-level NOT IN under coalesce sees the NULL") {
    // stock Spark's ExistenceJoin path drops both rows (NOT IN
    // conflated to FALSE, coalesce never fires); the expansion in
    // Join conditions restores the standard 2-row result
    val df = QueryDef.pgSql(spark,
      """SELECT a.v, b.w FROM VALUES (1),(2) a(v)
        |JOIN VALUES (1),(2) b(w)
        |ON a.v = b.w AND coalesce(a.v NOT IN (SELECT x FROM
        |  VALUES (9),(CAST(NULL AS INT)) t(x)), true)""".stripMargin)
    assert(df.count() === 2)
  }

  test("non-nullable probe and set keep the native plan") {
    val df = QueryDef.pgSql(spark,
      """SELECT v, v IN (SELECT x FROM range(3) t(x)) FROM range(5) s(v)""")
    val p = df.queryExecution.optimizedPlan.toString
    assert(!p.contains("CASE WHEN"), p)
    assert(df.collect().count(_.getBoolean(1)) === 3)
  }
}
