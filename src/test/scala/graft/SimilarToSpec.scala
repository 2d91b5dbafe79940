package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SimilarTo.toRegex
import graft.plans.SimilarToRewrite.rewrite

/** SIMILAR TO: the translator against PG-documented semantics, the
  * text rewrite's operand bounding, and end-to-end evaluation through
  * [[QueryDef.pgSql]]. (DuckDB's own SIMILAR TO deviates from PG —
  * plain full-regex, '.' meta, '%' not a wildcard — so the judged
  * oracle `q_fn_similar_to` uses regexp_full_match with hand-derived
  * translations; this spec pins the PG behavior directly.)
  */
class SimilarToSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  /** find() (what RLIKE does) — the \A..\z anchors make it whole-string. */
  private def hit(s: String, pat: String, esc: Char = '\\'): Boolean = {
    val re = toRegex(pat, esc)
    java.util.regex.Pattern.compile(re).matcher(s).find()
  }

  test("wildcards, anchoring, literal dot/caret/dollar") {
    assert(hit("abc", "a%"))
    assert(hit("abc", "_b_"))
    assert(!hit("xabcx", "abc"), "SIMILAR TO matches the whole string")
    assert(!hit("abc", "a.c"), "'.' is literal in SIMILAR TO")
    assert(hit("a.c", "a.c"))
    assert(hit("a^b$c", "a^b$c"), "'^'/'$' are literal")
  }

  test("regex features the standard keeps: | * + ? {} []") {
    assert(hit("abc", "(abc|xyz)"))
    assert(hit("xyz", "(abc|xyz)"))
    assert(hit("aaa", "a{3}"))
    assert(!hit("aaaa", "a{3}"))
    assert(hit("a3", "a[0-9]"))
    assert(hit("", "a*"))
    assert(hit("ab", "ab?c?"))
  }

  test("escape character quotes the next char; custom ESCAPE") {
    assert(hit("a%", "a\\%"))
    assert(!hit("ab", "a\\%"))
    assert(hit("a_b", "a!_b", esc = '!'))
    assert(!hit("axb", "a!_b", esc = '!'))
    assert(hit("50%", "50!%", esc = '!'))
    intercept[IllegalArgumentException](toRegex("abc\\"))
  }

  test("text rewrite bounds operands and preserves NOT") {
    val r = rewrite("SELECT a FROM t WHERE x SIMILAR TO '%z' AND y > 0")
    assert(r.contains("RLIKE similar_to_regex"), r)
    assert(r.contains("AND y > 0"), r)
    val n = rewrite("SELECT x NOT SIMILAR TO '%z' FROM t")
    assert(n.contains("NOT ((") && n.contains("RLIKE"), n)
    // ESCAPE clause is carried into the function call
    val e = rewrite("SELECT a FROM t WHERE x SIMILAR TO '%!_%' ESCAPE '!'")
    assert(e.contains("similar_to_regex(('%!_%'), '!')"), e)
    // no SIMILAR TO → byte-identical
    val plain = "SELECT similar_to_regex('x') FROM t"
    assert(rewrite(plain) eq plain)
  }

  test("end-to-end through pgSql with literal and column patterns") {
    val r = QueryDef.pgSql(spark,
      """SELECT s, s SIMILAR TO '%(ab|yz)' AS m, s SIMILAR TO p AS dyn
        |FROM VALUES ('xxab', 'x%'), ('ayz', 'a__'), ('q', 'q')
        |  t(s, p) ORDER BY s""".stripMargin).collect()
    // rows sorted: ayz, q, xxab
    assert(r.map(x => (x.getString(0), x.getBoolean(1), x.getBoolean(2)))
      .toSeq === Seq(
      ("ayz", true, true),   // 'ayz' ~ '%(ab|yz)'; dyn 'a__'
      ("q", false, true),    // dyn 'q' exact
      ("xxab", true, true))) // dyn 'x%'
    // NULL string or pattern → NULL (RLIKE 3VL)
    val n = QueryDef.pgSql(spark,
      "SELECT CAST(NULL AS STRING) SIMILAR TO 'a%'").collect()
    assert(n.head.isNullAt(0))
  }
}
