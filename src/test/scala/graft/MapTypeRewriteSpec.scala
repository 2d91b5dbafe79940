package graft

import graft.plans.MapTypeRewrite
import org.scalatest.funsuite.AnyFunSuite

/** `map_type.*` spellings + the `->` operator on MAP columns
  * (reference pg_map extension, test_map_extract.py).
  */
class MapTypeRewriteSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  test("token rewrite: names map, literals and unknowns don't") {
    assert(MapTypeRewrite.rewrite("SELECT map_type.extract(m, 'k')") ==
      "SELECT element_at(m, 'k')")
    assert(MapTypeRewrite.rewrite(
      "SELECT map_type.cardinality(m), map_type.entries(m)") ==
      "SELECT cardinality(m), map_entries(m)")
    // inside a string literal: untouched
    val lit = "SELECT 'map_type.extract(m)' AS s"
    assert(MapTypeRewrite.rewrite(lit) == lit)
    // quoted identifier: untouched
    val q = "SELECT \"map_type\".extract(m, 'k')"
    assert(MapTypeRewrite.rewrite(q) == q)
    // unknown member: untouched (fails analysis loudly downstream)
    val u = "SELECT map_type.frobnicate(m)"
    assert(MapTypeRewrite.rewrite(u) == u)
    // spaced dot is not the qualified spelling
    val sp = "SELECT map_type . extract(m, 'k')"
    assert(MapTypeRewrite.rewrite(sp) == sp)
  }

  test("arrow on a MAP column returns the value type") {
    val e = LakeEngine(spark)
    val df = e.sql(
      """SELECT (m -> 'a') AS v, map_type.extract(m, 'b') AS w,
        |  (m -> 'zz') AS miss
        |FROM (SELECT map('a', 10, 'b', 20) AS m)""".stripMargin)
    val r = df.first()
    assert(r.getInt(0) == 10 && r.getInt(1) == 20 && r.isNullAt(2))
    // json strings still take the json path
    val j = e.sql(
      """SELECT ('{"a": {"b": 7}}' -> 'a') ->> 'b' AS v""").first()
    assert(j.getString(0) == "7")
  }

  test("numeric keys match across widths (int literal vs bigint key)") {
    val e = LakeEngine(spark)
    // the literal 5 is an INT; the map key type is BIGINT — the probe
    // must normalize to the map's key type or boxed == never matches
    val r = e.sql(
      """SELECT (m -> 5) AS v, (m -> 99) AS miss
        |FROM (SELECT map(cast(5 AS bigint), 'five') AS m)""".stripMargin)
      .first()
    assert(r.getString(0) == "five", s"int-vs-long key lookup: $r")
    assert(r.isNullAt(1))
    // decimal-keyed map probed with an int literal
    val r3 = e.sql(
      """SELECT (m -> 3) AS v
        |FROM (SELECT map(cast(3.0 AS decimal(5,1)), 'three') AS m)"""
        .stripMargin).first()
    assert(r3.getString(0) == "three")
  }
}
