package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** PG json operators `->` `->>` `#>` `#>>` (reference
  * pg_lake_table/tests/pytests/test_jsonb_pushdown.py uses them
  * directly) — the [[graft.plans.JsonArrowRewrite]] SQL pass plus the
  * [[graft.functions.JsonOps]] expressions, and the `encode`/`decode`
  * bytea formats (test_encode_decode_pushdown.py).
  */
class JsonOpsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private def one(sql: String): Row = QueryDef.pgSql(spark, sql).head()

  test("-> selects as json; ->> as text; missing and scalars are NULL") {
    val r = one(
      """SELECT
        |  '{"a":{"b":[10,20,30]},"s":"hi","n":null}' -> 'a' AS obj,
        |  '{"s":"hi"}' -> 's' AS str_json,
        |  '{"s":"hi"}' ->> 's' AS str_text,
        |  '{"a":1}' -> 'missing' AS miss,
        |  '{"n":null}' ->> 'n' AS null_text,
        |  '{"n":null}' -> 'n' AS null_json,
        |  '"scalar"' -> 'k' AS scalar_in,
        |  'not json' ->> 'k' AS malformed""".stripMargin)
    assert(r.getString(0) == """{"b":[10,20,30]}""")
    assert(r.getString(1) == "\"hi\"") // -> keeps quotes
    assert(r.getString(2) == "hi") // ->> unquotes
    assert(r.isNullAt(3)) // missing key
    assert(r.isNullAt(4)) // json null ->> SQL NULL
    assert(r.getString(5) == "null") // -> renders json null
    assert(r.isNullAt(6)) // non-container input
    assert(r.isNullAt(7)) // malformed input: NULL, not error
  }

  test("integer right operand indexes arrays, PG overload") {
    val r = one(
      """SELECT
        |  '[5,6,7]' -> 0 AS i0,
        |  '[5,6,7]' ->> 2 AS i2,
        |  '[5,6,7]' -> 9 AS oob,
        |  '{"k":1}' -> 0 AS obj_by_idx""".stripMargin)
    assert(r.getString(0) == "5")
    assert(r.getString(1) == "7")
    assert(r.isNullAt(2)) // out of bounds
    assert(r.isNullAt(3)) // integer key on an object: PG jsonb NULL
  }

  test("negative from-the-end index via the expression API (PG jsonb rule)") {
    // SQL-level `-> -1` is not rewritten (the tokenizer's `-` is an
    // operator); the expression itself follows PG: -1 = last element
    import org.apache.spark.sql.{functions => F}
    import org.apache.spark.sql.GraftBridge.{column, expression}
    val c = column(graft.functions.JsonArrow(
      expression(F.lit("[5,6,7]")), expression(F.lit(-1)), asText = true))
    assert(spark.range(1).select(c.as("v")).head.getString(0) == "7")
  }

  test("#> / #>> navigate paths; arrays index; mismatch is NULL") {
    val r = one(
      """SELECT
        |  '{"a":{"b":[10,20,30]}}' #> '{a,b}' AS arr,
        |  '{"a":{"b":[10,20,30]}}' #>> '{a,b,1}' AS elem,
        |  '{"a":{"b":[10,20,30]}}' #>> '{a,b,-1}' AS from_end,
        |  '{"a":1}' #>> '{a,b}' AS too_deep,
        |  '{"a":{"b":2}}' #>> '{}' AS empty_path""".stripMargin)
    assert(r.getString(0) == "[10,20,30]")
    assert(r.getString(1) == "20")
    assert(r.getString(2) == "30") // negative = from the end (PG jsonb)
    assert(r.isNullAt(3))
    assert(r.getString(4) == """{"a":{"b":2}}""")
  }

  test("arrows chain and bind tighter than comparison") {
    val r = one(
      """SELECT
        |  '{"o":{"arr":[1,2]}}' -> 'o' -> 'arr' ->> 0 AS chained,
        |  ('{"k":5}' ->> 'k') = '5' AS cmp""".stripMargin)
    assert(r.getString(0) == "1")
    assert(r.getBoolean(1))
  }

  test("rewrite leaves Spark lambdas alone") {
    // `->` with a non-literal RHS is Spark's lambda arrow, untouched
    val r = one("SELECT transform(array(1, 2, 3), x -> x + 1) AS v")
    assert(r.getSeq[Int](0) == Seq(2, 3, 4))
  }

  test("encode/decode: hex lowercase, base64, escape octal round-trips") {
    val r = one(
      """SELECT
        |  encode('AB z'::bytea, 'hex') AS hex,
        |  encode('AB z'::bytea, 'base64') AS b64,
        |  CAST(decode('4142207a', 'hex') AS STRING) AS unhex,
        |  CAST(decode('QUIgeg==', 'base64') AS STRING) AS unb64,
        |  encode(decode('ab\\134\\012', 'escape'), 'hex') AS esc_dec,
        |  encode('a'::bytea, 'escape') AS esc_plain""".stripMargin)
    assert(r.getString(0) == "4142207a") // PG lowercase hex
    assert(r.getString(1) == "QUIgeg==")
    assert(r.getString(2) == "AB z")
    assert(r.getString(3) == "AB z")
    assert(r.getString(4) == "61625c0a") // \134 = backslash, \012 = LF
    assert(r.getString(5) == "a")
    // escape encodes non-printables as 3-digit octal and doubles '\'
    val enc = org.apache.spark.sql.GraftBridge.column(
      graft.functions.PgEscapeEncode(org.apache.spark.sql.GraftBridge
        .expression(org.apache.spark.sql.functions.lit(Array[Byte](92, 10, 65)))))
    assert(spark.range(1).select(enc).head.getString(0) == "\\\\\\012A")
    intercept[Exception](one("SELECT decode('zz', 'hex') AS v"))
    intercept[Exception](one("SELECT encode('a'::bytea, 'rot13') AS v"))
  }
}
