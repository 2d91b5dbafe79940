package graft

import org.scalatest.funsuite.AnyFunSuite

/** PG prepared-statement surface (reference
  * pg_lake_table/tests/pytests/test_prepared.py): PREPARE name (types)
  * AS stmt, EXECUTE with expression arguments spliced into the `$N`
  * slots, DEALLOCATE [ALL]. Covers the reference test's shapes:
  * NULL arguments, repeated/unused/out-of-order/non-contiguous
  * parameters, `$10` multi-digit refs, parameters in the SELECT list,
  * zero-parameter statements, prepared DML with RETURNING, and the
  * tokenizer guarantee that `$N` inside a string literal is content.
  */
class PreparedStatementSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private def engine(): LakeEngine = {
    val e = LakeEngine(spark)
    val df = spark.range(1, 11).selectExpr(
      "CAST(id AS INT) AS s", "concat('hello-', id) AS h")
    e.createTableAsSelect("prep_t", LakeEngine.tempLocation("prep"), df)
    e
  }

  test("int parameter lookup: values and NULL (test_prepared.py:42-56)") {
    val e = engine()
    e.sql("PREPARE int_lookup(int) AS " +
      "SELECT s FROM prep_t WHERE s = $1 ORDER BY h")
    assert(e.sql("EXECUTE int_lookup(NULL)").count() == 0)
    for (s <- 1 to 6)
      assert(e.sql(s"EXECUTE int_lookup($s)").head.getInt(0) == s)
    assert(e.sql("EXECUTE int_lookup(NULL)").count() == 0)
    e.sql("DEALLOCATE int_lookup")
    intercept[IllegalArgumentException](e.sql("EXECUTE int_lookup(1)"))
  }

  test("text parameter with expression argument (test_prepared.py:87-105)") {
    val e = engine()
    e.sql("PREPARE text_lookup(string) AS " +
      "SELECT s FROM prep_t WHERE h = $1 ORDER BY s")
    for (s <- 1 to 6)
      assert(e.sql(s"EXECUTE text_lookup(concat('hello-', $s))")
        .head.getInt(0) == s)
    // declared type casts the bound argument: an int arg arrives as text
    e.sql("PREPARE typed(string) AS SELECT $1 AS x")
    val row = e.sql("EXECUTE typed(123)")
    assert(row.schema("x").dataType.typeName == "string")
    assert(row.head.getString(0) == "123")
  }

  test("PG-spelled declared parameter types route through pgTypeName") {
    // PREPARE p(int4), p(text), p(numeric) are the reference's own
    // spellings (test_prepared.py uses PG type names throughout) —
    // the emitted CAST must be Spark-valid, not the raw PG name.
    val e = engine()
    e.sql("PREPARE pg_typed(int4, text, numeric) AS " +
      "SELECT $1 AS a, $2 AS b, $3 AS c")
    val r = e.sql("EXECUTE pg_typed(5, 'x', 1.5)")
    assert(r.schema("a").dataType.typeName == "integer")
    assert(r.schema("b").dataType.typeName == "string")
    assert(r.schema("c").dataType.typeName == "double")
    val h = r.head
    assert(h.getInt(0) == 5 && h.getString(1) == "x" &&
      math.abs(h.getDouble(2) - 1.5) < 1e-12)
    e.sql("PREPARE pg_typed2(int8, float4, bool) AS " +
      "SELECT $1 AS a, $2 AS b, $3 AS c")
    val r2 = e.sql("EXECUTE pg_typed2(6, 2.5, true)")
    assert(r2.schema("a").dataType.typeName == "long")
    assert(r2.schema("b").dataType.typeName == "float")
    assert(r2.head.getBoolean(2))
  }

  test("parameter reuse, unused, out-of-order, $10 (test_prepared.py:332+)") {
    val e = engine()
    // repeated parameter in expressions
    e.sql("PREPARE rep(int, int) AS SELECT s FROM prep_t " +
      "WHERE s = $1 AND s + 1 = $2 + $1 AND s = $2 + $1 - $2")
    assert(e.sql("EXECUTE rep(3, 1)").head.getInt(0) == 3)
    // declared-but-unused trailing parameters are allowed
    e.sql("PREPARE unused(int, int, int, int, int) AS " +
      "SELECT s FROM prep_t WHERE s = $1")
    assert(e.sql("EXECUTE unused(4, 0, 0, 0, 0)").head.getInt(0) == 4)
    // out-of-order and non-contiguous
    e.sql("PREPARE ooo(int, int, int) AS " +
      "SELECT s FROM prep_t WHERE s = $3 AND s >= $1")
    assert(e.sql("EXECUTE ooo(1, 99, 5)").head.getInt(0) == 5)
    // $10: two-digit parameter index binds the tenth argument
    e.sql("PREPARE big(int, int, int, int, int, int, int, int, int, int) " +
      "AS SELECT s FROM prep_t WHERE s = $1 AND s <= $10")
    assert(e.sql("EXECUTE big(2, 0, 0, 0, 0, 0, 0, 0, 0, 9)")
      .head.getInt(0) == 2)
    // parameters in the SELECT list; zero-parameter statements
    e.sql("PREPARE sel(int, int) AS SELECT $1 AS x, $2 AS y FROM prep_t " +
      "WHERE s = 1")
    val r = e.sql("EXECUTE sel(100, 200)").head
    assert((r.getInt(0), r.getInt(1)) == ((100, 200)))
    e.sql("PREPARE zero AS SELECT count(*) AS n FROM prep_t")
    assert(e.sql("EXECUTE zero").head.getLong(0) == 10)
  }

  test("$N inside string literals is content, not a parameter") {
    val e = engine()
    e.sql("PREPARE lit(int) AS SELECT '$1 costs $2' AS msg, $1 AS v")
    val r = e.sql("EXECUTE lit(7)").head
    assert(r.getString(0) == "$1 costs $2")
    assert(r.getInt(1) == 7)
    // too few arguments for the referenced parameters errors loudly
    intercept[IllegalArgumentException](e.sql("EXECUTE lit()"))
  }

  test("prepared INSERT…RETURNING doubles rows per call (test_prepared.py:456+)") {
    val e = engine()
    val df = spark.range(1).selectExpr("'hello' AS x")
    e.createTableAsSelect("prep_ins", LakeEngine.tempLocation("prepins"), df)
    e.sql("PREPARE foo(string) AS INSERT INTO prep_ins " +
      "SELECT * FROM prep_ins WHERE x = $1 RETURNING x")
    for (i <- 0 until 4)
      assert(e.sql("EXECUTE foo('hello')").count() == (1L << i))
    assert(e.sql("EXECUTE foo(NULL)").count() == 0)
    assert(e.sql("SELECT count(*) FROM prep_ins").head.getLong(0) == 16)
  }

  test("duplicate PREPARE rejected; DEALLOCATE ALL clears") {
    val e = engine()
    e.sql("PREPARE dup AS SELECT 1")
    intercept[IllegalArgumentException](e.sql("PREPARE dup AS SELECT 2"))
    e.sql("PREPARE other AS SELECT 3")
    e.sql("DEALLOCATE ALL")
    intercept[IllegalArgumentException](e.sql("EXECUTE dup"))
    intercept[IllegalArgumentException](e.sql("EXECUTE other"))
    intercept[IllegalArgumentException](e.sql("DEALLOCATE dup"))
  }
}
