package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CSV option matrix (dialect sniffing, explicit columns, headerless
  * naming, PG-compatible writer quoting) and schema-inference DDL
  * (definition_from / load_from).
  */
class CsvDdlSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def writeCsv(body: String): String = {
    val dir = Files.createTempDirectory("csv")
    Files.write(dir.resolve("data.csv"), body.getBytes)
    dir.toString + "/data.csv"
  }

  test("csv sniffing: semicolon + single-quote dialect detected") {
    val e = LakeEngine(spark)
    val p = writeCsv(
      "id;name;score\n1;'alpha;beta';2.5\n2;plain;3.0\n3;'q''d';4.5\n")
    val df = e.createLakeTable("sniff_semi", p, format = Some("csv"))
    assert(df.columns.toSeq == Seq("id", "name", "score"))
    assert(df.count() == 3)
    val byId = df.collect().map(r => r.getAs[Number]("id").intValue() ->
      r.getAs[String]("name")).toMap
    assert(byId(1) == "alpha;beta", "quoted delimiter must not split")
    assert(byId(3) == "q'd", "doubled quote must unescape")
  }

  test("csv sniffing: tab delimiter, headerless -> column0..N") {
    val e = LakeEngine(spark)
    val p = writeCsv("1\ta\t10\n2\tb\t20\n3\tc\t30\n")
    val df = e.createLakeTable("sniff_tab", p, format = Some("csv"))
    assert(df.columns.toSeq == Seq("column0", "column1", "column2"),
      s"headerless names were ${df.columns.toSeq}")
    assert(df.count() == 3)
    assert(df.agg(sum("column2")).head.getAs[Number](0).longValue() == 60L)
  }

  test("explicit columns option fixes names and PG types, no inference") {
    val e = LakeEngine(spark)
    val p = writeCsv("1,x,2020-01-05\n2,y,2021-06-07\n")
    val df = e.createLakeTable("cols_csv", p, format = Some("csv"),
      options = Map("header" -> "false",
        "columns" -> "id int8, label text, d date"))
    assert(df.schema.map(f => (f.name, f.dataType.sql.toLowerCase)).toSeq ==
      Seq("id" -> "bigint", "label" -> "string", "d" -> "date"))
    assert(df.filter(col("d") === lit("2021-06-07").cast("date")).count() == 1)
  }

  test("writer quoting: doubled quotes, null vs empty, roundtrip") {
    val e = LakeEngine(spark)
    import spark.implicits._
    val src = Seq((1, "say \"hi\""), (2, null), (3, "")).toDF("id", "s")
    val out = Files.createTempDirectory("csvout").toString + "/o.csv"
    e.copyTo(src, out)
    // raw bytes: PG quoting — doubled quote, bare null, quoted empty
    val raw = {
      val d = java.nio.file.Paths.get(out)
      val part = Files.list(d).iterator()
      var text = ""
      while (part.hasNext) {
        val p = part.next()
        if (p.toString.endsWith(".csv"))
          text += new String(Files.readAllBytes(p))
      }
      text
    }
    assert(raw.contains("\"say \"\"hi\"\"\""),
      s"expected doubled-quote escaping, got:\n$raw")
    // roundtrip through the sniffing reader preserves all three shapes
    val back = e.createLakeTable("csv_rt", out, format = Some("csv"))
    assert(back.count() == 3)
    assert(back.filter(col("s") === "say \"hi\"").count() == 1)
    assert(back.filter(col("s").isNull).count() >= 1)
  }

  test("createTableFrom: load_from infers parquet schema and loads") {
    val e = LakeEngine(spark)
    val src = Tables.df(spark, sf, "nation")
    val t = e.createTableFrom("ddl_nation", LakeEngine.tempLocation("ddl1"),
      s"$sf/nation.parquet")
    assert(t.meta.sparkSchema.fieldNames.toSeq ==
      src.schema.fieldNames.toSeq)
    assert(t.read().count() == src.count())
    assert(t.read().exceptAll(src).isEmpty)
  }

  test("createTableFrom: definition_from csv creates empty typed table") {
    val e = LakeEngine(spark)
    val p = writeCsv("id,name,score\n1,a,1.5\n2,b,2.5\n")
    val t = e.createTableFrom("ddl_def", LakeEngine.tempLocation("ddl2"),
      p, load = false, format = Some("csv"))
    assert(t.read().isEmpty, "definition_from must not load rows")
    val types = t.meta.sparkSchema.map(f =>
      f.name -> f.dataType.sql.toLowerCase).toMap
    assert(types("id") == "int" || types("id") == "bigint")
    assert(types("name") == "string")
    assert(types("score") == "double")
    // and it is a real transactional table: DML works
    t.append(t.read().sparkSession.sql("SELECT 7 AS id, 'z' AS name, " +
      "9.5 AS score").selectExpr("CAST(id AS INT)", "name",
      "CAST(score AS DOUBLE)"))
    assert(t.read().count() == 1)
  }

  test("SQL DDL: CREATE TABLE ... WITH (load_from = url)") {
    val e = LakeEngine(spark)
    val n = e.sql("CREATE TABLE sql_region WITH (load_from = " +
      s"'$sf/region.parquet')").head.getLong(0)
    assert(n == Tables.df(spark, sf, "region").count())
    // registered: immediately queryable through SQL
    assert(e.sql("SELECT count(*) FROM sql_region").head.getLong(0) == n)
  }

  test("US-style date STRING in a text column never poisons a date column") {
    // reference regression test_csv_date_format.py: a '12/25/2020'
    // text value on the same row as a real ISO date column must not
    // flip the reader's date format for the whole file — the text
    // column keeps its bytes, the date column parses ISO
    val e = LakeEngine(spark)
    val dir = java.nio.file.Files.createTempDirectory("csvdate")
    java.nio.file.Files.write(dir.resolve("d.csv"),
      "txt,d\n12/25/2020,2021-03-10\n01/02/2003,1999-12-31\n"
        .getBytes("UTF-8"))
    val t = e.createLakeTable("csv_usdate", dir.resolve("d.csv").toString,
      format = Some("csv"),
      options = Map("header" -> "true", "columns" -> "txt text, d date"))
    val rows = t.orderBy("d").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("01/02/2003", "12/25/2020"))
    assert(rows.map(_.getDate(1).toString).toSeq ==
      Seq("1999-12-31", "2021-03-10"))
  }
}
