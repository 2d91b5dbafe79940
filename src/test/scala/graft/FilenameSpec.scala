package graft

import graft.sources.{HttpSource, S3Source}
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The `filename 'true'` foreign-table option (reference
  * test_filename.py, create_table.c:509-556): the appended column is
  * spelled `_filename`, carries the SOURCE URL the user named (not an
  * engine-internal staged path), and a declared schema must list it as
  * `_filename text`.
  */
class FilenameSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark

  /** Single-region anonymous path-style S3 fixture: GET serves objects,
    * `?list-type=2` answers a minimal ListObjectsV2 document.
    */
  private def withS3(objects: Map[String, Array[Byte]])
      (body: => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath.stripPrefix("/")
      val query = Option(ex.getRequestURI.getQuery).getOrElse("")
      val out =
        if (query.contains("list-type=2")) {
          val prefix = query.split("&").collectFirst {
            case q if q.startsWith("prefix=") =>
              java.net.URLDecoder.decode(q.drop(7), "UTF-8")
          }.getOrElse("")
          val entries = objects.keys.toSeq.sorted
            .filter(_.startsWith(prefix))
            .map(k => s"<Contents><Key>$k</Key>" +
              s"<Size>${objects(k).length}</Size></Contents>")
          Some(("<?xml version=\"1.0\"?><ListBucketResult>" +
            entries.mkString + "</ListBucketResult>").getBytes("UTF-8"))
        } else objects.get(path.split("/", 2).lift(1).getOrElse(""))
      out match {
        case Some(bytes) =>
          ex.sendResponseHeaders(200, bytes.length.toLong)
          ex.getResponseBody.write(bytes)
        case None => ex.sendResponseHeaders(404, -1)
      }
      ex.close()
    })
    server.start()
    val dir = Files.createTempDirectory("graft-filename-spec")
    System.setProperty("graft.http.cache.dir", dir.toString)
    System.setProperty("graft.s3.endpoint",
      s"http://127.0.0.1:${server.getAddress.getPort}")
    S3Source.clearRegionCache()
    try body
    finally {
      server.stop(0)
      System.clearProperty("graft.http.cache.dir")
      System.clearProperty("graft.s3.endpoint")
      S3Source.clearRegionCache()
    }
  }

  test("_filename carries the original s3 URL, single file and wildcard") {
    val csv1 = "id,v\n1,a\n2,b\n".getBytes("UTF-8")
    val csv2 = "id,v\n3,c\n".getBytes("UTF-8")
    withS3(Map("ev/d1.csv" -> csv1, "ev/d2.csv" -> csv2)) {
      val e = LakeEngine(spark)
      val one = e.createLakeTable("fn_one", "s3://bkt/ev/d1.csv",
        format = Some("csv"), filenameColumn = true)
      assert(one.select("_filename").distinct().collect()
        .map(_.getString(0)).toSeq == Seq("s3://bkt/ev/d1.csv"))

      val multi = e.createLakeTable("fn_multi", "s3://bkt/ev/*.csv",
        format = Some("csv"), filenameColumn = true)
      assert(multi.count() == 3)
      assert(multi.select("_filename").distinct().collect()
        .map(_.getString(0)).toSet ==
        Set("s3://bkt/ev/d1.csv", "s3://bkt/ev/d2.csv"))
      // filter on the column isolates one file's rows
      assert(multi.filter(col("_filename") === "s3://bkt/ev/d2.csv")
        .count() == 1)
    }
  }

  test("declared schema: _filename must be present and text") {
    val p = Files.createTempDirectory("fn-ddl")
    val f = p.resolve("x.csv")
    Files.write(f, "id,v\n7,z\n".getBytes("UTF-8"))
    val e = LakeEngine(spark)
    val good = e.createLakeTable("fn_decl", f.toString,
      format = Some("csv"),
      schema = Some(StructType(Seq(
        StructField("id", IntegerType), StructField("v", StringType),
        StructField("_filename", StringType)))),
      filenameColumn = true)
    assert(good.columns.toSeq == Seq("id", "v", "_filename"))
    assert(good.select("_filename").first().getString(0) == f.toString)

    val noCol = intercept[IllegalArgumentException] {
      e.createLakeTable("fn_bad1", f.toString, format = Some("csv"),
        schema = Some(StructType(Seq(StructField("id", IntegerType)))),
        filenameColumn = true)
    }
    assert(noCol.getMessage.contains("no _filename column found"))

    val badType = intercept[IllegalArgumentException] {
      e.createLakeTable("fn_bad2", f.toString, format = Some("csv"),
        schema = Some(StructType(Seq(
          StructField("id", IntegerType),
          StructField("_filename", IntegerType)))),
        filenameColumn = true)
    }
    assert(badType.getMessage.contains("_filename column must have type text"))

    // position matters (reference ErrorIfInvalidFilenameColumn):
    // a mid-list _filename would shift CSV's position-mapped columns
    val midList = intercept[IllegalArgumentException] {
      e.createLakeTable("fn_bad3", f.toString, format = Some("csv"),
        schema = Some(StructType(Seq(
          StructField("id", IntegerType),
          StructField("_filename", StringType),
          StructField("v", StringType)))),
        filenameColumn = true)
    }
    assert(midList.getMessage.contains(
      "the last column must be _filename text"))
  }
}
