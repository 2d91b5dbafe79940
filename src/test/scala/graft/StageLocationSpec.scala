package graft

import java.net.InetSocketAddress
import java.nio.file.Files

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

/** `@STAGE/` URL resolution + the `pg_lake.stage_location` GUC
  * (reference test_stage_location_integration.py; GUC check hook
  * init.c PgLakeStageLocationCheckHook, resolution
  * copy_format.c ResolveStageURL): a path starting with `@STAGE/`
  * resolves against the configured bucket URL before scheme
  * detection/validation, across lake_file.list/size/exists/preview,
  * COPY, and foreign-table paths. Also covers the lake_file.size /
  * lake_file.exists scalar surfaces themselves.
  */
class StageLocationSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** Minimal anonymous az fixture (the AzSourceSpec shape without the
    * SAS check — auth is covered there; this spec is about URL
    * resolution).
    */
  private class AzLite(account: String, container: String) {
    val store = new scala.collection.concurrent.TrieMap[String, Array[Byte]]()
    val server: HttpServer =
      HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    private def respond(ex: HttpExchange, code: Int,
        body: Array[Byte]): Unit = {
      ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
      if (body.nonEmpty) ex.getResponseBody.write(body)
      ex.close()
    }
    server.createContext(s"/$account/$container", { ex =>
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      val params = q.split("&").filter(_.nonEmpty).map(_.split("=", 2))
        .map(a => a(0) -> a.lift(1).getOrElse("")).toMap
      def key = ex.getRequestURI.getPath
        .stripPrefix(s"/$account/$container").stripPrefix("/")
      if (ex.getRequestMethod == "PUT") {
        store.put(key, ex.getRequestBody.readAllBytes())
        respond(ex, 201, Array.empty)
      } else if (params.get("comp").contains("list")) {
        val prefix = java.net.URLDecoder.decode(
          params.getOrElse("prefix", ""), "UTF-8")
        val xml = ("<?xml version=\"1.0\"?><EnumerationResults><Blobs>" +
          store.keys.toSeq.sorted.filter(_.startsWith(prefix)).map(k =>
            s"<Blob><Name>$k</Name><Properties><Content-Length>" +
              s"${store(k).length}</Content-Length></Properties></Blob>")
            .mkString + "</Blobs></EnumerationResults>").getBytes("UTF-8")
        respond(ex, 200, xml)
      } else store.get(key) match {
        case Some(b) => respond(ex, 200, b)
        case None => respond(ex, 404, Array.empty)
      }
    })
    server.start()
    def endpoint: String =
      s"http://127.0.0.1:${server.getAddress.getPort}/{account}/{container}"
  }

  private def withAz(body: AzLite => Unit): Unit = {
    val f = new AzLite("acct1", "cont1")
    val dir = Files.createTempDirectory("graft-stage-spec")
    System.setProperty("graft.http.cache.dir", dir.toString)
    System.setProperty("graft.az.endpoint", f.endpoint)
    System.setProperty("graft.az.account", "acct1")
    try body(f)
    finally {
      f.server.stop(0)
      Seq("graft.http.cache.dir", "graft.az.endpoint", "graft.az.account")
        .foreach(System.clearProperty)
    }
  }

  test("GUC validation: cloud URLs accepted verbatim, garbage refused") {
    val e = LakeEngine(spark)
    // valid schemes round-trip through SHOW, trailing slash preserved
    for (u <- Seq("s3://test-bucket/data", "gs://test-bucket/prefix",
      "abfss://container@account.dfs.core.windows.net/path",
      "s3://test-bucket/prefix/")) {
      e.sql(s"SET pg_lake.stage_location TO '$u'")
      assert(e.sql("SHOW pg_lake.stage_location").head.getString(0) == u)
    }
    // http/https and non-URLs refuse with the reference's wording
    for (bad <- Seq("http://test-bucket/data", "https://x/y", "/local/dir")) {
      val ex = intercept[IllegalArgumentException](
        e.sql(s"SET pg_lake.stage_location TO '$bad'"))
      assert(ex.getMessage.contains("invalid value for parameter"))
      assert(ex.getMessage.contains("must be a valid cloud storage URL"))
    }
    // query parameters refuse
    val exQ = intercept[IllegalArgumentException](
      e.sql("SET pg_lake.stage_location TO 's3://bucket?region=us-east-1'"))
    assert(exQ.getMessage.contains("cannot contain query parameters"))
    // TO DEFAULT unsets; using @STAGE/ afterwards is the config error
    e.sql("SET pg_lake.stage_location TO DEFAULT")
    val exU = intercept[IllegalArgumentException](
      e.sql("SELECT lake_file.size('@STAGE/test.parquet')"))
    assert(exU.getMessage.contains(
      "@STAGE/ URL prefix used but pg_lake.stage_location is not configured"))
    assert(exU.getMessage.contains(
      "Set pg_lake.stage_location to your bucket URL"))
  }

  test("@STAGE/ resolves across list/size/exists/preview/COPY/foreign") {
    withAz { f =>
      val e = LakeEngine(spark)
      e.sql("SET pg_lake.stage_location TO 'az://cont1/sub'")
      try {
        // COPY TO through @STAGE/ lands under the resolved prefix
        e.copyTo(Seq((1L, "a"), (2L, "b")).toDF("id", "s"),
          "@STAGE/out.csv")
        assert(f.store.contains("sub/out.csv"),
          s"COPY TO @STAGE/ missed: ${f.store.keys.toSeq}")
        // list: resolved az:// paths, never @STAGE/
        val listed = e.sql("SELECT path FROM lake_file.list('@STAGE/*.csv')")
          .collect().map(_.getString(0)).toSeq
        assert(listed == Seq("az://cont1/sub/out.csv"), listed.toString)
        // size/exists through @STAGE/ equal the direct URL
        val sz = e.sql("SELECT lake_file.size('@STAGE/out.csv')")
          .head.getLong(0)
        assert(sz == f.store("sub/out.csv").length.toLong)
        assert(e.sql("SELECT lake_file.size('az://cont1/sub/out.csv')")
          .head.getLong(0) == sz)
        assert(e.sql("SELECT lake_file.exists('@STAGE/out.csv')")
          .head.getBoolean(0))
        assert(!e.sql("SELECT lake_file.exists('@STAGE/nope.csv')")
          .head.getBoolean(0))
        // preview through @STAGE/
        val cols = e.sql(
          "SELECT * FROM lake_file.preview('@STAGE/out.csv', 'csv')")
          .collect().map(_.getString(0)).toSeq
        assert(cols == Seq("id", "s"))
        // foreign table through @STAGE/ reads the data back
        val t = e.createLakeTable("stage_ft", "@STAGE/out.csv",
          format = Some("csv"))
        assert(t.count() == 2)
        // trailing slash on the GUC must not double the separator
        e.sql("SET pg_lake.stage_location TO 'az://cont1/sub/'")
        assert(e.sql("SELECT lake_file.exists('@STAGE/out.csv')")
          .head.getBoolean(0))
      } finally e.sql("SET pg_lake.stage_location TO DEFAULT")
    }
  }

  test("@STAGE only resolves as a leading prefix with its slash") {
    val e = LakeEngine(spark)
    e.sql("SET pg_lake.stage_location TO 's3://bkt/prefix'")
    try {
      // @STAGE without the slash is NOT a stage URL: it falls through
      // to normal path handling (a nonexistent relative file), never
      // the stage-config error path
      val ex = intercept[Exception](
        e.sql("SELECT lake_file.size('@STAGEtest.parquet')"))
      assert(!ex.getMessage.contains("stage_location"), ex.getMessage)
      // mid-path @STAGE/ stays literal (the URL keeps its own scheme)
      val ex2 = intercept[Exception](
        e.sql("SELECT lake_file.size('file:///nonexistent/@STAGE/x')"))
      assert(!ex2.getMessage.contains("stage_location"), ex2.getMessage)
    } finally e.sql("SET pg_lake.stage_location TO DEFAULT")
  }
}
