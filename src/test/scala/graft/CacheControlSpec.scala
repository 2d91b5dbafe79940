package graft

import graft.sources.{HttpSource, S3Source}
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** The `lake_file_cache` control surface (reference test_caching.py):
  * `add(url)` pre-warms, `list()` reports (path, file_size),
  * `remove(url)` evicts and reports bytes freed; reads serve the
  * cached copy until eviction; COPY TO over a cached URL invalidates
  * it (write-through); invalid URLs refuse with the reference's
  * wording.
  */
class CacheControlSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  /** Mutable single-region anonymous S3 fixture. */
  private class Store(var objects: Map[String, Array[Byte]]) {
    val server: HttpServer =
      HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val key = ex.getRequestURI.getPath.stripPrefix("/")
        .split("/", 2).lift(1).getOrElse("")
      if (ex.getRequestMethod == "PUT") {
        val body = ex.getRequestBody.readAllBytes()
        this.synchronized { objects += key -> body }
        ex.sendResponseHeaders(200, -1)
      } else objects.get(key) match {
        case Some(bytes) =>
          ex.sendResponseHeaders(200, bytes.length.toLong)
          ex.getResponseBody.write(bytes)
        case None => ex.sendResponseHeaders(404, -1)
      }
      ex.close()
    })
    server.start()
    def endpoint = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  private def withStore(objects: Map[String, Array[Byte]])
      (body: Store => Unit): Unit = {
    val f = new Store(objects)
    val dir = Files.createTempDirectory("graft-cachectl")
    System.setProperty("graft.http.cache.dir", dir.toString)
    System.setProperty("graft.s3.endpoint", f.endpoint)
    S3Source.clearRegionCache()
    try body(f)
    finally {
      f.server.stop(0)
      System.clearProperty("graft.http.cache.dir")
      System.clearProperty("graft.s3.endpoint")
      S3Source.clearRegionCache()
    }
  }

  test("add caches; list reports size; stale reads until remove") {
    val v100 = (1 to 100).mkString("", "\n", "\n").getBytes("UTF-8")
    val v50 = (1 to 50).mkString("", "\n", "\n").getBytes("UTF-8")
    withStore(Map("c/data.csv" -> v100)) { f =>
      val e = LakeEngine(spark)
      val url = "s3://bkt/c/data.csv"
      assert(e.sql(s"SELECT lake_file_cache.add('$url')")
        .first().getLong(0) == v100.length.toLong)
      // list() carries the URL and the true cached size
      val listed = e.sql("SELECT file_size FROM lake_file_cache.list() " +
        s"WHERE path = '$url'").collect()
      assert(listed.length == 1 && listed(0).getLong(0) == v100.length)
      def readCount(view: String): Long =
        e.createLakeTable(view, url, format = Some("csv"),
          options = Map("header" -> "false")).count()
      assert(readCount("cache_t1") == 100)
      // upstream changes; the cached copy still serves (TTL-fresh)
      f.synchronized { f.objects += "c/data.csv" -> v50 }
      assert(readCount("cache_t2") == 100)
      // remove evicts and reports the bytes freed
      assert(e.sql(s"SELECT lake_file_cache.remove('$url')")
        .first().getLong(0) == v100.length.toLong)
      assert(e.sql("SELECT * FROM lake_file_cache.list()").count() == 0)
      // next read re-fetches the new bytes
      assert(readCount("cache_t3") == 50)
    }
  }

  test("COPY TO a cached URL invalidates the entry (write-through)") {
    withStore(Map.empty) { f =>
      val e = LakeEngine(spark)
      import spark.implicits._
      val url = "s3://bkt/w/out.csv"
      Seq(1, 2, 3).toDF("a").createOrReplaceTempView("cache_src3")
      e.sql(s"COPY cache_src3 TO '$url' WITH (header 'false')")
      assert(e.createLakeTable("cache_w1", url, format = Some("csv"),
        options = Map("header" -> "false")).count() == 3)
      // second COPY to the SAME url: the cached entry must not
      // survive and serve the old three rows
      Seq(1, 2).toDF("a").createOrReplaceTempView("cache_src2")
      e.sql(s"COPY cache_src2 TO '$url' WITH (header 'false')")
      assert(e.createLakeTable("cache_w2", url, format = Some("csv"),
        options = Map("header" -> "false")).count() == 2)
    }
  }

  test("invalid URLs refuse with the reference wording") {
    val e = LakeEngine(spark)
    def msg(sql: String): String =
      intercept[IllegalArgumentException](e.sql(sql)).getMessage
    assert(msg("SELECT lake_file_cache.add('/tmp/local.csv')")
      .contains("URL cannot be cached"))
    assert(msg("SELECT lake_file_cache.add('nocaches3://bkt/x.csv')")
      .contains("URL cannot be cached"))
    assert(msg("SELECT lake_file_cache.add('s3://bkt/c/*.csv')")
      .contains("cannot cache paths with wildcard"))
    assert(msg("SELECT lake_file_cache.add('s3://bkt/c/data[0-9].csv')")
      .contains("cannot cache paths with wildcard"))
    assert(msg("SELECT lake_file_cache.remove('s3://bkt/c/*.csv')")
      .contains("cannot cache paths with wildcard"))
    // a missing object is a loud NOT FOUND, not a silent no-op
    withStore(Map.empty) { _ =>
      assert(msg("SELECT lake_file_cache.add('s3://bkt/missing/x.csv')")
        .contains("NOT FOUND"))
    }
  }
}
