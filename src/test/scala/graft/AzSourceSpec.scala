package graft

import java.net.InetSocketAddress
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{AzSource, HttpSource}

/** az:// / abfss:// object storage (sources/AzSource): the Azure leg
  * of the reference's caching filesystem
  * (duckdb_pglake/src/fs/file_cache_manager.cpp:225-227 accepts
  * azure://, az://, abfss://; the build links the Azure SDK). The SAS
  * token is validated SERVER-side by the fixture — the SigV4 fixture
  * pattern: a client that fails to attach the token (or attaches a
  * wrong one) gets 403, so auth is proven on the wire, not assumed.
  */
class AzSourceSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  /** Path-style fixture: /{account}/{container}/{key}, List Blobs at
    * ?restype=container&comp=list with NextMarker paging, SAS check
    * on every request.
    */
  private class AzFixture(account: String, container: String,
      blobs: Map[String, Array[Byte]], sas: Option[String],
      pageSize: Int = 1000) {
    val hits = new AtomicInteger(0)
    val denied = new AtomicInteger(0)
    val blockPuts = new AtomicInteger(0)
    val store = new scala.collection.concurrent.TrieMap[String, Array[Byte]]()
    private val blocks = new scala.collection.concurrent.TrieMap[
      (String, String), Array[Byte]]()
    store ++= blobs
    val server: HttpServer =
      HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)

    private def respond(ex: HttpExchange, code: Int,
        body: Array[Byte]): Unit = {
      ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
      if (body.nonEmpty) ex.getResponseBody.write(body)
      ex.close()
    }

    server.createContext(s"/$account/$container", { ex =>
      hits.incrementAndGet()
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      val params = q.split("&").filter(_.nonEmpty).map(_.split("=", 2))
        .map(a => a(0) -> (if (a.length > 1)
          java.net.URLDecoder.decode(a(1), "UTF-8") else "")).toMap
      // server-side SAS verification: sv + sig must match exactly
      val authed = sas.forall { s =>
        val want = s.split("&").map(_.split("=", 2))
          .map(a => a(0) -> a.lift(1).getOrElse("")).toMap
        want.forall { case (k, v) => params.get(k).contains(v) }
      }
      if (!authed) { denied.incrementAndGet(); respond(ex, 403, Array.empty) }
      else if (ex.getRequestMethod == "PUT" &&
          params.get("comp").contains("block")) {
        // Put Block: staged under (blob, blockid), SAS-checked above
        val key = ex.getRequestURI.getPath
          .stripPrefix(s"/$account/$container").stripPrefix("/")
        blockPuts.incrementAndGet()
        blocks.put((key, params("blockid")),
          ex.getRequestBody.readAllBytes())
        respond(ex, 201, Array.empty)
      } else if (ex.getRequestMethod == "PUT" &&
          params.get("comp").contains("blocklist")) {
        // Put Block List: commit in the client's declared order,
        // refusing ids never staged
        val key = ex.getRequestURI.getPath
          .stripPrefix(s"/$account/$container").stripPrefix("/")
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        val ids = "<Latest>([^<]+)</Latest>".r
          .findAllMatchIn(body).map(_.group(1)).toSeq
        if (ids.isEmpty || ids.exists(i => !blocks.contains((key, i))))
          respond(ex, 400, Array.empty)
        else {
          store.put(key, ids.flatMap(i => blocks((key, i))).toArray)
          respond(ex, 201, Array.empty)
        }
      } else if (ex.getRequestMethod == "PUT") {
        val key = ex.getRequestURI.getPath
          .stripPrefix(s"/$account/$container").stripPrefix("/")
        store.put(key, ex.getRequestBody.readAllBytes())
        respond(ex, 201, Array.empty)
      } else if (params.get("comp").contains("list")) {
        val prefix = params.getOrElse("prefix", "")
        val all = store.keys.toSeq.sorted.filter(_.startsWith(prefix))
        val from = params.get("marker").filter(_.nonEmpty)
          .map(_.toInt).getOrElse(0)
        val page = all.slice(from, from + pageSize)
        val next = if (from + pageSize < all.size)
          s"<NextMarker>${from + pageSize}</NextMarker>" else ""
        val xml = ("<?xml version=\"1.0\"?><EnumerationResults><Blobs>" +
          page.map(k => s"<Blob><Name>$k</Name><Properties>" +
            s"<Content-Length>${store(k).length}</Content-Length>" +
            "</Properties></Blob>").mkString
          + "</Blobs>" + next + "</EnumerationResults>").getBytes("UTF-8")
        respond(ex, 200, xml)
      } else {
        val key = ex.getRequestURI.getPath
          .stripPrefix(s"/$account/$container").stripPrefix("/")
        store.get(key) match {
          case Some(b) => respond(ex, 200, b)
          case None => respond(ex, 404, Array.empty)
        }
      }
    })
    server.start()
    def endpoint: String =
      s"http://127.0.0.1:${server.getAddress.getPort}/{account}/{container}"
  }

  private def withAz(blobs: Map[String, Array[Byte]],
      sas: Option[String] = Some("sv=2024-01-01&sig=t0ken"),
      clientSas: Option[String] = None, pageSize: Int = 1000)
      (body: AzFixture => Unit): Unit = {
    val f = new AzFixture("acct1", "cont1", blobs, sas, pageSize)
    val dir = Files.createTempDirectory("graft-az-spec")
    System.setProperty("graft.http.cache.dir", dir.toString)
    System.setProperty("graft.az.endpoint", f.endpoint)
    System.setProperty("graft.az.account", "acct1")
    clientSas.orElse(sas).foreach(s =>
      System.setProperty("graft.az.sas_token", s))
    try body(f)
    finally {
      f.server.stop(0)
      Seq("graft.http.cache.dir", "graft.az.endpoint", "graft.az.account",
        "graft.az.sas_token").foreach(System.clearProperty)
    }
  }

  test("URL parsing: az/azure/abfss, account-qualified and short") {
    assert(AzSource.parse("az://c1/d/k.parquet") ==
      Some(AzSource.AzRef(None, "c1", "d/k.parquet")))
    assert(AzSource.parse("azure://c1/k") ==
      Some(AzSource.AzRef(None, "c1", "k")))
    assert(AzSource.parse("az://acct.blob.core.windows.net/c1/d/k") ==
      Some(AzSource.AzRef(Some("acct"), "c1", "d/k")))
    assert(AzSource.parse("abfss://c1@acct.dfs.core.windows.net/d/k") ==
      Some(AzSource.AzRef(Some("acct"), "c1", "d/k")))
    assert(AzSource.parse("abfss://c1/d/k") ==
      Some(AzSource.AzRef(None, "c1", "d/k")))
    assert(AzSource.parse("s3://b/k").isEmpty)
    assert(AzSource.parse("https://x.com/a").isEmpty)
  }

  test("stage downloads with SAS attached; bad token is a 403") {
    val blobs = Map("d/a.csv" -> "x,y\n1,2\n".getBytes("UTF-8"))
    withAz(blobs) { f =>
      val p = HttpSource.stage("az://cont1/d/a.csv")
      assert(new String(Files.readAllBytes(Paths.get(p)), "UTF-8")
        == "x,y\n1,2\n")
      assert(f.denied.get() == 0)
    }
    // wrong client token → server denies, stage surfaces the 403
    withAz(blobs, clientSas = Some("sv=2024-01-01&sig=WRONG")) { f =>
      val ex = intercept[Exception](HttpSource.stage("az://cont1/d/a.csv"))
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(ex).exists(_.contains("403")),
        s"expected a 403 surface, got: ${msgs(ex)}")
      assert(f.denied.get() >= 1)
    }
  }

  test("wildcard expansion via List Blobs with NextMarker paging") {
    val blobs = Map(
      "data/part-0.parquet" -> Array[Byte](1),
      "data/part-1.parquet" -> Array[Byte](2),
      "data/part-2.parquet" -> Array[Byte](3),
      "data/notes.txt" -> Array[Byte](4),
      "other/part-9.parquet" -> Array[Byte](5))
    withAz(blobs, pageSize = 2) { f =>
      val urls = HttpSource.expand("az://cont1/data/*.parquet")
      assert(urls == Seq(
        "az://cont1/data/part-0.parquet",
        "az://cont1/data/part-1.parquet",
        "az://cont1/data/part-2.parquet"))
      assert(f.hits.get() >= 2, "NextMarker paging never continued")
      // ** crosses path segments; account-qualified spelling preserved
      assert(HttpSource.expand(
        "abfss://cont1@acct1.dfs.core.windows.net/**/part-9.parquet") ==
        Seq("abfss://cont1@acct1.dfs.core.windows.net/other/part-9.parquet"))
      intercept[IllegalArgumentException] {
        HttpSource.expand("az://cont1/data/*.json")
      }
    }
  }

  test("COPY TO az:// uploads one blob with the SAS; bad token refused") {
    import spark.implicits._
    withAz(Map.empty) { f =>
      val e = LakeEngine(spark)
      e.copyTo(Seq((1L, "x"), (2L, "y")).toDF("id", "s"),
        "az://cont1/exports/out.csv")
      // round-trip: the uploaded blob reads back as the same table
      val back = e.createLakeTable("az_up", "az://cont1/exports/out.csv",
        format = Some("csv"))
      assert(back.count() == 2)
      assert(back.filter(back("id") === 2).select("s")
        .head.getString(0) == "y")
      assert(f.store.contains("exports/out.csv"))
    }
    withAz(Map.empty, clientSas = Some("sv=2024-01-01&sig=WRONG")) { f =>
      val e = LakeEngine(spark)
      val ex = intercept[Exception](e.copyTo(
        Seq(1L).toDF("id"), "az://cont1/exports/nope.csv"))
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(ex).exists(_.contains("403")), msgs(ex).toString)
      assert(!f.store.contains("exports/nope.csv"))
    }
  }

  test("block upload: ≥3 SAS-carrying blocks commit byte-identically") {
    val payload = Array.tabulate[Byte](100)(i => ((i * 11 + 5) % 249).toByte)
    withAz(Map.empty) { f =>
      System.setProperty("graft.upload.part_size", "32")
      try {
        HttpSource.upload("az://cont1/mp/big.bin", payload.length.toLong,
          () => new java.io.ByteArrayInputStream(payload))
        assert(f.blockPuts.get() == 4,
          s"expected 4 block PUTs, saw ${f.blockPuts.get()}")
        assert(f.store.get("mp/big.bin").map(_.toSeq)
          .contains(payload.toSeq),
          "committed blob differs from the source bytes")
        assert(f.denied.get() == 0, "every block must carry the SAS")
        // at/below the threshold: single Put Blob, no blocks
        val small = payload.take(16)
        HttpSource.upload("az://cont1/mp/small.bin", small.length.toLong,
          () => new java.io.ByteArrayInputStream(small))
        assert(f.blockPuts.get() == 4)
        assert(f.store.get("mp/small.bin").map(_.toSeq)
          .contains(small.toSeq))
      } finally System.clearProperty("graft.upload.part_size")
    }
    // a bad SAS refuses the very first block — nothing commits
    withAz(Map.empty, clientSas = Some("sv=2024-01-01&sig=WRONG")) { f =>
      System.setProperty("graft.upload.part_size", "32")
      try {
        intercept[java.io.IOException] {
          HttpSource.upload("az://cont1/mp/nope.bin", 100L,
            () => new java.io.ByteArrayInputStream(new Array[Byte](100)))
        }
        assert(!f.store.contains("mp/nope.bin"))
      } finally System.clearProperty("graft.upload.part_size")
    }
  }

  test("foreignFrame reads az:// CSV + wildcard parquet; lake_file.list") {
    import spark.implicits._
    val pq = {
      val dir = Files.createTempDirectory("azpq")
      Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1)
        .write.mode("overwrite").parquet(dir.toString)
      val part = Files.list(dir).iterator()
      var bytes: Array[Byte] = null
      while (part.hasNext) {
        val p = part.next()
        if (p.toString.endsWith(".parquet"))
          bytes = Files.readAllBytes(p)
      }
      bytes
    }
    val blobs = Map(
      "t/part-0.parquet" -> pq,
      "t/c.csv" -> "id,s\n9,z\n".getBytes("UTF-8"))
    withAz(blobs) { _ =>
      val e = LakeEngine(spark)
      val t = e.createLakeTable("az_pq", "az://cont1/t/*.parquet")
      assert(t.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(1L, 2L))
      val c = e.createLakeTable("az_csv", "az://cont1/t/c.csv",
        format = Some("csv"))
      assert(c.count() == 1)
      val listed = e.listFiles("az://cont1/t/*")
        .select("path", "size_bytes").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(listed == Map(
        "az://cont1/t/part-0.parquet" -> blobs("t/part-0.parquet").length.toLong,
        "az://cont1/t/c.csv" -> blobs("t/c.csv").length.toLong),
        s"listing must carry true blob sizes: $listed")
      // wildcard-free listing answers the exact blob with its size
      val one = e.listFiles("az://cont1/t/c.csv").collect()
      assert(one.length == 1 &&
        one.head.getLong(1) == blobs("t/c.csv").length.toLong)
      // list parity with the reference (test_list_file.py
      // test_list_files_does_not_exist / _wildcard): a nonexistent
      // blob and a non-matching wildcard are EMPTY listings, not
      // errors — matching the local globStatus branch
      assert(e.listFiles("az://cont1/t/does_not_exist.csv").count() == 0)
      assert(e.listFiles("az://cont1/t/does_not_exist*").count() == 0)
      // …while READ staging keeps the loud no-match guard
      intercept[IllegalArgumentException] {
        HttpSource.expand("az://cont1/t/does_not_exist*")
      }
    }
  }
}
