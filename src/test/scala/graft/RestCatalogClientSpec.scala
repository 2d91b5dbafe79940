package graft

import graft.lake.RestCatalogClient
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import org.scalatest.funsuite.AnyFunSuite

/** The REST catalog CLIENT half (reference rest_catalog_http.c /
  * rest_catalog_auth.c; test_token_refresh_on_retry.py): OAuth
  * exchange + caching, the 419-refresh / 429 / 503 retry ladder, and
  * end-to-end interop against our own [[graft.lake.RestCatalog]]
  * server.
  */
class RestCatalogClientSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("attach + read a table from a credentialed REST catalog") {
    val e = LakeEngine(spark)
    val loc = java.nio.file.Files.createTempDirectory("restcli").toString
    e.createTableAsSelect("rcc_src", s"$loc/t",
      Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"))
    val srv = e.serveRestCatalog(
      credentials = Map("svc" -> "s3cret"))
    try {
      val client = new RestCatalogClient(srv.address,
        clientId = Some("svc"), clientSecret = Some("s3cret"))
      assert(client.listNamespaces().contains("default"))
      assert(client.listTables("default").contains("rcc_src"))
      assert(client.tableExists("default", "rcc_src"))
      assert(!client.tableExists("default", "nope"))
      val df = e.createRestCatalogTable("rcc_remote", srv.address,
        "default", "rcc_src", clientId = Some("svc"),
        clientSecret = Some("s3cret"))
      assert(df.orderBy("id").collect().map(_.getString(1)).toSeq ==
        Seq("a", "b", "c"))
      // bad secret fails loudly at the token exchange
      val bad = new RestCatalogClient(srv.address,
        clientId = Some("svc"), clientSecret = Some("wrong"))
      val err = intercept[java.io.IOException](bad.listNamespaces())
      assert(err.getMessage.contains("OAuth token request failed"))
    } finally srv.stop()
  }

  /** Mirror of test_token_refresh_on_retry.py's mock: the token
    * endpoint returns a UNIQUE token per call; the data route answers
    * 419 to the first token and 200 only to a DIFFERENT one — proving
    * the Authorization header was patched with a fresh token.
    */
  test("419 refreshes the token and patches the Authorization header") {
    val tokensIssued = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val dataAuths = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      def reply(code: Int, body: String): Unit = {
        val b = body.getBytes(UTF_8)
        ex.sendResponseHeaders(code, b.length)
        ex.getResponseBody.write(b)
        ex.close()
      }
      if (ex.getRequestURI.getPath.contains("/oauth/tokens")) {
        val tok = java.util.UUID.randomUUID().toString
        tokensIssued.add(tok)
        reply(200, s"""{"access_token":"$tok","token_type":"bearer","expires_in":3600}""")
      } else {
        val auth = Option(
          ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
        dataAuths.add(auth)
        if (auth == s"Bearer ${tokensIssued.get(0)}")
          reply(419, """{"error":{"message":"token expired","type":"NotAuthorizedException","code":419}}""")
        else if (tokensIssued.size > 1 &&
            auth == s"Bearer ${tokensIssued.get(tokensIssued.size - 1)}")
          reply(200, """{"metadata-location":"file:///tmp/fake.metadata.json"}""")
        else reply(419, """{"error":{"message":"stale token","type":"NotAuthorizedException","code":419}}""")
      }
    })
    server.start()
    try {
      val client = new RestCatalogClient(
        s"http://127.0.0.1:${server.getAddress.getPort}",
        clientId = Some("id"), clientSecret = Some("sec"))
      val loc = client.loadTableMetadataLocation("ns", "t")
      assert(loc == "file:///tmp/fake.metadata.json")
      assert(tokensIssued.size == 2,
        s"expected exactly one refresh, got ${tokensIssued.size} tokens")
      import scala.jdk.CollectionConverters._
      assert(dataAuths.asScala.distinct.size == 2,
        "the Authorization header was not patched on retry")
    } finally server.stop(0)
  }

  test("429 backs off and retries; persistent failure stops loudly") {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      def reply(code: Int, body: String): Unit = {
        val b = body.getBytes(UTF_8)
        ex.sendResponseHeaders(code, b.length)
        ex.getResponseBody.write(b)
        ex.close()
      }
      if (hits.incrementAndGet() <= 2) reply(429, """{"error":{"message":"slow down","type":"TooManyRequests","code":429}}""")
      else reply(200, """{"namespaces":[["default"]]}""")
    })
    server.start()
    try {
      // anonymous catalog (no creds): two 429s then success
      val client = new RestCatalogClient(
        s"http://127.0.0.1:${server.getAddress.getPort}", backoffMs = 1)
      assert(client.listNamespaces() == Seq("default"))
      assert(hits.get() == 3)
      // a server that never recovers: max 3 retries then a loud stop
      hits.set(-1000)
      val err = intercept[java.io.IOException](client.listNamespaces())
      assert(err.getMessage.contains("429") &&
        err.getMessage.contains("slow down"))
    } finally server.stop(0)
  }
}
