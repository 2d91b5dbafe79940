package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.sources.IcebergSnapshot
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** A foreign engine attaching to the engine's Iceberg REST catalog over
  * real HTTP: list namespaces/tables, load table metadata, scan. The
  * "foreign engine" is the JDK HTTP client plus our external-snapshot
  * reader, which only sees what the wire carries.
  */
class RestCatalogSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private val mapper = new ObjectMapper()
  private val http = HttpClient.newHttpClient()

  private def get(url: String): (Int, String) = {
    val r = http.send(HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  test("REST catalog attach: config, namespaces, list, load, scan") {
    val e = LakeEngine(spark)
    val region = Tables.df(spark, sf, "region")
    val nation = Tables.df(spark, sf, "nation")
    e.createTableAsSelect("rest_region", LakeEngine.tempLocation("rc1"), region)
    e.createTableAsSelect("rest_nation", LakeEngine.tempLocation("rc2"), nation)

    val srv = e.serveRestCatalog()
    try {
      val base = srv.address

      val (cc, cb) = get(s"$base/v1/config")
      assert(cc == 200 && mapper.readTree(cb).has("defaults"))

      val (nc, nb) = get(s"$base/v1/namespaces")
      assert(nc == 200)
      assert(mapper.readTree(nb).get("namespaces").get(0).get(0)
        .asText() == "default")

      val (lc, lb) = get(s"$base/v1/namespaces/default/tables")
      assert(lc == 200)
      val names = mapper.readTree(lb).get("identifiers").elements().asScala
        .map(_.get("name").asText()).toSet
      assert(names.contains("rest_region") && names.contains("rest_nation"))

      // LoadTableResult: metadata-location + inline metadata agree
      val (tc, tb) = get(s"$base/v1/namespaces/default/tables/rest_nation")
      assert(tc == 200)
      val load = mapper.readTree(tb)
      val metaLoc = load.get("metadata-location").asText()
      assert(load.get("metadata").get("current-snapshot-id").asLong() ==
        IcebergSnapshot.metadata(metaLoc).get("current-snapshot-id").asLong())

      // the attached scan sees exactly the table
      val back = IcebergSnapshot.read(spark, metaLoc)
      assert(back.count() == nation.count())
      assert(back.exceptAll(nation).isEmpty)

      // a commit between loads is visible on the next load — the
      // object-store-catalog freshness property over REST
      e.table("rest_nation").delete(col("n_nationkey") === 0)
      val (tc2, tb2) = get(s"$base/v1/namespaces/default/tables/rest_nation")
      assert(tc2 == 200)
      val metaLoc2 = mapper.readTree(tb2).get("metadata-location").asText()
      assert(metaLoc2 != metaLoc)
      assert(IcebergSnapshot.read(spark, metaLoc2).count() ==
        nation.count() - 1)

      // errors: unknown table 404s with a spec-shaped error body
      val (xc, xb) = get(s"$base/v1/namespaces/default/tables/nope")
      assert(xc == 404)
      assert(mapper.readTree(xb).get("error").get("type").asText() ==
        "NoSuchTableException")
      val (yc, _) = get(s"$base/v1/namespaces/other/tables")
      assert(yc == 404)
    } finally srv.stop()
  }
}
