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

  private def post(url: String, body: String): (Int, String) = {
    val r = http.send(HttpRequest.newBuilder(URI.create(url))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  test("REST catalog write: external engine creates and commits a table") {
    val e = LakeEngine(spark)
    val srv = e.serveRestCatalog()
    try {
      val base = srv.address

      // CreateTable with an Iceberg schema JSON
      val createBody =
        """{"name":"ext_t","schema":{"type":"struct","fields":[
          |  {"id":1,"name":"id","type":"long","required":true},
          |  {"id":2,"name":"label","type":"string","required":false}
          |]}}""".stripMargin
      val (cc, cb) = post(s"$base/v1/namespaces/default/tables", createBody)
      assert(cc == 200, cb)
      assert(mapper.readTree(cb).get("metadata-location").asText().nonEmpty)
      assert(e.table("ext_t").meta.sparkSchema.fieldNames.toSeq ==
        Seq("id", "label"))
      // duplicate create → 409
      assert(post(s"$base/v1/namespaces/default/tables", createBody)._1 == 409)

      // the "external engine" stages data + Iceberg metadata itself:
      // a scratch table with the same schema, exported to real Avro
      // manifests — only its manifest-list path goes over the wire
      import spark.implicits._
      val staged = Seq((1L, "a"), (2L, "b"), (3L, null: String))
        .toDF("id", "label")
      val scratch = graft.lake.LakeTable.createAsSelect(spark,
        LakeEngine.tempLocation("staged"), "staged", staged)
      val stagedMeta = graft.lake.IcebergExport.export(scratch)
      val listPath = IcebergSnapshot.metadata(stagedMeta)
        .get("snapshots").elements().asScala.toSeq.last
        .get("manifest-list").asText()

      val commitBody =
        s"""{"requirements":[],"updates":[
           |  {"action":"add-snapshot","snapshot":{
           |    "snapshot-id":999,"manifest-list":"$listPath"}}
           |]}""".stripMargin
      val (mc, mb) = post(s"$base/v1/namespaces/default/tables/ext_t",
        commitBody)
      assert(mc == 200, mb)

      // the committed rows are visible locally AND through a re-load
      val local = e.table("ext_t").read()
      assert(local.count() == 3)
      assert(local.exceptAll(staged).isEmpty)
      val (tc, tb) = get(s"$base/v1/namespaces/default/tables/ext_t")
      assert(tc == 200)
      val metaLoc = mapper.readTree(tb).get("metadata-location").asText()
      val back = IcebergSnapshot.read(spark, metaLoc)
      assert(back.count() == 3 && back.exceptAll(staged).isEmpty)

      // imported per-file stats prune: an impossible predicate scans
      // nothing (bounds came from the external manifests)
      assert(e.table("ext_t").read()
        .filter(col("id") > 100).count() == 0)

      // non-add-snapshot commit → 400; unknown table → 404
      assert(post(s"$base/v1/namespaces/default/tables/ext_t",
        """{"updates":[{"action":"set-location","location":"/x"}]}""")._1
        == 400)
      assert(post(s"$base/v1/namespaces/default/tables/nope",
        commitBody)._1 == 404)

      // stale requirement → 409 and the table is untouched: a client
      // that read an old snapshot cannot clobber a newer local commit
      val cur = e.table("ext_t").meta.currentSnapshotId
      val stale =
        s"""{"requirements":[
           |  {"type":"assert-ref-snapshot-id","ref":"main",
           |   "snapshot-id":${cur - 1}}],
           |"updates":[{"action":"add-snapshot","snapshot":{
           |  "snapshot-id":1000,"manifest-list":"$listPath"}}]}"""
          .stripMargin
      val (sc2, sb2) = post(s"$base/v1/namespaces/default/tables/ext_t", stale)
      assert(sc2 == 409, sb2)
      assert(mapper.readTree(sb2).get("error").get("type").asText() ==
        "CommitFailedException")
      assert(e.table("ext_t").meta.currentSnapshotId == cur)
      // matching requirement commits fine
      val fresh = stale.replace(s""""snapshot-id":${cur - 1}""",
        s""""snapshot-id":$cur""")
      assert(post(s"$base/v1/namespaces/default/tables/ext_t", fresh)._1
        == 200)
    } finally srv.stop()
  }
}
