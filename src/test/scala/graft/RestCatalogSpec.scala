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

  test("REST catalog schema evolution: external ALTER TABLE commits") {
    val e = LakeEngine(spark)
    val srv = e.serveRestCatalog()
    try {
      val base = srv.address
      val createBody =
        """{"name":"ext_evo","schema":{"type":"struct","fields":[
          |  {"id":1,"name":"id","type":"long","required":true},
          |  {"id":2,"name":"label","type":"string","required":false}
          |]}}""".stripMargin
      assert(post(s"$base/v1/namespaces/default/tables", createBody)._1 == 200)

      // external ALTER TABLE ADD COLUMN — the add-schema +
      // set-current-schema actions standard clients send
      val addCol =
        """{"requirements":[],"updates":[
          |  {"action":"add-schema","schema":{"type":"struct","fields":[
          |    {"id":1,"name":"id","type":"long","required":true},
          |    {"id":2,"name":"label","type":"string","required":false},
          |    {"id":3,"name":"score","type":"double","required":false}
          |  ]}},
          |  {"action":"set-current-schema","schema-id":-1}
          |]}""".stripMargin
      val (ac, ab) = post(s"$base/v1/namespaces/default/tables/ext_evo", addCol)
      assert(ac == 200, ab)
      assert(e.table("ext_evo").meta.sparkSchema.fieldNames.toSeq ==
        Seq("id", "label", "score"))

      // the client then commits data under the evolved schema;
      // local reads see both the new column and the new rows
      import spark.implicits._
      val staged = Seq((1L, "a", 0.5), (2L, "b", 1.5)).toDF("id", "label", "score")
      val scratch = graft.lake.LakeTable.createAsSelect(spark,
        LakeEngine.tempLocation("evostage"), "evostage", staged)
      val listPath = IcebergSnapshot.metadata(
          graft.lake.IcebergExport.export(scratch))
        .get("snapshots").elements().asScala.toSeq.last
        .get("manifest-list").asText()
      val (dc, db) = post(s"$base/v1/namespaces/default/tables/ext_evo",
        s"""{"updates":[{"action":"add-snapshot","snapshot":{
           |  "snapshot-id":1,"manifest-list":"$listPath"}}]}""".stripMargin)
      assert(dc == 200, db)
      val local = e.table("ext_evo").read()
      assert(local.columns.toSeq == Seq("id", "label", "score"))
      assert(local.count() == 2)
      assert(local.filter(col("score") === 1.5).head().getString(1) == "b")
      // and the re-export served over REST carries the evolved schema
      val (_, tb) = get(s"$base/v1/namespaces/default/tables/ext_evo")
      val restSchema = mapper.readTree(tb).get("metadata")
      val back = IcebergSnapshot.read(spark,
        mapper.readTree(tb).get("metadata-location").asText())
      assert(back.columns.toSeq == Seq("id", "label", "score"))
      assert(restSchema.get("current-snapshot-id").asLong() ==
        e.table("ext_evo").meta.currentSnapshotId)

      // rename by field-id: same ids, label -> tag
      val rename =
        """{"updates":[{"action":"add-schema","schema":{"type":"struct","fields":[
          |  {"id":1,"name":"id","type":"long","required":true},
          |  {"id":2,"name":"tag","type":"string","required":false},
          |  {"id":3,"name":"score","type":"double","required":false}
          |]}}]}""".stripMargin
      assert(post(s"$base/v1/namespaces/default/tables/ext_evo", rename)._1
        == 200)
      val renamed = e.table("ext_evo").read()
      assert(renamed.columns.toSeq == Seq("id", "tag", "score"))
      // files written under the old name still read (field-id mapping)
      assert(renamed.filter(col("tag") === "a").count() == 1)

      // drop by omission: id 3 gone
      val drop =
        """{"updates":[{"action":"add-schema","schema":{"type":"struct","fields":[
          |  {"id":1,"name":"id","type":"long","required":true},
          |  {"id":2,"name":"tag","type":"string","required":false}
          |]}}]}""".stripMargin
      assert(post(s"$base/v1/namespaces/default/tables/ext_evo", drop)._1
        == 200)
      assert(e.table("ext_evo").read().columns.toSeq == Seq("id", "tag"))

      // type evolution refuses loudly, schema untouched
      val retype =
        """{"updates":[{"action":"add-schema","schema":{"type":"struct","fields":[
          |  {"id":1,"name":"id","type":"string","required":true},
          |  {"id":2,"name":"tag","type":"string","required":false}
          |]}}]}""".stripMargin
      val (rc, rb) = post(s"$base/v1/namespaces/default/tables/ext_evo", retype)
      assert(rc == 400, rb)
      assert(rb.contains("type evolution"))
      assert(e.table("ext_evo").meta.sparkSchema.fieldNames.toSeq ==
        Seq("id", "tag"))
    } finally srv.stop()
  }

  private def send(method: String, url: String, body: String = null,
      token: String = null): (Int, String) = {
    var b = HttpRequest.newBuilder(URI.create(url))
    b = method match {
      case "GET" => b.GET()
      case "DELETE" => b.DELETE()
      case "POST" => b.header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(body))
    }
    if (token != null) b = b.header("Authorization", s"Bearer $token")
    val r = http.send(b.build(), HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  private def tokenExchange(base: String, id: String,
      secret: String): (Int, String) = {
    val r = http.send(HttpRequest.newBuilder(
        URI.create(s"$base/v1/oauth/tokens"))
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(HttpRequest.BodyPublishers.ofString(
        s"grant_type=client_credentials&client_id=$id&client_secret=$secret"))
      .build(), HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  test("REST catalog auth: OAuth2 client-credentials gates every route") {
    val e = LakeEngine(spark)
    e.createTableAsSelect("auth_t", LakeEngine.tempLocation("rca"),
      Tables.df(spark, sf, "region"))
    val srv = e.serveRestCatalog(credentials = Map("svc" -> "s3cret"))
    try {
      val base = srv.address
      // no token / bad token → 401 with a spec-shaped error
      val (uc, ub) = send("GET", s"$base/v1/namespaces")
      assert(uc == 401)
      assert(mapper.readTree(ub).get("error").get("type").asText() ==
        "NotAuthorizedException")
      assert(send("GET", s"$base/v1/config", token = "forged")._1 == 401)
      // wrong credentials refused at the token endpoint
      assert(tokenExchange(base, "svc", "wrong")._1 == 401)
      assert(tokenExchange(base, "nobody", "s3cret")._1 == 401)
      // the exchange itself needs no token (it IS the way in)
      val (tc, tb) = tokenExchange(base, "svc", "s3cret")
      assert(tc == 200, tb)
      val tok = mapper.readTree(tb).get("access_token").asText()
      assert(mapper.readTree(tb).get("token_type").asText() == "bearer")
      // bearer token unlocks reads and writes
      val (lc, lb) = send("GET", s"$base/v1/namespaces/default/tables",
        token = tok)
      assert(lc == 200)
      assert(mapper.readTree(lb).get("identifiers").elements().asScala
        .map(_.get("name").asText()).contains("auth_t"))
      assert(send("GET", s"$base/v1/namespaces/default/tables/auth_t",
        token = tok)._1 == 200)
    } finally srv.stop()
  }

  test("REST catalog auth: expired token refused, re-exchange commits") {
    val e = LakeEngine(spark)
    val srv = e.serveRestCatalog(credentials = Map("svc" -> "pw"),
      tokenTtlMillis = 1)
    try {
      val base = srv.address
      val stale = mapper.readTree(tokenExchange(base, "svc", "pw")._2)
        .get("access_token").asText()
      Thread.sleep(20)
      assert(send("GET", s"$base/v1/namespaces", token = stale)._1 == 401)
      // the client re-exchanges and retries — the refreshed token can
      // create (a write op) where the stale one could not even read
      val srv2 = e.serveRestCatalog(credentials = Map("svc" -> "pw"))
      try {
        val base2 = srv2.address
        val tok2 = mapper.readTree(tokenExchange(base2, "svc", "pw")._2)
          .get("access_token").asText()
        val (cc, cb) = send("POST", s"$base2/v1/namespaces/default/tables",
          """{"name":"auth_w","schema":{"type":"struct","fields":[
            |  {"id":1,"name":"id","type":"long","required":true}]}}"""
            .stripMargin, token = tok2)
        assert(cc == 200, cb)
        assert(e.tableOption("auth_w").isDefined)
      } finally srv2.stop()
    } finally srv.stop()
  }

  test("REST catalog commit atomicity: updates + requirements are a unit") {
    val e = LakeEngine(spark)
    val srv = e.serveRestCatalog()
    try {
      val base = srv.address
      assert(post(s"$base/v1/namespaces/default/tables",
        """{"name":"ext_atomic","schema":{"type":"struct","fields":[
          |  {"id":1,"name":"id","type":"long","required":true},
          |  {"id":2,"name":"label","type":"string","required":false}
          |]}}""".stripMargin)._1 == 200)

      import spark.implicits._
      val staged = Seq((1L, "a"), (2L, "b")).toDF("id", "label")
      val scratch = graft.lake.LakeTable.createAsSelect(spark,
        LakeEngine.tempLocation("atomstage"), "atomstage", staged)
      val listPath = IcebergSnapshot.metadata(
          graft.lake.IcebergExport.export(scratch))
        .get("snapshots").elements().asScala.toSeq.last
        .get("manifest-list").asText()

      val cur = e.table("ext_atomic").meta.currentSnapshotId
      def addSchemaJson(extra: String) =
        s"""{"action":"add-schema","schema":{"type":"struct","fields":[
           |  {"id":1,"name":"id","type":"long","required":true},
           |  {"id":2,"name":"label","type":"string","required":false}$extra
           |]}}""".stripMargin
      val addScore =
        addSchemaJson(""",{"id":3,"name":"score","type":"double","required":false}""")

      // schema-only commit with a stale requirement → 409, schema
      // untouched (the spec's unit rule — r7 applied the schema before
      // ever checking the requirement)
      val (c1, b1) = post(s"$base/v1/namespaces/default/tables/ext_atomic",
        s"""{"requirements":[{"type":"assert-ref-snapshot-id","ref":"main",
           |  "snapshot-id":${cur - 1}}],
           |"updates":[$addScore]}""".stripMargin)
      assert(c1 == 409, b1)
      assert(e.table("ext_atomic").meta.sparkSchema.fieldNames.toSeq ==
        Seq("id", "label"))

      // mixed add-schema + add-snapshot with a stale requirement → 409
      // and NEITHER applied
      val (c2, b2) = post(s"$base/v1/namespaces/default/tables/ext_atomic",
        s"""{"requirements":[{"type":"assert-ref-snapshot-id","ref":"main",
           |  "snapshot-id":${cur - 1}}],
           |"updates":[$addScore,
           |  {"action":"add-snapshot","snapshot":{
           |    "snapshot-id":77,"manifest-list":"$listPath"}}]}""".stripMargin)
      assert(c2 == 409, b2)
      assert(e.table("ext_atomic").meta.currentSnapshotId == cur)
      assert(e.table("ext_atomic").meta.sparkSchema.fieldNames.toSeq ==
        Seq("id", "label"))

      // same mixed commit with the matching requirement → 200, both
      // applied in one snapshot swap
      val (c3, b3) = post(s"$base/v1/namespaces/default/tables/ext_atomic",
        s"""{"requirements":[{"type":"assert-ref-snapshot-id","ref":"main",
           |  "snapshot-id":$cur}],
           |"updates":[$addScore,
           |  {"action":"add-snapshot","snapshot":{
           |    "snapshot-id":78,"manifest-list":"$listPath"}}]}""".stripMargin)
      assert(c3 == 200, b3)
      val m3 = e.table("ext_atomic").meta
      assert(m3.sparkSchema.fieldNames.toSeq == Seq("id", "label", "score"))
      assert(m3.currentSnapshotId != cur)
      assert(e.table("ext_atomic").read().count() == 2)

      // the client-added column kept ITS field id (3); a later
      // add-schema from the same client state must not duplicate it
      assert(m3.currentSchema.fields.find(_.name == "score").get.id == 3)

      // an add that skips ahead persists the client id verbatim
      val addFar = addSchemaJson(
        """,{"id":3,"name":"score","type":"double","required":false},
          |  {"id":7,"name":"extra","type":"string","required":false}"""
          .stripMargin)
      assert(post(s"$base/v1/namespaces/default/tables/ext_atomic",
        s"""{"updates":[$addFar]}""")._1 == 200)
      val m4 = e.table("ext_atomic").meta
      assert(m4.currentSchema.fields.find(_.name == "extra").get.id == 7)
      assert(m4.nextFieldId == 8)

      // reusing a retired id below nextFieldId refuses (data written
      // under the old id would pun into the new column)
      val reuse =
        """{"updates":[{"action":"add-schema","schema":{"type":"struct","fields":[
          |  {"id":1,"name":"id","type":"long","required":true},
          |  {"id":2,"name":"label","type":"string","required":false},
          |  {"id":3,"name":"score","type":"double","required":false},
          |  {"id":7,"name":"extra","type":"string","required":false},
          |  {"id":4,"name":"sneaky","type":"string","required":false}
          |]}}]}""".stripMargin
      val (c5, b5) = post(s"$base/v1/namespaces/default/tables/ext_atomic",
        reuse)
      assert(c5 == 400, b5)
      assert(b5.contains("reuses field id"))
    } finally srv.stop()
  }

  test("REST catalog lifecycle: namespace CRUD, drop, rename, recreate") {
    val e = LakeEngine(spark)
    val srv = e.serveRestCatalog()
    try {
      val base = srv.address
      // namespace create / duplicate / list / properties
      val nsBody = """{"namespace":["analytics"],"properties":{"owner":"ml"}}"""
      assert(send("POST", s"$base/v1/namespaces", nsBody)._1 == 200)
      assert(send("POST", s"$base/v1/namespaces", nsBody)._1 == 409)
      val (gc, gb) = send("GET", s"$base/v1/namespaces/analytics")
      assert(gc == 200)
      assert(mapper.readTree(gb).get("properties").get("owner")
        .asText() == "ml")
      val (lc, lb) = send("GET", s"$base/v1/namespaces")
      assert(lc == 200)
      val nss = mapper.readTree(lb).get("namespaces").elements().asScala
        .map(_.get(0).asText()).toSet
      assert(nss == Set("analytics", "default"))

      // create a table INSIDE the new namespace; listings stay scoped
      val createBody =
        """{"name":"t1","schema":{"type":"struct","fields":[
          |  {"id":1,"name":"id","type":"long","required":true}]}}"""
          .stripMargin
      assert(send("POST", s"$base/v1/namespaces/analytics/tables",
        createBody)._1 == 200)
      def names(ns: String): Set[String] = {
        val (_, b) = send("GET", s"$base/v1/namespaces/$ns/tables")
        mapper.readTree(b).get("identifiers").elements().asScala
          .map(_.get("name").asText()).toSet
      }
      assert(names("analytics") == Set("t1"))
      assert(!names("default").contains("t1"))
      assert(send("GET", s"$base/v1/namespaces/analytics/tables/t1")._1
        == 200)

      // a namespace holding tables refuses to drop
      assert(send("DELETE", s"$base/v1/namespaces/analytics")._1 == 409)

      // rename across namespaces: analytics.t1 → default.t2
      assert(send("POST", s"$base/v1/tables/rename",
        """{"source":{"namespace":["analytics"],"name":"t1"},
          |"destination":{"namespace":["default"],"name":"t2"}}"""
          .stripMargin)._1 == 204)
      assert(names("analytics").isEmpty)
      assert(names("default").contains("t2"))
      assert(send("GET", s"$base/v1/namespaces/analytics/tables/t1")._1
        == 404)

      // drop + recreate from the external side
      assert(send("DELETE",
        s"$base/v1/namespaces/default/tables/t2?purgeRequested=true")._1
        == 204)
      assert(send("GET", s"$base/v1/namespaces/default/tables/t2")._1
        == 404)
      assert(send("POST", s"$base/v1/namespaces/default/tables",
        createBody.replace("\"t1\"", "\"t2\""))._1 == 200)
      assert(names("default").contains("t2"))

      // now-empty namespace drops; the default namespace never does
      assert(send("DELETE", s"$base/v1/namespaces/analytics")._1 == 204)
      assert(send("GET", s"$base/v1/namespaces/analytics")._1 == 404)
      assert(send("DELETE", s"$base/v1/namespaces/default")._1 == 400)
    } finally srv.stop()
  }

  /** The Iceberg REST spec's multi-table transaction endpoint
    * (POST /v1/transactions/commit): every table-change applies or
    * none does — an external engine's multi-table commit is
    * all-or-nothing through the catalog, like the engine's own
    * multi-table COMMIT.
    */
  test("CommitTransaction: multi-table batch is all-or-nothing") {
    import spark.implicits._
    val e = LakeEngine(spark)
    e.createTableAsSelect("txc_a", LakeEngine.tempLocation("txca"),
      Seq((1L, "a")).toDF("id", "label"))
    e.createTableAsSelect("txc_b", LakeEngine.tempLocation("txcb"),
      Seq((1L, "a")).toDF("id", "label"))
    val srv = e.serveRestCatalog()
    try {
      val base = srv.address
      // the "external engine" stages each table's new snapshot as real
      // Avro manifests; only manifest-list paths go over the wire
      def stagedList(tag: String, rows: Seq[(Long, String)]): String = {
        val scratch = graft.lake.LakeTable.createAsSelect(spark,
          LakeEngine.tempLocation(tag), tag, rows.toDF("id", "label"))
        val meta = graft.lake.IcebergExport.export(scratch)
        IcebergSnapshot.metadata(meta).get("snapshots").elements()
          .asScala.toSeq.last.get("manifest-list").asText()
      }
      val (l1, l2) = (stagedList("txc_s1", Seq((1L, "a"), (2L, "b"))),
        stagedList("txc_s2", Seq((1L, "a"), (2L, "b"), (3L, "c"))))
      def change(t: String, list: String, snapId: Long,
          require: Option[Long] = None): String = {
        val req = require.map(r =>
          s"""{"type":"assert-ref-snapshot-id","ref":"main",
             |"snapshot-id":$r}""".stripMargin).getOrElse("")
        s"""{"identifier":{"namespace":["default"],"name":"$t"},
           |"requirements":[$req],
           |"updates":[{"action":"add-snapshot","snapshot":{
           |  "snapshot-id":$snapId,"manifest-list":"$list"}}]}"""
          .stripMargin
      }
      // happy path: both tables change in one batch → 204
      val (hc, hb) = post(s"$base/v1/transactions/commit",
        s"""{"table-changes":[${change("txc_a", l1, 501)},
           |${change("txc_b", l2, 502)}]}""".stripMargin)
      assert(hc == 204, hb)
      assert(e.table("txc_a").read().count() == 2)
      assert(e.table("txc_b").read().count() == 3)
      val (a1, b1) = (e.table("txc_a").meta.currentSnapshotId,
        e.table("txc_b").meta.currentSnapshotId)
      // all-or-nothing: the SECOND change carries a STALE requirement
      // → 409, and the FIRST change is compensated back out
      val (fc, fb) = post(s"$base/v1/transactions/commit",
        s"""{"table-changes":[${change("txc_a", l1, 601)},
           |${change("txc_b", l2, 602, require = Some(b1 - 1))}]}"""
          .stripMargin)
      assert(fc == 409, fb)
      assert(e.table("txc_a").meta.currentSnapshotId == a1,
        "failed batch left the first table changed")
      assert(e.table("txc_b").meta.currentSnapshotId == b1)
      assert(e.table("txc_a").read().count() == 2)
      // unknown identifier → 404, nothing applied
      val (nc, _) = post(s"$base/v1/transactions/commit",
        s"""{"table-changes":[${change("txc_a", l1, 701)},
           |{"identifier":{"namespace":["default"],"name":"nope"},
           |"requirements":[],"updates":[]}]}""".stripMargin)
      assert(nc == 404)
      assert(e.table("txc_a").meta.currentSnapshotId == a1)
      // empty batch → 400
      assert(post(s"$base/v1/transactions/commit",
        """{"table-changes":[]}""")._1 == 400)
    } finally srv.stop()
  }

  /** PG shows other sessions the PRE-transaction catalog until COMMIT:
    * a table CREATED inside a still-open engine transaction must be
    * invisible to catalog readers, and a table whose DROP is staged
    * must still resolve for reads (its committed storage is untouched)
    * while refusing external writes.
    */
  test("catalog serves the pre-transaction catalog during an open tx") {
    import spark.implicits._
    val e = LakeEngine(spark)
    e.createTableAsSelect("cat_keep", LakeEngine.tempLocation("catk"),
      Seq(1L).toDF("id"))
    e.createTableAsSelect("cat_drop", LakeEngine.tempLocation("catd"),
      Seq(1L, 2L).toDF("id"))
    val srv = e.serveRestCatalog()
    try {
      val base = srv.address
      def names: Set[String] = {
        val (c, b) = get(s"$base/v1/namespaces/default/tables")
        assert(c == 200)
        mapper.readTree(b).get("identifiers").elements().asScala
          .map(_.get("name").asText()).toSet
      }
      e.sql("BEGIN")
      e.sql("CREATE TABLE cat_new AS SELECT 9 AS id")
      e.sql("DROP TABLE cat_drop")
      // created-in-tx: invisible; staged-dropped: still listed + loads
      assert(!names.contains("cat_new"),
        "in-tx created table leaked into the catalog")
      assert(names.contains("cat_drop"),
        "staged-dropped table vanished from the catalog before COMMIT")
      assert(get(s"$base/v1/namespaces/default/tables/cat_new")._1 == 404)
      val (dc, db) = get(s"$base/v1/namespaces/default/tables/cat_drop")
      assert(dc == 200)
      assert(mapper.readTree(db).get("metadata")
        .get("current-snapshot-id").asLong() > 0)
      // external WRITE to the staged-dropped table refuses
      assert(post(s"$base/v1/namespaces/default/tables/cat_drop",
        """{"updates":[{"action":"add-snapshot","snapshot":{
          |"snapshot-id":5,"manifest-list":"/nope"}}]}""".stripMargin)._1
        == 409)
      e.sql("COMMIT")
      // the commit instant flips the catalog: created appears, dropped
      // disappears
      assert(names.contains("cat_new") && !names.contains("cat_drop"))
      assert(get(s"$base/v1/namespaces/default/tables/cat_new")._1 == 200)
      assert(get(s"$base/v1/namespaces/default/tables/cat_drop")._1 == 404)
      e.sql("VACUUM") // reap the committed drop
    } finally srv.stop()
  }

  /** The reference's cross-table visibility (test_iceberg_xacts.py):
    * both tables of a multi-table transaction become visible at ONE
    * commit instant. A catalog reader polling both tables during a
    * deliberately slow COMMIT must never observe the first table's new
    * snapshot together with the second's old one — and an OPEN
    * transaction's staged state must never leak through the catalog at
    * all (PG: other sessions see nothing until COMMIT).
    */
  test("multi-table COMMIT is atomic through the catalog: no torn " +
      "visibility, no staged-state leak") {
    import org.apache.spark.sql.SparkSession
    val s2 = spark
    import s2.implicits._
    val e = LakeEngine(spark)
    e.createTableAsSelect("xv_a", LakeEngine.tempLocation("xva"),
      Seq(1L).toDF("id"))
    e.createTableAsSelect("xv_b", LakeEngine.tempLocation("xvb"),
      Seq(1L).toDF("id"))
    val srv = e.serveRestCatalog()
    try {
      val base = srv.address
      def snapOf(t: String): Long = {
        val (c, b) = get(s"$base/v1/namespaces/default/tables/$t")
        assert(c == 200)
        mapper.readTree(b).get("metadata")
          .get("current-snapshot-id").asLong()
      }
      val (oldA, oldB) = (snapOf("xv_a"), snapOf("xv_b"))
      e.sql("BEGIN")
      e.sql("INSERT INTO xv_a VALUES (2)")
      e.sql("INSERT INTO xv_b VALUES (2)")
      // an open transaction leaks NOTHING through the catalog
      assert(snapOf("xv_a") == oldA && snapOf("xv_b") == oldB,
        "staged in-tx state leaked through the REST catalog")
      // slow the install loop so the reader races the commit window
      e.txPreInstallHook = _ => Thread.sleep(250)
      val committer = new Thread(() => e.sql("COMMIT"))
      committer.start()
      // two sequential loads can straddle even an ATOMIC flip (old
      // first read, new second read), so the tear-witness is a
      // SANDWICH: one table provably old on BOTH sides of the other
      // table's new read — impossible under one commit instant, and
      // exactly what the per-table install order would show without
      // the visibility pin (xv_a installs first, xv_b ~250 ms later).
      var torn: Option[String] = None
      while (committer.isAlive) {
        val b1 = snapOf("xv_b"); val a1 = snapOf("xv_a")
        val b2 = snapOf("xv_b")
        if (a1 != oldA && b1 == oldB && b2 == oldB)
          torn = torn.orElse(Some(s"xv_a new ($a1) while xv_b old"))
        val a2 = snapOf("xv_a"); val b3 = snapOf("xv_b")
        val a3 = snapOf("xv_a")
        if (b3 != oldB && a2 == oldA && a3 == oldA)
          torn = torn.orElse(Some(s"xv_b new ($b3) while xv_a old"))
        Thread.sleep(10)
      }
      committer.join()
      e.txPreInstallHook = _ => ()
      assert(torn.isEmpty,
        s"torn cross-table visibility through the catalog: " +
          s"${torn.getOrElse("")} (pre-tx: $oldA/$oldB)")
      // after COMMIT both flipped together
      assert(snapOf("xv_a") != oldA && snapOf("xv_b") != oldB)
      assert(e.sql("SELECT count(*) FROM xv_a").first().getLong(0) == 2)
    } finally srv.stop()
  }
}
