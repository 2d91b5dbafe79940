package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The writable REST-catalog direction (reference
  * test_polaris_catalog_writable.py): a client engine registers a
  * table in the catalog, stages data + Iceberg metadata itself, and
  * commits through CommitTable with an assert-ref-snapshot-id
  * requirement — the CATALOG arbitrates concurrent writers.
  */
class WritableRestSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("create + append + re-append through the catalog, read back") {
    val e = LakeEngine(spark)
    val srv = e.serveRestCatalog()
    try {
      val schema = StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("v", StringType)))
      val metaLoc = e.createRestTable(srv.address, "default", "wrt",
        schema)
      assert(metaLoc.nonEmpty)
      val n1 = e.insertIntoRestTable(srv.address, "default", "wrt",
        Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
      assert(n1 == 2)
      val n2 = e.insertIntoRestTable(srv.address, "default", "wrt",
        Seq((3L, "c")).toDF("id", "v"))
      assert(n2 == 1)
      val back = e.createRestCatalogTable("wrt_back", srv.address,
        "default", "wrt")
      assert(back.orderBy("id").collect().map(_.getString(1)).toSeq ==
        Seq("a", "b", "c"))
      // the catalog's own engine sees the same rows (it owns the table)
      assert(e.table("wrt").read().count() == 3)
    } finally srv.stop()
  }

  test("concurrent appends: catalog CAS arbitrates, no rows lost") {
    val e = LakeEngine(spark)
    val srv = e.serveRestCatalog()
    try {
      e.createRestTable(srv.address, "default", "wrc",
        StructType(Seq(StructField("id", LongType))))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val futures = (0 until 4).map { w =>
        scala.concurrent.Future {
          e.insertIntoRestTable(srv.address, "default", "wrc",
            (0 until 10).map(i => w * 100L + i).toDF("id"),
            maxCommitRetries = 10)
        }
      }
      val ns = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futures),
        scala.concurrent.duration.Duration(120, "s"))
      pool.shutdown()
      assert(ns.sum == 40)
      val got = e.table("wrc").read().as[Long].collect().toSet
      assert(got.size == 40,
        s"a racing commit clobbered another writer: ${got.size}/40 rows")
    } finally srv.stop()
  }

  /** The advisor's lost-first-append window: a table with NO current
    * snapshot must still get an assert-ref-snapshot-id requirement
    * (spec: null snapshot-id = "the ref must have no current
    * snapshot"), or two racing FIRST appends both succeed and the
    * later full-state snapshot silently drops the earlier one's rows.
    * A mock external catalog (Polaris shape: fresh table reports no
    * current-snapshot-id) captures the commit bodies; also pins the
    * spec-required snapshot fields (timestamp-ms, summary.operation,
    * sequence-number, schema-id, parent-snapshot-id) and the
    * set-snapshot-ref update the reference client sends
    * (rest_catalog_ops.c GetAddSnapshotCatalogRequest).
    */
  test("empty-table append sends a null-snapshot requirement; payload is spec-complete") {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    import java.nio.charset.StandardCharsets.UTF_8
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val dir = java.nio.file.Files.createTempDirectory("extcat").toString
    val bodies =
      new java.util.concurrent.CopyOnWriteArrayList[
        com.fasterxml.jackson.databind.JsonNode]()
    // catalog state: (snapshot-id, manifest-list, sequence-number)
    @volatile var state: Option[(Long, String, Long)] = None
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      def reply(code: Int, body: String): Unit = {
        val b = body.getBytes(UTF_8)
        ex.sendResponseHeaders(code, b.length)
        ex.getResponseBody.write(b)
        ex.close()
      }
      def loadResult(): String = {
        val snapPart = state.fold("") { case (sid, ml, seq) =>
          s""""current-snapshot-id": $sid,
             |"snapshots": [{"snapshot-id": $sid, "manifest-list": "$ml",
             |  "sequence-number": $seq}],""".stripMargin
        }
        val lastSeq = state.fold(0L)(_._3)
        s"""{"metadata-location": "file://$dir/fake.metadata.json",
           |  "metadata": {
           |    "location": "file://$dir",
           |    $snapPart
           |    "last-sequence-number": $lastSeq,
           |    "schemas": [{"schema-id": 0, "type": "struct", "fields":
           |      [{"id": 1, "name": "id", "type": "long",
           |        "required": false}]}],
           |    "current-schema-id": 0
           |  }, "config": {}}""".stripMargin
      }
      (ex.getRequestMethod, ex.getRequestURI.getPath) match {
        case ("GET", p) if p.endsWith("/tables/ext_t") =>
          reply(200, loadResult())
        case ("POST", p) if p.endsWith("/tables/ext_t") =>
          val body = mapper.readTree(ex.getRequestBody)
          bodies.add(body)
          val snap = body.get("updates").get(0).get("snapshot")
          state = Some((snap.get("snapshot-id").asLong(),
            snap.get("manifest-list").asText(),
            snap.get("sequence-number").asLong()))
          reply(200, loadResult())
        case _ => reply(404, """{"error":{"message":"nope"}}""")
      }
    })
    server.start()
    try {
      val e = LakeEngine(spark)
      val uri = s"http://127.0.0.1:${server.getAddress.getPort}"
      val n1 = e.insertIntoRestTable(uri, "ns", "ext_t",
        Seq(1L, 2L).toDF("id"))
      val n2 = e.insertIntoRestTable(uri, "ns", "ext_t",
        Seq(3L).toDF("id"))
      assert(n1 == 2 && n2 == 1)
      assert(bodies.size == 2)
      val (b1, b2) = (bodies.get(0), bodies.get(1))
      // FIRST append: the requirement is present and null — without
      // it the catalog cannot reject a racing first append
      val req1 = b1.get("requirements").get(0)
      assert(req1.get("type").asText() == "assert-ref-snapshot-id")
      assert(req1.get("ref").asText() == "main")
      assert(req1.get("snapshot-id").isNull,
        s"empty-table commit must assert a null snapshot-id: $req1")
      val s1 = b1.get("updates").get(0).get("snapshot")
      assert(s1.has("timestamp-ms") && s1.has("manifest-list"))
      assert(s1.get("sequence-number").asLong() == 1L)
      assert(s1.get("schema-id").asInt() == 0)
      assert(s1.get("summary").get("operation").asText() == "append")
      assert(!s1.has("parent-snapshot-id"))
      val ref1 = b1.get("updates").get(1)
      assert(ref1.get("action").asText() == "set-snapshot-ref")
      assert(ref1.get("ref-name").asText() == "main")
      assert(ref1.get("type").asText() == "branch")
      assert(ref1.get("snapshot-id").asLong() ==
        s1.get("snapshot-id").asLong())
      // SECOND append: requirement = the first snapshot, sequence
      // number advances, parent chains
      val req2 = b2.get("requirements").get(0)
      assert(req2.get("snapshot-id").asLong() ==
        s1.get("snapshot-id").asLong())
      val s2 = b2.get("updates").get(0).get("snapshot")
      assert(s2.get("sequence-number").asLong() == 2L)
      assert(s2.get("parent-snapshot-id").asLong() ==
        s1.get("snapshot-id").asLong())
      // the committed manifest list is full state: 3 rows total
      val types = Map(1 -> (org.apache.spark.sql.types.LongType:
        org.apache.spark.sql.types.DataType))
      val files = graft.sources.IcebergSnapshot
        .dataFilesFromManifestList(state.get._2, types)
      assert(files.map(_.records).sum == 3L)
    } finally server.stop(0)
  }

  test("null-snapshot requirement 409s once a data commit landed") {
    val e = LakeEngine(spark)
    val srv = e.serveRestCatalog()
    try {
      e.createRestTable(srv.address, "default", "wrn",
        StructType(Seq(StructField("id", LongType))))
      // fresh table (create snapshot only): "ref has no current
      // snapshot" holds — a schema-only commit under the null
      // requirement passes
      e.table("wrn").commitExternal(None, None, Some(None))
      e.insertIntoRestTable(srv.address, "default", "wrn",
        Seq(1L).toDF("id"))
      // after a data commit the null requirement must fail — this is
      // the losing side of two racing FIRST appends
      val err = intercept[java.util.ConcurrentModificationException] {
        e.table("wrn").commitExternal(None, None, Some(None))
      }
      assert(err.getMessage.contains("no current snapshot"))
      // and over HTTP it surfaces as 409
      val client = new graft.lake.RestCatalogClient(srv.address)
      val http409 = intercept[java.io.IOException] {
        client.commitAddSnapshot("default", "wrn",
          "/nonexistent/list.avro", 777L, requiredSnapshot = None)
      }
      assert(http409.getMessage.contains("409"), http409.getMessage)
    } finally srv.stop()
  }

  test("stale requirement refuses with 409; commit protocol is enforced") {
    val e = LakeEngine(spark)
    val srv = e.serveRestCatalog()
    try {
      e.createRestTable(srv.address, "default", "wrs",
        StructType(Seq(StructField("id", LongType))))
      e.insertIntoRestTable(srv.address, "default", "wrs",
        Seq(1L).toDF("id"))
      val client = new graft.lake.RestCatalogClient(srv.address)
      // a commit demanding a snapshot the table has moved past → 409
      val err = intercept[java.io.IOException] {
        client.commitAddSnapshot("default", "wrs",
          "/nonexistent/list.avro", 12345L, requiredSnapshot = Some(-99L))
      }
      assert(err.getMessage.contains("409"), err.getMessage)
    } finally srv.stop()
  }

  /** Multi-table transactional appends through the catalog: inside an
    * engine transaction, REST appends STAGE (parquet + manifest list
    * written eagerly, like every engine write) and COMMIT sends the
    * whole batch as ONE spec CommitTransaction — all-or-nothing
    * server-side with one visibility instant. ROLLBACK reaps the
    * staged trees; a concurrent autocommit writer landing between
    * staging and COMMIT is merged, never lost; appends to the same
    * table fold into one change; mixing engine-managed writes
    * refuses.
    */
  test("REST appends in a transaction commit as ONE " +
      "CommitTransaction batch") {
    import org.apache.spark.sql.types._
    val e = LakeEngine(spark)
    val srv = e.serveRestCatalog()
    try {
      val uri = srv.address
      val schema = StructType(Seq(
        StructField("id", LongType, nullable = false)))
      e.createRestTable(uri, "default", "bt1", schema)
      e.createRestTable(uri, "default", "bt2", schema)
      e.sql("BEGIN")
      assert(e.insertIntoRestTable(uri, "default", "bt1",
        Seq(1L, 2L).toDF("id")) == 2)
      assert(e.insertIntoRestTable(uri, "default", "bt2",
        Seq(3L).toDF("id")) == 1)
      // nothing committed before COMMIT
      assert(e.table("bt1").read().count() == 0)
      assert(e.table("bt2").read().count() == 0)
      e.sql("COMMIT")
      assert(e.table("bt1").read().as[Long].collect().toSet ==
        Set(1L, 2L))
      assert(e.table("bt2").read().as[Long].collect().toSet == Set(3L))
      // ROLLBACK reaps the staged trees, commits nothing
      e.sql("BEGIN")
      e.insertIntoRestTable(uri, "default", "bt1", Seq(9L).toDF("id"))
      e.sql("ROLLBACK")
      assert(e.table("bt1").read().count() == 2)
      // a concurrent autocommit writer between staging and COMMIT is
      // MERGED by the batch's fresh-requirement retry logic — neither
      // side's rows are lost
      e.sql("BEGIN")
      e.insertIntoRestTable(uri, "default", "bt1", Seq(10L).toDF("id"))
      e.insertIntoRestTable(uri, "default", "bt2", Seq(11L).toDF("id"))
      val e2 = LakeEngine(spark)
      e2.insertIntoRestTable(uri, "default", "bt2",
        Seq(100L).toDF("id"))
      e.sql("COMMIT")
      assert(e.table("bt1").read().as[Long].collect().toSet ==
        Set(1L, 2L, 10L))
      assert(e.table("bt2").read().as[Long].collect().toSet ==
        Set(3L, 11L, 100L))
      // two appends to the SAME table fold into one change
      e.sql("BEGIN")
      e.insertIntoRestTable(uri, "default", "bt1", Seq(20L).toDF("id"))
      e.insertIntoRestTable(uri, "default", "bt1", Seq(21L).toDF("id"))
      e.sql("COMMIT")
      assert(e.table("bt1").read().as[Long].collect().toSet ==
        Set(1L, 2L, 10L, 20L, 21L))
      // mixing engine-managed writes refuses at write time...
      e.createTableAsSelect("btl", LakeEngine.tempLocation("btl"),
        Seq(1L).toDF("id"))
      e.sql("BEGIN")
      e.sql("INSERT INTO btl VALUES (2)")
      val mix = intercept[IllegalArgumentException](
        e.insertIntoRestTable(uri, "default", "bt1",
          Seq(30L).toDF("id")))
      assert(mix.getMessage.contains("cannot mix"))
      e.sql("ROLLBACK")
      // ...and in the rest-then-local order the COMMIT backstop aborts
      // the whole transaction (nothing lands anywhere)
      e.sql("BEGIN")
      e.insertIntoRestTable(uri, "default", "bt1", Seq(31L).toDF("id"))
      e.sql("INSERT INTO btl VALUES (3)")
      val mix2 = intercept[IllegalStateException](e.sql("COMMIT"))
      assert(mix2.getMessage.contains("mixing"))
      assert(e.table("bt1").read().count() == 5)
      assert(e.table("btl").read().as[Long].collect().toSet == Set(1L))
      // SERIALIZABLE + rest-only writes: a LOCAL table this tx READ
      // moving underneath still fails the commit (the rest-batch
      // commit path carries the same write-skew protection)
      val eX = LakeEngine(spark)
      eX.loadTable("btl_x", e.table("btl").location)
      e.sql("BEGIN ISOLATION LEVEL SERIALIZABLE")
      assert(e.table("btl").read().count() == 1) // read pin
      e.insertIntoRestTable(uri, "default", "bt2", Seq(40L).toDF("id"))
      eX.sql("INSERT INTO btl_x VALUES (7)") // concurrent local commit
      val skew = intercept[java.util.ConcurrentModificationException](
        e.sql("COMMIT"))
      assert(skew.getMessage.contains("could not serialize access"))
      // nothing committed: the rest append is gone too
      assert(e.table("bt2").read().as[Long].collect().toSet ==
        Set(3L, 11L, 100L))
    } finally srv.stop()
  }
}
