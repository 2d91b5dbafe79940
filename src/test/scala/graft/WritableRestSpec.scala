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
}
