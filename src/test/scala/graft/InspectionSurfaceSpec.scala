package graft

import graft.lake.{IcebergExport, LakeTable}
import graft.sources.S3Source
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The remaining reference SQL inspection/utility surfaces:
  * `lake_file.delete` (test_delete_file.py — disabled by default,
  * opt-in GUC), `lake_iceberg.table_size` (test_iceberg_table_size.py),
  * `lake_iceberg.find_all_referenced_files`
  * (test_iceberg_referenced_files.py — the GC live set in reference
  * order), `lake_iceberg.data_file_stats`
  * (test_iceberg_data_file_stats.py) and `lake.version`.
  */
class InspectionSurfaceSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshLoc(): String =
    Files.createTempDirectory("inspect").toString + "/t"

  test("lake_file.delete: disabled by default, opt-in deletes + evicts") {
    val e = LakeEngine(spark)
    val f = Files.createTempFile("del", ".csv")
    Files.write(f, "a\n1\n".getBytes("UTF-8"))
    val boom = intercept[IllegalArgumentException] {
      e.sql(s"SELECT lake_file.delete('${f}')")
    }
    assert(boom.getMessage.contains("file deletion has been disabled"))
    assert(Files.exists(f))
    e.sql("SET pg_lake_table.enable_delete_file_function TO on")
    try {
      e.sql(s"SELECT lake_file.delete('${f}')")
      assert(!Files.exists(f))
    } finally e.sql("RESET pg_lake_table.enable_delete_file_function")
    // back off after RESET
    val again = intercept[IllegalArgumentException] {
      e.sql(s"SELECT lake_file.delete('${f}')")
    }
    assert(again.getMessage.contains("disabled"))
  }

  test("lake_file.delete on an object store: DELETE + cache eviction") {
    val objects = scala.collection.concurrent.TrieMap(
      "d/x.csv" -> "a\n1\n2\n".getBytes("UTF-8"))
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val key = ex.getRequestURI.getPath.stripPrefix("/")
        .split("/", 2).lift(1).getOrElse("")
      ex.getRequestMethod match {
        case "DELETE" =>
          objects.remove(key)
          ex.sendResponseHeaders(204, -1)
        case _ => objects.get(key) match {
          case Some(b) =>
            ex.sendResponseHeaders(200, b.length.toLong)
            ex.getResponseBody.write(b)
          case None => ex.sendResponseHeaders(404, -1)
        }
      }
      ex.close()
    })
    server.start()
    val dir = Files.createTempDirectory("graft-delete-spec")
    System.setProperty("graft.http.cache.dir", dir.toString)
    System.setProperty("graft.s3.endpoint",
      s"http://127.0.0.1:${server.getAddress.getPort}")
    S3Source.clearRegionCache()
    try {
      val e = LakeEngine(spark)
      val url = "s3://bkt/d/x.csv"
      e.sql(s"SELECT lake_file_cache.add('$url')")
      assert(e.sql("SELECT * FROM lake_file_cache.list()").count() == 1)
      e.sql("SET pg_lake_table.enable_delete_file_function TO on")
      e.sql(s"SELECT lake_file.delete('$url')")
      assert(!objects.contains("d/x.csv"), "remote object must be gone")
      assert(e.sql("SELECT * FROM lake_file_cache.list()").count() == 0,
        "cache entry must evict with the object")
      e.sql("RESET pg_lake_table.enable_delete_file_function")
    } finally {
      server.stop(0)
      System.clearProperty("graft.http.cache.dir")
      System.clearProperty("graft.s3.endpoint")
      S3Source.clearRegionCache()
    }
  }

  test("lake_iceberg.table_size sums the current snapshot's bytes") {
    val e = LakeEngine(spark)
    e.createTableAsSelect("ts_t", freshLoc(),
      (1 to 100).map(i => (i, s"v$i")).toDF("id", "v"))
    val size = e.sql("SELECT lake_iceberg.table_size('ts_t')")
      .first().getLong(0)
    assert(size > 0)
    val fromFiles = e.table("ts_t").files
      .agg(sum("bytes")).first().getLong(0)
    assert(size == fromFiles)
  }

  test("find_all_referenced_files walks exported metadata in order") {
    val t = LakeTable.createAsSelect(spark, freshLoc(), "ref_files",
      (0 to 100).map(i => (i, i.toString)).toDF("id", "v"))
    val metaLoc = IcebergExport.export(t)
    val e = LakeEngine(spark)
    val paths = e.sql("SELECT * FROM lake_iceberg." +
      s"find_all_referenced_files('$metaLoc')")
      .collect().map(_.getString(0)).toSeq
    assert(paths.head.endsWith(".metadata.json") ||
      paths.head.endsWith("metadata.json"), paths.head)
    assert(paths.exists(p => p.contains("snap-") && p.endsWith(".avro")),
      "manifest list missing")
    assert(paths.exists(p => p.contains("manifest-") && p.endsWith(".avro")),
      "manifest missing")
    assert(paths.exists(_.endsWith(".parquet")), "data file missing")
    // order: metadata, then lists, then manifests, then leaves
    val kinds = paths.map {
      case p if p.endsWith("metadata.json") => 0
      case p if p.contains("snap-") => 1
      case p if p.contains("manifest-") => 2
      case _ => 3
    }
    assert(kinds == kinds.sorted, s"order violated: $paths")
  }

  test("data_file_stats decodes per-file bounds from exported metadata") {
    val t = LakeTable.createAsSelect(spark, freshLoc(), "dfs_t",
      (5 to 42).map(i => (i, s"s$i")).toDF("id", "v"))
    val metaLoc = IcebergExport.export(t)
    val e = LakeEngine(spark)
    val rows = e.sql(
      s"SELECT * FROM lake_iceberg.data_file_stats('$metaLoc')").collect()
    assert(rows.nonEmpty)
    assert(rows.head.schema.fieldNames.toSeq ==
      Seq("path", "sequence_number", "lower_bounds", "upper_bounds"))
    val lowers = rows.map(_.getAs[String]("lower_bounds")).mkString
    val uppers = rows.map(_.getAs[String]("upper_bounds")).mkString
    assert(lowers.contains("\"1\":\"5\""), lowers)
    assert(uppers.contains("\"1\":\"42\""), uppers)
  }

  test("snapshots carry sequence + parent lineage; files carry labels") {
    val e = LakeEngine(spark)
    e.createTableAsSelect("lin_t", freshLoc(), Seq(1, 2).toDF("id"))
    e.table("lin_t").append(Seq(3).toDF("id"))
    // reference test_iceberg_functions.py: sequence-number is the log
    // position, parent-snapshot-id chains to the previous snapshot
    val snaps = e.table("lin_t").snapshots
      .orderBy("sequence_number").collect()
    assert(snaps.map(_.getAs[Long]("sequence_number")).toSeq ==
      (1L to snaps.length).toSeq)
    snaps.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("parent_snapshot_id") ==
        a.getAs[Long]("snapshot_id"))
    }
    assert(snaps.head.isNullAt(snaps.head.fieldIndex("parent_snapshot_id")))
    assert(e.table("lin_t").files.select("content_type").distinct()
      .collect().map(_.getString(0)).toSeq == Seq("DATA"))
  }

  test("lake.version answers") {
    val e = LakeEngine(spark)
    assert(e.sql("SELECT lake.version()").first().getString(0).nonEmpty)
  }
}
