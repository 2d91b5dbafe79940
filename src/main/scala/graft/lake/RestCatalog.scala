package graft.lake

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Iceberg REST catalog endpoint over the engine's table registry — the
  * reference's headline attach surface: Spark/pyiceberg/iceberg-rust
  * connect to its catalog over HTTP (pg_lake_iceberg/src/rest_catalog/
  * rest_catalog.c:145, rest_catalog_ops.c:1-763; catalog.c:49-221).
  * Implements the read path of the public Iceberg REST OpenAPI spec
  * plus the write ops external engines need to create and commit:
  *
  *   GET  /v1/config
  *   GET  /v1/namespaces
  *   GET  /v1/namespaces/{ns}
  *   GET  /v1/namespaces/{ns}/tables
  *   GET  /v1/namespaces/{ns}/tables/{table}   (LoadTableResult)
  *   HEAD /v1/namespaces/{ns}/tables/{table}
  *   POST /v1/namespaces/{ns}/tables           (CreateTable)
  *   POST /v1/namespaces/{ns}/tables/{table}   (CommitTable: add-snapshot)
  *
  * The registry is flat, so tables live in a single `default` namespace.
  * `loadTable` re-exports the table's current snapshot before answering,
  * so the response always reflects the latest commit — the same property
  * the reference's object-store catalog export maintains per commit
  * (object_store_catalog.c:30-45). Export cost is metadata-scale
  * (O(changed files) via manifest reuse), never data-scale.
  *
  * Runs on the JDK's built-in HTTP server: driver-side, tiny, zero new
  * dependencies. Catalog traffic is metadata-only — data I/O goes
  * straight to the object store from whoever loaded the table.
  */
final class RestCatalog(engine: graft.LakeEngine, port: Int = 0) {

  private val mapper = new ObjectMapper()
  private val Ns = "default"

  private val server =
    HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
  server.createContext("/", (ex: HttpExchange) => handle(ex))
  server.start()

  /** Base URI clients attach to, e.g. `http://127.0.0.1:53421`. */
  def address: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  def stop(): Unit = server.stop(0)

  private def handle(ex: HttpExchange): Unit =
    try route(ex)
    catch {
      case e: Exception =>
        error(ex, 500, "InternalServerError",
          s"${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  private def route(ex: HttpExchange): Unit = {
    val segs = ex.getRequestURI.getPath
      .split("/").toList.filter(_.nonEmpty)
    (ex.getRequestMethod, segs) match {
      case ("GET", List("v1", "config")) =>
        json(ex, 200, """{"defaults":{},"overrides":{}}""")

      case ("GET", List("v1", "namespaces")) =>
        json(ex, 200, s"""{"namespaces":[["$Ns"]]}""")

      case ("GET", List("v1", "namespaces", `Ns`)) =>
        json(ex, 200, s"""{"namespace":["$Ns"],"properties":{}}""")

      case ("GET", List("v1", "namespaces", `Ns`, "tables")) =>
        val root = mapper.createObjectNode()
        val ids = root.putArray("identifiers")
        engine.tableNames.foreach { n =>
          val id = ids.addObject()
          id.putArray("namespace").add(Ns)
          id.put("name", n)
        }
        json(ex, 200, mapper.writeValueAsString(root))

      // CreateTable (spec: POST .../tables with name + Iceberg schema).
      // Field ids are assigned 1..n in field order — the same numbering
      // standard clients send — so imported per-file stats key cleanly.
      case ("POST", List("v1", "namespaces", `Ns`, "tables")) =>
        val body = mapper.readTree(ex.getRequestBody)
        val name = body.get("name").asText()
        if (engine.tableOption(name).isDefined)
          error(ex, 409, "AlreadyExistsException", s"table $name")
        else {
          val defs = graft.sources.IcebergSnapshot.fieldDefsOf(
            body.get("schema"))
          val schema = org.apache.spark.sql.types.StructType(defs.map(f =>
            org.apache.spark.sql.types.StructField(f.name,
              org.apache.spark.sql.types.DataType.fromDDL(f.dataType),
              f.nullable)))
          val loc = Option(body.get("location")).map(_.asText())
            .filter(_.nonEmpty)
            .getOrElse(graft.LakeEngine.tempLocation(s"rest_$name"))
          val t = LakeTable.create(engine.spark, loc, name, schema)
          engine.register(name, t)
          loadResult(ex, t)
        }

      // CommitTable (spec: POST .../tables/{t} with requirements +
      // updates). The supported update is add-snapshot with a staged
      // manifest-list: the catalog walks the client's metadata and
      // swaps the file set under the normal commit CAS.
      case ("POST", List("v1", "namespaces", `Ns`, "tables", t)) =>
        engine.tableOption(t) match {
          case None => error(ex, 404, "NoSuchTableException", s"table $t")
          case Some(lt) =>
            val body = mapper.readTree(ex.getRequestBody)
            // spec requirement check: a client that read snapshot S
            // must not clobber a table that moved past S (a racing
            // local append would otherwise be silently dropped —
            // CommitFailedException per the REST spec, client re-reads
            // and retries)
            val staleReq = Option(body.get("requirements")).toSeq
              .flatMap(_.elements().asScala)
              .filter(r => r.get("type").asText() == "assert-ref-snapshot-id")
              .find(r => r.get("snapshot-id").asLong() !=
                lt.meta.currentSnapshotId)
            if (staleReq.isDefined) {
              error(ex, 409, "CommitFailedException",
                s"requirement failed: table is at snapshot " +
                  s"${lt.meta.currentSnapshotId}, not " +
                  s"${staleReq.get.get("snapshot-id").asLong()}")
              return
            }
            val updates = Option(body.get("updates")).toSeq
              .flatMap(_.elements().asScala)
            val addSnap = updates.find(u =>
              u.get("action").asText() == "add-snapshot")
            addSnap match {
              case None =>
                error(ex, 400, "BadRequestException",
                  "only add-snapshot commits are supported")
              case Some(u) =>
                val listPath =
                  u.get("snapshot").get("manifest-list").asText()
                val m = lt.meta
                val typesById = m.currentSchema.fields.map(f =>
                  f.id -> org.apache.spark.sql.types.DataType
                    .fromDDL(f.dataType)).toMap
                val refs = graft.sources.IcebergSnapshot
                  .dataFilesFromManifestList(listPath, typesById)
                val entries = refs.map(r => FileEntry(
                  r.path.stripPrefix("file://"), r.records, r.bytes,
                  m.currentSchemaVersion, r.stats,
                  // conservative: imported files carry no transform
                  // stats, so partition pruning skips them (field-stat
                  // pruning still applies)
                  Map.empty))
                lt.importSnapshot(entries)
                engine.refresh(t)
                loadResult(ex, lt)
            }
        }

      case ("GET" | "HEAD", List("v1", "namespaces", `Ns`, "tables", t)) =>
        engine.tableOption(t) match {
          case None =>
            if (ex.getRequestMethod == "HEAD") head(ex, 404)
            else error(ex, 404, "NoSuchTableException", s"table $t")
          case Some(_) if ex.getRequestMethod == "HEAD" => head(ex, 200)
          case Some(lt) => loadResult(ex, lt)
        }

      case (_, List("v1", "namespaces", ns, _*)) if ns != Ns =>
        error(ex, 404, "NoSuchNamespaceException", s"namespace $ns")

      case (m, p) =>
        error(ex, 404, "NotFound", s"$m /${p.mkString("/")}")
    }
  }

  /** LoadTableResult: re-export the current snapshot, answer with the
    * metadata location + inline metadata.
    */
  private def loadResult(ex: HttpExchange, lt: LakeTable): Unit = {
    val metaLoc = IcebergExport.export(lt)
    val root = mapper.createObjectNode()
    root.put("metadata-location", metaLoc)
    root.set[com.fasterxml.jackson.databind.node.ObjectNode](
      "metadata", mapper.readTree(new String(Files.readAllBytes(
        Paths.get(metaLoc.stripPrefix("file://"))), UTF_8)))
    root.putObject("config")
    json(ex, 200, mapper.writeValueAsString(root))
  }

  private def head(ex: HttpExchange, code: Int): Unit = {
    ex.sendResponseHeaders(code, -1)
    ex.close()
  }

  private def json(ex: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes(UTF_8)
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(code, b.length)
    ex.getResponseBody.write(b)
    ex.close()
  }

  private def error(ex: HttpExchange, code: Int, typ: String,
      msg: String): Unit = {
    val root = mapper.createObjectNode()
    val e = root.putObject("error")
    e.put("message", msg)
    e.put("type", typ)
    e.put("code", code)
    json(ex, code, mapper.writeValueAsString(root))
  }
}
