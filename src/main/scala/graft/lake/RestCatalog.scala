package graft.lake

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** Iceberg REST catalog endpoint over the engine's table registry — the
  * reference's headline attach surface: Spark/pyiceberg/iceberg-rust
  * connect to its catalog over HTTP (pg_lake_iceberg/src/rest_catalog/
  * rest_catalog.c:145, rest_catalog_ops.c:1-763; catalog.c:49-221).
  * Implements the read path of the public Iceberg REST OpenAPI spec
  * plus the write + lifecycle ops external engines need:
  *
  *   POST   /v1/oauth/tokens                       (client-credentials)
  *   GET    /v1/config
  *   GET    /v1/namespaces                         (list)
  *   POST   /v1/namespaces                         (create)
  *   GET    /v1/namespaces/{ns}                    (properties)
  *   DELETE /v1/namespaces/{ns}                    (drop when empty)
  *   GET    /v1/namespaces/{ns}/tables             (list)
  *   POST   /v1/namespaces/{ns}/tables             (CreateTable)
  *   GET    /v1/namespaces/{ns}/tables/{table}     (LoadTableResult)
  *   HEAD   /v1/namespaces/{ns}/tables/{table}
  *   POST   /v1/namespaces/{ns}/tables/{table}     (CommitTable:
  *            add-snapshot + add-schema/set-current-schema evolution)
  *   DELETE /v1/namespaces/{ns}/tables/{table}     (DropTable)
  *   POST   /v1/tables/rename
  *
  * Auth matches the reference's rest_catalog_auth.c posture (OAuth2
  * client-credentials + bearer, rest_catalog_auth.c:1-388): when
  * `credentials` is non-empty every route except the token endpoint
  * demands `Authorization: Bearer <token>` where the token came from
  * POST /v1/oauth/tokens with a valid client_id/client_secret pair;
  * expired or unknown tokens get 401 and the client re-exchanges.
  *
  * The engine registry is flat; REST namespaces beyond `default` are
  * catalog-level — their tables register under the mangled engine key
  * `ns__table` and are tracked in [[nsTables]] so listings never leak
  * across namespaces. `loadTable` re-exports the table's current
  * snapshot before answering, so the response always reflects the
  * latest commit — the same property the reference's object-store
  * catalog export maintains per commit (object_store_catalog.c:30-45).
  * Export cost is metadata-scale (O(changed files) via manifest
  * reuse), never data-scale.
  *
  * Runs on the JDK's built-in HTTP server: driver-side, tiny, zero new
  * dependencies. Catalog traffic is metadata-only — data I/O goes
  * straight to the object store from whoever loaded the table.
  */
final class RestCatalog(engine: graft.LakeEngine, port: Int = 0,
    credentials: Map[String, String] = Map.empty,
    tokenTtlMillis: Long = 3600L * 1000) {

  private val mapper = new ObjectMapper()
  private val DefaultNs = "default"

  /** namespace -> properties; seeded with the default namespace. */
  private val namespaces = TrieMap[String, Map[String, String]](
    DefaultNs -> Map.empty)

  /** (ns, table) -> engine registry key, for non-default namespaces. */
  private val nsTables = TrieMap.empty[(String, String), String]

  /** bearer token -> expiry epoch millis. */
  private val tokens = TrieMap.empty[String, Long]

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

  // --------------------------------------------------------------- auth

  /** OAuth2 client-credentials exchange (form-encoded per RFC 6749). */
  private def issueToken(ex: HttpExchange): Unit = {
    val form = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      .split("&").toSeq.flatMap { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => Some(
            java.net.URLDecoder.decode(k, UTF_8) ->
              java.net.URLDecoder.decode(v, UTF_8))
          case _ => None
        }
      }.toMap
    val ok = form.get("grant_type").contains("client_credentials") &&
      form.get("client_id").exists(id =>
        credentials.get(id).exists(sec =>
          form.get("client_secret").contains(sec)))
    if (!ok) {
      error(ex, 401, "OAuthError", "invalid client credentials")
      return
    }
    val tok = java.util.UUID.randomUUID().toString
    tokens.put(tok, System.currentTimeMillis() + tokenTtlMillis)
    // drop expired tokens so the store stays bounded
    val now = System.currentTimeMillis()
    tokens.filterInPlace((_, exp) => exp > now)
    json(ex, 200, s"""{"access_token":"$tok","token_type":"bearer",""" +
      s""""expires_in":${tokenTtlMillis / 1000}}""")
  }

  /** True when the request may proceed; otherwise answers 401. */
  private def authorized(ex: HttpExchange): Boolean = {
    if (credentials.isEmpty) return true
    val ok = Option(ex.getRequestHeaders.getFirst("Authorization"))
      .filter(_.startsWith("Bearer "))
      .map(_.stripPrefix("Bearer ").trim)
      .exists(t => tokens.get(t).exists(_ > System.currentTimeMillis()))
    if (!ok)
      error(ex, 401, "NotAuthorizedException",
        "missing, unknown, or expired bearer token")
    ok
  }

  // ----------------------------------------------------------- registry

  private def engineKey(ns: String, table: String): String =
    if (ns == DefaultNs) table else s"${ns}__$table"

  /** Engine keys owned by non-default namespaces (hidden from default). */
  private def claimed: Set[String] = nsTables.values.toSet

  // resolution and listings go through the engine's CATALOG view: a
  // table created inside a still-open engine transaction is invisible
  // to external readers, a staged-dropped one still resolves — PG
  // shows other sessions the pre-transaction catalog until COMMIT
  private def resolve(ns: String, table: String): Option[LakeTable] =
    if (ns == DefaultNs)
      engine.catalogTable(table).filterNot(_ => claimed.contains(table))
    else nsTables.get((ns, table)).flatMap(engine.catalogTable)

  private def tablesIn(ns: String): Seq[String] =
    if (ns == DefaultNs) engine.catalogTableNames.filterNot(claimed)
    else nsTables.keys.collect { case (n, t) if n == ns => t }.toSeq.sorted

  /** A staged-dropped table resolves for READS (pre-tx catalog) but
    * refuses external WRITES — an external commit would land in a
    * tree the local transaction is about to queue for deletion.
    */
  private def writable(ns: String, table: String): Option[LakeTable] =
    resolve(ns, table).filter(_ =>
      engine.tableOption(engineKey(ns, table)).isDefined)

  // -------------------------------------------------------------- routes

  private def route(ex: HttpExchange): Unit = {
    val segs = ex.getRequestURI.getPath
      .split("/").toList.filter(_.nonEmpty)
    val method = ex.getRequestMethod

    // the token endpoint is the only unauthenticated route — it IS the
    // way to become authenticated
    if ((method, segs) == (("POST", List("v1", "oauth", "tokens")))) {
      issueToken(ex)
      return
    }
    if (!authorized(ex)) return

    (method, segs) match {
      case ("GET", List("v1", "config")) =>
        json(ex, 200, """{"defaults":{},"overrides":{}}""")

      case ("GET", List("v1", "namespaces")) =>
        val root = mapper.createObjectNode()
        val arr = root.putArray("namespaces")
        namespaces.keys.toSeq.sorted.foreach(n => arr.addArray().add(n))
        json(ex, 200, mapper.writeValueAsString(root))

      case ("POST", List("v1", "namespaces")) =>
        val body = mapper.readTree(ex.getRequestBody)
        val parts = Option(body.get("namespace")).toSeq
          .flatMap(_.elements().asScala).map(_.asText())
        if (parts.size != 1)
          error(ex, 400, "BadRequestException",
            "single-level namespaces only")
        else {
          val ns = parts.head
          val props = Option(body.get("properties")).map(p =>
            p.properties().asScala
              .map(e => e.getKey -> e.getValue.asText()).toMap)
            .getOrElse(Map.empty[String, String])
          if (namespaces.putIfAbsent(ns, props).isDefined)
            error(ex, 409, "AlreadyExistsException", s"namespace $ns")
          else
            json(ex, 200,
              s"""{"namespace":["$ns"],"properties":${propsJson(props)}}""")
        }

      case ("GET", List("v1", "namespaces", ns)) =>
        namespaces.get(ns) match {
          case None => error(ex, 404, "NoSuchNamespaceException", ns)
          case Some(props) => json(ex, 200,
            s"""{"namespace":["$ns"],"properties":${propsJson(props)}}""")
        }

      case ("DELETE", List("v1", "namespaces", ns)) =>
        if (!namespaces.contains(ns))
          error(ex, 404, "NoSuchNamespaceException", ns)
        else if (ns == DefaultNs)
          error(ex, 400, "BadRequestException",
            "the default namespace cannot be dropped")
        else if (tablesIn(ns).nonEmpty)
          error(ex, 409, "NamespaceNotEmptyException",
            s"namespace $ns still holds ${tablesIn(ns).size} table(s)")
        else { namespaces.remove(ns); head(ex, 204) }

      case ("GET", List("v1", "namespaces", ns, "tables")) =>
        if (!namespaces.contains(ns)) {
          error(ex, 404, "NoSuchNamespaceException", ns)
          return
        }
        val root = mapper.createObjectNode()
        val ids = root.putArray("identifiers")
        tablesIn(ns).foreach { n =>
          val id = ids.addObject()
          id.putArray("namespace").add(ns)
          id.put("name", n)
        }
        json(ex, 200, mapper.writeValueAsString(root))

      // CreateTable (spec: POST .../tables with name + Iceberg schema).
      // Field ids are assigned 1..n in field order — the same numbering
      // standard clients send — so imported per-file stats key cleanly.
      case ("POST", List("v1", "namespaces", ns, "tables")) =>
        val body = mapper.readTree(ex.getRequestBody)
        val name = body.get("name").asText()
        if (!namespaces.contains(ns))
          error(ex, 404, "NoSuchNamespaceException", ns)
        else if (resolve(ns, name).isDefined ||
            engine.tableOption(engineKey(ns, name)).isDefined)
          error(ex, 409, "AlreadyExistsException", s"table $ns.$name")
        else {
          val defs = graft.sources.IcebergSnapshot.fieldDefsOf(
            body.get("schema"))
          val schema = org.apache.spark.sql.types.StructType(defs.map(f =>
            org.apache.spark.sql.types.StructField(f.name,
              org.apache.spark.sql.types.DataType.fromDDL(f.dataType),
              f.nullable)))
          // no client location → warehouse dir, like every engine
          // default (driver-local /tmp is invisible to executors on a
          // real cluster)
          val loc = Option(body.get("location")).map(_.asText())
            .filter(_.nonEmpty)
            .getOrElse(graft.LakeEngine.defaultTableLocation(
              engine.spark, s"rest_$name"))
          val key = engineKey(ns, name)
          val t = LakeTable.create(engine.spark, loc, key, schema)
          engine.register(key, t)
          if (ns != DefaultNs) nsTables.put((ns, name), key)
          loadResult(ex, t)
        }

      // CommitTable (spec: POST .../tables/{t} with requirements +
      // updates). Supported updates: add-snapshot (staged
      // manifest-list walked, file set swapped under the commit CAS)
      // and schema evolution via add-schema/set-current-schema — the
      // actions standard clients send for ALTER TABLE ADD/RENAME/DROP
      // COLUMN — mapped onto the metadata-only column ops by field-id
      // diff (reference rest_catalog_ops.c handles the same UpdateTable
      // surface).
      case ("POST", List("v1", "namespaces", ns, "tables", t)) =>
        resolve(ns, t) match {
          case None => error(ex, 404, "NoSuchTableException", s"table $t")
          case Some(_) if writable(ns, t).isEmpty =>
            error(ex, 409, "CommitFailedException",
              s"table $t is being dropped by an in-progress transaction")
          case Some(lt) =>
            try {
              applyTableCommit(lt, mapper.readTree(ex.getRequestBody))
              engine.refresh(engineKey(ns, t))
              loadResult(ex, lt)
            } catch {
              case e: java.util.ConcurrentModificationException =>
                error(ex, 409, "CommitFailedException", e.getMessage)
              case e: IllegalArgumentException =>
                error(ex, 400, "BadRequestException", e.getMessage)
            }
        }

      // CommitTransaction (spec: POST /v1/transactions/commit with
      // `table-changes`, each a CommitTableRequest with identifier +
      // requirements + updates): EVERY change applies or none does,
      // and catalog visibility flips at ONE instant — the external
      // writer's multi-table commit point, matching the engine's own
      // multi-table COMMIT and the reference's PG commit
      // (test_iceberg_xacts.py). Failure atomicity: requirements
      // pre-validate inside each table's CAS; a mid-batch failure
      // COMPENSATES every installed change back to its pre-state
      // (refused, loudly, if a concurrent writer already built on
      // top). Visibility: the engine's txVisibilityPin covers every
      // participant for the whole window, so catalog readers never
      // see a torn batch. A server crash mid-batch is the documented
      // residual (the engine's own commitTx carries crash markers;
      // a catalog client can re-drive the batch — its requirements
      // detect the partial state).
      case ("POST", List("v1", "transactions", "commit")) =>
        val body = mapper.readTree(ex.getRequestBody)
        val changes = Option(body.get("table-changes")).toSeq
          .flatMap(_.elements().asScala).toSeq
        val resolved = changes.map { ch =>
          val id = ch.get("identifier")
          val cns = Option(id.get("namespace")).toSeq
            .flatMap(_.elements().asScala).map(_.asText())
            .headOption.getOrElse(DefaultNs)
          val name = id.get("name").asText()
          (cns, name, resolve(cns, name), ch)
        }
        if (changes.isEmpty)
          error(ex, 400, "BadRequestException", "no table-changes")
        else resolved.find(_._3.isEmpty) match {
          case Some((cns, name, _, _)) =>
            error(ex, 404, "NoSuchTableException", s"table $cns.$name")
          case _ if resolved.exists { case (cns, n, _, _) =>
              writable(cns, n).isEmpty } =>
            error(ex, 409, "CommitFailedException",
              "a batch table is being dropped by an in-progress " +
                "transaction")
          case _ => txBatchLock.synchronized {
            val parts = resolved.map { case (cns, n, lt0, ch) =>
              (cns, n, lt0.get, ch) }
            val pre = parts.map { case (_, _, lt, _) =>
              lt.location -> TableMetadata.load(lt.location) }.toMap
            engine.pinVisibility(pre)
            val installedStates =
              scala.collection.mutable.ListBuffer.empty[
                (LakeTable, TableMetadata)]
            try {
              parts.foreach { case (_, _, lt, ch) =>
                applyTableCommit(lt, ch)
                installedStates += ((lt, TableMetadata.load(lt.location)))
              }
              engine.unpinVisibility(pre.keys)
              parts.foreach { case (cns, n, _, _) =>
                engine.refresh(engineKey(cns, n)) }
              head(ex, 204)
            } catch {
              case scala.util.control.NonFatal(e) =>
                installedStates.toList.reverse.foreach {
                  case (lt, installed) =>
                    try TableMetadata.commit(lt.location) { curOpt =>
                      val disk = curOpt.getOrElse(
                        throw new IllegalStateException(
                          s"table vanished at ${lt.location}"))
                      if (!TxMarker.sameState(disk, installed))
                        throw new IllegalStateException(
                          "a concurrent writer already built on the " +
                            "aborted batch change")
                      pre(lt.location)
                    } catch {
                      case scala.util.control.NonFatal(e2) =>
                        org.slf4j.LoggerFactory.getLogger(getClass).warn(
                          s"transactions/commit: could not compensate " +
                            s"${lt.location}", e2)
                    }
                }
                engine.unpinVisibility(pre.keys)
                e match {
                  case c: java.util.ConcurrentModificationException =>
                    error(ex, 409, "CommitFailedException", c.getMessage)
                  case i: IllegalArgumentException =>
                    error(ex, 400, "BadRequestException", i.getMessage)
                  case o => error(ex, 500, "InternalServerError",
                    s"${o.getClass.getSimpleName}: ${o.getMessage}")
                }
            }
          }
        }

      case ("GET" | "HEAD", List("v1", "namespaces", ns, "tables", t)) =>
        resolve(ns, t) match {
          case None =>
            if (method == "HEAD") head(ex, 404)
            else error(ex, 404, "NoSuchTableException", s"table $t")
          case Some(_) if method == "HEAD" => head(ex, 200)
          case Some(lt) => loadResult(ex, lt)
        }

      // DropTable (spec: DELETE .../tables/{t}?purgeRequested=true).
      case ("DELETE", List("v1", "namespaces", ns, "tables", t)) =>
        resolve(ns, t) match {
          case None => error(ex, 404, "NoSuchTableException", s"table $t")
          case Some(_) if writable(ns, t).isEmpty =>
            error(ex, 409, "CommitFailedException",
              s"table $t is being dropped by an in-progress transaction")
          case Some(_) =>
            val purge = Option(ex.getRequestURI.getQuery)
              .exists(_.split("&").contains("purgeRequested=true"))
            engine.dropTable(engineKey(ns, t), purge)
            nsTables.remove((ns, t))
            head(ex, 204)
        }

      // RenameTable (spec: POST /v1/tables/rename with source +
      // destination identifiers). Registry-only — the table keeps its
      // location and metadata (Iceberg rename semantics).
      case ("POST", List("v1", "tables", "rename")) =>
        val body = mapper.readTree(ex.getRequestBody)
        def ident(k: String): Option[(String, String)] =
          Option(body.get(k)).flatMap { n =>
            val ns = Option(n.get("namespace")).toSeq
              .flatMap(_.elements().asScala).map(_.asText())
            Option(n.get("name")).map(_.asText())
              .map(t => (ns.headOption.getOrElse(DefaultNs), t))
          }
        (ident("source"), ident("destination")) match {
          case (Some((sns, st)), Some((dns, dt))) =>
            if (resolve(sns, st).isEmpty)
              error(ex, 404, "NoSuchTableException", s"table $sns.$st")
            else if (!namespaces.contains(dns))
              error(ex, 404, "NoSuchNamespaceException", dns)
            else if (resolve(dns, dt).isDefined)
              error(ex, 409, "AlreadyExistsException", s"table $dns.$dt")
            else {
              engine.renameTable(engineKey(sns, st), engineKey(dns, dt))
              if (sns != DefaultNs) nsTables.remove((sns, st))
              if (dns != DefaultNs)
                nsTables.put((dns, dt), engineKey(dns, dt))
              head(ex, 204)
            }
          case _ =>
            error(ex, 400, "BadRequestException",
              "rename needs source and destination identifiers")
        }

      case (_, List("v1", "namespaces", ns, _*))
          if !namespaces.contains(ns) =>
        error(ex, 404, "NoSuchNamespaceException", s"namespace $ns")

      case (m, p) =>
        error(ex, 404, "NotFound", s"$m /${p.mkString("/")}")
    }
  }

  /** Serializes concurrent /v1/transactions/commit batches: the batch
    * is all-or-nothing, so two interleaved batches compensating each
    * other would livelock; per-table CASes still protect against
    * engine-local writers landing inside the window.
    */
  private val txBatchLock = new Object

  /** Apply ONE CommitTableRequest (requirements + updates) to a table
    * under a single metadata CAS — shared by CommitTable and the
    * multi-table CommitTransaction route.
    *
    * Spec requirement: a client that read snapshot S must not clobber
    * a table that moved past S (a racing local append would otherwise
    * be silently dropped). Enforced INSIDE the commit CAS
    * (commitExternal's closure) — a pre-check would race a local
    * commit landing before the CAS. outer None = no requirement sent
    * (legacy client); Some(None) = snapshot-id null, spec: "the ref
    * must have no current snapshot" — required so two racing FIRST
    * appends conflict; Some(Some(id)) = ref must be at id.
    *
    * Supported updates: add-snapshot (staged manifest-list walked,
    * file set swapped under the commit CAS) and schema evolution via
    * add-schema/set-current-schema — the actions standard clients
    * send for ALTER TABLE ADD/RENAME/DROP COLUMN — mapped onto the
    * metadata-only column ops by field-id diff (reference
    * rest_catalog_ops.c handles the same UpdateTable surface). ONE
    * atomic commit: requirement + schema evolution + snapshot swap
    * all inside the same metadata CAS (spec: updates and requirements
    * succeed or fail as a unit) — a 409 can never leave a schema
    * change half-applied, and schema-only commits honor
    * assert-ref-snapshot-id. set-current-schema is implicit
    * (-1 = latest).
    *
    * Throws ConcurrentModificationException (→409) or
    * IllegalArgumentException (→400).
    */
  private def applyTableCommit(lt: LakeTable,
      body: com.fasterxml.jackson.databind.JsonNode): Unit = {
    val requiredSnap: Option[Option[Long]] =
      Option(body.get("requirements")).toSeq
        .flatMap(_.elements().asScala)
        .filter(r =>
          r.get("type").asText() == "assert-ref-snapshot-id")
        .map(r => Option(r.get("snapshot-id"))
          .filterNot(_.isNull).map(_.asLong()))
        .headOption
    val updates = Option(body.get("updates")).toSeq
      .flatMap(_.elements().asScala).toSeq
    val actions = updates.map(_.get("action").asText())
    val unsupported = actions.filterNot(Set(
      "add-snapshot", "add-schema", "set-current-schema",
      "set-snapshot-ref"))
    if (updates.isEmpty)
      throw new IllegalArgumentException("no updates in commit")
    if (unsupported.nonEmpty)
      throw new IllegalArgumentException(
        s"unsupported update action(s): ${unsupported.mkString(", ")}")
    val incomingSchema = updates
      .filter(_.get("action").asText() == "add-schema")
      .map(u => graft.sources.IcebergSnapshot
        .fieldDefsOf(u.get("schema")))
      .lastOption
    val addSnapId = updates
      .find(_.get("action").asText() == "add-snapshot")
      .map(_.get("snapshot").get("snapshot-id").asLong())
    // set-snapshot-ref: our add-snapshot advances main implicitly, so
    // the update is honored by VALIDATION — it must name the branch
    // main and the snapshot this same commit adds (spec: a commit's
    // updates apply as a unit; pointing main anywhere else is
    // unsupported)
    val badRef = updates
      .filter(_.get("action").asText() == "set-snapshot-ref")
      .find { u =>
        !Option(u.get("ref-name")).map(_.asText())
          .contains("main") ||
          !Option(u.get("snapshot-id")).map(_.asLong())
            .exists(addSnapId.contains)
      }
    val buildEntries = updates
      .find(_.get("action").asText() == "add-snapshot")
      .map { u =>
        val listPath =
          u.get("snapshot").get("manifest-list").asText()
        (m: TableMetadata) => {
          // resolve against the POST-evolution schema the new
          // snapshot is tagged with
          val typesById = m.currentSchema.fields.map(f =>
            f.id -> org.apache.spark.sql.types.DataType
              .fromDDL(f.dataType)).toMap
          graft.sources.IcebergSnapshot
            .dataFilesFromManifestList(listPath, typesById)
            .map(r => FileEntry(
              r.path.stripPrefix("file://"), r.records, r.bytes,
              m.currentSchemaVersion, r.stats,
              // conservative: imported files carry no transform
              // stats, so partition pruning skips them
              // (field-stat pruning still applies)
              Map.empty))
        }
      }
    if (badRef.isDefined)
      throw new IllegalArgumentException(
        "set-snapshot-ref must advance branch main to the " +
          "snapshot added by this same commit")
    lt.commitExternal(incomingSchema, buildEntries, requiredSnap)
  }

  private def propsJson(props: Map[String, String]): String =
    mapper.writeValueAsString(mapper.valueToTree(props.asJava))

  /** LoadTableResult: re-export the current snapshot, answer with the
    * metadata location + inline metadata. The exported state is the
    * engine's COMMITTED VIEW — never in-transaction staged metadata,
    * and during a multi-table COMMIT's install window the pre-tx state
    * of every participant, so a catalog reader polling two tables can
    * never observe one table's new version with the other's old one
    * (the reference's PG-commit visibility, test_iceberg_xacts.py).
    */
  private def loadResult(ex: HttpExchange, lt: LakeTable): Unit = {
    val metaLoc = IcebergExport.export(lt, engine.committedView(lt))
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
