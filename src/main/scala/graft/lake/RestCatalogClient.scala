package graft.lake

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8

/** Iceberg REST catalog CLIENT — consume tables an external catalog
  * (Polaris et al.) serves, the other half of [[RestCatalog]] (our
  * server). Mirrors the reference's client stack
  * (pg_lake_iceberg/src/rest_catalog/):
  *
  *   - OAuth2 client-credentials exchange against `oauthUri` (default:
  *     Polaris' `<base>/v1/oauth/tokens` — rest_catalog_auth.c:252),
  *     token cached and refreshed when within a minute of expiry
  *     (rest_catalog_auth.c:195).
  *   - Retry classification (rest_catalog_http.c
  *     ClassifyRestCatalogRequestRetry, max 3 retries): 429 backs off
  *     short, 503 backs off long, 419 (token expired) FORCE-refreshes
  *     the token and patches the Authorization header before retrying
  *     (test_token_refresh_on_retry.py), anything else stops.
  *   - Error envelope `{"error":{"message":...,"type":...,"code":...}}`
  *     surfaces in the thrown message (ReportHTTPError).
  *   - Namespace/table path segments URL-encode through [[UrlEncode]]
  *     exactly like the reference client
  *     (track_iceberg_metadata_changes.c:785-789).
  *
  * Scale posture: the catalog serves METADATA only — a loadTable is
  * one small request; data reads go straight to object storage from
  * the returned metadata location.
  */
final class RestCatalogClient(
    baseUri: String,
    clientId: Option[String] = None,
    clientSecret: Option[String] = None,
    oauthUri: Option[String] = None,
    maxRetry: Int = 3,
    backoffMs: Long = 25) {

  private val mapper = new ObjectMapper()
  private val http = HttpClient.newHttpClient()
  private val base = baseUri.stripSuffix("/")

  /** (token, fetchedAt + expiresIn millis). */
  @volatile private var cached: Option[(String, Long)] = None

  private def tokenEndpoint: String =
    oauthUri.getOrElse(s"$base/v1/oauth/tokens")

  /** Access token, re-exchanged when absent, expiring within a
    * minute, or `force`d (the 419 branch).
    */
  private def accessToken(force: Boolean): Option[String] = {
    if (clientId.isEmpty) return None
    val now = System.currentTimeMillis()
    cached match {
      case Some((tok, exp)) if !force && exp - now > 60 * 1000 => Some(tok)
      case _ =>
        def enc(s: String) = java.net.URLEncoder.encode(s, UTF_8)
        val form = s"grant_type=client_credentials" +
          s"&client_id=${enc(clientId.get)}" +
          s"&client_secret=${enc(clientSecret.getOrElse(""))}" +
          "&scope=PRINCIPAL_ROLE:ALL"
        val req = HttpRequest.newBuilder(URI.create(tokenEndpoint))
          .header("Content-Type", "application/x-www-form-urlencoded")
          .POST(HttpRequest.BodyPublishers.ofString(form)).build()
        // no retry-on-419 here: the token fetch itself must not
        // recurse (rest_catalog_auth.c:291)
        val res = http.send(req, HttpResponse.BodyHandlers.ofString())
        if (res.statusCode() != 200)
          throw new java.io.IOException(
            s"Rest Catalog OAuth token request failed (HTTP ${res.statusCode()})")
        val body = mapper.readTree(res.body())
        val tok = Option(body.get("access_token")).map(_.asText()).getOrElse(
          throw new java.io.IOException(
            "key \"access_token\" missing in json response"))
        val ttlMs = Option(body.get("expires_in"))
          .map(_.asLong() * 1000).getOrElse(3600L * 1000)
        cached = Some((tok, System.currentTimeMillis() + ttlMs))
        Some(tok)
    }
  }

  /** One catalog request with the reference's retry classification.
    * Returns the parsed body; non-2xx after retries throws with the
    * REST error envelope's message.
    */
  def request(method: String, path: String,
      body: Option[String] = None): JsonNode = {
    var attempt = 0
    var force = false
    while (true) {
      val b = HttpRequest.newBuilder(URI.create(s"$base$path"))
      accessToken(force).foreach(t =>
        b.header("Authorization", s"Bearer $t"))
      body.foreach(_ => b.header("Content-Type", "application/json"))
      val req = (method match {
        case "GET" => b.GET()
        case "HEAD" => b.method("HEAD", HttpRequest.BodyPublishers.noBody())
        case "DELETE" => b.DELETE()
        case m => b.method(m, HttpRequest.BodyPublishers.ofString(
          body.getOrElse("")))
      }).build()
      val res = http.send(req, HttpResponse.BodyHandlers.ofString())
      val status = res.statusCode()
      if (status / 100 == 2)
        return if (res.body() == null || res.body().isEmpty)
          mapper.createObjectNode()
        else mapper.readTree(res.body())
      // ClassifyRestCatalogRequestRetry: 429 short, 503 long, 419
      // refresh-auth; anything else (or retries exhausted) stops
      attempt += 1
      val retriable = status == 429 || status == 503 || status == 419
      if (!retriable || attempt > maxRetry) {
        val msg = try {
          Option(mapper.readTree(res.body()).path("error").path("message")
            .asText(null)).getOrElse(res.body())
        } catch { case scala.util.control.NonFatal(_) => res.body() }
        throw new java.io.IOException(
          s"REST catalog $method $path failed (HTTP $status): $msg")
      }
      status match {
        case 429 => Thread.sleep(backoffMs)
        case 503 => Thread.sleep(backoffMs * 4)
        case 419 => force = true // refresh + patched header next loop
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def seg(s: String): String = UrlEncode.path(s)

  def config(warehouse: Option[String] = None): JsonNode =
    request("GET", "/v1/config" +
      warehouse.map(w => s"?warehouse=${seg(w)}").getOrElse(""))

  def listNamespaces(): Seq[String] = {
    val arr = request("GET", "/v1/namespaces").path("namespaces")
    (0 until arr.size()).map { i =>
      val parts = arr.get(i)
      (0 until parts.size()).map(parts.get(_).asText()).mkString(".")
    }
  }

  def createNamespace(ns: String): Unit = {
    val root = mapper.createObjectNode()
    root.putArray("namespace").add(ns)
    root.putObject("properties")
    request("POST", "/v1/namespaces",
      Some(mapper.writeValueAsString(root)))
    ()
  }

  def listTables(ns: String): Seq[String] = {
    val arr = request("GET", s"/v1/namespaces/${seg(ns)}/tables")
      .path("identifiers")
    (0 until arr.size()).map(i => arr.get(i).path("name").asText())
  }

  def tableExists(ns: String, table: String): Boolean =
    try { request("HEAD", s"/v1/namespaces/${seg(ns)}/tables/${seg(table)}")
      true } catch { case _: java.io.IOException => false }

  /** LoadTableResult → the table's current metadata location. */
  def loadTableMetadataLocation(ns: String, table: String): String = {
    val res = request("GET",
      s"/v1/namespaces/${seg(ns)}/tables/${seg(table)}")
    Option(res.get("metadata-location")).map(_.asText()).getOrElse(
      throw new java.io.IOException(
        s"LoadTableResult for $ns.$table has no metadata-location"))
  }

  /** Full LoadTableResult. */
  def loadTable(ns: String, table: String): JsonNode =
    request("GET", s"/v1/namespaces/${seg(ns)}/tables/${seg(table)}")

  /** CreateTable from a Spark schema (the writable direction —
    * reference rest_catalog_ops.c FinishStageRestCatalogIcebergTable
    * CreateRestRequest; test_polaris_catalog_writable.py): field ids
    * assign 1..n in declaration order, exactly how the engine's own
    * tables number a fresh schema. Flat scalar schemas only — the
    * append path maps per-file stats by field id and refuses anything
    * it can't map loudly rather than mis-keying bounds.
    */
  def createTable(ns: String, table: String,
      schema: org.apache.spark.sql.types.StructType): JsonNode = {
    val root = mapper.createObjectNode()
    root.put("name", table)
    val sch = root.putObject("schema")
    sch.put("type", "struct")
    val fields = sch.putArray("fields")
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val n = fields.addObject()
      n.put("id", i + 1)
      n.put("name", f.name)
      n.put("type", RestCatalogClient.icebergTypeName(f.dataType, f.name))
      n.put("required", !f.nullable)
    }
    request("POST", s"/v1/namespaces/${seg(ns)}/tables",
      Some(mapper.writeValueAsString(root)))
  }

  /** CommitTable with an add-snapshot update plus the set-snapshot-ref
    * advancing `main` (spec UpdateTable; the reference's
    * GetAddSnapshotCatalogRequest in rest_catalog_ops.c sends exactly
    * this pair). The assert-ref-snapshot-id requirement is ALWAYS
    * emitted: `requiredSnapshot = None` means the writer read a table
    * with NO current snapshot, and per the spec a null snapshot-id
    * asserts the ref still has none — two concurrent FIRST appends must
    * conflict just like two concurrent re-appends, or the loser's rows
    * are silently dropped from the winner's full-state manifest list.
    * The snapshot object carries the spec-required fields
    * (timestamp-ms, summary.operation, sequence-number, schema-id,
    * parent-snapshot-id) so a spec-strict external catalog (Polaris)
    * accepts the commit instead of 400ing on a bare snapshot.
    */
  def commitAddSnapshot(ns: String, table: String,
      manifestList: String, snapshotId: Long,
      requiredSnapshot: Option[Long],
      sequenceNumber: Long = 1L,
      schemaId: Int = 0,
      timestampMs: Long = System.currentTimeMillis()): JsonNode =
    request("POST", s"/v1/namespaces/${seg(ns)}/tables/${seg(table)}",
      Some(mapper.writeValueAsString(addSnapshotBody(manifestList,
        snapshotId, requiredSnapshot, sequenceNumber, schemaId,
        timestampMs))))

  /** The {requirements, updates} payload of ONE add-snapshot commit —
    * shared by the single-table CommitTable POST and the multi-table
    * CommitTransaction batch.
    */
  private def addSnapshotBody(manifestList: String, snapshotId: Long,
      requiredSnapshot: Option[Long], sequenceNumber: Long,
      schemaId: Int, timestampMs: Long)
      : com.fasterxml.jackson.databind.node.ObjectNode = {
    val root = mapper.createObjectNode()
    val reqs = root.putArray("requirements")
    val r = reqs.addObject()
    r.put("type", "assert-ref-snapshot-id")
    r.put("ref", "main")
    requiredSnapshot match {
      case Some(s) => r.put("snapshot-id", s)
      case None => r.putNull("snapshot-id")
    }
    val upds = root.putArray("updates")
    val upd = upds.addObject()
    upd.put("action", "add-snapshot")
    val snap = upd.putObject("snapshot")
    snap.put("snapshot-id", snapshotId)
    requiredSnapshot.foreach(p => snap.put("parent-snapshot-id", p))
    snap.put("sequence-number", sequenceNumber)
    snap.put("timestamp-ms", timestampMs)
    snap.put("manifest-list", manifestList)
    snap.putObject("summary").put("operation", "append")
    snap.put("schema-id", schemaId)
    val ref = upds.addObject()
    ref.put("action", "set-snapshot-ref")
    ref.put("ref-name", "main")
    ref.put("type", "branch")
    ref.put("snapshot-id", snapshotId)
    root
  }

  /** One spec CommitTransaction batch (POST /v1/transactions/commit):
    * every change applies or NONE does — the server installs the
    * batch all-or-nothing behind one catalog visibility instant.
    * Throws IOException on any non-2xx (a "409" message = some
    * change's requirement failed; staged files are untouched, so the
    * caller retries with fresh requirements).
    */
  def commitTransaction(
      changes: Seq[RestCatalogClient.TableChange]): Unit = {
    val root = mapper.createObjectNode()
    val arr = root.putArray("table-changes")
    changes.foreach { c =>
      val body = addSnapshotBody(c.manifestList, c.snapshotId,
        c.requiredSnapshot, c.sequenceNumber, c.schemaId,
        System.currentTimeMillis())
      val node = arr.addObject()
      val id = node.putObject("identifier")
      id.putArray("namespace").add(c.ns)
      id.put("name", c.table)
      node.set[com.fasterxml.jackson.databind.node.ObjectNode](
        "requirements", body.get("requirements"))
      node.set[com.fasterxml.jackson.databind.node.ObjectNode](
        "updates", body.get("updates"))
    }
    request("POST", "/v1/transactions/commit",
      Some(mapper.writeValueAsString(root)))
    ()
  }
}

object RestCatalogClient {

  /** One table's change inside a CommitTransaction batch. */
  final case class TableChange(ns: String, table: String,
      manifestList: String, snapshotId: Long,
      requiredSnapshot: Option[Long], sequenceNumber: Long,
      schemaId: Int)

  /** Spark → Iceberg primitive type names (spec §primitive-types);
    * nested/unmappable types refuse loudly — the writable path must
    * not guess.
    */
  private[lake] def icebergTypeName(
      dt: org.apache.spark.sql.types.DataType, col: String): String = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType => "long"
      case IntegerType | ShortType => "int"
      case StringType => "string"
      case DoubleType => "double"
      case FloatType => "float"
      case BooleanType => "boolean"
      case DateType => "date"
      case TimestampType => "timestamptz"
      case TimestampNTZType => "timestamp"
      case BinaryType => "binary"
      case d: DecimalType => s"decimal(${d.precision},${d.scale})"
      case other => throw new IllegalArgumentException(
        s"column $col: cannot map ${other.simpleString} onto an " +
          "Iceberg primitive for a REST-catalog table")
    }
  }
}
