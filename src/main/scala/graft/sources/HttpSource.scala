package graft.sources

import java.io.{FileOutputStream, InputStream}
import java.net.{HttpURLConnection, URI}
import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest

/** http(s):// and hf:// table sources (SURVEY.md §2.1 "HuggingFace /
  * http(s) scan"; reference docs/file-formats-reference.md:169-193).
  *
  * The reference's engine streams remote URLs through its httpfs layer.
  * Spark's Hadoop filesystems don't speak plain http, so the equivalent
  * here is stage-then-scan: the driver downloads the URL once into a
  * content-addressed local cache (keyed by URL hash, so repeated scans
  * of the same URL don't re-download), and the query reads the staged
  * file through the normal format readers. Staging is driver-side and
  * size-bound by design — the reference documents the same posture for
  * remote-URL tables (they are convenience ingest surfaces, not the
  * 100 TB path; bulk data lives on the object store).
  *
  * `hf://datasets/org/name/path` translates to the public HuggingFace
  * resolve URL, matching the reference's mapping.
  */
object HttpSource {

  private def cacheDir: Path = FileCache.dir

  /** HF site root for resolve + API URLs; the spec points it at a
    * local fixture server.
    */
  private def hfEndpoint: String =
    sys.props.getOrElse("graft.hf.endpoint", "https://huggingface.co")

  /** Parsed `hf://[datasets/]{org}/{repo}[@rev]/{path}`. `@~parquet`
    * is HF's alias for the auto-converted parquet branch
    * `refs/convert/parquet` (the reference's batch-URL syntax,
    * docs/file-formats-reference.md:169-193).
    */
  private case class HfRef(kind: String, org: String, repo: String,
      revision: String, path: String) {
    private def enc(s: String) =
      java.net.URLEncoder.encode(s, "UTF-8")
    def resolveUrl: String =
      s"$hfEndpoint/$kind$org/$repo/resolve/${enc(revision)}/$path"
    def treeUrl(fixedDir: String): String = {
      val apiKind = if (kind.nonEmpty) kind else "models/"
      s"$hfEndpoint/api/$apiKind$org/$repo/tree/${enc(revision)}" +
        (if (fixedDir.isEmpty) "" else s"/$fixedDir") + "?recursive=true"
    }
  }

  private def parseHf(url: String): HfRef = {
    val rest = url.stripPrefix("hf://")
    val (kind, tail) =
      if (rest.startsWith("datasets/")) ("datasets/", rest.stripPrefix("datasets/"))
      else ("", rest)
    tail.split("/", 3) match {
      case Array(org, repoRev, path) =>
        val (repo, rev) = repoRev.split("@", 2) match {
          case Array(r, "~parquet") => (r, "refs/convert/parquet")
          case Array(r, v) => (r, v)
          case Array(r) => (r, "main")
        }
        HfRef(kind, org, repo, rev, path)
      case _ => throw new IllegalArgumentException(
        s"hf:// URL needs org/repo/path: $url")
    }
  }

  /** hf:// → https:// resolve-URL translation (public HF convention). */
  def resolveUrl(url: String): String =
    if (url.startsWith("hf://")) parseHf(url).resolveUrl else url

  /** Expand an hf:// URL whose path contains glob characters
    * (`hf://datasets/org/name@~parquet/∗∗/∗.parquet`) into the
    * matching shards' resolve URLs, via the public
    * `/api/{datasets|models}/{id}/tree/{rev}?recursive=true` endpoint
    * (Link-header pagination followed). Non-glob URLs pass through.
    */
  def expand(url: String): Seq[String] = {
    if (S3Source.parse(url).isDefined)
      return S3Source.expandWildcard(url, (u, h) => fetch(u, h)._1)
    if (AzSource.parse(url).isDefined)
      return AzSource.expandWildcard(url, (u, h) => fetch(u, h)._1)
    expandHf(url)
  }

  /** [[expand]] with per-entry sizes where the listing API carries
    * them (S3-dialect `<Size>`, Azure `<Content-Length>`; hf:// and
    * wildcard-free passthroughs report -1 = unknown). Backs
    * `lake_file.list` — the reference's list surface reports sizes
    * (test_list_file.py zero-size cases).
    */
  def list(url: String): Seq[(String, Long)] = {
    // allowEmpty: the list surface reports zero rows for a missing
    // key / non-matching wildcard (reference test_list_file.py),
    // unlike read staging where zero shards is a loud error
    if (S3Source.parse(url).isDefined)
      return S3Source.listWildcard(url, (u, h) => fetch(u, h)._1,
        allowEmpty = true)
    if (AzSource.parse(url).isDefined)
      return AzSource.listWildcard(url, (u, h) => fetch(u, h)._1,
        allowEmpty = true)
    expandHf(url).map(u => (u, -1L))
  }

  private def expandHf(url: String): Seq[String] = {
    if (!url.startsWith("hf://") || !url.contains("*")) return Seq(url)
    val ref = parseHf(url)
    // list recursively from the deepest fixed directory prefix
    val starAt = ref.path.indexOf('*')
    val fixedDir = ref.path.substring(0, starAt)
      .reverse.dropWhile(_ != '/').reverse.stripSuffix("/")
    val matcher = java.nio.file.FileSystems.getDefault
      .getPathMatcher("glob:" + ref.path)
    val files = scala.collection.mutable.ArrayBuffer.empty[String]
    var next: Option[String] = Some(ref.treeUrl(fixedDir))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    while (next.isDefined) {
      val (body, nextLink) = fetch(next.get)
      val arr = mapper.readTree(body)
      require(arr.isArray, s"unexpected HF tree response for $url")
      arr.forEach { n =>
        if (n.path("type").asText() == "file")
          files += n.path("path").asText()
      }
      next = nextLink
    }
    val hits = files.filter(p =>
      matcher.matches(java.nio.file.Paths.get(p))).sorted.toSeq
    require(hits.nonEmpty,
      s"no files in ${ref.org}/${ref.repo}@${ref.revision} match ${ref.path}")
    hits.map(p => ref.copy(path = p).resolveUrl)
  }

  /** Stage a URL that may be an hf:// wildcard: single URLs go through
    * [[stage]]; wildcards stage every matching shard through the same
    * content-addressed cache and hard-link them into one directory, so
    * the scan sees a single multi-file table.
    */
  def stageAll(url: String): String = stageAllMapped(url)._1

  /** [[stageAll]] plus the staged-basename → original-URL pairs. The
    * cache names files by content address, so a scan over the staged
    * copies loses the URL the user named; the `filename 'true'`
    * surface (reference test_filename.py — `_filename` must carry the
    * source URL, not an engine-internal path) reverses the mapping
    * with these pairs. Basenames are unique: each is the SHA-256 of
    * its own URL.
    */
  def stageAllMapped(url: String): (String, Seq[(String, String)]) = {
    if (!url.contains("*")) {
      val local = stage(url)
      return (local, Seq(Paths.get(local).getFileName.toString -> url))
    }
    val shards = expand(url)
    // key the set directory by the RESOLVED shard list, not the
    // wildcard URL: the same pattern resolving to a different shard
    // set (upstream grew, different endpoint) must get a fresh
    // directory rather than accumulate stale links
    val digest = MessageDigest.getInstance("SHA-256")
      .digest(shards.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(24)
    val dir = cacheDir.resolve(s"set-$digest")
    Files.createDirectories(dir)
    val pairs = shards.map { s =>
      val local = Paths.get(stage(s))
      val link = dir.resolve(local.getFileName)
      if (!Files.exists(link))
        try Files.createLink(link, local)
        catch { case _: java.nio.file.FileAlreadyExistsException => }
      local.getFileName.toString -> s
    }
    (dir.toString, pairs)
  }

  /** URL without query string / fragment — what extension-based format
    * inference should look at.
    */
  def pathPart(url: String): String = url.split("[?#]", 2)(0)

  /** Download (or reuse a cached copy of) `url`; returns the local path.
    * The cache key is the URL's SHA-256, the extension is preserved so
    * format inference keeps working. Capacity bounding, LRU touch, TTL
    * revalidation (conditional GET), and stale-if-error live in
    * [[FileCache]].
    */
  /** The content-addressed cache key of `url`: (digest, extension).
    * Keyed on the RESOLVED credential-independent URL so the add /
    * remove / read surfaces all land on the same entry.
    */
  private def cacheKey(url: String): (String, String) = {
    val resolved = resolveUrl(url)
    val path = pathPart(resolved)
    val name = path.substring(path.lastIndexOf('/') + 1)
    val ext = name.dropWhile(_ != '.') match {
      case "" => ".bin"
      case e => e
    }
    val digest = MessageDigest.getInstance("SHA-256")
      .digest(resolved.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(24)
    (digest, ext)
  }

  /** Pre-warm the cache with `url` (reference `lake_file_cache.add`,
    * test_caching.py) — a plain stage, but a missing object reports
    * the reference's NOT FOUND wording instead of a raw 404. Returns
    * the cached size.
    */
  def cacheAdd(url: String): Long = {
    val local = try stage(url) catch {
      case e: java.io.IOException
          if Option(e.getMessage).exists(_.contains("404")) =>
        throw new IllegalArgumentException(s"$url: NOT FOUND")
    }
    Files.size(Paths.get(local))
  }

  /** Evict `url`'s cache entry; bytes freed (0 = was not cached).
    * Reference `lake_file_cache.remove`. Every successful [[upload]]
    * calls this too — a COPY TO over a previously read URL must not
    * keep serving the stale bytes (test_caching.py
    * test_pg_lake_copy_twice).
    */
  def cacheRemove(url: String): Long = {
    val (digest, ext) = cacheKey(url)
    FileCache.remove(digest, ext)
  }

  def stage(url: String): String = {
    val resolved = resolveUrl(url)
    val (digest, ext) = cacheKey(url)
    FileCache.getOrFetch(digest, ext, resolved) { (tmp, cond) =>
      S3Source.parse(resolved) match {
        // cache key = the region-independent s3 URL; the REGIONAL
        // https URL is chosen (and re-learned on RegionMoved) at
        // fetch time only
        case Some(ref) =>
          // signing headers computed per attempt: a RegionMoved retry
          // must re-sign with the learned region, not replay the old
          // Authorization
          S3Source.withRegionRouting(ref)(u =>
            download(u, tmp, cond ++ S3Source.signingHeaders(ref, u)))
        case None => AzSource.parse(resolved) match {
          // cache key = the SAS-independent az:// URL; the SAS-bearing
          // https URL is built at fetch time only
          case Some(az) => download(AzSource.urlFor(az), tmp, cond)
          case None => download(resolved, tmp, cond)
        }
      }
    }.toString
  }

  private def connect(url: String,
      headers: Map[String, String] = Map.empty): HttpURLConnection = {
    def open(u: String): HttpURLConnection = {
      val c = new URI(u).toURL.openConnection()
        .asInstanceOf[HttpURLConnection]
      headers.foreach { case (k, v) => c.setRequestProperty(k, v) }
      c
    }
    var conn = open(url)
    conn.setInstanceFollowRedirects(true)
    conn.setConnectTimeout(30000)
    conn.setReadTimeout(120000)
    var redirects = 0
    // follow cross-protocol redirects (http->https) the JDK refuses
    while (conn.getResponseCode / 100 == 3 &&
        conn.getResponseCode != 304 && redirects < 5) {
      val loc = conn.getHeaderField("Location")
      // S3's wrong-region 301 has x-amz-bucket-region and usually NO
      // Location: surface the region so S3Source can re-route the
      // bucket instead of NPE-ing on a null redirect target
      val region = Option(conn.getHeaderField("x-amz-bucket-region"))
      if (loc == null) {
        conn.disconnect()
        region match {
          case Some(r) => throw S3Source.RegionMoved(r)
          case None => throw new java.io.IOException(
            s"GET $url -> redirect without Location")
        }
      }
      conn.disconnect()
      conn = open(loc)
      redirects += 1
    }
    if (conn.getResponseCode == 400 &&
        conn.getHeaderField("x-amz-bucket-region") != null) {
      // AuthorizationHeaderMalformed-style wrong-region answer
      val r = conn.getHeaderField("x-amz-bucket-region")
      conn.disconnect()
      throw S3Source.RegionMoved(r)
    }
    if (conn.getResponseCode != 200 && conn.getResponseCode != 304)
      throw new java.io.IOException(
        s"GET $url -> HTTP ${conn.getResponseCode}")
    conn
  }

  /** GET `url` into `to` with the cache's conditional headers; None on
    * 304 Not Modified, response validators otherwise.
    */
  /** Upload a local file to an object-store URL — the write half of
    * `COPY … TO 's3://…'` (reference test_s3_copy.py / test_gcs_copy
    * / test_r2_copy / az in test_writable_tables): S3-dialect PUTs
    * are SigV4-signed over the REAL payload hash (the fixture
    * recomputes the body hash server-side, so a content mismatch is
    * a 400, not silent corruption); Azure PUTs carry the SAS token +
    * `x-ms-blob-type: BlockBlob`. Streaming with a fixed length —
    * the file is hashed in one pass and streamed in a second, never
    * buffered in memory.
    */
  def upload(url: String, local: Path): Unit =
    upload(url, Files.size(local), () => Files.newInputStream(local))

  /** Upload part size AND single-PUT threshold:
    * `graft.upload.part_size` bytes (default 64 MiB). At or below one
    * part the object goes up as a single PUT; above it the upload
    * switches to the store's native chunked protocol — S3 multipart /
    * Azure blocks — because a single PUT hard-caps at the store's
    * limit (5 GiB on S3) and funnels the whole export through one
    * request. The reference reaches the same behavior through DuckDB
    * httpfs, which multiparts at its own threshold.
    */
  private def uploadPartSize: Long = {
    val v = sys.props.get("graft.upload.part_size").map(_.toLong)
      .getOrElse(64L << 20)
    // parts buffer in memory for per-part hashing; S3's own part
    // ceiling is 5 GiB but a JVM array caps below 2 GiB
    require(v > 0 && v <= (1L << 30),
      s"graft.upload.part_size must be in (0, 1 GiB], got $v")
    // real S3 rejects non-final multipart parts under 5 MiB at the
    // COMPLETE call (EntityTooSmall) — after all bytes shipped. Warn
    // up front instead of failing the local fixtures that shrink
    // parts to force multi-part coverage.
    if (v < (5L << 20))
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"graft.upload.part_size=$v is below S3's 5 MiB multipart " +
          "minimum; AWS S3 will reject the upload at complete time")
    v
  }

  /** Upload from any re-openable byte source — the COPY path streams
    * straight from the CLUSTER filesystem staging part (Hadoop input
    * stream), never via a driver-local copy. The source is read twice
    * for single-PUT S3-dialect targets (one hashing pass — SigV4
    * signs the true payload hash — and one streaming pass); multipart
    * reads once, hashing and shipping a part at a time.
    */
  def upload(url: String, size: Long,
      open: () => InputStream): Unit = {
    S3Source.parse(url) match {
      case Some(ref) =>
        if (size > uploadPartSize) s3Multipart(ref, open, uploadPartSize)
        else {
          val hash = sha256Hex(open)
          S3Source.withRegionRouting(ref) { u =>
            putStream(u, open, size,
              S3Source.signingHeaders(ref, u, "PUT", hash) +
                ("x-amz-content-sha256" -> hash))
          }
        }
      case None => AzSource.parse(url) match {
        case Some(az) =>
          if (size > uploadPartSize) azBlocks(az, open, uploadPartSize)
          else putStream(AzSource.urlFor(az), open, size,
            Map("x-ms-blob-type" -> "BlockBlob"))
        case None => throw new IllegalArgumentException(
          s"cannot upload to $url (not an object-store URL)")
      }
    }
    // write-through invalidation: a reader that cached this URL must
    // see the new bytes, not the TTL-fresh stale entry
    cacheRemove(url)
    ()
  }

  private def sha256HexBytes(b: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256").digest(b)
      .map("%02x".format(_)).mkString

  /** Conditional put-if-absent of a small, fully-materialized object —
    * the metadata-commit CAS on object stores. The SERVER arbitrates:
    * S3 and R2 honor `If-None-Match: *` on PUT (AWS "conditional
    * writes", publicly documented), GCS's XML API spells the same
    * precondition `x-goog-if-generation-match: 0`, Azure Put Blob
    * honors `If-None-Match: *`. Returns false when the object already
    * exists — HTTP 412 Precondition Failed, or 409 while a concurrent
    * conditional write settles (S3 documents both for racing
    * conditional PUTs). Unlike exists→rename there is NO window: two
    * racing commits produce exactly one 200.
    */
  def putIfAbsent(url: String, bytes: Array[Byte]): Boolean = {
    val hash = sha256HexBytes(bytes)
    val cond: Map[String, String] = S3Source.parse(url) match {
      case Some(ref) if ref.scheme == "gs" =>
        Map("x-goog-if-generation-match" -> "0")
      case _ => Map("If-None-Match" -> "*")
    }
    val r = S3Source.parse(url) match {
      case Some(ref) =>
        S3Source.withRegionRouting(ref) { u =>
          request("PUT", u,
            S3Source.signingHeaders(ref, u, "PUT", hash) ++ cond +
              ("x-amz-content-sha256" -> hash), bytes)
        }
      case None => AzSource.parse(url) match {
        case Some(az) =>
          request("PUT", AzSource.urlFor(az),
            cond + ("x-ms-blob-type" -> "BlockBlob"), bytes)
        case None => throw new IllegalArgumentException(
          s"cannot conditionally put to $url (not an object-store URL)")
      }
    }
    if (r.code / 100 == 2) { cacheRemove(url); true }
    else if (r.code == 412 || r.code == 409) false
    else throw new java.io.IOException(
      s"conditional PUT $url -> HTTP ${r.code}")
  }

  /** Read up to `n` bytes (exactly `n` unless the stream ends). */
  private def readChunk(in: InputStream, n: Long): Array[Byte] = {
    val buf = new Array[Byte](n.toInt)
    var off = 0
    var r = in.read(buf, 0, buf.length)
    while (r > 0) {
      off += r
      if (off == buf.length) return buf
      r = in.read(buf, off, buf.length - off)
    }
    java.util.Arrays.copyOf(buf, off)
  }

  private final case class Resp(code: Int, body: Array[Byte],
      headers: Map[String, String])

  /** Delete one remote object (reference `lake_file.delete` →
    * s3_file_utils.c DeleteRemoteFile): S3-dialect DELETE SigV4-signed
    * over the empty payload (region-rerouted like every other verb),
    * Azure Delete Blob with the SAS. The cache entry evicts too — a
    * deleted object must not keep serving from the cache. A missing
    * object is not an error (S3 DELETE answers 204 either way).
    */
  def deleteObject(url: String): Unit = {
    S3Source.parse(url) match {
      case Some(ref) =>
        S3Source.withRegionRouting(ref) { u =>
          val r = request("DELETE", u,
            S3Source.signingHeaders(ref, u, "DELETE"))
          if (r.code / 100 != 2 && r.code != 404)
            throw new java.io.IOException(s"DELETE $u -> HTTP ${r.code}")
        }
      case None => AzSource.parse(url) match {
        case Some(az) =>
          val u = AzSource.urlFor(az)
          val r = request("DELETE", u, Map.empty)
          if (r.code / 100 != 2 && r.code != 404)
            throw new java.io.IOException(s"DELETE blob -> HTTP ${r.code}")
        case None => throw new IllegalArgumentException(
          s"cannot delete $url (not an object-store URL)")
      }
    }
    cacheRemove(url)
    ()
  }

  /** One-shot request with an in-memory body; surfaces S3's
    * wrong-region answers as [[S3Source.RegionMoved]].
    */
  private def request(method: String, url: String,
      headers: Map[String, String],
      body: Array[Byte] = Array.empty): Resp = {
    val conn = new URI(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    conn.setConnectTimeout(30000)
    conn.setReadTimeout(120000)
    if (method == "PUT" || method == "POST") {
      conn.setDoOutput(true)
      conn.setFixedLengthStreamingMode(body.length.toLong)
      val out = conn.getOutputStream
      try out.write(body) finally out.close()
    }
    val code = conn.getResponseCode
    val respBody = {
      val s = if (code / 100 == 2) conn.getInputStream
        else conn.getErrorStream
      if (s == null) Array.empty[Byte]
      else try s.readAllBytes() finally s.close()
    }
    val hdrs = {
      import scala.jdk.CollectionConverters._
      conn.getHeaderFields.asScala.collect {
        case (k, vs) if k != null && !vs.isEmpty =>
          k.toLowerCase -> vs.get(0)
      }.toMap
    }
    conn.disconnect()
    if ((code == 301 || code == 400) &&
        hdrs.contains("x-amz-bucket-region"))
      throw S3Source.RegionMoved(hdrs("x-amz-bucket-region"))
    Resp(code, respBody, hdrs)
  }

  /** S3 multipart (public protocol: CreateMultipartUpload → UploadPart
    * ×N → CompleteMultipartUpload; AbortMultipartUpload on failure so
    * the store reclaims staged parts). Every request is SigV4-signed
    * over its REAL payload hash with the existing [[SigV4]] machinery;
    * the fixture recomputes both signature and body hash server-side.
    * Region routing happens on the initiate — parts and complete reuse
    * the learned region.
    */
  private def s3Multipart(ref: S3Source.S3Ref,
      open: () => InputStream, partSize: Long): Unit = {
    def sign(method: String, u: String, hash: String) =
      S3Source.signingHeaders(ref, u, method, hash) +
        ("x-amz-content-sha256" -> hash)
    def require2xx(r: Resp, what: String): Resp = {
      if (r.code / 100 != 2) throw new java.io.IOException(
        s"$what -> HTTP ${r.code}")
      r
    }
    val uploadId = S3Source.withRegionRouting(ref) { base =>
      val u = s"$base?uploads"
      val r = require2xx(
        request("POST", u, sign("POST", u, SigV4.EmptyPayloadHash)),
        "multipart initiate")
      "<UploadId>([^<]+)</UploadId>".r
        .findFirstMatchIn(new String(r.body, "UTF-8")).map(_.group(1))
        .getOrElse(throw new java.io.IOException(
          "multipart initiate response carried no UploadId"))
    }
    val base = S3Source.urlFor(ref,
      S3Source.regionOf(ref.bucket, ref.scheme))
    val idQ = S3Source.encodeQuery(uploadId)
    // parts ship CONCURRENTLY (the reference's httpfs uploads parts in
    // parallel the same way): the source streams once, sequentially;
    // a semaphore bounds read-ahead so in-flight memory stays at
    // parallelism × part size
    val parallelism = math.max(1,
      sys.props.get("graft.upload.parallelism").map(_.toInt).getOrElse(4))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
    val slots = new java.util.concurrent.Semaphore(parallelism)
    try {
      val futs = Seq.newBuilder[
        java.util.concurrent.Future[(Int, String)]]
      val in = open()
      try {
        var n = 1
        var more = true
        while (more) {
          val chunk = readChunk(in, partSize)
          // an empty trailing read only happens when size was an exact
          // multiple of the part size — nothing left to ship
          if (chunk.nonEmpty) {
            val partN = n
            slots.acquire()
            futs += pool.submit(
              new java.util.concurrent.Callable[(Int, String)] {
                override def call(): (Int, String) = try {
                  val u = s"$base?partNumber=$partN&uploadId=$idQ"
                  val r = require2xx(
                    request("PUT", u,
                      sign("PUT", u, sha256HexBytes(chunk)), chunk),
                    s"multipart part $partN")
                  // fail FAST on a 2xx without an ETag: complete would
                  // die later with InvalidPart at the wrong request
                  val etag = r.headers.getOrElse("etag",
                    throw new java.io.IOException(
                      s"multipart part $partN accepted but no ETag " +
                        "returned"))
                  (partN, etag)
                } finally slots.release()
              })
            n += 1
          }
          more = chunk.length == partSize
        }
      } finally in.close()
      val etags = futs.result().map { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw e.getCause
        }
      }.sortBy(_._1)
      val xml = ("<CompleteMultipartUpload>" + etags.map {
        case (n, e) => s"<Part><PartNumber>$n</PartNumber>" +
          s"<ETag>$e</ETag></Part>"
      }.mkString + "</CompleteMultipartUpload>").getBytes("UTF-8")
      val cu = s"$base?uploadId=$idQ"
      require2xx(request("POST", cu,
        sign("POST", cu, sha256HexBytes(xml)), xml),
        "multipart complete")
      ()
    } catch {
      case e: Throwable =>
        // abort so the store reclaims the staged parts; best effort —
        // the original failure is what surfaces
        val au = s"$base?uploadId=$idQ"
        try request("DELETE", au,
          sign("DELETE", au, SigV4.EmptyPayloadHash))
        catch { case _: Exception => () }
        throw e
    } finally pool.shutdownNow()
  }

  /** Azure Block Blob chunked upload (public protocol: Put Block ×N +
    * Put Block List). Blocks carry the SAS like every other request;
    * uncommitted blocks expire server-side if the commit never lands,
    * so there is no explicit abort call.
    */
  private def azBlocks(az: AzSource.AzRef,
      open: () => InputStream, partSize: Long): Unit = {
    val blobUrl = AzSource.urlFor(az)
    def withQ(extra: String) =
      blobUrl + (if (blobUrl.contains('?')) "&" else "?") + extra
    def require2xx(r: Resp, what: String): Resp = {
      if (r.code / 100 != 2) throw new java.io.IOException(
        s"$what -> HTTP ${r.code}")
      r
    }
    val ids = Seq.newBuilder[String]
    val in = open()
    try {
      var n = 0
      var more = true
      while (more) {
        val chunk = readChunk(in, partSize)
        if (chunk.nonEmpty) {
          // fixed-width ids: Azure requires every block id in a blob
          // to be the same length pre-encoding
          val id = java.util.Base64.getEncoder
            .encodeToString(f"block-$n%08d".getBytes("UTF-8"))
          require2xx(request("PUT",
            withQ(s"comp=block&blockid=${S3Source.encodeQuery(id)}"),
            Map.empty, chunk), s"az block $n")
          ids += id
          n += 1
        }
        more = chunk.length == partSize
      }
    } finally in.close()
    val xml = ("<?xml version=\"1.0\" encoding=\"utf-8\"?><BlockList>" +
      ids.result().map(i => s"<Latest>$i</Latest>").mkString +
      "</BlockList>").getBytes("UTF-8")
    require2xx(request("PUT", withQ("comp=blocklist"), Map.empty, xml),
      "az block list")
    ()
  }

  private def sha256Hex(open: () => InputStream): String = {
    val md = MessageDigest.getInstance("SHA-256")
    val in = open()
    try {
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { if (n > 0) md.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    md.digest().map("%02x".format(_)).mkString
  }

  private def putStream(url: String, open: () => InputStream, size: Long,
      headers: Map[String, String]): Unit = {
    val conn = new URI(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("PUT")
    headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    conn.setConnectTimeout(30000)
    conn.setReadTimeout(120000)
    conn.setDoOutput(true)
    conn.setFixedLengthStreamingMode(size)
    val out = conn.getOutputStream
    try {
      val in = open()
      try in.transferTo(out) finally in.close()
    } finally out.close()
    val code = conn.getResponseCode
    val region = Option(conn.getHeaderField("x-amz-bucket-region"))
    conn.disconnect()
    if ((code == 301 || code == 400) && region.isDefined)
      throw S3Source.RegionMoved(region.get)
    if (code / 100 != 2)
      throw new java.io.IOException(s"PUT $url -> HTTP $code")
  }

  private def download(url: String, to: Path,
      cond: Map[String, String]): Option[FileCache.Fetched] = {
    val conn = connect(url, cond)
    try {
      if (conn.getResponseCode == 304) return None
      val in: InputStream = conn.getInputStream
      try {
        val out = new FileOutputStream(to.toFile)
        try in.transferTo(out)
        finally out.close()
      } finally in.close()
      Some(FileCache.Fetched(
        Option(conn.getHeaderField("ETag")),
        Option(conn.getHeaderField("Last-Modified"))))
    } finally conn.disconnect()
  }

  /** GET to memory; returns (body, next-page URL from the Link
    * header's rel="next", if any — the HF tree API paginates).
    */
  private def fetch(url: String, headers: Map[String, String] = Map.empty)
      : (Array[Byte], Option[String]) = {
    val conn = connect(url, headers)
    try {
      val body = conn.getInputStream.readAllBytes()
      val next = Option(conn.getHeaderField("Link")).flatMap { l =>
        """<([^>]+)>\s*;\s*rel="next"""".r.findFirstMatchIn(l)
          .map(_.group(1))
      }
      (body, next)
    } finally conn.disconnect()
  }
}
