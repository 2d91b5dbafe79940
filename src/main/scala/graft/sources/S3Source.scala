package graft.sources

import java.util.concurrent.ConcurrentHashMap

/** Region-aware `s3://` object-store routing — the last piece of the
  * reference's caching filesystem (its file cache manager switches a
  * bucket's endpoint when S3 answers 301/PermanentRedirect with an
  * `x-amz-bucket-region` header, and remembers the mapping so the next
  * request for that bucket goes direct; e2e `test_region_switch.py`).
  *
  * Spark-side shape: this is driver/executor-local URL plumbing in
  * front of [[HttpSource]]'s staged download + [[FileCache]] — the
  * cache key stays the REGION-INDEPENDENT `s3://bucket/key` URL, so a
  * region move never duplicates cached bytes.
  *
  * Requests are anonymous by default (public buckets, S3-compatible
  * stores); configuring credentials (`graft.s3.access_key_id` /
  * `graft.s3.secret_access_key` properties or the standard AWS env
  * names) switches every request to SigV4-signed via [[SigV4]] —
  * verified egress-free against a fixture that recomputes the
  * signature server-side from the same secret (S3SourceSpec).
  *
  * Endpoint template: `graft.s3.endpoint` system property (falling
  * back to env `GRAFT_S3_ENDPOINT`, then the AWS virtual-hosted
  * default `https://{bucket}.s3.{region}.amazonaws.com`). `{bucket}`
  * and `{region}` placeholders are substituted; tests point this at a
  * local path-style fixture (`http://127.0.0.1:PORT/{region}/{bucket}`).
  */
object S3Source {

  /** `scheme` distinguishes the S3-DIALECT stores the reference's
    * caching filesystem accepts alongside s3://
    * (duckdb_pglake/src/fs/file_cache_manager.cpp:223-231): `gs://`
    * (GCS XML interop API against storage.googleapis.com — exactly how
    * the reference drives it, pgduck_server/src/duckdb/duckdb.c:398-403
    * creates a GCS secret with that endpoint) and `r2://` (Cloudflare
    * R2, S3-compatible, account-scoped endpoint — no public default,
    * `graft.r2.endpoint` is required). Both speak ListObjectsV2 +
    * SigV4, so everything below is shared; only the endpoint template
    * and credential properties switch on the scheme.
    */
  final case class S3Ref(bucket: String, key: String,
      scheme: String = "s3")

  /** `s3://bucket/key` (also `s3a://`, `gs://`, `r2://`); None for
    * anything else.
    */
  def parse(url: String): Option[S3Ref] = {
    val m = "^(s3a?|gs|r2)://([^/]+)/(.*)$".r
    url match {
      case m(sch, b, k) if b.nonEmpty =>
        Some(S3Ref(b, k, if (sch.startsWith("s3")) "s3" else sch))
      case _ => None
    }
  }

  private def prop(name: String, env: String, default: String): String =
    sys.props.get(name).orElse(sys.env.get(env)).getOrElse(default)

  private def endpointTemplate(scheme: String): String = scheme match {
    case "gs" => prop("graft.gs.endpoint", "GRAFT_GS_ENDPOINT",
      // path-style against the XML interop endpoint (the reference's
      // own GCS endpoint choice)
      "https://storage.googleapis.com")
    case "r2" => sys.props.get("graft.r2.endpoint")
      .orElse(sys.env.get("GRAFT_R2_ENDPOINT"))
      .getOrElse(throw new IllegalArgumentException(
        "r2:// needs graft.r2.endpoint (account-scoped, e.g. " +
          "https://<account-id>.r2.cloudflarestorage.com)"))
    case _ => prop("graft.s3.endpoint", "GRAFT_S3_ENDPOINT",
      "https://{bucket}.s3.{region}.amazonaws.com")
  }

  private def defaultRegion(scheme: String): String = scheme match {
    // GCS interop and R2 both sign with the fixed region "auto"
    // unless overridden
    case "gs" => prop("graft.gs.region", "GRAFT_GS_REGION", "auto")
    case "r2" => prop("graft.r2.region", "GRAFT_R2_REGION", "auto")
    case _ => prop("graft.s3.region", "GRAFT_S3_REGION", "us-east-1")
  }

  /** Process-wide bucket → region cache, learned from 301 responses.
    * Mirrors the reference's in-memory bucket-region map: one wrong-
    * region round trip per bucket per process, then direct routing.
    */
  private val regions = new ConcurrentHashMap[String, String]()

  private[graft] def clearRegionCache(): Unit = regions.clear()

  def regionOf(bucket: String): String = regionOf(bucket, "s3")

  def regionOf(bucket: String, scheme: String): String =
    regions.getOrDefault(bucket, defaultRegion(scheme))

  /** The https URL of `ref` at `region` under the scheme's endpoint
    * template: virtual-hosted when the template names `{bucket}`,
    * path-style (bucket as the first path segment) otherwise.
    */
  def urlFor(ref: S3Ref, region: String): String = {
    val tpl = endpointTemplate(ref.scheme)
    val base = tpl.replace("{bucket}", ref.bucket)
      .replace("{region}", region)
    val pathStyle = !tpl.contains("{bucket}")
    s"$base/${if (pathStyle) ref.bucket + "/" else ""}${encodeKey(ref.key)}"
  }

  /** RFC 3986 path encoding of an object key, '/' preserved — legal
    * S3 keys may contain spaces, '?', '#', '%', or non-ASCII, which
    * would otherwise break URI parsing or silently truncate the path
    * into query/fragment.
    */
  private[graft] def encodeKey(key: String): String =
    rfc3986(key, keepSlash = true)

  /** RFC 3986 encoding for query-parameter values: like [[encodeKey]]
    * but '/' is encoded too, and — unlike form encoding — space
    * becomes %20, never '+' (strict S3-compatible stores decode '+'
    * literally and would miss keys whose prefix contains spaces).
    * This is also exactly AWS SigV4's canonical query encoding, so
    * signed list requests canonicalize to the bytes on the wire.
    */
  private[graft] def encodeQuery(v: String): String =
    rfc3986(v, keepSlash = false)

  private def rfc3986(s: String, keepSlash: Boolean): String = {
    val sb = new StringBuilder
    s.getBytes("UTF-8").foreach { b =>
      val c = (b & 0xff).toChar
      if (c.isLetterOrDigit && c < 128 || "-._~".contains(c) ||
          (keepSlash && c == '/')) sb.append(c)
      else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }

  /** SigV4 headers for a GET of `url` when credentials are configured;
    * empty (anonymous) otherwise. The signing region is the bucket's
    * current best-known region — on a wrong guess S3 answers 400
    * AuthorizationHeaderMalformed WITH `x-amz-bucket-region`, which
    * the HTTP layer already surfaces as [[RegionMoved]], so the retry
    * re-signs with the learned region.
    */
  def signingHeaders(ref: S3Ref, url: String,
      method: String = "GET",
      payloadHash: String = SigV4.EmptyPayloadHash): Map[String, String] =
    credentialsFor(ref.scheme) match {
      case Some(c) =>
        SigV4.signHeaders(method, url,
          regionOf(ref.bucket, ref.scheme), "s3", c,
          payloadHash = payloadHash)
      case None => Map.empty
    }

  /** Per-scheme HMAC credentials (`graft.gs.*` / `graft.r2.*` props,
    * `GS_`/`R2_` env), falling back to the shared s3 set — GCS interop
    * and R2 both accept AWS-shaped HMAC keys, and a single-store
    * deployment typically configures just the shared pair.
    */
  private def credentialsFor(scheme: String): Option[SigV4.Credentials] = {
    def get(p: String, e: String): Option[String] =
      sys.props.get(p).orElse(sys.env.get(e)).filter(_.nonEmpty)
    val own =
      if (scheme == "s3") None
      else for {
        id <- get(s"graft.$scheme.access_key_id",
          s"${scheme.toUpperCase}_ACCESS_KEY_ID")
        sec <- get(s"graft.$scheme.secret_access_key",
          s"${scheme.toUpperCase}_SECRET_ACCESS_KEY")
      } yield SigV4.Credentials(id, sec, None)
    own.orElse(SigV4.credentials)
  }

  /** Raised by the HTTP layer when S3 answers 301/400 with an
    * `x-amz-bucket-region` header (S3's wrong-region responses carry
    * the region header but often NO Location — a generic redirect
    * follower cannot recover).
    */
  final case class RegionMoved(region: String)
      extends RuntimeException(s"bucket is in region $region")

  /** Run `body` against the ref's current best-known regional URL,
    * learning from [[RegionMoved]] and retrying — at most twice (a
    * correct region answer is stable; a second move means a broken
    * endpoint and surfaces).
    */
  def withRegionRouting[T](ref: S3Ref)(body: String => T): T = {
    var attempt = 0
    while (true) {
      val url = urlFor(ref, regionOf(ref.bucket, ref.scheme))
      try return body(url)
      catch {
        case RegionMoved(r) if attempt < 2 =>
          regions.put(ref.bucket, r)
          attempt += 1
      }
    }
    sys.error("unreachable")
  }

  /** Expand `s3://bucket/pre*fix` via anonymous ListObjectsV2
    * (`?list-type=2&prefix=`), following continuation tokens; keys are
    * matched against the glob (`*` within a path segment, `**` across)
    * and returned as `s3://` URLs in listing order. A keyless or
    * wildcard-free URL returns itself.
    */
  def expandWildcard(url: String,
      fetch: (String, Map[String, String]) => Array[Byte])
      : Seq[String] = {
    val ref = parse(url).getOrElse(return Seq(url))
    if (!ref.key.contains('*')) return Seq(url)
    listWildcard(url, fetch).map(_._1)
  }

  /** Like [[expandWildcard]] but keeps each object's size from the
    * listing's `<Size>` (the reference's `lake_file.list` reports
    * sizes, test_list_file.py's zero-size cases included). A
    * wildcard-free URL lists its exact key — one prefix round trip —
    * so single-object listings carry the true size too.
    *
    * `allowEmpty` splits the two callers: the read-staging path keeps
    * the loud no-match guard (a scan over zero shards is a user
    * error), while `lake_file.list` returns an EMPTY listing for a
    * nonexistent key or a non-matching wildcard — the reference's
    * list surface does exactly that (test_list_file.py
    * test_list_files_does_not_exist / _wildcard), matching the local
    * globStatus branch.
    */
  def listWildcard(url: String,
      fetch: (String, Map[String, String]) => Array[Byte],
      allowEmpty: Boolean = false)
      : Seq[(String, Long)] = {
    val ref = parse(url).getOrElse(
      throw new IllegalArgumentException(s"not an object-store URL: $url"))
    val prefix = ref.key.takeWhile(_ != '*')
    val rx = java.util.regex.Pattern.compile(
      ref.key.split("\\*\\*", -1).map(
        _.split("\\*", -1).map(java.util.regex.Pattern.quote)
          .mkString("[^/]*"))
        .mkString(".*"))
    val out = Seq.newBuilder[(String, Long)]
    var token: Option[String] = None
    var pages = 0
    do {
      val listRef = S3Ref(ref.bucket, "", ref.scheme)
      val base = withRegionRouting(listRef) { u =>
        // probe routing with the list URL itself; query values use
        // strict RFC 3986 (space → %20, not '+'), which doubles as
        // SigV4's canonical query encoding
        val q = new StringBuilder(u.stripSuffix("/"))
        q.append("/?list-type=2&prefix=").append(encodeQuery(prefix))
        token.foreach(t => q.append("&continuation-token=")
          .append(encodeQuery(t)))
        val qs = q.toString
        new String(fetch(qs, signingHeaders(listRef, qs)), "UTF-8")
      }
      // per-entry scope: Key and Size live in the same <Contents>
      // block; a flat <Key> scan would mis-pair sizes across entries.
      // Minimal stores that omit the <Contents> wrapper fall back to
      // a flat key scan with unknown (-1) sizes.
      val contentsRe = "(?s)<Contents>(.*?)</Contents>".r
      val entries = contentsRe.findAllMatchIn(base).map(_.group(1)).toSeq
      def keep(k: String, size: Long): Unit =
        if (rx.matcher(k).matches())
          out += ((s"${ref.scheme}://${ref.bucket}/$k", size))
      if (entries.nonEmpty) entries.foreach { blk =>
        for (km <- "<Key>([^<]*)</Key>".r.findFirstMatchIn(blk))
          keep(xmlUnescape(km.group(1)),
            "<Size>(\\d+)</Size>".r.findFirstMatchIn(blk)
              .map(_.group(1).toLong).getOrElse(-1L))
      } else "<Key>([^<]*)</Key>".r.findAllMatchIn(base)
        .foreach(m => keep(xmlUnescape(m.group(1)), -1L))
      token = "<NextContinuationToken>([^<]*)</NextContinuationToken>".r
        .findFirstMatchIn(base).map(m => xmlUnescape(m.group(1)))
      pages += 1
      // no silent caps: an unfinished listing must fail loudly, not
      // return a partial shard set that reads as complete
      require(token.isEmpty || pages < 10000,
        s"s3 wildcard listing exceeded $pages pages: $url")
    } while (token.isDefined)
    val res = out.result()
    require(allowEmpty || res.nonEmpty,
      s"s3 wildcard matched no keys: $url")
    res
  }

  private[sources] def xmlUnescape(s: String): String = {
    // numeric entities first (S3 emits e.g. &#xD; for CR in keys),
    // &amp; last so it can't re-introduce entities
    val num = "&#(x[0-9a-fA-F]+|[0-9]+);".r
    val n = num.replaceAllIn(s, m => {
      val g = m.group(1)
      val cp = if (g.startsWith("x") || g.startsWith("X"))
        Integer.parseInt(g.substring(1), 16)
      else Integer.parseInt(g)
      java.util.regex.Matcher.quoteReplacement(
        new String(Character.toChars(cp)))
    })
    n.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&apos;", "'").replace("&amp;", "&")
  }
}
