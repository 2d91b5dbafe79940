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
  * Scope: anonymous (unsigned) requests only — public buckets and
  * S3-compatible stores. There are no credentials in this environment
  * to test SigV4 against, so signing is refused loudly rather than
  * shipped blind (set no `graft.s3.endpoint` and request a private
  * bucket: the 403 surfaces as-is).
  *
  * Endpoint template: `graft.s3.endpoint` system property (falling
  * back to env `GRAFT_S3_ENDPOINT`, then the AWS virtual-hosted
  * default `https://{bucket}.s3.{region}.amazonaws.com`). `{bucket}`
  * and `{region}` placeholders are substituted; tests point this at a
  * local path-style fixture (`http://127.0.0.1:PORT/{region}/{bucket}`).
  */
object S3Source {

  final case class S3Ref(bucket: String, key: String)

  /** `s3://bucket/key` (also `s3a://`); None for anything else. */
  def parse(url: String): Option[S3Ref] = {
    val m = "^s3a?://([^/]+)/(.*)$".r
    url match {
      case m(b, k) if b.nonEmpty => Some(S3Ref(b, k))
      case _ => None
    }
  }

  private def prop(name: String, env: String, default: String): String =
    sys.props.get(name).orElse(sys.env.get(env)).getOrElse(default)

  private def endpointTemplate: String =
    prop("graft.s3.endpoint", "GRAFT_S3_ENDPOINT",
      "https://{bucket}.s3.{region}.amazonaws.com")

  private def defaultRegion: String =
    prop("graft.s3.region", "GRAFT_S3_REGION", "us-east-1")

  /** Process-wide bucket → region cache, learned from 301 responses.
    * Mirrors the reference's in-memory bucket-region map: one wrong-
    * region round trip per bucket per process, then direct routing.
    */
  private val regions = new ConcurrentHashMap[String, String]()

  private[graft] def clearRegionCache(): Unit = regions.clear()

  def regionOf(bucket: String): String =
    regions.getOrDefault(bucket, defaultRegion)

  /** The https URL of `ref` at `region` under the endpoint template:
    * virtual-hosted when the template names `{bucket}`, path-style
    * (bucket as the first path segment) otherwise.
    */
  def urlFor(ref: S3Ref, region: String): String = {
    val tpl = endpointTemplate
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
  private[graft] def encodeKey(key: String): String = {
    val sb = new StringBuilder
    key.getBytes("UTF-8").foreach { b =>
      val c = (b & 0xff).toChar
      if (c.isLetterOrDigit && c < 128 || "-._~/".contains(c)) sb.append(c)
      else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
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
      val url = urlFor(ref, regionOf(ref.bucket))
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
      fetch: String => Array[Byte]): Seq[String] = {
    val ref = parse(url).getOrElse(return Seq(url))
    if (!ref.key.contains('*')) return Seq(url)
    val prefix = ref.key.takeWhile(_ != '*')
    val rx = java.util.regex.Pattern.compile(
      ref.key.split("\\*\\*", -1).map(
        _.split("\\*", -1).map(java.util.regex.Pattern.quote)
          .mkString("[^/]*"))
        .mkString(".*"))
    val out = Seq.newBuilder[String]
    var token: Option[String] = None
    var pages = 0
    do {
      val listRef = S3Ref(ref.bucket, "")
      val base = withRegionRouting(listRef) { u =>
        // probe routing with the list URL itself
        val q = new StringBuilder(u.stripSuffix("/"))
        q.append("/?list-type=2&prefix=")
          .append(java.net.URLEncoder.encode(prefix, "UTF-8"))
        token.foreach(t => q.append("&continuation-token=")
          .append(java.net.URLEncoder.encode(t, "UTF-8")))
        new String(fetch(q.toString), "UTF-8")
      }
      val keyRe = "<Key>([^<]*)</Key>".r
      keyRe.findAllMatchIn(base).foreach { m =>
        val k = xmlUnescape(m.group(1))
        if (rx.matcher(k).matches()) out += s"s3://${ref.bucket}/$k"
      }
      token = "<NextContinuationToken>([^<]*)</NextContinuationToken>".r
        .findFirstMatchIn(base).map(m => xmlUnescape(m.group(1)))
      pages += 1
      // no silent caps: an unfinished listing must fail loudly, not
      // return a partial shard set that reads as complete
      require(token.isEmpty || pages < 10000,
        s"s3 wildcard listing exceeded $pages pages: $url")
    } while (token.isDefined)
    val res = out.result()
    require(res.nonEmpty, s"s3 wildcard matched no keys: $url")
    res
  }

  private def xmlUnescape(s: String): String = {
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
