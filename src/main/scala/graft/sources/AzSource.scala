package graft.sources

/** `az://` / `azure://` / `abfss://` object-store routing — the Azure
  * leg of the reference's caching filesystem (it accepts all three
  * spellings, duckdb_pglake/src/fs/file_cache_manager.cpp:225-227, and
  * links the Azure SDK per docs/building-from-source.md:129).
  *
  * Spark-side shape mirrors [[S3Source]]: driver/executor-local URL
  * plumbing in front of [[HttpSource]]'s staged download +
  * [[FileCache]]. The cache key stays the CREDENTIAL-INDEPENDENT
  * `az://…` URL, so a rotated SAS token never duplicates cached bytes.
  *
  * Accepted URL shapes (DuckDB azure extension + Hadoop ABFS
  * conventions):
  *   - `az://container/key` (account from config)
  *   - `az://account.blob.core.windows.net/container/key`
  *   - `abfss://container@account.dfs.core.windows.net/key`
  *   - `abfss://container/key`
  *
  * Auth is a Shared Access Signature: the `graft.az.sas_token` system
  * property (or `AZURE_STORAGE_SAS_TOKEN` env) is appended as the query
  * string of every request — GETs and List Blobs alike. AzSourceSpec
  * validates the token SERVER-side in a local fixture (the SigV4
  * fixture pattern) and answers 403 on a bad signature. The endpoint
  * template `graft.az.endpoint` / `GRAFT_AZ_ENDPOINT` (default
  * `https://{account}.blob.core.windows.net/{container}`) is what the
  * fixture overrides; `{account}`/`{container}` are substituted.
  */
object AzSource {

  final case class AzRef(account: Option[String], container: String,
      key: String)

  private val AbfssFull = "^abfss?://([^@/]+)@([^/.]+)\\.dfs\\.[^/]+/(.*)$".r
  private val AzHost = "^(?:az|azure)://([^/.]+)\\.blob\\.[^/]+/([^/]+)/(.*)$".r
  private val AbfssShort = "^abfss?://([^@/]+)/(.*)$".r
  private val AzShort = "^(?:az|azure)://([^/]+)/(.*)$".r

  /** Parse an Azure URL; None for anything else. Host-qualified forms
    * win over the short forms so `az://acct.blob.core.windows.net/c/k`
    * never reads the hostname as a container name.
    */
  def parse(url: String): Option[AzRef] = url match {
    case AbfssFull(cont, acct, key) => Some(AzRef(Some(acct), cont, key))
    case AzHost(acct, cont, key) => Some(AzRef(Some(acct), cont, key))
    case AbfssShort(cont, key) if !cont.contains('.') =>
      Some(AzRef(None, cont, key))
    case AzShort(cont, key) if !cont.contains('.') =>
      Some(AzRef(None, cont, key))
    case _ => None
  }

  private def prop(name: String, env: String): Option[String] =
    sys.props.get(name).orElse(sys.env.get(env)).filter(_.nonEmpty)

  private def endpointTemplate: String =
    prop("graft.az.endpoint", "GRAFT_AZ_ENDPOINT")
      .getOrElse("https://{account}.blob.core.windows.net/{container}")

  private def accountOf(ref: AzRef): String =
    ref.account.orElse(prop("graft.az.account", "AZURE_STORAGE_ACCOUNT"))
      .getOrElse(throw new IllegalArgumentException(
        "azure account not configured: set graft.az.account (or " +
          "AZURE_STORAGE_ACCOUNT) or use an account-qualified URL"))

  def sasToken: Option[String] =
    prop("graft.az.sas_token", "AZURE_STORAGE_SAS_TOKEN")
      .map(_.stripPrefix("?"))

  /** Append the configured SAS token to a request URL (Azure auth is
    * query-string-borne; anonymous when none is configured).
    */
  private def withSas(u: String): String =
    sasToken.map(t => u + (if (u.contains('?')) "&" else "?") + t)
      .getOrElse(u)

  /** Container-root URL under the endpoint template (no key, no SAS). */
  private def containerUrl(ref: AzRef): String =
    endpointTemplate.replace("{account}", accountOf(ref))
      .replace("{container}", ref.container).stripSuffix("/")

  /** The authenticated https URL of a blob. */
  def urlFor(ref: AzRef): String =
    withSas(s"${containerUrl(ref)}/${S3Source.encodeKey(ref.key)}")

  /** Expand `az://container/pre*fix` via the List Blobs API
    * (`?restype=container&comp=list&prefix=`), following `NextMarker`
    * pagination; names are matched against the glob (`*` within a path
    * segment, `**` across) and returned in the ORIGINAL URL spelling
    * (same scheme/account form), in listing order. A wildcard-free URL
    * returns itself.
    */
  def expandWildcard(url: String,
      fetch: (String, Map[String, String]) => Array[Byte])
      : Seq[String] = {
    val ref = parse(url).getOrElse(return Seq(url))
    if (!ref.key.contains('*')) return Seq(url)
    listWildcard(url, fetch).map(_._1)
  }

  /** Like [[expandWildcard]] but keeps each blob's size from the
    * listing's `<Content-Length>` property (the reference's
    * `lake_file.list` reports sizes); a wildcard-free URL lists its
    * exact blob name. `allowEmpty` = the `lake_file.list` surface:
    * zero rows for a nonexistent blob / non-matching wildcard
    * (reference test_list_file.py), while read-staging keeps the
    * loud guard.
    */
  def listWildcard(url: String,
      fetch: (String, Map[String, String]) => Array[Byte],
      allowEmpty: Boolean = false)
      : Seq[(String, Long)] = {
    val ref = parse(url).getOrElse(
      throw new IllegalArgumentException(s"not an azure URL: $url"))
    val head = url.substring(0, url.length - ref.key.length)
    val prefix = ref.key.takeWhile(_ != '*')
    val rx = java.util.regex.Pattern.compile(
      ref.key.split("\\*\\*", -1).map(
        _.split("\\*", -1).map(java.util.regex.Pattern.quote)
          .mkString("[^/]*"))
        .mkString(".*"))
    val out = Seq.newBuilder[(String, Long)]
    var marker: Option[String] = None
    var pages = 0
    do {
      val q = new StringBuilder(containerUrl(ref))
      q.append("?restype=container&comp=list&prefix=")
        .append(S3Source.encodeQuery(prefix))
      marker.foreach(m => q.append("&marker=")
        .append(S3Source.encodeQuery(m)))
      val body = new String(fetch(withSas(q.toString), Map.empty), "UTF-8")
      // per-blob scope: Name and Content-Length pair inside one <Blob>
      val blobRe = "(?s)<Blob>(.*?)</Blob>".r
      val blobs = blobRe.findAllMatchIn(body).map(_.group(1)).toSeq
      def keep(k: String, size: Long): Unit =
        if (rx.matcher(k).matches()) out += ((head + k, size))
      if (blobs.nonEmpty) blobs.foreach { blk =>
        for (nm <- "<Name>([^<]*)</Name>".r.findFirstMatchIn(blk))
          keep(S3Source.xmlUnescape(nm.group(1)),
            "<Content-Length>(\\d+)</Content-Length>".r
              .findFirstMatchIn(blk).map(_.group(1).toLong).getOrElse(-1L))
      } else "<Name>([^<]*)</Name>".r.findAllMatchIn(body)
        .foreach(m => keep(S3Source.xmlUnescape(m.group(1)), -1L))
      marker = "<NextMarker>([^<]*)</NextMarker>".r
        .findFirstMatchIn(body).map(m => S3Source.xmlUnescape(m.group(1)))
        .filter(_.nonEmpty)
      pages += 1
      // no silent caps: an unfinished listing must fail loudly, not
      // return a partial shard set that reads as complete
      require(marker.isEmpty || pages < 10000,
        s"azure wildcard listing exceeded $pages pages: $url")
    } while (marker.isDefined)
    val res = out.result()
    require(allowEmpty || res.nonEmpty,
      s"azure wildcard matched no blobs: $url")
    res
  }
}
