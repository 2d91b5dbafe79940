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

  private val cacheDir: Path = {
    val d = Paths.get(System.getProperty("java.io.tmpdir"), "graft-http-cache")
    Files.createDirectories(d)
    d
  }

  /** hf:// → https:// resolve-URL translation (public HF convention). */
  def resolveUrl(url: String): String =
    if (url.startsWith("hf://")) {
      // hf://datasets/{org}/{repo}/{path} or hf://{org}/{repo}/{path}
      val rest = url.stripPrefix("hf://")
      val (kind, tail) =
        if (rest.startsWith("datasets/")) ("datasets/", rest.stripPrefix("datasets/"))
        else ("", rest)
      tail.split("/", 3) match {
        case Array(org, repo, path) =>
          s"https://huggingface.co/$kind$org/$repo/resolve/main/$path"
        case _ => throw new IllegalArgumentException(
          s"hf:// URL needs org/repo/path: $url")
      }
    } else url

  /** URL without query string / fragment — what extension-based format
    * inference should look at.
    */
  def pathPart(url: String): String = url.split("[?#]", 2)(0)

  /** Download (or reuse a cached copy of) `url`; returns the local path.
    * The cache key is the URL's SHA-256, the extension is preserved so
    * format inference keeps working.
    */
  def stage(url: String): String = {
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
    val target = cacheDir.resolve(s"$digest$ext")
    if (!Files.exists(target)) {
      val tmp = Files.createTempFile(cacheDir, "dl-", ".part")
      try {
        download(resolved, tmp)
        try Files.move(tmp, target,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch {
          // concurrent stage of the same URL won the race — use theirs
          case _: java.nio.file.FileAlreadyExistsException =>
        }
      } finally Files.deleteIfExists(tmp)
    }
    target.toString
  }

  private def download(url: String, to: Path): Unit = {
    var conn = new URI(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setInstanceFollowRedirects(true)
    conn.setConnectTimeout(30000)
    conn.setReadTimeout(120000)
    var redirects = 0
    // follow cross-protocol redirects (http->https) the JDK refuses
    while (conn.getResponseCode / 100 == 3 && redirects < 5) {
      val loc = conn.getHeaderField("Location")
      conn.disconnect()
      conn = new URI(loc).toURL.openConnection()
        .asInstanceOf[HttpURLConnection]
      redirects += 1
    }
    if (conn.getResponseCode != 200)
      throw new java.io.IOException(
        s"GET $url -> HTTP ${conn.getResponseCode}")
    val in: InputStream = conn.getInputStream
    try {
      val out = new FileOutputStream(to.toFile)
      try in.transferTo(out)
      finally out.close()
    } finally {
      in.close()
      conn.disconnect()
    }
  }
}
