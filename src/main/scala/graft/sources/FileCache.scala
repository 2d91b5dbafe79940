package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Bounded, freshness-validated local cache for remote-file staging —
  * the analogue of the reference's caching filesystem layer
  * (duckdb_pglake/src/fs/file_cache_manager.cpp: local cache files
  * keyed per remote object, LRU by file mtime touched on access,
  * capacity-bound eviction) re-expressed for the stage-then-scan
  * design of [[HttpSource]].
  *
  * Entries are `<key><ext>` files plus a `<key><ext>.meta` sidecar
  * (java.util.Properties: etag / lastModified / fetchedAt). On a hit
  * the entry's mtime is touched so eviction order is least-recently-
  * USED, not least-recently-downloaded. A hit older than the TTL is
  * revalidated with a conditional GET (If-None-Match /
  * If-Modified-Since): 304 refreshes the clock without moving bytes,
  * 200 atomically replaces the entry, and a network failure serves the
  * stale copy (stale-if-error — a warm cache keeps working offline,
  * which the spec exercises by stopping the fixture server).
  *
  * Tunables (system properties, read per call so tests can scope them):
  *  - `graft.http.cache.dir`       cache directory (default
  *    `$java.io.tmpdir/graft-http-cache`)
  *  - `graft.http.cache.maxBytes`  capacity bound (default 10 GiB)
  *  - `graft.http.cache.ttlMs`     revalidation age (default 10 min;
  *    `Long.MaxValue` = never revalidate — right for immutable
  *    revision-pinned URLs)
  */
object FileCache {

  /** Metadata of a completed fetch, recorded for later revalidation. */
  case class Fetched(etag: Option[String], lastModified: Option[String])

  def dir: Path = {
    val d = Paths.get(sys.props.getOrElse("graft.http.cache.dir",
      Paths.get(System.getProperty("java.io.tmpdir"), "graft-http-cache")
        .toString))
    Files.createDirectories(d)
    d
  }

  private def maxBytes: Long =
    sys.props.get("graft.http.cache.maxBytes").map(_.toLong)
      .getOrElse(10L << 30)

  private def ttlMs: Long =
    sys.props.get("graft.http.cache.ttlMs").map(_.toLong)
      .getOrElse(10L * 60 * 1000)

  /** Cached path for `key` + `ext`, fetching or revalidating as
    * needed. `fetch(tmp, condHeaders)` downloads into `tmp` and
    * returns the response metadata, or returns None when the server
    * answered 304 Not Modified to the conditional headers.
    */
  def getOrFetch(key: String, ext: String, url: String = "")(
      fetch: (Path, Map[String, String]) => Option[Fetched]): Path = {
    val target = dir.resolve(s"$key$ext")
    val metaPath = dir.resolve(s"$key$ext.meta")
    if (Files.exists(target)) {
      val meta = readMeta(metaPath)
      val age = System.currentTimeMillis() -
        Option(meta.getProperty("fetchedAt")).map(_.toLong).getOrElse(0L)
      // strict <: ttlMs=0 must ALWAYS revalidate, even when the hit
      // lands in the same millisecond as the fetch
      if (age < ttlMs) { touch(target); return target }
      val cond = Seq(
        Option(meta.getProperty("etag")).map("If-None-Match" -> _),
        Option(meta.getProperty("lastModified"))
          .map("If-Modified-Since" -> _)).flatten.toMap
      val tmp = Files.createTempFile(dir, "dl-", ".part")
      try {
        fetch(tmp, cond) match {
          case None => // 304: bytes unchanged, restart the TTL clock
            writeMeta(metaPath, Fetched(
              Option(meta.getProperty("etag")),
              Option(meta.getProperty("lastModified"))), url)
            touch(target)
          case Some(f) =>
            Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING,
              StandardCopyOption.ATOMIC_MOVE)
            writeMeta(metaPath, f, url)
            // a revalidation can REPLACE the entry with larger bytes;
            // without this the bound only applies on misses and a
            // fixed key set with growing objects fills the disk
            enforceCapacity(keep = target)
        }
      } catch {
        // stale-if-error: the cached copy outlives a dead origin
        case _: java.io.IOException => touch(target)
      } finally Files.deleteIfExists(tmp)
      return target
    }
    val tmp = Files.createTempFile(dir, "dl-", ".part")
    try {
      val f = fetch(tmp, Map.empty).getOrElse(throw new java.io.IOException(
        s"304 response for $key$ext with no cached copy"))
      try {
        Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
        writeMeta(metaPath, f, url)
      } catch {
        // concurrent fetch of the same key won the race — use theirs
        case _: java.nio.file.FileAlreadyExistsException =>
      }
    } finally Files.deleteIfExists(tmp)
    enforceCapacity(keep = target)
    target
  }

  /** Evict least-recently-used entries until the cache fits
    * `maxBytes`. The entry just stored (`keep`) is never evicted even
    * if it alone exceeds the bound — the caller is about to read it.
    * `set-*` link directories are skipped: their names hard-link entry
    * files, so evicting the entry frees no bytes while a set holds it
    * (same effect as the reference pinning in-use cache files).
    */
  def enforceCapacity(keep: Path): Unit = synchronized {
    val cap = maxBytes
    val entries = Files.list(dir).iterator().asScala
      .filter(p => Files.isRegularFile(p))
      .filterNot(p => p.getFileName.toString.endsWith(".part") ||
        p.getFileName.toString.endsWith(".meta"))
      .map(p => (p, Files.size(p), Files.getLastModifiedTime(p).toMillis))
      .toSeq
    var total = entries.map(_._2).sum
    if (total <= cap) return
    for ((p, sz, _) <- entries.sortBy(_._3) if total > cap && p != keep) {
      try {
        Files.deleteIfExists(p)
        Files.deleteIfExists(
          p.resolveSibling(p.getFileName.toString + ".meta"))
        total -= sz
      } catch { case _: java.io.IOException => /* in use; skip */ }
    }
  }

  private def touch(p: Path): Unit =
    try Files.setLastModifiedTime(p,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
    catch { case _: java.io.IOException => }

  private def readMeta(p: Path): java.util.Properties = {
    val props = new java.util.Properties()
    if (Files.exists(p)) {
      val in = Files.newInputStream(p)
      try props.load(in) finally in.close()
    }
    props
  }

  private def writeMeta(p: Path, f: Fetched, url: String = ""): Unit = {
    val props = new java.util.Properties()
    f.etag.foreach(props.setProperty("etag", _))
    f.lastModified.foreach(props.setProperty("lastModified", _))
    if (url.nonEmpty) props.setProperty("url", url)
    props.setProperty("fetchedAt", System.currentTimeMillis().toString)
    val out = Files.newOutputStream(p)
    try props.store(out, null) finally out.close()
  }

  /** Evict one entry by cache key; returns the bytes freed (0 when the
    * entry was not cached). Backs `lake_file_cache.remove`
    * (reference test_caching.py).
    */
  def remove(key: String, ext: String): Long = synchronized {
    val target = dir.resolve(s"$key$ext")
    val freed = if (Files.exists(target)) Files.size(target) else 0L
    Files.deleteIfExists(target)
    Files.deleteIfExists(dir.resolve(s"$key$ext.meta"))
    freed
  }

  /** (source URL, cached size) for every live entry whose sidecar
    * recorded its URL. Backs `lake_file_cache.list()`.
    */
  def list(): Seq[(String, Long)] = {
    // Files.list holds a directory handle until closed — materialize
    // inside try/finally or every list() leaks one descriptor
    val stream = Files.list(dir)
    try {
      stream.iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".meta"))
        .flatMap { metaPath =>
          val entry = metaPath.resolveSibling(
            metaPath.getFileName.toString.stripSuffix(".meta"))
          val url = Option(readMeta(metaPath).getProperty("url"))
          url.filter(_ => Files.exists(entry))
            .map(u => (u, Files.size(entry)))
        }.toSeq.sortBy(_._1)
    } finally stream.close()
  }

  private implicit class JIter[T](it: java.util.Iterator[T]) {
    def asScala: Iterator[T] = new Iterator[T] {
      def hasNext = it.hasNext
      def next() = it.next()
    }
  }
}
