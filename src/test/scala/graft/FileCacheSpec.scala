package graft

import java.net.InetSocketAddress
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.HttpServer
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.HttpSource

/** Bounded + revalidating remote-file cache (sources/FileCache):
  * LRU eviction under a byte cap, conditional-GET revalidation after
  * TTL, and stale-if-error against a dead origin — the behaviors the
  * reference's file_cache_manager provides for its caching
  * filesystem.
  */
class FileCacheSpec extends AnyFunSuite {

  /** Fixture origin: per-path mutable (bytes, etag) with 200/304
    * counters; honors If-None-Match.
    */
  private class Origin {
    val files = scala.collection.concurrent.TrieMap.empty[String, (Array[Byte], String)]
    val full = new AtomicInteger(0)
    val notModified = new AtomicInteger(0)
    val server: HttpServer = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", { ex =>
      files.get(ex.getRequestURI.getPath) match {
        case None =>
          ex.sendResponseHeaders(404, -1)
        case Some((bytes, etag)) =>
          if (Option(ex.getRequestHeaders.getFirst("If-None-Match"))
              .contains(etag)) {
            notModified.incrementAndGet()
            ex.sendResponseHeaders(304, -1)
          } else {
            full.incrementAndGet()
            ex.getResponseHeaders.set("ETag", etag)
            ex.sendResponseHeaders(200, bytes.length)
            ex.getResponseBody.write(bytes)
          }
      }
      ex.close()
    })
    server.start()
    def url(path: String) = s"http://127.0.0.1:${server.getAddress.getPort}$path"
  }

  private def withCache(ttlMs: Long, maxBytes: Long = 10L << 30)(
      body: Origin => Unit): Unit = {
    val dir = Files.createTempDirectory("graft-cache-spec")
    System.setProperty("graft.http.cache.dir", dir.toString)
    System.setProperty("graft.http.cache.ttlMs", ttlMs.toString)
    System.setProperty("graft.http.cache.maxBytes", maxBytes.toString)
    val origin = new Origin
    try body(origin)
    finally {
      origin.server.stop(0)
      System.clearProperty("graft.http.cache.dir")
      System.clearProperty("graft.http.cache.ttlMs")
      System.clearProperty("graft.http.cache.maxBytes")
    }
  }

  private def read(path: String): String =
    new String(Files.readAllBytes(Paths.get(path)), "UTF-8")

  test("fresh hit within TTL serves the cached copy with no request") {
    withCache(ttlMs = Long.MaxValue) { o =>
      o.files("/a.csv") = ("x,y\n1,2\n".getBytes, "\"v1\"")
      val p1 = HttpSource.stage(o.url("/a.csv"))
      val p2 = HttpSource.stage(o.url("/a.csv"))
      assert(p1 == p2)
      assert(read(p1) == "x,y\n1,2\n")
      assert(o.full.get == 1 && o.notModified.get == 0)
    }
  }

  test("stale hit revalidates: 304 keeps bytes, changed ETag refetches") {
    withCache(ttlMs = 0) { o =>
      o.files("/b.csv") = ("a\n1\n".getBytes, "\"v1\"")
      val p1 = HttpSource.stage(o.url("/b.csv"))
      assert(o.full.get == 1)
      // unchanged upstream: conditional GET answers 304, no byte move
      val p2 = HttpSource.stage(o.url("/b.csv"))
      assert(p2 == p1 && read(p2) == "a\n1\n")
      assert(o.full.get == 1 && o.notModified.get == 1)
      // upstream mutated: validator mismatch => full 200, cache updated
      o.files("/b.csv") = ("a\n2\n".getBytes, "\"v2\"")
      val p3 = HttpSource.stage(o.url("/b.csv"))
      assert(read(p3) == "a\n2\n")
      assert(o.full.get == 2)
    }
  }

  test("stale-if-error: dead origin serves the cached copy") {
    withCache(ttlMs = 0) { o =>
      o.files("/c.csv") = ("k\n9\n".getBytes, "\"v1\"")
      val p1 = HttpSource.stage(o.url("/c.csv"))
      val url = o.url("/c.csv")
      o.server.stop(0)
      val p2 = HttpSource.stage(url)
      assert(p2 == p1 && read(p2) == "k\n9\n")
    }
  }

  test("capacity bound evicts least-recently-USED, not last-downloaded") {
    // 60-byte payloads under a 150-byte cap: two fit, three do not
    withCache(ttlMs = Long.MaxValue, maxBytes = 150) { o =>
      def pay(c: Char) = Array.fill(60)(c.toByte)
      o.files("/a.bin") = (pay('a'), "\"a\"")
      o.files("/b.bin") = (pay('b'), "\"b\"")
      o.files("/c.bin") = (pay('c'), "\"c\"")
      val pa = HttpSource.stage(o.url("/a.bin"))
      Thread.sleep(30)
      val pb = HttpSource.stage(o.url("/b.bin"))
      Thread.sleep(30)
      // touch a: now b is the LRU entry
      HttpSource.stage(o.url("/a.bin"))
      Thread.sleep(30)
      val pc = HttpSource.stage(o.url("/c.bin"))
      assert(Files.exists(Paths.get(pa)), "recently-touched entry survived")
      assert(Files.exists(Paths.get(pc)), "just-stored entry survived")
      assert(!Files.exists(Paths.get(pb)), "LRU entry evicted")
      assert(o.full.get == 3, "touch was a cache hit, not a refetch")
      // evicted entry transparently refetches
      val pb2 = HttpSource.stage(o.url("/b.bin"))
      assert(read(pb2) == new String(pay('b')))
      assert(o.full.get == 4)
    }
  }
}
