package graft

import java.net.InetSocketAddress
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{HttpSource, S3Source, SigV4}

/** Region-aware s3:// routing (sources/S3Source): the reference's
  * caching filesystem switches a bucket's endpoint when S3 answers a
  * wrong-region 301 carrying `x-amz-bucket-region` (and NO Location),
  * then remembers the bucket→region mapping so later requests go
  * direct — its e2e is test_region_switch.py. This spec drives the
  * same protocol against a local two-"region" fixture, plus
  * ListObjectsV2 wildcard expansion with continuation-token paging.
  */
class S3SourceSpec extends AnyFunSuite {

  /** Path-style fixture: /{region}/{bucket}/{key}. Requests to the
    * wrong region answer 301 + x-amz-bucket-region (no Location), the
    * home region serves objects and ListObjectsV2.
    */
  private class TwoRegions(home: String, wrong: String,
      objects: Map[String, Array[Byte]], pageSize: Int = 1000,
      auth: Option[(String, String)] = None) {
    val wrongHits = new AtomicInteger(0)
    val homeHits = new AtomicInteger(0)
    val partPuts = new AtomicInteger(0)
    val initiated = new AtomicInteger(0)
    val aborted = new AtomicInteger(0)
    val store = new scala.collection.concurrent.TrieMap[String, Array[Byte]]()
    private val uploads = new scala.collection.concurrent.TrieMap[
      String, scala.collection.concurrent.TrieMap[Int, Array[Byte]]]()
    store ++= objects
    val server: HttpServer =
      HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)

    private def respond(ex: HttpExchange, code: Int,
        body: Array[Byte]): Unit = {
      ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
      if (body.nonEmpty) ex.getResponseBody.write(body)
      ex.close()
    }

    server.createContext(s"/$wrong/", { ex =>
      wrongHits.incrementAndGet()
      ex.getResponseHeaders.set("x-amz-bucket-region", home)
      respond(ex, 301, Array.empty)
    })
    /** Server-side SigV4 verification, the MinIO pattern: rebuild the
      * canonical request from the WIRE bytes (raw path/query and the
      * header values actually received), recompute the signature with
      * the shared secret, and compare — a client that signs anything
      * other than what it sends fails here.
      */
    private def sigOk(ex: HttpExchange): Boolean = auth match {
      case None => true
      case Some((akid, secret)) =>
        val hdr = Option(ex.getRequestHeaders.getFirst("Authorization"))
          .getOrElse(return false)
        val re = ("AWS4-HMAC-SHA256 Credential=([^/]+)/(\\d{8})/" +
          "([^/]+)/([^/]+)/aws4_request, SignedHeaders=([^,]+), " +
          "Signature=([0-9a-f]+)").r
        hdr match {
          case re(id, date, region, service, signedNames, sig)
              if id == akid =>
            val hdrs = signedNames.split(";").toSeq.map(n =>
              n -> Option(ex.getRequestHeaders.getFirst(n)).getOrElse(""))
            val payload = Option(
              ex.getRequestHeaders.getFirst("x-amz-content-sha256"))
              .getOrElse(SigV4.EmptyPayloadHash)
            val (cr, _) = SigV4.canonicalRequest(
              ex.getRequestMethod, ex.getRequestURI.getRawPath,
              ex.getRequestURI.getRawQuery, hdrs, payload)
            val amzDate = ex.getRequestHeaders.getFirst("x-amz-date")
            val expect = SigV4.hex(SigV4.hmac(
              SigV4.signingKey(secret, date, region, service),
              SigV4.stringToSign(amzDate,
                s"$date/$region/$service/aws4_request", cr)))
            expect == sig
          case _ => false
        }
    }

    server.createContext(s"/$home/", { ex =>
      homeHits.incrementAndGet()
      if (!sigOk(ex)) respond(ex, 403, Array.empty)
      else {
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      val params = q.split("&").filter(_.nonEmpty).map(_.split("=", 2))
        .map(a => a(0) -> (if (a.length > 1)
          java.net.URLDecoder.decode(a(1), "UTF-8") else "")).toMap
      def key = ex.getRequestURI.getPath.split("/", 4)(3)
      /** payload-hash check shared by every body-bearing request: the
        * client must have SIGNED the bytes it actually streamed
        */
      def bodyChecked(): Option[Array[Byte]] = {
        val body = ex.getRequestBody.readAllBytes()
        val declared = Option(
          ex.getRequestHeaders.getFirst("x-amz-content-sha256"))
        val actual = java.security.MessageDigest.getInstance("SHA-256")
          .digest(body).map("%02x".format(_)).mkString
        if (declared.exists(d => d != actual && d != "UNSIGNED-PAYLOAD"))
          None
        else Some(body)
      }
      if (ex.getRequestMethod == "POST" && params.contains("uploads")) {
        // CreateMultipartUpload
        ex.getRequestBody.readAllBytes()
        val id = s"up-${initiated.incrementAndGet()}"
        uploads.put(id, new scala.collection.concurrent.TrieMap())
        respond(ex, 200,
          ("<?xml version=\"1.0\"?><InitiateMultipartUploadResult>" +
            s"<UploadId>$id</UploadId></InitiateMultipartUploadResult>")
            .getBytes("UTF-8"))
      } else if (ex.getRequestMethod == "PUT" &&
          params.contains("uploadId")) {
        // UploadPart: hash-verified like a plain PUT, stored per part
        (bodyChecked(), uploads.get(params("uploadId"))) match {
          case (Some(body), Some(parts)) =>
            partPuts.incrementAndGet()
            val n = params("partNumber").toInt
            parts.put(n, body)
            ex.getResponseHeaders.set("ETag", "\"etag-" + n + "\"")
            respond(ex, 200, Array.empty)
          case _ => respond(ex, 400, Array.empty)
        }
      } else if (ex.getRequestMethod == "POST" &&
          params.contains("uploadId")) {
        // CompleteMultipartUpload: assemble in the ORDER THE CLIENT
        // DECLARED, refusing unknown parts
        (bodyChecked(), uploads.remove(params("uploadId"))) match {
          case (Some(body), Some(parts)) =>
            val declared = "<PartNumber>(\\d+)</PartNumber>".r
              .findAllMatchIn(new String(body, "UTF-8"))
              .map(_.group(1).toInt).toSeq
            if (declared.isEmpty ||
                declared.exists(n => !parts.contains(n)))
              respond(ex, 400, Array.empty)
            else {
              store.put(key, declared.flatMap(parts(_)).toArray)
              respond(ex, 200,
                "<CompleteMultipartUploadResult/>".getBytes("UTF-8"))
            }
          case _ => respond(ex, 400, Array.empty)
        }
      } else if (ex.getRequestMethod == "DELETE" &&
          params.contains("uploadId")) {
        aborted.incrementAndGet()
        uploads.remove(params("uploadId"))
        respond(ex, 204, Array.empty)
      } else if (ex.getRequestMethod == "PUT") {
        // store the object; verify the signed payload hash against the
        // REAL body bytes (a client signing anything other than what it
        // streams fails here). If-None-Match: * = AWS conditional
        // write — atomically refuse when the key exists (412)
        bodyChecked() match {
          case None => respond(ex, 400, Array.empty)
          case Some(body) =>
            if (Option(ex.getRequestHeaders.getFirst("If-None-Match"))
                .contains("*") && store.putIfAbsent(key, body).isDefined)
              respond(ex, 412, Array.empty)
            else { store.put(key, body); respond(ex, 200, Array.empty) }
        }
      } else if (q.contains("list-type=2")) {
        val params = q.split("&").map(_.split("=", 2))
          .map(a => a(0) -> (if (a.length > 1)
            java.net.URLDecoder.decode(a(1), "UTF-8") else "")).toMap
        val prefix = params.getOrElse("prefix", "")
        val all = store.keys.toSeq.sorted.filter(_.startsWith(prefix))
        val from = params.get("continuation-token")
          .map(_.toInt).getOrElse(0)
        val page = all.slice(from, from + pageSize)
        val next = if (from + pageSize < all.size)
          s"<NextContinuationToken>${from + pageSize}" +
            "</NextContinuationToken>"
        else ""
        val xml = ("<?xml version=\"1.0\"?><ListBucketResult>" +
          page.map(k => s"<Contents><Key>$k</Key>" +
            s"<Size>${store(k).length}</Size></Contents>").mkString +
          next + "</ListBucketResult>").getBytes("UTF-8")
        respond(ex, 200, xml)
      } else {
        // strip /{region}/{bucket}/
        val key = ex.getRequestURI.getPath.split("/", 4)(3)
        store.get(key) match {
          case Some(b) => respond(ex, 200, b)
          case None => respond(ex, 404, Array.empty)
        }
      }
      }
    })
    server.start()
    def endpoint: String =
      s"http://127.0.0.1:${server.getAddress.getPort}/{region}"
  }

  private def withS3(objects: Map[String, Array[Byte]],
      pageSize: Int = 1000, auth: Option[(String, String)] = None)
      (body: TwoRegions => Unit): Unit = {
    val f = new TwoRegions("eu-west-1", "us-east-1", objects, pageSize,
      auth)
    val dir = Files.createTempDirectory("graft-s3-spec")
    System.setProperty("graft.http.cache.dir", dir.toString)
    System.setProperty("graft.s3.endpoint", f.endpoint)
    S3Source.clearRegionCache()
    try body(f)
    finally {
      f.server.stop(0)
      System.clearProperty("graft.http.cache.dir")
      System.clearProperty("graft.s3.endpoint")
      S3Source.clearRegionCache()
    }
  }

  test("urlFor: virtual-hosted vs path-style from the template") {
    val ref = S3Source.S3Ref("b", "d/k.parquet")
    System.clearProperty("graft.s3.endpoint")
    assert(S3Source.urlFor(ref, "eu-west-1") ==
      "https://b.s3.eu-west-1.amazonaws.com/d/k.parquet")
    System.setProperty("graft.s3.endpoint", "http://h:1/{region}")
    try assert(S3Source.urlFor(ref, "r1") == "http://h:1/r1/b/d/k.parquet")
    finally System.clearProperty("graft.s3.endpoint")
  }

  test("wrong-region 301 reroutes via x-amz-bucket-region and is remembered") {
    val objs = Map("a.csv" -> "x,y\n1,2\n".getBytes("UTF-8"),
      "b.csv" -> "x,y\n3,4\n".getBytes("UTF-8"))
    withS3(objs) { f =>
      val p1 = HttpSource.stage("s3://bkt/a.csv")
      assert(new String(Files.readAllBytes(
        java.nio.file.Paths.get(p1)), "UTF-8") == "x,y\n1,2\n")
      // exactly one wrong-region round trip to learn the region
      assert(f.wrongHits.get() == 1, s"wrong hits ${f.wrongHits.get()}")
      // a second key in the same bucket goes DIRECT — no new 301
      val p2 = HttpSource.stage("s3://bkt/b.csv")
      assert(new String(Files.readAllBytes(
        java.nio.file.Paths.get(p2)), "UTF-8") == "x,y\n3,4\n")
      assert(f.wrongHits.get() == 1,
        s"region not remembered: ${f.wrongHits.get()} wrong-region hits")
    }
  }

  test("wildcard expansion via ListObjectsV2 with continuation paging") {
    val objs = Map(
      "data/part-0.parquet" -> Array[Byte](1),
      "data/part-1.parquet" -> Array[Byte](2),
      "data/part-2.parquet" -> Array[Byte](3),
      "data/notes.txt" -> Array[Byte](4),
      "other/part-9.parquet" -> Array[Byte](5))
    withS3(objs, pageSize = 2) { f =>
      val urls = HttpSource.expand("s3://bkt/data/*.parquet")
      assert(urls == Seq(
        "s3://bkt/data/part-0.parquet",
        "s3://bkt/data/part-1.parquet",
        "s3://bkt/data/part-2.parquet"))
      // paging: 3 matching keys at pageSize 2 → at least 2 list calls
      assert(f.homeHits.get() >= 2)
      // ** crosses path segments, * does not
      assert(HttpSource.expand("s3://bkt/**/part-9.parquet") ==
        Seq("s3://bkt/other/part-9.parquet"))
      intercept[IllegalArgumentException] {
        HttpSource.expand("s3://bkt/data/*.json")
      }
      // list parity with the reference (test_list_file.py
      // test_list_files_does_not_exist / _wildcard): the LIST surface
      // answers empty for a missing key or non-matching wildcard —
      // only read staging (above) treats zero shards as an error
      assert(HttpSource.list("s3://bkt/data/*.json").isEmpty)
      assert(HttpSource.list("s3://bkt/data/does_not_exist.csv").isEmpty)
    }
  }

  test("keys with spaces / reserved chars percent-encode per RFC 3986") {
    assert(S3Source.encodeKey("data/a b.parquet") == "data/a%20b.parquet")
    assert(S3Source.encodeKey("report?v2.csv") == "report%3Fv2.csv")
    assert(S3Source.encodeKey("x#y%z") == "x%23y%25z")
    assert(S3Source.encodeKey("ünïcode/ok-._~") ==
      "%C3%BCn%C3%AFcode/ok-._~")
    // staging end-to-end: the fixture's HttpServer decodes the path,
    // so a spaced key round-trips through the encoded URL
    val objs = Map("d/a b.bin" -> Array[Byte](7))
    withS3(objs) { _ =>
      val p = HttpSource.stage("s3://bkt/d/a b.bin")
      assert(Files.readAllBytes(java.nio.file.Paths.get(p)).toSeq ==
        Seq(7.toByte))
    }
  }

  test("SigV4 golden vector: AWS's published ListUsers worked example") {
    // the worked example from AWS's public SigV4 documentation —
    // anchors the algorithm against an external authority, so the
    // fixture round-trip below isn't self-referential
    val (cr, signed) = SigV4.canonicalRequest(
      "GET", "/", "Action=ListUsers&Version=2010-05-08",
      Seq(
        "content-type" -> "application/x-www-form-urlencoded; charset=utf-8",
        "host" -> "iam.amazonaws.com",
        "x-amz-date" -> "20150830T123600Z"),
      SigV4.EmptyPayloadHash)
    assert(signed == "content-type;host;x-amz-date")
    assert(SigV4.sha256Hex(cr) ==
      "f536975d06c0309214f805bb90ccff089219ecd68b2577efef23edd43b7e1a59")
    val sts = SigV4.stringToSign("20150830T123600Z",
      "20150830/us-east-1/iam/aws4_request", cr)
    val sig = SigV4.hex(SigV4.hmac(SigV4.signingKey(
      "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY", "20150830",
      "us-east-1", "iam"), sts))
    assert(sig ==
      "5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7")
  }

  test("SigV4-signed staging + listing verified server-side; bad secret 403") {
    val objs = Map("sec/a.bin" -> Array[Byte](42),
      "sec/b.bin" -> Array[Byte](43))
    withS3(objs, auth = Some(("AKIDTEST", "test-secret-key"))) { f =>
      System.setProperty("graft.s3.access_key_id", "AKIDTEST")
      System.setProperty("graft.s3.secret_access_key", "test-secret-key")
      try {
        // GET through region routing: the wrong-region 301 happens
        // first, then the retry re-signs for the learned region and
        // the home server's recomputed signature must match
        val p = HttpSource.stage("s3://bkt/sec/a.bin")
        assert(Files.readAllBytes(java.nio.file.Paths.get(p)).toSeq ==
          Seq(42.toByte))
        // ListObjectsV2 expansion is signed too (query canonicalized)
        assert(HttpSource.expand("s3://bkt/sec/*.bin") == Seq(
          "s3://bkt/sec/a.bin", "s3://bkt/sec/b.bin"))
        // a wrong secret must fail LOUDLY (server 403), not fall back
        System.setProperty("graft.s3.secret_access_key", "wrong")
        val e = intercept[java.io.IOException] {
          HttpSource.stage("s3://bkt/sec/b.bin")
        }
        assert(e.getMessage.contains("403"), e.getMessage)
      } finally {
        System.clearProperty("graft.s3.access_key_id")
        System.clearProperty("graft.s3.secret_access_key")
      }
    }
  }

  test("COPY TO s3:// PUTs with a body-true signed payload hash") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    withS3(Map.empty, auth = Some(("AKIDTEST", "test-secret-key"))) { f =>
      System.setProperty("graft.s3.access_key_id", "AKIDTEST")
      System.setProperty("graft.s3.secret_access_key", "test-secret-key")
      try {
        val e = LakeEngine(spark)
        // PUT-first: the wrong-region 301 on the upload itself must
        // reroute and re-sign, like GETs do
        e.copyTo(Seq((1L, "a"), (2L, "b")).toDF("id", "s"),
          "s3://bkt/exp/out.csv")
        assert(f.store.contains("exp/out.csv"))
        // server verified BOTH the signature and the actual body hash;
        // now the round trip (parse the uploaded CSV back)
        val back = e.createLakeTable("s3_up", "s3://bkt/exp/out.csv",
          format = Some("csv"))
        assert(back.count() == 2)
        // signed parquet upload round-trips bytes exactly
        e.copyTo(Seq((7L, "z")).toDF("id", "s"),
          "s3://bkt/exp/out.parquet")
        val pq = e.createLakeTable("s3_up_pq", "s3://bkt/exp/out.parquet")
        assert(pq.head.getLong(0) == 7L)
      } finally {
        System.clearProperty("graft.s3.access_key_id")
        System.clearProperty("graft.s3.secret_access_key")
      }
    }
  }

  test("multipart upload: ≥3 signed parts reassemble byte-identically") {
    // deterministic 100-byte payload; part size 32 → parts of
    // 32+32+32+4. Every part is SigV4-signed over its own body hash
    // and the fixture recomputes both server-side.
    val payload = Array.tabulate[Byte](100)(i => ((i * 7 + 3) % 251).toByte)
    withS3(Map.empty, auth = Some(("AKIDTEST", "test-secret-key"))) { f =>
      System.setProperty("graft.s3.access_key_id", "AKIDTEST")
      System.setProperty("graft.s3.secret_access_key", "test-secret-key")
      System.setProperty("graft.upload.part_size", "32")
      try {
        HttpSource.upload("s3://bkt/mp/big.bin", payload.length.toLong,
          () => new java.io.ByteArrayInputStream(payload))
        assert(f.initiated.get() == 1, "multipart never initiated")
        assert(f.partPuts.get() == 4,
          s"expected 4 part PUTs, saw ${f.partPuts.get()}")
        assert(f.store.get("mp/big.bin").map(_.toSeq)
          .contains(payload.toSeq),
          "reassembled object differs from the source bytes")
        assert(f.aborted.get() == 0)

        // at/below the threshold stays a SINGLE PUT — no initiate
        val small = payload.take(32)
        HttpSource.upload("s3://bkt/mp/small.bin", small.length.toLong,
          () => new java.io.ByteArrayInputStream(small))
        assert(f.initiated.get() == 1,
          "small object must not go through multipart")
        assert(f.store.get("mp/small.bin").map(_.toSeq)
          .contains(small.toSeq))

        // an exact multiple of the part size ships no empty part
        val exact = Array.tabulate[Byte](64)(_.toByte)
        HttpSource.upload("s3://bkt/mp/exact.bin", exact.length.toLong,
          () => new java.io.ByteArrayInputStream(exact))
        assert(f.partPuts.get() == 6,
          s"64 bytes at part 32 must be exactly 2 parts " +
            s"(total ${f.partPuts.get() - 4})")
        assert(f.store.get("mp/exact.bin").map(_.toSeq)
          .contains(exact.toSeq))
      } finally {
        System.clearProperty("graft.s3.access_key_id")
        System.clearProperty("graft.s3.secret_access_key")
        System.clearProperty("graft.upload.part_size")
      }
    }
  }

  test("gs:// routes through the S3 dialect with its own endpoint") {
    // the reference drives GCS as an S3-dialect store against
    // storage.googleapis.com (pgduck_server/src/duckdb/duckdb.c:398);
    // here the endpoint template points at the fixture's home region
    // path-style, anonymous
    val objs = Map("g/a.bin" -> Array[Byte](5),
      "g/b.parquet" -> Array[Byte](6), "g/c.parquet" -> Array[Byte](7))
    withS3(objs) { f =>
      val home = s"http://127.0.0.1:${f.server.getAddress.getPort}/eu-west-1"
      System.setProperty("graft.gs.endpoint", home)
      try {
        assert(S3Source.parse("gs://bkt/g/a.bin") ==
          Some(S3Source.S3Ref("bkt", "g/a.bin", "gs")))
        val p = HttpSource.stage("gs://bkt/g/a.bin")
        assert(Files.readAllBytes(java.nio.file.Paths.get(p)).toSeq ==
          Seq(5.toByte))
        // wildcard listing keeps the gs:// spelling
        assert(HttpSource.expand("gs://bkt/g/*.parquet") == Seq(
          "gs://bkt/g/b.parquet", "gs://bkt/g/c.parquet"))
      } finally System.clearProperty("graft.gs.endpoint")
    }
  }

  test("r2:// requires an account endpoint; signs with its own creds") {
    // no public default endpoint exists for R2 — a bare use must
    // refuse loudly with the property name
    val ex = intercept[IllegalArgumentException](
      S3Source.urlFor(S3Source.S3Ref("b", "k", "r2"), "auto"))
    assert(ex.getMessage.contains("graft.r2.endpoint"))

    val objs = Map("rr/a.bin" -> Array[Byte](9))
    withS3(objs, auth = Some(("R2KEYID", "r2-secret"))) { f =>
      val home = s"http://127.0.0.1:${f.server.getAddress.getPort}/eu-west-1"
      System.setProperty("graft.r2.endpoint", home)
      System.setProperty("graft.r2.access_key_id", "R2KEYID")
      System.setProperty("graft.r2.secret_access_key", "r2-secret")
      try {
        // server-side signature recomputation must accept the r2-cred
        // signed GET (region 'auto' rides the signed headers)
        val p = HttpSource.stage("r2://bkt/rr/a.bin")
        assert(Files.readAllBytes(java.nio.file.Paths.get(p)).toSeq ==
          Seq(9.toByte))
        // and a wrong r2 secret fails loudly
        System.setProperty("graft.r2.secret_access_key", "wrong")
        val e = intercept[java.io.IOException] {
          HttpSource.stage("r2://bkt/rr/missing-from-cache.bin")
        }
        assert(e.getMessage.contains("403"), e.getMessage)
      } finally {
        Seq("graft.r2.endpoint", "graft.r2.access_key_id",
          "graft.r2.secret_access_key").foreach(System.clearProperty)
      }
    }
  }

  test("stageAll links a wildcard's shards into one directory") {
    val objs = Map(
      "d/p0.bin" -> Array[Byte](10),
      "d/p1.bin" -> Array[Byte](11))
    withS3(objs) { _ =>
      val dir = HttpSource.stageAll("s3://bkt/d/p*.bin")
      val names = Files.list(java.nio.file.Paths.get(dir))
        .toArray.map(_.toString.split("/").last).sorted
      assert(names.length == 2, names.mkString(","))
    }
  }
}
