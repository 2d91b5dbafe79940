package graft.sources

import java.net.URI
import java.security.MessageDigest
import java.time.ZoneOffset
import java.time.format.DateTimeFormatter

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** AWS Signature Version 4 request signing — the credentialed half of
  * the reference's S3 access (its server signs requests with secrets
  * configured per docs/building-from-source.md:788-791; the engine's
  * httpfs layer implements the same public SigV4 scheme). Pure
  * deterministic arithmetic over the public algorithm: canonical
  * request → string-to-sign → HMAC-SHA256 chain → Authorization
  * header. No SDK, no network — S3SourceSpec verifies it two ways:
  * against AWS's published worked example (the `iam.amazonaws.com`
  * ListUsers vector) and against a fixture server that recomputes the
  * signature from the same secret and rejects mismatches (the MinIO
  * pattern, egress-free).
  *
  * Only headers are produced here; the HTTP layer attaches them. The
  * `Host` header is signed but not emitted (HttpURLConnection sets it
  * from the URL — signing must use the exact value the wire carries,
  * including a non-default port).
  */
object SigV4 {

  final case class Credentials(accessKeyId: String, secretKey: String,
      sessionToken: Option[String] = None)

  /** Credentials from `graft.s3.*` system properties, falling back to
    * the standard AWS environment names. None ⇒ anonymous requests
    * (public buckets), the pre-credential behavior.
    */
  def credentials: Option[Credentials] = {
    def get(p: String, e: String): Option[String] =
      sys.props.get(p).orElse(sys.env.get(e)).filter(_.nonEmpty)
    for {
      id <- get("graft.s3.access_key_id", "AWS_ACCESS_KEY_ID")
      sec <- get("graft.s3.secret_access_key", "AWS_SECRET_ACCESS_KEY")
    } yield Credentials(id, sec,
      get("graft.s3.session_token", "AWS_SESSION_TOKEN"))
  }

  /** SHA-256 of the empty body — GETs sign this rather than
    * UNSIGNED-PAYLOAD so the fixture can verify the exact value.
    */
  val EmptyPayloadHash: String =
    "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"

  private val AmzDateFmt =
    DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'")
      .withZone(ZoneOffset.UTC)

  def amzDateNow(): String = AmzDateFmt.format(java.time.Instant.now())

  def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  def sha256Hex(s: String): String =
    hex(MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8")))

  def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes("UTF-8"))
  }

  /** Canonical query string: raw (already percent-encoded) pairs
    * sorted by name then value. The callers encode query values with
    * the same RFC 3986 rules AWS canonicalization specifies (uppercase
    * hex, space as %20 — NOT form encoding), so the raw pairs are
    * already in canonical encoding and only need ordering.
    */
  def canonicalQuery(rawQuery: String): String =
    if (rawQuery == null || rawQuery.isEmpty) ""
    else rawQuery.split("&").filter(_.nonEmpty).toSeq.map { p =>
      val i = p.indexOf('=')
      if (i < 0) (p, "") else (p.take(i), p.drop(i + 1))
    }.sorted.map { case (k, v) => s"$k=$v" }.mkString("&")

  /** Canonical request text + the `;`-joined signed-header list.
    * `headers` are the to-be-signed headers with their wire values;
    * S3-style signing uses the raw path as sent (single-encoded, not
    * re-normalized).
    */
  def canonicalRequest(method: String, rawPath: String, rawQuery: String,
      headers: Seq[(String, String)], payloadHash: String)
      : (String, String) = {
    val hs = headers.map { case (k, v) => (k.toLowerCase, v.trim) }
      .sortBy(_._1)
    val signedNames = hs.map(_._1).mkString(";")
    val cr = Seq(
      method,
      if (rawPath == null || rawPath.isEmpty) "/" else rawPath,
      canonicalQuery(rawQuery),
      hs.map { case (k, v) => s"$k:$v\n" }.mkString,
      signedNames,
      payloadHash).mkString("\n")
    (cr, signedNames)
  }

  /** The HMAC key derivation chain (public spec: date → region →
    * service → "aws4_request").
    */
  def signingKey(secret: String, dateStamp: String, region: String,
      service: String): Array[Byte] =
    hmac(hmac(hmac(hmac(("AWS4" + secret).getBytes("UTF-8"), dateStamp),
      region), service), "aws4_request")

  def stringToSign(amzDate: String, scope: String,
      canonicalReq: String): String =
    Seq("AWS4-HMAC-SHA256", amzDate, scope, sha256Hex(canonicalReq))
      .mkString("\n")

  /** Headers to attach to a request for `url`: `x-amz-date`,
    * `x-amz-content-sha256`, optional `x-amz-security-token`, and the
    * `Authorization` header carrying the SigV4 signature. `Host` is
    * signed from the URL (with port when non-default) but not
    * returned — the HTTP client emits it itself and MUST match.
    */
  def signHeaders(method: String, url: String, region: String,
      service: String, creds: Credentials,
      amzDate: String = amzDateNow(),
      extraSignedHeaders: Map[String, String] = Map.empty,
      payloadHash: String = EmptyPayloadHash): Map[String, String] = {
    val u = new URI(url)
    val defaultPort =
      if (u.getScheme == "https") 443 else 80
    val host = u.getHost +
      (if (u.getPort > 0 && u.getPort != defaultPort) s":${u.getPort}"
       else "")
    val dateStamp = amzDate.take(8)
    val signed: Map[String, String] = Map(
      "host" -> host,
      "x-amz-date" -> amzDate,
      "x-amz-content-sha256" -> payloadHash) ++
      creds.sessionToken.map("x-amz-security-token" -> _) ++
      extraSignedHeaders.map { case (k, v) => k.toLowerCase -> v }
    val (cr, signedNames) = canonicalRequest(
      method, u.getRawPath, u.getRawQuery, signed.toSeq, payloadHash)
    val scope = s"$dateStamp/$region/$service/aws4_request"
    val sig = hex(hmac(
      signingKey(creds.secretKey, dateStamp, region, service),
      stringToSign(amzDate, scope, cr)))
    (signed - "host") + ("Authorization" ->
      (s"AWS4-HMAC-SHA256 Credential=${creds.accessKeyId}/$scope, " +
        s"SignedHeaders=$signedNames, Signature=$sig"))
  }
}
