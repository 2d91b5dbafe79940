package graft.lake

/** The reference's URL path encoder
  * (pg_lake_engine/src/utils/url_encode.c URLEncodePath, surfaced as
  * `lake_iceberg.url_encode_path` in test_iceberg_url_encode.py):
  * ONLY the URI-reserved set `" !~*'();/?:@&=+$,#"` escapes, as
  * lowercase `%hh`; everything else — including `.`, `-`, `_` and
  * non-ASCII bytes — passes through verbatim. Table/schema/catalog
  * names become object-store path segments through this, so the exact
  * byte-for-byte encoding is an interop contract (external readers
  * string-match the resulting locations).
  */
object UrlEncode {

  private val reserved = " !~*'();/?:@&=+$,#".toSet

  def path(input: String): String = {
    val sb = new StringBuilder(input.length)
    // the reserved set is pure ASCII, so char-wise scanning matches
    // the C byte-wise loop exactly: non-ASCII input passes through
    // unmodified in both
    input.foreach { c =>
      if (reserved.contains(c)) sb.append(f"%%${c.toInt}%02x")
      else sb.append(c)
    }
    sb.toString
  }
}
