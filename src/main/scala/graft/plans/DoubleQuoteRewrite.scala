package graft.plans

/** PG double-quoted identifiers → Spark backticks (the reference's
  * SQL surface quotes identifiers routinely —
  * test_duckdb_reserved_keywords.py, and its deparser emits `"name"`
  * everywhere). In PG, `"..."` is ALWAYS an identifier (strings are
  * single-quoted), so the mapping is unconditional; `""` doubling
  * un-escapes to a literal quote, and any backtick inside the name
  * escapes as ``` `` ``` on the way out.
  *
  * Character-level single pass that respects single-quoted string
  * literals (backslash and `''` escapes — a `"` inside a string is
  * content), `--` and block comments, and already-backticked names.
  */
object DoubleQuoteRewrite {

  def rewrite(sql: String): String = {
    if (sql.indexOf('"') < 0) return sql
    val n = sql.length
    val sb = new StringBuilder(n + 8)
    var i = 0
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        while (i < n && sql.charAt(i) != '\n') { sb.append(sql.charAt(i)); i += 1 }
      } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
        val e = sql.indexOf("*/", i + 2)
        val end = if (e < 0) n else e + 2
        sb.append(sql.substring(i, end)); i = end
      } else if (c == '\'') {
        sb.append(c); i += 1
        var done = false
        while (i < n && !done) {
          val d = sql.charAt(i)
          if (d == '\\' && i + 1 < n) { sb.append(sql.substring(i, i + 2)); i += 2 }
          else if (d == '\'') {
            if (i + 1 < n && sql.charAt(i + 1) == '\'') {
              sb.append("''"); i += 2
            } else { sb.append(d); i += 1; done = true }
          } else { sb.append(d); i += 1 }
        }
      } else if (c == '`') {
        sb.append(c); i += 1
        while (i < n && sql.charAt(i) != '`') { sb.append(sql.charAt(i)); i += 1 }
        if (i < n) { sb.append('`'); i += 1 }
      } else if (c == '"') {
        i += 1
        val id = new StringBuilder
        var done = false
        while (i < n && !done) {
          if (sql.charAt(i) == '"') {
            if (i + 1 < n && sql.charAt(i + 1) == '"') { id.append('"'); i += 2 }
            else { done = true; i += 1 }
          } else { id.append(sql.charAt(i)); i += 1 }
        }
        sb.append('`').append(id.toString.replace("`", "``")).append('`')
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
