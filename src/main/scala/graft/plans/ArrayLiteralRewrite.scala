package graft.plans

import scala.annotation.tailrec

import graft.plans.QuantifiedSubqueries.tokenize

/** PG's `ARRAY[a, b, …]` constructor syntax → Spark's `array(a, b, …)`.
  * The reference's compat suite uses it directly
  * (`test_postgres_compat_sql.py`: `unnest(ARRAY[1, 2])`,
  * `= any(array[1,2,3])`, `SELECT ARRAY[id] …`), and the deparser
  * ships ArrayExpr through to the engine. Token-level (strings,
  * comments, quoted identifiers respected); nested constructors
  * rewrite through recursion; `ARRAY<INT>` type syntax (no bracket)
  * and identifiers merely containing "array" never match.
  */
object ArrayLiteralRewrite {

  private def rewriteOnce(sql: String): Option[String] = {
    val ts = tokenize(sql)
    var i = 0
    while (i < ts.length - 1) {
      if (ts(i).kind == 'w' && ts(i).up == "ARRAY" &&
        ts(i + 1).kind == 'o' && ts(i + 1).up == "[") {
        // matching ']' by bracket depth
        var depth = 0
        var j = i + 1
        var close = -1
        while (j < ts.length && close < 0) {
          val t = ts(j)
          if (t.kind == 'o' && t.up == "[") depth += 1
          else if (t.kind == 'o' && t.up == "]") {
            depth -= 1
            if (depth == 0) close = j
          }
          j += 1
        }
        if (close > 0) {
          val inner = sql.substring(ts(i + 1).end, ts(close).start)
          return Some(sql.substring(0, ts(i).start) + "array(" + inner +
            ")" + sql.substring(ts(close).end))
        }
      }
      i += 1
    }
    None
  }

  @tailrec
  def rewrite(sql: String): String =
    if (!sql.toUpperCase.contains("ARRAY")) sql
    else rewriteOnce(sql) match {
      case Some(s2) => rewrite(s2)
      case None => sql
    }
}
