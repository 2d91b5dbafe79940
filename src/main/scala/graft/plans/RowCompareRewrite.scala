package graft.plans

import graft.plans.QuantifiedSubqueries.{tokenize, Tok}

/** PG/SQL-standard row-wise comparison — `ROW(a, b) op ROW(c, d)`
  * (reference test_select_expressions.py uses them in pushdown-shaped
  * selects; PG docs §9.24.5). Spark's struct comparison demands
  * identical field names AND types, so `row(a,b) > row(1,2.0)` fails
  * analysis; the standard instead DEFINES row comparison as the
  * lexicographic expansion, which is what this pass emits:
  *
  *   (a1,a2) <  (b1,b2)  ≡  a1 < b1 OR (a1 = b1 AND a2 < b2)
  *   (a1,a2) <= (b1,b2)  ≡  a1 < b1 OR (a1 = b1 AND a2 <= b2)
  *   (a1,a2) =  (b1,b2)  ≡  a1 = b1 AND a2 = b2
  *   (a1,a2) <> (b1,b2)  ≡  a1 <> b1 OR a2 <> b2
  *
  * (>, >= mirror; three-valued logic falls out of the expansion,
  * exactly the standard's definition.) Only fires when BOTH operands
  * are literal ROW(...) constructors around a comparison operator —
  * `row(...)` as a plain struct constructor stays for the `row`
  * function (CreateStruct). Arity mismatch refuses loudly like PG.
  */
object RowCompareRewrite {

  private val ops = Set("=", "<>", "!=", "<", "<=", ">", ">=")

  /** Token index just past the ROW(...) group starting at `i` (which
    * must be ROW), plus the top-level-comma arg spans as source text;
    * None when ts(i) is not a ROW constructor.
    */
  private def rowGroup(sql: String, ts: Vector[Tok], i: Int)
      : Option[(Int, Seq[String])] = {
    if (!(ts(i).kind == 'w' && ts(i).up == "ROW")) return None
    if (i + 1 >= ts.length || ts(i + 1).up != "(") return None
    var depth = 0
    var j = i + 1
    var argStart = -1
    val args = Seq.newBuilder[String]
    while (j < ts.length) {
      val t = ts(j)
      if (t.kind == 'o' && (t.up == "(" || t.up == "[")) {
        depth += 1
        if (depth == 1) argStart = t.end
      } else if (t.kind == 'o' && (t.up == ")" || t.up == "]")) {
        depth -= 1
        if (depth == 0) {
          args += sql.substring(argStart, t.start).trim
          return Some((j + 1, args.result()))
        }
      } else if (t.kind == 'o' && t.up == "," && depth == 1) {
        args += sql.substring(argStart, t.start).trim
        argStart = t.end
      }
      j += 1
    }
    None
  }

  private def expand(op: String, as: Seq[String], bs: Seq[String])
      : String = {
    require(as.size == bs.size,
      s"unequal number of entries in row expressions ($op)")
    op match {
      case "=" =>
        as.zip(bs).map { case (a, b) => s"($a) = ($b)" }.mkString(" AND ")
      case "<>" | "!=" =>
        as.zip(bs).map { case (a, b) => s"($a) <> ($b)" }.mkString(" OR ")
      case _ =>
        val strict = op.stripSuffix("=") match {
          case "" => "=" // unreachable: '=' handled above
          case s => s
        }
        def lex(i: Int): String = {
          val (a, b) = (as(i), bs(i))
          if (i == as.size - 1) s"($a) $op ($b)"
          else s"($a) $strict ($b) OR (($a) = ($b) AND (${lex(i + 1)}))"
        }
        lex(0)
    }
  }

  @annotation.tailrec
  def rewrite(sql: String): String = {
    val ts = tokenize(sql)
    var i = 0
    var out: Option[String] = None
    while (i < ts.length && out.isEmpty) {
      rowGroup(sql, ts, i) match {
        case Some((afterL, lhs)) if afterL < ts.length &&
            ts(afterL).kind == 'o' && ops.contains(ts(afterL).up) =>
          // two-char ops tokenize as one token; a trailing '>' after
          // '<' etc. cannot occur here
          val opTok = ts(afterL)
          val rhsIdx = afterL + 1
          if (rhsIdx < ts.length) {
            rowGroup(sql, ts, rhsIdx) match {
              case Some((afterR, rhs)) =>
                val repl = "(" + expand(opTok.up, lhs, rhs) + ")"
                out = Some(sql.substring(0, ts(i).start) + repl +
                  sql.substring(ts(afterR - 1).end))
              case None => ()
            }
          }
          i += 1
        case _ => i += 1
      }
    }
    out match {
      case Some(next) => rewrite(next)
      case None => sql
    }
  }
}
