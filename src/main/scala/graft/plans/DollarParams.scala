package graft.plans

/** PG positional parameters (`$1`, `$2`, …) for the PREPARE/EXECUTE
  * surface (reference test_prepared.py; the reference binds them over
  * the wire protocol — here EXECUTE's argument expressions are spliced
  * token-wise, which is PG-equivalent for literal arguments: PG
  * evaluates EXECUTE's arguments before binding).
  *
  * Substitution is tokenizer-driven: a `$N` inside a string literal or
  * quoted identifier is content, not a parameter; the same parameter
  * may appear any number of times; parameters the statement never
  * references are allowed (PG allows unused parameters too).
  */
object DollarParams {

  /** Highest `$N` referenced (0 when none). */
  def maxParam(sql: String): Int =
    refs(sql).map(_._3).foldLeft(0)(math.max)

  /** Splice `args` (SQL expression texts) into the `$N` slots,
    * parenthesized to preserve precedence.
    */
  def bind(sql: String, args: Seq[String]): String = {
    val rs = refs(sql)
    val need = rs.map(_._3).foldLeft(0)(math.max)
    require(args.length >= need,
      s"prepared statement wants $need parameter(s), got ${args.length}")
    // splice right-to-left so earlier offsets stay valid
    rs.sortBy(-_._1).foldLeft(sql) { case (acc, (start, end, n)) =>
      acc.substring(0, start) + s"(${args(n - 1).trim})" +
        acc.substring(end)
    }
  }

  /** (start, end, n) of each `$N` reference, tokenizer-aware. */
  private def refs(sql: String): Seq[(Int, Int, Int)] = {
    val ts = QuantifiedSubqueries.tokenize(sql)
    val out = Seq.newBuilder[(Int, Int, Int)]
    var i = 0
    while (i + 1 < ts.length) {
      val a = ts(i); val b = ts(i + 1)
      if (a.kind == 'o' && a.up == "$" && b.kind == 'n' &&
        a.end == b.start && sql.substring(b.start, b.end).forall(_.isDigit))
        out += ((a.start, b.end, sql.substring(b.start, b.end).toInt))
      i += 1
    }
    out.result()
  }
}
