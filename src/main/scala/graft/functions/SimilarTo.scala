package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL-standard `SIMILAR TO` pattern language → Java regex. The
  * reference accepts SIMILAR TO through PG
  * (`pg_lake_table/tests/pytests/test_postgres_compat_sql.py:63`),
  * where PG itself rewrites `a SIMILAR TO b` into a regex match via
  * `similar_to_escape(b)` — this is the same translation targeting
  * Java's engine:
  *
  *  - `%` → `.*`, `_` → `.` (the LIKE wildcards);
  *  - `| * + ? ( ) { } [ ]` keep their regex meaning (the SQL
  *    standard's SIMILAR TO feature set);
  *  - `.` `^` `$` are LITERAL in SIMILAR TO (unlike POSIX) and are
  *    escaped;
  *  - the escape character (default backslash, PG's default) makes
  *    the next character literal — emitted as `\x{H}` which is safe
  *    both inside and outside character classes;
  *  - the whole pattern is anchored (`\A(?: )\z`): SIMILAR TO matches
  *    the ENTIRE string, while Spark's RLIKE substring-matches — and
  *    runs in DOTALL mode (`(?s)`): PG's `%`/`.` cross newlines.
  */
object SimilarTo {

  def toRegex(pattern: String, escape: Char = '\\'): String = {
    val sb = new StringBuilder("(?s)\\A(?:")
    var inClass = false
    var i = 0
    def hex(c: Char): Unit = { sb.append(f"\\x{${c.toInt}%X}"); () }
    while (i < pattern.length) {
      val c = pattern.charAt(i)
      if (c == escape) {
        if (i + 1 >= pattern.length)
          throw new IllegalArgumentException(
            s"SIMILAR TO pattern ends with escape character: $pattern")
        hex(pattern.charAt(i + 1))
        i += 2
      } else if (inClass) {
        if (c == ']') inClass = false
        sb.append(c)
        i += 1
      } else {
        c match {
          case '%' => sb.append(".*")
          case '_' => sb.append('.')
          case '[' => inClass = true; sb.append('[')
          case '.' | '^' | '$' => sb.append('\\').append(c)
          case '|' | '*' | '+' | '?' | '(' | ')' | '{' | '}' | ']' =>
            sb.append(c)
          case other =>
            if (Character.isLetterOrDigit(other) || other == ' ')
              sb.append(other)
            else hex(other) // any other punctuation: literal, safely
        }
        i += 1
      }
    }
    sb.append(")\\z").toString
  }
}

/** Per-row pattern translation for NON-literal SIMILAR TO patterns
  * (literal patterns fold to a constant regex at plan time in
  * PgFunctions and stay on the codegen'd RLike fast path).
  */
case class SimilarToRegex(child: Expression, escape: Char)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override protected def withNewChildInternal(c: Expression): SimilarToRegex =
    copy(child = c)
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(
      SimilarTo.toRegex(v.asInstanceOf[UTF8String].toString, escape))
  override def prettyName: String = "similar_to_regex"
}
