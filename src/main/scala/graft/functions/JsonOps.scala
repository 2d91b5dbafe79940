package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PG json operator semantics (`->`, `->>`, `#>`, `#>>` — the
  * reference's jsonb suite uses them directly,
  * pg_lake_table/tests/pytests/test_jsonb_pushdown.py, and its
  * pushdown maps them onto the engine's json_extract family). The
  * engine's JSON convention is textual (SURVEY §1.2: PG json/jsonb →
  * string), so these operate on strings and return strings:
  *
  *  - arrow (`->`): the selected element AS JSON — string values keep
  *    their quotes, containers stay JSON, missing key/index or a
  *    non-container input yields NULL (PG jsonb semantics);
  *  - arrow-text (`->>`): the selected element as text — strings
  *    unquote, JSON null becomes SQL NULL;
  *  - path (`#>` / `#>>`): a `{a,b,0}` path array navigated stepwise,
  *    integer-looking steps index arrays (negative = from the end,
  *    PG jsonb rule), any mismatch yields NULL.
  *
  * Malformed JSON input yields NULL rather than an error: PG validates
  * at the cast boundary, but this engine's json columns are plain
  * strings, so the dirty-collection posture (same as
  * `get_json_object`) applies.
  */
object JsonOps {
  private val mapper = new ObjectMapper()

  private[functions] def parse(s: String): JsonNode =
    try mapper.readTree(s) catch { case _: Exception => null }

  /** One navigation step; null on any mismatch. */
  private[functions] def step(node: JsonNode, key: String): JsonNode = {
    if (node == null) return null
    if (node.isArray) {
      val idx =
        try key.trim.toInt
        catch { case _: NumberFormatException => return null }
      val i = if (idx < 0) node.size + idx else idx
      if (i < 0 || i >= node.size) null else node.get(i)
    } else if (node.isObject) node.get(key)
    else null
  }

  private[functions] def render(node: JsonNode, asText: Boolean): UTF8String = {
    if (node == null) return null
    if (asText) {
      if (node.isNull) null
      else if (node.isTextual) UTF8String.fromString(node.textValue)
      else UTF8String.fromString(mapper.writeValueAsString(node))
    } else UTF8String.fromString(mapper.writeValueAsString(node))
  }
}

/** `json -> key` / `json ->> key`: integer-typed keys index arrays,
  * string keys select object fields (PG's operator overloads). A MAP
  * left operand dispatches to map lookup instead (the pg_map
  * extension's `map_col -> 'key'` operator, test_map_extract.py —
  * SURVEY §1.2 stores pg_map values as native MapType), returning the
  * map's value type.
  */
case class JsonArrow(left: Expression, right: Expression, asText: Boolean)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = left.dataType match {
    case MapType(_, vt, _) => vt
    case _ => StringType
  }
  override def nullable: Boolean = true
  override def prettyName: String = if (asText) "pg_json_field_text" else "pg_json_field"

  override def nullSafeEval(j: Any, k: Any): Any = left.dataType match {
    case MapType(kt, vt, _) =>
      val m = j.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
      val keys = m.keyArray()
      val key = kt match {
        // a literal key may arrive under a different-but-castable
        // type spelling; normalize to the MAP's key type so a probe
        // whose Spark type differs only in width (Integer literal vs
        // bigint key) still matches instead of boxed-== returning
        // false on every entry
        case StringType => org.apache.spark.unsafe.types.UTF8String
          .fromString(k.toString)
        case ByteType => k match { case n: Number => n.byteValue; case _ => k }
        case ShortType => k match { case n: Number => n.shortValue; case _ => k }
        case IntegerType => k match { case n: Number => n.intValue; case _ => k }
        case LongType => k match { case n: Number => n.longValue; case _ => k }
        case FloatType => k match { case n: Number => n.floatValue; case _ => k }
        case DoubleType => k match { case n: Number => n.doubleValue; case _ => k }
        case dt: DecimalType =>
          // a probe whose scale cannot be represented exactly can never
          // equal a map key — leave it unnormalized (lookup misses)
          try k match {
            case n: org.apache.spark.sql.types.Decimal =>
              org.apache.spark.sql.types.Decimal(
                n.toBigDecimal.setScale(dt.scale), dt.precision, dt.scale)
            case n: Number => org.apache.spark.sql.types.Decimal(
              BigDecimal(n.toString).setScale(dt.scale),
              dt.precision, dt.scale)
            case _ => k
          } catch { case _: ArithmeticException => k }
        case _ => k
      }
      var i = 0
      var out: Any = null
      while (i < m.numElements() && out == null) {
        if (keys.get(i, kt) == key) out = m.valueArray().get(i, vt)
        i += 1
      }
      out
    case _ =>
      val root = JsonOps.parse(j.toString)
      if (root == null) return null
      val node = right.dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          if (!root.isArray) null
          else {
            val idx = k.asInstanceOf[Number].intValue
            val i = if (idx < 0) root.size + idx else idx
            if (i < 0 || i >= root.size) null else root.get(i)
          }
        case _ => if (root.isObject) root.get(k.toString) else null
      }
      JsonOps.render(node, asText)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JsonArrow =
    copy(left = newLeft, right = newRight)
}

/** `json #> '{a,b,0}'` / `#>>`: stepwise path navigation. The path is
  * PG's text-array literal form or a comma list; braces optional.
  */
case class JsonPathExtract(left: Expression, right: Expression,
    asText: Boolean) extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = if (asText) "pg_json_path_text" else "pg_json_path"

  override def nullSafeEval(j: Any, p: Any): Any = {
    var node = JsonOps.parse(j.toString)
    if (node == null) return null
    val raw = p.toString.trim.stripPrefix("{").stripSuffix("}")
    val steps =
      if (raw.isEmpty) Array.empty[String]
      else raw.split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
    var i = 0
    while (i < steps.length && node != null) {
      node = JsonOps.step(node, steps(i))
      i += 1
    }
    JsonOps.render(node, asText)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JsonPathExtract =
    copy(left = newLeft, right = newRight)
}

/** PG `encode(bytea, 'escape')` / `decode(text, 'escape')` — the one
  * encode format with no Spark builtin (hex/base64 compose from
  * existing expressions in PgFunctions). Escape format: printable
  * ASCII passes through, backslash doubles, everything else is a
  * 3-digit octal `\nnn` (PostgreSQL datatype-binary docs).
  */
case class PgEscapeEncode(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "pg_escape_encode"

  override def nullSafeEval(b: Any): Any = {
    val bytes = b.asInstanceOf[Array[Byte]]
    val sb = new java.lang.StringBuilder(bytes.length + 8)
    var i = 0
    while (i < bytes.length) {
      val u = bytes(i) & 0xff
      if (u == '\\') sb.append("\\\\")
      else if (u < 0x20 || u > 0x7e)
        sb.append('\\').append(f"${u.toOctalString.toInt}%03d")
      else sb.append(u.toChar)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(c: Expression): PgEscapeEncode =
    copy(child = c)
}

case class PgEscapeDecode(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "pg_escape_decode"

  override def nullSafeEval(s: Any): Any = {
    val str = s.toString
    val out = new java.io.ByteArrayOutputStream(str.length)
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (c == '\\') {
        if (i + 1 < str.length && str.charAt(i + 1) == '\\') {
          out.write('\\'); i += 2
        } else if (i + 3 < str.length &&
          str.charAt(i + 1).isDigit && str.charAt(i + 2).isDigit &&
          str.charAt(i + 3).isDigit) {
          out.write(Integer.parseInt(str.substring(i + 1, i + 4), 8))
          i += 4
        } else throw new IllegalArgumentException(
          s"invalid input syntax for type bytea: $str")
      } else { out.write(c.toInt); i += 1 }
    }
    out.toByteArray
  }

  override protected def withNewChildInternal(c: Expression): PgEscapeDecode =
    copy(child = c)
}
