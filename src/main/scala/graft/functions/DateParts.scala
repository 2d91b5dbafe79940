package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** PG `extract`/`date_part`/`date_trunc` field completion (reference
  * test_time_functions.py pushes the FULL field set down —
  * century/decade/millennium/isodow/isoyear/epoch/microseconds/
  * milliseconds — and `rewrite_query.c:1262` RewriteFuncExprDateTrunc
  * documents the century/millennium origin fix-up: PG starts both at
  * year xx01, the engine's native trunc at xx00, so the reference adds
  * one year; we compute the PG origin directly).
  *
  * Fields Spark already evaluates with PG semantics delegate to the
  * builtin (whole-stage codegen preserved); only the PG-specific
  * fields are composed here, from existing year/weekday/unix-micros
  * expressions so they stay codegen-friendly too.
  */
object DateParts {

  private def builtin(name: String, args: Seq[Expression]): Expression =
    FunctionRegistry.builtin.lookupFunction(FunctionIdentifier(name), args)

  private def fieldOf(e: Expression): Option[String] = e match {
    case Literal(s, StringType) if s != null => Some(s.toString.toLowerCase)
    case _ => None
  }

  private def year(x: Expression): Expression =
    Year(Cast(x, DateType))

  /** PG century/millennium: no year 0 — year 1..100 is century 1,
    * -1..-100 is century -1. `(|y| + span-1) div span`, sign restored.
    */
  private def eraDiv(y: Expression, span: Int): Expression = {
    val pos = IntegralDivide(
      Add(Cast(y, LongType), Literal((span - 1).toLong)),
      Literal(span.toLong))
    val neg = UnaryMinus(IntegralDivide(
      Add(UnaryMinus(Cast(y, LongType)), Literal((span - 1).toLong)),
      Literal(span.toLong)))
    If(GreaterThan(y, Literal(0)), pos, neg)
  }

  private def microsOfMinute(x: Expression): Expression =
    Pmod(UnixMicros(Cast(x, TimestampType)), Literal(60000000L))

  /** extract/date_part dispatcher. Non-literal or Spark-native fields
    * fall through to the builtin implementation.
    */
  def part(fieldE: Expression, x: Expression): Expression =
    fieldOf(fieldE) match {
      case Some("century") | Some("centuries") => eraDiv(year(x), 100)
      case Some("millennium") | Some("millenniums") | Some("millennia") =>
        eraDiv(year(x), 1000)
      case Some("decade") | Some("decades") =>
        // PG: year/10, C truncation toward zero
        IntegralDivide(Cast(year(x), LongType), Literal(10L))
      case Some("isodow") => // ISO 1=Monday..7=Sunday; WeekDay is 0=Monday
        Add(WeekDay(Cast(x, DateType)), Literal(1))
      case Some("isoyear") => builtin("extract",
        Seq(Literal("YEAROFWEEK"), x))
      case Some("epoch") =>
        Divide(Cast(PgEpochMicros(x), DoubleType), Literal(1e6))
      case Some("microseconds") | Some("microsecond") =>
        microsOfMinute(x)
      case Some("milliseconds") | Some("millisecond") =>
        Divide(Cast(microsOfMinute(x), DoubleType), Literal(1e3))
      case Some(tz @ ("timezone" | "timezone_hour" | "timezone_minute")) =>
        PgTimezonePart(Cast(x, TimestampType), tz)
      case Some("julian") => throw new IllegalArgumentException(
        "extract: field 'julian' is not supported")
      case _ => builtin("extract", Seq(fieldE, x))
    }

  /** date_trunc dispatcher: the three PG-origin fields composed from
    * year arithmetic (floor via non-negative mod, so BC years stay on
    * the PG grid); everything else delegates.
    */
  def trunc(fieldE: Expression, x: Expression): Expression =
    fieldOf(fieldE) match {
      case Some(f @ ("century" | "centuries" | "millennium" |
          "millenniums" | "millennia" | "decade" | "decades")) =>
        val y = year(x)
        val startYear = f.stripSuffix("s") match {
          case "centurie" | "century" => // centuries run xx01..(xx+1)00
            Subtract(y, Pmod(Subtract(y, Literal(1)), Literal(100)))
          case "millennium" | "millennia" =>
            Subtract(y, Pmod(Subtract(y, Literal(1)), Literal(1000)))
          case _ => // decades run xxx0..xxx9
            Subtract(y, Pmod(y, Literal(10)))
        }
        val day = MakeDate(startYear, Literal(1), Literal(1))
        // PG: timestamp in, timestamp out (tstz stays tstz); date
        // input yields timestamp-without-tz
        val outType = x.dataType match {
          case TimestampType => TimestampType
          case _ => TimestampNTZType
        }
        Cast(day, outType)
      case _ => builtin("date_trunc", Seq(fieldE, x))
    }
}

/** PG `extract(epoch from x)` micros: timestamptz counts the true
  * instant; timestamp-WITHOUT-tz is defined "without regard to
  * timezone" (naive value treated as UTC — which is exactly Spark's
  * NTZ internal representation, so NO session-zone cast may touch it);
  * a date is its UTC midnight. A session-zone `Cast(ntz → ltz)` here
  * would shift the answer for every non-UTC session zone.
  */
case class PgEpochMicros(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "pg_epoch_micros"

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case DateType => v.asInstanceOf[Int].toLong * 86400000000L
    case TimestampType | TimestampNTZType => v.asInstanceOf[Long]
    case StringType =>
      // PG coerces text through timestamp-without-tz: naive = UTC
      org.apache.spark.sql.catalyst.util.DateTimeUtils
        .stringToTimestampWithoutTimeZone(
          v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
        .map(Long.box).orNull
    case other => throw new IllegalArgumentException(
      s"extract(epoch …): unsupported input type $other")
  }

  override protected def withNewChildInternal(c: Expression): PgEpochMicros =
    copy(child = c)
}

/** Session-timezone UTC offset of an instant, in seconds/hours/minutes
  * (PG `extract(timezone[_hour|_minute] from timestamptz)`). Positive
  * east of UTC, like PG.
  */
case class PgTimezonePart(child: Expression, unit: String,
    timeZoneId: Option[String] = None)
    extends UnaryExpression with TimeZoneAwareExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "pg_" + unit
  override def withTimeZone(tz: String): PgTimezonePart =
    copy(timeZoneId = Some(tz))

  override def nullSafeEval(v: Any): Any = {
    val micros = v.asInstanceOf[Long]
    val off = zoneId.getRules
      .getOffset(java.time.Instant.ofEpochSecond(
        Math.floorDiv(micros, 1000000L)))
      .getTotalSeconds
    unit match {
      case "timezone" => off
      case "timezone_hour" => off / 3600
      case "timezone_minute" => (off % 3600) / 60
    }
  }

  override protected def withNewChildInternal(c: Expression): PgTimezonePart =
    copy(child = c)
}
