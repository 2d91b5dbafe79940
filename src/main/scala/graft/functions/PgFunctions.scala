package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** PostgreSQL-flavored function layer (SURVEY.md §2.7, M3).
  *
  * The reference ships PG-semantics shims into its execution engine as
  * rewrite rules + SQL trampolines (pg_lake_engine/src/pgduck/
  * rewrite_query.c:148-198, duckdb_pglake extension shims). Our
  * equivalent: register the functions PG has and Spark lacks as
  * compositions of existing Catalyst expressions — they inherit
  * whole-stage codegen, null handling, and constant folding for free;
  * no UDF boundary anywhere.
  *
  * Everything else on the §2.7 contract (div, cot, split_part,
  * width_bucket, string_agg, percentile_cont/disc, btrim, initcap, …)
  * already exists in Spark 4 with matching semantics.
  */
object PgFunctions {

  private def d(e: Expression): Expression = Cast(e, DoubleType)

  /** PG `to_char` timestamp patterns → Java DateTimeFormatter patterns
    * (the translation the reference implements in
    * pg_lake_engine/src/pgduck/to_char.c:1-1378, re-derived for Java
    * patterns rather than strftime). Longest match first; `"…"` spans
    * are literals.
    */
  private val toCharTable: Seq[(String, String)] = Seq(
    "HH24" -> "HH", "HH12" -> "hh", "HH" -> "hh",
    "MI" -> "mm",
    "SS" -> "ss", "MS" -> "SSS", "US" -> "SSSSSS",
    "YYYY" -> "yyyy", "YYY" -> "yyy", "YY" -> "yy", "Y" -> "y",
    "MONTH" -> "MMMM", "Month" -> "MMMM", "month" -> "MMMM",
    "MON" -> "MMM", "Mon" -> "MMM", "mon" -> "MMM",
    "MM" -> "MM",
    "DAY" -> "EEEE", "Day" -> "EEEE", "day" -> "EEEE",
    "DY" -> "EEE", "Dy" -> "EEE", "dy" -> "EEE",
    "DDD" -> "DDD", "DD" -> "dd",
    "Q" -> "Q",
    "AM" -> "a", "PM" -> "a", "A.M." -> "a", "P.M." -> "a",
    "am" -> "a", "pm" -> "a",
    "TZ" -> "zz", "OF" -> "x")

  /** PG specifiers with NO working Java-pattern spelling (Spark ≥3
    * rejects the week letters `w`/`W` outright, Java's `e`/`F` are
    * locale-/convention-divergent from PG's definitions): these render
    * as COMPUTED expressions spliced between the pattern spans —
    * ISO-8601 fields (IYYY = year of the week's Thursday, IW =
    * zero-padded ISO week, ID = Monday-1 dow), PG's day-of-year-based
    * weeks (WW = (ddd−1)/7+1 zero-padded, W = (dd−1)/7+1), and D
    * (Sunday-1 dow).
    */
  private val toCharComputed: Seq[String] =
    Seq("IYYY", "IW", "ID", "WW", "W", "D")

  /** PG specifiers that exist but have no faithful Java-pattern
    * translation. The reference refuses these instead of formatting
    * wrong output (IsConvertibleToChar gate, to_char.c:262 /
    * "cannot handle specifier" :813) — so do we.
    */
  private val toCharUnsupported: Seq[String] = Seq(
    "SSSS", "SSSSS", // seconds past midnight
    "SCC", "CC", // century
    "IYY", "IY", // partial ISO years (IYYY/IW/ID are supported)
    "J", // Julian day
    "RM", "rm", // Roman-numeral month
    "TH", "th", // ordinal suffixes
    "TZM", "TZH", // tz minute/hour components
    "B.C.", "A.D.", "b.c.", "a.d.", "BC", "AD", "bc", "ad",
    "TM", "FX") // translation mode / fixed format modifiers

  private[graft] sealed trait ToCharSeg
  private[graft] final case class PatSeg(pattern: String) extends ToCharSeg
  private[graft] final case class FieldSeg(name: String) extends ToCharSeg

  /** Walk a PG format string into Java-pattern spans interleaved with
    * computed-field markers. Longest match wins at every position
    * across BOTH sets (IYYY beats IY beats nothing; DD beats D; IW
    * beats nothing; WW beats W).
    */
  private[graft] def toCharSegments(pgFmt: String): Seq[ToCharSeg] = {
    val segs = Seq.newBuilder[ToCharSeg]
    val sb = new StringBuilder
    def flush(): Unit =
      if (sb.nonEmpty) { segs += PatSeg(sb.toString); sb.clear() }
    var i = 0
    while (i < pgFmt.length) {
      val c = pgFmt.charAt(i)
      if (c == '"') { // quoted literal span
        val end = pgFmt.indexOf('"', i + 1)
        val lit = if (end < 0) pgFmt.substring(i + 1)
          else pgFmt.substring(i + 1, end)
        if (lit.nonEmpty) sb.append('\'').append(lit.replace("'", "''")).append('\'')
        i = if (end < 0) pgFmt.length else end + 1
      } else if (pgFmt.startsWith("FM", i)) {
        i += 2 // fill-mode modifier: Java patterns don't pad text anyway
      } else {
        // convertibility gate: a KNOWN-but-untranslatable specifier must
        // error loudly, unless a longer supported match wins at this
        // position (e.g. IYYY beats IY)
        val supported: Option[(String, Option[String])] =
          (toCharTable.collect {
            case (pg, j) if pgFmt.startsWith(pg, i) => (pg, Some(j))
          } ++ toCharComputed.collect {
            case pg if pgFmt.startsWith(pg, i) =>
              (pg, None: Option[String])
          }).sortBy(-_._1.length).headOption
        val blocked = toCharUnsupported.filter(pgFmt.startsWith(_, i))
          .sortBy(-_.length).headOption
        (supported, blocked) match {
          case (s, Some(b)) if s.forall(_._1.length < b.length) =>
            throw new IllegalArgumentException(
              s"to_char: pattern '$b' is not supported (position $i of " +
                s"'$pgFmt')")
          case (Some((pg, Some(java))), _) => sb.append(java); i += pg.length
          case (Some((pg, None)), _) =>
            flush(); segs += FieldSeg(pg); i += pg.length
          case (None, None) =>
            // non-pattern chars pass through; quote letters so Java
            // doesn't interpret them
            if (c.isLetter) sb.append('\'').append(c).append('\'')
            else sb.append(c)
            i += 1
        }
      }
    }
    flush()
    segs.result()
  }

  /** `to_char(ts, fmt)` as one expression: DateFormatClass over the
    * pattern spans, computed date arithmetic for the fields Java
    * patterns can't render faithfully, concatenated in order.
    */
  private def toCharExpr(ts0: Expression, fmt: String): Expression = {
    val ts = Cast(ts0, TimestampType)
    val d = Cast(ts, DateType)
    // Monday-1 ISO day of week (Spark WeekDay is Monday-0)
    def isoDow = Add(WeekDay(d), Literal(1))
    val parts: Seq[Expression] = toCharSegments(fmt).map {
      case PatSeg(p) => DateFormatClass(ts, Literal(p))
      case FieldSeg("IW") => StringLPad(
        Cast(WeekOfYear(d), StringType), Literal(2), Literal("0"))
      case FieldSeg("ID") => Cast(isoDow, StringType)
      case FieldSeg("IYYY") =>
        // ISO year = calendar year of this week's THURSDAY
        Cast(Year(DateAdd(d, Subtract(Literal(4), isoDow))), StringType)
      case FieldSeg("WW") => StringLPad(
        Cast(Add(Divide2(Subtract(DayOfYear(d), Literal(1)), Literal(7)),
          Literal(1)), StringType), Literal(2), Literal("0"))
      case FieldSeg("W") =>
        Cast(Add(Divide2(Subtract(DayOfMonth(d), Literal(1)), Literal(7)),
          Literal(1)), StringType)
      case FieldSeg("D") =>
        Cast(DayOfWeek(d), StringType) // PG D: Sunday = 1
      case FieldSeg(other) => throw new IllegalStateException(
        s"unhandled computed to_char field $other")
    }
    parts match {
      case Seq() => Literal("")
      case Seq(one) => one
      case many => Concat(many)
    }
  }

  /** Integer division as an expression (Divide is fractional). */
  private def Divide2(a: Expression, b: Expression): Expression =
    IntegralDivide(Cast(a, LongType), Cast(b, LongType))

  /** Sessions already registered — registration is called from every
    * LakeEngine constructor and every SQL-text QueryDef, so without this
    * guard each re-run floods WARN "replaced a previously registered
    * function" (~70 lines/session), which crowded the bench JSON out of
    * the driver's 2000-char output tail. Weak keys: sessions are GC-able.
    */
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean])

  /** Register the compat functions into the session's FunctionRegistry.
    * Idempotent per session.
    */
  def register(spark: SparkSession): Unit = {
    if (registered.putIfAbsent(spark, java.lang.Boolean.TRUE) != null) return
    val reg = spark.sessionState.functionRegistry
    def f(name: String)(builder: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")

    // --- degree-variant trigonometry (PG sind/cosd/…; reference shims
    //     RewriteFuncExprTrigonometry, rewrite_query.c:165-167) ---
    f("sind") { case Seq(x) => Sin(ToRadians(d(x))) }
    f("cosd") { case Seq(x) => Cos(ToRadians(d(x))) }
    f("tand") { case Seq(x) => Tan(ToRadians(d(x))) }
    f("cotd") { case Seq(x) => Divide(Cos(ToRadians(d(x))), Sin(ToRadians(d(x)))) }
    f("asind") { case Seq(x) => ToDegrees(Asin(d(x))) }
    f("acosd") { case Seq(x) => ToDegrees(Acos(d(x))) }
    f("atand") { case Seq(x) => ToDegrees(Atan(d(x))) }
    f("atan2d") { case Seq(y, x) => ToDegrees(Atan2(d(y), d(x))) }

    // --- Misra-Gries heavy hitters (mergeable O(k)-state aggregate) ---
    f("approx_top_items") { case Seq(c, kLit) =>
      val k = kLit match {
        case Literal(v: Int, IntegerType) => v
        case Literal(v: Long, LongType) => v.toInt
        case other => throw new IllegalArgumentException(
          s"approx_top_items: k must be an integer literal (got $other)")
      }
      ApproxTopKAgg(c, k).toAggregateExpression()
    }

    // --- the last three reference shippable names Spark lacks:
    // array_length(a, dim) is PG's 2-arg form — only dim 1 exists for
    // the 1-D arrays the storage format allows (the reference gates the
    // same way, IsArrayLengthShippable); other dims yield NULL
    f("array_length") { case Seq(a, dim) =>
      If(EqualTo(Cast(dim, IntegerType), Literal(1)),
        Size(a), Literal(null, IntegerType))
    }
    f("jsonb_array_length") { case Seq(j) =>
      LengthOfJsonArray(j) // reference rewrites jsonb_ → json_ the same way
    }

    // --- PG json operators (plans/JsonArrowRewrite emits these) ---
    f("pg_json_field") { case Seq(j, k) => JsonArrow(j, k, asText = false) }
    f("pg_json_field_text") { case Seq(j, k) => JsonArrow(j, k, asText = true) }
    f("pg_json_path") { case Seq(j, p) => JsonPathExtract(j, p, asText = false) }
    f("pg_json_path_text") { case Seq(j, p) => JsonPathExtract(j, p, asText = true) }

    // --- encode/decode (reference test_encode_decode_pushdown.py:
    // base64/hex push down onto to_/from_ pairs; escape is PG-local).
    // hex is lowercase like PG; base64 is unwrapped (the 76-column
    // MIME wrap PG applies is dropped exactly like the reference's
    // pushdown path, which deparses onto the engine's to_base64) ---
    def fmtLit(e: Expression): String = e match {
      case Literal(s, StringType) if s != null => s.toString.toLowerCase
      case other => throw new IllegalArgumentException(
        s"encode/decode format must be a string literal (got $other)")
    }
    // a non-PG format name falls through to Spark's own charset
    // encode/decode (str↔binary via utf-8 et al.) so shadowing the
    // builtin name costs nothing; an unknown charset errors there
    f("encode") { case Seq(b, fmt) =>
      fmtLit(fmt) match {
        case "hex" => Lower(Hex(b))
        case "base64" => Base64(b)
        case "escape" => PgEscapeEncode(b)
        case _ => Encode(b, fmt)
      }
    }
    f("decode") { case Seq(s, fmt) =>
      fmtLit(fmt) match {
        case "hex" => Unhex(s, failOnError = true)
        case "base64" => UnBase64(s, failOnError = true)
        case "escape" => PgEscapeDecode(s)
        case _ => StringDecode(s, fmt)
      }
    }
    f("unnest") { case Seq(a) => Explode(a) }

    // --- extract/date_part/date_trunc PG field completion
    // (century/decade/millennium/isodow/isoyear/epoch/micro-/
    // milliseconds/timezone*; PG-origin century/millennium trunc —
    // reference rewrite_query.c:1262; Spark-native fields delegate) ---
    f("extract") { case Seq(fld, x) => DateParts.part(fld, x) }
    f("date_part") { case Seq(fld, x) => DateParts.part(fld, x) }
    f("date_trunc") { case Seq(fld, x) => DateParts.trunc(fld, x) }

    // --- strpos(str, sub) — PG arg order; Spark only has locate(sub, str)
    f("strpos") { case Seq(s, sub) => StringLocate(sub, s, Literal(1)) }

    // --- SIMILAR TO support: PG itself rewrites `a SIMILAR TO b` as a
    // regex match on similar_to_escape(b); this is that translation
    // (plans/SimilarToRewrite emits `a RLIKE similar_to_regex(b)`).
    // Literal patterns fold to a constant regex here, keeping the
    // match on the codegen'd RLike fast path.
    def similarRegex(p: Expression, esc: Char): Expression = p match {
      case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType) =>
        Literal.create(SimilarTo.toRegex(s.toString, esc), StringType)
      case other => SimilarToRegex(other, esc)
    }
    f("similar_to_regex") {
      case Seq(p) => similarRegex(p, '\\')
      case Seq(p, Literal(e: org.apache.spark.unsafe.types.UTF8String,
          StringType)) if e.toString.length == 1 =>
        similarRegex(p, e.toString.charAt(0))
      case other => throw new IllegalArgumentException(
        s"similar_to_regex(pattern[, escape-literal]): got $other")
    }

    // --- normalize(text [, form]) — PG Unicode normalization (PG passes
    //     the form as a keyword; here a string literal). Native codegen'd
    //     expression over the JDK normalizer ---
    f("normalize") {
      case Seq(s) => UnicodeNormalize(s, "NFC")
      case Seq(s, Literal(form, StringType)) =>
        UnicodeNormalize(s, String.valueOf(form).toUpperCase)
      case other => throw new IllegalArgumentException(
        "normalize: form must be a string literal (NFC/NFD/NFKC/NFKD)")
    }

    // --- starts_with (PG ^@ / starts_with) ---
    f("starts_with") { case Seq(s, p) => StartsWith(s, p) }

    // --- array_cat (PG || on arrays) ---
    f("array_cat") { case args => Concat(args) }

    // --- array_prepend: PG argument order is (element, array);
    //     Spark's builtin is (array, element) ---
    f("array_prepend") { case Seq(e, arr) => ArrayPrepend(arr, e) }

    // --- ltrim/rtrim/btrim with a trim-set: PG order is (str, chars);
    //     Spark's 2-arg builtins take (trimStr, srcStr) ---
    f("ltrim") {
      case Seq(s) => StringTrimLeft(s)
      case Seq(s, chars) => StringTrimLeft(s, chars)
    }
    f("rtrim") {
      case Seq(s) => StringTrimRight(s)
      case Seq(s, chars) => StringTrimRight(s, chars)
    }
    f("btrim") {
      case Seq(s) => StringTrim(s)
      case Seq(s, chars) => StringTrim(s, chars)
    }

    // --- to_hex ---
    f("to_hex") { case Seq(x) => Lower(Hex(x)) }

    // --- generate_series: PG SET-RETURNING function (inclusive
    //     bounds, ints or timestamps) — a Generator, so it works both
    //     in the select list (`SELECT generate_series(1,10), *`) and
    //     in FROM position (`FROM t, generate_series(0,10) g(s)`),
    //     the two shapes the reference's compat suite runs
    //     (test_postgres_compat_sql.py; shim
    //     RewriteFuncExprGenerateSeries, rewrite_query.c:157). For
    //     the plain array, use sequence(). ---
    f("generate_series") {
      case Seq(a, b) => Explode(new Sequence(a, b))
      case Seq(a, b, step) => Explode(new Sequence(a, b, step))
    }

    // --- ROW(a, b, …) constructor (PG spelling of struct) ---
    f("row") { exprs => CreateStruct(exprs) }

    // FROM-position resolution goes through the separate
    // TableFunctionRegistry — register the set-returning pair there
    // too, so `FROM t, generate_series(0,10) g(s)` and
    // `JOIN unnest(ARRAY[1,2]) g(s)` (compat-suite shapes) plan as
    // ordinary generators over a one-row relation
    import org.apache.spark.sql.catalyst.plans.logical.{Generate, OneRowRelation}
    val tvf = spark.sessionState.tableFunctionRegistry
    def tf(name: String)(builder: Seq[Expression] => Generator): Unit =
      tvf.createOrReplaceTempFunction(name,
        (args: Seq[Expression]) =>
          Generate(builder(args), Nil, outer = false, None, Nil,
            OneRowRelation()),
        "scala_udf")
    tf("generate_series") {
      case Seq(a, b) => Explode(new Sequence(a, b))
      case Seq(a, b, step) => Explode(new Sequence(a, b, step))
    }
    tf("unnest") { case Seq(a) => Explode(a) }

    // --- array_agg KEEPS NULL inputs and yields NULL on an empty
    // group (PG and DuckDB semantics; Spark aliases it to
    // collect_list, which drops NULLs and returns []). Registered as
    // a bare AggregateFunction so the analyzer's DISTINCT handling
    // still applies — array_agg(DISTINCT x) keeps one NULL, like PG.
    // Unordered, like PG without ORDER BY.
    f("array_agg") { case Seq(x) => ArrayAggPg(x) }

    // --- date_bin(stride, ts, origin): PG/DuckDB temporal binning.
    //     bin = ts - positive_mod(ts - origin, stride), all in epoch
    //     micros — floors toward -infinity like PG for any ts/origin. ---
    f("date_bin") { case Seq(stride, ts, origin) =>
      val tsUs = UnixMicros(Cast(ts, TimestampType))
      val originUs = UnixMicros(Cast(origin, TimestampType))
      // a day-time interval literal's underlying Long IS micros; casting
      // the expression to LongType would instead return whole end-field
      // units (e.g. days), so unwrap literals and only fall back to a
      // seconds cast for non-literal strides
      val strideUs: Expression = stride match {
        case Literal(v: Long, _: DayTimeIntervalType) => Literal(v)
        case e => Multiply(
          Cast(Cast(e, DayTimeIntervalType(0, 3)), LongType),
          Literal(1000000L))
      }
      val binned = Subtract(tsUs, Pmod(Subtract(tsUs, originUs), strideUs))
      Cast(MicrosToTimestamp(binned), TimestampNTZType)
    }

    // --- to_char(timestamp, 'PG pattern') → formatted string.
    //     Literal formats translate at plan time into a codegen'd
    //     DateFormatClass; non-literal formats are out of scope (the
    //     reference likewise gates on convertibility,
    //     IsConvertibleToChar, to_char.c:262). ---
    f("to_char") {
      case Seq(ts, Literal(fmt, StringType)) =>
        toCharExpr(ts, fmt.toString)
      case args =>
        throw new IllegalArgumentException(
          "to_char requires (timestamp, literal format string), got: " + args)
    }

    // --- spatial st_* layer (§2.7) ---
    SpatialFunctions.register(spark)
  }
}
