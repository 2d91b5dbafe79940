package graft.lake

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Stats-based data-file pruning + hidden-partition pruning
  * (SURVEY.md §4; reference `PruneDataFiles`,
  * pg_lake_table/src/fdw/data_file_pruning.c:186-310 and the transform
  * constraint algebra at :746-1100).
  *
  * Given the scan predicate, each file is classified from its recorded
  * column stats and partition-transform-value ranges:
  *   - [[Pruning.Skip]]    — provably no matching rows: file not read
  *   - [[Pruning.Full]]    — provably ALL rows match: DML can drop the
  *                           file without a rewrite (the reference's
  *                           fully-matched-file optimization)
  *   - [[Pruning.Partial]] — must be read
  *
  * Decisions are driver-side over metadata only — O(#files) with zero
  * data I/O, which is exactly what makes selective scans on a 100 TB
  * table cheap: the executor fleet never sees skipped files.
  */
object Pruning {

  sealed trait Decision
  case object Skip extends Decision
  case object Partial extends Decision
  case object Full extends Decision

  /** Classify every file against `pred` (a resolved Catalyst predicate
    * over the CURRENT schema's column names).
    */
  def classify(meta: TableMetadata, pred: Expression,
      files: Seq[FileEntry]): Seq[(FileEntry, Decision)] = {
    val fieldsByName = meta.currentSchema.fields.map(f => f.name -> f).toMap
    val transforms = meta.transforms
    files.map { fe => fe -> evalNode(pred, fe, fieldsByName, transforms) }
  }

  def keep(meta: TableMetadata, pred: Expression,
      files: Seq[FileEntry]): Seq[FileEntry] =
    classify(meta, pred, files).collect { case (f, d) if d != Skip => f }

  // ---- predicate walk ----------------------------------------------------

  private def evalNode(e: Expression, fe: FileEntry,
      fields: Map[String, FieldDef],
      transforms: Seq[PartitionTransform]): Decision = e match {
    case And(l, r) =>
      (evalNode(l, fe, fields, transforms), evalNode(r, fe, fields, transforms)) match {
        case (Skip, _) | (_, Skip) => Skip
        case (Full, Full) => Full
        case _ => Partial
      }
    case Or(l, r) =>
      (evalNode(l, fe, fields, transforms), evalNode(r, fe, fields, transforms)) match {
        case (Full, _) | (_, Full) => Full
        case (Skip, Skip) => Skip
        case _ => Partial
      }
    case Not(child) =>
      evalNode(child, fe, fields, transforms) match {
        case Skip => Full // no row matches child => every row matches NOT
        case Full => Skip
        case Partial => Partial
      }
    case leaf => evalLeaf(leaf, fe, fields, transforms)
  }

  private def evalLeaf(e: Expression, fe: FileEntry,
      fields: Map[String, FieldDef],
      transforms: Seq[PartitionTransform]): Decision = {

    def statsFor(name: String): Option[(FieldDef, ColStats)] =
      fields.get(name).flatMap(fd =>
        fe.fieldStats.get(fd.id.toString).map(fd -> _))

    e match {
      case cmp @ BinaryComparison(a: AttributeReference, l: Literal) =>
        compareLeaf(opOf(cmp), a.name, l, fe, fields, transforms)
      case cmp @ BinaryComparison(l: Literal, a: AttributeReference) =>
        compareLeaf(flip(opOf(cmp)), a.name, l, fe, fields, transforms)
      case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        val ds = vs.map(v => compareLeaf("=", a.name, v.asInstanceOf[Literal],
          fe, fields, transforms))
        if (ds.forall(_ == Skip)) Skip
        else if (ds.exists(_ == Full)) Full
        else Partial
      case IsNull(a: AttributeReference) =>
        statsFor(a.name).map { case (_, st) =>
          if (st.nullCount == 0) Skip
          else if (st.nullCount == fe.rows) Full
          else Partial
        }.getOrElse(Partial)
      case IsNotNull(a: AttributeReference) =>
        statsFor(a.name).map { case (_, st) =>
          if (st.nullCount == fe.rows) Skip
          else if (st.nullCount == 0) Full
          else Partial
        }.getOrElse(Partial)
      case Literal(true, BooleanType) => Full
      case Literal(false, BooleanType) => Skip
      case _ => Partial // unsupported shape: must read the file
    }
  }

  private def opOf(c: BinaryComparison): String = c match {
    case _: EqualTo => "="
    case _: LessThan => "<"
    case _: LessThanOrEqual => "<="
    case _: GreaterThan => ">"
    case _: GreaterThanOrEqual => ">="
    case _ => "?"
  }

  private def flip(op: String): String = op match {
    case "<" => ">"
    case "<=" => ">="
    case ">" => "<"
    case ">=" => "<="
    case other => other
  }

  /** Decide one comparison using column stats, then (if inconclusive)
    * partition-transform stats; Skip wins over anything, Full requires
    * nulls to be absent (SQL comparisons are null-rejecting).
    */
  private def compareLeaf(op: String, name: String, l: Literal,
      fe: FileEntry, fields: Map[String, FieldDef],
      transforms: Seq[PartitionTransform]): Decision = {
    if (op == "?" || l.value == null) return Partial
    val fd = fields.get(name).getOrElse(return Partial)
    val dt = TableMetadata.toStruct(SchemaVersion(0, Seq(fd))).head.dataType

    val colDecision = fe.fieldStats.get(fd.id.toString).map { st =>
      rangeDecision(op, l.value, dt, st, fe.rows)
    }.getOrElse(Partial)
    if (colDecision == Skip) return Skip

    // partition-transform evidence for the same source column
    val partDecisions = transforms.filter(_.column == name).flatMap { t =>
      fe.partStats.get(t.valueName).flatMap { st =>
        mapLiteral(t, l, dt).flatMap { mapped =>
          val supported = op == "=" || t.mapsRanges
          if (supported)
            Some(rangeDecision(op, mapped.value, mapped.dataType, st, fe.rows))
          else None
        }
      }
    }
    if (partDecisions.contains(Skip)) Skip
    else colDecision match {
      case Full => Full
      case d => d
    }
  }

  /** Evaluate the transform on a literal — the catalyst tree is fully
    * resolved (literal leaf), so direct eval works for every transform.
    */
  private def mapLiteral(t: PartitionTransform, l: Literal,
      dt: DataType): Option[Literal] =
    try {
      val mapped = t.catalyst(l, dt)
      val value = mapped.eval(null)
      Some(Literal(value, mapped.dataType))
    } catch { case _: Throwable => None }

  /** Compare [min,max] (stored as Spark-cast strings) against `v`. */
  private def rangeDecision(op: String, v: Any, dt: DataType,
      st: ColStats, rows: Long): Decision = {
    val ord = interpretedOrdering(dt).getOrElse(return Partial)
    val minV = st.min.map(s => parseStat(s, dt))
    val maxV = st.max.map(s => parseStat(s, dt))
    if (minV.exists(_ == null) || maxV.exists(_ == null)) return Partial
    val allRowsNonNull = st.nullCount == 0
    (minV, maxV) match {
      case (Some(mn), Some(mx)) =>
        val skip = op match {
          case "=" => ord.lt(v, mn) || ord.gt(v, mx)
          case "<" => ord.gteq(mn, v)
          case "<=" => ord.gt(mn, v)
          case ">" => ord.lteq(mx, v)
          case ">=" => ord.lt(mx, v)
          case _ => false
        }
        if (skip) Skip
        else {
          val full = allRowsNonNull && (op match {
            case "=" => ord.equiv(mn, v) && ord.equiv(mx, v)
            case "<" => ord.lt(mx, v)
            case "<=" => ord.lteq(mx, v)
            case ">" => ord.gt(mn, v)
            case ">=" => ord.gteq(mn, v)
            case _ => false
          })
          if (full) Full else Partial
        }
      case _ =>
        // no min/max (all-null file): any comparison is null => no match
        if (st.nullCount == rows && rows > 0) Skip else Partial
    }
  }

  /** Stat string -> internal value of `dt`, via Spark's own Cast so the
    * round trip matches how stats were produced (cast(col as string)).
    */
  private def parseStat(s: String, dt: DataType): Any =
    Cast(Literal(UTF8String.fromString(s), StringType), dt,
      Some("UTC")).eval(null)

  private def interpretedOrdering(dt: DataType): Option[Ordering[Any]] =
    scala.util.Try(org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(dt)).toOption
}
