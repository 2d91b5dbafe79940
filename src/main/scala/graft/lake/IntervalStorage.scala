package graft.lake

import org.apache.spark.sql.catalyst.expressions.{CreateNamedStruct, Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.CalendarInterval

/** The interval storage convention (SURVEY.md §1.2; the reference
  * stores PG intervals in Parquet/Iceberg as
  * `STRUCT(months BIGINT, days BIGINT, microseconds BIGINT)` —
  * pg_lake_engine/src/pgduck/type.c:516-523). Parquet has no interval
  * type, so the write path decomposes `CalendarIntervalType` into that
  * struct and the read path reassembles it.
  */
object IntervalStorage {

  val physicalType: StructType = StructType(Seq(
    StructField("months", LongType),
    StructField("days", LongType),
    StructField("microseconds", LongType)))

  def isInterval(dt: DataType): Boolean = dt == CalendarIntervalType

  /** interval → struct(months, days, microseconds). */
  case class IntervalToStruct(child: Expression) extends UnaryExpression
      with CodegenFallback {
    override def dataType: DataType = physicalType
    override protected def withNewChildInternal(c: Expression): IntervalToStruct =
      copy(child = c)
    override def nullSafeEval(v: Any): Any = {
      val i = v.asInstanceOf[CalendarInterval]
      InternalRow(i.months.toLong, i.days.toLong, i.microseconds)
    }
  }

  /** struct(months, days, microseconds) → interval. */
  case class StructToInterval(child: Expression) extends UnaryExpression
      with CodegenFallback {
    override def dataType: DataType = CalendarIntervalType
    override protected def withNewChildInternal(c: Expression): StructToInterval =
      copy(child = c)
    override def nullSafeEval(v: Any): Any = {
      val r = v.asInstanceOf[InternalRow]
      new CalendarInterval(r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2))
    }
  }
}
