package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType}

/** PG-faithful `array_agg`: KEEPS NULL inputs (Spark's collect_list
  * alias silently drops them) and returns NULL — not an empty array —
  * over an empty group, both per PG and DuckDB. A real
  * AggregateFunction, so `array_agg(DISTINCT x)` plans through the
  * standard distinct-aggregation rewrite (DISTINCT keeps one NULL,
  * like PG).
  *
  * Unordered, like PG without ORDER BY — wrap in sort_array (or judge
  * through size/sorted projections) where determinism is needed.
  *
  * Serde: the buffer ships as a single-field UnsafeRow holding an
  * ArrayData with nullable elements — null entries round-trip through
  * shuffle exactly.
  */
case class ArrayAggPg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.ArrayBuffer[Any]]
    with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(child.dataType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "array_agg"

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty[Any]

  override def update(buffer: mutable.ArrayBuffer[Any],
      input: InternalRow): mutable.ArrayBuffer[Any] = {
    buffer += InternalRow.copyValue(child.eval(input))
    buffer
  }

  override def merge(buffer: mutable.ArrayBuffer[Any],
      other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    buffer ++= other
    buffer
  }

  override def eval(buffer: mutable.ArrayBuffer[Any]): Any =
    if (buffer.isEmpty) null // PG: empty group aggregates to NULL
    else new GenericArrayData(buffer.toArray)

  @transient private lazy val projection =
    UnsafeProjection.create(Array[DataType](dataType))

  override def serialize(buffer: mutable.ArrayBuffer[Any]): Array[Byte] =
    projection.apply(InternalRow(new GenericArrayData(buffer.toArray)))
      .getBytes

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Any] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    val buf = mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < arr.numElements()) {
      buf += (if (arr.isNullAt(i)) null else arr.get(i, child.dataType))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): ArrayAggPg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ArrayAggPg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): ArrayAggPg =
    copy(child = c)
}
