package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Mergeable HyperLogLog sketches (Flajolet et al. 2007) with a
  * PORTABLE, fully-judged construction — the persisted-state analogue
  * of `approx_count_distinct`: a 100 TB pipeline stores one 512-byte
  * sketch per partition/day/source and answers later distinct-count
  * questions (including unions across slices) without re-reading data,
  * the same incremental posture as [[graft.operators.Dedup.lineStats]].
  *
  * Portability contract (what makes the judged oracle possible):
  *   - the item hash is the corpus-standard md5-derived 60-bit hash of
  *     `"hll" + value-as-string` — bit-identical in DuckDB;
  *   - register index = h mod 512, and the rank is 52 − bitlen(h / 512)
  *     (52 for the all-zeros tail) — pure integer ops;
  *   - the register sum Σ 2^(−M_b) is kept as the INTEGER
  *     Σ 2^(52 − M_b) (≤ 512·2^52 < 2^62 — exact, order-independent),
  *     so S and the zero-register count V compare exactly, and the
  *     double estimate derives from them with one identical expression.
  */
object Hll {
  val M = 512 // registers (2^9)
  val IndexBits = 9
  val MaxRank = 52 // 60-bit hash - 9 index bits -> 51 payload bits, +1

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex nibbles of md5 as a long — value-identical to
    * `Long.parseLong(hexString.take(15), 16)` (HllSpec pins it), but
    * hot-path-shaped: thread-local digest, no hex string.
    */
  def hash60(s: String): Long = {
    val d = mdLocal.get().digest(s.getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  def rank(w: Long): Int =
    if (w == 0L) MaxRank else MaxRank - (64 - java.lang.Long.numberOfLeadingZeros(w))

  def add(regs: Array[Byte], value: String): Unit = {
    val h = hash60("hll" + value)
    val b = (h % M).toInt
    val r = rank(h / M)
    if (r > regs(b)) regs(b) = r.toByte
  }

  def mergeInto(a: Array[Byte], b: Array[Byte]): Unit = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
  }

  /** (S, V, est): integer-scaled register sum, zero-register count,
    * and the rounded estimate — the same arithmetic the oracle runs.
    */
  def stats(regs: Array[Byte]): (Long, Int, Double) = {
    var s = 0L
    var v = 0
    var i = 0
    while (i < M) {
      s += 1L << (MaxRank - regs(i))
      if (regs(i) == 0) v += 1
      i += 1
    }
    val alpha = 0.7213 / (1.0 + 1.079 / 512.0)
    val est0 = alpha * 262144.0 * (4503599627370496.0 / s.toDouble)
    val est =
      if (est0 <= 1280.0 && v > 0) 512.0 * math.log(512.0 / v.toDouble)
      else est0
    val rounded = java.math.BigDecimal.valueOf(est)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    (s, v, rounded)
  }
}

/** `hll_sketch(col)`: the 512-register sketch of a string column. */
case class HllSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "hll_sketch"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](Hll.M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) Hll.add(buf, v.toString)
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    Hll.mergeInto(a, b); a
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}

/** `hll_combine(sketch)`: union of sketches (register-wise max). */
case class HllCombineAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "hll_combine"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](Hll.M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) Hll.mergeInto(buf, v.asInstanceOf[Array[Byte]])
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    Hll.mergeInto(a, b); a
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllCombineAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllCombineAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}

/** `hll_stats(sketch)` -> struct(s BIGINT, v INT, est DOUBLE). */
case class HllStats(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("s", LongType, nullable = false),
    StructField("v", IntegerType, nullable = false),
    StructField("est", DoubleType, nullable = false)))
  override protected def withNewChildInternal(c: Expression): HllStats =
    copy(child = c)

  override def nullSafeEval(v: Any): Any = {
    val (s, z, est) = Hll.stats(v.asInstanceOf[Array[Byte]])
    InternalRow(s, z, est)
  }
}
