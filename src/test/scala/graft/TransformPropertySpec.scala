package graft

import graft.lake._
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY.md §5 test plan, item d): partition-transform
  * algebra and pruning soundness, driver-side only — no Spark jobs.
  */
class TransformPropertySpec extends AnyFunSuite {

  /** Run a scalacheck property with the plain scalacheck runner. */
  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("bucket hash: iceberg spec vector + spark murmur3 equivalence") {
    // iceberg spec appendix: bucket hash of int/long 34 (little-endian
    // long bytes) is 2017239379
    assert(Murmur3X86_32.hash(Array[Byte](34, 0, 0, 0, 0, 0, 0, 0), 0)
      == 2017239379)
    // canonical murmur3_x86_32 vectors incl. 1/2/3-byte tails (the
    // iceberg "iceberg"-string vector is the documented 1210000089)
    val vectors = Seq(
      Array.empty[Byte] -> 0,
      "a".getBytes -> 1009084850,
      "ab".getBytes -> -1681926305,
      "abc".getBytes -> -1277324294,
      "abcd".getBytes -> 1139631978,
      "iceberg".getBytes -> 1210000089,
      Array[Byte](0) -> 1364076727,
      Array[Byte](1, 2, 3, 4, 5) -> -1567508024)
    vectors.foreach { case (bytes, expect) =>
      assert(Murmur3X86_32.hash(bytes, 0) == expect,
        s"${bytes.toSeq} -> expected $expect")
    }
  }

  test("bucket transform: range and determinism") {
    check(forAll(Gen.chooseNum(Long.MinValue + 1, Long.MaxValue),
        Gen.chooseNum(1, 512)) { (v: Long, n: Int) =>
      val e = IcebergBucketHash(Literal(v, LongType), n)
      val b1 = e.eval(null).asInstanceOf[Int]
      val b2 = e.eval(null).asInstanceOf[Int]
      b1 == b2 && b1 >= 0 && b1 < n
    })
  }

  test("truncate transform: floor-to-multiple for ints incl negatives") {
    check(forAll(Gen.chooseNum(-1000000L, 1000000L),
        Gen.chooseNum(1, 1000)) { (v: Long, w: Int) =>
      val t = TruncateT(w, "x")
      val folded = t.catalyst(Literal(v, LongType), LongType)
        .eval(null).asInstanceOf[Long]
      folded % w == 0 && folded <= v && v - folded < w
    })
  }

  private val field = FieldDef(1, "x", "BIGINT")
  private val meta = TableMetadata("t", 1,
    Seq(SchemaVersion(1, Seq(field))), 1, Nil,
    Seq(Snapshot(0, 0L, "create", Nil)), 0, 2)

  private def entry(values: Seq[Long]): FileEntry = {
    val stats = ColStats(
      if (values.isEmpty) None else Some(values.min.toString),
      if (values.isEmpty) None else Some(values.max.toString), 0L)
    FileEntry("f", values.size.toLong, 0L, 1, Map("1" -> stats), Map.empty)
  }

  private val attr = AttributeReference("x", LongType)()

  private def predOf(op: Int, v: Long): (Expression, Long => Boolean) =
    op match {
      case 0 => (EqualTo(attr, Literal(v, LongType)), _ == v)
      case 1 => (LessThan(attr, Literal(v, LongType)), _ < v)
      case 2 => (GreaterThan(attr, Literal(v, LongType)), _ > v)
      case 3 => (LessThanOrEqual(attr, Literal(v, LongType)), _ <= v)
      case _ => (GreaterThanOrEqual(attr, Literal(v, LongType)), _ >= v)
    }

  test("pruning soundness: Skip => no matching rows, Full => all match") {
    check(forAll(
        Gen.nonEmptyListOf(Gen.chooseNum(-100L, 100L)),
        Gen.chooseNum(0, 4), Gen.chooseNum(-120L, 120L)) { (vs, op, v) =>
      val (pred, matches) = predOf(op, v)
      val fe = entry(vs)
      val decision = Pruning.classify(meta, pred, Seq(fe)).head._2
      val matching = vs.count(matches)
      decision match {
        case Pruning.Skip => Prop(matching == 0).label(s"skip but $matching match")
        case Pruning.Full => Prop(matching == vs.size).label("full but not all")
        case Pruning.Partial => Prop.passed
      }
    })
  }

  test("pruning soundness under AND/OR/NOT composition") {
    val leafGen = for {
      op <- Gen.chooseNum(0, 4)
      v <- Gen.chooseNum(-120L, 120L)
    } yield predOf(op, v)

    def compose(depth: Int): Gen[(Expression, Long => Boolean)] =
      if (depth == 0) leafGen
      else Gen.oneOf(
        leafGen,
        for { (l, fl) <- compose(depth - 1); (r, fr) <- compose(depth - 1) }
          yield (And(l, r), (x: Long) => fl(x) && fr(x)),
        for { (l, fl) <- compose(depth - 1); (r, fr) <- compose(depth - 1) }
          yield (Or(l, r), (x: Long) => fl(x) || fr(x)),
        for { (l, fl) <- compose(depth - 1) }
          yield (Not(l), (x: Long) => !fl(x)))

    check(forAll(Gen.nonEmptyListOf(Gen.chooseNum(-100L, 100L)),
        compose(3)) { case (vs, (pred, matches)) =>
      val fe = entry(vs)
      val decision = Pruning.classify(meta, pred, Seq(fe)).head._2
      val matching = vs.count(matches)
      decision match {
        case Pruning.Skip => Prop(matching == 0)
        case Pruning.Full => Prop(matching == vs.size)
        case Pruning.Partial => Prop.passed
      }
    })
  }
}
