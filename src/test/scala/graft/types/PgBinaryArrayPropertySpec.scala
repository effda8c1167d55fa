package graft.types

import java.nio.ByteBuffer
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.PgTextArray
import graft.types.PgTypes.Oid

/** Randomized round-trip for the binary array decode path: arbitrary
  * text[] payloads — SQL nulls, empties, quotes, backslash runs, braces,
  * commas, whitespace, the literal NULL string in both cases, non-ASCII —
  * rendered by [[PgBinary.toText]] must parse back through
  * [[PgTextArray.parse]] to exactly the original elements, the same
  * contract a 't'-format column's text travels through, so the binary and
  * text paths can never diverge on quoting. The golden-bytes spec pins
  * array_out's exact output for the canonical cases; this pins
  * reversibility over the combinatorial space.
  */
class PgBinaryArrayPropertySpec extends AnyFunSuite {

  /** array_send bytes for a 1-D text[] with the given elements. */
  private def binTextArray(elems: Seq[Option[String]]): Array[Byte] = {
    val payloads = elems.map(_.map(_.getBytes("UTF-8")))
    val size = 12 + 8 +
      payloads.map { case Some(b) => 4 + b.length; case None => 4 }.sum
    val b = ByteBuffer.allocate(size)
    b.putInt(1)
    b.putInt(if (elems.contains(None)) 1 else 0)
    b.putInt(25)
    b.putInt(elems.size)
    b.putInt(1)
    payloads.foreach {
      case Some(raw) => b.putInt(raw.length); b.put(raw)
      case None => b.putInt(-1)
    }
    b.array()
  }

  private val elemGen: Gen[Option[String]] = Gen.frequency(
    2 -> Gen.const(None),
    2 -> Gen.const(Some("")),
    1 -> Gen.const(Some("NULL")),
    1 -> Gen.const(Some("null")),
    10 -> Gen.listOf(Gen.oneOf(
      'a', 'z', '"', '\\', '{', '}', ',', ' ', '\t', '\n', 'é', '§'))
      .map(cs => Some(cs.mkString)))

  test("random text[] payloads render and parse back exactly") {
    val prop = Prop.forAll(Gen.listOf(elemGen)) { elems =>
      val txt = PgBinary.toText(binTextArray(elems), Oid.TextArr)
      PgTextArray.parse(txt).toSeq == elems.map(_.orNull)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300)
        .withInitialSeed(Seed(20260813L)),
      prop)
    assert(res.passed, s"property falsified: ${res.status}")
  }
}
