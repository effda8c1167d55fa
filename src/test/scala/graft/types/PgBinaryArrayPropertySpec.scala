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

  test("corrupted frames decode or fail with PgProtoException — nothing else") {
    // Wire bytes are untrusted input: any truncation or byte flip of a valid
    // frame must either still decode (the damage landed in a payload) or
    // raise the uniform wire error. Anything else — OOM from trusting a
    // length header, NegativeArraySize, a leaked nio internal — is a decoder
    // hole. Exercised across the supported OIDs, not just arrays.
    val oids = Seq(Oid.TextArr, Oid.Int8, Oid.Numeric, Oid.Uuid,
      Oid.Timestamp, Oid.Interval, Oid.Date)
    val frameGen: Gen[(Array[Byte], Long)] = for {
      elems <- Gen.listOf(elemGen)
      oid <- Gen.oneOf(oids)
      valid = if (oid == Oid.TextArr) binTextArray(elems)
        else Array.tabulate[Byte](16)(i => i.toByte)
      mode <- Gen.choose(0, 2)
      cut <- Gen.choose(0, valid.length)
      idx <- Gen.choose(0, math.max(0, valid.length - 1))
      flip <- Gen.choose(Byte.MinValue, Byte.MaxValue)
    } yield {
      val bytes = mode match {
        case 0 => valid.take(cut) // truncate
        case 1 => // flip one byte (length headers included)
          if (valid.isEmpty) valid
          else { val c = valid.clone(); c(idx) = flip; c }
        case _ => valid ++ Array(flip) // trailing garbage: must not crash
      }
      (bytes, oid)
    }
    val prop = Prop.forAll(frameGen) { case (bytes, oid) =>
      try { PgBinary.toText(bytes, oid); true }
      catch {
        case _: graft.pgproto.PgProtoException => true
        case _: Throwable => false
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500)
        .withInitialSeed(Seed(20260814L)),
      prop)
    assert(res.passed, s"property falsified: ${res.status}")
  }
}
