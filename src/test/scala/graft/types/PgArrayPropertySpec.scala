package graft.types

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

/** Property fuzz for the binary array decoder: encode random text[] /
  * int8[] payloads in PostgreSQL's array_send format (test-side encoder),
  * render through [[PgBinary.toText]], and parse back with
  * [[graft.functions.PgTextArray]] — the same path a 't'-format array
  * column takes. Round-tripping exactly (including NULL elements, empty
  * strings, quotes, backslashes, braces, commas, whitespace, and the
  * literal string "NULL") proves the renderer's array_out quoting and the
  * parser agree on every edge the generator can reach.
  */
class PgArrayPropertySpec extends AnyFunSuite {

  /** Test-side array_send encoder: 1-D, lower bound 1. */
  private def encode(elems: Seq[Option[Array[Byte]]], elemOid: Int): Array[Byte] = {
    val payload = elems.map(_.map(_.length + 4).getOrElse(4)).sum
    val b = ByteBuffer.allocate(20 + payload)
    b.putInt(1) // ndim
    b.putInt(if (elems.exists(_.isEmpty)) 1 else 0)
    b.putInt(elemOid)
    b.putInt(elems.size)
    b.putInt(1) // lower bound
    elems.foreach {
      case None => b.putInt(-1)
      case Some(raw) => b.putInt(raw.length); b.put(raw)
    }
    b.array()
  }

  private val nastyChars =
    Gen.oneOf('a', 'b', '{', '}', ',', '"', '\\', ' ', '\t', '\n', 'é', '0')

  private val elemGen: Gen[Option[String]] = Gen.frequency(
    2 -> Gen.const(None), // SQL NULL element
    2 -> Gen.const(Some("")), // empty string must quote
    2 -> Gen.const(Some("NULL")), // literal string must quote
    2 -> Gen.const(Some("null")),
    10 -> Gen.listOf(nastyChars).map(cs => Some(cs.mkString)))

  test("text[] binary -> text render -> parse round-trips exactly") {
    val gen = Gen.listOfN(6, elemGen).flatMap(l => Gen.choose(0, 6).map(l.take))
    val prop = Prop.forAll(gen) { elems =>
      val bytes = encode(
        elems.map(_.map(_.getBytes(UTF_8))), PgTypes.Oid.Text.toInt)
      val text = PgBinary.toText(bytes, PgTypes.Oid.TextArr)
      val parsed = graft.functions.PgTextArray.parse(text).toSeq
      parsed == elems.map(_.orNull)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500).withInitialSeed(Seed(17L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("int8[] binary -> text render -> parse -> Long round-trips exactly") {
    val gen = Gen.listOfN(5,
      Gen.frequency(1 -> Gen.const(Option.empty[Long]),
        6 -> Gen.choose(Long.MinValue, Long.MaxValue).map(Option(_))))
    val prop = Prop.forAll(gen) { elems =>
      val bytes = encode(
        elems.map(_.map(v => ByteBuffer.allocate(8).putLong(v).array())),
        PgTypes.Oid.Int8.toInt)
      val text = PgBinary.toText(bytes, PgTypes.Oid.Int8Arr)
      val parsed = graft.functions.PgTextArray.parse(text).toSeq
      parsed.map(Option(_).map(_.toLong)) == elems
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300).withInitialSeed(Seed(19L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("arbitrary strings parse or raise IllegalArgumentException — nothing else") {
    // The parser faces whatever a 't' column carries; malformed literals
    // (unbalanced quotes/braces, stray backslashes, random garbage) must
    // fail with the parser's declared error or return a best-effort result,
    // never an index/NPE escape.
    val gen: Gen[String] = Gen.frequency(
      3 -> Gen.listOf(Gen.oneOf('{', '}', '"', '\\', ',', ' ', 'a', 'é', 'N'))
        .map(_.mkString),
      1 -> Gen.asciiPrintableStr,
      1 -> Gen.const(""),
      1 -> Gen.const("{"), 1 -> Gen.const("}"), 1 -> Gen.const("{\""),
      1 -> Gen.const("{\"a"), 1 -> Gen.const("{a,"), 1 -> Gen.const("{\\"))
    val prop = Prop.forAll(gen) { s =>
      try { graft.functions.PgTextArray.parse(s); true }
      catch {
        case _: IllegalArgumentException => true
        case e: Throwable =>
          println(s"array parser hole: ${e.getClass.getName}: ${e.getMessage} input=${s.take(40)}")
          false
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500).withInitialSeed(Seed(20260814L)), prop)
    assert(res.passed, res.status.toString)
  }
}
