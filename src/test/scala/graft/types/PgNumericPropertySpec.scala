package graft.types

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import java.nio.ByteBuffer

/** Property fuzz for the base-10000 numeric binary decoder — the encoder
  * here mirrors PostgreSQL's send format (groups aligned to 4-digit
  * boundaries around the decimal point, weight = base-10000 exponent of
  * the first group, leading/trailing zero groups stripped), and the
  * decoded text must equal the BigDecimal's plain rendering at dscale for
  * random values across every alignment case.
  */
class PgNumericPropertySpec extends AnyFunSuite {

  /** Test-side encoder of PostgreSQL's numeric binary send format. */
  private def encode(unscaled: BigInt, scale: Int): Array[Byte] = {
    val neg = unscaled < 0
    val abs = unscaled.abs.toString
    // digit string split around the decimal point at `scale`
    val (intPart0, fracPart0) =
      if (scale == 0) (abs, "")
      else if (abs.length <= scale) ("0", ("0" * (scale - abs.length)) + abs)
      else (abs.dropRight(scale), abs.takeRight(scale))
    val intPart = {
      val pad = (4 - intPart0.length % 4) % 4
      ("0" * pad) + intPart0
    }
    val fracPart = {
      val pad = (4 - fracPart0.length % 4) % 4
      fracPart0 + ("0" * pad)
    }
    var groups = (intPart.grouped(4).toVector ++ fracPart.grouped(4).toVector)
      .map(_.toInt)
    var weight = intPart.length / 4 - 1
    // strip leading zero groups (weight drops with each)
    while (groups.nonEmpty && groups.head == 0) { groups = groups.tail; weight -= 1 }
    // strip trailing zero groups (pure representation change)
    while (groups.nonEmpty && groups.last == 0) groups = groups.init
    if (groups.isEmpty) weight = 0
    val b = ByteBuffer.allocate(8 + 2 * groups.size)
    b.putShort(groups.size.toShort)
    b.putShort(weight.toShort)
    b.putShort(if (neg) 0x4000.toShort else 0.toShort)
    b.putShort(scale.toShort)
    groups.foreach(g => b.putShort(g.toShort))
    b.array()
  }

  test("decoded text equals BigDecimal plain rendering for random values") {
    val gen = for {
      unscaled <- Gen.choose(-1000000000000L, 1000000000000L)
      scale <- Gen.choose(0, 8)
    } yield (BigInt(unscaled), scale)
    val prop = Prop.forAll(gen) { case (unscaled, scale) =>
      val expected = new java.math.BigDecimal(unscaled.bigInteger, scale).toPlainString
      val got = PgBinary.toText(encode(unscaled, scale), PgTypes.Oid.Numeric)
      // pg renders -0.00 as 0.00 (sign of zero is not kept); BigDecimal same
      got == expected
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500).withInitialSeed(Seed(13L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("alignment corner cases decode exactly") {
    // values chosen to hit every split: group boundary on the point, frac
    // crossing groups, pure-fraction with leading zero groups, huge scale
    val cases = Seq(
      (BigInt(0), 0, "0"),
      (BigInt(0), 4, "0.0000"),
      (BigInt(1), 8, "0.00000001"),
      (BigInt(-1), 8, "-0.00000001"),
      (BigInt(10000), 0, "10000"),
      (BigInt(9999), 0, "9999"),
      (BigInt(12345678), 4, "1234.5678"),
      (BigInt(100000000), 8, "1.00000000"),
      (BigInt(-123456789012L), 6, "-123456.789012"))
    cases.foreach { case (unscaled, scale, want) =>
      val got = PgBinary.toText(encode(unscaled, scale), PgTypes.Oid.Numeric)
      assert(got == want, s"unscaled=$unscaled scale=$scale")
    }
  }
}
