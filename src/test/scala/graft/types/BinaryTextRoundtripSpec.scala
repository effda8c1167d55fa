package graft.types

import graft.SparkTestBase
import graft.types.PgTypes.Oid
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import java.nio.ByteBuffer

/** The format-agnostic claim, proven: text rendered by [[PgBinary.toText]]
  * must survive the SAME [[PgTypes.fromText]] Catalyst cast a 't' column
  * takes, landing on the typed value the binary bytes encode. A rendering
  * the cast can't parse (or parses to a different value) would corrupt
  * typed views only for `binary: true` publications — exactly the kind of
  * skew this pins.
  */
class BinaryTextRoundtripSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def be(n: Int)(fill: ByteBuffer => Unit): Array[Byte] = {
    val b = ByteBuffer.allocate(n); fill(b); b.array()
  }

  private def roundtrip(bytes: Array[Byte], oid: Long, typmod: Int = -1): Any = {
    import spark.implicits._
    val text = PgBinary.toText(bytes, oid)
    Seq(text).toDF("v")
      .select(PgTypes.fromText(col("v"), oid, typmod).as("t"))
      .collect()(0).get(0)
  }

  test("integers, bool, floats land on their exact typed values") {
    assert(roundtrip(be(2)(_.putShort(-42)), Oid.Int2) == (-42: Short))
    assert(roundtrip(be(4)(_.putInt(Int.MinValue)), Oid.Int4) == Int.MinValue)
    assert(roundtrip(be(8)(_.putLong(Long.MaxValue)), Oid.Int8) == Long.MaxValue)
    assert(roundtrip(Array[Byte](1), Oid.Bool) == true)
    assert(roundtrip(Array[Byte](0), Oid.Bool) == false)
    assert(roundtrip(be(4)(_.putFloat(1.5f)), Oid.Float4) == 1.5f)
    // roundtrip-exact double: Java's toString is shortest-roundtrip
    assert(roundtrip(be(8)(_.putDouble(0.1)), Oid.Float8) == 0.1)
  }

  test("date and timestamps cast to the instants the bytes encode") {
    assert(roundtrip(be(4)(_.putInt(8992)), Oid.Date) ==
      java.sql.Date.valueOf("2024-08-14"))
    val us = 151496634123456L // 2004-10-19 10:23:54.123456 UTC
    val tz = roundtrip(be(8)(_.putLong(us)), Oid.Timestamptz)
    assert(tz.asInstanceOf[java.sql.Timestamp].getTime == (us + 946684800000000L) / 1000L,
      "timestamptz text parses back to the exact instant (session TZ is UTC)")
    val ntz = roundtrip(be(8)(_.putLong(us)), Oid.Timestamp)
    assert(ntz.toString == "2004-10-19T10:23:54.123456",
      "ntz wall-clock reading preserved")
  }

  test("numeric casts to the exact decimal; bytea and uuid survive") {
    val num = be(14) { b =>
      b.putShort(3); b.putShort(1); b.putShort(0); b.putShort(2)
      b.putShort(1); b.putShort(2345); b.putShort(6700)
    } // 12345.67
    assert(roundtrip(num, Oid.Numeric, typmod = ((10 << 16) | 2) + 4) ==
      new java.math.BigDecimal("12345.67"))
    assert(roundtrip(Array[Byte](0xde.toByte, 0xad.toByte), Oid.Bytea)
      .asInstanceOf[Array[Byte]].toSeq == Seq(0xde.toByte, 0xad.toByte))
    val u = be(16) { b => b.putLong(0x123e4567e89b12d3L); b.putLong(0xa456426614174000L) }
    assert(roundtrip(u, Oid.Uuid) == "123e4567-e89b-12d3-a456-426614174000")
  }
}
