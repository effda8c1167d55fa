package graft.types

import org.scalatest.funsuite.AnyFunSuite
import java.nio.ByteBuffer
import graft.types.PgTypes.Oid

/** Golden-bytes spec for binary-format ('b') column decode — each case is
  * the exact big-endian send-format bytes PostgreSQL emits for the value,
  * asserted against the canonical text the decoder must render (the same
  * text a 't' column would carry). The reference never decodes binary
  * (`pq/message/tuple/data.go:63-71`); these pin our beyond-parity path.
  */
class PgBinarySpec extends AnyFunSuite {

  private def be(n: Int)(fill: ByteBuffer => Unit): Array[Byte] = {
    val b = ByteBuffer.allocate(n); fill(b); b.array()
  }

  test("integers and bool") {
    assert(PgBinary.toText(Array[Byte](1), Oid.Bool) == "t")
    assert(PgBinary.toText(Array[Byte](0), Oid.Bool) == "f")
    assert(PgBinary.toText(be(2)(_.putShort(-42)), Oid.Int2) == "-42")
    assert(PgBinary.toText(be(4)(_.putInt(123456789)), Oid.Int4) == "123456789")
    assert(PgBinary.toText(be(8)(_.putLong(-9007199254740993L)), Oid.Int8) == "-9007199254740993")
    assert(PgBinary.toText(be(8)(_.putLong(Long.MinValue)), Oid.Int8) == Long.MinValue.toString)
    // oid is unsigned 32-bit
    assert(PgBinary.toText(be(4)(_.putInt(0xfffffffe)), Oid.OidT) == "4294967294")
  }

  test("floats incl. specials") {
    assert(PgBinary.toText(be(4)(_.putFloat(1.5f)), Oid.Float4) == "1.5")
    assert(PgBinary.toText(be(8)(_.putDouble(-2.25)), Oid.Float8) == "-2.25")
    assert(PgBinary.toText(be(8)(_.putDouble(Double.NaN)), Oid.Float8) == "NaN")
    assert(PgBinary.toText(be(4)(_.putFloat(Float.NegativeInfinity)), Oid.Float4) == "-Infinity")
  }

  test("uuid, bytea, text family, jsonb version header") {
    val u = be(16) { b =>
      b.putLong(0x123e4567e89b12d3L); b.putLong(0xa456426614174000L)
    }
    assert(PgBinary.toText(u, Oid.Uuid) == "123e4567-e89b-12d3-a456-426614174000")
    assert(PgBinary.toText(Array[Byte](0xde.toByte, 0xad.toByte, 0xbe.toByte, 0xef.toByte),
      Oid.Bytea) == "\\xdeadbeef")
    assert(PgBinary.toText("héllo".getBytes("UTF-8"), Oid.Text) == "héllo")
    // jsonb binary = 1-byte version (1) + json text
    assert(PgBinary.toText((1.toByte +: """{"a":1}""".getBytes("UTF-8")).toArray,
      Oid.Jsonb) == """{"a":1}""")
  }

  test("date and timestamps use the 2000-01-01 wire epoch") {
    assert(PgBinary.toText(be(4)(_.putInt(0)), Oid.Date) == "2000-01-01")
    assert(PgBinary.toText(be(4)(_.putInt(8992)), Oid.Date) == "2024-08-14")
    assert(PgBinary.toText(be(4)(_.putInt(-1)), Oid.Date) == "1999-12-31")
    // 2004-10-19 10:23:54.123456 UTC = 151496634123456 µs after 2000-01-01
    val us = 151496634123456L
    assert(PgBinary.toText(be(8)(_.putLong(us)), Oid.Timestamp) ==
      "2004-10-19 10:23:54.123456")
    assert(PgBinary.toText(be(8)(_.putLong(us)), Oid.Timestamptz) ==
      "2004-10-19 10:23:54.123456+00")
    // whole seconds drop the fraction; trailing zeros trim
    assert(PgBinary.toText(be(8)(_.putLong(0L)), Oid.Timestamp) == "2000-01-01 00:00:00")
    assert(PgBinary.toText(be(8)(_.putLong(1500000L)), Oid.Timestamp) ==
      "2000-01-01 00:00:01.5")
    // pre-epoch: floor division, not truncation
    assert(PgBinary.toText(be(8)(_.putLong(-500000L)), Oid.Timestamp) ==
      "1999-12-31 23:59:59.5")
  }

  test("numeric: base-10000 groups, weight, dscale, sign, NaN") {
    def num(weight: Int, sign: Int, dscale: Int, digits: Int*): Array[Byte] =
      be(8 + 2 * digits.size) { b =>
        b.putShort(digits.size.toShort); b.putShort(weight.toShort)
        b.putShort(sign.toShort); b.putShort(dscale.toShort)
        digits.foreach(d => b.putShort(d.toShort))
      }
    assert(PgBinary.toText(num(0, 0, 0, 42), Oid.Numeric) == "42")
    assert(PgBinary.toText(num(1, 0, 2, 1, 2345, 6700), Oid.Numeric) == "12345.67")
    assert(PgBinary.toText(num(0, 0x4000, 2, 5), Oid.Numeric) == "-5.00")
    // 0.0001: weight -1, one group of 1, dscale 4
    assert(PgBinary.toText(num(-1, 0, 4, 1), Oid.Numeric) == "0.0001")
    // 5e-8: weight -2 (one zero group between point and first stored group)
    assert(PgBinary.toText(num(-2, 0, 8, 5), Oid.Numeric) == "0.00000005")
    // trailing groups beyond ndigits are zero: 12340000 (weight 1, one group)
    assert(PgBinary.toText(num(1, 0, 0, 1234), Oid.Numeric) == "12340000")
    assert(PgBinary.toText(num(0, 0xC000, 0), Oid.Numeric) == "NaN")
    // zero
    assert(PgBinary.toText(num(0, 0, 0), Oid.Numeric) == "0")
  }

  test("interval: µs/days/months fields, postgres IntervalStyle") {
    def iv(us: Long, days: Int, months: Int): Array[Byte] =
      be(16) { b => b.putLong(us); b.putInt(days); b.putInt(months) }
    assert(PgBinary.toText(iv(0L, 0, 0), Oid.Interval) == "00:00:00")
    // 1 year 2 mons 3 days 04:05:06.789
    assert(PgBinary.toText(iv(14706789000L, 3, 14), Oid.Interval) ==
      "1 year 2 mons 3 days 04:05:06.789")
    // fields do not normalize: 25h stays on the clock part
    assert(PgBinary.toText(iv(90000000000L, 0, 0), Oid.Interval) == "25:00:00")
    // negative components pluralize like pg (only exactly 1 is singular)
    assert(PgBinary.toText(iv(-3600000000L, -1, -12), Oid.Interval) ==
      "-1 years -1 days -01:00:00")
    // days-only: no trailing zero clock
    assert(PgBinary.toText(iv(0L, 7, 0), Oid.Interval) == "7 days")
  }

  test("arrays: header, NULL elements, nesting, quoting") {
    // int4[] {1,NULL,3}: ndim=1, hasnull=1, elem oid 23, dim (3, lb 1)
    val i4 = be(4 + 4 + 4 + 8 + (4 + 4) + 4 + (4 + 4)) { b =>
      b.putInt(1); b.putInt(1); b.putInt(23)
      b.putInt(3); b.putInt(1)
      b.putInt(4); b.putInt(1)
      b.putInt(-1)
      b.putInt(4); b.putInt(3)
    }
    assert(PgBinary.toText(i4, Oid.Int4Arr) == "{1,NULL,3}")
    // text[] with array_out quoting: comma, quote+backslash, empty, literal NULL
    def tElem(s: String): Array[Byte] = {
      val raw = s.getBytes("UTF-8")
      be(4 + raw.length) { b => b.putInt(raw.length); b.put(raw) }
    }
    val elems = Seq("a,b", "say \"hi\"\\", "", "NULL", "plain")
    val tx = be(16 + 8 + elems.map(e => 4 + e.getBytes("UTF-8").length).sum) { b =>
      b.putInt(1); b.putInt(0); b.putInt(25)
      b.putInt(elems.size); b.putInt(1)
      elems.foreach(e => b.put(tElem(e)))
    }
    assert(PgBinary.toText(tx, Oid.TextArr) ==
      """{"a,b","say \"hi\"\\","","NULL",plain}""")
    // 2-D int8[]: {{1,2},{3,4}} — row-major elements
    val i8 = be(4 + 4 + 4 + 16 + 4 * (4 + 8)) { b =>
      b.putInt(2); b.putInt(0); b.putInt(20)
      b.putInt(2); b.putInt(1); b.putInt(2); b.putInt(1)
      Seq(1L, 2L, 3L, 4L).foreach { v => b.putInt(8); b.putLong(v) }
    }
    assert(PgBinary.toText(i8, Oid.Int8Arr) == "{{1,2},{3,4}}")
    // empty array: ndim=0, no dims
    val empty = be(12) { b => b.putInt(0); b.putInt(0); b.putInt(23) }
    assert(PgBinary.toText(empty, Oid.Int4Arr) == "{}")
  }

  test("binary array text round-trips through the pg array parser") {
    // the rendered form must parse back through PgTextArray exactly like a
    // 't' column would (quoted NULL is the string; bare NULL is SQL null)
    val elems = Seq("a,b", "say \"hi\"\\", "", "NULL", "plain")
    val tx = be(16 + 8 + elems.map(e => 4 + e.getBytes("UTF-8").length).sum) { b =>
      b.putInt(1); b.putInt(0); b.putInt(25)
      b.putInt(elems.size); b.putInt(1)
      elems.foreach { e =>
        val raw = e.getBytes("UTF-8"); b.putInt(raw.length); b.put(raw)
      }
    }
    val parsed = graft.functions.PgTextArray.parse(PgBinary.toText(tx, Oid.TextArr))
    assert(parsed.toSeq == elems)
  }

  test("corrupt frames fail with PgProtoException, never with allocation") {
    import graft.pgproto.PgProtoException
    // truncated scalar: 2 bytes where int8 needs 8 — uniform wire error,
    // not a leaked java.nio BufferUnderflowException
    val short = intercept[PgProtoException](
      PgBinary.toText(Array[Byte](1, 2), Oid.Int8))
    assert(short.getMessage.contains("short frame"))

    // implausible ndim (pg MAXDIM is 6): must reject BEFORE sizing any
    // dimension array off attacker-controlled bytes
    val hugeNdim = be(12) { b => b.putInt(0x7fffffff); b.putInt(0); b.putInt(25) }
    val nd = intercept[PgProtoException](PgBinary.toText(hugeNdim, Oid.TextArr))
    assert(nd.getMessage.contains("ndim"))

    // dimension length far beyond the frame: rejected by the ≥4-bytes-per-
    // element bound, again before any element traversal
    val hugeDim = be(24) { b =>
      b.putInt(1); b.putInt(0); b.putInt(25); b.putInt(0x10000000); b.putInt(1)
    }
    val dm = intercept[PgProtoException](PgBinary.toText(hugeDim, Oid.TextArr))
    assert(dm.getMessage.contains("dimension"))

    // element length claiming 2 GB with 4 bytes left: rejected pre-allocation
    val hugeElem = be(28) { b =>
      b.putInt(1); b.putInt(0); b.putInt(25); b.putInt(1); b.putInt(1)
      b.putInt(0x7ffffff0)
    }
    val el = intercept[PgProtoException](PgBinary.toText(hugeElem, Oid.TextArr))
    assert(el.getMessage.contains("element length"))

    // tuple column with length 0xFFFFFFFF (-1 after toInt): the reader
    // rejects negative lengths instead of tripping copyOfRange internals
    val tup = be(11) { b =>
      b.putShort(1); b.put('t'.toByte); b.putInt(0xffffffff)
    }
    val tl = intercept[PgProtoException](
      graft.pgproto.TupleData.read(new graft.pgproto.ByteReader(tup)))
    assert(tl.getMessage.contains("negative length"))
  }

  test("NULL passes through; unknown OID fails loudly") {
    assert(PgBinary.toText(null, Oid.Int4) == null)
    val ex = intercept[graft.pgproto.PgProtoException](
      PgBinary.toText(Array[Byte](1, 2), 790L)) // money: not supported
    assert(ex.getMessage.contains("790"))
  }

  test("binary tuple columns decode through the assembler envelope map") {
    // End-to-end through TupleData + the envelope: an INSERT whose tuple
    // carries one binary int8 and one binary timestamptz next to a text col.
    import graft.pgproto.TupleData
    val cols = Array(
      TupleData.Col(TupleData.TagBinary,
        be(8)(_.putLong(77L))),
      TupleData.Col(TupleData.TagText, "plain".getBytes("UTF-8")),
      TupleData.Col(TupleData.TagBinary,
        be(8)(_.putLong(151496634123456L))))
    val rel = graft.pgproto.Messages.Relation(
      xid = 0L, oid = 55L, namespace = "public", name = "t",
      replicaIdentity = 'd'.toByte,
      columns = Array(
        graft.pgproto.Messages.RelationColumn("id", Oid.Int8, -1, 1),
        graft.pgproto.Messages.RelationColumn("label", Oid.Text, -1, 0),
        graft.pgproto.Messages.RelationColumn("at", Oid.Timestamptz, -1, 0)))
    val asm = new graft.cdc.TransactionAssembler()
    val m = asm.tupleToMap(rel, TupleData.Tuple(cols))
    asm.close()
    assert(m("id") == "77")
    assert(m("label") == "plain")
    assert(m("at") == "2004-10-19 10:23:54.123456+00")
  }
}
