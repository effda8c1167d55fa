package graft.types

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import graft.pgproto.PgEpoch

/** Binary-format tuple column decode ('b' tag) for the common OIDs.
  *
  * The reference length-parses binary columns but never decodes them
  * (`pq/message/tuple/data.go:63-71` vs `DecodeWithColumn` handling only
  * 'n'/'t', `data.go:82-90`) because it never requests `binary: true` on its
  * publications. We go one better: each supported OID's binary send format
  * (public PostgreSQL wire knowledge: network byte order, µs-since-2000
  * timestamps, base-10000 numeric) is rendered to the SAME canonical text
  * form a 't' column would carry — so the rest of the pipeline (envelope
  * maps, [[PgTypes.fromText]], typed views) is format-agnostic.
  */
object PgBinary {
  import PgTypes.Oid._

  /** Decode one binary-format value to its text rendering. Unknown OIDs fail
    * loudly — silently mis-decoding bytes as UTF-8 would corrupt data.
    */
  def toText(data: Array[Byte], oid: Long): String = {
    if (data == null) return null
    val b = ByteBuffer.wrap(data) // big-endian by default: the wire order
    oid match {
      case Bool => if (data(0) != 0) "t" else "f"
      case Int2 => b.getShort.toString
      case Int4 => b.getInt.toString
      case Int8 => b.getLong.toString
      case OidT => (b.getInt.toLong & 0xffffffffL).toString
      case Float4 => floatText(b.getFloat)
      case Float8 => doubleText(b.getDouble)
      case Text | Varchar | BpChar | Name | Char | Json | Xml =>
        new String(data, UTF_8)
      case Jsonb => // versioned: 1-byte version header, then the JSON text
        new String(data, 1, data.length - 1, UTF_8)
      case Bytea => "\\x" + data.map(x => f"$x%02x").mkString
      case Uuid => new java.util.UUID(b.getLong, b.getLong).toString
      case Date => // int32 days since 2000-01-01
        java.time.LocalDate.ofEpochDay(b.getInt.toLong + PgEpochDays).toString
      case Timestamp => timestampText(b.getLong)
      case Timestamptz => timestampText(b.getLong) + "+00"
      case Numeric => numericText(b)
      case other => throw new graft.pgproto.PgProtoException(
        s"binary decode unsupported for type OID $other")
    }
  }

  /** Days between the Unix epoch and 2000-01-01 (the date wire epoch). */
  private val PgEpochDays: Long = PgEpoch.UnixOffsetMicros / 86400000000L

  /** µs since 2000-01-01 → `yyyy-MM-dd HH:mm:ss[.ffffff]` (UTC wall time —
    * binary timestamptz is an absolute instant; ntz is a wall reading).
    */
  private def timestampText(pgMicros: Long): String = {
    val unixUs = PgEpoch.toUnixMicros(pgMicros)
    val secs = Math.floorDiv(unixUs, 1000000L)
    val micros = Math.floorMod(unixUs, 1000000L)
    val ldt = java.time.LocalDateTime.ofEpochSecond(secs, 0, java.time.ZoneOffset.UTC)
    val base = f"${ldt.getYear}%04d-${ldt.getMonthValue}%02d-${ldt.getDayOfMonth}%02d " +
      f"${ldt.getHour}%02d:${ldt.getMinute}%02d:${ldt.getSecond}%02d"
    if (micros == 0L) base
    else base + "." + f"$micros%06d".reverse.dropWhile(_ == '0').reverse
  }

  /** Float text: pg prints shortest-roundtrip; Java's toString is also
    * roundtrip-exact, and both parse identically downstream. Specials match
    * pg's spelling so `cast` sees the forms it knows.
    */
  private def floatText(f: Float): String =
    if (f.isNaN) "NaN"
    else if (f == Float.PositiveInfinity) "Infinity"
    else if (f == Float.NegativeInfinity) "-Infinity"
    else f.toString

  private def doubleText(d: Double): String =
    if (d.isNaN) "NaN"
    else if (d == Double.PositiveInfinity) "Infinity"
    else if (d == Double.NegativeInfinity) "-Infinity"
    else d.toString

  /** numeric binary format: u16 ndigits, i16 weight (base-10000 exponent of
    * the FIRST digit group), u16 sign (0x0000 +, 0x4000 -, 0xC000 NaN),
    * u16 dscale, then ndigits × u16 base-10000 groups.
    */
  private def numericText(b: ByteBuffer): String = {
    val ndigits = b.getShort & 0xffff
    val weight = b.getShort.toInt
    val sign = b.getShort & 0xffff
    val dscale = b.getShort & 0xffff
    if (sign == 0xC000) return "NaN"
    val digits = Array.fill(ndigits)(b.getShort & 0xffff)
    val sb = new StringBuilder(if (sign == 0x4000) "-" else "")
    if (weight >= 0) {
      var g = 0
      while (g <= weight) {
        val d = if (g < ndigits) digits(g) else 0
        if (g == 0) sb.append(d.toString) else sb.append(f"$d%04d")
        g += 1
      }
    } else sb.append('0')
    if (dscale > 0) {
      sb.append('.')
      val frac = new StringBuilder
      var g = math.max(weight + 1, 0)
      // groups between the point and the first stored fractional group are 0
      frac.append("0000" * math.max(0, -(weight + 1)))
      while (frac.length < dscale) {
        val d = if (g < ndigits) digits(g) else 0
        frac.append(f"$d%04d")
        g += 1
      }
      sb.append(frac.substring(0, dscale))
    }
    sb.toString
  }
}
