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
    try decode(b, data, oid)
    catch {
      case _: java.nio.BufferUnderflowException =>
        // truncated frame: fail like every other wire decode, not with a
        // nio internal the caller has no reason to expect
        throw new graft.pgproto.PgProtoException(
          s"binary value for type OID $oid: short frame (${data.length} bytes)")
    }
  }

  private def decode(b: ByteBuffer, data: Array[Byte], oid: Long): String = {
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
      case Interval => intervalText(b.getLong, b.getInt, b.getInt)
      case a if PgTypes.arrayElementOid(a).isDefined => arrayText(b)
      case other => throw new graft.pgproto.PgProtoException(
        s"binary decode unsupported for type OID $other")
    }
  }

  /** array_send format: i32 ndim, i32 has-null flag, u32 element OID, then
    * per dimension (i32 length, i32 lower bound), then row-major elements as
    * i32 length (-1 = NULL) + element send-format bytes. Rendered to the
    * canonical `{...}` text form `array_out` produces (1-based bounds — the
    * `[lb:ub]=` prefix for exotic lower bounds is not reproduced), with
    * array_out's quoting rule, so [[graft.functions.PgTextArray]] round-trips
    * it exactly like a 't' column.
    */
  private def arrayText(b: ByteBuffer): String = {
    val ndim = b.getInt
    // pg's MAXDIM is 6 (src/include/utils/array.h); anything past it is a
    // corrupt frame, and trusting it would pre-allocate attacker-sized arrays.
    if (ndim < 0 || ndim > 6)
      throw new graft.pgproto.PgProtoException(
        s"binary array: implausible ndim $ndim (pg MAXDIM is 6)")
    b.getInt // has-null flag: redundant with the per-element -1 lengths
    val elemOid = b.getInt.toLong & 0xffffffffL
    val dims = Array.fill(ndim) {
      val n = b.getInt; b.getInt
      // each element costs ≥4 bytes (its length prefix), so a dimension can
      // never exceed remaining/4 — reject before the traversal allocates.
      if (n < 0 || n.toLong * 4L > b.remaining)
        throw new graft.pgproto.PgProtoException(
          s"binary array: dimension $n exceeds frame (${b.remaining} bytes left)")
      n
    }
    def level(d: Int): String =
      if (d == ndim - 1)
        (0 until dims(d)).map { _ =>
          val len = b.getInt
          if (len < 0) "NULL"
          else if (len > b.remaining)
            throw new graft.pgproto.PgProtoException(
              s"binary array: element length $len exceeds frame (${b.remaining} bytes left)")
          else {
            val bytes = new Array[Byte](len)
            b.get(bytes)
            quoteArrayElem(toText(bytes, elemOid))
          }
        }.mkString("{", ",", "}")
      else (0 until dims(d)).map(_ => level(d + 1)).mkString("{", ",", "}")
    if (ndim == 0) "{}" else level(0)
  }

  /** array_out quoting: an element is double-quoted (with `\`-escaped `"`
    * and `\`) when empty, spelled like NULL, or containing a brace, the
    * delimiter, a quote, a backslash, or whitespace.
    */
  private def quoteArrayElem(s: String): String =
    if (s.isEmpty || s.equalsIgnoreCase("null") ||
        s.exists(c => c == '{' || c == '}' || c == ',' || c == '"' ||
          c == '\\' || Character.isWhitespace(c)))
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c => c.toString
      }.mkString("\"", "", "\"")
    else s

  /** interval_send format: i64 microseconds, i32 days, i32 months — the
    * three fields do NOT normalize into each other (1 day ≠ 24 h across
    * DST). Rendered in pg's default `postgres` IntervalStyle:
    * `N year(s) N mon(s) N day(s) [-]HH:MM:SS[.ffffff]`, with the time part
    * printed when nonzero or when nothing else is.
    */
  private def intervalText(micros: Long, days: Int, months: Int): String = {
    val sb = new StringBuilder
    def unit(v: Int, name: String): Unit = if (v != 0) {
      if (sb.nonEmpty) sb.append(' ')
      sb.append(v).append(' ').append(name)
      if (v != 1) sb.append('s') // pg pluralizes every value but exactly 1

    }
    unit(months / 12, "year")
    unit(months % 12, "mon")
    unit(days, "day")
    if (micros != 0L || sb.isEmpty) {
      if (sb.nonEmpty) sb.append(' ')
      if (micros < 0L) sb.append('-')
      val a = math.abs(micros)
      val h = a / 3600000000L
      val m = a / 60000000L % 60
      val sec = a / 1000000L % 60
      val f = a % 1000000L
      sb.append(f"$h%02d:$m%02d:$sec%02d")
      if (f != 0L)
        sb.append('.').append(f"$f%06d".reverse.dropWhile(_ == '0').reverse)
    }
    sb.toString
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
