package graft.pgproto

/** Big-endian (network order) cursor over a pgoutput frame.
  *
  * All pgoutput integers are network order; strings are NUL-terminated
  * (see PostgreSQL docs "Logical Streaming Replication Protocol"). Length
  * under-runs raise [[PgProtoException]] — the reference returns
  * `ErrorByteSlice`-style errors on short frames (e.g.
  * `pq/message/format/insert.go` length checks); we fail the same way.
  */
final class ByteReader(buf: Array[Byte], private var pos: Int = 0) {
  def remaining: Int = buf.length - pos
  def offset: Int = pos

  private def need(n: Int, what: String): Unit =
    if (remaining < n)
      throw new PgProtoException(
        s"short frame: need $n bytes for $what at offset $pos, have $remaining")

  def readByte(what: String = "byte"): Byte = { need(1, what); val b = buf(pos); pos += 1; b }

  def readUint8(what: String = "uint8"): Int = readByte(what) & 0xff

  def readUint16(what: String = "uint16"): Int = {
    need(2, what)
    val v = ((buf(pos) & 0xff) << 8) | (buf(pos + 1) & 0xff)
    pos += 2; v
  }

  def readUint32(what: String = "uint32"): Long = {
    need(4, what)
    var v = 0L
    var i = 0
    while (i < 4) { v = (v << 8) | (buf(pos + i) & 0xffL); i += 1 }
    pos += 4; v
  }

  def readUint64(what: String = "uint64"): Long = {
    need(8, what)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (buf(pos + i) & 0xffL); i += 1 }
    pos += 8; v
  }

  /** NUL-terminated UTF-8 string. */
  def readCString(what: String = "cstring"): String = {
    var end = pos
    while (end < buf.length && buf(end) != 0) end += 1
    if (end >= buf.length)
      throw new PgProtoException(s"unterminated cstring for $what at offset $pos")
    val s = new String(buf, pos, end - pos, java.nio.charset.StandardCharsets.UTF_8)
    pos = end + 1
    s
  }

  def readBytes(n: Int, what: String = "bytes"): Array[Byte] = {
    if (n < 0)
      throw new PgProtoException(
        s"negative length $n for $what at offset $pos")
    need(n, what)
    val out = java.util.Arrays.copyOfRange(buf, pos, pos + n)
    pos += n
    out
  }
}

class PgProtoException(msg: String) extends RuntimeException(msg)
