package graft.pgproto

import java.io.{DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal PostgreSQL frontend/backend message framing — just the subset a
  * logical-replication client and its test harness need (startup, simple
  * query, CopyBoth). Layouts follow the public PostgreSQL protocol docs
  * ("Frontend/Backend Protocol → Message Formats"); the reference drives the
  * same message flow through its pgproto dependency
  * (`pq/replication/replication.go:23-41`, `pq/system.go:13-70`).
  *
  * Framing: every message after startup is `tag(1) + int32 length + body`,
  * where length counts itself but not the tag. The startup message has no
  * tag: `int32 length + int32 protocol(196608) + "k\0v\0"... + \0`.
  */
object PgWire {

  val ProtocolVersion3 = 196608 // 3.0

  // Backend message tags this layer understands.
  object Tag {
    val Authentication: Byte = 'R'
    val ParameterStatus: Byte = 'S'
    val BackendKeyData: Byte = 'K'
    val ReadyForQuery: Byte = 'Z'
    val RowDescription: Byte = 'T'
    val DataRow: Byte = 'D'
    val CommandComplete: Byte = 'C'
    val CopyBothResponse: Byte = 'W'
    val CopyInResponse: Byte = 'G'
    val CopyData: Byte = 'd'
    val CopyDone: Byte = 'c'
    val ErrorResponse: Byte = 'E'
    val NoticeResponse: Byte = 'N'
    // Frontend tags
    val Query: Byte = 'Q'
    val PasswordMessage: Byte = 'p'
    val Terminate: Byte = 'X'
  }

  final case class Message(tag: Byte, payload: Array[Byte])

  /** Read one tagged message (blocks). Throws EOFException at stream end. */
  /** Largest message body accepted from the peer: PostgreSQL's own field
    * limit is 1 GiB, so nothing a real server sends exceeds this — but a
    * corrupt length header otherwise pre-allocates up to 2 GiB on trust.
    */
  final val MaxMessageBytes: Int = 1 << 30

  def readMessage(in: DataInputStream): Message = {
    val tag = in.readByte()
    val len = in.readInt()
    require(len >= 4 && len - 4 <= MaxMessageBytes,
      s"pgwire: bad message length $len for tag '${tag.toChar}'")
    val payload = new Array[Byte](len - 4)
    in.readFully(payload)
    Message(tag, payload)
  }

  def writeMessage(out: DataOutputStream, tag: Byte, payload: Array[Byte]): Unit = {
    out.writeByte(tag)
    out.writeInt(payload.length + 4)
    out.write(payload)
    out.flush()
  }

  /** Untagged startup message: protocol 3.0 + null-terminated k/v pairs. A
    * replication connection passes `replication -> database`
    * (public docs "Protocol Replication"; reference connector config).
    */
  def writeStartup(out: DataOutputStream, params: Seq[(String, String)]): Unit = {
    val body = new java.io.ByteArrayOutputStream()
    val d = new DataOutputStream(body)
    d.writeInt(ProtocolVersion3)
    params.foreach { case (k, v) =>
      d.write(k.getBytes(UTF_8)); d.write(0)
      d.write(v.getBytes(UTF_8)); d.write(0)
    }
    d.write(0)
    out.writeInt(body.size() + 4)
    body.writeTo(out)
    out.flush()
  }

  /** Read the startup message on the server side: (protocolVersion, params). */
  def readStartup(in: DataInputStream): (Int, Map[String, String]) = {
    val len = in.readInt()
    readStartupBody(in, len)
  }

  /** Startup body when the int32 length was already consumed (a server that
    * peeked for SSLRequest).
    */
  def readStartupBody(in: DataInputStream, len: Int): (Int, Map[String, String]) = {
    val body = new Array[Byte](len - 4)
    in.readFully(body)
    val proto = ((body(0) & 0xff) << 24) | ((body(1) & 0xff) << 16) |
      ((body(2) & 0xff) << 8) | (body(3) & 0xff)
    val params = Map.newBuilder[String, String]
    var i = 4
    def cstr(): String = {
      val start = i
      while (i < body.length && body(i) != 0) i += 1
      val s = new String(body, start, i - start, UTF_8)
      i += 1
      s
    }
    while (i < body.length && body(i) != 0) {
      val k = cstr()
      params += k -> cstr()
    }
    (proto, params.result())
  }

  def queryPayload(sql: String): Array[Byte] = {
    val b = sql.getBytes(UTF_8)
    val out = java.util.Arrays.copyOf(b, b.length + 1)
    out
  }

  def parseQuery(payload: Array[Byte]): String = {
    val end = payload.indexOf(0.toByte) match { case -1 => payload.length; case n => n }
    new String(payload, 0, end, UTF_8)
  }

  /** AuthenticationOk / AuthenticationCleartextPassword payloads ('R'). */
  val AuthOk: Array[Byte] = Array[Byte](0, 0, 0, 0)
  val AuthCleartextPassword: Array[Byte] = Array[Byte](0, 0, 0, 3)
  def authCode(payload: Array[Byte]): Int =
    ((payload(0) & 0xff) << 24) | ((payload(1) & 0xff) << 16) |
      ((payload(2) & 0xff) << 8) | (payload(3) & 0xff)

  // SASL authentication sub-messages (all tag 'R'; "Message Flow → SASL
  // Authentication"): 10 = AuthenticationSASL (mechanism list), 11 =
  // AuthenticationSASLContinue, 12 = AuthenticationSASLFinal.
  val AuthCodeSasl = 10
  val AuthCodeSaslContinue = 11
  val AuthCodeSaslFinal = 12

  private def int32be(v: Int): Array[Byte] =
    Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  /** AuthenticationSASL payload: code 10 + null-terminated mechanism names
    * + a final NUL terminating the list.
    */
  def authSaslPayload(mechanisms: Seq[String]): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    b.write(int32be(AuthCodeSasl), 0, 4)
    mechanisms.foreach { m => b.write(m.getBytes(UTF_8), 0, m.length); b.write(0) }
    b.write(0)
    b.toByteArray
  }

  /** Mechanism names from an AuthenticationSASL payload. */
  def authSaslMechanisms(payload: Array[Byte]): Seq[String] = {
    val names = Seq.newBuilder[String]
    var i = 4
    while (i < payload.length && payload(i) != 0) {
      val start = i
      while (i < payload.length && payload(i) != 0) i += 1
      names += new String(payload, start, i - start, UTF_8)
      i += 1
    }
    names.result()
  }

  /** SASL continue/final payload (code + raw SASL message bytes). */
  def authSaslDataPayload(code: Int, data: Array[Byte]): Array[Byte] =
    int32be(code) ++ data

  /** The SASL message bytes after the int32 code. */
  def authSaslData(payload: Array[Byte]): Array[Byte] =
    java.util.Arrays.copyOfRange(payload, 4, payload.length)

  /** SASLInitialResponse payload ('p'): mechanism name NUL-terminated +
    * int32 byte length of the initial client response + those bytes.
    * (Subsequent SASLResponse messages are the raw SASL bytes, no header.)
    */
  def saslInitialResponsePayload(mechanism: String, response: Array[Byte]): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    b.write(mechanism.getBytes(UTF_8), 0, mechanism.length)
    b.write(0)
    b.write(int32be(response.length), 0, 4)
    b.write(response, 0, response.length)
    b.toByteArray
  }

  /** Parse a SASLInitialResponse payload: (mechanism, initial response). */
  def parseSaslInitialResponse(payload: Array[Byte]): (String, Array[Byte]) = {
    var i = 0
    while (i < payload.length && payload(i) != 0) i += 1
    val mech = new String(payload, 0, i, UTF_8)
    i += 1
    val len = ((payload(i) & 0xff) << 24) | ((payload(i + 1) & 0xff) << 16) |
      ((payload(i + 2) & 0xff) << 8) | (payload(i + 3) & 0xff)
    i += 4
    val data = if (len < 0) Array.emptyByteArray
      else java.util.Arrays.copyOfRange(payload, i, i + len)
    (mech, data)
  }

  /** ReadyForQuery payload: one transaction-status byte ('I' idle). */
  val ReadyIdle: Array[Byte] = Array[Byte]('I')

  /** Text-format DataRow payload: int16 ncols + per-col int32 len + bytes
    * (-1 for NULL).
    */
  def dataRowPayload(values: Seq[Option[String]]): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    val d = new DataOutputStream(body)
    d.writeShort(values.length)
    values.foreach {
      case Some(v) =>
        val b = v.getBytes(UTF_8)
        d.writeInt(b.length); d.write(b)
      case None => d.writeInt(-1)
    }
    body.toByteArray
  }

  def parseDataRow(payload: Array[Byte]): Seq[Option[String]] = {
    val in = new ByteReader(payload, 0)
    val n = in.readUint16("ncols")
    (0 until n).map { _ =>
      val len = in.readUint32("col len").toInt
      if (len == -1 || len == 0xffffffff.toInt) None
      else Some(new String(in.readBytes(len, "col bytes"), UTF_8))
    }
  }

  /** Minimal text-format RowDescription for the fake server: every column
    * typed as text (oid 25).
    */
  def rowDescriptionPayload(names: Seq[String]): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    val d = new DataOutputStream(body)
    d.writeShort(names.length)
    names.foreach { n =>
      d.write(n.getBytes(UTF_8)); d.write(0)
      d.writeInt(0) // table oid
      d.writeShort(0) // attnum
      d.writeInt(25) // type oid: text
      d.writeShort(-1) // typlen
      d.writeInt(-1) // typmod
      d.writeShort(0) // text format
    }
    body.toByteArray
  }

  /** CopyBothResponse payload: overall text format, ncols 0. */
  val CopyBothAllText: Array[Byte] = Array[Byte](0, 0, 0)

  /** CopyInResponse payload: int8 overall format (0 = text), int16 column
    * count, int16 per-column format codes (all text).
    */
  def copyInResponsePayload(numCols: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(3 + 2 * numCols)
    b.put(0.toByte).putShort(numCols.toShort)
    (0 until numCols).foreach(_ => b.putShort(0))
    b.array()
  }

  /** First field ('M' message, 'S' severity, 'C' code...) of an
    * ErrorResponse payload, for diagnostics.
    */
  def errorFields(payload: Array[Byte]): Map[Char, String] = {
    val out = Map.newBuilder[Char, String]
    var i = 0
    while (i < payload.length && payload(i) != 0) {
      val tag = payload(i).toChar
      i += 1
      val start = i
      while (i < payload.length && payload(i) != 0) i += 1
      out += tag -> new String(payload, start, i - start, UTF_8)
      i += 1
    }
    out.result()
  }

  def errorPayload(severity: String, code: String, message: String): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    def field(tag: Char, v: String): Unit = {
      body.write(tag)
      body.write(v.getBytes(UTF_8)); body.write(0)
    }
    field('S', severity); field('C', code); field('M', message)
    body.write(0)
    body.toByteArray
  }
}
