package graft.streaming

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.net.Socket
import java.util.concurrent.ArrayBlockingQueue
import graft.pgproto.{Lsn, PgWire, WalFrames}
import graft.services.Replication

/** [[WalSource]] over a real walsender socket: startup handshake (with
  * `replication=database`), `IDENTIFY_SYSTEM`, then `START_REPLICATION ...
  * LOGICAL` into CopyBoth mode — CopyData frames in, standby status updates
  * out. The production binding of S1 (reference
  * `pq/replication/replication.go:23-41`, `stream.go:93-148`).
  *
  * Threading: one reader thread drains the socket into a BOUNDED queue
  * (default 1024 payloads, the reference's channel capacity,
  * `stream.go:93`); when the consumer stops polling the queue fills, the
  * reader blocks, the kernel buffer fills, and the walsender sees TCP
  * backpressure — the second half of the driver-side backlog cap. One
  * writer lock serializes status updates (acks, keepalive replies) against
  * the shared output stream — the reference's shared-socket mutex hazard
  * (`stream.go:73-84`) solved by construction.
  *
  * `open(fromLsn)` (re)connects from scratch and starts replication at the
  * confirmed LSN — exactly the resume semantics the file/in-memory feeds
  * emulate with [[ResumeFilter]]; on a real server the slot's restart point
  * makes whole transactions committing after the LSN replay.
  */
final class SocketWalSource(
    host: String,
    port: Int,
    user: String,
    database: String,
    slot: String,
    publication: String,
    protoVersion: Int = 2,
    password: Option[String] = None,
    queueCapacity: Int = 1024) extends WalSource {

  @volatile private var confirmed: Long = Lsn.Zero
  @volatile private var socket: Socket = null
  private var in: DataInputStream = null
  private var out: DataOutputStream = null
  private val writeLock = new Object
  private var reader: Thread = null
  private val queue = new ArrayBlockingQueue[Array[Byte]](queueCapacity)
  @volatile private var streamEnded = false
  @volatile private var failure: Throwable = null

  /** Result of the IDENTIFY_SYSTEM handshake, available after open(). */
  @volatile var identity: Replication.IdentifySystemResult = null

  override def open(fromLsn: Long): Unit = {
    close()
    queue.clear()
    streamEnded = false
    failure = null
    if (Lsn.compare(fromLsn, confirmed) > 0) confirmed = fromLsn

    socket = new Socket(host, port)
    socket.setTcpNoDelay(true)
    in = new DataInputStream(new BufferedInputStream(socket.getInputStream))
    out = new DataOutputStream(new BufferedOutputStream(socket.getOutputStream))

    handshake()
    identity = identifySystem()
    startReplication(confirmed)

    reader = new Thread(() => readLoop(), s"pgcdc-walsender-reader-$slot")
    reader.setDaemon(true)
    reader.start()
  }

  private def handshake(): Unit = {
    PgWire.writeStartup(out, Seq(
      "user" -> user,
      "database" -> database,
      "replication" -> "database",
      "application_name" -> "graft-pgcdc"))
    var ready = false
    while (!ready) {
      val m = PgWire.readMessage(in)
      m.tag match {
        case PgWire.Tag.Authentication =>
          PgWire.authCode(m.payload) match {
            case 0 => // AuthenticationOk
            case 3 =>
              val pw = password.getOrElse(
                throw new IllegalStateException("pgcdc: server requires a password, none configured"))
              PgWire.writeMessage(out, PgWire.Tag.PasswordMessage, PgWire.queryPayload(pw))
            case other =>
              throw new IllegalStateException(s"pgcdc: unsupported authentication method $other")
          }
        case PgWire.Tag.ParameterStatus | PgWire.Tag.BackendKeyData | PgWire.Tag.NoticeResponse =>
        case PgWire.Tag.ReadyForQuery => ready = true
        case PgWire.Tag.ErrorResponse => throw serverError("startup", m.payload)
        case other =>
          throw new IllegalStateException(s"pgcdc: unexpected message '${other.toChar}' during startup")
      }
    }
  }

  /** Simple-query IDENTIFY_SYSTEM: RowDescription + one DataRow + Ready. */
  private def identifySystem(): Replication.IdentifySystemResult = {
    PgWire.writeMessage(out, PgWire.Tag.Query, PgWire.queryPayload(Replication.IdentifySystemSql))
    var row: Seq[Option[String]] = null
    var ready = false
    while (!ready) {
      val m = PgWire.readMessage(in)
      m.tag match {
        case PgWire.Tag.RowDescription | PgWire.Tag.CommandComplete | PgWire.Tag.NoticeResponse =>
        case PgWire.Tag.DataRow => row = PgWire.parseDataRow(m.payload)
        case PgWire.Tag.ReadyForQuery => ready = true
        case PgWire.Tag.ErrorResponse => throw serverError("IDENTIFY_SYSTEM", m.payload)
        case other =>
          throw new IllegalStateException(s"pgcdc: unexpected message '${other.toChar}' in IDENTIFY_SYSTEM")
      }
    }
    row match {
      case Seq(Some(sysId), Some(tli), Some(pos), db) =>
        Replication.IdentifySystemResult(sysId, tli.toInt, Lsn.parse(pos), db.orNull)
      case other =>
        throw new IllegalStateException(s"pgcdc: malformed IDENTIFY_SYSTEM row $other")
    }
  }

  /** Issue START_REPLICATION and wait for CopyBothResponse. */
  private def startReplication(fromLsn: Long): Unit = {
    val sql = Replication.startReplicationSql(publication, slot, fromLsn, protoVersion)
    PgWire.writeMessage(out, PgWire.Tag.Query, PgWire.queryPayload(sql))
    var copyBoth = false
    while (!copyBoth) {
      val m = PgWire.readMessage(in)
      m.tag match {
        case PgWire.Tag.CopyBothResponse => copyBoth = true
        case PgWire.Tag.NoticeResponse | PgWire.Tag.ParameterStatus =>
        case PgWire.Tag.ErrorResponse => throw serverError("START_REPLICATION", m.payload)
        case other =>
          throw new IllegalStateException(
            s"pgcdc: expected CopyBothResponse, got '${other.toChar}'")
      }
    }
  }

  /** Reader thread: CopyData payloads ('w'/'k' frames) into the bounded
    * queue. `put` blocking on a full queue IS the backpressure mechanism.
    */
  private def readLoop(): Unit =
    try {
      var running = true
      while (running) {
        val m = PgWire.readMessage(in)
        m.tag match {
          case PgWire.Tag.CopyData => queue.put(m.payload)
          case PgWire.Tag.CopyDone | PgWire.Tag.CommandComplete | PgWire.Tag.ReadyForQuery =>
            running = false
          case PgWire.Tag.NoticeResponse | PgWire.Tag.ParameterStatus =>
          case PgWire.Tag.ErrorResponse =>
            failure = serverError("replication stream", m.payload)
            running = false
          case other =>
            failure = new IllegalStateException(
              s"pgcdc: unexpected message '${other.toChar}' in CopyBoth stream")
            running = false
        }
      }
      streamEnded = true
    } catch {
      case _: EOFException => streamEnded = true
      case _: java.net.SocketException => streamEnded = true // closed under us
      case t: Throwable => failure = t; streamEnded = true
    }

  private def serverError(phase: String, payload: Array[Byte]): IllegalStateException = {
    val f = PgWire.errorFields(payload)
    new IllegalStateException(
      s"pgcdc: server error during $phase: ${f.getOrElse('S', "ERROR")} " +
        s"${f.getOrElse('C', "?????")}: ${f.getOrElse('M', "(no message)")}")
  }

  override def poll(): Option[Array[Byte]] = {
    if (failure != null) throw new IllegalStateException("pgcdc: replication stream failed", failure)
    Option(queue.poll())
  }

  override def ack(lsn: Long): Unit = {
    if (Lsn.compare(lsn, confirmed) > 0) {
      confirmed = lsn
      // Standby status update with flushed/applied = confirmed (reference
      // `stream.go:735-751`); best-effort — a broken socket surfaces on poll.
      if (socket != null && !socket.isClosed)
        try sendStatusUpdate(WalFrames.encodeStandbyStatusUpdate(
          confirmed, System.currentTimeMillis() * 1000L))
        catch { case _: java.io.IOException => () }
    }
  }

  override def confirmedLsn: Long = confirmed

  override def sendStatusUpdate(frame: Array[Byte]): Unit = writeLock.synchronized {
    PgWire.writeMessage(out, PgWire.Tag.CopyData, frame)
  }

  override def close(): Unit = {
    val s = socket
    if (s != null && !s.isClosed) {
      try writeLock.synchronized {
        PgWire.writeMessage(out, PgWire.Tag.Terminate, Array.emptyByteArray)
      } catch { case _: java.io.IOException => () }
      try s.close() catch { case _: java.io.IOException => () }
    }
    socket = null
    if (reader != null) { reader.join(2000); reader = null }
  }
}
