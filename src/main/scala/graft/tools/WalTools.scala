package graft.tools

import java.io.{BufferedOutputStream, DataInputStream, DataOutputStream, FileInputStream, FileOutputStream, EOFException}
import graft.pgproto._

/** Frame-file format shared by the tools and the file-backed WAL source:
  * a sequence of u32-length-prefixed CopyData payloads ('w'/'k' frames),
  * i.e. exactly what a walsender would push, minus the socket.
  */
object WalFile {
  def write(path: String, frames: Iterator[Array[Byte]]): Long = {
    val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(path), 1 << 20))
    var n = 0L
    try frames.foreach { f => out.writeInt(f.length); out.write(f); n += 1 }
    finally out.close()
    n
  }

  def read(path: String): Iterator[Array[Byte]] = {
    val in = new DataInputStream(new java.io.BufferedInputStream(new FileInputStream(path), 1 << 20))
    new Iterator[Array[Byte]] {
      private var nextFrame: Array[Byte] = advance()
      private def advance(): Array[Byte] =
        try {
          val len = in.readInt()
          val buf = new Array[Byte](len)
          in.readFully(buf)
          buf
        } catch { case _: EOFException => in.close(); null }
      def hasNext: Boolean = nextFrame != null
      def next(): Array[Byte] = { val f = nextFrame; nextFrame = advance(); f }
    }
  }
}

/** Generate a synthetic pgoutput WAL stream (deterministic, seeded).
  *
  * Emits a Relation for `public.users(id int4 PK, name text)` — the
  * reference's benchmark table (`benchmark/benchmark_cdc/README.md`) — then
  * `nTxns` transactions of `rowsPerTxn` inserts each, with Begin/Commit
  * framing and monotonically increasing LSNs, interleaved with keepalives.
  *
  * Usage: WalGen <out-file> <nTxns> <rowsPerTxn>
  */
object WalGen {
  val UsersRelOid = 16384L
  val UsersColumns = Seq(
    Messages.RelationColumn("id", 23L, -1, 1),
    Messages.RelationColumn("name", 25L, -1, 0))

  def frames(nTxns: Int, rowsPerTxn: Int, baseTimeMicros: Long = 1700000000000000L): Iterator[Array[Byte]] = {
    val rel = MessageEncoder.xlogData(1L, 1L, baseTimeMicros,
      MessageEncoder.relation(UsersRelOid, "public", "users", UsersColumns))
    var lsn = 100L
    var id = 0L
    val txns = Iterator.range(0, nTxns).flatMap { t =>
      val xid = 1000L + t
      val tMicros = baseTimeMicros + t * 1000L
      val beginLsn = lsn
      val endLsn = beginLsn + rowsPerTxn + 2L
      val begin = MessageEncoder.xlogData(beginLsn, beginLsn, tMicros,
        MessageEncoder.begin(endLsn, tMicros, xid))
      val rows = Iterator.range(0, rowsPerTxn).map { r =>
        id += 1
        val l = beginLsn + 1L + r
        MessageEncoder.xlogData(l, l, tMicros,
          MessageEncoder.insert(UsersRelOid, Seq(Some(id.toString), Some(s"Oyleli$id"))))
      }
      val commit = MessageEncoder.xlogData(endLsn - 1L, endLsn - 1L, tMicros,
        MessageEncoder.commit(endLsn - 1L, endLsn, tMicros))
      lsn = endLsn
      Iterator(begin) ++ rows ++ Iterator(commit) ++
        (if (t % 100 == 99) Iterator(MessageEncoder.keepalive(lsn, tMicros, replyRequested = false))
         else Iterator.empty)
    }
    Iterator(rel) ++ txns
  }

  def main(args: Array[String]): Unit = {
    val Array(out, nTxns, rowsPerTxn) = args.take(3)
    val n = WalFile.write(out, frames(nTxns.toInt, rowsPerTxn.toInt))
    println(s"wrote $n frames ($nTxns txns x $rowsPerTxn rows) to $out")
  }
}

/** Decode and print a WAL frame file — the debugging face of the decoder.
  *
  * Usage: WalDump <file> [maxLines]
  */
object WalDump {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val max = if (args.length > 1) args(1).toInt else Int.MaxValue
    var inStream = false
    var printed = 0
    var frames = 0L
    var dml = 0L
    WalFile.read(path).foreach { raw =>
      frames += 1
      val line = WalFrames.parse(raw) match {
        case WalFrames.KeepaliveFrame(k) =>
          s"KEEPALIVE walEnd=${Lsn.format(k.serverWalEnd)} reply=${k.replyRequested}"
        case WalFrames.XLogDataFrame(x) =>
          val m = Messages.decode(x.data, inStream)
          m match {
            case _: Messages.StreamStart => inStream = true
            case Messages.StreamStop => inStream = false
            case _: Messages.Insert | _: Messages.Update | _: Messages.Delete => dml += 1
            case _ =>
          }
          val desc = m match {
            case b: Messages.Begin => s"BEGIN xid=${b.xid} finalLsn=${Lsn.format(b.finalLsn)}"
            case c: Messages.Commit => s"COMMIT endLsn=${Lsn.format(c.transactionEndLsn)}"
            case r: Messages.Relation =>
              s"RELATION ${r.namespace}.${r.name} oid=${r.oid} cols=[${r.columns.map(_.name).mkString(",")}]"
            case i: Messages.Insert =>
              s"INSERT rel=${i.relationOid} row=(${i.newTuple.cols.map(_.text).mkString(",")})"
            case u: Messages.Update =>
              s"UPDATE rel=${u.relationOid} new=(${u.newTuple.cols.map(_.text).mkString(",")})"
            case d: Messages.Delete =>
              s"DELETE rel=${d.relationOid} old=(${d.oldTuple.cols.map(_.text).mkString(",")})"
            case t: Messages.Truncate => s"TRUNCATE rels=${t.relationOids.mkString(",")}"
            case s: Messages.StreamStart => s"STREAM_START xid=${s.xid} first=${s.firstSegment}"
            case Messages.StreamStop => "STREAM_STOP"
            case c: Messages.StreamCommit => s"STREAM_COMMIT xid=${c.xid}"
            case a: Messages.StreamAbort => s"STREAM_ABORT xid=${a.xid}"
            case lm: Messages.LogicalMessage =>
              s"MESSAGE prefix=${lm.prefix} transactional=${lm.transactional} bytes=${lm.content.length}"
            case o: Messages.Origin => s"ORIGIN ${o.name} commitLsn=${Lsn.format(o.commitLsn)}"
            case ty: Messages.TypeMessage => s"TYPE oid=${ty.oid} ${ty.namespace}.${ty.name}"
            case bp: Messages.BeginPrepare =>
              s"BEGIN_PREPARE xid=${bp.xid} gid=${bp.gid} endLsn=${Lsn.format(bp.endLsn)}"
            case pp: Messages.Prepare => s"PREPARE xid=${pp.xid} gid=${pp.gid}"
            case k: Messages.CommitPrepared =>
              s"COMMIT_PREPARED gid=${k.gid} endLsn=${Lsn.format(k.endLsn)}"
            case rp: Messages.RollbackPrepared => s"ROLLBACK_PREPARED gid=${rp.gid}"
            case sp: Messages.StreamPrepare =>
              s"STREAM_PREPARE xid=${sp.xid} gid=${sp.gid}"
          }
          s"${Lsn.format(x.walStart)} $desc"
      }
      if (printed < max) { println(line); printed += 1 }
    }
    println(s"-- $frames frames, $dml DML messages")
  }
}
