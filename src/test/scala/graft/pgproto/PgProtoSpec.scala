package graft.pgproto

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level decoder tests, equivalent in coverage to the reference's
  * `pq/message/format/<msg>_test.go`, `pq/message/tuple/data_test.go`,
  * `pq/replication/wal_test.go`, `pq/message/format/time_test.go`.
  */
class PgProtoSpec extends AnyFunSuite {

  test("LSN format/parse round-trip matches %X/%X form") {
    assert(Lsn.format(0L) == "0/0")
    assert(Lsn.format(0x16B374D848L) == "16/B374D848")
    assert(Lsn.parse("16/B374D848") == 0x16B374D848L)
    assert(Lsn.parse(Lsn.format(Long.MaxValue)) == Long.MaxValue)
    assert(Lsn.compare(1L, 2L) < 0)
    // unsigned: a "negative" long is a huge LSN
    assert(Lsn.compare(-1L, 1L) > 0)
    intercept[IllegalArgumentException](Lsn.parse("nope"))
  }

  test("pg epoch conversion: 2000-01-01T00:00:00Z == 0 pg-micros") {
    assert(PgEpoch.toUnixMicros(0L) == 946684800000000L)
    val unix = java.time.Instant.parse("2024-05-01T12:30:00Z").toEpochMilli * 1000L
    assert(PgEpoch.toUnixMicros(PgEpoch.fromUnixMicros(unix)) == unix)
  }

  test("XLogData frame: 24-byte header + payload") {
    val msg = MessageEncoder.begin(100L, 1700000000000000L, 42L)
    val frame = MessageEncoder.xlogData(11L, 22L, 1700000000000123L, msg)
    WalFrames.parse(frame) match {
      case WalFrames.XLogDataFrame(x) =>
        assert(x.walStart == 11L)
        assert(x.serverWalEnd == 22L)
        assert(x.serverTimeMicros == 1700000000000123L)
        assert(x.data.sameElements(msg))
      case other => fail(s"wrong frame: $other")
    }
  }

  test("keepalive frame parses; unknown tag and empty frame fail") {
    val frame = MessageEncoder.keepalive(777L, 1700000000000000L, replyRequested = true)
    WalFrames.parse(frame) match {
      case WalFrames.KeepaliveFrame(k) =>
        assert(k.serverWalEnd == 777L)
        assert(k.replyRequested)
      case other => fail(s"wrong frame: $other")
    }
    intercept[PgProtoException](WalFrames.parse(Array[Byte]('x', 0, 0)))
    intercept[PgProtoException](WalFrames.parse(Array.emptyByteArray))
  }

  test("standby status update layout: 'r' + 3 LSNs + time + flag") {
    val b = WalFrames.encodeStandbyStatusUpdate(0x0102030405060708L, 946684800000000L, replyRequested = true)
    assert(b.length == 34)
    assert(b(0) == 'r')
    val r = new ByteReader(b, 1)
    assert(r.readUint64() == 0x0102030405060708L)
    assert(r.readUint64() == 0x0102030405060708L)
    assert(r.readUint64() == 0x0102030405060708L)
    assert(r.readUint64() == 0L) // pg epoch zero
    assert(r.readByte() == 1)
  }

  test("Begin round-trip") {
    val m = Messages.decode(MessageEncoder.begin(0xABCDL, 1699999999000000L, 731L), inStreamedTx = false)
    assert(m == Messages.Begin(0xABCDL, 1699999999000000L, 731L))
  }

  test("Commit round-trip") {
    val m = Messages.decode(MessageEncoder.commit(10L, 20L, 1700000001000000L), inStreamedTx = false)
    assert(m == Messages.Commit(0, 10L, 20L, 1700000001000000L))
  }

  test("Relation round-trip with key flags and typmods") {
    val cols = Seq(
      Messages.RelationColumn("id", 23L, -1, 1),        // int4, key
      Messages.RelationColumn("name", 25L, -1, 0),      // text
      Messages.RelationColumn("price", 1700L, 655366, 0)) // numeric(10,2)
    val raw = MessageEncoder.relation(16384L, "public", "books", cols, 'd')
    Messages.decode(raw, inStreamedTx = false) match {
      case r: Messages.Relation =>
        assert(r.oid == 16384L && r.namespace == "public" && r.name == "books")
        assert(r.replicaIdentity == 'd')
        assert(r.columns.toSeq == cols)
        assert(r.columns(0).isKey && !r.columns(1).isKey)
      case other => fail(s"$other")
    }
  }

  test("Insert round-trip with null column") {
    val raw = MessageEncoder.insert(16384L, Seq(Some("7"), None, Some("book-no-7")))
    Messages.decode(raw, inStreamedTx = false) match {
      case i: Messages.Insert =>
        assert(i.relationOid == 16384L && i.xid == 0L)
        val c = i.newTuple.cols
        assert(c(0).text == "7" && c(1).isNull && c(2).text == "book-no-7")
      case other => fail(s"$other")
    }
  }

  test("Insert inside streamed transaction carries XID prefix") {
    val raw = MessageEncoder.insert(16384L, Seq(Some("1")), streamedXid = 999L)
    Messages.decode(raw, inStreamedTx = true) match {
      case i: Messages.Insert => assert(i.xid == 999L && i.newTuple.cols(0).text == "1")
      case other => fail(s"$other")
    }
  }

  test("Update with full old tuple ('O') and TOAST merge") {
    val old = Seq(Some("1"), Some("big-toasted-value"), Some("x"))
    val neu = Seq(Some("1"), Some(MessageEncoder.Toast), Some("y"))
    val raw = MessageEncoder.update(16384L, neu, old, 'O')
    Messages.decode(raw, inStreamedTx = false) match {
      case u: Messages.Update =>
        assert(u.oldTupleType == 'O')
        assert(u.newTuple.cols(1).isToast)
        val merged = TupleData.mergeToast(u.newTuple, u.oldTuple)
        assert(merged.cols(1).text == "big-toasted-value")
        assert(merged.cols(2).text == "y")
      case other => fail(s"$other")
    }
  }

  test("Update without old tuple (REPLICA IDENTITY DEFAULT, key unchanged)") {
    val raw = MessageEncoder.update(16384L, Seq(Some("1"), Some("n")))
    Messages.decode(raw, inStreamedTx = false) match {
      case u: Messages.Update => assert(u.oldTupleType == 0 && u.oldTuple == null)
      case other => fail(s"$other")
    }
  }

  test("Delete with key tuple ('K')") {
    val raw = MessageEncoder.delete(16384L, Seq(Some("5"), None), 'K')
    Messages.decode(raw, inStreamedTx = false) match {
      case d: Messages.Delete =>
        assert(d.oldTupleType == 'K' && d.oldTuple.cols(0).text == "5")
      case other => fail(s"$other")
    }
  }

  test("Truncate round-trip with options") {
    val raw = MessageEncoder.truncate(Seq(1L, 2L, 3L), options = 3)
    Messages.decode(raw, inStreamedTx = false) match {
      case t: Messages.Truncate =>
        assert(t.relationOids.toSeq == Seq(1L, 2L, 3L))
        assert(t.cascade && t.restartIdentity)
      case other => fail(s"$other")
    }
  }

  test("Stream control messages round-trip") {
    assert(Messages.decode(MessageEncoder.streamStart(55L, firstSegment = true), false)
      == Messages.StreamStart(55L, true))
    assert(Messages.decode(MessageEncoder.streamStop(), false) == Messages.StreamStop)
    assert(Messages.decode(MessageEncoder.streamCommit(55L, 100L, 200L, 1700000002000000L), false)
      == Messages.StreamCommit(55L, 0, 100L, 200L, 1700000002000000L))
    assert(Messages.decode(MessageEncoder.streamAbort(55L, 56L), false)
      == Messages.StreamAbort(55L, 56L))
  }

  test("truncated frames raise PgProtoException (error-length cases)") {
    val good = MessageEncoder.insert(16384L, Seq(Some("7"), Some("abc")))
    // every strict prefix of a valid message must fail, not mis-decode
    (1 until good.length).foreach { n =>
      intercept[PgProtoException](Messages.decode(good.take(n), inStreamedTx = false))
    }
    intercept[PgProtoException](Messages.decode(Array[Byte]('Z', 1, 2), inStreamedTx = false))
    intercept[PgProtoException](Messages.decode(Array[Byte]('M'), inStreamedTx = false))
  }

  test("tuple: unknown column tag fails") {
    // 1 column, bogus tag 'q'
    val bogus = Array[Byte](0, 1, 'q')
    intercept[PgProtoException](TupleData.read(new ByteReader(bogus)))
  }
}
