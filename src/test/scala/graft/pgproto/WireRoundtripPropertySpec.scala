package graft.pgproto

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** Property fuzz over the wire codec: every message [[MessageEncoder]] can
  * produce must decode ([[Messages.decode]]) back to the values it encoded,
  * for random OIDs, LSNs, xids, column shapes, unicode values, NULLs,
  * TOAST markers, and binary-tagged columns — breadth the golden byte
  * fixtures can't give. Asymmetric by design: the encoder exists for tests
  * and tools, the decoder is the production path; the decoder is what this
  * pins.
  */
class WireRoundtripPropertySpec extends AnyFunSuite {

  private val genName: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('_', 'é', 'ß', '表'))).map(_.mkString))

  private val genValue: Gen[Option[String]] = Gen.frequency(
    3 -> genName.map(Some(_)),
    1 -> Gen.const(Some("")),
    1 -> Gen.const(None), // SQL NULL
    1 -> Gen.const(Some(MessageEncoder.Toast))) // unchanged-TOAST marker

  private val genCols: Gen[List[(String, Long, Int, Int)]] =
    Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, for {
      name <- genName
      oid <- Gen.oneOf(16L, 20L, 23L, 25L, 701L, 1184L, 1700L)
      typmod <- Gen.oneOf(-1, 655366)
      key <- Gen.oneOf(0, 1)
    } yield (name, oid, typmod, key)))

  private def tupleValues(t: TupleData.Tuple): Seq[(Byte, String)] =
    t.cols.toSeq.map(c => (c.tag, if (c.data == null) null else c.text))

  private def expected(vals: Seq[Option[String]]): Seq[(Byte, String)] =
    vals.map {
      case None => (TupleData.TagNull, null)
      case Some(s) if s == MessageEncoder.Toast => (TupleData.TagToast, null)
      case Some(s) => (TupleData.TagText, s)
    }

  test("relation/insert/update/delete/begin/commit roundtrip for random shapes") {
    val prop = Prop.forAll(
      Gen.chooseNum(1L, 0xffffffffL), genName, genName, genCols,
      Gen.listOfN(4, genValue), Gen.chooseNum(0L, Long.MaxValue / 2),
      Gen.chooseNum(1L, 0xffffffffL)) { (oid, ns, tbl, cols, vals4, lsn, xid) =>

      val relBytes = MessageEncoder.relation(oid, ns, tbl,
        cols.map { case (n, o, m, k) => Messages.RelationColumn(n, o, m, k) })
      val rel = Messages.decode(relBytes, inStreamedTx = false)
        .asInstanceOf[Messages.Relation]
      val relOk = rel.oid == oid && rel.namespace == ns && rel.name == tbl &&
        rel.columns.toList.map(c => (c.name, c.typeOid, c.typeModifier, c.flags)) == cols

      val vals = vals4.take(cols.size max 1)
      val ins = Messages.decode(MessageEncoder.insert(oid, vals), inStreamedTx = false)
        .asInstanceOf[Messages.Insert]
      val insOk = ins.relationOid == oid && ins.xid == 0 &&
        tupleValues(ins.newTuple) == expected(vals)

      val upd = Messages.decode(
        MessageEncoder.update(oid, vals, vals, 'O'), inStreamedTx = false)
        .asInstanceOf[Messages.Update]
      val updOk = upd.relationOid == oid && upd.oldTupleType == 'O'.toByte &&
        tupleValues(upd.newTuple) == expected(vals) &&
        tupleValues(upd.oldTuple) == expected(vals)

      val del = Messages.decode(
        MessageEncoder.delete(oid, vals, 'K'), inStreamedTx = false)
        .asInstanceOf[Messages.Delete]
      val delOk = del.relationOid == oid && del.oldTupleType == 'K'.toByte &&
        tupleValues(del.oldTuple) == expected(vals)

      val t = 1700000000000000L
      val beg = Messages.decode(MessageEncoder.begin(lsn, t, xid), inStreamedTx = false)
        .asInstanceOf[Messages.Begin]
      val begOk = beg.finalLsn == lsn && beg.xid == xid && beg.commitTimeMicros == t

      val com = Messages.decode(
        MessageEncoder.commit(lsn, lsn + 1, t), inStreamedTx = false)
        .asInstanceOf[Messages.Commit]
      val comOk = com.commitLsn == lsn && com.transactionEndLsn == lsn + 1 &&
        com.commitTimeMicros == t

      relOk && insOk && updOk && delOk && begOk && comOk
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200).withInitialSeed(Seed(17L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("binary-tagged tuple columns roundtrip byte-exact") {
    import MessageEncoder.Col
    val genBytes = Gen.chooseNum(0, 32).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))
    val genTagged: Gen[List[Col]] = Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.frequency[Col](
        2 -> genName.map(Col.Text(_)),
        2 -> genBytes.map(Col.Bin(_)),
        1 -> Gen.const(Col.Null),
        1 -> Gen.const(Col.Toasted))))
    val prop = Prop.forAll(Gen.chooseNum(1L, 0xffffffffL), genTagged) { (oid, cols) =>
      val ins = Messages.decode(
        MessageEncoder.insertTagged(oid, cols), inStreamedTx = false)
        .asInstanceOf[Messages.Insert]
      ins.newTuple.cols.toList.zip(cols).forall {
        case (got, Col.Text(s)) =>
          got.tag == TupleData.TagText && new String(got.data, UTF_8) == s
        case (got, Col.Bin(b)) =>
          got.tag == TupleData.TagBinary && got.data.toSeq == b.toSeq
        case (got, Col.Null) => got.tag == TupleData.TagNull && got.data == null
        case (got, Col.Toasted) => got.tag == TupleData.TagToast && got.data == null
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200).withInitialSeed(Seed(19L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("arbitrary and corrupted frames decode or raise PgProtoException only") {
    // The decoder faces network bytes: pure garbage, a valid frame cut
    // short, or a valid frame with one byte flipped must either decode (the
    // damage landed in a payload) or raise the uniform wire error — never a
    // runtime exception from trusting a length/count header.
    val genValid: Gen[Array[Byte]] = for {
      oid <- Gen.chooseNum(1L, 0xffffffffL)
      vals <- Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, genValue))
      pick <- Gen.oneOf(0, 1, 2)
      cols <- genCols
    } yield pick match {
      case 0 => MessageEncoder.insert(oid, vals)
      case 1 => MessageEncoder.relation(oid, "public", "t",
        cols.map { case (n, o, m, k) => Messages.RelationColumn(n, o, m, k) })
      case _ => MessageEncoder.update(oid, vals, vals)
    }
    val genFrame: Gen[(Array[Byte], Boolean)] = for {
      valid <- genValid
      mode <- Gen.choose(0, 3)
      cut <- Gen.choose(0, valid.length)
      idx <- Gen.choose(0, valid.length - 1)
      flip <- Gen.choose(Byte.MinValue, Byte.MaxValue)
      garbage <- Gen.chooseNum(1, 40).flatMap(n =>
        Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
      streamed <- Gen.oneOf(true, false)
    } yield (mode match {
      case 0 => valid.take(cut)
      case 1 => { val c = valid.clone(); c(idx) = flip; c }
      case 2 => garbage
      case _ => valid ++ garbage // trailing junk after a full frame
    }, streamed)
    val prop = Prop.forAll(genFrame) { case (bytes, streamed) =>
      try { if (bytes.nonEmpty) Messages.decode(bytes, streamed); true }
      catch {
        case _: PgProtoException => true
        case e: Throwable =>
          println(s"decoder hole: ${e.getClass.getName}: ${e.getMessage} " +
            s"streamed=$streamed bytes=${bytes.map(b => f"$b%02x").mkString}")
          false
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(600).withInitialSeed(Seed(20260814L)), prop)
    assert(res.passed, res.status.toString)
  }
}
