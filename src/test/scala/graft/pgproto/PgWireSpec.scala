package graft.pgproto

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

/** Round-trip properties for the frontend/backend framing layer under the
  * socket client and fake server — write through the real stream coders,
  * read back, compare.
  */
class PgWireSpec extends AnyFunSuite {

  private def forAll[A](ga: Gen[A])(f: A => Unit): Unit = check(
    Prop.forAll(ga) { a => f(a); true })
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit = check(
    Prop.forAll(ga, gb) { (a, b) => f(a, b); true })
  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100).withInitialSeed(Seed(7L)), p)
    assert(res.passed, res.status.toString)
  }

  private def viaStream[T](write: DataOutputStream => Unit)(read: DataInputStream => T): T = {
    val buf = new ByteArrayOutputStream()
    write(new DataOutputStream(buf))
    read(new DataInputStream(new ByteArrayInputStream(buf.toByteArray)))
  }

  val genTag: Gen[Byte] = Gen.oneOf('Q', 'd', 'R', 'Z', 'T', 'D', 'E', 'W').map(_.toByte)
  val genPayload: Gen[Array[Byte]] =
    Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray)

  test("tagged messages round-trip framing for arbitrary payloads") {
    forAll(genTag, genPayload) { (tag, payload) =>
      val m = viaStream(o => PgWire.writeMessage(o, tag, payload))(PgWire.readMessage)
      assert(m.tag == tag)
      assert(m.payload.toSeq == payload.toSeq)
    }
  }

  test("startup message round-trips parameters incl. unicode values") {
    val genKv = for {
      k <- Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
      v <- Gen.oneOf(Gen.alphaNumStr, Gen.const("naïve-пароль-密码"))
    } yield (k, v)
    forAll(Gen.listOf(genKv)) { kvs =>
      // last-wins on duplicate keys, like a Map — compare deduped
      val (proto, params) =
        viaStream(o => PgWire.writeStartup(o, kvs))(PgWire.readStartup)
      assert(proto == PgWire.ProtocolVersion3)
      assert(params == kvs.toMap)
    }
  }

  test("text DataRow round-trips values, NULLs, and empty strings") {
    val genVal = Gen.oneOf(
      Gen.const(None),
      Gen.const(Some("")),
      Gen.alphaNumStr.map(Some(_)),
      Gen.const(Some("säv-値-🙂")))
    forAll(Gen.listOf(genVal)) { vals =>
      val out = PgWire.parseDataRow(PgWire.dataRowPayload(vals))
      assert(out == vals)
    }
  }

  test("error fields round-trip severity, code, and message") {
    forAll(Gen.alphaNumStr, Gen.alphaNumStr) { (code, msg) =>
      val f = PgWire.errorFields(PgWire.errorPayload("ERROR", code, msg))
      assert(f('S') == "ERROR" && f('C') == code && f('M') == msg)
    }
  }

  test("query payload parses back dropping only the terminator") {
    forAll(Gen.alphaNumStr) { sql =>
      assert(PgWire.parseQuery(PgWire.queryPayload(sql)) == sql)
    }
  }

  test("bad message length is rejected loudly") {
    val bytes = Array[Byte]('Q', 0, 0, 0, 1) // length 1 < 4
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val ex = intercept[IllegalArgumentException] { PgWire.readMessage(in) }
    assert(ex.getMessage.contains("bad message length"))

    // a length past pg's 1 GiB field limit is a corrupt header — reject
    // BEFORE allocating the 2 GiB it claims
    val huge = Array[Byte]('D', 0x7f, -1, -1, -1)
    val in2 = new DataInputStream(new ByteArrayInputStream(huge))
    val ex2 = intercept[IllegalArgumentException] { PgWire.readMessage(in2) }
    assert(ex2.getMessage.contains("bad message length"))
  }
}
