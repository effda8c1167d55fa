package graft.pgproto

import java.nio.charset.StandardCharsets.UTF_8
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.FakeWalsender

/** SCRAM-SHA-256, three layers: the bare crypto against the PUBLISHED
  * RFC 7677 §3 test vector, the full PgConnection handshake against a
  * SCRAM-requiring fake server, and the failure paths (wrong password must
  * fail LOUDLY with the server's 28P01; unsupported mechanism lists must
  * not hang the handshake).
  */
class ScramSpec extends AnyFunSuite {

  test("client messages reproduce the RFC 7677 test vector") {
    val c = new ScramClient("pencil", username = "user",
      nonceOverride = Some("rOprNGfwEbeRWgbNEkqO"))
    assert(new String(c.clientFirstMessage, UTF_8) ===
      "n,,n=user,r=rOprNGfwEbeRWgbNEkqO")
    val serverFirst = ("r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0," +
      "s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096").getBytes(UTF_8)
    val clientFinal = new String(c.clientFinal(serverFirst), UTF_8)
    assert(clientFinal ===
      "c=biws,r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0," +
        "p=dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ=")
    // Wrong server signature throws; the RFC's correct one verifies.
    val bad = "v=AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA=".getBytes(UTF_8)
    assertThrows[IllegalStateException](c.verifyServerFinal(bad))
    val c2 = new ScramClient("pencil", username = "user",
      nonceOverride = Some("rOprNGfwEbeRWgbNEkqO"))
    c2.clientFinal(serverFirst)
    c2.verifyServerFinal(
      "v=6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4=".getBytes(UTF_8))
  }

  test("PgConnection completes a SCRAM handshake and runs queries") {
    val server = new FakeWalsender(Seq.empty,
      requirePassword = Some("s3cret"), authMethod = "scram",
      sqlResults = sql =>
        if (sql == "SELECT 1") Some((Seq("one"), Seq(Seq(Some("1"))))) else None)
    try {
      val conn = new PgConnection("localhost", server.port, "u", "db",
        password = Some("s3cret"))
      try assert(conn.simpleQuery("SELECT 1") === Seq(Seq("1")))
      finally conn.close()
    } finally server.close()
  }

  test("wrong password fails loudly with the server's 28P01") {
    val server = new FakeWalsender(Seq.empty,
      requirePassword = Some("s3cret"), authMethod = "scram")
    try {
      val e = intercept[Exception](
        new PgConnection("localhost", server.port, "u", "db",
          password = Some("wrong")))
      // Either the server's FATAL 28P01 arrives first, or the socket closes
      // mid-handshake — both must surface, never hang or silently connect.
      assert(e.getMessage == null || e.getMessage.contains("28P01")
        || e.isInstanceOf[java.io.EOFException])
    } finally server.close()
  }

  test("saslPrep follows the RFC 4013 \u00a73 examples") {
    assert(Scram.saslPrep("I\u00adX") === "IX")   // soft hyphen mapped away
    assert(Scram.saslPrep("user") === "user")      // ASCII untouched
    assert(Scram.saslPrep("USER") === "USER")      // case preserved
    assert(Scram.saslPrep("\u00aa") === "a")      // NFKC compatibility
    assert(Scram.saslPrep("\u2168") === "IX")     // ROMAN NUMERAL NINE
    assert(Scram.saslPrep("a\u00a0b") === "a b")  // NBSP \u2192 SPACE
    // Prohibited output (control char; mixed-bidi per RFC 3454 \u00a76) falls
    // back to the verbatim password \u2014 pg_saslprep's behavior, not an error.
    assert(Scram.saslPrep("a\u0007b") === "a\u0007b")
    assert(Scram.saslPrep("\u0627" + "1") === "\u0627" + "1")
  }

  test("saslPrep-equal password spellings derive the same SCRAM keys") {
    // The soft-hyphenated and compatibility (ROMAN NUMERAL) spellings must
    // salt to the keys of their normalized form \u2014 the interop libpq users
    // get when the verifier was stored from a different client.
    val salt = "QSXCR+Q6sek8bf92".getBytes(UTF_8)
    assert(Scram.hi(Scram.saslPrep("pass\u00adword"), salt, 4096)
      === Scram.hi("password", salt, 4096))
    assert(Scram.hi(Scram.saslPrep("pencil\u2168"), salt, 4096)
      === Scram.hi("pencilIX", salt, 4096))
  }

  test("a non-ASCII password authenticates across differently-normalized spellings") {
    // Server stored its verifier from the plain spelling; the client types a
    // form with a soft hyphen and a zero-width space. SASLprep on both sides
    // makes the exchange agree \u2014 the round-trip RFC 5802 \u00a72.2 requires.
    val server = new FakeWalsender(Seq.empty,
      requirePassword = Some("tr\u00fcffel p\u00e2t\u00e9"), authMethod = "scram",
      sqlResults = sql =>
        if (sql == "SELECT 5") Some((Seq("five"), Seq(Seq(Some("5"))))) else None)
    try {
      val conn = new PgConnection("localhost", server.port, "u", "db",
        password = Some("tr\u00fcffel\u200b p\u00e2t\u00e9\u00ad"))
      try assert(conn.simpleQuery("SELECT 5") === Seq(Seq("5")))
      finally conn.close()
    } finally server.close()
  }

  test("missing password and unsupported mechanism lists fail with clear errors") {
    val server = new FakeWalsender(Seq.empty,
      requirePassword = Some("s3cret"), authMethod = "scram")
    try {
      val e = intercept[IllegalStateException](
        new PgConnection("localhost", server.port, "u", "db", password = None))
      assert(e.getMessage.contains("requires a password"))
    } finally server.close()

    val plusOnly = new FakeWalsender(Seq.empty,
      requirePassword = Some("s3cret"), authMethod = "scram",
      saslMechanisms = Seq("SCRAM-SHA-256-PLUS"))
    try {
      val e = intercept[IllegalStateException](
        new PgConnection("localhost", plusOnly.port, "u", "db",
          password = Some("s3cret")))
      assert(e.getMessage.contains("no supported SASL mechanism"))
    } finally plusOnly.close()
  }
}
