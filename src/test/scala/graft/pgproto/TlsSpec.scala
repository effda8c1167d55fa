package graft.pgproto

import java.io.FileInputStream
import java.security.KeyStore
import javax.net.ssl.{KeyManagerFactory, SSLContext}
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.FakeWalsender

/** TLS negotiation over an in-process socket pair: SSLRequest → 'S' →
  * JSSE handshake against a keytool-generated self-signed server cert
  * (exactly the managed-PostgreSQL shape `sslmode=require` must accept),
  * plus the 'N' fallbacks for prefer/require.
  */
class TlsSpec extends AnyFunSuite {

  /** Self-signed server context + its certificate as a PEM file (the
    * sslrootcert fixture), generated once per test JVM via the JDK's own
    * keytool (no fixtures checked in, no network).
    */
  private lazy val serverMaterial: (SSLContext, String, KeyManagerFactory) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-tls").toFile
    dir.deleteOnExit()
    val ksFile = new java.io.File(dir, "server.p12")
    def keytool(args: String*): Unit = {
      val p = new ProcessBuilder(("keytool" +: args): _*).redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes())
      assert(p.waitFor() == 0, s"keytool failed: $out")
    }
    keytool("-genkeypair", "-alias", "server",
      "-keyalg", "RSA", "-keysize", "2048", "-storetype", "PKCS12",
      "-keystore", ksFile.getAbsolutePath, "-storepass", "changeit",
      "-dname", "CN=localhost", "-validity", "2")
    val pemFile = new java.io.File(dir, "server.pem")
    keytool("-exportcert", "-rfc", "-alias", "server",
      "-keystore", ksFile.getAbsolutePath, "-storepass", "changeit",
      "-file", pemFile.getAbsolutePath)
    val ks = KeyStore.getInstance("PKCS12")
    val fis = new FileInputStream(ksFile)
    try ks.load(fis, "changeit".toCharArray) finally fis.close()
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, "changeit".toCharArray)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    (ctx, pemFile.getAbsolutePath, kmf)
  }

  private def serverContext: SSLContext = serverMaterial._1
  private def serverCertPem: String = serverMaterial._2

  /** openssl-generated client cert + PKCS#8 key (libpq's sslcert/sslkey
    * fixture shape), plus a PKCS#1-encoded copy of the key for the
    * rejection test.
    */
  private lazy val clientMaterial: (String, String, String) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-mtls").toFile
    dir.deleteOnExit()
    def openssl(args: String*): Unit = {
      val p = new ProcessBuilder(("openssl" +: args): _*).redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes())
      assert(p.waitFor() == 0, s"openssl failed: $out")
    }
    val cert = new java.io.File(dir, "client-cert.pem").getAbsolutePath
    val key = new java.io.File(dir, "client-key.pem").getAbsolutePath
    val keyP1 = new java.io.File(dir, "client-key-pkcs1.pem").getAbsolutePath
    openssl("req", "-x509", "-newkey", "rsa:2048", "-keyout", key, "-out", cert,
      "-days", "2", "-nodes", "-subj", "/CN=graft-client")
    openssl("rsa", "-traditional", "-in", key, "-out", keyP1)
    (cert, key, keyP1)
  }

  /** The same client key re-encrypted with OpenSSL's default PBES2
    * (PBKDF2-HmacSHA256 + AES-256-CBC) — the `sslpassword` fixture.
    */
  private lazy val encryptedClientKey: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-mtls-enc").toFile
    dir.deleteOnExit()
    val out = new java.io.File(dir, "client-key-enc.pem").getAbsolutePath
    val p = new ProcessBuilder("openssl", "pkcs8", "-topk8", "-in", clientMaterial._2,
      "-out", out, "-passout", "pass:tr3s-s3cret").redirectErrorStream(true).start()
    assert(p.waitFor() == 0, new String(p.getInputStream.readAllBytes()))
    val pem = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(out)))
    assert(pem.contains("BEGIN ENCRYPTED PRIVATE KEY"))
    out
  }

  /** Server context that additionally TRUSTS the client cert — the shape a
    * pg_hba `cert`-auth server presents.
    */
  private lazy val mtlsServerContext: SSLContext = {
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(serverMaterial._3.getKeyManagers,
      PgConnection.caTrustManagers(clientMaterial._1), null)
    ctx
  }

  test("sslmode=require upgrades to TLS and the full handshake + queries run encrypted") {
    val server = new FakeWalsender(Seq.empty,
      requirePassword = Some("s3cret"), authMethod = "scram",
      serverSsl = Some(serverContext),
      sqlResults = sql =>
        if (sql == "SELECT 1") Some((Seq("one"), Seq(Seq(Some("1"))))) else None)
    try {
      val conn = new PgConnection("localhost", server.port, "u", "db",
        password = Some("s3cret"), sslMode = "require")
      try {
        assert(conn.isSsl, "connection did not upgrade to TLS")
        assert(conn.simpleQuery("SELECT 1") === Seq(Seq("1")))
      } finally conn.close()
    } finally server.close()
  }

  test("sslmode=require fails loudly against a server that refuses SSL") {
    val server = new FakeWalsender(Seq.empty) // serverSsl = None → answers 'N'
    try {
      val e = intercept[IllegalStateException](
        new PgConnection("localhost", server.port, "u", "db", sslMode = "require"))
      assert(e.getMessage.contains("does not support SSL"))
    } finally server.close()
  }

  test("sslmode=prefer falls back to plaintext on 'N' and still authenticates") {
    val server = new FakeWalsender(Seq.empty, requirePassword = Some("pw"),
      sqlResults = sql =>
        if (sql == "SELECT 2") Some((Seq("two"), Seq(Seq(Some("2"))))) else None)
    try {
      val conn = new PgConnection("localhost", server.port, "u", "db",
        password = Some("pw"), sslMode = "prefer")
      try {
        assert(!conn.isSsl)
        assert(conn.simpleQuery("SELECT 2") === Seq(Seq("2")))
      } finally conn.close()
    } finally server.close()
  }

  test("sslmode=prefer takes TLS when offered") {
    val server = new FakeWalsender(Seq.empty, serverSsl = Some(serverContext))
    try {
      val conn = new PgConnection("localhost", server.port, "u", "db",
        sslMode = "prefer")
      try assert(conn.isSsl) finally conn.close()
    } finally server.close()
  }

  test("mutual TLS: sslcert/sslkey satisfy a client-cert-demanding server") {
    val server = new FakeWalsender(Seq.empty,
      requirePassword = Some("s3cret"), authMethod = "scram",
      serverSsl = Some(mtlsServerContext), requireClientCert = true,
      sqlResults = sql =>
        if (sql == "SELECT 7") Some((Seq("seven"), Seq(Seq(Some("7"))))) else None)
    try {
      val conn = new PgConnection("localhost", server.port, "u", "db",
        password = Some("s3cret"), sslMode = "require",
        sslCert = Some(clientMaterial._1), sslKey = Some(clientMaterial._2))
      try {
        assert(conn.isSsl)
        assert(conn.simpleQuery("SELECT 7") === Seq(Seq("7")))
      } finally conn.close()
    } finally server.close()
  }

  test("mutual TLS: the same server refuses a client with no certificate") {
    val server = new FakeWalsender(Seq.empty,
      serverSsl = Some(mtlsServerContext), requireClientCert = true)
    try {
      intercept[java.io.IOException](
        new PgConnection("localhost", server.port, "u", "db", sslMode = "require"))
    } finally server.close()
  }

  test("sslpassword decrypts a PBES2-encrypted sslkey (OpenSSL default)") {
    val server = new FakeWalsender(Seq.empty,
      requirePassword = Some("s3cret"), authMethod = "scram",
      serverSsl = Some(mtlsServerContext), requireClientCert = true,
      sqlResults = sql =>
        if (sql == "SELECT 8") Some((Seq("eight"), Seq(Seq(Some("8"))))) else None)
    try {
      val conn = new PgConnection("localhost", server.port, "u", "db",
        password = Some("s3cret"), sslMode = "require",
        sslCert = Some(clientMaterial._1), sslKey = Some(encryptedClientKey),
        sslPassword = Some("tr3s-s3cret"))
      try {
        assert(conn.isSsl)
        assert(conn.simpleQuery("SELECT 8") === Seq(Seq("8")))
      } finally conn.close()
    } finally server.close()
  }

  test("an encrypted sslkey without/with a wrong sslpassword fails clearly") {
    val server = new FakeWalsender(Seq.empty,
      serverSsl = Some(mtlsServerContext), requireClientCert = true)
    try {
      val missing = intercept[Exception](
        new PgConnection("localhost", server.port, "u", "db", sslMode = "require",
          sslCert = Some(clientMaterial._1), sslKey = Some(encryptedClientKey)))
      // echo the actual exception on mismatch: this failed once under
      // full-suite load and the bare assert hid what was really thrown
      assert(missing.getMessage.contains("sslpassword"), s"got: $missing")
      val wrong = intercept[Exception](
        new PgConnection("localhost", server.port, "u", "db", sslMode = "require",
          sslCert = Some(clientMaterial._1), sslKey = Some(encryptedClientKey),
          sslPassword = Some("nope")))
      assert(wrong.getMessage.contains("wrong sslpassword"), s"got: $wrong")
    } finally server.close()
  }

  test("sslcert without sslkey is rejected before dialing") {
    val e = intercept[IllegalArgumentException](
      new PgConnection("localhost", 1, "u", "db", sslMode = "require",
        sslCert = Some("/tmp/nope.pem")))
    assert(e.getMessage.contains("together"))
  }

  test("a PKCS#1 key is rejected with a re-encode hint") {
    val server = new FakeWalsender(Seq.empty, serverSsl = Some(mtlsServerContext),
      requireClientCert = true)
    try {
      val e = intercept[IllegalArgumentException](
        new PgConnection("localhost", server.port, "u", "db", sslMode = "require",
          sslCert = Some(clientMaterial._1), sslKey = Some(clientMaterial._3)))
      assert(e.getMessage.contains("PKCS#1") && e.getMessage.contains("topk8"))
    } finally server.close()
  }

  test("unknown sslmode is rejected before dialing anything sensitive") {
    val e = intercept[IllegalArgumentException](
      new PgConnection("localhost", 1, "u", "db", sslMode = "verify-banana"))
    assert(e.getMessage.contains("unsupported sslmode"))
  }

  test("over TLS the client binds the channel with SCRAM-SHA-256-PLUS") {
    val server = new FakeWalsender(Seq.empty,
      requirePassword = Some("s3cret"), authMethod = "scram",
      serverSsl = Some(serverContext),
      sqlResults = sql =>
        if (sql == "SELECT 3") Some((Seq("three"), Seq(Seq(Some("3"))))) else None)
    try {
      val conn = new PgConnection("localhost", server.port, "u", "db",
        password = Some("s3cret"), sslMode = "require")
      try {
        assert(conn.isSsl)
        assert(conn.simpleQuery("SELECT 3") === Seq(Seq("3")))
        assert(server.lastAuthMechanism == Scram.MechanismPlus,
          "TLS connection must pick the channel-binding mechanism")
      } finally conn.close()
    } finally server.close()
  }

  test("gs2 'y' flag over TLS is rejected when the server offered binding (downgrade)") {
    // Drive the exchange by hand: a binding-capable client that ignores the
    // advertised -PLUS and says "y,," is exactly what a MITM-stripped
    // mechanism list produces; the server must refuse per RFC 5802 §6.
    val server = new FakeWalsender(Seq.empty,
      requirePassword = Some("s3cret"), authMethod = "scram",
      serverSsl = Some(serverContext))
    try {
      val sock = PgConnection.negotiateSocket("localhost", server.port, "require")
      val in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(sock.getInputStream))
      val out = new java.io.DataOutputStream(
        new java.io.BufferedOutputStream(sock.getOutputStream))
      PgWire.writeStartup(out, Seq("user" -> "u", "database" -> "db"))
      val auth = PgWire.readMessage(in)
      assert(PgWire.authCode(auth.payload) == PgWire.AuthCodeSasl)
      assert(PgWire.authSaslMechanisms(auth.payload).contains(Scram.MechanismPlus))
      val downgraded = new ScramClient("s3cret", gs2 = Scram.SupportsButNotUsed)
      PgWire.writeMessage(out, PgWire.Tag.PasswordMessage,
        PgWire.saslInitialResponsePayload(Scram.Mechanism, downgraded.clientFirstMessage))
      val reply = PgWire.readMessage(in)
      assert(reply.tag == PgWire.Tag.ErrorResponse,
        s"server must refuse the 'y' downgrade, got '${reply.tag.toChar}'")
      assert(new String(reply.payload).contains("channel binding required"))
      sock.close()
    } finally server.close()
  }

  test("verify-ca succeeds with sslrootcert pointing at the server's CA — and only then") {
    // The same self-signed server: the JVM default store rejects it
    // (previous test), but handing its cert as the sslrootcert CA bundle —
    // the managed-Postgres RDS/Cloud SQL shape — must make verify-ca pass
    // the full handshake + SCRAM and run queries.
    val server = new FakeWalsender(Seq.empty,
      requirePassword = Some("s3cret"), authMethod = "scram",
      serverSsl = Some(serverContext),
      sqlResults = sql =>
        if (sql == "SELECT 7") Some((Seq("seven"), Seq(Seq(Some("7"))))) else None)
    try {
      val conn = new PgConnection("localhost", server.port, "u", "db",
        password = Some("s3cret"), sslMode = "verify-ca",
        sslRootCert = Some(serverCertPem))
      try {
        assert(conn.isSsl)
        assert(conn.simpleQuery("SELECT 7") === Seq(Seq("7")))
      } finally conn.close()
    } finally server.close()
  }

  test("sslrootcert replaces the default trust anchors rather than extending them") {
    // A CA file that does NOT contain the server's cert must still fail,
    // proving the custom bundle is the ONLY trust source (libpq semantics).
    val dir = java.nio.file.Files.createTempDirectory("graft-tls-other").toFile
    dir.deleteOnExit()
    val other = new java.io.File(dir, "other.p12")
    val cmd = Array("keytool", "-genkeypair", "-alias", "other",
      "-keyalg", "RSA", "-keysize", "2048", "-storetype", "PKCS12",
      "-keystore", other.getAbsolutePath, "-storepass", "changeit",
      "-dname", "CN=unrelated", "-validity", "2")
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    assert(p.waitFor() == 0, new String(p.getInputStream.readAllBytes()))
    val otherPem = new java.io.File(dir, "other.pem")
    val p2 = new ProcessBuilder("keytool", "-exportcert", "-rfc", "-alias", "other",
      "-keystore", other.getAbsolutePath, "-storepass", "changeit",
      "-file", otherPem.getAbsolutePath).redirectErrorStream(true).start()
    assert(p2.waitFor() == 0, new String(p2.getInputStream.readAllBytes()))

    val server = new FakeWalsender(Seq.empty, serverSsl = Some(serverContext))
    try {
      val e = intercept[Exception](
        new PgConnection("localhost", server.port, "u", "db", sslMode = "verify-ca",
          sslRootCert = Some(otherPem.getAbsolutePath)))
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(e).exists(_.isInstanceOf[javax.net.ssl.SSLException]),
        s"wrong CA must fail the TLS handshake, got $e")
    } finally server.close()
  }

  test("sslmode=allow stays plaintext against a server that accepts it") {
    val server = new FakeWalsender(Seq.empty, requirePassword = Some("pw"),
      sqlResults = sql =>
        if (sql == "SELECT 8") Some((Seq("eight"), Seq(Seq(Some("8"))))) else None)
    try {
      val conn = new PgConnection("localhost", server.port, "u", "db",
        password = Some("pw"), sslMode = "allow")
      try {
        assert(!conn.isSsl, "allow must prefer plaintext when the server takes it")
        assert(conn.simpleQuery("SELECT 8") === Seq(Seq("8")))
      } finally conn.close()
    } finally server.close()
  }

  test("sslmode=allow retries over TLS when the server rejects the plaintext session") {
    val server = new FakeWalsender(Seq.empty,
      requirePassword = Some("pw"), authMethod = "scram",
      serverSsl = Some(serverContext), rejectPlaintextStartup = true,
      sqlResults = sql =>
        if (sql == "SELECT 9") Some((Seq("nine"), Seq(Seq(Some("9"))))) else None)
    try {
      val conn = new PgConnection("localhost", server.port, "u", "db",
        password = Some("pw"), sslMode = "allow")
      try {
        assert(conn.isSsl, "allow must fall forward to TLS after a server rejection")
        assert(conn.simpleQuery("SELECT 9") === Seq(Seq("9")))
      } finally conn.close()
    } finally server.close()
  }

  test("verify-ca and verify-full refuse a self-signed server cert") {
    // The fake server's cert is self-signed, so the JVM's default trust
    // store must reject it at both verification tiers — the exact
    // protection `require` (deliberately, like libpq) does not give.
    for (mode <- Seq("verify-ca", "verify-full")) {
      val server = new FakeWalsender(Seq.empty, serverSsl = Some(serverContext))
      try {
        val e = intercept[Exception](
          new PgConnection("localhost", server.port, "u", "db", sslMode = mode))
        def chain(t: Throwable): Seq[Throwable] =
          if (t == null) Nil else t +: chain(t.getCause)
        assert(chain(e).exists(_.isInstanceOf[javax.net.ssl.SSLException]),
          s"$mode must fail the TLS handshake, got $e")
      } finally server.close()
    }
  }
}
