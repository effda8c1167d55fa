package graft.pgproto

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.Socket

/** A connected, authenticated PostgreSQL frontend connection speaking the
  * simple-query protocol — the shared wire layer under both the replication
  * client ([[graft.streaming.SocketWalSource]]) and the service-side SQL
  * seam ([[executor]]). Handshake: startup (optionally
  * `replication=database`), then AuthenticationOk, SCRAM-SHA-256
  * ([[ScramClient]] — the default password method on PostgreSQL ≥14), or
  * legacy cleartext password, then parameter/key messages until
  * ReadyForQuery (public protocol docs "Message Flow → Start-up" / "SASL
  * Authentication"; the reference's pgx dependency does the same under
  * `pq/connector.go`).
  */
final class PgConnection(
    host: String,
    port: Int,
    user: String,
    database: String,
    password: Option[String] = None,
    replication: Boolean = false,
    applicationName: String = "graft",
    /** `disable` (plaintext), `allow` (plaintext preferred, one TLS retry if
      * the server rejects the plaintext session), `prefer` (TLS if the
      * server accepts, else plaintext), `require` (TLS or fail),
      * `verify-ca`/`verify-full` (TLS + chain / chain+hostname
      * verification) — libpq's six sslmode tiers, negotiated via the 8-byte
      * SSLRequest packet before startup (public protocol docs "Message Flow
      * → SSL Session Encryption"; the reference carries sslmode in its DSN
      * through pgx, `config/config.go:55-63`).
      */
    sslMode: String = "disable",
    /** PEM file of CA certificate(s) to verify the server chain against for
      * `verify-ca`/`verify-full` — libpq's `sslrootcert`. Managed-Postgres
      * CAs (RDS, Cloud SQL) are rarely in the JVM default trust store, so
      * without this the verify tiers fail against exactly the servers that
      * need them. None = the JVM default store.
      */
    sslRootCert: Option[String] = None,
    /** PEM client certificate (chain) + PKCS#8 PEM private key — libpq's
      * `sslcert`/`sslkey` mutual-TLS pair, presented when the server
      * requests client auth during the handshake (pg_hba `cert` method or
      * `clientcert=verify-*`). Both or neither; a PKCS#1 key ("BEGIN RSA
      * PRIVATE KEY") is rejected with a re-encode hint, matching modern
      * openssl output which is PKCS#8.
      */
    sslCert: Option[String] = None,
    sslKey: Option[String] = None,
    /** Passphrase for an encrypted `sslkey` ("BEGIN ENCRYPTED PRIVATE KEY")
      * — libpq's `sslpassword`. PBES2 (OpenSSL's default encryption) is
      * decrypted by [[Pkcs8.decrypt]]; unused for plaintext keys.
      */
    sslPassword: Option[String] = None) extends AutoCloseable {

  require(sslCert.isDefined == sslKey.isDefined,
    "pg: sslcert and sslkey must be configured together")

  require(PgConnection.SslModes.contains(sslMode),
    s"pg: unsupported sslmode '$sslMode' (${PgConnection.SslModes.toSeq.sorted.mkString("|")})")

  // sslmode=allow is a CONNECTION policy, not a socket policy: try the
  // plaintext session first, and only when the server itself rejects it
  // (pg_hba `hostssl`-only rules surface as a startup ErrorResponse) dial
  // again over TLS. Socket-level failures (refused, EOF) are not retried —
  // TLS can't fix an unreachable server.
  private val conn0: (Socket, DataInputStream, DataOutputStream) =
    if (sslMode == "allow") {
      try connectAttempt("disable")
      catch { case _: PgConnection.ServerErrorException => connectAttempt("require") }
    } else connectAttempt(sslMode)
  private val socket = conn0._1
  val in = conn0._2
  val out = conn0._3

  private def connectAttempt(mode: String): (Socket, DataInputStream, DataOutputStream) = {
    val sock = PgConnection.negotiateSocket(
      host, port, mode, sslRootCert, sslCert, sslKey, sslPassword)
    val sin = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    val sout = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
    try {
      handshake(sock, sin, sout)
      (sock, sin, sout)
    } catch {
      case e: Throwable =>
        try sock.close() catch { case _: java.io.IOException => () }
        throw e
    }
  }

  /** True when the connection upgraded to TLS. */
  def isSsl: Boolean = socket.isInstanceOf[javax.net.ssl.SSLSocket]

  /** Socket read deadline (0 = block forever): a blocked read throws
    * `SocketTimeoutException` after `ms` of silence — the liveness
    * primitive for detecting a peer that died without a FIN.
    */
  def setReadTimeout(ms: Int): Unit = socket.setSoTimeout(ms)

  /** RFC 5929 tls-server-end-point hash of the peer certificate — the
    * channel-binding data for SCRAM-SHA-256-PLUS; None on plaintext.
    */
  private def peerCertHash(sock: Socket): Option[Array[Byte]] = sock match {
    case s: javax.net.ssl.SSLSocket =>
      s.getSession.getPeerCertificates.headOption.collect {
        case c: java.security.cert.X509Certificate => Scram.tlsServerEndPointHash(c)
      }
    case _ => None
  }

  private def handshake(sock: Socket, in: DataInputStream, out: DataOutputStream): Unit = {
    val params = Seq("user" -> user, "database" -> database,
      "application_name" -> applicationName) ++
      (if (replication) Seq("replication" -> "database") else Nil)
    PgWire.writeStartup(out, params)
    var scram: ScramClient = null
    def requirePassword: String = password.getOrElse(throw new IllegalStateException(
      "pg: server requires a password, none configured"))
    var ready = false
    while (!ready) {
      val m = PgWire.readMessage(in)
      m.tag match {
        case PgWire.Tag.Authentication =>
          PgWire.authCode(m.payload) match {
            case 0 => // AuthenticationOk
            case 3 =>
              // Cleartext password — legacy servers only; prefer SCRAM. Over
              // a plaintext socket this sends the password in the clear,
              // exactly like libpq/pgx against the same server config.
              PgWire.writeMessage(out, PgWire.Tag.PasswordMessage,
                PgWire.queryPayload(requirePassword))
            case PgWire.AuthCodeSasl =>
              val mechs = PgWire.authSaslMechanisms(m.payload)
              // Prefer channel binding whenever the connection can bind
              // (TLS) and the server advertises -PLUS; over TLS without a
              // -PLUS offer, the "y" gs2 flag still rides inside the signed
              // auth message so a MITM-stripped mechanism list is detected.
              val certHash = peerCertHash(sock)
              val (mechanism, gs2) = (certHash, mechs.contains(Scram.MechanismPlus)) match {
                case (Some(hash), true) =>
                  (Scram.MechanismPlus, Scram.TlsServerEndPoint(hash))
                case (Some(_), false) if mechs.contains(Scram.Mechanism) =>
                  (Scram.Mechanism, Scram.SupportsButNotUsed)
                case (None, _) if mechs.contains(Scram.Mechanism) =>
                  (Scram.Mechanism, Scram.NoChannelBinding)
                case _ =>
                  throw new IllegalStateException(
                    s"pg: server offers no supported SASL mechanism (got ${mechs.mkString(", ")}; " +
                      s"supported: ${Scram.Mechanism}, ${Scram.MechanismPlus} over TLS)")
              }
              scram = new ScramClient(requirePassword, gs2 = gs2)
              PgWire.writeMessage(out, PgWire.Tag.PasswordMessage,
                PgWire.saslInitialResponsePayload(mechanism, scram.clientFirstMessage))
            case PgWire.AuthCodeSaslContinue =>
              if (scram == null)
                throw new IllegalStateException("pg: SASLContinue before SASL start")
              PgWire.writeMessage(out, PgWire.Tag.PasswordMessage,
                scram.clientFinal(PgWire.authSaslData(m.payload)))
            case PgWire.AuthCodeSaslFinal =>
              if (scram == null)
                throw new IllegalStateException("pg: SASLFinal before SASL start")
              scram.verifyServerFinal(PgWire.authSaslData(m.payload))
            case other =>
              throw new IllegalStateException(s"pg: unsupported authentication method $other")
          }
        case PgWire.Tag.ParameterStatus | PgWire.Tag.BackendKeyData | PgWire.Tag.NoticeResponse =>
        case PgWire.Tag.ReadyForQuery => ready = true
        case PgWire.Tag.ErrorResponse => throw PgConnection.serverError("startup", m.payload)
        case other =>
          throw new IllegalStateException(s"pg: unexpected message '${other.toChar}' during startup")
      }
    }
  }

  /** Simple-query execution: text-format rows, null for SQL NULL — the same
    * result shape as [[graft.snapshot.CatalogReader.SqlExecutor]]. A server
    * error surfaces as [[java.sql.SQLException]] carrying the SQLSTATE, so
    * [[graft.services.RetryingExecutor]] can classify it.
    */
  def simpleQuery(sql: String): Seq[Seq[String]] = synchronized {
    PgWire.writeMessage(out, PgWire.Tag.Query, PgWire.queryPayload(sql))
    val rows = Seq.newBuilder[Seq[String]]
    var err: java.sql.SQLException = null
    var ready = false
    while (!ready) {
      val m = PgWire.readMessage(in)
      m.tag match {
        case PgWire.Tag.DataRow =>
          rows += PgWire.parseDataRow(m.payload).map(_.orNull)
        case PgWire.Tag.RowDescription | PgWire.Tag.CommandComplete |
            PgWire.Tag.NoticeResponse | PgWire.Tag.ParameterStatus =>
        case PgWire.Tag.ReadyForQuery => ready = true
        case PgWire.Tag.ErrorResponse =>
          val f = PgWire.errorFields(m.payload)
          err = new java.sql.SQLException(
            f.getOrElse('M', "server error"), f.getOrElse('C', null))
        case other =>
          throw new IllegalStateException(s"pg: unexpected message '${other.toChar}' in query")
      }
    }
    if (err != null) throw err
    rows.result()
  }

  /** `COPY … FROM STDIN` over the simple protocol (text format) — the bulk
    * path PostgreSQL itself recommends for initial loads: one round-trip
    * per ~64 KiB of rows instead of one statement per batch. Returns the
    * row count the server confirms (`CommandComplete "COPY n"`).
    *
    * Text-format rendering per the COPY spec: columns tab-separated, rows
    * newline-terminated, `\N` for NULL, backslash/tab/newline/CR escaped.
    */
  def copyIn(sql: String, rows: Iterator[Seq[Option[String]]]): Long = synchronized {
    PgWire.writeMessage(out, PgWire.Tag.Query, PgWire.queryPayload(sql))
    var started = false
    while (!started) {
      val m = PgWire.readMessage(in)
      m.tag match {
        case PgWire.Tag.CopyInResponse => started = true
        case PgWire.Tag.ParameterStatus | PgWire.Tag.NoticeResponse => ()
        case PgWire.Tag.ErrorResponse =>
          val f = PgWire.errorFields(m.payload)
          drainToReady()
          throw new java.sql.SQLException(
            f.getOrElse('M', "server error"), f.getOrElse('C', null))
        case other =>
          throw new IllegalStateException(s"pg: unexpected message '${other.toChar}' starting COPY")
      }
    }
    val buf = new java.io.ByteArrayOutputStream(1 << 16)
    def flush(): Unit = if (buf.size() > 0) {
      PgWire.writeMessage(out, PgWire.Tag.CopyData, buf.toByteArray)
      buf.reset()
    }
    rows.foreach { r =>
      val line = r.map {
        case None => "\\N"
        case Some(v) => v.flatMap {
          case '\\' => "\\\\"
          case '\t' => "\\t"
          case '\n' => "\\n"
          case '\r' => "\\r"
          case c => c.toString
        }
      }.mkString("", "\t", "\n")
      buf.write(line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if (buf.size() >= (1 << 16)) flush()
    }
    flush()
    PgWire.writeMessage(out, PgWire.Tag.CopyDone, Array.emptyByteArray)
    var count = 0L
    var err: java.sql.SQLException = null
    var ready = false
    while (!ready) {
      val m = PgWire.readMessage(in)
      m.tag match {
        case PgWire.Tag.CommandComplete =>
          val txt = new String(m.payload, java.nio.charset.StandardCharsets.UTF_8)
          txt.takeWhile(_ != 0).split(" ").lastOption
            .flatMap(_.toLongOption).foreach(count = _)
        case PgWire.Tag.ReadyForQuery => ready = true
        case PgWire.Tag.NoticeResponse | PgWire.Tag.ParameterStatus => ()
        case PgWire.Tag.ErrorResponse =>
          val f = PgWire.errorFields(m.payload)
          err = new java.sql.SQLException(
            f.getOrElse('M', "server error"), f.getOrElse('C', null))
        case other =>
          throw new IllegalStateException(s"pg: unexpected message '${other.toChar}' ending COPY")
      }
    }
    if (err != null) throw err
    count
  }

  /** Consume messages until ReadyForQuery (error-path resynchronization). */
  private def drainToReady(): Unit = {
    var ready = false
    while (!ready) {
      val m = PgWire.readMessage(in)
      if (m.tag == PgWire.Tag.ReadyForQuery) ready = true
    }
  }

  /** The wire binding of the service-layer SQL seam — compose with
    * `RetryingExecutor.wrap` for the transient-failure policy.
    */
  def executor: String => Seq[Seq[String]] = simpleQuery _

  def isClosed: Boolean = socket.isClosed

  override def close(): Unit = {
    if (!socket.isClosed) {
      try PgWire.writeMessage(out, PgWire.Tag.Terminate, Array.emptyByteArray)
      catch { case _: java.io.IOException => () }
      try socket.close() catch { case _: java.io.IOException => () }
    }
  }
}

object PgConnection {

  /** SSLRequest magic (int32 after the length): 1234·2^16 + 5679. */
  val SslRequestCode = 80877103

  /** Dial and, per sslmode, negotiate TLS: write the 8-byte SSLRequest,
    * read the single 'S'/'N' response byte, then hand the raw socket to
    * JSSE for the handshake. No bytes beyond the response are read before
    * the upgrade, so no plaintext buffering can swallow TLS records.
    */
  val SslModes: Set[String] =
    Set("disable", "allow", "prefer", "require", "verify-ca", "verify-full")

  /** A rejection the SERVER sent (ErrorResponse) — distinguished from
    * socket-level failures so sslmode=allow knows when a TLS retry could
    * change the outcome.
    */
  final class ServerErrorException(msg: String, val sqlState: String = "")
    extends IllegalStateException(msg)

  private[pgproto] def negotiateSocket(
      host: String, port: Int, sslMode: String, sslRootCert: Option[String] = None,
      sslCert: Option[String] = None, sslKey: Option[String] = None,
      sslPassword: Option[String] = None): Socket = {
    // "allow" never reaches here: the connection layer lowers it to a
    // plaintext attempt plus a "require" retry.
    if (!SslModes.contains(sslMode) || sslMode == "allow")
      throw new IllegalArgumentException(
        s"pg: unsupported sslmode '$sslMode' (${SslModes.toSeq.sorted.mkString("|")})")
    val plain = new Socket(host, port)
    plain.setTcpNoDelay(true)
    def closeAnd(e: Throwable): Nothing = {
      try plain.close() catch { case _: java.io.IOException => () }
      throw e
    }
    sslMode match {
      case "disable" => plain
      case _ =>
        try {
          val dout = new DataOutputStream(plain.getOutputStream)
          dout.writeInt(8)
          dout.writeInt(SslRequestCode)
          dout.flush()
          plain.getInputStream.read() match {
            case 'S' =>
              sslUpgrade(plain, host, port, sslMode, sslRootCert, sslCert, sslKey, sslPassword)
            case 'N' if sslMode == "prefer" => plain
            case 'N' =>
              closeAnd(new IllegalStateException(
                s"pg: server does not support SSL and sslmode=$sslMode"))
            case -1 =>
              closeAnd(new java.io.EOFException(
                "pg: connection closed during SSL negotiation"))
            case other =>
              closeAnd(new IllegalStateException(
                s"pg: unexpected SSL negotiation response $other"))
          }
        } catch { case e: java.io.IOException => closeAnd(e) }
    }
  }

  /** libpq verification tiers: `require`/`prefer` encrypt but do NOT verify
    * the chain (self-signed managed-database certs work out of the box);
    * `verify-ca` verifies the chain — against the `sslrootcert` PEM file
    * when given, else the JVM's default trust store; `verify-full`
    * additionally verifies the hostname (the same RFC 2818 rules HTTPS
    * uses).
    */
  private def sslUpgrade(
      plain: Socket, host: String, port: Int, sslMode: String,
      sslRootCert: Option[String], sslCert: Option[String],
      sslKey: Option[String], sslPassword: Option[String]): Socket = {
    import javax.net.ssl.{SSLContext, SSLSocket, TrustManager, X509TrustManager}
    val verifyChain = sslMode == "verify-ca" || sslMode == "verify-full"
    // Client cert is presented whenever configured, on every tier — libpq
    // sends it as soon as the server's handshake requests one.
    val kms = (sslCert, sslKey) match {
      case (Some(c), Some(k)) => clientKeyManagers(c, k, sslPassword)
      case _ => null
    }
    val trust: Array[TrustManager] =
      if (verifyChain) sslRootCert.map(caTrustManagers).orNull // null = JVM default store
      else Array[TrustManager](new X509TrustManager {
        override def checkClientTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
        override def checkServerTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
        override def getAcceptedIssuers: Array[java.security.cert.X509Certificate] = Array.empty
      })
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kms, trust, new java.security.SecureRandom)
    val ssl = ctx.getSocketFactory.createSocket(plain, host, port, true)
      .asInstanceOf[SSLSocket]
    ssl.setUseClientMode(true)
    if (sslMode == "verify-full") {
      val params = ssl.getSSLParameters
      params.setEndpointIdentificationAlgorithm("HTTPS")
      ssl.setSSLParameters(params)
    }
    ssl.startHandshake()
    ssl
  }

  /** Trust managers built from a PEM CA bundle — libpq's `sslrootcert`
    * semantics: the file's certificate(s) become the ONLY trust anchors (no
    * default-store union, same as libpq), loaded into an in-memory keystore.
    */
  private[pgproto] def caTrustManagers(caFile: String): Array[javax.net.ssl.TrustManager] = {
    import scala.jdk.CollectionConverters._
    val cf = java.security.cert.CertificateFactory.getInstance("X.509")
    val fis = new java.io.FileInputStream(caFile)
    val certs = try cf.generateCertificates(fis).asScala.toSeq finally fis.close()
    if (certs.isEmpty)
      throw new IllegalArgumentException(s"pg: sslrootcert '$caFile' contains no certificates")
    val ks = java.security.KeyStore.getInstance(java.security.KeyStore.getDefaultType)
    ks.load(null, null)
    certs.zipWithIndex.foreach { case (c, i) => ks.setCertificateEntry(s"graft-ca-$i", c) }
    val tmf = javax.net.ssl.TrustManagerFactory.getInstance(
      javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(ks)
    tmf.getTrustManagers
  }

  /** Key managers from libpq's `sslcert`/`sslkey` pair: an X.509 PEM cert
    * chain plus an unencrypted PKCS#8 PEM private key (RSA, EC, or Ed25519
    * — tried in that order), loaded into an in-memory PKCS12 keystore.
    */
  private def clientKeyManagers(
      certFile: String, keyFile: String,
      sslPassword: Option[String]): Array[javax.net.ssl.KeyManager] = {
    import scala.jdk.CollectionConverters._
    val cf = java.security.cert.CertificateFactory.getInstance("X.509")
    val fis = new java.io.FileInputStream(certFile)
    val chain: Array[java.security.cert.Certificate] =
      try cf.generateCertificates(fis).asScala.toArray finally fis.close()
    if (chain.isEmpty)
      throw new IllegalArgumentException(s"pg: sslcert '$certFile' contains no certificates")
    val pem = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(keyFile)), java.nio.charset.StandardCharsets.US_ASCII)
    if (pem.contains("BEGIN RSA PRIVATE KEY") || pem.contains("BEGIN EC PRIVATE KEY"))
      throw new IllegalArgumentException(
        s"pg: sslkey '$keyFile' is PKCS#1/SEC1; re-encode with " +
          "'openssl pkcs8 -topk8 -nocrypt' (PKCS#8, BEGIN PRIVATE KEY)")
    val b64 = pem.linesIterator
      .filterNot(l => l.startsWith("-----") || l.isBlank).mkString
    val der =
      try java.util.Base64.getDecoder.decode(b64)
      catch { case e: IllegalArgumentException =>
        throw new IllegalArgumentException(s"pg: sslkey '$keyFile' is not PEM: ${e.getMessage}")
      }
    val spec =
      if (pem.contains("BEGIN ENCRYPTED PRIVATE KEY")) {
        val pass = sslPassword.getOrElse(throw new IllegalArgumentException(
          s"pg: sslkey '$keyFile' is encrypted — set sslpassword"))
        Pkcs8.decrypt(der, pass)
      } else new java.security.spec.PKCS8EncodedKeySpec(der)
    val key = Seq("RSA", "EC", "Ed25519").view.flatMap { alg =>
      try Some(java.security.KeyFactory.getInstance(alg).generatePrivate(spec))
      catch { case _: java.security.spec.InvalidKeySpecException => None }
    }.headOption.getOrElse(throw new IllegalArgumentException(
      s"pg: sslkey '$keyFile' is not an RSA/EC/Ed25519 PKCS#8 key"))
    val ks = java.security.KeyStore.getInstance("PKCS12")
    ks.load(null, null)
    ks.setKeyEntry("client", key, Array.emptyCharArray, chain)
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, Array.emptyCharArray)
    kmf.getKeyManagers
  }

  def serverError(phase: String, payload: Array[Byte]): ServerErrorException = {
    val f = PgWire.errorFields(payload)
    new ServerErrorException(
      s"pg: server error during $phase: ${f.getOrElse('S', "ERROR")} " +
        s"${f.getOrElse('C', "?????")}: ${f.getOrElse('M', "(no message)")}",
      sqlState = f.getOrElse('C', ""))
  }
}
