package graft.pgproto

import java.nio.charset.StandardCharsets.UTF_8
import java.security.{MessageDigest, SecureRandom}
import java.util.Base64
import javax.crypto.Mac
import javax.crypto.spec.{PBEKeySpec, SecretKeySpec}

/** SCRAM-SHA-256 primitives (RFC 5802 §2.2/§3, RFC 7677) — pure JDK crypto
  * (PBKDF2WithHmacSHA256, HmacSHA256, SHA-256). PostgreSQL ≥10 offers this
  * as the default password method (`password_encryption = scram-sha-256`
  * since v14), carried over the protocol's AuthenticationSASL* messages
  * ("Message Flow → SASL Authentication" in the public docs); the reference
  * gets the same exchange from its pgx dependency (`go.mod` jackc/pgx/v5).
  *
  * Passwords are used verbatim (no SASLprep normalization) — correct for
  * ASCII passwords, which is also pgx's effective behavior for them.
  */
object Scram {

  val Mechanism = "SCRAM-SHA-256"
  val MechanismPlus = "SCRAM-SHA-256-PLUS"
  /** base64("n,,") — the gs2 header for channel-binding "none". */
  val Gs2HeaderB64 = "biws"

  /** The client's channel-binding stance (RFC 5802 §6 gs2-cbind-flag):
    *  - [[NoChannelBinding]]: "n" — client cannot bind (plaintext socket);
    *  - [[SupportsButNotUsed]]: "y" — client CAN bind (TLS) but the server
    *    did not advertise the -PLUS mechanism. The flag is inside the
    *    signed auth message, so a MITM stripping -PLUS from the mechanism
    *    list is detected by a binding-capable server;
    *  - [[TlsServerEndPoint]]: "p=tls-server-end-point" with the peer
    *    certificate's RFC 5929 hash mixed into the signed c= attribute.
    */
  sealed trait Gs2
  case object NoChannelBinding extends Gs2
  case object SupportsButNotUsed extends Gs2
  final case class TlsServerEndPoint(certHash: Array[Byte]) extends Gs2

  /** RFC 5929 tls-server-end-point: hash the DER cert with its signature
    * hash algorithm, upgrading MD5/SHA-1 to SHA-256.
    */
  def tlsServerEndPointHash(cert: java.security.cert.X509Certificate): Array[Byte] = {
    val alg = cert.getSigAlgName.toUpperCase match {
      case a if a.contains("SHA384") => "SHA-384"
      case a if a.contains("SHA512") => "SHA-512"
      case _ => "SHA-256" // incl. the mandated MD5/SHA-1 upgrade
    }
    MessageDigest.getInstance(alg).digest(cert.getEncoded)
  }

  def sha256(b: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(b)

  def hmac(key: Array[Byte], msg: Array[Byte]): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(msg)
  }

  /** Hi(str, salt, i) = PBKDF2-HMAC-SHA-256, 32-byte output (RFC 5802 §2.2). */
  def hi(password: String, salt: Array[Byte], iterations: Int): Array[Byte] = {
    val spec = new PBEKeySpec(password.toCharArray, salt, iterations, 256)
    javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      .generateSecret(spec).getEncoded
  }

  def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    a.zip(b).map { case (x, y) => (x ^ y).toByte }

  def b64(b: Array[Byte]): String = Base64.getEncoder.encodeToString(b)
  def unb64(s: String): Array[Byte] = Base64.getDecoder.decode(s)

  /** Parse `k1=v1,k2=v2,...` (values may contain '='; split on the first). */
  def attrs(msg: String): Map[Char, String] =
    msg.split(",").filter(_.length >= 2).map(kv => kv.charAt(0) -> kv.drop(2)).toMap

  def saltedPassword(password: String, saltB64: String, iterations: Int): Array[Byte] =
    hi(password, unb64(saltB64), iterations)
  def clientKey(salted: Array[Byte]): Array[Byte] = hmac(salted, "Client Key".getBytes(UTF_8))
  def storedKey(ck: Array[Byte]): Array[Byte] = sha256(ck)
  def serverKey(salted: Array[Byte]): Array[Byte] = hmac(salted, "Server Key".getBytes(UTF_8))
}

/** Client state machine for one SCRAM-SHA-256 exchange (channel binding
  * "n" — not attempted). Usage: send [[clientFirstMessage]] in a
  * SASLInitialResponse, feed AuthenticationSASLContinue's payload to
  * [[clientFinal]], feed AuthenticationSASLFinal's payload to
  * [[verifyServerFinal]] — which throws if the server's signature is wrong
  * (a server that doesn't know the password, i.e. MITM detection).
  */
final class ScramClient(
    password: String,
    /** PostgreSQL sends an empty SCRAM username (the startup user wins);
      * the RFC 7677 test vector uses "user".
      */
    username: String = "",
    /** Test seam: fix the client nonce to replay a published vector. */
    nonceOverride: Option[String] = None,
    gs2: Scram.Gs2 = Scram.NoChannelBinding) {

  private val clientNonce: String = nonceOverride.getOrElse {
    val b = new Array[Byte](18)
    new SecureRandom().nextBytes(b)
    Scram.b64(b)
  }
  private val clientFirstBare = s"n=$username,r=$clientNonce"
  private var serverSignature: Array[Byte] = _

  private val gs2Header: String = gs2 match {
    case Scram.NoChannelBinding => "n,,"
    case Scram.SupportsButNotUsed => "y,,"
    case Scram.TlsServerEndPoint(_) => "p=tls-server-end-point,,"
  }

  /** The signed c= attribute: base64 of the gs2 header plus (for -PLUS)
    * the channel-binding data itself.
    */
  private val cbindB64: String = gs2 match {
    case Scram.TlsServerEndPoint(hash) =>
      Scram.b64(gs2Header.getBytes(UTF_8) ++ hash)
    case _ => Scram.b64(gs2Header.getBytes(UTF_8))
  }

  def clientFirstMessage: Array[Byte] = s"$gs2Header$clientFirstBare".getBytes(UTF_8)

  /** Build the client-final-message from the server-first-message. */
  def clientFinal(serverFirst: Array[Byte]): Array[Byte] = {
    val sf = new String(serverFirst, UTF_8)
    val a = Scram.attrs(sf)
    val nonce = a.getOrElse('r', throw new IllegalStateException(s"scram: no nonce in '$sf'"))
    if (!nonce.startsWith(clientNonce))
      throw new IllegalStateException("scram: server nonce does not extend client nonce")
    val salt = a.getOrElse('s', throw new IllegalStateException("scram: no salt"))
    val iters = a.getOrElse('i', throw new IllegalStateException("scram: no iteration count")).toInt
    if (iters < 1) throw new IllegalStateException(s"scram: bad iteration count $iters")

    val salted = Scram.saltedPassword(password, salt, iters)
    val ck = Scram.clientKey(salted)
    val withoutProof = s"c=$cbindB64,r=$nonce"
    val authMessage = s"$clientFirstBare,$sf,$withoutProof".getBytes(UTF_8)
    val proof = Scram.xor(ck, Scram.hmac(Scram.storedKey(ck), authMessage))
    serverSignature = Scram.hmac(Scram.serverKey(salted), authMessage)
    s"$withoutProof,p=${Scram.b64(proof)}".getBytes(UTF_8)
  }

  /** Check the server proved knowledge of the password (RFC 5802 §5, `v=`). */
  def verifyServerFinal(serverFinal: Array[Byte]): Unit = {
    val a = Scram.attrs(new String(serverFinal, UTF_8))
    val v = a.getOrElse('v', throw new IllegalStateException("scram: server-final without v="))
    if (serverSignature == null)
      throw new IllegalStateException("scram: server-final before client-final")
    if (!MessageDigest.isEqual(Scram.unb64(v), serverSignature))
      throw new IllegalStateException("scram: server signature mismatch (wrong server credentials)")
  }
}
