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
  * Passwords pass through SASLprep ([[Scram.saslPrep]], RFC 4013) before
  * key derivation, as RFC 5802 §2.2 requires — so non-ASCII passwords
  * produce the same keys as libpq/PostgreSQL, which normalize on both
  * store and verify.
  */
object Scram {

  /** SASLprep (RFC 4013, the stringprep profile SCRAM mandates for
    * passwords): map non-ASCII spaces to SPACE and drop the
    * map-to-nothing set (soft hyphens, ZW(N)J, variation selectors …),
    * NFKC-normalize, then reject prohibited output (control, private-use,
    * non-character, surrogate, bidi-inappropriate code points) and mixed /
    * misordered bidi runs.
    *
    * On ANY prohibition the original string is returned VERBATIM — the
    * same fallback PostgreSQL's own `pg_saslprep` uses, so a password that
    * was stored unprepped (pre-normalization server, exotic input) still
    * authenticates. ASCII passwords are returned unchanged by
    * construction, keeping the RFC 7677 "pencil" vector intact.
    */
  def saslPrep(password: String): String = {
    // Step 1 (RFC 3454 §3): character mapping, on code points.
    val mapped = new java.lang.StringBuilder(password.length)
    var i = 0
    while (i < password.length) {
      val cp = password.codePointAt(i)
      if (isMapToNothing(cp)) ()              // Table B.1
      else if (isNonAsciiSpace(cp)) mapped.append(' ') // Table C.1.2
      else mapped.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    // Step 2: NFKC normalization.
    val norm = java.text.Normalizer.normalize(mapped, java.text.Normalizer.Form.NFKC)
    // Step 3: prohibited output + bidi rules; any hit → verbatim fallback.
    var hasRandAL = false
    var hasL = false
    var firstCp = -1
    var lastCp = -1
    var j = 0
    while (j < norm.length) {
      val cp = norm.codePointAt(j)
      if (isProhibited(cp)) return password
      val dir = Character.getDirectionality(cp)
      if (dir == Character.DIRECTIONALITY_RIGHT_TO_LEFT ||
          dir == Character.DIRECTIONALITY_RIGHT_TO_LEFT_ARABIC) hasRandAL = true
      if (dir == Character.DIRECTIONALITY_LEFT_TO_RIGHT) hasL = true
      if (firstCp < 0) firstCp = cp
      lastCp = cp
      j += Character.charCount(cp)
    }
    if (hasRandAL) {
      // RFC 3454 §6: RandALCat strings must be pure and RandAL-delimited.
      def randAL(cp: Int) = {
        val d = Character.getDirectionality(cp)
        d == Character.DIRECTIONALITY_RIGHT_TO_LEFT ||
          d == Character.DIRECTIONALITY_RIGHT_TO_LEFT_ARABIC
      }
      if (hasL || !randAL(firstCp) || !randAL(lastCp)) return password
    }
    norm
  }

  /** RFC 3454 Table B.1 — commonly-mapped-to-nothing. */
  private def isMapToNothing(cp: Int): Boolean = cp match {
    case 0x00AD | 0x034F | 0x1806 | 0x180B | 0x180C | 0x180D |
         0x200B | 0x200C | 0x200D | 0x2060 | 0xFEFF => true
    case _ => cp >= 0xFE00 && cp <= 0xFE0F
  }

  /** RFC 3454 Table C.1.2 — non-ASCII space characters. */
  private def isNonAsciiSpace(cp: Int): Boolean = cp match {
    case 0x00A0 | 0x1680 | 0x2028 | 0x2029 | 0x202F | 0x205F | 0x3000 => true
    case _ => cp >= 0x2000 && cp <= 0x200A
  }

  /** RFC 4013 §2.3 prohibited output: Tables C.2.1, C.2.2, C.3–C.9 plus
    * unassigned code points (§2.5, stored-strings rule).
    */
  private def isProhibited(cp: Int): Boolean =
    (cp <= 0x001F) || cp == 0x007F ||                    // C.2.1 ASCII control
    (cp >= 0x0080 && cp <= 0x009F) ||                    // C.2.2 non-ASCII control
    cp == 0x06DD || cp == 0x070F || cp == 0x180E ||
    (cp >= 0x2060 && cp <= 0x2063) ||
    (cp >= 0x206A && cp <= 0x206F) ||                    // also C.8
    cp == 0xFEFF || (cp >= 0xFFF9 && cp <= 0xFFFD) ||    // + C.6
    (cp >= 0x1D173 && cp <= 0x1D17A) ||
    (cp >= 0xE000 && cp <= 0xF8FF) ||                    // C.3 private use
    (cp >= 0xF0000 && cp <= 0xFFFFD) || (cp >= 0x100000 && cp <= 0x10FFFD) ||
    (cp >= 0xFDD0 && cp <= 0xFDEF) || (cp & 0xFFFE) == 0xFFFE || // C.4 non-chars
    (cp >= 0xD800 && cp <= 0xDFFF) ||                    // C.5 surrogates
    (cp >= 0x2FF0 && cp <= 0x2FFB) ||                    // C.7 ideograph desc
    cp == 0x0340 || cp == 0x0341 || cp == 0x200E || cp == 0x200F ||
    (cp >= 0x202A && cp <= 0x202E) ||                    // C.8 bidi controls
    cp == 0xE0001 || (cp >= 0xE0020 && cp <= 0xE007F) || // C.9 tagging
    !Character.isDefined(cp)                             // §2.5 unassigned

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

    val salted = Scram.saltedPassword(Scram.saslPrep(password), salt, iters)
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
