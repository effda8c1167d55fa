package graft.pgproto

import java.security.spec.PKCS8EncodedKeySpec
import javax.crypto.{Cipher, SecretKeyFactory}
import javax.crypto.spec.{IvParameterSpec, PBEKeySpec, SecretKeySpec}

/** Encrypted PKCS#8 ("BEGIN ENCRYPTED PRIVATE KEY") decryption — libpq's
  * `sslpassword` semantics for the `sslkey` file.
  *
  * OpenSSL encrypts private keys with PBES2 (RFC 8018: PBKDF2 key
  * derivation + AES-CBC or 3DES-CBC), and the JDK's
  * `EncryptedPrivateKeyInfo.getKeySpec` cannot resolve PBES2 parameters
  * (`SecretKeyFactory.getInstance("PBES2")` throws through at least JDK 17).
  * So the PBES2 AlgorithmIdentifier is walked here with a minimal DER
  * reader — SEQUENCE / OID / OCTET STRING / INTEGER are the only shapes the
  * structure uses — and the actual cryptography is delegated to the JDK's
  * PBKDF2 and cipher primitives. Legacy PKCS#5 v1.5 schemes (e.g.
  * pbeWithSHA1And3-KeyTripleDES-CBC) go through the JDK's own
  * EncryptedPrivateKeyInfo path, which does support them.
  */
object Pkcs8 {

  /** Minimal DER cursor over the fixed PBES2 layout. */
  private final class Der(buf: Array[Byte], var pos: Int, val end: Int) {
    def readHeader(expectTag: Int): Int = {
      require(pos < end, "pkcs8: truncated DER")
      val tag = buf(pos) & 0xff
      require(tag == expectTag, f"pkcs8: expected DER tag 0x$expectTag%02x, got 0x$tag%02x")
      pos += 1
      val first = buf(pos) & 0xff
      pos += 1
      val len =
        if ((first & 0x80) == 0) first
        else {
          val n = first & 0x7f
          require(n >= 1 && n <= 4, s"pkcs8: unsupported DER length-of-length $n")
          var v = 0
          for (_ <- 0 until n) { v = (v << 8) | (buf(pos) & 0xff); pos += 1 }
          v
        }
      require(pos + len <= end, "pkcs8: DER length overruns buffer")
      len
    }
    def sequence(): Der = {
      val len = readHeader(0x30)
      val inner = new Der(buf, pos, pos + len)
      pos += len
      inner
    }
    def oid(): String = {
      val len = readHeader(0x06)
      val sb = new StringBuilder
      val first = buf(pos) & 0xff
      sb.append(first / 40).append('.').append(first % 40)
      var i = 1
      var acc = 0L
      while (i < len) {
        val b = buf(pos + i) & 0xff
        acc = (acc << 7) | (b & 0x7f)
        if ((b & 0x80) == 0) { sb.append('.').append(acc); acc = 0 }
        i += 1
      }
      pos += len
      sb.toString
    }
    def octetString(): Array[Byte] = {
      val len = readHeader(0x04)
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + len)
      pos += len
      out
    }
    def integer(): Int = {
      val len = readHeader(0x02)
      var v = 0
      for (i <- 0 until len) v = (v << 8) | (buf(pos + i) & 0xff)
      pos += len
      v
    }
    def atEnd: Boolean = pos >= end
    def peekTag: Int = if (pos < end) buf(pos) & 0xff else -1
  }

  private val OidPbes2 = "1.2.840.113549.1.5.13"
  private val OidPbkdf2 = "1.2.840.113549.1.5.12"
  private val Prfs = Map(
    "1.2.840.113549.2.7" -> "PBKDF2WithHmacSHA1",
    "1.2.840.113549.2.9" -> "PBKDF2WithHmacSHA256",
    "1.2.840.113549.2.10" -> "PBKDF2WithHmacSHA384",
    "1.2.840.113549.2.11" -> "PBKDF2WithHmacSHA512")
  /** cipher OID → (JCE transformation base, key bytes) */
  private val Ciphers = Map(
    "2.16.840.1.101.3.4.1.2" -> ("AES", 16),
    "2.16.840.1.101.3.4.1.22" -> ("AES", 24),
    "2.16.840.1.101.3.4.1.42" -> ("AES", 32),
    "1.2.840.113549.3.7" -> ("DESede", 24))

  /** Decrypt an encrypted-PKCS#8 DER blob into the plain PKCS#8 key spec. */
  def decrypt(der: Array[Byte], password: String): PKCS8EncodedKeySpec = {
    val top = new Der(der, 0, der.length).sequence()
    val algSeq = top.sequence()
    val algOid = algSeq.oid()
    if (algOid != OidPbes2) {
      // PKCS#5 v1.5 / PKCS#12 PBE: the JDK path handles these natively.
      val epki = new javax.crypto.EncryptedPrivateKeyInfo(der)
      val skf = SecretKeyFactory.getInstance(epki.getAlgName)
      return epki.getKeySpec(skf.generateSecret(new PBEKeySpec(password.toCharArray)))
    }
    val params = algSeq.sequence()
    // keyDerivationFunc: PBKDF2 { salt, iterations, [keyLength], [prf] }
    val kdfSeq = params.sequence()
    require(kdfSeq.oid() == OidPbkdf2, "pkcs8: PBES2 without PBKDF2 is unsupported")
    val kdfParams = kdfSeq.sequence()
    val salt = kdfParams.octetString()
    val iterations = kdfParams.integer()
    var declaredKeyLen = -1
    if (!kdfParams.atEnd && kdfParams.peekTag == 0x02) declaredKeyLen = kdfParams.integer()
    val prf =
      if (!kdfParams.atEnd && kdfParams.peekTag == 0x30) {
        val prfSeq = kdfParams.sequence()
        val prfOid = prfSeq.oid()
        Prfs.getOrElse(prfOid, throw new IllegalArgumentException(
          s"pkcs8: unsupported PBKDF2 PRF OID $prfOid"))
      } else "PBKDF2WithHmacSHA1" // RFC 8018 default
    // encryptionScheme: { cipher OID, IV }
    val encSeq = params.sequence()
    val cipherOid = encSeq.oid()
    val (cipherAlg, keyLen) = Ciphers.getOrElse(cipherOid,
      throw new IllegalArgumentException(s"pkcs8: unsupported PBES2 cipher OID $cipherOid"))
    val iv = encSeq.octetString()
    val encrypted = top.octetString()

    val kdf = SecretKeyFactory.getInstance(prf)
    val bits = (if (declaredKeyLen > 0) declaredKeyLen else keyLen) * 8
    val derived = kdf.generateSecret(
      new PBEKeySpec(password.toCharArray, salt, iterations, bits)).getEncoded
    val cipher = Cipher.getInstance(s"$cipherAlg/CBC/PKCS5Padding")
    cipher.init(Cipher.DECRYPT_MODE,
      new SecretKeySpec(derived, cipherAlg), new IvParameterSpec(iv))
    val plain =
      try cipher.doFinal(encrypted)
      catch { case e: javax.crypto.BadPaddingException =>
        throw new IllegalArgumentException(
          "pkcs8: decryption failed — wrong sslpassword?", e)
      }
    new PKCS8EncodedKeySpec(plain)
  }
}
