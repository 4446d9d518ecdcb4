package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest
import java.util.Base64

import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}
import javax.crypto.{Cipher, Mac}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Fernet symmetric encryption (https://github.com/fernet/spec) for the
  * Crypt filter (reference: filter/crypt.go:26-148 — the reference vendors
  * its own fernet implementation too).
  *
  * Token layout: `0x80 | ts(8, BE) | iv(16) | AES-128-CBC/PKCS7 ciphertext |
  * HMAC-SHA256(signing_key, all previous bytes)`, base64url-encoded.
  * Key: 32 bytes base64url — first 16 = signing key, last 16 = encryption key.
  *
  * This is the one operator in the whole filter pack that genuinely needs a
  * UDF (crypto-bound, not expressible as Catalyst expressions — SURVEY §7.2).
  * Throughput is dominated by AES, not by the UDF boundary.
  *
  * [[encryptCol]] is the production path: SecureRandom IV + wall-clock
  * timestamp per token (spec-compliant — identical plaintexts yield distinct
  * tokens, leaking nothing about value equality/frequency), marked
  * non-deterministic so Catalyst never deduplicates or re-executes it
  * assuming stability. [[encryptColDeterministic]] is a test-only helper
  * (IV/ts derived from the plaintext) for golden/oracle comparisons.
  */
object Fernet {

  private val B64 = Base64.getUrlEncoder.withoutPadding
  private val B64D = Base64.getUrlDecoder

  final case class Key(signing: Array[Byte], encryption: Array[Byte])

  def decodeKey(b64Key: String): Key = {
    val raw = B64D.decode(b64Key)
    require(raw.length == 32, s"fernet key must be 32 bytes, got ${raw.length}")
    Key(raw.slice(0, 16), raw.slice(16, 32))
  }

  /** Derive a 32-byte urlsafe-base64 key from a passphrase (test helper). */
  def keyFromPassphrase(pass: String): String =
    B64.encodeToString(MessageDigest.getInstance("SHA-256").digest(pass.getBytes("UTF-8")))

  def encrypt(key: Key, plaintext: Array[Byte], iv: Array[Byte], tsSec: Long): String = {
    val cipher = Cipher.getInstance("AES/CBC/PKCS5Padding")
    cipher.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key.encryption, "AES"),
      new IvParameterSpec(iv))
    val ct = cipher.doFinal(plaintext)
    val buf = ByteBuffer.allocate(1 + 8 + 16 + ct.length)
    buf.put(0x80.toByte).putLong(tsSec).put(iv).put(ct)
    val body = buf.array()
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key.signing, "HmacSHA256"))
    val sig = mac.doFinal(body)
    val out = new Array[Byte](body.length + 32)
    System.arraycopy(body, 0, out, 0, body.length)
    System.arraycopy(sig, 0, out, body.length, 32)
    B64.encodeToString(out)
  }

  /** Decrypt; returns None on any malformed/forged/expired token (the Crypt
    * filter drops such records, crypt.go:96-102).
    */
  def decrypt(key: Key, token: String, ttlSec: Long = 0, nowSec: Long = 0): Option[Array[Byte]] =
    try {
      val raw = B64D.decode(token)
      if (raw.length < 1 + 8 + 16 + 32 || raw(0) != 0x80.toByte) return None
      val body = raw.slice(0, raw.length - 32)
      val sig = raw.slice(raw.length - 32, raw.length)
      val mac = Mac.getInstance("HmacSHA256")
      mac.init(new SecretKeySpec(key.signing, "HmacSHA256"))
      if (!MessageDigest.isEqual(mac.doFinal(body), sig)) return None
      val ts = ByteBuffer.wrap(raw, 1, 8).getLong
      if (ttlSec > 0 && nowSec > ts + ttlSec) return None
      val iv = raw.slice(9, 25)
      val ct = raw.slice(25, raw.length - 32)
      val cipher = Cipher.getInstance("AES/CBC/PKCS5Padding")
      cipher.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key.encryption, "AES"),
        new IvParameterSpec(iv))
      Some(cipher.doFinal(ct))
    } catch { case _: Exception => None }

  /** Production encrypt Column: fresh SecureRandom IV + wall-clock timestamp
    * per token, matching the reference's fernet EncryptAndSign
    * (filter/crypt.go:91-94). Non-deterministic by construction.
    */
  def encryptCol(b64Key: String): Column => Column = {
    val f = udf { (s: String) =>
      if (s == null) null
      else {
        val iv = new Array[Byte](16)
        rng.get().nextBytes(iv)
        encrypt(decodeKey(b64Key), s.getBytes("UTF-8"), iv,
          System.currentTimeMillis() / 1000)
      }
    }.asNondeterministic()
    c => f(c)
  }

  private val rng = new ThreadLocal[java.security.SecureRandom] {
    override def initialValue(): java.security.SecureRandom =
      new java.security.SecureRandom()
  }

  /** TEST-ONLY deterministic encrypt (iv/ts derived from the plaintext so
    * encrypt∘decrypt is a stable identity for golden files). Never use for
    * real data: equal plaintexts produce equal tokens.
    */
  def encryptColDeterministic(b64Key: String): Column => Column = {
    val f = udf { (s: String) =>
      if (s == null) null
      else {
        val key = decodeKey(b64Key)
        val iv = MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8")).slice(0, 16)
        encrypt(key, s.getBytes("UTF-8"), iv, 0L)
      }
    }
    c => f(c)
  }

  /** Decrypt Column; null on failure (callers drop nulls, crypt.go:96-102). */
  def decryptCol(b64Key: String, ttlSec: Long = 0): Column => Column = {
    val f = udf { (s: String) =>
      if (s == null) null
      else decrypt(decodeKey(b64Key), s, ttlSec,
        if (ttlSec > 0) System.currentTimeMillis() / 1000 else 0L)
        .map(new String(_, "UTF-8")).orNull
    }
    c => f(c)
  }
}
