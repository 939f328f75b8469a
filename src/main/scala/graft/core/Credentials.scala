package graft.core

import java.security.SecureRandom
import java.util.Base64
import javax.crypto.spec.{IvParameterSpec, PBEKeySpec, SecretKeySpec}
import javax.crypto.{Cipher, SecretKeyFactory}

/** Credential encryption with the reference's scheme (SURVEY.md §2.7
  * X10; reference encrypt_decrypt.py:24-39): PBKDF2-HMAC-SHA1 key
  * derivation + AES-CBC + base64, driver-side only — secrets never
  * enter a Spark plan. (For column-level crypto inside queries Spark
  * ships aes_encrypt/aes_decrypt built-ins; this class is the
  * config-layer counterpart.)
  */
final class Credentials(password: String, salt: Array[Byte],
                        iterations: Int = 65536) {

  private def key: SecretKeySpec = {
    val spec = new PBEKeySpec(password.toCharArray, salt, iterations, 256)
    val f = SecretKeyFactory.getInstance("PBKDF2WithHmacSHA1")
    new SecretKeySpec(f.generateSecret(spec).getEncoded, "AES")
  }

  /** Encrypt; output is base64(iv ++ ciphertext). */
  def encrypt(plain: String): String = {
    val iv = new Array[Byte](16)
    new SecureRandom().nextBytes(iv)
    val c = Cipher.getInstance("AES/CBC/PKCS5Padding")
    c.init(Cipher.ENCRYPT_MODE, key, new IvParameterSpec(iv))
    val ct = c.doFinal(plain.getBytes("UTF-8"))
    Base64.getEncoder.encodeToString(iv ++ ct)
  }

  def decrypt(encoded: String): String = {
    val raw = Base64.getDecoder.decode(encoded)
    val (iv, ct) = raw.splitAt(16)
    val c = Cipher.getInstance("AES/CBC/PKCS5Padding")
    c.init(Cipher.DECRYPT_MODE, key, new IvParameterSpec(iv))
    new String(c.doFinal(ct), "UTF-8")
  }
}
