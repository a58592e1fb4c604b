package graft.runtime

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode, TextNode}
import java.nio.charset.StandardCharsets.UTF_8
import scala.jdk.CollectionConverters._

/** Config-file secrets: `PWENC:`-tagged property encryption, the reference's
  * EncryptionService + JsonSecrets walk (Source/Services/EncryptionService.cs
  * :149-153,255-341, Source/Helpers/JsonSecrets.cs:12-31) re-expressed as a
  * pure JSON rewrite over a pluggable cipher.
  *
  * What is mirrored exactly:
  *  - the `PWENC:` header marks an encrypted value; encryption is IDEMPOTENT
  *    (already-tagged values are left alone — EncryptIfPlain), so
  *    re-encrypting an encrypted file is byte-identical;
  *  - the property walk: every string under `ConnectionStrings`, every
  *    string under `ChangeTracking.ApiAuth` (legacy), [[Secrets.AuthProps]]
  *    under each `ApiEndpoints[].Auth`, [[Secrets.MessageQueueProps]] under
  *    each `ApiEndpoints[].MessageQueue` — and nothing else (a file with
  *    none of those sections is not rewritten at all);
  *  - decryption walks the same path, so load → use → re-save round-trips.
  *
  * What is deliberately NOT mirrored: the reference's RSA+AES hybrid with a
  * machine-held recovery key file — that is a Windows-host key-management
  * choice, not data-plane semantics. The cipher here is pluggable
  * ([[SecretCipher]]); the default [[AesGcmCipher]] is JDK-only AES-256-GCM
  * with a random nonce per value (authenticated, no padding oracles).
  */
trait SecretCipher {
  def encrypt(plain: String): String
  def decrypt(cipher: String): String
}

/** AES-256-GCM over a SHA-256-derived key; value format
  * `base64(nonce)::base64(ciphertext+tag)`. */
final class AesGcmCipher(passphrase: String) extends SecretCipher {
  private val key = new javax.crypto.spec.SecretKeySpec(
    java.security.MessageDigest.getInstance("SHA-256").digest(passphrase.getBytes(UTF_8)),
    "AES")
  private val rnd = new java.security.SecureRandom()
  private def b64(b: Array[Byte]) = java.util.Base64.getEncoder.encodeToString(b)
  private def unb64(s: String) = java.util.Base64.getDecoder.decode(s)

  override def encrypt(plain: String): String = {
    val nonce = new Array[Byte](12)
    rnd.nextBytes(nonce)
    val c = javax.crypto.Cipher.getInstance("AES/GCM/NoPadding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE, key,
      new javax.crypto.spec.GCMParameterSpec(128, nonce))
    b64(nonce) + "::" + b64(c.doFinal(plain.getBytes(UTF_8)))
  }

  override def decrypt(cipher: String): String = {
    val parts = cipher.split("::", -1)
    require(parts.length == 2, "invalid encrypted format")
    val c = javax.crypto.Cipher.getInstance("AES/GCM/NoPadding")
    c.init(javax.crypto.Cipher.DECRYPT_MODE, key,
      new javax.crypto.spec.GCMParameterSpec(128, unb64(parts(0))))
    new String(c.doFinal(unb64(parts(1))), UTF_8)
  }
}

object Secrets {

  val Header = "PWENC:"

  /** Auth-section secret properties (JsonSecrets.cs:12). */
  val AuthProps: Seq[String] = Seq("Token", "Password", "ApiKey", "ClientSecret", "ClientId")

  /** MessageQueue-section secret properties (JsonSecrets.cs:14). */
  val MessageQueueProps: Seq[String] = Seq("Password", "ConnectionString", "SecretAccessKey", "AccessKeyId")

  def isEncrypted(value: String): Boolean = value.startsWith(Header)

  private val mapper = new ObjectMapper()

  /** JsonSecrets.MapProps: rewrite string properties of `obj` in place —
    * `names` = properties to visit (None = every string property); `f`
    * returns the replacement or None to leave the value alone. */
  def mapProps(obj: ObjectNode, names: Option[Seq[String]],
               f: (String, String) => Option[String]): Unit = {
    val keys = names.getOrElse(obj.properties().asScala.map(_.getKey).toSeq)
    keys.foreach { k =>
      val node = obj.get(k)
      if (node != null && node.isTextual)
        f(k, node.asText()).foreach(r => obj.set[ObjectNode](k, TextNode.valueOf(r)))
    }
  }

  private def encryptIfPlain(cipher: SecretCipher)(key: String, value: String): Option[String] =
    if (isEncrypted(value)) None else Some(Header + cipher.encrypt(value))

  private def decryptIfTagged(cipher: SecretCipher)(key: String, value: String): Option[String] =
    if (isEncrypted(value)) Some(cipher.decrypt(value.substring(Header.length))) else None

  /** The reference's section walk (EncryptionService.cs:279-351), shared by
    * encrypt and decrypt. Returns true when any secret-bearing section
    * exists (the reference's needsEncrypt — a file without one is left
    * untouched byte-for-byte). */
  private def walk(root: ObjectNode, f: (String, String) => Option[String]): Boolean = {
    var found = false
    root.get("ConnectionStrings") match {
      case cs: ObjectNode => found = true; mapProps(cs, None, f)
      case _ =>
    }
    root.get("ChangeTracking") match {
      case ct: ObjectNode =>
        ct.get("ApiAuth") match {
          case aa: ObjectNode => found = true; mapProps(aa, None, f)
          case _ =>
        }
        ct.get("ApiEndpoints") match {
          case eps: ArrayNode =>
            eps.elements().asScala.foreach {
              case ep: ObjectNode =>
                ep.get("Auth") match {
                  case auth: ObjectNode => found = true; mapProps(auth, Some(AuthProps), f)
                  case _ =>
                }
                ep.get("MessageQueue") match {
                  case mq: ObjectNode => found = true; mapProps(mq, Some(MessageQueueProps), f)
                  case _ =>
                }
              case _ =>
            }
          case _ =>
        }
      case _ =>
    }
    found
  }

  /** Encrypt every secret property not already tagged. Idempotent: a second
    * pass changes nothing, so the rewritten file is stable byte-for-byte.
    * Files with no secret-bearing section are returned unchanged. */
  def encryptConfig(json: String, cipher: SecretCipher): String = {
    val root = mapper.readTree(json)
    root match {
      case obj: ObjectNode if walk(obj, encryptIfPlain(cipher)) =>
        mapper.writerWithDefaultPrettyPrinter().writeValueAsString(obj)
      case _ => json
    }
  }

  /** EncryptConfigFiles (EncryptionService.cs:265-341): rewrite every
    * `*.json` in `dir` in place, tagging plain secrets. Returns the number
    * of files whose content changed. Idempotent — a second run rewrites
    * nothing. */
  def encryptDir(dir: String, cipher: SecretCipher): Int = {
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.isDirectory(p)) return 0
    val listing = java.nio.file.Files.list(p)
    val files =
      try listing.iterator().asScala.filter(_.toString.endsWith(".json")).toSeq
      finally listing.close()
    files.count { f =>
      val before = java.nio.file.Files.readString(f)
      val after = encryptConfig(before, cipher)
      val changed = after != before
      if (changed) java.nio.file.Files.writeString(f, after)
      changed
    }
  }

  /** Decrypt every `PWENC:`-tagged property; plain values pass through. */
  def decryptConfig(json: String, cipher: SecretCipher): String = {
    val root = mapper.readTree(json)
    root match {
      case obj: ObjectNode if walk(obj, decryptIfTagged(cipher)) =>
        mapper.writerWithDefaultPrettyPrinter().writeValueAsString(obj)
      case _ => json
    }
  }
}
