package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64

import javax.crypto.Mac
import javax.crypto.SecretKeyFactory
import javax.crypto.spec.{PBEKeySpec, SecretKeySpec}

/** SCRAM-SHA-256 and SCRAM-SHA-512 (RFC 5802 / RFC 7677) from JDK
  * crypto alone — the common non-TLS-terminated Kafka auth configs,
  * where PLAIN would send the password en clair. Kafka serves them as
  * SASL mechanisms over the same SaslHandshake/SaslAuthenticate pair
  * as PLAIN; the password never crosses the socket — the client
  * proves knowledge via ClientProof = ClientKey XOR
  * HMAC(StoredKey, AuthMessage), and the server proves ITS knowledge
  * back via the server signature (mutual authentication, which PLAIN
  * cannot give). Every hash-touching step is parametric in the
  * [[Algo]]; the two served instances differ only in digest family
  * and key width.
  *
  * Message flow (client-first / server-first / client-final /
  * server-final):
  * {{{
  *   C: n,,n=<user>,r=<cnonce>
  *   S: r=<cnonce><snonce>,s=<b64 salt>,i=<iterations>
  *   C: c=biws,r=<cnonce><snonce>,p=<b64 ClientProof>
  *   S: v=<b64 ServerSignature>          (or e=<error>)
  * }}} */
object Scram {

  /** One SCRAM hash family: the SASL mechanism name, the JDK
    * algorithm ids, the derived-key width, and the RFC-recommended
    * minimum iteration count Kafka also uses as its default. */
  final case class Algo(mechanism: String, macAlg: String, digestAlg: String,
      pbkdf2Alg: String, keyBits: Int, iterations: Int)

  val Sha256: Algo = Algo("SCRAM-SHA-256", "HmacSHA256", "SHA-256",
    "PBKDF2WithHmacSHA256", 256, 4096)
  val Sha512: Algo = Algo("SCRAM-SHA-512", "HmacSHA512", "SHA-512",
    "PBKDF2WithHmacSHA512", 512, 4096)
  val Algos: Seq[Algo] = Seq(Sha256, Sha512)

  /** Kafka's ScramMechanism int8 codes (keys 50/51): 1 = SHA-256,
    * 2 = SHA-512. */
  def algoForCode(code: Int): Option[Algo] = code match {
    case 1 => Some(Sha256)
    case 2 => Some(Sha512)
    case _ => None
  }
  def codeForAlgo(a: Algo): Int = if (a == Sha512) 2 else 1

  val Mechanism = "SCRAM-SHA-256"
  val Iterations = 4096 // RFC 7677 minimum for SHA-256

  def hmac(key: Array[Byte], data: Array[Byte],
      algo: Algo = Sha256): Array[Byte] = {
    val mac = Mac.getInstance(algo.macAlg)
    mac.init(new SecretKeySpec(key, algo.macAlg))
    mac.doFinal(data)
  }

  def digest(data: Array[Byte], algo: Algo): Array[Byte] =
    MessageDigest.getInstance(algo.digestAlg).digest(data)

  def sha256(data: Array[Byte]): Array[Byte] = digest(data, Sha256)

  def saltedPassword(password: String, salt: Array[Byte],
      iterations: Int, algo: Algo = Sha256): Array[Byte] = {
    val spec =
      new PBEKeySpec(password.toCharArray, salt, iterations, algo.keyBits)
    SecretKeyFactory.getInstance(algo.pbkdf2Alg)
      .generateSecret(spec).getEncoded
  }

  def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    a.zip(b).map { case (x, y) => (x ^ y).toByte }

  /** What the server stores per user (Kafka keeps exactly this
    * quartet in its SCRAM credential records): never the password. */
  case class StoredCreds(salt: Array[Byte], iterations: Int,
      storedKey: Array[Byte], serverKey: Array[Byte])

  def store(password: String, salt: Array[Byte],
      iterations: Int = Iterations, algo: Algo = Sha256): StoredCreds =
    storeFromSaltedPassword(
      saltedPassword(password, salt, iterations, algo), salt, iterations, algo)

  /** Derive the stored quartet from an already-salted password — what
    * AlterUserScramCredentials upsertions carry on the wire (the
    * client salts; the server never sees the password itself). */
  def storeFromSaltedPassword(sp: Array[Byte], salt: Array[Byte],
      iterations: Int, algo: Algo): StoredCreds = {
    val clientKey = hmac(sp, "Client Key".getBytes(UTF_8), algo)
    StoredCreds(salt, iterations, digest(clientKey, algo),
      hmac(sp, "Server Key".getBytes(UTF_8), algo))
  }

  // --- client-side derivations (the test client IS the client) ---

  def clientProof(password: String, salt: Array[Byte], iterations: Int,
      authMessage: String, algo: Algo = Sha256): Array[Byte] = {
    val sp = saltedPassword(password, salt, iterations, algo)
    val clientKey = hmac(sp, "Client Key".getBytes(UTF_8), algo)
    val storedKey = digest(clientKey, algo)
    xor(clientKey, hmac(storedKey, authMessage.getBytes(UTF_8), algo))
  }

  def serverSignature(password: String, salt: Array[Byte], iterations: Int,
      authMessage: String, algo: Algo = Sha256): Array[Byte] = {
    val sp = saltedPassword(password, salt, iterations, algo)
    hmac(hmac(sp, "Server Key".getBytes(UTF_8), algo),
      authMessage.getBytes(UTF_8), algo)
  }

  private[streaming] def b64(b: Array[Byte]): String =
    Base64.getEncoder.encodeToString(b)
  private[streaming] def unb64(s: String): Array[Byte] =
    Base64.getDecoder.decode(s)

  /** Parse `k1=v1,k2=v2,...` attribute lists (values may contain '='
    * — base64 padding — so split only on the FIRST '='). */
  private def attrs(msg: String): Map[String, String] =
    msg.split(',').toSeq.flatMap { part =>
      val i = part.indexOf('=')
      if (i <= 0) None else Some(part.substring(0, i) -> part.substring(i + 1))
    }.toMap

  sealed trait StepResult
  /** Send `reply` to the client and await its next token. */
  case class Continue(reply: Array[Byte]) extends StepResult
  /** Authentication succeeded: send `reply` (the server-final). */
  case class Success(reply: Array[Byte], user: String) extends StepResult
  /** Authentication failed: `reply` carries the RFC e= server-final. */
  case class Fail(reply: Array[Byte], message: String) extends StepResult

  /** One connection's server-side SCRAM exchange. `lookup` maps a
    * username to its stored credentials (None = unknown user — the
    * exchange still runs to the proof step and fails there, so user
    * enumeration costs an attacker the same as a wrong password). */
  final class ServerSession(lookup: String => Option[StoredCreds],
      algo: Algo = Sha256,
      nonceSource: () => String = () =>
        java.util.UUID.randomUUID().toString.replace("-", "")) {
    private var state = 0 // 0 = expect client-first, 1 = expect client-final
    private var user: String = null
    private var clientFirstBare: String = null
    private var serverFirst: String = null
    private var creds: Option[StoredCreds] = None

    def step(token: Array[Byte]): StepResult = {
      val msg = new String(token, UTF_8)
      state match {
        case 0 =>
          // gs2 header: only "n,," (no channel binding, no authzid)
          if (!msg.startsWith("n,,"))
            return fail("channel binding not supported")
          clientFirstBare = msg.substring(3)
          val a = attrs(clientFirstBare)
          (a.get("n"), a.get("r")) match {
            case (Some(u), Some(cnonce)) if cnonce.nonEmpty =>
              user = u
              creds = lookup(u)
              // unknown users get a deterministic fake salt so the
              // first leg is indistinguishable from a real user's
              val c = creds.getOrElse(
                store("-", digest(u.getBytes(UTF_8), algo).take(16),
                  algo.iterations, algo))
              serverFirst =
                s"r=$cnonce${nonceSource()},s=${b64(c.salt)},i=${c.iterations}"
              state = 1
              Continue(serverFirst.getBytes(UTF_8))
            case _ => fail("malformed client-first message")
          }
        case 1 =>
          state = 2
          val a = attrs(msg)
          (a.get("c"), a.get("r"), a.get("p")) match {
            case (Some(cb), Some(nonce), Some(proofB64)) =>
              val expectedNonce = attrs(serverFirst)("r")
              if (cb != b64("n,,".getBytes(UTF_8)))
                fail("invalid channel binding")
              else if (nonce != expectedNonce) fail("nonce mismatch")
              else creds match {
                case None => fail("authentication failed")
                case Some(c) =>
                  val withoutProof =
                    msg.substring(0, msg.lastIndexOf(",p="))
                  val authMessage =
                    s"$clientFirstBare,$serverFirst,$withoutProof"
                  val proof =
                    try unb64(proofB64)
                    catch { case _: IllegalArgumentException =>
                      return fail("malformed proof") }
                  val sig =
                    hmac(c.storedKey, authMessage.getBytes(UTF_8), algo)
                  val clientKey = xor(proof, sig)
                  if (MessageDigest.isEqual(digest(clientKey, algo),
                      c.storedKey)) {
                    val v = b64(
                      hmac(c.serverKey, authMessage.getBytes(UTF_8), algo))
                    Success(s"v=$v".getBytes(UTF_8), user)
                  } else fail("authentication failed")
              }
            case _ => fail("malformed client-final message")
          }
        case _ => fail("SCRAM exchange already complete")
      }
    }

    private def fail(why: String): Fail = {
      state = 2
      Fail(s"e=other-error".getBytes(UTF_8), why)
    }
  }
}
