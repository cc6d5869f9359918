package graft.streaming

import java.io.DataInputStream
import java.net.Socket

/** Shared raw-socket RPC helper for the wire specs: write one framed
  * request, read back one framed response — re-framed with its size
  * prefix so the `KafkaWire.decode*` helpers can unframe it. Every
  * wire spec used to carry its own copy of this 13-line loop; a
  * framing change now lands in exactly one place. */
object WireTestClient {
  def readFrame(sock: Socket): Array[Byte] = {
    val in = new DataInputStream(sock.getInputStream)
    val size = in.readInt()
    val payload = new Array[Byte](size)
    in.readFully(payload)
    val framed = new Array[Byte](size + 4)
    framed(0) = (size >>> 24).toByte; framed(1) = (size >>> 16).toByte
    framed(2) = (size >>> 8).toByte; framed(3) = size.toByte
    System.arraycopy(payload, 0, framed, 4, size)
    framed
  }

  def exchange(sock: Socket, request: Array[Byte]): Array[Byte] = {
    sock.getOutputStream.write(request)
    sock.getOutputStream.flush()
    readFrame(sock)
  }

  def attrs(msg: String): Map[String, String] =
    msg.split(',').toSeq.flatMap { p =>
      val i = p.indexOf('=')
      if (i <= 0) None else Some(p.substring(0, i) -> p.substring(i + 1))
    }.toMap

  /** Full client side of a SCRAM exchange over SaslAuthenticate v2
    * framing (the SaslScramSpec machinery, shared so the TLS spec
    * can run the identical login through an encrypted channel);
    * returns (final error code, server-signature-verified). */
  def scramLogin(sock: Socket, user: String, password: String,
      algo: Scram.Algo = Scram.Sha256): (Int, Boolean) = {
    import java.nio.charset.StandardCharsets.UTF_8
    import KafkaWire._
    val cnonce = "clientnonce123"
    val clientFirstBare = s"n=$user,r=$cnonce"
    val (_, e1, _, serverFirstTok) = decodeSaslAuthenticateResponse(2,
      exchange(sock, encodeSaslAuthenticateRequest(2, 10, "cli",
        s"n,,$clientFirstBare".getBytes(UTF_8))))
    assert(e1 == 0, s"server-first errored: $e1")
    val serverFirst = new String(serverFirstTok, UTF_8)
    val a = attrs(serverFirst)
    assert(a("r").startsWith(cnonce), "server nonce extends the client's")
    val salt = Scram.unb64(a("s"))
    val iters = a("i").toInt
    val withoutProof = s"c=biws,r=${a("r")}"
    val authMessage = s"$clientFirstBare,$serverFirst,$withoutProof"
    val proof = Scram.b64(
      Scram.clientProof(password, salt, iters, authMessage, algo))
    val (_, e2, _, serverFinalTok) = decodeSaslAuthenticateResponse(2,
      exchange(sock, encodeSaslAuthenticateRequest(2, 11, "cli",
        s"$withoutProof,p=$proof".getBytes(UTF_8))))
    val verified = e2 == 0 && {
      val v = attrs(new String(serverFinalTok, UTF_8))("v")
      Scram.unb64(v).sameElements(
        Scram.serverSignature(password, salt, iters, authMessage, algo))
    }
    (e2, verified)
  }
}
