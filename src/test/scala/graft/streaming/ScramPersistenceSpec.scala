package graft.streaming

import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Administered SCRAM credentials survive a listener restart: the
  * key-51 write-through [[ScramStore]] snapshot reloads into a fresh
  * Broker + WireServer over the same log root (the TxnRecoverySpec
  * pattern applied to KIP-554 credential state). Covers: upserted
  * user persists with salt/iterations intact (the client's original
  * salted password still proves), a deletion persists for a user the
  * snapshot still names, a configured user absent from the snapshot
  * re-seeds (bootstrap semantics), and an unadministered listener
  * writes nothing. */
class ScramPersistenceSpec extends AnyFunSuite {
  import KafkaWire._
  lazy val spark = TestSpark.spark

  private def exchange(sock: Socket, request: Array[Byte]): Array[Byte] =
    WireTestClient.exchange(sock, request)

  private def attrs(msg: String): Map[String, String] =
    msg.split(',').toSeq.flatMap { p =>
      val i = p.indexOf('=')
      if (i <= 0) None else Some(p.substring(0, i) -> p.substring(i + 1))
    }.toMap

  /** Full client-side SCRAM exchange; (final error, mutual-auth ok). */
  private def scramLogin(sock: Socket, user: String, password: String,
      algo: Scram.Algo = Scram.Sha256): (Int, Boolean) = {
    val cnonce = "persistnonce"
    val clientFirstBare = s"n=$user,r=$cnonce"
    val (_, e1, _, serverFirstTok) = decodeSaslAuthenticateResponse(2,
      exchange(sock, encodeSaslAuthenticateRequest(2, 10, "cli",
        s"n,,$clientFirstBare".getBytes(UTF_8))))
    if (e1 != 0) return (e1, false)
    val serverFirst = new String(serverFirstTok, UTF_8)
    val a = attrs(serverFirst)
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

  private def login(port: Int, user: String, pass: String,
      mech: String = "SCRAM-SHA-256",
      algo: Scram.Algo = Scram.Sha256): (Int, Boolean) = {
    val s = new Socket("127.0.0.1", port)
    try {
      exchange(s, encodeSaslHandshakeRequest(1, 1, "cli", mech))
      scramLogin(s, user, pass, algo)
    } finally s.close()
  }

  test("administered credentials reload across Broker+WireServer restart") {
    val root = Files.createTempDirectory("graft-scram-persist").toString
    val salt = "persist-salt-16b".getBytes(UTF_8)
    val sp = Scram.saltedPassword("davepass", salt, 8192, Scram.Sha256)

    // epoch 1: administer, then tear the whole stack down
    locally {
      val server = new WireServer(new Broker(spark, root),
        credentials = Map("alice" -> "wonderland")).start()
      val admin = new Socket("127.0.0.1", server.boundPort)
      try {
        exchange(admin, encodeSaslHandshakeRequest(1, 1, "cli",
          "SCRAM-SHA-256"))
        assert(scramLogin(admin, "alice", "wonderland")._1 === 0)
        // upsert dave (SHA-256, 8192 iters) and DELETE alice's SHA-256
        val (_, r1) = decodeAlterUserScramCredentialsResponse(
          exchange(admin, encodeAlterUserScramCredentialsRequest(3, "adm",
            Seq.empty, Seq(("dave", 1, 8192, salt, sp)))))
        assert(r1 === Seq(("dave", 0, null)))
        val (_, r2) = decodeAlterUserScramCredentialsResponse(
          exchange(admin, encodeAlterUserScramCredentialsRequest(4, "adm",
            Seq(("alice", 1)), Seq.empty)))
        assert(r2 === Seq(("alice", 0, null)))
        assert(Files.exists(Paths.get(root, "_scram")), "snapshot written")
      } finally { admin.close(); server.close() }
    }

    // epoch 2: fresh Broker + WireServer over the same root; the
    // static config now also names bob, who is absent from the
    // snapshot and must re-seed
    val server2 = new WireServer(new Broker(spark, root),
      credentials = Map("alice" -> "wonderland", "bob" -> "builder")).start()
    try {
      val p = server2.boundPort
      // dave's administered credential survived — with its original
      // salt and iteration count, so the same salted password proves,
      // and mutual auth still verifies
      assert(login(p, "dave", "davepass") === ((0, true)))
      // alice's SHA-256 deletion survived (she is still named by the
      // snapshot via SHA-512, so the static config does NOT re-seed her)
      assert(login(p, "alice", "wonderland")._1 === 58)
      assert(login(p, "alice", "wonderland",
        "SCRAM-SHA-512", Scram.Sha512) === ((0, true)))
      // bob bootstrap-seeded from the static map
      assert(login(p, "bob", "builder") === ((0, true)))
      // describe confirms the persisted iteration count
      val admin2 = new Socket("127.0.0.1", p)
      try {
        exchange(admin2, encodeSaslHandshakeRequest(1, 1, "cli",
          "SCRAM-SHA-256"))
        assert(scramLogin(admin2, "alice", "wonderland",
          Scram.Sha512)._1 === 58) // wrong algo for the negotiated mech
      } finally admin2.close()
      val admin3 = new Socket("127.0.0.1", p)
      try {
        exchange(admin3, encodeSaslHandshakeRequest(1, 1, "cli",
          "SCRAM-SHA-512"))
        assert(scramLogin(admin3, "alice", "wonderland",
          Scram.Sha512)._1 === 0)
        val (_, _, _, dave) = decodeDescribeUserScramCredentialsResponse(
          exchange(admin3, encodeDescribeUserScramCredentialsRequest(5, "adm",
            Seq("dave"))))
        assert(dave === Seq(("dave", 0, null, Seq((1, 8192)))))
      } finally admin3.close()
    } finally server2.close()
  }

  test("a listener that never administers credentials writes no snapshot") {
    val root = Files.createTempDirectory("graft-scram-quiet").toString
    val server = new WireServer(new Broker(spark, root),
      credentials = Map("alice" -> "wonderland")).start()
    try {
      assert(login(server.boundPort, "alice", "wonderland") === ((0, true)))
      assert(!Files.exists(Paths.get(root, "_scram")))
    } finally server.close()
  }
}
