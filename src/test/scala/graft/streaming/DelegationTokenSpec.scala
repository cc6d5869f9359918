package graft.streaming

import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Delegation tokens (keys 38–41, KIP-48): the token lifecycle
  * (create bounded by max lifetime, renew by owner/renewer, expire −1
  * deletes), durable `_tokens` CAS snapshots, codec round-trips at
  * every version, and the SASL piggyback — a SCRAM login with
  * username = tokenId and password = base64(HMAC) authenticates AS
  * THE OWNER, token mutations are fenced on token-authenticated and
  * unauthenticated channels (64), and an expired token fails
  * authentication while still describing. */
class DelegationTokenSpec extends AnyFunSuite {
  import KafkaWire._
  lazy val spark = TestSpark.spark

  private def exchange(sock: Socket, request: Array[Byte]): Array[Byte] =
    WireTestClient.exchange(sock, request)

  private def attrs(msg: String): Map[String, String] =
    msg.split(',').toSeq.flatMap { p =>
      val i = p.indexOf('=')
      if (i <= 0) None else Some(p.substring(0, i) -> p.substring(i + 1))
    }.toMap

  /** Full SCRAM-SHA-256 client over SaslAuthenticate v2; returns the
    * final error code (0 = authenticated). */
  private def scramLogin(sock: Socket, user: String, password: String): Int = {
    val (_, herr, _) = decodeSaslHandshakeResponse(exchange(sock,
      encodeSaslHandshakeRequest(1, 1, "cli", "SCRAM-SHA-256")))
    assert(herr === 0)
    val cnonce = "tokennonce42"
    val clientFirstBare = s"n=$user,r=$cnonce"
    val (_, e1, _, serverFirstTok) = decodeSaslAuthenticateResponse(2,
      exchange(sock, encodeSaslAuthenticateRequest(2, 10, "cli",
        s"n,,$clientFirstBare".getBytes(UTF_8))))
    assert(e1 === 0)
    val serverFirst = new String(serverFirstTok, UTF_8)
    val a = attrs(serverFirst)
    val withoutProof = s"c=biws,r=${a("r")}"
    val authMessage = s"$clientFirstBare,$serverFirst,$withoutProof"
    val proof = Scram.b64(Scram.clientProof(password, Scram.unb64(a("s")),
      a("i").toInt, authMessage))
    val (_, e2, _, _) = decodeSaslAuthenticateResponse(2,
      exchange(sock, encodeSaslAuthenticateRequest(2, 11, "cli",
        s"$withoutProof,p=$proof".getBytes(UTF_8))))
    e2
  }

  private def plainLogin(sock: Socket, user: String, pass: String): Unit = {
    val (_, herr, _) = decodeSaslHandshakeResponse(exchange(sock,
      encodeSaslHandshakeRequest(1, 1, "cli", "PLAIN")))
    assert(herr === 0)
    val NUL = Array[Byte](0)
    val (_, aerr, _, _) = decodeSaslAuthenticateResponse(1, exchange(sock,
      encodeSaslAuthenticateRequest(1, 2, "cli",
        NUL ++ user.getBytes(UTF_8) ++ NUL ++ pass.getBytes(UTF_8))))
    assert(aerr === 0)
  }

  test("manager lifecycle: create caps, renew rules, expire -1 deletes") {
    val dir = Files.createTempDirectory("graft-token-mgr")
    val mgr = new DelegationTokens.Manager(dir)
    val now = 1700000000000L
    val t = mgr.create("User:alice", "User:alice", Seq("User:bob"),
      maxLifetimeMs = -1, nowMs = now).get
    assert(t.maxTs === now + DelegationTokens.MaxLifetimeMs)
    assert(t.expiryTs === now + DelegationTokens.DefaultRenewMs)
    assert(t.scram.keySet === Set(1, 2)) // both hash families
    // a requested lifetime below the cap is honored; expiry <= max
    val t2 = mgr.create("User:alice", "User:alice", Seq.empty,
      maxLifetimeMs = 60000, nowMs = now).get
    assert(t2.maxTs === now + 60000 && t2.expiryTs === now + 60000)
    // renew: owner ok, renewer ok, stranger 63; capped at maxTs
    assert(mgr.renew(t.hmac, "User:carol", 1000, now) === Left(63))
    assert(mgr.renew(t.hmac, "User:bob", 1000, now) === Right(now + 1000))
    assert(mgr.renew(t.hmac, "User:alice", Long.MaxValue / 2, now)
      === Right(t.maxTs))
    assert(mgr.renew("nope".getBytes, "User:alice", 1000, now) === Left(62))
    // an expired token renews 66, scramLookup stops serving it
    assert(mgr.renew(t2.hmac, "User:alice", 1000, now + 70000) === Left(66))
    assert(mgr.scramLookup(t2.tokenId, 1, now).isDefined)
    assert(mgr.scramLookup(t2.tokenId, 1, now + 70000).isEmpty)
    // ...but describe still lists it (pre-cleanup visibility)
    assert(mgr.describe(None, _ => true).map(_.tokenId).toSet
      === Set(t.tokenId, t2.tokenId))
    // expire -1 deletes outright — even an already-expired token
    assert(mgr.expire(t2.hmac, "User:alice", -1, now + 70000).isRight)
    assert(mgr.byId(t2.tokenId).isEmpty)
    // expire with a period moves the expiry
    assert(mgr.expire(t.hmac, "User:bob", 5000, now) === Right(now + 5000))
  }

  test("long-expired tokens sweep at create; the cap answers None") {
    val dir = Files.createTempDirectory("graft-token-sweep")
    val mgr = new DelegationTokens.Manager(dir)
    val now = 1700000000000L
    // a token expired > ExpiredRetentionMs ago vanishes on the next
    // create; a freshly-expired one survives (describe visibility)
    val old = mgr.create("User:a", "User:a", Seq.empty, 1000, now).get
    val fresh = mgr.create("User:a", "User:a", Seq.empty, 1000,
      now + DelegationTokens.ExpiredRetentionMs).get
    val later = now + DelegationTokens.ExpiredRetentionMs + 5000
    mgr.create("User:a", "User:a", Seq.empty, 1000, later).get
    assert(mgr.byId(old.tokenId).isEmpty, "long-expired token swept")
    assert(mgr.byId(fresh.tokenId).isDefined, "freshly-expired kept")
  }

  test("token store survives reload with exotic principals") {
    val dir = Files.createTempDirectory("graft-token-store")
    val m1 = new DelegationTokens.Manager(dir)
    val t = m1.create("User:a \"l\" ice", "User:re q",
      Seq("User:bob 1", "User:c,d"), 1000000, 1700000000000L).get
    val m2 = new DelegationTokens.Manager(dir)
    val r = m2.byId(t.tokenId).get
    assert(r.owner === "User:a \"l\" ice")
    assert(r.requester === "User:re q")
    assert(r.renewers === Seq("User:bob 1", "User:c,d"))
    assert(r.hmac.toSeq === t.hmac.toSeq)
    assert(r.issueTs === t.issueTs && r.expiryTs === t.expiryTs &&
      r.maxTs === t.maxTs)
    (1 to 2).foreach { m =>
      assert(r.scram(m).storedKey.toSeq === t.scram(m).storedKey.toSeq)
      assert(r.scram(m).salt.toSeq === t.scram(m).salt.toSeq)
    }
  }

  test("pre-NUL snapshots with space-joined renewers still parse every renewer") {
    import DelegationTokens._
    val dir = Files.createTempDirectory("graft-tok-mig")
    def b64s(s: String) =
      java.util.Base64.getEncoder.encodeToString(s.getBytes(UTF_8))
    def b64(b: Array[Byte]) = java.util.Base64.getEncoder.encodeToString(b)
    // a snapshot written by a build that joined renewers with " ":
    // the NUL split must fall back, or renew/expire authorization for
    // User:bob and User:carol silently breaks after upgrade
    val far = 4102444800000L // 2100-01-01, never expires in-test
    val row = s"""{"id":"${b64s("tok1")}","owner":"${b64s("User:alice")}",""" +
      s""""req":"${b64s("User:alice")}",""" +
      s""""renewers":"${b64s("User:bob User:carol")}",""" +
      s""""issue":1,"expiry":$far,"max":$far,""" +
      s""""hmac":"${b64(Array.fill[Byte](32)(7))}","creds":[]}"""
    Files.writeString(dir.resolve("v1.json"),
      s"""{"version":1,"tokens":[$row]}""")
    val mgr = new Manager(dir)
    val loaded = mgr.current
    assert(loaded.map(_.renewers) === Seq(Seq("User:bob", "User:carol")))
    // ... and renewal by the second renewer WORKS on the migrated
    // token (the user-visible behavior the migration protects)
    val renewed = mgr.renew(Array.fill[Byte](32)(7), "User:carol",
      3600000L, 1000L)
    assert(renewed.isRight, s"renewer from an old snapshot rejected: $renewed")
    // the new NUL-separated format round-trips multi-renewer sets
    val rt = TokenStore.parse(TokenStore.render(2, loaded))
    assert(rt.map(_.renewers) === Seq(Seq("User:bob", "User:carol")))
  }

  test("fmt-2 snapshot: single renewer WITH spaces is not mis-split") {
    // the round-10 advice's ambiguity: under content sniffing, a
    // new-format snapshot whose one renewer principal contains spaces
    // was split into bogus renewers; the declared fmt field now
    // disambiguates deterministically
    import DelegationTokens._
    val dir = Files.createTempDirectory("graft-tok-fmt2")
    val m1 = new Manager(dir)
    val t = m1.create("User:alice", "User:alice",
      Seq("User:svc my batch"), 1000000, 1700000000000L).get
    val m2 = new Manager(dir)
    assert(m2.byId(t.tokenId).get.renewers === Seq("User:svc my batch"))
    assert(m2.renew(t.hmac, "User:svc my batch", 3600000L,
      1700000000001L).isRight)
    assert(m2.renew(t.hmac, "User:svc", 3600000L, 1700000000001L) ===
      Left(63), "a bogus split fragment must NOT be authorized")
  }

  test("codec round-trips at every served version") {
    val hmac = (0 until 32).map(_.toByte).toArray
    (0 to 3).foreach { v =>
      val (dv, corr, owner, renewers, life) =
        decodeCreateDelegationTokenRequest(
          encodeCreateDelegationTokenRequest(v, 5, "cli",
            if (v >= 3) "User:other" else null,
            Seq("User:r1", "User:r2"), 604800000L))
      assert(dv === v && corr === 5 && life === 604800000L)
      assert(renewers === Seq("User:r1", "User:r2"))
      assert(owner === (if (v >= 3) "User:other" else null))
      val (_, cerr, cowner, issue, expiry, max, id, h) =
        decodeCreateDelegationTokenResponse(
          encodeCreateDelegationTokenResponse(v, 6, 0, "User:alice",
            "User:req", 10L, 20L, 30L, "tok-1", hmac), v)
      assert(cerr === 0 && cowner === "User:alice" && issue === 10L &&
        expiry === 20L && max === 30L && id === "tok-1" &&
        h.toSeq === hmac.toSeq)
      val (_, derr, toks) = decodeDescribeDelegationTokenResponse(
        encodeDescribeDelegationTokenResponse(v, 7, 0, Seq(
          DescribedToken("User:alice", "User:req", 1L, 2L, 3L, "tok-2",
            hmac, Seq("User:r1")))), v)
      assert(derr === 0)
      assert(toks.head.owner === "User:alice" && toks.head.tokenId === "tok-2")
      assert(toks.head.renewers === Seq("User:r1"))
      if (v >= 3) assert(toks.head.requester === "User:req")
      val (_, dcorr, owners) = decodeDescribeDelegationTokenRequest(
        encodeDescribeDelegationTokenRequest(v, 8, "cli",
          Some(Seq("User:alice"))))
      assert(dcorr === 8 && owners === Some(Seq("User:alice")))
      assert(decodeDescribeDelegationTokenRequest(
        encodeDescribeDelegationTokenRequest(v, 9, "cli", None))._3.isEmpty)
    }
    (0 to 2).foreach { v =>
      val (rv, rcorr, rh, rp) = decodeRenewDelegationTokenRequest(
        encodeRenewDelegationTokenRequest(v, 10, "cli", hmac, 1234L))
      assert(rv === v && rcorr === 10 && rh.toSeq === hmac.toSeq && rp === 1234L)
      val (_, eerr, exp) = decodeTokenExpiryResponse(
        encodeTokenExpiryResponse(v, 11, 0, 999L), v)
      assert(eerr === 0 && exp === 999L)
      val (xv, _, xh, xp) = decodeExpireDelegationTokenRequest(
        encodeExpireDelegationTokenRequest(v, 12, "cli", hmac, -1L))
      assert(xv === v && xh.toSeq === hmac.toSeq && xp === -1L)
    }
  }

  test("wire lifecycle: create, token login AS the owner, fences, restart") {
    val root = Files.createTempDirectory("graft-token-wire").toString
    val broker = new Broker(spark, root)
    broker.createTopic("tok", 1)
    val server = new WireServer(broker,
      credentials = Map("alice" -> "pw", "bob" -> "pw")).start()
    val alice = new Socket("127.0.0.1", server.boundPort)
    val bob = new Socket("127.0.0.1", server.boundPort)
    try {
      plainLogin(alice, "alice", "pw")
      plainLogin(bob, "bob", "pw")
      // 1. alice mints a token for herself, bob named as renewer
      val (_, cerr, owner, _, expiry0, _, tokenId, hmac) =
        decodeCreateDelegationTokenResponse(exchange(alice,
          encodeCreateDelegationTokenRequest(2, 3, "cli", null,
            Seq("User:bob"), -1L)), 2)
      assert(cerr === 0 && owner === "User:alice")
      assert(tokenId.nonEmpty && hmac.length === 32)
      // non-User renewers answer INVALID_PRINCIPAL_TYPE 67
      val (_, perr, _, _, _, _, _, _) =
        decodeCreateDelegationTokenResponse(exchange(alice,
          encodeCreateDelegationTokenRequest(2, 4, "cli", null,
            Seq("Group:g"), -1L)), 2)
      assert(perr === 67)

      // 2. a NEW connection authenticates via SCRAM with the token
      val tokSock = new Socket("127.0.0.1", server.boundPort)
      try {
        val password = java.util.Base64.getEncoder.encodeToString(hmac)
        assert(scramLogin(tokSock, tokenId, password) === 0)
        // the connection acts as the OWNER: produce works on the
        // open data path
        val rec = WireRecordV2(1700000000000L, null, "via-token".getBytes)
        val (_, p) = decodeProduceResponse(3, exchange(tokSock,
          encodeProduceRequest(3, 5, "cli", null, 1, 30000,
            Seq(("tok", Seq((0, Seq(rec))))))))
        assert(p.head._2.head._2 === 0)
        // ...but cannot mint or renew tokens (64)
        val (_, terr, _, _, _, _, _, _) =
          decodeCreateDelegationTokenResponse(exchange(tokSock,
            encodeCreateDelegationTokenRequest(2, 6, "cli", null,
              Seq.empty, -1L)), 2)
        assert(terr === 64)
        val (_, rerr64, _) = decodeTokenExpiryResponse(exchange(tokSock,
          encodeRenewDelegationTokenRequest(2, 7, "cli", hmac, 1000L)), 2)
        assert(rerr64 === 64)
        // describe IS allowed on a token-authenticated channel
        val (_, td, toks) = decodeDescribeDelegationTokenResponse(
          exchange(tokSock, encodeDescribeDelegationTokenRequest(2, 8,
            "cli", None)), 2)
        assert(td === 0 && toks.map(_.tokenId) === Seq(tokenId))
      } finally tokSock.close()

      // 3. renew: bob (a named renewer) may; the expiry moves
      val (_, rerr, newExpiry) = decodeTokenExpiryResponse(exchange(bob,
        encodeRenewDelegationTokenRequest(2, 9, "cli", hmac,
          2 * DelegationTokens.DefaultRenewMs)), 2)
      assert(rerr === 0 && newExpiry > expiry0)
      // describe by owner filter
      val (_, derr, owned) = decodeDescribeDelegationTokenResponse(
        exchange(bob, encodeDescribeDelegationTokenRequest(2, 10, "cli",
          Some(Seq("User:alice")))), 2)
      assert(derr === 0 && owned.map(_.tokenId) === Seq(tokenId))
      assert(owned.head.renewers === Seq("User:bob"))

      // 4. restart: the token store reloads; the token still logs in
      server.close()
      val broker2 = new Broker(spark, root)
      val server2 = new WireServer(broker2,
        credentials = Map("alice" -> "pw")).start()
      val tokSock2 = new Socket("127.0.0.1", server2.boundPort)
      val alice2 = new Socket("127.0.0.1", server2.boundPort)
      try {
        val password = java.util.Base64.getEncoder.encodeToString(hmac)
        assert(scramLogin(tokSock2, tokenId, password) === 0)
        // 5. expire -1 deletes; the next token login fails at the proof
        plainLogin(alice2, "alice", "pw")
        val (_, xerr, _) = decodeTokenExpiryResponse(exchange(alice2,
          encodeExpireDelegationTokenRequest(2, 11, "cli", hmac, -1L)), 2)
        assert(xerr === 0)
        val tokSock3 = new Socket("127.0.0.1", server2.boundPort)
        try assert(scramLogin(tokSock3, tokenId, password) === 58)
        finally tokSock3.close()
      } finally { tokSock2.close(); alice2.close(); server2.close() }
    } finally { alice.close(); bob.close() }
  }

  test("token ops are fenced on unauthenticated channels") {
    val root = Files.createTempDirectory("graft-token-open").toString
    val broker = new Broker(spark, root)
    val server = new WireServer(broker).start() // plaintext listener
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      val (_, cerr, _, _, _, _, _, _) =
        decodeCreateDelegationTokenResponse(exchange(sock,
          encodeCreateDelegationTokenRequest(0, 1, "cli", null,
            Seq.empty, -1L)), 0)
      assert(cerr === 64)
      val (_, derr, _) = decodeDescribeDelegationTokenResponse(
        exchange(sock, encodeDescribeDelegationTokenRequest(0, 2, "cli",
          None)), 0)
      assert(derr === 64)
    } finally { sock.close(); server.close() }
  }
}
