package graft.streaming

import java.net.Socket
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The real authorizer behind keys 29/30/31 (the kafka-acls.sh
  * surface) and its broker-wide enforcement: standard AclAuthorizer
  * semantics (DENY precedence, literal/wildcard/prefixed patterns,
  * DESCRIBE implication, super.users), durable `_acls` CAS snapshots,
  * full v0–v3 codecs (flexible v2+, hand-laid golden frame), and the
  * in-band per-resource authorization errors on the data path —
  * produce 29, fetch 29, group path 30, admin 31 — driven over real
  * sockets through a SASL listener that binds each connection's
  * authenticated principal. */
class AclSpec extends AnyFunSuite {
  import KafkaWire._
  import Acls._
  lazy val spark = TestSpark.spark

  private def exchange(sock: Socket, request: Array[Byte]): Array[Byte] =
    WireTestClient.exchange(sock, request)

  private val NUL = Array[Byte](0)
  private def plainToken(user: String, pass: String): Array[Byte] =
    NUL ++ user.getBytes("UTF-8") ++ NUL ++ pass.getBytes("UTF-8")

  /** Open a socket to `server` and authenticate as `user` (PLAIN,
    * handshake v1 + authenticate v1). */
  private def login(server: WireServer, user: String, pass: String): Socket = {
    val sock = new Socket("127.0.0.1", server.boundPort)
    val (_, herr, _) = decodeSaslHandshakeResponse(
      exchange(sock, encodeSaslHandshakeRequest(1, 1, "cli", "PLAIN")))
    assert(herr === 0)
    val (_, aerr, _, _) = decodeSaslAuthenticateResponse(1, exchange(sock,
      encodeSaslAuthenticateRequest(1, 2, "cli", plainToken(user, pass))))
    assert(aerr === 0)
    sock
  }

  private def allow(res: Int, name: String, principal: String, op: Int,
      pat: Int = PatLiteral) =
    AclBinding(res, name, pat, principal, "*", op, PermAllow)
  private def deny(res: Int, name: String, principal: String, op: Int) =
    AclBinding(res, name, PatLiteral, principal, "*", op, PermDeny)

  test("authorizer semantics: patterns, deny precedence, implication, superuser") {
    val dir = Files.createTempDirectory("graft-acl-sem")
    val auth = new Authorizer(dir, superUsers = Set("User:root"))
    auth.add(Seq(
      allow(ResTopic, "orders", "User:alice", OpRead),
      allow(ResTopic, "logs-", "User:alice", OpWrite, PatPrefixed),
      allow(ResTopic, "*", "User:bob", OpRead),
      allow(ResGroup, "g1", WildcardPrincipal, OpRead),
      deny(ResTopic, "orders", "User:mallory", OpAll),
      allow(ResTopic, "orders", "User:mallory", OpRead)))
    def ok(p: String, op: Int, res: Int, name: String) =
      auth.authorize(p, "10.0.0.1", op, res, name)
    // literal allow
    assert(ok("User:alice", OpRead, ResTopic, "orders"))
    assert(!ok("User:alice", OpWrite, ResTopic, "orders"))
    assert(!ok("User:alice", OpRead, ResTopic, "other"))
    // READ implies DESCRIBE; never the reverse
    assert(ok("User:alice", OpDescribe, ResTopic, "orders"))
    assert(!ok("User:alice", OpRead, ResTopic, "logs-app")) // write-only prefix
    // prefixed pattern
    assert(ok("User:alice", OpWrite, ResTopic, "logs-app"))
    assert(ok("User:alice", OpWrite, ResTopic, "logs-"))
    assert(!ok("User:alice", OpWrite, ResTopic, "log"))
    // wildcard resource name
    assert(ok("User:bob", OpRead, ResTopic, "anything"))
    assert(!ok("User:bob", OpWrite, ResTopic, "anything"))
    // wildcard principal
    assert(ok("User:carol", OpRead, ResGroup, "g1"))
    // DENY overrides ALLOW, including via OpAll
    assert(!ok("User:mallory", OpRead, ResTopic, "orders"))
    // superuser bypasses everything
    assert(ok("User:root", OpAlter, ResCluster, ClusterResourceName))
    // host-scoped ACL matches only its host
    auth.add(Seq(AclBinding(ResTopic, "hostbound", PatLiteral,
      "User:dave", "10.1.1.1", OpRead, PermAllow)))
    assert(auth.authorize("User:dave", "10.1.1.1", OpRead, ResTopic, "hostbound"))
    assert(!auth.authorize("User:dave", "10.2.2.2", OpRead, ResTopic, "hostbound"))
  }

  test("ACL store: add/delete persist through CAS snapshots and reload") {
    val dir = Files.createTempDirectory("graft-acl-store")
    val a1 = new Authorizer(dir, Set.empty)
    val b1 = allow(ResTopic, "t\"quoted", "User:a l i c e", OpRead)
    val b2 = allow(ResGroup, "g", "User:bob", OpRead)
    a1.add(Seq(b1, b2))
    a1.add(Seq(b1)) // idempotent re-add writes nothing new
    assert(a1.current.toSet === Set(b1, b2))
    // a fresh authorizer over the same dir sees the committed state
    val a2 = new Authorizer(dir, Set.empty)
    assert(a2.current.toSet === Set(b1, b2))
    assert(a2.authorize("User:a l i c e", "h", OpRead, ResTopic, "t\"quoted"))
    // delete by filter, persisted too
    val removed = a2.delete(Seq(AclFilter(ResTopic, null, PatAny, null, null,
      OpAny, PermAny)))
    assert(removed === Seq(Seq(b1)))
    val a3 = new Authorizer(dir, Set.empty)
    assert(a3.current === Seq(b2))
    // snapshots prune behind the newest (bounded disk)
    val files = TopicLog.listDir(dir).map(_.getFileName.toString)
      .filter(_.endsWith(".json"))
    assert(files.size <= 2)
  }

  test("filter matching: ANY, MATCH, literal wildcard") {
    val lit = allow(ResTopic, "orders", "User:a", OpRead)
    val star = allow(ResTopic, "*", "User:a", OpRead)
    val pre = allow(ResTopic, "ord", "User:a", OpRead, PatPrefixed)
    // ANY pattern + null name matches everything
    val anyF = AclFilter(ResAny, null, PatAny, null, null, OpAny, PermAny)
    assert(Seq(lit, star, pre).forall(b => Acls.filterMatches(anyF, b)))
    // MATCH with a concrete name selects every pattern COVERING it
    val matchF = AclFilter(ResTopic, "orders", PatMatch, null, null, OpAny,
      PermAny)
    assert(Acls.filterMatches(matchF, lit))
    assert(Acls.filterMatches(matchF, star))
    assert(Acls.filterMatches(matchF, pre))
    assert(!Acls.filterMatches(matchF,
      allow(ResTopic, "payments", "User:a", OpRead)))
    // ANY pattern + concrete name needs the exact name
    val anyPatF = AclFilter(ResTopic, "orders", PatAny, null, null, OpAny,
      PermAny)
    assert(Acls.filterMatches(anyPatF, lit))
    assert(!Acls.filterMatches(anyPatF, star))
    // LITERAL pattern filter excludes prefixed bindings
    val litF = AclFilter(ResTopic, null, PatLiteral, null, null, OpAny, PermAny)
    assert(Acls.filterMatches(litF, lit) && Acls.filterMatches(litF, star))
    assert(!Acls.filterMatches(litF, pre))
  }

  test("codec round-trips at every version; CreateAcls v2 golden frame") {
    val b = AclBinding(ResTopic, "t", PatPrefixed, "User:alice", "*",
      OpWrite, PermAllow)
    val f = AclFilter(ResTopic, "t", PatMatch, "User:alice", null, OpAny,
      PermDeny)
    (0 to 3).foreach { v =>
      val (dv, corr, df) = decodeDescribeAclsRequest(
        encodeDescribeAclsRequest(v, 7, "cli", f))
      assert(dv === v && corr === 7)
      if (v >= 1) assert(df === f)
      else assert(df === f.copy(patternType = PatLiteral)) // v0 mapping
      val (_, err, msg, acls) = decodeDescribeAclsResponse(
        encodeDescribeAclsResponse(v, 8, 0, null,
          Seq(b, b.copy(operation = OpRead),
            b.copy(patternType = PatLiteral))), v)
      assert(err === 0 && msg === null)
      if (v >= 1) assert(acls.toSet ===
        Set(b, b.copy(operation = OpRead), b.copy(patternType = PatLiteral)))
      else // v0 withholds prefixed bindings (KIP-290 downgrade)
        assert(acls === Seq(b.copy(patternType = PatLiteral)))
      val (_, ccorr, creations) = decodeCreateAclsRequest(
        encodeCreateAclsRequest(v, 9, "cli", Seq(b)))
      assert(ccorr === 9)
      if (v >= 1) assert(creations === Seq(b))
      val (_, made) = decodeCreateAclsResponse(
        encodeCreateAclsResponse(v, 10, Seq((0, null), (42, "bad"))), v)
      assert(made === Seq((0, null), (42, "bad")))
      val (_, dcorr, filters) = decodeDeleteAclsRequest(
        encodeDeleteAclsRequest(v, 11, "cli", Seq(f)))
      assert(dcorr === 11)
      if (v >= 1) assert(filters === Seq(f))
      val (_, deleted) = decodeDeleteAclsResponse(
        encodeDeleteAclsResponse(v, 12, Seq((0, null, Seq(b)))), v)
      if (v >= 1) assert(deleted === Seq((0, null, Seq(b))))
      else assert(deleted ===
        Seq((0, null, Seq(b.copy(patternType = PatLiteral)))))
    }
    // CreateAcls v2 (flexible) request, one creation: READ ALLOW on
    // literal topic "t" for User:a from any host — every byte hand-laid
    val golden = Array[Int](
      0x00, 0x00, 0x00, 0x1e, // frame size 30
      0x00, 0x1e, // api_key 30
      0x00, 0x02, // version 2
      0x00, 0x00, 0x00, 0x05, // correlation id 5
      0x00, 0x01, 0x63, // client id "c" (legacy string in header v2)
      0x00, // header tags
      0x02, // creations: compact array, 1 entry
      0x02, // resource_type TOPIC
      0x02, 0x74, // resource_name "t" (compact)
      0x03, // pattern_type LITERAL
      0x07, 0x55, 0x73, 0x65, 0x72, 0x3a, 0x61, // principal "User:a"
      0x02, 0x2a, // host "*"
      0x03, // operation READ
      0x03, // permission ALLOW
      0x00, // creation tags
      0x00  // body tags
    ).map(_.toByte)
    assert(encodeCreateAclsRequest(2, 5, "c",
      Seq(AclBinding(ResTopic, "t", PatLiteral, "User:a", "*", OpRead,
        PermAllow))) === golden)
  }

  test("creation validation: Kafka's INVALID_REQUEST rules") {
    assert(creationError(allow(ResTopic, "t", "User:a", OpRead)) === null)
    assert(creationError(allow(ResAny, "t", "User:a", OpRead)) != null)
    assert(creationError(AclBinding(ResTopic, "t", PatAny, "User:a", "*",
      OpRead, PermAllow)) != null) // filter-only pattern
    assert(creationError(allow(ResTopic, "", "User:a", OpRead)) != null)
    assert(creationError(allow(ResCluster, "not-kafka-cluster", "User:a",
      OpAlter)) != null)
    assert(creationError(allow(ResCluster, ClusterResourceName, "User:a",
      OpAlter)) === null)
    assert(creationError(allow(ResTopic, "t", "nocolon", OpRead)) != null)
    assert(creationError(allow(ResTopic, "t", "User:a", OpAny)) != null)
    assert(creationError(AclBinding(ResTopic, "t", PatLiteral, "User:a", "*",
      OpRead, PermAny)) != null)
    assert(creationError(AclBinding(ResTopic, "t", PatLiteral, "User:a", "",
      OpRead, PermAllow)) != null)
  }

  test("wire lifecycle: admin creates ACLs, enforcement flips the data path") {
    val root = Files.createTempDirectory("graft-acl-wire").toString
    val broker = new Broker(spark, root)
    broker.createTopic("orders", 1)
    broker.createTopic("secrets", 1)
    broker.enableAuthorizer(superUsers = Set("User:admin"))
    val server = new WireServer(broker,
      credentials = Map("admin" -> "pw", "alice" -> "pw")).start()
    val admin = login(server, "admin", "pw")
    val alice = login(server, "alice", "pw")
    try {
      val rec = WireRecordV2(1700000000000L, "k".getBytes, "v".getBytes)

      // 1. alice can do nothing yet: produce 29, fetch 29, heartbeat 30
      val (_, p1) = decodeProduceResponse(3, exchange(alice,
        encodeProduceRequest(3, 10, "cli", null, 1, 30000,
          Seq(("orders", Seq((0, Seq(rec))))))))
      assert(p1 === Seq(("orders", Seq((0, 29, -1L)))))
      val (_, f1) = decodeFetchResponse(4, exchange(alice,
        encodeFetchRequest(4, 11, "cli", 0, 1, 1 << 20,
          Seq(("orders", Seq((0, 0L, 1 << 20)))))))
      assert(f1.head._2.head._2 === 29)
      val (_, hb1) = decodeHeartbeatResponse(0, exchange(alice,
        encodeHeartbeatRequest(0, 12, "cli", "g-acl", 1, "m1")))
      assert(hb1 === 30)
      // metadata listing hides everything; naming answers 29
      val md1 = decodeMetadataResponse(4, exchange(alice,
        encodeMetadataRequest(4, 13, "cli", None)))
      assert(md1.topics.isEmpty)
      val md2 = decodeMetadataResponse(4, exchange(alice,
        encodeMetadataRequest(4, 14, "cli", Some(Seq("orders")))))
      assert(md2.topics.map(t => (t.errorCode, t.name)) === Seq((29, "orders")))

      // 2. alice cannot administer ACLs (31); the superuser can
      val creation = allow(ResTopic, "orders", "User:alice", OpWrite)
      val (_, denied) = decodeCreateAclsResponse(exchange(alice,
        encodeCreateAclsRequest(2, 15, "cli", Seq(creation))), 2)
      assert(denied.map(_._1) === Seq(31))
      val (_, made) = decodeCreateAclsResponse(exchange(admin,
        encodeCreateAclsRequest(2, 16, "cli", Seq(
          creation,
          allow(ResTopic, "orders", "User:alice", OpRead),
          allow(ResGroup, "g-acl", "User:alice", OpRead),
          // an invalid creation fails alone, in-band
          allow(ResTopic, "", "User:alice", OpRead)))), 2)
      assert(made.map(_._1) === Seq(0, 0, 0, 42))

      // 3. the grants flip the answers — same connection, same user
      val (_, p2) = decodeProduceResponse(3, exchange(alice,
        encodeProduceRequest(3, 17, "cli", null, 1, 30000,
          Seq(("orders", Seq((0, Seq(rec))))))))
      assert(p2 === Seq(("orders", Seq((0, 0, 0L)))))
      val (_, f2) = decodeFetchResponse(4, exchange(alice,
        encodeFetchRequest(4, 18, "cli", 0, 1, 1 << 20,
          Seq(("orders", Seq((0, 0L, 1 << 20)))))))
      assert(f2.head._2.head._2 === 0)
      assert(f2.head._2.head._4.map(_._2.value.toSeq) === Seq("v".getBytes.toSeq))
      val (_, hb2) = decodeHeartbeatResponse(0, exchange(alice,
        encodeHeartbeatRequest(0, 19, "cli", "g-acl", 1, "m1")))
      assert(hb2 === 25) // past authorization, into the group machine
      // metadata now lists exactly the READable topic
      val md3 = decodeMetadataResponse(4, exchange(alice,
        encodeMetadataRequest(4, 20, "cli", None)))
      assert(md3.topics.map(_.name) === Seq("orders"))
      // secrets stays invisible (29 when named)
      val md4 = decodeMetadataResponse(4, exchange(alice,
        encodeMetadataRequest(4, 21, "cli", Some(Seq("secrets")))))
      assert(md4.topics.map(t => (t.errorCode, t.name)) === Seq((29, "secrets")))

      // 4. describe shows the stored bindings; a MATCH filter finds them
      val (_, derr, _, stored) = decodeDescribeAclsResponse(exchange(admin,
        encodeDescribeAclsRequest(2, 22, "cli",
          AclFilter(ResTopic, "orders", PatMatch, null, null, OpAny,
            PermAny))), 2)
      assert(derr === 0)
      assert(stored.toSet === Set(creation,
        allow(ResTopic, "orders", "User:alice", OpRead)))

      // 5. DENY overrides: the superuser denies alice writes
      val denyW = deny(ResTopic, "orders", "User:alice", OpWrite)
      val (_, made2) = decodeCreateAclsResponse(exchange(admin,
        encodeCreateAclsRequest(2, 23, "cli", Seq(denyW))), 2)
      assert(made2.map(_._1) === Seq(0))
      val (_, p3) = decodeProduceResponse(3, exchange(alice,
        encodeProduceRequest(3, 24, "cli", null, 1, 30000,
          Seq(("orders", Seq((0, Seq(rec))))))))
      assert(p3 === Seq(("orders", Seq((0, 29, -1L)))))

      // 6. delete the deny by filter; writes come back
      val (_, deleted) = decodeDeleteAclsResponse(exchange(admin,
        encodeDeleteAclsRequest(2, 25, "cli", Seq(
          AclFilter(ResAny, null, PatAny, null, null, OpAny, PermDeny)))), 2)
      assert(deleted.map(_._3) === Seq(Seq(denyW)))
      val (_, p4) = decodeProduceResponse(3, exchange(alice,
        encodeProduceRequest(3, 26, "cli", null, 1, 30000,
          Seq(("orders", Seq((0, Seq(rec))))))))
      assert(p4.head._2.head._2 === 0)
    } finally { admin.close(); alice.close(); server.close() }

    // 7. the ACL set survives a broker restart (durable _acls)
    val broker2 = new Broker(spark, root)
    broker2.enableAuthorizer(superUsers = Set("User:admin"))
    val server2 = new WireServer(broker2,
      credentials = Map("alice" -> "pw")).start()
    val alice2 = login(server2, "alice", "pw")
    try {
      val rec = WireRecordV2(1700000000001L, "k2".getBytes, "v2".getBytes)
      val (_, p5) = decodeProduceResponse(3, exchange(alice2,
        encodeProduceRequest(3, 30, "cli", null, 1, 30000,
          Seq(("orders", Seq((0, Seq(rec))))))))
      assert(p5.head._2.head._2 === 0) // WRITE grant reloaded from disk
      val (_, p6) = decodeProduceResponse(3, exchange(alice2,
        encodeProduceRequest(3, 31, "cli", null, 1, 30000,
          Seq(("secrets", Seq((0, Seq(rec))))))))
      assert(p6.head._2.head._2 === 29) // still no grant there
    } finally { alice2.close(); server2.close() }
  }
}
