package graft.streaming

import java.net.Socket
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Share-group offset admin (KIP-932, keys 90/91/92) — the
  * `kafka-share-groups.sh --describe --offsets / --reset-offsets /
  * --delete-offsets` surface over the durable ShareGroup snapshots:
  * codec round-trips, a hand-laid golden frame, the full socket walk
  * (drain → describe SPSO → reset to earliest → drain REDELIVERS →
  * delete wipes the durable state), empty-group protection against
  * live members and open share sessions, and the ACL legs. */
class ShareAdminSpec extends AnyFunSuite {
  import KafkaWire._
  lazy val spark = TestSpark.spark

  private def exchange(sock: Socket, request: Array[Byte]): Array[Byte] =
    WireTestClient.exchange(sock, request)

  private val NUL = Array[Byte](0)
  private def plainToken(user: String, pass: String): Array[Byte] =
    NUL ++ user.getBytes("UTF-8") ++ NUL ++ pass.getBytes("UTF-8")

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

  private def mkBroker(n: Int): (Broker, String) = {
    val root = Files.createTempDirectory("graft-shareadmin").toString
    val broker = new Broker(spark, root)
    val log = broker.createTopic("q", 1)
    import spark.implicits._
    log.produce((0 until n).toDF("i").select(
      col("i"),
      concat(lit("k"), col("i").cast("string")).cast("binary").as("key"),
      concat(lit("v"), col("i").cast("string")).cast("binary").as("value")),
      Partitioners.byLongKey(1, lit(0L)))
    (broker, root)
  }

  test("DescribeShareGroupOffsets request matches the hand-laid golden frame") {
    // header v2: api_key 90, v0, corr 9, client "c", tags; body:
    // groups [group "g", topics null (= all)], tags
    val golden = Array[Int](
      0x00, 0x00, 0x00, 0x12, // frame size 18
      0x00, 0x5a, // api_key 90
      0x00, 0x00, // version 0
      0x00, 0x00, 0x00, 0x09, // correlation id 9
      0x00, 0x01, 0x63, // client id "c"
      0x00, // header tags
      0x02, // groups: compact array length 1
      0x02, 0x67, // group_id compact "g"
      0x00, // topics: null compact array (= every topic with state)
      0x00, // group tags
      0x00 // body tags
    ).map(_.toByte)
    assert(encodeDescribeShareGroupOffsetsRequest(9, "c",
      Seq(("g", None))) === golden)
  }

  test("codec round-trips: describe/alter/delete requests and responses") {
    // describe request: null topics, named topics with null and
    // explicit partition lists
    val dreq = Seq(
      ("g1", None),
      ("g2", Some(Seq(("ta", None), ("tb", Some(Seq(0, 2)))))))
    assert(decodeDescribeShareGroupOffsetsRequest(
      encodeDescribeShareGroupOffsetsRequest(7, "cli", dreq)) === ((7, dreq)))

    val drows = Seq(
      ("g1", 0, null: String, Seq(
        ("ta", Seq(ShareOffsetRow(0, 5L, 0, 0, null),
          ShareOffsetRow(1, -1L, -1, 3, "partition 1 not found"))))),
      ("g2", 69, "share group 'g2' not found",
        Seq.empty[(String, Seq[ShareOffsetRow])]))
    assert(decodeDescribeShareGroupOffsetsResponse(
      encodeDescribeShareGroupOffsetsResponse(7, drows)) === ((7, drows)))

    val areq = ("ga", Seq(("ta", Seq((0, 0L), (1, 42L)))))
    assert(decodeAlterShareGroupOffsetsRequest(
      encodeAlterShareGroupOffsetsRequest(8, "cli", areq._1, areq._2))
      === ((8, areq._1, areq._2)))
    val aresp = Seq(("ta", Seq((0, 0, null: String), (1, 42, "negative"))))
    assert(decodeAlterShareGroupOffsetsResponse(
      encodeAlterShareGroupOffsetsResponse(8, 0, null, aresp))
      === ((8, 0, null, aresp)))

    assert(decodeDeleteShareGroupOffsetsRequest(
      encodeDeleteShareGroupOffsetsRequest(9, "cli", "gd", Seq("ta", "tb")))
      === ((9, "gd", Seq("ta", "tb"))))
    val dresp = Seq(("ta", 0, null: String), ("tb", 3, "unknown topic 'tb'"))
    assert(decodeDeleteShareGroupOffsetsResponse(
      encodeDeleteShareGroupOffsetsResponse(9, 0, null, dresp))
      === ((9, 0, null, dresp)))
  }

  test("socket walk: drain, describe SPSO, reset, redeliver, delete") {
    val (broker, root) = mkBroker(10)
    val server = new WireServer(broker).start()
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      // ApiVersions advertises the admin keys
      val apis = decodeApiVersionsResponseV3(exchange(sock,
        encodeApiVersionsRequestV3(0, "cli", "graft-test", "0")))
      assert(apis.apiKeys.filter(k => k._1 >= 90).map(k => (k._1, k._3))
        === Seq((90, 0), (91, 0), (92, 0)))

      def fetch(epoch: Int, acks: Seq[ShareAckBatch] = Seq.empty, corr: Int = 1) =
        decodeShareFetchResponse(exchange(sock,
          encodeShareFetchRequest(corr, "cli", "sg", "m1", epoch,
            Seq("q" -> Seq(ShareFetchPartition(0, 1 << 20, acks))))),
          topicIdResolverFor(Seq("q")))
      def describe(corr: Int) =
        decodeDescribeShareGroupOffsetsResponse(exchange(sock,
          encodeDescribeShareGroupOffsetsRequest(corr, "cli",
            Seq(("sg", None)))))._2

      // drain: acquire all 10, accept them, close the session
      val r1 = fetch(0)
      assert(r1._4.head._2.head.records.map(_._1) === (0L until 10L))
      val closed = fetch(-1, Seq(ShareAckBatch(0L, 9L, Seq(1))), corr = 2)
      assert(closed._2 === 0 && closed._4.head._2.head.ackErrorCode === 0)

      // describe: SPSO advanced past everything
      val d1 = describe(3)
      assert(d1 === Seq(("sg", 0, null,
        Seq(("q", Seq(ShareOffsetRow(0, 10L, 0, 0, null)))))))

      // reset to earliest
      val (_, aerr, _, atop) = decodeAlterShareGroupOffsetsResponse(
        exchange(sock, encodeAlterShareGroupOffsetsRequest(4, "cli", "sg",
          Seq(("q", Seq((0, 0L)))))))
      assert(aerr === 0 && atop === Seq(("q", Seq((0, 0, null)))))
      assert(describe(5).head._4 ===
        Seq(("q", Seq(ShareOffsetRow(0, 0L, 0, 0, null)))))

      // a fresh session REDELIVERS from offset 0, delivery count 1
      // (the reset discarded the old delivery history)
      val r2 = fetch(0, corr = 6)
      val p2 = r2._4.head._2.head
      assert(p2.records.map(_._1) === (0L until 10L))
      assert(p2.acquired === Seq(ShareAcquired(0L, 9L, 1)))
      assert(fetch(-1, corr = 7)._2 === 0) // close without acking

      // delete: durable state gone, group forgotten
      val stateDir = Paths.get(root, "q", "_share")
      assert(Files.isDirectory(stateDir) && broker.listShareGroups()
        .contains(("sg", "q")))
      val (_, derr, _, dtop) = decodeDeleteShareGroupOffsetsResponse(
        exchange(sock, encodeDeleteShareGroupOffsetsRequest(8, "cli", "sg",
          Seq("q"))))
      assert(derr === 0 && dtop === Seq(("q", 0, null)))
      assert(!broker.listShareGroups().contains(("sg", "q")))
      val d2 = decodeDescribeShareGroupOffsetsResponse(exchange(sock,
        encodeDescribeShareGroupOffsetsRequest(9, "cli", Seq(("sg", None)))))._2
      assert(d2.head._2 === 69)
    } finally { sock.close(); server.close() }
  }

  test("timestamp reset (--to-datetime): for-times resolution, suffix redelivery, gates") {
    val root = Files.createTempDirectory("graft-shareadmin-ts").toString
    val broker = new Broker(spark, root)
    broker.createTopic("tt", 1)
    val server = new WireServer(broker).start()
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      // 10 records at known second-spaced timestamps
      val t0 = 1700000000000L
      val recs = (0 until 10).map(i => WireRecordV2(t0 + i * 1000L,
        s"k$i".getBytes, s"v$i".getBytes))
      decodeProduceResponse(9, exchange(sock,
        encodeProduceRequestBatches(9, 1, "cli", null, 1, 30000,
          Seq(("tt", Seq((0, ProducedBatch(-1L, -1, -1, recs))))))))
      // drain + accept everything: SPSO lands at 10
      val r1 = decodeShareFetchResponse(exchange(sock,
        encodeShareFetchRequest(2, "cli", "sg", "m1", 0,
          Seq("tt" -> Seq(ShareFetchPartition(0, 1 << 20, Seq.empty))))),
        topicIdResolverFor(Seq("tt")))
      assert(r1._4.head._2.head.records.map(_._1) === (0L until 10L))
      exchange(sock, encodeShareFetchRequest(3, "cli", "sg", "m1", -1,
        Seq("tt" -> Seq(ShareFetchPartition(0, 1 << 20,
          Seq(ShareAckBatch(0L, 9L, Seq(1))))))))
      // the tool's first half: ListOffsets for-times answers offset 5
      // for the mid timestamp — the same scan the broker flow reuses
      val lo = decodeListOffsetsResponse(8, exchange(sock,
        encodeListOffsetsRequest(8, 4, "cli",
          Seq(("tt", Seq((0, t0 + 5000L, 1)))))))
      assert(lo._2.head._2.head._4 === 5L)
      // the broker-side --to-datetime flow resolves identically and
      // resets through the same clamp/CAS path as the offset flow
      assert(broker.resetShareGroupOffsetsToTimestamp("sg", "tt",
        t0 + 5000L) === Seq((0, 0, 5L)))
      // a fresh session redelivers EXACTLY the suffix at count 1
      val r2 = decodeShareFetchResponse(exchange(sock,
        encodeShareFetchRequest(5, "cli", "sg", "m2", 0,
          Seq("tt" -> Seq(ShareFetchPartition(0, 1 << 20, Seq.empty))))),
        topicIdResolverFor(Seq("tt")))
      val p2 = r2._4.head._2.head
      assert(p2.records.map(_._1) === (5L until 10L))
      assert(p2.records.map(r => new String(r._2.value, "UTF-8"))
        === (5 until 10).map(i => s"v$i"))
      assert(p2.acquired === Seq(ShareAcquired(5L, 9L, 1)))
      exchange(sock, encodeShareFetchRequest(6, "cli", "sg", "m2", -1,
        Seq("tt" -> Seq(ShareFetchPartition(0, 1 << 20, Seq.empty)))))
      // past-the-end timestamp → log END: nothing left to redeliver
      assert(broker.resetShareGroupOffsetsToTimestamp("sg", "tt",
        t0 + 60000L) === Seq((0, 0, 10L)))
      // negative / overflow timestamps answer 42, nothing moves
      assert(broker.resetShareGroupOffsetsToTimestamp("sg", "tt", -5L)
        .head._2 === 42)
      // the EMPTY-group gate binds the timestamp flow too
      val r3 = decodeShareFetchResponse(exchange(sock,
        encodeShareFetchRequest(7, "cli", "sg", "m3", 0,
          Seq("tt" -> Seq(ShareFetchPartition(0, 1 << 20, Seq.empty))))),
        topicIdResolverFor(Seq("tt")))
      assert(r3._2 === 0)
      assert(broker.resetShareGroupOffsetsToTimestamp("sg", "tt", t0)
        .head._2 === 68)
    } finally { sock.close(); server.close() }
  }

  test("empty-group protection and validation errors") {
    val (broker, _) = mkBroker(5)
    val server = new WireServer(broker).start()
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      // an OPEN share session blocks alter and delete with 68
      val r1 = decodeShareFetchResponse(exchange(sock,
        encodeShareFetchRequest(1, "cli", "sg", "m1", 0,
          Seq("q" -> Seq(ShareFetchPartition(0, 1 << 20, Seq.empty))))),
        topicIdResolverFor(Seq("q")))
      assert(r1._2 === 0)
      val (_, a68, _, _) = decodeAlterShareGroupOffsetsResponse(exchange(sock,
        encodeAlterShareGroupOffsetsRequest(2, "cli", "sg",
          Seq(("q", Seq((0, 0L)))))))
      assert(a68 === 68)
      val (_, d68, _, _) = decodeDeleteShareGroupOffsetsResponse(exchange(sock,
        encodeDeleteShareGroupOffsetsRequest(3, "cli", "sg", Seq("q"))))
      assert(d68 === 68)
      // close the session → alter proceeds
      exchange(sock, encodeShareFetchRequest(4, "cli", "sg", "m1", -1,
        Seq("q" -> Seq(ShareFetchPartition(0, 1 << 20, Seq.empty)))))
      val (_, aok, _, _) = decodeAlterShareGroupOffsetsResponse(exchange(sock,
        encodeAlterShareGroupOffsetsRequest(5, "cli", "sg",
          Seq(("q", Seq((0, 0L)))))))
      assert(aok === 0)

      // a coordinator-LIVE member blocks alter the same way
      val (_, hbErr, _, mid, _, _, _) = decodeShareGroupHeartbeatResponse(
        exchange(sock, encodeShareGroupHeartbeatRequest(6, "cli", "sg-hb",
          "", 0, Seq("q"))), topicIdResolverFor(Seq("q")))
      assert(hbErr === 0)
      val (_, b68, _, _) = decodeAlterShareGroupOffsetsResponse(exchange(sock,
        encodeAlterShareGroupOffsetsRequest(7, "cli", "sg-hb",
          Seq(("q", Seq((0, 0L)))))))
      assert(b68 === 68)
      // the member leaves (epoch −1) → alter proceeds
      exchange(sock, encodeShareGroupHeartbeatRequest(8, "cli", "sg-hb",
        mid, -1))
      val (_, bok, _, _) = decodeAlterShareGroupOffsetsResponse(exchange(sock,
        encodeAlterShareGroupOffsetsRequest(9, "cli", "sg-hb",
          Seq(("q", Seq((0, 0L)))))))
      assert(bok === 0)

      // validation: negative offset 42, unknown topic 3, bad partition
      // 3, unknown group 69 (alter on a known group's bad pieces)
      val (_, _, _, vt) = decodeAlterShareGroupOffsetsResponse(exchange(sock,
        encodeAlterShareGroupOffsetsRequest(10, "cli", "sg", Seq(
          ("q", Seq((0, -5L), (9, 0L))), ("ghost", Seq((0, 0L)))))))
      assert(vt === Seq(
        ("q", Seq((0, 42, "start offset -5 is negative"),
          (9, 3, "partition 9 not found"))),
        ("ghost", Seq((0, 3, "unknown topic 'ghost'")))))
      val (_, u69, _, _) = decodeDeleteShareGroupOffsetsResponse(exchange(sock,
        encodeDeleteShareGroupOffsetsRequest(11, "cli", "never-seen",
          Seq("q"))))
      assert(u69 === 69)
      // clamp: resetting past the log end lands at the end
      exchange(sock, encodeAlterShareGroupOffsetsRequest(12, "cli", "sg",
        Seq(("q", Seq((0, 1000L))))))
      val d = decodeDescribeShareGroupOffsetsResponse(exchange(sock,
        encodeDescribeShareGroupOffsetsRequest(13, "cli",
          Seq(("sg", Some(Seq(("q", Some(Seq(0))))))))))._2
      assert(d.head._4.head._2.head.startOffset === 5L)
    } finally { sock.close(); server.close() }
  }

  test("ACL legs: describe DESCRIBE-gated, alter READ-gated, delete DELETE-gated") {
    import Acls._
    val (broker, _) = mkBroker(3)
    broker.enableAuthorizer(superUsers = Set("User:admin"))
    val server = new WireServer(broker,
      credentials = Map("admin" -> "pw", "alice" -> "pw")).start()
    val admin = login(server, "admin", "pw")
    val alice = login(server, "alice", "pw")
    try {
      // seed share state as the superuser
      exchange(admin, encodeShareFetchRequest(1, "cli", "sg", "m1", 0,
        Seq("q" -> Seq(ShareFetchPartition(0, 1 << 20, Seq.empty)))))
      exchange(admin, encodeShareFetchRequest(2, "cli", "sg", "m1", -1,
        Seq("q" -> Seq(ShareFetchPartition(0, 1 << 20,
          Seq(ShareAckBatch(0L, 2L, Seq(1))))))))

      // alice: group-level 30 on all three
      val d30 = decodeDescribeShareGroupOffsetsResponse(exchange(alice,
        encodeDescribeShareGroupOffsetsRequest(3, "cli", Seq(("sg", None)))))._2
      assert(d30.head._2 === 30)
      val (_, a30, _, _) = decodeAlterShareGroupOffsetsResponse(exchange(alice,
        encodeAlterShareGroupOffsetsRequest(4, "cli", "sg",
          Seq(("q", Seq((0, 0L)))))))
      assert(a30 === 30)
      val (_, x30, _, _) = decodeDeleteShareGroupOffsetsResponse(exchange(alice,
        encodeDeleteShareGroupOffsetsRequest(5, "cli", "sg", Seq("q"))))
      assert(x30 === 30)

      // grant DESCRIBE group only → describe answers, but the
      // all-topics listing HIDES the unauthorized topic
      broker.authorizerOpt.get.add(Seq(
        AclBinding(ResGroup, "sg", PatLiteral, "User:alice", "*",
          OpDescribe, PermAllow)))
      val dHid = decodeDescribeShareGroupOffsetsResponse(exchange(alice,
        encodeDescribeShareGroupOffsetsRequest(6, "cli", Seq(("sg", None)))))._2
      assert(dHid.head._2 === 0 && dHid.head._4.isEmpty)
      // naming the topic answers 29 per partition
      val dNamed = decodeDescribeShareGroupOffsetsResponse(exchange(alice,
        encodeDescribeShareGroupOffsetsRequest(7, "cli",
          Seq(("sg", Some(Seq(("q", Some(Seq(0))))))))))._2
      assert(dNamed.head._4.head._2.head.errorCode === 29)

      // grant DESCRIBE topic → the SPSO shows; READ group + topic →
      // alter lands; DELETE group → delete lands
      broker.authorizerOpt.get.add(Seq(
        AclBinding(ResTopic, "q", PatLiteral, "User:alice", "*",
          OpDescribe, PermAllow),
        AclBinding(ResGroup, "sg", PatLiteral, "User:alice", "*",
          OpRead, PermAllow),
        AclBinding(ResTopic, "q", PatLiteral, "User:alice", "*",
          OpRead, PermAllow),
        AclBinding(ResGroup, "sg", PatLiteral, "User:alice", "*",
          OpDelete, PermAllow)))
      val dOk = decodeDescribeShareGroupOffsetsResponse(exchange(alice,
        encodeDescribeShareGroupOffsetsRequest(8, "cli", Seq(("sg", None)))))._2
      assert(dOk.head._4 === Seq(("q", Seq(ShareOffsetRow(0, 3L, 0, 0, null)))))
      val (_, aOk, _, _) = decodeAlterShareGroupOffsetsResponse(exchange(alice,
        encodeAlterShareGroupOffsetsRequest(9, "cli", "sg",
          Seq(("q", Seq((0, 0L)))))))
      assert(aOk === 0)
      val (_, xOk, _, xt) = decodeDeleteShareGroupOffsetsResponse(exchange(alice,
        encodeDeleteShareGroupOffsetsRequest(10, "cli", "sg", Seq("q"))))
      assert(xOk === 0 && xt === Seq(("q", 0, null)))
    } finally { alice.close(); admin.close(); server.close() }
  }
}
