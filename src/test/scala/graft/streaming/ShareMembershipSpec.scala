package graft.streaming

import java.net.Socket
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** ShareGroupHeartbeat (key 76) / ShareGroupDescribe (key 77) — the
  * KIP-932 membership + admin RPCs over [[ShareCoordinator]]: broker-
  * generated member ids, group-epoch advancement, the SimpleAssignor
  * shape (every member → every partition of the subscribed topics;
  * overlap is the design, record locks arbitrate), lazy topic
  * re-resolution, session expiry, and the full membership→data-path
  * composition a 4.x share consumer runs (heartbeat → ShareFetch with
  * the ISSUED member id → leave). */
class ShareMembershipSpec extends AnyFunSuite {
  import KafkaWire._
  lazy val spark = TestSpark.spark

  private def exchange(sock: Socket, request: Array[Byte]): Array[Byte] =
    WireTestClient.exchange(sock, request)

  test("ShareGroupHeartbeat request matches the hand-laid golden frame") {
    // header v2: api_key 76, v0, corr 9, client "c", tags; body:
    // group "g", member "m", epoch 0, null rack, subscribed ["t"]
    val golden = Array[Int](
      0x00, 0x00, 0x00, 0x19, // frame size 25
      0x00, 0x4c, // api_key 76
      0x00, 0x00, // version 0
      0x00, 0x00, 0x00, 0x09, // correlation id 9
      0x00, 0x01, 0x63, // client id "c"
      0x00, // header tags
      0x02, 0x67, // group_id compact "g"
      0x02, 0x6d, // member_id compact "m"
      0x00, 0x00, 0x00, 0x00, // member_epoch 0
      0x00, // rack_id: null compact string
      0x02, // subscribed_topic_names: compact array length 1
      0x02, 0x74, // compact string "t"
      0x00 // body tags
    ).map(_.toByte)
    assert(encodeShareGroupHeartbeatRequest(9, "c", "g", "m", 0,
      Seq("t")) === golden)
  }

  test("heartbeat and describe codecs round-trip, null variants included") {
    val (c1, g1, m1, e1, r1, s1, cid) = decodeShareGroupHeartbeatRequest(
      encodeShareGroupHeartbeatRequest(7, "cli", "sg", "mem", 3,
        Seq("a", "b"), "rack-1"))
    assert((c1, g1, m1, e1, r1, s1, cid)
      === ((7, "sg", "mem", 3, "rack-1", Seq("a", "b"), "cli")))
    // null subscription (= unchanged) and null rack survive
    val (_, _, _, _, rNull, sNull, _) = decodeShareGroupHeartbeatRequest(
      encodeShareGroupHeartbeatRequest(8, "cli", "sg", "mem", 4))
    assert(rNull === null && sNull === null)

    val resolver = topicIdResolverFor(Seq("t"))
    val (_, err, msg, mid, me, ivl, asg) = decodeShareGroupHeartbeatResponse(
      encodeShareGroupHeartbeatResponse(9, 0, null, "m-1", 2, 3000,
        Some(Seq("t" -> Seq(0, 1)))), resolver)
    assert((err, msg, mid, me, ivl) === ((0, null, "m-1", 2, 3000)))
    assert(asg === Some(Seq("t" -> Seq(0, 1))))
    val (_, _, _, _, _, _, none) = decodeShareGroupHeartbeatResponse(
      encodeShareGroupHeartbeatResponse(10, 0, null, "m-1", 2, 3000, None))
    assert(none === None)

    val member = SGDescribedMember("m-1", "rack", 2, "cli", "", Seq("t"),
      Seq("t" -> Seq(0, 1)))
    val (_, groups) = decodeShareGroupDescribeResponse(
      encodeShareGroupDescribeResponse(11, Seq(
        SGDescribedGroup(0, null, "sg", "Stable", 2, 2, "simple",
          Seq(member)))), resolver)
    assert(groups === Seq(SGDescribedGroup(0, null, "sg", "Stable", 2, 2,
      "simple", Seq(member))))
    val (_, gids, ops) = decodeShareGroupDescribeRequest(
      encodeShareGroupDescribeRequest(12, "cli", Seq("sg", "x"), true))
    assert(gids === Seq("sg", "x") && ops === true)
  }

  test("membership lifecycle: generated ids, epoch bumps, topic growth, leave") {
    val c = new ShareCoordinator(
      { case "t2" => Some(2); case "t3" => Some(3); case _ => None })
    val t0 = 1000L
    // join with an empty member id → the coordinator GENERATES one
    val j1 = c.heartbeat("g", "", 0, null, Seq("t2"), "c1", t0)
    assert(j1.error === 0 && j1.memberId.nonEmpty && j1.memberEpoch === 2)
    assert(j1.assignment === Some(Seq("t2" -> Seq(0, 1))))
    // steady state: same epoch back, assignment NOT resent
    val hb = c.heartbeat("g", j1.memberId, j1.memberEpoch, null, null,
      "c1", t0 + 10)
    assert(hb.error === 0 && hb.memberEpoch === j1.memberEpoch)
    assert(hb.assignment === None)
    // a second member joins: epoch bumps, both see the same full set
    val j2 = c.heartbeat("g", "", 0, null, Seq("t2", "t3"), "c2", t0 + 20)
    assert(j2.memberEpoch > j1.memberEpoch)
    assert(j2.assignment === Some(Seq("t2" -> Seq(0, 1), "t3" -> Seq(0, 1, 2))))
    val hb2 = c.heartbeat("g", j1.memberId, j1.memberEpoch, null, null,
      "c1", t0 + 30)
    assert(hb2.memberEpoch === j2.memberEpoch)
    assert(hb2.assignment === Some(Seq("t2" -> Seq(0, 1), "t3" -> Seq(0, 1, 2))))
    // fencing: a stale epoch answers 110, an unknown member 25
    assert(c.heartbeat("g", j1.memberId, 1, null, null, "c1", t0 + 40)
      .error === 110)
    assert(c.heartbeat("g", "nobody", 7, null, null, "x", t0 + 50)
      .error === 25)
    // a join with no subscription answers 42
    assert(c.heartbeat("g2", "", 0, null, null, "x", t0 + 60).error === 42)
    // leave: epoch −1; the group describes Empty once both are gone
    assert(c.heartbeat("g", j1.memberId, -1, null, null, "c1", t0 + 70)
      .memberEpoch === -1)
    assert(c.heartbeat("g", j2.memberId, -1, null, null, "c2", t0 + 80)
      .error === 0)
    assert(c.describe("g", t0 + 90).map(_._1) === Some("Empty"))
    // session expiry is lazy: a joined member vanishes past the timeout
    val j3 = c.heartbeat("g", "", 0, null, Seq("t2"), "c3", t0 + 100)
    assert(c.describe("g", t0 + 100 + c.sessionTimeoutMs + 1)
      .map(_._4.length) === Some(0))
    assert(c.heartbeat("g", j3.memberId, j3.memberEpoch, null, null, "c3",
      t0 + 100 + c.sessionTimeoutMs + 2).error === 25)
  }

  test("a share consumer's full wire flow: heartbeat, fetch with issued id, describe, leave") {
    val root = Files.createTempDirectory("graft-sharemem").toString
    val broker = new Broker(spark, root)
    val log = broker.createTopic("q", 1)
    import spark.implicits._
    log.produce((0 until 5).toDF("i").select(col("i"),
      lit(null).cast("binary").as("key"),
      concat(lit("v"), col("i").cast("string")).cast("binary").as("value")),
      Partitioners.byLongKey(1, lit(0L)))
    val server = new WireServer(broker).start()
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      val resolver = topicIdResolverFor(Seq("q"))
      // negotiate: both membership keys served
      val apis = decodeApiVersionsResponseV3(exchange(sock,
        encodeApiVersionsRequestV3(0, "cli", "graft-test", "0")))
      assert(apis.apiKeys.filter(k => k._1 == 76 || k._1 == 77)
        .map(k => (k._1, k._2, k._3)) === Seq((76, 0, 0), (77, 0, 0)))

      // join: the broker issues the member id and the assignment
      val (_, jErr, _, mid, mEpoch, ivl, jAsg) =
        decodeShareGroupHeartbeatResponse(exchange(sock,
          encodeShareGroupHeartbeatRequest(1, "cli", "wsg", "", 0,
            Seq("q"))), resolver)
      assert(jErr === 0 && mid.nonEmpty && ivl > 0)
      assert(jAsg === Some(Seq("q" -> Seq(0))))

      // the data path runs under the ISSUED identity
      val r1 = decodeShareFetchResponse(exchange(sock,
        encodeShareFetchRequest(2, "cli", "wsg", mid, 0,
          Seq("q" -> Seq(ShareFetchPartition(0, 1 << 20, Seq.empty))))),
        resolver)
      assert(r1._4.head._2.head.records.map(_._1) === (0L until 5L))
      val r2 = decodeShareFetchResponse(exchange(sock,
        encodeShareFetchRequest(3, "cli", "wsg", mid, 1,
          Seq("q" -> Seq(ShareFetchPartition(0, 1 << 20,
            Seq(ShareAckBatch(0L, 4L, Seq(1)))))))), resolver)
      assert(r2._4.head._2.head.ackErrorCode === 0)

      // describe reports the live member and its assignment
      val (_, described) = decodeShareGroupDescribeResponse(exchange(sock,
        encodeShareGroupDescribeRequest(4, "cli", Seq("wsg", "ghost"))),
        resolver)
      assert(described.head.groupState === "Stable")
      assert(described.head.members.map(_.memberId) === Seq(mid))
      assert(described.head.members.head.assignment === Seq("q" -> Seq(0)))
      assert(described(1).errorCode === 69)

      // ListGroups shows the LIVE share group (coordinator state)
      val (_, _, groups) = decodeListGroupsResponse(5, exchange(sock,
        encodeListGroupsRequest(5, 5, "cli", typesFilter = Seq("share"))))
      assert(groups.exists(g => g._1 == "wsg" && g._4 == "share"))

      // a coordinator-managed group FENCES unknown member ids on the
      // data path (the real-broker contract; groups that never
      // heartbeat stay un-fenced for embedded use — ShareWireSpec)
      val rogue = decodeShareFetchResponse(exchange(sock,
        encodeShareFetchRequest(8, "cli", "wsg", "rogue", 0,
          Seq("q" -> Seq(ShareFetchPartition(0, 1024, Seq.empty))))),
        resolver)
      assert(rogue._2 === 25 && rogue._4.isEmpty)
      val rogueAck = decodeShareAcknowledgeResponse(exchange(sock,
        encodeShareAcknowledgeRequest(9, "cli", "wsg", "rogue", 1,
          Seq("q" -> Seq(0 -> Seq(ShareAckBatch(0L, 0L, Seq(1))))))),
        resolver)
      assert(rogueAck._2 === 25)

      // leave at −1; the group describes Empty (durable _share state
      // keeps it discoverable), and the drained SPSO survives
      val (_, lErr, _, _, lEpoch, _, _) =
        decodeShareGroupHeartbeatResponse(exchange(sock,
          encodeShareGroupHeartbeatRequest(6, "cli", "wsg", mid, -1)),
          resolver)
      assert(lErr === 0 && lEpoch === -1)
      val (_, after) = decodeShareGroupDescribeResponse(exchange(sock,
        encodeShareGroupDescribeRequest(7, "cli", Seq("wsg"))), resolver)
      assert(after.head.groupState === "Empty")
      assert(broker.shareGroup("q", "wsg").startOffset(0) === 5L)
    } finally {
      sock.close()
      server.close()
    }
  }
}
