package graft.streaming

import java.net.Socket
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** KIP-345 static group membership over real sockets: a restarted
  * static member (empty member id + group.instance.id) replaces its
  * old incarnation WITHOUT a rebalance — same generation, same
  * assignment, leadership kept — while the superseded incarnation is
  * fenced with FENCED_INSTANCE_ID (82) on every RPC it may still
  * send. The feature's point is that a rolling restart stops
  * reshuffling every partition in the group. */
class StaticMembershipSpec extends AnyFunSuite {
  import KafkaWire._
  lazy val spark = TestSpark.spark

  private def exchange(sock: Socket, request: Array[Byte]): Array[Byte] =
    WireTestClient.exchange(sock, request)
  private def b(s: String) = s.getBytes("UTF-8")

  private def join(sock: Socket, corr: Int, group: String, memberId: String,
      instanceId: String, meta: String = "t"): JoinGroupResponse =
    decodeJoinGroupResponse(5, exchange(sock,
      encodeJoinGroupRequest(5, corr, "cli", group, 30000, 30000, memberId,
        instanceId, "consumer", Seq(("range", b(meta))))))

  private def sync(sock: Socket, corr: Int, group: String, gen: Int,
      memberId: String, instanceId: String,
      assignments: Seq[(String, Array[Byte])] = Seq.empty)
      : (Int, Array[Byte]) = {
    val (_, err, _, _, a) = decodeSyncGroupResponse(3, exchange(sock,
      encodeSyncGroupRequest(3, corr, "cli", group, gen, memberId,
        instanceId, null, null, assignments)))
    (err, a)
  }

  private def heartbeat(sock: Socket, corr: Int, group: String, gen: Int,
      memberId: String, instanceId: String): Int =
    decodeHeartbeatResponse(3, exchange(sock,
      encodeHeartbeatRequest(3, corr, "cli", group, gen, memberId,
        instanceId)))._2

  test("a restarted static member rejoins without a rebalance, keeping its assignment") {
    val root = Files.createTempDirectory("graft-static").toString
    val broker = new Broker(spark, root)
    broker.createTopic("st", 4)
    val server = new WireServer(broker).start()
    val sockA = new Socket("127.0.0.1", server.boundPort)
    val sockB = new Socket("127.0.0.1", server.boundPort)
    try {
      // two static members join directly — NO MEMBER_ID_REQUIRED
      // two-step (the instance id already identifies them)
      val ja = join(sockA, 1, "sm", "", "inst-a")
      assert(ja.errorCode === 0, "static join skips the 79 two-step")
      val jb = join(sockB, 2, "sm", "", "inst-b")
      assert(jb.errorCode === 0)
      val ja2 = join(sockA, 3, "sm", ja.memberId, "inst-a")
      assert(ja2.generationId === jb.generationId)
      assert(ja2.leaderId === ja.memberId, "first joiner leads")
      // the leader's roster carries instance ids at v5
      assert(ja2.members.map(_._2).toSet === Set("inst-a", "inst-b"))
      val gen = ja2.generationId
      val assignments = Seq(
        ja.memberId -> b("st:0,st:1"), jb.memberId -> b("st:2,st:3"))
      assert(sync(sockA, 4, "sm", gen, ja.memberId, "inst-a",
        assignments)._1 === 0)
      val (sbErr, sbA) = sync(sockB, 5, "sm", gen, jb.memberId, "inst-b")
      assert(sbErr === 0 && new String(sbA, "UTF-8") === "st:2,st:3")

      // A "restarts": empty member id + inst-a → SAME generation, a
      // fresh member id, leadership kept, NO rebalance for B
      val ra = join(sockA, 6, "sm", "", "inst-a")
      assert(ra.errorCode === 0)
      assert(ra.generationId === gen, "no generation bump on static rejoin")
      assert(ra.memberId !== ja.memberId, "a fresh incarnation id")
      assert(ra.leaderId === ra.memberId, "the replacement keeps leadership")
      // the kept assignment comes straight back, no leader round needed
      val (raErr, raA) = sync(sockA, 7, "sm", gen, ra.memberId, "inst-a")
      assert(raErr === 0 && new String(raA, "UTF-8") === "st:0,st:1")
      // B never saw a rebalance
      assert(heartbeat(sockB, 8, "sm", gen, jb.memberId, "inst-b") === 0)

      // the OLD incarnation is fenced everywhere it could still talk
      assert(heartbeat(sockA, 9, "sm", gen, ja.memberId, "inst-a") === 82)
      assert(sync(sockA, 10, "sm", gen, ja.memberId, "inst-a")._1 === 82)
      val (_, commitRes) = decodeOffsetCommitResponse(7, exchange(sockA,
        encodeOffsetCommitRequest(7, 11, "cli", "sm", gen, ja.memberId,
          "inst-a", Seq(("st", Seq((0, 1L, "")))))))
      assert(commitRes.head._2.head._2 === 82)
      // ... while the live incarnation commits fine
      val (_, okRes) = decodeOffsetCommitResponse(7, exchange(sockA,
        encodeOffsetCommitRequest(7, 12, "cli", "sm", gen, ra.memberId,
          "inst-a", Seq(("st", Seq((0, 1L, "")))))))
      assert(okRes.head._2.head._2 === 0)

      // DescribeGroups v4 serves the instance ids
      val (_, desc) = decodeDescribeGroupsResponse(4, exchange(sockA,
        encodeDescribeGroupsRequest(4, 13, "adm", Seq("sm"))))
      assert(desc.head.instanceIds.toSet === Set("inst-a", "inst-b"))

      // a subscription CHANGE on static rejoin does rebalance
      val rb = join(sockB, 14, "sm", "", "inst-b", meta = "t2")
      assert(rb.errorCode === 0)
      assert(rb.generationId === gen + 1, "changed subscription rebalances")

      // LeaveGroup v3 removes a static member BY INSTANCE ID alone
      val (_, lgErr, lgMembers) = decodeLeaveGroupResponse(3, exchange(sockA,
        encodeLeaveGroupRequest(3, 15, "cli", "sm",
          Seq(("", "inst-a", null)))))
      assert(lgErr === 0 && lgMembers.head._3 === 0)
      val (_, desc2) = decodeDescribeGroupsResponse(4, exchange(sockA,
        encodeDescribeGroupsRequest(4, 16, "adm", Seq("sm"))))
      assert(desc2.head.instanceIds === Seq("inst-b"))
    } finally { sockA.close(); sockB.close(); server.close() }
  }

  test("an unknown instance id with a stale member id cannot join or leave") {
    val root = Files.createTempDirectory("graft-static2").toString
    val broker = new Broker(spark, root)
    broker.createTopic("st2", 1)
    val server = new WireServer(broker).start()
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      val j = join(sock, 1, "sm2", "", "inst-x")
      assert(j.errorCode === 0)
      // presenting the LIVE member id under the WRONG instance binding
      // is fenced; an unknown instance id with a made-up member id is
      // unknown
      assert(heartbeat(sock, 2, "sm2", j.generationId, j.memberId,
        "inst-y") === 82)
      val stale = join(sock, 3, "sm2", "made-up-id", "inst-x")
      assert(stale.errorCode === 82, "wrong member id under a live binding")
      val unknown = join(sock, 4, "sm2", "made-up-id", "inst-z")
      assert(unknown.errorCode === 25)
      val (_, _, lg) = decodeLeaveGroupResponse(3, exchange(sock,
        encodeLeaveGroupRequest(3, 5, "cli", "sm2",
          Seq(("", "inst-z", null)))))
      assert(lg.head._3 === 25)
    } finally { sock.close(); server.close() }
  }
}
