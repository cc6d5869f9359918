package graft.streaming

import java.io.DataInputStream
import java.net.Socket
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The admin keys that used to kill the connection, over real
  * sockets: ACLs (29/30/31 — SECURITY_DISABLED 54, the no-authorizer
  * broker's honest answer), ElectLeaders (43 — ELECTION_NOT_NEEDED 84
  * on a broker that is every partition's leader), and partition
  * reassignments (45/46 — vacuously complete to [0], 39 for brokers
  * that don't exist, 85 for cancellations, always-empty listing). */
class AdminEdgeSpec extends AnyFunSuite {
  import KafkaWire._
  lazy val spark = TestSpark.spark

  private def exchange(sock: Socket, request: Array[Byte]): Array[Byte] =
    WireTestClient.exchange(sock, request)

  test("ACL surface answers SECURITY_DISABLED per entry; connection survives") {
    val root = Files.createTempDirectory("graft-acl").toString
    val broker = new Broker(spark, root)
    val server = new WireServer(broker).start()
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      val anyFilter = Acls.AclFilter(Acls.ResAny, null, Acls.PatAny, null,
        null, Acls.OpAny, Acls.PermAny)
      val (_, derr, dmsg, dacls) = decodeDescribeAclsResponse(
        exchange(sock, encodeDescribeAclsRequest(1, 1, "cli", anyFilter)), 1)
      assert(derr === 54)
      assert(dmsg === NoAuthorizerMessage)
      assert(dacls.isEmpty)
      val creation = Acls.AclBinding(Acls.ResTopic, "t", Acls.PatLiteral,
        "User:alice", "*", Acls.OpRead, Acls.PermAllow)
      val (_, created) = decodeCreateAclsResponse(
        exchange(sock, encodeCreateAclsRequest(2, 2, "cli",
          Seq(creation, creation))), 2)
      assert(created === Seq.fill(2)((54, NoAuthorizerMessage)))
      val (_, deleted) = decodeDeleteAclsResponse(
        exchange(sock, encodeDeleteAclsRequest(0, 3, "cli",
          Seq(anyFilter.copy(patternType = Acls.PatLiteral)))), 0)
      assert(deleted === Seq((54, NoAuthorizerMessage, Seq.empty)))
      // the probe cost nothing: the same connection still serves data
      val av = decodeApiVersionsResponsePreV3(0,
        exchange(sock, encodeApiVersionsRequest(0, 4, "cli")))
      assert(av.errorCode === 0)
    } finally { sock.close(); server.close() }
  }

  test("ElectLeaders: 84 for hosted partitions, 3 for unknown, empty for the null form") {
    val root = Files.createTempDirectory("graft-elect").toString
    val broker = new Broker(spark, root)
    broker.createTopic("el", 2)
    val server = new WireServer(broker).start()
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      val (_, named) = decodeElectLeadersResponse(exchange(sock,
        encodeElectLeadersRequest(1, "cli",
          Seq(("el", Seq(0, 5)), ("ghost", Seq(0))))))
      assert(named.map { case (t, ps) => (t, ps.map(p => (p._1, p._2))) } ===
        Seq(("el", Seq((0, 84), (5, 3))), ("ghost", Seq((0, 3)))))
      val (_, all) = decodeElectLeadersResponse(exchange(sock,
        encodeElectLeadersRequest(2, "cli", null)))
      assert(all === Seq.empty) // nothing needs an election, ever
    } finally { sock.close(); server.close() }
  }

  test("reassignments: [0] vacuously done, others 39, cancel 85, list empty") {
    val root = Files.createTempDirectory("graft-reassign").toString
    val broker = new Broker(spark, root)
    broker.createTopic("ra", 2)
    val server = new WireServer(broker).start()
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      val (_, altered) = decodeAlterPartitionReassignmentsResponse(
        exchange(sock, encodeAlterPartitionReassignmentsRequest(1, "cli",
          Seq(("ra", Seq((0, Seq(0)), (1, Seq(1, 2)), (0, null), (9, Seq(0)))),
            ("ghost", Seq((0, Seq(0))))))))
      assert(altered.map { case (t, ps) =>
        (t, ps.map(p => (p._1, p._2))) } ===
        Seq(("ra", Seq((0, 0), (1, 39), (0, 85), (9, 3))),
          ("ghost", Seq((0, 3)))))
      val (_, n) = decodeListPartitionReassignmentsResponse(
        exchange(sock, encodeListPartitionReassignmentsRequest(2, "cli")))
      assert(n === 0)
    } finally { sock.close(); server.close() }
  }
}
