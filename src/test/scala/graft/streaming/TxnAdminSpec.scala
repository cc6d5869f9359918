package graft.streaming

import java.io.DataInputStream
import java.net.Socket
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The transaction/producer admin surface over real sockets —
  * DescribeProducers (61), DescribeTransactions (65), ListTransactions
  * (66): what `kafka-transactions.sh` and AdminClient send to inspect
  * the idempotence gate's sequence bookkeeping and the transaction
  * coordinator. The reference roadmaps the admin surface
  * (ref README.md:47–50); graft serves it against live state. */
class TxnAdminSpec extends AnyFunSuite {
  import KafkaWire._
  lazy val spark = TestSpark.spark

  private def exchange(sock: Socket, request: Array[Byte]): Array[Byte] =
    WireTestClient.exchange(sock, request)

  private def rec(s: String) =
    WireRecordV2(1700000000000L, s"k-$s".getBytes("UTF-8"), s.getBytes("UTF-8"))

  test("DescribeTransactions request matches the hand-laid golden frame") {
    // header v2 (flexible): api_key 65, version 0, corr 7, client "c",
    // empty tags; body: compact array [1 entry] of compact string
    // "app-1", empty tags
    val golden = Array[Int](
      0x00, 0x00, 0x00, 0x14, // frame size 20
      0x00, 0x41, // api_key 65
      0x00, 0x00, // version 0
      0x00, 0x00, 0x00, 0x07, // correlation id 7
      0x00, 0x01, 0x63, // client id "c" (legacy nullable string)
      0x00, // header tags
      0x02, // compact array length 1 (+1)
      0x06, 0x61, 0x70, 0x70, 0x2d, 0x31, // compact string "app-1"
      0x00 // body tags
    ).map(_.toByte)
    assert(encodeDescribeTransactionsRequest(7, "c", Seq("app-1"))
      === golden)
  }

  test("codec round-trips for all three admin keys") {
    val (dpc, dpt) = decodeDescribeProducersRequest(
      encodeDescribeProducersRequest(7, "cli", Seq(("a", Seq(0, 2)), ("b", Seq(1)))))
    assert(dpc === 7)
    assert(dpt === Seq(("a", Seq(0, 2)), ("b", Seq(1))))
    val producers = Seq(ActiveProducer(9L, 3, 41, -1L, 0, 17L),
      ActiveProducer(12L, 0, -1, -1L, -1, -1L))
    val (rpc, rpt) = decodeDescribeProducersResponse(
      encodeDescribeProducersResponse(8,
        Seq(("a", Seq((0, 0, producers), (5, 3, Seq.empty))))))
    assert(rpc === 8)
    assert(rpt === Seq(("a", Seq((0, 0, producers), (5, 3, Seq.empty)))))

    val (dtc, ids) = decodeDescribeTransactionsRequest(
      encodeDescribeTransactionsRequest(9, "cli", Seq("app-1", "nope")))
    assert(dtc === 9)
    assert(ids === Seq("app-1", "nope"))
    val states = Seq(
      DescribedTxn(0, "app-1", "Ongoing", 60000, -1L, 5L, 2,
        Seq(("a", Seq(0, 1)), ("b", Seq(2)))),
      DescribedTxn(105, "nope", "", 0, -1L, -1L, -1, Seq.empty))
    val (rtc, rts) = decodeDescribeTransactionsResponse(
      encodeDescribeTransactionsResponse(10, states))
    assert(rtc === 10)
    assert(rts === states)

    val (ltc, sf, pf) = decodeListTransactionsRequest(
      encodeListTransactionsRequest(11, "cli", Seq("Ongoing"), Seq(5L, 9L)))
    assert(ltc === 11)
    assert(sf === Seq("Ongoing"))
    assert(pf === Seq(5L, 9L))
    val (rlc, unknown, listed) = decodeListTransactionsResponse(
      encodeListTransactionsResponse(12, Seq("Bogus"),
        Seq(("app-1", 5L, "Ongoing"))))
    assert(rlc === 12)
    assert(unknown === Seq("Bogus"))
    assert(listed === Seq(("app-1", 5L, "Ongoing")))
  }

  test("admin surface tracks a full transactional lifecycle over sockets") {
    val root = Files.createTempDirectory("graft-txnadmin").toString
    val broker = new Broker(spark, root)
    broker.createTopic("tx", 2)
    val server = new WireServer(broker).start()
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      // before anything: coordinator empty, unknown ids answer 105
      val (_, _, empty) = decodeListTransactionsResponse(
        exchange(sock, encodeListTransactionsRequest(1, "cli")))
      assert(empty === Seq.empty)
      val (_, notFound) = decodeDescribeTransactionsResponse(
        exchange(sock, encodeDescribeTransactionsRequest(2, "cli", Seq("ghost"))))
      assert(notFound.head.errorCode === 105)

      val (_, e0, pid, epoch) = decodeInitProducerIdResponse(4,
        exchange(sock, encodeInitProducerIdRequest(4, 3, "cli", "app-1", 60000)))
      assert(e0 === 0)

      // initialized but not producing: Empty, no partitions
      val (_, idle) = decodeDescribeTransactionsResponse(
        exchange(sock, encodeDescribeTransactionsRequest(5, "cli", Seq("app-1"))))
      assert(idle.head ===
        DescribedTxn(0, "app-1", "Empty", 60000, -1L, pid, epoch, Seq.empty))

      exchange(sock, encodeAddPartitionsToTxnRequest(3, 6, "cli", "app-1",
        pid, epoch, Seq(("tx", Seq(0)))))
      decodeProduceResponse(9, exchange(sock,
        encodeProduceRequestBatches(9, 7, "cli", "app-1", 1, 30000,
          Seq(("tx", Seq((0, ProducedBatch(pid, epoch, 0,
            Seq(rec("a"), rec("b")), transactional = true))))))))

      // mid-transaction: Ongoing with the registered partition,
      // DescribeProducers shows the pid holding txn start offset 0
      val (_, mid) = decodeDescribeTransactionsResponse(
        exchange(sock, encodeDescribeTransactionsRequest(8, "cli", Seq("app-1"))))
      assert(mid.head.state === "Ongoing")
      assert(mid.head.topics === Seq(("tx", Seq(0))))
      val (_, dp) = decodeDescribeProducersResponse(
        exchange(sock, encodeDescribeProducersRequest(9, "cli",
          Seq(("tx", Seq(0, 1))))))
      val (p0, err0, active0) = dp.head._2.head
      assert((p0, err0) === ((0, 0)))
      assert(active0 === Seq(ActiveProducer(pid, epoch, 1, -1L, 0, 0L)))
      assert(dp.head._2(1) === ((1, 0, Seq.empty))) // untouched partition

      // state filters: matching, non-matching, and unknown names
      val (_, _, ongoing) = decodeListTransactionsResponse(
        exchange(sock, encodeListTransactionsRequest(10, "cli", Seq("Ongoing"))))
      assert(ongoing === Seq(("app-1", pid, "Ongoing")))
      val (_, unk, none) = decodeListTransactionsResponse(
        exchange(sock,
          encodeListTransactionsRequest(11, "cli", Seq("Empty", "Bogus"))))
      assert(unk === Seq("Bogus"))
      assert(none === Seq.empty)
      // ALL-unknown filters match NOTHING (a provided filter
      // restricts; it never falls through to "no filter")
      val (_, unk2, none2) = decodeListTransactionsResponse(
        exchange(sock,
          encodeListTransactionsRequest(17, "cli", Seq("Bogus"))))
      assert(unk2 === Seq("Bogus"))
      assert(none2 === Seq.empty)
      val (_, _, byPid) = decodeListTransactionsResponse(
        exchange(sock, encodeListTransactionsRequest(12, "cli",
          producerIdFilters = Seq(pid, 999L))))
      assert(byPid === Seq(("app-1", pid, "Ongoing")))

      decodeEndTxnResponse(3, exchange(sock,
        encodeEndTxnRequest(3, 13, "cli", "app-1", pid, epoch,
          committed = true)))

      // committed: back to Empty, txn start offset cleared, the
      // sequence state survives (the idempotence window outlives the
      // transaction)
      val (_, done) = decodeDescribeTransactionsResponse(
        exchange(sock, encodeDescribeTransactionsRequest(14, "cli", Seq("app-1"))))
      assert(done.head.state === "Empty")
      assert(done.head.topics === Seq.empty)
      val (_, dp2) = decodeDescribeProducersResponse(
        exchange(sock, encodeDescribeProducersRequest(15, "cli",
          Seq(("tx", Seq(0))))))
      assert(dp2.head._2.head._3 ===
        Seq(ActiveProducer(pid, epoch, 1, -1L, 0, -1L)))

      // unknown topic / out-of-range partition answer 3 per partition
      val (_, dp3) = decodeDescribeProducersResponse(
        exchange(sock, encodeDescribeProducersRequest(16, "cli",
          Seq(("ghost", Seq(0)), ("tx", Seq(7))))))
      assert(dp3 === Seq(("ghost", Seq((0, 3, Seq.empty))),
        ("tx", Seq((7, 3, Seq.empty)))))
    } finally { sock.close(); server.close() }
  }

  test("plain idempotent producers appear with no coordinator binding") {
    val root = Files.createTempDirectory("graft-txnadmin-idem").toString
    val broker = new Broker(spark, root)
    broker.createTopic("plain", 1)
    val server = new WireServer(broker).start()
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      val (_, _, pid, epoch) = decodeInitProducerIdResponse(4,
        exchange(sock, encodeInitProducerIdRequest(4, 1, "cli", null, 60000)))
      decodeProduceResponse(9, exchange(sock,
        encodeProduceRequestBatches(9, 2, "cli", null, 1, 30000,
          Seq(("plain", Seq((0, ProducedBatch(pid, epoch, 0,
            Seq(rec("x"), rec("y"), rec("z"))))))))))
      val (_, dp) = decodeDescribeProducersResponse(
        exchange(sock, encodeDescribeProducersRequest(3, "cli",
          Seq(("plain", Seq(0))))))
      // coordinatorEpoch −1 (no txn binding), no open txn offset
      assert(dp.head._2.head._3 ===
        Seq(ActiveProducer(pid, epoch, 2, -1L, -1, -1L)))
      // and the coordinator remains empty — idempotence is not a txn
      val (_, _, listed) = decodeListTransactionsResponse(
        exchange(sock, encodeListTransactionsRequest(4, "cli")))
      assert(listed === Seq.empty)
    } finally { sock.close(); server.close() }
  }
}
