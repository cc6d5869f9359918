package graft.streaming

import java.net.Socket
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The transaction coordinator survives a broker restart (VERDICT r6
  * directive 1): aborted ranges keep filtering read_committed fetches,
  * open transactions keep capping the LSO, epochs keep fencing, pids
  * are never re-issued, and an in-flight transaction can even COMMIT
  * across the restart — all through the TxnStore hard-link-CAS
  * snapshots under `<root>/_txn`. Every leg tears the Broker AND
  * WireServer down and reopens fresh instances over the same log
  * root. */
class TxnRecoverySpec extends AnyFunSuite {
  import KafkaWire._
  lazy val spark = TestSpark.spark

  private def exchange(sock: Socket, request: Array[Byte]): Array[Byte] =
    WireTestClient.exchange(sock, request)

  private def rec(s: String) =
    WireRecordV2(1700000000000L, s"k-$s".getBytes("UTF-8"), s.getBytes("UTF-8"))

  private def fetchVals(sock: Socket, corr: Int, topic: String, p: Int,
      isolation: Int): Seq[(Long, String)] = {
    val (_, topics) = decodeFetchResponse(12, exchange(sock,
      encodeFetchRequest(12, corr, "cli", 100, 1, 1 << 20,
        Seq((topic, Seq((p, 0L, 1 << 20)))), 0, -1, Seq.empty, isolation)))
    topics.head._2.head._4.map { case (off, r) =>
      (off, new String(r.value, "UTF-8")) }
  }

  private def latest(sock: Socket, corr: Int, topic: String,
      isolation: Int): Long =
    decodeListOffsetsResponse(7, exchange(sock,
      encodeListOffsetsRequest(7, corr, "cli",
        Seq((topic, Seq((0, -1L, 1)))), isolation)))._2.head._2.head._4

  test("TxnStore render/parse round-trips hostile strings and full state") {
    val st = TxnStore.State(42L,
      Seq(
        TxnStore.PersistedTxn("app\"1|;,:", 5L, 3, open = true,
          Seq(("t.a", 0), ("t.a", 1)),
          Map(("t.a", 0) -> 10L), Map(("t.a", 0) -> 14L),
          Map("g\"roup" -> Map(("t.a", 0) -> ((7L, "méta|;"))),
            "g2" -> Map(("t.a", 1) -> ((9L, ""))))),
        TxnStore.PersistedTxn("done", 6L, 0, open = false,
          Seq.empty, Map.empty, Map.empty, Map.empty)),
      Map(("t.a", 0) -> Seq((1L, 2L), (5L, 9L)), ("t-b", 3) -> Seq.empty))
    val back = TxnStore.parse(TxnStore.render(7L, st))
    assert(back === st)
  }

  test("aborted ranges survive restart: read_committed keeps filtering") {
    val root = Files.createTempDirectory("graft-txnrec-abort").toString
    var broker = new Broker(spark, root)
    broker.createTopic("ab", 1)
    var server = new WireServer(broker).start()
    var sock = new Socket("127.0.0.1", server.boundPort)
    try {
      val (_, _, pid, epoch) = decodeInitProducerIdResponse(4,
        exchange(sock, encodeInitProducerIdRequest(4, 1, "cli", "rec-1", 60000)))
      decodeProduceResponse(9, exchange(sock,
        encodeProduceRequest(9, 2, "cli", null, 1, 30000,
          Seq(("ab", Seq((0, Seq(rec("p0")))))))))
      exchange(sock, encodeAddPartitionsToTxnRequest(3, 3, "cli", "rec-1",
        pid, epoch, Seq(("ab", Seq(0)))))
      decodeProduceResponse(9, exchange(sock,
        encodeProduceRequestBatches(9, 4, "cli", "rec-1", 1, 30000,
          Seq(("ab", Seq((0, ProducedBatch(pid, epoch, 0,
            Seq(rec("t1"), rec("t2")), transactional = true))))))))
      decodeProduceResponse(9, exchange(sock,
        encodeProduceRequest(9, 5, "cli", null, 1, 30000,
          Seq(("ab", Seq((0, Seq(rec("p1")))))))))
      val (_, endErr) = decodeEndTxnResponse(3, exchange(sock,
        encodeEndTxnRequest(3, 6, "cli", "rec-1", pid, epoch,
          committed = false)))
      assert(endErr === 0)
      assert(fetchVals(sock, 7, "ab", 0, 1) === Seq((0L, "p0"), (3L, "p1")))

      // full restart: new Broker + new WireServer over the same root
      sock.close(); server.close()
      broker = new Broker(spark, root)
      server = new WireServer(broker).start()
      sock = new Socket("127.0.0.1", server.boundPort)

      // the aborted range is still filtered; read_uncommitted still
      // serves everything; LATEST agrees at both isolation levels
      assert(fetchVals(sock, 8, "ab", 0, 1) === Seq((0L, "p0"), (3L, "p1")))
      assert(fetchVals(sock, 9, "ab", 0, 0).map(_._2)
        === Seq("p0", "t1", "t2", "p1"))
      assert(latest(sock, 10, "ab", 0) === 4L)
      assert(latest(sock, 11, "ab", 1) === 4L)
    } finally { sock.close(); server.close() }
  }

  test("an open transaction caps the LSO across restart and can then COMMIT") {
    val root = Files.createTempDirectory("graft-txnrec-open").toString
    var broker = new Broker(spark, root)
    broker.createTopic("op", 1)
    var server = new WireServer(broker).start()
    var sock = new Socket("127.0.0.1", server.boundPort)
    try {
      val (_, _, pid, epoch) = decodeInitProducerIdResponse(4,
        exchange(sock, encodeInitProducerIdRequest(4, 1, "cli", "rec-2", 60000)))
      exchange(sock, encodeAddPartitionsToTxnRequest(3, 2, "cli", "rec-2",
        pid, epoch, Seq(("op", Seq(0)))))
      decodeProduceResponse(9, exchange(sock,
        encodeProduceRequestBatches(9, 3, "cli", "rec-2", 1, 30000,
          Seq(("op", Seq((0, ProducedBatch(pid, epoch, 0,
            Seq(rec("x"), rec("y")), transactional = true))))))))
      exchange(sock, encodeTxnOffsetCommitRequest(3, 4, "cli", "rec-2",
        "rec-2-group", pid, epoch, Seq(("op", Seq((0, 2L, "m"))))))

      sock.close(); server.close()
      broker = new Broker(spark, root)
      server = new WireServer(broker).start()
      sock = new Socket("127.0.0.1", server.boundPort)

      // the restored open transaction still hides its records
      assert(latest(sock, 5, "op", 0) === 2L)
      assert(latest(sock, 6, "op", 1) === 0L)
      assert(fetchVals(sock, 7, "op", 0, 1) === Seq.empty)
      assert(broker.topic("op").committed("rec-2-group").isEmpty)

      // the SAME producer incarnation commits across the restart —
      // coordinator state (pid, epoch, ranges, buffered offsets) is
      // fully restored, as with a Kafka coordinator failover
      val (_, endErr) = decodeEndTxnResponse(3, exchange(sock,
        encodeEndTxnRequest(3, 8, "cli", "rec-2", pid, epoch,
          committed = true)))
      assert(endErr === 0)
      assert(fetchVals(sock, 9, "op", 0, 1).map(_._2) === Seq("x", "y"))
      assert(latest(sock, 10, "op", 1) === 2L)
      assert(broker.topic("op").committed("rec-2-group") === Map(0 -> 2L))
    } finally { sock.close(); server.close() }
  }

  test("epoch fencing survives restart; re-init aborts the restored open txn") {
    val root = Files.createTempDirectory("graft-txnrec-fence").toString
    var broker = new Broker(spark, root)
    broker.createTopic("fz", 1)
    var server = new WireServer(broker).start()
    var sock = new Socket("127.0.0.1", server.boundPort)
    try {
      val (_, _, pid, oldEpoch) = decodeInitProducerIdResponse(4,
        exchange(sock, encodeInitProducerIdRequest(4, 1, "cli", "rec-3", 60000)))
      exchange(sock, encodeAddPartitionsToTxnRequest(3, 2, "cli", "rec-3",
        pid, oldEpoch, Seq(("fz", Seq(0)))))
      decodeProduceResponse(9, exchange(sock,
        encodeProduceRequestBatches(9, 3, "cli", "rec-3", 1, 30000,
          Seq(("fz", Seq((0, ProducedBatch(pid, oldEpoch, 0,
            Seq(rec("zomb")), transactional = true))))))))

      sock.close(); server.close()
      broker = new Broker(spark, root)
      server = new WireServer(broker).start()
      sock = new Socket("127.0.0.1", server.boundPort)

      // re-init after restart: same pid, bumped epoch, old txn aborted
      val (_, e2, pid2, epoch2) = decodeInitProducerIdResponse(4,
        exchange(sock, encodeInitProducerIdRequest(4, 4, "cli", "rec-3", 60000)))
      assert(e2 === 0)
      assert(pid2 === pid, "a transactional id keeps its stable pid")
      assert(epoch2 === oldEpoch + 1)
      // the zombie's epoch is fenced ON THE RESTARTED BROKER
      val zombieRes = decodeProduceResponse(9, exchange(sock,
        encodeProduceRequestBatches(9, 5, "cli", "rec-3", 1, 30000,
          Seq(("fz", Seq((0, ProducedBatch(pid, oldEpoch, 1,
            Seq(rec("late")), transactional = true))))))))
        ._2.head._2.head._2
      assert(zombieRes === 47)
      // the auto-aborted records are gone from read_committed
      assert(fetchVals(sock, 6, "fz", 0, 1) === Seq.empty)
      assert(latest(sock, 7, "fz", 1) === 1L)
    } finally { sock.close(); server.close() }
  }

  test("pids are never re-issued across restart (idempotent path included)") {
    val root = Files.createTempDirectory("graft-txnrec-pid").toString
    var broker = new Broker(spark, root)
    var server = new WireServer(broker).start()
    var sock = new Socket("127.0.0.1", server.boundPort)
    try {
      val (_, _, pidA, _) = decodeInitProducerIdResponse(4,
        exchange(sock, encodeInitProducerIdRequest(4, 1, "cli", null, 60000)))
      val (_, _, pidB, _) = decodeInitProducerIdResponse(4,
        exchange(sock, encodeInitProducerIdRequest(4, 2, "cli", "rec-4", 60000)))

      sock.close(); server.close()
      broker = new Broker(spark, root)
      server = new WireServer(broker).start()
      sock = new Socket("127.0.0.1", server.boundPort)

      val (_, _, pidC, _) = decodeInitProducerIdResponse(4,
        exchange(sock, encodeInitProducerIdRequest(4, 3, "cli", null, 60000)))
      assert(pidC > pidA && pidC > pidB,
        s"restarted broker re-issued a pid: $pidC vs ($pidA, $pidB)")
    } finally { sock.close(); server.close() }
  }

  test("deleting a topic forgets its txn metadata — a recreated namesake starts clean") {
    val root = Files.createTempDirectory("graft-txnrec-del").toString
    var broker = new Broker(spark, root)
    broker.createTopic("re", 1)
    var server = new WireServer(broker).start()
    var sock = new Socket("127.0.0.1", server.boundPort)
    try {
      val (_, _, pid, epoch) = decodeInitProducerIdResponse(4,
        exchange(sock, encodeInitProducerIdRequest(4, 1, "cli", "rec-5", 60000)))
      exchange(sock, encodeAddPartitionsToTxnRequest(3, 2, "cli", "rec-5",
        pid, epoch, Seq(("re", Seq(0)))))
      decodeProduceResponse(9, exchange(sock,
        encodeProduceRequestBatches(9, 3, "cli", "rec-5", 1, 30000,
          Seq(("re", Seq((0, ProducedBatch(pid, epoch, 0,
            Seq(rec("a"), rec("b")), transactional = true))))))))
      decodeEndTxnResponse(3, exchange(sock,
        encodeEndTxnRequest(3, 4, "cli", "rec-5", pid, epoch,
          committed = false)))
      broker.deleteTopic("re")
      broker.createTopic("re", 1)

      // restart: the recreated topic must NOT inherit the dead
      // namesake's aborted range at offsets 0–1
      sock.close(); server.close()
      broker = new Broker(spark, root)
      server = new WireServer(broker).start()
      sock = new Socket("127.0.0.1", server.boundPort)

      decodeProduceResponse(9, exchange(sock,
        encodeProduceRequest(9, 5, "cli", null, 1, 30000,
          Seq(("re", Seq((0, Seq(rec("fresh0"), rec("fresh1")))))))))
      assert(fetchVals(sock, 6, "re", 0, 1).map(_._2)
        === Seq("fresh0", "fresh1"))
    } finally { sock.close(); server.close() }
  }
}
