package graft.streaming

import java.io.DataInputStream
import java.net.Socket
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Classic EOS transactions over real sockets: InitProducerId with a
  * transactional id (stable pid, epoch fencing), AddPartitionsToTxn
  * (24), transactional produce (RecordBatch v2 attributes bit 4),
  * EndTxn (26) commit/abort, TxnOffsetCommit (28) buffered offsets,
  * and read_committed fetch: the LSO caps what an open transaction
  * exposes, and aborted records are filtered broker-side (offset
  * gaps — the documented no-control-records design, SURVEY §4). */
class TransactionsSpec extends AnyFunSuite {
  import KafkaWire._
  lazy val spark = TestSpark.spark

  private def exchange(sock: Socket, request: Array[Byte]): Array[Byte] =
    WireTestClient.exchange(sock, request)

  private def rec(s: String) =
    WireRecordV2(1700000000000L, s"k-$s".getBytes("UTF-8"), s.getBytes("UTF-8"))

  test("codec round-trips at legacy v0 and flexible v3") {
    for (v <- Seq(0, 3)) {
      val apr = decodeAddPartitionsToTxnRequest(
        encodeAddPartitionsToTxnRequest(v, 7, "cli", "t1", 55L, 2,
          Seq(("a", Seq(0, 1)), ("b", Seq(2)))))
      assert(apr === AddPartitionsToTxnRequest(v, 7, "cli", "t1", 55L, 2,
        Seq(("a", Seq(0, 1)), ("b", Seq(2)))))
      val (apc, apres) = decodeAddPartitionsToTxnResponse(v,
        encodeAddPartitionsToTxnResponse(v, 8,
          Seq(("a", Seq((0, 0), (1, 47))))))
      assert(apc === 8)
      assert(apres === Seq(("a", Seq((0, 0), (1, 47)))))
      val etr = decodeEndTxnRequest(
        encodeEndTxnRequest(v, 9, "cli", "t1", 55L, 2, committed = true))
      assert(etr === EndTxnRequest(v, 9, "cli", "t1", 55L, 2, true))
      assert(decodeEndTxnResponse(v, encodeEndTxnResponse(v, 10, 48))
        === ((10, 48)))
      val aor = decodeAddOffsetsToTxnRequest(
        encodeAddOffsetsToTxnRequest(v, 13, "cli", "t1", 55L, 2, "g1"))
      assert(aor === AddOffsetsToTxnRequest(v, 13, "cli", "t1", 55L, 2, "g1"))
      assert(decodeAddOffsetsToTxnResponse(v,
        encodeAddOffsetsToTxnResponse(v, 14, 47)) === ((14, 47)))
      val tocr = decodeTxnOffsetCommitRequest(
        encodeTxnOffsetCommitRequest(v, 11, "cli", "t1", "g1", 55L, 2,
          Seq(("a", Seq((0, 42L, "m"))))))
      assert(tocr === TxnOffsetCommitRequest(v, 11, "cli", "t1", "g1", 55L, 2,
        Seq(("a", Seq((0, 42L, "m"))))))
      val (tc, tres) = decodeTxnOffsetCommitResponse(v,
        encodeTxnOffsetCommitResponse(v, 12, Seq(("a", Seq((0, 0))))))
      assert(tc === 12)
      assert(tres === Seq(("a", Seq((0, 0)))))
    }
  }

  test("transactional batches carry attributes bit 4 through the codec") {
    val b = RecordBatchV2(0L, 1000L, Seq(rec("x")), 9L, 1, 0,
      transactional = true)
    val bytes = encodeRecordBatchV2(b)
    assert((bytes(22) & 0x10) === 0x10)
    val back = decodeRecordBatchV2(bytes)
    assert(back.transactional)
    assert(!decodeRecordBatchV2(
      encodeRecordBatchV2(b.copy(transactional = false))).transactional)
  }

  test("commit lifecycle: LSO hides open work from read_committed, commit reveals it") {
    val root = Files.createTempDirectory("graft-txn").toString
    val broker = new Broker(spark, root)
    broker.createTopic("tx", 2)
    val server = new WireServer(broker).start()
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      val (_, e0, pid, epoch) = decodeInitProducerIdResponse(4,
        exchange(sock, encodeInitProducerIdRequest(4, 1, "cli", "app-1", 60000)))
      assert(e0 === 0)

      // produce BEFORE AddPartitionsToTxn → INVALID_TXN_STATE (48)
      def txProduce(corr: Int, p: Int, seq: Int, names: String*) =
        decodeProduceResponse(9, exchange(sock,
          encodeProduceRequestBatches(9, corr, "cli", "app-1", 1, 30000,
            Seq(("tx", Seq((p, ProducedBatch(pid, epoch, seq,
              names.map(rec), transactional = true))))))))._2.head._2.head
      assert(txProduce(2, 0, 0, "early")._2 === 48)

      val (_, added) = decodeAddPartitionsToTxnResponse(3, exchange(sock,
        encodeAddPartitionsToTxnRequest(3, 3, "cli", "app-1", pid, epoch,
          Seq(("tx", Seq(0, 1))))))
      assert(added === Seq(("tx", Seq((0, 0), (1, 0)))))

      assert(txProduce(4, 0, 0, "a", "b") === ((0, 0, 0L)))
      assert(txProduce(5, 1, 0, "c") === ((1, 0, 0L)))

      def fetch(corr: Int, p: Int, isolation: Int) = {
        val (_, topics) = decodeFetchResponse(12, exchange(sock,
          encodeFetchRequest(12, corr, "cli", 100, 1, 1 << 20,
            Seq(("tx", Seq((p, 0L, 1 << 20)))), 0, -1, Seq.empty, isolation)))
        topics.head._2.head._4.map(r => new String(r._2.value, "UTF-8"))
      }
      // read_uncommitted sees the open transaction's records;
      // read_committed sees NOTHING below the LSO
      assert(fetch(6, 0, 0) === Seq("a", "b"))
      assert(fetch(7, 0, 1) === Seq.empty)
      // ListOffsets LATEST: log end at read_uncommitted, LSO at
      // read_committed
      def latest(corr: Int, isolation: Int): Long =
        decodeListOffsetsResponse(7, exchange(sock,
          encodeListOffsetsRequest(7, corr, "cli",
            Seq(("tx", Seq((0, -1L, 1)))), isolation)))
          ._2.head._2.head._4
      assert(latest(8, 0) === 2L)
      assert(latest(9, 1) === 0L)

      // TxnOffsetCommit buffers within the transaction — not visible
      // to OffsetFetch until EndTxn commits
      val (_, tocRes) = decodeTxnOffsetCommitResponse(3, exchange(sock,
        encodeTxnOffsetCommitRequest(3, 10, "cli", "app-1", "tx-group",
          pid, epoch, Seq(("tx", Seq((0, 2L, "")))))))
      assert(tocRes === Seq(("tx", Seq((0, 0)))))
      assert(broker.topic("tx").committed("tx-group").isEmpty)

      val (_, endErr) = decodeEndTxnResponse(3, exchange(sock,
        encodeEndTxnRequest(3, 11, "cli", "app-1", pid, epoch,
          committed = true)))
      assert(endErr === 0)
      // committed: read_committed sees everything, the buffered group
      // offset landed, LATEST converges
      assert(fetch(12, 0, 1) === Seq("a", "b"))
      assert(fetch(13, 1, 1) === Seq("c"))
      assert(latest(14, 1) === 2L)
      assert(broker.topic("tx").committed("tx-group") === Map(0 -> 2L))

      // EndTxn with nothing open → INVALID_TXN_STATE
      val (_, endAgain) = decodeEndTxnResponse(3, exchange(sock,
        encodeEndTxnRequest(3, 15, "cli", "app-1", pid, epoch, true)))
      assert(endAgain === 48)
    } finally { sock.close(); server.close() }
  }

  test("abort lifecycle: aborted records vanish from read_committed forever; offsets dropped") {
    val root = Files.createTempDirectory("graft-txn-abort").toString
    val broker = new Broker(spark, root)
    broker.createTopic("ab", 1)
    val server = new WireServer(broker).start()
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      val (_, _, pid, epoch) = decodeInitProducerIdResponse(4,
        exchange(sock, encodeInitProducerIdRequest(4, 1, "cli", "app-2", 60000)))
      // interleave: plain record, then txn records, then plain again
      def plainProduce(corr: Int, names: String*) =
        decodeProduceResponse(9, exchange(sock,
          encodeProduceRequest(9, corr, "cli", null, 1, 30000,
            Seq(("ab", Seq((0, names.map(rec))))))))
      plainProduce(2, "p0")
      exchange(sock, encodeAddPartitionsToTxnRequest(3, 3, "cli", "app-2",
        pid, epoch, Seq(("ab", Seq(0)))))
      decodeProduceResponse(9, exchange(sock,
        encodeProduceRequestBatches(9, 4, "cli", "app-2", 1, 30000,
          Seq(("ab", Seq((0, ProducedBatch(pid, epoch, 0,
            Seq(rec("t1"), rec("t2")), transactional = true))))))))
      plainProduce(5, "p1")
      // buffered offsets die with the abort
      exchange(sock, encodeTxnOffsetCommitRequest(3, 6, "cli", "app-2",
        "ab-group", pid, epoch, Seq(("ab", Seq((0, 1L, ""))))))

      val (_, endErr) = decodeEndTxnResponse(3, exchange(sock,
        encodeEndTxnRequest(3, 7, "cli", "app-2", pid, epoch,
          committed = false)))
      assert(endErr === 0)

      def fetch(corr: Int, isolation: Int) = {
        val (_, topics) = decodeFetchResponse(12, exchange(sock,
          encodeFetchRequest(12, corr, "cli", 100, 1, 1 << 20,
            Seq(("ab", Seq((0, 0L, 1 << 20)))), 0, -1, Seq.empty, isolation)))
        topics.head._2.head._4.map { case (off, r) =>
          (off, new String(r.value, "UTF-8")) }
      }
      // read_uncommitted still sees the aborted records (real Kafka
      // semantics); read_committed sees an offset GAP where they were
      assert(fetch(8, 0).map(_._2) === Seq("p0", "t1", "t2", "p1"))
      assert(fetch(9, 1) === Seq((0L, "p0"), (3L, "p1")))
      assert(broker.topic("ab").committed("ab-group").isEmpty)
    } finally { sock.close(); server.close() }
  }

  test("fencing: a re-initialized transactional id invalidates the old epoch everywhere") {
    val root = Files.createTempDirectory("graft-txn-fence").toString
    val broker = new Broker(spark, root)
    broker.createTopic("fz", 1)
    val server = new WireServer(broker).start()
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      val (_, _, pid, oldEpoch) = decodeInitProducerIdResponse(4,
        exchange(sock, encodeInitProducerIdRequest(4, 1, "cli", "app-3", 60000)))
      exchange(sock, encodeAddPartitionsToTxnRequest(3, 2, "cli", "app-3",
        pid, oldEpoch, Seq(("fz", Seq(0)))))
      decodeProduceResponse(9, exchange(sock,
        encodeProduceRequestBatches(9, 3, "cli", "app-3", 1, 30000,
          Seq(("fz", Seq((0, ProducedBatch(pid, oldEpoch, 0,
            Seq(rec("zombie")), transactional = true))))))))
      // a second incarnation re-initializes: same pid, epoch + 1, and
      // the first incarnation's open transaction is ABORTED
      val (_, _, pid2, newEpoch) = decodeInitProducerIdResponse(4,
        exchange(sock, encodeInitProducerIdRequest(4, 4, "cli", "app-3", 60000)))
      assert(pid2 === pid)
      assert(newEpoch === oldEpoch + 1)
      // the zombie's every path answers stale-epoch (47)
      val (_, zp) = decodeProduceResponse(9, exchange(sock,
        encodeProduceRequestBatches(9, 5, "cli", "app-3", 1, 30000,
          Seq(("fz", Seq((0, ProducedBatch(pid, oldEpoch, 1,
            Seq(rec("late")), transactional = true))))))))
      assert(zp.head._2.head._2 === 47)
      val (_, za) = decodeAddPartitionsToTxnResponse(3, exchange(sock,
        encodeAddPartitionsToTxnRequest(3, 6, "cli", "app-3", pid, oldEpoch,
          Seq(("fz", Seq(0))))))
      assert(za.head._2.head._2 === 47)
      val (_, ze) = decodeEndTxnResponse(3, exchange(sock,
        encodeEndTxnRequest(3, 7, "cli", "app-3", pid, oldEpoch, true)))
      assert(ze === 47)
      // the aborted zombie work is invisible to read_committed
      val (_, topics) = decodeFetchResponse(12, exchange(sock,
        encodeFetchRequest(12, 8, "cli", 100, 1, 1 << 20,
          Seq(("fz", Seq((0, 0L, 1 << 20)))), 0, -1, Seq.empty, 1)))
      assert(topics.head._2.head._4 === Seq.empty)
      // unknown transactional ids answer INVALID_PRODUCER_ID_MAPPING
      val (_, unk) = decodeEndTxnResponse(3, exchange(sock,
        encodeEndTxnRequest(3, 9, "cli", "nope", pid, newEpoch, true)))
      assert(unk === 49)
    } finally { sock.close(); server.close() }
  }

  test("read_committed does not stall at an aborted range wider than one collect window") {
    val root = Files.createTempDirectory("graft-txn-wide").toString
    val broker = new Broker(spark, root)
    broker.createTopic("wide", 1)
    val server = new WireServer(broker).start()
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      val (_, _, pid, epoch) = decodeInitProducerIdResponse(4,
        exchange(sock, encodeInitProducerIdRequest(4, 1, "cli", "app-w", 60000)))
      exchange(sock, encodeAddPartitionsToTxnRequest(3, 2, "cli", "app-w",
        pid, epoch, Seq(("wide", Seq(0)))))
      // a transactional burst much larger than a small fetch's collect
      // window (max_bytes 600 → window ≈ 51 records), then ABORT it,
      // then one live record behind it
      val burst = (0 until 400).map(i => rec(s"burst$i"))
      decodeProduceResponse(9, exchange(sock,
        encodeProduceRequestBatches(9, 3, "cli", "app-w", 1, 30000,
          Seq(("wide", Seq((0, ProducedBatch(pid, epoch, 0, burst,
            transactional = true))))))))
      decodeEndTxnResponse(3, exchange(sock,
        encodeEndTxnRequest(3, 4, "cli", "app-w", pid, epoch,
          committed = false)))
      decodeProduceResponse(9, exchange(sock,
        encodeProduceRequest(9, 5, "cli", null, 1, 30000,
          Seq(("wide", Seq((0, Seq(rec("alive")))))))))
      // a read_committed fetch at offset 0 with a tiny byte budget
      // must SKIP the whole 400-record aborted range and return the
      // live record — not an empty response at an unmoved position
      val (_, topics) = decodeFetchResponse(12, exchange(sock,
        encodeFetchRequest(12, 6, "cli", 100, 1, 600,
          Seq(("wide", Seq((0, 0L, 600)))), 0, -1, Seq.empty, 1)))
      val recs = topics.head._2.head._4
      assert(recs.map { case (off, r) =>
        (off, new String(r.value, "UTF-8")) } === Seq((400L, "alive")))
    } finally { sock.close(); server.close() }
  }

  test("an append landing after its transaction was fenced is recorded as aborted") {
    val root = Files.createTempDirectory("graft-txn-late").toString
    val broker = new Broker(spark, root)
    broker.createTopic("late", 1)
    val server = new WireServer(broker).start()
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      val (_, _, pid, epoch) = decodeInitProducerIdResponse(4,
        exchange(sock, encodeInitProducerIdRequest(4, 1, "cli", "app-l", 60000)))
      exchange(sock, encodeAddPartitionsToTxnRequest(3, 2, "cli", "app-l",
        pid, epoch, Seq(("late", Seq(0)))))
      // simulate the in-flight race deterministically: the rows land
      // (produceAssigned path via a direct produce), the txn is fenced
      // BEFORE recordTxnAppend runs, then recordTxnAppend fires — the
      // guard must file the range as aborted, not resurrect the txn
      import spark.implicits._
      val rows = Seq(("k".getBytes, "fencedrow".getBytes,
        null: Map[String, Array[Byte]], new java.sql.Timestamp(1000L), 0))
      broker.topic("late").produce(
        rows.toDF("key", "value", "headers", "ts", "partition"),
        partitioner = org.apache.spark.sql.functions.col("partition"))
      // fence: second incarnation aborts the open txn + bumps epoch
      decodeInitProducerIdResponse(4,
        exchange(sock, encodeInitProducerIdRequest(4, 3, "cli", "app-l", 60000)))
      // the stale append's bookkeeping arrives late
      broker.recordTxnAppendForTest("late", 0,
        Seq(ProducedBatch(pid, epoch, 0,
          Seq(rec("fencedrow")), transactional = true)), 0L)
      // read_committed never sees the fenced record; LSO is NOT pinned
      val (_, topics) = decodeFetchResponse(12, exchange(sock,
        encodeFetchRequest(12, 4, "cli", 100, 1, 1 << 20,
          Seq(("late", Seq((0, 0L, 1 << 20)))), 0, -1, Seq.empty, 1)))
      assert(topics.head._2.head._4 === Seq.empty)
      // ... and a fresh plain record behind it IS visible (no pin)
      decodeProduceResponse(9, exchange(sock,
        encodeProduceRequest(9, 5, "cli", null, 1, 30000,
          Seq(("late", Seq((0, Seq(rec("fresh")))))))))
      val (_, topics2) = decodeFetchResponse(12, exchange(sock,
        encodeFetchRequest(12, 6, "cli", 100, 1, 1 << 20,
          Seq(("late", Seq((0, 0L, 1 << 20)))), 0, -1, Seq.empty, 1)))
      assert(topics2.head._2.head._4.map(r =>
        new String(r._2.value, "UTF-8")) === Seq("fresh"))
    } finally { sock.close(); server.close() }
  }

  test("two producers interleave on one partition: LSO is the min open first offset") {
    val root = Files.createTempDirectory("graft-txn-two").toString
    val broker = new Broker(spark, root)
    broker.createTopic("tw", 1)
    val server = new WireServer(broker).start()
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      def init(txnId: String) = {
        val (_, _, pid, ep) = decodeInitProducerIdResponse(4,
          exchange(sock, encodeInitProducerIdRequest(4, 1, "cli", txnId, 60000)))
        exchange(sock, encodeAddPartitionsToTxnRequest(3, 2, "cli", txnId,
          pid, ep, Seq(("tw", Seq(0)))))
        (pid, ep)
      }
      def produce(corr: Int, pid: Long, ep: Int, seq: Int, s: String) =
        decodeProduceResponse(9, exchange(sock,
          encodeProduceRequestBatches(9, corr, "cli", null, 1, 30000,
            Seq(("tw", Seq((0, ProducedBatch(pid, ep, seq, Seq(rec(s)),
              transactional = true))))))))
      def endTxn(corr: Int, txnId: String, pid: Long, ep: Int, commit: Boolean) =
        decodeEndTxnResponse(3, exchange(sock,
          encodeEndTxnRequest(3, corr, "cli", txnId, pid, ep, commit)))._2
      def committedView(corr: Int): Seq[(Long, String)] = {
        val (_, topics) = decodeFetchResponse(12, exchange(sock,
          encodeFetchRequest(12, corr, "cli", 100, 1, 1 << 20,
            Seq(("tw", Seq((0, 0L, 1 << 20)))), 0, -1, Seq.empty, 1)))
        topics.head._2.head._4.map { case (off, r) =>
          (off, new String(r.value, "UTF-8")) }
      }
      val (pidA, epA) = init("two-a")
      val (pidB, epB) = init("two-b")
      produce(3, pidA, epA, 0, "a0") // offset 0: A's txn opens at 0
      produce(4, pidB, epB, 0, "b0") // offset 1: B's txn opens at 1
      produce(5, pidA, epA, 1, "a1") // offset 2
      // both open: LSO = 0, read_committed sees nothing
      assert(committedView(6) === Seq.empty)
      // committing B does NOT advance the LSO past A's first offset —
      // read_committed still sees nothing (A at offset 0 is undecided)
      assert(endTxn(7, "two-b", pidB, epB, commit = true) === 0)
      assert(committedView(8) === Seq.empty)
      // committing A releases everything
      assert(endTxn(9, "two-a", pidA, epA, commit = true) === 0)
      assert(committedView(10) === Seq((0L, "a0"), (1L, "b0"), (2L, "a1")))
    } finally { sock.close(); server.close() }
  }

  test("sendOffsetsToTransaction: AddOffsetsToTxn (25) opens the txn and rides EndTxn") {
    val root = Files.createTempDirectory("graft-txn").toString
    val broker = new Broker(spark, root)
    broker.createTopic("src", 1)
    broker.createTopic("dst", 1)
    val server = new WireServer(broker).start()
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      val (_, e0, pid, epoch) = decodeInitProducerIdResponse(4,
        exchange(sock, encodeInitProducerIdRequest(4, 1, "cli", "ctp-1", 60000)))
      assert(e0 === 0)

      // error legs first: unknown transactional id → 49, wrong epoch → 47
      def addOffsets(corr: Int, txnId: String, p: Long, ep: Int, g: String) =
        decodeAddOffsetsToTxnResponse(3, exchange(sock,
          encodeAddOffsetsToTxnRequest(3, corr, "cli", txnId, p, ep, g)))._2
      assert(addOffsets(2, "nope", pid, epoch, "g") === 49)
      assert(addOffsets(3, "ctp-1", pid + 999, epoch, "g") === 49)
      assert(addOffsets(4, "ctp-1", pid, epoch + 1, "g") === 47)

      // the happy path opens the transaction (a client may send key 25
      // before key 24 — consume-side registration first) but does NOT
      // register data partitions: a produce is still INVALID_TXN_STATE
      assert(addOffsets(5, "ctp-1", pid, epoch, "cg") === 0)
      def txProduce(corr: Int, seq: Int, names: String*) =
        decodeProduceResponse(9, exchange(sock,
          encodeProduceRequestBatches(9, corr, "cli", "ctp-1", 1, 30000,
            Seq(("dst", Seq((0, ProducedBatch(pid, epoch, seq,
              names.map(rec), transactional = true))))))))._2.head._2.head
      assert(txProduce(6, 0, "early")._2 === 48)

      val (_, added) = decodeAddPartitionsToTxnResponse(3, exchange(sock,
        encodeAddPartitionsToTxnRequest(3, 7, "cli", "ctp-1", pid, epoch,
          Seq(("dst", Seq(0))))))
      assert(added === Seq(("dst", Seq((0, 0)))))
      assert(txProduce(8, 0, "out-a", "out-b") === ((0, 0, 0L)))

      // the consumed position rides the SAME transaction
      val (_, tocRes) = decodeTxnOffsetCommitResponse(3, exchange(sock,
        encodeTxnOffsetCommitRequest(3, 9, "cli", "ctp-1", "cg",
          pid, epoch, Seq(("src", Seq((0, 17L, "")))))))
      assert(tocRes === Seq(("src", Seq((0, 0)))))
      assert(broker.topic("src").committed("cg").isEmpty)

      val (_, endErr) = decodeEndTxnResponse(3, exchange(sock,
        encodeEndTxnRequest(3, 10, "cli", "ctp-1", pid, epoch,
          committed = true)))
      assert(endErr === 0)
      // one decision, both effects: offsets landed AND records visible
      assert(broker.topic("src").committed("cg") === Map(0 -> 17L))
      val (_, topics) = decodeFetchResponse(12, exchange(sock,
        encodeFetchRequest(12, 11, "cli", 100, 1, 1 << 20,
          Seq(("dst", Seq((0, 0L, 1 << 20)))), 0, -1, Seq.empty, 1)))
      assert(topics.head._2.head._4.map(r =>
        new String(r._2.value, "UTF-8")) === Seq("out-a", "out-b"))
    } finally { sock.close(); server.close() }
  }
}
