package graft.streaming

import java.io.DataInputStream
import java.net.Socket
import java.nio.file.Files
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Concurrency soak over the two newest stateful wire paths — the
  * KIP-227 fetch-session store and the idempotent-producer sequence
  * store — the way ManifestStressSpec hardened CAS commits: many real
  * socket clients racing the LRU caps at once.
  *
  *  - Fetch sessions: more concurrent sessions than MaxFetchSessions
  *    (64), so eviction churns constantly; an evicted client sees
  *    FETCH_SESSION_ID_NOT_FOUND (70) and must recover with an
  *    epoch-0 full fetch — the protocol's own path. Every response a
  *    thread receives must be consistent with the offsets ITS session
  *    declared (no cross-session bleed), and every thread finishes.
  *  - Idempotent producers: one pid per thread (the real contract —
  *    one producer drives one connection), every batch sent TWICE;
  *    the retry must re-ack the ORIGINAL base offset (no lost acks)
  *    and append nothing (no duplicate records), while other pids'
  *    appends interleave arbitrarily between the send and the retry. */
class ConcurrencySoakSpec extends AnyFunSuite {
  import KafkaWire._
  lazy val spark = TestSpark.spark

  private def exchange(sock: Socket, request: Array[Byte]): Array[Byte] =
    WireTestClient.exchange(sock, request)

  private def runThreads(n: Int)(body: Int => Unit): Seq[Throwable] = {
    val failures = new ConcurrentLinkedQueue[Throwable]()
    val start = new CountDownLatch(1)
    val threads = (0 until n).map { i =>
      val th = new Thread(() => {
        start.await()
        try body(i) catch { case t: Throwable => failures.add(t); () }
      })
      th.start(); th
    }
    start.countDown()
    threads.foreach(_.join(300000))
    import scala.jdk.CollectionConverters._
    failures.asScala.toSeq
  }

  test("idempotent producers race: every retry re-acks its original offset, no duplicates") {
    val root = Files.createTempDirectory("graft-soak-idem").toString
    val broker = new Broker(spark, root)
    broker.createTopic("soak", 2)
    val server = new WireServer(broker).start()
    val nThreads = 8
    val nBatches = 5
    val recsPerBatch = 3
    try {
      val failures = runThreads(nThreads) { i =>
        val sock = new Socket("127.0.0.1", server.boundPort)
        try {
          val (_, initErr, pid, epoch) = decodeInitProducerIdResponse(4,
            exchange(sock, encodeInitProducerIdRequest(4, 1, s"p$i", null, 60000)))
          assert(initErr === 0)
          var corr = 10
          var lastAck = -1L
          for (b <- 0 until nBatches) {
            val recs = (0 until recsPerBatch).map(r =>
              WireRecordV2(1700000000000L + b, s"k$i-$b-$r".getBytes("UTF-8"),
                s"v$i-$b-$r".getBytes("UTF-8")))
            val p = i % 2
            val req = encodeProduceRequestBatches(9, corr, s"p$i", null, 1,
              30000, Seq(("soak", Seq((p, ProducedBatch(pid, epoch,
                b * recsPerBatch, recs))))))
            corr += 1
            // REQUEST_TIMED_OUT (7) is the broker's honest answer when
            // CAS contention outlasts the request timeout (a loaded
            // box); a real client retries the same bytes — and the
            // idempotence gate must make that retry safe, which is the
            // very property under test
            def produceUntilAcked(): Seq[(String, Seq[(Int, Int, Long)])] = {
              var res = decodeProduceResponse(9, exchange(sock, req))._2
              var attempts = 1
              while (res.head._2.head._2 == 7 && attempts < 5) {
                res = decodeProduceResponse(9, exchange(sock, req))._2
                attempts += 1
              }
              // retries must stay VISIBLE: exhausting them is its own
              // failure (not a generic errored-7 assert downstream),
              // and any retry at all is logged so a systematic broker
              // slowdown shows up in the suite output instead of being
              // silently absorbed by the retry loop
              assert(res.head._2.head._2 != 7,
                s"thread $i batch $b: still timed out after $attempts attempts")
              if (attempts > 1)
                println(s"[ConcurrencySoakSpec] thread $i batch $b acked " +
                  s"after $attempts attempts (CAS contention)")
              res
            }
            val first = produceUntilAcked()
            val (fp, fe, foff) = first.head._2.head
            assert(fp === p); assert(fe === 0, s"thread $i batch $b errored $fe")
            assert(foff > lastAck, "acked offsets advance per pid")
            lastAck = foff
            // network-level retry of the SAME bytes — possibly long
            // after other pids appended behind it
            val second = produceUntilAcked()
            val (_, se, soff) = second.head._2.head
            assert(se === 0, s"thread $i batch $b retry errored $se")
            assert(soff === foff,
              s"thread $i batch $b: retry acked $soff, original $foff")
          }
        } finally sock.close()
      }
      assert(failures.isEmpty, failures.map(_.toString).mkString("; "))
      // no duplicate appends: exactly threads × batches × recs rows,
      // all distinct keys
      val rows = broker.topic("soak").read()
      assert(rows.count() === nThreads.toLong * nBatches * recsPerBatch)
      assert(rows.selectExpr("cast(key as string)").distinct().count()
        === nThreads.toLong * nBatches * recsPerBatch)
    } finally server.close()
  }

  test("fetch sessions race the LRU cap: eviction answers 70, recovery works, no cross-session bleed") {
    val root = Files.createTempDirectory("graft-soak-fs").toString
    val broker = new Broker(spark, root)
    broker.createTopic("fs", 4)
    // seed 40 records per partition, single produce
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val seed = (0 until 4).flatMap(p => (0 until 40).map(r =>
      (s"k$p-$r".getBytes("UTF-8"), s"v$p-$r".getBytes("UTF-8"),
        null: Map[String, Array[Byte]], new java.sql.Timestamp(1700000000000L), p)))
    broker.topic("fs").produce(
      seed.toDF("key", "value", "headers", "ts", "partition"),
      partitioner = col("partition"))
    val server = new WireServer(broker).start()
    // 24 threads × 4 LIVE sessions each = 96 live sessions against a
    // 64-session cap — eviction must land on sessions that are still
    // in use, so the 70 + reopen recovery path genuinely executes
    // under churn (a session evicted while idle-and-abandoned would
    // never be observed)
    val nThreads = 24
    try {
      val evictions = new java.util.concurrent.atomic.AtomicInteger(0)
      val failures = runThreads(nThreads) { i =>
        val sock = new Socket("127.0.0.1", server.boundPort)
        try {
          val myPart = i % 4
          var corr = 1
          // per-session state: id, next epoch, this session's offset
          final class Sess(var sid: Int, var epoch: Int, var off: Long)
          def fullFetch(off: Long): Sess = {
            val (_, err, sid, topics) = decodeFetchResponseFull(12,
              exchange(sock, encodeFetchRequest(12, corr, s"c$i", 0, 1, 1 << 20,
                Seq(("fs", Seq((myPart, off, 1 << 20)))), 0, 0)))
            corr += 1
            assert(err === 0, s"thread $i open errored $err")
            assert(sid !== 0, "a session id was assigned")
            val got = topics.headOption.toSeq
              .flatMap(_._2).filter(_._1 == myPart).flatMap(_._4)
            got.headOption.foreach { case (base, _) =>
              assert(base === off, s"thread $i: base $base for requested $off") }
            new Sess(sid, 1, off + got.length)
          }
          val sessions = Array.fill(4)(fullFetch(0L))
          for (_ <- 0 until 5; s <- sessions) {
            val (_, err, _, topics) = decodeFetchResponseFull(12,
              exchange(sock, encodeFetchRequest(12, corr, s"c$i", 0, 1, 1 << 20,
                Seq(("fs", Seq((myPart, s.off, 1 << 20)))), s.sid, s.epoch)))
            corr += 1
            if (err == 70) {
              // evicted while live: the protocol recovery is a fresh
              // epoch-0 full fetch, resuming at OUR offset — it must
              // succeed and keep this session's position
              evictions.incrementAndGet()
              val re = fullFetch(s.off)
              s.sid = re.sid; s.epoch = re.epoch; s.off = re.off
            } else {
              assert(err === 0, s"thread $i errored $err")
              val recs = topics.headOption.toSeq
                .flatMap(_._2).filter(_._1 == myPart).flatMap(_._4)
              recs.headOption.foreach { case (base, _) =>
                assert(base === s.off,
                  s"thread $i: records at $base for session offset ${s.off} " +
                    "(cross-session bleed)") }
              s.off += recs.length
              s.epoch += 1
            }
            assert(s.off <= 40L, s"thread $i read past the log end (${s.off})")
          }
        } finally sock.close()
      }
      assert(failures.isEmpty, failures.map(_.toString).mkString("; "))
      // with 96 sessions live against a 64-session cap, evictions of
      // IN-USE sessions are structural — the recovery path really ran
      assert(evictions.get() > 0, "expected FETCH_SESSION_ID_NOT_FOUND churn")
    } finally server.close()
  }
}
