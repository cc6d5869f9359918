package graft.streaming

import java.net.Socket
import java.nio.file.Files
import java.util.concurrent.{Executors, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** KIP-74 fetch long-poll: a caught-up fetch holds until min_bytes
  * of records accumulate or max_wait_ms expires, instead of
  * busy-answering empty — the contract every polling consumer leans
  * on. The wait holds no lock; a wire produce wakes it mid-wait and
  * the records ride back on the SAME held response. */
class FetchLongPollSpec extends AnyFunSuite {
  import KafkaWire._
  lazy val spark = TestSpark.spark

  private def exchange(sock: Socket, request: Array[Byte]): Array[Byte] =
    WireTestClient.exchange(sock, request)

  private def rec(s: String) =
    WireRecordV2(1700000000000L, null, s.getBytes("UTF-8"))

  test("caught-up fetch waits max_wait_ms, answers instantly when data exists") {
    val root = Files.createTempDirectory("graft-longpoll").toString
    val broker = new Broker(spark, root)
    broker.createTopic("lp", 1)
    val server = new WireServer(broker).start()
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      // empty log + min_bytes 1 + max_wait 700 ms -> held ~700 ms
      val t0 = System.nanoTime()
      val (_, empty) = decodeFetchResponse(4, exchange(sock,
        encodeFetchRequest(4, 1, "cli", 700, 1, 1 << 20,
          Seq(("lp", Seq((0, 0L, 1 << 20)))))))
      val heldMs = (System.nanoTime() - t0) / 1000000
      assert(empty.head._2.head._4.isEmpty)
      assert(heldMs >= 600, s"expected ~700 ms hold, got ${heldMs}ms")
      // data present -> no hold even with a long max_wait
      val (_, p) = decodeProduceResponse(3, exchange(sock,
        encodeProduceRequest(3, 2, "cli", null, 1, 30000,
          Seq(("lp", Seq((0, Seq(rec("a")))))))))
      assert(p.head._2.head._2 === 0)
      val t1 = System.nanoTime()
      val (_, served) = decodeFetchResponse(4, exchange(sock,
        encodeFetchRequest(4, 3, "cli", 5000, 1, 1 << 20,
          Seq(("lp", Seq((0, 0L, 1 << 20)))))))
      val fastMs = (System.nanoTime() - t1) / 1000000
      assert(served.head._2.head._4.map(_._2.value.toSeq)
        === Seq("a".getBytes.toSeq))
      assert(fastMs < 2000, s"data was available; held ${fastMs}ms")
      // max_wait 0 with nothing new -> immediate empty (the v0 poll)
      val t2 = System.nanoTime()
      val (_, again) = decodeFetchResponse(4, exchange(sock,
        encodeFetchRequest(4, 4, "cli", 0, 1, 1 << 20,
          Seq(("lp", Seq((1L, 0L, 1 << 20)).map { case (o, _, m) => (0, o, m) })))))
      assert(again.head._2.head._4.isEmpty)
      assert((System.nanoTime() - t2) / 1000000 < 500)
    } finally { sock.close(); server.close() }
  }

  test("error answers complete immediately — no max_wait park") {
    val root = Files.createTempDirectory("graft-longpoll-err").toString
    val broker = new Broker(spark, root)
    broker.createTopic("lpe", 1)
    val server = new WireServer(broker).start()
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      // unknown topic: the 3 answers now, not after 8 s
      val t0 = System.nanoTime()
      val (_, unknown) = decodeFetchResponse(4, exchange(sock,
        encodeFetchRequest(4, 1, "cli", 8000, 1, 1 << 20,
          Seq(("ghost", Seq((0, 0L, 1 << 20)))))))
      assert(unknown.head._2.head._2 === 3)
      assert((System.nanoTime() - t0) / 1000000 < 2000)
      // offset past the end: OFFSET_OUT_OF_RANGE 1, immediately
      val t1 = System.nanoTime()
      val (_, oor) = decodeFetchResponse(4, exchange(sock,
        encodeFetchRequest(4, 2, "cli", 8000, 1, 1 << 20,
          Seq(("lpe", Seq((0, 99L, 1 << 20)))))))
      assert(oor.head._2.head._2 === 1)
      assert((System.nanoTime() - t1) / 1000000 < 2000)
      // ShareFetch against an unknown topic: same immediacy
      val t2 = System.nanoTime()
      val (_, serr, _, stopics) = decodeShareFetchResponse(exchange(sock,
        encodeShareFetchRequest(3, "cli", "sg-e", "m1", 0,
          Seq(("ghost", Seq(ShareFetchPartition(0, 1 << 20, Seq.empty)))),
          maxWaitMs = 8000)))
      assert(serr === 0 && stopics.head._2.head.errorCode === 100)
      assert((System.nanoTime() - t2) / 1000000 < 2000)
    } finally { sock.close(); server.close() }
  }

  test("a produce mid-wait wakes the held fetch with the new records") {
    val root = Files.createTempDirectory("graft-longpoll2").toString
    val broker = new Broker(spark, root)
    broker.createTopic("lp2", 1)
    val server = new WireServer(broker).start()
    val waiter = new Socket("127.0.0.1", server.boundPort)
    val producer = new Socket("127.0.0.1", server.boundPort)
    val pool = Executors.newSingleThreadExecutor()
    try {
      val t0 = System.nanoTime()
      val pending = pool.submit(new java.util.concurrent.Callable[Array[Byte]] {
        override def call(): Array[Byte] = exchange(waiter,
          encodeFetchRequest(4, 1, "cli", 8000, 1, 1 << 20,
            Seq(("lp2", Seq((0, 0L, 1 << 20))))))
      })
      Thread.sleep(600) // the fetch is now parked server-side
      assert(!pending.isDone)
      val (_, p) = decodeProduceResponse(3, exchange(producer,
        encodeProduceRequest(3, 2, "prod", null, 1, 30000,
          Seq(("lp2", Seq((0, Seq(rec("wake")))))))))
      assert(p.head._2.head._2 === 0)
      val resp = pending.get(5, TimeUnit.SECONDS)
      val heldMs = (System.nanoTime() - t0) / 1000000
      val (_, topics) = decodeFetchResponse(4, resp)
      assert(topics.head._2.head._4.map(_._2.value.toSeq)
        === Seq("wake".getBytes.toSeq))
      // woken by the produce, NOT the 8 s deadline
      assert(heldMs < 6000, s"fetch waited ${heldMs}ms — deadline, not wakeup")
      assert(heldMs >= 550, s"fetch answered in ${heldMs}ms — never parked")
    } finally {
      pool.shutdownNow(); waiter.close(); producer.close(); server.close()
    }
  }

  test("ShareFetch parks when nothing is acquirable and wakes on produce") {
    val root = Files.createTempDirectory("graft-longpoll3").toString
    val broker = new Broker(spark, root)
    broker.createTopic("lp3", 1)
    val server = new WireServer(broker).start()
    val waiter = new Socket("127.0.0.1", server.boundPort)
    val producer = new Socket("127.0.0.1", server.boundPort)
    val pool = Executors.newSingleThreadExecutor()
    try {
      val t0 = System.nanoTime()
      val pending = pool.submit(new java.util.concurrent.Callable[Array[Byte]] {
        override def call(): Array[Byte] = exchange(waiter,
          encodeShareFetchRequest(1, "cli", "sg-lp", "m1", 0,
            Seq(("lp3", Seq(ShareFetchPartition(0, 1 << 20, Seq.empty)))),
            maxWaitMs = 8000))
      })
      Thread.sleep(600)
      assert(!pending.isDone)
      val (_, p) = decodeProduceResponse(3, exchange(producer,
        encodeProduceRequest(3, 2, "prod", null, 1, 30000,
          Seq(("lp3", Seq((0, Seq(rec("share-wake")))))))))
      assert(p.head._2.head._2 === 0)
      val (_, err, _, topics) =
        decodeShareFetchResponse(pending.get(5, TimeUnit.SECONDS))
      val heldMs = (System.nanoTime() - t0) / 1000000
      assert(err === 0)
      assert(topics.head._2.head.records.map(_._2.value.toSeq)
        === Seq("share-wake".getBytes.toSeq))
      assert(heldMs < 6000 && heldMs >= 550,
        s"share fetch held ${heldMs}ms — expected a produce wakeup")
    } finally {
      pool.shutdownNow(); waiter.close(); producer.close(); server.close()
    }
  }
}
