package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.ShareGroup._

/** KIP-932 share-group (queue) semantics: cooperative record-level
  * consumption with acquisition locks, per-record acks, redelivery,
  * the poison-message delivery budget, SPSO advancement, the bounded
  * in-flight window, and restart durability of the whole state
  * machine. Time is explicit everywhere — every transition is
  * deterministic. */
class ShareGroupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val T0 = 1700000000000L

  private def mkLog(n: Int): TopicLog = {
    val root = Files.createTempDirectory("graft-share").toString
    val log = TopicLog.create(spark, root, "q", 1)
    log.produce((0 until n).toDF("i").select(
      col("i"),
      concat(lit("k"), col("i").cast("string")).cast("binary").as("key"),
      concat(lit("v"), col("i").cast("string")).cast("binary").as("value")),
      Partitioners.byLongKey(1, lit(0L)))
    log
  }

  test("batched mutations land as ONE snapshot; state is identical to unbatched") {
    val log = mkLog(8)
    val sg = new ShareGroup(log, "b")
    def versions(): Seq[Long] = {
      val dir = java.nio.file.Paths.get(log.topicDir, "_share",
        java.util.Base64.getUrlEncoder.withoutPadding
          .encodeToString("b".getBytes("UTF-8")))
      if (!java.nio.file.Files.exists(dir)) Seq.empty
      else TopicLog.listDir(dir).map(_.getFileName.toString)
        .collect { case s if s.startsWith("v") =>
          s.stripPrefix("v").stripSuffix(".json").toLong }.sorted
    }
    // one unit: acquire 4, accept 2, release 1 — ONE new version
    val before = versions().lastOption.getOrElse(0L)
    sg.batched {
      val a = sg.acquire(0, 4, T0, "c")
      sg.acknowledge(0, Seq(a(0).offset -> Accept, a(1).offset -> Accept),
        T0 + 1, "c")
      sg.acknowledge(0, Seq(a(2).offset -> Release), T0 + 2, "c")
    }
    assert(versions().last === before + 1,
      "the whole batched unit must publish exactly one snapshot")
    // the snapshot carries the UNIT's net state: reopen and check
    val re = new ShareGroup(log, "b")
    assert(re.startOffset(0) === 2L) // 0,1 terminal
    val (spso, acq, avail, term) = re.stats(0, T0 + 3)
    assert((spso, acq, avail, term) === ((2L, 1, 1, 0)))
  }

  test("two consumers drain one partition cooperatively, acks advance the SPSO") {
    val log = mkLog(10)
    val sg = new ShareGroup(log, "workers")
    // consumer A and consumer B each acquire a disjoint batch
    val a = sg.acquire(0, 4, T0, "A")
    val b = sg.acquire(0, 4, T0, "B")
    assert(a.map(_.offset) === Seq(0L, 1L, 2L, 3L))
    assert(b.map(_.offset) === Seq(4L, 5L, 6L, 7L))
    assert(a.forall(_.deliveryCount === 1))
    assert(a.forall(_.lockExpiresAt === T0 + sg.acquisitionLockMs))

    // the records carry the data
    val vals = sg.records(0, a.map(_.offset))
      .select(col("value").cast("string")).as[String].collect().sorted
    assert(vals === Array("v0", "v1", "v2", "v3"))

    // acquisition binds to the consumer: B cannot ack A's records
    assert(sg.acknowledge(0, Seq(0L -> Accept), T0 + 5, "B")
      === Seq(0L -> false))

    // A accepts everything: SPSO advances past the contiguous run
    assert(sg.acknowledge(0, a.map(_.offset -> (Accept: AckType)), T0 + 10,
      "A").forall(_._2))
    assert(sg.startOffset(0) === 4L)
    // B accepts 5,6 but not 4: SPSO pinned by the still-acquired 4
    sg.acknowledge(0, Seq(5L -> Accept, 6L -> Accept), T0 + 20, "B")
    assert(sg.startOffset(0) === 4L)
    sg.acknowledge(0, Seq(4L -> Accept), T0 + 30, "B")
    assert(sg.startOffset(0) === 7L)
  }

  test("release redelivers with a bumped count; reject and exhaustion archive") {
    val log = mkLog(3)
    val sg = new ShareGroup(log, "g", maxDeliveryAttempts = 3)
    // release 0 twice: each reacquisition bumps the delivery count
    assert(sg.acquire(0, 1, T0).head === AcquiredRecord(0L, 1, T0 + 30000))
    sg.acknowledge(0, Seq(0L -> Release), T0 + 10)
    assert(sg.acquire(0, 1, T0 + 20).head.deliveryCount === 2)
    sg.acknowledge(0, Seq(0L -> Release), T0 + 30)
    val third = sg.acquire(0, 1, T0 + 40).head
    assert(third === AcquiredRecord(0L, 3, T0 + 40 + 30000))
    // third release exhausts the budget: archived, never redelivered —
    // the next acquire serves offset 1 and the SPSO passes 0
    sg.acknowledge(0, Seq(0L -> Release), T0 + 50)
    val after = sg.acquire(0, 1, T0 + 60)
    assert(after.map(_.offset) === Seq(1L))
    assert(sg.startOffset(0) === 1L)

    // reject archives immediately
    sg.acknowledge(0, Seq(1L -> Reject), T0 + 70)
    assert(sg.startOffset(0) === 2L)

    // acknowledging a non-acquired record fails that offset alone
    val mixed = sg.acknowledge(0,
      Seq(2L -> Accept, 99L -> Accept), T0 + 80)
    assert(mixed === Seq(2L -> false, 99L -> false))
  }

  test("lock expiry returns records to the pool; counts are kept") {
    val log = mkLog(2)
    val sg = new ShareGroup(log, "g", acquisitionLockMs = 1000L)
    val first = sg.acquire(0, 2, T0, "A")
    assert(first.map(_.offset) === Seq(0L, 1L))
    // before expiry nothing is available
    assert(sg.acquire(0, 2, T0 + 999, "B") === Seq.empty)
    // at expiry both return; B reacquires with bumped delivery counts
    val again = sg.acquire(0, 2, T0 + 1000, "B")
    assert(again.map(r => r.offset -> r.deliveryCount) ===
      Seq(0L -> 2, 1L -> 2))
    // A's LATE ack (its lock lapsed, B now holds the record) must
    // fail in-band rather than ack over the new holder
    assert(sg.acknowledge(0, Seq(0L -> Accept), T0 + 1500, "A")
      === Seq(0L -> false))
    // and B's own ack still lands
    assert(sg.acknowledge(0, Seq(0L -> Accept), T0 + 1600, "B")
      === Seq(0L -> true))
    // an ack under a fully lapsed acquisition (no re-acquire) fails too
    assert(sg.acknowledge(0, Seq(1L -> Accept), T0 + 2500, "B")
      === Seq(1L -> false))
  }

  test("the in-flight window bounds acquisition past the SPSO") {
    val log = mkLog(50)
    val sg = new ShareGroup(log, "g", maxInFlightRecords = 5)
    val got = sg.acquire(0, 100, T0)
    assert(got.map(_.offset) === (0L until 5L))
    // acking the head slides the window
    sg.acknowledge(0, Seq(0L -> Accept, 1L -> Accept), T0 + 10)
    assert(sg.acquire(0, 100, T0 + 20).map(_.offset) === Seq(5L, 6L))
  }

  test("drain: at-least-once processing with poison archival") {
    val log = mkLog(9)
    val sg = new ShareGroup(log, "proc", maxDeliveryAttempts = 3)
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    // clean drain: everything processed once, in offset batches
    val n = sg.drain(0, 4, T0, "w") { df =>
      seen ++= df.select(col("value").cast("string"))
        .collect().map(_.getString(0))
    }
    assert(n === 9L)
    assert(seen.sorted === (0 until 9).map(i => s"v$i").sorted)
    assert(sg.startOffset(0) === 9L)

    // poison record: the processor dies on offset 2; retries
    // release+redeliver it until the budget archives it, then the
    // remaining records drain clean (record-at-a-time batches so the
    // poison record carries only its own fate — larger batches share
    // theirs with batch-mates, the documented at-least-once contract)
    val log2 = mkLog(6)
    val sg2 = new ShareGroup(log2, "proc", maxDeliveryAttempts = 3)
    val processed = scala.collection.mutable.ArrayBuffer.empty[Long]
    var t = T0
    var attempts = 0
    var finished = false
    while (!finished && attempts < 10) {
      attempts += 1
      try {
        sg2.drain(0, 1, t, "w") { df =>
          val offs = df.select("offset").collect().map(_.getLong(0))
          if (offs.contains(2L)) sys.error("poison record")
          processed ++= offs
        }
        finished = true
      } catch { case e: RuntimeException if e.getMessage == "poison record" =>
        t += 100 // next retry epoch
      }
    }
    assert(finished, "drain must converge once the poison archives")
    // offset 2 was delivered maxDeliveryAttempts times then archived;
    // every other record processed (2's batch-mates redelivered)
    assert(attempts === 4, "3 poisoned batches + 1 clean pass")
    assert(!processed.contains(2L))
    assert(processed.distinct.sorted === Seq(0L, 1L, 3L, 4L, 5L))
    assert(sg2.startOffset(0) === 6L)
    assert(sg2.stats(0, t + 1000) === ((6L, 0, 0, 0)))
  }

  test("concurrency soak: racing consumers never double-deliver a live lock") {
    val log = mkLog(200)
    val sg = new ShareGroup(log, "race", maxInFlightRecords = 400,
      acquisitionLockMs = 60000L)
    val delivered =
      java.util.Collections.synchronizedList(new java.util.ArrayList[Long]())
    val errors =
      java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    val threads = (0 until 6).map { w =>
      new Thread(() => {
        try {
          // each worker loops acquire→accept under a LIVE lock (no
          // expiry in play): every offset must be delivered exactly
          // once across all workers
          var batch = sg.acquire(0, 7, 1700000000000L, s"w$w")
          while (batch.nonEmpty) {
            batch.foreach(r => delivered.add(r.offset))
            val acks = sg.acknowledge(0,
              batch.map(_.offset -> (Accept: AckType)), 1700000000000L, s"w$w")
            acks.filterNot(_._2).foreach(a =>
              errors.add(s"w$w could not ack its own ${a._1}"))
            batch = sg.acquire(0, 7, 1700000000000L, s"w$w")
          }
        } catch { case e: Throwable => errors.add(s"w$w died: $e") }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(60000))
    assert(errors.isEmpty, errors.toString)
    val seen = delivered.toArray(Array.empty[java.lang.Long]).map(_.toLong)
    assert(seen.length === 200, s"${seen.length} deliveries for 200 records")
    assert(seen.sorted.toSeq === (0L until 200L),
      "every offset delivered exactly once under live locks")
    assert(sg.startOffset(0) === 200L)
    assert(sg.stats(0, 1700000001000L) === ((200L, 0, 0, 0)))
  }

  test("the whole state machine survives reopen: locks, counts, SPSO") {
    val log = mkLog(6)
    val sg = new ShareGroup(log, "durable", acquisitionLockMs = 1000L)
    sg.acknowledge(0, sg.acquire(0, 2, T0).map(_.offset -> (Accept: AckType)),
      T0 + 10) // 0,1 acked
    sg.acquire(0, 1, T0 + 20) // 2 acquired, lock until T0+1020
    sg.acknowledge(0, Seq.empty, T0 + 20)
    val sg2 = new ShareGroup(log, "durable", acquisitionLockMs = 1000L)
    assert(sg2.startOffset(0) === 2L)
    // the lock is still honored after reopen: 2 is NOT redelivered...
    assert(sg2.acquire(0, 1, T0 + 30).map(_.offset) === Seq(3L))
    // ...until its original expiry lapses, count preserved
    val re = sg2.acquire(0, 1, T0 + 1020)
    assert(re === Seq(AcquiredRecord(2L, 2, T0 + 1020 + 1000)))
    // an unrelated group over the same topic starts fresh
    val other = new ShareGroup(log, "other")
    assert(other.acquire(0, 1, T0).map(_.offset) === Seq(0L))
  }
}
