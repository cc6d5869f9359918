package graft.streaming

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ChunkEvent, ChunkState, Streams}

/** PROPERTY check for the custom-state determinism claim: folding a
  * user's event sequence through `Streams.chunkFold` in ARBITRARY
  * prefix-respecting batch splits (state carried between calls via
  * Spark's own TestGroupState) must emit exactly the chunks of the
  * whole-sequence closed form — the batch-boundary independence the
  * streaming gate relies on, exercised over hundreds of random
  * sequences × random splits instead of one planted fixture. Within
  * each batch the events are SHUFFLED before the call (Spark
  * guarantees no iterator order; the fold must sort). Seeded. */
class ChunkFoldPropertySpec extends AnyFunSuite {

  private val gen = for {
    n <- Gen.choose(0, 40)
    // ts values collide on purpose — the event_id tiebreak is part
    // of the order contract
    ts <- Gen.listOfN(n, Gen.choose(0L, 20L))
    splits <- Gen.listOf(Gen.choose(1, 7))
    seed <- Gen.choose(0L, Long.MaxValue)
  } yield (ts.zipWithIndex.map { case (t, i) => (t, i.toLong) }, splits, seed)

  test("chunkFold: arbitrary batch splits emit the whole-sequence chunks") {
    val prop = Prop.forAll(gen) { case (pairs, splits, shuffleSeed) =>
      val ordered = pairs.sorted.zipWithIndex.map {
        case ((ts, id), i) => ChunkEvent(7L, ts, id, (i + 1).toLong)
      }
      val cap = Streams.ChunkCap.toInt
      val expected = ordered.grouped(cap).zipWithIndex
        .filter(_._1.length == cap)
        .map { case (g, idx) =>
          (7L, idx.toLong, cap.toLong, g.head.ts_us, g.last.ts_us,
            g.map(_.k).sum)
        }.toList
      val rnd = new scala.util.Random(shuffleSeed)
      var state: Option[ChunkState] = None
      val out = scala.collection.mutable.ArrayBuffer.empty[
        (Long, Long, Long, Long, Long, Long)]
      var rest = ordered
      var sizes = splits
      while (rest.nonEmpty) {
        val sz = sizes.headOption.getOrElse(rest.length)
        sizes = if (sizes.isEmpty) Nil else sizes.tail :+ sz
        val (batch, tail) = rest.splitAt(sz)
        rest = tail
        val gs = TestGroupState.create[ChunkState](
          state.map(Optional.of[ChunkState]).getOrElse(
            Optional.empty[ChunkState]),
          GroupStateTimeout.NoTimeout, 0L,
          Optional.empty[Long],
          false)
        val emitted = Streams.chunkFold(7L, rnd.shuffle(batch).iterator, gs)
        emitted.foreach(r => out += ((r.user_id, r.chunk_idx, r.n_events,
          r.start_us, r.end_us, r.sum_k)))
        state = if (gs.exists) Some(gs.get) else None
      }
      out.toList == expected
    }
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(300)
        .withInitialSeed(org.scalacheck.rng.Seed(42L)),
      prop)
    assert(res.passed, s"chunkFold property: $res")
  }
}
