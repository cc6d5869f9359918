package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Dedup.SimhashBlocking

/** The adaptive Manku-style simhash blocking: structural recall at
  * every block count, bit-identity with the legacy 4×16 chunk layout,
  * and the corpus-tracking block-count derivation. */
class SimhashBlockingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("blocks partition the 64 bits; tables are the (B-3)-subsets") {
    for (b <- 4 to 8) {
      val bl = SimhashBlocking(b)
      assert(bl.sizes.sum === 64)
      assert(bl.sizes.max - bl.sizes.min <= 1)
      assert(bl.offsets.head === 0)
      assert(bl.offsets === bl.sizes.scanLeft(0)(_ + _).init)
      // C(B, B-3) tables, each of B-3 distinct blocks
      def c(n: Int, k: Int): Int =
        (1 to k).foldLeft(1L)((a, i) => a * (n - i + 1) / i).toInt
      assert(bl.tables.size === c(b, b - 3))
      assert(bl.tables.forall(t => t.size == b - 3 && t.distinct.size == t.size))
      assert(bl.tables.distinct.size === bl.tables.size)
      assert(bl.minKeyBits === bl.sizes.sorted.take(b - 3).sum)
    }
  }

  test("forCorpus widens the keys as the corpus grows, 4 blocks at test SF") {
    assert(SimhashBlocking.forCorpus(500).nBlocks === 4)
    assert(SimhashBlocking.forCorpus(5000).nBlocks === 4)
    assert(SimhashBlocking.forCorpus(8191).nBlocks === 4)
    assert(SimhashBlocking.forCorpus(8192).nBlocks === 5)
    assert(SimhashBlocking.forCorpus(50000).nBlocks === 5)
    assert(SimhashBlocking.forCorpus(4L * 1000 * 1000).nBlocks === 6)
    assert(SimhashBlocking.forCorpus(800L * 1000 * 1000).nBlocks === 7)
    assert(SimhashBlocking.forCorpus(1L << 33).nBlocks === 8)
    // the contract: expected random collisions T·n²/2^w ≤ n
    for (n <- Seq(100L, 10000L, 1000000L, 100000000L, 10000000000L)) {
      val bl = SimhashBlocking.forCorpus(n)
      assert(BigInt(bl.tables.size) * n <= (BigInt(1) << bl.minKeyBits),
        s"n=$n blocks=${bl.nBlocks}")
    }
  }

  test("B=4 reproduces the legacy 16-bit chunk keys bit-for-bit") {
    val bl = SimhashBlocking(4)
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val h = rng.nextLong()
      for (t <- 0 until 4)
        assert(bl.keyOf(h, bl.tables(t)) === ((h >>> (16 * t)) & 0xFFFFL),
          s"h=$h table=$t")
    }
  }

  test("Column key arithmetic equals the plain-Long key") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val hashes = Seq.fill(64)(rng.nextLong()) :+ -1L :+ 0L :+ Long.MinValue
    val df = hashes.toDF("simhash")
    for (b <- Seq(4, 5, 7, 8)) {
      val bl = SimhashBlocking(b)
      for (tbl <- Seq(bl.tables.head, bl.tables.last)) {
        val got = df.select(org.apache.spark.sql.functions.col("simhash"),
          bl.keyCol(org.apache.spark.sql.functions.col("simhash"), tbl).as("k"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        for (h <- hashes) assert(got(h) === bl.keyOf(h, tbl), s"b=$b h=$h")
      }
    }
  }

  test("recall is structural: every hamming<=3 pair shares a table key at every B") {
    val rng = new scala.util.Random(23)
    for (b <- 4 to 8) {
      val bl = SimhashBlocking(b)
      for (_ <- 1 to 300) {
        val h1 = rng.nextLong()
        val flips = rng.nextInt(4) // 0..3 dirty bits
        val h2 = (1 to flips).foldLeft(h1)((h, _) => h ^ (1L << rng.nextInt(64)))
        val shared = bl.tables.exists(t => bl.keyOf(h1, t) == bl.keyOf(h2, t))
        assert(shared, s"b=$b h1=$h1 h2=$h2 hamming<=${flips}")
      }
    }
  }

  test("near-dup verdicts are blocking-independent on real docs") {
    val dir = "/root/testdata/sf0.001"
    val docs = Dedup.simhashDocs(spark, dir)
    def nearDups(b: Int): Set[Long] =
      Dedup.dedupSimhashAt(docs, SimhashBlocking(b))
        .filter("is_near_dup").select("doc_id")
        .collect().map(_.getLong(0)).toSet
    val at4 = nearDups(4)
    // wider keys admit FEWER random candidates but, by the pigeonhole
    // guarantee, never lose a hamming<=3 pair — the verdict set is
    // identical at every block count
    assert(nearDups(6) === at4)
    assert(nearDups(8) === at4)
  }

  test("dedupSimhash at test SF uses 4 blocks and matches the explicit form") {
    val dir = "/root/testdata/sf0.001"
    val viaPublic = Dedup.dedupSimhash(spark, dir).collect().map(_.toSeq)
    val viaExplicit = Dedup.dedupSimhashAt(
      Dedup.simhashDocs(spark, dir), SimhashBlocking(4)).collect().map(_.toSeq)
    assert(viaPublic.toSeq === viaExplicit.toSeq)
    GraftCaches.releaseAll()
  }
}
