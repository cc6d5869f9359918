package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The cache contract of the dedup family (VERDICT r4 directive 3):
  * persisted intermediates are REGISTERED (GraftCaches), shared
  * intentionally across queries in a session, and released
  * deterministically — after releaseAll() the session's CacheManager
  * holds nothing, so a long-lived session (WireServer + periodic
  * analytics) accumulates zero storage-memory pressure. */
class CacheHygieneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("dedup caches register, share, and release deterministically") {
    GraftCaches.releaseAll() // a clean slate regardless of suite order
    assert(spark.sharedState.cacheManager.isEmpty,
      "expected an empty CacheManager before the run")

    Dedup.dedupNgramJaccard(spark, dir).count()
    Dedup.dedupMinhashLsh(spark, dir).count()
    Dedup.dedupSimhash(spark, dir).count()
    assert(!spark.sharedState.cacheManager.isEmpty,
      "the shared intermediates should be cached while registered")

    // cluster_cc REUSES jaccard's posting cache (the intentional
    // share): the registry must hand back the same persisted frame,
    // not build a second one
    val before = GraftCaches.releaseAll()
    assert(before === 3, s"expected 3 registered caches, got $before")
    Dedup.dedupNgramJaccard(spark, dir).count()
    Dedup.dedupClusterCC(spark, dir).count()
    val shared = GraftCaches.releaseAll()
    assert(shared === 1,
      s"cluster_cc should reuse jaccard's posting cache, got $shared entries")

    // after release: nothing pinned anywhere (the CC loop's own
    // per-round caches already unpersist inside hashMinComponents)
    assert(spark.sharedState.cacheManager.isEmpty,
      "CacheManager must be empty after releaseAll()")
    assert(GraftCaches.releaseAll() === 0)
  }

  test("graph_pagerank pins nothing after it returns (round-11 advice)") {
    GraftCaches.releaseAll()
    // sym/deg persist only for the iteration and unpersist in the
    // try/finally; the registered edge cache releases via the registry
    Similarity.graphPagerank(spark, dir).count()
    GraftCaches.releaseAll()
    assert(spark.sharedState.cacheManager.isEmpty,
      "a pagerank call must not leave relations pinned")
  }
}
