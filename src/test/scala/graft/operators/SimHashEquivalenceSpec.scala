package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SimHashEquivalenceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("SimHash64Expr equals the explode + majority-vote formulation on real docs") {
    val dir = "/root/testdata/sf0.001"
    val fast = Dedup.simhashDocs(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val slow = Dedup.simhashDocsExploded(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast.size === 500)
    assert(fast === slow)
  }
}
