package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Planted-fixture semantics for the round-15 operators: the oracle
  * parity run proves cross-engine agreement; these prove the
  * operators compute the RIGHT thing on inputs whose answers are
  * known in closed form — here the streaming dedup-against-index
  * pair restriction, verdict directions, and cross-batch
  * accumulation.
  */
class Round15OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---------------------------------------------------------------
  // stream_exec_dedup_index

  /** Historical docs 1 ("alpha…") and 2 ("beta…"); 30 arrivals
    * (doc_id ≡ 4 mod 5): even i replays doc 1's text VERBATIM
    * (exact near-dup → drop, and its candidate count must be exactly
    * 1 — doc 1 — even though all 15 even arrivals are near-dups of
    * each other: arrival–arrival pairs must NOT count); odd i is a
    * unique 4-word text sharing no gram with anything (keep, zero
    * candidates). 30 arrivals at the 25-record trigger floor forces
    * a 2-batch drain, so verdicts provably accumulate across
    * micro-batches. */
  lazy val dedupIdxDir: String = {
    val d = Files.createTempDirectory("graft-r15-sdi").toString
    val textA = "alpha beta gamma delta epsilon zeta eta theta"
    val textB = "iota kappa lambda mu nu xi omicron pi rho"
    val hist = Seq((1L, textA), (2L, textB))
    val arrivals = (0 until 30).map { i =>
      val id = 4L + 5L * i
      val text = if (i % 2 == 0) textA else s"u${i}a u${i}b u${i}c u${i}d"
      (id, text)
    }
    (hist ++ arrivals).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("stream_exec_dedup_index: verdicts, pair restriction, multi-batch") {
    val rows = Streams.streamExecDedupIndex(spark, dedupIdxDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_candidates"), r.getAs[Double]("best_jaccard"),
          r.getAs[Boolean]("keep")))).toMap
    assert(rows.size === 30, "every arrival with >=1 shingle gets a verdict")
    for (i <- 0 until 30) {
      val id = 4L + 5L * i
      if (i % 2 == 0)
        // exact replay of historical doc 1: candidates = {doc 1}
        // ONLY — the 14 other identical ARRIVALS share every band
        // key but must not appear as candidates
        assert(rows(id) === ((1L, 1.0, false)),
          s"arrival $id must drop against exactly one historical doc")
      else
        assert(rows(id) === ((0L, 0.0, true)),
          s"unique arrival $id must keep with zero candidates")
    }
  }

  test("stream_exec_dedup_index: historical docs never get verdicts") {
    val ids = Streams.streamExecDedupIndex(spark, dedupIdxDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.forall(_ % 5 == 4),
      "only the arrivals slice flows through the topic drain")
  }
}
