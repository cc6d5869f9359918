package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Product-quantization ANN: the compressed-domain search contract —
  * determinism, bounded codebook, and useful recall against the exact
  * brute-force baseline. The bit-level oracle lives in the driver's
  * DuckDB gate (ann_pq_topk); this spec covers what SQL can't. */
class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("PQ top-k is deterministic and shaped (qid, rank, vec_id, adc_dist)") {
    val a = Similarity.annPqTopk(spark, dir).collect()
    val b = Similarity.annPqTopk(spark, dir).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    assert(a.length === 15, "5 queries x top-3")
    val byQ = a.groupBy(_.getLong(0))
    assert(byQ.keySet === Set(0L, 1L, 2L, 3L, 4L))
    byQ.values.foreach { rows =>
      assert(rows.map(_.getLong(1)).sorted.toSeq === Seq(1L, 2L, 3L))
      // ADC distances are non-negative and ranked ascending
      val dists = rows.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(dists.forall(_ >= 0.0))
      assert(dists.sorted.toSeq === dists.toSeq)
    }
    // a query never returns itself
    assert(a.forall(r => r.getLong(0) != r.getLong(2)))
  }

  test("PQ ranks by actual proximity, not noise") {
    // PQ is lossy by design — on the near-random test embeddings a
    // 4x16-code index has high distortion, so exact-top-3 recall is
    // not the contract. The contract is that the compressed-domain
    // ranking tracks TRUE proximity: the true cosine of PQ's picks
    // must beat the all-pairs average decisively.
    import graft.functions.VectorFunctions._
    val e = graft.Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val allPairs = e.filter(col("vec_id") >= 5).crossJoin(q)
      .select(cosine(col("qv"), col("v")).as("cos"))
      .agg(avg("cos")).head.getDouble(0)
    val pqPairs = Similarity.annPqTopk(spark, dir)
      .join(e, "vec_id").join(q, "qid")
      .select(cosine(col("qv"), col("v")).as("cos"))
      .agg(avg("cos")).head.getDouble(0)
    assert(pqPairs > allPairs + 0.1,
      s"PQ picks (mean true cos $pqPairs) must beat the corpus mean ($allPairs)")
  }

  test("IVF-PQ is deterministic, probes prune, and residual ranking tracks proximity") {
    import graft.functions.VectorFunctions._
    val a = Similarity.annIvfPqTopk(spark, dir).collect()
    val b = Similarity.annIvfPqTopk(spark, dir).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    assert(a.length === 15, "5 queries x top-3")
    // every candidate came from a probed cell: at nprobe=2 and 16
    // cells, each query's results span at most 2 distinct cells
    a.groupBy(_.getLong(0)).values.foreach { rows =>
      assert(rows.map(_.getLong(4)).distinct.length <= 2)
    }
    // residual ranking beats the corpus-mean true cosine, like PQ
    val e = graft.Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val allPairs = e.filter(col("vec_id") >= 5).crossJoin(q)
      .select(cosine(col("qv"), col("v")).as("cos"))
      .agg(avg("cos")).head.getDouble(0)
    val picks = Similarity.annIvfPqTopk(spark, dir)
      .join(e, "vec_id").join(q, "qid")
      .select(cosine(col("qv"), col("v")).as("cos"))
      .agg(avg("cos")).head.getDouble(0)
    assert(picks > allPairs + 0.1,
      s"IVF-PQ picks (mean true cos $picks) must beat the corpus mean ($allPairs)")
  }

  test("the code relation is M codes per vector from a bounded codebook") {
    import graft.functions.VectorFunctions._
    assert(Similarity.pqSubspaces * Similarity.pqSubDim === 64,
      "subspace geometry must tile the 64-dim embeddings exactly")
    // build the encode path's actual relations and assert the
    // contract directly: exactly one code per (vector, subspace),
    // every code drawn from the ≤16-entry stride-sampled codebook
    val e = graft.Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
    val maxId = e.agg(max("vec_id")).head.getLong(0)
    val stride = Similarity.ivfStride(maxId)
    val sub = spark.range(Similarity.pqSubspaces)
      .select(col("id").cast("int").as("m"))
    val cb = Similarity.pqSubCodebook(sub,
      e.filter(col("vec_id") % stride === 0)
        .select(col("vec_id").as("code"), col("v")))
    assert(cb.count() <= Similarity.ivfCells * Similarity.pqSubspaces,
      "sub-codebook stays within the cell budget x subspaces")
    val corpus = e.filter(col("vec_id") >= 5)
    val codes = Similarity.pqEncodeCodes(
      corpus.crossJoin(sub).select(col("vec_id"), col("m"),
        slice(col("v"), col("m") * Similarity.pqSubDim + 1,
          lit(Similarity.pqSubDim)).as("vs")),
      cb, keep = Seq("vec_id"))
    val nCorpus = corpus.count()
    assert(codes.count() === nCorpus * Similarity.pqSubspaces,
      "exactly M codes per encoded vector")
    assert(codes.groupBy("vec_id", "m").count()
      .filter(col("count") > 1).count() === 0, "one code per (vector, m)")
    assert(codes.select("code").distinct().count() <= Similarity.ivfCells,
      "codes drawn from the bounded codebook")
  }
}
