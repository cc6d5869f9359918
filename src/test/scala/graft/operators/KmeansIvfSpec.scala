package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The learned k-means IVF codebook: recovers planted clusters,
  * produces bit-identical centroids across runs and partitionings
  * (decimal-routed means), and the top-k query retrieves from the
  * right cell. */
class KmeansIvfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 120 vectors in 3 well-separated clusters along distinct axes;
    * deterministic 'noise' from the index. */
  lazy val dir: String = {
    val d = Files.createTempDirectory("graft-kmeans").toString
    val vecs = (0L until 120L).map { i =>
      val cluster = (i % 3).toInt
      val base = Array.fill(64)(0.0f)
      base(cluster * 20) = 10.0f
      base((cluster * 20 + 1) % 64) = 5.0f
      // small deterministic perturbation, different per vector
      base((i % 7 + 40).toInt) += (i % 5).toFloat * 0.1f
      (i, base.toSeq, cluster)
    }
    vecs.toDF("vec_id", "embedding", "label")
      .repartition(8).write.parquet(s"$d/embeddings.parquet")
    d
  }

  private def emb = graft.Tables.t(spark, dir, "embeddings")
    .select(col("vec_id"), col("label"),
      graft.functions.VectorFunctions.toDoubleVec(col("embedding")).as("v"))
    .withColumn("n", graft.functions.VectorFunctions.l2Norm(col("v")))

  test("training recovers the planted clusters") {
    // nCells=3 → stride ceil(120/3)=40 → initial centroids at vec_ids 0, 40, 80
    val cb = Similarity.trainKmeansCodebook(emb, iterations = 3, nCells = 3)
    assert(cb.ids.length === 3)
    val assigned = emb
      .withColumn("cell", graft.functions.GraftExpressions.argMaxCell(col("v"), col("n"), cb))
      .select("label", "cell").collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    // every label maps to exactly one cell, and the three cells differ
    val cellsPerLabel = assigned.groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).distinct }
    assert(cellsPerLabel.values.forall(_.length == 1),
      s"a cluster split across cells: $cellsPerLabel")
    assert(cellsPerLabel.values.flatten.toSeq.distinct.length === 3,
      "clusters collapsed into one cell")
    // learned centroid dominates on its cluster's axis
    cb.vecs.foreach { v =>
      val top = v.indices.maxBy(v)
      assert(Set(0, 20, 40).contains(top), s"unexpected dominant axis $top")
    }
  }

  test("training is bit-deterministic across runs and partitionings") {
    val cb1 = Similarity.trainKmeansCodebook(emb, iterations = 3, nCells = 3)
    val cb2 = Similarity.trainKmeansCodebook(emb.repartition(3), iterations = 3, nCells = 3)
    assert(cb1.ids.toSeq === cb2.ids.toSeq)
    (cb1.vecs, cb2.vecs).zipped.foreach((a, b) => assert(a.toSeq === b.toSeq))
    assert(cb1.norms.toSeq === cb2.norms.toSeq)
  }

  test("codebook save/load round-trips bit-identically and assigns identically") {
    import graft.functions.CellCodebook
    val cb = Similarity.trainKmeansCodebook(emb, iterations = 3, nCells = 3)
    val path = s"$dir/_codebook.json"
    CellCodebook.save(cb, path)
    val loaded = CellCodebook.load(path)
    assert(loaded.ids.toSeq === cb.ids.toSeq)
    (loaded.vecs, cb.vecs).zipped.foreach { (a, b) =>
      assert(a.length === b.length)
      a.indices.foreach(i =>
        assert(java.lang.Double.doubleToLongBits(a(i)) ===
          java.lang.Double.doubleToLongBits(b(i)), s"vec bits differ at $i"))
    }
    assert(loaded.norms.map(java.lang.Double.doubleToLongBits).toSeq ===
      cb.norms.map(java.lang.Double.doubleToLongBits).toSeq)
    // assignment through the loaded codebook is indistinguishable
    val a1 = emb.withColumn("cell",
      graft.functions.GraftExpressions.argMaxCell(col("v"), col("n"), cb))
      .select("vec_id", "cell").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val a2 = emb.withColumn("cell",
      graft.functions.GraftExpressions.argMaxCell(col("v"), col("n"), loaded))
      .select("vec_id", "cell").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a1 === a2)
    // negative norms/subnormals can't sneak through the hex codec
    val tricky = CellCodebook(Array(0L), Array(Array(-0.0, Double.MinPositiveValue,
      -1.7976931348623157e308, 3.141592653589793)), Array(-0.0))
    CellCodebook.save(tricky, path)
    val back = CellCodebook.load(path)
    back.vecs(0).indices.foreach(i =>
      assert(java.lang.Double.doubleToLongBits(back.vecs(0)(i)) ===
        java.lang.Double.doubleToLongBits(tricky.vecs(0)(i))))
  }

  test("codebook size stays constant as the corpus grows") {
    // the IVF contract: the driver-side collect, the broadcast
    // codebook, and the k-means update matrix are bounded by nCells
    // at EVERY corpus size — the sampling stride grows instead.
    def corpus(n: Long) = {
      val rows = (0L until n).map { i =>
        val v = Array.tabulate(64)(d => ((i * 31 + d * 7) % 13).toDouble - 6.0)
        (i, v.toSeq)
      }
      rows.toDF("vec_id", "v")
        .withColumn("n", graft.functions.VectorFunctions.l2Norm(col("v")))
    }
    val sizes = Seq(100L, 1000L, 4000L).map { n =>
      n -> Similarity.trainKmeansCodebook(corpus(n), iterations = 1).ids.length
    }
    assert(sizes.forall(_._2 <= Similarity.ivfCells),
      s"codebook exceeded the fixed cell budget: $sizes")
    // 40× more vectors, same codebook (stride rounding may shave a
    // cell at tiny n, but size is flat once n >> C — never linear)
    assert(sizes.toMap.apply(4000L) === sizes.toMap.apply(1000L))
    // the default-cell sampler in annIvfTopk obeys the same bound
    assert(Similarity.ivfStride(99L) === math.ceil(100.0 / Similarity.ivfCells).toLong)
    assert((0L until 4000L).count(_ % Similarity.ivfStride(3999L) == 0) <= Similarity.ivfCells)
  }

  test("the topk query retrieves same-cluster neighbors") {
    val r = Similarity.annIvfKmeansTopk(spark, dir).collect()
    assert(r.nonEmpty)
    // qids 0..4 are clusters 0,1,2,0,1; rank-1 neighbors share the cluster
    r.filter(_.getAs[Long]("rank") == 1L).foreach { row =>
      val qid = row.getAs[Long]("qid")
      val nn = row.getAs[Long]("vec_id")
      assert(nn % 3 === qid % 3, s"qid $qid rank-1 neighbor $nn from wrong cluster")
    }
  }
}
