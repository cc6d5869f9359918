package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.Dedup

/** ≥50× linearity evidence for the top shuffle shapes (round 12,
  * verdict directive 5). The 100-TB story was extrapolated from the
  * 10× gate; this probe re-measures the same VOLUME claims at
  * `SPARK_GRAFT_SCALE` (default 50) replicas of the sf0.1
  * docs/embeddings corpus — the shapes whose map-side volume must
  * track n exactly and whose candidate/reduce sides must track the
  * replicated dup mass (~n), never n²:
  *
  *  - minhash gram table: distinct (doc, gram-hash) rows — the one
  *    corpus-sized shuffle of dedup_minhash_lsh;
  *  - minhash LSH candidate pairs: Σ n_candidates / 2 over the FULL
  *    operator — band buckets must not go quadratic as 50× replicas
  *    share no grams;
  *  - embedding-cc blocked pair rows (the hamming-≤1 LSH candidate
  *    set feeding the CC loop);
  *  - novelty gram table (word-8-gram distinct (doc, hash) rows) and
  *    its first-seen reduce side (distinct grams);
  *  - pagerank edge table + per-round (node, rank) shuffle rows.
  *
  * Replica construction: documents = ScaleBench's (replica k > 0
  * prefixes every word with "z<k>q", so replicas share NO word-grams
  * and the base corpus's dup structure replicates N×). Embeddings
  * DIVERGE from ScaleBench's additive drift here, deliberately: the
  * +0.013k element shift grows with k, and by k ≈ 50 every vector is
  * dominated by its all-ones component — the corpus genuinely
  * collapses into ONE near-dup cluster and the TRUE pair mass goes
  * quadratic (first measured as a 137,815× pair-row blowup at 50
  * replicas; the round-11 10× run already showed 1,669× edge growth
  * from the same drift). That is a corpus-property change, not a
  * scale-up. The linearity probe instead applies a deterministic
  * per-replica SIGN FLIP per dimension (a diagonal ±1 orthogonal
  * transform): cosines WITHIN a replica are preserved exactly (the
  * base near-dup mass replicates N×), cross-replica vectors
  * decorrelate, and sign-LSH blocking sees N independent shards —
  * the shape a real N×-sharded corpus has. Linear claim: scaled/base
  * within 1.2× of the replica factor.
  *
  * Usage: SPARK_GRAFT_SCALE=50 tools/run.sh graft.tools.Scale100Probe
  *   [outDir=/tmp/graft_sf5x]
  */
object Scale100Probe {
  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = args.headOption.getOrElse("/tmp/graft_sf5x")
    val replicas = sys.env.getOrElse("SPARK_GRAFT_SCALE", "50").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rep = spark.range(replicas).select(col("id").cast("int").as("k"))
    val nDocs = t(spark, baseDir, "documents").count()
    val nVecs = t(spark, baseDir, "embeddings").count()
    t(spark, baseDir, "documents").crossJoin(rep)
      .withColumn("text", when(col("k") === 0, col("text"))
        .otherwise(regexp_replace(col("text"), lit("(^| )"),
          concat(lit("$1z"), col("k"), lit("q")))))
      .withColumn("doc_id", col("doc_id") + col("k").cast("long") * nDocs)
      .withColumn("n_chars", length(col("text")).cast("int"))
      .drop("k")
      .repartition(32).write.mode("overwrite").parquet(s"$out/documents.parquet")
    t(spark, baseDir, "embeddings").crossJoin(rep)
      // geometry-preserving replica transform: flip the sign of
      // dimension i in replica k by the parity of xxhash64(k, i) —
      // a diagonal orthogonal map (see scaladoc)
      .withColumn("embedding", expr(
        "transform(embedding, (x, i) -> CAST(x * (1 - 2 * pmod(xxhash64(k, i), 2)) AS FLOAT))"))
      .withColumn("vec_id", col("vec_id") + col("k").cast("long") * nVecs)
      .drop("k")
      .repartition(32).write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    println(s"scaled corpus: ${replicas}x of $baseDir at $out")

    def report(name: String, base: Double, scaled: Double): Unit = {
      val ratio = scaled / math.max(base, 1.0)
      println(f"probe=$name base=$base%.0f scaled=$scaled%.0f " +
        f"ratio=$ratio%.2f replicas=$replicas linear_dev=${ratio / replicas}%.3f")
    }

    def minhashGramRows(d: String): Long =
      t(spark, d, "documents")
        .select(col("doc_id"),
          explode(graft.functions.GraftExpressions.wordNgrams(
            lower(col("text")), 3)).as("sh"))
        .select(col("doc_id"), xxhash64(col("sh")).as("sh"))
        .distinct().count()
    report("minhash_gram_rows",
      minhashGramRows(baseDir).toDouble, minhashGramRows(out).toDouble)

    def minhashCandPairs(d: String): Double = {
      val r = Dedup.dedupMinhashLsh(spark, d)
        .agg(sum("n_candidates")).collect()(0)
      (if (r.isNullAt(0)) 0L else r.getLong(0)) / 2.0
    }
    report("minhash_lsh_candidate_pairs",
      minhashCandPairs(baseDir), minhashCandPairs(out))

    // embedding-cc: the corpus-INTRINSIC cos≥0.3 pair mass is NOT
    // linear at d=64 (0.3 sits at 2.4σ of the random-cosine noise
    // band, so any N× corpus carries ~0.8%-quadratic true mass; real
    // 768-dim embeddings put 0.3 at 8σ and the mass IS linear). The
    // engine property to probe is therefore BLOCKING EFFICIENCY:
    // LSH candidates within a bounded factor of the true edge mass at
    // every scale — the blocking must pay for what the data contains,
    // never n². Candidates reconstructed with the engine's own
    // signBucket/cosinePlanesFor parameters.
    def ccVolumes(d: String): (Long, Long) = {
      import graft.functions.VectorFunctions.toDoubleVec
      import graft.operators.Similarity
      val base = t(spark, d, "embeddings")
        .select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
      val nPlanes = Dedup.cosinePlanesFor(base.count())
      val e = base.withColumn("bucket", Similarity.signBucket(col("v"), nPlanes))
      val a = e.select(col("vec_id").as("ida"), col("bucket"))
      val flips = array((0 until nPlanes).map(j =>
        col("b2").bitwiseXOR(1 << j)): _*)
      val b = e.select(col("vec_id").as("idb"), col("bucket").as("b2"))
        .withColumn("pb", explode(concat(array(col("b2")),
          filter(flips, f => f > col("b2")))))
      val candidates = a.join(b, col("bucket") === col("pb") &&
          (col("b2") =!= col("bucket") || col("ida") < col("idb"))).count()
      val trueEdges = Dedup.embeddingCosineEdges(spark, d).count()
      (candidates, trueEdges)
    }
    val (candB, edgeB) = ccVolumes(baseDir)
    val (candS, edgeS) = ccVolumes(out)
    report("embedding_cc_true_edges", edgeB.toDouble, edgeS.toDouble)
    report("embedding_cc_candidates", candB.toDouble, candS.toDouble)
    println(f"probe=embedding_cc_blocking_efficiency " +
      f"base_cand_per_edge=${candB.toDouble / math.max(edgeB, 1)}%.2f " +
      f"scaled_cand_per_edge=${candS.toDouble / math.max(edgeS, 1)}%.2f " +
      f"(bounded factor = blocking pays for the data's mass, not n2)")
    // pagerank runs over the same edge relation: per-round shuffle =
    // 2×edges (node, rank)-integer rows exactly — edge-proportional
    // by construction, so its slope equals the true-edge slope above
    report("pagerank_per_round_shuffle_rows", 2.0 * edgeB, 2.0 * edgeS)

    // Round-15 shapes: stream_exec_dedup_index's persisted index and
    // per-drain candidate mass, computed with the operator's OWN
    // shared helpers (gramHashRows / bandedMinhash) so the benched
    // shapes cannot drift. Posting and band rows must track the
    // historical slice linearly; candidate pairs track the corpus's
    // replicated dup structure (~linear — replicas share no grams),
    // never (arrivals × historical).
    def dedupIndexVolumes(d: String): (Long, Long, Long) = {
      val m = graft.operators.Streams.StreamDedupMod
      val res = graft.operators.Streams.StreamDedupRes
      val docs = t(spark, d, "documents")
      val hg = Dedup.gramHashRows(docs.filter(col("doc_id") % m =!= res))
        .persist()
      val posting = hg.count()
      val hband = Dedup.bandedMinhash(hg)
      val bandRows = hband.count()
      val cand = Dedup.bandedMinhash(
          Dedup.gramHashRows(docs.filter(col("doc_id") % m === res)))
        .select(col("doc_id").as("sd"), col("band"), col("bkey"))
        .join(hband.select(col("doc_id").as("hd"), col("band"), col("bkey")),
          Seq("band", "bkey"))
        .select("sd", "hd").distinct().count()
      hg.unpersist()
      (posting, bandRows, cand)
    }
    val (diPostB, diBandB, diCandB) = dedupIndexVolumes(baseDir)
    val (diPostS, diBandS, diCandS) = dedupIndexVolumes(out)
    report("dedup_index_posting_rows", diPostB.toDouble, diPostS.toDouble)
    report("dedup_index_band_rows", diBandB.toDouble, diBandS.toDouble)
    report("dedup_index_candidate_pairs", diCandB.toDouble, diCandS.toDouble)

    def noveltyGrams(d: String): (Long, Long) = {
      val g = Dedup.distinctGramHashes(t(spark, d, "documents"), "doc_id").persist()
      val rows = g.count()
      val vocab = g.select("gk").distinct().count()
      g.unpersist()
      (rows, vocab)
    }
    val (nvB, fvB) = noveltyGrams(baseDir)
    val (nvS, fvS) = noveltyGrams(out)
    report("novelty_gram_rows", nvB.toDouble, nvS.toDouble)
    report("novelty_first_seen_reduce_rows", fvB.toDouble, fvS.toDouble)

    // Round-12 shapes over the replica docs corpus: the frame-hash
    // window volume must track corpus bytes/256 (the replica text
    // injection grows bytes slightly super-replica — compare against
    // the BYTE ratio, not the replica count), and the per-doc reduce
    // tracks doc count exactly.
    def frameVolumes(d: String): (Long, Long, Long) = {
      val bytes = t(spark, d, "documents")
        .agg(sum(length(col("text")))).collect()(0).getLong(0)
      val frames = t(spark, d, "documents")
        .select(ceil(length(col("text")) / lit(256.0)).cast("long").as("f"))
        .agg(sum("f")).collect()(0).getLong(0)
      val docs = t(spark, d, "documents").count()
      (bytes, frames, docs)
    }
    val (byB, frB, dcB) = frameVolumes(baseDir)
    val (byS, frS, dcS) = frameVolumes(out)
    report("frame_hash_rows", frB.toDouble, frS.toDouble)
    println(f"probe=frame_rows_per_byte base=${frB.toDouble / byB}%.6f " +
      f"scaled=${frS.toDouble / byS}%.6f (must be ~equal: frames track bytes)")
    report("frame_dup_reduce_rows(docs)", dcB.toDouble, dcS.toDouble)

    // Round-13 shape: knn_classify's broadcast side must be CONSTANT
    // in n (the round-12 scale-killer was an n-proportional
    // broadcast). The seed is an absolute id cap, so rows AND bytes
    // must not move as the corpus replicates — ratio 1.00, not the
    // replica factor.
    def knnSeed(d: String): (Long, Long) = {
      import graft.functions.VectorFunctions.toDoubleVec
      val seed = t(spark, d, "embeddings")
        .filter(col("vec_id") < graft.operators.Similarity.KnnSeedCap)
        .select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
      val rows = seed.count()
      // bytes as carried by the broadcast struct: 64 doubles + id + label + norm
      (rows, rows * (64L * 8 + 3 * 8))
    }
    val (ksrB, ksbB) = knnSeed(baseDir)
    val (ksrS, ksbS) = knnSeed(out)
    println(f"probe=knn_seed_broadcast base_rows=$ksrB scaled_rows=$ksrS " +
      f"base_bytes=$ksbB scaled_bytes=$ksbS " +
      f"(must be EQUAL at any corpus scale: the seed is an absolute cap)")

    spark.stop()
  }
}
