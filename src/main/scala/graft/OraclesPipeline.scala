package graft

/** DuckDB oracle SQL for the §2c/§2d/§2e pipeline queries.
  *
  * Determinism notes:
  *  - integer arithmetic and IEEE double ops in identical order;
  *  - dot products are sequential left folds on BOTH sides
  *    (Spark `aggregate`, DuckDB `list_reduce` with a prepended 0.0);
  *  - hash-based ops cross engines via exact HUGEINT re-derivations
  *    of Spark's xxhash64 (simhash since round 11, minhash-LSH since
  *    round 12); only the genuinely engine-internal/learned/iterative
  *    ops (HLL, k-means IVF, BPE) stay rows-only.
  */
object OraclesPipeline {

  /** whitespace-token count, shared subexpression. */
  private val ws = "(length(text) - length(replace(text, ' ', '')) + 1)"
  private val stopHits =
    "len(list_filter(string_split(text, ' '), w -> w IN ('the','a','of','and','to','in')))"

  private def hits(markers: Seq[String]) =
    s"len(list_filter(string_split(text, ' '), w -> w IN (${markers.map(m => s"'$m'").mkString(",")})))"

  private val enH = hits(Seq("the", "and", "of", "to", "in"))
  private val esH = hits(Seq("el", "la", "de", "que", "y"))
  private val deH = hits(Seq("der", "die", "und", "das", "ist"))
  private val frH = hits(Seq("le", "la", "de", "et", "les"))

  /** Sequential dot product over DOUBLE lists a·b, via DuckDB's
    * native list_dot_product. Verified BIT-IDENTICAL (raw doubles,
    * pre-round) to the interpreted left-fold
    * `list_reduce(list_prepend(0.0, list_transform(...i -> a[i]*b[i])),
    * (acc, x) -> acc + x)` on 44,850 real embedding pairs — both
    * accumulate strictly left-to-right — while running ~1000× faster
    * (the fold's per-element interpreted lambdas made the 10×-corpus
    * candidate joins impractical: 19M pairs × 3 folds ≈ CPU-hours). */
  private def dot(a: String, b: String) =
    s"list_dot_product($a, $b)"

  private def cosR(a: String, b: String) =
    s"round(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})), 6)"

  private val embDouble =
    "SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings"

  /** Arithmetic-hyperplane sign bucket over `np` planes (the same ±1
    * pattern Similarity.arithmeticHyperplanes generates; d is 1-based
    * here). `np` is a SQL expression so callers can parameterize the
    * plane count from the data (dedup) or pin it (LSH top-k). */
  private def signBucketNp(np: String) =
    s"""SELECT vec_id, v,
      |  CAST(list_sum(list_transform(generate_series(0, ($np) - 1), j ->
      |    CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |        list_transform(generate_series(1, 64), d ->
      |          v[d] * (CASE WHEN ((j*73 + (d-1)*37) % 97) % 2 = 0
      |                  THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END))),
      |        (acc, x) -> acc + x) >= 0
      |      THEN 1 << j ELSE 0 END)) AS INT) AS bucket""".stripMargin

  /** 8-plane variant shared by the fixed-plane LSH queries. */
  private val signBucket = signBucketNp("8")

  /** The embedding-cosine near-dup candidate CTE chain (adaptive
    * plane count, hamming-≤1 multiprobe, exact left-fold cosine) —
    * shared by the pair query and its connected-components closure. */
  private lazy val embCosinePairsCtes: String =
    s"""e AS ($embDouble),
       |np AS (SELECT GREATEST(8, LEAST(24, length(bin(count(*))) - 4)) AS n FROM e),
       |b AS (${signBucketNp("SELECT n FROM np")} FROM e),
       |p AS (SELECT vec_id, v,
       |  unnest(list_concat([bucket],
       |    list_transform(generate_series(0, (SELECT n FROM np) - 1),
       |      j -> xor(bucket, 1 << j)))) AS pb
       |  FROM b),
       |s AS (SELECT a.vec_id AS v1, p.vec_id AS v2, ${cosR("a.v", "p.v")} AS cos_sim
       |      FROM b a JOIN p ON a.bucket = p.pb AND a.vec_id < p.vec_id)""".stripMargin

  private val grams3 =
    """SELECT doc_id, lang, n_chars // 10 AS bucket,
      |  list_distinct(list_transform(generate_series(1, len(w) - 2),
      |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS grams
      |FROM (SELECT *, string_split(text, ' ') AS w FROM documents)
      |WHERE len(w) >= 3""".stripMargin

  private val fp =
    """list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(generate_series(1, length(lower(trim(text)))),
      |        i -> CAST(ascii(substr(lower(trim(text)), i, 1)) AS BIGINT))),
      |    (acc, x) -> (acc * 31 + x) % 1000000007)""".stripMargin


  /** Hybrid BM25 ⊕ vector RRF: both branch top-20s restated (the
    * text_bm25_topk BM25 recipe per query over the doc_id ≥ 5 corpus;
    * the ann_bruteforce cosine over the vec_id ≥ 5 corpus), fused by
    * 1/(60+rank) — integer ranks through one exact double division
    * per branch, so the fusion agrees bit-for-bit. The term lists are
    * the engine's constants; every scoring step is re-derived here. */
  private val annHybridSql: String = {
    val qs = graft.operators.Similarity.hybridQueries
    val dfCols = qs.flatMap { case (q, ts) => ts.zipWithIndex.map { case (t, i) =>
      s"CAST(SUM(CASE WHEN list_contains(toks, '$t') THEN 1 ELSE 0 END) AS DOUBLE) AS df_${q}_$i"
    } }.mkString(",\n    ")
    val tfCols = qs.flatMap { case (q, ts) => ts.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE) AS tf_${q}_$i"
    } }.mkString(",\n    ")
    def score(q: Long, nTerms: Int) = (0 until nTerms).map { i =>
      s"round(ln((n_docs - df_${q}_$i + 0.5) / (df_${q}_$i + 0.5) + 1.0), 4)" +
        s" * (tf_${q}_$i * 2.2) / (tf_${q}_$i + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))"
    }.mkString("\n      + ")
    val lexLegs = qs.map { case (q, ts) =>
      s"SELECT CAST($q AS BIGINT) AS qid, doc_id,\n      ${score(q, ts.length)} AS lex_score FROM tf, st"
    }.mkString("\n  UNION ALL ")
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
       |           FROM documents WHERE doc_id >= 5),
       |dl AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM d),
       |st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
       |    CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl,
       |    $dfCols
       |  FROM dl),
       |tf AS (SELECT doc_id, dl,
       |    $tfCols
       |  FROM dl),
       |lex AS (
       |  $lexLegs),
       |lexr AS (SELECT qid, doc_id, CAST(ROW_NUMBER() OVER (PARTITION BY qid
       |    ORDER BY lex_score DESC, doc_id ASC) AS BIGINT) AS lex_rank FROM lex),
       |lext AS (SELECT * FROM lexr WHERE lex_rank <= 20),
       |e AS ($embDouble),
       |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 3),
       |c AS (SELECT vec_id, v FROM e WHERE vec_id >= 5),
       |vs AS (SELECT qid, vec_id AS doc_id, ${cosR("qv", "v")} AS cos_sim
       |       FROM c CROSS JOIN q),
       |vr AS (SELECT qid, doc_id, CAST(ROW_NUMBER() OVER (PARTITION BY qid
       |    ORDER BY cos_sim DESC, doc_id ASC) AS BIGINT) AS vec_rank FROM vs),
       |vt AS (SELECT * FROM vr WHERE vec_rank <= 20),
       |f AS (SELECT COALESCE(l.qid, v.qid) AS qid,
       |    COALESCE(l.doc_id, v.doc_id) AS doc_id, l.lex_rank, v.vec_rank,
       |    round(COALESCE(CAST(1.0 AS DOUBLE) / (60 + l.lex_rank),
       |        CAST(0.0 AS DOUBLE))
       |      + COALESCE(CAST(1.0 AS DOUBLE) / (60 + v.vec_rank),
       |        CAST(0.0 AS DOUBLE)), 6) AS rrf_score
       |  FROM lext l FULL OUTER JOIN vt v
       |    ON l.qid = v.qid AND l.doc_id = v.doc_id),
       |r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY qid
       |    ORDER BY rrf_score DESC, doc_id ASC) AS BIGINT) AS rank FROM f)
       |SELECT qid, rank, doc_id, COALESCE(lex_rank, -1) AS lex_rank,
       |  COALESCE(vec_rank, -1) AS vec_rank, rrf_score
       |FROM r WHERE rank <= 10 ORDER BY qid, rank""".stripMargin
  }

  /** All-integer PageRank, 5 unrolled rounds over the shared cosine
    * pairs: pr scaled by 10¹², contribution `pr // deg` (floor
    * division, exact), damped update `(15·base + 85·inflow) // 100` —
    * the engine's integers reproduce bit-for-bit because no float
    * ever accumulates across rows. */
  private val graphPagerankSql: String = {
    val base = "(1000000000000 // (SELECT n FROM nn))"
    def rnd(i: Int): String =
      s"""p$i AS (SELECT d.src AS id,
         |  CAST((15 * $base + 85 * COALESCE(f.inflow, 0)) // 100 AS BIGINT) AS pr
         |  FROM degs d LEFT JOIN (
         |    SELECT g.dst, SUM(p.pr // dg.deg) AS inflow
         |    FROM symg g JOIN p${i - 1} p ON g.src = p.id
         |    JOIN degs dg ON dg.src = g.src
         |    GROUP BY g.dst) f ON f.dst = d.src)""".stripMargin
    val rounds = (1 to 5).map(rnd).mkString(",\n")
    s"""WITH $embCosinePairsCtes,
       |ed AS (SELECT v1, v2 FROM s WHERE cos_sim >= 0.3),
       |symg AS (SELECT v1 AS src, v2 AS dst FROM ed
       |         UNION ALL SELECT v2 AS src, v1 AS dst FROM ed),
       |degs AS (SELECT src, COUNT(*) AS deg FROM symg GROUP BY 1),
       |nn AS (SELECT COUNT(*) AS n FROM degs),
       |p0 AS (SELECT src AS id,
       |       CAST(1000000000000 // (SELECT n FROM nn) AS BIGINT) AS pr
       |       FROM degs),
       |$rounds
       |SELECT id AS vec_id, pr AS pr_scaled,
       |  round(CAST(pr AS DOUBLE) / 1000000000000, 8) AS pagerank
       |FROM p5 ORDER BY vec_id""".stripMargin
  }

  private val annBruteforceSql: String =
    s"""WITH e AS ($embDouble),
       |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
       |c AS (SELECT vec_id, v FROM e WHERE vec_id >= 5),
       |s AS (SELECT qid, vec_id, ${cosR("qv", "v")} AS cos_sim FROM c CROSS JOIN q),
       |r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY qid
       |        ORDER BY cos_sim DESC, vec_id ASC) AS BIGINT) AS rank FROM s)
       |SELECT qid, rank, vec_id, cos_sim FROM r WHERE rank <= 3
       |ORDER BY qid, rank""".stripMargin

  private val annFilteredSql: String =
    s"""WITH e AS ($embDouble),
       |allowed AS (SELECT doc_id AS vec_id FROM documents
       |            WHERE lang = 'en'),
       |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
       |c AS (SELECT e.vec_id, e.v FROM e JOIN allowed USING (vec_id)
       |      WHERE e.vec_id >= 5),
       |s AS (SELECT qid, vec_id, ${cosR("qv", "v")} AS cos_sim FROM c CROSS JOIN q),
       |r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY qid
       |        ORDER BY cos_sim DESC, vec_id ASC) AS BIGINT) AS rank FROM s)
       |SELECT qid, rank, vec_id, cos_sim FROM r WHERE rank <= 3
       |ORDER BY qid, rank""".stripMargin

  /** Same fixed-cell sampling stride as Similarity.ivfStride:
    * ceil((max_id+1)/16.0) — integer inputs through one exact double
    * division, so both engines compute the identical stride. */
  private val annIvfSql: String =
          s"""WITH e AS ($embDouble),
         |st AS (SELECT CAST(ceil((max(vec_id) + 1) / 16.0) AS BIGINT) AS stride FROM e),
         |c AS (SELECT vec_id AS cell, v AS cv FROM e
         |      WHERE vec_id % (SELECT stride FROM st) = 0),
         |a AS (SELECT e.vec_id, e.v, c.cell, ${cosR("e.v", "c.cv")} AS sim
         |      FROM e CROSS JOIN c),
         |a1 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |         ORDER BY sim DESC, cell ASC) AS rn FROM a),
         |assigned AS (SELECT vec_id, v, cell FROM a1 WHERE rn = 1),
         |q AS (SELECT e.vec_id AS qid, e.v AS qv, c.cell, ${cosR("e.v", "c.cv")} AS sim
         |      FROM e CROSS JOIN c WHERE e.vec_id < 5),
         |q1 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
         |         ORDER BY sim DESC, cell ASC) AS rn FROM q),
         |probes AS (SELECT qid, qv, cell FROM q1 WHERE rn <= 2),
         |s AS (SELECT p.qid, a.vec_id, ${cosR("p.qv", "a.v")} AS cos_sim, a.cell
         |      FROM assigned a JOIN probes p ON a.cell = p.cell AND a.vec_id <> p.qid),
         |r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY qid
         |        ORDER BY cos_sim DESC, vec_id ASC) AS BIGINT) AS rank FROM s)
         |SELECT qid, rank, vec_id, cos_sim, cell FROM r WHERE rank <= 3
         |ORDER BY qid, rank""".stripMargin

  // --- dedup_simhash oracle machinery (round 11, verdict #8) -------
  // The blocker for oracling simhash was recomputing Spark's
  // xxhash64 (seed 42, standard XXH64) in DuckDB. For the corpus at
  // hand every token is ASCII and ≤ 15 bytes (measured: ≤ 8 at
  // sf0.01, ≤ 11 at the 10× replicas), so XXH64's short-input path
  // (≤ 1 eight-byte lane + ≤ 1 four-byte chunk + ≤ 3 tail bytes)
  // suffices, and it is expressible in exact HUGEINT arithmetic:
  // wrapping 64-bit multiply via 32-bit limbs, rotate-left via
  // disjoint-bit shift+add, xor natively. Validated token-for-token
  // against Spark's xxhash64 on every length class 0–11.
  private val W64 = "18446744073709551616" // 2^64
  private val xxP1 = "11400714785074694791"
  private val xxP2 = "14029467366897019727"
  private val xxP3 = "1609587929392839161"
  private val xxP4 = "9650029242287828579"
  private val xxP5 = "2870177450012600261"
  /** (a*b) mod 2^64 for HUGEINTs in [0, 2^64): 32-bit limb product —
    * every partial stays under 2^65, inside HUGEINT. */
  private def mul64(a: String, b: String): String =
    s"(((($a)%4294967296)*(($b)%4294967296)" +
      s"+(((($a)//4294967296)*(($b)%4294967296)" +
      s"+(($a)%4294967296)*(($b)//4294967296))%4294967296)*4294967296)%$W64)"
  /** rotl64: the two shifted halves occupy disjoint bits → add. */
  private def rotl64(x: String, r: Int): String =
    s"(((($x)*${1L << r})%$W64+(($x)//${BigInt(1) << (64 - r)}))%$W64)"
  private def xor64(a: String, b: String): String =
    s"xor(($a)::HUGEINT,($b)::HUGEINT)"

  /** CTE chain computing hu = unsigned XXH64(tok, seed 42) for every
    * (doc_id, tok) row of `toks` — stepwise columns keep each
    * expression readable and evaluated once. */
  private val xxh64Ctes: String = {
    val lane = // one 8-byte lane: h = rotl(h ^ round(k1), 27)*P1 + P4
      s"(${mul64(rotl64(xor64("h0", mul64(rotl64(mul64("k1", xxP2), 31), xxP1)), 27), xxP1)} + $xxP4) % $W64"
    val four = // 4-byte chunk: h = rotl(h ^ k4*P1, 23)*P2 + P3
      s"(${mul64(rotl64(xor64("hA", mul64("k4", xxP1)), 23), xxP2)} + $xxP3) % $W64"
    def tail(h: String, byte: String) = // h = rotl(h ^ b*P5, 11)*P1
      mul64(rotl64(xor64(h, mul64(byte, xxP5)), 11), xxP1)
    def le(terms: Seq[(String, BigInt)]): String =
      terms.map { case (b, m) => s"$b*$m" }.mkString("+")
    s"""xt1 AS (SELECT doc_id, tok,
       |  -- fail LOUD outside the oracle's domain (≤ 15 ASCII bytes:
       |  -- one 8-byte lane max) instead of hashing silently wrong
       |  CASE WHEN length(tok) > 15
       |         OR length(tok) <> octet_length(encode(tok))
       |       THEN CAST(error('xxh64 oracle: token outside the <=15-byte ASCII domain: ' || tok) AS BIGINT)
       |       ELSE length(tok) END::HUGEINT AS len,
       |  list_transform(range(1, length(tok)+1), i -> unicode(tok[i])::HUGEINT) AS b
       |  FROM toks),
       |xt2 AS (SELECT *, (42::HUGEINT + $xxP5 + len) % $W64 AS h0,
       |  CASE WHEN len>=8 THEN ${le((1 to 8).map(i => s"b[$i]" -> (BigInt(1) << (8 * (i - 1)))))} ELSE 0 END AS k1,
       |  ((len // 8) * 8)::BIGINT AS off8, len - (len//8)*8 AS rem
       |  FROM xt1),
       |xt3 AS (SELECT *, CASE WHEN len>=8 THEN $lane ELSE h0 END AS hA,
       |  CASE WHEN rem>=4 THEN ${le((1 to 4).map(i => s"b[off8+$i]" -> (BigInt(1) << (8 * (i - 1)))))} ELSE 0 END AS k4,
       |  off8 + CASE WHEN rem>=4 THEN 4 ELSE 0 END AS offT
       |  FROM xt2),
       |xt4 AS (SELECT *, CASE WHEN rem>=4 THEN $four ELSE hA END AS hB,
       |  (len - offT)::BIGINT AS ntail FROM xt3),
       |xt5 AS (SELECT *, CASE WHEN ntail>=1 THEN ${tail("hB", "b[offT+1]")} ELSE hB END AS hc1 FROM xt4),
       |xt6 AS (SELECT *, CASE WHEN ntail>=2 THEN ${tail("hc1", "b[offT+2]")} ELSE hc1 END AS hc2 FROM xt5),
       |xt7 AS (SELECT *, CASE WHEN ntail>=3 THEN ${tail("hc2", "b[offT+3]")} ELSE hc2 END AS hc3 FROM xt6),
       |xt8 AS (SELECT *, ${xor64("hc3", "hc3//8589934592")} AS a1 FROM xt7),
       |xt9 AS (SELECT *, ${mul64("a1", xxP2)} AS a2 FROM xt8),
       |xtA AS (SELECT *, ${xor64("a2", "a2//536870912")} AS a3 FROM xt9),
       |xtB AS (SELECT *, ${mul64("a3", xxP3)} AS a4 FROM xtA),
       |hashes AS (SELECT doc_id, ${xor64("a4", "a4//4294967296")} AS hu FROM xtB)""".stripMargin
  }

  /** Per-doc simhash from the token hashes: 64 ±1 vote sums in ONE
    * aggregate (no 64-way explode), assembled to the signed BIGINT
    * Spark's SimHash64Expr emits. */
  private val simhashCtes: String = {
    val votes = (0 until 64).map(b =>
      s"SUM(CASE WHEN (hu//${BigInt(1) << b})%2=1 THEN 1 ELSE -1 END) AS s$b")
      .mkString(",\n|    ")
    val asm = (0 until 64).map(b =>
      s"CASE WHEN s$b>0 THEN ${BigInt(1) << b}::HUGEINT ELSE 0::HUGEINT END")
      .mkString("+")
    s"""votes AS (SELECT doc_id,
       |    $votes
       |  FROM hashes GROUP BY doc_id),
       |sims AS (SELECT doc_id, ($asm) AS simu,
       |  CASE WHEN ($asm) >= 9223372036854775808::HUGEINT
       |    THEN (($asm) - $W64)::BIGINT ELSE ($asm)::BIGINT END AS simhash
       |  FROM votes)""".stripMargin
  }

  /** The Manku blocking tables for every supported block count, as
    * one static VALUES relation GENERATED FROM the engine's own
    * [[graft.operators.Dedup.SimhashBlocking]] (zero drift by
    * construction): one row per (nBlocks, table, block) with the
    * power-of-two literals the key fold needs — bkey = Σ
    * ((simu // 2^off) % 2^size) · 2^shift, where shift is the summed
    * width of the table's LATER blocks (≡ the engine's left-fold). */
  private val simhashBlockRows: String =
    (4 to 8).flatMap { nb =>
      val blk = graft.operators.Dedup.SimhashBlocking(nb)
      blk.tables.zipWithIndex.flatMap { case (tbl, tid) =>
        tbl.zipWithIndex.map { case (b, pos) =>
          val shift = tbl.drop(pos + 1).map(blk.sizes).sum
          s"($nb,$tid,${BigInt(1) << blk.offsets(b)}::HUGEINT," +
            s"${BigInt(1) << blk.sizes(b)}::HUGEINT,${BigInt(1) << shift}::HUGEINT)"
        }
      }
    }.mkString(",")

  /** The adaptive block-count rule (SimhashBlocking.forCorpus) as a
    * CASE over bitLen(n) — thresholds generated from the same Scala
    * code: nb serves while minKeyBits ≥ bitLen(n) + bitLen(#tables). */
  private val simhashChoose: String = {
    val arms = (4 to 7).map { nb =>
      val blk = graft.operators.Dedup.SimhashBlocking(nb)
      def bitLen(x: Long) = 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, x))
      val maxBl = blk.minKeyBits - bitLen(blk.tables.size.toLong)
      s"WHEN bl <= $maxBl THEN $nb"
    }.mkString(" ")
    s"""chosen AS (SELECT CASE $arms ELSE 8 END AS nb
       |  FROM (SELECT length(bin(GREATEST(COUNT(*), 1))) AS bl FROM documents))""".stripMargin
  }

  // --- dedup_minhash_lsh oracle machinery (round 12, verdict #2) ----
  // The round-11 HUGEINT xxh64 generalized: full XXH64 over <=63-byte
  // ASCII strings (adding the >=32-byte 4-lane stripe and up to 3
  // trailing 8-byte words — the 10x replicas' prefix-mutated 3-word
  // grams reach 35 bytes), plus hashLong / hashInt (MinHashAggExpr's
  // seed recurrence hash(s, hash(gram, 42))) and the chained-hashLong
  // band key, all in BITWISE HUGEINT arithmetic: AND-mask for mod
  // 2^64 and shifts for the 32-bit limb split — measured ~16x faster
  // than the division forms in DuckDB (HUGEINT division is the cost;
  // the simhash CTEs above predate this and are cheap enough to
  // leave). Validated value-for-value against Spark's xxhash64 on
  // every string length 0-63 (incl. the stripe path) and on random
  // long/int/chained-seed inputs, then end-to-end: the assembled
  // oracle reproduces the engine's sf0.01 output EXACTLY.
  private val bM = "18446744073709551615" // 2^64 - 1
  private def bMul(a: String, b: String): String = {
    def lo(v: String) = s"(($v)&4294967295)"
    def hi(v: String) = s"(($v)>>32)"
    val cross = s"(((${hi(a)}*${lo(b)})+(${lo(a)}*${hi(b)}))&4294967295)"
    s"(((${lo(a)}*${lo(b)})+($cross<<32))&$bM)"
  }
  private def bRotl(x: String, r: Int): String =
    s"(((($x)<<$r)&$bM)|(($x)>>${64 - r}))"

  /** XXH64's final avalanche, stepwise (each step references the
    * previous ONCE — nesting would duplicate expression text). */
  private def bFmix(p: String, c: String): Seq[(String, String)] = Seq(
    s"${p}f1" -> xor64(c, s"$c>>33"),
    s"${p}f2" -> bMul(s"${p}f1", xxP2),
    s"${p}f3" -> xor64(s"${p}f2", s"${p}f2>>29"),
    s"${p}f4" -> bMul(s"${p}f3", xxP3),
    s"${p}out" -> xor64(s"${p}f4", s"${p}f4>>32"))

  /** XXH64.hashLong(inp, seed) as CTE steps ending in `{p}out`;
    * `inp`/`seed` must be column refs or literals (re-referenced). */
  private def bHashLong(p: String, inp: String, seed: String): Seq[(String, String)] =
    Seq(
      s"${p}k" -> bMul(bRotl(bMul(inp, xxP2), 31), xxP1),
      s"${p}h1" -> s"((($seed) + $xxP5 + 8) & $bM)",
      s"${p}h2" -> xor64(s"${p}h1", s"${p}k"),
      s"${p}h3" -> s"((${bMul(bRotl(s"${p}h2", 27), xxP1)} + $xxP4) & $bM)") ++
      bFmix(p, s"${p}h3")

  /** Fold (name, expr) steps into a linear CTE chain over `src`;
    * returns (cteText, lastCteName). One column per layer keeps every
    * sub-expression referenced exactly once (DuckDB inlines
    * single-reference CTEs, so the chain collapses to one projection
    * tree without text blowup). */
  private def chainCtes(steps: Seq[(String, String)], src: String,
      p: String): (String, String) = {
    var prev = src
    val ctes = steps.zipWithIndex.map { case ((name, expr), i) =>
      val cte = s"$p$i"
      val out = s"$cte AS (SELECT *, $expr AS $name FROM $prev)"
      prev = cte
      out
    }
    (ctes.mkString(",\n"), prev)
  }

  /** CTE chain computing `hu` = unsigned XXH64(tok, seed 42) for every
    * row of `src` (column `tok`), valid for ASCII up to 63 bytes —
    * loud error outside the domain, like the simhash oracle. */
  private def bXxh64StrCtes(src: String): (String, String) = {
    val steps = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    steps += "len" -> ("CASE WHEN length(tok) > 63 OR length(tok) <> octet_length(encode(tok)) " +
      "THEN CAST(error('xxh64 oracle: token outside the <=63-byte ASCII domain: ' || tok) AS BIGINT) " +
      "ELSE length(tok) END::HUGEINT")
    steps += "b" -> "list_transform(range(1, length(tok)+1), i -> unicode(tok[i])::HUGEINT)"
    def leWord(base: String, n: Int) =
      (1 to n).map(i => s"b[$base+$i]*${BigInt(1) << (8 * (i - 1))}").mkString("+")
    steps += "lenb" -> "len::BIGINT"
    // >=32-byte stripe: one 4-lane pass (grams stay < 64 bytes, so at
    // most one stripe), words at fixed offsets 0/8/16/24
    for (j <- 0 until 4)
      steps += s"w${j + 1}" -> s"CASE WHEN lenb>=32 THEN ${leWord((8 * j).toString, 8)} ELSE 0 END"
    val accs = Seq(s"((42 + $xxP1 + $xxP2) & $bM)", s"((42 + $xxP2) & $bM)", "42",
      s"((42 - $xxP1 + $W64) & $bM)")
    for (j <- 1 to 4) {
      steps += s"r${j}a" -> s"(((${accs(j - 1)}) + ${bMul(s"w$j", xxP2)}) & $bM)"
      steps += s"r${j}v" -> bMul(bRotl(s"r${j}a", 31), xxP1)
    }
    steps += "hs0" -> s"((${bRotl("r1v", 1)} + ${bRotl("r2v", 7)} + ${bRotl("r3v", 12)} + ${bRotl("r4v", 18)}) & $bM)"
    var h = "hs0"
    for (j <- 1 to 4) {
      steps += s"mg${j}k" -> bMul(bRotl(bMul(s"r${j}v", xxP2), 31), xxP1)
      steps += s"mg${j}m" -> s"((${bMul(xor64(h, s"mg${j}k"), xxP1)} + $xxP4) & $bM)"
      h = s"mg${j}m"
    }
    steps += "base" -> "CASE WHEN lenb>=32 THEN 32 ELSE 0 END"
    steps += "h0" -> s"(((CASE WHEN lenb>=32 THEN $h ELSE ((42 + $xxP5) & $bM) END) + len) & $bM)"
    steps += "nw" -> "(lenb - base) // 8"
    // up to 3 trailing 8-byte words at computed offsets
    h = "h0"
    for (j <- 1 to 3) {
      steps += s"tw$j" -> s"CASE WHEN nw>=$j THEN ${leWord(s"base+${8 * (j - 1)}", 8)} ELSE 0 END"
      steps += s"tk$j" -> bMul(bRotl(bMul(s"tw$j", xxP2), 31), xxP1)
      steps += s"th$j" -> s"CASE WHEN nw>=$j THEN ((${bMul(bRotl(xor64(h, s"tk$j"), 27), xxP1)} + $xxP4) & $bM) ELSE $h END"
      h = s"th$j"
    }
    steps += "off4" -> "base + nw*8"
    steps += "rem4" -> "lenb - off4"
    steps += "k4" -> s"CASE WHEN rem4>=4 THEN ${leWord("off4", 4)} ELSE 0 END"
    steps += "hB" -> s"CASE WHEN rem4>=4 THEN ((${bMul(bRotl(xor64(h, bMul("k4", xxP1)), 23), xxP2)} + $xxP3) & $bM) ELSE $h END"
    steps += "offT" -> "off4 + CASE WHEN rem4>=4 THEN 4 ELSE 0 END"
    steps += "ntail" -> "lenb - offT"
    h = "hB"
    for (j <- 1 to 3) {
      steps += s"tb$j" -> s"CASE WHEN ntail>=$j THEN ${bMul(bRotl(xor64(h, bMul(s"b[offT+$j]", xxP5)), 11), xxP1)} ELSE $h END"
      h = s"tb$j"
    }
    steps ++= bFmix("mss", h)
    chainCtes(steps.toSeq, src, "mxs")
  }

  /** The full dedup_minhash_lsh pipeline as one DuckDB query —
    * EXACTLY the engine's algorithm (Dedup.dedupMinhashLsh), hash for
    * hash: distinct 3-word shingles per doc (split on single space,
    * empties kept, like WordNgramsExpr), xxhash64(gram) to the 8-byte
    * shuffle key, MinHashAggExpr's 64-seed recurrence
    * hashInt(s, hashLong(key, 42)) min-folded per doc (SIGNED-long
    * mins, Spark's Long ordering), 16 band keys of 4 chained
    * hashLongs (seed 42, Spark's multi-column xxhash64), bucket join
    * (d1 < d2, distinct), exact hashed-gram intersection, jaccard =
    * inter / (n1 + n2 - inter) in IEEE double, per-doc candidate
    * count + best. Wide-column seed stage: 64 MIN aggregates over the
    * gram rows instead of a 64x unnest (same arithmetic, ~10x less
    * row machinery); multiply-referenced CTEs are MATERIALIZED so
    * DuckDB's inlining can't re-run the hash pipeline per reference. */
  private def minhashLshSqlFor(pairCond: String, mexpSql: String,
      verdictSelect: String, outWhere: String): String = {
    val (strCtes, strLast) = bXxh64StrCtes("mtk")
    val (baseCtes, baseLast) = chainCtes(bHashLong("L", "hu", "42"), "mh", "mbc")
    def sgn(c: String) =
      s"CASE WHEN $c >= 9223372036854775808::HUGEINT THEN ($c - $W64)::BIGINT ELSE ($c)::BIGINT END"
    def usg(c: String) = s"(($c::HUGEINT) & $bM)"
    // wide per-seed hashInt over the gram rows: h1 = hb + P5 + 4 is
    // shared; per seed the xor constant (s * P1) mod 2^64 folds to a
    // literal, then the 23-rotl round + avalanche, min-aggregated
    val layers = Array.fill(6)(scala.collection.mutable.ArrayBuffer.empty[String])
    val minCols = scala.collection.mutable.ArrayBuffer.empty[String]
    for (s <- 0 until 64) {
      val ks = (BigInt(s) * BigInt(xxP1)) & ((BigInt(1) << 64) - 1)
      layers(0) += s"${xor64("mih1", ks.toString)} AS q${s}a"
      layers(1) += s"((${bMul(bRotl(s"q${s}a", 23), xxP2)} + $xxP3) & $bM) AS q${s}b"
      layers(2) += s"${xor64(s"q${s}b", s"q${s}b>>33")} AS q${s}c"
      layers(3) += s"${bMul(s"q${s}c", xxP2)} AS q${s}d"
      layers(4) += s"${xor64(s"q${s}d", s"q${s}d>>29")} AS q${s}e"
      layers(5) += s"${bMul(s"q${s}e", xxP3)} AS q${s}f"
      minCols += s"MIN(${sgn(xor64(s"q${s}f", s"q${s}f>>32"))}) AS m$s"
    }
    val seedCtes = {
      val buf = scala.collection.mutable.ArrayBuffer(
        s"mi0 AS (SELECT doc_id, ((hb + ${BigInt(xxP5) + 4}) & $bM) AS mih1 FROM mb)")
      var prev = "mi0"
      for (i <- layers.indices) {
        val carry = if (i == layers.length - 1) "doc_id" else "*"
        buf += s"mi${i + 1} AS (SELECT $carry, ${layers(i).mkString(", ")} FROM $prev)"
        prev = s"mi${i + 1}"
      }
      buf.mkString(",\n")
    }
    val sigList = (0 until 64).map(s => s"m$s").mkString("[", ", ", "]")
    val (quadCtes, quadLast, quadOut) = {
      var prev = "42"
      val steps = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      for (j <- 0 until 4) {
        steps ++= bHashLong(s"Q$j", s"u${j + 1}", prev)
        prev = s"Q${j}out"
      }
      val (c, l) = chainCtes(steps.toSeq, "mbandu", "mqc")
      (c, l, prev)
    }
    s"""WITH mg0 AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
       |mg1 AS (SELECT doc_id, w[i]||' '||w[i+1]||' '||w[i+2] AS tok
       |        FROM mg0, unnest(range(1, len(w)-1)) AS t(i)),
       |mtk AS (SELECT DISTINCT doc_id, tok FROM mg1),
       |$strCtes,
       |mh0 AS (SELECT doc_id, mssout AS hu FROM $strLast),
       |mh AS MATERIALIZED (SELECT DISTINCT doc_id, hu FROM mh0),
       |msz AS MATERIALIZED (SELECT doc_id, COUNT(*) AS nsh FROM mh GROUP BY doc_id),
       |$baseCtes,
       |mb AS (SELECT doc_id, Lout AS hb FROM $baseLast),
       |$seedCtes,
       |msig AS (SELECT doc_id, ${minCols.mkString(", ")} FROM mi${layers.length} GROUP BY doc_id),
       |msga AS (SELECT doc_id, $sigList AS sig FROM msig),
       |mband AS (SELECT doc_id, bb.b AS band,
       |    sig[bb.b*4+1] AS s1, sig[bb.b*4+2] AS s2,
       |    sig[bb.b*4+3] AS s3, sig[bb.b*4+4] AS s4
       |  FROM msga, unnest(range(0, 16)) AS bb(b)),
       |mbandu AS (SELECT doc_id, band, ${usg("s1")} AS u1, ${usg("s2")} AS u2,
       |    ${usg("s3")} AS u3, ${usg("s4")} AS u4 FROM mband),
       |$quadCtes,
       |mbk AS MATERIALIZED (SELECT doc_id, band, $quadOut AS bkey FROM $quadLast),
       |mpair AS MATERIALIZED (SELECT DISTINCT a.doc_id AS d1, c.doc_id AS d2
       |  FROM mbk a JOIN mbk c ON a.band = c.band AND a.bkey = c.bkey
       |    AND $pairCond),
       |mint AS (SELECT d1, d2, COUNT(*) AS inter
       |  FROM mpair JOIN mh g1 ON g1.doc_id = d1
       |  JOIN mh g2 ON g2.doc_id = d2 AND g2.hu = g1.hu
       |  GROUP BY d1, d2),
       |mj AS MATERIALIZED (SELECT p.d1, p.d2,
       |    CAST(COALESCE(i.inter, 0) AS DOUBLE)
       |      / (z1.nsh + z2.nsh - COALESCE(i.inter, 0)) AS jaccard
       |  FROM mpair p LEFT JOIN mint i ON p.d1 = i.d1 AND p.d2 = i.d2
       |  JOIN msz z1 ON z1.doc_id = p.d1 JOIN msz z2 ON z2.doc_id = p.d2),
       |mexp AS ($mexpSql),
       |mpd AS (SELECT doc_id, COUNT(*) AS n_candidates, MAX(jaccard) AS best
       |  FROM mexp GROUP BY doc_id)
       |SELECT z.doc_id, COALESCE(p.n_candidates, 0) AS n_candidates,
       |  COALESCE(round(p.best, 6), 0.0) AS best_jaccard,
       |  $verdictSelect
       |FROM msz z LEFT JOIN mpd p ON z.doc_id = p.doc_id
       |$outWhere
       |ORDER BY z.doc_id""".stripMargin
  }

  /** The batch form: all pairs (d1 < d2), both pair members get the
    * per-doc explode row, near-dup verdict. */
  private val minhashLshSql: String = minhashLshSqlFor(
    pairCond = "a.doc_id < c.doc_id",
    mexpSql = "SELECT d1 AS doc_id, jaccard FROM mj " +
      "UNION ALL SELECT d2, jaccard FROM mj",
    verdictSelect = "(COALESCE(p.best, 0.0) >= 0.2) AS is_near_dup",
    outWhere = "")

  /** The streaming-index form (stream_exec_dedup_index): pairs are
    * (arrival, historical) only — the arrivals slice is doc_id ≡
    * StreamDedupRes (mod StreamDedupMod), interpolated from the
    * operator's shared constants — only the arrival side of a pair
    * gets a per-doc row, output restricted to arrivals, verdict
    * flipped to `keep` (best verified jaccard < 0.2). */
  private val minhashIndexSql: String = {
    val m = graft.operators.Streams.StreamDedupMod
    val r = graft.operators.Streams.StreamDedupRes
    minhashLshSqlFor(
      pairCond = s"a.doc_id % $m = $r AND c.doc_id % $m <> $r",
      mexpSql = "SELECT d1 AS doc_id, jaccard FROM mj",
      verdictSelect = "(COALESCE(p.best, 0.0) < 0.2) AS keep",
      outWhere = s"WHERE z.doc_id % $m = $r")
  }

  val pipeline: Map[String, String] = Map(
    "dedup_minhash_lsh" -> minhashLshSql,
    "stream_exec_dedup_index" -> minhashIndexSql,

    "pipeline_clean_corpus" ->
      s"""WITH keepers AS (
         |  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
         |scored AS (
         |  SELECT doc_id, lang,
         |    CAST($ws AS BIGINT) AS n_tokens,
         |    round((CAST($ws AS DOUBLE) / (CAST($ws AS DOUBLE) + 50.0))
         |          * (1.0 - CAST($stopHits AS DOUBLE) / $ws), 6) AS quality
         |  FROM documents WHERE doc_id IN (SELECT doc_id FROM keepers))
         |SELECT doc_id, lang, n_tokens, quality FROM scored
         |WHERE quality >= 0.3 AND n_tokens BETWEEN 10 AND 2000
         |ORDER BY doc_id""".stripMargin,

    "pipeline_train_test_split" ->
      s"""SELECT doc_id, $fp % 10 AS fp_bucket,
         |  CASE WHEN $fp % 10 < 8 THEN 'train'
         |       WHEN $fp % 10 < 9 THEN 'valid'
         |       ELSE 'test' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin,

    "pipeline_seq_packing" ->
      """SELECT pack_id, COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS total_tokens FROM (
        |  SELECT CAST(FLOOR((SUM(toks) OVER (ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - toks) / 4096.0) AS BIGINT)
        |         AS pack_id, toks
        |  FROM (SELECT doc_id, CAST(ceil(length(text) / 4.0) AS BIGINT) AS toks
        |        FROM documents) t) p
        |GROUP BY pack_id ORDER BY pack_id""".stripMargin,

    "text_tokens" ->
      s"""SELECT doc_id,
         |  CAST($ws AS BIGINT) AS ws_tokens,
         |  CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS re_tokens,
         |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS bpe_tokens_est
         |FROM documents ORDER BY doc_id""".stripMargin,

    // word-level complexity trio: exact integer totals, ONE final
    // IEEE divide per ratio (round(Σa::double / Σb, 6))
    "text_readability" ->
      s"""WITH d AS (SELECT source,
         |    CAST($ws AS BIGINT) AS words,
         |    CAST(strlen(replace(text, ' ', '')) AS BIGINT) AS chars,
         |    CAST(len(regexp_extract_all(text, '[aeiou]+')) AS BIGINT) AS syllables,
         |    CAST(len(list_filter(string_split(text, ' '),
         |      w -> strlen(w) >= 7)) AS BIGINT) AS long_words
         |  FROM documents)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(words) AS BIGINT) AS total_words,
         |  round(CAST(SUM(chars) AS DOUBLE) / CAST(SUM(words) AS DOUBLE), 6)
         |    AS avg_word_len,
         |  round(CAST(SUM(syllables) AS DOUBLE) / CAST(SUM(words) AS DOUBLE), 6)
         |    AS syllables_per_word,
         |  round(CAST(SUM(long_words) AS DOUBLE) / CAST(SUM(words) AS DOUBLE), 6)
         |    AS long_word_share
         |FROM d GROUP BY source ORDER BY source""".stripMargin,

    // BPE-application contract gate (round 13): the learned merge
    // table is a parquet FIXTURE both engines read (written by the
    // Spark side at TextAnalysis.BpeFixturePath immediately before
    // applying it); a recursive CTE replays the replace chain rank by
    // rank over the same SO/SI-wrapped symbol string encoding, so a
    // wrong merge table breaks this hash. replace() is left-to-right
    // non-overlapping with no rescan of the replacement in BOTH
    // engines — exactly the greedy single-pass BPE merge.
    "text_bpe_apply" ->
      s"""WITH RECURSIVE m AS (SELECT "rank" AS rk, "left" AS a, "right" AS b,
        |    merged FROM '/tmp/graft-bpe-merges.parquet/*/*.parquet'
        |    WHERE corpus_docs = (SELECT COUNT(*) FROM documents)
        |      AND corpus_chars = (SELECT SUM(strlen(text)) FROM documents)
        |      AND corpus_fp = (SELECT ${graft.operators.TextAnalysis.BpeCorpusFpDuck}
        |                       FROM documents)),
        |base AS (SELECT doc_id,
        |    replace(regexp_replace(text, '(.)', chr(14) || '\\1' || chr(15), 'g'),
        |      chr(14) || ' ' || chr(15), chr(14) || '</w>' || chr(15))
        |    || chr(14) || '</w>' || chr(15) AS s
        |  FROM documents),
        |apl AS (
        |  SELECT doc_id, s, 0 AS r FROM base
        |  UNION ALL
        |  SELECT a.doc_id,
        |    replace(a.s, chr(14) || m.a || chr(15) || chr(14) || m.b || chr(15),
        |      chr(14) || m.merged || chr(15)), a.r + 1
        |  FROM apl a JOIN m ON m.rk = a.r + 1),
        |fin AS (SELECT doc_id, s FROM apl
        |  WHERE r = (SELECT COALESCE(max(rk), 0) FROM m)),
        |cnt AS (SELECT b.doc_id,
        |    (strlen(b.s) - strlen(replace(b.s, chr(14), ''))) AS n_base_syms,
        |    (strlen(f.s) - strlen(replace(f.s, chr(14), ''))) AS n_bpe_tokens
        |  FROM base b JOIN fin f USING (doc_id))
        |SELECT c.doc_id,
        |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_words,
        |  c.n_base_syms, c.n_bpe_tokens,
        |  round(CAST(c.n_base_syms AS DOUBLE) / c.n_bpe_tokens, 6) AS compression
        |FROM cnt c JOIN documents d ON d.doc_id = c.doc_id
        |ORDER BY c.doc_id""".stripMargin,

    "text_quality" ->
      s"""SELECT doc_id,
         |  CAST(length(text) AS BIGINT) AS n_chars_actual,
         |  CAST($ws AS BIGINT) AS n_tokens,
         |  round(CAST(length(replace(text, ' ', '')) AS DOUBLE) / $ws, 6) AS mean_word_len,
         |  round(CAST($stopHits AS DOUBLE) / $ws, 6) AS stopword_ratio,
         |  round((CAST($ws AS DOUBLE) / (CAST($ws AS DOUBLE) + 50.0))
         |        * (1.0 - CAST($stopHits AS DOUBLE) / $ws), 6) AS quality_score
         |FROM documents ORDER BY doc_id""".stripMargin,

    "text_langid" ->
      s"""SELECT doc_id, lang AS labeled_lang,
         |  CASE WHEN $enH >= $esH AND $enH >= $deH AND $enH >= $frH AND $enH > 0 THEN 'en'
         |       WHEN $esH >= $deH AND $esH >= $frH AND $esH > 0 THEN 'es'
         |       WHEN $deH >= $frH AND $deH > 0 THEN 'de'
         |       WHEN $frH > 0 THEN 'fr'
         |       ELSE 'und' END AS pred_lang,
         |  CAST($enH AS BIGINT) AS en_hits, CAST($esH AS BIGINT) AS es_hits,
         |  CAST($deH AS BIGINT) AS de_hits, CAST($frH AS BIGINT) AS fr_hits
         |FROM documents ORDER BY doc_id""".stripMargin,

    "text_lang_confusion" ->
      s"""WITH p AS (SELECT lang AS labeled_lang,
         |  CASE WHEN $enH >= $esH AND $enH >= $deH AND $enH >= $frH AND $enH > 0 THEN 'en'
         |       WHEN $esH >= $deH AND $esH >= $frH AND $esH > 0 THEN 'es'
         |       WHEN $deH >= $frH AND $deH > 0 THEN 'de'
         |       WHEN $frH > 0 THEN 'fr'
         |       ELSE 'und' END AS pred_lang
         |  FROM documents)
         |SELECT labeled_lang, pred_lang, COUNT(*) AS n_docs,
         |  CAST(labeled_lang = pred_lang AS INTEGER) AS is_correct
         |FROM p GROUP BY 1, 2
         |ORDER BY labeled_lang, pred_lang""".stripMargin,

    "text_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(generate_series(1, length(lower(trim(text)))),
        |        i -> CAST(ascii(substr(lower(trim(text)), i, 1)) AS BIGINT))),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_ngram_stats" ->
      """SELECT gram, COUNT(*) AS n FROM (
        |  SELECT unnest(list_transform(generate_series(1, len(w) - 2),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram
        |  FROM (SELECT string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 3) g
        |GROUP BY gram ORDER BY n DESC, gram ASC LIMIT 20""".stripMargin,

    // length-difference counts (corpus verified all-ASCII so
    // strlen ≡ char length); integer verdict, 'g' flag on every
    // regexp_replace (DuckDB replaces first-only by default)
    "text_code_detect" ->
      """SELECT doc_id, n_chars, n_symbols, n_digits, n_code_marks,
        |  round(CAST(n_symbols AS DOUBLE) / CAST(n_chars AS DOUBLE), 6)
        |    AS symbol_ratio,
        |  CAST(n_symbols * 10 >= n_chars OR n_code_marks * 50 >= n_chars
        |    AS INTEGER) AS is_code
        |FROM (
        |  SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_chars,
        |    CAST(strlen(text) - strlen(regexp_replace(text,
        |      '[^A-Za-z0-9 ]', '', 'g')) AS BIGINT) AS n_symbols,
        |    CAST(strlen(text) - strlen(regexp_replace(text,
        |      '[0-9]', '', 'g')) AS BIGINT) AS n_digits,
        |    CAST(strlen(text) - strlen(regexp_replace(text,
        |      '[{}()\[\];=<>]', '', 'g')) AS BIGINT) AS n_code_marks
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,

    // per-source KL vs the corpus blend: one ln of an exact integer
    // ratio quantized at 1e-4, weighted by the integer cnt_s through
    // DECIMAL sums, one division at the edge
    "text_kl_divergence" ->
      """WITH sf AS (SELECT source, tok, COUNT(*) AS cnt_s FROM
        |    (SELECT source, unnest(string_split(text, ' ')) AS tok
        |     FROM documents) GROUP BY 1, 2),
        |cf AS (SELECT tok, CAST(SUM(cnt_s) AS BIGINT) AS cnt FROM sf GROUP BY 1),
        |ps AS (SELECT source, CAST(SUM(cnt_s) AS BIGINT) AS n_s,
        |       COUNT(*) AS vocab_s FROM sf GROUP BY 1),
        |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total FROM cf)
        |SELECT source, MAX(n_s) AS n_tokens, MAX(vocab_s) AS vocab_size,
        |  round(CAST(SUM(CAST(round(ln(
        |      (CAST(cnt_s AS DOUBLE) * CAST(n_total AS DOUBLE))
        |      / (CAST(cnt AS DOUBLE) * CAST(n_s AS DOUBLE))), 4)
        |      AS DECIMAL(18,4)) * CAST(cnt_s AS DECIMAL(18,0))) AS DOUBLE)
        |    / CAST(MAX(n_s) AS DOUBLE), 6) AS kl_divergence
        |FROM sf JOIN cf USING (tok) JOIN ps USING (source), tot
        |GROUP BY source ORDER BY source""".stripMargin,

    // per-eval max containment in any single train doc: the
    // decontaminate_ngram gram convention, asymmetric division by
    // the EVAL gram count, rank over the rounded containment
    "decontaminate_containment" ->
      s"""WITH g AS (
         |  SELECT DISTINCT doc_id, unnest(list_transform(generate_series(1, len(w) - 4),
         |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])) AS g
         |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
         |  WHERE len(w) >= 5),
         |ev AS (SELECT doc_id AS eval_id, g FROM g WHERE doc_id % 97 = 0),
         |es AS (SELECT eval_id, CAST(COUNT(*) AS BIGINT) AS n_eval_grams
         |       FROM ev GROUP BY 1),
         |p AS (SELECT t.doc_id AS train_id, e.eval_id,
         |        CAST(COUNT(DISTINCT t.g) AS BIGINT) AS n_shared
         |      FROM g t JOIN ev e ON t.g = e.g
         |      WHERE t.doc_id % 97 <> 0 GROUP BY 1, 2),
         |r AS (SELECT p.*, es.n_eval_grams,
         |    round(CAST(n_shared AS DOUBLE) / CAST(n_eval_grams AS DOUBLE), 6)
         |      AS containment,
         |    ROW_NUMBER() OVER (PARTITION BY eval_id ORDER BY
         |      round(CAST(n_shared AS DOUBLE) / CAST(n_eval_grams AS DOUBLE), 6)
         |        DESC, train_id ASC) AS rk
         |  FROM p JOIN es USING (eval_id))
         |SELECT eval_id, train_id AS best_train_id, n_shared, n_eval_grams,
         |  containment
         |FROM r WHERE rk = 1 ORDER BY eval_id""".stripMargin,

    // the zipf-slope frequency/rank machinery, reduced to coverage
    // sums — integer occurrence sums through one exact division
    "text_vocab_coverage" ->
      """WITH f AS (SELECT lang, unnest(string_split(text, ' ')) AS tok
        |           FROM documents),
        |cnts AS (SELECT lang, tok, COUNT(*) AS cnt FROM f GROUP BY 1, 2),
        |r AS (SELECT lang, cnt, ROW_NUMBER() OVER (PARTITION BY lang
        |        ORDER BY cnt DESC, tok ASC) AS rank FROM cnts)
        |SELECT lang, COUNT(*) AS vocab_size,
        |  CAST(SUM(cnt) AS BIGINT) AS total_tokens,
        |  round(CAST(SUM(CASE WHEN rank <= 100 THEN cnt ELSE 0 END) AS DOUBLE)
        |    / CAST(SUM(cnt) AS DOUBLE), 6) AS cov_100,
        |  round(CAST(SUM(CASE WHEN rank <= 1000 THEN cnt ELSE 0 END) AS DOUBLE)
        |    / CAST(SUM(cnt) AS DOUBLE), 6) AS cov_1000,
        |  round(CAST(SUM(CASE WHEN rank <= 10000 THEN cnt ELSE 0 END) AS DOUBLE)
        |    / CAST(SUM(cnt) AS DOUBLE), 6) AS cov_10000
        |FROM r GROUP BY 1 ORDER BY lang""".stripMargin,

    // the engine's regression spelled closed-form: ln's of integers
    // quantized at 1e-4, DECIMAL sums (order-free), slope/intercept
    // as fixed-order double arithmetic — regr_slope() is avoided on
    // BOTH sides because its double accumulation is order-dependent
    "text_zipf_slope" ->
      """WITH f AS (SELECT lang, unnest(string_split(text, ' ')) AS tok
        |           FROM documents),
        |cnts AS (SELECT lang, tok, COUNT(*) AS cnt FROM f GROUP BY 1, 2),
        |r AS (SELECT lang, cnt, ROW_NUMBER() OVER (PARTITION BY lang
        |        ORDER BY cnt DESC, tok ASC) AS rank FROM cnts),
        |xy AS (SELECT lang,
        |    CAST(round(ln(CAST(rank AS DOUBLE)), 4) AS DECIMAL(18,4)) AS x,
        |    CAST(round(ln(CAST(cnt AS DOUBLE)), 4) AS DECIMAL(18,4)) AS y
        |  FROM r WHERE rank <= 1000),
        |sums AS (SELECT lang, COUNT(*) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x * y) AS sxy, SUM(x * x) AS sxx
        |  FROM xy GROUP BY 1)
        |SELECT lang, n AS n_ranks,
        |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS zipf_slope,
        |  round((CAST(sy AS DOUBLE)
        |      - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |        * CAST(sx AS DOUBLE))
        |    / CAST(n AS DOUBLE), 6) AS zipf_intercept
        |FROM sums ORDER BY lang""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, MIN(doc_id) AS keeper, COUNT(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY keeper""".stripMargin,

    "dedup_exact_normalized" ->
      """SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_hash,
        |  MIN(doc_id) AS keeper, COUNT(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY keeper""".stripMargin,

    // the cascade funnel: each tier's arg_max survivorship over the
    // previous tier's survivors; counts per tier are exact.
    // ORACLE-ONLY bound: the keep-best composite len·10¹² − doc_id
    // overflows BIGINT at len ≥ ~9.2·10⁶ chars (the q52ArgMinmax
    // headroom note) — fine for this corpus (max doc ~10³ chars,
    // asserted by the Spark side's tests); the Spark operators use
    // struct-max and carry no such bound
    "pipeline_dedup_cascade" ->
      """WITH d AS (SELECT doc_id, text, CAST(strlen(text) AS BIGINT) AS len
        |  FROM documents),
        |k1 AS (SELECT arg_max(doc_id, len * 1000000000000 - doc_id) AS doc_id
        |  FROM d GROUP BY md5(text)),
        |t1 AS (SELECT d.* FROM d JOIN k1 USING (doc_id)),
        |k2 AS (SELECT arg_max(doc_id, len * 1000000000000 - doc_id) AS doc_id
        |  FROM t1 GROUP BY md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))),
        |t2 AS (SELECT t1.* FROM t1 JOIN k2 USING (doc_id)),
        |k3 AS (SELECT arg_max(doc_id, len * 1000000000000 - doc_id) AS doc_id
        |  FROM t2 GROUP BY array_to_string((string_split(text, ' '))[1:6], ' ')),
        |t3 AS (SELECT t2.* FROM t2 JOIN k3 USING (doc_id))
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS tier_no, '1_exact' AS tier,
        |    (SELECT COUNT(*) FROM d) AS docs_in,
        |    (SELECT COUNT(*) FROM d) - (SELECT COUNT(*) FROM t1) AS docs_removed,
        |    (SELECT COUNT(*) FROM t1) AS docs_out
        |  UNION ALL
        |  SELECT 2, '2_normalized', (SELECT COUNT(*) FROM t1),
        |    (SELECT COUNT(*) FROM t1) - (SELECT COUNT(*) FROM t2),
        |    (SELECT COUNT(*) FROM t2)
        |  UNION ALL
        |  SELECT 3, '3_prefix', (SELECT COUNT(*) FROM t2),
        |    (SELECT COUNT(*) FROM t2) - (SELECT COUNT(*) FROM t3),
        |    (SELECT COUNT(*) FROM t3))
        |ORDER BY tier_no""".stripMargin,

    // truncation-duplicate candidates: first-6-token fingerprint,
    // keeper = longest text (ties → smallest id). DuckDB's list
    // slice reproduces Spark's substring_index on single-space text.
    // Same oracle-only len·10¹² composite bound as the cascade above
    // (len < ~9.2·10⁶ chars); Spark side is struct-max, unbounded
    "dedup_prefix" ->
      """WITH p AS (SELECT doc_id, CAST(strlen(text) AS BIGINT) AS len,
        |    array_to_string((string_split(text, ' '))[1:6], ' ') AS prefix
        |  FROM documents),
        |g AS (SELECT prefix, COUNT(*) AS n_docs,
        |    arg_max(doc_id, len * 1000000000000 - doc_id) AS keeper,
        |    arg_max(len, len * 1000000000000 - doc_id) AS keeper_len,
        |    MIN(doc_id) AS first_id
        |  FROM p GROUP BY prefix HAVING COUNT(*) >= 2)
        |SELECT md5(prefix) AS prefix_hash, n_docs, keeper_len, keeper,
        |  first_id
        |FROM g ORDER BY keeper""".stripMargin,

    // the bloom tier is plan-internal (no false negatives ⇒ exact
    // output); the oracle computes the same verdicts by direct join
    "dedup_incremental_bloom" ->
      """WITH d AS (SELECT doc_id, md5(text) AS digest FROM documents),
        |inc AS (SELECT * FROM d WHERE doc_id % 10 = 0),
        |ex AS (SELECT DISTINCT digest FROM d WHERE doc_id % 10 <> 0)
        |SELECT inc.doc_id, inc.digest,
        |  CAST(CASE WHEN ex.digest IS NOT NULL THEN 1 ELSE 0 END AS INT) AS is_dup
        |FROM inc LEFT JOIN ex ON inc.digest = ex.digest
        |ORDER BY doc_id""".stripMargin,

    "dedup_ngram_jaccard" ->
      s"""WITH d AS ($grams3)
         |SELECT a.doc_id AS d1, b.doc_id AS d2,
         |  CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
         |    / len(list_distinct(list_concat(a.grams, b.grams))) AS jaccard
         |FROM d a JOIN d b ON a.lang = b.lang AND a.bucket = b.bucket AND a.doc_id < b.doc_id
         |WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
         |    / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.2
         |ORDER BY d1, d2""".stripMargin,

    // np mirrors Dedup.cosinePlanesFor: integer bit-length of the
    // corpus count (length(bin(n)) — no float log2 whose boundary
    // rounding could differ across engines), floored at 8, capped at
    // 24. The probe side keeps the all-flips + vec_id< convention —
    // same candidate set as the engine's up-flip formulation.
    "dedup_embedding_cosine" ->
      s"""WITH $embCosinePairsCtes
         |SELECT v1, v2, cos_sim FROM s WHERE cos_sim >= 0.3
         |ORDER BY v1, v2""".stripMargin,

    // threshold sweep over the same blocked cosine pairs: each edge
    // explodes into the surviving thresholds, pairs counted once per
    // edge (// 2 of the two unnested endpoints), flagged vectors via
    // DISTINCT, corpus total as a scalar subquery
    "dedup_threshold_sweep" ->
      s"""WITH $embCosinePairsCtes,
         |edges AS (SELECT v1, v2, cos_sim FROM s WHERE cos_sim >= 0.3),
         |tt AS (SELECT unnest([CAST(0.3 AS DOUBLE), CAST(0.4 AS DOUBLE),
         |  CAST(0.5 AS DOUBLE), CAST(0.6 AS DOUBLE), CAST(0.7 AS DOUBLE),
         |  CAST(0.8 AS DOUBLE), CAST(0.9 AS DOUBLE),
         |  CAST(0.95 AS DOUBLE)]) AS threshold),
         |x AS (SELECT threshold, unnest([v1, v2]) AS vid
         |      FROM edges, tt WHERE cos_sim >= threshold)
         |SELECT threshold, COUNT(*) // 2 AS n_pairs,
         |  COUNT(DISTINCT vid) AS n_flagged,
         |  round(CAST(COUNT(DISTINCT vid) AS DOUBLE) /
         |    (SELECT CAST(COUNT(*) AS DOUBLE) FROM embeddings), 6) AS dup_rate
         |FROM x GROUP BY 1 ORDER BY threshold""".stripMargin,

    // connected components over the same cosine pairs — the DuckDB
    // side walks the closure with a recursive CTE (min-label ≡ the
    // engine's hash-min propagation fixpoint)
    "dedup_embedding_cc" ->
      s"""WITH RECURSIVE $embCosinePairsCtes,
         |pairs AS (SELECT v1 AS d1, v2 AS d2 FROM s WHERE cos_sim >= 0.3),
         |sym AS MATERIALIZED (SELECT d1, d2 FROM pairs UNION SELECT d2 AS d1, d1 AS d2 FROM pairs),
         |nodes AS (SELECT DISTINCT d1 AS id FROM sym),
         |-- min-label closure seeded from LOCAL MINIMA only (a node
         |-- smaller than all its neighbors; the true component min is
         |-- one), propagating a label only while it is smaller than
         |-- the receiving node — comp(v) ≤ v always, so larger labels
         |-- can never be the final MIN. Identical fixpoint to the
         |-- all-nodes walk, but the closure stays near-linear where
         |-- giant components made the naive walk Σ|C|² rows.
         |seeds AS (SELECT id FROM nodes WHERE NOT EXISTS (
         |  SELECT 1 FROM sym WHERE sym.d1 = nodes.id AND sym.d2 < nodes.id)),
         |walk(id, comp) AS (
         |  SELECT id, id FROM seeds
         |  UNION
         |  SELECT s2.d2, w.comp FROM walk w JOIN sym s2
         |  ON s2.d1 = w.id AND w.comp < s2.d2)
         |SELECT id AS vec_id, MIN(comp) AS comp FROM walk
         |GROUP BY id ORDER BY vec_id""".stripMargin,

    "graph_pagerank" -> graphPagerankSql,

    "ann_bruteforce_topk" -> annBruteforceSql,
    "ann_filtered_topk" -> annFilteredSql,

    // MIPS = the bruteforce machinery without the norm division
    "ann_mips_topk" ->
      s"""WITH e AS ($embDouble),
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
         |c AS (SELECT vec_id, v FROM e WHERE vec_id >= 5),
         |s AS (SELECT qid, vec_id, round(${dot("qv", "v")}, 6) AS score
         |      FROM c CROSS JOIN q),
         |r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY qid
         |        ORDER BY score DESC, vec_id ASC) AS BIGINT) AS rank FROM s)
         |SELECT qid, rank, vec_id, score FROM r WHERE rank <= 3
         |ORDER BY qid, rank""".stripMargin,

    "ann_hybrid_search" -> annHybridSql,

    // learned-quantizer contract gate: exact brute top-1 columns
    // (oracle-recomputable) + the recall verdict pinned TRUE
    "ann_kmeans_recall" ->
      s"""WITH e AS ($embDouble),
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
         |c AS (SELECT vec_id, v FROM e),
         |s AS (SELECT qid, vec_id,
         |    round(${dot("qv", "v")} / (sqrt(${dot("qv", "qv")})
         |      * sqrt(${dot("v", "v")})), 6) AS cos_sim
         |  FROM c CROSS JOIN q WHERE c.vec_id <> q.qid),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
         |    ORDER BY cos_sim DESC, vec_id ASC) AS rank FROM s)
         |SELECT qid, vec_id AS exact_top1, cos_sim AS exact_top1_sim,
         |  TRUE AS recall_ok
         |FROM r WHERE rank = 1 ORDER BY qid""".stripMargin,

    // majority-vote kNN label transfer (round-13 production shape):
    // a ≤KnnSeedCap-vector labeled seed classifies every corpus
    // vector; top-5 cosine seed neighbors (rank ties → smallest seed
    // id), vote ties → smallest label. The cap is INTERPOLATED from
    // the Spark-side constant (round-13 advice: a hardcoded literal
    // here desynchronizes the two sides when the cap changes).
    "knn_classify" ->
      s"""WITH e AS ($embDouble),
         |seed AS (SELECT vec_id AS sid, label AS slabel, v AS sv
         |      FROM e WHERE vec_id < ${graft.operators.Similarity.KnnSeedCap}),
         |c AS (SELECT vec_id, label AS true_label, v FROM e
         |      WHERE vec_id >= ${graft.operators.Similarity.KnnSeedCap}),
         |s AS (SELECT c.vec_id, true_label, sid, slabel,
         |    round(${dot("v", "sv")} / (sqrt(${dot("v", "v")})
         |      * sqrt(${dot("sv", "sv")})), 6) AS cos_sim
         |  FROM c CROSS JOIN seed),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |    ORDER BY cos_sim DESC, sid ASC) AS rank FROM s),
         |v AS (SELECT vec_id, true_label, slabel, COUNT(*) AS votes
         |  FROM r WHERE rank <= 5 GROUP BY 1, 2, 3),
         |p AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |    ORDER BY votes DESC, slabel ASC) AS pr FROM v)
         |SELECT vec_id, true_label, slabel AS pred_label,
         |  CAST(votes AS BIGINT) AS votes,
         |  slabel = true_label AS correct
         |FROM p WHERE pr = 1 ORDER BY vec_id""".stripMargin,

    // binary (sign-bit) quantization ANN: signatures, xor popcount,
    // Hamming shortlist, exact-cosine rerank — the whole pipeline
    // replayed (two 32-bit halves so no shift touches the sign bit)
    "ann_binary_topk" ->
      s"""WITH e AS ($embDouble),
         |s AS (SELECT vec_id,
         |    CAST(list_sum(list_transform(generate_series(1, 32),
         |      i -> CASE WHEN v[i] > 0 THEN CAST(1 AS BIGINT) << (i - 1)
         |           ELSE 0 END)) AS BIGINT) AS sig_lo,
         |    CAST(list_sum(list_transform(generate_series(33, 64),
         |      i -> CASE WHEN v[i] > 0 THEN CAST(1 AS BIGINT) << (i - 33)
         |           ELSE 0 END)) AS BIGINT) AS sig_hi
         |  FROM e),
         |q AS (SELECT vec_id AS qid, sig_lo AS q_lo, sig_hi AS q_hi
         |  FROM s WHERE vec_id < 5),
         |h AS (SELECT s.vec_id, q.qid,
         |    CAST(bit_count(xor(s.sig_lo, q.q_lo))
         |      + bit_count(xor(s.sig_hi, q.q_hi)) AS BIGINT) AS hamming
         |  FROM s CROSS JOIN q WHERE s.vec_id <> q.qid),
         |hr AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
         |    ORDER BY hamming, vec_id) AS hrank FROM h),
         |sl AS (SELECT qid, vec_id, hamming FROM hr
         |       WHERE hrank <= ${graft.operators.Similarity.AnnBinaryShortlist}),
         |qv AS (SELECT vec_id AS qid, v AS qvec FROM e WHERE vec_id < 5),
         |r AS (SELECT sl.qid, sl.vec_id, sl.hamming,
         |    ${cosR("qv.qvec", "ce.v")} AS cos_sim
         |  FROM sl JOIN e ce ON ce.vec_id = sl.vec_id
         |  JOIN qv ON qv.qid = sl.qid),
         |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
         |    ORDER BY cos_sim DESC, vec_id ASC) AS rank FROM r)
         |SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id, hamming, cos_sim
         |FROM rk WHERE rank <= ${graft.operators.Similarity.AnnBinaryK}
         |ORDER BY qid, rank""".stripMargin,

    // char-trigram language profiles (Cavnar–Trenkle): exact integer
    // counts/dots/norms (profile norms in HUGEINT), scalar-double
    // cosine, argmax ties on the language code
    "text_char_trigram_langid" ->
      """WITH d AS (SELECT doc_id, lang, text FROM documents
        |  WHERE strlen(text) >= 3),
        |tr AS (SELECT doc_id, lang, substr(text, CAST(u.i AS INT), 3) AS tri
        |  FROM d, LATERAL UNNEST(generate_series(1, strlen(text) - 2))
        |    AS u(i)),
        |dt AS (SELECT doc_id, lang, tri, COUNT(*) AS cnt
        |  FROM tr GROUP BY 1, 2, 3),
        |p AS (SELECT lang AS plang, tri, COUNT(*) AS pcnt
        |  FROM tr GROUP BY 1, 2),
        |dn AS (SELECT doc_id, SUM(cnt * cnt) AS dn2 FROM dt GROUP BY 1),
        |pn AS (SELECT plang, SUM(CAST(pcnt AS HUGEINT) * pcnt) AS pn2
        |  FROM p GROUP BY 1),
        |dd AS (SELECT dt.doc_id, dt.lang, p.plang,
        |    SUM(dt.cnt * p.pcnt) AS dotp
        |  FROM dt JOIN p USING (tri) GROUP BY 1, 2, 3),
        |c AS (SELECT dd.doc_id, dd.lang, dd.plang,
        |    round(CAST(dotp AS DOUBLE) / (sqrt(CAST(dn2 AS DOUBLE))
        |      * sqrt(CAST(pn2 AS DOUBLE))), 6) AS cos_sim
        |  FROM dd JOIN dn USING (doc_id) JOIN pn USING (plang)),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |    ORDER BY cos_sim DESC, plang ASC) AS rk FROM c)
        |SELECT doc_id, lang, plang AS pred_lang, cos_sim,
        |  lang = plang AS correct
        |FROM r WHERE rk = 1 ORDER BY doc_id""".stripMargin,

    // per-sample clipping screen: threshold count + ppm + the longest
    // clipped run via gaps-and-islands (the portable spelling of the
    // engine's in-map fold)
    "mm_audio_clipping" ->
      """WITH b AS (SELECT d.doc_id, u.i AS pos,
        |    CASE WHEN ascii(substr(d.text, CAST(u.i AS INT), 1)) >= 120
        |      THEN 1 ELSE 0 END AS clipped
        |  FROM documents d,
        |       LATERAL UNNEST(generate_series(1, strlen(d.text))) AS u(i)),
        |runs AS (SELECT doc_id, pos - ROW_NUMBER() OVER (
        |    PARTITION BY doc_id ORDER BY pos) AS grp
        |  FROM b WHERE clipped = 1),
        |mx AS (SELECT doc_id, MAX(run) AS max_run FROM (
        |    SELECT doc_id, grp, COUNT(*) AS run FROM runs GROUP BY 1, 2)
        |  GROUP BY doc_id)
        |SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_samples,
        |  CAST(SUM(clipped) AS BIGINT) AS n_clipped,
        |  CAST(SUM(clipped) * 1000000 // COUNT(*) AS BIGINT) AS clip_ppm,
        |  CAST(COALESCE(MAX(mx.max_run), 0) AS BIGINT) AS max_clip_run
        |FROM b LEFT JOIN mx ON mx.doc_id = b.doc_id
        |GROUP BY b.doc_id
        |ORDER BY b.doc_id""".stripMargin,

    // REAL PNG decode: the Spark side encodes a deterministic
    // grayscale image to actual PNG bytes and decodes them back with
    // javax.imageio; this oracle computes the SAME pixel stats in
    // closed form without ever touching a PNG — any decode fault
    // (wrong sample, raster, dims) breaks the hash
    "mm_png_decode" ->
      """WITH dims AS (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
        |  FROM documents),
        |px AS (SELECT doc_id, w, h,
        |    (31 * doc_id + 7 * xx.x + 13 * yy.y) % 256 AS v
        |  FROM dims,
        |       unnest(range(0, 17)) AS xx(x), unnest(range(0, 15)) AS yy(y)
        |  WHERE xx.x < w AND yy.y < h)
        |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(SUM(v) AS BIGINT) AS sum_luma,
        |  round(CAST(SUM(v) AS DOUBLE) / (w * h), 6) AS mean_luma
        |FROM px GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin,

    // REAL WAV decode: the Spark side containerizes deterministic
    // PCM16 as actual RIFF/WAVE bytes and parses them back with
    // javax.sound.sampled (frame count / rate / depth from the
    // DECODED AudioFormat, the sum from the decoded data chunk);
    // the closed form here never sees a WAV
    "mm_wav_decode" ->
      """WITH dims AS (SELECT doc_id, 64 + doc_id % 65 AS n FROM documents),
        |sm AS (SELECT doc_id, n,
        |    SUM((7 * doc_id + 13 * ii.i) % 65536 - 32768) AS s
        |  FROM dims, unnest(range(0, 129)) AS ii(i)
        |  WHERE ii.i < n GROUP BY doc_id, n)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_frames,
        |  CAST(8000 AS BIGINT) AS sample_rate, CAST(16 AS BIGINT) AS bits,
        |  CAST(s AS BIGINT) AS sum_pcm
        |FROM sm ORDER BY doc_id""".stripMargin,

    "mm_features" ->
      """SELECT doc_id,
        |  CAST(strlen(text) AS BIGINT) AS byte_len,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(generate_series(1, length(text)),
        |        i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS checksum,
        |  round(CAST(list_sum(list_transform(generate_series(1, length(text)),
        |      i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))) AS DOUBLE)
        |    / strlen(text), 6) AS brightness
        |FROM documents ORDER BY doc_id""".stripMargin,

    "ann_ivf_topk" -> annIvfSql,

    // IVF-PQ with residual encoding: coarse cells + probes are the
    // annIvfSql machinery verbatim; residual r = v - centroid
    // elementwise; the PQ codebook samples the residuals of the
    // stride-1 id class; encode/ADC are the ann_pq_topk machinery
    // keyed additionally by cell.
    "ann_ivfpq_topk" ->
      s"""WITH e AS ($embDouble),
         |st AS (SELECT CAST(ceil((max(vec_id) + 1) / 16.0) AS BIGINT) AS stride FROM e),
         |c AS (SELECT vec_id AS cell, v AS cv FROM e
         |      WHERE vec_id % (SELECT stride FROM st) = 0),
         |a AS (SELECT e.vec_id, e.v, c.cell, c.cv, ${cosR("e.v", "c.cv")} AS sim
         |      FROM e CROSS JOIN c),
         |a1 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |         ORDER BY sim DESC, cell ASC) AS rn FROM a),
         |res AS (SELECT vec_id, cell,
         |          list_transform(generate_series(1, len(v)), i -> v[i] - cv[i]) AS r
         |        FROM a1 WHERE rn = 1),
         |pqcb AS (SELECT m, vec_id AS code,
         |           list_slice(r, CAST(m*16+1 AS INT), CAST(m*16+16 AS INT)) AS pv
         |         FROM res, UNNEST([0,1,2,3]) AS t(m)
         |         WHERE vec_id % (SELECT stride FROM st) = (SELECT stride - 1 FROM st)),
         |rsub AS (SELECT vec_id, cell, m,
         |           list_slice(r, CAST(m*16+1 AS INT), CAST(m*16+16 AS INT)) AS rs
         |         FROM res, UNNEST([0,1,2,3]) AS t(m) WHERE vec_id >= 5),
         |cd AS (SELECT rsub.vec_id, rsub.cell, rsub.m, pqcb.code,
         |         round((${dot("rs", "rs")} + ${dot("pv", "pv")})
         |               - (2 * ${dot("rs", "pv")}), 6) AS sqd
         |       FROM rsub JOIN pqcb ON rsub.m = pqcb.m),
         |codes AS (SELECT vec_id, cell, m, code FROM (
         |            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m
         |              ORDER BY sqd ASC, code ASC) AS rn FROM cd)
         |          WHERE rn = 1),
         |q AS (SELECT e.vec_id AS qid, c.cell, ${cosR("e.v", "c.cv")} AS sim,
         |        list_transform(generate_series(1, len(e.v)), i -> e.v[i] - c.cv[i]) AS qr
         |      FROM e CROSS JOIN c WHERE e.vec_id < 5),
         |probes AS (SELECT qid, cell, qr FROM (
         |             SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
         |               ORDER BY sim DESC, cell ASC) AS rn FROM q)
         |           WHERE rn <= 2),
         |qsub AS (SELECT qid, cell, m,
         |           list_slice(qr, CAST(m*16+1 AS INT), CAST(m*16+16 AS INT)) AS qs
         |         FROM probes, UNNEST([0,1,2,3]) AS t(m)),
         |qt AS (SELECT qid, cell, qsub.m, pqcb.code,
         |         round((${dot("qs", "qs")} + ${dot("pv", "pv")})
         |               - (2 * ${dot("qs", "pv")}), 6) AS t
         |       FROM qsub JOIN pqcb ON qsub.m = pqcb.m),
         |adc AS (SELECT qt.qid, codes.vec_id, codes.cell,
         |          round(CAST(SUM(CAST(qt.t AS DECIMAL(30,12))) AS DOUBLE), 6) AS adc_dist
         |        FROM codes JOIN qt ON codes.cell = qt.cell
         |          AND codes.m = qt.m AND codes.code = qt.code
         |        GROUP BY qt.qid, codes.vec_id, codes.cell),
         |r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY qid
         |        ORDER BY adc_dist ASC, vec_id ASC) AS BIGINT) AS rank FROM adc)
         |SELECT qid, rank, vec_id, adc_dist, cell FROM r WHERE rank <= 3
         |ORDER BY qid, rank""".stripMargin,

    // product quantization (4 subspaces x 16 dims, 16 codes): codes =
    // argmin squared-L2 per subspace against the stride-sampled
    // codebook slices; ADC = exact decimal sum of the 4 table lookups.
    // sqL2 spelled (dot(a,a)+dot(b,b)) - (2*dot(a,b)) with the shared
    // left-fold dot - the same parenthesization the Spark side uses.
    "ann_pq_topk" ->
      s"""WITH e AS ($embDouble),
         |st AS (SELECT CAST(ceil((max(vec_id) + 1) / 16.0) AS BIGINT) AS stride FROM e),
         |cb AS (SELECT m, vec_id AS code,
         |         list_slice(v, CAST(m*16+1 AS INT), CAST(m*16+16 AS INT)) AS cv
         |       FROM e, UNNEST([0,1,2,3]) AS t(m)
         |       WHERE vec_id % (SELECT stride FROM st) = 0),
         |vsub AS (SELECT vec_id, m,
         |           list_slice(v, CAST(m*16+1 AS INT), CAST(m*16+16 AS INT)) AS vs
         |         FROM e, UNNEST([0,1,2,3]) AS t(m) WHERE vec_id >= 5),
         |cd AS (SELECT vsub.vec_id, vsub.m, cb.code,
         |         round((${dot("vs", "vs")} + ${dot("cv", "cv")})
         |               - (2 * ${dot("vs", "cv")}), 6) AS sqd
         |       FROM vsub JOIN cb ON vsub.m = cb.m),
         |codes AS (SELECT vec_id, m, code FROM (
         |            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m
         |              ORDER BY sqd ASC, code ASC) AS rn FROM cd)
         |          WHERE rn = 1),
         |qsub AS (SELECT vec_id AS qid, m,
         |           list_slice(v, CAST(m*16+1 AS INT), CAST(m*16+16 AS INT)) AS qs
         |         FROM e, UNNEST([0,1,2,3]) AS t(m) WHERE vec_id < 5),
         |qt AS (SELECT qid, qsub.m, cb.code,
         |         round((${dot("qs", "qs")} + ${dot("cv", "cv")})
         |               - (2 * ${dot("qs", "cv")}), 6) AS t
         |       FROM qsub JOIN cb ON qsub.m = cb.m),
         |adc AS (SELECT qt.qid, codes.vec_id,
         |          round(CAST(SUM(CAST(qt.t AS DECIMAL(30,12))) AS DOUBLE), 6) AS adc_dist
         |        FROM codes JOIN qt ON codes.m = qt.m AND codes.code = qt.code
         |        GROUP BY qt.qid, codes.vec_id),
         |r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY qid
         |        ORDER BY adc_dist ASC, vec_id ASC) AS BIGINT) AS rank FROM adc)
         |SELECT qid, rank, vec_id, adc_dist FROM r WHERE rank <= 3
         |ORDER BY qid, rank""".stripMargin,

    // frame pipeline: 256-byte chunks, every 2nd frame, subsample to
    // 128 bytes via truncating index map (i*len)//128, integer
    // features over the resized bytes — mirrors Multimodal.frameSample
    // + resizeStub exactly (ASCII corpus: ascii() == byte)
    "mm_frame_pipeline" ->
      """WITH f AS (
        |  SELECT doc_id, fi AS frame_idx,
        |    substr(text, CAST(fi * 256 + 1 AS INT), 256) AS chunk
        |  FROM documents,
        |    UNNEST(generate_series(0, CAST(ceil(strlen(text) / 256.0) AS BIGINT) - 1)) AS t(fi)
        |  WHERE fi % 2 = 0),
        |r AS (
        |  SELECT doc_id, frame_idx,
        |    list_transform(generate_series(0, 127), i ->
        |      CAST(ascii(substr(chunk, CAST((i * strlen(chunk)) // 128 AS INT) + 1, 1)) AS BIGINT)) AS rb
        |  FROM f)
        |SELECT doc_id, frame_idx, CAST(list_sum(rb) AS BIGINT) AS byte_sum,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), rb),
        |    (a, x) -> (a * 31 + x) % 1000000007) AS checksum
        |FROM r ORDER BY doc_id, frame_idx""".stripMargin,

    // the frame-pipeline chunking + a 16-bit per-frame pHash
    // (threshold vs frame mean, exact IEEE); consecutive-pair
    // hamming ≤ 4 → near-dup; one row per ≥2-frame payload
    "mm_frame_dup_rate" ->
      """WITH f AS (
        |  SELECT doc_id, fi,
        |    substr(text, CAST(fi * 256 + 1 AS INT), 256) AS chunk
        |  FROM documents,
        |    UNNEST(generate_series(0, CAST(ceil(strlen(text) / 256.0) AS BIGINT) - 1)) AS t(fi)),
        |px AS (
        |  SELECT doc_id, fi,
        |    list_transform(generate_series(0, 15), j ->
        |      CAST(ascii(substr(chunk,
        |        CAST(floor(j * strlen(chunk) / 16.0) AS INT) + 1, 1)) AS BIGINT)) AS p
        |  FROM f),
        |h AS (
        |  SELECT doc_id, fi,
        |    CAST(list_sum(list_transform(generate_series(0, 15), j ->
        |      CASE WHEN CAST(p[j+1] AS DOUBLE)
        |             >= CAST(list_sum(p) AS DOUBLE) / 16.0
        |           THEN power(2, j) ELSE 0.0 END)) AS BIGINT) AS fhash
        |  FROM px),
        |pr AS (
        |  SELECT doc_id, fhash,
        |    lag(fhash) OVER (PARTITION BY doc_id ORDER BY fi) AS prev
        |  FROM h),
        |d AS (SELECT doc_id,
        |    CAST(CASE WHEN bit_count(xor(fhash, prev)) <= 4
        |         THEN 1 ELSE 0 END AS BIGINT) AS is_dup
        |  FROM pr WHERE prev IS NOT NULL)
        |SELECT doc_id, COUNT(*) + 1 AS n_frames, COUNT(*) AS n_pairs,
        |  CAST(SUM(is_dup) AS BIGINT) AS n_dups,
        |  round(CAST(SUM(is_dup) AS DOUBLE) / COUNT(*), 6) AS dup_rate
        |FROM d GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "ann_lsh_topk" ->
      s"""WITH e AS ($embDouble),
         |b AS ($signBucket FROM e),
         |p AS (SELECT vec_id AS qid, v AS qv,
         |  unnest(list_concat([bucket],
         |    list_transform(generate_series(0, 7), j -> xor(bucket, 1 << j)))) AS probe_bucket
         |  FROM b WHERE vec_id < 5),
         |s AS (SELECT p.qid, b.vec_id, ${cosR("p.qv", "b.v")} AS cos_sim
         |      FROM b JOIN p ON b.bucket = p.probe_bucket AND b.vec_id <> p.qid),
         |r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY qid
         |        ORDER BY cos_sim DESC, vec_id ASC) AS BIGINT) AS rank FROM s)
         |SELECT qid, rank, vec_id, cos_sim FROM r WHERE rank <= 3
         |ORDER BY qid, rank""".stripMargin,

    "ann_range_search" ->
      s"""WITH e AS ($embDouble),
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
         |c AS (SELECT vec_id, v FROM e WHERE vec_id >= 5),
         |s AS (SELECT qid, vec_id, ${cosR("qv", "v")} AS cos_sim FROM c CROSS JOIN q)
         |SELECT qid, vec_id, cos_sim FROM s WHERE cos_sim >= 0.3
         |ORDER BY qid, vec_id""".stripMargin,

    "emb_quantize_int8" ->
      s"""WITH e AS ($embDouble),
         |b AS (SELECT vec_id, label, v,
         |        list_min(v) AS mn, list_max(v) AS mx,
         |        CASE WHEN list_max(v) = list_min(v) THEN CAST(1.0 AS DOUBLE)
         |             ELSE (list_max(v) - list_min(v)) / 255.0 END AS scale
         |      FROM e),
         |qz AS (SELECT vec_id, label, v, mn, mx, scale,
         |         list_transform(v, x -> CAST(round((x - mn) / scale, 0) AS INTEGER)) AS q
         |       FROM b)
         |SELECT vec_id, label, round(mn, 6) AS mn, round(mx, 6) AS mx,
         |  round(list_max(list_transform(generate_series(1, len(v)),
         |    i -> abs(v[i] - (mn + q[i] * scale)))), 6) AS max_abs_err,
         |  CAST(len(list_filter(q, c -> c = 0 OR c = 255)) AS INTEGER) AS n_sat
         |FROM qz ORDER BY vec_id""".stripMargin,

    // independent derivation: the engine finds the top word as the
    // longest run in the sorted token array (map-side HOF); the
    // oracle re-derives it by unnest + GROUP BY. keep compares the
    // ROUNDED fractions on both sides so threshold boundaries are
    // engine-independent.
    "text_repetition" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |tok AS (SELECT doc_id, unnest(w) AS t FROM w),
        |tc AS (SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY doc_id, t),
        |topw AS (SELECT doc_id, MAX(c) AS maxc, CAST(SUM(c) AS BIGINT) AS n
        |         FROM tc GROUP BY doc_id),
        |gr AS (SELECT doc_id,
        |    list_transform(generate_series(1, len(w) - 1),
        |      i -> w[i] || ' ' || w[i+1]) AS bg,
        |    list_transform(generate_series(1, len(w) - 2),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS tg
        |  FROM w)
        |SELECT topw.doc_id, topw.n AS n_tokens,
        |  round(CAST(topw.maxc AS DOUBLE) / topw.n, 6) AS top_word_frac,
        |  round(1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg), 6)
        |    AS dup_bigram_frac,
        |  round(1.0 - CAST(len(list_distinct(tg)) AS DOUBLE) / len(tg), 6)
        |    AS dup_trigram_frac,
        |  CAST(round(CAST(topw.maxc AS DOUBLE) / topw.n, 6) <= 0.15
        |    AND round(1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg), 6)
        |      <= 0.10 AS INTEGER) AS keep
        |FROM topw JOIN gr USING (doc_id) ORDER BY doc_id""".stripMargin,

    // ln quantizes to 1e-4 before a decimal-routed sum; the
    // TF-IDF keywords: all-integer scoring (tf · ln-quantized idf),
    // so no float ever crosses the engine boundary; ties break on
    // the term, the vocab cap ties on (df DESC, tok)
    "text_keywords_tfidf" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |             FROM documents),
        |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        |dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
        |vocab AS (SELECT tok, df FROM dfreq
        |          ORDER BY df DESC, tok ASC LIMIT 50000),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |s AS (SELECT tf.doc_id, tf.tok, tf.tf, v.df,
        |        tf.tf * CAST(round(ln(
        |          CAST((SELECT n_docs FROM n) AS DOUBLE) / v.df) * 10000)
        |          AS BIGINT) AS score_q
        |      FROM tf JOIN vocab v USING (tok)),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
        |        ORDER BY score_q DESC, tok ASC) AS BIGINT) AS rank
        |      FROM s)
        |SELECT doc_id, rank, tok AS term, tf, df, score_q
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    // token entropy: multiplicities re-derived by unnest + GROUP BY
    // (the Spark side walks the sorted token array — independent
    // formulations); ln quantized at 1e-4 into BIGINT per run, the
    // closing division left unrounded (identical IEEE division of
    // identical integer inputs)
    "text_entropy" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |             FROM documents),
        |c AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2),
        |n AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |        CAST(COUNT(*) AS BIGINT) AS n_distinct
        |      FROM c GROUP BY 1),
        |e AS (SELECT c.doc_id,
        |        CAST(SUM(c.c * CAST(round(
        |          ln(CAST(c.c AS DOUBLE) / n.n_tokens) * 10000) AS BIGINT))
        |          AS BIGINT) AS acc
        |      FROM c JOIN n USING (doc_id) GROUP BY 1)
        |SELECT n.doc_id, n.n_tokens, n.n_distinct,
        |  CAST(n.n_distinct AS DOUBLE) / CAST(n.n_tokens AS DOUBLE) AS ttr,
        |  CAST(-e.acc AS DOUBLE) / CAST(n.n_tokens * 10000 AS DOUBLE)
        |    AS token_entropy,
        |  CAST(CAST(-e.acc AS DOUBLE) / CAST(n.n_tokens * 10000 AS DOUBLE)
        |       >= 2.5 AS INTEGER) AS keep
        |FROM n JOIN e USING (doc_id) ORDER BY doc_id""".stripMargin,

    // cross-entropy is deliberately UNROUNDED (identical IEEE
    // division of identical inputs — rounding it would create exact
    // decimal halfway points where the engines' rounding rules
    // disagree); exp's output rounds to 2 (see textPerplexity's
    // Scaladoc for the boundary-risk arithmetic).
    "text_perplexity" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |             FROM documents),
        |freq AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok),
        |tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS n FROM freq),
        |vocab AS (SELECT tok, cnt FROM freq
        |          ORDER BY cnt DESC, tok ASC LIMIT 50000),
        |scored AS (SELECT t.doc_id,
        |    round(ln(CASE WHEN v.cnt IS NOT NULL
        |                  THEN CAST(v.cnt AS DOUBLE) / (SELECT n FROM tot)
        |                  ELSE 0.5 / (SELECT n FROM tot) END), 4) AS lp,
        |    CASE WHEN v.cnt IS NULL THEN 1 ELSE 0 END AS oov
        |  FROM tok t LEFT JOIN vocab v USING (tok)),
        |per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |    CAST(SUM(oov) AS BIGINT) AS n_oov,
        |    CAST(SUM(CAST(lp AS DECIMAL(28,4))) AS DOUBLE) AS slp
        |  FROM scored GROUP BY doc_id)
        |SELECT doc_id, n_tokens, n_oov,
        |  -slp / n_tokens AS cross_entropy,
        |  round(exp(-slp / n_tokens), 2) AS perplexity,
        |  CAST(round(exp(-slp / n_tokens), 2) <= 31.0 AS INTEGER) AS keep
        |FROM per ORDER BY doc_id""".stripMargin,

    // bigram LM: the same determinism recipe as text_perplexity —
    // integer counts through one exact double division, ln quantized
    // 1e-4, the per-doc sum through DECIMAL (order-free)
    "text_perplexity_bigram" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents WHERE len(string_split(text, ' ')) >= 2),
        |b AS (SELECT doc_id, bg, string_split(bg, ' ')[1] AS w1 FROM (
        |    SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
        |      i -> toks[i] || ' ' || toks[i+1])) AS bg FROM d)),
        |uni AS (SELECT w1, COUNT(*) AS cnt1 FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w1 FROM documents)
        |  GROUP BY w1),
        |freq2 AS (SELECT bg, COUNT(*) AS cnt2 FROM b GROUP BY bg),
        |vocab2 AS (SELECT bg, cnt2 FROM freq2
        |           ORDER BY cnt2 DESC, bg ASC LIMIT 50000),
        |scored AS (SELECT b.doc_id,
        |    round(ln(CASE WHEN v.cnt2 IS NOT NULL
        |                  THEN CAST(v.cnt2 AS DOUBLE) ELSE 0.5 END
        |      / CAST(u.cnt1 AS DOUBLE)), 4) AS lp,
        |    CASE WHEN v.cnt2 IS NULL THEN 1 ELSE 0 END AS oov
        |  FROM b LEFT JOIN vocab2 v USING (bg) JOIN uni u USING (w1)),
        |per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |    CAST(SUM(oov) AS BIGINT) AS n_oov,
        |    CAST(SUM(CAST(lp AS DECIMAL(28,4))) AS DOUBLE) AS slp
        |  FROM scored GROUP BY doc_id)
        |SELECT doc_id, n_bigrams, n_oov,
        |  -slp / n_bigrams AS cross_entropy,
        |  round(exp(-slp / n_bigrams), 2) AS perplexity,
        |  CAST(round(exp(-slp / n_bigrams), 2) <= 31.0 AS INTEGER) AS keep
        |FROM per ORDER BY doc_id""".stripMargin,

    // BM25: the idf is ln-quantized at 1e-4 (the text_perplexity
    // recipe); every other step is IEEE double arithmetic from
    // integers in the same written association as the engine, so the
    // scores agree bit-for-bit before the display rounding. Float
    // constants that are inexact in binary (1.2, 2.2) only ever
    // multiply DOUBLE operands — DuckDB's decimal literal then
    // converts to the same nearest double Spark's literal is.
    "text_bm25_topk" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |dl AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM d),
        |st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
        |    CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl,
        |    CAST(SUM(CASE WHEN list_contains(toks, 'spark') THEN 1 ELSE 0 END) AS DOUBLE) AS df_0,
        |    CAST(SUM(CASE WHEN list_contains(toks, 'join') THEN 1 ELSE 0 END) AS DOUBLE) AS df_1,
        |    CAST(SUM(CASE WHEN list_contains(toks, 'window') THEN 1 ELSE 0 END) AS DOUBLE) AS df_2,
        |    CAST(SUM(CASE WHEN list_contains(toks, 'fast') THEN 1 ELSE 0 END) AS DOUBLE) AS df_3
        |  FROM dl),
        |tf AS (SELECT doc_id, dl,
        |    CAST(len(list_filter(toks, x -> x = 'spark')) AS DOUBLE) AS tf_0,
        |    CAST(len(list_filter(toks, x -> x = 'join')) AS DOUBLE) AS tf_1,
        |    CAST(len(list_filter(toks, x -> x = 'window')) AS DOUBLE) AS tf_2,
        |    CAST(len(list_filter(toks, x -> x = 'fast')) AS DOUBLE) AS tf_3
        |  FROM dl)
        |SELECT doc_id, dl,
        |  CAST(tf_0 AS BIGINT) AS tf_0, CAST(tf_1 AS BIGINT) AS tf_1,
        |  CAST(tf_2 AS BIGINT) AS tf_2, CAST(tf_3 AS BIGINT) AS tf_3,
        |  round(
        |    round(ln((n_docs - df_0 + 0.5) / (df_0 + 0.5) + 1.0), 4)
        |      * (tf_0 * 2.2) / (tf_0 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
        |    + round(ln((n_docs - df_1 + 0.5) / (df_1 + 0.5) + 1.0), 4)
        |      * (tf_1 * 2.2) / (tf_1 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
        |    + round(ln((n_docs - df_2 + 0.5) / (df_2 + 0.5) + 1.0), 4)
        |      * (tf_2 * 2.2) / (tf_2 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
        |    + round(ln((n_docs - df_3 + 0.5) / (df_3 + 0.5) + 1.0), 4)
        |      * (tf_3 * 2.2) / (tf_3 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)),
        |  4) AS score
        |FROM tf, st
        |ORDER BY score DESC, doc_id ASC
        |LIMIT 20""".stripMargin,

    // df counts DISTINCT docs per span string (the engine's hashed
    // distinct+count over 8-byte keys — identical absent xxhash64
    // collisions, vanishing at test scale); the engine's per-doc
    // counts keep multiplicity, mirrored here by joining the raw
    // span stream back to the df table.
    "dedup_span_exact" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sp AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 7),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' ||
        |         w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7])) AS s
        |  FROM w WHERE len(w) >= 8),
        |dfq AS (SELECT s, COUNT(DISTINCT doc_id) AS df FROM sp GROUP BY s),
        |per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
        |    CAST(COUNT(CASE WHEN df >= 2 THEN 1 END) AS BIGINT) AS n_hot_spans
        |  FROM sp JOIN dfq USING (s) GROUP BY doc_id)
        |SELECT doc_id, n_spans, n_hot_spans,
        |  round(CAST(n_hot_spans AS DOUBLE) / n_spans, 6) AS hot_span_frac,
        |  CAST(round(CAST(n_hot_spans AS DOUBLE) / n_spans, 6) <= 0.5 AS INTEGER)
        |    AS keep
        |FROM per ORDER BY doc_id""".stripMargin,

    // survivor = argmax (len, −doc_id) within each normalized group
    "dedup_keep_best" ->
      """WITH d AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS len,
        |    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_hash
        |  FROM documents),
        |r AS (SELECT content_hash, doc_id, len,
        |    ROW_NUMBER() OVER (PARTITION BY content_hash
        |      ORDER BY len DESC, doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY content_hash) AS n_copies FROM d)
        |SELECT content_hash, len AS keeper_len, doc_id AS keeper, n_copies
        |FROM r WHERE rn = 1 ORDER BY keeper""".stripMargin,

    // all-integer power iteration: exact Gram accumulation + 5
    // unrolled matvec/normalize rounds (sign-explicit trunc division
    // so // matches Spark's DIV on negatives)
    "emb_power_iteration" -> {
      val rounds = (1 to 5).map { i =>
        val (px, y, m, x) = (s"x${i - 1}", s"y$i", s"m$i", s"x$i")
        s"""$y AS (SELECT c.a AS dim, SUM(c.c * $px.v) AS y
           |  FROM c JOIN $px ON c.b = $px.dim GROUP BY 1),
           |$m AS (SELECT GREATEST(MAX(ABS(y)), 1) AS m FROM $y),
           |$x AS (SELECT dim, CASE WHEN y < 0 THEN -((-y * 1000) // m)
           |  ELSE (y * 1000) // m END AS v FROM $y, $m)""".stripMargin
      }.mkString(",\n")
      s"""WITH q AS (SELECT list_transform(embedding,
         |    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
         |  FROM embeddings WHERE vec_id % 5 = 0),
         |c AS (SELECT ai AS a, bi AS b, CAST(SUM(q[ai + 1] * q[bi + 1]) AS BIGINT) AS c
         |  FROM q, generate_series(0, 63) g1(ai), generate_series(0, 63) g2(bi)
         |  GROUP BY 1, 2),
         |x0 AS (SELECT g AS dim, 1000::BIGINT AS v FROM generate_series(0, 63) t(g)),
         |$rounds
         |SELECT CAST(dim AS BIGINT) AS dim, CAST(v AS BIGINT) AS component_scaled
         |FROM x5 ORDER BY dim""".stripMargin
    },

    // quantized-norm outliers: integer mean/var/±2σ test, identical
    // trunc arithmetic both engines; the norm is the adjudicated
    // bit-identical list_dot_product fold
    "emb_norm_outliers" ->
      """WITH n AS (SELECT label,
        |    CAST(round(sqrt(list_dot_product(vv, vv)) * 10000) AS BIGINT) AS nq
        |  FROM (SELECT label, list_transform(embedding,
        |      x -> CAST(x AS DOUBLE)) AS vv FROM embeddings) t),
        |s AS (SELECT label, COUNT(*) AS n, CAST(SUM(nq) AS BIGINT) AS s,
        |    CAST(SUM(nq * nq) AS BIGINT) AS ssq,
        |    MIN(nq) AS mn, MAX(nq) AS mx FROM n GROUP BY 1),
        |s2 AS (SELECT *, s // n AS mu,
        |    (ssq // n) - (s // n) * (s // n) AS var_int FROM s)
        |SELECT n.label, MIN(s2.n) AS n_vectors,
        |  COUNT(CASE WHEN (nq - mu) * (nq - mu) > 4 * var_int THEN 1 END)
        |    AS n_outliers,
        |  MIN(mu) AS mean_norm_q, MIN(mn) AS min_norm_q, MIN(mx) AS max_norm_q
        |FROM n JOIN s2 USING (label) GROUP BY 1 ORDER BY label""".stripMargin,

    "text_hapax_ratio" ->
      """WITH t AS (SELECT source, unnest(string_split(lower(text), ' ')) AS tok
        |  FROM documents),
        |c AS (SELECT source, tok, COUNT(*) AS c FROM t GROUP BY 1, 2)
        |SELECT source, COUNT(*) AS vocab,
        |  COUNT(CASE WHEN c = 1 THEN 1 END) AS hapax,
        |  CAST(SUM(c) AS BIGINT) AS n_tokens,
        |  COUNT(CASE WHEN c = 1 THEN 1 END) * 1000000 // COUNT(*) AS hapax_ppm
        |FROM c GROUP BY 1 ORDER BY source""".stripMargin,

    "text_word_len_hist" ->
      """WITH l AS (SELECT CAST(length(tok) AS BIGINT) AS len, tok FROM
        |    (SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents) t)
        |SELECT len, COUNT(*) AS n, COUNT(DISTINCT tok) AS n_distinct,
        |  COUNT(*) * 1000000 // (SELECT COUNT(*) FROM l) AS share_ppm
        |FROM l GROUP BY len ORDER BY len""".stripMargin,

    // PMI's log is monotone → rank by the exact scaled rational; the
    // two zipped unnests are DuckDB's aligned-list explode
    "text_bigram_pmi" ->
      """WITH w AS (SELECT string_split(lower(text), ' ') AS w FROM documents),
        |b AS (SELECT unnest(w[1:len(w) - 1]) AS w1, unnest(w[2:len(w)]) AS w2
        |  FROM w WHERE len(w) >= 2),
        |cab AS (SELECT w1, w2, COUNT(*) AS c_ab FROM b GROUP BY 1, 2),
        |ca AS (SELECT w1, COUNT(*) AS c_a FROM b GROUP BY 1),
        |cb AS (SELECT w2, COUNT(*) AS c_b FROM b GROUP BY 1),
        |nn AS (SELECT COUNT(*) AS nb FROM b)
        |SELECT w1, w2, c_ab,
        |  CAST(c_ab * nb * 1000000 // (c_a * c_b) AS BIGINT) AS pmi_ratio_ppm
        |FROM cab JOIN ca USING (w1) JOIN cb USING (w2), nn
        |WHERE c_ab >= 5
        |ORDER BY pmi_ratio_ppm DESC, w1, w2 LIMIT 20""".stripMargin,

    "pipeline_quality_sweep" ->
      s"""WITH scored AS (SELECT
         |    round((CAST($ws AS DOUBLE) / (CAST($ws AS DOUBLE) + 50.0))
         |      * (1.0 - CAST($stopHits AS DOUBLE) / $ws), 6) AS score,
         |    CAST($ws AS BIGINT) AS toks FROM documents),
         |tot AS (SELECT COUNT(*) AS total_docs, CAST(SUM(toks) AS BIGINT)
         |    AS total_toks FROM scored),
         |x AS (SELECT t.threshold, toks FROM scored
         |  CROSS JOIN (SELECT unnest(list_transform([0.0, 0.1, 0.2, 0.3, 0.4,
         |    0.5, 0.6, 0.7, 0.8, 0.9], x -> CAST(x AS DOUBLE))) AS threshold) t
         |  WHERE score >= t.threshold)
         |SELECT threshold, COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS n_tokens,
         |  COUNT(*) * 1000000 // (SELECT total_docs FROM tot) AS doc_share_ppm,
         |  CAST(SUM(toks) * 1000000 // (SELECT total_toks FROM tot) AS BIGINT)
         |    AS token_share_ppm
         |FROM x GROUP BY 1 ORDER BY threshold""".stripMargin,

    "pipeline_token_histogram" ->
      s"""WITH d AS (SELECT CAST($ws AS BIGINT) AS toks FROM documents)
         |SELECT CAST(length(bin(GREATEST(toks, 1))) AS BIGINT) AS bucket,
         |  COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS n_tokens,
         |  MIN(toks) AS min_tokens, MAX(toks) AS max_tokens
         |FROM d GROUP BY 1 ORDER BY bucket""".stripMargin,

    // octet_length(encode(...)): the engine measures the BINARY
    // payload's bytes — char length would silently diverge on the
    // first non-ASCII document
    "mm_modality_mixture" ->
      """WITH d AS (SELECT CAST(octet_length(encode(text)) AS BIGINT) AS nbytes,
        |    ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS BIGINT)] AS modality
        |  FROM documents)
        |SELECT modality, COUNT(*) AS n_records,
        |  CAST(SUM(nbytes) AS BIGINT) AS total_bytes,
        |  CAST(SUM(nbytes) AS BIGINT) // COUNT(*) AS mean_bytes,
        |  MIN(nbytes) AS min_bytes, MAX(nbytes) AS max_bytes
        |FROM d GROUP BY 1 ORDER BY modality""".stripMargin,

    "mm_aspect_stats" ->
      """WITH d AS (SELECT CAST(n_chars % 640 AS BIGINT) AS w,
        |    CAST(n_chars % 480 AS BIGINT) AS h FROM documents)
        |SELECT CASE WHEN h = 0 THEN -1 ELSE (w * 100) // h END AS aspect_bucket,
        |  COUNT(*) AS n, MIN(w) AS min_w, MAX(w) AS max_w,
        |  MIN(h) AS min_h, MAX(h) AS max_h
        |FROM d GROUP BY 1 ORDER BY aspect_bucket""".stripMargin,

    // FULL simhash oracle (round 11, verdict #8 — ◦→✚): per-token
    // xxhash64 re-derived in HUGEINT arithmetic (see xxh64Ctes; valid
    // for ASCII tokens ≤ 15 bytes — this corpus maxes at 11), the ±1
    // bit votes, the adaptive Manku blocking (tables/thresholds
    // GENERATED from the engine's SimhashBlocking — zero drift), the
    // blocked candidate self-join, and the per-doc verdicts.
    "dedup_simhash" ->
      s"""WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
         |  FROM documents),
         |$xxh64Ctes,
         |$simhashCtes,
         |blocks(nb, tid, p_off, p_size, p_shift) AS (VALUES $simhashBlockRows),
         |$simhashChoose,
         |keys AS (SELECT s.doc_id, s.simhash, b.tid,
         |    SUM(((s.simu // b.p_off) % b.p_size) * b.p_shift) AS bkey
         |  FROM sims s JOIN blocks b ON b.nb = (SELECT nb FROM chosen)
         |  GROUP BY 1, 2, 3),
         |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
         |    CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |  FROM keys a JOIN keys b ON a.tid = b.tid AND a.bkey = b.bkey
         |    AND a.doc_id < b.doc_id),
         |per AS (SELECT u.did AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_candidates,
         |    MIN(hamming) AS min_hamming
         |  FROM (SELECT unnest([d1, d2]) AS did, hamming FROM cand) u
         |  GROUP BY 1)
         |SELECT s.doc_id, s.simhash,
         |  COALESCE(p.n_candidates, 0) AS n_candidates,
         |  COALESCE(p.min_hamming, 64) AS min_hamming,
         |  COALESCE(p.min_hamming, 64) <= 3 AS is_near_dup
         |FROM sims s LEFT JOIN per p USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "text_rare_tokens" ->
      """WITH tok AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
        |             FROM documents),
        |dfreq AS (SELECT tok, COUNT(*) AS df FROM tok GROUP BY tok),
        |perdoc AS (SELECT doc_id, COUNT(*) AS n_distinct_tokens,
        |             COUNT(CASE WHEN df <= 2 THEN 1 END) AS n_rare
        |           FROM tok JOIN dfreq USING (tok) GROUP BY doc_id)
        |SELECT doc_id, n_distinct_tokens, n_rare,
        |  round(CAST(n_rare AS DOUBLE) / n_distinct_tokens, 6) AS rare_ratio
        |FROM perdoc ORDER BY doc_id""".stripMargin,

    "knn_pairs" ->
      s"""WITH e AS ($embDouble),
         |p AS (SELECT vec_id AS qid, label, v AS qv FROM e WHERE vec_id < 50),
         |s AS (SELECT p.qid, p.label, e.vec_id, ${cosR("p.qv", "e.v")} AS cos_sim
         |      FROM e JOIN p ON e.label = p.label AND e.vec_id <> p.qid),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
         |        ORDER BY cos_sim DESC, vec_id ASC) AS rn FROM s)
         |SELECT qid, label, vec_id AS nn_vec_id, cos_sim FROM r WHERE rn = 1
         |ORDER BY qid""".stripMargin,

    "decontaminate_ngram" ->
      s"""WITH g AS (
         |  SELECT DISTINCT doc_id, unnest(list_transform(generate_series(1, len(w) - 4),
         |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])) AS g
         |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
         |  WHERE len(w) >= 5)
         |SELECT t.doc_id,
         |  CAST(COUNT(DISTINCT t.g) AS BIGINT) AS n_shared_grams,
         |  CAST(COUNT(DISTINCT e.doc_id) AS BIGINT) AS n_eval_docs
         |FROM g t JOIN g e ON t.g = e.g AND e.doc_id % 97 = 0
         |WHERE t.doc_id % 97 <> 0
         |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,

    // same eval convention (vec_id % 97), same rounded-cosine
    // arithmetic as the other embedding oracles; the engine's struct
    // max tie-break (max sim, then min eval_id) is the window's
    // (cos DESC, eval_id ASC) first row
    "decontaminate_embedding" ->
      s"""WITH e AS ($embDouble),
         |ev AS (SELECT vec_id AS eval_id, v AS ev FROM e WHERE vec_id % 97 = 0),
         |tr AS (SELECT vec_id, v FROM e WHERE vec_id % 97 <> 0),
         |s AS (SELECT tr.vec_id, eval_id, ${cosR("tr.v", "ev")} AS cos_sim
         |      FROM tr CROSS JOIN ev),
         |r AS (SELECT *,
         |  ROW_NUMBER() OVER (PARTITION BY vec_id
         |                     ORDER BY cos_sim DESC, eval_id ASC) AS rn,
         |  SUM(CASE WHEN cos_sim >= 0.2 THEN 1 ELSE 0 END)
         |    OVER (PARTITION BY vec_id) AS n_close
         |  FROM s)
         |SELECT vec_id, cos_sim AS max_eval_sim, eval_id AS closest_eval_id,
         |  CAST(n_close AS BIGINT) AS n_close,
         |  CAST(cos_sim >= 0.3 AS INTEGER) AS contaminated
         |FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin,

    // pure 64-bit integer arithmetic → bit-identical keys; the
    // per-shard ROW_NUMBER mirrors the engine's per-shard window
    "pipeline_global_shuffle" ->
      """WITH k AS (SELECT doc_id,
        |  (doc_id * 48271 + 12345) % 1000000007 AS sort_key FROM documents)
        |SELECT doc_id, sort_key,
        |  CAST(sort_key % 16 AS INTEGER) AS shard,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY sort_key % 16
        |    ORDER BY sort_key, doc_id) AS BIGINT) AS pos
        |FROM k ORDER BY shard, pos""".stripMargin,

    "dedup_cluster_cc" ->
      s"""WITH RECURSIVE d AS ($grams3),
         |near AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2
         |  FROM d a JOIN d b ON a.lang = b.lang AND a.bucket = b.bucket AND a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
         |      / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.2),
         |h AS (SELECT doc_id, md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS h
         |      FROM documents),
         |exact AS (SELECT a.doc_id AS d1, b.doc_id AS d2
         |          FROM h a JOIN h b ON a.h = b.h AND a.doc_id < b.doc_id),
         |edges AS (SELECT d1, d2 FROM near UNION SELECT d1, d2 FROM exact),
         |sym AS MATERIALIZED (SELECT d1, d2 FROM edges UNION SELECT d2 AS d1, d1 AS d2 FROM edges),
         |nodes AS (SELECT DISTINCT d1 AS id FROM sym),
         |-- local-minima-seeded min-label closure (see the
         |-- dedup_embedding_cc oracle for the argument)
         |seeds AS (SELECT id FROM nodes WHERE NOT EXISTS (
         |  SELECT 1 FROM sym WHERE sym.d1 = nodes.id AND sym.d2 < nodes.id)),
         |walk(id, comp) AS (
         |  SELECT id, id FROM seeds
         |  UNION
         |  SELECT s.d2, w.comp FROM walk w JOIN sym s
         |  ON s.d1 = w.id AND w.comp < s.d2)
         |SELECT id AS doc_id, MIN(comp) AS comp FROM walk
         |GROUP BY id ORDER BY doc_id""".stripMargin,

    // temperature mixing: √-sum routes through DECIMAL(28,12) (double
    // sum order is partition-dependent); everything after the single
    // double cast is the identical IEEE expression on both engines
    "pipeline_data_mixture" ->
      s"""WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
         |w AS (SELECT CAST(SUM(CAST(sqrt(n) AS DECIMAL(28,12))) AS DOUBLE) AS ws FROM c),
         |t AS (SELECT lang, n,
         |  LEAST(n, CAST(FLOOR(1000.0 * sqrt(n) / (SELECT ws FROM w)) AS BIGINT)) AS target_n
         |  FROM c),
         |s AS (SELECT d.lang, COUNT(*) AS sampled_n
         |      FROM (SELECT lang, $fp AS fpv FROM documents) d
         |      JOIN t ON d.lang = t.lang
         |      WHERE d.fpv % t.n < t.target_n GROUP BY d.lang)
         |SELECT t.lang, t.n AS n_docs, t.target_n,
         |  COALESCE(s.sampled_n, 0) AS sampled_n
         |FROM t LEFT JOIN s ON t.lang = s.lang ORDER BY t.lang""".stripMargin,

    // the data_mixture sqrt-weight convention over TOKEN volumes;
    // len(string_split(text, ' ')) ≡ the engine's wsTokens
    // (spaces + 1) exactly
    "pipeline_mixture_epochs" ->
      """WITH a AS (SELECT source, COUNT(*) AS n_docs,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS avail_tokens
        |  FROM documents GROUP BY 1),
        |w AS (SELECT CAST(SUM(CAST(sqrt(avail_tokens) AS DECIMAL(28,12)))
        |        AS DOUBLE) AS ws FROM a)
        |SELECT source, n_docs, avail_tokens,
        |  CAST(FLOOR(1000000.0 * sqrt(avail_tokens) / (SELECT ws FROM w))
        |    AS BIGINT) AS target_tokens,
        |  round(CAST(CAST(FLOOR(1000000.0 * sqrt(avail_tokens)
        |      / (SELECT ws FROM w)) AS BIGINT) AS DOUBLE)
        |    / CAST(avail_tokens AS DOUBLE), 6) AS epochs,
        |  CAST(FLOOR(1000000.0 * sqrt(avail_tokens) / (SELECT ws FROM w))
        |    AS BIGINT) > avail_tokens AS oversampled
        |FROM a ORDER BY source""".stripMargin,

    "pipeline_stratified_sample" ->
      s"""SELECT doc_id, lang, $fp % 100 AS samp_bucket,
         |  CAST(CASE lang WHEN 'en' THEN 20 WHEN 'es' THEN 35 WHEN 'de' THEN 50
         |       WHEN 'fr' THEN 65 ELSE 80 END AS BIGINT) AS keep_rate
         |FROM documents
         |WHERE $fp % 100 < CASE lang WHEN 'en' THEN 20 WHEN 'es' THEN 35
         |      WHEN 'de' THEN 50 WHEN 'fr' THEN 65 ELSE 80 END
         |ORDER BY doc_id""".stripMargin,

    // quality quantized to integer centiles of the SAME rounded
    // double both engines compute; the cumulative window runs over
    // ≤101 bucket rows per language, never the corpus
    "pipeline_token_budget" ->
      s"""WITH scored AS (
         |  SELECT doc_id, lang,
         |    CAST(floor(round((CAST($ws AS DOUBLE) / (CAST($ws AS DOUBLE) + 50.0))
         |        * (1.0 - CAST($stopHits AS DOUBLE) / $ws), 6) * 100) AS INT) AS qb,
         |    CAST(ceil(length(text) / 4.0) AS BIGINT) AS toks,
         |    CAST(CASE WHEN lang = 'en' THEN 8000 ELSE 2500 END AS BIGINT) AS token_budget
         |  FROM documents),
         |bk AS (SELECT lang, token_budget, qb, SUM(toks) AS btoks
         |       FROM scored GROUP BY 1, 2, 3),
         |cum AS (SELECT lang, token_budget, qb,
         |          SUM(btoks) OVER (PARTITION BY lang ORDER BY qb DESC
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - btoks AS start_toks
         |        FROM bk),
         |cut AS (SELECT lang, MIN(qb) AS cutoff_qb FROM cum
         |        WHERE start_toks < token_budget GROUP BY lang)
         |SELECT s.lang, s.token_budget, c.cutoff_qb,
         |  COUNT(*) AS n_docs, CAST(SUM(s.toks) AS BIGINT) AS kept_tokens
         |FROM scored s JOIN cut c ON s.lang = c.lang
         |WHERE s.qb >= c.cutoff_qb
         |GROUP BY 1, 2, 3 ORDER BY s.lang""".stripMargin,

    "pipeline_dataset_card" ->
      s"""SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM($ws) AS BIGINT) AS total_tokens,
         |  CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT) AS n_exact_dups,
         |  round(CAST(SUM(CAST(round((CAST($ws AS DOUBLE) / (CAST($ws AS DOUBLE) + 50.0))
         |      * (1.0 - CAST($stopHits AS DOUBLE) / $ws), 6) AS DECIMAL(18,6))) AS DOUBLE)
         |    / COUNT(*), 6) AS mean_quality,
         |  quantile_disc(CAST(ceil(length(text) / 4.0) AS BIGINT), 0.5) AS p50_bpe_tokens
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "docs_chunking" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w,
        |             len(string_split(text, ' ')) AS nw FROM documents),
        |c AS (SELECT doc_id, w, nw,
        |        CAST(1 + GREATEST(0, CEIL((nw - 256) / 192.0)) AS INT) AS n_chunks FROM d),
        |x AS (SELECT doc_id, w, nw,
        |        unnest(generate_series(0, n_chunks - 1)) AS chunk_idx FROM c)
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |  CAST(len(w[chunk_idx*192+1 : least(chunk_idx*192+256, nw)]) AS BIGINT)
        |    AS n_chunk_tokens,
        |  md5(array_to_string(w[chunk_idx*192+1 : least(chunk_idx*192+256, nw)], ' '))
        |    AS chunk_md5
        |FROM x ORDER BY doc_id, chunk_idx""".stripMargin,

    "pipeline_e2e_corpus" ->
      s"""WITH keepers AS (
         |  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
         |gated AS (
         |  SELECT d.doc_id, d.lang, d.text
         |  FROM documents d JOIN keepers k USING (doc_id)
         |  WHERE round((CAST($ws AS DOUBLE) / (CAST($ws AS DOUBLE) + 50.0))
         |        * (1.0 - CAST($stopHits AS DOUBLE) / $ws), 6) >= 0.3
         |    AND $ws BETWEEN 10 AND 2000),
         |eg AS (
         |  SELECT DISTINCT unnest(list_transform(generate_series(1, len(w) - 4),
         |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])) AS g
         |  FROM (SELECT string_split(text, ' ') AS w FROM documents WHERE doc_id % 97 = 0)
         |  WHERE len(w) >= 5),
         |contaminated AS (
         |  SELECT DISTINCT doc_id FROM (
         |    SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 4),
         |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])) AS g
         |    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM gated)
         |    WHERE len(w) >= 5) t JOIN eg USING (g)),
         |sampled AS (
         |  SELECT doc_id, lang, text FROM gated
         |  WHERE doc_id % 97 <> 0
         |    AND doc_id NOT IN (SELECT doc_id FROM contaminated)
         |    AND $fp % 100 < CASE lang WHEN 'en' THEN 20 WHEN 'es' THEN 35
         |        WHEN 'de' THEN 50 WHEN 'fr' THEN 65 ELSE 80 END),
         |chunks AS (
         |  SELECT doc_id, lang,
         |    CAST(len(w[chunk_idx*192+1 : least(chunk_idx*192+256, nw)]) AS BIGINT)
         |      AS n_chunk_tokens
         |  FROM (
         |    SELECT doc_id, lang, w, nw,
         |      unnest(generate_series(0,
         |        CAST(1 + GREATEST(0, CEIL((nw - 256) / 192.0)) AS INT) - 1)) AS chunk_idx
         |    FROM (SELECT doc_id, lang, string_split(text, ' ') AS w,
         |            len(string_split(text, ' ')) AS nw FROM sampled) d) x)
         |SELECT lang, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_chunks,
         |  CAST(SUM(n_chunk_tokens) AS BIGINT) AS total_chunk_tokens
         |FROM chunks GROUP BY lang ORDER BY lang""".stripMargin,

    "mm_audio_energy" ->
      """SELECT doc_id, window_idx,
        |  CAST(COUNT(*) AS BIGINT) AS n_samples,
        |  CAST(SUM(b * b) AS BIGINT) AS energy
        |FROM (
        |  SELECT d.doc_id, (u.i - 1) // 256 AS window_idx,
        |    CAST(ascii(substr(d.text, CAST(u.i AS INT), 1)) AS BIGINT) AS b
        |  FROM documents d,
        |       LATERAL UNNEST(generate_series(1, strlen(d.text))) AS u(i))
        |GROUP BY 1, 2
        |ORDER BY doc_id, window_idx""".stripMargin,

    // silent = e·256 < 2500000·len (length-scaled integer floor);
    // runs via gaps-and-islands — the portable spelling of the
    // engine's in-map fold
    "mm_silence_detect" ->
      """WITH w AS (SELECT doc_id, window_idx,
        |    CAST(COUNT(*) AS BIGINT) AS len, SUM(b * b) AS e
        |  FROM (
        |    SELECT d.doc_id, (u.i - 1) // 256 AS window_idx,
        |      CAST(ascii(substr(d.text, CAST(u.i AS INT), 1)) AS BIGINT) AS b
        |    FROM documents d,
        |         LATERAL UNNEST(generate_series(1, strlen(d.text))) AS u(i))
        |  GROUP BY 1, 2),
        |s AS (SELECT doc_id, window_idx,
        |    (e * 256 < 2500000 * len) AS silent FROM w),
        |runs AS (SELECT doc_id,
        |    window_idx - ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY window_idx) AS grp
        |  FROM s WHERE silent),
        |runlen AS (SELECT doc_id, grp, CAST(COUNT(*) AS BIGINT) AS rl
        |  FROM runs GROUP BY 1, 2),
        |agg AS (SELECT doc_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_runs,
        |    MAX(rl) AS longest_run FROM runlen GROUP BY 1),
        |tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
        |    CAST(COUNT(CASE WHEN silent THEN 1 END) AS BIGINT) AS n_silent,
        |    MIN(CASE WHEN silent THEN window_idx END) AS first_silent
        |  FROM s GROUP BY 1)
        |SELECT t.doc_id AS doc_id, t.n_windows, t.n_silent,
        |  CAST(COALESCE(a.n_runs, 0) AS BIGINT) AS n_runs,
        |  CAST(COALESCE(a.longest_run, 0) AS BIGINT) AS longest_run,
        |  CAST(COALESCE(t.first_silent, -1) AS BIGINT) AS first_silent_idx
        |FROM tot t LEFT JOIN agg a ON t.doc_id = a.doc_id
        |ORDER BY t.doc_id""".stripMargin,

    // the mm_frame_pipeline sampling verbatim; consecutive sampled
    // pairs by (fi, fi+2); all-integer delta and threshold
    "mm_scene_cuts" ->
      """WITH f AS (
        |  SELECT doc_id, fi AS frame_idx,
        |    substr(text, CAST(fi * 256 + 1 AS INT), 256) AS chunk
        |  FROM documents,
        |    UNNEST(generate_series(0, CAST(ceil(strlen(text) / 256.0) AS BIGINT) - 1)) AS t(fi)
        |  WHERE fi % 2 = 0),
        |fc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_frames
        |       FROM f GROUP BY 1),
        |p AS (SELECT a.doc_id, b.frame_idx AS cut_idx,
        |    CAST(list_sum(list_transform(
        |      generate_series(1, LEAST(strlen(a.chunk), strlen(b.chunk))),
        |      i -> abs(CAST(ascii(substr(a.chunk, CAST(i AS INT), 1)) AS BIGINT)
        |             - CAST(ascii(substr(b.chunk, CAST(i AS INT), 1)) AS BIGINT))))
        |      AS BIGINT) AS delta,
        |    CAST(LEAST(strlen(a.chunk), strlen(b.chunk)) AS BIGINT) AS cmp_len
        |  FROM f a JOIN f b ON a.doc_id = b.doc_id
        |    AND b.frame_idx = a.frame_idx + 2),
        |c AS (SELECT doc_id,
        |    CAST(COUNT(*) FILTER (WHERE delta >= 13 * cmp_len) AS BIGINT)
        |      AS n_cuts,
        |    COALESCE(MIN(cut_idx) FILTER (WHERE delta >= 13 * cmp_len), -1)
        |      AS first_cut_idx
        |  FROM p GROUP BY 1)
        |SELECT fc.doc_id, fc.n_frames,
        |  COALESCE(c.n_cuts, 0) AS n_cuts,
        |  COALESCE(c.first_cut_idx, -1) AS first_cut_idx
        |FROM fc LEFT JOIN c USING (doc_id) ORDER BY doc_id""".stripMargin,

    "mm_phash_dedup" ->
      """WITH r AS (SELECT doc_id,
        |  list_transform(generate_series(0, 31), i ->
        |    CAST(ascii(substr(text,
        |      CAST(floor(i * length(text) / 32.0) AS INT) + 1, 1)) AS BIGINT)) AS px
        |  FROM documents),
        |h AS (SELECT doc_id, px, CAST(list_sum(px) AS DOUBLE) / 32.0 AS mean FROM r),
        |p AS (SELECT doc_id, CAST(list_sum(list_transform(generate_series(0, 31), i ->
        |    CASE WHEN CAST(px[i+1] AS DOUBLE) >= mean THEN power(2, i)
        |         ELSE 0.0 END)) AS BIGINT) AS phash
        |  FROM h)
        |SELECT phash, MIN(doc_id) AS keeper, COUNT(*) AS n_docs
        |FROM p GROUP BY phash ORDER BY keeper""".stripMargin,

    // the mm_phash_dedup hash CTEs + 4×8-bit Manku banding; exact
    // bit_count verify, DISTINCT before the threshold
    "mm_phash_hamming" ->
      """WITH r AS (SELECT doc_id,
        |  list_transform(generate_series(0, 31), i ->
        |    CAST(ascii(substr(text,
        |      CAST(floor(i * length(text) / 32.0) AS INT) + 1, 1)) AS BIGINT)) AS px
        |  FROM documents),
        |h AS (SELECT doc_id, px, CAST(list_sum(px) AS DOUBLE) / 32.0 AS mean FROM r),
        |p AS (SELECT doc_id, CAST(list_sum(list_transform(generate_series(0, 31), i ->
        |    CASE WHEN CAST(px[i+1] AS DOUBLE) >= mean THEN power(2, i)
        |         ELSE 0.0 END)) AS BIGINT) AS phash
        |  FROM h),
        |bands AS (SELECT doc_id, phash, b,
        |    (phash >> (b * 8)) & 255 AS bv
        |  FROM p, UNNEST(generate_series(0, 3)) AS t(b)),
        |cand AS (SELECT DISTINCT a.doc_id AS d1, bb.doc_id AS d2,
        |    CAST(bit_count(xor(a.phash, bb.phash)) AS BIGINT) AS hamming
        |  FROM bands a JOIN bands bb
        |    ON a.b = bb.b AND a.bv = bb.bv AND a.doc_id < bb.doc_id)
        |SELECT d1, d2, hamming FROM cand WHERE hamming <= 3
        |ORDER BY d1, d2""".stripMargin,

    "ann_recall_audit" ->
      s"""WITH exact AS (SELECT * FROM ($annBruteforceSql)),
         |approx AS (SELECT * FROM ($annIvfSql)),
         |hits AS (SELECT e.qid, COUNT(*) AS n_hits
         |         FROM exact e JOIN approx a ON a.qid = e.qid AND a.vec_id = e.vec_id
         |         GROUP BY e.qid)
         |SELECT q.qid, COALESCE(h.n_hits, 0) AS n_hits,
         |  round(COALESCE(h.n_hits, 0) / 3.0, 6) AS recall_at_3
         |FROM (SELECT DISTINCT qid FROM exact) q
         |LEFT JOIN hits h USING (qid) ORDER BY qid""".stripMargin,

    "text_pii_scrub" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(text, '\b(customer|supplier|order)\b')) AS BIGINT) AS n_deny_terms,
        |  md5(regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
        |    '\b(customer|supplier|order)\b', '<TERM>', 'g')) AS scrubbed_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    // nested sqrt on purpose (τ = 1 / 0.5 / 0.25): sqrt is correctly
    // rounded everywhere, libm pow is not; weight sums in DECIMAL
    "pipeline_mixture_temperature" ->
      s"""WITH c AS (SELECT source, CAST(SUM($ws) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY 1),
         |w AS (SELECT source, n_tokens,
         |    CAST(n_tokens AS DOUBLE) AS w100,
         |    sqrt(CAST(n_tokens AS DOUBLE)) AS w50,
         |    sqrt(sqrt(CAST(n_tokens AS DOUBLE))) AS w25 FROM c),
         |s AS (SELECT
         |    CAST(SUM(CAST(w100 AS DECIMAL(28,12))) AS DOUBLE) AS s100,
         |    CAST(SUM(CAST(w50 AS DECIMAL(28,12))) AS DOUBLE) AS s50,
         |    CAST(SUM(CAST(w25 AS DECIMAL(28,12))) AS DOUBLE) AS s25 FROM w)
         |SELECT source, n_tokens,
         |  round(w100 / (SELECT s100 FROM s), 6) AS share_t100,
         |  round(w50 / (SELECT s50 FROM s), 6) AS share_t50,
         |  round(w25 / (SELECT s25 FROM s), 6) AS share_t25
         |FROM w ORDER BY source""".stripMargin,

    "text_tokenizer_fertility" ->
      s"""SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM($ws) AS BIGINT) AS ws_tokens,
         |  CAST(SUM(len(regexp_extract_all(text, '[a-z0-9]+'))) AS BIGINT) AS re_tokens,
         |  CAST(SUM(CAST(ceil(length(text) / 4.0) AS BIGINT)) AS BIGINT) AS bpe_tokens,
         |  round(CAST(SUM(len(regexp_extract_all(text, '[a-z0-9]+'))) AS DOUBLE)
         |    / CAST(SUM($ws) AS DOUBLE), 6) AS re_fertility,
         |  round(CAST(SUM(CAST(ceil(length(text) / 4.0) AS BIGINT)) AS DOUBLE)
         |    / CAST(SUM($ws) AS DOUBLE), 6) AS bpe_fertility
         |FROM documents GROUP BY 1 ORDER BY lang""".stripMargin,

    "pipeline_pii_report" ->
      """WITH d AS (SELECT source,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS ne,
        |  CAST(len(regexp_extract_all(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS BIGINT) AS np,
        |  CAST(len(regexp_extract_all(text, '\b(customer|supplier|order)\b')) AS BIGINT) AS nd
        |  FROM documents)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(ne) AS BIGINT) AS n_emails,
        |  CAST(SUM(np) AS BIGINT) AS n_phones,
        |  CAST(SUM(nd) AS BIGINT) AS n_deny_terms,
        |  COUNT(CASE WHEN ne + np + nd > 0 THEN 1 END) AS n_docs_flagged,
        |  round(CAST(COUNT(CASE WHEN ne + np + nd > 0 THEN 1 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS flag_rate
        |FROM d GROUP BY 1 ORDER BY source""".stripMargin,

    "pipeline_quality_report" ->
      s"""SELECT lang, source,
         |  COUNT(*) AS n_docs,
         |  COUNT(DISTINCT md5(text)) AS n_distinct,
         |  CAST(SUM($ws) AS BIGINT) AS sum_tokens,
         |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
         |  CAST(SUM(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_short
         |FROM documents GROUP BY 1, 2
         |ORDER BY lang, source""".stripMargin,

    "pipeline_dedup_survivors" ->
      """SELECT doc_id, content_hash, cluster_size FROM (
        |  SELECT doc_id, md5(lower(text)) AS content_hash,
        |    COUNT(*) OVER (PARTITION BY md5(lower(text))) AS cluster_size,
        |    ROW_NUMBER() OVER (PARTITION BY md5(lower(text))
        |      ORDER BY n_chars DESC, doc_id) AS rk
        |  FROM documents) t
        |WHERE rk = 1 ORDER BY doc_id""".stripMargin,

    // weights[b] reproduced inline by formula (the engine broadcasts
    // the same values as a materialized table); bucket = the ascii
    // poly-fold mod 1e9+7 mod 4096, byte-identical to the engine's
    // codegen'd rolling hash on this ASCII corpus.
    "text_quality_classifier" -> {
      val poly = (e: String) =>
        s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
           |    list_transform(generate_series(1, length($e)),
           |      ci -> CAST(ascii(substr($e, ci, 1)) AS BIGINT))),
           |    (acc, x) -> (acc * 31 + x) % 1000000007)""".stripMargin
      s"""WITH d AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
         |           FROM documents),
         |f AS (SELECT doc_id,
         |    CAST(len(w) + GREATEST(len(w) - 1, 0) AS BIGINT) AS n_features,
         |    unnest(list_concat(
         |      list_transform(w, tk -> ${poly("tk")} % 4096),
         |      CASE WHEN len(w) >= 2 THEN
         |        list_transform(generate_series(1, len(w) - 1),
         |          bi -> ${poly("(w[bi] || ' ' || w[bi+1])")} % 4096)
         |      ELSE CAST([] AS BIGINT[]) END)) AS bucket
         |  FROM d)
         |SELECT doc_id, n_features,
         |  CAST(SUM(((bucket + 1) * 2654435761 % 1000000007) % 201 - 100)
         |    AS BIGINT) AS raw_score,
         |  round(CAST(SUM(((bucket + 1) * 2654435761 % 1000000007) % 201
         |      - 100) AS DOUBLE) / (n_features * 100), 6) AS quality,
         |  CAST(SUM(((bucket + 1) * 2654435761 % 1000000007) % 201 - 100)
         |    > 0 AS INTEGER) AS keep
         |FROM f GROUP BY doc_id, n_features ORDER BY doc_id""".stripMargin
    },

    // hot spans by span STRING (the engine's 8-byte xxhash64 keys —
    // identical absent hash collisions, as in dedup_span_exact); the
    // excision predicate mirrors the engine's exists() over hot start
    // positions (1-based here, 0-based there — covered sets align).
    "pipeline_span_scrub" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sp0 AS (SELECT doc_id, unnest(generate_series(1, len(w) - 7)) AS i, w
        |        FROM d WHERE len(w) >= 8),
        |sp AS (SELECT doc_id, i,
        |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' ||
        |    w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7] AS s
        |  FROM sp0),
        |hot AS (SELECT s FROM (SELECT s, COUNT(DISTINCT doc_id) AS df
        |                       FROM sp GROUP BY s) WHERE df >= 2),
        |st AS (SELECT doc_id, list(i) AS hs FROM sp JOIN hot USING (s)
        |       GROUP BY doc_id),
        |j AS (SELECT d.doc_id, d.w, COALESCE(st.hs, CAST([] AS BIGINT[])) AS hs
        |      FROM d LEFT JOIN st USING (doc_id)),
        |k AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
        |    list_filter(list_transform(generate_series(1, len(w)), jx ->
        |      CASE WHEN len(list_filter(hs, hx -> jx >= hx AND jx <= hx + 7)) > 0
        |           THEN NULL ELSE w[jx] END), kx -> kx IS NOT NULL) AS kept
        |  FROM j)
        |SELECT doc_id, n_tokens,
        |  CAST(n_tokens - len(kept) AS BIGINT) AS n_scrubbed,
        |  COALESCE(array_to_string(kept, ' '), '') AS scrubbed_text
        |FROM k ORDER BY doc_id""".stripMargin,

    // per-dimension stats over integer micro-unit quantized values;
    // Σv exact BIGINT, Σv² exact DECIMAL(28,0) (scale 0: single
    // rounding into double, no rescale division)
    "emb_dim_stats" ->
      """WITH x AS (SELECT gs.d AS dim,
        |    CAST(round(CAST(embedding[gs.d] AS DOUBLE) * 1000000.0, 0) AS BIGINT) AS vi,
        |    CAST(embedding[gs.d] AS DOUBLE) AS v
        |  FROM embeddings, generate_series(1, 64) AS gs(d)),
        |a AS (SELECT dim, COUNT(*) AS n_vecs, SUM(vi) AS s,
        |    CAST(SUM(CAST(vi * vi AS DECIMAL(28,0))) AS DOUBLE) AS sq,
        |    round(MIN(v), 6) AS min_v, round(MAX(v), 6) AS max_v
        |  FROM x GROUP BY 1)
        |SELECT dim, CAST(n_vecs AS BIGINT) AS n_vecs,
        |  round(CAST(s AS DOUBLE) / CAST(n_vecs AS DOUBLE) / 1000000.0, 6) AS mean_v,
        |  round((CAST(n_vecs AS DOUBLE) * sq - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
        |        / (CAST(n_vecs AS DOUBLE) * CAST(n_vecs AS DOUBLE))
        |        / 1000000000000.0, 6) AS var_v,
        |  min_v, max_v
        |FROM a ORDER BY dim""".stripMargin,

    // quality-staged curriculum: value thresholds over the rounded
    // rational score (identical doubles both engines — comparisons
    // can never straddle)
    "pipeline_curriculum" ->
      s"""WITH sc AS (SELECT source, CAST($ws AS BIGINT) AS toks,
         |    round((CAST($ws AS DOUBLE) / (CAST($ws AS DOUBLE) + 50.0))
         |          * (1.0 - CAST($stopHits AS DOUBLE) / $ws), 6) AS q
         |  FROM documents),
         |st AS (SELECT source, toks,
         |    CASE WHEN q >= 0.55 THEN 1 WHEN q >= 0.45 THEN 2
         |         WHEN q >= 0.35 THEN 3 ELSE 4 END AS stage FROM sc),
         |a AS (SELECT stage, source, COUNT(*) AS n_docs,
         |    CAST(SUM(toks) AS BIGINT) AS n_tokens FROM st GROUP BY 1, 2)
         |SELECT stage, source, n_docs, n_tokens,
         |  CAST(SUM(n_tokens) OVER (PARTITION BY stage) AS BIGINT) AS stage_tokens,
         |  round(CAST(n_tokens AS DOUBLE)
         |    / CAST(SUM(n_tokens) OVER (PARTITION BY stage) AS DOUBLE), 6) AS stage_share,
         |  CAST(SUM(n_tokens) OVER (ORDER BY stage, source
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
         |FROM a ORDER BY stage, source""".stripMargin,

    // tp/fp/fn from the same confusion aggregate; zero denominators
    // pinned to 0.0 on both engines
    "text_lang_f1" ->
      s"""WITH pr AS (SELECT lang AS labeled,
         |  CASE WHEN $enH >= $esH AND $enH >= $deH AND $enH >= $frH AND $enH > 0 THEN 'en'
         |       WHEN $esH >= $deH AND $esH >= $frH AND $esH > 0 THEN 'es'
         |       WHEN $deH >= $frH AND $deH > 0 THEN 'de'
         |       WHEN $frH > 0 THEN 'fr'
         |       ELSE 'und' END AS pred
         |  FROM documents),
         |c AS (SELECT labeled, pred, COUNT(*) AS n FROM pr GROUP BY 1, 2),
         |tp AS (SELECT labeled AS lang, n AS tp FROM c WHERE labeled = pred),
         |bl AS (SELECT labeled AS lang, CAST(SUM(n) AS BIGINT) AS n_labeled
         |       FROM c GROUP BY 1),
         |bp AS (SELECT pred AS plang, CAST(SUM(n) AS BIGINT) AS n_pred
         |       FROM c GROUP BY 1),
         |j AS (SELECT bl.lang, CAST(COALESCE(tp.tp, 0) AS BIGINT) AS tp,
         |    bl.n_labeled, CAST(COALESCE(bp.n_pred, 0) AS BIGINT) AS n_pred
         |  FROM bl LEFT JOIN tp ON bl.lang = tp.lang
         |  LEFT JOIN bp ON bl.lang = bp.plang),
         |m AS (SELECT *,
         |    CASE WHEN n_pred > 0 THEN CAST(tp AS DOUBLE) / CAST(n_pred AS DOUBLE)
         |         ELSE 0.0 END AS p,
         |    CAST(tp AS DOUBLE) / CAST(n_labeled AS DOUBLE) AS r FROM j)
         |SELECT lang, tp, n_labeled, n_pred,
         |  round(p, 6) AS "precision", round(r, 6) AS recall,
         |  round(CASE WHEN p + r > 0.0 THEN 2.0 * p * r / (p + r)
         |        ELSE 0.0 END, 6) AS f1
         |FROM m ORDER BY lang""".stripMargin,

    // first-seen = MIN(doc_id) per gram string (engine: per hash)
    "text_novelty_curve" ->
      """WITH g AS (SELECT DISTINCT doc_id,
        |    unnest(list_transform(generate_series(1, len(w) - 7),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
        |        || ' ' || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7])) AS g
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 8),
        |f AS (SELECT g, MIN(doc_id) AS first_doc FROM g GROUP BY 1),
        |p AS (SELECT doc_id, COUNT(*) AS n_grams FROM g GROUP BY 1),
        |n AS (SELECT g.doc_id, COUNT(*) AS n_novel FROM g
        |  JOIN f ON g.g = f.g AND g.doc_id = f.first_doc GROUP BY 1)
        |SELECT p.doc_id AS doc_id, p.n_grams,
        |  CAST(COALESCE(n.n_novel, 0) AS BIGINT) AS n_novel,
        |  round(CAST(COALESCE(n.n_novel, 0) AS DOUBLE)
        |    / CAST(p.n_grams AS DOUBLE), 6) AS novelty
        |FROM p LEFT JOIN n ON p.doc_id = n.doc_id
        |ORDER BY p.doc_id""".stripMargin,

    // the oracle joins gram STRINGS; the engine joins 64-bit hashes —
    // agreement is the collision-free check every span op carries
    "pipeline_contamination_matrix" ->
      """WITH g AS (SELECT DISTINCT source,
        |    unnest(list_transform(generate_series(1, len(w) - 7),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
        |        || ' ' || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7])) AS g
        |  FROM (SELECT source, string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 8),
        |tot AS (SELECT source, COUNT(*) AS n_grams FROM g GROUP BY 1),
        |sh AS (SELECT a.source AS source_a, b.source AS source_b,
        |    COUNT(*) AS n_shared
        |  FROM g a JOIN g b ON a.g = b.g AND a.source <> b.source
        |  GROUP BY 1, 2)
        |SELECT ta.source AS source_a, tb.source AS source_b,
        |  COALESCE(sh.n_shared, CAST(0 AS BIGINT)) AS n_shared,
        |  ta.n_grams AS n_grams_a,
        |  round(CAST(COALESCE(sh.n_shared, 0) AS DOUBLE)
        |    / CAST(ta.n_grams AS DOUBLE), 6) AS containment
        |FROM tot ta JOIN tot tb ON ta.source <> tb.source
        |LEFT JOIN sh ON sh.source_a = ta.source AND sh.source_b = tb.source
        |ORDER BY source_a, source_b""".stripMargin
  )
}
