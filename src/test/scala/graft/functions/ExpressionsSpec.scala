package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("DotProductExpr matches the HOF fold bit-for-bit (eval + codegen)") {
    val df = Seq.tabulate(50)(i =>
      (i.toLong, Seq.tabulate(64)(j => math.sin(i * 64 + j)), Seq.tabulate(64)(j => math.cos(i + j))))
      .toDF("id", "a", "b")
    val r = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("fast"),
      VectorFunctions.dotHof(col("a"), col("b")).as("hof")).collect()
    r.foreach { row =>
      assert(row.getDouble(0) === row.getDouble(1), "codegen fold must equal interpreted fold")
    }
  }

  test("RollingHashExpr equals the builtin ascii-fold on ASCII input") {
    val df = Seq("the quick brown fox", "a", "spark graft engine 123").toDF("text")
    val r = df.select(
      GraftExpressions.rollingHash(col("text")).as("fast"),
      TextFunctions.fingerprint(col("text")).as("slow")).collect()
    r.foreach { row =>
      // fingerprint() lower-trims internally; inputs here are already lower/trim
      assert(row.getLong(0) === row.getLong(1))
    }
  }

  test("Murmur2Expr matches Kafka's published murmur2 test vectors") {
    // from the public Apache Kafka client test suite (Utils.murmur2)
    val vectors = Map(
      "21" -> -973932308,
      "foobar" -> -790332482,
      "a-little-bit-long-string" -> -985981536,
      "a-little-bit-longer-string" -> -1486304829,
      "lkjh234lh9fiuh90y23oiuhsafujhadof229phr9h19h89h8" -> -58897971)
    val df = vectors.keys.toSeq.toDF("k")
    val got = df.select(col("k"), GraftExpressions.murmur2(col("k")).as("h"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    vectors.foreach { case (k, expected) =>
      assert(got(k) === expected, s"murmur2($k)")
    }
  }

  test("SQL registration paths expose the functions") {
    graft.plans.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
        "graft_rolling_hash('abc') AS h, graft_murmur2('foobar') AS m").collect()(0)
    assert(r.getAs[Double]("d") === 11.0)
    assert(r.getAs[Long]("h") === "abc".foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L))
    assert(r.getAs[Int]("m") === -790332482)
  }

  test("SQL surface covers simhash64 and the minhash aggregate") {
    graft.plans.GraftFunctions.register(spark)
    val sh = spark.sql("SELECT graft_simhash64(array('spark', 'graft')) AS s").collect()(0).getLong(0)
    val sh2 = spark.sql("SELECT graft_simhash64(array('spark', 'graft')) AS s").collect()(0).getLong(0)
    assert(sh === sh2)
    val ng = spark.sql("SELECT graft_word_ngrams('a b c d', 3) AS g").collect()(0).getSeq[String](0)
    assert(ng === Seq("a b c", "b c d"))
    val sig = spark.sql(
      """SELECT id, graft_minhash(sh, 8) AS sig FROM VALUES
        |  (1, 'aa'), (1, 'bb'), (2, 'aa') AS t(id, sh)
        |GROUP BY id ORDER BY id""".stripMargin).collect()
    assert(sig.length === 2)
    assert(sig(0).getSeq[Long](1).length === 8)
    // doc 2's shingles ⊂ doc 1's → every minimum of doc 2 is ≥ doc 1's
    val s1 = sig(0).getSeq[Long](1); val s2 = sig(1).getSeq[Long](1)
    assert(s1.zip(s2).forall { case (a, b) => a <= b })
  }

  test("kafkaCompatible partitioner routes into [0, n)") {
    val df = (0 until 100).map(i => s"key$i").toDF("k")
      .select(col("k").cast("binary").as("key"))
    val parts = df.select(graft.streaming.Partitioners.kafkaCompatible(12).as("p"))
      .collect().map(_.getInt(0))
    assert(parts.forall(p => p >= 0 && p < 12))
    assert(parts.distinct.length > 1)
  }

  test("WordNgramsExpr matches the builtin split+concat_ws formulation exactly") {
    import graft.functions.TextFunctions
    val fixtures = Seq(
      "the quick brown fox jumps",
      "a b",                       // fewer tokens than n
      "one two three",             // exactly n
      "double  space between",     // empty token kept, as split(" ") does
      "trailing space ",           // trailing empty token kept
      " leading",                  // leading empty token
      "x")
    val df = fixtures.toDF("text")
    val rows = df.select(
      GraftExpressions.wordNgrams(col("text"), 3).as("native"),
      TextFunctions.wordNgrams(col("text"), 3).as("hof")).collect()
    rows.zip(fixtures).foreach { case (r, fx) =>
      assert(r.getSeq[String](0) === r.getSeq[String](1), s"mismatch on '$fx'")
    }
    // duplicates preserved in order
    val dup = Seq("a b a b a b").toDF("text")
      .select(GraftExpressions.wordNgrams(col("text"), 3).as("g")).collect()(0).getSeq[String](0)
    assert(dup === Seq("a b a", "b a b", "a b a", "b a b"))
  }
}
