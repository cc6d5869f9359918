package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Volume soak: the full sf0.1 events table (100k records) through
  * the complete topic lifecycle on 32 partitions — produce, fetch,
  * group consume, compact, retention. Verifies the storage layer's
  * invariants hold beyond toy row counts. */
class VolumeSoakSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("100k-record lifecycle on 32 partitions keeps every invariant") {
    val root = Files.createTempDirectory("graft-soak").toString
    val log = TopicLog.create(spark, root, "soak", 32)

    val events = graft.Tables.events(spark, "/root/testdata/sf0.1")
      .select(
        col("user_id").cast("string").cast("binary").as("key"),
        to_json(struct(col("event_id"), col("event_type"), col("value")))
          .cast("binary").as("value"),
        col("ts"))
    val n = events.count()
    assert(n === 100000L)

    val ends = log.produce(events, Partitioners.byKeyHash(32))
    assert(ends.values.sum === n)
    assert(ends.keys.toSeq.sorted === (0 until 32))

    // offsets contiguous per partition at volume
    val bad = log.read().groupBy("partition")
      .agg(count(lit(1)).as("c"), max("offset").as("hi"), countDistinct("offset").as("d"))
      .filter(col("hi") =!= col("c") - 1 || col("d") =!= col("c"))
      .count()
    assert(bad === 0L, "every partition must be gap-free and duplicate-free")

    // bounded fetch returns exactly the slice
    val slice = log.consume(partition = 7, fromOffset = 100, maxRecords = 250)
    assert(slice.count() === 250)

    // group consume drains exactly once
    log.seekToBeginning("soaker")
    assert(log.consumeNew("soaker").count() === n)
    log.seekToEnd("soaker")
    assert(log.consumeNew("soaker").count() === 0)

    // same key never lands in two partitions (hash routing invariant)
    val split = log.read().groupBy("key")
      .agg(countDistinct("partition").as("p")).filter(col("p") > 1).count()
    assert(split === 0L)

    // compaction keeps exactly one record per key
    val distinctKeys = log.read().select("key").distinct().count()
    log.compact()
    assert(log.read().count() === distinctKeys)
    assert(log.read().groupBy("key").count().filter(col("count") > 1).count() === 0L)
  }
}
