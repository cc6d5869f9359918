package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** A Kafka-model topic log, Spark-native.
  *
  * Re-expresses the reference broker's storage contract
  * (ref: README.md roadmap — Producer API, Consumer API, Topic
  * Management; ref: pkg/kafka/kafka_api.go:85 request dispatch) on a
  * parquet directory layout:
  *
  * {{{
  *   <root>/<topic>/data/partition=N/  parquet records, offset-sorted
  *   <root>/<topic>/_meta.json                   numPartitions
  *   <root>/<topic>/_offsets.json                cached log-end offsets
  *   <root>/<topic>/_groups/<group>.json         committed group offsets
  * }}}
  *
  * Scale design (SURVEY.md §6): `partition` is a physical dir key so
  * fetch prunes to one directory; files are offset-sorted so parquet
  * row-group min/max stats skip everything below `fromOffset`; offset
  * assignment is per-partition-local (base + row_number — no global
  * coordination); compaction/retention rewrite per partition with one
  * shuffle. Single-writer per topic is assumed (as in the reference's
  * single-broker prototype); a multi-writer manifest swap is the
  * round-2 path.
  */
class TopicLog private (
    val spark: SparkSession,
    val root: String,
    val topic: String,
    val numPartitions: Int) {

  import TopicLog._

  def topicDir: String = s"$root/$topic"
  def dataDir: String = s"$topicDir/data"

  private def offsetsFile = Paths.get(s"$topicDir/_offsets.json")
  private def groupFile(group: String) = Paths.get(s"$topicDir/_groups/$group.json")

  /** Produce: route records to partitions, assign per-partition
    * monotonic offsets continuing from the log end, append.
    * `records` needs (value); (key, headers, ts) optional. */
  def produce(records: DataFrame, partitioner: Column = null): Map[Int, Long] = {
    val p = Option(partitioner).getOrElse(Partitioners.byKeyHash(numPartitions))
    val base = logEndOffsets()
    val withMissing = Seq(
      "key" -> lit(null).cast(BinaryType),
      "headers" -> lit(null).cast(MapType(StringType, BinaryType)),
      "ts" -> current_timestamp())
      .foldLeft(records) { case (df, (c, default)) =>
        if (df.columns.contains(c)) df else df.withColumn(c, default)
      }
    val baseDf = spark.createDataFrame(
      (0 until numPartitions).map(i => (i, base.getOrElse(i, 0L)))).toDF("partition", "base")
    val w = Window.partitionBy("partition").orderBy("_seq")
    val assigned = withMissing
      .withColumn("partition", p.cast(IntegerType))
      .withColumn("_seq", monotonically_increasing_id())
      .join(broadcast(baseDf), "partition")
      .withColumn("offset", col("base") + row_number().over(w) - 1)
      .select("key", "value", "headers", "ts", "partition", "offset")
      .persist()
    try {
      val counts = assigned.groupBy("partition").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      assigned
        .sortWithinPartitions("offset") // offset-sorted files → row-group skipping
        .write.mode("append").partitionBy("partition").parquet(dataDir)
      val newEnds = (0 until numPartitions)
        .map(i => i -> (base.getOrElse(i, 0L) + counts.getOrElse(i, 0L))).toMap
      writeOffsetMap(offsetsFile, newEnds)
      newEnds
    } finally assigned.unpersist()
  }

  /** Replica/follower append path: records that ALREADY carry
    * (partition, offset) are appended verbatim — the path a replica
    * fetching from a leader uses (offsets assigned upstream), and the
    * way to materialize a topic with externally-deterministic offsets.
    * Caller owns offset monotonicity; the log-end cache is recomputed
    * from the data. */
  def produceAssigned(records: DataFrame): Map[Int, Long] = {
    val withMissing = Seq(
      "key" -> lit(null).cast(BinaryType),
      "headers" -> lit(null).cast(MapType(StringType, BinaryType)),
      "ts" -> current_timestamp())
      .foldLeft(records) { case (df, (c, default)) =>
        if (df.columns.contains(c)) df else df.withColumn(c, default)
      }
    withMissing
      .select("key", "value", "headers", "ts", "partition", "offset")
      .sortWithinPartitions("offset")
      .write.mode("append").partitionBy("partition").parquet(dataDir)
    val ends = read().groupBy("partition").agg(max("offset").as("m")).collect()
      .map(r => r.getInt(0) -> (r.getLong(1) + 1L)).toMap
    writeOffsetMap(offsetsFile, ends)
    ends
  }

  /** Fetch: bounded read from (partition, fromOffset). Partition-dir
    * pruned + offset row-group skipped. */
  def consume(partition: Int, fromOffset: Long, maxRecords: Int = Int.MaxValue): DataFrame =
    read()
      .filter(col("partition") === partition && col("offset") >= fromOffset)
      .orderBy("offset")
      .limit(maxRecords)

  /** Read the whole log (all partitions) as a DataFrame. */
  def read(): DataFrame = spark.read.schema(readSchema).parquet(dataDir)

  /** Next offset to be written, per partition (Kafka log-end offset). */
  def logEndOffsets(): Map[Int, Long] =
    readOffsetMap(offsetsFile).getOrElse {
      if (!Files.exists(Paths.get(dataDir))) Map.empty
      else read().groupBy("partition").agg(max("offset").as("m")).collect()
        .map(r => r.getInt(0) -> (r.getLong(1) + 1L)).toMap
    }

  // --- consumer groups (ref roadmap: Consumer API) ---

  /** Commit consumed-up-to offsets for a group. */
  def commit(group: String, offsets: Map[Int, Long]): Unit = {
    val merged = committed(group) ++ offsets
    writeOffsetMap(groupFile(group), merged)
  }

  def committed(group: String): Map[Int, Long] =
    readOffsetMap(groupFile(group)).getOrElse(Map.empty)

  /** Per-partition lag of a group vs the log end. */
  def lag(group: String): Map[Int, Long] = {
    val c = committed(group)
    logEndOffsets().map { case (p, end) => p -> (end - c.getOrElse(p, 0L)) }
  }

  /** Consume everything a group hasn't seen, across partitions. */
  def consumeNew(group: String): DataFrame = {
    val c = committed(group)
    val committedDf = spark.createDataFrame(
      (0 until numPartitions).map(i => (i, c.getOrElse(i, 0L)))).toDF("partition", "committed")
    read().join(broadcast(committedDf), "partition")
      .filter(col("offset") >= col("committed"))
      .drop("committed")
  }

  // --- log maintenance (ref roadmap: Topic Management) ---

  /** Kafka log compaction: keep only the latest record per key.
    * One shuffle (window by key within partition), atomic dir swap. */
  def compact(): Unit = rewrite { df =>
    val w = Window.partitionBy("partition", "key").orderBy(col("offset").desc)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** Time-based retention: drop records older than the cutoff. */
  def expire(olderThan: java.sql.Timestamp): Unit =
    rewrite(_.filter(col("ts") >= lit(olderThan)))

  /** DeleteRecords analog: truncate a partition's log below the given
    * offset (records with offset < beforeOffset are removed; offsets
    * of survivors are untouched, as in Kafka). */
  def truncateBefore(partition: Int, beforeOffset: Long): Unit =
    rewrite(df => df.filter(col("partition") =!= partition ||
      col("offset") >= beforeOffset))

  /** auto.offset.reset=earliest: rewind the group to offset 0. */
  def seekToBeginning(group: String): Unit =
    commit(group, (0 until numPartitions).map(_ -> 0L).toMap)

  /** auto.offset.reset=latest: fast-forward the group to the log end. */
  def seekToEnd(group: String): Unit = {
    val ends = logEndOffsets()
    commit(group, (0 until numPartitions).map(p => p -> ends.getOrElse(p, 0L)).toMap)
  }

  /** Groups that have committed offsets on this topic. */
  def listGroups(): Seq[String] = {
    val dir = Paths.get(s"$topicDir/_groups")
    if (!Files.exists(dir)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      Files.list(dir).iterator().asScala
        .map(_.getFileName.toString.stripSuffix(".json")).toSeq.sorted
    }
  }

  private def rewrite(f: DataFrame => DataFrame): Unit = {
    val tmp = s"$topicDir/_data_rewrite"
    f(read())
      .sortWithinPartitions("offset")
      .write.mode("overwrite").partitionBy("partition").parquet(tmp)
    deleteRecursively(Paths.get(dataDir))
    Files.move(Paths.get(tmp), Paths.get(dataDir), StandardCopyOption.ATOMIC_MOVE)
  }

  // --- Structured Streaming (ref roadmap: Producer/Consumer API, streaming form) ---

  /** Incremental streaming read of the topic (file-source tailing —
    * new produced files become micro-batches). */
  def readStream(maxFilesPerTrigger: Int = 1000): DataFrame =
    spark.readStream
      .schema(readSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dataDir)

  /** Streaming produce into this topic via foreachBatch. Effectively
    * exactly-once: the checkpoint replays a failed micro-batch with
    * the SAME batchId, and the topic records the last applied batchId
    * (`_last_batch.json`) so replays are skipped instead of appended
    * twice. (Same idempotent-producer idea as Kafka's sequence
    * numbers, applied at micro-batch granularity.) */
  def produceStream(records: DataFrame, checkpointDir: String,
      partitioner: Column = null): StreamingQuery =
    records.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        produceIdempotent(batch, batchId, partitioner); ()
      }
      .start()

  /** Apply a micro-batch once: skip if this batchId (or a later one)
    * was already applied. */
  def produceIdempotent(batch: DataFrame, batchId: Long,
      partitioner: Column = null): Boolean = {
    val marker = Paths.get(s"$topicDir/_last_batch.json")
    val last =
      if (Files.exists(marker))
        "(-?\\d+)".r.findFirstIn(Files.readString(marker)).map(_.toLong).getOrElse(-1L)
      else -1L
    if (batchId <= last) false
    else {
      produce(batch, partitioner)
      Files.writeString(marker, s"""{"lastBatchId":$batchId}""")
      true
    }
  }
}

object TopicLog {

  /** Kafka record model (key, value, headers, timestamp) + log
    * coordinates (partition, offset). */
  val recordSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("headers", MapType(StringType, BinaryType)),
    StructField("ts", TimestampType)))

  /** Full topic read schema: record model + log coordinates (also the
    * fixed schema of the `graft-topic` DataSource V2 table). */
  val readSchema: StructType =
    recordSchema
      .add(StructField("partition", IntegerType, nullable = false))
      .add(StructField("offset", LongType, nullable = false))

  def create(spark: SparkSession, root: String, topic: String, numPartitions: Int): TopicLog = {
    val dir = Paths.get(s"$root/$topic")
    require(!Files.exists(dir.resolve("_meta.json")), s"topic $topic already exists")
    Files.createDirectories(dir)
    Files.createDirectories(dir.resolve("_groups"))
    Files.writeString(dir.resolve("_meta.json"), s"""{"numPartitions":$numPartitions}""")
    new TopicLog(spark, root, topic, numPartitions)
  }

  def open(spark: SparkSession, root: String, topic: String): TopicLog = {
    val meta = Files.readString(Paths.get(s"$root/$topic/_meta.json"))
    val n = "\"numPartitions\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(meta)
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalStateException(s"bad _meta.json for $topic"))
    new TopicLog(spark, root, topic, n)
  }

  def exists(root: String, topic: String): Boolean =
    Files.exists(Paths.get(s"$root/$topic/_meta.json"))

  def drop(root: String, topic: String): Unit =
    deleteRecursively(Paths.get(s"$root/$topic"))

  // flat {"<int>":<long>,...} maps — hand-rolled to avoid deps
  private def writeOffsetMap(path: Path, m: Map[Int, Long]): Unit = {
    Files.createDirectories(path.getParent)
    val json = m.toSeq.sorted.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    Files.writeString(path, json)
  }

  private def readOffsetMap(path: Path): Option[Map[Int, Long]] =
    if (!Files.exists(path)) None
    else {
      val s = Files.readString(path)
      Some("\"(\\d+)\"\\s*:\\s*(\\d+)".r.findAllMatchIn(s)
        .map(m => m.group(1).toInt -> m.group(2).toLong).toMap)
    }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
    }
}

/** Partition routing strategies (Kafka DefaultPartitioner analogs). */
object Partitioners {
  /** Hash of the record key (murmur3 via Spark's codegen'd hash). */
  def byKeyHash(numPartitions: Int): Column =
    pmod(hash(col("key")), lit(numPartitions))

  /** Modulo on an integer key column — ANSI-SQL-reproducible (used by
    * the oracle-checked queries). */
  def byLongKey(numPartitions: Int, key: Column): Column =
    pmod(key, lit(numPartitions.toLong)).cast(IntegerType)

  /** Round-robin within each task (sticky-partitioning analog for
    * keyless records; not stable across retries, as in Kafka). */
  def roundRobin(numPartitions: Int): Column =
    pmod(monotonically_increasing_id(), lit(numPartitions.toLong)).cast(IntegerType)

  /** Wire-compatible with Kafka's DefaultPartitioner: murmur2 of the
    * key bytes, sign-masked, mod partition count — a graft topic
    * partitioned this way places every key exactly where a stock
    * Kafka producer would. */
  def kafkaCompatible(numPartitions: Int): Column =
    pmod(graft.functions.GraftExpressions.murmur2(col("key"))
      .bitwiseAND(0x7fffffff), lit(numPartitions)).cast(IntegerType)
}
