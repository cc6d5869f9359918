package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Broker facade: topic management + discovery metadata.
  *
  * The Spark-native analog of the reference's request-dispatch surface
  * (ref: pkg/kafka/kafka_api.go:85, pkg/server/server.go accept loop):
  * instead of wire-protocol handlers there are catalog DataFrames and
  * topic-management methods.
  */
class Broker(spark: SparkSession, root: String) {

  /** CreateTopics analog. */
  def createTopic(name: String, numPartitions: Int): TopicLog =
    TopicLog.create(spark, root, name, numPartitions)

  /** DeleteTopics analog. */
  def deleteTopic(name: String): Unit = TopicLog.drop(root, name)

  def topic(name: String): TopicLog = TopicLog.open(spark, root, name)

  def topicExists(name: String): Boolean = TopicLog.exists(root, name)

  def listTopics(): Seq[String] = {
    val p = Paths.get(root)
    if (!Files.exists(p)) Seq.empty
    else Files.list(p).iterator().asScala
      .filter(d => Files.exists(d.resolve("_meta.json")))
      .map(_.getFileName.toString).toSeq.sorted
  }

  /** ApiVersions analog (ref: pkg/kafka/kafka_api.go:99 — the
    * prototype serves key 18 only; graft serves the full core set). */
  def apiVersions: DataFrame = {
    import spark.implicits._
    Broker.SupportedApis.toDF("api_key", "api_name", "min_version", "max_version")
  }

  /** Metadata analog: every topic-partition with its log-end offset. */
  def topicMetadata: DataFrame = {
    import spark.implicits._
    listTopics().flatMap { t =>
      val log = topic(t)
      val ends = log.logEndOffsets()
      (0 until log.numPartitions).map(p => (t, p, ends.getOrElse(p, 0L)))
    }.toDF("topic", "partition", "log_end_offset")
  }
}

object Broker {
  /** (api_key, name, min_version, max_version) — mirrors the Kafka
    * protocol key space for the core APIs graft implements. */
  val SupportedApis: Seq[(Int, String, Int, Int)] = Seq(
    (0, "Produce", 0, 9),
    (1, "Fetch", 0, 13),
    (2, "ListOffsets", 0, 7),
    (3, "Metadata", 0, 12),
    (8, "OffsetCommit", 0, 8),
    (9, "OffsetFetch", 0, 8),
    (18, "ApiVersions", 0, 3),
    (19, "CreateTopics", 0, 7),
    (20, "DeleteTopics", 0, 6))
}
