package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Synthesizes an order-of-magnitude-larger COMPLETE dataset (every
  * table graft.Bench touches) from a base SF dir, so the unmodified
  * Bench harness can produce per-query numbers one decade up —
  * sf0.1 × 10 ≈ sf1 (lineitem ~6M rows). Companion to [[ScaleBench]],
  * which scales only the dedup/ANN corpus; this covers the relational
  * + streaming families the round-4 verdict flagged as having no
  * order-of-magnitude evidence.
  *
  * Scaling construction (deterministic, FK-preserving, shape-true):
  *  - region/nation: FIXED — dimensions don't grow with volume, and
  *    keeping them constant preserves every broadcast-join plan.
  *  - customer/supplier/part/orders/lineitem: k replicas with each
  *    key offset by k·(max_key+1) OF ITS OWN TABLE, applied to both
  *    sides of every FK (orders.o_custkey moves with customer,
  *    lineitem's orderkey/partkey/suppkey move with their parents) —
  *    join fan-outs and group cardinalities scale linearly, selectivity
  *    of every filter is unchanged.
  *  - events: k replicas, event_id/user_id offset; timestamps are
  *    KEPT, so the stream gets k× busier inside the same window span
  *    (more traffic, not a longer history) — window counts stay put
  *    while per-window volume scales, the realistic stream scale-up.
  *    ts stays in its raw int64-nanos form (nanosAsLong) so the
  *    scaled file reads through Tables.events identically.
  *  - documents/embeddings: the [[ScaleBench]] construction (word
  *    prefixes keep replicas gram-disjoint; embeddings perturbed per
  *    replica, query vectors only in replica 0).
  *
  * Usage: tools/run.sh graft.tools.ScaleTables [outDir=/tmp/graft_sf1]
  *   env: SPARK_GRAFT_SF_DIR (base, default sf0.1),
  *        SPARK_GRAFT_SCALE (replicas, default 10)
  * then: SPARK_GRAFT_SF_DIR=<outDir> tools/run.sh graft.Bench */
object ScaleTables {
  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = args.headOption.getOrElse("/tmp/graft_sf1")
    val replicas = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rep = spark.range(replicas).select(col("id").cast("int").as("k"))

    /** One offset unit per key column = that table's max key + 1, so
      * replica id spaces stay dense and disjoint. */
    def unit(table: String, key: String): Long =
      t(spark, baseDir, table).agg(max(col(key))).head.getLong(0) + 1L

    def write(df: DataFrame, name: String): Unit = {
      df.repartition(32).write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"scaled $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    // dimensions: copied as-is
    write(t(spark, baseDir, "region"), "region")
    write(t(spark, baseDir, "nation"), "nation")

    val custU = unit("customer", "c_custkey")
    val suppU = unit("supplier", "s_suppkey")
    val partU = unit("part", "p_partkey")
    val ordU = unit("orders", "o_orderkey")

    write(t(spark, baseDir, "customer").crossJoin(rep)
      .withColumn("c_custkey", col("c_custkey") + col("k") * custU)
      .withColumn("c_name", concat(col("c_name"), lit("#"), col("k")))
      .drop("k"), "customer")
    write(t(spark, baseDir, "supplier").crossJoin(rep)
      .withColumn("s_suppkey", col("s_suppkey") + col("k") * suppU)
      .withColumn("s_name", concat(col("s_name"), lit("#"), col("k")))
      .drop("k"), "supplier")
    write(t(spark, baseDir, "part").crossJoin(rep)
      .withColumn("p_partkey", col("p_partkey") + col("k") * partU)
      .drop("k"), "part")
    write(t(spark, baseDir, "orders").crossJoin(rep)
      .withColumn("o_orderkey", col("o_orderkey") + col("k") * ordU)
      .withColumn("o_custkey", col("o_custkey") + col("k") * custU)
      .drop("k"), "orders")
    write(t(spark, baseDir, "lineitem").crossJoin(rep)
      .withColumn("l_orderkey", col("l_orderkey") + col("k") * ordU)
      .withColumn("l_partkey", col("l_partkey") + col("k") * partU)
      .withColumn("l_suppkey", col("l_suppkey") + col("k") * suppU)
      .drop("k"), "lineitem")

    // events: raw nanos-long read (NO timestamp conversion — the
    // scaled file must read through Tables.events like the original)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$baseDir/events.parquet")
    val evU = ev.agg(max(col("event_id"))).head.getLong(0) + 1L
    val userU = ev.agg(max(col("user_id"))).head.getLong(0) + 1L
    write(ev.crossJoin(rep)
      .withColumn("event_id", col("event_id") + col("k") * evU)
      .withColumn("user_id", col("user_id") + col("k") * userU)
      .drop("k"), "events")

    // documents/embeddings: the ScaleBench construction
    val nDocs = t(spark, baseDir, "documents").count()
    val nVecs = t(spark, baseDir, "embeddings").count()
    write(t(spark, baseDir, "documents").crossJoin(rep)
      .withColumn("text", when(col("k") === 0, col("text"))
        .otherwise(regexp_replace(col("text"), lit("(^| )"),
          concat(lit("$1z"), col("k"), lit("q")))))
      .withColumn("doc_id", col("doc_id") + col("k").cast("long") * nDocs)
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("k"), "documents")
    write(t(spark, baseDir, "embeddings").crossJoin(rep)
      .withColumn("embedding", transform(col("embedding"),
        x => (x + col("k").cast("float") * 0.013f).cast("float")))
      .withColumn("vec_id", col("vec_id") + col("k").cast("long") * nVecs)
      .drop("k"), "embeddings")

    spark.stop()
  }
}
