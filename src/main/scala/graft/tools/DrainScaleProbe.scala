package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables.{events, t}

/** 50× scaling evidence for the STREAMING DRAIN family (round 13,
  * verdict directive 5): the nine stateful drains are the one
  * superlinear family in the 10× bench (5.5× wall for 10× data — the
  * per-state-partition commit price), so the claim to probe is that
  * drain wall tracks STATE VOLUME and COMMIT COUNT, not corpus size,
  * once state partitions are sized by the documented knob
  * (SPARK_GRAFT_DRAIN_STATE_PARTITIONS).
  *
  * `build <out>`: replicate the base corpus's events 50×
  * (ScaleTables' construction — ids/users offset per replica,
  * timestamps KEPT so the stream gets 50× busier inside the same
  * window span; the time-ordered topic construction then holds at
  * any replica count).
  *
  * `run <dir>`: drain the two heaviest stateful forms — the
  * left-outer watermarked join and the transformWithState timer
  * sessionizer — and print wall, emitted rows, micro-batch count
  * (admission budget is deterministic), distinct users (≈ timer/state
  * keys), and keys per state partition. Run it three ways for the
  * SURVEY §6 table:
  *   base:            tools/run.sh graft.tools.DrainScaleProbe run /root/testdata/sf0.1
  *   50× unscaled:    ... run /tmp/graft_ev50          (8 state partitions)
  *   50× scaled knob: SPARK_GRAFT_DRAIN_STATE_PARTITIONS=32 ... run /tmp/graft_ev50
  * Timings follow the bench discipline: quiet box, run2-of-2.
  */
object DrainScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.toList match {
      case "build" :: out :: Nil =>
        val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        val replicas = sys.env.getOrElse("SPARK_GRAFT_SCALE", "50").toInt
        val rep = spark.range(replicas).select(col("id").cast("int").as("k"))
        val evU = events(spark, baseDir).agg(max("event_id")).head.getLong(0) + 1L
        val userU = events(spark, baseDir).agg(max("user_id")).head.getLong(0) + 1L
        events(spark, baseDir).crossJoin(rep)
          .withColumn("event_id", col("event_id") + col("k") * evU)
          .withColumn("user_id", col("user_id") + col("k") * userU)
          .drop("k")
          .repartition(32).write.mode("overwrite").parquet(s"$out/events.parquet")
        println(s"scaled events: ${replicas}x of $baseDir at $out " +
          s"(${spark.read.parquet(s"$out/events.parquet").count()} rows)")
      case "run" :: dir :: Nil =>
        val statePartitions =
          sys.env.getOrElse("SPARK_GRAFT_DRAIN_STATE_PARTITIONS", "8").toInt
        // the drains' OWN parse + default: the probe's batch math
        // must track what drainTopic actually admits (review catch)
        val trigger = graft.operators.Streams.drainTriggerRows
        val nEvents = events(spark, dir).count()
        val nUsers = events(spark, dir).select("user_id").distinct().count()
        val batches = (nEvents + trigger - 1) / trigger
        def timed(name: String, batchesOverride: Long = -1L)(f: => Long): Unit = {
          val t0 = System.nanoTime()
          val rows = f
          val wall = (System.nanoTime() - t0) / 1e9
          val b = if (batchesOverride > 0) batchesOverride else batches
          println(f"drain=$name dir=$dir wall=$wall%.1f s rows=$rows " +
            f"events=$nEvents users=$nUsers batches=$b " +
            f"state_partitions=$statePartitions " +
            f"keys_per_state_partition=${nUsers / statePartitions}")
        }
        timed("outer_join_wm") {
          graft.operators.Streams.streamExecOuterJoinWatermarked(spark, dir).count()
        }
        timed("tws_timers") {
          graft.operators.Streams.streamExecTwsTimers(spark, dir).count()
        }
        // round-14 drains: all three are GRID-bounded-state forms
        // (windows×types / windows×cohorts / days×types) — the claim
        // is wall tracks batches × partitions (commit count), with
        // state and output flat as the corpus replicates
        timed("chained_agg") {
          graft.operators.Streams.streamExecChainedAgg(spark, dir).count()
        }
        timed("static_enrich") {
          graft.operators.Streams.streamExecStaticEnrich(spark, dir).count()
        }
        // round-15 pin (the knn_seed_broadcast discipline, inverted):
        // static_enrich's dimension is |users|-PROPORTIONAL — rows
        // and bytes must grow with the replica factor, which is
        // exactly why the operator carries NO broadcast hint (the
        // planner broadcasts only below the size threshold; past it,
        // a per-batch shuffle — never a forced OOM). Bytes are the
        // join-relation width: user_id long + cohort_day date.
        val dimRows = spark.read
          .parquet(graft.operators.Streams.staticEnrichDim(spark, dir))
          .count()
        println(s"probe=static_enrich_dim rows=$dimRows " +
          s"bytes=${dimRows * 12L} users=$nUsers " +
          "(|users|-proportional BY DESIGN: no broadcast hint — " +
          "planner broadcasts under the threshold only)")
        // foreach_upsert sizes its OWN trigger from the topic
        // manifest (~8 batches at ANY corpus — the whole point), so
        // the drainTriggerRows-derived batch count doesn't apply.
        // The override replays the operator's exact trigger math —
        // ceil(total / max(125, total/8)) — not an approximation of
        // it (ADVICE round 14: min(8, total/125) logs 8 where the
        // operator runs 9, e.g. at 1,001 events)
        timed("foreach_upsert", batchesOverride = {
          val t = math.max(125L, nEvents / 8L)
          (nEvents + t - 1) / t
        }) {
          graft.operators.Streams.streamExecForeachUpsert(spark, dir).count()
        }
      case other =>
        sys.error(s"usage: build <out> | run <dir> (got: $other)")
    }
    spark.stop()
  }
}
