package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("AsOfJoinExec matches a hand-computed as-of join on real events") {
    val ev = graft.Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("view_ts"))
      .withColumnRenamed("user_id", "user_id") // same key name on both sides

    val got = AsOfJoin(purchases, views, key = "user_id", leftTime = "ts",
      rightTime = "view_ts", rightTieBreak = "view_id")

    // exec column layout: left cols ++ right cols (right user_id/ts dup names)
    val result = got.select(col("purchase_id"), col("view_id"), col("view_ts"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap

    // hand-computed expectation
    val rows = ev.select("event_id", "user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getTimestamp(3)))
    val viewsByUser = rows.filter(_._3 == "view").groupBy(_._2)
    val expected = rows.filter(_._3 == "purchase").map { case (pid, uid, _, pts) =>
      val prior = viewsByUser.getOrElse(uid, Array.empty)
        .filter(v => v._4.compareTo(pts) < 0)
      pid -> (if (prior.isEmpty) None
              else Some(prior.maxBy(v =>
                (v._4.getTime / 1000 * 1000000000L + v._4.getNanos, v._1))._1))
    }.toMap

    assert(result.keySet === expected.keySet)
    val diffs = expected.collect { case (k, e) if result(k) != e => (k, e, result(k)) }
    assert(diffs.isEmpty, s"first diffs: ${diffs.take(3).toSeq}")
  }

  test("right side without matches yields nulls, wrong time still ordered") {
    import spark.implicits._
    val l = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (2L, 5L, "p3"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 9L, 100L), (1L, 15L, 101L), (3L, 1L, 102L))
      .toDF("k", "t", "rid")
    val got = AsOfJoin(l, r, "k", "t", "t", "rid")
      .select(col("tag"), col("rid")).collect()
      .map(x => x.getString(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    assert(got("p1") === 100L) // 9 < 10
    assert(got("p2") === 101L) // 15 < 20 beats 9
    assert(got("p3") === -1L)  // key 2 has no right rows
  }

  test("forward direction: first right AT-OR-AFTER; shared matches; equal ts counts") {
    import spark.implicits._
    val l = Seq((1L, 10L, "a"), (1L, 12L, "b"), (1L, 15L, "c"),
      (1L, 16L, "d"), (2L, 5L, "e"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 15L, 200L), (1L, 15L, 201L), (1L, 30L, 202L))
      .toDF("k", "t", "rid")
    val got = AsOfJoin(l, r, "k", "k", "t", "t", "rid", forward = true)
      .select(col("tag"), col("rid")).collect()
      .map(x => x.getString(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    assert(got("a") === 200L, "first at-or-after, min tiebreak on the ts tie")
    assert(got("b") === 200L, "consecutive left rows share the un-consumed head")
    assert(got("c") === 200L, "equal ts counts as at-or-after")
    assert(got("d") === 202L, "past 15: the next one")
    assert(got("e") === -1L, "key 2 has no right rows")
  }
}
