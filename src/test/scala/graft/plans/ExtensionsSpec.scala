package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions=graft.plans.GraftExtensions wiring must
  * carry the FULL surface: SQL names for the native expressions AND
  * the planner strategies for the custom physical operators — a user
  * configuring only the extensions class gets everything. Uses its
  * own session (extensions bind at session build) and plants the
  * AsOfJoinPlan node DIRECTLY (no DSL helper, which would register
  * extraStrategies and mask a broken injection). */
class ExtensionsSpec extends AnyFunSuite {

  /** getOrCreate returns any existing default session and silently
    * IGNORES withExtensions — under the full suite TestSpark's
    * session already exists, so the default/active session is
    * cleared first to force a genuinely extensions-bound session
    * (same JVM-wide SparkContext underneath). */
  private lazy val spark = {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    prevDefault.foreach(SparkSession.setDefaultSession)
    prevActive.foreach(SparkSession.setActiveSession)
    s
  }

  test("SQL names resolve through the extensions class") {
    val r = spark.sql(
      "SELECT graft_rolling_hash('abc') AS h, graft_murmur2('k') AS m")
      .collect()(0)
    assert(r.getAs[Long]("h") > 0L)
  }

  test("AsOfJoinPlan plans via the injected strategy, no DSL registration") {
    import spark.implicits._
    assert(spark.experimental.extraStrategies.isEmpty,
      "the point is planning WITHOUT the per-node registration")
    val left = Seq((1L, 100L), (1L, 200L)).toDF("k", "ts")
    val right = Seq((1L, 50L, 7L), (1L, 150L, 8L)).toDF("rk", "rts", "rid")
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        n: String) = p.output.find(_.name == n).get
    val df = ColumnBridge.ofRows(spark, AsOfJoinPlan(
      attr(lp, "k"), attr(rp, "rk"), attr(lp, "ts"), attr(rp, "rts"),
      attr(rp, "rid"), lp, rp))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"expected AsOfJoinExec in:\n$plan")
    val rows = df.collect()
      .map(r => (r.getAs[Long]("ts"), r.getAs[Long]("rid"))).toSet
    assert(rows === Set((100L, 7L), (200L, 8L)),
      "each left row joins its most recent prior right row")
  }
}
