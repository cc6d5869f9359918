package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProductExpr, MinHashAggExpr, Murmur2Expr, RollingHashExpr, SimHash64Expr, WordNgramsExpr}

/** SQL surface for graft's native expressions.
  *
  * Two registration paths:
  *  - `GraftExtensions` for
  *    `SparkSession.builder().withExtensions(new GraftExtensions)` or
  *    `spark.sql.extensions=graft.plans.GraftExtensions`;
  *  - `GraftFunctions.register(spark)` for an existing session (the
  *    driver contract creates the session — this is the path Verify
  *    and tests use).
  *
  * After either, `SELECT graft_dot(a, b)`, `graft_rolling_hash(s)`,
  * `graft_murmur2(k)` work from plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptors.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // the physical operators plan through the extension path too —
    // a session built with spark.sql.extensions=graft.plans.
    // GraftExtensions plans AsOfJoin/TopKPerKey nodes without the
    // per-node experimental.extraStrategies registration the DSL
    // helpers perform
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectPlannerStrategy(_ => TopKStrategy)
  }
}

object GraftFunctions {
  private[plans] val descriptors: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_dot",
      new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
      (es: Seq[Expression]) => DotProductExpr(es(0), es(1))),
    ("graft_rolling_hash",
      new ExpressionInfo(classOf[RollingHashExpr].getName, "graft_rolling_hash"),
      (es: Seq[Expression]) => RollingHashExpr(es.head)),
    ("graft_murmur2",
      new ExpressionInfo(classOf[Murmur2Expr].getName, "graft_murmur2"),
      (es: Seq[Expression]) => Murmur2Expr(es.head)),
    ("graft_simhash64",
      new ExpressionInfo(classOf[SimHash64Expr].getName, "graft_simhash64"),
      (es: Seq[Expression]) => SimHash64Expr(es.head)),
    ("graft_word_ngrams",
      new ExpressionInfo(classOf[WordNgramsExpr].getName, "graft_word_ngrams"),
      (es: Seq[Expression]) => WordNgramsExpr(es.head,
        es(1).eval().asInstanceOf[Number].intValue())),
    ("graft_minhash",
      new ExpressionInfo(classOf[MinHashAggExpr].getName, "graft_minhash"),
      (es: Seq[Expression]) => {
        val k = es(1).eval().asInstanceOf[Number].intValue()
        MinHashAggExpr(es.head, k).toAggregateExpression()
      }))

  /** Idempotent in-session registration. */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
