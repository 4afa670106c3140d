package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** SQL-surface registration for graft's native Catalyst expressions, via
  * the sanctioned extension point. Two paths:
  *
  *  - cluster config `spark.sql.extensions=graft.functions.GraftExtensions`
  *    — every session built afterwards resolves `float_dot` /
  *    `float_sq_dist` in SQL text (spark.sql, views, thrift clients);
  *  - [[GraftExtensions.register]] — injects the same functions into an
  *    ALREADY-RUNNING session's registry (the config path cannot reach a
  *    session that exists before the config is set).
  *
  * The DataFrame API does not need either: [[VectorExpressions]] builds
  * the expressions directly, so library operators work on a stock session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def twoArg(name: String, clazz: Class[_],
      build: (Expression, Expression) => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(clazz.getCanonicalName, null, name),
      { args =>
        if (args.size != 2)
          throw new IllegalArgumentException(
            s"$name expects exactly 2 arguments, got ${args.size}")
        build(args(0), args(1))
      })

  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    twoArg("float_dot", classOf[FloatDot], FloatDot(_, _)),
    twoArg("float_sq_dist", classOf[FloatSqDist], FloatSqDist(_, _)),
    twoArg("znorm_best_match", classOf[ZNormBestMatch],
      ZNormBestMatch(_, _)))

  /** Inject into a live session (idempotent — re-registration replaces). */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (ident, info, builder) =>
      ColumnBridge.registerFunction(spark, ident, info, builder)
    }
}
