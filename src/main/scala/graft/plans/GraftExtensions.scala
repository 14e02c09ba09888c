package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for the engine's native expressions.
  *
  * Two paths, same registry entries:
  *   - `spark.sql.extensions=graft.plans.GraftExtensions` at session build
  *     (spark-submit / builder `.withExtensions`);
  *   - `GraftFunctions.register(spark)` on an already-running session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.descriptors.foreach { case (ident, info, builder) =>
      e.injectFunction((ident, info, builder))
    }
}

object GraftFunctions {

  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_hamming"),
      new ExpressionInfo(classOf[StringHammingDistance].getName, "graft_hamming"),
      (exprs: Seq[Expression]) => StringHammingDistance(exprs(0), exprs(1))))

  /** Register on a live session (temp functions, session-scoped). */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (ident, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(ident.funcName, builder, "built-in")
    }
}
