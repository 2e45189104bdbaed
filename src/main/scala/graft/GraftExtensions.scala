package graft

import graft.functions.RollingFingerprintExpr
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: makes graft's native functions
  * available to ANY session (including pure-SQL users) via
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  *   // or: spark.sql.extensions=graft.GraftExtensions
  *
  * This is the library's production registration path; the per-session
  * `RollingFingerprintExpr.register` helper exists for sessions that
  * are already running.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val functions: Seq[FunctionDescription] = Seq(
    (FunctionIdentifier("graft_rolling_fp"),
      new ExpressionInfo(classOf[RollingFingerprintExpr].getName, "graft_rolling_fp"),
      (exprs: Seq[Expression]) => RollingFingerprintExpr(exprs.head)))
}
