package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the polynomial rolling fingerprint
  * (SURVEY.md §2 t04): h = fold over characters of (31·h + code) mod
  * 10^15+37.
  *
  * This is the "drop to a custom Expression" case (SURVEY §4): the
  * built-in composition (split to a per-character array + interpreted
  * higher-order fold) materializes an array per row and stays outside
  * whole-stage codegen; this expression runs as a tight generated loop
  * with zero allocation. Semantics match the built-in version (and the
  * DuckDB oracle) for ASCII text; code points are UTF-16 units.
  */
case class RollingFingerprintExpr(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_rolling_fp requires STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_rolling_fp"

  protected override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = (h * 31L + s.charAt(i).toLong) % RollingFingerprintExpr.Mod
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |java.lang.String $s = $c.toString();
         |long $h = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $h = ($h * 31L + (long) $s.charAt($i)) % ${RollingFingerprintExpr.Mod}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingFingerprintExpr {
  val Mod: Long = Text.RollMod

  /** Register as a SQL function so call sites can use
    * `expr("graft_rolling_fp(text)")` without touching the private
    * Column constructor. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_rolling_fp", exprs => RollingFingerprintExpr(exprs.head), "built-in")
}
