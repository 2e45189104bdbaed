package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing a document's WINNOWING
  * fingerprint set (SURVEY.md §2 d16 — Schleimer/Wilkerson/Aiken
  * SIGMOD'03): polynomial hashes of the char k-grams (t04's
  * 31-base / 10^15+37 recurrence, each gram from scratch), the minimum
  * of every w-window of consecutive gram hashes, distinct minima in
  * first-occurrence order.
  *
  * The "drop to a custom Expression" case (SURVEY §4): the built-in
  * composition — transform(sequence) over a per-gram aggregate(split(
  * substr)) — allocates a split array per GRAM and evaluates three
  * nested interpreted lambdas per row; this expression is one tight
  * generated-call loop with a single output allocation. Emits values
  * byte-identical to the built-in composition (spec-asserted), so the
  * DuckDB oracle is unchanged. Strings shorter than k+w−1 yield an
  * empty array (no full window exists).
  */
case class WinnowFingerprintsExpr(child: Expression, k: Int = 8, w: Int = 4)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_winnow_fps requires STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_winnow_fps"

  protected override def nullSafeEval(input: Any): Any =
    WinnowFingerprintsExpr.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowFingerprintsExpr.compute($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprintsExpr {
  val Mod: Long = Text.RollMod

  /** The per-row kernel: k-gram polynomial hashes → w-window minima →
    * distinct in first-occurrence order. Static so generated code can
    * call it directly inside whole-stage codegen. */
  def compute(s: UTF8String, k: Int, w: Int): ArrayData = {
    val str = s.toString
    val n = str.length
    val grams = n - k + 1
    if (grams < w) return new GenericArrayData(Array.empty[Long])
    val hs = new Array[Long](grams)
    var i = 0
    while (i < grams) {
      var h = 0L
      var j = 0
      while (j < k) {
        h = (h * 31L + str.charAt(i + j).toLong) % Mod
        j += 1
      }
      hs(i) = h
      i += 1
    }
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var jw = 0
    val windows = grams - w + 1
    while (jw < windows) {
      var m = hs(jw)
      var t = jw + 1
      while (t < jw + w) { if (hs(t) < m) m = hs(t); t += 1 }
      if (seen.add(m)) out += m
      jw += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Register as a SQL function (`graft_winnow_fps(text)`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_winnow_fps", exprs => WinnowFingerprintsExpr(exprs.head), "built-in")
}
