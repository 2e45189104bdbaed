package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document character statistics in ONE pass over the text —
  * `struct(n_chars, n_distinct, entropy)` with the Shannon entropy on
  * exactly t24's cross-engine grid: each −p·ln p term biased-rounded
  * to 8 decimals, summed EXACTLY (long units of 1e-8 — the
  * DECIMAL(18,8) discipline), the final value biased-rounded at 4.
  *
  * Replaces t24's per-char explode → (doc, char) partial agg →
  * doc agg: the entropy depends only on the document's own bytes, so
  * the entire char stream — the one remaining corpus-bytes-
  * proportional shuffle feeder (VERDICT r6) — never exists as rows at
  * all; work is a per-row code-point count table (alphabet-bounded),
  * and the doc-level result flows straight into whole-stage codegen
  * via a single static call (RepetitionStatsExpr's discipline).
  *
  * Parity: the count loop iterates CODE POINTS (what Spark's
  * `split(text, "")` and DuckDB's `STRING_SPLIT(text, '')` both
  * produce), ln is java.lang.Math.log (the t08 libm convention), and
  * every rounding step replicates Spark's own Round/Cast pipeline
  * (Double.toString-based BigDecimal, HALF_UP) so the result is
  * bit-identical to the exploded plan it replaces.
  */
case class CharEntropyStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = CharEntropyStatsExpr.Out
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_char_entropy_stats"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_char_entropy_stats requires STRING, got ${other.sql}")
  }

  protected override def nullSafeEval(input: Any): Any =
    CharEntropyStatsExpr.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = CharEntropyStatsExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $helper.stats($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharEntropyStatsExpr {
  val Out: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("entropy", DoubleType, nullable = false)))

  /** Spark's Round(double, scale) semantics — Double.toString-backed
    * BigDecimal, HALF_UP — shared by the 8-dec term grid and the
    * 4-dec output round. */
  private def sparkRound(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** One-pass code-point counting + gridded entropy. Called from
    * generated code. */
  def stats(text: UTF8String): InternalRow = {
    val s = text.toString
    val counts = new java.util.HashMap[Integer, Array[Long]]()
    var i = 0
    var nChars = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val c = counts.get(cp)
      if (c == null) counts.put(cp, Array(1L)) else c(0) += 1L
      nChars += 1L
      i += Character.charCount(cp)
    }
    // Σ round8(p·ln p + 1e-9) in exact 1e-8 units (DECIMAL(18,8) sum)
    var units = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      val p = c * 1.0 / nChars
      val term = sparkRound(p * java.lang.Math.log(p) + 1e-9, 8)
      units += new java.math.BigDecimal(java.lang.Double.toString(term))
        .movePointRight(8).setScale(0, java.math.RoundingMode.UNNECESSARY)
        .longValueExact()
    }
    val entropy = sparkRound(
      new java.math.BigDecimal(-units).movePointLeft(8).doubleValue() + 1e-9, 4)
    new GenericInternalRow(Array[Any](nChars, counts.size().toLong, entropy))
  }
}
