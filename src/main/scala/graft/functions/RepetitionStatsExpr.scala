package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document repetition statistics in ONE pass over the token
  * array — `struct(top2_cnt, dup3_occ, tri_total)` where `top2_cnt`
  * is the occurrence count of the single most frequent bigram,
  * `dup3_occ` the number of trigram occurrences whose trigram repeats
  * (count >= 2), and `tri_total` the total trigram count (= len-2).
  *
  * Replaces t09/p02's explode → groupBy(doc_id, gram) → groupBy(doc_id)
  * two-shuffle plan: the metrics only ever depend on the document's own
  * tokens, so they are computable map-side with a per-row open-address
  * count table — at 100 TB the entire gram stream (≈2 rows per token)
  * never hits the shuffle. Work is O(tokens) per row with two local
  * hash maps; skew is bounded by the longest single document exactly
  * like the shuffle plan, minus the shuffle.
  *
  * Gram identity matches [[WordShinglesExpr]] ("w1 w2" space-joined),
  * so results are byte-identical to the exploded plan and the DuckDB
  * oracle. Codegen stays in the whole-stage pipeline via a single
  * static call (the same discipline as UTF8String.concatWs helpers).
  */
case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepetitionStatsExpr.Out
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_repetition_stats"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_repetition_stats requires ARRAY<STRING>, got ${other.sql}")
  }

  protected override def nullSafeEval(input: Any): Any =
    RepetitionStatsExpr.stats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = RepetitionStatsExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $helper.stats($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionStatsExpr {
  val Out: StructType = StructType(Seq(
    StructField("top2_cnt", LongType, nullable = false),
    StructField("dup3_occ", LongType, nullable = false),
    StructField("tri_total", LongType, nullable = false)))

  /** One-pass gram counting. Called from generated code. */
  def stats(toks: ArrayData): InternalRow = {
    val len = toks.numElements()
    val bi = new java.util.HashMap[UTF8String, Array[Long]]()
    val tri = new java.util.HashMap[UTF8String, Array[Long]]()
    var i = 0
    while (i < len - 1) {
      val b = UTF8String.concatWs(WordShinglesExpr.Space,
        toks.getUTF8String(i), toks.getUTF8String(i + 1))
      val c = bi.get(b)
      if (c == null) bi.put(b, Array(1L)) else c(0) += 1L
      if (i < len - 2) {
        val t = UTF8String.concatWs(WordShinglesExpr.Space,
          toks.getUTF8String(i), toks.getUTF8String(i + 1), toks.getUTF8String(i + 2))
        val ct = tri.get(t)
        if (ct == null) tri.put(t, Array(1L)) else ct(0) += 1L
      }
      i += 1
    }
    var top2 = 0L
    val bit = bi.values().iterator()
    while (bit.hasNext) { val v = bit.next()(0); if (v > top2) top2 = v }
    var dup3 = 0L
    val tit = tri.values().iterator()
    while (tit.hasNext) { val v = tit.next()(0); if (v >= 2L) dup3 += v }
    new GenericInternalRow(Array[Any](top2, dup3, math.max(len - 2, 0).toLong))
  }
}
