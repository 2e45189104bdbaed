package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document token→count map in ONE pass over the token array —
  * the per-row half of t23's burstiness plan. Replaces the
  * explode(token) → groupBy(token, doc_id) stage: the per-doc counts
  * depend only on the document's own tokens, so the token stream
  * never exists as rows; `explode(map)` then emits one row per
  * DISTINCT token per doc (what the old plan's partial agg produced
  * only after hashing every token occurrence through the aggregate),
  * and the vocab-keyed corpus agg is unchanged. Work is O(tokens) per
  * row with one local hash map; skew stays bounded by the longest
  * document, same as the exploded plan. Codegen via a single static
  * call (RepetitionStatsExpr's discipline). */
case class TokenCountsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_token_counts"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_token_counts requires ARRAY<STRING>, got ${other.sql}")
  }

  protected override def nullSafeEval(input: Any): Any =
    TokenCountsExpr.counts(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = TokenCountsExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = (org.apache.spark.sql.catalyst.util.MapData) $helper.counts($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenCountsExpr {
  /** One-pass token counting. Called from generated code. */
  def counts(toks: ArrayData): MapData = {
    val len = toks.numElements()
    val m = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    var i = 0
    while (i < len) {
      val t = toks.getUTF8String(i)
      val c = m.get(t)
      if (c == null) m.put(t, Array(1L)) else c(0) += 1L
      i += 1
    }
    val keys = new Array[Any](m.size())
    val vals = new Array[Any](m.size())
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = e.getKey
      vals(j) = e.getValue()(0)
      j += 1
    }
    ArrayBasedMapData(keys, vals)
  }
}
