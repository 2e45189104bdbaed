package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Membership-COUNT of an array&lt;string&gt; column against a
  * broadcast hash set, with an early-exit cap: returns
  * min(|{x ∈ arr : x ∈ set}|, cap).
  *
  * This exists because `array_intersect(arr, <huge literal/column>)`
  * rebuilds the big side's hash set PER ROW — at a 500k-gram benchmark
  * set that made st14's map stage rows × |set| (measured 45× past its
  * sf0.1 time at sf1, the only super-linear entry in the suite). Here
  * the set ships torrent-broadcast once per executor
  * ([[CodebookArgmaxExpr]]'s stance), the plan holds one O(1) node,
  * and each row costs O(|arr|) hash probes with an early exit at
  * `cap` (a contamination gate only needs "≥ 2", not the full count).
  */
case class SetMatchCountExpr(child: Expression,
    set: org.apache.spark.broadcast.Broadcast[java.util.HashSet[UTF8String]],
    cap: Int)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_set_match_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string>, got ${other.catalogString}")
  }

  protected override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val s = set.value
    var n = 0
    var i = 0
    val len = arr.numElements()
    while (i < len && n < cap) {
      if (!arr.isNullAt(i) && s.contains(arr.getUTF8String(i))) n += 1
      i += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("graftSetBc", set,
      "org.apache.spark.broadcast.Broadcast")
    // fetched from the broadcast ONCE per generated-class instance
    val s = ctx.addMutableState("java.util.HashSet", "graftMatchSet",
      v => s"$v = (java.util.HashSet) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val len = ctx.freshName("len")
      s"""
         |int $n = 0;
         |int $len = $a.numElements();
         |for (int $i = 0; $i < $len && $n < $cap; $i++) {
         |  if (!$a.isNullAt($i) && $s.contains($a.getUTF8String($i))) $n++;
         |}
         |${ev.value} = $n;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
