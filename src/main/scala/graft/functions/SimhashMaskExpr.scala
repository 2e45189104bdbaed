package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** The packed 64-bit SimHash mask of one token array in a single pass:
  * bit i is set iff `SUM over tokens t of (bit i of xxhash64(t) ? +1 :
  * -1) > 0` — bit-identical to the explode + 64 conditional-sum
  * grouped-agg composition it replaces ([[Text.simhashMaskOf]]'s old
  * shape): Spark's XXH64 with default seed 42, null tokens contributing
  * the bare seed (a null child leaves the running hash untouched),
  * strict `> 0` vote sign, all replicated exactly and spec-pinned.
  *
  * Why: the explode multiplies the row stream by the token count and
  * the grouped agg maintains 64 long sum-buffers per doc through a hash
  * aggregate + exchange — for a value that is a pure per-row function
  * of the array. One generated loop computes it with one XXH64 step and
  * 64 add/subtracts per token, no explode, no shuffle.
  *
  * An EMPTY array yields mask 0 (all votes 0, strict `> 0` sets no
  * bit); callers that need the old explode semantics (docs with no
  * tokens vanish) filter `size(toks) > 0` before projecting, which is
  * exactly what [[Text.simhashMaskOf]] does.
  */
case class SimhashMaskExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_simhash_mask"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash_mask requires ARRAY<STRING>, got ${t.sql}")
  }

  protected override def nullSafeEval(input: Any): Any =
    SimhashMaskExpr.eval(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = SimhashMaskExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $helper.eval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashMaskExpr {

  /** One pass: per token the hash once (`xxhash64(t)` = 42-seeded
    * XXH64, or the bare seed for a null token), ±1 votes into 64 long
    * counters, then the strict-majority mask. */
  def eval(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Long](64)
    var i = 0
    while (i < n) {
      val h =
        if (arr.isNullAt(i)) 42L
        else XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var mask = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) mask |= (1L << b)
      b += 1
    }
    mask
  }
}
