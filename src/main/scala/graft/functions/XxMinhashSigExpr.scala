package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** The FULL xxhash64 minhash signature of one hashed-shingle array in a
  * single pass: element j is EXACTLY
  * `MIN over elements s of xxhash64(xxhash64(s), j)` — bit-identical to
  * the explode + `min(xxhash64(col, lit(j)))` grouped-agg composition
  * it replaces ([[Text.minhashSignatures]]'s old shape): Spark's
  * chained XXH64 with default seed 42, an int literal lane index, and
  * null elements contributing the bare seed (a null child leaves the
  * running hash untouched), all replicated exactly and spec-pinned.
  *
  * Why: the explode multiplies the row stream by the shingle count and
  * the grouped agg then maintains `seeds` long min-buffers per doc
  * through a hash aggregate + exchange — for a value that is a pure
  * per-row function of the array. One generated loop computes it with
  * two XXH64 long steps plus `seeds` int steps per element, no explode,
  * no shuffle (measured: the signature stage of the d02 family drops
  * from agg+exchange to a map-side projection).
  *
  * An EMPTY array yields all-null lanes; callers that need the old
  * explode semantics (docs with no shingles vanish) filter
  * `size(arr) > 0` before projecting, which is exactly what
  * [[Text.minhashSignatures]] does.
  */
case class XxMinhashSigExpr(child: Expression, seeds: Int)
  extends UnaryExpression {

  require(seeds > 0 && seeds <= 64, s"seeds must be in [1, 64], got $seeds")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_xx_minhash_sig"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) | ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_xx_minhash_sig requires ARRAY<BIGINT> or ARRAY<STRING>, got ${t.sql}")
  }

  private def elemIsString: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == StringType

  protected override def nullSafeEval(input: Any): Any = {
    val out =
      XxMinhashSigExpr.eval(input.asInstanceOf[ArrayData], seeds, elemIsString)
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = XxMinhashSigExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("sig")
      s"""
         |Object[] $out = (Object[]) $helper.eval($c, $seeds, $elemIsString);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object XxMinhashSigExpr {

  /** One pass: per element, the inner doc-hash once
    * (`xxhash64(s)` = hashLong(s, 42), or the bare seed 42 when the
    * element is null — a null child leaves the accumulator unchanged),
    * then the lane value `xxhash64(h, j)` = hashInt(j, hashLong(h, 42))
    * per seed, keeping the running minimum. Boxed lanes (nullable:
    * empty arrays yield all-null lanes, matching `min` over nothing). */
  def eval(arr: ArrayData, seeds: Int, string: Boolean): Array[Any] = {
    val n = arr.numElements()
    val mins = new Array[Long](seeds)
    var any = false
    var i = 0
    while (i < n) {
      val he =
        if (arr.isNullAt(i)) 42L
        else if (string) XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
        else XXH64.hashLong(arr.getLong(i), 42L)
      val inner = XXH64.hashLong(he, 42L)
      var j = 0
      while (j < seeds) {
        val v = XXH64.hashInt(j, inner)
        if (!any || v < mins(j)) mins(j) = v
        j += 1
      }
      any = true
      i += 1
    }
    val out = new Array[Any](seeds)
    if (any) {
      var j = 0
      while (j < seeds) { out(j) = mins(j); j += 1 }
    }
    out
  }
}
