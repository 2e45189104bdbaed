package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Hashed word n-gram shingles: element i is EXACTLY
  * `xxhash64(toks[i], toks[i+1], …, toks[i+n-1])` (Spark's chained
  * XXH64 with the default seed 42, null tokens skipped), produced by
  * one generated loop instead of an interpreted `transform` lambda
  * re-evaluating an n-ary XxHash64 per shingle. This is the d02 fast
  * path's shingle stage: no shingle string is ever materialized — each
  * window collapses straight to one long.
  */
case class XxShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_xx_shingles"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_xx_shingles requires ARRAY<STRING>, got ${other.sql}")
  }

  protected override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val len = toks.numElements()
    val cnt = if (len < n) 0 else len - n + 1
    val out = new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      var h = 42L
      var k = 0
      while (k < n) {
        val t = toks.getUTF8String(i + k)
        if (t != null) h = XXH64.hashUTF8String(t, h)
        k += 1
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    nullSafeCodeGen(ctx, ev, c => {
      val len = ctx.freshName("len")
      val cnt = ctx.freshName("cnt")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      val t = ctx.freshName("t")
      s"""
         |int $len = $c.numElements();
         |int $cnt = $len < $n ? 0 : $len - $n + 1;
         |long[] $out = new long[$cnt];
         |for (int $i = 0; $i < $cnt; $i++) {
         |  long $h = 42L;
         |  for (int $k = 0; $k < $n; $k++) {
         |    UTF8String $t = $c.getUTF8String($i + $k);
         |    if ($t != null) { $h = $xxh.hashUTF8String($t, $h); }
         |  }
         |  $out[$i] = $h;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
