package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles ("w1 w2 w3") of a token array as one generated
  * loop — semantically identical to the built-in composition
  * `transform(sequence(1, len-n+1), i -> concat_ws(' ', toks[i..i+n-1]))`
  * with the short-doc guard (fewer than n tokens ⇒ empty array), and
  * like `concat_ws` it skips NULL tokens. The built-in form runs the
  * lambda INTERPRETED per shingle (Spark higher-order functions don't
  * codegen) and re-boxes three element_at lookups per element; this is
  * the d02b/d06/p01 shingle stage's dominant cost.
  */
case class WordShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_word_shingles"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_word_shingles requires ARRAY<STRING>, got ${other.sql}")
  }

  protected override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val len = toks.numElements()
    val cnt = if (len < n) 0 else len - n + 1
    val out = new Array[UTF8String](cnt)
    val win = new Array[UTF8String](n)
    var i = 0
    while (i < cnt) {
      var k = 0
      while (k < n) { win(k) = toks.getUTF8String(i + k); k += 1 }
      out(i) = UTF8String.concatWs(WordShinglesExpr.Space, win: _*)
      i += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = WordShinglesExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => {
      val len = ctx.freshName("len")
      val cnt = ctx.freshName("cnt")
      val out = ctx.freshName("out")
      val win = ctx.freshName("win")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      s"""
         |int $len = $c.numElements();
         |int $cnt = $len < $n ? 0 : $len - $n + 1;
         |UTF8String[] $out = new UTF8String[$cnt];
         |UTF8String[] $win = new UTF8String[$n];
         |for (int $i = 0; $i < $cnt; $i++) {
         |  for (int $k = 0; $k < $n; $k++) { $win[$k] = $c.getUTF8String($i + $k); }
         |  $out[$i] = UTF8String.concatWs($helper.Space(), $win);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShinglesExpr {
  val Space: UTF8String = UTF8String.fromString(" ")
}
