package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The FULL portable minhash signature of one shingle array in a
  * single pass: element j is EXACTLY
  * `MIN over shingles s of md5(concat(s, '#', j))` (lowercase hex) —
  * byte-identical to the `array_min(transform(sh, s => md5(...)))`
  * composition and to the DuckDB oracle's
  * `MIN(MD5(s || '#' || j)) GROUP BY j`, so swapping it in changes no
  * oracle.
  *
  * Why it exists: the per-row higher-order composition is INTERPRETED
  * (HOF lambdas never enter whole-stage codegen — the repo-wide
  * lesson) and walks the shingle array once per seed, boxing every
  * hex string; on st16's stream side that is 16 interpreted passes ×
  * every micro-batch row, the suite's worst ×10 wall. A streaming
  * projection also cannot use the explode + grouped-min shape the
  * batch path (d02b) uses — that would become a STATEFUL streaming
  * aggregation. This expression walks the array once, reuses ONE
  * MessageDigest, compares raw 16-byte digests (unsigned lexicographic
  * byte order == lowercase-hex string order, so the minima are
  * identical) and hex-encodes only the `seeds` winners per row.
  *
  * Null shingle elements are skipped (the composed form's md5(NULL) =
  * NULL never wins array_min over non-null candidates); an empty or
  * all-null array yields NULL elements, matching array_min on empties.
  */
case class MinHashSigExpr(child: Expression, seeds: Int)
  extends UnaryExpression {

  require(seeds > 0 && seeds <= Md5SeededExpr.SeedSuffixes.length,
    s"seeds must be in [1, ${Md5SeededExpr.SeedSuffixes.length}], got $seeds")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minhash_sig"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig requires ARRAY<STRING>, got ${t.sql}")
  }

  protected override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val md = Md5SeededExpr.localDigest.get()
    val out = MinHashSigExpr.eval(arr, seeds, md)
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mdCls = classOf[MessageDigest].getName
    val helper = MinHashSigExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val md = ctx.addMutableState(mdCls, "graftMinhashMd5",
      v => s"""try { $v = $mdCls.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
            """.stripMargin)
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("sig")
      s"""
         |UTF8String[] $out = $helper.eval($c, $seeds, $md);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigExpr {

  /** One pass over the shingles: per element, UTF-8 bytes once, then
    * `seeds` digests against the shared suffix table; per-seed minimum
    * kept as the raw 16-byte digest (unsigned byte order — identical
    * ordering to the hex strings). Hex-encode only the winners. */
  def eval(arr: ArrayData, seeds: Int, md: MessageDigest): Array[UTF8String] = {
    val n = arr.numElements()
    val mins = new Array[Array[Byte]](seeds)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val base = arr.getUTF8String(i).getBytes
        var j = 0
        while (j < seeds) {
          md.reset()
          md.update(base)
          md.update(Md5SeededExpr.SeedSuffixes(j))
          val d = md.digest()
          if (mins(j) == null || unsignedLess(d, mins(j))) mins(j) = d
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[UTF8String](seeds)
    var j = 0
    while (j < seeds) {
      if (mins(j) != null) out(j) = UTF8String.fromBytes(Md5SeededExpr.hex(mins(j)))
      j += 1
    }
    out
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }
}
