package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All `seeds` portable minhash digests of one shingle in a single
  * pass: element j is EXACTLY `md5(concat(s, '#', j))` (lowercase hex,
  * j rendered as decimal digits) — byte-identical to the built-in
  * composition the DuckDB oracles replicate (`MD5(s || '#' || j)`), so
  * swapping it into the md5-minhash path changes no oracle.
  *
  * Why: the composed form builds 16 independent `Concat`+`Md5`
  * expression trees, each allocating a fresh concat buffer and a fresh
  * `MessageDigest` per shingle per seed (~38 M digest setups at sf0.1
  * across d02b/d06/p01). This expression converts the shingle's bytes
  * once and reuses ONE digest instance held in codegen mutable state
  * (or a thread-local on the interpreted path — digest instances are
  * not thread-safe).
  */
case class Md5SeededExpr(child: Expression, seeds: Int) extends UnaryExpression {

  require(seeds > 0 && seeds <= Md5SeededExpr.SeedSuffixes.length,
    s"seeds must be in [1, ${Md5SeededExpr.SeedSuffixes.length}], got $seeds")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_md5_seeded"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_md5_seeded requires STRING input, got ${child.dataType.sql}")

  protected override def nullSafeEval(input: Any): Any = {
    val base = input.asInstanceOf[UTF8String].getBytes
    val md = Md5SeededExpr.localDigest.get()
    val out = new Array[UTF8String](seeds)
    var j = 0
    while (j < seeds) {
      md.reset()
      md.update(base)
      md.update(Md5SeededExpr.SeedSuffixes(j))
      out(j) = UTF8String.fromBytes(Md5SeededExpr.hex(md.digest()))
      j += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mdCls = classOf[MessageDigest].getName
    val helper = Md5SeededExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val md = ctx.addMutableState(mdCls, "graftMd5",
      v => s"""try { $v = $mdCls.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
            """.stripMargin)
    nullSafeCodeGen(ctx, ev, c => {
      val base = ctx.freshName("base")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      s"""
         |byte[] $base = $c.getBytes();
         |UTF8String[] $out = new UTF8String[$seeds];
         |for (int $j = 0; $j < $seeds; $j++) {
         |  $md.reset();
         |  $md.update($base);
         |  $md.update($helper.SeedSuffixes()[$j]);
         |  $out[$j] = UTF8String.fromBytes($helper.hex($md.digest()));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5SeededExpr {
  /** "#0", "#1", … as UTF-8 bytes — identical to `concat(s, '#', j)`'s
    * suffix for any realistic seed count. */
  val SeedSuffixes: Array[Array[Byte]] =
    Array.tabulate(64)(j => s"#$j".getBytes("UTF-8"))

  private val HexChars = "0123456789abcdef".getBytes
  /** Lowercase hex — matches Spark's Md5 and DuckDB's MD5 output. */
  def hex(digest: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](digest.length * 2)
    var i = 0
    while (i < digest.length) {
      out(i * 2) = HexChars((digest(i) >> 4) & 0xf)
      out(i * 2 + 1) = HexChars(digest(i) & 0xf)
      i += 1
    }
    out
  }

  private[functions] val localDigest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
}
