package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Membership-COUNT of an array&lt;string&gt; column against a SORTED
  * broadcast array, by per-element binary search: returns
  * min(|{x ∈ arr : x ∈ set}|, cap).
  *
  * The exact-confirm tier of st14's contamination gate (paired with
  * [[BloomMatchCountExpr]] as the cheap reject): the eval-gram set
  * ships as an IMMUTABLE sorted UTF8String array — the same
  * torrent-broadcast model-state discipline as the s04/s19 codebooks
  * ([[CodebookArgmaxExpr]]), not a mutable driver HashSet — and each
  * row costs O(|arr| · log n) binary string compares with an early
  * exit at `cap`. This exists because BOTH join-based confirms priced
  * super-linearly on a dirty-dominant stream: `array_intersect`
  * against the gram array rebuilds the big side's hash set PER ROW,
  * and a broadcast nested-loop join copies the MB-sized array into
  * every joined row (56× past linear at ×10, BENCH_sf1 r9 first cut).
  * The array MUST be sorted by UTF8String binary order
  * (java.util.Arrays.sort of UTF8String — its Comparable). */
case class SortedMatchCountExpr(child: Expression,
    set: org.apache.spark.broadcast.Broadcast[Array[UTF8String]],
    cap: Int)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_sorted_match_count"

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
      if (!arr.isNullAt(i) &&
        java.util.Arrays.binarySearch(s.asInstanceOf[Array[AnyRef]],
          arr.getUTF8String(i)) >= 0) n += 1
      i += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("graftSortedBc", set,
      "org.apache.spark.broadcast.Broadcast")
    // fetched from the broadcast ONCE per generated-class instance
    val s = ctx.addMutableState(
      "org.apache.spark.unsafe.types.UTF8String[]", "graftSortedSet",
      v => s"$v = (org.apache.spark.unsafe.types.UTF8String[]) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val len = ctx.freshName("len")
      s"""
         |int $n = 0;
         |int $len = $a.numElements();
         |for (int $i = 0; $i < $len && $n < $cap; $i++) {
         |  if (!$a.isNullAt($i) &&
         |      java.util.Arrays.binarySearch((Object[]) $s,
         |        $a.getUTF8String($i)) >= 0) $n++;
         |}
         |${ev.value} = $n;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Bloom-membership COUNT of an array&lt;string&gt; column against a
  * serialized Spark [[org.apache.spark.util.sketch.BloomFilter]], with
  * the same early-exit cap as [[SortedMatchCountExpr]]: returns
  * min(|{x ∈ arr : bloom.mightContain(xxhash64(x))}|, cap).
  *
  * The d09 discipline applied to array probes: the filter blob is
  * built by Spark's own `BloomFilterAggregate` over `xxhash64(key)`
  * (executor-side aggregation — the driver only ever holds the
  * FIXED-SIZE blob, never a per-item structure, unlike a collected
  * HashSet whose footprint is data-shaped), and rides the plan as a
  * reference object deserialized once per generated-class instance.
  * Bloom filters have NO false negatives, so `count < cap` proves
  * fewer than `cap` true matches — the exact confirm tier only ever
  * sees the sparse might-match sliver. Hashing matches Spark's
  * `xxhash64` (XXH64 over the UTF8String bytes, seed 42), which is
  * what makes blobs built with `xxhash64(col)` probe-compatible. */
case class BloomMatchCountExpr(child: Expression, bloomBytes: Array[Byte],
    cap: Int)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_bloom_match_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string>, got ${other.catalogString}")
  }

  @transient private lazy val bloom =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloomBytes))

  private def xx64(s: UTF8String): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(s, 42L)

  protected override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    var n = 0
    var i = 0
    val len = arr.numElements()
    while (i < len && n < cap) {
      if (!arr.isNullAt(i) &&
        bloom.mightContainLong(xx64(arr.getUTF8String(i)))) n += 1
      i += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bytesRef = ctx.addReferenceObj("graftBloomBytes", bloomBytes, "byte[]")
    // deserialized from the plan-carried blob ONCE per generated-class
    // instance (same stance as SortedMatchCountExpr's broadcast fetch)
    val bf = ctx.addMutableState("org.apache.spark.util.sketch.BloomFilter",
      "graftBloom",
      v => s"""try {
         |  $v = org.apache.spark.util.sketch.BloomFilter.readFrom(
         |    new java.io.ByteArrayInputStream($bytesRef));
         |} catch (java.io.IOException e) {
         |  throw new RuntimeException(e);
         |}""".stripMargin)
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val len = ctx.freshName("len")
      val s = ctx.freshName("s")
      s"""
         |int $n = 0;
         |int $len = $a.numElements();
         |for (int $i = 0; $i < $len && $n < $cap; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
         |    if ($bf.mightContainLong(
         |        org.apache.spark.sql.catalyst.expressions.XXH64
         |          .hashUTF8String($s, 42L)))
         |      $n++;
         |  }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
