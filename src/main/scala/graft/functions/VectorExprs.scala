package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StructField, StructType}

/** Native Catalyst expressions for the dense-vector hot path
  * (SURVEY §4 preference (b), mold: [[RollingFingerprintExpr]]).
  *
  * The previous formulation composed `zip_with` + `aggregate`
  * higher-order folds, which run INTERPRETED (a lambda closure per
  * element) and allocate an intermediate array per row — measured ~10×
  * slower than codegen for the minhash signatures (SURVEY §7), and the
  * embedding operators pay that per (pair × 64 dims). These
  * expressions generate tight primitive loops inside whole-stage
  * codegen with zero allocation.
  *
  * Numeric parity: every accumulator folds in ascending index order,
  * exactly like the sequential `aggregate` fold they replace and like
  * DuckDB's list functions — results are bit-identical, so the
  * existing oracles keep hash-matching.
  *
  * Element-null caveat: rows with a NULL array are null-propagated
  * (`nullIntolerant`), but individual NULL ELEMENTS inside an array
  * are not checked — embedding vectors are dense by contract (parquet
  * float arrays cast to double). Arrays of differing lengths fold over
  * the common prefix.
  */
private object VectorExprs {
  def checkArrayOfDouble(name: String, dts: DataType*): TypeCheckResult =
    dts.find { case ArrayType(DoubleType, _) => false; case _ => true } match {
      case Some(bad) => TypeCheckResult.TypeCheckFailure(
        s"$name requires ARRAY<DOUBLE> input, got ${bad.sql}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
}

/** dot(a, b) = Σ a(i)·b(i) over the common prefix length. */
case class DotExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_dot"
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.checkArrayOfDouble(prettyName, left.dataType, right.dataType)

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $acc += $a.getDouble($i) * $b.getDouble($i); }
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** norm(a) = sqrt(Σ a(i)²). */
case class NormExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_norm"
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.checkArrayOfDouble(prettyName, child.dataType)

  protected override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) { val v = x.getDouble(i); acc += v * v; i += 1 }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) { double $v = $a.getDouble($i); $acc += $v * $v; }
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** cosine(a, b) = dot/(‖a‖·‖b‖), NaN on zero norms (matching the HOF
  * formulation's ANSI-safe guard) — ONE pass over both arrays instead
  * of three. */
case class CosineSimExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_cosine"
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.checkArrayOfDouble(prettyName, left.dataType, right.dataType)

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i)
      val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) Double.NaN else dot / d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.getDouble($i); double $yv = $b.getDouble($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |double $d = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = ($d == 0.0) ? Double.NaN : $dot / $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Random-hyperplane LSH bucket id: bit p of the result is the sign of
  * the projection onto deterministic ±1 plane p ([[Vectors.planeSigns]]).
  * All `numPlanes` projections run in one generated loop nest over the
  * row — the interpreted predecessor re-folded the vector once per
  * plane through `zip_with`+`aggregate`. */
case class HyperplaneBucketExpr(child: Expression, numPlanes: Int, dims: Int)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_hyperplane_bucket"
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.checkArrayOfDouble(prettyName, child.dataType)

  /** Plane sign matrix, flattened (plane-major), shared across rows. */
  @transient private lazy val flatSigns: Array[Double] =
    Array.tabulate(numPlanes * dims)(k => Vectors.planeSigns(k / dims, dims)(k % dims))

  protected override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = math.min(dims, v.numElements())
    var bucket = 0
    var p = 0
    while (p < numPlanes) {
      val off = p * dims
      var proj = 0.0
      var i = 0
      while (i < n) { proj += v.getDouble(i) * flatSigns(off + i); i += 1 }
      if (proj >= 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signs = ctx.addReferenceObj("graftPlaneSigns", flatSigns, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val bucket = ctx.freshName("bucket")
      val p = ctx.freshName("p")
      val off = ctx.freshName("off")
      val proj = ctx.freshName("proj")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($dims, $a.numElements());
         |int $bucket = 0;
         |for (int $p = 0; $p < $numPlanes; $p++) {
         |  int $off = $p * $dims;
         |  double $proj = 0.0;
         |  for (int $i = 0; $i < $n; $i++) { $proj += $a.getDouble($i) * $signs[$off + $i]; }
         |  if ($proj >= 0.0) $bucket |= (1 << $p);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** int8 scalar-quantization round-trip summary (s06 hot path): given
  * the per-dim grid (mins and spans = max−min, the tiny stats-prepass
  * result shipped as literals), returns
  * `struct(code_sum BIGINT, err2_sum DOUBLE)` where
  * code_i = clamp(floor((v_i − mn_i)/sp_i · 255), 0, 255) (0 when
  * sp_i = 0), code_sum = Σ code_i·(i+1) and err2_sum = Σ (mn_i +
  * (code_i + 0.5)·sp_i/255 − v_i)². Arithmetic association and fold
  * order are identical to the interpreted transform/aggregate
  * composition it replaces (and to the DuckDB oracle), so s06 keeps
  * hash-matching — but the whole encode runs as one generated
  * primitive loop instead of 64 interpreted `element_at` lambdas
  * per row. */
case class Int8QuantExpr(child: Expression, mins: Array[Double], spans: Array[Double])
    extends UnaryExpression {
  require(mins.length == spans.length, "mins/spans must have equal length")

  override def dataType: DataType = StructType(Seq(
    StructField("code_sum", LongType, nullable = false),
    StructField("err2_sum", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_int8_quant"
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.checkArrayOfDouble(prettyName, child.dataType)

  protected override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = math.min(mins.length, v.numElements())
    var cs = 0.0
    var es = 0.0
    var i = 0
    while (i < n) {
      val x = v.getDouble(i)
      val mn = mins(i)
      val sp = spans(i)
      val code = if (sp == 0.0) 0.0
        else math.min(math.max(math.floor((x - mn) / sp * 255.0), 0.0), 255.0)
      cs += code * (i + 1)
      val e = mn + (code + 0.5) * sp / 255.0 - x
      es += e * e
      i += 1
    }
    InternalRow(cs.toLong, es)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val minsRef = ctx.addReferenceObj("graftQuantMins", mins, "double[]")
    val spansRef = ctx.addReferenceObj("graftQuantSpans", spans, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val cs = ctx.freshName("cs")
      val es = ctx.freshName("es")
      val x = ctx.freshName("x")
      val mn = ctx.freshName("mn")
      val sp = ctx.freshName("sp")
      val code = ctx.freshName("code")
      val e = ctx.freshName("e")
      s"""
         |int $n = java.lang.Math.min($minsRef.length, $a.numElements());
         |double $cs = 0.0; double $es = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getDouble($i);
         |  double $mn = $minsRef[$i];
         |  double $sp = $spansRef[$i];
         |  double $code = ($sp == 0.0) ? 0.0
         |    : java.lang.Math.min(java.lang.Math.max(
         |        java.lang.Math.floor(($x - $mn) / $sp * 255.0), 0.0), 255.0);
         |  $cs += $code * ($i + 1);
         |  double $e = $mn + ($code + 0.5) * $sp / 255.0 - $x;
         |  $es += $e * $e;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] { (long) $cs, $es });
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Executor-shared codebook payload for [[CodebookArgmaxExpr]]:
  * centroid ids, the centroid matrix flattened centroid-major, and the
  * per-centroid L2 norms precomputed ONCE (index-ordered folds, so the
  * cosine below is bit-identical to [[CosineSimExpr]] against each
  * centroid). At production shape (K=4k–64k × 768 dims, FAISS regime)
  * this is tens–hundreds of MB — exactly what a torrent Broadcast is
  * for, and exactly what can NOT live in the expression tree as
  * literals (plan size, constant-pool and codegen method limits). */
case class Codebook(cids: Array[Int], flat: Array[Double], dims: Int,
    norms: Array[Double]) {
  def k: Int = cids.length
}

object Codebook {
  def apply(centroids: Seq[(Int, Array[Double])]): Codebook = {
    require(centroids.nonEmpty, "empty codebook")
    val dims = centroids.head._2.length
    require(centroids.forall(_._2.length == dims), "ragged codebook")
    val flat = new Array[Double](centroids.size * dims)
    val norms = new Array[Double](centroids.size)
    centroids.zipWithIndex.foreach { case ((_, cv), kk) =>
      System.arraycopy(cv, 0, flat, kk * dims, dims)
      var acc = 0.0
      var i = 0
      while (i < dims) { acc += cv(i) * cv(i); i += 1 }
      norms(kk) = math.sqrt(acc)
    }
    new Codebook(centroids.map(_._1).toArray, flat, dims, norms)
  }
}

/** Nearest-centroid assignment against an executor-BROADCAST codebook:
  * returns the cid of the highest-cosine centroid, ties to the
  * smallest cid — the exact semantics of the literal-inlined
  * `array_max(array(struct(cosine, -cid)…))` argmax it gates with
  * (SQL double ordering: NaN greatest, -0.0 == 0.0), reproduced here
  * with `x == y ? 0 : Double.compare(x, y)`.
  *
  * Scale design: the codebook rides a [[Broadcast]] handle — the plan
  * holds ONE O(1) expression node regardless of K, the payload ships
  * torrent-broadcast once per executor (not per task), and codegen is
  * a fixed-size doubly-nested loop over the flat matrix, so assignment
  * stays a zero-shuffle map-side projection at any K. The alternative
  * broadcast-JOIN formulation would materialize N×K candidate rows and
  * need a keyed re-aggregation (a full shuffle of the corpus) to take
  * the per-row argmax — strictly worse than this fused loop.
  *
  * Parity caveat: centroid norms are precomputed over the full `dims`;
  * input vectors are dense `dims`-length by contract (the file-wide
  * element-null caveat applies). The row vector's norm is computed
  * once and reused across all K centroids — bit-identical to the
  * per-centroid recomputation it replaces (same fold order). */
case class CodebookArgmaxExpr(child: Expression,
    codebook: org.apache.spark.broadcast.Broadcast[Codebook])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_codebook_argmax"
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.checkArrayOfDouble(prettyName, child.dataType)

  protected override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cb = codebook.value
    val n = math.min(cb.dims, v.numElements())
    var vn = 0.0
    var i = 0
    while (i < n) { val x = v.getDouble(i); vn += x * x; i += 1 }
    val vnorm = math.sqrt(vn)
    var bestC = 0.0
    var bestCid = 0
    var kk = 0
    while (kk < cb.k) {
      val off = kk * cb.dims
      var dot = 0.0
      i = 0
      while (i < n) { dot += v.getDouble(i) * cb.flat(off + i); i += 1 }
      val d = vnorm * cb.norms(kk)
      val c = if (d == 0.0) Double.NaN else dot / d
      // SQL double ordering (NaN greatest, -0.0 == 0.0), ties → min cid
      val cmp = if (kk == 0) 1
        else if (c == bestC) 0
        else java.lang.Double.compare(c, bestC)
      if (cmp > 0 || (cmp == 0 && cb.cids(kk) < bestCid)) {
        bestC = c; bestCid = cb.cids(kk)
      }
      kk += 1
    }
    bestCid
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("graftCodebookBc", codebook,
      "org.apache.spark.broadcast.Broadcast")
    // fetched from the broadcast ONCE per generated-class instance
    val cb = ctx.addMutableState("graft.functions.Codebook", "graftCodebook",
      v => s"$v = (graft.functions.Codebook) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val kk = ctx.freshName("kk")
      val x = ctx.freshName("x")
      val vn = ctx.freshName("vn")
      val vnorm = ctx.freshName("vnorm")
      val bestC = ctx.freshName("bestC")
      val bestCid = ctx.freshName("bestCid")
      val off = ctx.freshName("off")
      val dot = ctx.freshName("dot")
      val d = ctx.freshName("d")
      val c = ctx.freshName("c")
      val cmp = ctx.freshName("cmp")
      val flat = ctx.freshName("flat")
      val norms = ctx.freshName("norms")
      val cids = ctx.freshName("cids")
      s"""
         |double[] $flat = $cb.flat(); double[] $norms = $cb.norms();
         |int[] $cids = $cb.cids();
         |int $n = java.lang.Math.min($cb.dims(), $a.numElements());
         |double $vn = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getDouble($i); $vn += $x * $x;
         |}
         |double $vnorm = java.lang.Math.sqrt($vn);
         |double $bestC = 0.0; int $bestCid = 0;
         |for (int $kk = 0; $kk < $cids.length; $kk++) {
         |  int $off = $kk * $cb.dims();
         |  double $dot = 0.0;
         |  for (int $j = 0; $j < $n; $j++) { $dot += $a.getDouble($j) * $flat[$off + $j]; }
         |  double $d = $vnorm * $norms[$kk];
         |  double $c = ($d == 0.0) ? Double.NaN : $dot / $d;
         |  int $cmp = ($kk == 0) ? 1
         |    : (($c == $bestC) ? 0 : java.lang.Double.compare($c, $bestC));
         |  if ($cmp > 0 || ($cmp == 0 && $cids[$kk] < $bestCid)) {
         |    $bestC = $c; $bestCid = $cids[$kk];
         |  }
         |}
         |${ev.value} = $bestCid;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
