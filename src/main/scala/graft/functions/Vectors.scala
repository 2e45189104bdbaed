package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge

/** Dense-vector math over Array[Double] columns, backed by the native
  * codegen expressions in [[VectorExprs]] (index-ordered folds, so
  * results are bit-identical to a sequential C loop — which keeps the
  * DuckDB oracle exact — but run as generated primitive loops inside
  * whole-stage codegen instead of interpreted higher-order folds).
  */
object Vectors {

  private def ex(c: Column) = ColumnBridge.expression(c)

  def dot(a: Column, b: Column): Column = ColumnBridge.column(DotExpr(ex(a), ex(b)))

  def norm(a: Column): Column = ColumnBridge.column(NormExpr(ex(a)))

  /** NaN for zero-norm inputs (ANSI mode would otherwise raise
    * DIVIDE_BY_ZERO). Single pass over both arrays. */
  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimExpr(ex(a), ex(b)))

  /** Deterministic ±1 pseudo-random hyperplane (splitmix64 parity per
    * (plane, dim)) — computed ONCE in Scala; consumed by the bucket
    * expression and inlined as literals into oracle SQL. */
  def planeSigns(plane: Int, dims: Int): Array[Double] = {
    def splitmix(x0: Long): Long = {
      var x = x0 + 0x9E3779B97F4A7C15L
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x ^ (x >>> 31)
    }
    Array.tabulate(dims)(i => if ((splitmix(plane.toLong * 1000003L + i) & 1L) == 0L) 1.0 else -1.0)
  }

  /** Random-hyperplane LSH bucket id over a `dims`-dim vector column.
    * Bucket = integer of sign bits of the `numPlanes` projections. */
  def hyperplaneBucket(v: Column, numPlanes: Int = 8, dims: Int = 64): Column =
    ColumnBridge.column(HyperplaneBucketExpr(ex(v), numPlanes, dims))

  /** Codebooks at or below this K inline as literal expressions (the
    * codebook folds into the plan — zero runtime objects, the shape
    * every existing oracle covers); above it the codebook moves behind
    * an executor Broadcast ([[CodebookArgmaxExpr]]). A production IVF
    * codebook (K=4k–64k × 768-dim, FAISS regime) cannot live in the
    * expression tree — `typedlit` literals blow the plan size and the
    * codegen constant pool — and a broadcast JOIN would materialize
    * N×K candidate rows plus a keyed re-aggregation shuffle for the
    * argmax; the broadcast-expression rung keeps assignment a
    * zero-shuffle map-side projection at any K. */
  val InlineCodebookK = 32

  /** Nearest-centroid cid (highest cosine, ties → smallest cid — the
    * oracle ROW_NUMBER order), gated on K between the literal-inlined
    * argmax and the broadcast-codebook expression. Both rungs are
    * bit-identical (spec-asserted: CodebookSpec). */
  def codebookArgmaxCid(v: Column, centroids: Seq[(Int, Array[Double])],
      spark: org.apache.spark.sql.SparkSession,
      inlineGate: Int = InlineCodebookK): Column =
    if (centroids.size <= inlineGate) {
      import org.apache.spark.sql.functions.{array, array_max, lit, struct, typedlit}
      val best = array_max(array(centroids.map { case (cid, cv) =>
        struct(cosine(v, typedlit(cv)).as("c"), lit(-cid).as("n")) }: _*))
      -best.getField("n")
    } else {
      val bc = spark.sparkContext.broadcast(Codebook(centroids))
      ColumnBridge.column(CodebookArgmaxExpr(ex(v), bc))
    }
}
