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
}
