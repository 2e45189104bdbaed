package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over Array[Double] columns via higher-order
  * functions — index-ordered folds, so results are bit-identical to a
  * sequential C loop (which keeps the DuckDB oracle exact).
  */
object Vectors {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  /** NaN for zero-norm inputs (ANSI mode would otherwise raise
    * DIVIDE_BY_ZERO; when() keeps the division unevaluated). */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0.0, lit(Double.NaN)).otherwise(dot(a, b) / d)
  }

  /** Deterministic ±1 pseudo-random hyperplane (splitmix64 parity per
    * (plane, dim)) — computed ONCE in Scala and shipped as a literal
    * array, not re-derived per row. */
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
  def hyperplaneBucket(v: Column, numPlanes: Int = 8, dims: Int = 64): Column = {
    val bits = (0 until numPlanes).map { p =>
      val proj = aggregate(
        zip_with(v, typedlit(planeSigns(p, dims)), (x, s) => x * s),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1 << p)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }
}
