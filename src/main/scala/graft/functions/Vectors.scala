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

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Random-hyperplane LSH bucket id: `planes` pseudo-random ±1
    * hyperplanes derived from xxhash64(plane, dim) parity — fully
    * deterministic, no stored model. Bucket = sign-bit integer. */
  def hyperplaneBucket(v: Column, numPlanes: Int = 8): Column = {
    val bits = (0 until numPlanes).map { p =>
      val proj = aggregate(
        zip_with(
          v,
          transform(sequence(lit(0), size(v) - 1),
            i => when(xxhash64(lit(p), i).bitwiseAND(lit(1L)) === 0, lit(1.0)).otherwise(lit(-1.0))),
          (x, s) => x * s),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1 << p)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }
}
