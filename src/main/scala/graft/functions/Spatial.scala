package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Spatial layout keys (i34 / Scale.zorderCompact): quantization and
  * bit-interleaving as pure integer Column arithmetic — codegen'd,
  * zero-shuffle, identical on any engine (the DuckDB oracle replays
  * the same shift/mask terms).
  */
object Spatial {

  /** Quantize a coordinate in [-offset, -offset + span) to an 8-bit cell. */
  def quantize8(c: Column, offset: Double, span: Double): Column =
    least(greatest(floor((c + offset) / span * 256), lit(0)), lit(255)).cast("int")

  /** 16-bit Morton (Z-order) key from two 8-bit cells: interleave the
    * bits so that nearby (x, y) cells share key prefixes — the 1-D
    * clustering order under which per-file min/max stats prune 2-D
    * bbox queries. */
  def morton16(qx: Column, qy: Column): Column =
    (0 until 8).map { i =>
      shiftleft(shiftright(qx, i).bitwiseAND(lit(1)), 2 * i) +
        shiftleft(shiftright(qy, i).bitwiseAND(lit(1)), 2 * i + 1)
    }.reduce(_ + _).cast("int")
}
