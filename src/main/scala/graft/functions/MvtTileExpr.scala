package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType}

/** Mapbox-Vector-Tile PROTOBUF encoder (MVT spec 2.1, public wire
  * format) — the byte half of the reference's `ST_AsMVT`
  * (`raster_vector.py:88`) that i15b's coordinate transform stopped
  * short of. Input: one tile's point features as a SORTED
  * `array<struct<id long, lx int, ly int, el double>>` (tile-local
  * integer coords from ST_AsMVTGeom's math, i15b). Output: the
  * complete serialized tile —
  *
  *   Tile.layer(3): Layer{ version=2, name, extent,
  *     features: Feature{ id, tags=[0, i], type=POINT,
  *                        geometry=[MoveTo, zigzag dx, zigzag dy] },
  *     keys=["el_val"], values: Value{ double_value } per feature }
  *
  * emitted directly as protobuf varint/zigzag/length-delimited bytes —
  * ~60 lines of arithmetic, no codegen library. Every byte is
  * deterministic in the input, so the tile LENGTH is independently
  * recomputable in ANSI SQL from varint-length arithmetic (the i15c
  * oracle does exactly that), and a spec-side decoder proves the
  * coordinate/id/value round-trip.
  *
  * Evaluated per TILE (coarse aggregated rows, thousands at planet
  * scale — never per point), so interpreted evaluation
  * (CodegenFallback) costs nothing measurable; the per-point work all
  * happened in the codegen'd projection + aggregation upstream. */
case class MvtTileExpr(child: Expression, layerName: String = "events",
    extent: Int = 4096) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_mvt_tile"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(s: org.apache.spark.sql.types.StructType, _) if s.length == 4 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<struct<id,lx,ly,el>>, got ${other.sql}")
    }

  protected override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    MvtTileExpr.encode(arr, layerName, extent)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MvtTileExpr {
  import java.io.ByteArrayOutputStream

  private def varint(b: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0L) { b.write(((v & 0x7FL) | 0x80L).toInt); v >>>= 7 }
    b.write((v & 0x7FL).toInt)
  }
  private def zigzag(n: Int): Long = ((n << 1) ^ (n >> 31)).toLong & 0xFFFFFFFFL
  private def lenDelim(b: ByteArrayOutputStream, tag: Int, payload: Array[Byte]): Unit = {
    b.write(tag); varint(b, payload.length.toLong); b.write(payload)
  }

  private[graft] def encode(arr: ArrayData, layerName: String, extent: Int): Array[Byte] = {
    val n = arr.numElements()
    val layer = new ByteArrayOutputStream()
    layer.write(0x78); layer.write(2) // version = 2 (field 15)
    lenDelim(layer, 0x0A, layerName.getBytes("UTF-8")) // name (field 1)
    var i = 0
    while (i < n) { // features (field 2), in input (id-sorted) order
      val p = arr.getStruct(i, 4)
      val f = new ByteArrayOutputStream()
      f.write(0x08); varint(f, p.getLong(0)) // id (field 1)
      val tags = new ByteArrayOutputStream() // tags (field 2, packed)
      varint(tags, 0L); varint(tags, i.toLong) // key 0 ("el_val") → value i
      lenDelim(f, 0x12, tags.toByteArray)
      f.write(0x18); f.write(1) // type (field 3) = POINT
      val g = new ByteArrayOutputStream() // geometry (field 4, packed)
      varint(g, 9L) // MoveTo ×1: (1 & 7) | (1 << 3)
      varint(g, zigzag(p.getInt(1)))
      varint(g, zigzag(p.getInt(2)))
      lenDelim(f, 0x22, g.toByteArray)
      lenDelim(layer, 0x12, f.toByteArray)
      i += 1
    }
    lenDelim(layer, 0x1A, "el_val".getBytes("UTF-8")) // keys (field 3)
    i = 0
    while (i < n) { // values (field 4): Value{ double_value (field 3) }
      val p = arr.getStruct(i, 4)
      val v = new ByteArrayOutputStream()
      v.write(0x19) // (3 << 3) | 1 — 64-bit
      val bits = java.lang.Double.doubleToLongBits(p.getDouble(3))
      var k = 0
      while (k < 8) { v.write(((bits >>> (8 * k)) & 0xFF).toInt); k += 1 }
      lenDelim(layer, 0x22, v.toByteArray)
      i += 1
    }
    layer.write(0x28); varint(layer, extent.toLong) // extent (field 5)
    val tile = new ByteArrayOutputStream()
    lenDelim(tile, 0x1A, layer.toByteArray) // Tile.layers (field 3)
    tile.toByteArray
  }
}
