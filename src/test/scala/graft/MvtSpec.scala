package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** [[graft.functions.MvtTileExpr]] — proves the emitted protobuf is a
  * WELL-FORMED MVT tile by decoding it with an independent wire-format
  * parser and round-tripping every feature. (The i15c oracle
  * independently pins the byte LENGTH via SQL varint arithmetic; this
  * spec pins the CONTENT.) */
class MvtSpec extends SparkSpec {

  // minimal protobuf wire reader
  private final class Reader(bytes: Array[Byte], var pos: Int, val end: Int) {
    def varint(): Long = {
      var shift = 0; var v = 0L
      while ({ val b = bytes(pos); pos += 1
        v |= (b & 0x7FL) << shift; shift += 7; (b & 0x80) != 0 }) ()
      v
    }
    def sub(): Reader = { val len = varint().toInt; val r = new Reader(bytes, pos, pos + len); pos += len; r }
    def bytesField(): Array[Byte] = { val len = varint().toInt
      val a = bytes.slice(pos, pos + len); pos += len; a }
    def fixed64(): Long = { var v = 0L; var k = 0
      while (k < 8) { v |= (bytes(pos).toLong & 0xFF) << (8 * k); pos += 1; k += 1 }; v }
    def hasMore: Boolean = pos < end
  }
  private def unzigzag(v: Long): Int = (((v >>> 1) ^ -(v & 1)).toInt)

  case class Feat(id: Long, tags: Seq[Long], lx: Int, ly: Int)
  case class Tile(version: Long, name: String, extent: Long,
      feats: Seq[Feat], keys: Seq[String], values: Seq[Double])

  private def decode(bytes: Array[Byte]): Tile = {
    val top = new Reader(bytes, 0, bytes.length)
    assert(top.varint() == 0x1A, "Tile.layers tag") // field 3, wire 2
    val layer = top.sub()
    var version = -1L; var name = ""; var extent = -1L
    val feats = Seq.newBuilder[Feat]; val keys = Seq.newBuilder[String]
    val values = Seq.newBuilder[Double]
    while (layer.hasMore) layer.varint() match {
      case 0x78 => version = layer.varint()
      case 0x0A => name = new String(layer.bytesField(), "UTF-8")
      case 0x28 => extent = layer.varint()
      case 0x1A => keys += new String(layer.bytesField(), "UTF-8")
      case 0x22 => // Value { double_value = 3 }
        val v = layer.sub()
        assert(v.varint() == 0x19, "double_value tag")
        values += java.lang.Double.longBitsToDouble(v.fixed64())
      case 0x12 => // Feature
        val f = layer.sub()
        var id = -1L; var tags = Seq.empty[Long]; var lx = 0; var ly = 0
        while (f.hasMore) f.varint() match {
          case 0x08 => id = f.varint()
          case 0x12 => val t = f.sub()
            val b = Seq.newBuilder[Long]; while (t.hasMore) b += t.varint()
            tags = b.result()
          case 0x18 => assert(f.varint() == 1L, "POINT type")
          case 0x22 => val g = f.sub()
            assert(g.varint() == 9L, "MoveTo x1 command")
            lx = unzigzag(g.varint()); ly = unzigzag(g.varint())
          case other => fail(s"unexpected feature tag $other")
        }
        feats += Feat(id, tags, lx, ly)
      case other => fail(s"unexpected layer tag $other")
    }
    Tile(version, name, extent, feats.result(), keys.result(), values.result())
  }

  test("encoded tile decodes back to exactly the input features") {
    import spark.implicits._
    val pts = Seq((42L, 0, 4096, 1.25), (7L, 130, 5, -3.5), (1000000L, 2048, 2048, 0.0))
    val df = pts.toDF("event_id", "lx", "ly", "el_val")
      .agg(sort_array(collect_list(
        struct(col("event_id"), col("lx"), col("ly"), col("el_val")))).as("pts"))
      .select(ColumnBridge.column(graft.functions.MvtTileExpr(
        ColumnBridge.expression(col("pts")))).as("tile"))
    val tile = decode(df.collect()(0).getAs[Array[Byte]](0))
    assert(tile.version == 2L && tile.name == "events" && tile.extent == 4096L)
    assert(tile.keys == Seq("el_val"))
    // id-sorted feature order; tags = [keyIdx 0, valueIdx i]
    val sorted = pts.sortBy(_._1)
    assert(tile.feats == sorted.zipWithIndex.map { case ((id, lx, ly, _), i) =>
      Feat(id, Seq(0L, i.toLong), lx, ly) })
    assert(tile.values == sorted.map(_._4))
  }

  test("tile byte length matches the oracle's varint arithmetic on a crafted input") {
    import spark.implicits._
    // varint length boundaries on purpose: ids 127/128, coords whose
    // zigzag crosses the 1-byte/2-byte line (63 → 126, 64 → 128)
    val pts = Seq((127L, 63, 64, 1.0), (128L, 0, 4096, 2.0))
    val df = pts.toDF("event_id", "lx", "ly", "el_val")
      .agg(sort_array(collect_list(
        struct(col("event_id"), col("lx"), col("ly"), col("el_val")))).as("pts"))
      .select(ColumnBridge.column(graft.functions.MvtTileExpr(
        ColumnBridge.expression(col("pts")))).as("tile"))
    val bytes = df.collect()(0).getAs[Array[Byte]](0)
    def vlen(x: Long) = if (x < 128) 1 else if (x < 16384) 2 else 3
    val fw = pts.sortBy(_._1).zipWithIndex.map { case ((id, lx, ly, _), i) =>
      11 + vlen(id) + vlen(i.toLong) + vlen(2L * lx) + vlen(2L * ly) }
    val ll = 2 + 8 + fw.sum + 8 + 11 * pts.size + 3
    assert(bytes.length == 1 + vlen(ll) + ll)
  }
}
