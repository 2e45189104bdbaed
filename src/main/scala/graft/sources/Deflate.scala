package graft.sources

/** Shared full-stream deflate with an expansion-safe drain loop:
  * deflate can EXPAND incompressible data (~5 B per 64 KB block +
  * stream overhead), and a single deflate() call into a fixed buffer
  * would silently truncate the stream past that point (review finding
  * r8). One copy, used by every codec writer that emits zlib streams
  * ([[GeoTiff]], [[Hdf]]) so a buffer/level/end() fix propagates. */
private[sources] object Deflate {
  def apply(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](64 * 1024)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }
}
