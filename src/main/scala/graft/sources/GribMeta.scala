package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GRIB message-level METADATA scanner — the cataloging half of the
  * reference's GRIB ingestion (`ecmwf_opendata/__init__.py` slices a
  * downloaded GRIB by variable/time/level before any pixel work; an
  * archive inventory needs exactly the per-message header fields, not
  * the packed data). Clean-room from the public WMO FM 92 GRIB
  * layouts (edition 1: WMO Manual on Codes; edition 2: GRIB2 section
  * structure):
  *
  *   - walks CONCATENATED messages in one file (the standard archive
  *     layout: one file = many messages, one per variable×level×step);
  *   - GRIB2: indicator section (discipline, edition, total length),
  *     identification section (centre, reference time), grid
  *     definition (template number, data-point count, Ni/Nj for the
  *     lat/lon template 3.0), product definition (template, parameter
  *     category/number);
  *   - GRIB1: 24-bit message length, PDS (centre, parameter,
  *     reference time incl. century octet), optional GDS (Ni/Nj for
  *     the lat/lon representation);
  *   - verifies the "7777" end marker per message and fails loudly on
  *     truncation — an inventory that silently drops tail messages
  *     undercounts an archive.
  *
  * PIXEL DECODE stays out of scope by design (GRIB2 payloads are
  * simple/complex/JPEG2000-packed; the engine's raster path is the
  * [[GeoTiff]] codec the reference itself publishes into). Scale
  * shape: [[scan]] runs the walk task-side over binaryFile — one task
  * per archive file, the driver never touches message bytes. */
object GribMeta {

  final case class Message(
      msgIndex: Int, edition: Int, totalLen: Long,
      discipline: Int,        // GRIB2 indicator octet 7; -1 for GRIB1
      centre: Int,
      paramCategory: Int,     // GRIB2 4.0 octet 10; -1 for GRIB1
      paramNumber: Int,       // GRIB2 4.0 octet 11; GRIB1 PDS octet 9
      refTime: String,        // "yyyy-MM-ddTHH:mm"
      gridTemplate: Int,      // GRIB2 §3 template; GRIB1 GDS rep type; -1 unknown
      nPoints: Long,          // GRIB2 §3 octets 7-10; -1 when absent
      ni: Int, nj: Int)       // lat/lon grid dims; -1 when not template 0/3.0

  private def u8(b: Array[Byte], o: Int): Int = b(o) & 0xff
  private def u16(b: Array[Byte], o: Int): Int = (u8(b, o) << 8) | u8(b, o + 1)
  private def u24(b: Array[Byte], o: Int): Int =
    (u8(b, o) << 16) | (u8(b, o + 1) << 8) | u8(b, o + 2)
  private def u32(b: Array[Byte], o: Int): Long =
    (u16(b, o).toLong << 16) | u16(b, o + 2).toLong
  private def u64(b: Array[Byte], o: Int): Long =
    (u32(b, o) << 32) | u32(b, o + 4)

  private def ts(year: Int, month: Int, day: Int, hour: Int, minute: Int) =
    f"$year%04d-$month%02d-${day}%02dT$hour%02d:$minute%02d"

  /** All messages in a (possibly multi-message) GRIB byte array. */
  def decode(bytes: Array[Byte]): Seq[Message] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Message]
    var off = 0
    var idx = 0
    while (off + 8 <= bytes.length) {
      require(new String(bytes, off, 4, "US-ASCII") == "GRIB",
        s"message $idx at offset $off: missing GRIB magic")
      val edition = u8(bytes, off + 7)
      val msg = edition match {
        case 2 =>
          val totalLen = u64(bytes, off + 8)
          require(off + totalLen <= bytes.length,
            s"truncated GRIB2 message $idx: $totalLen bytes declared")
          var centre = -1; var refTime = ""
          var gridTpl = -1; var nPoints = -1L; var ni = -1; var nj = -1
          var pCat = -1; var pNum = -1
          var so = off + 16 // first section after the 16-byte indicator
          val end = off + totalLen.toInt
          while (so < end - 4) { // the 4-byte "7777" trailer
            val len = u32(bytes, so).toInt
            require(len >= 5 && so + len <= end,
              s"corrupt GRIB2 section at $so (len=$len)")
            u8(bytes, so + 4) match {
              case 1 => // identification: centre octets 6-7, time 13-19
                centre = u16(bytes, so + 5)
                refTime = ts(u16(bytes, so + 12), u8(bytes, so + 14),
                  u8(bytes, so + 15), u8(bytes, so + 16), u8(bytes, so + 17))
              case 3 => // grid definition
                nPoints = u32(bytes, so + 6)
                gridTpl = u16(bytes, so + 12)
                if (gridTpl == 0 && len >= 38) { // lat/lon: Ni 31-34, Nj 35-38
                  ni = u32(bytes, so + 30).toInt
                  nj = u32(bytes, so + 34).toInt
                }
              case 4 => // product definition: param category/number at
                        // octets 10-11 (stable across the 4.x templates)
                if (len >= 11) {
                  pCat = u8(bytes, so + 9)
                  pNum = u8(bytes, so + 10)
                }
              case _ => ()
            }
            so += len
          }
          require(new String(bytes, end - 4, 4, "US-ASCII") == "7777",
            s"GRIB2 message $idx: missing 7777 end marker")
          Message(idx, 2, totalLen, u8(bytes, off + 6), centre,
            pCat, pNum, refTime, gridTpl, nPoints, ni, nj)
        case 1 =>
          val rawLen = u24(bytes, off + 4)
          // ECMWF "large GRIB1" convention (common in real archives):
          // a message over 2^23-1 bytes sets the TOP BIT of the 24-bit
          // length and stores ceil(trueLen/120) in the low 23 bits —
          // naively reading the field misparses the length and fails
          // the 7777/trailing-bytes requires (r8 advice). The field
          // bounds the true length to (bound-120, bound]; the exact
          // end is recovered by locating the 7777 trailer in that
          // 120-byte window, anchored by the next message's GRIB
          // magic (or EOF) to reject a 7777 that is packed data.
          val totalLen: Long =
            if ((rawLen & 0x800000) == 0) rawLen.toLong
            else {
              val bound = (rawLen & 0x7fffff).toLong * 120
              val lo = math.max(8L, bound - 119)
              val cand = (bound to lo by -1).find { e =>
                val end = off + e
                end <= bytes.length && end >= off + 8 &&
                  new String(bytes, (end - 4).toInt, 4, "US-ASCII") == "7777" &&
                  (end == bytes.length ||
                    (end + 4 <= bytes.length &&
                      new String(bytes, end.toInt, 4, "US-ASCII") == "GRIB"))
              }
              cand.getOrElse(throw new IllegalArgumentException(
                s"large GRIB1 message $idx: no 7777 trailer in the " +
                  s"extended-length window (bound $bound) — archive " +
                  "corrupt or an unsupported length convention"))
            }
          require(off + totalLen <= bytes.length,
            s"truncated GRIB1 message $idx: $totalLen bytes declared")
          val end = off + totalLen.toInt
          // PDS directly after the 8-byte indicator
          val pds = off + 8
          val pdsLen = u24(bytes, pds)
          val centre = u8(bytes, pds + 4)
          val gdsPresent = (u8(bytes, pds + 7) & 0x80) != 0
          val param = u8(bytes, pds + 8)
          val century = if (pdsLen >= 25) u8(bytes, pds + 24) else 21
          val year = (century - 1) * 100 + u8(bytes, pds + 12)
          val refTime = ts(year, u8(bytes, pds + 13), u8(bytes, pds + 14),
            u8(bytes, pds + 15), u8(bytes, pds + 16))
          var gridTpl = -1; var ni = -1; var nj = -1
          if (gdsPresent) {
            val gds = pds + pdsLen
            gridTpl = u8(bytes, gds + 5) // data representation type
            if (gridTpl == 0) { // lat/lon: Ni octets 7-8, Nj 9-10
              ni = u16(bytes, gds + 6)
              nj = u16(bytes, gds + 8)
            }
          }
          require(new String(bytes, end - 4, 4, "US-ASCII") == "7777",
            s"GRIB1 message $idx: missing 7777 end marker")
          Message(idx, 1, totalLen, -1, centre, -1, param, refTime,
            gridTpl, if (ni > 0 && nj > 0) ni.toLong * nj else -1L, ni, nj)
        case e => throw new IllegalArgumentException(
          s"message $idx: unsupported GRIB edition $e")
      }
      out += msg
      off += msg.totalLen.toInt
      idx += 1
    }
    require(off == bytes.length,
      s"trailing ${bytes.length - off} bytes after the last GRIB message")
    out.toSeq
  }

  /** Archive inventory: one row per GRIB message across every file
    * matching `path` (binaryFile glob), decoded task-side. */
  def scan(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (p, bytes) =>
        decode(bytes).map(m => (p, m.msgIndex, m.edition, m.totalLen,
          m.discipline, m.centre, m.paramCategory, m.paramNumber,
          m.refTime, m.gridTemplate, m.nPoints, m.ni, m.nj))
      })
      .toDF("path", "msg_index", "edition", "total_len", "discipline",
        "centre", "param_category", "param_number", "ref_time",
        "grid_template", "n_points", "ni", "nj")
  }
}
