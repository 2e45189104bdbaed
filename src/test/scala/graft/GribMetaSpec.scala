package graft

import graft.sources.GribMeta

/** GRIB message-metadata scanner over hand-built messages laid out per
  * the public WMO GRIB1/GRIB2 section structure. */
class GribMetaSpec extends SparkSpec {

  /** Minimal valid GRIB2 message: indicator + sections 1,3,4,5,6,7 +
    * end marker. discipline 0, centre 98, 2024-06-01T12:00, lat/lon
    * template 3.0 with Ni=144 Nj=73, product category 1 number 8. */
  private def grib2(): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(512)
    def sec(len: Int, num: Int)(body: java.nio.ByteBuffer => Unit): Unit = {
      val start = b.position()
      b.putInt(len).put(num.toByte)
      body(b)
      while (b.position() < start + len) b.put(0.toByte)
    }
    b.put("GRIB".getBytes("US-ASCII"))
    b.putShort(0).put(0.toByte).put(2.toByte) // reserved, discipline 0, edition 2
    val lenAt = b.position()
    b.putLong(0L) // total length patched below
    sec(21, 1) { s =>
      s.putShort(98).putShort(0) // centre, subcentre
      s.put(2.toByte).put(1.toByte).put(1.toByte)
      s.putShort(2024).put(6.toByte).put(1.toByte) // year month day
      s.put(12.toByte).put(0.toByte).put(0.toByte) // hour minute second
    }
    sec(72, 3) { s =>
      s.put(0.toByte) // source of grid definition
      s.putInt(144 * 73) // number of data points
      s.put(0.toByte).put(0.toByte)
      s.putShort(0) // grid definition template 3.0 (lat/lon)
      // octets 15-30: shape-of-earth block (zero-padded here)
      (15 to 30).foreach(_ => s.put(0.toByte))
      s.putInt(144).putInt(73) // Ni (31-34), Nj (35-38)
    }
    sec(34, 4) { s =>
      s.putShort(0) // no coordinate values
      s.putShort(0) // product definition template 4.0
      s.put(1.toByte).put(8.toByte) // parameter category 1, number 8
    }
    sec(21, 5) { s => s.putInt(144 * 73); s.putShort(0) }
    sec(6, 6) { s => s.put(255.toByte) } // bitmap: none
    sec(5, 7) { _ => }
    b.put("7777".getBytes("US-ASCII"))
    val total = b.position()
    b.putLong(lenAt, total.toLong)
    java.util.Arrays.copyOf(b.array(), total)
  }

  /** Minimal GRIB1 message: indicator + PDS(28, GDS flagged) +
    * GDS(32, lat/lon 96×48) + BDS(11) + end marker. centre 74,
    * parameter 61, 2024-06-01T12:00 via century octet 21. */
  private def grib1(): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(128)
    b.put("GRIB".getBytes("US-ASCII"))
    val total = 8 + 28 + 32 + 11 + 4
    b.put((total >> 16).toByte).put((total >> 8).toByte).put(total.toByte)
    b.put(1.toByte) // edition
    // PDS
    b.put(0.toByte).put(0.toByte).put(28.toByte) // length 28
    b.put(128.toByte).put(74.toByte).put(1.toByte).put(255.toByte)
    b.put(0x80.toByte) // GDS present
    b.put(61.toByte)   // parameter (total precipitation, table 2)
    b.put(1.toByte).putShort(0) // level
    b.put(24.toByte).put(6.toByte).put(1.toByte) // year-of-century, month, day
    b.put(12.toByte).put(0.toByte) // hour minute
    (18 to 24).foreach(_ => b.put(0.toByte))
    b.put(21.toByte) // century (octet 25): year 2024
    (26 to 28).foreach(_ => b.put(0.toByte))
    // GDS
    b.put(0.toByte).put(0.toByte).put(32.toByte)
    b.put(0.toByte).put(255.toByte)
    b.put(0.toByte) // data representation type 0 = lat/lon
    b.putShort(96).putShort(48) // Ni, Nj
    (11 to 32).foreach(_ => b.put(0.toByte))
    // BDS (opaque to the scanner)
    b.put(0.toByte).put(0.toByte).put(11.toByte)
    (4 to 11).foreach(_ => b.put(0.toByte))
    b.put("7777".getBytes("US-ASCII"))
    java.util.Arrays.copyOf(b.array(), total)
  }

  /** The grib1() message re-lengthed per the ECMWF large-message
    * convention: 24-bit length field = 0x800000 | ceil(trueLen/120). */
  private def grib1Large(): Array[Byte] = {
    val m = grib1()
    val field = 0x800000 | ((m.length + 119) / 120)
    m(4) = (field >> 16).toByte; m(5) = (field >> 8).toByte; m(6) = field.toByte
    m
  }

  test("large-GRIB1 length convention: top-bit messages recover their true end") {
    // alone in the file (trailer anchored by EOF)
    val one = GribMeta.decode(grib1Large())
    assert(one.map(m => (m.edition, m.totalLen, m.centre, m.paramNumber)) ==
      Seq((1, 83L, 74, 61)))
    // followed by a normal message (trailer anchored by the next GRIB
    // magic — a 7777-free tail byte-window must not derail the walk)
    val two = GribMeta.decode(grib1Large() ++ grib1())
    assert(two.map(m => (m.msgIndex, m.totalLen)) == Seq((0, 83L), (1, 83L)))
    assert(two.forall(m => m.ni == 96 && m.nj == 48))
    // top bit set but the trailer is destroyed → targeted loud error,
    // never a silent length misparse
    val corrupt = grib1Large()
    corrupt(corrupt.length - 2) = 'X'.toByte
    val e = intercept[IllegalArgumentException](GribMeta.decode(corrupt))
    assert(e.getMessage.contains("large GRIB1"))
  }

  test("GRIB2 and GRIB1 headers decode; concatenated archives walk message by message") {
    val m2 = GribMeta.decode(grib2())
    assert(m2.length == 1)
    val g2 = m2.head
    assert(g2.edition == 2 && g2.discipline == 0 && g2.centre == 98, g2.toString)
    assert(g2.refTime == "2024-06-01T12:00" && g2.gridTemplate == 0, g2.toString)
    assert(g2.ni == 144 && g2.nj == 73 && g2.nPoints == 144L * 73, g2.toString)
    assert(g2.paramCategory == 1 && g2.paramNumber == 8, g2.toString)

    val m1 = GribMeta.decode(grib1())
    assert(m1.length == 1)
    val g1 = m1.head
    assert(g1.edition == 1 && g1.centre == 74 && g1.paramNumber == 61, g1.toString)
    assert(g1.refTime == "2024-06-01T12:00" && g1.ni == 96 && g1.nj == 48, g1.toString)

    // one archive file = many messages (variable × level × step)
    val both = GribMeta.decode(grib2() ++ grib1() ++ grib2())
    assert(both.map(_.edition) == Seq(2, 1, 2))
    assert(both.map(_.msgIndex) == Seq(0, 1, 2))
  }

  test("truncation and junk fail loudly — an inventory must never undercount silently") {
    val g = grib2()
    intercept[Exception] { GribMeta.decode(java.util.Arrays.copyOf(g, g.length - 6)) }
    intercept[Exception] { GribMeta.decode(java.util.Arrays.copyOf(g, 20)) }
    intercept[Exception] { GribMeta.decode("NOTGRIBDATA!".getBytes("US-ASCII")) }
    // trailing garbage after a valid message is an error, not ignored
    intercept[Exception] { GribMeta.decode(g ++ Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9)) }
  }

  test("scan inventories an archive directory task-side") {
    val dir = java.nio.file.Files.createTempDirectory("graft_grib").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.grib2"),
      grib2() ++ grib2())
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/b.grib"), grib1())
    val rows = GribMeta.scan(spark, s"$dir/*.grib*").collect()
    assert(rows.length == 3, rows.mkString(";"))
    val byFile = rows.groupBy(_.getString(0).split('/').last)
    assert(byFile("a.grib2").map(_.getInt(1)).sorted.sameElements(Array(0, 1)))
    assert(byFile("b.grib").head.getInt(2) == 1) // edition
    assert(rows.forall(_.getString(8).startsWith("2024-06-01")), rows.mkString(";"))
  }
}
