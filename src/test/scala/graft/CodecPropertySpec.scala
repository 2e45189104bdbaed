package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources._

/** Randomized ROUND-TRIP battery over every codec writer (r14 — the
  * fuzz battery's constructive twin): hundreds of pseudo-random
  * shape/width/scale/bitmap combinations per family, each asserting
  * encode→decode reproduces the values EXACTLY. The hand-built
  * fixtures pin the byte layouts against the public specs; this
  * battery sweeps the parameter space those fixtures sample one point
  * of — the defect class it targets is frame arithmetic that only
  * breaks at specific widths or lengths (the r13 putBits n≥57 chunked
  * accumulator, the 16-bit Ni truncation, odd-length BDS padding),
  * which single-point fixtures structurally miss.
  *
  * Seeds are FIXED so every run sweeps the identical case list — a
  * failure message carries the case's full parameter tuple, making it
  * reproducible in isolation before any shrinking. */
class CodecPropertySpec extends AnyFunSuite {

  /** NaN-aware exact comparison: a decoded grid must reproduce the
    * expected doubles BIT-FOR-BIT (every family here is lossless). */
  private def assertSame(got: Array[Double], want: Array[Double],
      what: => String): Unit = {
    assert(got.length == want.length,
      s"$what: ${got.length} values, expected ${want.length}")
    var i = 0
    while (i < want.length) {
      assert(java.lang.Double.compare(got(i), want(i)) == 0,
        s"$what: value $i = ${got(i)}, expected ${want(i)}")
      i += 1
    }
  }

  /** The decoder's own unpack formula (regulation 92.9.4 both
    * editions): recomputed here with the IDENTICAL floating-point
    * expression so a mismatch can only mean the packed CODES (or the
    * reference/scale fields) did not survive the byte round trip. */
  private def gribExpected(codes: Array[Long], present: Array[Boolean],
      refValue: Double, binE: Int, decD: Int): Array[Double] = {
    val scale = math.pow(2.0, binE) * math.pow(10.0, -decD)
    val base = refValue * math.pow(10.0, -decD)
    val out = new Array[Double](present.length)
    var k = 0
    var i = 0
    while (i < present.length) {
      if (present(i)) { out(i) = base + codes(k) * scale; k += 1 }
      else out(i) = Double.NaN
      i += 1
    }
    out
  }

  /** Random present-point codes + optional bitmap for an ni×nj grid.
    * All-missing and all-present shapes both occur. */
  private def gribCase(rnd: scala.util.Random, nBits: Int,
      withBitmap: Boolean, ni: Int, nj: Int,
      atLeastOne: Boolean): (Array[Long], Option[Array[Boolean]], Array[Boolean]) = {
    val n = ni * nj
    val mask =
      if (!withBitmap) Array.fill(n)(true)
      else {
        val m = Array.fill(n)(rnd.nextInt(4) > 0)
        if (atLeastOne && !m.exists(identity)) m(rnd.nextInt(n)) = true
        m
      }
    val bound = if (nBits >= 63) Long.MaxValue else 1L << nBits
    val xs = Array.fill(mask.count(identity))(
      math.floorMod(rnd.nextLong(), bound))
    (xs, if (withBitmap) Some(mask) else None, mask)
  }

  test("GRIB2 simple 5.0 round-trips across random widths/scales/bitmaps") {
    val rnd = new scala.util.Random(0x5ee1)
    for (c <- 0 until 120) {
      val (ni, nj) = (1 + rnd.nextInt(9), 1 + rnd.nextInt(7))
      val nBits = 1 + rnd.nextInt(32)
      val (binE, decD) = (rnd.nextInt(17) - 8, rnd.nextInt(7) - 3)
      val refValue = rnd.nextInt(1 << 12) / 16f
      val (xs, bmp, mask) = gribCase(rnd, nBits, rnd.nextBoolean(), ni, nj,
        atLeastOne = false)
      val msg = GribMeta.encodeSimple(ni, nj, 1, 2, refValue, binE, decD,
        nBits, xs, bmp)
      val Seq((m, got)) = GribMeta.values(msg)
      assert(m.ni == ni && m.nj == nj)
      assertSame(got, gribExpected(xs, mask, refValue.toDouble, binE, decD),
        s"case $c: ${ni}x$nj nBits=$nBits E=$binE D=$decD bmp=${bmp.isDefined}")
    }
  }

  test("GRIB2 complex 5.2/5.3 round-trips across group lengths and orders") {
    val rnd = new scala.util.Random(0xc0de)
    for (c <- 0 until 120) {
      val (ni, nj) = (1 + rnd.nextInt(9), 1 + rnd.nextInt(7))
      val order = rnd.nextInt(3)
      val nBits = 1 + rnd.nextInt(24)
      val (binE, decD) = (rnd.nextInt(13) - 6, rnd.nextInt(5) - 2)
      val refValue = rnd.nextInt(1 << 12) / 16f
      val groupLen = 1 + rnd.nextInt(20)
      val (xs, bmp, mask) = gribCase(rnd, nBits, rnd.nextBoolean(), ni, nj,
        atLeastOne = order > 0) // 5.3 needs > order values
      if (xs.length > order) {
        val msg = GribMeta.encodeComplex(ni, nj, 1, 2, refValue, binE, decD,
          xs, bmp, groupLen = groupLen, spatialOrder = order)
        val Seq((_, got)) = GribMeta.values(msg)
        assertSame(got, gribExpected(xs, mask, refValue.toDouble, binE, decD),
          s"case $c: ${ni}x$nj nBits=$nBits order=$order glen=$groupLen " +
            s"bmp=${bmp.isDefined}")
      }
    }
  }

  test("GRIB2 PNG 5.41 / JPEG2000 5.40 / CCSDS 5.42 round-trip randomly") {
    val rnd = new scala.util.Random(0x9a9)
    for (c <- 0 until 45) {
      val (ni, nj) = (1 + rnd.nextInt(9), 1 + rnd.nextInt(7))
      val (binE, decD) = (rnd.nextInt(9) - 4, rnd.nextInt(5) - 2)
      val refValue = rnd.nextInt(1 << 12) / 16f
      val kind = c % 3
      val nBits = kind match {
        case 0 => 1 + rnd.nextInt(32) // PNG: gray 8/16, RGB 24, RGBA 32
        case 1 => 1 + rnd.nextInt(25) // J2K: depth cap 25
        case _ => 1 + rnd.nextInt(32) // CCSDS
      }
      val (xs, bmp, mask) = gribCase(rnd, nBits, rnd.nextBoolean(), ni, nj,
        atLeastOne = true) // these packings refuse zero present points
      val msg = kind match {
        case 0 => GribMeta.encodePng(ni, nj, 1, 2, refValue, binE, decD,
          nBits, xs, bmp)
        case 1 => GribMeta.encodeJpeg2000(ni, nj, 1, 2, refValue, binE, decD,
          nBits, xs, bmp)
        case _ => GribMeta.encodeCcsds(ni, nj, 1, 2, refValue, binE, decD,
          nBits, xs, bmp)
      }
      val Seq((_, got)) = GribMeta.values(msg)
      assertSame(got, gribExpected(xs, mask, refValue.toDouble, binE, decD),
        s"case $c: kind=$kind ${ni}x$nj nBits=$nBits bmp=${bmp.isDefined}")
    }
  }

  test("GRIB2 spectral 5.50 round-trips across truncations and widths") {
    val rnd = new scala.util.Random(0x550)
    for (c <- 0 until 60) {
      val t = rnd.nextInt(14) // T0 (1 coefficient) through T13
      val total = (t + 1) * (t + 2)
      val nBits = 1 + rnd.nextInt(30)
      val (binE, decD) = (rnd.nextInt(13) - 6, rnd.nextInt(5) - 2)
      val refValue = rnd.nextInt(1 << 12) / 16f
      val real00 = (rnd.nextInt(1 << 16) - (1 << 15)) / 32f
      val bound = 1L << nBits
      val xs = Array.fill(total - 1)(math.floorMod(rnd.nextLong(), bound))
      val msg = GribMeta.encodeSpectral(t, 1, 2, refValue, binE, decD,
        nBits, real00, xs)
      val Seq((m, got)) = GribMeta.values(msg)
      assert(m.nPoints == total)
      val want = gribExpected(xs, Array.fill(total - 1)(true),
        refValue.toDouble, binE, decD)
      assertSame(got, real00.toDouble +: want,
        s"case $c: T$t nBits=$nBits E=$binE D=$decD")
    }
  }

  test("GRIB1 simple round-trips across random widths/scales/bitmaps") {
    val rnd = new scala.util.Random(0x161)
    for (c <- 0 until 120) {
      val (ni, nj) = (1 + rnd.nextInt(9), 1 + rnd.nextInt(7))
      val nBits = 1 + rnd.nextInt(32)
      val (binE, decD) = (rnd.nextInt(13) - 6, rnd.nextInt(5) - 2)
      val refValue = rnd.nextInt(1 << 16) / 4.0 // exactly IBM-32
      val (xs, bmp, mask) = gribCase(rnd, nBits, rnd.nextBoolean(), ni, nj,
        atLeastOne = false)
      val msg = GribMeta.encodeG1Simple(ni, nj, 2, refValue, binE, decD,
        nBits, xs, bmp)
      val Seq((m, got)) = GribMeta.values(msg)
      assert(m.edition == 1 && m.ni == ni && m.nj == nj)
      assertSame(got, gribExpected(xs, mask, refValue, binE, decD),
        s"case $c: ${ni}x$nj nBits=$nBits E=$binE D=$decD bmp=${bmp.isDefined}")
    }
  }

  test("GRIB1 second-order round-trips across group lengths") {
    val rnd = new scala.util.Random(0x262)
    for (c <- 0 until 100) {
      val (ni, nj) = (1 + rnd.nextInt(9), 1 + rnd.nextInt(7))
      val (binE, decD) = (rnd.nextInt(13) - 6, rnd.nextInt(5) - 2)
      val refValue = rnd.nextInt(1 << 16) / 4.0
      val groupLen = 1 + rnd.nextInt(20)
      val nBits = 1 + rnd.nextInt(24)
      val (xs, bmp, mask) = gribCase(rnd, nBits, rnd.nextBoolean(), ni, nj,
        atLeastOne = false)
      val msg = GribMeta.encodeG1SecondOrder(ni, nj, 2, refValue, binE, decD,
        xs, bmp, groupLen = groupLen)
      val Seq((_, got)) = GribMeta.values(msg)
      assertSame(got, gribExpected(xs, mask, refValue, binE, decD),
        s"case $c: ${ni}x$nj nBits=$nBits glen=$groupLen bmp=${bmp.isDefined}")
    }
  }

  test("GRIB1 spectral round-trips across truncations and widths") {
    val rnd = new scala.util.Random(0x151)
    for (c <- 0 until 60) {
      val t = rnd.nextInt(14)
      val total = (t + 1) * (t + 2)
      val nBits = 1 + rnd.nextInt(30)
      val binE = rnd.nextInt(13) - 6
      val refValue = rnd.nextInt(1 << 16) / 4.0
      val real00 = (rnd.nextInt(1 << 16) - (1 << 15)) / 4.0
      val bound = 1L << nBits
      val xs = Array.fill(total - 1)(math.floorMod(rnd.nextLong(), bound))
      val msg = GribMeta.encodeG1Spectral(t, 2, refValue, binE, nBits,
        real00, xs)
      val Seq((m, got)) = GribMeta.values(msg)
      assert(m.edition == 1 && m.nPoints == total)
      val want = gribExpected(xs, Array.fill(total - 1)(true),
        refValue, binE, 0)
      assertSame(got, real00 +: want, s"case $c: T$t nBits=$nBits E=$binE")
    }
  }

  test("concatenated mixed-edition GRIB archives round-trip (random order)") {
    // inter-message arithmetic — each message's declared length must
    // advance the walk EXACTLY to the next GRIB magic across editions
    // and packing families (odd-length GRIB1 BDS padding, §7 tails)
    val rnd = new scala.util.Random(0xa9c)
    for (c <- 0 until 25) {
      val n = 2 + rnd.nextInt(5)
      // each message is pinned against its OWN single-message decode
      // (which the per-family tests above pin against the formula) —
      // the archive walk must reproduce them at shifted offsets
      val msgs = (0 until n).map { i =>
        val (ni, nj) = (1 + rnd.nextInt(7), 1 + rnd.nextInt(5))
        val nBits = 1 + rnd.nextInt(20)
        val (binE, decD) = (rnd.nextInt(9) - 4, rnd.nextInt(3) - 1)
        val (xs, bmp, _) = gribCase(rnd, nBits, rnd.nextBoolean(), ni, nj,
          atLeastOne = true)
        val ref2 = rnd.nextInt(1 << 10) / 8f
        val ref1 = rnd.nextInt(1 << 10) / 4.0
        rnd.nextInt(4) match {
          case 0 => GribMeta.encodeSimple(ni, nj, 1, i, ref2, binE, decD,
            nBits, xs, bmp)
          case 1 => GribMeta.encodeComplex(ni, nj, 1, i, ref2, binE, decD,
            xs, bmp, groupLen = 1 + rnd.nextInt(9))
          case 2 => GribMeta.encodeG1Simple(ni, nj, i, ref1, binE, decD,
            nBits, xs, bmp)
          case _ => GribMeta.encodeG1SecondOrder(ni, nj, i, ref1, binE, decD,
            xs, bmp, groupLen = 1 + rnd.nextInt(9))
        }
      }
      val all = GribMeta.values(msgs.reduce(_ ++ _))
      assert(all.length == n, s"case $c: ${all.length} of $n messages")
      all.zip(msgs).zipWithIndex.foreach { case (((m, got), bytes), i) =>
        val Seq((single, want)) = GribMeta.values(bytes)
        assert(m.msgIndex == i && m.paramNumber == single.paramNumber &&
          m.edition == single.edition,
          s"case $c msg $i: walk misaligned")
        assertSame(got, want, s"case $c msg $i (edition ${m.edition})")
      }
    }
  }

  test("GeoTIFF strip + COG round-trip random rasters, both sample types") {
    val rnd = new scala.util.Random(0x71ff)
    for (c <- 0 until 40) {
      val (w, h) = (1 + rnd.nextInt(40), 1 + rnd.nextInt(30))
      val float32 = rnd.nextBoolean()
      val deflate = rnd.nextBoolean()
      val nodata = if (rnd.nextBoolean()) Some(-9999.0) else None
      val values = Array.fill(w * h) {
        if (nodata.isDefined && rnd.nextInt(5) == 0) -9999.0
        else if (float32) (rnd.nextInt(1 << 20) - (1 << 19)) / 32f
        else (rnd.nextInt(65536) - 32768).toDouble
      }
      val r = GeoTiff.Raster(w, h, 0.25, 0.25, -20.0, 40.0, nodata, values)
      val what = s"case $c: ${w}x$h float32=$float32 deflate=$deflate " +
        s"nodata=${nodata.isDefined}"
      val strip = GeoTiff.decode(GeoTiff.encode(r, float32, deflate))
      assert(strip.width == w && strip.height == h &&
        strip.nodata == nodata, what)
      assertSame(strip.values, values, s"$what (strip)")
      // COG: the full-res IFD must reproduce the raster; overview
      // count follows the halving chain down to minOverviewDim
      val cog = GeoTiff.encodeCog(r, tileSize = 16, float32, deflate,
        minOverviewDim = 8)
      assertSame(GeoTiff.decode(cog, 0).values, values, s"$what (cog)")
      assert(GeoTiff.ifdCount(cog) >= 1, what)
    }
  }

  test("NetCDF fixed + record variables round-trip across types/versions") {
    import NetCdf._
    val rnd = new scala.util.Random(0xecd)
    val classicTypes = Seq(NcByte, NcShort, NcInt, NcFloat, NcDouble)
    // CDF-5 adds the unsigned + 64-bit codes
    val wideTypes = classicTypes ++
      Seq(NcUByte, NcUShort, NcUInt, NcInt64, NcUInt64)
    def range(t: Int): (Int, Int) = t match {
      case NcByte => (-127, 127)
      case NcShort => (-32767, 32767)
      case NcUByte => (0, 255)
      case NcUShort => (0, 65535)
      case NcUInt | NcUInt64 => (0, 1 << 20)
      case _ => (-(1 << 20), 1 << 20)
    }
    for (c <- 0 until 40) {
      val version = Seq(1, 2, 5)(rnd.nextInt(3))
      val types = if (version == 5) wideTypes else classicTypes
      val fixedDims = Seq.fill(1 + rnd.nextInt(2))(1 + rnd.nextInt(5))
      val dims = Dim("rec", 0) +:
        fixedDims.zipWithIndex.map { case (len, i) => Dim(s"d$i", len) }
      val numRecs = rnd.nextInt(4)
      val perRec = fixedDims.product
      val vars = (0 until 1 + rnd.nextInt(3)).map { v =>
        val t = types(rnd.nextInt(types.length))
        val isRec = rnd.nextBoolean()
        val n = if (isRec) perRec * numRecs else perRec
        val (lo, hi) = range(t)
        VarSpec(s"v$v",
          (if (isRec) Seq("rec") else Nil) ++ fixedDims.indices.map(i => s"d$i"),
          t, values = Array.fill(n)((lo + rnd.nextInt(hi - lo + 1)).toDouble))
      }
      val f = NetCdf.decode(NetCdf.encode(dims, Nil, vars, numRecs, version))
      for (v <- vars)
        assertSame(f.read(v.name), v.values,
          s"case $c: v=${v.name} type=${v.ncType} version=$version " +
            s"recs=$numRecs dims=${fixedDims.mkString("x")}")
    }
  }

  test("HDF4 SDS round-trip across types, coders and chunking") {
    import Hdf._
    val rnd = new scala.util.Random(0x4df)
    val types = Seq(Int8, UInt8, Int16, UInt16, Int32, Float32, Float64)
    def range(t: Int): (Int, Int) = t match {
      case Int8 => (-128, 127)
      case UInt8 => (0, 255)
      case Int16 => (-32768, 32767)
      case UInt16 => (0, 65535)
      case _ => (-(1 << 20), 1 << 20)
    }
    for (c <- 0 until 30) {
      // multi-SDS files: the DD block walk and per-element offsets
      // must hold with several datasets interleaved in one file
      val specs = (0 until 1 + rnd.nextInt(3)).map { s =>
        val dims = Seq.fill(1 + rnd.nextInt(2))(1 + rnd.nextInt(8))
        val t = types(rnd.nextInt(types.length))
        val comp = Seq("none", "rle", "deflate", "skphuff")(rnd.nextInt(4))
        val (lo, hi) = range(t)
        val values = Array.fill(dims.product)(
          (lo + rnd.nextInt(hi - lo + 1)).toDouble)
        val chunk = if (rnd.nextBoolean() && dims.forall(_ > 1))
          Some(dims.map(d => 1 + rnd.nextInt(d))) else None
        SdsSpec(s"sds${c}_$s", dims, t, values, comp = comp,
          chunkDims = chunk)
      }
      val f = Hdf.decode(Hdf.encode(specs))
      for (spec <- specs)
        assertSame(Hdf.read(f, spec.name), spec.values,
          s"case $c ${spec.name}: dims=${spec.dims.mkString("x")} " +
            s"type=${spec.ntype} comp=${spec.comp} " +
            s"chunk=${spec.chunkDims.map(_.mkString("x"))}")
    }
  }

  test("HDF5 datasets round-trip across types, chunking and filters") {
    import Hdf5._
    val rnd = new scala.util.Random(0x4d5)
    val dtypes = Seq(
      Dtype(0, 2, littleEndian = true, signed = true),  // int16
      Dtype(0, 4, littleEndian = true, signed = true),  // int32
      Dtype(1, 4, littleEndian = true, signed = true),  // float32
      Dtype(1, 8, littleEndian = true, signed = true))  // float64
    for (c <- 0 until 30) {
      // multi-dataset files: object-header placement, B-tree and heap
      // offsets must hold with several datasets in one file
      val specs = (0 until 1 + rnd.nextInt(3)).map { s =>
        val dims = Seq.fill(1 + rnd.nextInt(3))(1L + rnd.nextInt(6))
        val dt = dtypes(rnd.nextInt(dtypes.length))
        val values = Array.fill(dims.product.toInt)(
          (rnd.nextInt(65536) - 32768).toDouble)
        val chunk = if (rnd.nextBoolean())
          Some(dims.map(d => 1 + rnd.nextInt(d.toInt))) else None
        val filters = if (chunk.isEmpty) Nil
          else Seq("shuffle", "deflate", "fletcher32").filter(_ =>
            rnd.nextBoolean())
        val fill = if (rnd.nextBoolean()) Some(-999.0) else None
        val attrs = if (rnd.nextBoolean())
          Seq("scale_factor" -> 0.5, "add_offset" -> 2.0) else Nil
        DsSpec(s"ds${c}_$s", dims, dt, values, fill = fill,
          attrs = attrs, chunk = chunk, filters = filters)
      }
      val bytes = Hdf5.encode(specs)
      val f = Hdf5.decode(bytes)
      for (spec <- specs) {
        val what = s"case $c ${spec.name}: dims=${spec.dims.mkString("x")} " +
          s"dtype=${spec.dtype.name} " +
          s"chunk=${spec.chunk.map(_.mkString("x"))} " +
          s"filters=${spec.filters.mkString("+")}"
        assertSame(Hdf5.read(bytes, f, s"/${spec.name}"), spec.values, what)
        val ds = f.datasetAt(s"/${spec.name}")
        for ((k, v) <- spec.attrs)
          assert(ds.numAttr(k).contains(v), s"$what attr $k")
      }
    }
  }
}
