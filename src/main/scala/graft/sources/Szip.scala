package graft.sources

/** Clean-room szip (CCSDS 121.0 Rice adaptive entropy coding) codec —
  * the compression NASA LAADS / LP DAAC MODIS archives apply to HDF4
  * SDS payloads and HDF5 chunks (the reference's `modis/pymodis.py`
  * source files). Implemented from the published CCSDS 121.0-B
  * standard and the szlib/libaec public parameter conventions; no
  * code derived from either library.
  *
  * Bitstream shape (per scanline of `pixelsPerScanline` samples,
  * blocks of `pixelsPerBlock` J samples, MSB-first bit order):
  *   - option ID per block: 3 bits for n ≤ 8, 4 for n ≤ 16, 5 for
  *     n ≤ 32; id 1 = fundamental sequence (k = 0), id i = split
  *     k = i−1, max id = no-compression (J × n raw bits); id 0 is
  *     extended by one bit: 0 → zero-block run (FS-coded count with
  *     the rest-of-segment marker, segments = 64 blocks), 1 → second
  *     extension (pairwise triangular mapping, FS-coded).
  *   - FS codeword: m '0' bits then a '1'. Split-k blocks emit every
  *     sample's FS(m >> k) first, then each sample's k low bits.
  *   - NN preprocessing (the HDF default): each scanline's first
  *     sample is a raw n-bit reference emitted right after the first
  *     block's option ID; the rest are unit-delay mapped differences
  *     (the standard θ-clamped interleave). EC mode codes samples
  *     directly.
  *
  * Decode-side honesty at the uncertain corners: a zero-block or
  * second-extension option ON the reference block, and the LSB/MSB
  * sample byte order, follow the conventions documented here; a
  * second extension on a reference block refuses by name (this
  * encoder never emits one, and the pairing convention there is
  * writer-specific). RAW (option bit 128) passes bytes through.
  */
object Szip {

  // szlib public option-mask bits
  val AllowK13 = 1
  val Chip = 2
  val Ec = 4
  val Lsb = 8
  val Msb = 16
  val Nn = 32
  val Raw = 128

  private val SegmentBlocks = 64

  private def idBits(n: Int): Int =
    if (n <= 8) 3 else if (n <= 16) 4 else 5
  private def bytesPer(n: Int): Int =
    if (n <= 8) 1 else if (n <= 16) 2 else 4

  private final class BitRd(data: Array[Byte]) {
    private var pos = 0L // bit position
    def bit(): Int = {
      val byteIdx = (pos >> 3).toInt
      require(byteIdx < data.length, "szip stream truncated")
      val b = (data(byteIdx) >> (7 - (pos & 7)).toInt) & 1
      pos += 1
      b
    }
    def bits(n: Int): Long = {
      var v = 0L; var k = 0
      while (k < n) { v = (v << 1) | bit(); k += 1 }
      v
    }
    /** FS codeword: count '0's to the terminating '1'. */
    def fs(): Int = {
      var m = 0
      while (bit() == 0) {
        m += 1
        require(m <= (1 << 28), "runaway szip FS codeword")
      }
      m
    }
  }

  private final class BitWr {
    private val out = new java.io.ByteArrayOutputStream()
    private var buf = 0
    private var ct = 8
    def bit(b: Int): Unit = {
      ct -= 1
      buf |= (b & 1) << ct
      if (ct == 0) { out.write(buf); buf = 0; ct = 8 }
    }
    def bits(v: Long, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) { bit(((v >>> k) & 1).toInt); k -= 1 }
    }
    def fs(m: Int): Unit = { var k = 0; while (k < m) { bit(0); k += 1 }; bit(1) }
    def bytes(): Array[Byte] = {
      if (ct < 8) { out.write(buf); buf = 0; ct = 8 }
      out.toByteArray
    }
  }

  private def validate(optionsMask: Int, bpp: Int, ppb: Int,
      pps: Int): Unit = {
    require(bpp >= 1 && bpp <= 32, s"szip bits-per-pixel $bpp off-range")
    // 8/16/32 are szlib's legal blocks; 64 appears in CCSDS 121 GRIB
    // streams (libaec) — the bitstream shape is identical
    require(ppb == 8 || ppb == 16 || ppb == 32 || ppb == 64,
      s"szip pixels-per-block $ppb unsupported (8/16/32/64)")
    // szlib caps scanlines at 128 blocks; CCSDS reference intervals
    // reach 4096 blocks — same structure, wider cap
    require(pps >= ppb && pps % ppb == 0 && pps <= 4096 * ppb,
      s"szip pixels-per-scanline $pps off-shape for block $ppb")
    require((optionsMask & Chip) == 0,
      "szip CHIP option unsupported (hardware-specific layout)")
  }

  private def readSamples(raw: Array[Byte], bpp: Int, lsb: Boolean): Array[Long] = {
    val bs = bytesPer(bpp)
    require(raw.length % bs == 0,
      s"szip payload ${raw.length} bytes not a multiple of the " +
        s"$bs-byte sample size")
    val n = raw.length / bs
    val xs = new Array[Long](n)
    var i = 0
    while (i < n) {
      var v = 0L
      var b = 0
      while (b < bs) {
        val by = raw(i * bs + b) & 0xffL
        v = if (lsb) v | (by << (8 * b)) else (v << 8) | by
        b += 1
      }
      require(v < (1L << bpp),
        s"szip sample $v exceeds $bpp bits — wrong byte order or params")
      xs(i) = v
      i += 1
    }
    xs
  }

  private def writeSamples(xs: Array[Long], bpp: Int, lsb: Boolean): Array[Byte] = {
    val bs = bytesPer(bpp)
    val out = new Array[Byte](xs.length * bs)
    var i = 0
    while (i < xs.length) {
      var b = 0
      while (b < bs) {
        val shift = if (lsb) 8 * b else 8 * (bs - 1 - b)
        out(i * bs + b) = ((xs(i) >>> shift) & 0xff).toByte
        b += 1
      }
      i += 1
    }
    out
  }

  /** CCSDS unit-delay mapper (forward). */
  private def mapDelta(x: Long, pred: Long, xmax: Long): Long = {
    val d = x - pred
    val theta = math.min(pred, xmax - pred)
    if (d >= 0 && d <= theta) 2 * d
    else if (d < 0 && -d <= theta) 2 * (-d) - 1
    else theta + math.abs(d)
  }

  /** CCSDS unit-delay mapper (inverse). */
  private def unmapDelta(m: Long, pred: Long, xmax: Long): Long = {
    val theta = math.min(pred, xmax - pred)
    val d =
      if (m <= 2 * theta) { if ((m & 1) == 0) m / 2 else -(m + 1) / 2 }
      else if (theta == pred) m - theta // lower bound closer → positive
      else -(m - theta)                 // upper bound closer → negative
    pred + d
  }

  /** Sample values of a raw byte buffer in the given width/order —
    * the GRIB 5.42 caller turns decompressed bytes into codes. */
  def samples(raw: Array[Byte], bpp: Int, lsbOrder: Boolean): Array[Long] =
    readSamples(raw, bpp, lsbOrder)

  /** Raw bytes of sample values in the given width/order — the GRIB
    * 5.42 writer's inverse of [[samples]]. */
  def sampleBytes(xs: Array[Long], bpp: Int, lsbOrder: Boolean): Array[Byte] =
    writeSamples(xs, bpp, lsbOrder)

  /** Decompress `data` into exactly `nPixels` samples, returned in the
    * stream's byte order (1/2/4 bytes per sample). */
  def decompress(data: Array[Byte], optionsMask: Int, bpp: Int, ppb: Int,
      pps: Int, nPixels: Int): Array[Byte] = CodecGate.gated("szip") {
    validate(optionsMask, bpp, ppb, pps)
    val lsb = (optionsMask & Lsb) != 0
    if ((optionsMask & Raw) != 0) {
      require(data.length == nPixels * bytesPer(bpp),
        s"szip RAW payload ${data.length} bytes for $nPixels samples")
      return data
    }
    val nn = (optionsMask & Nn) != 0
    val xmax = (1L << bpp) - 1
    val idLen = idBits(bpp)
    val maxId = (1 << idLen) - 1
    val br = new BitRd(data)
    val out = new Array[Long](nPixels)
    var pos = 0
    while (pos < nPixels) {
      val scan = math.min(pps, nPixels - pos)
      val nBlocks = (scan + ppb - 1) / ppb
      val mapped = new Array[Long](scan)
      var haveRef = false
      var refVal = 0L
      var blk = 0
      var zeroRun = 0 // zero blocks still owed from a run code
      while (blk < nBlocks) {
        val b0 = blk * ppb
        val bN = math.min(b0 + ppb, scan)
        val refHere = nn && blk == 0
        if (zeroRun > 0) {
          // samples stay zero (mapped array is zero-initialised)
          zeroRun -= 1
        } else {
          val id = br.bits(idLen).toInt
          if (id == 0) {
            if (br.bit() == 0) {
              // zero-block run; reference (if this is the first block)
              // is stored raw right after the marker
              if (refHere) { refVal = br.bits(bpp); haveRef = true }
              val f = br.fs()
              val segEnd = ((blk / SegmentBlocks) + 1) * SegmentBlocks
              val run =
                if (f < 4) f + 1
                else if (f == 4) math.min(segEnd, nBlocks) - blk // ROS
                else f
              require(run >= 1 && blk + run <= nBlocks,
                s"szip zero-block run $run overruns the scanline")
              zeroRun = run - 1
            } else {
              // second extension: pairwise triangular FS codes
              require(!refHere,
                "szip second-extension on a reference block unsupported " +
                  "— writer-specific pairing; re-encode without " +
                  "preprocessing or with a different block option")
              val cnt = bN - b0
              require(cnt % 2 == 0,
                s"szip second-extension on an odd $cnt-sample block")
              var i = b0
              while (i < bN) {
                val g = br.fs().toLong
                // invert γ = (m1+m2)(m1+m2+1)/2 + m2
                var s = 0L
                while ((s + 1) * (s + 2) / 2 <= g) s += 1
                val m2 = g - s * (s + 1) / 2
                val m1 = s - m2
                mapped(i) = m1; mapped(i + 1) = m2
                i += 2
              }
            }
          } else if (id == maxId) {
            // no compression: raw samples (reference included raw)
            var i = b0
            if (refHere) { refVal = br.bits(bpp); haveRef = true; i += 1 }
            while (i < bN) { mapped(i) = br.bits(bpp); i += 1 }
          } else {
            val k = id - 1 // id 1 = FS (k 0), id i = split k = i-1
            require(k <= bpp,
              s"szip split k=$k exceeds $bpp-bit samples")
            var i = b0
            if (refHere) { refVal = br.bits(bpp); haveRef = true; i += 1 }
            val start = i
            while (i < bN) { mapped(i) = br.fs().toLong << k; i += 1 }
            if (k > 0) {
              i = start
              while (i < bN) { mapped(i) |= br.bits(k); i += 1 }
            }
          }
        }
        blk += 1
      }
      // un-map the scanline
      if (nn) {
        require(haveRef || scan == 0,
          "szip scanline carries no reference sample")
        var pred = refVal
        out(pos) = refVal
        var i = 1
        while (i < scan) {
          val x = unmapDelta(mapped(i), pred, xmax)
          require(x >= 0 && x <= xmax,
            s"szip mapped value ${mapped(i)} un-maps outside $bpp bits " +
              "— corrupt stream")
          out(pos + i) = x
          pred = x
          i += 1
        }
      } else {
        var i = 0
        while (i < scan) {
          require(mapped(i) <= xmax,
            s"szip EC sample ${mapped(i)} exceeds $bpp bits")
          out(pos + i) = mapped(i)
          i += 1
        }
      }
      pos += scan
    }
    writeSamples(out, bpp, lsb)
  }

  /** Compress raw sample bytes. Emits the same profile [[decompress]]
    * accepts; per block the cheapest of zero-block run / FS / split-k /
    * no-compression is chosen (second extension is never emitted). */
  def compress(raw: Array[Byte], optionsMask: Int, bpp: Int, ppb: Int,
      pps: Int): Array[Byte] = {
    validate(optionsMask, bpp, ppb, pps)
    val lsb = (optionsMask & Lsb) != 0
    if ((optionsMask & Raw) != 0) return raw
    val nn = (optionsMask & Nn) != 0
    val xmax = (1L << bpp) - 1
    val idLen = idBits(bpp)
    val maxId = (1 << idLen) - 1
    val maxK = math.min(maxId - 2, if ((optionsMask & AllowK13) != 0) bpp else math.min(bpp, 12))
    val xs = readSamples(raw, bpp, lsb)
    val bw = new BitWr
    var pos = 0
    while (pos < xs.length) {
      val scan = math.min(pps, xs.length - pos)
      val mapped = new Array[Long](scan)
      if (nn) {
        mapped(0) = xs(pos) // raw reference, emitted specially
        var pred = xs(pos)
        var i = 1
        while (i < scan) {
          mapped(i) = mapDelta(xs(pos + i), pred, xmax)
          pred = xs(pos + i)
          i += 1
        }
      } else {
        var i = 0
        while (i < scan) { mapped(i) = xs(pos + i); i += 1 }
      }
      val nBlocks = (scan + ppb - 1) / ppb
      var blk = 0
      while (blk < nBlocks) {
        val b0 = blk * ppb
        val bN = math.min(b0 + ppb, scan)
        val refHere = nn && blk == 0
        val start = if (refHere) b0 + 1 else b0
        // zero-run detection (never on the reference block)
        def blockZero(b: Int): Boolean = {
          val s0 = b * ppb; val s1 = math.min(s0 + ppb, scan)
          !(nn && b == 0) && (s0 until s1).forall(mapped(_) == 0L)
        }
        if (blockZero(blk)) {
          val segEnd = math.min(((blk / SegmentBlocks) + 1) * SegmentBlocks, nBlocks)
          var run = 0
          while (blk + run < segEnd && blockZero(blk + run)) run += 1
          bw.bits(0, idLen); bw.bit(0)
          if (blk + run == segEnd && run > 4) bw.fs(4) // ROS
          else if (run <= 4) bw.fs(run - 1)
          else bw.fs(run)
          blk += run
        } else {
          // cost of each option over samples [start, bN)
          val cnt = bN - start
          def splitCost(k: Int): Long =
            (start until bN).map(i => (mapped(i) >>> k) + 1 + k).sum
          var bestK = -1 // -1 = no-compression
          var bestCost = cnt.toLong * bpp
          var k = 0
          while (k <= maxK) {
            val c = splitCost(k)
            if (c < bestCost) { bestCost = c; bestK = k }
            k += 1
          }
          if (bestK < 0) {
            bw.bits(maxId.toLong, idLen)
            var i = b0
            while (i < bN) { bw.bits(mapped(i), bpp); i += 1 } // ref raw too
          } else {
            bw.bits((bestK + 1).toLong, idLen)
            if (refHere) bw.bits(mapped(b0), bpp)
            var i = start
            while (i < bN) { bw.fs((mapped(i) >>> bestK).toInt); i += 1 }
            if (bestK > 0) {
              i = start
              while (i < bN) { bw.bits(mapped(i), bestK); i += 1 }
            }
          }
          blk += 1
        }
      }
      pos += scan
    }
    bw.bytes()
  }
}
