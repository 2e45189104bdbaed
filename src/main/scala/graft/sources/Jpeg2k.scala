package graft.sources

/** Clean-room JPEG 2000 Part-1 codec for the GRIB2 template 5.40
  * profile (ISO/IEC 15444-1; WMO FM 92 template 5.40 stores one
  * grayscale codestream in section 7, the way g2clib/wgrib2 emit via
  * Jasper and eccodes via openjpeg).
  *
  * Scope — the profile those writers actually produce, refusing the
  * rest BY NAME:
  *   - single component, no subsampling, origin 0, ONE tile, one
  *     tile-part;
  *   - reversible 5/3 wavelet (transform byte 1); the irreversible
  *     9/7 (lossy) refuses — template 5.40's lossless compression
  *     type is the only one this engine decodes;
  *   - no code-block style options (bypass/termall/reset/causal/
  *     segsym refuse), code-blocks up to Part-1 bounds;
  *   - precinct partitions supported (maximal by default; NCEP's
  *     width = nPacked, height = 1 layout crosses the 2^15 default
  *     precinct on big grids);
  *   - any layer count; LRCP/RLCP/RPCL progression orders (PCRL/CPRL
  *     decode when every resolution has one precinct — their
  *     position-interleaved multi-precinct order refuses by name);
  *   - COC/QCC/POC/RGN/PPM/PPT refuse by name; TLM/PLM/PLT/CRG/COM
  *     skip (pointer/comment markers).
  *
  * Structure: MQ arithmetic coder (Annex C), tag trees and packet
  * headers (Annex B), EBCOT tier-1 block coder (Annex D), reversible
  * 5/3 lifting DWT (Annex F). Implemented from the published spec
  * text; no code derived from Jasper/openjpeg.
  *
  * Reference shape this twins: wmo-raf/data-ingestion-auto downloads
  * ECMWF/NCEP GRIB2 (ecmwf_opendata/client.py) whose dominant
  * dissemination packing is template 5.40.
  */
object Jpeg2k {

  /** Decoded codestream: `samples` row-major, DC-unshifted back to
    * the unsigned range [0, 2^depth). */
  final case class Decoded(width: Int, height: Int, depth: Int,
      samples: Array[Long])

  // ======================================================== MQ coder

  // Table C.2: (Qe, NMPS, NLPS, SWITCH) per state index
  private val Qe = Array(
    0x5601, 0x3401, 0x1801, 0x0AC1, 0x0521, 0x0221, 0x5601, 0x5401,
    0x4801, 0x3801, 0x3001, 0x2401, 0x1C01, 0x1601, 0x5601, 0x5401,
    0x5101, 0x4801, 0x3801, 0x3401, 0x3001, 0x2801, 0x2401, 0x2201,
    0x1C01, 0x1801, 0x1601, 0x1401, 0x1201, 0x1101, 0x0AC1, 0x09C1,
    0x08A1, 0x0521, 0x0441, 0x02A1, 0x0221, 0x0141, 0x0111, 0x0085,
    0x0049, 0x0025, 0x0015, 0x0009, 0x0005, 0x0001, 0x5601)
  private val NMPS = Array(
    1, 2, 3, 4, 5, 38, 7, 8, 9, 10, 11, 12, 13, 29, 15, 16,
    17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32,
    33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 45, 46)
  private val NLPS = Array(
    1, 6, 9, 12, 29, 33, 6, 14, 14, 14, 17, 18, 20, 21, 14, 14,
    15, 16, 17, 18, 19, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29,
    30, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 46)
  private val SW = Array(
    1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 1, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)

  // T1 contexts: 0-8 significance, 9-13 sign, 14-16 refinement,
  // 17 run-length, 18 uniform
  private val CtxRL = 17
  private val CtxUNI = 18
  private val NumCtx = 19

  /** Fresh per-code-block context state (Table D.7 initial indices). */
  private def initCtx(): (Array[Int], Array[Int]) = {
    val idx = new Array[Int](NumCtx)
    val mps = new Array[Int](NumCtx)
    idx(0) = 4      // the all-zero-neighborhood significance context
    idx(CtxRL) = 3
    idx(CtxUNI) = 46
    (idx, mps)
  }

  /** MQ decoder over one segment (Annex C.3). Reads past the segment
    * end feed 1-bits — the spec's truncation behaviour. */
  private final class MqDec(data: Array[Byte], start: Int, end: Int) {
    private var bp = start
    private var c = 0L
    private var ct = 0
    private var a = 0
    private def byteAt(i: Int): Int =
      if (i < end) data(i) & 0xff else 0xff
    private def bytein(): Unit = {
      if (byteAt(bp) == 0xff) {
        if (byteAt(bp + 1) > 0x8f) { c += 0xff00; ct = 8 }
        else { bp += 1; c += byteAt(bp).toLong << 9; ct = 7 }
      } else { bp += 1; c += byteAt(bp).toLong << 8; ct = 8 }
    }
    // INITDEC
    c = byteAt(bp).toLong << 16
    bytein()
    c <<= 7; ct -= 7; a = 0x8000

    def decode(cx: Int, idx: Array[Int], mps: Array[Int]): Int = {
      val i = idx(cx)
      val qe = Qe(i)
      var d = 0
      a -= qe
      if (((c >>> 16) & 0xffff) < qe) {
        // LPS exchange path
        if (a < qe) { d = mps(cx); idx(cx) = NMPS(i) }
        else {
          d = 1 - mps(cx)
          if (SW(i) == 1) mps(cx) = 1 - mps(cx)
          idx(cx) = NLPS(i)
        }
        a = qe
        do { if (ct == 0) bytein(); a <<= 1; c = (c << 1) & 0xffffffffL; ct -= 1 }
        while ((a & 0x8000) == 0)
      } else {
        c -= qe.toLong << 16
        if ((a & 0x8000) == 0) {
          if (a < qe) {
            d = 1 - mps(cx)
            if (SW(i) == 1) mps(cx) = 1 - mps(cx)
            idx(cx) = NLPS(i)
          } else { d = mps(cx); idx(cx) = NMPS(i) }
          do { if (ct == 0) bytein(); a <<= 1; c = (c << 1) & 0xffffffffL; ct -= 1 }
          while ((a & 0x8000) == 0)
        } else d = mps(cx)
      }
      d
    }
  }

  /** MQ encoder (Annex C.2), one terminated segment per flush. The
    * byte register is held in `pending` until the next byte finalizes
    * it (carry can still increment it); a carry with no pending byte
    * yet prepends the 0x01 the code value mathematically gained. */
  private final class MqEnc {
    private val out = new java.io.ByteArrayOutputStream()
    private var pending = 0
    private var havePending = false
    private var c = 0L
    private var ct = 12
    private var a = 0x8000

    private def peel(shift: Int, mask: Long, newCt: Int): Unit = {
      if (havePending) out.write(pending)
      pending = ((c >>> shift) & 0xff).toInt
      havePending = true
      c &= mask
      ct = newCt
    }
    private def byteout(): Unit = {
      if (havePending && pending == 0xff) peel(20, 0xfffffL, 7)
      else if (c < 0x8000000L) peel(19, 0x7ffffL, 8)
      else {
        if (havePending) pending += 1
        else { pending = 1; havePending = true }
        if (pending == 0xff) { c &= 0x7ffffffL; peel(20, 0xfffffL, 7) }
        else peel(19, 0x7ffffL, 8)
      }
    }
    private def renorm(): Unit = {
      do { a <<= 1; c <<= 1; ct -= 1; if (ct == 0) byteout() }
      while ((a & 0x8000) == 0)
    }

    def encode(d: Int, cx: Int, idx: Array[Int], mps: Array[Int]): Unit = {
      val i = idx(cx)
      val qe = Qe(i)
      if (d == mps(cx)) { // CODEMPS
        a -= qe
        if ((a & 0x8000) == 0) {
          if (a < qe) a = qe else c += qe
          idx(cx) = NMPS(i)
          renorm()
        } else c += qe
      } else { // CODELPS
        a -= qe
        if (a < qe) c += qe else a = qe
        if (SW(i) == 1) mps(cx) = 1 - mps(cx)
        idx(cx) = NLPS(i)
        renorm()
      }
    }

    /** FLUSH: terminate the segment and return its bytes (a terminal
      * 0xFF is not transmitted, per C.2.9). */
    def flush(): Array[Byte] = {
      val tempc = c + a // SETBITS
      c |= 0xffffL
      if (c >= tempc) c -= 0x8000L
      c <<= ct; byteout()
      c <<= ct; byteout()
      if (havePending && pending != 0xff) out.write(pending)
      out.toByteArray
    }
  }

  // ============================== packet-header bit I/O (B.10.1)

  /** Reader with the 0xFF bit-stuffing rule: the byte after a 0xFF
    * carries only 7 bits. */
  private final class BitReader(data: Array[Byte], var pos: Int,
      val end: Int) {
    private var buf = 0
    private var ct = 0
    private var last = 0
    def bit(): Int = {
      if (ct == 0) {
        require(pos < end, "packet header truncated")
        buf = data(pos) & 0xff
        require(!(last == 0xff && buf > 0x8f),
          "marker byte inside a packet header (bad stuffing)")
        ct = if (last == 0xff) 7 else 8
        last = buf
        pos += 1
      }
      ct -= 1
      (buf >>> ct) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var k = 0
      while (k < n) { v = (v << 1) | bit(); k += 1 }
      v
    }
    /** Skip to the byte boundary; a fully-consumed trailing 0xFF eats
      * the stuffing byte the writer appended. */
    def align(): Unit = {
      if (ct == 0 && last == 0xff) {
        require(pos < end, "packet header truncated at stuffing byte")
        require((data(pos) & 0xff) <= 0x8f,
          "marker byte where a stuffing byte is required")
        pos += 1
      }
      ct = 0
      last = 0
    }
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var buf = 0
    private var ct = 8
    private var last = 0
    private def emit(): Unit = {
      out.write(buf); last = buf; buf = 0
      ct = if (last == 0xff) 7 else 8
    }
    def bit(b: Int): Unit = {
      ct -= 1
      buf |= (b & 1) << ct
      if (ct == 0) emit()
    }
    def bits(v: Int, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) { bit((v >>> k) & 1); k -= 1 }
    }
    def alignAndBytes(): Array[Byte] = {
      if (ct < (if (last == 0xff) 7 else 8)) emit()
      if (last == 0xff) out.write(0) // stuffing byte after trailing 0xFF
      out.toByteArray
    }
  }

  // ======================================== tag trees (B.10.2)

  private final class TagTree(val w: Int, val h: Int) {
    // level 0 = leaves; each level halves (ceil) until 1×1
    private val dims = {
      val b = Seq.newBuilder[(Int, Int)]
      var (cw, ch) = (w, h)
      b += ((cw, ch))
      while (cw > 1 || ch > 1) {
        cw = (cw + 1) / 2; ch = (ch + 1) / 2; b += ((cw, ch))
      }
      b.result()
    }
    private val off = dims.scanLeft(0)((o, d) => o + d._1 * d._2)
    val value = new Array[Int](off.last) // true value / decoded value
    private val low = new Array[Int](off.last) // communicated lower bound
    private val known = new Array[Boolean](off.last)

    private def node(lev: Int, x: Int, y: Int): Int =
      off(lev) + y * dims(lev)._1 + x
    def leafValue(i: Int, j: Int): Int = value(node(0, i, j))
    def setLeaf(i: Int, j: Int, v: Int): Unit = value(node(0, i, j)) = v

    /** Encoder: fill internal nodes with subtree minima. */
    def build(): Unit = {
      var l = 1
      while (l < dims.size) {
        val (lw, lh) = dims(l)
        val (pw, ph) = dims(l - 1)
        var y = 0
        while (y < lh) {
          var x = 0
          while (x < lw) {
            var m = Int.MaxValue
            var dy = 0
            while (dy < 2) {
              var dx = 0
              while (dx < 2) {
                val cx = 2 * x + dx; val cy = 2 * y + dy
                if (cx < pw && cy < ph)
                  m = math.min(m, value(node(l - 1, cx, cy)))
                dx += 1
              }
              dy += 1
            }
            value(node(l, x, y)) = m
            x += 1
          }
          y += 1
        }
        l += 1
      }
    }

    /** Decode one query: true iff leaf value < threshold (the leaf
      * value is then exact). State persists across calls. */
    def decode(br: BitReader, i: Int, j: Int, threshold: Int): Boolean = {
      var lo = 0
      var l = dims.size - 1
      while (l >= 0) {
        val nd = node(l, i >> l, j >> l)
        if (low(nd) < lo) low(nd) = lo
        while (!known(nd) && low(nd) < threshold) {
          if (br.bit() == 1) { known(nd) = true; value(nd) = low(nd) }
          else low(nd) += 1
        }
        if (!known(nd)) return false
        lo = value(nd)
        l -= 1
      }
      true
    }

    /** Encoder mirror of [[decode]]; `value` must hold true minima
      * (via [[build]]). Returns true iff leaf value < threshold. */
    def encode(bw: BitWriter, i: Int, j: Int, threshold: Int): Boolean = {
      var lo = 0
      var l = dims.size - 1
      while (l >= 0) {
        val nd = node(l, i >> l, j >> l)
        if (low(nd) < lo) low(nd) = lo
        while (!known(nd) && low(nd) < threshold) {
          if (low(nd) < value(nd)) { bw.bit(0); low(nd) += 1 }
          else { bw.bit(1); known(nd) = true }
        }
        if (!known(nd)) return false
        lo = value(nd)
        l -= 1
      }
      true
    }
  }

  // =========================== T1 block coder (Annex D)

  // band orientation ids: 0 LL, 1 HL, 2 LH, 3 HH
  private def sigCtxOf(band: Int, hh: Int, vv: Int, dd: Int): Int = {
    val (h, v) = if (band == 1) (vv, hh) else (hh, vv) // HL transposes
    if (band == 3) { // HH: diagonal-primary
      if (dd >= 3) 8
      else if (dd == 2) { if (h + v >= 1) 7 else 6 }
      else if (dd == 1) { if (h + v >= 2) 5 else if (h + v == 1) 4 else 3 }
      else { if (h + v >= 2) 2 else if (h + v == 1) 1 else 0 }
    } else {
      if (h == 2) 8
      else if (h == 1) { if (v >= 1) 7 else if (dd >= 1) 6 else 5 }
      else if (v == 2) 4
      else if (v == 1) 3
      else if (dd >= 2) 2
      else if (dd == 1) 1
      else 0
    }
  }

  /** Sign context (Table D.3) packed as ctx | (xorBit << 8), from the
    * clamped horizontal/vertical neighbor sign sums. */
  private def signCtxXor(hc: Int, vc: Int): Int = {
    if (hc == 1) { if (vc == 1) 13 else if (vc == 0) 12 else 11 }
    else if (hc == 0) {
      if (vc == 1) 10 else if (vc == 0) 9 else (10 | 0x100)
    }
    else {
      if (vc == 1) (11 | 0x100) else if (vc == 0) (12 | 0x100)
      else (13 | 0x100)
    }
  }

  /** Per-block coefficient state shared by the encode and decode pass
    * loops (one guard cell on every border). */
  private final class BlockState(val w: Int, val h: Int) {
    val stride = w + 2
    val sig = new Array[Boolean]((w + 2) * (h + 2))
    val neg = new Array[Boolean]((w + 2) * (h + 2))
    val visited = new Array[Boolean]((w + 2) * (h + 2))
    val refined = new Array[Boolean]((w + 2) * (h + 2))
    val mag = new Array[Int]((w + 2) * (h + 2))
    @inline def at(x: Int, y: Int): Int = (y + 1) * stride + (x + 1)
    @inline def hCount(p: Int): Int =
      (if (sig(p - 1)) 1 else 0) + (if (sig(p + 1)) 1 else 0)
    @inline def vCount(p: Int): Int =
      (if (sig(p - stride)) 1 else 0) + (if (sig(p + stride)) 1 else 0)
    @inline def dCount(p: Int): Int =
      (if (sig(p - stride - 1)) 1 else 0) + (if (sig(p - stride + 1)) 1 else 0) +
        (if (sig(p + stride - 1)) 1 else 0) + (if (sig(p + stride + 1)) 1 else 0)
    def signPack(p: Int): Int = {
      @inline def contrib(q: Int): Int =
        if (!sig(q)) 0 else if (neg(q)) -1 else 1
      val hc = math.max(-1, math.min(1, contrib(p - 1) + contrib(p + 1)))
      val vc = math.max(-1, math.min(1, contrib(p - stride) + contrib(p + stride)))
      signCtxXor(hc, vc)
    }
  }

  /** Decode `totalPasses` coding passes of one code-block; returns the
    * signed coefficients row-major. */
  private def decodeBlock(data: Array[Byte], w: Int, h: Int, numbps: Int,
      totalPasses: Int, band: Int): Array[Int] = {
    val st = new BlockState(w, h)
    val (idx, mps) = initCtx()
    val mq = new MqDec(data, 0, data.length)
    var pass = 0
    var plane = numbps - 1
    while (plane >= 0 && pass < totalPasses) {
      val first = plane == numbps - 1
      if (!first && pass < totalPasses) { // significance propagation
        var s0 = 0
        while (s0 < h) {
          var x = 0
          while (x < w) {
            var y = s0
            val yEnd = math.min(s0 + 4, h)
            while (y < yEnd) {
              val p = st.at(x, y)
              if (!st.sig(p)) {
                val hh = st.hCount(p); val vv = st.vCount(p); val dd = st.dCount(p)
                if (hh + vv + dd > 0) {
                  st.visited(p) = true
                  if (mq.decode(sigCtxOf(band, hh, vv, dd), idx, mps) == 1) {
                    val cv = st.signPack(p)
                    val s = mq.decode(cv & 0xff, idx, mps) ^ (cv >>> 8)
                    st.sig(p) = true; st.neg(p) = s == 1
                    st.mag(p) = 1 << plane
                  }
                }
              }
              y += 1
            }
            x += 1
          }
          s0 += 4
        }
        pass += 1
      }
      if (!first && pass < totalPasses) { // magnitude refinement
        var s0 = 0
        while (s0 < h) {
          var x = 0
          while (x < w) {
            var y = s0
            val yEnd = math.min(s0 + 4, h)
            while (y < yEnd) {
              val p = st.at(x, y)
              if (st.sig(p) && !st.visited(p)) {
                val cx =
                  if (st.refined(p)) 16
                  else if (st.hCount(p) + st.vCount(p) + st.dCount(p) > 0) 15
                  else 14
                val b = mq.decode(cx, idx, mps)
                st.mag(p) |= b << plane
                st.refined(p) = true
                st.visited(p) = true
              }
              y += 1
            }
            x += 1
          }
          s0 += 4
        }
        pass += 1
      }
      if (pass < totalPasses) { // cleanup
        var s0 = 0
        while (s0 < h) {
          var x = 0
          while (x < w) {
            var rl = s0 + 4 <= h
            if (rl) {
              var k = 0
              while (rl && k < 4) {
                val p = st.at(x, s0 + k)
                if (st.sig(p) || st.visited(p) ||
                    st.hCount(p) + st.vCount(p) + st.dCount(p) > 0) rl = false
                k += 1
              }
            }
            var y = s0
            val yEnd = math.min(s0 + 4, h)
            if (rl) {
              if (mq.decode(CtxRL, idx, mps) == 0) y = yEnd
              else {
                val r = (mq.decode(CtxUNI, idx, mps) << 1) |
                  mq.decode(CtxUNI, idx, mps)
                y = s0 + r
                val p = st.at(x, y)
                val cv = st.signPack(p)
                val s = mq.decode(cv & 0xff, idx, mps) ^ (cv >>> 8)
                st.sig(p) = true; st.neg(p) = s == 1
                st.mag(p) = 1 << plane
                y += 1
              }
            }
            while (y < yEnd) {
              val p = st.at(x, y)
              if (!st.sig(p) && !st.visited(p)) {
                val hh = st.hCount(p); val vv = st.vCount(p); val dd = st.dCount(p)
                if (mq.decode(sigCtxOf(band, hh, vv, dd), idx, mps) == 1) {
                  val cv = st.signPack(p)
                  val s = mq.decode(cv & 0xff, idx, mps) ^ (cv >>> 8)
                  st.sig(p) = true; st.neg(p) = s == 1
                  st.mag(p) = 1 << plane
                }
              }
              y += 1
            }
            x += 1
          }
          s0 += 4
        }
        pass += 1
      }
      java.util.Arrays.fill(st.visited, false)
      plane -= 1
    }
    val res = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = st.at(x, y)
        res(y * w + x) = if (st.neg(p)) -st.mag(p) else st.mag(p)
        x += 1
      }
      y += 1
    }
    res
  }

  /** Encode one code-block losslessly (all passes, one terminated
    * segment). Returns (bytes, numbps, passCount). */
  private def encodeBlock(coeffs: Array[Int], w: Int, h: Int,
      band: Int): (Array[Byte], Int, Int) = {
    var maxMag = 0
    var i = 0
    while (i < coeffs.length) {
      val m = math.abs(coeffs(i)); if (m > maxMag) maxMag = m; i += 1
    }
    if (maxMag == 0) return (Array.emptyByteArray, 0, 0)
    val numbps = 32 - Integer.numberOfLeadingZeros(maxMag)
    val st = new BlockState(w, h)
    val (idx, mps) = initCtx()
    val mq = new MqEnc
    val trueMag = new Array[Int](coeffs.length)
    val trueNeg = new Array[Boolean](coeffs.length)
    i = 0
    while (i < coeffs.length) {
      trueMag(i) = math.abs(coeffs(i)); trueNeg(i) = coeffs(i) < 0; i += 1
    }
    @inline def setSig(p: Int, flat: Int, plane: Int): Unit = {
      val cv = st.signPack(p)
      val s = if (trueNeg(flat)) 1 else 0
      mq.encode(s ^ (cv >>> 8), cv & 0xff, idx, mps)
      st.sig(p) = true; st.neg(p) = trueNeg(flat)
      st.mag(p) = 1 << plane
    }
    var plane = numbps - 1
    var passes = 0
    while (plane >= 0) {
      val first = plane == numbps - 1
      if (!first) { // significance propagation
        var s0 = 0
        while (s0 < h) {
          var x = 0
          while (x < w) {
            var y = s0
            val yEnd = math.min(s0 + 4, h)
            while (y < yEnd) {
              val p = st.at(x, y)
              if (!st.sig(p)) {
                val hh = st.hCount(p); val vv = st.vCount(p); val dd = st.dCount(p)
                if (hh + vv + dd > 0) {
                  st.visited(p) = true
                  val becomes = (trueMag(y * w + x) >>> plane) == 1
                  mq.encode(if (becomes) 1 else 0,
                    sigCtxOf(band, hh, vv, dd), idx, mps)
                  if (becomes) setSig(p, y * w + x, plane)
                }
              }
              y += 1
            }
            x += 1
          }
          s0 += 4
        }
        passes += 1
      }
      if (!first) { // magnitude refinement
        var s0 = 0
        while (s0 < h) {
          var x = 0
          while (x < w) {
            var y = s0
            val yEnd = math.min(s0 + 4, h)
            while (y < yEnd) {
              val p = st.at(x, y)
              if (st.sig(p) && !st.visited(p)) {
                val cx =
                  if (st.refined(p)) 16
                  else if (st.hCount(p) + st.vCount(p) + st.dCount(p) > 0) 15
                  else 14
                val b = (trueMag(y * w + x) >>> plane) & 1
                mq.encode(b, cx, idx, mps)
                st.mag(p) |= b << plane
                st.refined(p) = true
                st.visited(p) = true
              }
              y += 1
            }
            x += 1
          }
          s0 += 4
        }
        passes += 1
      }
      { // cleanup
        var s0 = 0
        while (s0 < h) {
          var x = 0
          while (x < w) {
            var rl = s0 + 4 <= h
            if (rl) {
              var k = 0
              while (rl && k < 4) {
                val p = st.at(x, s0 + k)
                if (st.sig(p) || st.visited(p) ||
                    st.hCount(p) + st.vCount(p) + st.dCount(p) > 0) rl = false
                k += 1
              }
            }
            var y = s0
            val yEnd = math.min(s0 + 4, h)
            if (rl) {
              var r = -1
              var k = 0
              while (r < 0 && k < 4) {
                if ((trueMag((s0 + k) * w + x) >>> plane) == 1) r = k
                k += 1
              }
              if (r < 0) { mq.encode(0, CtxRL, idx, mps); y = yEnd }
              else {
                mq.encode(1, CtxRL, idx, mps)
                mq.encode((r >>> 1) & 1, CtxUNI, idx, mps)
                mq.encode(r & 1, CtxUNI, idx, mps)
                y = s0 + r
                setSig(st.at(x, y), y * w + x, plane)
                y += 1
              }
            }
            while (y < yEnd) {
              val p = st.at(x, y)
              if (!st.sig(p) && !st.visited(p)) {
                val hh = st.hCount(p); val vv = st.vCount(p); val dd = st.dCount(p)
                val becomes = (trueMag(y * w + x) >>> plane) == 1
                mq.encode(if (becomes) 1 else 0,
                  sigCtxOf(band, hh, vv, dd), idx, mps)
                if (becomes) setSig(p, y * w + x, plane)
              }
              y += 1
            }
            x += 1
          }
          s0 += 4
        }
        passes += 1
      }
      java.util.Arrays.fill(st.visited, false)
      plane -= 1
    }
    (mq.flush(), numbps, passes)
  }

  // =========================== reversible 5/3 DWT (Annex F)

  /** Symmetric whole-point extension index into [0, n) (even period,
    * so sample parity is preserved). */
  @inline private def ext(i: Int, n: Int): Int = {
    if (n == 1) return 0
    val period = 2 * (n - 1)
    var k = i % period
    if (k < 0) k += period
    if (k >= n) period - k else k
  }

  /** 1-D inverse 5/3 on an interleaved line (even = low). */
  private def sr1d(n: Int, get: Int => Int, set: (Int, Int) => Unit): Unit = {
    if (n <= 1) return
    @inline def yAt(i: Int): Int = get(ext(i, n))
    val even = new Array[Int]((n + 1) / 2)
    var k = 0
    while (2 * k < n) {
      even(k) = yAt(2 * k) - ((yAt(2 * k - 1) + yAt(2 * k + 1) + 2) >> 2)
      k += 1
    }
    @inline def xEven(i: Int): Int = even(ext(i, n) / 2)
    k = 0
    val odd = new Array[Int](n / 2)
    while (2 * k + 1 < n) {
      odd(k) = yAt(2 * k + 1) + ((xEven(2 * k) + xEven(2 * k + 2)) >> 1)
      k += 1
    }
    var i = 0
    while (i < n) {
      set(i, if ((i & 1) == 0) even(i / 2) else odd(i / 2))
      i += 1
    }
  }

  /** 1-D forward 5/3 producing an interleaved line. */
  private def sd1d(n: Int, get: Int => Int, set: (Int, Int) => Unit): Unit = {
    if (n <= 1) return
    val xs = Array.tabulate(n)(get)
    @inline def xAt(i: Int): Int = xs(ext(i, n))
    val odd = new Array[Int](n / 2)
    var k = 0
    while (2 * k + 1 < n) {
      odd(k) = xAt(2 * k + 1) - ((xAt(2 * k) + xAt(2 * k + 2)) >> 1)
      k += 1
    }
    @inline def yOdd(i: Int): Int = odd(ext(i, n) / 2)
    val even = new Array[Int]((n + 1) / 2)
    k = 0
    while (2 * k < n) {
      even(k) = xAt(2 * k) + ((yOdd(2 * k - 1) + yOdd(2 * k + 1) + 2) >> 2)
      k += 1
    }
    var i = 0
    while (i < n) {
      set(i, if ((i & 1) == 0) even(i / 2) else odd(i / 2))
      i += 1
    }
  }

  /** Interleave the deinterleaved level region (LL top-left, HL
    * top-right, LH bottom-left, HH bottom-right) of `canvas` into a
    * (wl × hl) scratch with even/odd positions. */
  private def interleave(canvas: Array[Int], cw: Int, wl: Int,
      hl: Int): Array[Int] = {
    val lw = (wl + 1) / 2; val lh = (hl + 1) / 2
    val t = new Array[Int](wl * hl)
    var y = 0
    while (y < hl) {
      var x = 0
      while (x < wl) {
        val sx = (if (x % 2 == 0) 0 else lw) + x / 2
        val sy = (if (y % 2 == 0) 0 else lh) + y / 2
        t(y * wl + x) = canvas(sy * cw + sx)
        x += 1
      }
      y += 1
    }
    t
  }

  private def deinterleave(t: Array[Int], canvas: Array[Int], cw: Int,
      wl: Int, hl: Int): Unit = {
    val lw = (wl + 1) / 2; val lh = (hl + 1) / 2
    var y = 0
    while (y < hl) {
      var x = 0
      while (x < wl) {
        val sx = (if (x % 2 == 0) 0 else lw) + x / 2
        val sy = (if (y % 2 == 0) 0 else lh) + y / 2
        canvas(sy * cw + sx) = t(y * wl + x)
        x += 1
      }
      y += 1
    }
  }

  /** Multi-level inverse: canvas holds deinterleaved subbands, leaves
    * spatial samples. Per level (spec F.3.4): interleave, HOR_SR
    * (rows), VER_SR (columns). */
  private[graft] def idwt53(canvas: Array[Int], w: Int, h: Int,
      levels: Int): Unit = {
    var lev = levels
    while (lev >= 1) {
      val wl = ceilDiv(w, 1 << (lev - 1))
      val hl = ceilDiv(h, 1 << (lev - 1))
      val t = interleave(canvas, w, wl, hl)
      var y = 0
      while (y < hl) {
        val base = y * wl
        sr1d(wl, i => t(base + i), (i, v) => t(base + i) = v)
        y += 1
      }
      var x = 0
      while (x < wl) {
        sr1d(hl, i => t(i * wl + x), (i, v) => t(i * wl + x) = v)
        x += 1
      }
      y = 0
      while (y < hl) {
        System.arraycopy(t, y * wl, canvas, y * w, wl)
        y += 1
      }
      lev -= 1
    }
  }

  /** Multi-level forward (mirror of [[idwt53]]: VER_SD, HOR_SD,
    * deinterleave). */
  private[graft] def fdwt53(canvas: Array[Int], w: Int, h: Int,
      levels: Int): Unit = {
    var lev = 1
    while (lev <= levels) {
      val wl = ceilDiv(w, 1 << (lev - 1))
      val hl = ceilDiv(h, 1 << (lev - 1))
      val t = new Array[Int](wl * hl)
      var y = 0
      while (y < hl) {
        System.arraycopy(canvas, y * w, t, y * wl, wl)
        y += 1
      }
      var x = 0
      while (x < wl) {
        sd1d(hl, i => t(i * wl + x), (i, v) => t(i * wl + x) = v)
        x += 1
      }
      y = 0
      while (y < hl) {
        val base = y * wl
        sd1d(wl, i => t(base + i), (i, v) => t(base + i) = v)
        y += 1
      }
      deinterleave(t, canvas, w, wl, hl)
      lev += 1
    }
  }

  @inline private def ceilDiv(a: Int, b: Int): Int = (a + b - 1) / b

  // =========================== geometry

  /** One subband of one resolution: orientation, dims, canvas offset,
    * SPqcd exponent index. */
  private final case class Band(orient: Int, bw: Int, bh: Int,
      offX: Int, offY: Int, sq: Int)

  /** Subbands of resolution r (0-based; NL+1 resolutions), origin-0
    * single tile. `sq` indexes the SPqcd exponent list (LL first,
    * then HL/LH/HH per resolution, coarsest first). */
  private def bandsOf(r: Int, nl: Int, w: Int, h: Int): Seq[Band] = {
    if (r == 0) {
      Seq(Band(0, ceilDiv(w, 1 << nl), ceilDiv(h, 1 << nl), 0, 0, 0))
    } else {
      val n = nl - r + 1 // decomposition level of these bands
      val wp = ceilDiv(w, 1 << (n - 1)); val hp = ceilDiv(h, 1 << (n - 1))
      val lw = (wp + 1) / 2; val lh = (hp + 1) / 2
      val base = 1 + 3 * (r - 1)
      Seq(
        Band(1, wp - lw, lh, lw, 0, base),          // HL
        Band(2, lw, hp - lh, 0, lh, base + 1),      // LH
        Band(3, wp - lw, hp - lh, lw, lh, base + 2))// HH
    }
  }

  /** Code-blocks of `band` clipped to precinct (px, py): rects in
    * raster order plus the precinct-local grid dims for the tag
    * trees. Precinct sizes are resolution-coordinate exponents,
    * halved in band coordinates for r > 0. */
  private final case class CbGrid(blocks: IndexedSeq[(Int, Int, Int, Int)],
      gw: Int, gh: Int)

  private def blocksIn(band: Band, r: Int, px: Int, py: Int, ppx: Int,
      ppy: Int, cbw: Int, cbh: Int): CbGrid = {
    val shift = if (r == 0) 0 else 1
    val pw = 1 << (ppx - shift); val ph = 1 << (ppy - shift)
    val bx0 = px.toLong * pw; val by0 = py.toLong * ph
    val bx1 = math.min(band.bw.toLong, bx0 + pw)
    val by1 = math.min(band.bh.toLong, by0 + ph)
    if (bx0 >= bx1 || by0 >= by1) return CbGrid(Vector.empty, 0, 0)
    val cx0 = (bx0 / cbw).toInt; val cx1 = ceilDiv(bx1.toInt, cbw)
    val cy0 = (by0 / cbh).toInt; val cy1 = ceilDiv(by1.toInt, cbh)
    val bs = for (cy <- cy0 until cy1; cx <- cx0 until cx1) yield {
      val x0 = math.max(bx0, cx.toLong * cbw).toInt
      val x1 = math.min(bx1, (cx + 1).toLong * cbw).toInt
      val y0 = math.max(by0, cy.toLong * cbh).toInt
      val y1 = math.min(by1, (cy + 1).toLong * cbh).toInt
      (x0, y0, x1 - x0, y1 - y0)
    }
    CbGrid(bs.toVector, cx1 - cx0, cy1 - cy0)
  }

  // =========================== decoder

  private def u16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  /** Per-code-block accumulation across packets/layers. */
  private final class CbAcc {
    var included = false
    var numbps = 0
    var lblock = 3
    var passes = 0
    val data = new java.io.ByteArrayOutputStream()
  }

  private final case class Contribution(cb: CbAcc, passes: Int, len: Int)

  def decode(cs: Array[Byte]): Decoded =
    CodecGate.gated("JPEG2000")(decodeImpl(cs))

  private def decodeImpl(cs: Array[Byte]): Decoded = {
    require(cs.length >= 4 && u16(cs, 0) == 0xff4f,
      "not a JPEG 2000 codestream (missing SOC)")
    var p = 2
    var w = -1; var h = -1; var depth = -1
    var nl = -1; var xcb = -1; var ycb = -1
    var progression = -1; var layers = -1
    var sop = false; var eph = false
    var precW: Array[Int] = null; var precH: Array[Int] = null
    var guard = -1; var eps: Array[Int] = null
    var sotAt = -1; var psot = -1L

    while (sotAt < 0) {
      require(p + 4 <= cs.length, "codestream truncated before SOT")
      val mk = u16(cs, p)
      require((mk >> 8) == 0xff, f"bad marker 0x$mk%04x at $p")
      val len = u16(cs, p + 2)
      require(p + 2 + len <= cs.length, f"marker 0x$mk%04x overruns the stream")
      mk match {
        case 0xff51 => // SIZ (Rsiz profile bits only restrict; ignore)
          val xsiz = u32(cs, p + 6); val ysiz = u32(cs, p + 10)
          val xo = u32(cs, p + 14); val yo = u32(cs, p + 18)
          val xt = u32(cs, p + 22); val yt = u32(cs, p + 26)
          val xto = u32(cs, p + 30); val yto = u32(cs, p + 34)
          val ncomp = u16(cs, p + 38)
          require(ncomp == 1,
            s"$ncomp components unsupported (5.40 carries one grayscale plane)")
          require(xo == 0 && yo == 0 && xto == 0 && yto == 0,
            "nonzero image/tile origin unsupported")
          require(xt >= xsiz && yt >= ysiz,
            s"multi-tile codestream unsupported (tile ${xt}x$yt < image ${xsiz}x$ysiz)")
          // ALLOCATION gate: subband/sample buffers are sized off
          // these DECLARED dims — cap before anything allocates
          // (r14 fuzz battery; 2^26 pixels is far past any GRIB
          // 5.40 strip or grid this engine carries)
          require(xsiz >= 1 && ysiz >= 1 && xsiz * ysiz <= (1L << 26),
            s"implausible image ${xsiz}x$ysiz (empty or past the " +
              "2^26-pixel sanity cap)")
          val ssiz = cs(p + 40) & 0xff
          require((ssiz & 0x80) == 0,
            "signed samples unsupported (5.40 codes are unsigned)")
          depth = (ssiz & 0x7f) + 1
          require(depth <= 28, s"sample depth $depth > 28 unsupported")
          require((cs(p + 41) & 0xff) == 1 && (cs(p + 42) & 0xff) == 1,
            "component subsampling unsupported")
          w = xsiz.toInt; h = ysiz.toInt
        case 0xff52 => // COD
          val scod = cs(p + 4) & 0xff
          require((scod & ~0x7) == 0, f"Scod bits 0x$scod%02x unsupported")
          sop = (scod & 0x2) != 0; eph = (scod & 0x4) != 0
          progression = cs(p + 5) & 0xff
          require(progression <= 4, s"progression order $progression invalid")
          layers = u16(cs, p + 6)
          require(layers >= 1, "zero quality layers")
          require((cs(p + 8) & 0xff) == 0,
            "multi-component transform flagged with one component")
          nl = cs(p + 9) & 0xff
          require(nl <= 32, s"$nl decomposition levels implausible")
          xcb = (cs(p + 10) & 0xff) + 2; ycb = (cs(p + 11) & 0xff) + 2
          require(xcb <= 10 && ycb <= 10 && xcb + ycb <= 12,
            s"code-block 2^${xcb}x2^$ycb exceeds Part-1 bounds")
          val cbStyle = cs(p + 12) & 0xff
          require(cbStyle == 0,
            f"code-block style 0x$cbStyle%02x unsupported (bypass/termall/" +
              "reset/causal/segsym off the 5.40 writer profile)")
          val transform = cs(p + 13) & 0xff
          require(transform == 1,
            "irreversible 9/7 wavelet (lossy) unsupported — only the " +
              "reversible 5/3 of lossless 5.40 decodes")
          precW = new Array[Int](nl + 1); precH = new Array[Int](nl + 1)
          if ((scod & 0x1) != 0) {
            require(len == 13 + nl + 1, s"COD length $len off for $nl levels")
            var r = 0
            while (r <= nl) {
              val b = cs(p + 14 + r) & 0xff
              precW(r) = b & 0xf; precH(r) = (b >> 4) & 0xf
              require(precW(r) >= (if (r == 0) 0 else 1) &&
                precH(r) >= (if (r == 0) 0 else 1),
                s"precinct 2^${precW(r)}x2^${precH(r)} at resolution $r invalid")
              r += 1
            }
          } else {
            java.util.Arrays.fill(precW, 15); java.util.Arrays.fill(precH, 15)
          }
        case 0xff5c => // QCD
          val sqcd = cs(p + 4) & 0xff
          guard = (sqcd >> 5) & 0x7
          require((sqcd & 0x1f) == 0,
            s"quantization style ${sqcd & 0x1f} unsupported (reversible 5/3 " +
              "carries style 0)")
          eps = Array.tabulate(len - 3)(i => (cs(p + 5 + i) & 0xff) >> 3)
        case 0xff90 => // SOT
          require(u16(cs, p + 4) == 0, "multi-tile codestream unsupported")
          psot = u32(cs, p + 6)
          require((cs(p + 10) & 0xff) == 0,
            "multiple tile-parts unsupported (TPsot > 0)")
          sotAt = p
        case 0xff53 | 0xff5d => throw new IllegalArgumentException(
          "COC/QCC per-component overrides unsupported (single component)")
        case 0xff5f => throw new IllegalArgumentException(
          "POC progression-order change unsupported")
        case 0xff5e => throw new IllegalArgumentException(
          "RGN region-of-interest unsupported")
        case 0xff60 | 0xff61 => throw new IllegalArgumentException(
          "PPM/PPT packed packet headers unsupported")
        case 0xff55 | 0xff57 | 0xff58 | 0xff63 | 0xff64 => () // TLM/PLM/PLT/CRG/COM
        case m => throw new IllegalArgumentException(
          f"unknown main-header marker 0x$m%04x")
      }
      if (sotAt < 0) p += 2 + len
    }
    require(w > 0, "SIZ missing before SOT")
    require(nl >= 0, "COD missing before SOT")
    require(eps != null, "QCD missing before SOT")
    require(eps.length == 3 * nl + 1,
      s"QCD carries ${eps.length} exponents for $nl levels (expected ${3 * nl + 1})")

    // tile header: skip PLT/COM, refuse overrides, find SOD
    var q = sotAt + 2 + u16(cs, sotAt + 2)
    while (u16(cs, q) != 0xff93) {
      val m = u16(cs, q)
      val l = u16(cs, q + 2)
      m match {
        case 0xff58 | 0xff64 => q += 2 + l // PLT/COM
        case 0xff52 | 0xff5c | 0xff53 | 0xff5d =>
          throw new IllegalArgumentException(
            "tile-header COD/QCD/COC/QCC overrides unsupported")
        case 0xff61 => throw new IllegalArgumentException(
          "PPT packed packet headers unsupported")
        case other => throw new IllegalArgumentException(
          f"unknown tile-header marker 0x$other%04x")
      }
    }
    q += 2 // past SOD
    // Psot arithmetic stays in Long: a crafted 2^31-range value must
    // refuse, never wrap into a negative index
    val tileEndL = if (psot == 0) cs.length.toLong - 2 else sotAt.toLong + psot
    require(tileEndL >= q && tileEndL + 2 <= cs.length,
      s"Psot $psot puts the tile end at $tileEndL — outside the stream")
    val tileEnd = tileEndL.toInt
    require(u16(cs, tileEnd) == 0xffd9,
      "EOC missing where Psot says the tile ends")

    // --- geometry + per-block state ---
    val resolutions = (0 to nl).map { r =>
      val bands = bandsOf(r, nl, w, h)
      val rw = ceilDiv(w, 1 << (nl - r)); val rh = ceilDiv(h, 1 << (nl - r))
      val npx = math.max(1, ceilDiv2(rw, precW(r)))
      val npy = math.max(1, ceilDiv2(rh, precH(r)))
      (bands, npx, npy)
    }
    def cbDims(r: Int): (Int, Int) = {
      val s = if (r == 0) 0 else 1
      (1 << math.min(xcb, precW(r) - s), 1 << math.min(ycb, precH(r) - s))
    }
    val cbAcc = scala.collection.mutable.HashMap.empty[(Int, Int, Int, Int), CbAcc]
    val inclTrees = scala.collection.mutable.HashMap.empty[(Int, Int, Int), TagTree]
    val zbpTrees = scala.collection.mutable.HashMap.empty[(Int, Int, Int), TagTree]

    var cursor = q
    def decodePacket(r: Int, layer: Int, pi: Int): Unit = {
      val (bands, npx, _) = resolutions(r)
      val (cbw, cbh) = cbDims(r)
      locally {
        val px = pi % npx; val py = pi / npx
        if (sop) {
          // SOP is OPTIONAL per packet even when flagged
          if (cursor + 2 <= tileEnd && u16(cs, cursor) == 0xff91) cursor += 6
        }
        val br = new BitReader(cs, cursor, tileEnd)
        val contributions = Vector.newBuilder[Contribution]
        if (br.bit() == 1) {
          var bi = 0
          while (bi < bands.size) {
            val band = bands(bi)
            val grid = blocksIn(band, r, px, py, precW(r), precH(r), cbw, cbh)
            if (grid.blocks.nonEmpty) {
              val incl = inclTrees.getOrElseUpdate((r, pi, bi),
                new TagTree(grid.gw, grid.gh))
              val zbt = zbpTrees.getOrElseUpdate((r, pi, bi),
                new TagTree(grid.gw, grid.gh))
              var k = 0
              while (k < grid.blocks.size) {
                val cb = cbAcc.getOrElseUpdate((r, pi, bi, k), new CbAcc)
                val gx = k % grid.gw; val gy = k / grid.gw
                val inc =
                  if (cb.included) br.bit() == 1
                  else incl.decode(br, gx, gy, layer + 1)
                if (inc) {
                  if (!cb.included) {
                    var t = 1
                    while (!zbt.decode(br, gx, gy, t)) t += 1
                    val mb = guard + eps(band.sq) - 1
                    require(mb >= 1 && mb <= 30,
                      s"coefficient magnitude depth $mb undecodable")
                    cb.numbps = mb - zbt.leafValue(gx, gy)
                    require(cb.numbps >= 0,
                      s"zero-bitplanes ${zbt.leafValue(gx, gy)} exceeds Mb $mb")
                    cb.included = true
                  }
                  val np2 = // pass count, Table B.4
                    if (br.bit() == 0) 1
                    else if (br.bit() == 0) 2
                    else {
                      val v = br.bits(2)
                      if (v < 3) 3 + v
                      else {
                        val v2 = br.bits(5)
                        if (v2 < 31) 6 + v2 else 37 + br.bits(7)
                      }
                    }
                  while (br.bit() == 1) cb.lblock += 1
                  val clen = br.bits(cb.lblock + log2floor(np2))
                  contributions += Contribution(cb, np2, clen)
                }
                k += 1
              }
            }
            bi += 1
          }
        }
        br.align()
        cursor = br.pos
        if (eph) {
          require(cursor + 2 <= tileEnd && u16(cs, cursor) == 0xff92,
            s"EPH expected at $cursor")
          cursor += 2
        }
        contributions.result().foreach { c =>
          require(cursor + c.len <= tileEnd,
            "packet body overruns the tile-part")
          c.cb.data.write(cs, cursor, c.len)
          c.cb.passes += c.passes
          cursor += c.len
        }
      }
    }

    // packet iteration per Part-1 progression (one component, one
    // tile): LRCP = layer, resolution, precinct; RLCP = resolution,
    // layer, precinct; RPCL = resolution, precinct, layer. PCRL/CPRL
    // iterate spatial position OUTERMOST across resolutions — with one
    // precinct everywhere they collapse to RPCL's order, and the
    // genuinely position-interleaved multi-precinct shape refuses by
    // name rather than decoding packets against the wrong tag trees.
    def nPrec(r: Int) = resolutions(r)._2 * resolutions(r)._3
    progression match {
      case 0 =>
        for (l <- 0 until layers; r <- 0 to nl; p <- 0 until nPrec(r))
          decodePacket(r, l, p)
      case 1 =>
        for (r <- 0 to nl; l <- 0 until layers; p <- 0 until nPrec(r))
          decodePacket(r, l, p)
      case 2 =>
        for (r <- 0 to nl; p <- 0 until nPrec(r); l <- 0 until layers)
          decodePacket(r, l, p)
      case _ =>
        require((0 to nl).forall(nPrec(_) == 1),
          s"progression order $progression (PCRL/CPRL) with multiple " +
            "precincts unsupported — position-interleaved packet order")
        for (r <- 0 to nl; l <- 0 until layers) decodePacket(r, l, 0)
    }
    require(cursor == tileEnd,
      s"tile-part has ${tileEnd - cursor} undecoded trailing bytes")

    // --- T1 decode + place coefficients on the canvas ---
    val canvas = new Array[Int](w * h)
    for (r <- 0 to nl) {
      val (bands, npx, npy) = resolutions(r)
      val (cbw, cbh) = cbDims(r)
      for (pi <- 0 until npx * npy; bi <- bands.indices) {
        val band = bands(bi)
        val grid = blocksIn(band, r, pi % npx, pi / npx,
          precW(r), precH(r), cbw, cbh)
        for (k <- grid.blocks.indices) {
          cbAcc.get((r, pi, bi, k)).filter(_.included).foreach { cb =>
            val (x0, y0, bw2, bh2) = grid.blocks(k)
            val coeffs = decodeBlock(cb.data.toByteArray, bw2, bh2,
              cb.numbps, cb.passes, band.orient)
            var yy = 0
            while (yy < bh2) {
              var xx = 0
              while (xx < bw2) {
                canvas((band.offY + y0 + yy) * w + (band.offX + x0 + xx)) =
                  coeffs(yy * bw2 + xx)
                xx += 1
              }
              yy += 1
            }
          }
        }
      }
    }
    idwt53(canvas, w, h, nl)
    // DC level shift back to unsigned; a lossless decode must land the
    // nominal range exactly — outside it means a corrupt stream (or a
    // decoder bug), either way refuse rather than emit silent garbage
    val dc = 1L << (depth - 1)
    val samples = new Array[Long](w * h)
    var i = 0
    while (i < samples.length) {
      val v = canvas(i) + dc
      require(v >= 0 && v < (1L << depth),
        s"decoded sample $v outside the $depth-bit range at $i — corrupt stream")
      samples(i) = v
      i += 1
    }
    Decoded(w, h, depth, samples)
  }

  @inline private def log2floor(v: Int): Int =
    31 - Integer.numberOfLeadingZeros(v)
  @inline private def ceilDiv2(a: Int, e: Int): Int = // ceil(a / 2^e)
    ((a.toLong + (1L << e) - 1) >> e).toInt

  // =========================== encoder

  /** Lossless single-tile LRCP encoder for the same profile the
    * decoder accepts: one layer, reversible 5/3, maximal precincts,
    * 64×64 code-blocks. `samples` row-major unsigned `depth`-bit. */
  def encode(w: Int, h: Int, depth: Int, samples: Array[Long],
      levels: Int = 5): Array[Byte] = {
    // writer-side mirror of the decoder's 2^26-pixel cap (r14)
    require(w.toLong * h <= (1L << 26),
      s"image ${w}x$h past the 2^26-pixel cap the decoder enforces")
    require(w >= 1 && h >= 1 && w.toLong * h == samples.length,
      s"${samples.length} samples for ${w}x$h")
    require(depth >= 1 && depth <= 25,
      s"depth $depth unsupported for encode (1..25 keeps 5/3 growth in Int)")
    require(levels >= 0 && levels <= 16, s"bad levels $levels")
    val nl = levels
    val dc = 1L << (depth - 1)
    val canvas = new Array[Int](w * h)
    var i = 0
    while (i < samples.length) {
      val s = samples(i)
      require(s >= 0 && s < (1L << depth),
        s"sample $s outside the $depth-bit range")
      canvas(i) = (s - dc).toInt
      i += 1
    }
    fdwt53(canvas, w, h, nl)

    val guard = 2
    // per-band exponent from the ACTUAL max magnitude (Mb = guard +
    // eps - 1 must cover every block; adaptive eps never under-covers)
    val epsArr = new Array[Int](3 * nl + 1)
    java.util.Arrays.fill(epsArr, 1)
    case class EncBlock(gx: Int, gy: Int, bytes: Array[Byte], numbps: Int,
      passes: Int)
    // maximal precincts (2^15 in resolution coords) still split a very
    // wide image — the NCEP width = nPacked, height = 1 shape — into
    // several precincts per resolution; blocks are collected and
    // packets emitted PER PRECINCT, exactly the decoder's iteration
    val resData = (0 to nl).map { r =>
      val rw = ceilDiv(w, 1 << (nl - r)); val rh = ceilDiv(h, 1 << (nl - r))
      val npx = math.max(1, ceilDiv2(rw, 15))
      val npy = math.max(1, ceilDiv2(rh, 15))
      val bands = bandsOf(r, nl, w, h)
      val perPrecinct = (0 until npx * npy).map { pi =>
        bands.map { band =>
          val grid = blocksIn(band, r, pi % npx, pi / npx, 15, 15, 64, 64)
          var bandMax = 0
          val blocks = grid.blocks.zipWithIndex.map {
            case ((x0, y0, bw2, bh2), k) =>
              val coeffs = new Array[Int](bw2 * bh2)
              var yy = 0
              while (yy < bh2) {
                var xx = 0
                while (xx < bw2) {
                  coeffs(yy * bw2 + xx) =
                    canvas((band.offY + y0 + yy) * w + (band.offX + x0 + xx))
                  xx += 1
                }
                yy += 1
              }
              val (bytes, numbps, passes) =
                encodeBlock(coeffs, bw2, bh2, band.orient)
              if (numbps > bandMax) bandMax = numbps
              EncBlock(k % grid.gw, k / grid.gw, bytes, numbps, passes)
          }
          require(bandMax <= 30, s"coefficient growth $bandMax bits too deep")
          if (blocks.nonEmpty)
            epsArr(band.sq) =
              math.max(epsArr(band.sq), math.max(1, bandMax - guard + 1))
          (band, grid, blocks)
        }
      }
      perPrecinct
    }

    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def w32(v: Long): Unit = {
      w16(((v >> 16) & 0xffff).toInt); w16((v & 0xffff).toInt)
    }
    w16(0xff4f) // SOC
    w16(0xff51); w16(41); w16(0) // SIZ, Lsiz, Rsiz
    w32(w); w32(h); w32(0); w32(0); w32(w); w32(h); w32(0); w32(0)
    w16(1) // Csiz
    out.write(depth - 1); out.write(1); out.write(1)
    w16(0xff52); w16(12) // COD, Lcod (no precinct list)
    out.write(0) // Scod: maximal precincts, no SOP/EPH
    out.write(0) // LRCP
    w16(1) // one layer
    out.write(0) // no MCT
    out.write(nl)
    out.write(4); out.write(4) // 64×64 code-blocks (value = exp - 2)
    out.write(0) // code-block style: none
    out.write(1) // reversible 5/3
    w16(0xff5c); w16(3 + epsArr.length) // QCD
    out.write(guard << 5) // Sqcd: no quantization, `guard` guard bits
    epsArr.foreach(e => out.write(e << 3))

    // packets: LRCP, one layer, one packet per (resolution, precinct)
    val packets = (0 to nl).flatMap { r =>
      resData(r).map { bandsHere =>
        val bw = new BitWriter
        val bodies = new java.io.ByteArrayOutputStream()
        val any = bandsHere.exists(_._3.exists(_.numbps > 0))
        if (!any) bw.bit(0)
        else {
          bw.bit(1)
          bandsHere.foreach { case (band, grid, blocks) =>
            if (grid.blocks.nonEmpty) {
              val incl = new TagTree(grid.gw, grid.gh)
              val zbt = new TagTree(grid.gw, grid.gh)
              val mb = guard + epsArr(band.sq) - 1
              blocks.foreach { b =>
                incl.setLeaf(b.gx, b.gy, if (b.numbps > 0) 0 else 1)
                zbt.setLeaf(b.gx, b.gy,
                  if (b.numbps > 0) mb - b.numbps else mb)
              }
              incl.build(); zbt.build()
              blocks.foreach { b =>
                incl.encode(bw, b.gx, b.gy, 1)
                if (b.numbps > 0) {
                  var t = 1
                  while (!zbt.encode(bw, b.gx, b.gy, t)) t += 1
                  encodePassCount(bw, b.passes)
                  var lblock = 3
                  val len = b.bytes.length
                  val lg = log2floor(b.passes)
                  val need = if (len == 0) 1
                    else 32 - Integer.numberOfLeadingZeros(len)
                  val k = math.max(0, need - lg - lblock)
                  var j = 0
                  while (j < k) { bw.bit(1); j += 1 }
                  bw.bit(0)
                  lblock += k
                  bw.bits(len, lblock + lg)
                  bodies.write(b.bytes, 0, len)
                }
              }
            }
          }
        }
        (bw.alignAndBytes(), bodies.toByteArray)
      }
    }
    val tileBody = packets.map(pk => pk._1.length + pk._2.length).sum
    w16(0xff90); w16(10); w16(0) // SOT, Lsot, Isot
    w32(12 + 2 + tileBody) // Psot: SOT segment + SOD marker + packets
    out.write(0); out.write(1) // TPsot, TNsot
    w16(0xff93) // SOD
    packets.foreach { case (hdr, body) =>
      out.write(hdr, 0, hdr.length); out.write(body, 0, body.length)
    }
    w16(0xffd9) // EOC
    out.toByteArray
  }

  private def encodePassCount(bw: BitWriter, n: Int): Unit = {
    require(n >= 1 && n <= 164, s"pass count $n out of range")
    if (n == 1) bw.bit(0)
    else if (n == 2) { bw.bit(1); bw.bit(0) }
    else if (n <= 5) { bw.bit(1); bw.bit(1); bw.bits(n - 3, 2) }
    else if (n <= 36) { bw.bits(0xf, 4); bw.bits(n - 6, 5) }
    else { bw.bits(0x1ff, 9); bw.bits(n - 37, 7) }
  }
}
