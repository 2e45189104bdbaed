package graft

import graft.sources.Jpeg2k
import org.scalatest.funsuite.AnyFunSuite

/** Clean-room JPEG 2000 codec tests. The round-trips exercise the MQ
  * coder, tag trees, packet headers, EBCOT passes and the 5/3 DWT
  * together; the hand-built constant-image fixture pins the
  * marker-segment layout and empty-packet shape INDEPENDENTLY of the
  * encoder (every coefficient of a DC-shifted constant image is zero,
  * so no arithmetic-coded bytes exist to hand-compute). */
class Jpeg2kSpec extends AnyFunSuite {

  private def rng(seed: Long) = new scala.util.Random(seed)

  test("5/3 DWT round-trips exactly on random arrays, odd and even dims") {
    for ((w, h, lv) <- Seq((1, 1, 0), (5, 1, 2), (1, 7, 2), (8, 8, 1),
        (17, 9, 3), (64, 64, 5), (130, 67, 5), (3, 3, 2))) {
      val r = rng(w * 1000 + h * 10 + lv)
      val a = Array.fill(w * h)(r.nextInt(65536) - 32768)
      val c = a.clone()
      Jpeg2k.fdwt53(c, w, h, lv)
      Jpeg2k.idwt53(c, w, h, lv)
      assert(c.toSeq == a.toSeq, s"${w}x$h lv$lv")
    }
  }

  test("5/3 DWT of a constant image is zero outside the LL corner") {
    val (w, h, lv) = (13, 9, 3)
    val c = Array.fill(w * h)(42)
    Jpeg2k.fdwt53(c, w, h, lv)
    val lw = (w + (1 << lv) - 1) >> lv
    val lh = (h + (1 << lv) - 1) >> lv
    for (y <- 0 until h; x <- 0 until w) {
      if (x < lw && y < lh) assert(c(y * w + x) == 42, s"LL ($x,$y)")
      else assert(c(y * w + x) == 0, s"non-LL ($x,$y) = ${c(y * w + x)}")
    }
  }

  test("codestream round-trips: sizes, depths, levels, data shapes") {
    val cases = Seq(
      (1, 1, 8, 0), (7, 1, 8, 2), (1, 9, 8, 2), (16, 16, 8, 1),
      (65, 33, 12, 3), (64, 64, 16, 5), (200, 1, 10, 5), (1, 300, 10, 5),
      (129, 65, 20, 4), (100, 100, 25, 5), (300, 7, 6, 5))
    for ((w, h, depth, lv) <- cases) {
      val r = rng(w * 100000L + h * 100 + depth)
      val xs = Array.fill(w * h)((r.nextLong() & Long.MaxValue) % (1L << depth))
      val enc = Jpeg2k.encode(w, h, depth, xs, lv)
      val dec = Jpeg2k.decode(enc)
      assert(dec.width == w && dec.height == h && dec.depth == depth)
      assert(dec.samples.toSeq == xs.toSeq, s"${w}x$h d$depth lv$lv")
    }
  }

  test("codestream round-trips: structured (smooth + spikes) data") {
    // smooth fields exercise long zero runs (RL mode) and refinement;
    // spikes exercise sign coding around significant neighbors
    val (w, h, depth) = (96, 48, 14)
    val xs = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      val base = 4000.0 + 1500.0 * math.sin(x / 7.0) * math.cos(y / 5.0)
      val spike = if ((x * 31 + y * 17) % 97 == 0) 9000 else 0
      math.max(0, math.min((1 << depth) - 1, base.toInt + spike)).toLong
    }
    for (lv <- Seq(0, 1, 5)) {
      val dec = Jpeg2k.decode(Jpeg2k.encode(w, h, depth, xs, lv))
      assert(dec.samples.toSeq == xs.toSeq, s"lv$lv")
    }
    // the same image encoded at different levels decodes identically —
    // the levels only move bits between subbands
    val a = Jpeg2k.decode(Jpeg2k.encode(w, h, depth, xs, 2)).samples
    val b = Jpeg2k.decode(Jpeg2k.encode(w, h, depth, xs, 4)).samples
    assert(a.toSeq == b.toSeq)
  }

  test("all-zero and all-max images round-trip (degenerate planes)") {
    val (w, h, depth) = (40, 20, 9)
    for (v <- Seq(0L, (1L << depth) - 1, 1L << (depth - 1))) {
      val xs = Array.fill(w * h)(v)
      val dec = Jpeg2k.decode(Jpeg2k.encode(w, h, depth, xs, 5))
      assert(dec.samples.toSeq == xs.toSeq, s"constant $v")
    }
  }

  test("wide 1-row image crossing the 2^15 precinct boundary (NCEP shape)") {
    val w = 40000; val depth = 12
    val r = rng(40000)
    // smooth-ish so the test stays fast but every precinct holds data
    val xs = Array.tabulate(w)(i =>
      (2000 + 900 * math.sin(i / 11.0)).toLong + (r.nextInt(7) - 3))
    val enc = Jpeg2k.encode(w, 1, depth, xs, 5)
    val dec = Jpeg2k.decode(enc)
    assert(dec.width == w && dec.height == 1)
    assert(dec.samples.toSeq == xs.toSeq)
  }

  /** Hand-built codestream for a constant 2^(depth-1) image: the DC
    * shift zeroes every sample, the 5/3 of zero is zero, so every
    * code-block is never included and each packet is the single
    * 0-bit = one 0x00 byte. Assembled field-by-field from the spec's
    * marker tables (A.5-A.7), never from the encoder. */
  private def handConstant(w: Int, h: Int, depth: Int,
      nl: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def b16(v: Int): Unit = { out.write(v >> 8); out.write(v & 0xff) }
    def b32(v: Int): Unit = { b16(v >> 16); b16(v & 0xffff) }
    b16(0xff4f)                      // SOC
    b16(0xff51); b16(41); b16(0)     // SIZ, Lsiz, Rsiz
    b32(w); b32(h); b32(0); b32(0)   // Xsiz Ysiz XOsiz YOsiz
    b32(w); b32(h); b32(0); b32(0)   // XTsiz YTsiz XTOsiz YTOsiz
    b16(1)                           // Csiz
    out.write(depth - 1); out.write(1); out.write(1)
    b16(0xff52); b16(12)             // COD
    out.write(0); out.write(0)       // Scod, LRCP
    b16(1); out.write(0)             // 1 layer, no MCT
    out.write(nl); out.write(4); out.write(4) // levels, 64x64 cb
    out.write(0); out.write(1)       // style, 5/3
    b16(0xff5c); b16(3 + 3 * nl + 1) // QCD
    out.write(2 << 5)                // 2 guard bits, no quantization
    (0 until 3 * nl + 1).foreach(_ => out.write(depth << 3))
    val nPackets = nl + 1            // small image: one precinct each
    b16(0xff90); b16(10); b16(0)     // SOT, Lsot, Isot
    b32(12 + 2 + nPackets)           // Psot
    out.write(0); out.write(1)       // TPsot, TNsot
    b16(0xff93)                      // SOD
    (0 until nPackets).foreach(_ => out.write(0)) // empty packets
    b16(0xffd9)                      // EOC
    out.toByteArray
  }

  test("hand-built constant-image codestream decodes (independent of " +
      "the encoder); the encoder reproduces the same packet shape") {
    val (w, h, depth, nl) = (20, 12, 10, 3)
    val hand = handConstant(w, h, depth, nl)
    val dec = Jpeg2k.decode(hand)
    assert(dec.width == w && dec.height == h && dec.depth == depth)
    assert(dec.samples.forall(_ == (1L << (depth - 1))),
      dec.samples.take(8).toSeq.toString)
    // encoder's own constant image: same all-empty-packet tile body
    val enc = Jpeg2k.encode(w, h, depth,
      Array.fill(w * h)(1L << (depth - 1)), nl)
    val handTile = hand.slice(hand.length - 2 - (nl + 1), hand.length - 2)
    val encTile = enc.slice(enc.length - 2 - (nl + 1), enc.length - 2)
    assert(handTile.toSeq == Seq.fill(nl + 1)(0x00.toByte))
    assert(encTile.toSeq == handTile.toSeq)
  }

  test("refusals are loud and named") {
    val good = Jpeg2k.encode(8, 8, 8, Array.tabulate(64)(_.toLong % 256), 2)
    def patched(f: Array[Byte] => Unit): Array[Byte] = {
      val b = good.clone(); f(b); b
    }
    // not a codestream
    val e1 = intercept[IllegalArgumentException] {
      Jpeg2k.decode("JUNKJUNKJUNK".getBytes("US-ASCII"))
    }
    assert(e1.getMessage.contains("SOC"), e1.getMessage)
    // locate markers rather than hardcoding offsets
    def markerAt(m: Int): Int = {
      var p = 2
      while (!((good(p) & 0xff) == 0xff && (good(p + 1) & 0xff) == (m & 0xff)))
        p += 2 + (((good(p + 2) & 0xff) << 8) | (good(p + 3) & 0xff))
      p
    }
    val cod = markerAt(0x52); val siz = markerAt(0x51)
    // 9/7 irreversible transform: COD transform byte at cod+13
    assert((good(cod + 13) & 0xff) == 1, "fixture drift: transform byte")
    val e2 = intercept[IllegalArgumentException] {
      Jpeg2k.decode(patched(_(cod + 13) = 0))
    }
    assert(e2.getMessage.contains("9/7"), e2.getMessage)
    // code-block style options
    val e3 = intercept[IllegalArgumentException] {
      Jpeg2k.decode(patched(_(cod + 12) = 1))
    }
    assert(e3.getMessage.contains("code-block style"), e3.getMessage)
    // multi-component SIZ: Csiz low byte at siz+39
    assert((good(siz + 39) & 0xff) == 1, "fixture drift: Csiz")
    val e4 = intercept[IllegalArgumentException] {
      Jpeg2k.decode(patched(_(siz + 39) = 3))
    }
    assert(e4.getMessage.contains("components"), e4.getMessage)
    // truncation mid-tile
    val e5 = intercept[IllegalArgumentException] {
      Jpeg2k.decode(good.take(good.length / 2))
    }
    assert(e5.getMessage.nonEmpty)
  }

  test("progression orders: single-layer RLCP/RPCL/PCRL/CPRL decode a " +
      "re-tagged LRCP stream identically; multi-precinct PCRL refuses") {
    // with ONE layer, LRCP (l,r,p), RLCP (r,l,p) and RPCL (r,p,l) all
    // reduce to (r,p) — so patching the COD progression byte onto an
    // LRCP-written stream must decode byte-identically through each
    // branch (this exercises the branch wiring; multi-layer orders
    // have no writer here and stay covered by the spec's math)
    val xs = Array.tabulate(48 * 24)(i => (i * 13 % 4096).toLong)
    val enc = Jpeg2k.encode(48, 24, 12, xs, 3)
    var cod = 2
    while (!((enc(cod) & 0xff) == 0xff && (enc(cod + 1) & 0xff) == 0x52))
      cod += 2 + (((enc(cod + 2) & 0xff) << 8) | (enc(cod + 3) & 0xff))
    for (prog <- 1 to 4) {
      val p = enc.clone(); p(cod + 5) = prog.toByte
      assert(Jpeg2k.decode(p).samples.toSeq == xs.toSeq, s"progression $prog")
    }
    // the wide multi-precinct shape refuses PCRL/CPRL by name
    val wide = Jpeg2k.encode(40000, 1, 8,
      Array.tabulate(40000)(i => (i % 251).toLong), 2)
    var cod2 = 2
    while (!((wide(cod2) & 0xff) == 0xff && (wide(cod2 + 1) & 0xff) == 0x52))
      cod2 += 2 + (((wide(cod2 + 2) & 0xff) << 8) | (wide(cod2 + 3) & 0xff))
    val pw = wide.clone(); pw(cod2 + 5) = 3
    val e = intercept[IllegalArgumentException] { Jpeg2k.decode(pw) }
    assert(e.getMessage.contains("PCRL"), e.getMessage)
    // ...while RPCL on the same multi-precinct stream still decodes
    val pr = wide.clone(); pr(cod2 + 5) = 2
    assert(Jpeg2k.decode(pr).samples.length == 40000)
  }

  test("every byte of the codestream matters: truncations never decode " +
      "to silently wrong sizes") {
    val xs = Array.tabulate(32 * 16)(i => (i * 37 % 1024).toLong)
    val enc = Jpeg2k.encode(32, 16, 10, xs, 3)
    val dec = Jpeg2k.decode(enc)
    assert(dec.samples.toSeq == xs.toSeq)
    for (cut <- Seq(enc.length - 1, enc.length - 2, enc.length / 3)) {
      val r = try {
        val d = Jpeg2k.decode(enc.take(cut))
        Some(d)
      } catch { case _: Exception => None }
      // either refuses, or (truncation inside MQ tails) still yields a
      // full-size grid — never a short array
      r.foreach(d => assert(d.samples.length == xs.length))
    }
  }
}
