package graft

import graft.sources.Szip
import org.scalatest.funsuite.AnyFunSuite

/** Szip (CCSDS 121.0 Rice) codec tests. The hand fixtures assemble the
  * bitstream from the standard's codeword definitions (FS = m zeros
  * then a one; split-k = FS of the high parts then the k low bits;
  * zero-run and no-compression option ids) so the decoder is checked
  * independently of the encoder; round-trips then sweep parameters. */
class SzipSpec extends AnyFunSuite {

  /** MSB-first bit assembler for hand fixtures. */
  private def bits(s: String): Array[Byte] = {
    val clean = s.filter(c => c == '0' || c == '1')
    val padded = clean.padTo((clean.length + 7) / 8 * 8, '0')
    padded.grouped(8).map(g => Integer.parseInt(g, 2).toByte).toArray
  }

  test("hand fixture: EC mode, FS option (id 1) codes samples directly") {
    // bpp 8 (3-bit ids), one block of 8: [3,0,1,2,0,0,1,0]
    val bs = bits("001" + "0001 1 01 001 1 1 01 1")
    val got = Szip.decompress(bs, Szip.Ec | Szip.Msb, 8, 8, 8, 8)
    assert(got.toSeq == Seq[Byte](3, 0, 1, 2, 0, 0, 1, 0))
  }

  test("hand fixture: EC mode, split k=2 (id 3): FS of high parts then " +
      "2-bit remainders") {
    // samples [5, 2, 9, 0] + 4 more zeros? block must be 8 → 8 samples
    val xs = Seq(5, 2, 9, 0, 7, 4, 1, 3)
    // high parts m>>2: [1,0,2,0,1,1,0,0]; low 2 bits: [01,10,01,00,11,00,01,11]
    val bs = bits("011" + "01 1 001 1 01 01 1 1" + "01 10 01 00 11 00 01 11")
    val got = Szip.decompress(bs, Szip.Ec | Szip.Msb, 8, 8, 8, 8)
    assert(got.toSeq == xs.map(_.toByte))
  }

  test("hand fixture: EC mode, no-compression option (id 7 for 8-bit)") {
    val xs = Seq(200, 0, 255, 17, 1, 2, 3, 128)
    val bs = bits("111" + xs.map(v =>
      String.format("%8s", Integer.toBinaryString(v)).replace(' ', '0'))
      .mkString)
    val got = Szip.decompress(bs, Szip.Ec | Szip.Msb, 8, 8, 8, 8)
    assert(got.map(_ & 0xff).toSeq == xs)
  }

  test("hand fixture: zero-block run (id 0 + 0) with count and ROS codes") {
    // 24 samples, 3 blocks of 8, all zero. Encoded as one ROS run:
    // id 000, ext bit 0, FS(4) = ROS (rest of segment = all 3 blocks)
    val bs = bits("000" + "0" + "00001")
    val got = Szip.decompress(bs, Szip.Ec | Szip.Msb, 8, 8, 24, 24)
    assert(got.forall(_ == 0))
    // two zero blocks via count code f=1 → run 2, then one FS block
    val bs2 = bits("000" + "0" + "01" + "001" + "01 1 1 1 1 1 1 1")
    val got2 = Szip.decompress(bs2, Szip.Ec | Szip.Msb, 8, 8, 24, 24)
    assert(got2.take(16).forall(_ == 0) && got2(16) == 1 &&
      got2.drop(17).forall(_ == 0), got2.toSeq.toString)
  }

  test("hand fixture: NN preprocessing — raw reference after the first " +
      "block's id, unit-delay mapped differences after") {
    // bpp 8, one block of 8, scanline 8. Samples [100,101,99,99,102,100,100,100]
    // ref = 100 raw; deltas d: [+1,-2,0,+3,-2,0,0] with θ clamps at
    // pred ∈ [99..102] all ≥ 3 → mapped m: [2,3,0,6,3,0,0]
    // FS option id 1: ref(01100100) FS: 001,0001,1,0000001,0001,1,1
    val bs = bits("001" + "01100100" + "001 0001 1 0000001 0001 1 1")
    val got = Szip.decompress(bs, Szip.Nn | Szip.Msb, 8, 8, 8, 8)
    assert(got.map(_ & 0xff).toSeq == Seq(100, 101, 99, 99, 102, 100, 100, 100))
  }

  test("hand fixture: second extension (id 0 + 1) pairs via the " +
      "triangular mapping") {
    // EC mode, one block of 8: mapped pairs (m1,m2): (1,0),(0,1),(0,0),(2,1)
    // γ = (m1+m2)(m1+m2+1)/2 + m2 → [1, 2, 0, 7]; FS: 01,001,1,00000001
    val bs = bits("000" + "1" + "01 001 1 00000001")
    val got = Szip.decompress(bs, Szip.Ec | Szip.Msb, 8, 8, 8, 8)
    assert(got.toSeq == Seq[Byte](1, 0, 0, 1, 0, 0, 2, 1))
  }

  test("round-trips: bpp/block/scanline sweep, NN and EC, MSB and LSB, " +
      "short tails") {
    val r = new scala.util.Random(7)
    for {
      bpp <- Seq(4, 8, 12, 16, 24, 32)
      ppb <- Seq(8, 16, 32)
      (nn, tag) <- Seq((Szip.Nn, "nn"), (Szip.Ec, "ec"))
      lsbOpt <- if (bpp > 8) Seq(0, Szip.Lsb) else Seq(0)
    } {
      val pps = ppb * 4
      val n = pps * 3 + ppb + 3 // short last scanline AND short last block
      val xmax = (1L << bpp) - 1
      val xs = Array.tabulate(n) { i =>
        // smooth with jumps — exercises small and large mapped values
        val base = (xmax / 2 + (xmax / 8) * math.sin(i / 5.0)).toLong
        if (i % 37 == 0) r.nextLong().abs % (xmax + 1) else base
      }
      val opts = nn | (if (bpp > 8 && lsbOpt != 0) Szip.Lsb else Szip.Msb)
      val bytesPer = if (bpp <= 8) 1 else if (bpp <= 16) 2 else 4
      val raw = new Array[Byte](n * bytesPer)
      for (i <- 0 until n; b <- 0 until bytesPer) {
        val shift = if ((opts & Szip.Lsb) != 0) 8 * b else 8 * (bytesPer - 1 - b)
        raw(i * bytesPer + b) = ((xs(i) >>> shift) & 0xff).toByte
      }
      val comp = Szip.compress(raw, opts, bpp, ppb, pps)
      val back = Szip.decompress(comp, opts, bpp, ppb, pps, n)
      assert(back.toSeq == raw.toSeq, s"bpp=$bpp ppb=$ppb $tag lsb=$lsbOpt")
    }
  }

  test("round-trips: all-zero, constant, and alternating extremes") {
    for ((mk, name) <- Seq(
        ((_: Int) => 0L, "zero"),
        ((_: Int) => 200L, "constant"),
        ((i: Int) => if (i % 2 == 0) 0L else 255L, "alternating"))) {
      val xs = Array.tabulate(100)(mk)
      val raw = xs.map(_.toByte)
      for (opts <- Seq(Szip.Nn | Szip.Msb, Szip.Ec | Szip.Msb)) {
        val comp = Szip.compress(raw, opts, 8, 8, 32)
        val back = Szip.decompress(comp, opts, 8, 8, 32, 100)
        assert(back.toSeq == raw.toSeq, s"$name opts=$opts")
      }
    }
  }

  test("zero-run compression actually compresses (ROS path emits, " +
      "decoder honors segment bounds)") {
    val raw = new Array[Byte](64 * 8 * 2) // 128 blocks = 2 full segments
    val comp = Szip.compress(raw, Szip.Ec | Szip.Msb, 8, 8, 64 * 8 * 2)
    assert(comp.length < 16, s"${comp.length} bytes for 1024 zero samples")
    val back = Szip.decompress(comp, Szip.Ec | Szip.Msb, 8, 8, 64 * 8 * 2,
      raw.length)
    assert(back.toSeq == raw.toSeq)
  }

  test("RAW option passes bytes through; refusals are loud") {
    val raw = Array.tabulate(16)(_.toByte)
    assert(Szip.decompress(raw, Szip.Raw | Szip.Msb, 8, 8, 16, 16).toSeq ==
      raw.toSeq)
    val e1 = intercept[IllegalArgumentException] {
      Szip.decompress(raw, Szip.Chip | Szip.Msb, 8, 8, 16, 16)
    }
    assert(e1.getMessage.contains("CHIP"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Szip.decompress(raw, Szip.Msb, 8, 13, 16, 16)
    }
    assert(e2.getMessage.contains("pixels-per-block"), e2.getMessage)
    // second extension on a reference block refuses by name
    val bs = bits("000" + "1")
    val e3 = intercept[IllegalArgumentException] {
      Szip.decompress(bs, Szip.Nn | Szip.Msb, 8, 8, 8, 8)
    }
    assert(e3.getMessage.contains("second-extension"), e3.getMessage)
    // truncated stream refuses
    val comp = Szip.compress(Array.tabulate(64)(i => (i * 7).toByte),
      Szip.Nn | Szip.Msb, 8, 8, 32)
    val e4 = intercept[IllegalArgumentException] {
      Szip.decompress(comp.take(2), Szip.Nn | Szip.Msb, 8, 8, 32, 64)
    }
    assert(e4.getMessage.contains("truncated"), e4.getMessage)
  }
}
