package graft.sources

/** Clean-room skipping-Huffman codec — HDF4 coder 3, the legacy MODIS
  * compression the reference's `modis/pymodis.py` path can encounter
  * and the last named decode refusal on a reference-derived format
  * (r14 verdict item 5).
  *
  * The coding kernel is splay-tree prefix coding per the PUBLISHED
  * algorithm in D.W. Jones, "Application of Splay Trees to Data
  * Compression", CACM 31(8) 1988 — the algorithm the NCSA library's
  * skipping-Huffman coder adapts — plus the "skipping" interleave the
  * HDF4 documentation names: a `skpSize`-byte element spreads its
  * bytes over `skpSize` INDEPENDENT splay trees (byte j of every
  * element codes through tree j mod skpSize), so multi-byte integer
  * data gets one adaptive model per byte position (high bytes and low
  * bytes of 16-bit counts have very different distributions). All
  * trees share ONE bitstream, interleaved in data order.
  *
  * Conventions, stated explicitly (this environment has no HDF4 C
  * library or ground-truth archive to diff against — the sanctioned
  * posture the GRIB1 spectral writer and the N-bit coder's bit order
  * already ride):
  *   - 256-symbol alphabet, no in-band EOF: the COMP header already
  *     declares the uncompressed length, decode stops there;
  *   - initial tree: the paper's complete balanced binary tree —
  *     root 1, internal nodes 1..255, leaf for byte v at v+256,
  *     up(i) = i/2 — so the FIRST code of every tree is the byte's
  *     own 8 bits (the leaf index 256+v spelled below its leading 1);
  *   - code bits: 1 = right child on the root→leaf walk, packed
  *     MSB-first into bytes, final byte zero-padded — the same bit-IO
  *     convention the N-bit coder uses (HDF4's shared Hbitio layer);
  *   - SEMI-SPLAY (the paper's pairwise rotation) after EVERY symbol
  *     on both sides, which keeps encoder and decoder trees in
  *     lockstep without transmitting the model.
  * Round-trip, adaptation and corruption behavior are pinned by the
  * suite; a cross-implementation diff awaits ground-truth tooling
  * (the carried ADVICE item on reference-encoder fixtures).
  */
private[graft] object SkpHuff {
  private val MaxChar = 255
  private val Succ = MaxChar + 1      // 256: leaf index base
  private val Twice = 2 * MaxChar + 1 // 511: highest node index
  private val Root = 1

  /** One adaptive splay tree over the byte alphabet,
    * balanced-initialized exactly as the paper's INITIALIZE. */
  private final class Tree {
    val up = new Array[Int](Twice + 1)
    val left = new Array[Int](Succ)
    val right = new Array[Int](Succ)
    locally {
      var i = 2
      while (i <= Twice) { up(i) = i >> 1; i += 1 }
      var j = Root
      while (j <= MaxChar) { left(j) = 2 * j; right(j) = 2 * j + 1; j += 1 }
    }

    /** The paper's SPLAY: walk the coded leaf's path to the root,
      * semi-rotating parent/grandparent pairs — ~halves the depth of
      * a hot symbol per use, and is deterministic, so both sides
      * stay in lockstep. */
    def splay(plain: Int): Unit = {
      var a = plain + Succ
      while (a != Root) {
        val c = up(a)
        if (c != Root) {
          val d = up(c)
          // exchange a with its parent's sibling under the grandparent
          var b = left(d)
          if (c == b) { b = right(d); right(d) = a }
          else left(d) = a
          if (a == left(c)) left(c) = b else right(c) = b
          up(a) = d
          up(b) = c
          a = d
        } else a = c // odd node at the path's end: just step up
      }
    }
  }

  /** Compress `data` with `skpSize` interleaved trees. The writer
    * twin for fixtures and publish — `skpSize` is the element width
    * in the HDF4 library's own usage (SDsetcompress passes the NT
    * size). */
  def encode(data: Array[Byte], skpSize: Int): Array[Byte] = {
    require(skpSize >= 1, s"bad skipping-Huffman skip size $skpSize")
    val trees = Array.fill(math.min(skpSize, math.max(1, data.length)))(new Tree)
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 16)
    // root→leaf bits come out of the leaf-up walk reversed; the tree
    // holds ≤256 leaves so no path outruns the node count
    val stack = new Array[Boolean](Twice + 1)
    var acc = 0
    var nacc = 0
    var i = 0
    while (i < data.length) {
      val t = trees(i % trees.length)
      val sym = data(i) & 0xff
      var sp = 0
      var a = sym + Succ
      while (a != Root) {
        stack(sp) = t.right(t.up(a)) == a
        sp += 1
        a = t.up(a)
      }
      while (sp > 0) {
        sp -= 1
        acc = (acc << 1) | (if (stack(sp)) 1 else 0)
        nacc += 1
        if (nacc == 8) { out.write(acc); acc = 0; nacc = 0 }
      }
      t.splay(sym)
      i += 1
    }
    if (nacc > 0) out.write(acc << (8 - nacc)) // MSB-first zero pad
    out.toByteArray
  }

  /** Decompress exactly `outLen` bytes; refuses BY NAME when the
    * bitstream exhausts early (a truncated payload must never decode
    * silently short). `owner` names refusals. */
  def decode(owner: String, raw: Array[Byte], outLen: Int,
      skpSize: Int): Array[Byte] = {
    require(skpSize >= 1,
      s"SDS '$owner': bad skipping-Huffman skip size $skpSize")
    val trees = Array.fill(math.min(skpSize, math.max(1, outLen)))(new Tree)
    val out = new Array[Byte](outLen)
    val totalBits = raw.length.toLong * 8
    var bitPos = 0L
    var i = 0
    while (i < outLen) {
      val t = trees(i % trees.length)
      var a = Root
      while (a <= MaxChar) {
        require(bitPos < totalBits,
          s"SDS '$owner': skipping-Huffman stream exhausted at output " +
            s"byte $i of $outLen — payload truncated or corrupt")
        val bit = (raw((bitPos >> 3).toInt) >> (7 - (bitPos & 7).toInt)) & 1
        bitPos += 1
        a = if (bit == 1) t.right(a) else t.left(a)
      }
      val sym = a - Succ
      out(i) = sym.toByte
      t.splay(sym)
      i += 1
    }
    out
  }
}
