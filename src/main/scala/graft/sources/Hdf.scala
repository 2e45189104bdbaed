package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CLEAN-ROOM HDF4 (classic "Hierarchical Data Format") codec — the
  * acquisition format of the reference's MODIS path
  * (`ingest/modis/pymodis.py:159` downloads `.hdf` tiles;
  * `ingest/modis/convertmodis.py:273-317` walks their SDS subdatasets
  * and mosaics them), re-expressed without HDF4/GDAL: the byte layout
  * is implemented directly from the PUBLIC "HDF Specification and
  * Developer's Guide" (NCSA/The HDF Group), the same way [[NetCdf]]
  * implements the classic NetCDF spec and [[GeoTiff]] TIFF 6.0.
  *
  * Scope — the scientific-dataset (SDS) subset MODIS-class products
  * live in:
  *   - the magic number + the DD (data-descriptor) block chain
  *     (int16 count, uint32 next-block offset, 12-byte descriptors);
  *   - DFTAG_NDG numeric-data groups tying each dataset's records
  *     together; DFTAG_SDD dimension records (rank, dim sizes, number
  *     -type refs); DFTAG_NT number types (all 8 numeric DFNT codes,
  *     big-endian); DFTAG_SD raw data; DFTAG_SDL labels (the
  *     subdataset NAME the reference selects by,
  *     `convertmodis.py:287`); DFTAG_FV fill values; DFTAG_CAL
  *     calibration records (cal·(x − offset) available as metadata —
  *     the scan yields RAW values, matching GDAL's default the
  *     reference builds on);
  *   - SPECIAL (extended-tag) data elements with the COMP special
  *     code: coder NONE, RLE (HDF byte-run: literal runs ≤128,
  *     repeat runs 3..130) and DEFLATE (zlib), the codings MODIS-era
  *     SDS archives actually use.
  *
  * Refused LOUDLY (the codec-gate discipline — never guess at bytes):
  * chunked storage (SPECIAL_CHUNKED needs the Vdata chunk-table walk —
  * the documented boundary of this rung), linked-block / external
  * elements, N-bit / Skipping-Huffman / SZIP / JPEG coders, and CHAR
  * data on the numeric path. The DD WALK still inventories such files
  * (refusals live on the pixel path, not the metadata walk — r9
  * discipline).
  *
  * Everything here is bounded by the GRID, not the archive: decode
  * runs task-side over binaryFile splits ([[readGrid]]), the DSv2
  * planner ([[HdfGridSource]]) reads only a header prefix, and the
  * writer ([[encode]]) exists for the publish/fixture side of the i65
  * transport cycle. */
object Hdf {

  // -- tags (public assignments from the HDF spec's tag table) ----------
  val TagNull = 1
  val TagVersion = 30
  val TagCompressed = 40 // compressed payload bytes of a SPECIAL_COMP element
  val TagNT = 106 // number type
  val TagSDD = 701 // scientific data dimension record
  val TagSD = 702 // scientific data
  val TagSDL = 704 // labels (dataset label = subdataset name)
  val TagNDG = 720 // numeric data group
  val TagCAL = 731 // calibration
  val TagFV = 732 // fill value
  val ExtendedBit = 0x4000 // tag bit marking a SPECIAL data element

  // special-element codes (first int16 at an extended element's offset)
  val SpecialLinked = 1
  val SpecialExt = 2
  val SpecialComp = 3
  val SpecialVLinked = 4
  val SpecialChunked = 6

  // coder codes inside a SPECIAL_COMP header
  val CompNone = 0
  val CompRle = 1
  val CompNBit = 2
  val CompSkpHuff = 3
  val CompDeflate = 4

  // DFNT number types (numeric subset)
  val Float32 = 5
  val Float64 = 6
  val Int8 = 20
  val UInt8 = 21
  val Int16 = 22
  val UInt16 = 23
  val Int32 = 24
  val UInt32 = 25

  private val Magic = 0x0e031301

  final case class DD(tag: Int, ref: Int, off: Long, len: Long)

  /** One SDS: dims row-major (rank 2 = (y, x)); `fill`/`cal` straight
    * from the FV/CAL records; `dataDD` points at the (possibly
    * special) data element. */
  final case class Sds(ref: Int, name: String, dims: Seq[Int], ntype: Int,
      fill: Option[Double], calScale: Option[Double],
      calOffset: Option[Double], dataDD: Option[DD])

  final case class HdfFile(dds: Seq[DD], sds: Seq[Sds],
      bytes: Array[Byte], fullLen: Long) {
    def sdsNamed(name: String): Sds = sds.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"no SDS named '$name' — file has: ${sds.map(_.name).mkString(", ")}"))
  }

  private def widthOf(t: Int): Int = t match {
    case Int8 | UInt8 => 1
    case Int16 | UInt16 => 2
    case Int32 | UInt32 | Float32 => 4
    case Float64 => 8
    case other => throw new IllegalArgumentException(
      s"DFNT type $other unsupported on the numeric path " +
        "(CHAR/custom types refused — this reader never guesses)")
  }

  // -- decode -----------------------------------------------------------

  /** Full decode: DD walk + SDS assembly over the whole byte array. */
  def decode(bytes: Array[Byte]): HdfFile = decodeImpl(bytes, bytes.length)

  /** Metadata-only decode over a bounded header PREFIX (the DSv2
    * planner's path): succeeds iff the DD chain and every SDS
    * metadata record (NDG/SDD/SDL/NT) lies inside the prefix — data
    * offsets may point past it. Throws otherwise; callers fall back
    * to a full read (the [[NcGridSource]] planning pattern). */
  def decodeHeader(prefix: Array[Byte], fullLen: Long): HdfFile =
    decodeImpl(prefix, fullLen)

  private def decodeImpl(bytes: Array[Byte], fullLen: Long): HdfFile = {
    require(bytes.length >= 10, "truncated HDF4 file (no room for magic + DD block)")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    require(bb.getInt(0) == Magic,
      "not an HDF4 file (bad magic; HDF5 and NetCDF are different formats " +
        "with their own codecs)")

    // DD block chain
    val dds = Seq.newBuilder[DD]
    var blockOff = 4L
    var guard = 0
    while (blockOff != 0) {
      require(guard < 65536, "DD block chain does not terminate (corrupt)")
      guard += 1
      require(blockOff + 6 <= bytes.length,
        s"DD block at $blockOff overruns the header bytes")
      val ndd = bb.getShort(blockOff.toInt) & 0xffff
      val next = bb.getInt(blockOff.toInt + 2).toLong & 0xffffffffL
      require(blockOff + 6 + 12L * ndd <= bytes.length,
        s"DD block at $blockOff declares $ndd descriptors past the header bytes")
      var i = 0
      while (i < ndd) {
        val p = (blockOff + 6 + 12 * i).toInt
        val tag = bb.getShort(p) & 0xffff
        if (tag != TagNull) {
          val ref = bb.getShort(p + 2) & 0xffff
          val off = bb.getInt(p + 4).toLong & 0xffffffffL
          val len = bb.getInt(p + 8).toLong & 0xffffffffL
          require(off + len <= fullLen,
            s"DD tag=$tag ref=$ref: element [$off, ${off + len}) overruns " +
              s"the $fullLen-byte file")
          dds += DD(tag, ref, off, len)
        }
        i += 1
      }
      blockOff = next
    }
    val all = dds.result()
    def find(tag: Int, ref: Int): Option[DD] =
      all.find(d => (d.tag == tag || d.tag == (tag | ExtendedBit)) && d.ref == ref)
    def slice(d: DD): ByteBuffer = {
      require(d.off + d.len <= bytes.length,
        s"element tag=${d.tag} ref=${d.ref} lies past the decoded prefix")
      ByteBuffer.wrap(bytes, d.off.toInt, d.len.toInt)
        .slice().order(ByteOrder.BIG_ENDIAN)
    }

    def ntCode(ref: Int): Int = {
      val d = find(TagNT, ref).getOrElse(throw new IllegalArgumentException(
        s"SDD references missing number-type record ref=$ref"))
      val s = slice(d)
      require(d.len >= 4, "truncated DFTAG_NT record")
      s.get(1) & 0xff // bytes: version, type, bit width, class
    }

    // one dataset per NDG; members resolved through the group's
    // (tag, ref) pair list
    val sdsList = all.filter(_.tag == TagNDG).map { g =>
      val gb = slice(g)
      val members = (0 until (g.len / 4).toInt).map { i =>
        (gb.getShort(i * 4) & 0xffff, gb.getShort(i * 4 + 2) & 0xffff)
      }
      def member(tag: Int): Option[DD] =
        members.collectFirst { case (t, r) if (t & ~ExtendedBit) == tag =>
          find(t & ~ExtendedBit, r)
        }.flatten
      val sdd = member(TagSDD).getOrElse(throw new IllegalArgumentException(
        s"NDG ref=${g.ref} has no dimension record (DFTAG_SDD)"))
      val sb = slice(sdd)
      val rank = sb.getShort(0) & 0xffff
      require(sdd.len >= 2 + 4L * rank + 4,
        s"SDD ref=${sdd.ref}: rank $rank overruns the record")
      val dims = (0 until rank).map(i => sb.getInt(2 + 4 * i))
      require(dims.forall(d => d > 0 && d <= (1 << 28)),
        s"SDD ref=${sdd.ref}: implausible dims $dims")
      // data NT (tag, ref) pair follows the dims; per-dim scale NTs after
      val ntRef = sb.getShort(2 + 4 * rank + 2) & 0xffff
      val ntype = ntCode(ntRef)
      val name = member(TagSDL).map { l =>
        val lb = slice(l)
        val raw = new Array[Byte](l.len.toInt)
        lb.get(raw)
        val end = raw.indexOf(0.toByte)
        new String(raw, 0, if (end < 0) raw.length else end, "US-ASCII")
      }.getOrElse(s"sds_${g.ref}")
      // tolerant on the walk: a fill for a non-numeric type is not
      // representable here — the refusal belongs to the read path
      val fill = member(TagFV).flatMap { f =>
        try Some(readScalar(slice(f), 0, ntype))
        catch { case _: IllegalArgumentException => None }
      }
      val cal = member(TagCAL).map { c =>
        val cb = slice(c)
        require(c.len >= 36, s"truncated DFTAG_CAL record ref=${c.ref}")
        (cb.getDouble(0), cb.getDouble(16)) // cal (scale), offset
      }
      val data = member(TagSD)
      Sds(g.ref, name, dims, ntype, fill, cal.map(_._1), cal.map(_._2), data)
    }
    HdfFile(all, sdsList, bytes, fullLen)
  }

  private def readScalar(b: ByteBuffer, at: Int, t: Int): Double = t match {
    case Int8 => b.get(at).toDouble
    case UInt8 => (b.get(at) & 0xff).toDouble
    case Int16 => b.getShort(at).toDouble
    case UInt16 => (b.getShort(at) & 0xffff).toDouble
    case Int32 => b.getInt(at).toDouble
    case UInt32 => (b.getInt(at).toLong & 0xffffffffL).toDouble
    case Float32 => b.getFloat(at).toDouble
    case Float64 => b.getDouble(at)
    case other => throw new IllegalArgumentException(s"DFNT type $other unsupported")
  }

  /** Resolve an SDS's PAYLOAD bytes: plain elements slice directly;
    * SPECIAL_COMP elements decode their coder (NONE/RLE/DEFLATE);
    * every other special storage refuses with the exact reason. */
  private def payload(f: HdfFile, sds: Sds): Array[Byte] = {
    val d = sds.dataDD.getOrElse(throw new IllegalArgumentException(
      s"SDS '${sds.name}': no data element (DFTAG_SD)"))
    require(d.off + d.len <= f.bytes.length,
      s"SDS '${sds.name}': data element lies past the decoded bytes " +
        "(header-prefix decode cannot read pixels)")
    if ((d.tag & ExtendedBit) == 0) {
      java.util.Arrays.copyOfRange(f.bytes, d.off.toInt, (d.off + d.len).toInt)
    } else {
      val b = ByteBuffer.wrap(f.bytes, d.off.toInt, d.len.toInt)
        .slice().order(ByteOrder.BIG_ENDIAN)
      require(d.len >= 2, s"SDS '${sds.name}': truncated special header")
      val special = b.getShort(0) & 0xffff
      special match {
        case SpecialComp =>
          require(d.len >= 14, s"SDS '${sds.name}': truncated COMP header")
          // header: version, uncompressed length, payload ref, model, coder
          val uncompLen = b.getInt(4)
          val dataRef = b.getShort(8) & 0xffff
          val coder = b.getShort(12) & 0xffff
          // refuse unsupported coders BEFORE resolving the payload —
          // the refusal must name the real reason, not a side effect
          coder match {
            case CompNone | CompRle | CompDeflate => ()
            case CompNBit => throw new IllegalArgumentException(
              s"SDS '${sds.name}': N-bit coder unsupported — only " +
                "NONE/RLE/DEFLATE decode")
            case CompSkpHuff => throw new IllegalArgumentException(
              s"SDS '${sds.name}': skipping-Huffman coder unsupported — " +
                "only NONE/RLE/DEFLATE decode")
            case other => throw new IllegalArgumentException(
              s"SDS '${sds.name}': coder $other unsupported (SZIP/JPEG need " +
                "external codecs) — only NONE/RLE/DEFLATE decode")
          }
          val comp = f.dds.find(x => x.tag == TagCompressed && x.ref == dataRef)
            .getOrElse(throw new IllegalArgumentException(
              s"SDS '${sds.name}': COMP header references missing " +
                s"DFTAG_COMPRESSED ref=$dataRef"))
          require(comp.off + comp.len <= f.bytes.length,
            s"SDS '${sds.name}': compressed payload past the decoded bytes")
          val raw = java.util.Arrays.copyOfRange(
            f.bytes, comp.off.toInt, (comp.off + comp.len).toInt)
          coder match {
            case CompNone => raw
            case CompRle => rleDecode(raw, uncompLen)
            case CompDeflate => inflate(raw, uncompLen)
          }
        case SpecialChunked => throw new IllegalArgumentException(
          s"SDS '${sds.name}': CHUNKED storage unsupported — the chunk-table " +
            "Vdata walk is this codec's documented boundary; re-export " +
            "unchunked or compressed-contiguous")
        case SpecialLinked | SpecialVLinked => throw new IllegalArgumentException(
          s"SDS '${sds.name}': linked-block storage unsupported")
        case SpecialExt => throw new IllegalArgumentException(
          s"SDS '${sds.name}': external-file element unsupported (data lives " +
            "outside this file)")
        case other => throw new IllegalArgumentException(
          s"SDS '${sds.name}': unknown special storage code $other")
      }
    }
  }

  /** HDF byte-run RLE: control < 0x80 → (control+1) literal bytes
    * follow; control ≥ 0x80 → next byte repeats (control&0x7f)+3
    * times. */
  private[graft] def rleDecode(in: Array[Byte], outLen: Int): Array[Byte] = {
    val out = new Array[Byte](outLen)
    var i = 0
    var o = 0
    while (o < outLen) {
      require(i < in.length, s"RLE stream exhausted at $o/$outLen output bytes")
      val c = in(i) & 0xff
      i += 1
      if (c < 0x80) {
        val n = c + 1
        require(i + n <= in.length && o + n <= outLen,
          s"RLE literal run overruns (at $o/$outLen)")
        System.arraycopy(in, i, out, o, n)
        i += n; o += n
      } else {
        val n = (c & 0x7f) + 3
        require(i < in.length && o + n <= outLen,
          s"RLE repeat run overruns (at $o/$outLen)")
        java.util.Arrays.fill(out, o, o + n, in(i))
        i += 1; o += n
      }
    }
    out
  }

  private[graft] def rleEncode(in: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(in.length / 2 + 16)
    var i = 0
    while (i < in.length) {
      // measure the run at i
      var run = 1
      while (i + run < in.length && in(i + run) == in(i) && run < 130) run += 1
      if (run >= 3) {
        out.write(0x80 | (run - 3))
        out.write(in(i))
        i += run
      } else {
        // literal stretch: until the next >=3 run or 128 bytes
        var lit = 1
        var j = i + 1
        var done = false
        while (!done && j < in.length && lit < 128) {
          var r = 1
          while (j + r < in.length && in(j + r) == in(j) && r < 3) r += 1
          if (r >= 3) done = true else { lit += 1; j += 1 }
        }
        out.write(lit - 1)
        out.write(in, i, lit)
        i += lit
      }
    }
    out.toByteArray
  }

  private def inflate(in: Array[Byte], outLen: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(in)
    val out = new Array[Byte](outLen)
    var o = 0
    while (o < outLen && !inf.finished()) {
      val n = inf.inflate(out, o, outLen - o)
      // n == 0 with neither needsInput nor needsDictionary set never
      // progresses; a preset-dictionary stream must fail loudly
      require(n > 0 || !(inf.needsInput() || inf.needsDictionary()),
        s"deflate stream exhausted at $o/$outLen output bytes" +
          (if (inf.needsDictionary()) " (preset dictionary unsupported)"
           else ""))
      o += n
    }
    inf.end()
    require(o == outLen, s"deflate stream yielded $o of $outLen bytes")
    out
  }

  /** Raw SDS values, row-major, widened to double (no fill masking —
    * [[gridCells]] applies it; matches [[NetCdf]]'s split). */
  def read(f: HdfFile, name: String): Array[Double] = {
    val s = f.sdsNamed(name)
    val w = widthOf(s.ntype)
    val n = s.dims.map(_.toLong).product
    require(n <= Int.MaxValue / 8, s"SDS '$name' too large for one in-memory read")
    val p = payload(f, s)
    require(p.length >= n * w,
      s"SDS '$name': payload ${p.length} bytes < ${n * w} declared by dims")
    val b = ByteBuffer.wrap(p).order(ByteOrder.BIG_ENDIAN)
    Array.tabulate(n.toInt)(i => readScalar(b, i * w, s.ntype))
  }

  final case class GridCell(x: Int, y: Int, value: Double)

  /** Rank-2 (y, x) SDS as cells; fill values surface as NaN. */
  def gridCells(f: HdfFile, name: String): Iterator[GridCell] = {
    val s = f.sdsNamed(name)
    require(s.dims.size == 2,
      s"SDS '$name' has rank ${s.dims.size}; the grid path reads rank-2 " +
        "(y, x) datasets")
    val Seq(ny, nx) = s.dims
    val vs = read(f, name)
    val fill = s.fill
    Iterator.range(0, ny * nx).map { i =>
      val v = vs(i)
      GridCell(i % nx, i / nx,
        if (fill.exists(_ == v)) Double.NaN else v)
    }
  }

  // -- encode -----------------------------------------------------------

  /** One SDS to write: `values` row-major doubles narrowed to
    * `ntype`; `comp` ∈ none | rle | deflate. */
  final case class SdsSpec(name: String, dims: Seq[Int], ntype: Int,
      values: Array[Double], fill: Option[Double] = None,
      calScale: Option[Double] = None, calOffset: Option[Double] = None,
      comp: String = "none")

  /** Write a single-DD-block HDF4 file holding `specs` as NDG
    * datasets — the publish/fixture twin of [[decode]] (what lands
    * the i65 mosaic cycle inside the hash gate). */
  def encode(specs: Seq[SdsSpec]): Array[Byte] = {
    require(specs.nonEmpty, "nothing to encode")
    final case class El(tag: Int, ref: Int, bytes: Array[Byte])
    val els = Seq.newBuilder[El]
    var nextRef = 1
    def ref(): Int = { val r = nextRef; nextRef += 1; r }

    specs.foreach { s =>
      val n = s.dims.map(_.toLong).product
      require(s.values.length == n,
        s"SDS '${s.name}': ${s.values.length} values for dims ${s.dims}")
      val w = widthOf(s.ntype)
      val r = ref()

      def putVal(b: ByteBuffer, v: Double): Unit = s.ntype match {
        case Int8 => b.put(v.toByte)
        case UInt8 => b.put((v.toLong & 0xff).toByte)
        case Int16 => b.putShort(v.toShort)
        case UInt16 => b.putShort((v.toLong & 0xffff).toShort)
        case Int32 => b.putInt(v.toInt)
        case UInt32 => b.putInt((v.toLong & 0xffffffffL).toInt)
        case Float32 => b.putFloat(v.toFloat)
        case Float64 => b.putDouble(v)
      }

      // NT record: version 1, type, bit width, class 0
      els += El(TagNT, r, Array(1, s.ntype, w * 8, 0).map(_.toByte))
      // SDD: rank, dims, data NT pair, per-dim scale NT pairs (same NT)
      val rank = s.dims.size
      val sdd = ByteBuffer.allocate(2 + 4 * rank + 4 + 4 * rank)
        .order(ByteOrder.BIG_ENDIAN)
      sdd.putShort(rank.toShort)
      s.dims.foreach(sdd.putInt)
      (0 to rank).foreach { _ =>
        sdd.putShort(TagNT.toShort); sdd.putShort(r.toShort)
      }
      els += El(TagSDD, r, sdd.array())
      // SDL: dataset label (the subdataset name), null-terminated
      els += El(TagSDL, r, s.name.getBytes("US-ASCII") :+ 0.toByte)
      s.fill.foreach { fv =>
        val b = ByteBuffer.allocate(w).order(ByteOrder.BIG_ENDIAN)
        putVal(b, fv)
        els += El(TagFV, r, b.array())
      }
      if (s.calScale.isDefined || s.calOffset.isDefined) {
        val b = ByteBuffer.allocate(36).order(ByteOrder.BIG_ENDIAN)
        b.putDouble(s.calScale.getOrElse(1.0)).putDouble(0.0)
        b.putDouble(s.calOffset.getOrElse(0.0)).putDouble(0.0)
        b.putInt(Float64)
        els += El(TagCAL, r, b.array())
      }
      // data payload
      val raw = ByteBuffer.allocate((n * w).toInt).order(ByteOrder.BIG_ENDIAN)
      s.values.foreach(putVal(raw, _))
      val dataMembers: Seq[(Int, Int)] = s.comp match {
        case "none" =>
          els += El(TagSD, r, raw.array())
          Seq((TagSD, r))
        case "rle" | "deflate" =>
          val packed =
            if (s.comp == "rle") rleEncode(raw.array())
            else Deflate(raw.array())
          val compRef = ref()
          els += El(TagCompressed, compRef, packed)
          val hdr = ByteBuffer.allocate(16).order(ByteOrder.BIG_ENDIAN)
          hdr.putShort(SpecialComp.toShort)
          hdr.putShort(0) // header version
          hdr.putInt(raw.array().length) // uncompressed length
          hdr.putShort(compRef.toShort) // DFTAG_COMPRESSED payload ref
          hdr.putShort(0) // model: stdio
          hdr.putShort((if (s.comp == "rle") CompRle else CompDeflate).toShort)
          hdr.putShort(0) // coder info (deflate level slot)
          els += El(TagSD | ExtendedBit, r, hdr.array())
          Seq((TagSD | ExtendedBit, r))
        case other => throw new IllegalArgumentException(
          s"SDS '${s.name}': unknown comp '$other' (none|rle|deflate)")
      }
      // NDG group: (tag, ref) pairs of every member record
      val memberPairs = Seq((TagNT, r), (TagSDD, r), (TagSDL, r)) ++
        s.fill.map(_ => (TagFV, r)).toSeq ++
        (if (s.calScale.isDefined || s.calOffset.isDefined) Seq((TagCAL, r))
         else Nil) ++ dataMembers
      val g = ByteBuffer.allocate(memberPairs.size * 4).order(ByteOrder.BIG_ENDIAN)
      memberPairs.foreach { case (t, rr) =>
        g.putShort(t.toShort); g.putShort(rr.toShort)
      }
      els += El(TagNDG, r, g.array())
    }

    val elements = els.result()
    val headerLen = 4 + 6 + 12 * elements.size
    var off = headerLen
    val offsets = elements.map { e => val o = off; off += e.bytes.length; o }
    val total = off
    require(total <= Int.MaxValue, "encoded HDF too large for this in-memory writer")
    val out = ByteBuffer.allocate(total).order(ByteOrder.BIG_ENDIAN)
    out.putInt(Magic)
    out.putShort(elements.size.toShort)
    out.putInt(0) // single DD block
    elements.zip(offsets).foreach { case (e, o) =>
      out.putShort(e.tag.toShort).putShort(e.ref.toShort)
      out.putInt(o).putInt(e.bytes.length)
    }
    elements.foreach(e => out.put(e.bytes))
    out.array()
  }

  // -- distributed read -------------------------------------------------

  /** Distributed HDF→rows decode over a binaryFile glob (the
    * [[NetCdf.readGrid]] twin): one task per tile file, one row per
    * non-fill grid cell of the named SDS —
    * `(path, sds, x, y, value)`. */
  def readGrid(spark: SparkSession, pathOrGlob: String, sdsName: String)
      : DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathOrGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (p, bytes) =>
        gridCells(decode(bytes), sdsName)
          .filterNot(_.value.isNaN)
          .map(c => (p, sdsName, c.x, c.y, c.value))
      })
      .toDF("path", "sds", "x", "y", "value")
  }
}
