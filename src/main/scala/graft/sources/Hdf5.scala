package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CLEAN-ROOM HDF5 reader — the CONTIGUOUS-UNCOMPRESSED subset that
  * closes the NetCDF-4 boundary the [[NetCdf]] codec refuses loudly
  * (a NetCDF-4 file IS an HDF5 file; the reference's xarray stack
  * falls back to the h5netcdf/HDF5 engine for them). Implemented
  * directly from the public "HDF5 File Format Specification
  * Version 3.0" (The HDF Group) — no libhdf5, no JNI:
  *
  *   - superblock versions 0/1 (symbol-table root group) AND 2/3
  *     (root object header address), found at offset 0 or any
  *     power-of-two user-block offset per the spec;
  *   - object headers VERSION 1 (8-byte-aligned messages, count-driven,
  *     plain continuation blocks) and VERSION 2 (`OHDR` signature,
  *     flag-dependent prefix fields, `OCHK` continuation blocks);
  *   - v1 group traversal: `TREE` B-tree (node type 0) → `SNOD`
  *     symbol nodes → local `HEAP` link names; v2 group traversal:
  *     compact Link messages (hard links);
  *   - messages: Dataspace (v1/v2), Datatype (fixed-point + IEEE
  *     float, either endianness; strings for attributes), Fill Value
  *     (v1/v2/v3), Data Layout v3 COMPACT and CONTIGUOUS, Attribute
  *     (v1/v2/v3 — the netCDF `_FillValue`/`scale_factor`/
  *     `add_offset`/`units` carriers), Link, Link Info, Symbol Table,
  *     Continuation, NIL;
  *   - data read: contiguous (positioned slice) or compact (inline),
  *     widened to double; [[gridCells]] applies netCDF CF semantics —
  *     `_FillValue` (attribute, else the HDF5 fill-value message)
  *     masks to NaN, `scale_factor`/`add_offset` apply — matching the
  *     [[NetCdf]] grid path bit for bit.
  *
  * Refused LOUDLY (codec-gate discipline — this reader never guesses):
  * CHUNKED layout (the netCDF-4 compressed-variable default — such
  * archives need the chunk B-tree + filter pipeline; re-export
  * uncompressed/contiguous or go through the NetCDF-3 path), dense
  * (fractal-heap) link storage, soft/external links, layout message
  * versions before 3, non-IEEE float layouts, shared messages, and
  * metadata offset/length sizes other than 8.
  *
  * Scale shape: [[scan]] and [[readGrid]] run task-side over
  * binaryFile — one task per file, the driver never touches payload
  * bytes (the [[Hdf]]/[[NetCdf]]/[[GeoTiff]] discipline). */
object Hdf5 {

  private val Signature = Array[Byte](0x89.toByte, 'H', 'D', 'F',
    '\r', '\n', 0x1a, '\n')
  private val Undef = -1L // 0xFFFFFFFFFFFFFFFF: the spec's undefined address

  final case class Dtype(clazz: Int, size: Int, littleEndian: Boolean,
      signed: Boolean) {
    def name: String = clazz match {
      case 0 => s"${if (signed) "int" else "uint"}${size * 8}"
      case 1 => s"float${size * 8}"
      case 3 => s"string$size"
      case c => s"class$c-$size"
    }
  }

  /** One HDF5 dataset: absolute `path` ("/group/var"), row-major
    * `dims`, contiguous data at `dataOff` (or `compact` payload),
    * `fillMsg` from the fill-value header message, and the object's
    * scalar attributes (Double or String values). */
  final case class Dataset(path: String, dims: Seq[Long], dtype: Dtype,
      dataOff: Long, dataLen: Long, compact: Option[Array[Byte]],
      fillMsg: Option[Double], attrs: Map[String, Any]) {
    def n: Long = if (dims.isEmpty) 1L else dims.product
    def numAttr(name: String): Option[Double] = attrs.get(name).collect {
      case d: Double => d
    }
    /** netCDF convention: the `_FillValue` attribute wins; the HDF5
      * fill-value message is the fallback. */
    def fill: Option[Double] = numAttr("_FillValue").orElse(fillMsg)
  }

  final case class Hdf5File(superVersion: Int, datasets: Seq[Dataset],
      groups: Seq[String]) {
    def datasetAt(path: String): Dataset =
      datasets.find(_.path == path).getOrElse(
        throw new IllegalArgumentException(s"no dataset '$path' — file has: " +
          datasets.map(_.path).mkString(", ")))
  }

  // ---- low-level helpers ------------------------------------------------

  private final class Reader(val bytes: Array[Byte]) {
    val bb: ByteBuffer = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def u8(o: Long): Int = bytes(o.toInt) & 0xff
    def u16(o: Long): Int = bb.getShort(o.toInt) & 0xffff
    def u32(o: Long): Long = bb.getInt(o.toInt).toLong & 0xffffffffL
    def i64(o: Long): Long = bb.getLong(o.toInt)
    def ascii(o: Long, n: Int): String = new String(bytes, o.toInt, n, "US-ASCII")
    def cstr(o: Long): String = {
      var e = o.toInt
      while (e < bytes.length && bytes(e) != 0) e += 1
      new String(bytes, o.toInt, e - o.toInt, "US-ASCII")
    }
    def sig4(o: Long): String = ascii(o, 4)
    def in(o: Long, need: Long): Unit =
      require(o >= 0 && o + need <= bytes.length,
        s"HDF5 structure at $o (+$need) overruns the ${bytes.length}-byte file")
  }

  private final case class Msg(typ: Int, bodyOff: Long, size: Int)

  // ---- decode -----------------------------------------------------------

  /** Parse the file's full metadata tree (superblock → groups →
    * datasets + attributes). Data payloads are located, not copied. */
  def decode(bytes: Array[Byte]): Hdf5File = {
    // the superblock sits at offset 0 or a power-of-two user-block
    // boundary (spec §II); scan the doublings
    var base = 0L
    var found = false
    while (!found) {
      if (base + 8 > bytes.length)
        throw new IllegalArgumentException(
          "not an HDF5 file (no superblock signature at any power-of-two offset)")
      if ((0 until 8).forall(i => bytes((base + i).toInt) == Signature(i)))
        found = true
      else base = if (base == 0) 512 else base * 2
    }
    if (base > 0) {
      // spec §II: every stored file address is RELATIVE to the base
      // address (the superblock offset). Decode the tail as a base-0
      // file, then shift the escaping data offsets back so they index
      // the caller's original array (only dataOff leaves this walk;
      // compact payloads are copied).
      val tail = java.util.Arrays.copyOfRange(bytes, base.toInt, bytes.length)
      val f = decode(tail)
      return f.copy(datasets = f.datasets.map(d =>
        if (d.dataOff == Undef) d else d.copy(dataOff = d.dataOff + base)))
    }
    val r = new Reader(bytes)
    val sv = r.u8(base + 8)
    require(sv <= 3, s"superblock version $sv unsupported (0-3)")

    val rootAddr: Long = sv match {
      case 0 | 1 =>
        val so = r.u8(base + 13)
        val sl = r.u8(base + 14)
        require(so == 8 && sl == 8,
          s"offset/length sizes $so/$sl unsupported (this reader handles the " +
            "universal 8-byte layout)")
        // v1 inserts 2+2 bytes (indexed-storage k + reserved) after the
        // consistency flags; the address block then follows
        val addrs = base + 24 + (if (sv == 1) 4 else 0)
        // root group SYMBOL TABLE ENTRY after the 4 file addresses:
        // link name offset (8), object header address (8), ...
        r.i64(addrs + 32 + 8)
      case _ =>
        val so = r.u8(base + 9)
        val sl = r.u8(base + 10)
        require(so == 8 && sl == 8,
          s"offset/length sizes $so/$sl unsupported")
        r.i64(base + 36)
    }
    require(rootAddr != Undef, "superblock has no root group object header")

    val datasets = Seq.newBuilder[Dataset]
    val groups = Seq.newBuilder[String]
    val seen = scala.collection.mutable.Set.empty[Long] // cycle guard

    def walkObject(addr: Long, path: String): Unit = {
      if (!seen.add(addr)) return
      val msgs = readMessages(r, addr)
      val links = Seq.newBuilder[(String, Long)]
      var space: Option[Seq[Long]] = None
      var dtype: Option[Dtype] = None
      var fillRaw: Option[Array[Byte]] = None
      var layout: Option[(Int, Long, Long, Option[Array[Byte]])] = None
      val attrs = Map.newBuilder[String, Any]

      msgs.foreach { m =>
        m.typ match {
          case 0x0001 => space = Some(parseDataspace(r, m.bodyOff))
          case 0x0002 => // link info: dense storage refuses
            val flags = r.u8(m.bodyOff + 1)
            val fh = m.bodyOff + 2 + (if ((flags & 1) != 0) 8 else 0)
            require(r.i64(fh) == Undef,
              s"object '$path': dense (fractal-heap) link storage " +
                "unsupported — compact links and v1 symbol tables decode")
          case 0x0003 => dtype = Some(parseDatatype(r, m.bodyOff))
          case 0x0005 => fillRaw = parseFillValue(r, m.bodyOff)
          case 0x0006 => links += parseLink(r, m.bodyOff, path)
          case 0x0008 => layout = Some(parseLayout(r, m.bodyOff, path))
          case 0x000C =>
            parseAttribute(r, m.bodyOff, m.size).foreach(attrs += _)
          case 0x0011 => // v1 symbol table: B-tree + local heap
            val btree = r.i64(m.bodyOff)
            val heap = r.i64(m.bodyOff + 8)
            links ++= walkSymbolTable(r, btree, heap)
          case _ => () // NIL, mod-times, etc. — metadata we don't need
        }
      }

      (space, dtype, layout) match {
        case (Some(dims), Some(dt), Some((cls, off, len, compact))) =>
          val fillV = fillRaw.filter(_.length == dt.size)
            .map(fb => scalarOf(fb, dt))
          datasets += Dataset(path, dims, dt, off, len, compact,
            fillV, attrs.result())
        case (None, None, None) =>
          groups += (if (path.isEmpty) "/" else path)
          links.result().foreach { case (name, a) =>
            walkObject(a, s"$path/$name")
          }
        case _ =>
          // a dataset missing one of the three is corrupt, not a group
          require(space.isEmpty && dtype.isEmpty && layout.isEmpty,
            s"object '$path': incomplete dataset metadata " +
              s"(dataspace=${space.isDefined}, datatype=${dtype.isDefined}, " +
              s"layout=${layout.isDefined})")
      }
    }

    walkObject(rootAddr, "")
    Hdf5File(sv, datasets.result(), groups.result())
  }

  /** All header messages of the object at `addr`, across continuation
    * blocks, both header versions. */
  private def readMessages(r: Reader, addr: Long): Seq[Msg] = {
    val out = Seq.newBuilder[Msg]
    r.in(addr, 6)
    if (r.sig4(addr) == "OHDR") {
      // ---- version 2 ----
      val ver = r.u8(addr + 4)
      require(ver == 2, s"OHDR version $ver unsupported")
      val flags = r.u8(addr + 5)
      var p = addr + 6
      if ((flags & 0x20) != 0) p += 16 // four 4-byte times
      if ((flags & 0x10) != 0) p += 4  // max-compact / min-dense
      val szWidth = 1 << (flags & 0x3)
      val chunk0 = szWidth match {
        case 1 => r.u8(p).toLong
        case 2 => r.u16(p).toLong
        case 4 => r.u32(p)
        case 8 => r.i64(p)
      }
      p += szWidth
      val trackOrder = (flags & 0x04) != 0
      val hdrLen = 4 + (if (trackOrder) 2 else 0)
      // chunk queue: (start, end) of message bytes (excl checksum)
      var blocks = List((p, p + chunk0))
      while (blocks.nonEmpty) {
        val (start, end) = blocks.head
        blocks = blocks.tail
        r.in(start, end - start)
        var cur = start
        while (cur + hdrLen <= end) {
          val typ = r.u8(cur)
          val size = r.u16(cur + 1)
          val body = cur + hdrLen
          // the spec's trailing gap is SMALLER than a message header,
          // so anything that parses a header must fit its body
          require(body + size <= end,
            s"v2 header message at $cur overruns its block")
          if (typ == 0x10) {
            // v2 continuation block: OCHK + messages + checksum
            val cAddr = r.i64(body)
            val cLen = r.i64(body + 8)
            r.in(cAddr, cLen)
            require(r.sig4(cAddr) == "OCHK",
              "continuation block missing OCHK signature")
            blocks ::= ((cAddr + 4, cAddr + cLen - 4))
          } else if (typ != 0) out += Msg(typ, body, size)
          cur = body + size
        }
      }
    } else {
      // ---- version 1 ----
      val ver = r.u8(addr)
      require(ver == 1,
        s"object header at $addr: version $ver unsupported (1 or OHDR v2)")
      val nMsgs = r.u16(addr + 2)
      val hdrSize = r.u32(addr + 8)
      // messages start after the 12-byte prefix + 4 pad bytes
      var blocks = List((addr + 16, addr + 16 + hdrSize))
      var remaining = nMsgs
      while (blocks.nonEmpty && remaining > 0) {
        val (start, end) = blocks.head
        blocks = blocks.tail
        r.in(start, end - start)
        var cur = start
        while (cur + 8 <= end && remaining > 0) {
          val typ = r.u16(cur)
          val size = r.u16(cur + 2)
          val body = cur + 8
          require(body + size <= end,
            s"v1 header message at $cur overruns its block")
          remaining -= 1
          if (typ == 0x10) {
            val cAddr = r.i64(body)
            val cLen = r.i64(body + 8)
            blocks ::= ((cAddr, cAddr + cLen))
          } else if (typ != 0) out += Msg(typ, body, size)
          cur = body + size // v1 sizes already include the 8-byte pad
        }
      }
    }
    out.result()
  }

  private def parseDataspace(r: Reader, o: Long): Seq[Long] = {
    val ver = r.u8(o)
    val rank = r.u8(o + 1)
    require(ver == 1 || ver == 2, s"dataspace version $ver unsupported")
    require(rank <= 32, s"implausible dataspace rank $rank")
    val dimsAt = if (ver == 1) o + 8 else o + 4
    (0 until rank).map(i => r.i64(dimsAt + 8L * i))
  }

  private def parseDatatype(r: Reader, o: Long): Dtype = {
    val cv = r.u8(o)
    val clazz = cv & 0xF
    val bits0 = r.u8(o + 1) // class bit field byte 0
    val size = r.u32(o + 4).toInt
    clazz match {
      case 0 => // fixed-point
        require(Set(1, 2, 4, 8).contains(size),
          s"fixed-point size $size unsupported")
        val bitOffset = r.u16(o + 8)
        val precision = r.u16(o + 10)
        require(bitOffset == 0 && precision == size * 8,
          s"non-standard fixed-point layout (offset $bitOffset, " +
            s"precision $precision) unsupported")
        Dtype(0, size, littleEndian = (bits0 & 1) == 0, signed = (bits0 & 8) != 0)
      case 1 => // float: IEEE layouts only
        require(size == 4 || size == 8, s"float size $size unsupported")
        val expSize = r.u8(o + 13)
        val manSize = r.u8(o + 15)
        val bias = r.u32(o + 16)
        val ieee = if (size == 4) (8, 23, 127L) else (11, 52, 1023L)
        require((expSize, manSize, bias) == ieee,
          s"non-IEEE float layout (exp $expSize, mantissa $manSize, " +
            s"bias $bias) unsupported")
        Dtype(1, size, littleEndian = (bits0 & 1) == 0, signed = true)
      case 3 => // string (attribute values)
        Dtype(3, size, littleEndian = true, signed = false)
      case c => throw new IllegalArgumentException(
        s"datatype class $c unsupported — fixed-point, IEEE float and " +
          "fixed strings decode")
    }
  }

  private def parseFillValue(r: Reader, o: Long): Option[Array[Byte]] = {
    val ver = r.u8(o)
    ver match {
      case 1 =>
        val size = r.u32(o + 4).toInt
        if (size == 0) None
        else Some(java.util.Arrays.copyOfRange(r.bytes, (o + 8).toInt,
          (o + 8 + size).toInt))
      case 2 =>
        if (r.u8(o + 3) != 1) None // fill value defined flag
        else {
          val size = r.u32(o + 4).toInt
          if (size == 0) None
          else Some(java.util.Arrays.copyOfRange(r.bytes, (o + 8).toInt,
            (o + 8 + size).toInt))
        }
      case 3 =>
        val flags = r.u8(o + 1)
        if ((flags & 0x20) == 0) None
        else {
          val size = r.u32(o + 2).toInt
          Some(java.util.Arrays.copyOfRange(r.bytes, (o + 6).toInt,
            (o + 6 + size).toInt))
        }
      case v => throw new IllegalArgumentException(
        s"fill-value message version $v unsupported")
    }
  }

  /** Returns (layoutClass, dataOff, dataLen, compactBytes). */
  private def parseLayout(r: Reader, o: Long,
      path: String): (Int, Long, Long, Option[Array[Byte]]) = {
    val ver = r.u8(o)
    require(ver == 3 || ver == 4,
      s"dataset '$path': data-layout message version $ver unsupported (3+)")
    val clazz = r.u8(o + 1)
    clazz match {
      case 0 => // compact: size(2) + data inline
        val size = r.u16(o + 2)
        (0, -1L, size.toLong,
          Some(java.util.Arrays.copyOfRange(r.bytes, (o + 4).toInt,
            (o + 4 + size).toInt)))
      case 1 => // contiguous: address(8) + size(8)
        (1, r.i64(o + 2), r.i64(o + 10), None)
      case 2 => throw new IllegalArgumentException(
        s"dataset '$path': CHUNKED layout unsupported — the chunk " +
          "B-tree + filter pipeline (deflate et al) is this reader's " +
          "documented boundary; re-export contiguous/uncompressed")
      case c => throw new IllegalArgumentException(
        s"dataset '$path': layout class $c unsupported")
    }
  }

  /** (name, objectHeaderAddr) of a hard Link message. */
  private def parseLink(r: Reader, o: Long, path: String): (String, Long) = {
    val ver = r.u8(o)
    require(ver == 1, s"link message version $ver unsupported")
    val flags = r.u8(o + 1)
    var p = o + 2
    var linkType = 0
    if ((flags & 0x08) != 0) { linkType = r.u8(p); p += 1 }
    if ((flags & 0x04) != 0) p += 8 // creation order
    if ((flags & 0x10) != 0) p += 1 // charset
    val nameLen = (flags & 0x3) match {
      case 0 => val v = r.u8(p); p += 1; v.toLong
      case 1 => val v = r.u16(p); p += 2; v.toLong
      case 2 => val v = r.u32(p); p += 4; v
      case 3 => val v = r.i64(p); p += 8; v
    }
    val name = r.ascii(p, nameLen.toInt)
    p += nameLen
    require(linkType == 0,
      s"group '$path': link '$name' is ${if (linkType == 1) "soft"
        else "external/custom"} — only hard links decode (a link this " +
        "reader followed silently could alias or escape the file)")
    (name, r.i64(p))
  }

  /** Scalar numeric/string attributes: (name, Double | String). */
  private def parseAttribute(r: Reader, o: Long,
      msgSize: Int): Option[(String, Any)] = {
    val ver = r.u8(o)
    require(ver >= 1 && ver <= 3, s"attribute message version $ver unsupported")
    if (ver >= 2) {
      val flags = r.u8(o + 1)
      require((flags & 0x3) == 0,
        "shared attribute datatype/dataspace unsupported")
    }
    val nameSize = r.u16(o + 2)
    val dtSize = r.u16(o + 4)
    val dsSize = r.u16(o + 6)
    val pad = ver == 1 // v1 pads each part to 8 bytes; v2/v3 do not
    def padded(n: Int) = if (pad) (n + 7) & ~7 else n
    var p = o + 8 + (if (ver == 3) 1 else 0) // v3: charset byte
    val name = r.cstr(p)
    p += padded(nameSize)
    val dt = parseDatatype(r, p)
    p += padded(dtSize)
    // scalar dataspace only (rank 0, or rank 1 with one element)
    val dims = parseDataspace(r, p)
    p += padded(dsSize)
    if (dims.product > 1 && dims.nonEmpty) None
    else dt.clazz match {
      case 3 => Some(name -> r.ascii(p, dt.size).takeWhile(_ != 0.toChar))
      case _ => Some(name -> scalarOf(java.util.Arrays.copyOfRange(
        r.bytes, p.toInt, (p + dt.size).toInt), dt))
    }
  }

  /** v1 group: B-tree (TREE, node type 0) → SNOD symbol nodes, names
    * through the local heap. */
  private def walkSymbolTable(r: Reader, btreeAddr: Long,
      heapAddr: Long): Seq[(String, Long)] = {
    r.in(heapAddr, 32)
    require(r.sig4(heapAddr) == "HEAP", "local heap missing HEAP signature")
    val heapData = r.i64(heapAddr + 24)
    val out = Seq.newBuilder[(String, Long)]
    def walkNode(addr: Long): Unit = {
      r.in(addr, 24)
      r.sig4(addr) match {
        case "TREE" =>
          require(r.u8(addr + 4) == 0, "B-tree node type != group")
          val level = r.u8(addr + 5)
          val used = r.u16(addr + 6)
          // keys (8) and children (8) alternate after the two siblings
          var p = addr + 24 + 8 // skip key 0
          (0 until used).foreach { _ =>
            walkNode(r.i64(p))
            p += 16 // child + next key
          }
        case "SNOD" =>
          val n = r.u16(addr + 6)
          (0 until n).foreach { i =>
            val e = addr + 8 + 40L * i
            val nameOff = r.i64(e)
            val objAddr = r.i64(e + 8)
            out += ((r.cstr(heapData + nameOff), objAddr))
          }
        case s => throw new IllegalArgumentException(
          s"symbol-table walk hit unknown signature '$s' at $addr")
      }
    }
    walkNode(btreeAddr)
    out.result()
  }

  private def scalarOf(raw: Array[Byte], dt: Dtype): Double = {
    val b = ByteBuffer.wrap(raw).order(
      if (dt.littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    (dt.clazz, dt.size, dt.signed) match {
      case (0, 1, true) => b.get(0).toDouble
      case (0, 1, false) => (b.get(0) & 0xff).toDouble
      case (0, 2, true) => b.getShort(0).toDouble
      case (0, 2, false) => (b.getShort(0) & 0xffff).toDouble
      case (0, 4, true) => b.getInt(0).toDouble
      case (0, 4, false) => (b.getInt(0).toLong & 0xffffffffL).toDouble
      case (0, 8, _) => b.getLong(0).toDouble
      case (1, 4, _) => b.getFloat(0).toDouble
      case (1, 8, _) => b.getDouble(0)
      case other => throw new IllegalArgumentException(
        s"unsupported scalar layout $other")
    }
  }

  // ---- data read --------------------------------------------------------

  /** Raw dataset values, row-major, widened to double (no fill
    * masking — [[gridCells]] applies CF semantics; the [[Hdf]]/
    * [[NetCdf]] split). */
  def read(bytes: Array[Byte], f: Hdf5File, path: String): Array[Double] = {
    val d = f.datasetAt(path)
    val n = d.n
    require(n <= Int.MaxValue / 8, s"dataset '$path' too large for one read")
    val payload: Array[Byte] = d.compact.getOrElse {
      require(d.dataOff != Undef,
        s"dataset '$path': no data allocated (never written)")
      require(d.dataOff + d.dataLen <= bytes.length,
        s"dataset '$path': contiguous data overruns the file")
      java.util.Arrays.copyOfRange(bytes, d.dataOff.toInt,
        (d.dataOff + d.dataLen).toInt)
    }
    require(payload.length >= n * d.dtype.size,
      s"dataset '$path': ${payload.length} payload bytes < " +
        s"${n * d.dtype.size} declared by dims")
    val b = ByteBuffer.wrap(payload).order(
      if (d.dtype.littleEndian) ByteOrder.LITTLE_ENDIAN
      else ByteOrder.BIG_ENDIAN)
    val w = d.dtype.size
    Array.tabulate(n.toInt) { i =>
      (d.dtype.clazz, w, d.dtype.signed) match {
        case (0, 1, true) => b.get(i).toDouble
        case (0, 1, false) => (b.get(i) & 0xff).toDouble
        case (0, 2, true) => b.getShort(i * 2).toDouble
        case (0, 2, false) => (b.getShort(i * 2) & 0xffff).toDouble
        case (0, 4, true) => b.getInt(i * 4).toDouble
        case (0, 4, false) => (b.getInt(i * 4).toLong & 0xffffffffL).toDouble
        case (0, 8, _) => b.getLong(i * 8).toDouble
        case (1, 4, _) => b.getFloat(i * 4).toDouble
        case (1, 8, _) => b.getDouble(i * 8)
        case other => throw new IllegalArgumentException(
          s"dataset '$path': unsupported element layout $other")
      }
    }
  }

  final case class GridCell(x: Int, y: Int, value: Double)

  /** Rank-2 (y, x) dataset as cells with netCDF CF semantics: fill
    * (attribute `_FillValue`, else the fill-value message) matched on
    * the RAW value → NaN; `scale_factor`/`add_offset` applied to the
    * survivors — the [[NetCdf.readGrid]] contract. */
  def gridCells(bytes: Array[Byte], f: Hdf5File,
      path: String): Iterator[GridCell] = {
    val d = f.datasetAt(path)
    require(d.dims.size == 2,
      s"dataset '$path' has rank ${d.dims.size}; the grid path reads " +
        "rank-2 (y, x) datasets")
    val Seq(ny, nx) = d.dims.map(_.toInt)
    val vs = read(bytes, f, path)
    val fill = d.fill
    val scale = d.numAttr("scale_factor").getOrElse(1.0)
    val offset = d.numAttr("add_offset").getOrElse(0.0)
    Iterator.range(0, ny * nx).map { i =>
      val raw = vs(i)
      GridCell(i % nx, i / nx,
        if (fill.exists(_ == raw)) Double.NaN else raw * scale + offset)
    }
  }

  // ---- encode -----------------------------------------------------------

  /** One dataset to write: row-major `values` narrowed to `dtype`
    * (int16/int32/float32/float64), optional fill (written as a v3
    * fill-value message) and numeric v3 attributes. */
  final case class DsSpec(name: String, dims: Seq[Long], dtype: Dtype,
      values: Array[Double], fill: Option[Double] = None,
      attrs: Seq[(String, Double)] = Nil)

  /** Minimal HDF5 WRITER — superblock v2, v2 object headers, compact
    * hard links, contiguous layout: exactly the subset [[decode]]
    * reads, so the i66 transport cycle (and any engine-published
    * `.h5` product) lands through real HDF5 bytes. Checksums are
    * written as zero (the reader does not verify them; a library
    * consumer repairs them on rewrite). */
  def encode(specs: Seq[DsSpec]): Array[Byte] = {
    require(specs.nonEmpty, "nothing to encode")
    def le(cap: Int)(f: ByteBuffer => Unit): Array[Byte] = {
      val b = ByteBuffer.allocate(cap).order(ByteOrder.LITTLE_ENDIAN)
      f(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def msg(typ: Int, body: Array[Byte]): Array[Byte] = le(body.length + 4) { b =>
      b.put(typ.toByte).putShort(body.length.toShort).put(0.toByte).put(body)
    }
    def dtBytes(dt: Dtype): Array[Byte] = dt.clazz match {
      case 0 => le(16) { b =>
        b.put(0x10.toByte)
        b.put((if (dt.signed) 0x08 else 0x00).toByte).put(0.toByte).put(0.toByte)
        b.putInt(dt.size)
        b.putShort(0).putShort((dt.size * 8).toShort)
      }
      case 1 => le(24) { b =>
        b.put(0x11.toByte)
        b.put(0x20.toByte)
        b.put((dt.size * 8 - 1).toByte).put(0.toByte)
        b.putInt(dt.size)
        b.putShort(0).putShort((dt.size * 8).toShort)
        if (dt.size == 4) {
          b.put(23.toByte).put(8.toByte).put(0.toByte).put(23.toByte)
          b.putInt(127)
        } else {
          b.put(52.toByte).put(11.toByte).put(0.toByte).put(52.toByte)
          b.putInt(1023)
        }
      }
      case c => throw new IllegalArgumentException(
        s"cannot write datatype class $c")
    }
    def putVal(b: ByteBuffer, dt: Dtype, v: Double): Unit =
      (dt.clazz, dt.size) match {
        case (0, 2) => b.putShort(v.toShort)
        case (0, 4) => b.putInt(v.toInt)
        case (1, 4) => b.putFloat(v.toFloat)
        case (1, 8) => b.putDouble(v)
        case other => throw new IllegalArgumentException(
          s"cannot write element layout $other")
      }
    val f64 = Dtype(1, 8, littleEndian = true, signed = true)

    // per-dataset header messages, with the layout address patched in
    // once the data offsets are known
    final case class Pending(headerLess: Array[Byte], dataLen: Int,
        spec: DsSpec)
    val pendings = specs.map { s =>
      val n = s.dims.product
      require(s.values.length == n,
        s"dataset '${s.name}': ${s.values.length} values for dims ${s.dims}")
      require(s.dtype.littleEndian, "this writer emits little-endian data")
      val dsBody = le(8 + 8 * s.dims.size) { b =>
        b.put(2.toByte).put(s.dims.size.toByte).put(0.toByte).put(1.toByte)
        s.dims.foreach(b.putLong)
      }
      val fillMsgs = s.fill.toSeq.map { fv =>
        msg(0x05, le(8 + s.dtype.size) { b =>
          b.put(3.toByte).put(0x20.toByte).putInt(s.dtype.size)
          putVal(b, s.dtype, fv)
        })
      }
      val attrMsgs = s.attrs.map { case (name, v) =>
        val nameZ = name.getBytes("US-ASCII") :+ 0.toByte
        val dt = dtBytes(f64)
        msg(0x0C, le(9 + nameZ.length + dt.length + 4 + 8) { b =>
          b.put(3.toByte).put(0.toByte)
          b.putShort(nameZ.length.toShort)
          b.putShort(dt.length.toShort)
          b.putShort(4)
          b.put(0.toByte)
          b.put(nameZ).put(dt)
          b.put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte) // scalar
          b.putDouble(v)
        })
      }
      // layout message LAST so its 8-byte address lands at a fixed
      // distance from the header end (patched below)
      val layoutMsg = msg(0x08, le(18) { b =>
        b.put(3.toByte).put(1.toByte).putLong(0L)
        b.putLong(n * s.dtype.size)
      })
      val msgs = (Seq(msg(0x01, dsBody), msg(0x03, dtBytes(s.dtype))) ++
        fillMsgs ++ attrMsgs :+ layoutMsg).flatten.toArray
      Pending(msgs, (n * s.dtype.size).toInt, s)
    }

    def ohdr(chunk: Array[Byte]): Array[Byte] = le(chunk.length + 16) { b =>
      b.put("OHDR".getBytes("US-ASCII")).put(2.toByte).put(1.toByte)
      b.putShort(chunk.length.toShort)
      b.put(chunk)
      b.putInt(0) // checksum: unverified by this subset
    }

    // layout: superblock(48) | root OHDR | dataset OHDRs | data blocks
    val rootChunk = Array.newBuilder[Byte]
    var probe = 48L
    // first pass to size the root header: link bodies are name-length
    // dependent only
    val linkMsgs = specs.map { s =>
      val nameB = s.name.getBytes("US-ASCII")
      require(nameB.length <= 255, s"name '${s.name}' too long")
      msg(0x06, le(11 + nameB.length) { b =>
        b.put(1.toByte).put(0.toByte)
        b.put(nameB.length.toByte).put(nameB)
        b.putLong(0L) // patched to the dataset header address
      })
    }
    val rootSize = 12 + linkMsgs.map(_.length).sum
    val hdrOffs = scala.collection.mutable.ArrayBuffer.empty[Long]
    probe = 48L + rootSize
    pendings.foreach { p =>
      hdrOffs += probe
      probe += p.headerLess.length + 12 // the OHDR prefix + checksum
    }
    val dataOffs = scala.collection.mutable.ArrayBuffer.empty[Long]
    pendings.foreach { p =>
      dataOffs += probe
      probe += p.dataLen
    }
    require(probe <= Int.MaxValue, "encoded HDF5 too large for this writer")

    val out = ByteBuffer.allocate(probe.toInt).order(ByteOrder.LITTLE_ENDIAN)
    // superblock v2
    out.put(Signature).put(2.toByte).put(8.toByte).put(8.toByte).put(0.toByte)
    out.putLong(0L).putLong(Undef).putLong(probe).putLong(48L).putInt(0)
    // root OHDR with the links patched to the real header addresses
    val patchedLinks = linkMsgs.zip(hdrOffs).map { case (m, a) =>
      val c = m.clone()
      ByteBuffer.wrap(c).order(ByteOrder.LITTLE_ENDIAN)
        .putLong(c.length - 8, a)
      c
    }
    out.put(ohdr(patchedLinks.toArray.flatten))
    // dataset headers with the layout address patched (the layout
    // message is last: its address field sits 12 bytes from the end)
    pendings.zipWithIndex.foreach { case (p, i) =>
      val c = p.headerLess.clone()
      ByteBuffer.wrap(c).order(ByteOrder.LITTLE_ENDIAN)
        .putLong(c.length - 16, dataOffs(i))
      out.put(ohdr(c))
    }
    pendings.zipWithIndex.foreach { case (p, i) =>
      val b = ByteBuffer.allocate(p.dataLen).order(ByteOrder.LITTLE_ENDIAN)
      p.spec.values.foreach(putVal(b, p.spec.dtype, _))
      out.put(b.array())
    }
    out.array()
  }

  // ---- distributed read -------------------------------------------------

  /** Archive inventory: one row per dataset across every file matching
    * `path` (binaryFile glob), decoded task-side —
    * `(path, dataset, rank, dims, dtype, n, fill)`. */
  def scan(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (p, bytes) =>
        val f = decode(bytes)
        f.datasets.map(d => (p, d.path, d.dims.size,
          d.dims.mkString("x"), d.dtype.name, d.n, d.fill))
      })
      .toDF("path", "dataset", "rank", "dims", "dtype", "n", "fill")
  }

  /** Distributed HDF5→rows decode (the [[NetCdf.readGrid]] twin for
    * NetCDF-4-contiguous archives): one task per file, one row per
    * non-fill cell of the named rank-2 dataset. */
  def readGrid(spark: SparkSession, pathOrGlob: String,
      dataset: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathOrGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (p, bytes) =>
        val f = decode(bytes)
        gridCells(bytes, f, dataset)
          .filterNot(_.value.isNaN)
          .map(c => (p, dataset, c.x, c.y, c.value))
      })
      .toDF("path", "dataset", "x", "y", "value")
  }
}
