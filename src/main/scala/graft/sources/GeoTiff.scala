package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal clean-room GeoTIFF codec — the binary-raster decode rung
  * the r7 verdict listed as the engine's one remaining format gap
  * (the reference decodes GRIB/NetCDF/GeoTIFF through GDAL,
  * `ingest/modis/convertmodis.py`, and PUBLISHES per-date COG files
  * `{namespace}_{ISO_DATE}.tif`). Implemented from the public TIFF 6.0
  * specification (Adobe, 1992) + the public GeoTIFF 1.1 tag registry —
  * no GDAL, no external dependency:
  *
  *   - READ: classic TIFF (II/MM byte order), first IFD, SINGLE-band
  *     grayscale, strip OR tile layout, compression none (1) or
  *     deflate (8, via java.util.zip.Inflater), sample types uint8 /
  *     int16 / uint16 / int32 / float32 / float64; georeferencing from
  *     ModelPixelScale (33550) + ModelTiepoint (33922); nodata from
  *     the GDAL_NODATA ASCII tag (42113);
  *   - WRITE: single-band float32 or int16, uncompressed or deflate,
  *     strip layout ([[encode]]) or the reference's actual product
  *     contract — COG layout ([[encodeCog]]: tiles, chained
  *     reduced-resolution overview IFDs, header-first byte order) —
  *     with the same geo tags; driver-bounded [[publishTif]] or
  *     task-side [[publishTifTasks]] for grids past the driver budget.
  *
  * Scale shape: decode is DATA-PLANE work — [[readRaster]] runs it
  * inside mapPartitions over Spark's `binaryFile` source (one task per
  * file, the multimodal-payload discipline of m01–m11), so a
  * 100 TB raster archive decodes with cluster parallelism and the
  * driver never touches pixel bytes. One row per valid pixel
  * (nodata → dropped or kept null by flag), georeferenced to
  * (lon, lat) at the pixel CENTER (the gdal convention for area
  * rasters: tiepoint maps the OUTER corner of pixel (0,0)). */
object GeoTiff {

  final case class Raster(
      width: Int, height: Int,
      scaleX: Double, scaleY: Double,
      tieX: Double, tieY: Double,
      nodata: Option[Double],
      values: Array[Double]) {
    def value(x: Int, y: Int): Double = values(y * width + x)
    /** NaN-aware nodata test: GDAL commonly writes GDAL_NODATA as
      * "nan" for float rasters, and `Option.contains` via `==` would
      * never match it (NaN != NaN — review finding r8). */
    def isNodata(v: Double): Boolean =
      nodata.exists(nd => nd == v || (nd.isNaN && v.isNaN))
    /** Longitude of the pixel CENTER. */
    def lonOf(x: Int): Double = tieX + (x + 0.5) * scaleX
    /** Latitude of the pixel CENTER (scaleY positive ⇒ north-up rows
      * descend in latitude — the GeoTIFF convention). */
    def latOf(y: Int): Double = tieY - (y + 0.5) * scaleY
  }

  // TIFF 6.0 tag ids (public spec)
  private val TImageWidth = 256
  private val TImageLength = 257
  private val TBitsPerSample = 258
  private val TCompression = 259
  private val TPhotometric = 262
  private val TStripOffsets = 273
  private val TRowsPerStrip = 278
  private val TStripByteCounts = 279
  private val TTileWidth = 322
  private val TTileLength = 323
  private val TTileOffsets = 324
  private val TTileByteCounts = 325
  private val TSampleFormat = 339
  private val TModelPixelScale = 33550
  private val TModelTiepoint = 33922
  private val TGdalNodata = 42113

  private final case class Entry(tag: Int, typ: Int, count: Long, valueOff: Long)

  private def typeSize(t: Int): Int = t match {
    case 1 | 2 | 6 | 7 => 1 // BYTE, ASCII, SBYTE, UNDEFINED
    case 3 | 8 => 2         // SHORT, SSHORT
    case 4 | 9 | 11 => 4    // LONG, SLONG, FLOAT
    case 5 | 10 | 12 => 8   // RATIONAL, SRATIONAL, DOUBLE
    case _ => 1
  }

  /** Transparent unwrap of gzip-wrapped TIFFs (`.tif.gz`, the CHIRPS
    * distribution shape — the reference gunzips before GDAL;
    * `chirps_rainfall/__init__.py:334`): magic-sniffed so plain files
    * pay nothing, inflation bounded in TWO stages (r16 verdict,
    * optional hardening (a)). Stage 1 inflates at most
    * [[Gz.HeaderProbeLen]] bytes and [[headerDerivedBound]] reads the
    * file's OWN declared extent from its IFD structures; stage 2
    * buffers only that much, draining (and CRC-validating) the rest of
    * the stream without allocating for it. When the header cannot be
    * bounded from the probe — GDAL legitimately appends overview IFDs
    * at the END of classic files — the cap falls back to DEFLATE's own
    * expansion bound ([[Gz.deflateBound]]: 1032× the COMPRESSED
    * length — r15 advice), which no valid stream can exceed. Neither
    * stage can refuse a legitimate file (the r14/r15 lesson was that
    * content-derived REFUSING caps rejected legitimate multi-IFD
    * float64 COGs — the derived bound here only stops BUFFERING, never
    * the decode), but a crafted bomb that lies small in its header now
    * allocates its declared extent instead of the ~1 GiB deflate-bound
    * margin a ~1 MB compressed stream could previously fill. The
    * byte-array maximum stays as the outer clamp: classic-TIFF offsets
    * are 32-bit and every access goes through one wrapped array. */
  private def unwrap(bytes: Array[Byte]): Array[Byte] =
    if (Gz.isGz(bytes))
      Gz.gunzipHeaderBounded(bytes, "GeoTIFF")(headerDerivedBound)
    else bytes

  /** Declared content extent of a classic TIFF, computed from an
    * inflated PREFIX of the file (stage 1 of [[unwrap]]): the maximum
    * byte position any chained IFD, out-of-line entry value, or
    * strip/tile chunk reaches. A TRUE upper bound on every byte
    * [[decodeIfd]] or [[ifdCount]] can reference — both read only
    * referenced structures, so truncating the file here decodes
    * identically for EVERY `ifdIndex`. Returns None (caller falls back
    * to the deflate bound) whenever the walk cannot complete inside
    * the prefix: an IFD or a strip/tile offset array past the probe,
    * a half-present offset/count pair, or a cyclic chain — legitimate
    * layouts exist for the first two (GDAL appends overview IFDs at
    * file end), so an incomplete walk must widen the cap, never guess.
    * A prefix that is not classic TIFF at all returns its own length:
    * the decoder's magic gate then refuses by name without the stream
    * ever inflating past the probe. Total by construction (every read
    * is bounds-checked first) — it runs on fuzzed prefixes. */
  private[graft] def headerDerivedBound(prefix: Array[Byte]): Option[Long] = {
    if (prefix.length < 8) return None
    val head = ByteBuffer.wrap(prefix)
    val order = (prefix(0), prefix(1)) match {
      case ('I', 'I') => ByteOrder.LITTLE_ENDIAN
      case ('M', 'M') => ByteOrder.BIG_ENDIAN
      case _ => return Some(prefix.length.toLong)
    }
    head.order(order)
    if (head.getShort(2) != 42) return Some(prefix.length.toLong)
    var need = 8L
    var off = head.getInt(4).toLong & 0xffffffffL
    val visited = scala.collection.mutable.Set.empty[Long]
    // cumulative work caps (r17 review): the walk reads every entry
    // tagged as a chunk array, so a crafted probe packing 64K such
    // entries × 256K-element arrays would cost ~10^10 reads here —
    // work the strict decoder never does (it collapses duplicate tags
    // first). Budgets far above any legitimate header; exceeding one
    // returns None, which only WIDENS the cap — never refuses.
    var chunkElemBudget = 1L << 22
    val maxIfds = 1024
    while (off != 0) {
      if (!visited.add(off)) return None // cyclic: the strict decode refuses
      if (visited.size > maxIfds) return None
      if (off + 2 > prefix.length) return None
      val n = head.getShort(off.toInt) & 0xffff
      val ifdEnd = off + 2 + n.toLong * 12 + 4
      if (ifdEnd > prefix.length) return None
      need = math.max(need, ifdEnd)
      val chunkVals = scala.collection.mutable.Map.empty[Int, Array[Long]]
      var i = 0
      while (i < n) {
        val eOff = (off + 2 + i * 12).toInt
        val tag = head.getShort(eOff) & 0xffff
        val typ = head.getShort(eOff + 2) & 0xffff
        val count = head.getInt(eOff + 4).toLong & 0xffffffffL
        val valueOff = head.getInt(eOff + 8).toLong & 0xffffffffL
        val sz = typeSize(typ)
        val byteLen = sz.toLong * count
        if (byteLen > 4) need = math.max(need, valueOff + byteLen)
        if (tag == TStripOffsets || tag == TStripByteCounts ||
            tag == TTileOffsets || tag == TTileByteCounts) {
          // chunk arrays must be READ to find where the data ends
          if (sz != 2 && sz != 4) return None
          val base = if (byteLen <= 4) eOff + 8L else valueOff
          if (base + byteLen > prefix.length) return None
          chunkElemBudget -= count
          if (chunkElemBudget < 0) return None
          val vs = new Array[Long](count.toInt)
          var k = 0
          while (k < vs.length) {
            val o = (base + k.toLong * sz).toInt
            vs(k) = if (sz == 2) head.getShort(o).toLong & 0xffffL
                    else head.getInt(o).toLong & 0xffffffffL
            k += 1
          }
          chunkVals(tag) = vs
        }
        i += 1
      }
      val pairs = Seq((TStripOffsets, TStripByteCounts),
        (TTileOffsets, TTileByteCounts))
      for ((oTag, cTag) <- pairs) {
        (chunkVals.get(oTag), chunkVals.get(cTag)) match {
          case (Some(os), Some(cs)) =>
            if (os.length != cs.length) return None
            var k = 0
            while (k < os.length) {
              need = math.max(need, os(k) + cs(k)); k += 1
            }
          case (None, None) => ()
          case _ => return None // half a pair: strict decode refuses by name
        }
      }
      off = head.getInt((ifdEnd - 4).toInt).toLong & 0xffffffffL
    }
    Some(need)
  }

  /** Number of IFDs chained in a classic TIFF (1 for the plain writer,
    * 1 + overview count for [[encodeCog]] output). Accepts
    * gzip-wrapped input like [[decode]]. */
  def ifdCount(rawBytes: Array[Byte]): Int = CodecGate.gated("GeoTIFF") {
    val bytes = unwrap(rawBytes)
    val head = ByteBuffer.wrap(bytes)
    head.order(if (bytes(0) == 'I') ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    var off = head.getInt(4).toLong & 0xffffffffL
    var n = 0
    val visited = scala.collection.mutable.Set.empty[Long]
    while (off != 0) {
      require(visited.add(off), s"cyclic next-IFD pointer back to $off")
      n += 1
      val entries = head.getShort(off.toInt) & 0xffff
      off = head.getInt((off + 2 + entries * 12).toInt).toLong & 0xffffffffL
    }
    n
  }

  /** Decode a single-band GeoTIFF byte array into a [[Raster]].
    * `ifdIndex` selects along the next-IFD chain — 0 is the full-res
    * image, 1.. are [[encodeCog]] overview levels. Gzip-wrapped input
    * (`.tif.gz`) unwraps transparently. */
  def decode(bytes: Array[Byte], ifdIndex: Int = 0): Raster =
    CodecGate.gated("GeoTIFF")(decodeIfd(unwrap(bytes), ifdIndex))

  private def decodeIfd(bytes: Array[Byte], ifdIndex: Int): Raster = {
    val head = ByteBuffer.wrap(bytes)
    val order = (bytes(0), bytes(1)) match {
      case ('I', 'I') => ByteOrder.LITTLE_ENDIAN
      case ('M', 'M') => ByteOrder.BIG_ENDIAN
      case _ => throw new IllegalArgumentException("not a TIFF: bad byte-order mark")
    }
    head.order(order)
    require(head.getShort(2) == 42, "not a classic TIFF (magic != 42)")
    var ifdOff = head.getInt(4).toLong & 0xffffffffL
    var hop = 0
    while (hop < ifdIndex) {
      val n = head.getShort(ifdOff.toInt) & 0xffff
      ifdOff = head.getInt((ifdOff + 2 + n * 12).toInt).toLong & 0xffffffffL
      require(ifdOff != 0, s"IFD chain ends before index $ifdIndex")
      hop += 1
    }

    val nEntries = head.getShort(ifdOff.toInt) & 0xffff
    val entries = (0 until nEntries).map { i =>
      val off = ifdOff.toInt + 2 + i * 12
      Entry(head.getShort(off) & 0xffff, head.getShort(off + 2) & 0xffff,
        head.getInt(off + 4).toLong & 0xffffffffL,
        head.getInt(off + 8).toLong & 0xffffffffL)
    }.map(e => e.tag -> e).toMap

    /** Byte offset of an entry's VALUE: inline in the 4-byte slot when
      * it fits, else at the pointed offset (TIFF 6.0 §2). */
    def valueOffset(e: Entry): Long =
      if (typeSize(e.typ) * e.count <= 4) {
        val idx = (0 until nEntries).find { i =>
          (head.getShort(ifdOff.toInt + 2 + i * 12) & 0xffff) == e.tag
        }.get
        ifdOff + 2 + idx * 12 + 8
      } else e.valueOff

    /** All numeric values of a tag. */
    def longs(e: Entry): Array[Long] = {
      val sz = typeSize(e.typ)
      val slotOff = valueOffset(e)
      Array.tabulate(e.count.toInt) { i =>
        val o = (slotOff + i.toLong * sz).toInt
        sz match {
          case 1 => bytes(o).toLong & 0xffL
          case 2 => head.getShort(o).toLong & 0xffffL
          case 4 => head.getInt(o).toLong & 0xffffffffL
          case 8 => head.getLong(o) // only used via doubles()
        }
      }
    }
    def doubles(e: Entry): Array[Double] = {
      require(e.typ == 12, s"tag ${e.tag}: expected DOUBLE type, got ${e.typ}")
      Array.tabulate(e.count.toInt)(i => head.getDouble((e.valueOff + i * 8L).toInt))
    }
    def ascii(e: Entry): String =
      new String(bytes, valueOffset(e).toInt, e.count.toInt, "US-ASCII")
        .takeWhile(_ != '\u0000').trim
    def tagLongs(tag: Int): Option[Array[Long]] = entries.get(tag).map(longs)
    def tagLong(tag: Int): Option[Long] = tagLongs(tag).map { vs =>
      // a present tag with COUNT 0 carries no value — refuse by name
      // rather than surface a raw head-of-empty (r14 fuzz battery)
      require(vs.nonEmpty, s"tag $tag present with count 0")
      vs.head
    }

    val width = tagLong(TImageWidth).getOrElse(
      throw new IllegalArgumentException("missing ImageWidth")).toInt
    val height = tagLong(TImageLength).getOrElse(
      throw new IllegalArgumentException("missing ImageLength")).toInt
    val bits = tagLong(TBitsPerSample).getOrElse(8L).toInt
    val compression = tagLong(TCompression).getOrElse(1L).toInt
    // SampleFormat: 1 unsigned, 2 signed, 3 IEEE float (TIFF 6.0 §19)
    val sfmt = tagLong(TSampleFormat).getOrElse(1L).toInt
    require(compression == 1 || compression == 8,
      s"unsupported compression $compression (supported: none, deflate)")
    // fail LOUDLY on layouts we would otherwise decode to silently
    // wrong values (review finding r8): multi-band interleaving and
    // deflate predictors reinterpret the sample bytes entirely
    val spp = tagLong(277).getOrElse(1L).toInt // SamplesPerPixel
    require(spp == 1, s"unsupported SamplesPerPixel $spp (single-band only)")
    val predictor = tagLong(317).getOrElse(1L).toInt // Predictor
    require(predictor == 1,
      s"unsupported Predictor $predictor (no differencing support)")

    def inflate(chunk: Array[Byte], expected: Int): Array[Byte] =
      if (compression == 1) chunk
      else {
        val inf = new java.util.zip.Inflater()
        inf.setInput(chunk)
        val out = new Array[Byte](expected)
        var done = 0
        while (done < expected && !inf.finished()) {
          val n = inf.inflate(out, done, expected - done)
          // a TRUNCATED deflate stream makes inflate() return 0 and ask
          // for more input forever — fail loudly instead of spinning
          if (n == 0 && (inf.needsInput() || inf.needsDictionary())) {
            inf.end()
            throw new IllegalArgumentException(
              s"corrupt deflate chunk: ${done} of $expected bytes recovered")
          }
          done += n
        }
        inf.end()
        out
      }

    val bytesPerSample = bits / 8
    // ALLOCATION gate: the raster array is sized off DECLARED tags —
    // refuse dimensions no single in-memory raster plausibly has
    // BEFORE allocating (r14 fuzz battery: a flipped ImageWidth octet
    // must never request a multi-GB array)
    require(width >= 1 && height >= 1 &&
      width.toLong * height <= (1L << 27),
      s"raster ${width}x$height is empty, negative, or past the " +
        "2^27-pixel single-raster sanity cap")
    val values = new Array[Double](width * height)

    def readSamples(data: Array[Byte], n: Int, put: (Int, Double) => Unit): Unit = {
      val b = ByteBuffer.wrap(data).order(order)
      var i = 0
      while (i < n) {
        val v = (bits, sfmt) match {
          case (8, 1) => (b.get(i) & 0xff).toDouble
          case (16, 1) => (b.getShort(i * 2) & 0xffff).toDouble
          case (16, 2) => b.getShort(i * 2).toDouble
          case (32, 1) => (b.getInt(i * 4).toLong & 0xffffffffL).toDouble
          case (32, 2) => b.getInt(i * 4).toDouble
          case (32, 3) => b.getFloat(i * 4).toDouble
          case (64, 3) => b.getDouble(i * 8)
          case other => throw new IllegalArgumentException(
            s"unsupported sample layout (bits, format) = $other")
        }
        put(i, v)
        i += 1
      }
    }

    (tagLongs(TTileOffsets), tagLongs(TStripOffsets)) match {
      case (Some(tileOffs), _) =>
        // refusals by name — a flipped tag id must not surface as a
        // raw None.get (r14 fuzz battery)
        def need[T](tag: Int, name: String, v: Option[T]): T = v.getOrElse(
          throw new IllegalArgumentException(s"tiled TIFF missing $name"))
        val tw = need(TTileWidth, "TileWidth", tagLong(TTileWidth)).toInt
        val th = need(TTileLength, "TileLength", tagLong(TTileLength)).toInt
        val counts = need(TTileByteCounts, "TileByteCounts",
          tagLongs(TTileByteCounts))
        require(tw >= 1 && th >= 1 && tw.toLong * th <= (1L << 27),
          s"bad tile geometry ${tw}x$th (empty or past the 2^27-pixel " +
            "sanity cap)")
        val tilesAcross = (width + tw - 1) / tw
        tileOffs.indices.foreach { t =>
          require(tileOffs(t) + counts(t) <= bytes.length,
            s"truncated TIFF: tile $t ends past the buffer")
          val chunk = java.util.Arrays.copyOfRange(bytes,
            tileOffs(t).toInt, (tileOffs(t) + counts(t)).toInt)
          val data = inflate(chunk, tw * th * bytesPerSample)
          val tx = (t % tilesAcross) * tw
          val ty = (t / tilesAcross) * th
          readSamples(data, tw * th, (i, v) => {
            val x = tx + i % tw; val y = ty + i / tw
            if (x < width && y < height) values(y * width + x) = v
          })
        }
      case (None, Some(stripOffs)) =>
        val rps = tagLong(TRowsPerStrip).getOrElse(height.toLong).toInt
        require(rps >= 1, s"bad RowsPerStrip $rps")
        val counts = tagLongs(TStripByteCounts).getOrElse(
          throw new IllegalArgumentException(
            "striped TIFF missing StripByteCounts"))
        stripOffs.indices.foreach { s =>
          val rows = math.min(rps, height - s * rps)
          require(stripOffs(s) + counts(s) <= bytes.length,
            s"truncated TIFF: strip $s ends past the buffer")
          val chunk = java.util.Arrays.copyOfRange(bytes,
            stripOffs(s).toInt, (stripOffs(s) + counts(s)).toInt)
          val data = inflate(chunk, width * rows * bytesPerSample)
          val y0 = s * rps
          readSamples(data, width * rows,
            (i, v) => values((y0 + i / width) * width + i % width) = v)
        }
      case _ => throw new IllegalArgumentException("no strip or tile offsets")
    }

    val (sx, sy) = entries.get(TModelPixelScale).map(doubles) match {
      case Some(Array(x, y, _*)) => (x, y)
      case _ => (1.0, 1.0)
    }
    val (tx, ty) = entries.get(TModelTiepoint).map(doubles) match {
      // tiepoint: (i, j, k, X, Y, Z) — raster (i,j) pinned to model (X,Y)
      case Some(a) if a.length >= 6 => (a(3) - a(0) * sx, a(4) + a(1) * sy)
      case _ => (0.0, 0.0)
    }
    // GDAL writes float nodata as lowercase "nan", which
    // Double.parseDouble rejects (it accepts only "NaN")
    val nodata = entries.get(TGdalNodata).map(ascii).flatMap(s =>
      s.toDoubleOption.orElse(
        if (s.equalsIgnoreCase("nan")) Some(Double.NaN) else None))
    Raster(width, height, sx, sy, tx, ty, nodata, values)
  }

  /** See [[Deflate]] — the shared expansion-safe drain loop. */
  private def deflateBytes(data: Array[Byte]): Array[Byte] = Deflate(data)

  /** GDAL_NODATA ASCII payload, NUL-terminated and padded to >=5
    * bytes: a <=4-byte ASCII value would live INLINE in the IFD slot
    * per TIFF 6.0, but this writer always points the tag at the
    * out-of-line block — force the out-of-line layout. */
  private def nodataString(v: Double): String = {
    val s = (if (!v.isNaN && v == v.toLong) v.toLong.toString
             else v.toString) + "\u0000"
    val p = s + "\u0000" * math.max(0, 5 - s.length)
    // TIFF 6.0 word alignment: this is the only odd-sized component
    // the writers pack, and every offset computed after it inherits
    // its parity -- keep it even
    if (p.length % 2 == 0) p else p + "\u0000"
  }

  /** One overview level: each coarse cell is the mean of its valid
    * (non-nodata) 2×2 fine pixels — i27's (sum, count) coarsen math
    * ([[graft.operators.Ingest.i27]]); all-nodata blocks stay nodata.
    * Pixel scale doubles, the tiepoint (outer corner of pixel (0,0))
    * is unchanged, so overview georeferencing stays exact. */
  def coarsen2x(r: Raster): Raster = {
    val w2 = (r.width + 1) / 2
    val h2 = (r.height + 1) / 2
    val out = new Array[Double](w2 * h2)
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        var sum = 0.0; var cnt = 0
        var dy = 0
        while (dy < 2) {
          val yy = y * 2 + dy
          if (yy < r.height) {
            var dx = 0
            while (dx < 2) {
              val xx = x * 2 + dx
              if (xx < r.width) {
                val v = r.values(yy * r.width + xx)
                if (!r.isNodata(v) && !v.isNaN) { sum += v; cnt += 1 }
              }
              dx += 1
            }
          }
          dy += 1
        }
        out(y * w2 + x) =
          if (cnt == 0) r.nodata.getOrElse(Double.NaN) else sum / cnt
        x += 1
      }
      y += 1
    }
    Raster(w2, h2, r.scaleX * 2, r.scaleY * 2, r.tieX, r.tieY, r.nodata, out)
  }

  /** Encode a raster as a Cloud-Optimized-GeoTIFF-layout TIFF — the
    * reference's actual product contract (`ingest/utils.py:72` writes
    * every published raster with `driver="COG"`): TILED layout (tags
    * 322/323/324/325, tile dims a multiple of 16 per TIFF 6.0 §15),
    * an internal overview pyramid as chained IFDs flagged
    * NewSubfileType=1 (reduced-resolution, TIFF 6.0 §8), each level
    * 2×-coarsened by [[coarsen2x]] until it fits `minOverviewDim`,
    * and ALL IFD structures packed at the FRONT of the file before any
    * tile bytes — the COG property that lets a remote reader fetch one
    * bounded header range and then only the tile ranges it needs.
    * Every IFD carries its own geo tags (scale doubled per level) and
    * nodata, so each level decodes self-contained via
    * `decode(bytes, ifdIndex)`. Edge tiles pad with nodata; pad pixels
    * sit past width/height and are ignored by the tile decoder. */
  /** Writer-side mirror of decode's 2^27-pixel cap: the engine must
    * never publish a raster it then refuses to read (r14 review). */
  private def validateSize(r: Raster): Unit =
    require(r.width >= 1 && r.height >= 1 &&
      r.width.toLong * r.height <= (1L << 27),
      s"raster ${r.width}x${r.height} is empty or past the 2^27-pixel " +
        "single-raster cap the decoder enforces")

  def encodeCog(r: Raster, tileSize: Int = 256, float32: Boolean = true,
      deflate: Boolean = false, minOverviewDim: Int = 64): Array[Byte] = {
    validateSize(r)
    require(tileSize % 16 == 0 && tileSize > 0,
      s"TIFF 6.0 §15: tile dims must be positive multiples of 16, got $tileSize")
    val levels = scala.collection.mutable.ArrayBuffer(r)
    while (math.max(levels.last.width, levels.last.height) > minOverviewDim)
      levels += coarsen2x(levels.last)
    val bps = if (float32) 4 else 2
    val pad = r.nodata.getOrElse(0.0)

    // per level: padded (and optionally deflated) tile byte chunks
    final case class Lvl(rr: Raster, tiles: Array[Array[Byte]])
    val lvls = levels.toArray.map { rr =>
      val across = (rr.width + tileSize - 1) / tileSize
      val down = (rr.height + tileSize - 1) / tileSize
      val tiles = Array.tabulate(across * down) { t =>
        val tx = (t % across) * tileSize
        val ty = (t / across) * tileSize
        val buf = ByteBuffer.allocate(tileSize * tileSize * bps)
          .order(ByteOrder.LITTLE_ENDIAN)
        var i = 0
        while (i < tileSize * tileSize) {
          val x = tx + i % tileSize; val y = ty + i / tileSize
          val v = if (x < rr.width && y < rr.height) rr.values(y * rr.width + x)
                  else pad
          if (float32) buf.putFloat(v.toFloat) else buf.putShort(v.toShort)
          i += 1
        }
        if (deflate) deflateBytes(buf.array()) else buf.array()
      }
      Lvl(rr, tiles)
    }

    val ndAscii = r.nodata.map(nodataString)
    def nTags(i: Int): Int =
      12 + (if (i > 0) 1 else 0) + (if (ndAscii.isDefined) 1 else 0)
    // IFD region = entry block + its out-of-line data (tile offset /
    // bytecount arrays when >1 tile, geo doubles, nodata ascii)
    def regionSize(i: Int): Int = {
      val n = lvls(i).tiles.length
      2 + nTags(i) * 12 + 4 +
        (if (n > 1) 8 * n else 0) + 24 + 48 +
        // region envelope pads an odd nodata ascii to even, so the
        // NEXT region's IFD starts word-aligned (the ascii is the
        // region's last out-of-line value; its tag count stays real)
        ndAscii.map(a => (a.length + 1) & ~1).getOrElse(0)
    }
    val regionOffs = lvls.indices.scanLeft(8)((acc, i) => acc + regionSize(i))
    val dataStart = regionOffs.last
    var cursor = dataStart.toLong
    val tileOffs = lvls.map(_.tiles.map { t =>
      // TIFF 6.0 word-alignment: values live on even offsets, so pad
      // odd-length (deflate) payloads in PLACEMENT only — the byte
      // counts written to TileByteCounts stay the real compressed size
      val o = if (cursor % 2 == 1) cursor + 1 else cursor
      cursor = o + t.length; o
    })
    require(cursor <= Int.MaxValue,
      s"COG too large for the in-memory classic-TIFF writer ($cursor bytes)")

    val out = ByteBuffer.allocate(cursor.toInt).order(ByteOrder.LITTLE_ENDIAN)
    out.put('I'.toByte).put('I'.toByte).putShort(42).putInt(8)
    lvls.zipWithIndex.foreach { case (l, i) =>
      val rr = l.rr
      val n = l.tiles.length
      out.position(regionOffs(i))
      out.putShort(nTags(i).toShort)
      var aux = regionOffs(i) + 2 + nTags(i) * 12 + 4
      def outOfLine(bytes: Array[Byte]): Long = {
        val o = aux
        val p = out.position()
        out.position(aux); out.put(bytes); aux = out.position()
        out.position(p)
        o.toLong
      }
      def leLongs(vs: Array[Long]): Array[Byte] = {
        val b = ByteBuffer.allocate(4 * vs.length).order(ByteOrder.LITTLE_ENDIAN)
        vs.foreach(v => b.putInt(v.toInt))
        b.array()
      }
      def leDoubles(vs: Array[Double]): Array[Byte] = {
        val b = ByteBuffer.allocate(8 * vs.length).order(ByteOrder.LITTLE_ENDIAN)
        vs.foreach(b.putDouble)
        b.array()
      }
      def putEntry(tag: Int, typ: Int, count: Int, value: Long): Unit =
        out.putShort(tag.toShort).putShort(typ.toShort)
          .putInt(count).putInt(value.toInt)
      // entries MUST be in ascending tag order (TIFF 6.0 §2)
      if (i > 0) putEntry(254, 4, 1, 1L) // NewSubfileType: reduced-resolution
      putEntry(TImageWidth, 4, 1, rr.width.toLong)
      putEntry(TImageLength, 4, 1, rr.height.toLong)
      putEntry(TBitsPerSample, 3, 1, (bps * 8).toLong)
      putEntry(TCompression, 3, 1, if (deflate) 8L else 1L)
      putEntry(TPhotometric, 3, 1, 1L)
      putEntry(TTileWidth, 3, 1, tileSize.toLong)
      putEntry(TTileLength, 3, 1, tileSize.toLong)
      putEntry(TTileOffsets, 4, n,
        if (n == 1) tileOffs(i)(0) else outOfLine(leLongs(tileOffs(i))))
      putEntry(TTileByteCounts, 4, n,
        if (n == 1) l.tiles(0).length.toLong
        else outOfLine(leLongs(l.tiles.map(_.length.toLong))))
      putEntry(TSampleFormat, 3, 1, if (float32) 3L else 2L)
      putEntry(TModelPixelScale, 12, 3,
        outOfLine(leDoubles(Array(rr.scaleX, rr.scaleY, 0.0))))
      putEntry(TModelTiepoint, 12, 6,
        outOfLine(leDoubles(Array(0.0, 0.0, 0.0, rr.tieX, rr.tieY, 0.0))))
      ndAscii.foreach(s =>
        putEntry(TGdalNodata, 2, s.length, outOfLine(s.getBytes("US-ASCII"))))
      out.putInt(if (i < lvls.length - 1) regionOffs(i + 1) else 0)
    }
    lvls.zip(tileOffs).foreach { case (l, offs) =>
      l.tiles.zip(offs).foreach { case (t, o) =>
        out.position(o.toInt); out.put(t)
      }
    }
    out.array()
  }

  /** Encode a single-band raster as a classic little-endian TIFF:
    * float32 (`sampleFormat = 3`) or int16 (`2`), one strip, optional
    * deflate. Geo tags written when scale/tiepoint provided. */
  def encode(r: Raster, float32: Boolean = true, deflate: Boolean = false): Array[Byte] = {
    validateSize(r)
    val n = r.width * r.height
    val bytesPerSample = if (float32) 4 else 2
    val raw = ByteBuffer.allocate(n * bytesPerSample).order(ByteOrder.LITTLE_ENDIAN)
    r.values.foreach { v =>
      if (float32) raw.putFloat(v.toFloat) else raw.putShort(v.toShort)
    }
    val pixelData = if (!deflate) raw.array() else deflateBytes(raw.array())
    val nodataAscii = r.nodata.map(nodataString)
    // layout: header(8) | IFD | geo doubles | nodata ascii | pixels
    val tags = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long, Long)]
    val nTags = 11 + (if (nodataAscii.isDefined) 1 else 0)
    val ifdOff = 8
    val ifdSize = 2 + nTags * 12 + 4
    val scaleOff = ifdOff + ifdSize
    val tieOff = scaleOff + 3 * 8
    val nodataOff = tieOff + 6 * 8
    val pixOff = nodataOff + nodataAscii.map(_.length).getOrElse(0)
    tags += ((TImageWidth, 3, 1L, r.width.toLong))
    tags += ((TImageLength, 3, 1L, r.height.toLong))
    tags += ((TBitsPerSample, 3, 1L, (bytesPerSample * 8).toLong))
    tags += ((TCompression, 3, 1L, if (deflate) 8L else 1L))
    // PhotometricInterpretation is baseline-REQUIRED by TIFF 6.0 §8 —
    // this writer's own decoder never needed it, but strict libtiff/
    // GDAL consumers of published products warn or reject without it
    // (r8 advice). 1 = BlackIsZero, the only sane value for one-band
    // measurement rasters.
    tags += ((TPhotometric, 3, 1L, 1L))
    tags += ((TStripOffsets, 4, 1L, pixOff.toLong))
    tags += ((TRowsPerStrip, 3, 1L, r.height.toLong))
    tags += ((TStripByteCounts, 4, 1L, pixelData.length.toLong))
    tags += ((TSampleFormat, 3, 1L, if (float32) 3L else 2L))
    tags += ((TModelPixelScale, 12, 3L, scaleOff.toLong))
    tags += ((TModelTiepoint, 12, 6L, tieOff.toLong))
    nodataAscii.foreach(s => tags += ((TGdalNodata, 2, s.length.toLong, nodataOff.toLong)))

    val out = ByteBuffer.allocate(pixOff + pixelData.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdOff)
    out.putShort(tags.size.toShort)
    tags.sortBy(_._1).foreach { case (tag, typ, count, value) =>
      out.putShort(tag.toShort).putShort(typ.toShort)
        .putInt(count.toInt).putInt(value.toInt)
    }
    out.putInt(0) // no next IFD
    out.putDouble(r.scaleX).putDouble(r.scaleY).putDouble(0.0)
    // tiepoint pins raster (0,0) to the model-space OUTER corner
    out.putDouble(0.0).putDouble(0.0).putDouble(0.0)
      .putDouble(r.tieX).putDouble(r.tieY).putDouble(0.0)
    nodataAscii.foreach(s => out.put(s.getBytes("US-ASCII")))
    out.put(pixelData)
    out.array()
  }

  /** Distributed raster→rows decode: every file matching `path`
    * (Spark binaryFile glob) decodes INSIDE its task and emits one row
    * per pixel — `(path, x, y, lon, lat, value)`, nodata pixels
    * dropped (`keepNodata = true` keeps them with value NULL). The
    * driver never sees pixel bytes; a raster archive decodes with full
    * cluster parallelism and downstream grid operators (i27 coarsen,
    * i28 focal, i30 zonal, i11 contours) consume the rows directly. */
  def readRaster(spark: SparkSession, path: String,
      keepNodata: Boolean = false): DataFrame = {
    import spark.implicits._
    val files = spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
    files.mapPartitions { it =>
      it.flatMap { case (p, bytes) =>
        val r = decode(bytes)
        for {
          y <- Iterator.range(0, r.height)
          x <- Iterator.range(0, r.width)
          v = r.value(x, y)
          isNd = r.isNodata(v)
          if keepNodata || !isNd
        } yield (p, x, y, r.lonOf(x), r.latOf(y),
          if (isNd) None else Some(v))
      }
    }.toDF("path", "x", "y", "lon", "lat", "value")
  }

  /** Publish one grid DataFrame (x, y, value columns over a dense
    * `width`×`height` raster) as the reference's per-date tif layout
    * `{outDir}/{namespace}/{namespace}_{dateKey}.tif`. Missing cells
    * become `nodata`. Grid-sized driver collect — this writes the
    * PRODUCT raster (bounded by grid resolution), not data-plane
    * volume (the i39/i27 stance). */
  def publishTif(grid: DataFrame, xCol: String, yCol: String, vCol: String,
      width: Int, height: Int, outDir: String, namespace: String,
      dateKey: String, scaleX: Double = 1.0, scaleY: Double = 1.0,
      tieX: Double = 0.0, tieY: Double = 0.0,
      nodata: Double = -9999.0, cog: Boolean = false,
      // `.tif.gz` publish (the CHIRPS distribution shape) — the DSv2
      // scan and decode() read it back transparently
      gzip: Boolean = false,
      maxDriverCells: Long = DriverPublishMaxCells): java.nio.file.Path = {
    require(width.toLong * height <= maxDriverCells,
      s"grid ${width}x$height exceeds the driver-collect publish budget " +
        s"($maxDriverCells cells) — use publishTifTasks, which " +
        "encodes each date inside an executor task")
    val values = Array.fill(width * height)(nodata)
    grid.select(col(xCol).cast("int"), col(yCol).cast("int"),
        col(vCol).cast("double"))
      .collect().foreach { row =>
        // null coordinates (outer-join artifacts) skip like null
        // values — the publish must mask, not NPE (review finding r8)
        if (!row.isNullAt(0) && !row.isNullAt(1) && !row.isNullAt(2)) {
          val (x, y) = (row.getInt(0), row.getInt(1))
          if (x >= 0 && x < width && y >= 0 && y < height)
            values(y * width + x) = row.getDouble(2)
        }
      }
    val r = Raster(width, height, scaleX, scaleY, tieX, tieY,
      Some(nodata), values)
    val bytes = if (cog) encodeCog(r) else encode(r)
    writeAtomic(java.nio.file.Paths.get(outDir, namespace),
      s"${namespace}_$dateKey.tif${if (gzip) ".gz" else ""}",
      if (gzip) Gz.gzip(bytes) else bytes)
  }

  /** Driver-collect ceiling for [[publishTif]] (cells). A 4096×4096
    * float64 values array is ~128 MB of driver heap; anything bigger
    * must go through the task-side path. */
  val DriverPublishMaxCells: Long = 4096L * 4096L

  private def writeAtomic(dir: java.nio.file.Path, name: String,
      bytes: Array[Byte]): java.nio.file.Path = {
    java.nio.file.Files.createDirectories(dir)
    val dest = dir.resolve(name)
    val tmp = dir.resolve(s".tmp-${java.util.UUID.randomUUID()}")
    java.nio.file.Files.write(tmp, bytes)
    java.nio.file.Files.move(tmp, dest,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    dest
  }

  /** Task-side per-date publish for grids past the driver budget: the
    * grid shuffles ONCE keyed by `tCol`, each date's rows stream into
    * ONE executor task that materializes only ITS date's raster array,
    * encodes with the same [[encode]]/[[encodeCog]] bytes as the
    * driver path (spec-asserted byte-identical), writes a task-temp
    * file and atomically renames it into the layout — so a year of
    * high-res products encodes with cluster parallelism while the
    * driver only collects the (date, path) manifest (one tiny row per
    * date) and commits it. Requires `outDir` on a task-visible shared
    * filesystem (local-mode tests share the local fs; a cluster uses
    * the shared product volume the reference's publish dir implies).
    * Memory per task = one raster array (width×height doubles), bounded
    * by product RESOLUTION, never by input data volume. */
  def publishTifTasks(grid: DataFrame, tCol: String, xCol: String,
      yCol: String, vCol: String, width: Int, height: Int, outDir: String,
      namespace: String, scaleX: Double = 1.0, scaleY: Double = 1.0,
      tieX: Double = 0.0, tieY: Double = 0.0, nodata: Double = -9999.0,
      cog: Boolean = false): Seq[(String, String)] = {
    val spark = grid.sparkSession
    import spark.implicits._
    val manifest = grid
      .filter(col(tCol).isNotNull) // a null date keys no product file
      .select(col(tCol).cast("string"), col(xCol).cast("int"),
        col(yCol).cast("int"), col(vCol).cast("double"))
      .as[(String, Option[Int], Option[Int], Option[Double])]
      .groupByKey(_._1)
      .mapGroups { (dateKey, rows) =>
        val values = Array.fill(width * height)(nodata)
        rows.foreach {
          case (_, Some(x), Some(y), Some(v)) =>
            if (x >= 0 && x < width && y >= 0 && y < height)
              values(y * width + x) = v
          case _ => () // null artifacts mask, like the driver path
        }
        val r = Raster(width, height, scaleX, scaleY, tieX, tieY,
          Some(nodata), values)
        val bytes = if (cog) encodeCog(r) else encode(r)
        val dest = writeAtomic(java.nio.file.Paths.get(outDir, namespace),
          s"${namespace}_$dateKey.tif", bytes)
        (dateKey, dest.toString)
      }
      .collect().toSeq.sortBy(_._1)
    // the driver's only write: the layout manifest, committed last so
    // a partial job never looks complete
    val manifestBytes = manifest
      .map { case (d, p) => s"$d\t${new java.io.File(p).getName}" }
      .mkString("", "\n", "\n").getBytes("UTF-8")
    writeAtomic(java.nio.file.Paths.get(outDir, namespace),
      "manifest.tsv", manifestBytes)
    manifest
  }
}
