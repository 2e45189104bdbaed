package graft.sources

/** Bounded gzip plumbing for gzip-wrapped archive files — the CHIRPS
  * distribution shape (the reference's
  * `ingest/chirps_rainfall/__init__.py:334` downloads `*.tif.gz` and
  * gunzips before decoding; the engine unwraps at the codec boundary
  * instead so `.tif.gz` archives read as first-class tables).
  * Byte-level and allocation-gated: [[gunzip]] inflates with a hard
  * output cap so a corrupt or adversarial stream never requests
  * unbounded memory, and renames the JDK's ZipException/EOFException
  * (IOException subclasses [[CodecGate]] deliberately passes through
  * for live-filesystem paths) to named refusals — with a byte-array
  * source, corrupt input is the only plausible cause. */
object Gz {

  /** RFC 1952 magic sniff — the dispatch the codec entries use, so a
    * plain file never pays an inflation attempt. */
  def isGz(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && bytes(0) == 0x1f.toByte && bytes(1) == 0x8b.toByte

  /** Inflate a gzip member chain to at most `cap` bytes, counting as
    * it streams — the refusal fires BEFORE the over-cap chunk is
    * buffered, so a gzip bomb costs at most `cap` memory. Refusals
    * name `what`. */
  def gunzip(bytes: Array[Byte], cap: Long, what: String): Array[Byte] = {
    require(isGz(bytes), s"$what: not a gzip stream")
    val out = new java.io.ByteArrayOutputStream(
      math.min(math.max(bytes.length.toLong * 4, 1024), 1L << 20).toInt)
    def rename(e: java.io.IOException): Nothing =
      throw new IllegalArgumentException(
        s"$what: corrupt or truncated gzip stream — ${e.getMessage}", e)
    val in =
      try new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch { case e: java.io.IOException => rename(e) }
    // finally-close even on the refusal path — GZIPInputStream holds a
    // native Inflater buffer that otherwise waits for GC
    try {
      val buf = new Array[Byte](64 * 1024)
      var total = 0L
      var n = in.read(buf)
      while (n > 0) {
        total += n
        require(total <= cap,
          s"$what: gzip payload exceeds the $cap-byte inflation cap")
        out.write(buf, 0, n)
        n = in.read(buf)
      }
    } catch {
      case e: java.io.IOException => rename(e)
    } finally in.close()
    out.toByteArray
  }

  /** Inflate at most `maxOut` bytes from a bounded INPUT PREFIX of a
    * gzip stream — the planner-side rung of the bounded-header-read
    * discipline (a DSv2 planner must never buffer whole cubes, even
    * wrapped ones). TOLERANT by design: the input being truncated
    * mid-stream is the expected case for a prefix, so an IO error
    * after some output simply returns what inflated — the STRICT
    * decode (and its named refusals) happens task-side via
    * [[gunzip]]. */
  def gunzipPrefix(inputPrefix: Array[Byte], maxOut: Int): Array[Byte] = {
    require(isGz(inputPrefix), "not a gzip stream")
    val out = new java.io.ByteArrayOutputStream(
      math.min(maxOut, 1 << 20))
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(inputPrefix))
      try {
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf, 0, math.min(buf.length, maxOut))
        while (n > 0 && out.size() < maxOut) {
          out.write(buf, 0, math.min(n, maxOut - out.size()))
          n = in.read(buf, 0, math.min(buf.length, maxOut - out.size()))
        }
      } finally in.close()
    } catch {
      case _: java.io.IOException => () // truncated input — expected
    }
    out.toByteArray
  }

  /** DEFLATE's hard maximum expansion: a stream of `n` compressed
    * bytes cannot legally inflate past ~1032×`n` — zlib's documented
    * worst case (an RFC 1951 length/distance pair emits at most 258
    * bytes and costs at least two bits in the most degenerate dynamic
    * Huffman code: 4×258 = 1032 output bytes per input byte). Holds
    * per member, therefore for member CHAINS too — so
    * `compressedLen × 1032` is an inflation cap that can NEVER refuse
    * a legitimate gzip file, yet bounds what a crafted few-KB bomb can
    * make a decoder allocate to a few MB (r15 advice: the
    * format-maximum array cap accepted a ~2 GiB allocation from a
    * tiny input before any content gate ran). */
  val MaxDeflateRatio = 1032L

  /** Inflation cap derived from the compressed length via
    * [[MaxDeflateRatio]], with a small constant floor so degenerate
    * tiny inputs (a ~20-byte gzip of an empty file) never compute a
    * cap below their legal output. */
  def deflateBound(compressedLen: Long): Long =
    compressedLen * MaxDeflateRatio + 4096L

  /** [[gunzip]] with the ONE standard two-sided inflation cap: the
    * smaller of [[deflateBound]] (can never refuse a legitimate
    * stream, bounds a crafted few-KB bomb to a few MB) and the
    * byte-array maximum (every codec wraps one in-memory array).
    * GeoTiff, GribMeta, and NetCdf all unwrap through here — the
    * bound is policy, defined once (r17 review: it had drifted into
    * three verbatim copies). */
  def gunzipBounded(bytes: Array[Byte], what: String): Array[Byte] =
    gunzip(bytes, math.min(Int.MaxValue - 16L, deflateBound(bytes.length)), what)

  /** Default `probeLen` for [[gunzipHeaderBounded]] — ONE probe-size
    * policy for every format that derives its extent from a header
    * prefix (r17 review: GeoTiff and NetCdf each carried their own
    * copy of this constant, free to drift). 1 MiB of INFLATED output
    * comfortably holds every front-packed header shape the deriving
    * codecs see (chained TIFF IFDs + value arrays, a classic NetCDF
    * dim/att/var table); a header that does not fit falls back to the
    * deflate bound by returning None. */
  val HeaderProbeLen: Int = 1 << 20

  /** Two-stage header-derived inflation bound (r16 verdict, optional
    * hardening (a)): inflate the first `probeLen` output bytes, let
    * `derive` compute the file's own declared content extent from that
    * prefix, then buffer only `max(derive, probeLen)` bytes while
    * still DRAINING the stream to its end — so the gzip trailer
    * (CRC32 + ISIZE) is validated exactly as in [[gunzip]].
    *
    * Three outcomes, none of which can refuse a legitimate file:
    *   - the stream ends inside the probe → the whole (small) file,
    *     fully validated — the common small-product path, unchanged;
    *   - `derive(prefix)` = Some(need) → the buffer stops growing at
    *     `max(need, probeLen)` but inflation continues through a
    *     scratch window to the end of the member chain: trailing bytes
    *     no declared structure references are DISCARDED, not refused
    *     (a rewritten archive's dead tail must keep decoding), and a
    *     corrupt trailer still refuses by name;
    *   - `derive(prefix)` = None (the header cannot be bounded from
    *     the probe) → fall back to buffering under the
    *     [[gunzipBounded]] two-sided cap — today's exact behavior.
    *
    * Closes the allocation margin [[deflateBound]] leaves open: a
    * crafted stream that LIES small in its header now allocates only
    * its declared extent (plus the probe), and one with no parseable
    * header at all allocates at most the probe before the decoder's
    * magic gate refuses it — while total inflation WORK stays bounded
    * by the same two-sided cap. `derive` must be a TRUE upper bound on
    * every byte the decoder can reference (truncating there must be
    * invisible), total (never throw — it runs on fuzzed prefixes), and
    * must return None whenever it cannot tell. */
  def gunzipHeaderBounded(bytes: Array[Byte], what: String,
      probeLen: Int = HeaderProbeLen)(
      derive: Array[Byte] => Option[Long]): Array[Byte] = {
    require(isGz(bytes), s"$what: not a gzip stream")
    require(probeLen > 0, s"$what: probeLen must be positive")
    val hardCap = math.min(Int.MaxValue - 16L, deflateBound(bytes.length))
    def rename(e: java.io.IOException): Nothing =
      throw new IllegalArgumentException(
        s"$what: corrupt or truncated gzip stream — ${e.getMessage}", e)
    val in =
      try new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch { case e: java.io.IOException => rename(e) }
    val out = new java.io.ByteArrayOutputStream(
      math.min(math.max(bytes.length.toLong * 4, 1024), 1L << 20).toInt)
    var keep = -1L // buffer ceiling; -1 until the probe resolves it
    try {
      val buf = new Array[Byte](64 * 1024)
      var total = 0L // total inflated bytes seen (kept + discarded)
      // probe-phase reads stop AT the probe boundary, so at resolution
      // time the buffer holds exactly probeLen bytes and its toByteArray
      // IS the prefix — one copy, not copy-then-copyOf (r17 review)
      def readNext(): Int = in.read(buf, 0,
        if (keep < 0) math.min(buf.length, probeLen - out.size()) else buf.length)
      var n = readNext()
      while (n > 0) {
        total += n
        require(total <= hardCap,
          s"$what: gzip payload exceeds the $hardCap-byte inflation cap")
        if (keep < 0) {
          out.write(buf, 0, n)
          if (out.size() >= probeLen)
            keep = derive(out.toByteArray)
              .map(need => math.min(math.max(need, probeLen.toLong), hardCap))
              .getOrElse(hardCap)
        } else if (out.size() < keep) {
          out.write(buf, 0, math.min(n.toLong, keep - out.size()).toInt)
        } // else: discard — dead bytes past every declared structure
        n = readNext()
      }
    } catch { case e: java.io.IOException => rename(e) }
    finally in.close()
    val arr = out.toByteArray
    if (keep >= 0 && arr.length > keep) java.util.Arrays.copyOf(arr, keep.toInt)
    else arr
  }

  /** Uncompressed length from the gzip ISIZE trailer (`tail` is the
    * stream's LAST FOUR bytes, little-endian u32) — exact for
    * single-member streams under 4 GiB; callers validate consistency
    * and fall back to a whole-file decode otherwise. */
  def isize(tail: Array[Byte]): Long = {
    require(tail.length == 4, s"ISIZE needs the last 4 bytes, got ${tail.length}")
    (tail(0) & 0xffL) | ((tail(1) & 0xffL) << 8) |
      ((tail(2) & 0xffL) << 16) | ((tail(3) & 0xffL) << 24)
  }

  /** Gunzip-on-landing: stream-inflate a gzip-wrapped LANDED file to
    * its unwrapped sibling (`x.grb.gz` → `x.grb`) and delete the
    * wrapped original — the reference's own acquisition shape
    * (`chirps_rainfall/__init__.py:334` downloads `*.tif.gz` and
    * gunzips before decoding). Landing unwrapped is the SCALE path
    * for formats whose DSv2 planner fans out per record: gzip is not
    * seekable, so a wrapped GRIB archive plans ONE whole-file split
    * while its unwrapped twin plans per-message
    * ([[GribGridSource]]).
    *
    * Keeps the atomic-landing contract ([[HttpFetcher]]): inflates to
    * a `.tmp-*` sibling in 64 KiB chunks (memory never holds the
    * archive), atomically moves into place, deletes the wrapped file
    * LAST — a crash leaves either the wrapped original (retry
    * re-unwraps) or both twins momentarily (re-unwrap is an
    * idempotent overwrite), never a torn output. The wrapped original
    * must go: a landing-dir listing holding both twins would read
    * every message twice. Corrupt/truncated streams refuse by name
    * (ZipException/EOFException renamed); genuine filesystem errors
    * pass through as IO. */
  def gunzipLanding(gzPath: java.nio.file.Path,
      cap: Long = 1L << 33): java.nio.file.Path = {
    import java.nio.file.{Files, StandardCopyOption}
    val name = gzPath.getFileName.toString
    val dest = unwrappedSibling(gzPath)
    val tmp = gzPath.resolveSibling(s".tmp-${java.util.UUID.randomUUID()}")
    try {
      val in = new java.util.zip.GZIPInputStream(Files.newInputStream(gzPath))
      try {
        val out = Files.newOutputStream(tmp)
        try {
          val buf = new Array[Byte](64 * 1024)
          var total = 0L
          var n = in.read(buf)
          while (n > 0) {
            total += n
            require(total <= cap,
              s"$name: gzip payload exceeds the $cap-byte inflation cap")
            out.write(buf, 0, n)
            n = in.read(buf)
          }
        } finally out.close()
      } finally in.close()
      try Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
        Files.move(tmp, dest, StandardCopyOption.REPLACE_EXISTING)
      }
    } catch {
      case e @ (_: java.util.zip.ZipException | _: java.io.EOFException) =>
        Files.deleteIfExists(tmp)
        throw new IllegalArgumentException(
          s"$name: corrupt or truncated gzip stream — ${e.getMessage}", e)
      case e: Throwable =>
        Files.deleteIfExists(tmp)
        throw e
    }
    deleteWrapped(gzPath, dest)
    dest
  }

  /** The unwrapped-sibling path gunzip-on-landing of `gzPath` produces
    * (`x.grb.gz` → `x.grb`): the name must end `.gz` (any case — the
    * landing accepts what remotes actually serve), exactly three
    * characters are stripped, and the stem is preserved VERBATIM. One
    * derivation, shared by [[gunzipLanding]] (its dest) and
    * `HttpFetcher.fetchGunzippedIfChanged` (its validator anchor), so
    * the two can never drift apart — a drifted anchor would silently
    * disable the 304 skip and re-download every cycle (r16 review). */
  def unwrappedSibling(gzPath: java.nio.file.Path): java.nio.file.Path = {
    val name = gzPath.getFileName.toString
    require(name.length > 3 && name.toLowerCase.endsWith(".gz"),
      s"$name: gunzip-on-landing needs a '.gz'-suffixed name to strip")
    gzPath.resolveSibling(name.dropRight(3))
  }

  /** Final step of [[gunzipLanding]]: remove the wrapped original once
    * the unwrapped twin is in place. `deleteIfExists`, not `delete` — a
    * concurrent or re-entrant cycle that already unwrapped the same
    * file leaves nothing to remove, and that cycle's landing SUCCEEDED
    * (r15 advice: the both-twins-momentarily crash window already
    * treats the wrapped original as optionally present). A delete that
    * genuinely fails (the file is there but won't go) rethrows with
    * the operational context the raw IO error lacks: both twins now
    * co-exist, and until the wrapped one is removed a landing-dir
    * listing would double-read the archive — the connectors'
    * co-listed-twin guard ([[GridFiles.list]]) masks that, but an
    * operator cleaning up by hand needs to know which file to drop. */
  private[graft] def deleteWrapped(gzPath: java.nio.file.Path,
      dest: java.nio.file.Path): Unit =
    try java.nio.file.Files.deleteIfExists(gzPath)
    catch {
      case e: java.io.IOException => throw new java.io.IOException(
        s"${gzPath.getFileName}: unwrapped sibling landed at " +
          s"${dest.getFileName} but deleting the wrapped original " +
          s"failed — both twins co-exist until ${gzPath.getFileName} " +
          "is removed (listings guard against the double-read, but the " +
          "wrapped copy is now residue)", e)
    }

  /** Deterministic gzip (the JDK writes MTIME/XFL/OS as zeros, so the
    * same input always produces the same bytes — the publish twins'
    * hash gates rely on it). */
  def gzip(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(bytes.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(bytes)
    gz.finish()
    gz.close()
    bos.toByteArray
  }
}
