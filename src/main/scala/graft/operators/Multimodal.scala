package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** C-family multimodal plumbing (SURVEY.md §2 m01).
  *
  * Images/audio/video ride through the engine as opaque `binary`
  * payloads plus typed metadata columns; per-batch decode/feature
  * extraction runs in `mapPartitions` over a typed Dataset — the Scala
  * analogue of Arrow-batched python UDFs, and the one sanctioned
  * mapPartitions use (opaque byte decoding cannot be a Column
  * expression). The decode itself is STUBBED with a deterministic fake
  * (no media codecs in this environment) chosen to be replicable in
  * SQL, so the whole plumbing — binary cast, partition batches, typed
  * Encoders, re-aggregation — is DuckDB-oracled, not just row-counted.
  */
object Multimodal {

  /** Typed row for the binary-payload stage. */
  final case class Blob(doc_id: Long, source: String, payload: Array[Byte])

  /** Extracted features per blob. */
  final case class BlobFeatures(doc_id: Long, source: String,
      n_bytes: Int, checksum: Long, feature0: Double)

  private val Mod = graft.functions.Text.RollMod

  /** STUB decode: a real build would decode image/audio bytes here
    * (per-partition, so codec state is reused across a batch). The
    * deterministic fake is the polynomial rolling hash of the bytes —
    * the same recurrence as `graft_rolling_fp`, so the oracle can
    * recompute it from the text. */
  private def decodeStub(payload: Array[Byte]): (Long, Double) = {
    var h = 0L
    var i = 0
    while (i < payload.length) { h = (h * 31 + (payload(i) & 0xff)) % Mod; i += 1 }
    (h, (h % 65536L).toDouble / 65536.0)
  }

  // The stub checksum walks UTF-8 BYTES while the DuckDB oracle walks
  // CHARS (SUBSTR/LENGTH/ASCII are codepoint-based), so both engines
  // gate on ASCII rows (chars == bytes ⇔ LENGTH = OCTET_LENGTH) —
  // parity then holds for arbitrary corpora instead of only
  // accidentally for all-ASCII ones. A real decode consumes raw bytes
  // and needs no such gate; this is purely the oracle-portability
  // boundary of the stub.
  val m01 = QueryDef(
    "m01_multimodal_meta",
    """WITH f AS (
      |  SELECT source, LENGTH(text) AS n_bytes,
      |    LIST_REDUCE(
      |      LIST_PREPEND(CAST(0 AS BIGINT),
      |        LIST_TRANSFORM(STRING_SPLIT(text, ''), c -> CAST(ASCII(c) AS BIGINT))),
      |      (a, b) -> (a * 31 + b) % 1000000000000037) AS checksum
      |  FROM documents
      |  WHERE LENGTH(text) = OCTET_LENGTH(ENCODE(text)))
      |SELECT source, COUNT(*) AS n_blobs,
      |  CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
      |  ROUND(AVG((checksum % 65536) / 65536.0) + 1e-9, 4) AS avg_feature0
      |FROM f GROUP BY source ORDER BY source""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val blobs = Tables(spark, dir).documents
      .filter(length(col("text")) === octet_length(col("text")))
      .select(col("doc_id"), col("source"),
        col("text").cast("binary").as("payload"))
      .as[Blob]
    val features = blobs.mapPartitions { iter =>
      iter.map { b =>
        val (checksum, f0) = decodeStub(b.payload)
        BlobFeatures(b.doc_id, b.source, b.payload.length, checksum, f0)
      }
    }
    features
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_blobs"),
        sum(col("n_bytes")).as("total_bytes"),
        graft.QueryDef.roundBiased(avg(col("feature0")), 4).as("avg_feature0"))
      .orderBy(col("source"))
  }

  /** One sampled frame's metadata+feature row. */
  final case class Frame(doc_id: Long, frame_idx: Int, frame_bytes: Int, checksum: Long)

  /** m02: frame-sampling plumbing — the video path of a multimodal
    * pipeline: treat each payload as a sequence of fixed-size frames,
    * SAMPLE every k-th frame (here 64-byte frames, stride 4 ⇒ one
    * frame per 256 bytes), and emit one typed row per sampled frame
    * with its decoded feature (stub checksum, as m01). The flatMap
    * inside mapPartitions is the batch shape: one iterator pass per
    * partition, frames emitted without materializing all of them, and
    * the downstream stays columnar. Oracle recomputes every sampled
    * frame via SUBSTR over the same bytes. */
  val m02 = QueryDef(
    "m02_frame_sample",
    """WITH f AS (
      |  SELECT doc_id, text, LENGTH(text) AS n FROM documents
      |  WHERE doc_id % 50 = 0 AND LENGTH(text) > 0
      |    AND LENGTH(text) = OCTET_LENGTH(ENCODE(text))),
      |ix AS (
      |  SELECT doc_id, text, UNNEST(RANGE(0, (n - 1) // 256 + 1)) AS i FROM f),
      |fr AS (
      |  SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
      |         SUBSTR(text, CAST(i AS INTEGER) * 256 + 1, 64) AS frame
      |  FROM ix),
      |ck AS (
      |  SELECT doc_id, frame_idx, LENGTH(frame) AS frame_bytes,
      |    LIST_REDUCE(
      |      LIST_PREPEND(CAST(0 AS BIGINT),
      |        LIST_TRANSFORM(STRING_SPLIT(frame, ''), c -> CAST(ASCII(c) AS BIGINT))),
      |      (a, b) -> (a * 31 + b) % 1000000000000037) AS checksum
      |  FROM fr)
      |SELECT doc_id, frame_idx, frame_bytes, checksum
      |FROM ck ORDER BY doc_id, frame_idx""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val blobs = Tables(spark, dir).documents
      .filter(col("doc_id") % 50 === 0 && length(col("text")) > 0 &&
        length(col("text")) === octet_length(col("text")))
      .select(col("doc_id"), col("source"), col("text").cast("binary").as("payload"))
      .as[Blob]
    blobs.mapPartitions { iter =>
      iter.flatMap { b =>
        val n = b.payload.length
        (0 until ((n - 1) / 256 + 1)).iterator.map { i =>
          val off = i * 256
          val len = math.min(64, n - off)
          var h = 0L
          var j = off
          while (j < off + len) { h = (h * 31 + (b.payload(j) & 0xff)) % Mod; j += 1 }
          Frame(b.doc_id, i, len, h)
        }
      }
    }
      .toDF()
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** One thumbnail row per payload. */
  final case class Thumb(doc_id: Long, n_bytes: Int, thumb_bytes: Int, thumb_checksum: Long)

  /** PNG signature (the 4 magic bytes of the 8-byte header). Payloads
    * are ASCII-gated upstream in the driver queries, so a text payload
    * can never start with 0x89 — the magic cleanly routes real images
    * to the codec and everything else to the stride stub. */
  private[graft] def isPng(p: Array[Byte]): Boolean =
    p.length >= 8 && p(0) == 0x89.toByte && p(1) == 'P'.toByte &&
      p(2) == 'N'.toByte && p(3) == 'G'.toByte

  // in-memory decode only: never let ImageIO spill scratch files on an
  // executor's local disk for KB-scale payloads
  javax.imageio.ImageIO.setUseCache(false)

  /** REAL codec rung for m03 (the r6-verdict ask: prove the
    * mapPartitions batch loop carries an actual decoder without plan
    * changes): decode a PNG via javax.imageio (JDK built-in, public
    * API), box-filter to an 8×8 grayscale thumbnail in pure integer
    * arithmetic (per-pixel gray = (r+g+b)/3 floored; per-cell value =
    * floor mean of its grays; cell bounds by integer division, so any
    * image size maps deterministically), and checksum the 64 gray
    * values with the same rolling hash as the stub. None on any
    * decode failure → the caller falls back to the stride stub, so a
    * corrupt payload degrades instead of failing the batch. */
  /** PNG → the 64 grays of the integer 8×8 box filter (row-major), or
    * None on any decode failure. The shared decode core of m03's
    * thumbnail checksum and m09's average-hash. */
  private[graft] def pngGrays(payload: Array[Byte]): Option[Array[Long]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val grays = new Array[Long](64)
        var cy = 0
        while (cy < 8) {
          var cx = 0
          val y0 = cy * h / 8
          val y1 = math.min(h, math.max(y0 + 1, (cy + 1) * h / 8))
          while (cx < 8) {
            val x0 = cx * w / 8
            val x1 = math.min(w, math.max(x0 + 1, (cx + 1) * w / 8))
            var sum = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val rgb = img.getRGB(x, y)
                sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
                x += 1
              }
              y += 1
            }
            grays(cy * 8 + cx) = sum / ((y1 - y0).toLong * (x1 - x0))
            cx += 1
          }
          cy += 1
        }
        Some(grays)
      }
    } catch { case _: Exception => None }

  private[graft] def pngThumb(payload: Array[Byte]): Option[(Int, Long)] =
    pngGrays(payload).map { grays =>
      var ck = 0L
      var i = 0
      while (i < 64) { ck = (ck * 31 + grays(i)) % Mod; i += 1 }
      (64, ck)
    }

  /** One payload → thumbnail row: PNG-magic payloads take the real
    * codec, everything else (and any failed decode) the stride stub.
    * Shared by m03's mapPartitions batch loop and its codec spec. */
  private[graft] def thumbRow(docId: Long, payload: Array[Byte]): Thumb = {
    val real = if (isPng(payload)) pngThumb(payload) else None
    real match {
      case Some((tb, ck)) => Thumb(docId, payload.length, tb, ck)
      case None =>
        val n = math.min(payload.length, 4096)
        val m = (n + 15) / 16
        var h = 0L
        var i = 0
        while (i < m) { h = (h * 31 + (payload(i * 16) & 0xff)) % Mod; i += 1 }
        Thumb(docId, payload.length, m, h)
    }
  }

  /** m03: resize/downsample plumbing — the third multimodal verb next
    * to m01 (decode/feature-extract) and m02 (frame-sample): reduce
    * each payload to a fixed-budget "thumbnail". Non-image payloads
    * stride the byte stream (every 16th byte of the first 4 KiB);
    * PNG-magic payloads take the REAL codec rung ([[pngThumb]]:
    * javax.imageio decode → integer 8×8 box filter) inside the SAME
    * per-partition batch loop — the plan is identical either way
    * (spec-asserted), which is the point: swapping a codec is a
    * per-row function change, not a pipeline change. Map-only, one
    * typed row out per blob; the driver corpus is ASCII-gated text,
    * so the oracle recomputes the strided sample + checksum via
    * SUBSTR over the same bytes. */
  val m03 = QueryDef(
    "m03_resize_thumb",
    """WITH f AS (
      |  SELECT doc_id, text, LEAST(LENGTH(text), 4096) AS n
      |  FROM documents
      |  WHERE doc_id % 25 = 0 AND LENGTH(text) > 0
      |    AND LENGTH(text) = OCTET_LENGTH(ENCODE(text))),
      |s AS (
      |  SELECT doc_id, CAST(LENGTH(text) AS INTEGER) AS n_bytes,
      |    LIST_TRANSFORM(RANGE(0, (n + 15) // 16),
      |      i -> CAST(ASCII(SUBSTR(text, CAST(i * 16 + 1 AS INTEGER), 1)) AS BIGINT)) AS codes
      |  FROM f)
      |SELECT doc_id, n_bytes,
      |  CAST(LEN(codes) AS INTEGER) AS thumb_bytes,
      |  LIST_REDUCE(LIST_PREPEND(CAST(0 AS BIGINT), codes),
      |    (a, b) -> (a * 31 + b) % 1000000000000037) AS thumb_checksum
      |FROM s ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val blobs = Tables(spark, dir).documents
      .filter(col("doc_id") % 25 === 0 && length(col("text")) > 0 &&
        length(col("text")) === octet_length(col("text")))
      .select(col("doc_id"), col("source"), col("text").cast("binary").as("payload"))
      .as[Blob]
    blobs.mapPartitions { iter =>
      iter.map(b => thumbRow(b.doc_id, b.payload))
    }
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** One blob's perceptual fingerprint. */
  final case class BlobFp(doc_id: Long, fp: Long)

  /** m04: multimodal payload NEAR-DUP — the average-hash (aHash)
    * perceptual dedup recipe on opaque binary payloads, closing the
    * multimodal family with the dedup family's machinery: each payload
    * reduces per-partition to a 60-bit fingerprint (60 byte blocks of
    * the first 4 KiB; bit i = block i's mean byte ≥ the overall mean —
    * compared as exact integers, blockSum·60 ≥ totalSum, so both
    * engines agree bit-for-bit), then d03's Hamming machinery runs
    * columnar: 4 bands × 15 bits bucket candidates (capped — a flood
    * of identical thumbnails can't go quadratic), BIT_COUNT(XOR) ≤ 6
    * confirms. A real build swaps the byte blocks for downscaled
    * pixel/spectrogram blocks inside the same per-partition loop; the
    * banding, capping, pairing, and confirm are the production path
    * unchanged. Fully integer — fingerprints, bands, and Hamming
    * distances all DuckDB-oracled. */
  val m04 = QueryDef(
    "m04_payload_neardup",
    """WITH f AS (
      |  SELECT doc_id, text, LEAST(LENGTH(text), 4096) AS n
      |  FROM documents
      |  WHERE doc_id % 2 = 0 AND LENGTH(text) >= 64
      |    AND LENGTH(text) = OCTET_LENGTH(ENCODE(text))),
      |blk AS (
      |  SELECT doc_id, n // 60 AS s, UNNEST(RANGE(60)) AS i, text FROM f),
      |bsum AS (
      |  SELECT doc_id, i,
      |    LIST_SUM(LIST_TRANSFORM(RANGE(0, s), j ->
      |      CAST(ASCII(SUBSTR(text, CAST(i * s + j + 1 AS INTEGER), 1)) AS BIGINT)))
      |      AS bs
      |  FROM blk),
      |tot AS (SELECT doc_id, CAST(SUM(bs) AS BIGINT) AS ts FROM bsum GROUP BY doc_id),
      |fp AS (
      |  SELECT b.doc_id,
      |    CAST(SUM(CASE WHEN b.bs * 60 >= t.ts
      |      THEN CAST(1 AS BIGINT) << b.i ELSE 0 END) AS BIGINT) AS fp
      |  FROM bsum b JOIN tot t USING (doc_id) GROUP BY b.doc_id),
      |bands AS (
      |  SELECT doc_id, j AS band_idx, (fp >> CAST(15 * j AS INTEGER)) & 32767 AS band_val
      |  FROM fp, (SELECT UNNEST(RANGE(4)) AS j) r),
      |bandc AS (SELECT doc_id, band_idx, band_val FROM (
      |  SELECT *, COUNT(*) OVER (PARTITION BY band_idx, band_val) AS bsz FROM bands) t
      |  WHERE bsz <= 64),
      |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
      |  FROM bandc a JOIN bandc b ON a.band_idx = b.band_idx
      |    AND a.band_val = b.band_val AND a.doc_id < b.doc_id)
      |SELECT c.id1, c.id2,
      |  CAST(BIT_COUNT(XOR(f1.fp, f2.fp)) AS INTEGER) AS hamming
      |FROM cand c JOIN fp f1 ON f1.doc_id = c.id1
      |            JOIN fp f2 ON f2.doc_id = c.id2
      |WHERE BIT_COUNT(XOR(f1.fp, f2.fp)) <= 6
      |ORDER BY id1, id2""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val blobs = Tables(spark, dir).documents
      .filter(col("doc_id") % 2 === 0 && length(col("text")) >= 64 &&
        length(col("text")) === octet_length(col("text")))
      .select(col("doc_id"), col("source"), col("text").cast("binary").as("payload"))
      .as[Blob]
    // per-partition fingerprinting: the batch byte loop a real decoder
    // would run (aHash over downscaled blocks), stubbed on raw bytes
    val fps = blobs.mapPartitions { iter =>
      iter.map { b =>
        val n = math.min(b.payload.length, 4096)
        val s = n / 60
        val sums = new Array[Long](60)
        var i = 0
        while (i < 60) {
          var acc = 0L
          var j = 0
          while (j < s) { acc += (b.payload(i * s + j) & 0xff); j += 1 }
          sums(i) = acc
          i += 1
        }
        val ts = sums.sum
        var fp = 0L
        i = 0
        while (i < 60) { if (sums(i) * 60 >= ts) fp |= 1L << i; i += 1 }
        BlobFp(b.doc_id, fp)
      }
    }.toDF().persist()
    // from here the dedup family's columnar machinery takes over:
    // banded candidates (capped buckets) + Hamming confirm
    val bands = fps
      .withColumn("band_idx", explode(sequence(lit(0), lit(3))))
      .select(col("doc_id"),
        col("band_idx"), expr("shiftright(fp, 15 * band_idx) & 32767").as("band_val"))
    Dedup.bucketPairs(bands.select(col("doc_id"), col("band_idx"), col("band_val")))
      .join(fps.toDF("id1", "fp1"), "id1")
      .join(fps.toDF("id2", "fp2"), "id2")
      .select(col("id1"), col("id2"),
        expr("cast(bit_count(fp1 ^ fp2) as int)").as("hamming"))
      .filter(col("hamming") <= 6)
      .orderBy(col("id1"), col("id2"))
  }

  /** Per-payload audio segmentation summary. */
  final case class AudioSeg(doc_id: Long, n_windows: Int, total_energy: Long,
      peak_win: Int, peak_energy: Long, n_silent: Long)

  /** One energy window (intermediate, emitted per partition batch). */
  final case class AudioWin(doc_id: Long, win_idx: Int, energy: Long)

  /** The f/w/e oracle CTE chain decoding payloads to per-window PCM
    * energies — shared VERBATIM by the m05 and m10 oracles (the SQL
    * twin of [[pcmWindows]]). Exposes `e(doc_id, win_idx, energy)`. */
  private val pcmEnergySql: String =
    """f AS (
      |  SELECT doc_id, text, LENGTH(text) // 2 AS n_samp FROM documents
      |  WHERE doc_id % 50 = 0 AND LENGTH(text) >= 2
      |    AND LENGTH(text) = OCTET_LENGTH(ENCODE(text))),
      |w AS (SELECT doc_id, text, n_samp,
      |    UNNEST(RANGE(0, (n_samp - 1) // 32 + 1)) AS win_idx FROM f),
      |e AS (
      |  SELECT doc_id, CAST(win_idx AS INTEGER) AS win_idx,
      |    LIST_SUM(LIST_TRANSFORM(
      |      RANGE(CAST(win_idx * 32 AS INTEGER),
      |            CAST(LEAST((win_idx + 1) * 32, n_samp) AS INTEGER)),
      |      i -> CAST(POWER(
      |        CASE WHEN ASCII(SUBSTR(text, 2 * CAST(i AS INTEGER) + 1, 1))
      |               + 256 * ASCII(SUBSTR(text, 2 * CAST(i AS INTEGER) + 2, 1))
      |               >= 32768
      |             THEN ASCII(SUBSTR(text, 2 * CAST(i AS INTEGER) + 1, 1))
      |               + 256 * ASCII(SUBSTR(text, 2 * CAST(i AS INTEGER) + 2, 1))
      |               - 65536
      |             ELSE ASCII(SUBSTR(text, 2 * CAST(i AS INTEGER) + 1, 1))
      |               + 256 * ASCII(SUBSTR(text, 2 * CAST(i AS INTEGER) + 2, 1))
      |        END, 2) AS BIGINT))) AS energy
      |  FROM w)""".stripMargin

  /** Shared PCM decode → 32-sample window-energy stage (m05's batch
    * loop, reused verbatim by m10 so the two audio verbs can't drift):
    * payloads gate on the m05 predicate, decode as 16-bit LE PCM, and
    * each non-overlapping 32-sample window reduces to integer Σs². */
  private def pcmWindows(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    import spark.implicits._
    val blobs = Tables(spark, dir).documents
      .filter(col("doc_id") % 50 === 0 && length(col("text")) >= 2 &&
        length(col("text")) === octet_length(col("text")))
      .select(col("doc_id"), col("source"), col("text").cast("binary").as("payload"))
      .as[Blob]
    blobs.mapPartitions { iter =>
      iter.flatMap { b =>
        val nSamp = b.payload.length / 2
        (0 until ((nSamp - 1) / 32 + 1)).iterator.map { w =>
          var e = 0L
          var i = w * 32
          val end = math.min((w + 1) * 32, nSamp)
          while (i < end) {
            val lo = b.payload(2 * i) & 0xff
            val hi = b.payload(2 * i + 1) & 0xff
            val raw = lo + 256 * hi
            val s = if (raw >= 32768) raw - 65536 else raw
            e += s.toLong * s
            i += 1
          }
          AudioWin(b.doc_id, w, e)
        }
      }
    }.toDF()
  }

  /** m05: audio ENERGY segmentation — the audio verb beside m01–m03:
    * each payload decodes as 16-bit little-endian PCM (stub: byte
    * pairs as signed samples — a real build swaps in the codec inside
    * the same per-partition loop), non-overlapping 32-sample windows
    * reduce to INTEGER energy Σs², and the per-doc summary carries
    * the segmentation signals a speech pipeline gates on: window
    * count, total/peak energy, the peak window index, and how many
    * windows are RELATIVE silence (energy × 4 < peak — the adaptive
    * threshold, since absolute scales vary per recording).
    *
    * All-integer arithmetic end to end, so the oracle replays byte
    * pairs exactly (ASCII gate as m01). Scale: the window fold is the
    * mapPartitions batch loop (one pass, nothing materialized beyond
    * a window), the summary one doc-keyed agg + a broadcast-sized
    * rejoin for the relative-silence count. */
  val m05 = QueryDef(
    "m05_audio_energy",
    s"""WITH $pcmEnergySql,
      |pk AS (SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_windows,
      |    CAST(SUM(energy) AS BIGINT) AS total_energy,
      |    CAST(MAX(energy) AS BIGINT) AS peak_energy
      |  FROM e GROUP BY doc_id)
      |SELECT e.doc_id, pk.n_windows, pk.total_energy,
      |  CAST(MIN(CASE WHEN e.energy = pk.peak_energy THEN e.win_idx END)
      |    AS INTEGER) AS peak_win,
      |  pk.peak_energy,
      |  CAST(COUNT(*) FILTER (WHERE e.energy * 4 < pk.peak_energy) AS BIGINT)
      |    AS n_silent
      |FROM e JOIN pk USING (doc_id)
      |GROUP BY e.doc_id, pk.n_windows, pk.total_energy, pk.peak_energy
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val wins = pcmWindows(spark, dir)
    val pk = wins.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_windows"),
        sum(col("energy")).as("total_energy"),
        max(col("energy")).as("peak_energy"))
    wins.join(pk, "doc_id")
      .groupBy(col("doc_id"), col("n_windows"), col("total_energy"),
        col("peak_energy"))
      .agg(min(when(col("energy") === col("peak_energy"), col("win_idx")))
          .cast("int").as("peak_win"),
        count(when(col("energy") * 4 < col("peak_energy"), 1)).as("n_silent"))
      .select(col("doc_id"), col("n_windows"), col("total_energy"),
        col("peak_win"), col("peak_energy"), col("n_silent"))
      .orderBy(col("doc_id"))
  }

  /** One decoded frame brightness row (intermediate). */
  final case class ShotFrame(doc_id: Long, fi: Int, luma: Long)

  /** The f/fr/lu oracle CTE chain decoding payloads to per-frame
    * integer luma — shared VERBATIM by the m06 and m11 oracles (the
    * SQL twin of [[lumaFrames]]). Exposes `lu(doc_id, fi, luma)`. */
  private val lumaSql: String =
    """f AS (
      |  SELECT doc_id, text, LENGTH(text) AS n FROM documents
      |  WHERE doc_id % 50 = 0 AND LENGTH(text) > 0
      |    AND LENGTH(text) = OCTET_LENGTH(ENCODE(text))),
      |fr AS (SELECT doc_id, text, n,
      |    UNNEST(RANGE(0, (n - 1) // 64 + 1)) AS fi FROM f),
      |lu AS (
      |  SELECT doc_id, CAST(fi AS INTEGER) AS fi,
      |    CAST(LIST_SUM(LIST_TRANSFORM(
      |      RANGE(CAST(fi * 64 AS INTEGER),
      |            CAST(LEAST((fi + 1) * 64, n) AS INTEGER)),
      |      i -> CAST(ASCII(SUBSTR(text, CAST(i AS INTEGER) + 1, 1))
      |        AS BIGINT))) AS BIGINT) AS luma
      |  FROM fr)""".stripMargin

  /** Shared frame decode → integer-luma stage (m06's batch loop,
    * reused verbatim by m11): 64-byte frames, unsigned byte sum. */
  private def lumaFrames(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    import spark.implicits._
    val blobs = Tables(spark, dir).documents
      .filter(col("doc_id") % 50 === 0 && length(col("text")) > 0 &&
        length(col("text")) === octet_length(col("text")))
      .select(col("doc_id"), col("source"), col("text").cast("binary").as("payload"))
      .as[Blob]
    blobs.mapPartitions { iter =>
      iter.flatMap { b =>
        val n = b.payload.length
        (0 until ((n - 1) / 64 + 1)).iterator.map { fi =>
          var s = 0L
          var i = fi * 64
          val end = math.min((fi + 1) * 64, n)
          while (i < end) { s += (b.payload(i) & 0xff); i += 1 }
          ShotFrame(b.doc_id, fi, s)
        }
      }
    }.toDF()
  }

  /** m06: SHOT-BOUNDARY detection — the video segmentation verb that
    * completes the m02 frame path (sample → decode → segment): each
    * payload is read as consecutive 64-byte frames (stride 1 — every
    * frame, unlike m02's sampler), a frame reduces to its integer
    * "luma" (unsigned byte sum — the stub for a real decoder's mean
    * luminance, swapped inside the same per-partition loop), and a CUT
    * is declared wherever the frame-to-frame |Δluma| exceeds half the
    * payload's own PEAK |Δ| (m05's relative-threshold stance — scale
    * varies per recording, so the gate adapts per doc). Per doc:
    * frame count, total/peak |Δ|, the first peak frame, and the cut
    * count a scene-indexing pipeline stores.
    *
    * All-integer end to end; the oracle replays bytes via SUBSTR
    * (ASCII gate as m01). Scale: decode is the mapPartitions batch
    * loop; the lag runs in ONE doc-keyed window whose partition is a
    * doc's frame count (payload-bounded); every later agg/join keys on
    * doc_id so the window's shuffle partitioning serves all of them. */
  val m06 = QueryDef(
    "m06_shot_boundaries",
    s"""WITH $lumaSql,
      |d AS (SELECT doc_id, fi,
      |    ABS(luma - LAG(luma) OVER (PARTITION BY doc_id ORDER BY fi))
      |      AS diff FROM lu),
      |nf AS (SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_frames
      |  FROM lu GROUP BY doc_id),
      |pk AS (SELECT doc_id, CAST(SUM(diff) AS BIGINT) AS total_diff,
      |    CAST(MAX(diff) AS BIGINT) AS peak_diff
      |  FROM d WHERE diff IS NOT NULL GROUP BY doc_id),
      |ct AS (SELECT d.doc_id,
      |    CAST(MIN(CASE WHEN d.diff = pk.peak_diff THEN d.fi END)
      |      AS INTEGER) AS peak_frame,
      |    CAST(COUNT(*) FILTER (WHERE d.diff * 2 > pk.peak_diff) AS BIGINT)
      |      AS n_cuts
      |  FROM d JOIN pk USING (doc_id) WHERE d.diff IS NOT NULL
      |  GROUP BY d.doc_id)
      |SELECT nf.doc_id, nf.n_frames,
      |  CAST(COALESCE(pk.total_diff, 0) AS BIGINT) AS total_diff,
      |  CAST(COALESCE(pk.peak_diff, 0) AS BIGINT) AS peak_diff,
      |  ct.peak_frame,
      |  CAST(COALESCE(ct.n_cuts, 0) AS BIGINT) AS n_cuts
      |FROM nf LEFT JOIN pk USING (doc_id) LEFT JOIN ct USING (doc_id)
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    // the luma table feeds three consumers (diff window, frame count,
    // peak/cut aggs); persist so the byte decode runs once, not 3×
    // (harness clears cache per query)
    val lu = lumaFrames(spark, dir).persist()
    val w = Window.partitionBy(col("doc_id")).orderBy(col("fi"))
    val d = lu
      .withColumn("diff", abs(col("luma") - lag(col("luma"), 1).over(w)))
      .filter(col("diff").isNotNull)
    val nf = lu.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_frames"))
    val pk = d.groupBy(col("doc_id"))
      .agg(sum(col("diff")).as("total_diff"), max(col("diff")).as("peak_diff"))
    val ct = d.join(pk, "doc_id")
      .groupBy(col("doc_id"), col("peak_diff"))
      .agg(min(when(col("diff") === col("peak_diff"), col("fi")))
          .cast("int").as("peak_frame"),
        count(when(col("diff") * 2 > col("peak_diff"), 1)).as("n_cuts"))
      .select(col("doc_id"), col("peak_frame"), col("n_cuts"))
    nf.join(pk, Seq("doc_id"), "left").join(ct, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_frames"),
        coalesce(col("total_diff"), lit(0L)).as("total_diff"),
        coalesce(col("peak_diff"), lit(0L)).as("peak_diff"),
        col("peak_frame"),
        coalesce(col("n_cuts"), lit(0L)).as("n_cuts"))
      .orderBy(col("doc_id"))
  }

  /** One modality-sniff row per payload. */
  final case class Sniff(doc_id: Long, n_bytes: Int, sniff_bytes: Int,
      printable_ppm: Long, n_distinct: Int, modality: String)

  /** m07: MODALITY routing — the sniffer at the FRONT of a multimodal
    * pipeline (file(1)'s job): every payload is classified text vs
    * binary from a BOUNDED 256-byte prefix — constant work per doc no
    * matter how large the blob, which is what lets the router run on
    * the full firehose while m01–m06 run on their routed slices.
    * Signals: printable ratio in integer ppm (floor division — exact
    * cross-engine; printable = tab/LF/CR/0x20–0x7E) and distinct byte
    * count; `text` iff printable_ppm ≥ 950000.
    *
    * Map-only: the sniff is the per-partition batch loop, no shuffle
    * at all before the ordered dump (a real deployment writes the
    * routed stream back partitioned by modality). Oracle replays the
    * prefix bytes via SUBSTR (ASCII gate as m01). */
  val m07 = QueryDef(
    "m07_modality_router",
    """WITH f AS (
      |  SELECT doc_id, text, CAST(LENGTH(text) AS INTEGER) AS n,
      |    CAST(LEAST(LENGTH(text), 256) AS INTEGER) AS sn
      |  FROM documents
      |  WHERE LENGTH(text) > 0 AND LENGTH(text) = OCTET_LENGTH(ENCODE(text))),
      |s AS (
      |  SELECT doc_id, n, sn,
      |    LIST_TRANSFORM(RANGE(0, sn),
      |      i -> ASCII(SUBSTR(text, CAST(i AS INTEGER) + 1, 1))) AS codes
      |  FROM f),
      |t AS (
      |  SELECT doc_id, n, sn,
      |    CAST(LEN(LIST_FILTER(codes,
      |      c -> c = 9 OR c = 10 OR c = 13 OR (c >= 32 AND c <= 126)))
      |      AS BIGINT) AS n_print,
      |    CAST(LEN(LIST_DISTINCT(codes)) AS INTEGER) AS n_distinct
      |  FROM s)
      |SELECT doc_id, n AS n_bytes, sn AS sniff_bytes,
      |  CAST(n_print * 1000000 // sn AS BIGINT) AS printable_ppm,
      |  n_distinct,
      |  CASE WHEN n_print * 1000000 // sn >= 950000
      |       THEN 'text' ELSE 'binary' END AS modality
      |FROM t ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val blobs = Tables(spark, dir).documents
      .filter(length(col("text")) > 0 &&
        length(col("text")) === octet_length(col("text")))
      .select(col("doc_id"), col("source"), col("text").cast("binary").as("payload"))
      .as[Blob]
    blobs.mapPartitions { iter =>
      iter.map { b =>
        val n = b.payload.length
        val sn = math.min(n, 256)
        var nPrint = 0L
        val seen = new Array[Boolean](256)
        var nDistinct = 0
        var i = 0
        while (i < sn) {
          val c = b.payload(i) & 0xff
          if (c == 9 || c == 10 || c == 13 || (c >= 32 && c <= 126)) nPrint += 1
          if (!seen(c)) { seen(c) = true; nDistinct += 1 }
          i += 1
        }
        val ppm = nPrint * 1000000L / sn
        Sniff(b.doc_id, n, sn, ppm, nDistinct,
          if (ppm >= 950000L) "text" else "binary")
      }
    }.toDF().orderBy(col("doc_id"))
  }

  /** One content-defined chunk row (intermediate). */
  final case class Chunk(doc_id: Long, len: Int, chash: String)

  /** m08: CONTENT-DEFINED chunking — the FastCDC/rolling-hash storage
    * dedup verb (backup systems, artifact stores, LAION-style payload
    * dedup): a chunk boundary falls wherever the 16-byte window hash
    * (m02's polynomial fold) satisfies `h % 16 == 0`, so an insertion
    * only reshapes the chunks it touches — unlike fixed-size framing
    * (m02), where one shifted byte re-frames the whole payload. Per
    * doc: chunk count, min/max chunk size, and how many of its chunks
    * also appear in ANOTHER doc (the cross-doc dedup-able mass).
    * A real build widens the window/mask for ~64 KiB chunks; the
    * 16-byte/16-mask stub keeps the same plumbing testable.
    *
    * Window hashes are position-INDEPENDENT (each a fresh 16-byte
    * fold), so the oracle replays them with LIST_REDUCE per position —
    * no sequential state; the Spark side recomputes the same fold per
    * position inside the mapPartitions batch loop (16 mults/byte,
    * deliberately identical to the oracle's arithmetic rather than a
    * cleverer rolling update). Chunk identity = md5 of the chunk's
    * bytes (ASCII gate as m01). Plan: decode + chunk map-side; the
    * chunk-hash table shuffles once for the shared-count agg and
    * joins back; doc rollup reuses the doc clustering. */
  val m08 = QueryDef(
    "m08_cdc_chunks",
    """WITH f AS (
      |  SELECT doc_id, text, CAST(LENGTH(text) AS INTEGER) AS n
      |  FROM documents
      |  WHERE doc_id % 25 = 0 AND LENGTH(text) >= 16
      |    AND LENGTH(text) = OCTET_LENGTH(ENCODE(text))),
      |pos AS (SELECT doc_id, text, n, CAST(UNNEST(RANGE(15, n - 1))
      |    AS INTEGER) AS i FROM f),
      |wh AS (SELECT doc_id, i FROM pos WHERE
      |    LIST_REDUCE(LIST_PREPEND(CAST(0 AS BIGINT),
      |      LIST_TRANSFORM(RANGE(i - 15, i + 1),
      |        j -> CAST(ASCII(SUBSTR(text, CAST(j AS INTEGER) + 1, 1))
      |          AS BIGINT))),
      |      (a, b) -> (a * 31 + b) % 1000000000000037) % 16 = 0),
      |ends AS (SELECT doc_id, i AS e FROM wh
      |  UNION ALL SELECT doc_id, n - 1 FROM f),
      |chunks AS (SELECT doc_id, e,
      |    COALESCE(LAG(e) OVER (PARTITION BY doc_id ORDER BY e), -1) + 1 AS s
      |  FROM ends),
      |ch AS (SELECT c.doc_id, c.e - c.s + 1 AS len,
      |    MD5(SUBSTR(f.text, c.s + 1, c.e - c.s + 1)) AS chash
      |  FROM chunks c JOIN f USING (doc_id)),
      |shared AS (SELECT chash FROM ch GROUP BY chash
      |  HAVING COUNT(DISTINCT doc_id) > 1)
      |SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
      |  CAST(MIN(len) AS BIGINT) AS min_chunk,
      |  CAST(MAX(len) AS BIGINT) AS max_chunk,
      |  CAST(COUNT(*) FILTER (WHERE c.chash IN (SELECT chash FROM shared))
      |    AS BIGINT) AS n_shared
      |FROM ch c GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val blobs = Tables(spark, dir).documents
      .filter(col("doc_id") % 25 === 0 && length(col("text")) >= 16 &&
        length(col("text")) === octet_length(col("text")))
      .select(col("doc_id"), col("source"), col("text").cast("binary").as("payload"))
      .as[Blob]
    val ch = blobs.mapPartitions { iter =>
      val md = java.security.MessageDigest.getInstance("MD5")
      iter.flatMap { b =>
        val n = b.payload.length
        var start = 0
        val out = scala.collection.mutable.ArrayBuffer.empty[Chunk]
        def emit(endIncl: Int): Unit = {
          val len = endIncl - start + 1
          md.reset()
          md.update(b.payload, start, len)
          val hex = md.digest().map("%02x".format(_)).mkString
          out += Chunk(b.doc_id, len, hex)
          start = endIncl + 1
        }
        var i = 15
        while (i < n - 1) {
          var h = 0L
          var j = i - 15
          while (j <= i) { h = (h * 31 + (b.payload(j) & 0xff)) % Mod; j += 1 }
          if (h % 16 == 0) emit(i)
          i += 1
        }
        emit(n - 1)
        out.iterator
      }
    }.toDF().persist()
    val shared = ch.groupBy(col("chash"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") > 1)
      .select(col("chash"), lit(1).as("is_shared"))
    ch.join(shared, Seq("chash"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        min(col("len")).cast("long").as("min_chunk"),
        max(col("len")).cast("long").as("max_chunk"),
        count(col("is_shared")).as("n_shared"))
      .orderBy(col("doc_id"))
  }

  /** One payload's perceptual fingerprint row. */
  final case class AHash(doc_id: Long, n_bytes: Int, ahash: Long)

  /** 64 stub "grays": the payload byte at position ⌊j·n/64⌋ for
    * j = 0..63 (n ≥ 64 gated upstream) — the non-image analogue of
    * [[pngGrays]]'s 8×8 box filter, replicable via SUBSTR. */
  private[graft] def strideGrays(payload: Array[Byte]): Array[Long] = {
    val n = payload.length
    Array.tabulate(64)(j => (payload(j * n / 64) & 0xff).toLong)
  }

  /** AVERAGE-HASH of 64 grays: bit j set iff grays(j) > the floored
    * integer mean — the classic aHash perceptual fingerprint. */
  private[graft] def averageHash(grays: Array[Long]): Long = {
    var sum = 0L
    var i = 0
    while (i < 64) { sum += grays(i); i += 1 }
    val mu = sum / 64
    var mask = 0L
    i = 0
    while (i < 64) { if (grays(i) > mu) mask |= (1L << i); i += 1 }
    mask
  }

  /** m09: PERCEPTUAL near-dup — average-hash (aHash, the classic
    * pHash-family baseline: 8×8 grayscale, bit = cell > mean) over the
    * payload column, then d03's Hamming machinery: 4×16-bit chunk
    * bands, capped bucket join, `bit_count(xor)` ≤ 8 confirm. The
    * image-dedup stage of a multimodal curation pipeline — re-encoded /
    * resized copies of one image collapse to the same 64-bit mask
    * while cryptographic hashes (d01) see distinct bytes. PNG-magic
    * payloads take the REAL codec rung ([[pngGrays]], m03's decoder);
    * everything else samples 64 bytes at stride n/64 ([[strideGrays]])
    * — same mapPartitions batch loop, same downstream plan.
    *
    * Scale shape: fingerprinting is map-only (8 bytes out per
    * payload); banding explodes exactly 4 rows per doc, the bucket
    * cap ([[Dedup.BucketCap]]) rides the band shuffle, pair work is
    * ≤ cap²/2 per bucket, and the confirm re-joins the 8-byte masks —
    * d03's exact discipline on binary payloads.
    *
    * Determinism: all-integer. The oracle replays the stride samples
    * via SUBSTR (ASCII-gated corpus ⇒ stub path everywhere), packs
    * bands as Σ bit·2^(j−16b) per chunk (sign-safe — the Spark side's
    * unsigned shift of the packed mask extracts identical values),
    * and confirms with BIT_COUNT(XOR). */
  val m09 = QueryDef(
    "m09_payload_ahash",
    """WITH f AS (
      |  SELECT doc_id, text, LENGTH(text) AS n FROM documents
      |  WHERE LENGTH(text) >= 64
      |    AND LENGTH(text) = OCTET_LENGTH(ENCODE(text))),
      |s AS (
      |  SELECT doc_id,
      |    LIST_TRANSFORM(RANGE(0, 64),
      |      j -> CAST(ASCII(SUBSTR(text, CAST(j * n // 64 + 1 AS INTEGER), 1))
      |        AS BIGINT)) AS sm
      |  FROM f),
      |m AS (SELECT doc_id, sm, LIST_SUM(sm) // 64 AS mu FROM s),
      |band AS (
      |  SELECT doc_id, CAST(b AS INTEGER) AS band_idx,
      |    LIST_SUM(LIST_TRANSFORM(RANGE(0, 16),
      |      k -> CASE WHEN sm[CAST(b * 16 + k + 1 AS INTEGER)] > mu
      |                THEN 1 << CAST(k AS INTEGER) ELSE 0 END)) AS band_val
      |  FROM m, RANGE(4) r(b)),
      |bandc AS (SELECT doc_id, band_idx, band_val FROM (
      |    SELECT *, COUNT(*) OVER (PARTITION BY band_idx, band_val) AS bsz
      |    FROM band) t WHERE bsz <= 64),
      |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bandc a JOIN bandc b
      |    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
      |      AND a.doc_id < b.doc_id),
      |mask AS (
      |  SELECT doc_id,
      |    CAST(LIST_SUM(LIST_TRANSFORM(RANGE(0, 63),
      |      j -> CASE WHEN sm[CAST(j + 1 AS INTEGER)] > mu
      |                THEN (CAST(1 AS BIGINT) << CAST(j AS INTEGER))
      |                ELSE 0 END)) AS BIGINT)
      |    + CASE WHEN sm[64] > mu THEN -9223372036854775808 ELSE 0 END AS ahash
      |  FROM m)
      |SELECT doc_a, doc_b,
      |  CAST(BIT_COUNT(XOR(x.ahash, y.ahash)) AS INTEGER) AS hamming
      |FROM cand JOIN mask x ON x.doc_id = doc_a JOIN mask y ON y.doc_id = doc_b
      |WHERE BIT_COUNT(XOR(x.ahash, y.ahash)) <= 8
      |ORDER BY doc_a, doc_b""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val blobs = Tables(spark, dir).documents
      .filter(length(col("text")) >= 64 &&
        length(col("text")) === octet_length(col("text")))
      .select(col("doc_id"), col("source"), col("text").cast("binary").as("payload"))
      .as[Blob]
    val masks = blobs.mapPartitions { iter =>
      iter.map { b =>
        val grays = if (isPng(b.payload)) pngGrays(b.payload).getOrElse(strideGrays(b.payload))
          else strideGrays(b.payload)
        AHash(b.doc_id, b.payload.length, averageHash(grays))
      }
    }.toDF().persist()
    val bands = masks.select(col("doc_id"), explode(array((0 until 4).map(b =>
        struct(lit(b).as("band_idx"),
          shiftrightunsigned(col("ahash"), b * 16).bitwiseAND(lit(0xFFFFL))
            .as("band_val"))): _*)).as("bv"))
      .select(col("doc_id"), col("bv.band_idx").as("band_idx"),
        col("bv.band_val").as("band_val"))
    val capped = Dedup.capBuckets(bands, Seq("band_idx", "band_val"), Dedup.BucketCap)
    val cand = capped.toDF("doc_a", "band_idx", "band_val")
      .join(capped.toDF("doc_b", "band_idx", "band_val"), Seq("band_idx", "band_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    cand
      .join(masks.select(col("doc_id").as("doc_a"), col("ahash").as("ha")), "doc_a")
      .join(masks.select(col("doc_id").as("doc_b"), col("ahash").as("hb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(ha ^ hb)").cast("int").as("hamming"))
      .filter(col("hamming") <= 8)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** m10: SILENCE TRIM — the companion verb to m05's energy
    * segmentation (the first edit every speech/audio ingest applies:
    * drop leading/trailing silence before storage and featurization):
    * per payload, the count of leading and trailing windows whose
    * energy sits below the adaptive threshold (energy × 4 < peak —
    * m05's relative-silence stance), the kept span, and the kept
    * span's total energy — the offsets a trimming writer would slice
    * the payload with.
    *
    * Decode shares [[pcmWindows]] / [[pcmEnergySql]] VERBATIM with
    * m05 (one batch loop, two verbs). The trim frame is three
    * doc-keyed aggregates over the window stream (peak, first/last
    * non-silent, kept-span energy) — one shuffle key serves all of
    * them; windows per doc are payload-bounded so no partition grows
    * with the corpus. All-integer end to end (the peak window always
    * satisfies peak×4 ≥ peak, so a first/last non-silent index always
    * exists — no null legs). */
  val m10 = QueryDef(
    "m10_silence_trim",
    s"""WITH $pcmEnergySql,
      |pk AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
      |    CAST(MAX(energy) AS BIGINT) AS peak FROM e GROUP BY doc_id),
      |ns AS (SELECT e.doc_id AS doc_id, pk.n_windows, pk.peak,
      |    CAST(MIN(CASE WHEN e.energy * 4 >= pk.peak THEN e.win_idx END)
      |      AS BIGINT) AS first_ns,
      |    CAST(MAX(CASE WHEN e.energy * 4 >= pk.peak THEN e.win_idx END)
      |      AS BIGINT) AS last_ns
      |  FROM e JOIN pk USING (doc_id)
      |  GROUP BY e.doc_id, pk.n_windows, pk.peak),
      |ke AS (SELECT e.doc_id AS doc_id,
      |    CAST(SUM(e.energy) FILTER (WHERE e.win_idx BETWEEN ns.first_ns
      |      AND ns.last_ns) AS BIGINT) AS kept_energy
      |  FROM e JOIN ns USING (doc_id) GROUP BY e.doc_id)
      |SELECT ns.doc_id AS doc_id, ns.n_windows,
      |  ns.first_ns AS lead_sil,
      |  ns.n_windows - 1 - ns.last_ns AS trail_sil,
      |  ns.last_ns - ns.first_ns + 1 AS kept_windows,
      |  ke.kept_energy
      |FROM ns JOIN ke USING (doc_id) ORDER BY doc_id""".stripMargin) {
    (spark, dir) =>
    val wins = pcmWindows(spark, dir).persist() // feeds pk, ns, AND ke
    val pk = wins.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"), max(col("energy")).as("peak"))
    val ns = wins.join(pk, "doc_id")
      .groupBy(col("doc_id"), col("n_windows"), col("peak"))
      .agg(min(when(col("energy") * 4 >= col("peak"), col("win_idx")))
          .cast("long").as("first_ns"),
        max(when(col("energy") * 4 >= col("peak"), col("win_idx")))
          .cast("long").as("last_ns"))
    val ke = wins.join(ns.select(col("doc_id"), col("first_ns"), col("last_ns")),
        "doc_id")
      .groupBy(col("doc_id"))
      .agg(sum(when(col("win_idx").between(col("first_ns"), col("last_ns")),
        col("energy"))).as("kept_energy"))
    ns.join(ke, "doc_id")
      .select(col("doc_id"), col("n_windows"),
        col("first_ns").as("lead_sil"),
        (col("n_windows") - 1 - col("last_ns")).as("trail_sil"),
        (col("last_ns") - col("first_ns") + 1).as("kept_windows"),
        col("kept_energy"))
      .orderBy(col("doc_id"))
  }

  /** m11: KEYFRAME SELECTION — the verb downstream of m06's cuts that
    * completes the video path (sample m02 → segment m06 → represent
    * m11): frames split into SHOTS at m06's cut rule (|Δluma|×2 >
    * the payload's peak |Δ| — the same adaptive threshold, shared so
    * the two operators can't disagree about where shots start), and
    * each shot elects its brightest frame as the keyframe (ties → the
    * earliest frame) — the representative a thumbnail/index pipeline
    * stores per scene.
    *
    * Decode shares [[lumaFrames]] / [[lumaSql]] VERBATIM with m06.
    * Shot ids are the running cut count (cut frame STARTS its shot);
    * all windows and aggs key on doc_id (frame counts payload-
    * bounded), the keyframe pick is a two-level agg on the same key
    * (max luma, then earliest frame at that luma). All-integer. */
  val m11 = QueryDef(
    "m11_keyframe_select",
    s"""WITH $lumaSql,
      |d AS (SELECT doc_id, fi, luma,
      |    ABS(luma - LAG(luma) OVER (PARTITION BY doc_id ORDER BY fi))
      |      AS diff FROM lu),
      |pk AS (SELECT doc_id, CAST(MAX(diff) AS BIGINT) AS peak_diff
      |  FROM d WHERE diff IS NOT NULL GROUP BY doc_id),
      |sh AS (SELECT d.doc_id AS doc_id, d.fi, d.luma,
      |    CAST(SUM(CASE WHEN d.diff IS NOT NULL
      |        AND d.diff * 2 > pk.peak_diff THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY d.doc_id ORDER BY d.fi
      |            ROWS UNBOUNDED PRECEDING) AS INTEGER) AS shot
      |  FROM d LEFT JOIN pk USING (doc_id)),
      |agg AS (SELECT doc_id, shot,
      |    CAST(MIN(fi) AS INTEGER) AS start_frame,
      |    CAST(COUNT(*) AS BIGINT) AS n_frames,
      |    CAST(MAX(luma) AS BIGINT) AS key_luma
      |  FROM sh GROUP BY 1, 2)
      |SELECT a.doc_id AS doc_id, a.shot AS shot, a.start_frame, a.n_frames,
      |  CAST(MIN(s.fi) AS INTEGER) AS key_frame, a.key_luma
      |FROM agg a JOIN sh s ON s.doc_id = a.doc_id AND s.shot = a.shot
      |  AND s.luma = a.key_luma
      |GROUP BY 1, 2, 3, 4, 6 ORDER BY a.doc_id, a.shot""".stripMargin) {
    (spark, dir) =>
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("fi"))
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lu = lumaFrames(spark, dir)
    val d = lu.withColumn("diff", abs(col("luma") - lag(col("luma"), 1).over(wOrd)))
    val pk = d.filter(col("diff").isNotNull)
      .groupBy(col("doc_id")).agg(max(col("diff")).as("peak_diff"))
    val sh = d.join(pk, Seq("doc_id"), "left")
      .withColumn("shot",
        sum(when(col("diff").isNotNull && col("diff") * 2 > col("peak_diff"), 1)
          .otherwise(0)).over(wCum).cast("int"))
      .select(col("doc_id"), col("fi"), col("luma"), col("shot"))
      .persist() // feeds the shot agg AND the keyframe rejoin
    val agg = sh.groupBy(col("doc_id"), col("shot"))
      .agg(min(col("fi")).cast("int").as("start_frame"),
        count(lit(1)).as("n_frames"),
        max(col("luma")).as("key_luma"))
    agg.as("a")
      .join(sh.as("s"),
        col("s.doc_id") === col("a.doc_id") && col("s.shot") === col("a.shot") &&
          col("s.luma") === col("a.key_luma"))
      .groupBy(col("a.doc_id").as("doc_id"), col("a.shot").as("shot"),
        col("a.start_frame").as("start_frame"),
        col("a.n_frames").as("n_frames"), col("a.key_luma").as("key_luma"))
      .agg(min(col("s.fi")).cast("int").as("key_frame"))
      .select(col("doc_id"), col("shot"), col("start_frame"), col("n_frames"),
        col("key_frame"), col("key_luma"))
      .orderBy(col("doc_id"), col("shot"))
  }

  val all: Seq[QueryDef] =
    Seq(m01, m02, m03, m04, m05, m06, m07, m08, m09, m10, m11)
}
