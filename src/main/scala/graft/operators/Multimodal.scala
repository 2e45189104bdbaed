package graft.operators

import graft.{QueryDef, Tables}
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

  val m01 = QueryDef(
    "m01_multimodal_meta",
    """WITH f AS (
      |  SELECT source, LENGTH(text) AS n_bytes,
      |    LIST_REDUCE(
      |      LIST_PREPEND(CAST(0 AS BIGINT),
      |        LIST_TRANSFORM(STRING_SPLIT(text, ''), c -> CAST(ASCII(c) AS BIGINT))),
      |      (a, b) -> (a * 31 + b) % 1000000000000037) AS checksum
      |  FROM documents)
      |SELECT source, COUNT(*) AS n_blobs,
      |  CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
      |  ROUND(AVG((checksum % 65536) / 65536.0) + 1e-9, 4) AS avg_feature0
      |FROM f GROUP BY source ORDER BY source""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val blobs = Tables(spark, dir).documents
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

  val all: Seq[QueryDef] = Seq(m01)
}
