package graft.sources

import graft.operators.Ingest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ingestion state — the reference's `state.json` watermark store
  * (`ingest/utils.py:96` read_state / update_state, atomic_write) made
  * Spark-native and scale-safe:
  *
  *   - updates are APPENDS of (dataset_id, key, value, seq) rows —
  *     parquet file appends are atomic at the file level, the analogue
  *     of the reference's write-temp-then-rename;
  *   - reads compact the log with latest-per-key
  *     ([[Ingest.latestSnapshot]]) — so concurrent writers can't
  *     corrupt state, they only race on who is "latest";
  *   - at 100 TB / many datasets the log is tiny and the compaction is
  *     one broadcast-size shuffle; periodically rewriting the log to
  *     its compacted form bounds growth.
  */
final class StateStore(spark: SparkSession, path: String) {
  import spark.implicits._

  private def log: Option[DataFrame] =
    // Only a missing path reads as "no state yet"; any other failure
    // (corrupt log, permission, schema drift) must propagate — silently
    // treating it as empty would restart ingestion from scratch.
    try {
      val df = spark.read.parquet(path)
      if (df.isEmpty) None else Some(df)
    } catch {
      // UNABLE_TO_INFER_SCHEMA: the directory exists but holds no
      // readable parquet (aborted first write, leftover _temporary) —
      // also "no state yet"; treating it as fatal would wedge every
      // subsequent cycle until the dir is hand-deleted.
      case e: org.apache.spark.sql.AnalysisException
          if e.getCondition != null &&
            (e.getCondition.startsWith("PATH_NOT_FOUND") ||
              e.getCondition.startsWith("UNABLE_TO_INFER_SCHEMA")) => None
    }

  /** Current state of one dataset: latest value per key. */
  def state(datasetId: String): Map[String, String] = {
    log match {
      case None => Map.empty
      case Some(df) =>
        Ingest.latestSnapshot(
            df.filter(col("dataset_id") === datasetId),
            Seq(col("dataset_id"), col("key")), Seq(col("seq")))
          .select(col("key"), col("value"))
          .collect()
          .map(r => r.getString(0) -> r.getString(1))
          .toMap
    }
  }

  /** The watermark convention used by the reference ("last_update"). */
  def watermark(datasetId: String): Option[String] = state(datasetId).get("last_update")

  /** Append new state; `seq` is a monotonic version (callers pass e.g.
    * batch id / epoch). Merges over previous values on read. */
  def update(datasetId: String, kv: Map[String, String], seq: Long): Unit =
    kv.toSeq.toDF("key", "value")
      .select(lit(datasetId).as("dataset_id"), col("key"), col("value"), lit(seq).as("seq"))
      .write.mode("append").parquet(path)

  /** Rows strictly newer than the stored watermark — the read half of
    * the incremental cycle, with NO state mutation (callers that
    * publish should advance the watermark only AFTER the publish
    * succeeds; see [[graft.sources.Jobs]]). Missing watermark ⇒ full
    * ingest. */
  def freshSince(datasetId: String, df: DataFrame, tsCol: String): DataFrame =
    watermark(datasetId) match {
      case Some(w) => df.filter(col(tsCol) > lit(w).cast(df.schema(tsCol).dataType))
      case None    => df
    }

  /** Incremental-ingest cycle, reference `DataIngest.run` shape: take
    * rows strictly newer than the stored watermark, and if any were
    * taken, advance the watermark to their max ts. Returns the new
    * slice (empty → "No update required. Skipping", as the reference
    * logs). For pipelines with a downstream publish step, prefer
    * [[freshSince]] + explicit [[update]] after the publish commits. */
  def runIncremental(datasetId: String, df: DataFrame, tsCol: String, seq: Long): DataFrame = {
    val fresh = freshSince(datasetId, df, tsCol)
    val newMax = fresh.agg(max(col(tsCol)).cast("string")).collect()(0).getString(0)
    if (newMax != null) update(datasetId, Map("last_update" -> newMax), seq)
    fresh
  }
}
