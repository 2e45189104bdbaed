package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Publish stage — the reference's output contract
  * (`{output_dir}/{namespace}/{namespace}_{ISO_DATE}.tif` per-date COG
  * files + webhook ingest command, `ingest/__init__.py:96`
  * send_ingest_command) re-expressed as a date-partitioned parquet
  * layout plus a returned ingest payload for the caller's notifier.
  */
object Publish {

  /** The reference's webhook payload shape (`ecmwf_opendata:333`). */
  final case class IngestPayload(namespace: String, path: String, datatype: String)

  /** Write one namespace's data partitioned by date key with dynamic
    * partition overwrite: re-publishing a date replaces exactly that
    * partition (idempotent re-runs, never a full-table rewrite).
    * Returns the payload the reference would POST to its webhook. */
  def writeDatePartitioned(df: DataFrame, outDir: String, namespace: String,
      dateCol: String): IngestPayload = {
    val path = s"$outDir/$namespace"
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      df.withColumn("date_key", date_format(col(dateCol), "yyyy-MM-dd"))
        .write.mode("overwrite").partitionBy("date_key").parquet(path)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
    IngestPayload(namespace, path, "parquet")
  }

  /** Retention on the published layout — drop date partitions older
    * than `latestDateKey` (reference `delete_past_data_files`,
    * `ingest/utils.py:141`): rewrite the kept slice. Returns kept rows. */
  def cleanupOldData(spark: SparkSession, outDir: String, namespace: String,
      latestDateKey: String): DataFrame =
    spark.read.parquet(s"$outDir/$namespace")
      .filter(col("date_key") >= latestDateKey)
}
