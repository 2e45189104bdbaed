package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable

/** Per-dataset job definition — the reference's `DataIngest` subclass
  * config (`ingest/jobs.py`: one job per dataset wiring source,
  * transform, output namespace, retention).
  *
  * `transform` must preserve `tsCol` — the publish layout partitions
  * on its date key.
  */
final case class JobConfig(
    datasetId: String,
    source: SparkSession => DataFrame,
    tsCol: String,
    transform: DataFrame => DataFrame,
    outDir: String,
    retentionDays: Int)

/** Outcome of one job cycle: the reference either logs
  * "No update required. Skipping" or publishes + notifies. */
final case class JobResult(
    datasetId: String,
    ingested: Long,
    skipped: Boolean,
    payload: Option[Publish.IngestPayload])

/** Multi-dataset incremental job driver — the composition the
  * reference runs from its scheduler (`main.py:36` BlockingScheduler
  * firing `ingest/jobs.py` per dataset): for each registered dataset,
  *
  *   state check → incremental ingest (rows newer than the stored
  *   watermark) → transform → date-partitioned publish → PHYSICAL
  *   retention → watermark advance,
  *
  * skipping idempotently when nothing is new. Each stage is one of the
  * library's verified pieces ([[StateStore.runIncremental]],
  * [[Publish.writeDatePartitioned]], [[Publish.dropOldPartitions]]);
  * this class only sequences them, so a scheduler (cron, Airflow, or a
  * Structured Streaming trigger) can call [[runAll]] on any cadence
  * and re-runs never duplicate data (upsert layout + watermark).
  */
final class Jobs(spark: SparkSession, statePath: String) {

  private val state = new StateStore(spark, statePath)
  private val registry = mutable.LinkedHashMap.empty[String, JobConfig]

  def register(cfg: JobConfig): this.type = {
    registry += cfg.datasetId -> cfg
    this
  }

  def datasets: Seq[String] = registry.keys.toSeq

  /** One incremental cycle for every registered dataset, in
    * registration order. `seq` is the cycle's monotonic version
    * (the reference uses wall-clock run time). */
  def runAll(seq: Long): Seq[JobResult] = registry.values.map(run(_, seq)).toSeq

  def run(cfg: JobConfig, seq: Long): JobResult = {
    val fresh = state.freshSince(cfg.datasetId, cfg.source(spark), cfg.tsCol).persist()
    try {
      import org.apache.spark.sql.functions.{col, count, lit, max}
      // one metadata prepass decides BOTH the skip and the new watermark
      // (count + max in a single job over the cache fill, not two)
      val meta = fresh.agg(count(lit(1)), max(col(cfg.tsCol)).cast("string")).collect()(0)
      val n = meta.getLong(0)
      if (n == 0) JobResult(cfg.datasetId, 0L, skipped = true, None) // "No update required"
      else {
        val newMax = meta.getString(1)
        val payload = Publish.writeDatePartitioned(
          cfg.transform(fresh), cfg.outDir, cfg.datasetId, cfg.tsCol)
        // the watermark advances ONLY after the publish committed — a
        // failed transform/publish leaves it untouched, so the next
        // cycle retries the same slice instead of losing it forever
        state.update(cfg.datasetId, Map("last_update" -> newMax), seq)
        val cutoff = java.time.LocalDate.parse(newMax.substring(0, 10))
          .minusDays(cfg.retentionDays).toString
        Publish.dropOldPartitions(spark, cfg.outDir, cfg.datasetId, cutoff)
        JobResult(cfg.datasetId, n, skipped = false, Some(payload))
      }
    } finally fresh.unpersist()
  }
}
