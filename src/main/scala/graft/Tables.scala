package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry over the driver-provided parquet layout
  * (`TESTDATA.md`): one parquet per table under a scale-factor dir.
  *
  * At 100 TB the same API points at a partitioned lakehouse layout;
  * nothing here materializes data — each accessor returns a lazy scan
  * so Catalyst can push filters/projections into the parquet reader.
  */
final class Tables(val spark: SparkSession, val dir: String) {
  // events.parquet carries INT64 TIMESTAMP(NANOS) which Spark 4 rejects
  // unless read as long; we convert back to a microsecond timestamp
  // (integer division — going through double would lose precision at
  // ~1.7e18 ns). DuckDB oracles over events must CAST(ts AS TIMESTAMP)
  // for the same truncation.
  spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  def table(name: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    var df = spark.read.parquet(s"$dir/$name.parquet")
    // Generations of the driver data differ in timestamp encoding:
    // events.ts has appeared as INT64 TIMESTAMP(NANOS) (read as long
    // under nanosAsLong) and as TIMESTAMP_NTZ. Normalize both to the
    // session-zone TIMESTAMP every operator and oracle assumes; with
    // the UTC session zone the NTZ cast preserves the wall-clock value
    // DuckDB reads from the same file.
    if (name == "events" && df.schema("ts").dataType == LongType)
      df = df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    df.schema.fields.foreach { f =>
      if (f.dataType == TimestampNTZType)
        df = df.withColumn(f.name, col(f.name).cast("timestamp"))
    }
    df
  }

  def region: DataFrame = table("region")
  def nation: DataFrame = table("nation")
  def customer: DataFrame = table("customer")
  def supplier: DataFrame = table("supplier")
  def part: DataFrame = table("part")
  def orders: DataFrame = table("orders")
  def lineitem: DataFrame = table("lineitem")
  def events: DataFrame = table("events")
  def documents: DataFrame = table("documents")
  def embeddings: DataFrame = table("embeddings")

  /** Register all tables as temp views for the SQL interface (q11). */
  def registerViews(): Unit =
    Tables.names.foreach(n => table(n).createOrReplaceTempView(n))
}

object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)

  /** Hash-repartition `df` to the session parallelism when its input is
    * too small to scan in parallel — the input-parallelism fix for
    * expensive per-row kernels over a scan of few (or unsplittable)
    * files: a 1 MB single-row-group documents file plans as ONE scan
    * partition, so shingling/hashing/BPE kernels otherwise run serial
    * on a 32-core session. Gated on the OPTIMIZER size estimate, not on
    * `df.rdd` — building the RDD would compile a second whole-stage-
    * codegen plan per call (~0.3-1 s of driver time per cold query,
    * measured as a uniform in-suite regression). The estimate errs
    * toward spreading (a huge single-row-group file still estimates
    * many splits), which only matters below `p/2 × maxPartitionBytes`
    * of input — at scale a real corpus scan passes the gate untouched
    * and no shuffle is added. Hash (not round-robin) on the given key:
    * deterministic under retries and no sort-before-repartition pass. */
  def spread(df: DataFrame, key: String): DataFrame = {
    if (df.isStreaming) return df // no stats on streaming plans
    val sess = df.sparkSession
    val p = sess.sparkContext.defaultParallelism
    val maxSplit = sess.sessionState.conf.filesMaxPartitionBytes
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes >= BigInt(maxSplit) * math.max(1, p / 2)) df
    else df.repartition(p, org.apache.spark.sql.functions.col(key))
  }

  /** [[spread]] without a key (round-robin) — for frames whose columns
    * are all low-cardinality (a hash spread would collapse onto a few
    * partitions). Round-robin repartition locally sorts its input
    * first (sortBeforeRepartition, on by default) so retries replay
    * the same placement; downstream consumers here are aggregations,
    * indifferent to placement entirely. */
  def spreadRR(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    val sess = df.sparkSession
    val p = sess.sparkContext.defaultParallelism
    val maxSplit = sess.sessionState.conf.filesMaxPartitionBytes
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes >= BigInt(maxSplit) * math.max(1, p / 2)) df
    else df.repartition(p)
  }
}
