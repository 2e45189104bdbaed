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
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
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
}
