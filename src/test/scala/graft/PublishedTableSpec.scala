package graft

import graft.sources.{JobConfig, Jobs, PublishedTable, PublishedTableCounters}
import org.apache.spark.sql.functions._

/** The transactional DSv2 publish table: manifest-committed writes,
  * snapshot-isolated reads, per-date dynamic overwrite, logical
  * retention + vacuum, and Jobs publishing through it. */
class PublishedTableSpec extends SparkSpec {

  private val fmt = "graft.sources.PublishedTable"

  private def rows(day: Int, vs: Seq[Double]) = {
    import spark.implicits._
    vs.map(v => (f"2024-06-$day%02d", v)).toDF(PublishedTable.DateCol, "v")
  }

  private def readBack(path: String) =
    spark.read.format(fmt).option("path", path).load()
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq.sorted

  test("round-trip: write → read; dynamic overwrite replaces exactly its dates, atomically") {
    val path = java.nio.file.Files.createTempDirectory("graft_pub").toString + "/t"
    rows(1, Seq(1.0, 2.0)).unionByName(rows(2, Seq(10.0)))
      .write.format(fmt).option("path", path).mode("append").save()
    assert(readBack(path) == Seq(("2024-06-01", 1.0), ("2024-06-01", 2.0), ("2024-06-02", 10.0)))

    // a reader resolved BEFORE the overwrite keeps its snapshot
    val before = PublishedTable.snapshot(spark, path)

    // dynamic overwrite (the catalog write verb): day 2 is replaced,
    // day 1 untouched, NO duplicates
    PublishedTable.ensureCatalog(spark)
    rows(2, Seq(20.0, 21.0))
      .writeTo(s"${PublishedTable.CatalogName}.`$path`").overwritePartitions()
    assert(readBack(path) == Seq(
      ("2024-06-01", 1.0), ("2024-06-01", 2.0), ("2024-06-02", 20.0), ("2024-06-02", 21.0)))
    // snapshot isolation: the pre-overwrite reader still sees v0's rows
    assert(before.collect().map(_.getDouble(1)).sorted.toSeq == Seq(1.0, 2.0, 10.0))

    // plain overwrite (no dynamic conf) = truncate
    rows(3, Seq(7.0)).write.format(fmt).option("path", path).mode("overwrite").save()
    assert(readBack(path) == Seq(("2024-06-03", 7.0)))
  }

  test("date_key predicates prune at the file level; column pruning reaches the parquet read") {
    val path = java.nio.file.Files.createTempDirectory("graft_pub_prune").toString + "/t"
    (1 to 3).foreach(d => rows(d, Seq(d.toDouble))
      .write.format(fmt).option("path", path).mode("append").save())
    val df = spark.read.format(fmt).option("path", path).load()
    val n0 = PublishedTableCounters.filesOpened.get()
    val got = df.filter(col(PublishedTable.DateCol) === "2024-06-02")
      .select(col("v")).collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(2.0))
    assert(PublishedTableCounters.filesOpened.get() - n0 == 1,
      "date_key filter must plan only the matching date's file")
    // the equality was consumed by the scan (exact at file granularity):
    // no post-scan filter re-applies it — only the isnotnull guard stays
    val plan = df.filter(col(PublishedTable.DateCol) === "2024-06-02")
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("2024-06-02"), plan)
  }

  test("retention drops partitions logically; vacuum reclaims unreferenced files after grace") {
    val path = java.nio.file.Files.createTempDirectory("graft_pub_ret").toString + "/t"
    (1 to 3).foreach(d => rows(d, Seq(d.toDouble))
      .write.format(fmt).option("path", path).mode("append").save())
    assert(PublishedTable.dropPartitionsOlderThan(path, "2024-06-03") ==
      Seq("2024-06-01", "2024-06-02"))
    assert(readBack(path) == Seq(("2024-06-03", 3.0)))
    // files still on disk for in-flight readers…
    def dataFiles() = new java.io.File(s"$path/data").listFiles()
      .filter(_.isDirectory).flatMap(_.listFiles()).count(_.getName.endsWith(".parquet"))
    assert(dataFiles() == 3)
    // …until vacuum past the grace window reclaims them
    assert(PublishedTable.vacuum(path, graceMs = 0L) == 2)
    assert(dataFiles() == 1)
    assert(readBack(path) == Seq(("2024-06-03", 3.0)))
  }

  test("Jobs publishes through the transactional writer: upsert re-runs never duplicate") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_pub_jobs").toString
    val src = s"$root/src"
    def srcRows(days: Seq[Int]) = days
      .map(d => (java.sql.Timestamp.valueOf(f"2024-06-$d%02d 12:00:00"), d.toDouble))
      .toDF("ts", "v")
    srcRows(1 to 2).write.mode("overwrite").parquet(src)
    val jobs = new Jobs(spark, s"$root/state")
      .register(JobConfig("dsT", s => s.read.parquet(src), "ts",
        df => df.withColumn("v2", col("v") * 2), s"$root/out",
        retentionDays = 30, transactional = true))
    assert(!jobs.runAll(1).head.skipped)
    val snap1 = PublishedTable.snapshot(spark, s"$root/out/dsT")
    assert(snap1.count() == 2)
    // cycle 2: one new day; a re-run of the same cycle is a no-op skip
    srcRows(Seq(3)).write.mode("append").parquet(src)
    assert(jobs.runAll(2).head.ingested == 1L)
    assert(jobs.runAll(3).head.skipped)
    val snap2 = PublishedTable.snapshot(spark, s"$root/out/dsT")
    assert(snap2.count() == 3)
    assert(snap2.filter(col("v2") =!= col("v") * 2).count() == 0)
    // the cycle-1 snapshot is still consistent (2 rows) after cycle 2
    assert(snap1.count() == 2)
  }
}
