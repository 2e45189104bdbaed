package graft

import graft.sources.{JobConfig, Jobs}
import org.apache.spark.sql.functions._

class JobsSpec extends SparkSpec {

  test("two datasets over incremental cycles: skip-if-no-update and physical retention") {
    import spark.implicits._
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft_jobs").toString
    val srcA = s"$root/srcA"
    val srcB = s"$root/srcB"
    val out = s"$root/out"
    def rows(days: Seq[Int]) = days
      .map(d => (java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00"), d.toDouble))
      .toDF("ts", "v")
    rows(1 to 3).write.mode("overwrite").parquet(srcA)
    rows(Seq(1)).write.mode("overwrite").parquet(srcB)
    val jobs = new Jobs(spark, s"$root/state")
      .register(JobConfig("dsA", s => s.read.parquet(srcA), "ts",
        df => df.withColumn("v2", col("v") * 2), out, retentionDays = 2))
      .register(JobConfig("dsB", s => s.read.parquet(srcB), "ts",
        identity, out, retentionDays = 30))

    val r1 = jobs.runAll(1)
    assert(r1.map(_.ingested) == Seq(3L, 1L))
    assert(r1.forall(!_.skipped))
    assert(r1.flatMap(_.payload).map(_.namespace) == Seq("dsA", "dsB"))

    // cycle 2: dsA gains two newer days; dsB has nothing new → skipped
    rows(4 to 5).write.mode("append").parquet(srcA)
    val r2 = jobs.runAll(2)
    assert(r2.find(_.datasetId == "dsA").get.ingested == 2L)
    assert(r2.find(_.datasetId == "dsB").get.skipped)

    // physical retention: dsA watermark is 2024-01-05, retention 2 days
    // → cutoff 2024-01-03 → partition dirs 01-01/01-02 DELETED on disk
    val keptKeys = new java.io.File(s"$out/dsA").listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("date_key=")).sorted
    assert(keptKeys.sameElements(Array(
      "date_key=2024-01-03", "date_key=2024-01-04", "date_key=2024-01-05")), keptKeys.mkString(","))

    // cycle 3: nothing new anywhere → all skipped, nothing rewritten
    assert(jobs.runAll(3).forall(_.skipped))

    // published rows: transform applied, incremental re-runs never duplicated
    val a = spark.read.parquet(s"$out/dsA")
    assert(a.count() == 3)
    assert(a.filter(col("v2") =!= col("v") * 2).count() == 0)
  }

  test("a failed transform leaves the watermark untouched — the slice is retried") {
    import spark.implicits._
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft_jobs_fail").toString
    val src = s"$root/src"
    Seq((java.sql.Timestamp.valueOf("2024-02-01 00:00:00"), 1.0))
      .toDF("ts", "v").write.mode("overwrite").parquet(src)
    def cfg(t: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) =
      JobConfig("dsF", s => s.read.parquet(src), "ts", t, s"$root/out", retentionDays = 30)
    val jobs = new Jobs(spark, s"$root/state")
    // cycle 1: transform blows up mid-job → the exception propagates
    // and, crucially, the watermark must NOT have advanced
    intercept[RuntimeException] {
      jobs.run(cfg(_ => throw new RuntimeException("boom")), 1)
    }
    // cycle 2 with a healthy transform still sees the full slice
    val r = jobs.run(cfg(identity), 2)
    assert(!r.skipped && r.ingested == 1L)
  }
}
