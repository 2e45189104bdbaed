package graft

import graft.sources.{JdbcSinkSpec, JdbcUpsert, JobConfig, Jobs}
import org.apache.spark.sql.functions._

/** The JDBC date-keyed upsert sink (`raster_vector.py:146`
  * insert_update_data) against embedded Derby: per-date delete+insert
  * replaces rather than duplicates, a double run is a no-op, retention
  * deletes strictly-older dates, and a Jobs cycle leg publishes
  * through it inside the commit window. */
class JdbcUpsertSpec extends SparkSpec {

  private def conn(url: String) = java.sql.DriverManager.getConnection(url)

  private def withDb[A](name: String)(body: String => A): A = {
    val url = s"jdbc:derby:memory:$name;create=true"
    try body(url)
    finally {
      try java.sql.DriverManager.getConnection(
        s"jdbc:derby:memory:$name;drop=true")
      catch { case _: java.sql.SQLException => () } // drop SIGNALS via SQLException
    }
  }

  private def queryAll(url: String, sql: String): Seq[Seq[Any]] = {
    val c = conn(url)
    try {
      val rs = c.createStatement().executeQuery(sql)
      val n = rs.getMetaData.getColumnCount
      val out = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
      while (rs.next()) out += (1 to n).map(rs.getObject)
      out.toSeq
    } finally c.close()
  }

  test("upsertByDate: per-date delete+insert — reprocessing replaces, never duplicates") {
    import spark.implicits._
    withDb("upsert1") { url =>
      val c = conn(url)
      c.createStatement().execute(
        "CREATE TABLE products (date_key VARCHAR(10), x INT, v DOUBLE)")
      c.close()
      val v1 = Seq(("2024-06-01", 0, 1.0), ("2024-06-01", 1, 2.0),
        ("2024-06-02", 0, 9.0)).toDF("date_key", "x", "v")
      JdbcUpsert.upsertByDate(v1, url, "products", "date_key")
      assert(queryAll(url, "SELECT COUNT(*) FROM products").head.head == 3)
      // double run: same end state (the task-retry idempotency contract)
      JdbcUpsert.upsertByDate(v1, url, "products", "date_key")
      assert(queryAll(url, "SELECT COUNT(*) FROM products").head.head == 3)
      // a REPROCESSED date-01 (different rows) replaces only that date
      val v2 = Seq(("2024-06-01", 5, 7.5)).toDF("date_key", "x", "v")
      JdbcUpsert.upsertByDate(v2, url, "products", "date_key")
      val rows = queryAll(url,
        "SELECT date_key, x, v FROM products ORDER BY date_key, x")
        .map(r => (r(0).toString, r(1).asInstanceOf[Number].intValue,
          r(2).asInstanceOf[Number].doubleValue))
      assert(rows == Seq(("2024-06-01", 5, 7.5), ("2024-06-02", 0, 9.0)),
        rows.toString)
      // many dates across many partitions: every date lands exactly once
      val wide = (1 to 9).flatMap(d => (0 until 4).map(x =>
        (f"2024-07-$d%02d", x, d * 10.0 + x))).toDF("date_key", "x", "v")
      JdbcUpsert.upsertByDate(wide, url, "products", "date_key", batchSize = 3)
      JdbcUpsert.upsertByDate(wide, url, "products", "date_key", batchSize = 3)
      assert(queryAll(url,
        "SELECT COUNT(*) FROM products WHERE date_key LIKE '2024-07%'")
        .head.head == 36)
      // NULL date keys refuse loudly — they can never replace
      val bad = Seq((Option.empty[String], 0, 1.0)).toDF("date_key", "x", "v")
      val e = intercept[Exception] {
        JdbcUpsert.upsertByDate(bad, url, "products", "date_key")
      }
      assert(e.getMessage != null)
    }
  }

  test("dropBefore deletes strictly-older dates (the `date < latest` retention)") {
    import spark.implicits._
    withDb("retain1") { url =>
      val c = conn(url)
      c.createStatement().execute(
        "CREATE TABLE products (date_key VARCHAR(10), v DOUBLE)")
      c.close()
      val df = Seq(("2024-06-01", 1.0), ("2024-06-02", 2.0),
        ("2024-06-03", 3.0)).toDF("date_key", "v")
      JdbcUpsert.upsertByDate(df, url, "products", "date_key")
      assert(JdbcUpsert.dropBefore(url, "products", "date_key", "2024-06-03") == 2)
      val left = queryAll(url, "SELECT date_key FROM products").map(_.head.toString)
      assert(left == Seq("2024-06-03"), left.toString)
    }
  }

  test("a Jobs cycle leg publishes through the JDBC sink; retry and retention ride along") {
    import spark.implicits._
    withDb("jobs1") { url =>
      val c = conn(url)
      c.createStatement().execute(
        "CREATE TABLE veg (station VARCHAR(20), ndvi DOUBLE, ts TIMESTAMP, date_key VARCHAR(10))")
      c.close()
      val root = java.nio.file.Files.createTempDirectory("graft_jdbc_jobs").toString
      var data = Seq(("s1", 0.31, "2024-06-01 06:00:00"),
        ("s2", 0.55, "2024-06-02 06:00:00"))
      def source = (s: org.apache.spark.sql.SparkSession) => {
        import s.implicits._
        data.toDF("station", "ndvi", "ts")
          .withColumn("ts", col("ts").cast("timestamp"))
      }
      val jobs = new Jobs(spark, s"$root/state")
      jobs.register(JobConfig("veg", source, "ts", identity,
        s"$root/out", retentionDays = 30,
        jdbc = Some(JdbcSinkSpec(url, "veg"))))
      val r1 = jobs.runAll(1L)
      assert(r1.head.error.isEmpty && r1.head.ingested == 2, r1.toString)
      assert(queryAll(url, "SELECT COUNT(*) FROM veg").head.head == 2)
      // an unchanged second cycle skips — the sink is not re-hit
      assert(jobs.runAll(2L).head.skipped)
      assert(queryAll(url, "SELECT COUNT(*) FROM veg").head.head == 2)
      // fresh data upserts incrementally; old dates retained (30d window)
      data = data :+ (("s1", 0.62, "2024-06-03 06:00:00"))
      val r3 = jobs.runAll(3L)
      assert(r3.head.ingested == 1, r3.toString)
      val rows = queryAll(url,
        "SELECT date_key, station, ndvi FROM veg ORDER BY date_key")
        .map(r => (r(0).toString, r(1).toString,
          r(2).asInstanceOf[Number].doubleValue))
      assert(rows == Seq(("2024-06-01", "s1", 0.31),
        ("2024-06-02", "s2", 0.55), ("2024-06-03", "s1", 0.62)), rows.toString)
      // a tight retention window drops the old vector rows on the next
      // fresh cycle (cutoff = latest − retentionDays, like the layout)
      val jobs2 = new Jobs(spark, s"$root/state2")
      jobs2.register(JobConfig("veg", source, "ts", identity,
        s"$root/out2", retentionDays = 1,
        jdbc = Some(JdbcSinkSpec(url, "veg"))))
      jobs2.runAll(1L)
      val kept = queryAll(url, "SELECT date_key FROM veg ORDER BY date_key")
        .map(_.head.toString)
      assert(kept == Seq("2024-06-02", "2024-06-03"), kept.toString)
    }
  }
}
