package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at the given scale
  * factor and prints ONE JSON line for the driver
  * (`{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val names = args.toSet // optional filter: bench only these queries
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM + parquet-footer warm-up outside the timed region — all
    // tables, so the alphabetically-first queries don't absorb the
    // cold-scan cost of whichever table they happen to touch first
    val t = Tables(spark, sfDir)
    Tables.names.foreach(n => t.table(n).count())

    val failed = scala.collection.mutable.ListBuffer.empty[String]
    val results = SparkEntry.defs.sortBy(_.name)
      .filter(d => names.isEmpty || names.contains(d.name))
      .map { d =>
      val t0 = System.nanoTime()
      try { d.fn(spark, sfDir).count() }
      catch { case e: Throwable =>
        failed += d.name
        System.err.println(s"[bench] ${d.name}: ${e.getMessage}")
      }
      d.name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    // failed queries are flagged in the JSON and fail the run — a
    // fast-fail timing must never read as a performance win
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
