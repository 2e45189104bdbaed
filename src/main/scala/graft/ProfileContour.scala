package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the contour pipeline (dev tool): segment
  * emission over the full event grid, then polyline assembly on the
  * bounded i39b region, with per-stage timing to localize wall-clock
  * (the r7 verdict flagged i39b at 8.3 s when the driver union-find
  * gate should make the component solve one collect). */
object ProfileContour {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm the tables like Bench does
    val t = Tables(spark, sfDir)
    Tables.names.foreach(n => t.table(n).count())

    time("i39b cold total")(graft.operators.Ingest.i39b.fn(spark, sfDir).count())
    spark.catalog.clearCache()

    // stage-by-stage
    val pts = time("eventCells+filter") {
      val p = graft.operators.Ingest.i39bPoints(spark, sfDir).persist()
      p.count(); p
    }
    val segs = time("contourSegments") {
      val s = graft.operators.Ingest.contourSegments(pts, 25.0).persist()
      s.count(); s
    }
    time("contourPolylines") {
      graft.operators.Ingest.contourPolylines(segs, 25.0).count()
    }
    spark.catalog.clearCache()
    time("i39b warm total")(graft.operators.Ingest.i39b.fn(spark, sfDir).count())
    spark.stop()
  }
}
