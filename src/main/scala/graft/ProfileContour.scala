package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the contour pipeline (dev tool): segment
  * emission over the full event grid, then polyline assembly on the
  * bounded i39b region. */
object ProfileContour {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val full = graft.operators.Ingest.i39.fn(spark, sfDir)
    println(s"segments: ${time("segments")(full.count())}")
    val region = graft.operators.Ingest.i39b.fn(spark, sfDir)
    println(s"polylines: ${time("polylines")(region.count())}")
    spark.stop()
  }
}
