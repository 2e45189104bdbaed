package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for q12 phase costs (the r11 verdict's drifting ×10
  * ratio: 5.7× → 6.9×). Phases: the scalar-subquery scan, the
  * left-semi join as planned today (SMJ shuffling every lineitem
  * row), a distinct-first rewrite (map-side partial agg collapses the
  * probe side to ≤|part| keys before any exchange), and the final
  * sort. First Spark job of the JVM carries ~5 s warmup — a warm
  * pre-pass runs first so phases compare like-for-like.
  */
object ProfileQ12 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, sfDir)
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warmup: touch both tables, compile a join
    t.part.count(); t.lineitem.count()
    t.part.limit(10).join(t.lineitem.limit(10),
      col("p_partkey") === col("l_partkey"), "left_semi").count()

    for (rep <- 1 to 2) {
      time(s"rep$rep scalar avg scan") {
        t.part.agg(avg(col("p_retailprice"))).collect()
      }
      val avgPrice = t.part.agg(avg(col("p_retailprice")).as("avg_price"))
      val filtered = t.part.join(broadcast(avgPrice))
        .filter(col("p_retailprice") > col("avg_price"))
      time(s"rep$rep filtered-part count") { filtered.count() }
      time(s"rep$rep semi join AS-IS (no sort)") {
        filtered.join(t.lineitem, col("p_partkey") === col("l_partkey"),
          "left_semi").count()
      }
      time(s"rep$rep semi join AS-IS + sort (full q12)") {
        SparkEntry.queries("q12_scalar_subquery_exists")(spark, sfDir).count()
      }
      time(s"rep$rep distinct probe keys only") {
        t.lineitem.select(col("l_partkey")).distinct().count()
      }
      time(s"rep$rep distinct-first rewrite + sort") {
        val keys = t.lineitem.select(col("l_partkey").as("p_partkey")).distinct()
        filtered.join(broadcast(keys), Seq("p_partkey"), "left_semi")
          .select(col("p_partkey"), col("p_retailprice"))
          .orderBy(col("p_partkey")).count()
      }
    }
    spark.stop()
  }
}
