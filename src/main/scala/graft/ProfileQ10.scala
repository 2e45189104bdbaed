package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler (dev tool): where does q10b's fixture pipeline
  * spend its time vs the 0.3 s exact twin? */
object ProfileQ10 {
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
    val li = Tables(spark, sfDir).lineitem
    time("warm count")(li.count())
    time("exact agg") {
      li.agg(countDistinct(col("l_orderkey")), countDistinct(col("l_partkey")),
        countDistinct(col("l_suppkey"))).collect()
    }
    time("approx agg rsd=0.01") {
      li.agg(approx_count_distinct(col("l_orderkey"), 0.01),
        approx_count_distinct(col("l_partkey"), 0.01),
        approx_count_distinct(col("l_suppkey"), 0.01)).collect()
    }
    time("approx agg rsd default") {
      li.agg(approx_count_distinct(col("l_orderkey")),
        approx_count_distinct(col("l_partkey")),
        approx_count_distinct(col("l_suppkey"))).collect()
    }
    for (r <- Seq(0.02, 0.023, 0.03)) time(s"approx agg rsd=$r") {
      li.agg(approx_count_distinct(col("l_orderkey"), r),
        approx_count_distinct(col("l_partkey"), r),
        approx_count_distinct(col("l_suppkey"), r)).collect()
    }
    time("q10b full")(graft.operators.Relational.q10b.fn(spark, sfDir).count())
    time("q10b full again")(graft.operators.Relational.q10b.fn(spark, sfDir).count())
    spark.stop()
  }
}
