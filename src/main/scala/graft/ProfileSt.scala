package graft

import org.apache.spark.sql.SparkSession

/** Dev profiler: streaming fixed costs vs state-partition count. */
object ProfileSt {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = Seq("st06" -> graft.streaming.Streaming.st06,
      "st02" -> graft.streaming.Streaming.st02,
      "st01" -> graft.streaming.Streaming.st01)
    for (parts <- Seq(32, 4)) {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      for ((n, q) <- qs) {
        val t0 = System.nanoTime()
        val cnt = q.fn(spark, dir).count()
        println(f"parts=$parts $n rows=$cnt ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
