package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler for batched BPE training (dev tool): wall-clock to
  * reach the same merge count sequentially (batch=1, one corpus
  * rewrite per merge) vs batched (top-N non-interacting merges per
  * round — O(merges/N) rewrites). */
object ProfileBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val merges = args.headOption.map(_.toInt).getOrElse(12)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, sfDir).documents
    docs.count() // warm the scan
    def time(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val rows = f.collect()
      val sec = (System.nanoTime() - t0) / 1e9
      val adopted = rows.length
      val rounds = rows.map(_.getAs[Int]("iter")).distinct.length
      println(f"$label: $adopted merges in $rounds rounds, $sec%.2f s")
    }
    time(s"sequential batch=1 x$merges")(
      graft.operators.TextAnalysis.bpeTrain(docs, iters = merges, batch = 1))
    time(s"batched    batch=4 x${merges / 4}")(
      graft.operators.TextAnalysis.bpeTrain(docs, iters = merges / 4, batch = 4))
    spark.stop()
  }
}
