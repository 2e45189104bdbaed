package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for d06 phase costs (same role as ProfileD02). */
object ProfileD06 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables(spark, sfDir).documents.count()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables(spark, sfDir).documents
    val sh = t("shingles+persist") {
      val s = docs.select(col("doc_id"),
        array_distinct(graft.functions.Text.shingles(
          graft.functions.Text.tokens(col("text")), 3)).as("sh")).persist()
      s.count(); s
    }
    val cand = t("bands+cand") {
      val c = Dedup.bucketPairs(Dedup.md5MinhashBands(sh, "doc_id", "sh")).persist()
      println(s"[prof] cand pairs: ${c.count()}"); c
    }
    val confirmed = t("confirm") {
      val cf = cand.join(sh.toDF("id1", "sh1"), "id1")
        .join(sh.toDF("id2", "sh2"), "id2")
        .filter(Dedup.jaccard(col("sh1"), col("sh2")) >= 0.3)
        .select(col("id1"), col("id2")).persist()
      println(s"[prof] confirmed pairs: ${cf.count()}"); cf
    }
    t("clusters") {
      println(s"[prof] clustered docs: ${Dedup.dupClusters(confirmed).count()}")
    }
    spark.stop()
  }
}
