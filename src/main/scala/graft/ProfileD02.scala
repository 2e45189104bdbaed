package graft

import graft.functions.Text
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for d02 stage costs (dev tool). */
object ProfileD02 {
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
    val docs = Tables(spark, sfDir).documents
    time("read+count")(docs.count())
    val toks = col("toks")
    val sh = docs.select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .select(col("doc_id"), array_distinct(
        when(size(toks) < 3, array().cast("array<bigint>"))
          .otherwise(transform(sequence(lit(1), size(toks) - 2),
            i => xxhash64(element_at(toks, i), element_at(toks, i + 1),
              element_at(toks, i + 2))))).as("sh")).persist()
    time("shingle-hashes")(sh.count())
    val sigs = Text.minhashSignatures(sh, "doc_id", col("sh"), 64).persist()
    time("minhash-sigs")(sigs.count())
    val bands = sigs.select(col("doc_id"), explode(array(
      (0 until 8).map(b => struct(lit(b).as("band_idx"),
        xxhash64(slice(col("sig"), b * 8 + 1, 8), lit(b)).as("band_hash"))): _*)).as("bs"))
      .select(col("doc_id"), col("bs.band_idx"), col("bs.band_hash")).persist()
    time("bands")(bands.count())
    val left = bands.toDF("id1", "band_idx", "band_hash")
    val right = bands.toDF("id2", "band_idx", "band_hash")
    val cand = left.join(right, Seq("band_idx", "band_hash"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2")).distinct().persist()
    val nCand = time("bucket-pairs")(cand.count())
    println(s"candidates: $nCand")
    val confirmed = cand
      .join(sh.toDF("id1", "sh1"), "id1")
      .join(sh.toDF("id2", "sh2"), "id2")
      .filter(size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
        size(array_union(col("sh1"), col("sh2"))) >= 0.3)
    println(s"confirmed: ${time("confirm")(confirmed.count())}")
    spark.stop()
  }
}
