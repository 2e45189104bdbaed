package graft

import graft.functions.Text
import org.apache.spark.sql.functions._

/** Scratch profiler for d02b stage costs (dev tool): times each phase
  * of the portable md5-minhash pipeline in isolation so the expensive
  * tier is measured, not guessed. Usage: runMain graft.ProfileD02b
  * [sfDir] [reps]. */
object ProfileD02b {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = GraftConf.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables(spark, sfDir).documents
    (1 to reps).foreach { rep =>
      println(s"--- rep $rep ---")
      val sh = docs.select(col("doc_id"), Text.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          array_distinct(Text.shingles(col("toks"), 3)).as("sh")).persist()
      time("1 shingles")(sh.count())
      val sigs = graft.operators.Dedup.md5MinhashSigTable(sh, "doc_id", "sh").persist()
      time("2 md5-sig-table")(sigs.count())
      val cand = graft.operators.Dedup.bucketPairs(
        graft.operators.Dedup.bandsFromSigs(sigs, "doc_id")).persist()
      time("3 band+pairs")(cand.count())
      val estKept = cand
        .join(sigs.toDF("id1", "sv1"), "id1")
        .join(sigs.toDF("id2", "sv2"), "id2")
        .filter(size(filter(zip_with(col("sv1"), col("sv2"), (a, b) => a === b), x => x))
          .cast("double") / 16 >= 0.15)
        .select(col("id1"), col("id2")).persist()
      time("4 est-tier")(estKept.count())
      val confirmed = estKept
        .join(sh.toDF("id1", "sh1"), "id1")
        .join(sh.toDF("id2", "sh2"), "id2")
        .select(col("id1"), col("id2"),
          graft.QueryDef.roundBiased(
            size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
              size(array_union(col("sh1"), col("sh2"))), 4).as("jaccard"))
        .filter(col("jaccard") >= 0.3)
        .orderBy(col("id1"), col("id2"))
      time("5 confirm")(confirmed.count())
      Seq(sh, sigs, cand, estKept).foreach(_.unpersist())
    }
    spark.stop()
  }
}
