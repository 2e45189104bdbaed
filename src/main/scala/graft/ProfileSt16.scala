package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for st16 (the suite's worst ×10 slot, 6.1× in r10):
  * split the query's wall into its phases — stored-index build,
  * pre-stream band-set materialization, the stream itself — and time
  * a batch replica of the per-micro-batch compute with and without
  * the band joins, so "joins vs signature CPU" is measured, not
  * argued. Run: SPARK_GRAFT_SF_DIR=target/sf1 runMain graft.ProfileSt16 */
object ProfileSt16 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    // phase A: stored index (often tmp-cached across runs — time both)
    val idx = t("stagedCorpusIndex")(
      graft.operators.Dedup.stagedCorpusIndex(spark, dir))
    // phase B: the four persisted distinct band-key sets
    val bandKeys = t("bandKeySets(4x distinct)")(
      graft.sources.DedupIndex.bandKeySets(spark, idx))
    val sides = graft.sources.DedupIndex.bandJoinSides(spark, bandKeys)
    println(s"[profile] band keys per set: ${bandKeys.map(_.count()).mkString(",")}")

    // batch replica of the micro-batch plan (same expressions, batch
    // source): signature compute alone, then + the 4 broadcast joins
    import org.apache.spark.sql.graft.ColumnBridge
    import graft.functions.Text
    def withBands = {
      val sv = ColumnBridge.column(graft.functions.MinHashSigExpr(
        ColumnBridge.expression(col("shg")), 16))
      (0 until 4).foldLeft(
        spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("source"), col("n_chars"), col("text"))
          .filter(col("doc_id") % 2 === 1)
          .withColumn("shg",
            array_distinct(Text.shingles(Text.tokens(col("text")), 3)))
          .withColumn("sv", sv)) { (df, b) =>
        df.withColumn(s"bh$b",
          md5(concat_ws("|", slice(col("sv"), b * 4 + 1, 4))))
      }
    }
    for (round <- 1 to 2) {
      t(s"batch sig-only (r$round)") {
        withBands.select(count(col("bh0")), count(col("bh3"))).collect()
      }
      t(s"batch sig+4 joins (r$round)") {
        val joined = (0 until 4).foldLeft(withBands) { (df, b) =>
          df.join(sides(b), Seq(s"bh$b"), "left_outer")
        }
        val miss = (0 until 4).map(b => col(s"hit$b").isNull).reduce(_ && _)
        joined.groupBy(col("source")).agg(
          count(when(miss, 1)).as("n_landed"),
          count(when(!miss, 1)).as("n_neardup"),
          sum(when(miss, col("n_chars"))).as("chars_landed")).collect()
      }
    }
    // variant: ONE distinct (band_idx, band_hash) set, built in one scan
    val merged = t("merged key set (1 scan)") {
      val m = graft.sources.DedupIndex.readBands(spark, idx)
        .select(col("band_idx"), col("band_hash")).distinct().persist()
      m.count(); m
    }
    for (round <- 1 to 2) {
      t(s"batch sig+1 join (r$round)") {
        withBands.join(sides(0), Seq("bh0"), "left_outer")
          .groupBy(col("source"))
          .agg(count(when(col("hit0").isNull, 1))).collect()
      }
      t(s"batch sig+merged 1-join (r$round)") {
        // per-doc any-hit via groupBy over the exploded band rows
        val probes2 = withBands.select(col("doc_id"), col("source"),
          col("n_chars"),
          posexplode(array((0 until 4).map(b => col(s"bh$b")): _*))
            .as(Seq("band_idx", "band_hash")))
        probes2.join(broadcast(merged.withColumn("hit", lit(1))),
            Seq("band_idx", "band_hash"), "left_outer")
          .groupBy(col("doc_id"), col("source"), col("n_chars"))
          .agg(max(col("hit")).as("hit"))
          .groupBy(col("source"))
          .agg(count(when(col("hit").isNull, 1)).as("n_landed"),
            count(when(col("hit").isNotNull, 1)).as("n_neardup"),
            sum(when(col("hit").isNull, col("n_chars"))).as("chars_landed"))
          .collect()
      }
    }
    // phase C: the full streamed query as shipped
    t("st16 streamed (as shipped)") {
      graft.streaming.Streaming.st16.fn(spark, dir).count()
    }
    t("st16 streamed (2nd)") {
      graft.streaming.Streaming.st16.fn(spark, dir).count()
    }
    merged.unpersist()
    bandKeys.foreach(_.unpersist())
    // warm re-measure: the first call above pays JVM/codegen warmup
    val bk2 = t("bandKeySets (warm)")(
      graft.sources.DedupIndex.bandKeySets(spark, idx))
    bk2.foreach(_.unpersist())
    // shingle volume for context
    val stats = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 2 === 1)
      .select(size(array_distinct(Text.shingles(
        Text.tokens(col("text")), 3))).as("n"))
      .agg(count(lit(1)), sum(col("n")), max(col("n"))).collect()(0)
    println(s"[profile] stream-side docs=${stats.getLong(0)} " +
      s"shingles total=${stats.getLong(1)} max=${stats.getInt(2)}")
    spark.stop()
  }
}
