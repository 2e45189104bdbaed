package graft

import graft.functions.Vectors
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot micro-bench for the K-gated codebook assignment
  * ([[Vectors.codebookArgmaxCid]]) at production-like shapes: times
  * the broadcast-codebook rung at K ∈ {256, 1024} × 768 dims over a
  * synthetic corpus, next to the literal-inlined rung at the K=32
  * gate boundary — the numbers quoted in SURVEY §7. Run:
  * `sbt "runMain graft.CodebookBench [nRows]"`. */
object CodebookBench {
  private def splitmix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toInt).getOrElse(200000)
    val dims = 768
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("CodebookBench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("graft_cbbench_").toString
    // dims doubles per row from a codegen-able recurrence would still
    // constant-fold; write parquet once so every timed run is a real scan
    import spark.implicits._
    spark.range(nRows).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dims - 1)),
        i => pmod(xxhash64(col("id") * 7919L + i), lit(2000000)).cast("double")
          / 1000000.0 - 1.0).as("v"))
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)

    def codebook(k: Int): Seq[(Int, Array[Double])] =
      (0 until k).map(c => (c, Array.tabulate(dims)(i =>
        (splitmix(1000000L + c * 7919L + i) >>> 11).toDouble / (1L << 53).toDouble * 2 - 1)))

    def time(label: String, k: Int, gate: Int): Unit = {
      val cid = Vectors.codebookArgmaxCid(col("v"), codebook(k), spark, gate)
      val t0 = System.nanoTime()
      // checksum forces full evaluation; single partial agg, no shuffle cost
      val s = df.select(cid.cast("long").as("cid")).agg(sum("cid")).head.getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"CODEBOOK_BENCH $label k=$k rows=$nRows dims=$dims sec=$sec%.2f checksum=$s")
    }

    time("warmup", 32, Vectors.InlineCodebookK)
    time("inline", 32, Vectors.InlineCodebookK)   // literal rung at the gate boundary
    time("broadcast", 32, 0)                       // same K through the broadcast rung
    time("broadcast", 256, Vectors.InlineCodebookK)
    time("broadcast", 1024, Vectors.InlineCodebookK)
    spark.stop()
  }
}
