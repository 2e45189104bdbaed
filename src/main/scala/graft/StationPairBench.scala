package graft

import graft.operators.SpatialPairs
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot micro-bench for the gated station-pair space
  * ([[SpatialPairs]]) — the i54/i55 scale rung: times the broadcast
  * all-pairs rung against the tile-bucket rung across station counts
  * straddling [[SpatialPairs.AllPairsGate]], for both the nearest-
  * station (certified ring search) and radius-pair (d² ≤ 400, i55's
  * cutoff) shapes. Checksums must agree between rungs at equal n —
  * the bench doubles as a large-n equivalence check beyond what the
  * spec's 800-station case covers. Numbers quoted in SURVEY §7. Run:
  * `sbt "runMain graft.StationPairBench"`. */
object StationPairBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("StationPairBench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("graft_stbench_").toString
    def stations(n: Int): org.apache.spark.sql.DataFrame = {
      val p = s"$dir/st_$n"
      spark.range(n).select(
        col("id").as("station"),
        round(pmod(xxhash64(col("id") * 31L + 7L), lit(1200000L)) / 10000.0 - 60.0, 4)
          .as("lat"),
        round(pmod(xxhash64(col("id") * 37L + 11L), lit(1800000L)) / 10000.0 - 90.0, 4)
          .as("lon"))
        .write.mode("overwrite").parquet(p)
      spark.read.parquet(p)
    }

    def time(label: String, rung: String, n: Int)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val r = df.agg(sum(col("nearest_station")).as("s"),
        sum(round(col("nearest_km"), 2)).as("k")).head
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"STATION_BENCH $label rung=$rung n=$n sec=$sec%.2f " +
        f"checksum=${r.getLong(0)}/${r.getDouble(1)}%.2f")
    }

    def timeRadius(rung: String, n: Int)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val r = df.filter(col("station") =!= col("other"))
        .agg(count(lit(1)).as("n"), sum(col("other")).as("s")).head
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"STATION_BENCH radius rung=$rung n=$n sec=$sec%.2f " +
        f"checksum=${r.getLong(0)}/${r.getLong(1)}")
    }

    // warmup
    time("nearest", "warmup", 1024) {
      SpatialPairs.nearestStation(stations(1024), 1024, gate = Int.MaxValue) }

    for (n <- Seq(2048, 4096, 8192, 16384, 32768)) {
      val st = stations(n).persist(); st.count()
      time("nearest", "allpairs", n) {
        SpatialPairs.nearestStation(st, n, gate = Int.MaxValue) }
      time("nearest", "tiled", n) {
        SpatialPairs.nearestStation(st, n, gate = 0) }
      st.unpersist()
    }
    // tile rung alone where all-pairs is no longer worth waiting for
    for (n <- Seq(131072, 524288)) {
      val st = stations(n).persist(); st.count()
      time("nearest", "tiled", n) {
        SpatialPairs.nearestStation(st, n, gate = 0) }
      st.unpersist()
    }

    // i55's radius shape (d² ≤ 400). A growing network covers growing
    // area at roughly constant density, so positions spread over a box
    // with side ∝ √n (≈314 in-radius neighbors/station at 0.25/unit²)
    // — the pair count is then LINEAR in n and the rung comparison
    // isolates join strategy, not neighborhood size.
    def planar(n: Int): org.apache.spark.sql.DataFrame = {
      val p = s"$dir/pl_$n"
      val side = math.sqrt(n.toDouble) * 2.0
      val cells = (side * 100).toLong
      spark.range(n).select(
        col("id").as("station"),
        round(pmod(xxhash64(col("id") * 31L + 7L), lit(cells)) / 100.0, 2).as("x"),
        round(pmod(xxhash64(col("id") * 37L + 11L), lit(cells)) / 100.0, 2).as("y"))
        .write.mode("overwrite").parquet(p)
      spark.read.parquet(p)
    }
    for (n <- Seq(4096, 16384, 32768)) {
      val a = planar(n).persist(); a.count()
      val b = a.toDF("other", "bx", "by")
      timeRadius("allpairs", n) {
        SpatialPairs.radiusPairs(a, b, "x", "y", "bx", "by", 400.0, n,
          gate = Int.MaxValue) }
      timeRadius("tiled", n) {
        SpatialPairs.radiusPairs(a, b, "x", "y", "bx", "by", 400.0, n,
          gate = 0) }
      a.unpersist()
    }
    for (n <- Seq(131072, 524288)) {
      val a = planar(n).persist(); a.count()
      val b = a.toDF("other", "bx", "by")
      timeRadius("tiled", n) {
        SpatialPairs.radiusPairs(a, b, "x", "y", "bx", "by", 400.0, n,
          gate = 0) }
      a.unpersist()
    }
    spark.stop()
  }
}
