package graft

import graft.operators.SpatialPairs
import org.apache.spark.sql.functions._

/** The gated station-pair space (i54/i55's scale rung): both rungs
  * must be value-identical on the same stations, the tile rung's plan
  * must be quadratic-free, and the certified-fallback path must stay
  * exact on adversarially sparse networks. */
class SpatialPairsSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic synthetic network: n stations over the clamped
    * [−60,60]×[−90,90] box (the i54 domain), 4-dec grid. */
  private def stations(n: Int) = spark.range(n).select(
    col("id").as("station"),
    round(pmod(xxhash64(col("id") * 31L + 7L), lit(1200000L)) / 10000.0 - 60.0, 4)
      .as("lat"),
    round(pmod(xxhash64(col("id") * 37L + 11L), lit(1800000L)) / 10000.0 - 90.0, 4)
      .as("lon"))

  test("nearestStation: all-pairs and tile rungs are value-identical") {
    val st = stations(800).persist()
    val allPairs = SpatialPairs.nearestStation(st, 800, gate = Int.MaxValue)
      .orderBy("station").collect()
    val tiled = SpatialPairs.nearestStation(st, 800, gate = 0)
      .orderBy("station").collect()
    assert(allPairs.length == 800)
    assert(allPairs.toSeq == tiled.toSeq)
    st.unpersist()
  }

  test("nearestStation: forced-fine tiling exercises the certified fallback and stays exact") {
    // k = 64 → tsLat 1.875° → certification bound ≈ 145 km; a 200-station
    // network over the full box leaves many ring-1 bests uncertified,
    // so the inline fallback must carry them — and still match all-pairs
    val st = stations(200).persist()
    val allPairs = SpatialPairs.nearestStation(st, 200, gate = Int.MaxValue)
      .orderBy("station").collect()
    val tiled = SpatialPairs.nearestStation(st, 200, gate = 0,
      tilesPerAxis = Some(64)).orderBy("station").collect()
    assert(allPairs.toSeq == tiled.toSeq)
    // and the BNLJ escape past the inline cap agrees too
    val escaped = SpatialPairs.nearestStation(st, 200, gate = 0,
      tilesPerAxis = Some(64), inlineFallbackCap = 0)
      .orderBy("station").collect()
    assert(allPairs.toSeq == escaped.toSeq)
    st.unpersist()
  }

  test("nearestStation: tile rung plan has no quadratic join above the gate") {
    val st = stations(600).persist()
    val plan = physicalPlan(SpatialPairs.nearestStation(st, 600, gate = 0))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"tile rung must equi-join on tiles, got:\n$plan")
    st.unpersist()
  }

  test("radiusPairs: rungs emit the same pair set; tile plan is equi-join only") {
    val a = stations(500).toDF("station", "x", "y")
    val b = stations(500).toDF("other", "bx", "by")
    val maxD2 = 100.0
    def key(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("station") =!= col("other"))
      .select(col("station"), col("other")).orderBy("station", "other").collect()
    val below = key(SpatialPairs.radiusPairs(a, b, "x", "y", "bx", "by",
      maxD2, 500, gate = Int.MaxValue))
    val above = key(SpatialPairs.radiusPairs(a, b, "x", "y", "bx", "by",
      maxD2, 500, gate = 0))
    assert(below.nonEmpty && below.toSeq == above.toSeq)
    val plan = physicalPlan(SpatialPairs.radiusPairs(a, b, "x", "y", "bx", "by",
      maxD2, 500, gate = 0))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"tile rung must equi-join on tiles, got:\n$plan")
  }

  test("i54/i55 stay oracle-shaped through the gate module at the driver SF") {
    // the production entries run the below-gate rung at driver SFs;
    // smoke the whole operator end-to-end after the rewiring
    val i54 = graft.operators.Ingest.i54.fn(spark, sf)
    assert(i54.count() > 0)
    val i55 = graft.operators.Ingest.i55.fn(spark, sf)
    assert(i55.count() > 0)
  }
}
