package graft

import graft.functions.Vectors
import org.apache.spark.sql.functions._

/** The K-gated codebook assignment (Vectors.codebookArgmaxCid):
  * literal-inlined argmax at small K, broadcast-codebook expression
  * ([[graft.functions.CodebookArgmaxExpr]]) above the gate. These
  * specs pin (1) bit-identical assignments across the two rungs on the
  * real embeddings table, (2) the production shape — 768-dim vectors,
  * K=256 — staying a zero-shuffle codegen'd projection with an O(1)
  * plan, and (3) parity against a plain-Scala driver recompute at that
  * shape, including the NaN (zero-norm) and exact-tie edges. */
class CodebookSpec extends SparkSpec {

  private def emb = Tables(spark, sf).embeddings
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  test("broadcast rung matches the literal-inlined rung bit-for-bit (real embeddings, K=8)") {
    val centroids = emb.filter(col("vec_id") < 8).orderBy(col("vec_id"))
      .collect().map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toArray)).toSeq
    assert(centroids.size <= Vectors.InlineCodebookK) // default gate → inline
    val inline = emb.select(col("vec_id"),
      Vectors.codebookArgmaxCid(col("v"), centroids, spark).as("cid"))
    val bcast = emb.select(col("vec_id"),
      Vectors.codebookArgmaxCid(col("v"), centroids, spark, inlineGate = 0).as("cid"))
    val mismatches = inline.join(bcast.withColumnRenamed("cid", "cid2"), "vec_id")
      .filter(col("cid") =!= col("cid2")).count()
    assert(mismatches === 0L)
  }

  // deterministic pseudo-random doubles in [-1, 1) — same generator on
  // the executor-built vectors and the driver recompute
  private def splitmix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }
  private def synthVec(seed: Long, dims: Int): Array[Double] =
    Array.tabulate(dims)(i => (splitmix(seed * 7919L + i) >>> 11).toDouble /
      (1L << 53).toDouble * 2.0 - 1.0)

  private val Dims = 768
  private val K = 256

  private lazy val prodDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_codebook_").toString
    (0 until 2000).map(r => (r.toLong, synthVec(r.toLong, Dims).toSeq))
      .toDF("vec_id", "v").write.mode("overwrite").parquet(dir)
    dir
  }

  private def prodShape() = {
    val centroids = (0 until K).map(c => (c, synthVec(1000000L + c, Dims)))
    // parquet round-trip: a local relation would constant-fold the
    // projection to a LocalTableScan and hide the plan under test
    (spark.read.parquet(prodDir), centroids)
  }

  test("production shape (768-dim, K=256): zero-shuffle, O(1) plan, codegen'd") {
    val (df, centroids) = prodShape()
    assert(centroids.size > Vectors.InlineCodebookK) // forces the broadcast rung
    val assigned = df.select(col("vec_id"),
      Vectors.codebookArgmaxCid(col("v"), centroids, spark).as("cid"))
    val plan = physicalPlan(assigned)
    assert(!plan.contains("Exchange"), s"assignment must be map-only:\n$plan")
    // the codebook (256×768 doubles ≈ 1.5 MB) must NOT be in the plan —
    // the literal rung at this K would print megabytes
    assert(plan.length < 20000, s"plan blow-up (${plan.length} chars)")
    assert(plan.contains("*(1) Project"), s"not codegen'd:\n$plan")
  }

  test("production shape: assignment parity vs a driver recompute") {
    val (df, centroids) = prodShape()
    def driverCid(v: Array[Double]): Int = {
      val vnorm = math.sqrt(v.map(x => x * x).sum)
      var bestC = 0.0; var bestCid = 0; var first = true
      centroids.foreach { case (cid, cv) =>
        var dot = 0.0; var nc = 0.0; var i = 0
        while (i < Dims) { dot += v(i) * cv(i); nc += cv(i) * cv(i); i += 1 }
        val d = vnorm * math.sqrt(nc)
        val c = if (d == 0.0) Double.NaN else dot / d
        val cmp = if (first) 1 else if (c == bestC) 0 else java.lang.Double.compare(c, bestC)
        if (cmp > 0 || (cmp == 0 && cid < bestCid)) { bestC = c; bestCid = cid }
        first = false
      }
      bestCid
    }
    val got = df.select(col("vec_id"),
      Vectors.codebookArgmaxCid(col("v"), centroids, spark).as("cid"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    (0 until 2000).foreach { r =>
      assert(got(r.toLong) === driverCid(synthVec(r.toLong, Dims)),
        s"row $r assignment diverges from the driver recompute")
    }
  }

  test("edge semantics match the SQL struct-max: zero-norm rows and exact ties → smallest cid") {
    import spark.implicits._
    // centroid 3 and 1 are identical (exact cosine tie → cid 1 wins);
    // a zero row vector gives NaN against every centroid (NaN is
    // greatest in SQL double order, ties → smallest cid = 0)
    val tied = synthVec(42L, Dims)
    val cents = Seq((0, synthVec(7L, Dims)), (1, tied), (2, synthVec(9L, Dims)), (3, tied))
    val df = Seq(
      (0L, tied.toSeq),                       // exact match of cids 1 and 3
      (1L, Array.fill(Dims)(0.0).toSeq)       // zero norm → all NaN
    ).toDF("vec_id", "v")
    val got = df.select(col("vec_id"),
      Vectors.codebookArgmaxCid(col("v"), cents, spark, inlineGate = 0).as("cid"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // the literal rung on the same input pins the reference semantics
    val ref = df.select(col("vec_id"),
      Vectors.codebookArgmaxCid(col("v"), cents, spark, inlineGate = 64).as("cid"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === ref)
    assert(got(0L) === 1)
    assert(got(1L) === 0)
  }
}
