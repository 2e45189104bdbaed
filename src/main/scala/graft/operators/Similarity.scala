package graft.operators

import graft.functions.Vectors
import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C-family similarity search (SURVEY.md §2 s01–s02) over the
  * `embeddings` table (64-dim float vectors).
  *
  * s01 is the exact baseline: broadcast the query vector, score every
  * row map-side (no shuffle), top-k via a single ordered take. s02 is
  * the scale path: hyperplane-LSH bucketing so only the query's bucket
  * is scored — at 100 TB the bucket column is a partition/cluster key
  * and the scan prunes to one bucket.
  */
object Similarity {

  /** s01: brute-force cosine top-k against the vec_id=0 query vector.
    * Index-ordered folds make the doubles bit-identical to DuckDB's
    * sequential loop, so ranking and rounded sims hash-match. */
  val s01 = QueryDef(
    "s01_cosine_topk",
    """WITH q AS (
      |  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
      |SELECT vec_id,
      |  ROUND(LIST_COSINE_SIMILARITY(CAST(embedding AS DOUBLE[]), qv) + 1e-9, 4) + 0.0 AS sim
      |FROM embeddings, q
      |WHERE vec_id <> 0
      |ORDER BY LIST_COSINE_SIMILARITY(CAST(embedding AS DOUBLE[]), qv) DESC, vec_id
      |LIMIT 10""".stripMargin) { (spark, dir) =>
    val emb = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // query norm computed ONCE on the broadcast side, not per scored row
    val query = emb.filter(col("vec_id") === 0)
      .select(col("v").as("qv"), Vectors.norm(col("v")).as("qnorm"))
    val denom = Vectors.norm(col("v")) * col("qnorm")
    emb.filter(col("vec_id") =!= 0)
      .join(broadcast(query))
      .select(col("vec_id"),
        when(denom === 0.0, lit(Double.NaN))
          .otherwise(Vectors.dot(col("v"), col("qv")) / denom).as("raw_sim"))
      .orderBy(col("raw_sim").desc, col("vec_id"))
      .limit(10)
      .select(col("vec_id"), graft.QueryDef.roundBiased(col("raw_sim"), 4).as("sim"))
  }

  /** s02: MULTI-PROBE LSH-bucketed ANN — score vectors in the query's
    * hyperplane bucket AND every Hamming-1 neighbor bucket (the
    * standard multi-probe recall lever: a near neighbor that lands
    * one sign-flip away is still found, at 5× the probe cost instead
    * of 2× the planes). 4 planes → 16 buckets, 5 probed. Fully
    * DuckDB-oracled since r7: the deterministic splitmix plane signs
    * inline as SQL literals (the parity s02b established; s02b stays
    * the single-probe variant). */
  val s02: QueryDef = {
    val planeSql = (0 until 4).map { p =>
      val arr = Vectors.planeSigns(p, 64).mkString("[", ", ", "]")
      s"CASE WHEN LIST_DOT_PRODUCT(v, $arr) >= 0 THEN ${1 << p} ELSE 0 END"
    }.mkString("(", "\n   + ", ")")
    QueryDef(
      "s02_lsh_ann",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |b AS (SELECT vec_id, v, $planeSql AS bucket FROM e),
         |q AS (SELECT v AS qv, bucket AS qb FROM b WHERE vec_id = 0)
         |SELECT vec_id,
         |  ROUND(LIST_COSINE_SIMILARITY(v, qv) + 1e-9, 4) + 0.0 AS sim
         |FROM b, q
         |WHERE XOR(bucket, qb) IN (0, 1, 2, 4, 8) AND vec_id <> 0
         |ORDER BY LIST_COSINE_SIMILARITY(v, qv) DESC, vec_id
         |LIMIT 5""".stripMargin) { (spark, dir) =>
      val emb = Tables(spark, dir).embeddings
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("bucket", Vectors.hyperplaneBucket(col("v"), 4))
      val query = emb.filter(col("vec_id") === 0)
        .select(col("v").as("qv"), col("bucket").as("qbucket"))
      emb.join(broadcast(query),
          col("bucket").bitwiseXOR(col("qbucket")).isin(0, 1, 2, 4, 8))
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"), Vectors.cosine(col("v"), col("qv")).as("raw_sim"))
        .orderBy(col("raw_sim").desc, col("vec_id"))
        .limit(5)
        .select(col("vec_id"), graft.QueryDef.roundBiased(col("raw_sim"), 4).as("sim"))
    }
  }

  /** s03: per-vector statistics (L2 norm, min/max/mean component) —
    * the normalize/quantize preprocessing stage of an embedding
    * pipeline, scalar-projected so the oracle hash-checks it. */
  val s03 = QueryDef(
    "s03_vector_stats",
    """SELECT vec_id,
      |  ROUND(SQRT(LIST_SUM(LIST_TRANSFORM(CAST(embedding AS DOUBLE[]), x -> x * x))) + 1e-9, 4) AS l2,
      |  ROUND(LIST_MIN(CAST(embedding AS DOUBLE[])) + 1e-9, 4) + 0.0 AS min_c,
      |  ROUND(LIST_MAX(CAST(embedding AS DOUBLE[])) + 1e-9, 4) + 0.0 AS max_c,
      |  ROUND(LIST_SUM(CAST(embedding AS DOUBLE[])) / LEN(embedding) + 1e-9, 4) + 0.0 AS mean_c
      |FROM embeddings ORDER BY vec_id""".stripMargin) { (spark, dir) =>
    val v = col("embedding").cast("array<double>")
    Tables(spark, dir).embeddings
      .select(col("vec_id"),
        graft.QueryDef.roundBiased(Vectors.norm(v), 4).as("l2"),
        graft.QueryDef.roundBiased(array_min(v), 4).as("min_c"),
        graft.QueryDef.roundBiased(array_max(v), 4).as("max_c"),
        graft.QueryDef.roundBiased(aggregate(v, lit(0.0), (a, x) => a + x) / size(v), 4)
          .as("mean_c"))
      .orderBy(col("vec_id"))
  }

  /** s02b: the LSH-bucketed ANN with the hyperplane sign vectors
    * inlined as SQL literals — DuckDB reproduces the bucketing AND the
    * in-bucket ranking, so the whole ANN path is hash-checked. */
  val s02b: QueryDef = {
    val planeSql = (0 until 4).map { p =>
      val arr = Vectors.planeSigns(p, 64).mkString("[", ", ", "]")
      s"CASE WHEN LIST_DOT_PRODUCT(v, $arr) >= 0 THEN ${1 << p} ELSE 0 END"
    }.mkString("(", "\n   + ", ")")
    QueryDef(
      "s02b_lsh_ann_oracle",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |b AS (SELECT vec_id, v, $planeSql AS bucket FROM e),
         |q AS (SELECT v AS qv, bucket AS qb FROM b WHERE vec_id = 0)
         |SELECT vec_id, ROUND(LIST_COSINE_SIMILARITY(v, qv) + 1e-9, 4) + 0.0 AS sim
         |FROM b, q WHERE bucket = qb AND vec_id <> 0
         |ORDER BY LIST_COSINE_SIMILARITY(v, qv) DESC, vec_id
         |LIMIT 5""".stripMargin) { (spark, dir) =>
      val emb = Tables(spark, dir).embeddings
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("bucket", Vectors.hyperplaneBucket(col("v"), 4))
      val query = emb.filter(col("vec_id") === 0)
        .select(col("v").as("qv"), col("bucket").as("qbucket"))
      emb.join(broadcast(query), col("bucket") === col("qbucket"))
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"), Vectors.cosine(col("v"), col("qv")).as("raw_sim"))
        .orderBy(col("raw_sim").desc, col("vec_id"))
        .limit(5)
        .select(col("vec_id"), graft.QueryDef.roundBiased(col("raw_sim"), 4).as("sim"))
    }
  }

  /** s04: IVF-style ANN — the coarse-quantizer alternative to s02's
    * hyperplane LSH. The first 8 data vectors form the centroid
    * codebook; every vector is assigned to its nearest centroid
    * MAP-SIDE (the codebook is driver-collected — 8×64 doubles — and
    * shipped as literals, so assignment is a zero-shuffle projection:
    * the 100 TB shape, where the inverted-list cell id becomes a
    * partition/cluster key and a query probes one cell). Search scores
    * only the query's cell. Fully DuckDB-oracled: the oracle derives
    * the same assignment via a rank over the vector×centroid cross
    * join with the identical (sim DESC, cid ASC) tie-break. */
  val s04 = QueryDef(
    "s04_ivf_ann",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
      |assign AS (
      |  SELECT vec_id, v, cid FROM (
      |    SELECT e.vec_id, e.v, c.cid,
      |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |                         ORDER BY LIST_COSINE_SIMILARITY(e.v, c.cv) DESC, c.cid) AS rn
      |    FROM e CROSS JOIN cent c) t WHERE rn = 1),
      |q AS (SELECT cid AS qcid, v AS qv FROM assign WHERE vec_id = 0)
      |SELECT vec_id, ROUND(LIST_COSINE_SIMILARITY(v, qv) + 1e-9, 4) + 0.0 AS sim
      |FROM assign, q
      |WHERE cid = qcid AND vec_id <> 0
      |ORDER BY LIST_COSINE_SIMILARITY(v, qv) DESC, vec_id
      |LIMIT 5""".stripMargin) { (spark, dir) =>
    val emb = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val centroids = emb.filter(col("vec_id") < 8).orderBy(col("vec_id"))
      .collect().map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toArray))
    // K-gated argmax (cosine desc, ties → smallest cid — the oracle's
    // ROW_NUMBER order): literal-inlined at this K, broadcast-codebook
    // expression above Vectors.InlineCodebookK
    val assigned = emb.withColumn("cid",
      Vectors.codebookArgmaxCid(col("v"), centroids.toSeq, spark)).persist()
    val q = assigned.filter(col("vec_id") === 0)
      .select(col("v").as("qv"), col("cid").as("qcid"))
    assigned.join(broadcast(q), col("cid") === col("qcid"))
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), Vectors.cosine(col("v"), col("qv")).as("raw"))
      .orderBy(col("raw").desc, col("vec_id"))
      .limit(5)
      .select(col("vec_id"), graft.QueryDef.roundBiased(col("raw"), 4).as("sim"))
  }

  /** s05: k-means training of the IVF coarse-quantizer codebook (the
    * codebook s04 probes) — spherical k-means, two Lloyd iterations,
    * deterministic seeding from the first K data vectors.
    *
    * The 100 TB shape per iteration: the assignment is a MAP-SIDE
    * projection against the broadcast/literal centroids (zero shuffle —
    * K×dims doubles is the only driver-side data, like s04's codebook),
    * and the centroid update is ONE explode + partially-aggregated
    * shuffle whose reduce side carries just K×dims groups. Nothing else
    * moves; iterations scale linearly in corpus size with no quadratic
    * term and no driver-side vectors.
    *
    * Cross-engine determinism: ties in the argmax break to the smallest
    * centroid id in both engines, and the iteration-1 means are rounded
    * to 6 decimals on BOTH sides before re-assignment, so float
    * summation order can't flip an iteration-2 assignment. */
  val s05 = QueryDef(
    "s05_kmeans_train",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |c0 AS (SELECT CAST(vec_id AS INTEGER) AS cid, v AS cv FROM e WHERE vec_id < 4),
      |a1 AS (SELECT vec_id, v, cid FROM (
      |  SELECT e.vec_id, e.v, c.cid,
      |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |                       ORDER BY LIST_COSINE_SIMILARITY(e.v, c.cv) DESC, c.cid) AS rn
      |  FROM e CROSS JOIN c0 c) t WHERE rn = 1),
      |m1 AS (SELECT cid, i, ROUND(AVG(v[i]) + 1e-9, 6) AS cx
      |       FROM a1 CROSS JOIN generate_series(1, 64) g(i) GROUP BY cid, i),
      |c1 AS (SELECT cid, LIST(cx ORDER BY i) AS cv FROM m1 GROUP BY cid),
      |a2 AS (SELECT vec_id, v, cid FROM (
      |  SELECT e.vec_id, e.v, c.cid,
      |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |                       ORDER BY LIST_COSINE_SIMILARITY(e.v, c.cv) DESC, c.cid) AS rn
      |  FROM e CROSS JOIN c1 c) t WHERE rn = 1),
      |m2 AS (SELECT cid, CAST(i - 1 AS INTEGER) AS pos,
      |         ROUND(AVG(v[i]) + 1e-9, 4) + 0.0 AS centroid
      |       FROM a2 CROSS JOIN generate_series(1, 64) g(i) GROUP BY cid, i),
      |n2 AS (SELECT cid, COUNT(*) AS n_members FROM a2 GROUP BY cid)
      |SELECT CAST(m2.cid AS BIGINT) AS cid, pos, centroid, n_members
      |FROM m2 JOIN n2 ON m2.cid = n2.cid
      |ORDER BY cid, pos""".stripMargin) { (spark, dir) =>
    val emb = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .persist()
    // K-gated argmax — (cosine desc, ties → smallest cid), the same
    // order as the oracle's ROW_NUMBER
    def assign(centroids: Seq[(Int, Array[Double])]) =
      emb.withColumn("cid", Vectors.codebookArgmaxCid(col("v"), centroids, spark))
    // per-dim means: ONE explode + partial-agg shuffle, K×64 groups out
    def dimMeans(assigned: org.apache.spark.sql.DataFrame, scale: Int) =
      assigned.select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos"))
        .agg(graft.QueryDef.roundBiased(avg(col("x")), scale).as("cx"))
    val seeds = emb.filter(col("vec_id") < 4).orderBy(col("vec_id")).collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toArray)).toSeq
    val c1 = dimMeans(assign(seeds), 6)
      .orderBy(col("cid"), col("pos")).collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map { case (cid, rows) => (cid, rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray) }
    val a2 = assign(c1).persist()
    val m2 = dimMeans(a2, 4).withColumnRenamed("cx", "centroid")
    val n2 = a2.groupBy(col("cid")).agg(count(lit(1)).as("n_members"))
    m2.join(broadcast(n2), "cid")
      .select(col("cid").cast("long").as("cid"), col("pos"), col("centroid"),
        col("n_members"))
      .orderBy(col("cid"), col("pos"))
  }

  /** s06: int8 scalar quantization of the embedding column — the
    * compression stage of an embedding pipeline (4 B float → 1 B code
    * per dim). Per-dim global min/max form the quantizer grid; they are
    * exact order-independent picks (no float-summation drift), tiny
    * (dims rows, from one partially-aggregated explode), and inlined
    * back as literals so the encode itself is a zero-shuffle map-side
    * projection — at 100 TB the stats job is a cheap prepass and the
    * encode streams. Output per vector: a position-weighted code
    * checksum (exact integer parity) and the round-trip RMSE. */
  val s06 = QueryDef(
    "s06_int8_quantize",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |st AS (SELECT i, MIN(v[i]) AS mn, MAX(v[i]) - MIN(v[i]) AS sp
      |       FROM e CROSS JOIN generate_series(1, 64) g(i) GROUP BY i),
      |q AS (SELECT e.vec_id, st.i, e.v[st.i] AS x, st.mn, st.sp,
      |        CASE WHEN st.sp = 0 THEN 0.0
      |             ELSE LEAST(GREATEST(FLOOR((e.v[st.i] - st.mn) / st.sp * 255.0), 0.0), 255.0)
      |        END AS code
      |      FROM e CROSS JOIN st),
      |r AS (SELECT vec_id, i, code,
      |        mn + (code + 0.5) * sp / 255.0 - x AS err
      |      FROM q)
      |SELECT vec_id,
      |  CAST(SUM(CAST(code AS BIGINT) * i) AS BIGINT) AS code_sum,
      |  ROUND(SQRT(SUM(err * err) / 64) + 1e-9, 6) AS rmse
      |FROM r GROUP BY vec_id ORDER BY vec_id""".stripMargin) { (spark, dir) =>
    val emb = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val stats = emb.select(posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("pos")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .orderBy(col("pos")).collect()
    val mins = stats.map(_.getDouble(1))
    val spans = stats.map(r => r.getDouble(2) - r.getDouble(1))
    // one generated loop per row (Int8QuantExpr) — association and the
    // sp == 0 (ANSI division) guard identical to the oracle SQL; the
    // interpreted transform/element_at composition it replaced is kept
    // as the parity reference in ScaleSpec
    import org.apache.spark.sql.graft.ColumnBridge
    val qs = ColumnBridge.column(graft.functions.Int8QuantExpr(
      ColumnBridge.expression(col("v")), mins, spans))
    emb.select(col("vec_id"), qs.as("q"))
      .select(col("vec_id"),
        col("q.code_sum").as("code_sum"),
        graft.QueryDef.roundBiased(sqrt(col("q.err2_sum") / 64.0), 6).as("rmse"))
      .orderBy(col("vec_id"))
  }

  /** s07: product quantization — the codebook family's third member
    * (s04 IVF cells, s06 scalar int8, s07 PQ): the 64-dim vector splits
    * into M=4 subspaces of 16 dims, each with its own K=4 k-means
    * codebook (seeded from the first K vectors, one Lloyd refinement —
    * the s05 recipe per subspace), and every vector encodes to M small
    * codes (billion-vector ANN memory layout: 64 floats → 4 codes).
    *
    * 100 TB shape: the trained codebook is K×M×16 doubles — driver-held
    * and inlined as literals exactly like s04's IVF codebook — so BOTH
    * the per-subspace assignment passes and the final encode are
    * zero-shuffle map-side projections over codegen'd dot products
    * ([[Vectors.dot]]); the only shuffles are the M tiny (K×16-group)
    * centroid-mean aggregations. Distances compare by squared L2 via
    * the dot expansion ||x||² − 2x·c + ||c||² (monotonic with the
    * oracle's LIST_DISTANCE ordering), ties break to the smaller code.
    * Output: the M codes (exact integer parity) + round-trip RMSE. */
  val s07 = QueryDef(
    "s07_pq_quantize",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |ms AS (SELECT UNNEST(RANGE(4)) AS m),
      |sub AS (SELECT vec_id, CAST(m AS INTEGER) AS m, v[m*16+1 : m*16+16] AS s
      |        FROM e CROSS JOIN ms),
      |c0 AS (SELECT CAST(vec_id AS INTEGER) AS cid, m, s AS cv FROM sub WHERE vec_id < 4),
      |a1 AS (SELECT vec_id, m, s, cid FROM (
      |   SELECT sub.vec_id, sub.m, sub.s, c.cid,
      |     ROW_NUMBER() OVER (PARTITION BY sub.vec_id, sub.m
      |                        ORDER BY LIST_DISTANCE(sub.s, c.cv), c.cid) AS rn
      |   FROM sub JOIN c0 c ON c.m = sub.m) t WHERE rn = 1),
      |m1 AS (SELECT m, cid, i, ROUND(AVG(s[i]) + 1e-9, 6) AS cx
      |       FROM a1 CROSS JOIN generate_series(1, 16) g(i) GROUP BY m, cid, i),
      |c1 AS (SELECT m, cid, LIST(cx ORDER BY i) AS cv FROM m1 GROUP BY m, cid),
      |enc AS (SELECT vec_id, m, s, cid, cv FROM (
      |   SELECT sub.vec_id, sub.m, sub.s, c.cid, c.cv,
      |     ROW_NUMBER() OVER (PARTITION BY sub.vec_id, sub.m
      |                        ORDER BY LIST_DISTANCE(sub.s, c.cv), c.cid) AS rn
      |   FROM sub JOIN c1 c ON c.m = sub.m) t WHERE rn = 1),
      |err AS (SELECT vec_id,
      |        SUM(LIST_DISTANCE(s, cv) ** 2) AS se,
      |        CAST(SUM(CASE WHEN m = 0 THEN cid END) AS INTEGER) AS code0,
      |        CAST(SUM(CASE WHEN m = 1 THEN cid END) AS INTEGER) AS code1,
      |        CAST(SUM(CASE WHEN m = 2 THEN cid END) AS INTEGER) AS code2,
      |        CAST(SUM(CASE WHEN m = 3 THEN cid END) AS INTEGER) AS code3
      |        FROM enc GROUP BY vec_id)
      |SELECT vec_id, code0, code1, code2, code3,
      |  ROUND(SQRT(se / 64.0) + 1e-9, 4) AS rmse
      |FROM err ORDER BY vec_id""".stripMargin) { (spark, dir) =>
    val (emb, c1) = pqTrain(spark, dir)
    // final encode: zero-shuffle projection; se is the min distance² of
    // each subspace (identical for tied codes, so parity holds)
    val codeCols = (0 until PqM).map(m =>
      pqBestStruct(m, c1(m)).getField("c").as(s"code$m"))
    val seTotal = (0 until PqM).map(m => pqBestStruct(m, c1(m)).getField("d"))
      .reduce(_ + _)
    emb.select(col("vec_id") +: codeCols :+
        graft.QueryDef.roundBiased(sqrt(seTotal / 64.0), 4).as("rmse"): _*)
      .orderBy(col("vec_id"))
  }

  // ---- shared PQ machinery (s07 trains, s15 serves) ----------------------
  private val PqM = 4; private val PqK = 4; private val PqS = 16

  private def pqSubCol(m: Int) = slice(col("v"), m * PqS + 1, PqS)

  // squared L2 by dot expansion — every term a codegen'd native expr
  private def pqL2sq(s: Column, cv: Array[Double]): Column =
    Vectors.dot(s, s) - lit(2.0) * Vectors.dot(s, typedlit(cv)) +
      lit(cv.map(x => x * x).sum)

  private def pqBestStruct(m: Int, cents: Seq[(Int, Array[Double])]): Column =
    array_min(array(cents.map { case (cid, cv) =>
      struct(pqL2sq(pqSubCol(m), cv).as("d"), lit(cid).as("c")) }: _*))

  /** PQ training (seeds from the first K vectors + one Lloyd round per
    * subspace): map-side assignment, then a K×S-group mean — iteration
    * means rounded to 6 on both sides so summation order can't flip an
    * encode (the s05 lesson). Returns the persisted (vec_id, v) frame
    * and the per-subspace codebooks. */
  private def pqTrain(spark: org.apache.spark.sql.SparkSession, dir: String)
      : (DataFrame, Map[Int, Seq[(Int, Array[Double])]]) = {
    val emb = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .persist()
    val seedRows = emb.filter(col("vec_id") < PqK).orderBy(col("vec_id")).collect()
    def subArr(a: Array[Double], m: Int) = a.slice(m * PqS, (m + 1) * PqS)
    val seeds = (0 until PqM).map { m =>
      m -> seedRows.map(r =>
        (r.getLong(0).toInt, subArr(r.getSeq[Double](1).toArray, m))).toSeq
    }.toMap
    val c1 = (0 until PqM).map { m =>
      val rows = emb
        .select(pqBestStruct(m, seeds(m)).getField("c").as("cid"),
          posexplode(pqSubCol(m)).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos"))
        .agg(graft.QueryDef.roundBiased(avg(col("x")), 6).as("cx"))
        .collect()
      m -> rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1)
        .map { case (cid, rs) =>
          (cid, rs.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray) }
    }.toMap
    (emb, c1)
  }

  /** s08: ANN recall evaluation — the quality harness every approximate
    * index needs: run the SAME query through the exact brute-force
    * ranking (s01) and the LSH-bucketed ANN (s02b), intersect the
    * top-k id sets, and report recall@k. At 100 TB this runs over a
    * sampled query panel (q21's deterministic sampler picks it) while
    * the corpus-side cost stays one bucket probe per query; here one
    * query keeps the oracle single-row. Both rankings are
    * deterministic, so recall itself is hash-checked — the approximate
    * operator's quality is part of the verified surface, not a claim. */
  val s08: QueryDef = {
    val planeSql = (0 until 4).map { p =>
      val arr = Vectors.planeSigns(p, 64).mkString("[", ", ", "]")
      s"CASE WHEN LIST_DOT_PRODUCT(v, $arr) >= 0 THEN ${1 << p} ELSE 0 END"
    }.mkString("(", "\n   + ", ")")
    QueryDef(
      "s08_ann_recall",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |b AS (SELECT vec_id, v, $planeSql AS bucket FROM e),
         |q AS (SELECT v AS qv, bucket AS qb FROM b WHERE vec_id = 0),
         |exact AS (SELECT vec_id FROM e, q WHERE vec_id <> 0
         |          ORDER BY LIST_COSINE_SIMILARITY(v, qv) DESC, vec_id LIMIT 10),
         |ann AS (SELECT vec_id FROM b, q WHERE bucket = qb AND vec_id <> 0
         |        ORDER BY LIST_COSINE_SIMILARITY(v, qv) DESC, vec_id LIMIT 10)
         |SELECT 10 AS k,
         |  CAST((SELECT COUNT(*) FROM ann) AS BIGINT) AS n_ann,
         |  CAST((SELECT COUNT(*) FROM ann JOIN exact USING (vec_id)) AS BIGINT) AS n_hits,
         |  ROUND((SELECT COUNT(*) FROM ann JOIN exact USING (vec_id)) / 10.0 + 1e-9, 4) AS recall
         |""".stripMargin) { (spark, dir) =>
      val emb = Tables(spark, dir).embeddings
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("bucket", Vectors.hyperplaneBucket(col("v"), 4))
        .persist()
      // eager fill: the exact and ANN rankings both read emb — a lazily
      // filled cache would let the branches race and re-bucket (p01's
      // cache-race lesson)
      emb.count()
      val query = emb.filter(col("vec_id") === 0)
        .select(col("v").as("qv"), col("bucket").as("qbucket"))
      def rank(df: org.apache.spark.sql.DataFrame) = df
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"), Vectors.cosine(col("v"), col("qv")).as("raw_sim"))
        .orderBy(col("raw_sim").desc, col("vec_id"))
        .limit(10).select(col("vec_id"))
      val exact = rank(emb.join(broadcast(query)))
      val ann = rank(emb.join(broadcast(query), col("bucket") === col("qbucket")))
      val nAnn = ann.agg(count(lit(1)).as("n_ann"))
      val nHits = ann.join(exact, "vec_id").agg(count(lit(1)).as("n_hits"))
      nAnn.join(nHits)
        .select(lit(10).as("k"), col("n_ann"), col("n_hits"),
          graft.QueryDef.roundBiased(col("n_hits") / 10.0, 4).as("recall"))
    }
  }

  /** s09: SEMANTIC dedup (the SemDeDup shape): cluster the embedding
    * space with the s04 coarse quantizer, then compare vectors only
    * WITHIN their cluster and emit pairs above the cosine threshold —
    * near-duplicate MEANING (same content re-phrased) that d02's
    * lexical shingles can't see. Keep-policy downstream is d06's
    * min-label clustering; this operator owns candidate generation +
    * confirmation.
    *
    * 100 TB shape: cell assignment is a zero-shuffle map-side argmax
    * against the literal codebook (s04), so the only shuffle is the
    * equi-join on the cell id — pairing is O(cell²) bounded by the
    * cell population, which the capBuckets guard bounds explicitly
    * (K scales with corpus size to keep cells at the target size; a
    * degenerate cell — e.g. the all-near-zero embedding cluster —
    * can't go quadratic). Fully DuckDB-oracled: assignment, capping,
    * pairing, and cosine confirm. */
  /** Capped IVF-cell assignment + within-cell cosine pairing — s09's
    * candidate/confirm core, shared with p05's cross-modal semantic
    * curation. Returns (cid, id1, id2, raw_sim) for pairs ≥ `minSim`. */
  private[graft] def semanticPairs(spark: org.apache.spark.sql.SparkSession,
      dir: String, minSim: Double = 0.4): org.apache.spark.sql.DataFrame =
    semanticPairsOf(Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v")), minSim)

  /** semanticPairs over any (vec_id, v: array<double>) frame. */
  private[graft] def semanticPairsOf(emb: org.apache.spark.sql.DataFrame,
      minSim: Double): org.apache.spark.sql.DataFrame = {
    val centroids = emb.filter(col("vec_id") < 8).orderBy(col("vec_id"))
      .collect().map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toArray))
    if (centroids.isEmpty)
      // no seed vectors ⇒ no cells ⇒ no pairs (an empty-corpus call
      // must not build a zero-arm array_max)
      return emb.select(lit(0L).as("cid"), col("vec_id").as("id1"),
        col("vec_id").as("id2"), lit(0.0).as("raw_sim")).limit(0)
    // s04's zero-shuffle K-gated assignment (cosine desc, ties to the
    // smallest centroid id like the oracle's ROW_NUMBER)
    val assigned = Dedup.capBuckets(
      emb.withColumn("cid",
        Vectors.codebookArgmaxCid(col("v"), centroids.toSeq, emb.sparkSession)
          .cast("long")),
      Seq("cid"), 256)
      .persist()
    assigned.count() // eager: both self-join branches read the cache
    assigned.toDF("id1", "v1", "cid")
      .join(assigned.toDF("id2", "v2", "cid"), Seq("cid"))
      .filter(col("id1") < col("id2"))
      .withColumn("raw_sim", Vectors.cosine(col("v1"), col("v2")))
      .filter(col("raw_sim") >= minSim)
      .select(col("cid"), col("id1"), col("id2"), col("raw_sim"))
  }

  val s09 = QueryDef(
    "s09_semantic_dedup",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
      |assign AS (
      |  SELECT vec_id, v, cid FROM (
      |    SELECT e.vec_id, e.v, c.cid,
      |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |                         ORDER BY LIST_COSINE_SIMILARITY(e.v, c.cv) DESC, c.cid) AS rn
      |    FROM e CROSS JOIN cent c) t WHERE rn = 1),
      |capped AS (SELECT vec_id, v, cid FROM (
      |  SELECT *, COUNT(*) OVER (PARTITION BY cid) AS csz FROM assign) t
      |  WHERE csz <= 256)
      |SELECT CAST(a.cid AS BIGINT) AS cid, a.vec_id AS id1, b.vec_id AS id2,
      |  ROUND(LIST_COSINE_SIMILARITY(a.v, b.v) + 1e-9, 4) AS sim
      |FROM capped a JOIN capped b ON a.cid = b.cid AND a.vec_id < b.vec_id
      |WHERE LIST_COSINE_SIMILARITY(a.v, b.v) >= 0.4
      |ORDER BY cid, id1, id2""".stripMargin) { (spark, dir) =>
    semanticPairs(spark, dir)
      .select(col("cid"), col("id1"), col("id2"),
        graft.QueryDef.roundBiased(col("raw_sim"), 4).as("sim"))
      .orderBy(col("cid"), col("id1"), col("id2"))
  }

  /** s10: dimension-TRUNCATION retrieval quality — the Matryoshka /
    * shortening-embeddings evaluation: rank the corpus against the
    * query by full 64-dim cosine and again by cosine over only the
    * FIRST 16 dims (what a prefix-truncated index stores), and measure
    * top-k agreement. The memory/recall trade of serving truncated
    * vectors, measured as a fixed deterministic number per corpus
    * (s08's harness shape with truncation in place of LSH).
    *
    * 100 TB shape: both rankings are zero-shuffle broadcast-query
    * scans; the truncated ranking reads a quarter of the vector bytes
    * (at scale: a separate 16-dim column/index, column-pruned at the
    * parquet scan). */
  val s10 = QueryDef(
    "s10_truncation_recall",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |t AS (SELECT vec_id, v, v[1:16] AS tv FROM e),
      |q AS (SELECT v AS qv, tv AS qtv FROM t WHERE vec_id = 0),
      |full_rank AS (SELECT vec_id FROM t, q WHERE vec_id <> 0
      |  ORDER BY LIST_COSINE_SIMILARITY(v, qv) DESC, vec_id LIMIT 10),
      |trunc_rank AS (SELECT vec_id FROM t, q WHERE vec_id <> 0
      |  ORDER BY LIST_COSINE_SIMILARITY(tv, qtv) DESC, vec_id LIMIT 10)
      |SELECT 10 AS k,
      |  CAST((SELECT COUNT(*) FROM trunc_rank JOIN full_rank USING (vec_id)) AS BIGINT) AS n_hits,
      |  ROUND((SELECT COUNT(*) FROM trunc_rank JOIN full_rank USING (vec_id)) / 10.0 + 1e-9, 4) AS recall
      |""".stripMargin) { (spark, dir) =>
    val emb = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("tv", slice(col("v"), 1, 16))
      .persist()
    emb.count() // eager: both rankings read the cache (s08 lesson)
    val query = emb.filter(col("vec_id") === 0)
      .select(col("v").as("qv"), col("tv").as("qtv"))
    def rank(simCol: Column) = emb.join(broadcast(query))
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), simCol.as("raw_sim"))
      .orderBy(col("raw_sim").desc, col("vec_id"))
      .limit(10).select(col("vec_id"))
    val fullRank = rank(Vectors.cosine(col("v"), col("qv")))
    val truncRank = rank(Vectors.cosine(col("tv"), col("qtv")))
    truncRank.join(fullRank, "vec_id").agg(count(lit(1)).as("n_hits"))
      .select(lit(10).as("k"), col("n_hits"),
        graft.QueryDef.roundBiased(col("n_hits") / 10.0, 4).as("recall"))
  }

  /** s11: cluster-BALANCED diversity sampling — the selection dual of
    * s09's semantic dedup: instead of dropping near-duplicate meaning,
    * cap how much any one semantic cluster contributes to the sample
    * (≤32 vectors per IVF cell, picked by deterministic md5 rank).
    * Dense clusters (boilerplate embeddings) stop dominating the
    * training mix; sparse clusters survive intact — the
    * cluster-balanced subsampling step of embedding-curated pipelines.
    *
    * 100 TB shape: cell assignment is s04's zero-shuffle literal-
    * codebook projection; the only shuffle is the per-cell rank
    * window, and the md5 rank needs no global order or RNG state —
    * the same sample comes out on any engine, any run. */
  val s11 = QueryDef(
    "s11_diversity_sample",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
      |assign AS (
      |  SELECT vec_id, cid FROM (
      |    SELECT e.vec_id, c.cid,
      |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |                         ORDER BY LIST_COSINE_SIMILARITY(e.v, c.cv) DESC, c.cid) AS rn
      |    FROM e CROSS JOIN cent c) t WHERE rn = 1),
      |r AS (SELECT cid, vec_id,
      |    CAST(COUNT(*) OVER (PARTITION BY cid) AS BIGINT) AS cell_n,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY cid
      |      ORDER BY MD5(CAST(vec_id AS VARCHAR)), vec_id) AS INTEGER) AS rk
      |  FROM assign)
      |SELECT CAST(cid AS BIGINT) AS cid, vec_id, cell_n, rk
      |FROM r WHERE rk <= 32 ORDER BY cid, rk""".stripMargin) { (spark, dir) =>
    val emb = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val centroids = emb.filter(col("vec_id") < 8).orderBy(col("vec_id"))
      .collect().map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toArray))
    // s04's zero-shuffle K-gated assignment: highest cosine wins, ties
    // to the smallest cid
    val assigned = emb
      .select(col("vec_id"),
        Vectors.codebookArgmaxCid(col("v"), centroids.toSeq, spark)
          .cast("long").as("cid"))
    val cell = org.apache.spark.sql.expressions.Window.partitionBy(col("cid"))
    val rkw = cell.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
    assigned
      .withColumn("cell_n", count(lit(1)).over(cell))
      .withColumn("rk", row_number().over(rkw))
      .filter(col("rk") <= 32)
      .select(col("cid"), col("vec_id"), col("cell_n"), col("rk"))
      .orderBy(col("cid"), col("rk"))
  }

  /** s12: maximum-INNER-PRODUCT search (MIPS) with the norm-augmentation
    * reduction (Bachrach et al. 2014 / Shrivastava & Li 2014):
    * recommendation-style retrieval ranks by raw dot product, which no
    * metric index serves directly — but appending the coordinate
    * `sqrt(M² − ‖x‖²)` (M = max corpus norm) gives every vector the
    * SAME norm M, making augmented-cosine order ≡ inner-product order,
    * so the s02/s04 cosine machinery applies unchanged. The query emits
    * the exact top-k by dot plus each hit's augmentation coordinate;
    * the constant augmented norm is what a spec asserts.
    *
    * 100 TB shape: M is one broadcast scalar (a stored corpus stat);
    * scoring is a zero-shuffle broadcast-query scan over the codegen'd
    * [[graft.functions.Vectors.dot]]; the augmented column is map-side
    * arithmetic — at scale it is materialized once at ingest and the
    * ANN index builds over it. */
  val s12 = QueryDef(
    "s12_mips",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |n AS (SELECT vec_id, v, LIST_DOT_PRODUCT(v, v) AS ns FROM e),
      |m AS (SELECT MAX(ns) AS m2 FROM n),
      |q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
      |SELECT vec_id,
      |  ROUND(LIST_DOT_PRODUCT(v, qv) + 1e-9, 4) + 0.0 AS dot,
      |  ROUND(SQRT(GREATEST(m2 - ns, 0)) + 1e-9, 4) AS aug_coord
      |FROM n, m, q WHERE vec_id <> 0
      |ORDER BY LIST_DOT_PRODUCT(v, qv) DESC, vec_id
      |LIMIT 5""".stripMargin) { (spark, dir) =>
    val emb = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("ns", Vectors.dot(col("v"), col("v")))
    val m2 = emb.agg(max(col("ns")).as("m2"))
    val q = emb.filter(col("vec_id") === 0).select(col("v").as("qv"))
    emb.crossJoin(broadcast(m2)).crossJoin(broadcast(q))
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"),
        Vectors.dot(col("v"), col("qv")).as("raw"),
        sqrt(greatest(col("m2") - col("ns"), lit(0.0))).as("aug_raw"))
      .orderBy(col("raw").desc, col("vec_id"))
      .limit(5)
      .select(col("vec_id"),
        graft.QueryDef.roundBiased(col("raw"), 4).as("dot"),
        graft.QueryDef.roundBiased(col("aug_raw"), 4).as("aug_coord"))
  }

  /** s13: INCREMENTAL centroid maintenance — q26's state-merge pattern
    * applied to s05's codebook (online/mini-batch k-means, the way a
    * production IVF index absorbs a new embedding batch without
    * retraining): the stored state is per-(centroid, dim) (Σx, n)
    * moments from the corpus; a NEW batch assigns to the CURRENT
    * centroids (zero-shuffle literal-codebook argmax, the s04 shape)
    * and reduces to its own (Σx, n) delta; the updated codebook is the
    * re-aggregated merge (Σ + Σb)/(n + nb) — the corpus is NEVER
    * rescanned, each update costs |batch| + |state|. Sums live on the
    * 1e-6 grid so the merge arithmetic is order-independent
    * cross-engine; centroids that attract no batch vectors pass
    * through via the left merge. */
  val s13 = QueryDef(
    "s13_incremental_centroids",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |corpus AS (SELECT * FROM e WHERE vec_id % 2 = 0),
      |batch AS (SELECT * FROM e WHERE vec_id % 2 = 1),
      |seeds AS (SELECT CAST(vec_id AS INTEGER) AS cid, v AS cv
      |          FROM corpus WHERE vec_id < 8),
      |a1 AS (SELECT vec_id, v, cid FROM (
      |  SELECT c.vec_id, c.v, s.cid,
      |    ROW_NUMBER() OVER (PARTITION BY c.vec_id
      |      ORDER BY LIST_COSINE_SIMILARITY(c.v, s.cv) DESC, s.cid) AS rn
      |  FROM corpus c CROSS JOIN seeds s) t WHERE rn = 1),
      |st AS (SELECT cid, i, ROUND(SUM(v[i]) + 1e-9, 6) AS s, COUNT(*) AS n
      |       FROM a1 CROSS JOIN generate_series(1, 64) g(i) GROUP BY cid, i),
      |c1 AS (SELECT cid, LIST(ROUND(s / n + 1e-9, 6) ORDER BY i) AS cv
      |       FROM st GROUP BY cid),
      |a2 AS (SELECT vec_id, v, cid FROM (
      |  SELECT b.vec_id, b.v, c.cid,
      |    ROW_NUMBER() OVER (PARTITION BY b.vec_id
      |      ORDER BY LIST_COSINE_SIMILARITY(b.v, c.cv) DESC, c.cid) AS rn
      |  FROM batch b CROSS JOIN c1 c) t WHERE rn = 1),
      |dl AS (SELECT cid, i, ROUND(SUM(v[i]) + 1e-9, 6) AS sb, COUNT(*) AS nb
      |       FROM a2 CROSS JOIN generate_series(1, 64) g(i) GROUP BY cid, i)
      |SELECT CAST(st.cid AS BIGINT) AS cid, CAST(st.i - 1 AS INTEGER) AS pos,
      |  ROUND((st.s + COALESCE(dl.sb, 0)) / (st.n + COALESCE(dl.nb, 0)) + 1e-9, 4)
      |    + 0.0 AS centroid,
      |  CAST(st.n + COALESCE(dl.nb, 0) AS BIGINT) AS n_members
      |FROM st LEFT JOIN dl ON st.cid = dl.cid AND st.i = dl.i
      |ORDER BY cid, pos""".stripMargin) { (spark, dir) =>
    val e = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .persist()
    val corpus = e.filter(col("vec_id") % 2 === 0)
    val batch = e.filter(col("vec_id") % 2 === 1)
    def assign(df: org.apache.spark.sql.DataFrame,
        centroids: Seq[(Int, Array[Double])]) =
      df.withColumn("cid", Vectors.codebookArgmaxCid(col("v"), centroids, spark))
    def moments(assigned: org.apache.spark.sql.DataFrame) = assigned
      .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("cid"), col("pos"))
      .agg(graft.QueryDef.roundBiased(sum(col("x")), 6).as("s"),
        count(lit(1)).as("n"))
    val seeds = corpus.filter(col("vec_id") < 8).orderBy(col("vec_id")).collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toArray)).toSeq
    val state = moments(assign(corpus, seeds)).persist()
    // the current codebook: K×64 doubles, driver-held model state
    val c1 = state
      .select(col("cid"),
        col("pos"), graft.QueryDef.roundBiased(col("s") / col("n"), 6).as("cx"))
      .orderBy(col("cid"), col("pos")).collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map { case (cid, rows) =>
        (cid, rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray) }
    val delta = moments(assign(batch, c1))
      .withColumnsRenamed(Map("s" -> "sb", "n" -> "nb"))
    state.join(delta, Seq("cid", "pos"), "left")
      .select(col("cid").cast("long").as("cid"), col("pos"),
        graft.QueryDef.roundBiased(
          (col("s") + coalesce(col("sb"), lit(0.0))) /
            (col("n") + coalesce(col("nb"), lit(0L))), 4).as("centroid"),
        (col("n") + coalesce(col("nb"), lit(0L))).as("n_members"))
      .orderBy(col("cid"), col("pos"))
  }

  /** s14: TWO-STAGE retrieval — the production ANN serving shape
    * (FAISS `nprobe`, ScaNN reordering): a cheap COARSE stage probes
    * the query's `nprobe` = 2 nearest IVF cells (s04 probes exactly 1
    * — higher recall costs a wider probe, never a full scan), then the
    * EXACT rerank stage scores only the shortlisted candidates.
    *
    * 100 TB shape: cell assignment is s04's zero-shuffle literal-
    * codebook argmax and the cell id is the partition key, so the
    * probe is partition PRUNING — the rerank touches nprobe/K of the
    * corpus and the exact math runs only there. The probed cell list
    * is picked by an 8-row job over the codebook (driver-bounded,
    * like the codebook itself). Fully oracled: DuckDB replays the
    * assignment, the probe ranking, and the rerank with identical
    * tie-breaks. */
  val s14 = QueryDef(
    "s14_ann_rerank",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |cent AS (SELECT CAST(vec_id AS INTEGER) AS cid, v AS cv FROM e WHERE vec_id < 8),
      |assign AS (
      |  SELECT vec_id, v, cid FROM (
      |    SELECT e.vec_id, e.v, c.cid,
      |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |                         ORDER BY LIST_COSINE_SIMILARITY(e.v, c.cv) DESC, c.cid) AS rn
      |    FROM e CROSS JOIN cent c) t WHERE rn = 1),
      |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
      |probe AS (SELECT c.cid FROM cent c, q
      |  ORDER BY LIST_COSINE_SIMILARITY(q.qv, c.cv) DESC, c.cid LIMIT 2)
      |SELECT vec_id, CAST(cid AS INTEGER) AS cid,
      |  ROUND(LIST_COSINE_SIMILARITY(v, qv) + 1e-9, 4) + 0.0 AS sim
      |FROM assign JOIN probe USING (cid), q
      |WHERE vec_id <> 0
      |ORDER BY LIST_COSINE_SIMILARITY(v, qv) DESC, vec_id
      |LIMIT 10""".stripMargin) { (spark, dir) =>
    val emb = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val centroids = emb.filter(col("vec_id") < 8).orderBy(col("vec_id"))
      .collect().map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toArray)).toSeq
    // same K-gated argmax as s04 (ties → smallest cid)
    val assigned = emb.withColumn("cid",
      Vectors.codebookArgmaxCid(col("v"), centroids, spark))
    val query = emb.filter(col("vec_id") === 0).select(col("v").as("qv"))
    // probe ranking over the K-row codebook — a driver-bounded job
    import spark.implicits._
    val centDf = centroids.map { case (cid, cv) => (cid, cv.toSeq) }.toDF("cid", "cv")
    val probed = centDf.crossJoin(broadcast(query))
      .orderBy(Vectors.cosine(col("cv"), col("qv")).desc, col("cid"))
      .limit(2).select(col("cid")).collect().map(_.getInt(0))
    assigned.filter(col("cid").isin(probed.map(Int.box): _*))
      .filter(col("vec_id") =!= 0)
      .join(broadcast(query))
      .select(col("vec_id"), col("cid"),
        Vectors.cosine(col("v"), col("qv")).as("raw"))
      .orderBy(col("raw").desc, col("vec_id"))
      .limit(10)
      .select(col("vec_id"), col("cid"),
        graft.QueryDef.roundBiased(col("raw"), 4).as("sim"))
  }

  /** s15: PQ ASYMMETRIC-DISTANCE search (ADC — Jégou et al. 2011, the
    * serving half of s07's IVF-PQ layout): the query stays FULL
    * PRECISION, each corpus vector is only its M=4 one-byte codes, and
    * distance = Σ_m dtable[m][code_m] where the per-query distance
    * table (M×K subspace distances, 16 doubles here) is computed once.
    * This is how a quantized index scans billions of codes without
    * touching a single corpus float.
    *
    * 100 TB shape: encode and lookup are ZERO-SHUFFLE map-side
    * projections against literal codebooks/tables (the only shuffles
    * are inside the shared one-round trainer); the scored scan reads
    * 4 bytes/vector where s01 reads 256. Cross-engine exactness: each
    * table entry lands on the 1e-6 decimal grid and the ADC sum is
    * DECIMAL — ranking can't flip on a float ulp. The output carries
    * the true (full-precision) distance next to the ADC estimate, so
    * the quantization gap is part of the verified surface. */
  val s15 = QueryDef(
    "s15_pq_adc_search",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |ms AS (SELECT UNNEST(RANGE(4)) AS m),
      |sub AS (SELECT vec_id, CAST(m AS INTEGER) AS m, v[m*16+1 : m*16+16] AS s
      |        FROM e CROSS JOIN ms),
      |c0 AS (SELECT CAST(vec_id AS INTEGER) AS cid, m, s AS cv FROM sub WHERE vec_id < 4),
      |a1 AS (SELECT vec_id, m, s, cid FROM (
      |   SELECT sub.vec_id, sub.m, sub.s, c.cid,
      |     ROW_NUMBER() OVER (PARTITION BY sub.vec_id, sub.m
      |                        ORDER BY LIST_DISTANCE(sub.s, c.cv), c.cid) AS rn
      |   FROM sub JOIN c0 c ON c.m = sub.m) t WHERE rn = 1),
      |m1 AS (SELECT m, cid, i, ROUND(AVG(s[i]) + 1e-9, 6) AS cx
      |       FROM a1 CROSS JOIN generate_series(1, 16) g(i) GROUP BY m, cid, i),
      |c1 AS (SELECT m, cid, LIST(cx ORDER BY i) AS cv FROM m1 GROUP BY m, cid),
      |enc AS (SELECT vec_id, m, cid FROM (
      |   SELECT sub.vec_id, sub.m, c.cid,
      |     ROW_NUMBER() OVER (PARTITION BY sub.vec_id, sub.m
      |                        ORDER BY LIST_DISTANCE(sub.s, c.cv), c.cid) AS rn
      |   FROM sub JOIN c1 c ON c.m = sub.m) t WHERE rn = 1),
      |q AS (SELECT m, s AS qs FROM sub WHERE vec_id = 0),
      |dt AS (SELECT c1.m, c1.cid,
      |    CAST(ROUND(LIST_DISTANCE(q.qs, c1.cv) ** 2 + 1e-9, 6)
      |      AS DECIMAL(18,6)) AS d2
      |  FROM c1 JOIN q USING (m)),
      |adc AS (SELECT enc.vec_id, SUM(dt.d2) AS adc
      |  FROM enc JOIN dt USING (m, cid) GROUP BY enc.vec_id),
      |qv AS (SELECT v AS qvec FROM e WHERE vec_id = 0)
      |SELECT adc.vec_id, CAST(adc.adc AS DOUBLE) AS adc_dist,
      |  ROUND(LIST_DISTANCE(e.v, qv.qvec) ** 2 + 1e-9, 4) AS true_d2
      |FROM adc JOIN e ON e.vec_id = adc.vec_id, qv
      |WHERE adc.vec_id <> 0
      |ORDER BY adc.adc, adc.vec_id LIMIT 10""".stripMargin) { (spark, dir) =>
    val (emb, c1) = pqTrain(spark, dir)
    val qArr = emb.filter(col("vec_id") === 0).collect()(0)
      .getSeq[Double](1).toArray
    def qsub(m: Int) = qArr.slice(m * PqS, (m + 1) * PqS)
    // one distance-table entry, replicating the oracle's
    // ROUND(LIST_DISTANCE(qs, cv)^2 + 1e-9, 6) exactly (sequential
    // difference sum, sqrt, square, biased half-up round)
    def d2(qs: Array[Double], cv: Array[Double]): java.math.BigDecimal = {
      var s = 0.0; var i = 0
      while (i < qs.length) { val d = qs(i) - cv(i); s += d * d; i += 1 }
      val dist = math.sqrt(s)
      java.math.BigDecimal.valueOf(dist * dist + 1e-9)
        .setScale(6, java.math.RoundingMode.HALF_UP)
    }
    val dtCols = (0 until PqM).map { m =>
      val code = pqBestStruct(m, c1(m)).getField("c")
      c1(m).foldLeft(lit(null).cast("decimal(18,6)")) {
        case (acc, (cid, cv)) =>
          when(code === cid, lit(d2(qsub(m), cv)).cast("decimal(18,6)"))
            .otherwise(acc)
      }
    }
    val adc = dtCols.reduce(_ + _)
    val trueD2 = Vectors.dot(col("v"), col("v")) -
      lit(2.0) * Vectors.dot(col("v"), typedlit(qArr)) +
      lit(qArr.map(x => x * x).sum)
    emb.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), adc.as("adcd"),
        graft.QueryDef.roundBiased(trueD2, 4).as("true_d2"))
      .orderBy(col("adcd"), col("vec_id"))
      .limit(10)
      .select(col("vec_id"), col("adcd").cast("double").as("adc_dist"),
        col("true_d2"))
  }

  /** s16: CLUSTER-QUALITY evaluation — the model-eval verb closing the
    * s05 train → assign → EVALUATE loop (the metrics a clustering job
    * publishes before its centroids are allowed to serve s04/s09):
    * per cluster, member count, INERTIA (Σ d² to own centroid),
    * mean d², and the squared distance to the nearest OTHER centroid —
    * the compactness-vs-separation pair behind Davies-Bouldin.
    * Centroids are s05's trained output (4-dec grid), re-inlined as
    * literals; assignment is the same K-gated argmax.
    *
    * Determinism: per-vector d² biased-rounds to the 1e-4 grid (the
    * fold and DuckDB's LIST_SUM walk dims in the same order — s15's
    * accepted empirical-parity stance), inertia sums those grid values
    * as DECIMAL(18,4) (exact), centroid-pair separations are K²
    * driver-side scalars. Plan: assignment + d² map-side (centroid
    * arrays broadcast), ONE cid partial agg; corpus scanned once. */
  val s16 = QueryDef(
    "s16_cluster_quality",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |c0 AS (SELECT CAST(vec_id AS INTEGER) AS cid, v AS cv FROM e WHERE vec_id < 4),
      |a1 AS (SELECT vec_id, v, cid FROM (
      |  SELECT e.vec_id, e.v, c.cid,
      |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |                       ORDER BY LIST_COSINE_SIMILARITY(e.v, c.cv) DESC, c.cid) AS rn
      |  FROM e CROSS JOIN c0 c) t WHERE rn = 1),
      |m1 AS (SELECT cid, i, ROUND(AVG(v[i]) + 1e-9, 6) AS cx
      |       FROM a1 CROSS JOIN generate_series(1, 64) g(i) GROUP BY cid, i),
      |c1 AS (SELECT cid, LIST(cx ORDER BY i) AS cv FROM m1 GROUP BY cid),
      |a2 AS (SELECT vec_id, v, cid FROM (
      |  SELECT e.vec_id, e.v, c.cid,
      |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |                       ORDER BY LIST_COSINE_SIMILARITY(e.v, c.cv) DESC, c.cid) AS rn
      |  FROM e CROSS JOIN c1 c) t WHERE rn = 1),
      |m2 AS (SELECT cid, i, ROUND(AVG(v[i]) + 1e-9, 4) + 0.0 AS cx
      |       FROM a2 CROSS JOIN generate_series(1, 64) g(i) GROUP BY cid, i),
      |c2 AS (SELECT cid, LIST(cx ORDER BY i) AS cv FROM m2 GROUP BY cid),
      |a3 AS (SELECT vec_id, v, cid FROM (
      |  SELECT e.vec_id, e.v, c.cid,
      |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |                       ORDER BY LIST_COSINE_SIMILARITY(e.v, c.cv) DESC, c.cid) AS rn
      |  FROM e CROSS JOIN c2 c) t WHERE rn = 1),
      |dd AS (SELECT a3.cid,
      |    ROUND(LIST_SUM(LIST_TRANSFORM(RANGE(1, 65),
      |      i -> (a3.v[i] - c.cv[i]) * (a3.v[i] - c.cv[i]))) + 1e-9, 4) AS d2
      |  FROM a3 JOIN c2 c USING (cid)),
      |agg AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_members,
      |    SUM(CAST(d2 AS DECIMAL(18,4))) AS inertia FROM dd GROUP BY cid),
      |sep AS (SELECT a.cid,
      |    ROUND(MIN(LIST_SUM(LIST_TRANSFORM(RANGE(1, 65),
      |      i -> (a.cv[i] - b.cv[i]) * (a.cv[i] - b.cv[i])))) + 1e-9, 4)
      |      AS min_center_d2
      |  FROM c2 a JOIN c2 b ON a.cid <> b.cid GROUP BY a.cid)
      |SELECT CAST(agg.cid AS BIGINT) AS cid, agg.n_members,
      |  ROUND(CAST(agg.inertia AS DOUBLE) + 1e-9, 4) AS inertia,
      |  ROUND(CAST(agg.inertia AS DOUBLE) / agg.n_members + 1e-9, 4) AS mean_d2,
      |  sep.min_center_d2
      |FROM agg JOIN sep ON agg.cid = sep.cid
      |ORDER BY cid""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    // trained centroids from s05 (4-dec grid), collected once
    val cents = s05.fn(spark, dir).collect()
      .groupBy(_.getLong(0)).toSeq.sortBy(_._1)
      .map { case (cid, rows) =>
        (cid.toInt, rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray)
      }
    val emb = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val assigned = emb.withColumn("cid",
      Vectors.codebookArgmaxCid(col("v"), cents, spark))
    val cvDf = cents.map { case (cid, cv) => (cid, cv.toSeq) }
      .toDF("cid", "cv")
    val d2 = graft.QueryDef.roundBiased(
      aggregate(zip_with(col("v"), col("cv"), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x), 4)
    val agg = assigned.join(broadcast(cvDf), "cid")
      .select(col("cid"), d2.as("d2"))
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_members"),
        sum(col("d2").cast("decimal(18,4)")).as("inertia"))
    def round4(x: Double): Double =
      java.math.BigDecimal.valueOf(x + 1e-9)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    val seps = cents.map { case (cid, cv) =>
      val m = cents.filter(_._1 != cid).map { case (_, o) =>
        var s = 0.0; var i = 0
        while (i < cv.length) { val dd = cv(i) - o(i); s += dd * dd; i += 1 }
        s
      }.min
      (cid, round4(m))
    }.toDF("cid", "min_center_d2")
    agg.join(broadcast(seps), "cid")
      .select(col("cid").cast("long").as("cid"), col("n_members"),
        graft.QueryDef.roundBiased(col("inertia").cast("double"), 4)
          .as("inertia"),
        graft.QueryDef.roundBiased(
          col("inertia").cast("double") / col("n_members"), 4).as("mean_d2"),
        col("min_center_d2"))
      .orderBy(col("cid"))
  }

  /** s17: HYBRID retrieval via RECIPROCAL-RANK FUSION (Cormack,
    * Clarke & Büttcher 2009, k = 60) — the standard way production
    * search stacks combine a dense and a lexical ranker without score
    * calibration: fetch top-50 by embedding cosine (s01's ranker,
    * query = vec 0) and top-50 by BM25 (t25's ranker, query =
    * [[TextAnalysis.Bm25Terms]]; embedding i models document i), then
    * score each candidate 1/(60+r_dense) + 1/(60+r_lex) over the two
    * retrieved lists and keep the fused top-10.
    *
    * Plan: each ranker is ONE corpus scan ending in a top-50
    * TakeOrderedAndProject (per-partition top-k, never a global
    * sort); ranks are then assigned on the retrieved 50-ROW lists, so
    * the unpartitioned row_number windows are bounded by the list
    * size, not the corpus. The fusion itself is a full-outer join of
    * two 50-row frames — driver-trivial at any corpus size; the only
    * wide work is the rankers' own single scans.
    *
    * Determinism: both raw rankings are bit-identical cross-engine
    * (s01/t25's proofs), so the retrieved sets and integer ranks
    * match exactly; the RRF score is a fixed two-term double sum of
    * exact-integer reciprocals, ordered on the RAW value with id
    * tiebreak and rounded only in the projection. */
  val s17: QueryDef = QueryDef(
    "s17_rrf_fusion",
    s"""WITH ${TextAnalysis.bm25RawSql},
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |dens AS (
       |  SELECT id, CAST(r AS INTEGER) AS r FROM (
       |    SELECT vec_id AS id,
       |      ROW_NUMBER() OVER (
       |        ORDER BY LIST_COSINE_SIMILARITY(v, qv) DESC, vec_id) AS r
       |    FROM e, q WHERE vec_id <> 0) t
       |  WHERE r <= 50),
       |lex AS (
       |  SELECT id, CAST(r AS INTEGER) AS r FROM (
       |    SELECT doc_id AS id,
       |      ROW_NUMBER() OVER (ORDER BY raw DESC, doc_id) AS r
       |    FROM sc WHERE doc_id <> 0) t
       |  WHERE r <= 50),
       |f AS (SELECT COALESCE(dens.id, lex.id) AS id,
       |    dens.r AS dense_rank, lex.r AS lex_rank,
       |    COALESCE(1.0 / (60 + dens.r), 0) + COALESCE(1.0 / (60 + lex.r), 0)
       |      AS rrf_raw
       |  FROM dens FULL JOIN lex ON dens.id = lex.id)
       |SELECT id, dense_rank, lex_rank, ROUND(rrf_raw + 1e-9, 6) AS rrf
       |FROM f ORDER BY rrf_raw DESC, id LIMIT 10""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val t = Tables(spark, dir)
    val emb = t.embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val query = emb.filter(col("vec_id") === 0).select(col("v").as("qv"))
    // rank windows run AFTER the top-50 take, so they see ≤50 rows
    val dens = emb.filter(col("vec_id") =!= 0)
      .join(broadcast(query))
      .select(col("vec_id").as("id"), Vectors.cosine(col("v"), col("qv")).as("raw"))
      .orderBy(col("raw").desc, col("id")).limit(50)
      .withColumn("r", row_number().over(
        Window.orderBy(col("raw").desc, col("id"))))
      .select(col("id"), col("r").as("dr"))
    val lex = TextAnalysis.bm25Raw(t.documents)
      .filter(col("doc_id") =!= 0)
      .select(col("doc_id").as("id"), col("raw"))
      .orderBy(col("raw").desc, col("id")).limit(50)
      .withColumn("r", row_number().over(
        Window.orderBy(col("raw").desc, col("id"))))
      .select(col("id"), col("r").as("lr"))
    val rrfRaw =
      coalesce(lit(1.0) / (lit(60) + col("dr")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(60) + col("lr")), lit(0.0))
    dens.join(lex, Seq("id"), "full_outer")
      .select(col("id"), col("dr").as("dense_rank"), col("lr").as("lex_rank"),
        rrfRaw.as("rrf_raw"))
      .orderBy(col("rrf_raw").desc, col("id")).limit(10)
      .select(col("id"), col("dense_rank"), col("lex_rank"),
        graft.QueryDef.roundBiased(col("rrf_raw"), 6).as("rrf"))
  }

  /** s18: k-NN LABEL PREDICTION — nearest-neighbor classification
    * over the embedding space (Fix & Hodges 1951; the label-propagation
    * verb a curation pipeline runs to extend a small set of
    * human-labeled quality/domain tags to the full corpus): every
    * probe vector (vec_id ≡ 0 mod 50 — held out of the corpus side)
    * takes its 5 nearest corpus neighbors by cosine and adopts the
    * majority label (ties → smaller label id); the output row carries
    * true vs predicted so the frame doubles as the holdout accuracy
    * table.
    *
    * 100 TB shape: probes broadcast (labeled seed sets are
    * dimension-sized); the corpus is scanned ONCE and scored
    * map-side; per-probe neighbors come from the bounded
    * [[graft.functions.TopKAggregate]] (map-side partial top-k — no
    * corpus-sized window, no global sort; q19's machinery keyed by
    * probe). Only k×|probes| rows survive to the label join and the
    * vote count, both broadcast-sized.
    *
    * Determinism: sims are the s01 expression (index-ordered fold ==
    * DuckDB's sequential loop, bit-identical), the top-k comparator
    * is exactly ROW_NUMBER's (sim DESC, vec_id ASC), and votes are
    * integers with the (count DESC, label ASC) tiebreak pinned on
    * both engines. */
  /** s18's structural cost gate (the i54/SpatialPairs discipline
    * applied to the probe×corpus space): brute-force scoring costs
    * |probes|·|corpus| vector comparisons — the suite's one remaining
    * documentation-only quadratic until r9. Above this budget s18
    * AUTO-ROUTES to the IVF-pruned path (64 coarse cells from the
    * first corpus vectors, probes score only their 8 nearest cells —
    * ~8× less work, the s04/s19 scale stance) and logs the route;
    * below it the exact brute force is both the fastest plan and the
    * DuckDB-oracled one. sf≤0.1 sits ~13× under the default, so every
    * correctness surface runs exact; the ×10 scale artifact routes.
    * `graft.s18.pairBudget` overrides the bound;
    * `graft.s18.route=brute|ivf` pins a side (specs force both). */
  val KnnPairBudget = 1000000L

  /** Counts are BY-NAME: a pinned route (specs, the documented scale
    * override) never pays the counting job at all (r9 review). */
  private def knnRouteIsBrute(spark: org.apache.spark.sql.SparkSession,
      counts: => (Long, Long)): Boolean =
    spark.conf.get("graft.s18.route", "auto") match {
      case "brute" => true
      case "ivf"   => false
      case _ =>
        val budget = spark.conf.get("graft.s18.pairBudget",
          KnnPairBudget.toString).toLong
        val (nq, nc) = counts
        val brute = nq * nc <= budget
        // the route is never silent: the trap the r8 verdict flagged
        // was walking into the quadratic at 100x without a trace
        if (!brute) System.err.println(
          s"[graft] s18: probe x corpus = $nq x $nc exceeds pairBudget " +
            s"$budget - routing to the IVF-pruned path (set " +
            "graft.s18.route=brute to force exact brute force)")
        brute
    }

  val s18 = QueryDef(
    "s18_knn_label",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
      |  FROM embeddings),
      |q AS (SELECT vec_id AS qid, v AS qv, label AS qlabel FROM e
      |  WHERE vec_id % 50 = 0),
      |c AS (SELECT vec_id, v, label FROM e WHERE vec_id % 50 <> 0),
      |sc AS (SELECT qid, qlabel, c.vec_id AS vec_id, c.label AS label,
      |    CASE WHEN LIST_DOT_PRODUCT(c.v, c.v) = 0
      |           OR LIST_DOT_PRODUCT(qv, qv) = 0
      |         THEN CAST('-infinity' AS DOUBLE)
      |         ELSE LIST_COSINE_SIMILARITY(c.v, qv) END AS sim FROM q, c),
      |nn AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
      |    ORDER BY sim DESC, vec_id) AS r FROM sc),
      |votes AS (SELECT qid, qlabel, label, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM nn WHERE r <= 5 GROUP BY 1, 2, 3),
      |pred AS (SELECT qid, qlabel, label, c,
      |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY c DESC, label) AS pr
      |  FROM votes)
      |SELECT qid AS query_id, CAST(qlabel AS INTEGER) AS true_label,
      |  CAST(label AS INTEGER) AS pred_label, c AS votes,
      |  CAST(CASE WHEN label = qlabel THEN 1 ELSE 0 END AS INTEGER) AS correct
      |FROM pred WHERE pr = 1 ORDER BY query_id""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    graft.functions.TopKAggregate.register(spark)
    val e = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
        col("label"))
    val q = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("label").as("qlabel"), Vectors.norm(col("v")).as("qnorm"))
    val corp = e.filter(col("vec_id") % 50 =!= 0)
    val denom = Vectors.norm(col("v")) * col("qnorm")
    // zero-norm vectors rank LAST deterministically: −∞, not NaN — a
    // NaN score is never ordered by graft_topk's plain comparisons and
    // would make the buffer insertion-order dependent (r7 ADVICE); the
    // oracle's CASE mirrors the same sentinel
    val sim = when(denom === 0.0, lit(Double.NegativeInfinity))
      .otherwise(Vectors.dot(col("v"), col("qv")) / denom)
    // structural gate (r8 verdict): ONE counting pass over the table,
    // and only when the route is actually auto (by-name)
    val scored =
      if (knnRouteIsBrute(spark, {
        val r = e.agg(
          count(when(col("vec_id") % 50 === 0, 1)),
          count(when(col("vec_id") % 50 =!= 0, 1))).first()
        (r.getLong(0), r.getLong(1))
      }))
        corp.join(broadcast(q))
          .select(col("qid"), col("qlabel"), col("vec_id"), sim.as("sim"))
      else {
        // IVF route: coarse cells from the first 64 corpus vectors
        // (s04's deterministic seeding), corpus assigned MAP-SIDE via
        // the codebook argmax, each probe scoring only its 8 nearest
        // cells — per-probe work drops from |corpus| to ~|corpus|/8
        // while the probe-side cell ranking is |probes|x64, broadcast-
        // sized. Approximate by design (a true neighbor outside the
        // probed cells is missed) — the documented trade the brute
        // budget protects, same as s19's centroid shortcut.
        val cents = corp.orderBy(col("vec_id")).limit(64)
          .select(col("vec_id"), col("v")).collect()
          .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](1).toArray) }
          .toSeq
        val corpCells = corp.withColumn("cell",
          Vectors.codebookArgmaxCid(col("v"), cents, spark))
        val centDf = spark.createDataFrame(
          cents.map { case (cid, cv) => (cid, cv.toSeq) })
          .toDF("cell", "cv")
        // zero-norm probe OR centroid → 0/0 = NaN, and Spark sorts NaN
        // ABOVE +Inf under desc — the −∞ sentinel (s18's own brute-path
        // discipline) keeps a zero centroid from eating a probed cell
        // on every query (r9 review)
        val cellDenom = Vectors.norm(col("qv")) * Vectors.norm(col("cv"))
        val cellSim = when(cellDenom === 0.0, lit(Double.NegativeInfinity))
          .otherwise(Vectors.dot(col("qv"), col("cv")) / cellDenom)
        val qCells = q.crossJoin(broadcast(centDf))
          .withColumn("cr", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
              .orderBy(cellSim.desc, col("cell"))))
          .filter(col("cr") <= 8)
          .select(col("qid"), col("qlabel"), col("qv"), col("qnorm"), col("cell"))
        corpCells.join(broadcast(qCells), "cell")
          .select(col("qid"), col("qlabel"), col("vec_id"), sim.as("sim"))
      }
    val top = scored
      .groupBy(col("qid"), col("qlabel"))
      .agg(expr("graft_topk(sim, vec_id, 5)").as("top"))
      .select(col("qid"), col("qlabel"),
        explode(col("top")).as("entry"))
      .select(col("qid"), col("qlabel"), col("entry.key").as("vec_id"))
    val votes = top
      .join(corp.select(col("vec_id"), col("label")), "vec_id")
      .groupBy(col("qid"), col("qlabel"), col("label"))
      .agg(count(lit(1)).as("c"))
    votes
      .withColumn("pr", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("c").desc, col("label"))))
      .filter(col("pr") === 1)
      .select(col("qid").as("query_id"),
        col("qlabel").cast("int").as("true_label"),
        col("label").cast("int").as("pred_label"),
        col("c").as("votes"),
        when(col("label") === col("qlabel"), 1).otherwise(0)
          .cast("int").as("correct"))
      .orderBy(col("query_id"))
  }

  /** s19: NEAREST-CENTROID classifier (Rocchio) — the one-pass
    * alternative to s18's k-NN for label propagation (train = one
    * mean per label, classify = K cosine comparisons per row instead
    * of a corpus top-k): per-label centroids from the train side
    * (vec_id % 50 ≠ 0), each probe adopts the label of its most
    * cosine-similar centroid. k-NN adapts to local structure; the
    * centroid model is what production uses when the corpus side is
    * 100 TB and per-row work must be O(K·dims) — the exact trade this
    * pair of operators documents.
    *
    * 100 TB shape: training is s05's centroid-update stage — ONE
    * explode + partially-aggregated shuffle with labels×64 groups
    * out; the 10 centroids collect as driver-held model state and
    * classification is the broadcast-gated
    * [[Vectors.codebookArgmaxCid]] fused argmax (zero shuffle,
    * nothing corpus-sized moves; the probe side here, the whole
    * corpus in a deployment).
    *
    * Determinism: per-dim means rounded to the 6-dec grid on BOTH
    * sides before any cosine (s05's discipline — summation order
    * can't flip an assignment), argmax ties break to the smallest
    * label on both engines. */
  /** s19's trained model: one per-label centroid from the train side
    * (vec_id % 50 ≠ 0) — ONE explode + partial-agg shuffle with
    * labels×64 groups out (s05's dimMeans shape), means pinned to the
    * 6-dec grid, collected as driver-held model state. Shared with the
    * streaming classifier (st18) so batch and stream score against
    * the IDENTICAL model. */
  private[graft] def labelCentroids(spark: org.apache.spark.sql.SparkSession,
      dir: String): Seq[(Int, Array[Double])] =
    Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
        col("label"))
      .filter(col("vec_id") % 50 =!= 0)
      .select(col("label").as("cid"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("cid"), col("pos"))
      .agg(graft.QueryDef.roundBiased(avg(col("x")), 6).as("cx"))
      .orderBy(col("cid"), col("pos")).collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map { case (cid, rows) =>
        (cid, rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray) }

  val s19 = QueryDef(
    "s19_centroid_classifier",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
      |  FROM embeddings),
      |tr AS (SELECT * FROM e WHERE vec_id % 50 <> 0),
      |m AS (SELECT label AS cid, i, ROUND(AVG(v[i]) + 1e-9, 6) AS cx
      |      FROM tr CROSS JOIN generate_series(1, 64) g(i) GROUP BY 1, 2),
      |c AS (SELECT cid, LIST(cx ORDER BY i) AS cv FROM m GROUP BY cid),
      |q AS (SELECT vec_id AS qid, v, label AS qlabel FROM e
      |  WHERE vec_id % 50 = 0),
      |a AS (SELECT qid, qlabel, cid FROM (
      |  SELECT q.qid, q.qlabel, c.cid,
      |    ROW_NUMBER() OVER (PARTITION BY q.qid
      |      ORDER BY LIST_COSINE_SIMILARITY(q.v, c.cv) DESC, c.cid) AS rn
      |  FROM q CROSS JOIN c) t WHERE rn = 1)
      |SELECT qid AS query_id, CAST(qlabel AS INTEGER) AS true_label,
      |  CAST(cid AS INTEGER) AS pred_label,
      |  CAST(CASE WHEN cid = qlabel THEN 1 ELSE 0 END AS INTEGER) AS correct
      |FROM a ORDER BY query_id""".stripMargin) { (spark, dir) =>
    val e = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
        col("label"))
    val centroids = labelCentroids(spark, dir)
    e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"),
        col("label").cast("int").as("true_label"),
        Vectors.codebookArgmaxCid(col("v"), centroids, spark)
          .cast("int").as("pred_label"))
      .select(col("query_id"), col("true_label"), col("pred_label"),
        when(col("pred_label") === col("true_label"), 1).otherwise(0)
          .cast("int").as("correct"))
      .orderBy(col("query_id"))
  }

  /** s20: CONFUSION MATRIX over the s19 centroid classifier — the
    * evaluation frame that closes the classifier chain (q41 ranks by
    * lift, p14 calibrates probabilities, s20 shows WHERE a label
    * model errs — which pairs of labels the embedding space
    * confuses): non-zero (true, predicted) cells with counts, each
    * row's share of its true-label total (the per-class recall
    * diagonal), built ON TOP of s19's prediction frame — the Spark
    * side calls s19's definition and the oracle embeds s19's SQL
    * verbatim as a CTE, so the two operators can never disagree
    * about a prediction.
    *
    * Scale rides s19's (zero-shuffle classify); the matrix agg is
    * labels²-bounded. All-integer counts, one rounded non-negative
    * share. */
  val s20 = QueryDef(
    "s20_confusion_matrix",
    s"""WITH p AS (
       |${s19.oracle.get}
       |),
       |rt AS (SELECT true_label, CAST(COUNT(*) AS BIGINT) AS row_total
       |  FROM p GROUP BY 1)
       |SELECT p.true_label AS true_label, p.pred_label AS pred_label,
       |  CAST(COUNT(*) AS BIGINT) AS n,
       |  ROUND(COUNT(*) * 1.0 / rt.row_total + 1e-9, 4) AS row_share
       |FROM p JOIN rt USING (true_label)
       |GROUP BY 1, 2, rt.row_total
       |ORDER BY true_label, pred_label""".stripMargin) { (spark, dir) =>
    val p = s19.fn(spark, dir)
    val rt = p.groupBy(col("true_label")).agg(count(lit(1)).as("row_total"))
    p.join(broadcast(rt), "true_label")
      .groupBy(col("true_label"), col("pred_label"), col("row_total"))
      .agg(count(lit(1)).as("n"))
      .select(col("true_label"), col("pred_label"), col("n"),
        graft.QueryDef.roundBiased(
          col("n") * 1.0 / col("row_total"), 4).as("row_share"))
      .orderBy(col("true_label"), col("pred_label"))
  }

  /** s21: RECALL@k CURVE — s08 reports the single recall@10 scalar;
    * tuning an ANN index needs the CURVE (recall@1/@5/@10 behave
    * differently: a bucket that holds the single nearest neighbor but
    * loses the tail shows 1.0/0.6/0.4 — exactly the signal that picks
    * nprobe): both rankings truncate at each k and the intersection
    * is counted per k. Same single-probe hyperplane bucket as s08, so
    * the two operators' @10 rows must agree (spec-locked).
    *
    * 100 TB shape: each ranking is ONE corpus scan ending in a
    * top-10 TakeOrderedAndProject; ranks are row_numbers over the
    * RETRIEVED 10-row frames (windows bounded by k, not the corpus —
    * s17's discipline); the per-k counts run on the ≤10-row joined
    * pair set against a 3-row k table. Determinism: both rankings
    * are the bit-identical s01 cosine with vec_id tiebreak. */
  val s21: QueryDef = {
    val planeSql = (0 until 4).map { p =>
      val arr = Vectors.planeSigns(p, 64).mkString("[", ", ", "]")
      s"CASE WHEN LIST_DOT_PRODUCT(v, $arr) >= 0 THEN ${1 << p} ELSE 0 END"
    }.mkString("(", "\n   + ", ")")
    QueryDef(
      "s21_recall_curve",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |b AS (SELECT vec_id, v, $planeSql AS bucket FROM e),
         |q AS (SELECT v AS qv, bucket AS qb FROM b WHERE vec_id = 0),
         |exact AS (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY
         |      LIST_COSINE_SIMILARITY(v, qv) DESC, vec_id) AS re
         |  FROM (SELECT vec_id, v FROM e, q WHERE vec_id <> 0
         |        ORDER BY LIST_COSINE_SIMILARITY(v, qv) DESC, vec_id LIMIT 10) t, q),
         |ann AS (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY
         |      LIST_COSINE_SIMILARITY(v, qv) DESC, vec_id) AS ra
         |  FROM (SELECT vec_id, v FROM b, q WHERE bucket = qb AND vec_id <> 0
         |        ORDER BY LIST_COSINE_SIMILARITY(v, qv) DESC, vec_id LIMIT 10) t, q),
         |j AS (SELECT GREATEST(e.re, a.ra) AS m
         |  FROM exact e JOIN ann a USING (vec_id)),
         |ks AS (SELECT UNNEST([1, 5, 10]) AS k)
         |SELECT k, CAST(COUNT(*) FILTER (WHERE m <= k) AS BIGINT) AS n_hits,
         |  ROUND(COUNT(*) FILTER (WHERE m <= k) * 1.0 / k + 1e-9, 4) AS recall
         |FROM ks LEFT JOIN j ON true GROUP BY k ORDER BY k""".stripMargin) {
      (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val emb = Tables(spark, dir).embeddings
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("bucket", Vectors.hyperplaneBucket(col("v"), 4))
        .persist()
      emb.count() // eager fill — both rankings read emb (s08's race note)
      val query = emb.filter(col("vec_id") === 0)
        .select(col("v").as("qv"), col("bucket").as("qbucket"))
      // rank = row_number over the RETRIEVED 10-row frame, never corpus
      def rank(df: DataFrame, rc: String) = df
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"), Vectors.cosine(col("v"), col("qv")).as("raw"))
        .orderBy(col("raw").desc, col("vec_id")).limit(10)
        .withColumn(rc,
          row_number().over(Window.orderBy(col("raw").desc, col("vec_id"))))
        .select(col("vec_id"), col(rc))
      val exact = rank(emb.join(broadcast(query)), "re")
      val ann = rank(
        emb.join(broadcast(query), col("bucket") === col("qbucket")), "ra")
      val j = exact.join(ann, "vec_id")
        .select(greatest(col("re"), col("ra")).as("m"))
      import spark.implicits._
      val ks = Seq(1, 5, 10).toDF("k")
      ks.join(j, lit(true), "left")
        .groupBy(col("k"))
        .agg(count(when(col("m") <= col("k"), 1)).as("n_hits"))
        .select(col("k"), col("n_hits"),
          graft.QueryDef.roundBiased(col("n_hits") * 1.0 / col("k"), 4)
            .as("recall"))
        .orderBy(col("k"))
    }
  }

  val all: Seq[QueryDef] =
    Seq(s01, s02, s02b, s03, s04, s05, s06, s07, s08, s09, s10, s11, s12, s13,
      s14, s15, s16, s17, s18, s19, s20, s21)
}
