package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Scale patterns (SURVEY.md §5): skew salting and bucketed co-located
  * joins. Correctness is oracle-checked (a salted join must equal the
  * plain join); the scale benefit is in the shuffle shape.
  */
object Scale {

  /** Salted equi-join for skewed fact keys, targeted at the HOT keys
    * only: one partial-agg prepass finds keys carrying ≥ `hotThreshold`
    * fact rows (map-side combine collapses even a melting key to one
    * row per input partition, and the hot set is ≤ |fact|/hotThreshold
    * rows BY CONSTRUCTION — it broadcasts, never collects). The cold
    * slice joins plainly; only the hot slice salts, so only the few
    * hot dimension rows replicate ×numSalts. Salting the WHOLE
    * dimension — the naive formulation this replaced — shuffles
    * |dim|·numSalts rows regardless of skew and measured 13.1 s vs
    * the plain join's 2.9 s on the ×10 skew-amplified benchmark; the
    * targeted form pays the prepass and spreads the hot key without
    * taxing the cold path. (AQE skew-join handles the common case at
    * runtime — explicit salting is for planned-for, always-hot key
    * distributions.)
    *
    * `saltBy` must be deterministic per fact row (any non-join column
    * works; uniqueness isn't required, only spread). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
      saltBy: Seq[Column], numSalts: Int, hotThreshold: Long): DataFrame = {
    // ONE join, no hot/cold split: each side reads ONCE (the previous
    // semi/anti formulation scanned the fact three times and the dim
    // twice — at any scale, and serially on few-split inputs). A cold
    // fact row salts to 0 and meets the cold dim row's single salt-0
    // copy; a hot fact row salts by hash and meets exactly one of the
    // hot dim row's numSalts copies — row-for-row the plain join.
    val hot = fact.groupBy(col(factKey).as("__hk")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= hotThreshold)
      .select(col("__hk"), lit(true).as("__hot"))
    val saltedFact = fact
      .join(broadcast(hot), fact(factKey) === col("__hk"), "left_outer")
      .withColumn("__salt", when(col("__hot"),
        pmod(xxhash64(saltBy: _*), lit(numSalts)).cast("int")).otherwise(lit(0)))
      .drop("__hk", "__hot")
    val explodedDim = dim
      .join(broadcast(hot), dim(dimKey) === col("__hk"), "left_outer")
      .withColumn("__salt", explode(when(col("__hot"),
        array((0 until numSalts).map(lit): _*)).otherwise(array(lit(0)))))
      .drop("__hk", "__hot")
    saltedFact.join(explodedDim,
        saltedFact(factKey) === explodedDim(dimKey) &&
        saltedFact("__salt") === explodedDim("__salt"))
      .drop("__salt")
  }

  /** q15: salted orders⋈lineitem — must hash-match the plain join. */
  val q15 = QueryDef(
    "q15_salted_join",
    """SELECT o_orderpriority, COUNT(*) AS n,
      |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    // threshold: a key carrying ≥1000 lineitems is "hot" (TPC-H degree
    // is ≤7, so the driver SFs exercise the cold path; the ×10 skew
    // bench's 300k-row hot key exercises the salted path).
    // Fact projected to the five consumed columns, spread when the
    // scan planned too few splits, and persisted ONLY then (the q10
    // pattern): the hot prepass and the join probe each re-ran the
    // serial single-split scan otherwise; at real corpus widths
    // nothing is spread or cached.
    val rawFact = t.lineitem.select(col("l_orderkey"), col("l_partkey"),
      col("l_linenumber"), col("l_extendedprice"), col("l_discount"))
    val spreadFact = Tables.spread(rawFact, "l_orderkey")
    val fact = if (spreadFact eq rawFact) rawFact else spreadFact.persist()
    saltedJoin(fact, t.orders.select(col("o_orderkey"), col("o_orderpriority")),
        "l_orderkey", "o_orderkey",
        Seq(col("l_partkey"), col("l_linenumber")), numSalts = 8, hotThreshold = 1000L)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  /** Small-file compaction: rewrite a date-partitioned dataset into
    * ~`targetRowsPerFile` chunks per partition — the 100 TB
    * housekeeping op for streaming sinks (st03) that accrete a file per
    * micro-batch. Range-partitioning by the partition key keeps file
    * pruning intact after the rewrite. */
  def compact(df: DataFrame, partitionCol: String, targetRowsPerFile: Long,
      totalRows: Long): DataFrame = {
    val numFiles = math.max(1, math.ceil(totalRows.toDouble / targetRowsPerFile).toInt)
    df.repartitionByRange(numFiles, col(partitionCol))
  }

  /** Z-order layout maintenance — the OPTIMIZE-ZORDER analogue on the
    * WRITE path (i34 computes the key; this lays files out by it):
    * rewrite `df` into `numFiles` files range-partitioned on the
    * Morton key of (x, y), so every output file covers a contiguous Z
    * range and its parquet min/max column stats form a tight bbox —
    * 2-D data skipping from a 1-D sort, no spatial index. At 100 TB
    * this runs as the same housekeeping job as [[compact]] (streaming
    * sinks accrete unclustered files; this restores skippability).
    * The key is dropped before the write; rows stay Z-sorted within
    * each file so row-group stats prune too. */
  def zorderCompact(df: DataFrame, x: Column, y: Column,
      xOffset: Double, xSpan: Double, yOffset: Double, ySpan: Double,
      numFiles: Int, out: String): Unit = {
    import graft.functions.Spatial
    df.withColumn("__z", Spatial.morton16(
        Spatial.quantize8(x, xOffset, xSpan), Spatial.quantize8(y, yOffset, ySpan)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(out)
  }

  val all: Seq[QueryDef] = Seq(q15)
}
