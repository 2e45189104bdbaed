package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components on an undirected edge list — the shared
  * iterative core behind duplicate clustering (d06, p05) and contour
  * polyline assembly (i39b).
  *
  * Two-gear design, because the two callers produce opposite graph
  * shapes:
  *
  *   - FAST PATH: up to [[PhaseRounds]] rounds of plain neighbor-min
  *     label propagation (one cheap join + partial agg per round) —
  *     optimal for the shallow star-like components near-dup
  *     clustering produces (d06 converges in 2 rounds, measured);
  *   - SLOW PATH on cap-out: ALTERNATING LARGE-STAR / SMALL-STAR
  *     contraction (Kiveris et al. 2014, "Connected Components in
  *     MapReduce and Beyond" — public algorithm), which converges in
  *     O(log²) rounds regardless of shape. This matters for CHAIN
  *     components: plain propagation costs one round per hop of
  *     diameter (72 rounds measured on a 922-segment contour region),
  *     and region-contraction variants do NOT help — contour segment
  *     ids are monotone along a chain, so windowed-min regions never
  *     merge and contracting them just shifts the chain. Star
  *     contraction rewires every node at its neighborhood minimum,
  *     which provably halves chains (measured 8–11 rounds on
  *     200–5000-node chains).
  *
  * Two iterative-loop disciplines are load-bearing here:
  *   - lineage AND carried statistics reset between rounds: LogicalRDD
  *     carries the origin plan's size estimate through
  *     localCheckpoint, and a join plan MULTIPLIES its inputs'
  *     estimates — left alone, the carried estimate is raised to the
  *     round's join fan-in every iteration and by round ~8 Catalyst
  *     spends minutes inside BigInteger.multiply on sizeInBytes.
  *     Rebuilding a round's frame from the checkpointed RDD resets
  *     the estimate to the session default (constant planning cost);
  *   - shuffles run at EDGE-LIST-sized parallelism: a few hundred
  *     edges collapse to one partition (per-stage overhead dominates
  *     tiny iterations), a web-scale edge list fans back out to the
  *     cluster.
  */
object Components {

  /** Plain neighbor-min rounds to attempt before switching to star
    * contraction. Shallow components (near-dup families) converge
    * inside the cap; only deeper components pay the switch. */
  val PhaseRounds = 4

  /** Hard cap on star-contraction double-rounds. Two orders of
    * magnitude above anything measured (8–11 double-rounds on
    * 200–5000-node chains; the bound is O(log² n)) — its only job is
    * turning a would-be infinite loop into a loud failure. */
  val StarRoundCap = 1024

  /** Edge count below which the component solve runs ON THE DRIVER
    * (union-find over the collected edge list) instead of iterating
    * Spark jobs. The same gating argument as a broadcast join: 1M
    * pairs ≈ 16 MB — bounded driver data, far under maxResultSize —
    * while the DISTRIBUTED loop pays ~2 jobs per round × O(log²)
    * rounds of fixed scheduling overhead, which dominates wall-clock
    * for small graphs (i39b's contour graph is bounded by GRID
    * RESOLUTION, not data volume: 8.9 s of job overhead collapses to
    * one collect; the ×10 near-dup corpus lands ~250k confirmed pairs,
    * measured 5.0 s → 3.1 s for d06 when they solve driver-side).
    * Above the gate — every corpus-scale near-dup graph — the
    * distributed path is unchanged, and the gate probe itself is a
    * bounded limit(cap+1) collect. */
  val DriverSolveEdgeCap = 1000000L

  /** Components of the undirected graph given by `pairs` (first two
    * columns = the two endpoint ids, LongType). Returns one row per
    * distinct endpoint: (id, comp) with comp = minimum member id.
    * `canonical` = the caller guarantees distinct pairs with
    * first < second (skips a dedup shuffle). `driverCap` overrides
    * [[DriverSolveEdgeCap]] (tests force the distributed path with 0). */
  def minLabel(pairs: DataFrame, canonical: Boolean = false,
      driverCap: Long = DriverSolveEdgeCap): DataFrame = {
    val spark = pairs.sparkSession
    val Seq(c1, c2) = pairs.columns.take(2).toSeq
    // bounded-size gate: solve tiny graphs in one collect + union-find
    // (always unioning the larger root under the smaller makes each
    // root the component MINIMUM — the contract of the distributed
    // path), skipping O(log²) rounds of per-job scheduling overhead.
    // The probe is ONE truncated job on the RAW pair projection —
    // limit(cap+1) stops scanning once the cap is disproved, and
    // union-find is indifferent to duplicate pairs and orientation, so
    // the dedup shuffle + materializing checkpoint + count that the
    // distributed path needs are never paid here (the r7 bench showed
    // that prelude dominating grid-bounded solves at 8.3 s). Raw pairs
    // can exceed the cap while the DISTINCT edge set is under it; the
    // gate then routes to the distributed path — conservative, never
    // wrong. Self-loop pairs are skipped (not registered), matching the
    // distributed path's `a =!= b` filter.
    if (driverCap > 0 && driverCap < Int.MaxValue - 1) {
      val probe = pairs
        .select(col(c1).cast("long").as("a"), col(c2).cast("long").as("b"))
        .limit(driverCap.toInt + 1).collect()
      if (probe.length <= driverCap) {
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x
          while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        probe.foreach { row =>
          // null ids are dropped, matching the distributed path where
          // `a =!= b` filters them (null never satisfies =!=) — the
          // driver path must not NPE on data the other path tolerates
          if (!row.isNullAt(0) && !row.isNullAt(1)) {
            val (a, b) = (row.getLong(0), row.getLong(1))
            if (a != b) {
              parent.getOrElseUpdate(a, a)
              parent.getOrElseUpdate(b, b)
              val (ra, rb) = (find(a), find(b))
              if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
            }
          }
        }
        import spark.implicits._
        return parent.keys.toSeq.sorted.map(id => (id, find(id)))
          .toDF("id", "comp")
      }
    }
    // canonical callers (pair lists already distinct, first < second,
    // typically persisted) skip both the dedup shuffle and the
    // materializing checkpoint
    val canon =
      if (canonical) pairs.select(col(c1).as("a"), col(c2).as("b"))
      else pairs
        .select(least(col(c1), col(c2)).as("a"), greatest(col(c1), col(c2)).as("b"))
        .filter(col("a") =!= col("b")).distinct()
        .localCheckpoint(true)
    val nEdges = canon.count() * 2
    val parts = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong, nEdges / 100000L)).toInt
    def fresh(df: DataFrame, key: String): DataFrame = {
      val ck = df.localCheckpoint(true)
      ck.sparkSession.createDataFrame(ck.rdd, ck.schema).repartition(parts, col(key))
    }
    // labels only ever DECREASE, so Σlabel strictly decreases while any
    // node still changes — an agg is the cheapest convergence probe
    def labelSum(df: DataFrame): Long =
      df.agg(coalesce(sum(col("label")), lit(0L))).collect()(0).getLong(0)

    // One phase of plain neighbor-min rounds over `edges`; returns the
    // final labels and whether a fixpoint was reached within the cap.
    // Inner rounds truncate LINEAGE only (localCheckpoint): the carried
    // size estimate can compound for at most PhaseRounds joins before
    // the phase boundary resets it via fresh().
    def phase(edges: DataFrame): (DataFrame, Boolean) = {
      var labels = edges.select(col("u").as("id"))
        .repartition(parts, col("id")).distinct()
        .select(col("id"), col("id").as("label")).localCheckpoint(true)
      var prevSum = labelSum(labels)
      var converged = false
      var round = 0
      while (!converged && round < PhaseRounds) {
        round += 1
        val nbrMin = edges.join(labels.toDF("v", "vlab"), "v")
          .repartition(parts, col("u"))
          .groupBy(col("u").as("id")).agg(min(col("vlab")).as("nmin"))
        labels = labels.join(nbrMin, Seq("id"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
          .localCheckpoint(true)
        val s = labelSum(labels)
        converged = s == prevSum
        prevSum = s
      }
      (labels, converged)
    }

    val edges = canon.select(col("a").as("u"), col("b").as("v"))
      .union(canon.select(col("b").as("u"), col("a").as("v")))
      .repartition(parts, col("v")).persist()
    val (labels1, done1) = phase(edges)
    edges.unpersist()
    // FAST PATH: shallow components reach the fixpoint inside the cap —
    // return the labels directly, exactly the cost of the plain
    // propagation loop this generalizes
    if (done1) return labels1.select(col("id"), col("label").as("comp"))

    // SLOW PATH: star contraction. One half-round points every node's
    // larger (large-star) or not-larger (small-star) neighbors at its
    // neighborhood minimum; the edge set contracts into one star per
    // component (center = component minimum).
    def star(cur: DataFrame, large: Boolean): DataFrame = {
      val inc = cur.select(col("a").as("u"), col("b").as("v"))
        .union(cur.select(col("b").as("u"), col("a").as("v")))
        .repartition(parts, col("u"))
      val mtab = inc.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val emitted =
        if (large) inc.join(mtab, "u").filter(col("v") > col("u"))
          .select(col("v").as("x"), col("m").as("y"))
        else inc.join(mtab, "u").filter(col("v") <= col("u"))
          .select(col("v").as("x"), col("m").as("y"))
          .union(mtab.select(col("u").as("x"), col("m").as("y")))
      emitted.select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"))
        .filter(col("a") =!= col("b")).distinct()
    }
    // the edge set is a SET, so an order-independent hash fold is a
    // sound convergence probe (stable set ⇒ stable fold); XOR cannot
    // overflow where an ANSI long sum of 64-bit hashes would. The probe
    // is a TRIPLE — edge count plus two independently-keyed xxhash64
    // folds, all from ONE agg job — so declaring convergence on a hash
    // collision over a still-changing set needs two simultaneous 64-bit
    // collisions (~2^-128): belt-and-braces against a silent early
    // exit. All tie-breaks in star() are min/least — fully
    // deterministic, so every run contracts the same graph the same
    // way and the probe sequence is reproducible.
    def edgeProbe(df: DataFrame): (Long, Long, Long) = {
      val r = df.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(a, b))"), lit(0L)),
        coalesce(expr("bit_xor(xxhash64(b, a))"), lit(0L))).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    var e = fresh(canon, "a")
    var prevProbe = edgeProbe(e)
    var converged = false
    var rounds = 0
    while (!converged) {
      // hard cap: alternating star contraction converges in O(log²)
      // rounds (measured 8–11 on 5000-node chains); a run past the cap
      // means a logic regression, not a big graph — fail loudly instead
      // of looping a cluster forever
      rounds += 1
      if (rounds > StarRoundCap) throw new IllegalStateException(
        s"star contraction exceeded $StarRoundCap rounds — convergence regression")
      e = fresh(star(star(e, large = true), large = false), "a")
      val p = edgeProbe(e)
      converged = p == prevProbe
      prevProbe = p
    }
    // fixpoint = one star per component: every non-center node has
    // exactly one edge (center, node); centers map to themselves
    labels1.select(col("id"))
      .join(e.select(col("b").as("id"), col("a").as("ctr")), Seq("id"), "left")
      .select(col("id"), coalesce(col("ctr"), col("id")).as("comp"))
  }
}
