package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A-family: relational query core (SURVEY.md §2.A).
  *
  * Spark-first: declarative DataFrame plans so Catalyst handles
  * pushdown, join strategy, and partial aggregation. Small dimension
  * tables are broadcast explicitly; large-large joins shuffle once on
  * the join key with AQE re-planning. Every query is fully ordered and
  * rounds doubles (see QueryDef) for oracle hash parity.
  */
object Relational {

  /** q01: scan→filter→groupBy→agg. Partial (map-side) aggregation and
    * parquet filter pushdown are the scale levers: the shuffle carries
    * only |groups| × partitions rows. */
  val q01 = QueryDef(
    "q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  ROUND(SUM(l_quantity), 2) AS sum_qty,
      |  ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
      |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      |  ROUND(AVG(l_quantity) + 1e-9, 2) AS avg_qty,
      |  ROUND(AVG(l_extendedprice) + 1e-9, 2) AS avg_price,
      |  ROUND(AVG(l_discount) + 1e-9, 2) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        graft.QueryDef.roundBiased(avg(col("l_quantity")), 2).as("avg_qty"),
        graft.QueryDef.roundBiased(avg(col("l_extendedprice")), 2).as("avg_price"),
        graft.QueryDef.roundBiased(avg(col("l_discount")), 2).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** q02: selective filter + narrow projection; both must reach the
    * parquet scan (PushedFilters / 3-column ReadSchema) — at 100 TB this
    * is the difference between reading 3 columns of a few row groups and
    * reading everything. */
  val q02 = QueryDef(
    "q02_filter_pushdown_projection",
    """SELECT l_orderkey, l_linenumber, l_extendedprice
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00' AND l_quantity > 45
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (spark, dir) =>
    Tables(spark, dir).lineitem
      .filter(col("l_shipdate") >= lit("1998-01-01 00:00:00").cast("timestamp") && col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** q03: 5-way star join. region/nation/customer are broadcast (no
    * shuffle of the fact table for dimension lookups); only
    * orders⋈lineitem shuffles, on the join key. */
  val q03 = QueryDef(
    "q03_join_broadcast",
    """SELECT n_name,
      |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'AFRICA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    val orders = t.orders.filter(
      col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
      col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
    t.lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region.filter(col("r_name") === "AFRICA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }

  /** q04: large-large join (orders⋈lineitem) — a single shuffle on the
    * orderkey; AQE handles skew/coalescing at scale. Late-shipment
    * count per priority. */
  val q04 = QueryDef(
    "q04_join_shuffle",
    """SELECT o_orderpriority, COUNT(*) AS n_late,
      |  ROUND(AVG(l_extendedprice) + 1e-9, 2) AS avg_late_price
      |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.orders
      .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_late"),
        graft.QueryDef.roundBiased(avg(col("l_extendedprice")), 2).as("avg_late_price"))
      .orderBy(col("o_orderpriority"))
  }

  /** q05: left-semi (EXISTS) and left-anti (NOT EXISTS) joins — the
    * set-membership primitives; semi/anti never materialize the right
    * side's payload, so the shuffle carries keys only. */
  val q05 = QueryDef(
    "q05_semi_anti_join",
    """SELECT kind, n FROM (
      |  SELECT 'with_orders' AS kind, COUNT(*) AS n FROM customer
      |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |  UNION ALL
      |  SELECT 'without_orders' AS kind, COUNT(*) AS n FROM customer
      |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |) ORDER BY kind""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    val withO = t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("n")).select(lit("with_orders").as("kind"), col("n"))
    val withoutO = t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("n")).select(lit("without_orders").as("kind"), col("n"))
    withO.unionAll(withoutO).orderBy(col("kind"))
  }

  /** q06: window functions — running total + row_number per customer.
    * One shuffle on the partition key; the running sum is computed
    * within sorted partitions (no global sort). */
  val q06 = QueryDef(
    "q06_window_running",
    """SELECT o_custkey, o_orderkey,
      |  ROW_NUMBER() OVER w AS rn,
      |  ROUND(SUM(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, rn""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables(spark, dir).orders
      .select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(w).as("rn"),
        round(sum(col("o_totalprice")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
          .as("running_total"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** q07: top-k per group via rank window — never a global sort; each
    * group sorts locally after one shuffle on the group key. */
  val q07 = QueryDef(
    "q07_topk_per_group",
    """SELECT o_orderpriority, rk, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders) t
      |WHERE rk <= 3
      |ORDER BY o_orderpriority, rk""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables(spark, dir).orders
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rk"))
      .filter(col("rk") <= 3)
      .select(col("o_orderpriority"), col("rk"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("rk"))
  }

  /** q08: set operations — INTERSECT / EXCEPT distinct semantics (both
    * are hash aggregations under the hood, one shuffle each). */
  val q08 = QueryDef(
    "q08_set_ops",
    """SELECT kind, k FROM (
      |  SELECT 'both' AS kind, k FROM
      |    (SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier) a
      |  UNION ALL
      |  SELECT 'cust_only' AS kind, k FROM
      |    (SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey FROM supplier) b
      |) ORDER BY kind, k""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    val cust = t.customer.select(col("c_nationkey").as("k"))
    val supp = t.supplier.select(col("s_nationkey").as("k"))
    val both = cust.intersect(supp).select(lit("both").as("kind"), col("k"))
    val custOnly = cust.except(supp).select(lit("cust_only").as("kind"), col("k"))
    both.unionAll(custOnly).orderBy(col("kind"), col("k"))
  }

  /** q09: conditional aggregation (pivot-by-CASE) — one pass, one
    * shuffle, no per-status scans. */
  val q09 = QueryDef(
    "q09_conditional_agg",
    """SELECT o_orderpriority,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending,
      |  ROUND(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END), 2) AS open_value
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
    Tables(spark, dir).orders
      .groupBy(col("o_orderpriority"))
      .agg(
        count(when(col("o_orderstatus") === "O", 1)).as("n_open"),
        count(when(col("o_orderstatus") === "F", 1)).as("n_filled"),
        count(when(col("o_orderstatus") === "P", 1)).as("n_pending"),
        round(sum(when(col("o_orderstatus") === "O", col("o_totalprice")).otherwise(0)), 2).as("open_value"))
      .orderBy(col("o_orderpriority"))
  }

  /** q10: exact distinct counts (two-level hash agg). */
  val q10 = QueryDef(
    "q10_distinct_exact",
    """SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
      |       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
      |       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
      |FROM lineitem""".stripMargin) { (spark, dir) =>
    Tables(spark, dir).lineitem
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders"))
  }

  /** Oracle for q10b DOWNSTREAM of the estimate fixture — the HLL++
    * register state is engine-specific (DuckDB cannot read a Spark
    * sketch), so the fixture pins the ESTIMATES and the oracle
    * recomputes the EXACT side and the error gate cross-engine
    * ([[graft.Fixtures]] contract; the path is
    * [[graft.Fixtures.pathFor]]-derived, pure in the sf dir). */
  private def q10bOracleSql(path: String): String =
    s"""WITH f AS (SELECT * FROM read_parquet('$path/*.parquet')),
       |ex AS (
       |  SELECT 'orders' AS metric,
       |    CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_exact FROM lineitem
       |  UNION ALL SELECT 'parts',
       |    CAST(COUNT(DISTINCT l_partkey) AS BIGINT) FROM lineitem
       |  UNION ALL SELECT 'supps',
       |    CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) FROM lineitem)
       |SELECT f.metric AS metric, f.approx AS approx, ex.n_exact AS n_exact,
       |  ABS(f.approx - ex.n_exact) * 100 <= 5 * ex.n_exact AS within_5pct
       |FROM f JOIN ex USING (metric) ORDER BY metric""".stripMargin

  /** q10b: HLL sketch distinct — the 100 TB path where exact distinct
    * would shuffle every key; the sketch is mergeable and fixed-size.
    * PARTIAL-oracled since r8 via the estimate fixture (the d02
    * pattern): the estimates are written as a parquet fixture both
    * engines read back, DuckDB recomputes the exact counts and the
    * ±5% gate independently, and only the HLL++ register math itself
    * stays Spark-defined (q10 is the fully-exact twin). */
  def q10b: QueryDef = QueryDef.dynamic(
    "q10_approx_distinct")(dir =>
    q10bOracleSql(graft.Fixtures.pathFor(dir, "q10_approx"))) { (spark, dir) =>
    val li = Tables(spark, dir).lineitem
    // TWO separate scans on purpose: folding the exact side into the
    // sketch agg was measured 2x SLOWER (9.6 s vs 4.3 s at sf0.1) —
    // multi-column countDistinct plans as a 4-branch Expand, and the
    // per-row sketch updates then ride the 4x-multiplied row stream.
    // rsd 0.02 (stderr 2%) sits 2.5 sigma inside the oracle's ±5%
    // gate and is measured 5x cheaper per row than rsd 0.01 (1.0 s vs
    // 5.8 s for the 3-column agg — the HLL++ register array crosses a
    // size cliff below rsd ~0.015).
    //
    // Key projection is SPREAD when the scan planned too few splits
    // (single-row-group file): the per-row HLL register updates were
    // running serial on one core (~7 s of q10's ×10 wall). Persisted
    // ONLY when the spread fired — both agg jobs then share the one
    // exchange instead of re-scanning; at real corpus widths the gate
    // passes the scan through untouched and nothing is cached.
    val rawKeys = li.select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    val spreadKeys = Tables.spread(rawKeys, "l_orderkey")
    val keys = if (spreadKeys eq rawKeys) rawKeys else spreadKeys.persist()
    val approx = keys
      .agg(
        approx_count_distinct(col("l_orderkey"), 0.02).as("orders"),
        approx_count_distinct(col("l_partkey"), 0.02).as("parts"),
        approx_count_distinct(col("l_suppkey"), 0.02).as("supps"))
      .select(explode(map(
        lit("orders"), col("orders"), lit("parts"), col("parts"),
        lit("supps"), col("supps"))).as(Seq("metric", "approx")))
    val fxPath = graft.Fixtures.write(approx, dir, "q10_approx")
    val exact = keys
      .agg(
        countDistinct(col("l_orderkey")).as("orders"),
        countDistinct(col("l_partkey")).as("parts"),
        countDistinct(col("l_suppkey")).as("supps"))
      .select(explode(map(
        lit("orders"), col("orders"), lit("parts"), col("parts"),
        lit("supps"), col("supps"))).as(Seq("metric", "n_exact")))
    spark.read.parquet(fxPath)
      .join(exact, "metric")
      .select(col("metric"), col("approx"), col("n_exact"),
        (abs(col("approx") - col("n_exact")) * 100 <= col("n_exact") * 5)
          .as("within_5pct"))
      .orderBy(col("metric"))
  }

  /** q11: the same engine surface via SQL text over registered views —
    * proves the SQL interface produces the identical Catalyst plan. */
  val q11 = QueryDef(
    "q11_sql_interface",
    """SELECT n_name, ROUND(AVG(c_acctbal) + 1e-9, 2) AS avg_bal, COUNT(*) AS n_cust
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin) { (spark, dir) =>
    Tables(spark, dir).registerViews()
    spark.sql(
      """SELECT n_name, ROUND(AVG(c_acctbal) + 1e-9, 2) AS avg_bal, COUNT(*) AS n_cust
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin)
  }

  /** q12: scalar subquery (global average, broadcast as a 1-row join)
    * + correlated EXISTS as a left-semi join against the DISTINCT
    * probe keys, not the raw fact rows. A direct left-semi SMJ
    * shuffles and sorts every lineitem row; distinct-first lets the
    * map-side partial aggregate collapse the probe side to ≤|part|
    * keys BEFORE any exchange (ProfileQ12 at ×10: 3.2–4.2 s as-is →
    * 1.3–1.7 s rewritten), and AQE turns the residual join into a
    * broadcast when the key set is small. */
  val q12 = QueryDef(
    "q12_scalar_subquery_exists",
    """SELECT p_partkey, p_retailprice
      |FROM part
      |WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part)
      |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
      |ORDER BY p_partkey""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    val avgPrice = t.part.agg(avg(col("p_retailprice")).as("avg_price"))
    val probeKeys = t.lineitem.select(col("l_partkey").as("p_partkey")).distinct()
    t.part
      .join(broadcast(avgPrice))
      .filter(col("p_retailprice") > col("avg_price"))
      .join(probeKeys, Seq("p_partkey"), "left_semi")
      .select(col("p_partkey"), col("p_retailprice"))
      .orderBy(col("p_partkey"))
  }

  /** q13: ROLLUP hierarchy totals — one pass over the fact table, the
    * grouping-sets expansion happens in the aggregate, not via
    * re-scans. */
  val q13 = QueryDef(
    "q13_rollup",
    """SELECT COALESCE(l_returnflag, 'ALL') AS flag,
      |       COALESCE(l_linestatus, 'ALL') AS status,
      |       COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY flag, status""".stripMargin) { (spark, dir) =>
    Tables(spark, dir).lineitem
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("n"), col("sum_qty"))
      .orderBy(col("flag"), col("status"))
  }

  /** q14: exact quantiles per group (sort-based within groups). Both
    * engines use the same linear-interpolation definition; outputs are
    * rounded for hash parity. */
  val q14 = QueryDef(
    "q14_percentiles",
    """SELECT event_type,
      |  ROUND(QUANTILE_CONT(value, 0.25) + 1e-9, 2) AS p25,
      |  ROUND(QUANTILE_CONT(value, 0.5) + 1e-9,  2) AS p50,
      |  ROUND(QUANTILE_CONT(value, 0.75) + 1e-9, 2) AS p75,
      |  ROUND(QUANTILE_CONT(value, 0.99) + 1e-9, 2) AS p99
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (spark, dir) =>
    Tables(spark, dir).events
      .groupBy(col("event_type"))
      .agg(
        graft.QueryDef.roundBiased(percentile(col("value"), lit(0.25)), 2).as("p25"),
        graft.QueryDef.roundBiased(percentile(col("value"), lit(0.5)), 2).as("p50"),
        graft.QueryDef.roundBiased(percentile(col("value"), lit(0.75)), 2).as("p75"),
        graft.QueryDef.roundBiased(percentile(col("value"), lit(0.99)), 2).as("p99"))
      .orderBy(col("event_type"))
  }

  /** q16: order-sensitive aggregates — the row that attains each
    * group's extreme (ties broken by the paired orderkey are absent in
    * this data; doubles are unique per group). */
  val q16 = QueryDef(
    "q16_argminmax",
    """SELECT o_orderpriority,
      |  ARG_MAX(o_orderkey, o_totalprice) AS biggest_order,
      |  ARG_MIN(o_orderkey, o_totalprice) AS smallest_order,
      |  ROUND(MAX(o_totalprice), 2) AS max_price
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
    Tables(spark, dir).orders
      .groupBy(col("o_orderpriority"))
      .agg(
        max_by(col("o_orderkey"), col("o_totalprice")).as("biggest_order"),
        min_by(col("o_orderkey"), col("o_totalprice")).as("smallest_order"),
        round(max(col("o_totalprice")), 2).as("max_price"))
      .orderBy(col("o_orderpriority"))
  }

  /** q17: the typed Dataset API over the same engine — case-class rows,
    * lambda filter, typed groupByKey — proving the Dataset[T] surface
    * plans into the identical Catalyst pipeline. */
  val q17 = QueryDef(
    "q17_typed_dataset",
    """SELECT l_returnflag AS flag, COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS qty
      |FROM lineitem WHERE l_quantity > 45
      |GROUP BY l_returnflag ORDER BY flag""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val ds = Tables(spark, dir).lineitem
      .select(col("l_returnflag").as("flag"), col("l_quantity").as("qty"))
      .as[(String, Double)]
    ds.filter(_._2 > 45)
      .groupByKey(_._1)
      .agg(
        count(lit(1)).as("n").as[Long],
        round(sum(col("qty")), 2).as("qty").as[Double])
      .toDF("flag", "n", "qty")
      .orderBy(col("flag"))
  }

  /** q18: PIVOT — event_type values become columns (explicit value
    * list, so the plan is a single-pass conditional aggregation, no
    * distinct-values pre-query). */
  val q18 = QueryDef(
    "q18_pivot",
    """SELECT user_id,
      |  ROUND(COALESCE(SUM(value) FILTER (WHERE event_type = 'click'), 0), 2) AS click,
      |  ROUND(COALESCE(SUM(value) FILTER (WHERE event_type = 'purchase'), 0), 2) AS purchase,
      |  ROUND(COALESCE(SUM(value) FILTER (WHERE event_type = 'view'), 0), 2) AS view
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (spark, dir) =>
    Tables(spark, dir).events
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "purchase", "view"))
      .agg(sum(col("value")))
      .select(col("user_id"),
        round(coalesce(col("click"), lit(0)), 2).as("click"),
        round(coalesce(col("purchase"), lit(0)), 2).as("purchase"),
        round(coalesce(col("view"), lit(0)), 2).as("view"))
      .orderBy(col("user_id"))
  }

  /** q19: top-k per group via the custom bounded TopKAggregate — the
    * scale-correct formulation of q07 (map-side buffers carry ≤k rows
    * per group; no full-partition sort). Same oracle as q07. */
  val q19 = QueryDef(
    "q19_topk_aggregate",
    """SELECT o_orderpriority, rk, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders) t
      |WHERE rk <= 3
      |ORDER BY o_orderpriority, rk""".stripMargin) { (spark, dir) =>
    graft.functions.TopKAggregate.register(spark)
    Tables(spark, dir).orders
      .groupBy(col("o_orderpriority"))
      .agg(expr("graft_topk(o_totalprice, o_orderkey, 3)").as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")).as(Seq("pos", "entry")))
      .select(col("o_orderpriority"),
        (col("pos") + 1).cast("int").as("rk"),
        col("entry.key").as("o_orderkey"),
        col("entry.score").as("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("rk"))
  }

  /** Oracle for q20 DOWNSTREAM of the estimate fixture — the
    * DataSketches HLL binary is engine-specific (DuckDB cannot union
    * Spark sketches), so the fixture pins the per-month AND merged
    * estimates and the oracle recomputes the exact twins and the ±5%
    * gate cross-engine ([[graft.Fixtures]] contract; the path is
    * [[graft.Fixtures.pathFor]]-derived, pure in the sf dir). */
  private def q20OracleSql(path: String): String =
    s"""WITH f AS (SELECT * FROM read_parquet('$path/*.parquet')),
       |ex AS (SELECT CAST(MONTH(o_orderdate) AS INTEGER) AS mon,
       |         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact
       |       FROM orders GROUP BY 1
       |       UNION ALL
       |       SELECT 0, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders)
       |SELECT f.mon AS mon, f.est AS est, ex.n_exact AS n_exact,
       |  ABS(f.est - ex.n_exact) * 100 <= 5 * ex.n_exact AS within_5pct
       |FROM f JOIN ex USING (mon) ORDER BY mon""".stripMargin

  /** q20: MERGEABLE sketch state — the capability that makes
    * incremental 100 TB distinct-counting possible: build an HLL
    * (DataSketches) sketch per month partition, then RE-AGGREGATE the
    * stored sketches to the yearly total WITHOUT rescanning the data —
    * exactly how an incremental ingest (the reference's per-slice
    * cycle) maintains global distincts: union the new slice's sketch
    * into the running one. PARTIAL-oracled since r8 via the estimate
    * fixture (the d02 pattern): per-month and merged estimates are
    * written as a parquet fixture both engines read back, DuckDB
    * recomputes every exact twin and the ±5% gate independently, and
    * only the sketch register math stays Spark-defined (a spec also
    * bounds the relative error). mon=0 is the merged-total row. */
  def q20: QueryDef = QueryDef.dynamic(
    "q20_sketch_merge")(dir =>
    q20OracleSql(graft.Fixtures.pathFor(dir, "q20_est"))) { (spark, dir) =>
    // spread: the per-row sketch updates + the countDistinct Expand ran
    // serial on the single-split scan (key projection only — 2 columns)
    val orders = Tables.spread(Tables(spark, dir).orders
      .select(col("o_orderdate"), col("o_custkey")), "o_custkey")
    val monthly = orders
      .groupBy(month(col("o_orderdate")).as("mon"))
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"),
        countDistinct(col("o_custkey")).as("n_exact"))
      .persist()
    // eager: the union below references the cache from two branches —
    // lazily-filled caches race and double-compute the sketch scan
    monthly.count()
    val perMonth = monthly.select(col("mon"),
      hll_sketch_estimate(col("sk")).as("est"))
    val total = monthly
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .select(lit(0).as("mon"), col("est"))
    val fxPath =
      graft.Fixtures.write(perMonth.unionByName(total), dir, "q20_est")
    val exact = monthly.select(col("mon"), col("n_exact"))
      .unionByName(orders.agg(countDistinct(col("o_custkey")).as("n_exact"))
        .select(lit(0).as("mon"), col("n_exact")))
    spark.read.parquet(fxPath)
      .join(exact, "mon")
      .select(col("mon"), col("est"), col("n_exact"),
        (abs(col("est") - col("n_exact")) * 100 <= col("n_exact") * 5)
          .as("within_5pct"))
      .orderBy(col("mon"))
  }

  /** q21: deterministic hash-based stratified sampling — each stratum
    * (order status) keeps rows whose md5(key) prefix falls below a
    * per-stratum threshold. No RNG, no seed coordination, no
    * sampleBy: the SAME rows are selected on any engine, any cluster
    * size, any re-run — the property a reproducible 100 TB training-
    * data subset actually needs (resampling a corpus must not depend
    * on partition layout). Map-only with partial aggregation; the
    * per-stratum thresholds ride inline as a CASE, a broadcast rate
    * table in the general form. Parity: Spark's md5 and DuckDB's MD5
    * both emit lowercase hex over the identical decimal rendering of
    * the BIGINT key. */
  val q21 = QueryDef(
    "q21_hash_sample",
    """WITH s AS (
      |  SELECT o_orderstatus, o_orderkey,
      |    SUBSTR(MD5(CAST(o_orderkey AS VARCHAR)), 1, 2) AS hh,
      |    CASE o_orderstatus WHEN 'O' THEN '40' WHEN 'F' THEN '20' ELSE '80' END AS thr
      |  FROM orders)
      |SELECT o_orderstatus, COUNT(*) AS n_total,
      |  COUNT(*) FILTER (WHERE hh < thr) AS n_sampled,
      |  ROUND(COUNT(*) FILTER (WHERE hh < thr) * 1.0 / COUNT(*) + 1e-9, 4) AS rate,
      |  CAST(SUM(CASE WHEN hh < thr THEN o_orderkey ELSE 0 END) AS BIGINT) AS key_checksum
      |FROM s GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (spark, dir) =>
    val hh = substring(md5(col("o_orderkey").cast("string")), 1, 2)
    val thr = when(col("o_orderstatus") === "O", "40")
      .when(col("o_orderstatus") === "F", "20").otherwise("80")
    Tables(spark, dir).orders
      .select(col("o_orderstatus"), col("o_orderkey"), (hh < thr).as("keep"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_total"),
        count(when(col("keep"), 1)).as("n_sampled"),
        graft.QueryDef.roundBiased(
          count(when(col("keep"), 1)) * lit(1.0) / count(lit(1)), 4).as("rate"),
        sum(when(col("keep"), col("o_orderkey")).otherwise(0L)).as("key_checksum"))
      .orderBy(col("o_orderstatus"))
  }

  /** q22: join-key skew profile — the diagnostic behind every salting /
    * AQE-skew decision: per-key cardinalities of the lineitem join key,
    * reduced to the distribution's shape (count of keys, max/p99/median
    * group size, the share of rows owned by the single heaviest key,
    * and the top heavy hitters). Two partially-aggregated passes: rows
    * → per-key counts (shuffle carries keys only), then per-key counts
    * → ~10 distribution rows. At 100 TB this is the cheap prepass you
    * run BEFORE choosing q15's salt factor. The exact `percentile` is
    * kept for oracle parity; at extreme key cardinality swap it for
    * `approx_percentile` (mergeable sketch — no single-reducer sort of
    * billions of per-key counts). */
  val q22 = QueryDef(
    "q22_skew_profile",
    """WITH k AS (
      |  SELECT l_orderkey AS key, COUNT(*) AS n FROM lineitem GROUP BY l_orderkey),
      |stats AS (
      |  SELECT COUNT(*) AS n_keys,
      |    CAST(SUM(n) AS BIGINT) AS n_rows,
      |    CAST(MAX(n) AS BIGINT) AS max_group,
      |    ROUND(QUANTILE_CONT(n, 0.99) + 1e-9, 2) AS p99_group,
      |    ROUND(QUANTILE_CONT(n, 0.5) + 1e-9, 2) AS median_group
      |  FROM k),
      |heavy AS (
      |  SELECT CAST(MAX(n) AS BIGINT) AS top_n FROM k)
      |SELECT n_keys, n_rows, max_group, p99_group, median_group,
      |  ROUND(top_n * 1.0 / n_rows + 1e-9, 6) AS top_key_share
      |FROM stats, heavy""".stripMargin) { (spark, dir) =>
    val perKey = Tables(spark, dir).lineitem
      .groupBy(col("l_orderkey").as("key")).agg(count(lit(1)).as("n"))
    perKey.agg(
        count(lit(1)).as("n_keys"),
        sum(col("n")).as("n_rows"),
        max(col("n")).as("max_group"),
        // exact interpolated quantiles — the q14-proven portable pair
        // (Spark `percentile` ↔ DuckDB QUANTILE_CONT)
        graft.QueryDef.roundBiased(percentile(col("n"), lit(0.99)), 2).as("p99_group"),
        graft.QueryDef.roundBiased(percentile(col("n"), lit(0.5)), 2).as("median_group"))
      .withColumn("top_key_share",
        graft.QueryDef.roundBiased(col("max_group") * lit(1.0) / col("n_rows"), 6))
      .select(col("n_keys"), col("n_rows"), col("max_group"),
        col("p99_group"), col("median_group"), col("top_key_share"))
  }

  /** q23: interval (range) join — events matched to OVERLAPPING time
    * windows, an operator Spark's equi-join machinery can't express
    * directly: the naive formulation `e.ts >= ws AND e.ts < we` plans
    * a BroadcastNestedLoopJoin (every row against every window).
    * Standard bucket-quantization rewrite instead: each window explodes
    * into the day buckets it covers, events map to their single day
    * bucket, and the theta-join becomes an equi-join on the bucket plus
    * a residual range filter. Work drops from |events|×|windows| to
    * |events|×(windows overlapping that day).
    *
    * 100 TB: the exploded window→bucket table stays tiny (windows ×
    * avg days covered) and is broadcast, so the event side never
    * shuffles for the join; bucket granularity tracks the window span
    * (days here; hours for narrow windows). The window set is a
    * deterministic literal (10 tight 2-day windows + 4 wide 5-day
    * windows, overlapping) so the oracle can inline identical VALUES. */
  val q23: QueryDef = {
    val narrow = (0 until 10).map { k =>
      (k, f"2024-01-${1 + 3 * k}%02d 00:00:00", f"2024-01-${3 + 3 * k}%02d 00:00:00")
    }
    val wide = (0 until 4).map { k =>
      (10 + k, f"2024-01-${1 + 7 * k}%02d 00:00:00", f"2024-01-${6 + 7 * k}%02d 00:00:00")
    }
    val windows = narrow ++ wide
    val valuesSql = windows
      .map { case (w, s, e) => s"  ($w, TIMESTAMP '$s', TIMESTAMP '$e')" }
      .mkString(",\n")
    QueryDef(
      "q23_range_join",
      s"""WITH win(wid, ws, we) AS (VALUES
         |$valuesSql),
         |e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, value FROM events)
         |SELECT wid, CAST(COUNT(*) AS BIGINT) AS n_events,
         |  ROUND(SUM(value), 2) AS sum_v
         |FROM win JOIN e ON e.ts >= ws AND e.ts < we
         |GROUP BY wid ORDER BY wid""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val win = windows.toDF("wid", "ws_s", "we_s")
        .select(col("wid"), to_timestamp(col("ws_s")).as("ws"),
          to_timestamp(col("we_s")).as("we"))
      // day buckets covered by [ws, we): ends are at midnight, so the
      // last covered day is we - 1 day
      val winByDay = win.select(col("wid"), col("ws"), col("we"),
        explode(sequence(to_date(col("ws")), date_add(to_date(col("we")), -1)))
          .as("day"))
      Tables(spark, dir).events
        .select(to_date(col("ts")).as("day"), col("ts"), col("value"))
        .join(broadcast(winByDay), "day")
        .filter(col("ts") >= col("ws") && col("ts") < col("we"))
        .groupBy(col("wid"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_v"))
        .orderBy(col("wid"))
    }
  }

  /** q24: CUBE — the full grouping-sets lattice (q13 covers the ROLLUP
    * hierarchy; CUBE adds the cross-dimensional subtotals a reporting
    * layer asks for). One pass, one shuffle: Spark expands the lattice
    * map-side and partially aggregates every grouping set before the
    * exchange. Subtotal NULLs coalesce to 'ALL' and the grouping_id
    * bitmask (MSB = first dimension on both engines) disambiguates
    * subtotal rows from real data. */
  val q24 = QueryDef(
    "q24_cube",
    """SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
      |  CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid,
      |  CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(l_quantity), 2) AS sum_qty
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY rf, ls""".stripMargin) { (spark, dir) =>
    Tables(spark, dir).lineitem
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast("int").as("gid"),
        count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("gid"), col("n"), col("sum_qty"))
      .orderBy(col("rf"), col("ls"))
  }

  /** q25: time-RANGE window frame — the rolling 7-day average per key,
    * q06's ROWS-frame sibling: the frame is bounded by event TIME, not
    * row position, so sparse and bursty keys get the same semantics.
    * One shuffle (partition key), in-partition sort, frame arithmetic
    * in integer MICROS on both engines (DuckDB's EPOCH is a fractional-
    * second double and Spark's long cast truncates — either mixed
    * choice shifts frame membership at the boundary). */
  val q25 = QueryDef(
    "q25_moving_window",
    """SELECT event_id, user_id,
      |  ROUND(AVG(value) OVER w + 1e-9, 4) AS avg_7d,
      |  CAST(COUNT(*) OVER w AS BIGINT) AS n_7d
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY EPOCH_US(CAST(ts AS TIMESTAMP))
      |  RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(unix_micros(col("ts")))
      .rangeBetween(-604800000000L, Window.currentRow)
    Tables(spark, dir).events
      .select(col("event_id"), col("user_id"),
        graft.QueryDef.roundBiased(avg(col("value")).over(w), 4).as("avg_7d"),
        count(lit(1)).over(w).as("n_7d"))
      .orderBy(col("event_id"))
  }

  /** q26: incremental aggregate maintenance — the materialized-view
    * pattern behind every "update the rollup without rescanning
    * history" pipeline (the reference's climatology accumulates years
    * the same way its watermark ingest accumulates slices,
    * `ingest/utils.py:96`): the pre-cutoff BASE state (sum, count) per
    * group and the post-cutoff DELTA state are aggregated
    * independently, then MERGED by re-aggregating the two state tables
    * — associative partial-agg states, the same algebra Spark's own
    * map-side combine uses, lifted to cross-run persistence.
    *
    * 100 TB shape: the base state is a stored table maintained per
    * ingest cycle; each increment scans only the new slice (partition-
    * pruned by the watermark) and the merge shuffles |state| + |delta|
    * GROUPS, never history rows. The spec asserts merged == full
    * recompute.
    *
    * Parity note: the merged average divides the ROUNDED total (exact
    * on both engines — fixed-decimal inputs) rather than the raw
    * float sum, so the division's operand bits are identical across
    * engines before the biased round. */
  val q26 = QueryDef(
    "q26_incremental_agg",
    """WITH base AS (
      |  SELECT l_returnflag, CAST(EXTRACT(month FROM l_shipdate) AS INTEGER) AS cal_month,
      |    SUM(l_quantity) AS s, COUNT(*) AS n
      |  FROM lineitem WHERE l_shipdate < TIMESTAMP '2000-01-01 00:00:00'
      |  GROUP BY 1, 2),
      |delta AS (
      |  SELECT l_returnflag, CAST(EXTRACT(month FROM l_shipdate) AS INTEGER) AS cal_month,
      |    SUM(l_quantity) AS s, COUNT(*) AS n
      |  FROM lineitem WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
      |  GROUP BY 1, 2)
      |SELECT l_returnflag, cal_month,
      |  ROUND(SUM(s), 2) AS total_qty, CAST(SUM(n) AS BIGINT) AS n_rows,
      |  ROUND(ROUND(SUM(s), 2) / SUM(n) + 1e-9, 4) AS avg_qty
      |FROM (SELECT * FROM base UNION ALL SELECT * FROM delta) u
      |GROUP BY l_returnflag, cal_month
      |ORDER BY l_returnflag, cal_month""".stripMargin) { (spark, dir) =>
    val li = Tables(spark, dir).lineitem
    val cutoff = lit("2000-01-01").cast("timestamp")
    // associative (sum, count) state per group — what a stored
    // materialized-view state table holds between runs
    def state(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      df.groupBy(col("l_returnflag"), month(col("l_shipdate")).as("cal_month"))
        .agg(sum(col("l_quantity")).as("s"), count(lit(1)).as("n"))
    val base = state(li.filter(col("l_shipdate") < cutoff))
    val delta = state(li.filter(col("l_shipdate") >= cutoff))
    base.unionByName(delta)
      .groupBy(col("l_returnflag"), col("cal_month"))
      .agg(round(sum(col("s")), 2).as("total_qty"), sum(col("n")).as("n_rows"))
      .select(col("l_returnflag"), col("cal_month"), col("total_qty"), col("n_rows"),
        graft.QueryDef.roundBiased(col("total_qty") / col("n_rows"), 4).as("avg_qty"))
      .orderBy(col("l_returnflag"), col("cal_month"))
  }

  /** q27: explicit GROUPING SETS — the mixed-granularity lattice the
    * ROLLUP hierarchy (q13) and full CUBE (q24) cannot express: one
    * pass produces (returnflag × linestatus) detail, per-returnflag
    * subtotals, AND an unrelated per-shipmode rollup — the reference's
    * "publish the same field at several aggregation levels" pattern
    * without rescanning per level. Same one-shuffle execution as
    * CUBE: rows expand to their grouping sets map-side, partial aggs
    * combine, grouping_id() disambiguates. */
  val q27 = QueryDef(
    "q27_grouping_sets",
    """WITH t AS (SELECT l_returnflag, l_linestatus,
      |  CAST(EXTRACT(month FROM l_shipdate) AS INTEGER) AS ship_month, l_quantity
      |  FROM lineitem)
      |SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
      |  COALESCE(ship_month, -1) AS sm,
      |  CAST(GROUPING(l_returnflag, l_linestatus, ship_month) AS INTEGER) AS gid,
      |  CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(l_quantity), 2) AS sum_qty
      |FROM t
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (ship_month))
      |ORDER BY gid, rf, ls, sm""".stripMargin) { (spark, dir) =>
    Tables(spark, dir).lineitem
      .select(col("l_returnflag"), col("l_linestatus"),
        month(col("l_shipdate")).as("ship_month"), col("l_quantity"))
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_returnflag")),
          Seq(col("ship_month"))),
        col("l_returnflag"), col("l_linestatus"), col("ship_month"))
      .agg(grouping_id().cast("int").as("gid"),
        count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        coalesce(col("ship_month"), lit(-1)).as("sm"),
        col("gid"), col("n"), col("sum_qty"))
      .orderBy(col("gid"), col("rf"), col("ls"), col("sm"))
  }

  /** q28: ROLLING DISTINCT cardinality — trailing-7-day active users,
    * the classic engagement metric whose naive form
    * (`COUNT(DISTINCT) OVER (RANGE 7 days)`) re-scans and re-dedups
    * every window at every row — quadratic in window span and not
    * even expressible in Spark's window functions. Scalable rewrite:
    * dedup to (user, day) once, EXPLODE each pair map-side to the ≤7
    * trailing windows it counts toward (q23's bucket pattern on the
    * time axis), dedup (window, user) — a user active twice inside
    * one window counts once — and tally per window. Two bounded
    * shuffles, each ≤ 7× the user-day count, no window frame at all;
    * the dense day grid (zero-active days included) explodes from the
    * span like i29. Oracle = the naive per-day distinct join. */
  val q28 = QueryDef(
    "q28_rolling_distinct",
    """WITH e AS (SELECT DISTINCT CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE)
      |    AS day, user_id FROM events),
      |span AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM e),
      |days AS (SELECT CAST(UNNEST(GENERATE_SERIES(lo, hi, INTERVAL 1 DAY)) AS DATE)
      |    AS day FROM span)
      |SELECT CAST(d.day AS TIMESTAMP) AS day,
      |  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active_7d
      |FROM days d LEFT JOIN e
      |  ON e.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
      |GROUP BY d.day ORDER BY d.day""".stripMargin) { (spark, dir) =>
    val e = Tables(spark, dir).events
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      .persist() // feeds the span probe AND the window explode
    val span = e.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    val counts = e
      .withColumn("wday", explode(expr("sequence(day, date_add(day, 6), interval 1 day)")))
      .crossJoin(broadcast(span))
      .filter(col("wday") <= col("hi"))
      .select(col("wday").as("day"), col("user_id")).distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("n_active_7d"))
    val allDays = span
      .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
    allDays.join(counts, Seq("day"), "left")
      .select(col("day").cast("timestamp").as("day"),
        coalesce(col("n_active_7d"), lit(0L)).as("n_active_7d"))
      .orderBy(col("day"))
  }

  /** q29: FUNNEL analysis — ordered multi-stage conversion
    * (view → click → purchase within 7 days of the first view), the
    * product-analytics query every event warehouse serves. Each stage's
    * timestamp must fall STRICTLY AFTER the previous stage's — a plain
    * per-type MIN can't express that, and the naive formulation
    * (self-join events×events×events) is cubic in the hot user's
    * event count.
    *
    * Scalable shape: stage k is the event scan FILTERED to stage k's
    * type, equi-joined to the stage-(k-1) table — which is USER-sized,
    * not event-sized — then min-aggregated on the user key. Every
    * shuffle is on user_id, so one partitioning serves all stages
    * (no event×event join anywhere); the cohort rollup at the end is
    * day-cardinality. At 100 TB the per-type filters push to the scan
    * and each stage table is bounded by the (much smaller) user count. */
  val q29 = QueryDef(
    "q29_funnel",
    """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |s1 AS (SELECT user_id, MIN(ts) AS t1 FROM e
      |  WHERE event_type = 'view' GROUP BY user_id),
      |s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM e JOIN s1 USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts > s1.t1
      |    AND e.ts <= s1.t1 + INTERVAL 7 DAY
      |  GROUP BY e.user_id),
      |s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM e
      |  JOIN s1 USING (user_id) JOIN s2 USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      |    AND e.ts <= s1.t1 + INTERVAL 7 DAY
      |  GROUP BY e.user_id)
      |SELECT CAST(CAST(DATE_TRUNC('day', s1.t1) AS DATE) AS TIMESTAMP) AS cohort_day,
      |  CAST(COUNT(*) AS BIGINT) AS n_stage1,
      |  CAST(COUNT(s2.t2) AS BIGINT) AS n_stage2,
      |  CAST(COUNT(s3.t3) AS BIGINT) AS n_stage3,
      |  ROUND(CAST(COUNT(s3.t3) AS DOUBLE) / COUNT(*) + 1e-9, 4) AS conv_rate
      |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val e = Tables(spark, dir).events
      .select(col("user_id"), col("event_type"), col("ts"))
    val s1 = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      .persist() // user-sized; feeds stages 2/3 AND the cohort rollup
    val horizon = col("t1") + expr("INTERVAL 7 DAYS")
    val s2 = e.filter(col("event_type") === "click")
      .join(s1, "user_id")
      .filter(col("ts") > col("t1") && col("ts") <= horizon)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = e.filter(col("event_type") === "purchase")
      .join(s1, "user_id").join(s2, "user_id")
      .filter(col("ts") > col("t2") && col("ts") <= horizon)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
      .groupBy(to_date(date_trunc("day", col("t1"))).cast("timestamp").as("cohort_day"))
      .agg(count(lit(1)).as("n_stage1"),
        count(col("t2")).as("n_stage2"),
        count(col("t3")).as("n_stage3"),
        graft.QueryDef.roundBiased(
          count(col("t3")).cast("double") / count(lit(1)), 4).as("conv_rate"))
      .orderBy(col("cohort_day"))
  }

  /** q30: cohort RETENTION matrix — q29's funnel sibling and the other
    * canonical product-analytics table: users cohorted by their first
    * active week, and each (cohort, week-offset) cell counts how many
    * of that cohort were active that many weeks later. The naive
    * formulation re-scans events per offset; this computes the whole
    * matrix in one pass.
    *
    * Weeks are INTEGER indexes (epoch-days div 7) — no engine-specific
    * week-truncation semantics anywhere. Shape: (user, week) dedup
    * (one shuffle), per-user cohort min on the SAME user key (the
    * exchange reuses), user-keyed join of the user-sized cohort table,
    * and a (cohort, offset)-bounded final agg. At 100 TB nothing
    * beyond the first dedup touches event-cardinality data. */
  val q30 = QueryDef(
    "q30_retention_cohorts",
    """WITH e AS (SELECT user_id,
      |    CAST((CAST(CAST(ts AS TIMESTAMP) AS DATE) - DATE '1970-01-01') // 7
      |      AS BIGINT) AS wk FROM events),
      |a AS (SELECT DISTINCT user_id, wk FROM e),
      |c AS (SELECT user_id, MIN(wk) AS cw FROM a GROUP BY user_id),
      |n AS (SELECT cw, CAST(COUNT(*) AS BIGINT) AS n_cohort FROM c GROUP BY cw)
      |SELECT c.cw AS cohort_week, CAST(a.wk - c.cw AS INTEGER) AS week_offset,
      |  CAST(COUNT(*) AS BIGINT) AS n_active, MAX(n.n_cohort) AS n_cohort,
      |  ROUND(COUNT(*) * 1.0 / MAX(n.n_cohort) + 1e-9, 4) AS retention
      |FROM a JOIN c USING (user_id) JOIN n ON n.cw = c.cw
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    val a = Tables(spark, dir).events
      .select(col("user_id"),
        expr("datediff(to_date(ts), date'1970-01-01') div 7").cast("long").as("wk"))
      .distinct()
      .persist() // feeds the cohort min AND the activity join
    val c = a.groupBy(col("user_id")).agg(min(col("wk")).as("cw"))
    val n = c.groupBy(col("cw")).agg(count(lit(1)).as("n_cohort"))
    a.join(c, "user_id").join(broadcast(n), "cw")
      .groupBy(col("cw").as("cohort_week"),
        (col("wk") - col("cw")).cast("int").as("week_offset"))
      .agg(count(lit(1)).as("n_active"), max(col("n_cohort")).as("n_cohort"),
        graft.QueryDef.roundBiased(
          count(lit(1)).cast("double") / max(col("n_cohort")), 4).as("retention"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** q31: LAST-TOUCH conversion attribution — the third canonical
    * product-analytics query next to q29 (funnel) and q30 (retention):
    * every purchase is credited to the user's most recent preceding
    * touch (view or click) within a 3-day lookback, and revenue rolls
    * up by the credited channel. Expressed as ONE user-keyed ordered
    * window — `last(..., ignoreNulls)` carries the running latest
    * touch (type + timestamp) to each row, so a million-event user
    * costs linear window work and there is never an event×event join.
    * Purchases outside every lookback credit the 'organic' bucket
    * (deterministic, not dropped). */
  val q31 = QueryDef(
    "q31_attribution",
    """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
      |    event_id, value FROM events),
      |t AS (SELECT *,
      |    LAST_VALUE(CASE WHEN event_type IN ('view', 'click') THEN event_type END
      |      IGNORE NULLS) OVER w AS touch_type,
      |    LAST_VALUE(CASE WHEN event_type IN ('view', 'click') THEN ts END
      |      IGNORE NULLS) OVER w AS touch_ts
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |a AS (SELECT CASE WHEN touch_ts IS NOT NULL
      |      AND ts - touch_ts <= INTERVAL 3 DAY THEN touch_type
      |      ELSE 'organic' END AS channel, value
      |  FROM t WHERE event_type = 'purchase')
      |SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_conversions,
      |  ROUND(SUM(value), 2) AS revenue
      |FROM a GROUP BY channel ORDER BY channel""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val isTouch = col("event_type").isin("view", "click")
    Tables(spark, dir).events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
        col("value"))
      .withColumn("touch_type",
        last(when(isTouch, col("event_type")), ignoreNulls = true).over(w))
      .withColumn("touch_ts",
        last(when(isTouch, col("ts")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(
        when(col("touch_ts").isNotNull &&
            col("ts") <= col("touch_ts") + expr("INTERVAL 3 DAYS"),
          col("touch_type")).otherwise("organic").as("channel"),
        col("value"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        round(sum(col("value")), 2).as("revenue"))
      .orderBy(col("channel"))
  }

  /** q32: EXACT-k stratified sampling — k rows from every (lang,
    * source) stratum of the corpus, selection deterministic under a
    * content-blind hash order (md5 of the id, q21's coin but ranked
    * instead of thresholded: q21 delivers a RATE per stratum, q32 an
    * exact COUNT — the eval-set / human-review shape where "5 docs per
    * language×source cell" is the contract, regardless of cell size).
    *
    * Plan: one shuffle keyed by the stratum, then a rank window.
    * Stratum count is bounded (langs × sources), and the window sorts
    * only within a stratum; if a single stratum is monster-sized the
    * bounded-state rung is q19's TypedImperativeAggregate top-k keyed
    * by stratum — the selection (min-k by hash) is associative and
    * needs k rows of state, never the stratum. The rank formulation is
    * kept here for the exact-tie-free oracle parity. */
  val q32 = QueryDef(
    "q32_stratified_sample",
    """WITH r AS (
      |  SELECT lang, source, doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY lang, source
      |      ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk,
      |    COUNT(*) OVER (PARTITION BY lang, source) AS stratum_n
      |  FROM documents)
      |SELECT lang, source, CAST(rnk AS INTEGER) AS rnk, doc_id,
      |  CAST(stratum_n AS BIGINT) AS stratum_n
      |FROM r WHERE rnk <= 5
      |ORDER BY lang, source, rnk""".stripMargin) { (spark, dir) =>
    val stratum = Window.partitionBy(col("lang"), col("source"))
    val w = stratum.orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables(spark, dir).documents
      .select(col("lang"), col("source"), col("doc_id"),
        row_number().over(w).as("rnk"),
        count(lit(1)).over(stratum).as("stratum_n"))
      .filter(col("rnk") <= 5)
      .select(col("lang"), col("source"), col("rnk"), col("doc_id"),
        col("stratum_n"))
      .orderBy(col("lang"), col("source"), col("rnk"))
  }

  /** q33: event-type TRANSITION matrix — the per-user Markov chain
    * every journey/flow analysis starts from: consecutive event pairs
    * within a user's ordered stream, counted into (prev, next) cells
    * with the row-conditional probability. First events (no
    * predecessor) count under prev='(start)', so columns sum to the
    * full event mass and the chain is properly seeded.
    *
    * Plan shape: ONE user-keyed window (lag) — skew bounded by a
    * single user's history like q31/i43, covered by the hot-user skew
    * bench — then a partial-agg'd count over a tiny
    * (#types+1)×#types key space; the conditional share joins the
    * per-prev totals broadcast. */
  val q33 = QueryDef(
    "q33_markov_transitions",
    """WITH s AS (SELECT user_id, event_type,
      |    LAG(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS prev_type
      |  FROM events),
      |c AS (SELECT COALESCE(prev_type, '(start)') AS prev_type,
      |    event_type AS next_type, COUNT(*) AS n
      |  FROM s GROUP BY 1, 2)
      |SELECT prev_type, next_type, CAST(n AS BIGINT) AS n,
      |  ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY prev_type) + 1e-9, 4)
      |    AS p_next
      |FROM c ORDER BY prev_type, next_type""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val counts = Tables(spark, dir).events
      .select(col("user_id"), col("event_type"),
        lag(col("event_type"), 1).over(w).as("prev_type"))
      .groupBy(coalesce(col("prev_type"), lit("(start)")).as("prev_type"),
        col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("p_next", graft.QueryDef.roundBiased(
        col("n") * lit(1.0) / sum(col("n")).over(
          Window.partitionBy(col("prev_type"))), 4))
      .orderBy(col("prev_type"), col("next_type"))
  }

  /** q34: EQUI-DEPTH histogram construction — the optimizer-statistics
    * / drift-monitoring artifact (ANALYZE TABLE's column histogram):
    * l_extendedprice split into 16 buckets of ~equal row count, each
    * bucket reporting [lo, hi] bounds, row count, and distinct-value
    * count. NOT the NTILE formulation — a global per-row NTILE sorts
    * the whole table through one partition; instead the p07 rung:
    * values land on the integer-cents grid, a map-side-combined
    * histogram reduces the table to its ≤~10⁶ distinct grid values,
    * and the cumulative-count bucket assignment
    * `bucket(v) = floor(cum_before(v)·B / N)` runs as a window over
    * that GRID-BOUNDED table (one small single-partition window over
    * distinct values, never over rows; ties — one value's whole count
    * — stay in one bucket by construction, which is what makes the
    * histogram mergeable across partitions and days). */
  val q34 = QueryDef(
    "q34_equidepth_histogram",
    """WITH h AS (
      |  SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1),
      |cum AS (SELECT v, c, SUM(c) OVER (ORDER BY v) AS cum,
      |    SUM(c) OVER () AS total FROM h),
      |b AS (SELECT v, c,
      |    CAST(((cum - c) * 16) // total AS INTEGER) AS bucket FROM cum)
      |SELECT bucket, MIN(v) AS lo_cents, MAX(v) AS hi_cents,
      |  CAST(SUM(c) AS BIGINT) AS n_rows, CAST(COUNT(*) AS BIGINT) AS n_values
      |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin) { (spark, dir) =>
    val h = Tables(spark, dir).lineitem
      .select(round(col("l_extendedprice") * 100).cast("long").as("v"))
      .groupBy(col("v"))
      .agg(count(lit(1)).as("c"))
    val cum = h.select(col("v"), col("c"),
      sum(col("c")).over(Window.orderBy(col("v"))).as("cum"),
      sum(col("c")).over(Window.partitionBy()).as("total"))
    cum
      .withColumn("bucket", expr("CAST(((cum - c) * 16) div total AS INT)"))
      .groupBy(col("bucket"))
      .agg(min(col("v")).as("lo_cents"), max(col("v")).as("hi_cents"),
        sum(col("c")).as("n_rows"), count(lit(1)).as("n_values"))
      .orderBy(col("bucket"))
  }

  /** q35: time-DECAY engagement score — the recency-weighted lifetime
    * value every feature store materializes (fraud/churn/ranking
    * features): per user, Σ value·0.5^(Δdays/7) with a 7-day
    * half-life, Δdays measured back from the corpus max day (the
    * feature snapshot date). An event this week counts ~full, one a
    * month ago ~1/16 — and unlike q25's bounded window the decay sum
    * never truncates history, yet needs NO window at all.
    *
    * Determinism: value biased-rounded to cents first, each decay term
    * to the 6-decimal grid, terms summed as DECIMAL(18,6) (exact,
    * order-free — t24's discipline; POWER parity is the t08 ln
    * convention), final biased 2-dec round.
    *
    * Plan: the snapshot day is ONE tiny agg broadcast to every
    * partition; decay terms are map-side arithmetic; a single
    * user-keyed partial agg is the only data shuffle. */
  val q35 = QueryDef(
    "q35_decay_score",
    """WITH mx AS (SELECT MAX(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS d0
      |  FROM events),
      |t AS (SELECT user_id,
      |    CAST(mx.d0 - CAST(CAST(ts AS TIMESTAMP) AS DATE) AS INTEGER) AS dd,
      |    ROUND(value + 1e-9, 2) AS v
      |  FROM events, mx)
      |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  ROUND(CAST(SUM(CAST(ROUND(v * POWER(0.5, dd / 7.0) + 1e-9, 6)
      |    AS DECIMAL(18,6))) AS DOUBLE) + 1e-9, 2) AS decay_score
      |FROM t GROUP BY user_id ORDER BY user_id""".stripMargin) { (spark, dir) =>
    val events = Tables(spark, dir).events
    val mx = events.agg(max(to_date(col("ts"))).as("d0"))
    val t = events.join(broadcast(mx))
      .select(col("user_id"),
        datediff(col("d0"), to_date(col("ts"))).cast("int").as("dd"),
        graft.QueryDef.roundBiased(col("value"), 2).as("v"))
    t.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(round(col("v") * pow(lit(0.5), col("dd") / 7.0) + 1e-9, 6)
            .cast("decimal(18,6)")).cast("double") + 1e-9, 2).as("decay_score"))
      .orderBy(col("user_id"))
  }

  /** q36: PAGERANK over the customer↔supplier TRADE graph — the
    * entity-importance / fraud-ring centrality analysis run on
    * transaction networks: nodes are customers (even ids) and
    * suppliers (odd ids) that traded, edges the distinct
    * (customer, supplier) order lines made BIDIRECTIONAL (trade is a
    * relationship, and symmetry leaves no dangling mass).
    *
    * Power iteration at damping 0.85 on GraphX-style SCALED ranks
    * (mean 1.0, r0 = 1.0, r' = 0.15 + 0.85·Σ r/deg): scale-free — a
    * fixed decimal grid stays meaningful at any node count, where raw
    * 1/nn probabilities would sink below the grid on a billion-node
    * graph. Iteration is DELTA-GATED under Components' round-cap
    * discipline: rounds run in blocks of `graft.q36.blockRounds`
    * (default 4) up to `graft.q36.roundCap` (default 48), stopping
    * when the block's L1 rank movement — measured in EXACT integer
    * micro-units on the 6-dec grid, so the adopted round count is a
    * deterministic function of the data — averages (floor-divided)
    * below `graft.q36.tolMicrosPerNode` micros per node PER ROUND
    * (default 1000, i.e. movement under 0.1% of the mean rank;
    * per-round normalization keeps the gate block-size-independent).
    *
    * Number discipline: the loop is ALL-INTEGER — ranks live as
    * BIGINT micros (r0 = 1 000 000), contributions round half-up to
    * the 8-dec grid via integer division ((200·r + deg) div (2·deg)),
    * sums are exact BIGINTs, and the damped update re-rounds to
    * micros the same way. The 3-round original biased-rounded DOUBLES
    * per round; at ~500k roundings per run (nodes × rounds) a
    * sub-1e-9 boundary collision between Spark's decimal-string
    * HALF_UP and DuckDB's binary ROUND becomes likely — and one
    * 1-micro flip was observed at sf0.01. Integer div has no such
    * boundary. Only the OUTPUT converts to double (micros/1e6 — one
    * IEEE divide, bit-identical cross-engine). The ORACLE is
    * generated, unrolled to exactly the ADOPTED round count: the gate
    * is deterministic, so the count the Spark loop adopts on a
    * dataset is the count the oracle replays (Verify runs the query
    * before dumping oracle_sql.json, which is what makes the dynamic
    * SQL safe).
    *
    * Plan: edge list built once from the orders⋈lineitem join,
    * degree-joined, hash-partitioned by src once, and cached; each
    * round shuffles ONLY the node-sized rank table into that
    * partitioning (shuffle_hash — no per-round edge shuffle or sort,
    * no broadcast build) plus a dst-keyed partial agg. Fact tables
    * are never rescanned; loop shuffles are sized to the edge count,
    * not the session default. Blocks compose `blockRounds` lazy
    * rounds per action, then localCheckpoint truncates lineage (the
    * measured r4 fix for iterative loops) and one node-sized join
    * prices the delta. Ranks warm-start at the degree-proportional
    * stationary approximation, roughly halving rounds-to-tolerance
    * vs a uniform start. */
  // Adopted round count PER DATASET DIR (the convergence gate is
  // deterministic per dataset, so the count the Spark loop adopts on a
  // dir is the count that dir's oracle replays). A keyed map, not a
  // mutable global: two Verifies over different sf dirs in one JVM
  // cannot cross-contaminate each other's oracle SQL, and a consumer
  // snapshotting oracles before execution gets the 48-round cap
  // default for dirs not yet run (r9 verdict — the same fix that
  // retired the q10b/q20 last-written-path globals).
  private[graft] val q36AdoptedRounds =
    new java.util.concurrent.ConcurrentHashMap[String, Int]()
  private[graft] def q36RoundsFor(dir: String): Int =
    q36AdoptedRounds.getOrDefault(dir, 48)

  // Every CTE is MATERIALIZED: DuckDB inlines plain CTEs, and a
  // 40+-round chain inlined into one join tree stalls its optimizer
  // for minutes; materialization makes evaluation linear in rounds
  // (0.7 s for 44 rounds at sf0.001).
  private def q36OracleSql(k: Int): String = {
    val rounds = (1 to k).map { i =>
      s"""r$i AS MATERIALIZED (SELECT e.dst AS node,
         |    150000 + (85 * CAST(SUM((200 * r${i - 1}.pr + d.deg) // (2 * d.deg))
         |      AS BIGINT) + 5000) // 10000 AS pr
         |  FROM e JOIN r${i - 1} ON e.src = r${i - 1}.node JOIN d ON d.src = e.src
         |  GROUP BY e.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS MATERIALIZED (
       |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |e AS MATERIALIZED (SELECT c AS src, s AS dst FROM e0
       |      UNION ALL SELECT s, c FROM e0),
       |d AS MATERIALIZED (
       |  SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src),
       |n AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS nn,
       |  CAST(SUM(deg) AS BIGINT) AS tot FROM d),
       |r0 AS MATERIALIZED (SELECT src AS node,
       |  CAST((CAST(1000000 AS HUGEINT) * deg * nn + tot // 2) // tot AS BIGINT)
       |    AS pr
       |  FROM d, n),
       |$rounds
       |SELECT r$k.node, CAST(r$k.pr AS DOUBLE) / 1000000 AS pr, d.deg
       |FROM r$k JOIN d ON d.src = r$k.node
       |ORDER BY node""".stripMargin
  }

  def q36: QueryDef = QueryDef.dynamic(
    "q36_pagerank")(d =>
    q36OracleSql(q36RoundsFor(d))) { (spark, dir) =>
    val cap = math.max(1, spark.conf.get("graft.q36.roundCap", "48").toInt)
    val blockRounds = math.max(1, spark.conf.get("graft.q36.blockRounds", "4").toInt)
    val tolPerNode = spark.conf.get("graft.q36.tolMicrosPerNode", "1000").toLong
    val t = Tables(spark, dir)
    // Loop-shuffle sizing (the r3 lesson: size iterative-loop shuffles
    // to the data, not the session default), estimated from the
    // metadata-only lineitem row count (parquet footers — no scan).
    // Floored at a quarter of the core count: the data-derived width
    // alone left the whole loop on 2 tasks at sf0.1 (32 cores idle —
    // measured 5.3 s vs 4.4 s at width 8); the floor tracks the
    // session's actual parallelism, so it scales DOWN with the core
    // count too, never a local[32] constant.
    val nPart = math.max(1, math.min(
      spark.conf.get("graft.q36.loopPartitions",
        math.max(spark.sparkContext.defaultParallelism / 4,
          t.lineitem.count() / 500000 + 1).toString).toInt,
      spark.sparkContext.defaultParallelism * 4))
    val e0 = t.orders
      .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct()
    val e = e0.select(col("c").as("src"), col("s").as("dst"))
      .union(e0.select(col("s").as("src"), col("c").as("dst")))
    // The edge list is hash-partitioned by src ONCE and cached; every
    // round's join then shuffles only the node-sized rank table into
    // that partitioning (shuffle_hash hint — no per-round sort of the
    // edge list, no per-round broadcast build, and never a re-shuffle
    // of the edges; measured 36 s → 19 s for the full sf0.1 run).
    val eP = e.repartition(nPart, col("src")).persist()
    // d inherits eP's partitioning (groupBy on the partition key), so
    // the ed join needs no exchange on either side
    val d = eP.groupBy(col("src")).agg(count(lit(1)).as("deg")).persist()
    // one tiny action materializes eP and d and prices nn + Σdeg
    val nt = d.agg(count(lit(1)).as("nn"), sum(col("deg")).as("tot")).first()
    val nn = nt.getLong(0)
    // empty graph: no nodes to rank (and the block loop's delta action
    // would NPE on a null SUM) — yield the empty frame directly
    if (nn == 0L)
      d.select(col("src").as("node"), lit(0.0).as("pr"), col("deg"))
    else {
    val tot = nt.getLong(1)
    // edges carry their source degree so a round is a single join;
    // eP is released after the first block action materializes ed —
    // at cluster scale the raw edge cache would otherwise double the
    // loop's memory footprint for zero reads
    val ed = eP.join(d.hint("shuffle_hash"), "src").persist()
    // ranks as BIGINT micros; half-up integer division (all positive).
    // Warm start at the degree-proportional stationary approximation
    // (exact: the undamped random walk's stationary point) instead of
    // uniform — roughly halves the rounds to the tolerance. HUGEINT/
    // DECIMAL(38,0) keeps 1e6·deg·nn exact on both engines.
    var pr = d.select(col("src").as("node"),
      expr(s"CAST((CAST(1000000 AS DECIMAL(38,0)) * deg * CAST($nn AS BIGINT)" +
        s" + CAST(${tot / 2} AS BIGINT)) div CAST($tot AS BIGINT) AS BIGINT)")
        .as("pr"))
      .localCheckpoint(true)
    var roundsDone = 0
    var converged = false
    // Loop-width pin: a round consumes ranks partitioned hash(node,
    // nPart) (ed's layout) and produces them from an agg exchange of
    // width spark.sql.shuffle.partitions — with the session default the
    // two widths differ, so every round pays TWO node-table exchanges
    // (the agg's, then a re-shuffle into ed's layout for the next
    // join). Pinning the loop's shuffle width to nPart — and holding
    // AQE partition coalescing off so the width sticks — makes the agg
    // exchange itself land in ed's layout: the join side of every
    // round is exchange-free, ONE node-table exchange per round
    // (measured 6.3 s → 4.6 s warm at sf0.1, 20 rounds). Scale-
    // adaptive, not a local[32] constant: nPart derives from the input
    // row count. Confs are restored before the returned frame is ever
    // planned (try/finally; fn's caller plans it after return).
    val oldSp = spark.conf.get("spark.sql.shuffle.partitions")
    val oldCo = spark.conf.get(
      "spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", nPart.toString)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
    while (!converged && roundsDone < cap) {
      val prev = pr
      var cur = pr
      val n = math.min(blockRounds, cap - roundsDone)
      for (_ <- 1 to n) {
        cur = ed.join(cur.hint("shuffle_hash"), col("src") === col("node"))
          .groupBy(col("dst"))
          .agg(sum(expr("(200 * pr + deg) div (2 * deg)")).as("s8"))
          .select(col("dst").as("node"),
            (lit(150000L) + expr("(85 * s8 + 5000) div 10000")).as("pr"))
      }
      // The block-start ranks are FOLDED into the block's one
      // materializing action (the r7 verdict's trim): the p1 join runs
      // inside the same job as the rounds, so the post-checkpoint delta
      // probe below is a join-free scan of node-sized cached blocks
      // instead of a separate shuffle-join job per block.
      // the delta rides the SAME job as the checkpoint (observe: a
      // CollectMetrics side-channel on the rows the checkpoint is
      // materializing anyway) — the separate per-block delta-probe job
      // this replaces was pure scheduling overhead
      val obs = new org.apache.spark.sql.Observation()
      cur = cur
        .join(prev.select(col("node"), col("pr").as("p1")).hint("shuffle_hash"),
          "node")
        .observe(obs, sum(abs(col("pr") - col("p1"))).as("d"))
        .localCheckpoint(true)
      roundsDone += n
      // first block's action is also what materializes ed: release the
      // raw edge cache, nothing reads it again
      if (roundsDone == n) eP.unpersist()
      val delta = obs.get("d") match {
        case l: java.lang.Long => l.longValue()
        case other => throw new IllegalStateException(
          s"q36 delta metric missing or non-long: $other")
      }
      prev.unpersist()
      pr = cur.select(col("node"), col("pr"))
      // per-node per-round average movement (floor division keeps it
      // overflow-safe for any tol and block-size-independent)
      if (delta / (math.max(1L, nn) * n) < tolPerNode) converged = true
    }
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", oldSp)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", oldCo)
    }
    q36AdoptedRounds.put(dir, roundsDone)
    pr.join(d, col("node") === col("src"))
      .select(col("node"), (col("pr").cast("double") / 1000000).as("pr"),
        col("deg"))
      .orderBy(col("node"))
    }
  }

  /** q37: AUDIENCE overlap — the segment-overlap matrix (ad-tech /
    * product analytics: "how many users who X also Y"): for every
    * event-type pair, the distinct-user overlap and its Jaccard in
    * integer ppm (floor division — exact cross-engine). The naive
    * events×events self-join is quadratic in a hot user's events; this
    * runs on the DISTINCT (user, type) table — one dedup shuffle, a
    * co-partitioned self-join emitting ≤ k²/2 pairs per user (k =
    * #types, a constant), and a type²-bounded final agg with the
    * per-type audience sizes broadcast. */
  val q37 = QueryDef(
    "q37_audience_overlap",
    """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
      |na AS (SELECT event_type, COUNT(*) AS n FROM ut GROUP BY 1),
      |pairs AS (SELECT a.event_type AS ta, b.event_type AS tb,
      |    COUNT(*) AS n_both
      |  FROM ut a JOIN ut b ON a.user_id = b.user_id
      |    AND a.event_type < b.event_type
      |  GROUP BY 1, 2)
      |SELECT ta, tb, CAST(n_both AS BIGINT) AS n_both,
      |  CAST(x.n AS BIGINT) AS n_a, CAST(y.n AS BIGINT) AS n_b,
      |  CAST(n_both * 1000000 // (x.n + y.n - n_both) AS BIGINT)
      |    AS jaccard_ppm
      |FROM pairs JOIN na x ON x.event_type = ta
      |JOIN na y ON y.event_type = tb
      |ORDER BY ta, tb""".stripMargin) { (spark, dir) =>
    val ut = Tables(spark, dir).events
      .select(col("user_id"), col("event_type")).distinct()
    val na = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val pairs = ut.toDF("user_id", "ta")
      .join(ut.toDF("user_id", "tb"), "user_id")
      .filter(col("ta") < col("tb"))
      .groupBy(col("ta"), col("tb"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(na.toDF("ta", "n_a")), "ta")
      .join(broadcast(na.toDF("tb", "n_b")), "tb")
      .select(col("ta"), col("tb"), col("n_both"), col("n_a"), col("n_b"),
        expr("CAST((n_both * 1000000) div (n_a + n_b - n_both) AS BIGINT)")
          .as("jaccard_ppm"))
      .orderBy(col("ta"), col("tb"))
  }

  /** q38: SCD2 point-in-time reconstruction — the warehouse "as-was"
    * query (slowly-changing-dimension type 2): each user's event log
    * becomes validity intervals [ts, next ts) via ONE lead window, and
    * the state in effect at the snapshot instant (2024-01-15) is the
    * interval containing it — per user, the version count, the value
    * then in force, and its version ordinal (NULL when the user's
    * history starts after the snapshot). Same-timestamp rewrites
    * produce EMPTY intervals that containment excludes by
    * construction, so the reconstruction is unique.
    *
    * One user-keyed window (row_number + lead share the sort), the
    * containment filter map-side, and a user-sized left join back to
    * the version counts. */
  val q38 = QueryDef(
    "q38_scd2_pointintime",
    """WITH c AS (SELECT user_id, ts, ROUND(value + 1e-9, 2) AS v,
      |    ROW_NUMBER() OVER w AS k, LEAD(CAST(ts AS TIMESTAMP)) OVER w
      |      AS valid_to
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id
      |               ORDER BY CAST(ts AS TIMESTAMP), event_id)),
      |n AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_versions
      |  FROM c GROUP BY 1),
      |a AS (SELECT user_id, v AS value_at, CAST(k AS INTEGER) AS version_at
      |  FROM c
      |  WHERE CAST(ts AS TIMESTAMP) <= TIMESTAMP '2024-01-15 00:00:00'
      |    AND (valid_to IS NULL
      |         OR valid_to > TIMESTAMP '2024-01-15 00:00:00'))
      |SELECT n.user_id, n.n_versions, a.value_at, a.version_at
      |FROM n LEFT JOIN a USING (user_id)
      |ORDER BY user_id""".stripMargin) { (spark, dir) =>
    val at = lit("2024-01-15 00:00:00").cast("timestamp")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val c = Tables(spark, dir).events
      .select(col("user_id"), col("ts"), col("event_id"),
        graft.QueryDef.roundBiased(col("value"), 2).as("v"))
      .withColumn("k", row_number().over(w))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
    val n = c.groupBy(col("user_id")).agg(count(lit(1)).as("n_versions"))
    val a = c.filter(col("ts") <= at &&
        (col("valid_to").isNull || col("valid_to") > at))
      .select(col("user_id"), col("v").as("value_at"),
        col("k").cast("int").as("version_at"))
    n.join(a, Seq("user_id"), "left")
      .select(col("user_id"), col("n_versions"), col("value_at"),
        col("version_at"))
      .orderBy(col("user_id"))
  }

  /** q39: period-over-period GROWTH — the month-over-month /
    * year-to-date report every BI layer materializes: monthly revenue
    * per return flag with the MoM delta, MoM percent change (4-dec
    * grid; NULL on a first month and on a zero base), and the YTD
    * running total. Revenue lands on integer CENTS at the monthly agg
    * (i46's discipline) so deltas and cumsums are exact integers and
    * only the percent touches doubles — one mirrored IEEE division,
    * biased-rounded.
    *
    * One (flag, month) partial agg, then lag + cumsum share a single
    * flag-keyed window sort (partition = a flag's month count,
    * calendar-bounded). */
  val q39 = QueryDef(
    "q39_period_growth",
    """WITH m AS (
      |  SELECT l_returnflag AS rf,
      |    CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS yr,
      |    CAST(EXTRACT(month FROM l_shipdate) AS INTEGER) AS mon,
      |    CAST(ROUND(SUM(l_extendedprice) * 100) AS BIGINT) AS rev_cents
      |  FROM lineitem GROUP BY 1, 2, 3),
      |g AS (SELECT rf, yr, mon, rev_cents,
      |    LAG(rev_cents) OVER w AS prev_cents,
      |    SUM(rev_cents) OVER (PARTITION BY rf, yr ORDER BY mon) AS ytd_cents
      |  FROM m WINDOW w AS (PARTITION BY rf ORDER BY yr, mon))
      |SELECT rf, yr, mon, rev_cents,
      |  CAST(rev_cents - prev_cents AS BIGINT) AS mom_delta_cents,
      |  CASE WHEN prev_cents IS NOT NULL AND prev_cents <> 0 THEN
      |    ROUND((rev_cents - prev_cents) * 1.0 / prev_cents + 1e-9, 4) + 0.0
      |  END AS mom_pct,
      |  CAST(ytd_cents AS BIGINT) AS ytd_cents
      |FROM g ORDER BY rf, yr, mon""".stripMargin) { (spark, dir) =>
    val m = Tables(spark, dir).lineitem
      .groupBy(col("l_returnflag").as("rf"),
        year(col("l_shipdate")).as("yr"), month(col("l_shipdate")).as("mon"))
      .agg(round(sum(col("l_extendedprice")) * 100).cast("long").as("rev_cents"))
    val w = Window.partitionBy(col("rf")).orderBy(col("yr"), col("mon"))
    val wy = Window.partitionBy(col("rf"), col("yr")).orderBy(col("mon"))
    m.withColumn("prev_cents", lag(col("rev_cents"), 1).over(w))
      .withColumn("ytd_cents", sum(col("rev_cents")).over(wy))
      .select(col("rf"), col("yr"), col("mon"), col("rev_cents"),
        (col("rev_cents") - col("prev_cents")).as("mom_delta_cents"),
        when(col("prev_cents").isNotNull && col("prev_cents") =!= 0L,
          graft.QueryDef.roundBiased(
            (col("rev_cents") - col("prev_cents")) * lit(1.0) /
              col("prev_cents"), 4)).as("mom_pct"),
        col("ytd_cents"))
      .orderBy(col("rf"), col("yr"), col("mon"))
  }

  /** q40: PSI feature DRIFT — the Population Stability Index, the
    * model-monitoring standard (scorecards, feature stores: PSI < 0.1
    * stable, > 0.25 retrain): the EXPECTED snapshot (even order keys)
    * defines 10 equi-depth bins via q34's grid-bounded construction,
    * the ACTUAL snapshot (odd keys) assigns each grid value to the
    * largest bin whose lower edge is ≤ v (out-of-range clamps to the
    * edge bins), and each bin contributes (p−q)·ln(p/q) under
    * Laplace smoothing (+1/bin — a bin the actual side never hits
    * still contributes finitely, both engines identically). Terms ride
    * the 8-dec DECIMAL grid (t24), ln parity the t08 convention;
    * t15 is the categorical twin (token TV), this the NUMERIC one.
    *
    * Plan: two value-grid histograms with map-side combine; bin
    * construction + assignment on the grid-bounded tables (edges are
    * 10 rows, broadcast); the bin space is constant-sized. */
  val q40 = QueryDef(
    "q40_psi_drift",
    """WITH ha AS (SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM lineitem WHERE l_orderkey % 2 = 0 GROUP BY 1),
      |hb AS (SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM lineitem WHERE l_orderkey % 2 = 1 GROUP BY 1),
      |cum AS (SELECT v, c, SUM(c) OVER (ORDER BY v) AS cum,
      |    SUM(c) OVER () AS total FROM ha),
      |bk AS (SELECT v, c,
      |    CAST(((cum - c) * 10) // total AS INTEGER) AS bucket FROM cum),
      |edges AS (SELECT bucket, MIN(v) AS lo FROM bk GROUP BY bucket),
      |abuck AS (SELECT bucket, CAST(SUM(c) AS BIGINT) AS n_a
      |  FROM bk GROUP BY bucket),
      |bassign AS (SELECT h.v, h.c,
      |    COALESCE((SELECT MAX(e.bucket) FROM edges e WHERE e.lo <= h.v), 0)
      |      AS bucket
      |  FROM hb h),
      |bbuck AS (SELECT bucket, CAST(SUM(c) AS BIGINT) AS n_b
      |  FROM bassign GROUP BY bucket),
      |tot AS (SELECT (SELECT SUM(c) FROM ha) AS na,
      |    (SELECT SUM(c) FROM hb) AS nb)
      |SELECT a.bucket, a.n_a, COALESCE(b.n_b, 0) AS n_b,
      |  ROUND(((a.n_a + 1.0) / (tot.na + 10.0)
      |      - (COALESCE(b.n_b, 0) + 1.0) / (tot.nb + 10.0)) *
      |    LN(((a.n_a + 1.0) / (tot.na + 10.0))
      |      / ((COALESCE(b.n_b, 0) + 1.0) / (tot.nb + 10.0))) + 1e-9, 8)
      |    AS psi_term
      |FROM abuck a LEFT JOIN bbuck b ON a.bucket = b.bucket, tot
      |ORDER BY a.bucket""".stripMargin) { (spark, dir) =>
    val li = Tables(spark, dir).lineitem
      .select(col("l_orderkey"),
        round(col("l_extendedprice") * 100).cast("long").as("v"))
    val ha = li.filter(col("l_orderkey") % 2 === 0)
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
    // persisted: both histograms are VALUE GRIDS (bounded by the cents
    // domain, not the corpus) and each feeds two consumers — without
    // the cache every consumer job re-scanned and re-aggregated the
    // fact table (4 recomputes measured in the old plan)
    val hb = li.filter(col("l_orderkey") % 2 === 1)
      .groupBy(col("v")).agg(count(lit(1)).as("c")).persist()
    val bk = ha.select(col("v"), col("c"),
        sum(col("c")).over(Window.orderBy(col("v"))).as("cum"),
        sum(col("c")).over(Window.partitionBy()).as("total"))
      .withColumn("bucket", expr("CAST(((cum - c) * 10) div total AS INT)"))
      .persist()
    // the 10 bin edges are driver-held model state (the s04 codebook
    // precedent): re-inlined as a bucket-descending when-chain, the
    // actual-side assignment is a PROJECTION — the old broadcast
    // non-equi join multiplied the whole value grid ×10 through a
    // nested-loop probe and re-deduped it with an extra aggregation
    val edgeRows = bk.groupBy(col("bucket")).agg(min(col("v")).as("lo"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(-_._1)
    val abuck = bk.groupBy(col("bucket")).agg(sum(col("c")).as("n_a"))
    // first match in bucket-descending order == MAX bucket with lo ≤ v;
    // no edge ≤ v clamps to bucket 0, exactly the old COALESCE(max, 0)
    val bucketOf = edgeRows.foldLeft(when(lit(false), 0)) {
      case (w, (b, lo)) => w.when(col("v") >= lit(lo), lit(b))
    }.otherwise(lit(0))
    val bbuck = hb.withColumn("bucket", bucketOf)
      .groupBy(col("bucket")).agg(sum(col("c")).as("n_b"))
    val na = bk.agg(sum(col("c"))).collect()(0).getLong(0).toDouble
    val nb = hb.agg(sum(col("c"))).collect()(0).getLong(0).toDouble
    val p = (col("n_a") + 1.0) / (lit(na) + 10.0)
    val q = (coalesce(col("n_b"), lit(0L)) + 1.0) / (lit(nb) + 10.0)
    abuck.join(bbuck, Seq("bucket"), "left")
      .select(col("bucket"), col("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        graft.QueryDef.roundBiased((p - q) * log(p / q), 8).as("psi_term"))
      .orderBy(col("bucket"))
  }

  /** q41: DECILE LIFT / gains table — the standard evaluation frame
    * for any propensity or quality score (direct-marketing lift
    * charts; the same table data curation teams read for "does the
    * quality score actually rank converting users/documents first"):
    * users ranked by engagement score into NTILE(10) deciles, then
    * per-decile conversion rate and CUMULATIVE lift over the base
    * rate. Reads beside q29/q30/q31 as the scoring-evaluation member
    * of the product-analytics family.
    *
    * 100 TB shape: the raw event scan partial-aggs to ONE row per
    * user; the global NTILE then runs on the score-ranked USER frame
    * — orders of magnitude smaller than the event log but still a
    * single-partition window stage, the documented trade (q34's
    * histogram-CDF bucket assignment is the in-repo alternative once
    * the scored population itself is corpus-sized; NTILE's exact
    * split-ties-by-rank semantics is what the lift table convention
    * specifies, so q41 keeps it at user-dimension scale). Decile
    * aggregates, cumulative sums, and the base rate all run on the
    * 10-row table.
    *
    * Determinism: scores land on the integer-cents grid (i45's
    * convention) and the NTILE order is fully tie-broken
    * (score DESC, user_id); counts are exact integers and the two
    * ratios round under the biased grid (both non-negative — no −0.0
    * exposure). */
  val q41 = QueryDef(
    "q41_decile_lift",
    """WITH u AS (SELECT user_id,
      |    CAST(COALESCE(ROUND(ROUND(SUM(value) FILTER (WHERE event_type = 'view'),
      |      2) * 100), 0) AS BIGINT) AS score_c,
      |    CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS converted
      |  FROM events GROUP BY 1),
      |d AS (SELECT *, CAST(NTILE(10) OVER (ORDER BY score_c DESC, user_id)
      |    AS INTEGER) AS decile FROM u),
      |a AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_users,
      |    CAST(SUM(converted) AS BIGINT) AS n_conv FROM d GROUP BY 1),
      |t AS (SELECT CAST(SUM(n_users) AS BIGINT) AS tu,
      |    CAST(SUM(n_conv) AS BIGINT) AS tc FROM a),
      |c AS (SELECT decile, n_users, n_conv,
      |    CAST(SUM(n_users) OVER (ORDER BY decile) AS BIGINT) AS cum_users,
      |    CAST(SUM(n_conv) OVER (ORDER BY decile) AS BIGINT) AS cum_conv
      |  FROM a)
      |SELECT decile, n_users, n_conv,
      |  ROUND(n_conv * 1.0 / n_users + 1e-9, 4) AS conv_rate,
      |  ROUND((cum_conv * 1.0 / cum_users) / (tc * 1.0 / tu) + 1e-9, 4)
      |    AS cum_lift
      |FROM c, t ORDER BY decile""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val u = Tables(spark, dir).events
      .groupBy(col("user_id"))
      .agg(coalesce(round(round(sum(when(col("event_type") === "view",
          col("value"))), 2) * 100), lit(0)).cast("long").as("score_c"),
        max(when(col("event_type") === "purchase", 1).otherwise(0))
          .cast("long").as("converted"))
    val d = u.withColumn("decile",
      ntile(10).over(Window.orderBy(col("score_c").desc, col("user_id")))
        .cast("int"))
    val a = d.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_users"), sum(col("converted")).as("n_conv"))
      .persist() // 10 rows — feeds the totals, the cum window, the output
    val t = a.agg(sum(col("n_users")).as("tu"), sum(col("n_conv")).as("tc"))
    val wCum = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    a.withColumn("cum_users", sum(col("n_users")).over(wCum))
      .withColumn("cum_conv", sum(col("n_conv")).over(wCum))
      .crossJoin(broadcast(t))
      .select(col("decile"), col("n_users"), col("n_conv"),
        graft.QueryDef.roundBiased(
          col("n_conv") * 1.0 / col("n_users"), 4).as("conv_rate"),
        graft.QueryDef.roundBiased(
          (col("cum_conv") * 1.0 / col("cum_users")) /
            (col("tc") * 1.0 / col("tu")), 4).as("cum_lift"))
      .orderBy(col("decile"))
  }

  /** q42: GINI CONCENTRATION — the inequality coefficient over
    * per-user spend within each event type (the concentration metric
    * behind "is this segment carried by whales": q22 profiles key
    * skew for the EXECUTION plan, q42 measures the BUSINESS
    * concentration; in a data pipeline the same statistic flags a
    * source whose token mass concentrates in few documents): the
    * rank-sum identity G = (2·Σ i·xᵢ)/(n·Σx) − (n+1)/n over spend
    * sorted ascending, per event type.
    *
    * 100 TB shape: the event scan partial-aggs to one row per
    * (type, user) — user-dimension-sized (q41's argument); ONE
    * type-keyed window exchange serves the rank and both totals, and
    * the final agg groups on its key superset. Determinism: spend on
    * the integer-cents grid; rank ties (equal spend) cannot move
    * Σ i·xᵢ — permuting ranks within an equal-value run permutes i
    * over identical xᵢ; the Gini is ONE fixed-shape double from
    * exact integers, −0.0-normalized. */
  val q42 = QueryDef(
    "q42_gini_concentration",
    """WITH u AS (SELECT event_type, user_id,
      |    CAST(ROUND(ROUND(SUM(value), 2) * 100) AS BIGINT) AS spend
      |  FROM events GROUP BY 1, 2),
      |r AS (SELECT *,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type
      |      ORDER BY spend, user_id) AS BIGINT) AS rk,
      |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
      |    CAST(SUM(spend) OVER (PARTITION BY event_type) AS BIGINT) AS tot
      |  FROM u)
      |SELECT event_type, n AS n_users, tot AS total_cents,
      |  ROUND(2.0 * CAST(SUM(rk * spend) AS BIGINT) / (n * tot)
      |    - (n + 1.0) / n + 1e-9, 4) + 0.0 AS gini
      |FROM r WHERE tot > 0 GROUP BY event_type, n, tot
      |ORDER BY event_type""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(col("event_type"))
      .orderBy(col("spend"), col("user_id"))
    val wAll = Window.partitionBy(col("event_type"))
    Tables(spark, dir).events
      .groupBy(col("event_type"), col("user_id"))
      .agg(round(round(sum(col("value")), 2) * 100).cast("long").as("spend"))
      .withColumn("rk", row_number().over(wOrd).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("tot", sum(col("spend")).over(wAll))
      .filter(col("tot") > 0)
      .groupBy(col("event_type"), col("n"), col("tot"))
      .agg(sum(col("rk") * col("spend")).as("s"))
      .select(col("event_type"), col("n").as("n_users"),
        col("tot").as("total_cents"),
        graft.QueryDef.roundBiased(
          lit(2.0) * col("s") / (col("n") * col("tot")) -
            (col("n") + 1.0) / col("n"), 4).as("gini"))
      .orderBy(col("event_type"))
  }

  // def, not val: q36's oracle SQL is generated from the adopted round
  // count, so the defs must be rebuilt when SparkEntry.oracleSql is read
  // (after the queries ran — Verify's ordering).
  def all: Seq[QueryDef] =
    Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q10b, q11, q12, q13,
      q14, q16, q17, q18, q19, q20, q21, q22, q23, q24, q25, q26, q27, q28,
      q29, q30, q31, q32, q33, q34, q35, q36, q37, q38, q39, q40, q41, q42)
}
