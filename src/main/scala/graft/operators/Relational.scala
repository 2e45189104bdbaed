package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** A-family: relational query core (SURVEY.md §2.A).
  *
  * Spark-first: declarative DataFrame plans so Catalyst handles
  * pushdown, join strategy, and partial aggregation. Small dimension
  * tables are broadcast explicitly; large-large joins shuffle once on
  * the join key with AQE re-planning.
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
      |  ROUND(AVG(l_quantity), 2) AS avg_qty,
      |  ROUND(AVG(l_extendedprice), 2) AS avg_price,
      |  ROUND(AVG(l_discount), 2) AS avg_disc,
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
        round(avg(col("l_quantity")), 2).as("avg_qty"),
        round(avg(col("l_extendedprice")), 2).as("avg_price"),
        round(avg(col("l_discount")), 2).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val all: Seq[QueryDef] = Seq(q01)
}
