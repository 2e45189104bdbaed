package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine operator exposed through the driver contract: a Spark
  * definition plus (when SQL-expressible) a DuckDB oracle producing the
  * identical result on the same parquet tables.
  *
  * Determinism conventions (both sides):
  *   - full ORDER BY over a unique key set;
  *   - doubles wrapped in round(_, 2) so float summation order can't
  *     flip the hash;
  *   - integer sums cast to BIGINT in the oracle (DuckDB widens to
  *     HUGEINT, Spark to LongType).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    oracleFor: Option[String => String] = None) {
  /** Oracle SQL resolved for a concrete sf dir: fixture-backed queries
    * derive their `read_parquet` path deterministically from the dir
    * (r9 — replaces the mutable last-run-path globals, so snapshotting
    * oracles before execution or running two sf dirs in one JVM can no
    * longer cross-contaminate paths); static oracles ignore the dir. */
  def oracleAt(sfDir: String): Option[String] =
    oracleFor.map(_(sfDir)).orElse(oracle)
}

object QueryDef {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.round

  /** Epsilon-biased rounding for INEXACT quantities (averages,
    * divisions, sqrt): a value landing exactly on a .xx5 boundary
    * rounds differently under Spark (decimal-string HALF_UP) and
    * DuckDB (binary). Adding 1e-9 pushes boundary values decisively
    * above the half on BOTH sides, so the engines agree; the oracle SQL
    * must write the same `ROUND(x + 1e-9, n)`. Sums of fixed-decimal
    * inputs are exact and don't need the bias.
    *
    * Sign-of-zero: Spark's round goes through BigDecimal and can never
    * emit -0.0, but DuckDB's ROUND preserves the sign of a tiny negative
    * (round(-0.004, 2) = -0.0) — equal under ==, DIFFERENT under the
    * driver's value hash. Any oracle whose rounded expression can be
    * negative must append `+ 0.0` after the ROUND to normalize. */
  def roundBiased(c: Column, scale: Int): Column = round(c + 1e-9, scale)
  /** Oracled query: hash-checked against DuckDB. */
  def apply(name: String, sql: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(sql))

  /** Rows-only query: no SQL-expressible oracle (driver checks rows>0). */
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)

  /** Fixture-backed query: the oracle SQL is a pure function of the sf
    * dir (it embeds a [[Fixtures.pathFor]]-derived path). `oracle`
    * still resolves — against [[SparkEntry.DefaultSfDir]] — so generic
    * presence checks keep working. */
  def dynamic(name: String)(sqlFor: String => String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(sqlFor(SparkEntry.DefaultSfDir)), Some(sqlFor))
}
