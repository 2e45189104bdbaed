package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col

/** JDBC date-keyed UPSERT sink — the reference's vector-product
  * publish contract made executable (`ingest/raster_vector.py:146`
  * `insert_update_data`: same-date DELETE + bulk INSERT inside one
  * database transaction, so a reprocessed date REPLACES its rows and a
  * reader never observes a half-replaced date; `:164` retention
  * deletes `date < latest`). Re-expressed for Spark's execution model:
  *
  *   - the DataFrame shuffles ONCE keyed by the date column and sorts
  *     within partitions, so each date's rows arrive contiguously at
  *     exactly one executor task — per-date transactions never span
  *     tasks and tasks never contend on the same date's rows;
  *   - each task streams its dates: DELETE-where-date, batched
  *     parameterized INSERTs, COMMIT per date — memory is one insert
  *     batch, never a date's full row set;
  *   - a task retry replays delete+insert per date, which is exactly
  *     the idempotent contract (spec-proven by a double run);
  *   - retention is one driver-side DELETE statement — O(1) calls,
  *     the database does the work.
  *
  * The Derby driver on the Spark classpath backs the specs; any
  * JDBC-reachable store (the reference's Postgres included) works via
  * `url`. Identifiers (`table`, column names) are trusted
  * developer-supplied names interpolated into DDL-position SQL; row
  * VALUES always travel as bound parameters. */
object JdbcUpsert {

  /** Upsert `df` into `table`, one transaction per distinct value of
    * `dateCol` (delete-then-insert). Rows with a NULL date key fail
    * loudly — they can never be replaced idempotently. */
  def upsertByDate(df: DataFrame, url: String, table: String,
      dateCol: String, batchSize: Int = 1000): Unit = {
    val cols = df.schema.fieldNames.toSeq
    require(cols.contains(dateCol), s"dateCol $dateCol not in $cols")
    require(batchSize >= 1, s"bad batchSize $batchSize")
    val insertSql = s"INSERT INTO $table (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})"
    val deleteSql = s"DELETE FROM $table WHERE $dateCol = ?"
    val dIdx = cols.indexOf(dateCol)
    val nCols = cols.length
    df.repartition(col(dateCol)).sortWithinPartitions(col(dateCol))
      .foreachPartition { (rows: Iterator[Row]) =>
        if (rows.hasNext) {
          val conn = java.sql.DriverManager.getConnection(url)
          try {
            conn.setAutoCommit(false)
            var current: AnyRef = null
            var started = false
            var stmt: java.sql.PreparedStatement = null
            var pending = 0
            def commitDate(): Unit = if (started) {
              if (pending > 0) { stmt.executeBatch(); pending = 0 }
              stmt.close()
              conn.commit()
              started = false
            }
            def beginDate(d: AnyRef): Unit = {
              val del = conn.prepareStatement(deleteSql)
              del.setObject(1, d)
              del.executeUpdate()
              del.close()
              stmt = conn.prepareStatement(insertSql)
              started = true
            }
            rows.foreach { r =>
              val d = r.get(dIdx).asInstanceOf[AnyRef]
              require(d != null,
                s"NULL $dateCol key: such rows cannot upsert idempotently")
              if (!started || d != current) {
                commitDate()
                current = d
                beginDate(d)
              }
              var i = 0
              while (i < nCols) {
                stmt.setObject(i + 1, r.get(i).asInstanceOf[AnyRef])
                i += 1
              }
              stmt.addBatch()
              pending += 1
              if (pending >= batchSize) { stmt.executeBatch(); pending = 0 }
            }
            commitDate()
          } catch {
            case t: Throwable =>
              // roll back the in-flight date; committed dates stand
              // (the retry replays delete+insert — same end state)
              try conn.rollback() catch { case _: java.sql.SQLException => () }
              throw t
          } finally conn.close()
        }
      }
  }

  /** The reference's retention leg (`raster_vector.py:164`): delete
    * every row with `dateCol` strictly before `cutoff` — one
    * driver-side statement, the database does the scan. Returns the
    * deleted row count. */
  def dropBefore(url: String, table: String, dateCol: String,
      cutoff: AnyRef): Int = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val stmt = conn.prepareStatement(
        s"DELETE FROM $table WHERE $dateCol < ?")
      try {
        stmt.setObject(1, cutoff)
        stmt.executeUpdate()
      } finally stmt.close()
    } finally conn.close()
  }
}
