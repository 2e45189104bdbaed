package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Calendar period keys from the reference's date logic
  * (`/root/reference/ingest/dateutils.py`): pentads (6 per month,
  * pentad 6 = day 26→end of month), dekads (3 per month), months,
  * meteorological seasons. All pure Column expressions — codegen'd,
  * no UDFs, usable as partition keys at 100 TB.
  */
object Calendar {

  /** 1-based pentad within the month: day 1–5→1, …, 21–25→5, 26+→6. */
  def pentadOfMonth(date: Column): Column = {
    val d = dayofmonth(date)
    when(d <= 5, 1).when(d <= 10, 2).when(d <= 15, 3)
      .when(d <= 20, 4).when(d <= 25, 5).otherwise(6)
  }

  /** First calendar day of the pentad containing `date`. */
  def pentadStartDay(date: Column): Column =
    (pentadOfMonth(date) - 1) * 5 + 1

  /** 1-based dekad within the month: 1–10→1, 11–20→2, 21+→3. */
  def dekadOfMonth(date: Column): Column = {
    val d = dayofmonth(date)
    when(d <= 10, 1).when(d <= 20, 2).otherwise(3)
  }

  /** Meteorological season label: DJF / MAM / JJA / SON. */
  def season(date: Column): Column = {
    val m = month(date)
    when(m === 12 || m <= 2, "DJF")
      .when(m <= 5, "MAM")
      .when(m <= 8, "JJA")
      .otherwise("SON")
  }
}
