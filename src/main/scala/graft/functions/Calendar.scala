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

  /** First day of the month after `date` — reference
    * `get_next_month_date` (`ingest/dateutils.py:5`). */
  def nextMonthStart(date: Column): Column =
    add_months(trunc(date, "month"), 1)

  /** Start date of the pentad AFTER the one containing `date` —
    * reference `get_next_pentad` (`ingest/dateutils.py:19`): day<=25 →
    * day (p*5+1) of this month; day>25 → 1st of next month. */
  def nextPentadStart(date: Column): Column = {
    val p = pentadOfMonth(date)
    when(p < 6, make_date(year(date), month(date), p * 5 + 1))
      .otherwise(nextMonthStart(date).cast("date"))
  }

  /** Number (1–6) of the pentad AFTER the one containing `date`. */
  def nextPentadNum(date: Column): Column = {
    val p = pentadOfMonth(date)
    when(p < 6, p + 1).otherwise(1)
  }

  /** Extract the first embedded ISO-8601 timestamp from a string (the
    * reference's filename-date convention `{ns}_{ISO}.tif`,
    * `ingest/utils.py:141` delete_past_data_files). Null if absent. */
  def isoDateIn(s: Column): Column = {
    val m = regexp_extract(s,
      "(\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}\\.\\d{3}Z)", 1)
    when(m === "", lit(null).cast("timestamp"))
      .otherwise(to_timestamp(m, "yyyy-MM-dd'T'HH:mm:ss.SSSX"))
  }
}
