package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Time-series operators beyond plain SQL (SURVEY.md §2 additions
  * j01–j02): as-of join and gap sessionization — the two operators the
  * reference's time-ordered ingestion world implies but Spark lacks as
  * built-ins.
  *
  * Both are implemented the scale-correct way: a single shuffle on the
  * entity key, then sorted-window logic within partitions — never a
  * range cross-join.
  */
object Temporal {

  /** As-of join (point-in-time lookup): for each left row, the latest
    * right row with rightTs <= leftTs and equal keys.
    *
    * Implementation: tag both sides, union, one window sorted by
    * (ts, side) per key, carry the last right value forward
    * (`last(_, ignoreNulls=true)`), keep left rows. Right rows sort
    * before left rows at equal ts → inclusive (>=) semantics, matching
    * SQL ASOF JOIN. One shuffle total, O(n log n) per partition.
    *
    * `tieBreak` (right-side column names) pins which right row is
    * carried when several share one timestamp: the window orders by
    * (ts, side, tieBreak…), so backward picks the LARGEST tiebreak at
    * the tied instant ("latest wins") and forward the SMALLEST
    * ("earliest wins") — deterministic across runs, partitionings and
    * engines (the oracle mirrors the same ORDER BY). Without it, two
    * equal-ts right rows with different values make the carried value
    * run-dependent — and DuckDB's native ASOF picks its own arbitrary
    * row, so a hash check against it can flake. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, leftTs: String,
      rightTs: String, carryCols: Seq[String],
      tieBreak: Seq[String] = Nil): DataFrame = {
    val lCols = left.columns
    val l = left
      .withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))
      .select(Seq(col(key), col("__ts"), col("__side")) ++
        lCols.filter(_ != key).map(col) ++
        tieBreak.map(c => lit(null).cast(right.schema(c).dataType).as(s"__tb_$c")) ++
        carryCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__carry_$c")): _*)
    val r = right
      .withColumn("__ts", col(rightTs)).withColumn("__side", lit(0))
      .select(Seq(col(key), col("__ts"), col("__side")) ++
        lCols.filter(_ != key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        tieBreak.map(c => col(c).as(s"__tb_$c")) ++
        carryCols.map(c => col(c).as(s"__carry_$c")): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(Seq(col("__ts"), col("__side")) ++
        tieBreak.map(c => col(s"__tb_$c")): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .select((Seq(col(key)) ++ lCols.filter(_ != key).map(col) ++ Seq(col("__side")) ++
        carryCols.map(c => last(col(s"__carry_$c"), ignoreNulls = true).over(w).as(c))): _*)
      .filter(col("__side") === 1)
      .drop("__side")
  }

  /** j01: each purchase event picks up the value of the user's latest
    * click at-or-before it. The oracle is the SAME union+window
    * construction in DuckDB (not native ASOF, whose equal-ts pick is
    * arbitrary): both engines order (ts, side, click event_id), so a
    * user with two clicks at one instant resolves identically —
    * latest-event_id wins — and the hash check can't flake. */
  val j01 = QueryDef(
    "j01_asof_join",
    """WITH e AS (SELECT event_id, user_id,
      |    EPOCH_US(CAST(ts AS TIMESTAMP)) AS tsu,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS side,
      |    CASE WHEN event_type = 'click' THEN value END AS cval
      |  FROM events WHERE event_type IN ('purchase', 'click')),
      |w AS (SELECT *, LAST_VALUE(cval IGNORE NULLS) OVER
      |    (PARTITION BY user_id ORDER BY tsu, side, event_id
      |     ROWS UNBOUNDED PRECEDING) AS last_click_value
      |  FROM e)
      |SELECT event_id, user_id, last_click_value
      |FROM w WHERE side = 1 ORDER BY event_id""".stripMargin) { (spark, dir) =>
    val ev = Tables(spark, dir).events
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"), col("event_id"))
    asofJoin(purchases, clicks, "user_id", "ts", "ts", Seq("value"),
        tieBreak = Seq("event_id"))
      .select(col("event_id"), col("user_id"), col("value").as("last_click_value"))
      .orderBy(col("event_id"))
  }

  /** Gap sessionization: new session when the gap to the previous event
    * of the same key exceeds `gapMicros`. Session ids are per-key
    * ordinals (1-based). One shuffle on the key. */
  def sessionize(df: DataFrame, key: Column, ts: Column, tieBreak: Column,
      gapMicros: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, tieBreak)
    val cum = Window.partitionBy(key).orderBy(ts, tieBreak)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__new_sess",
        when(unix_micros(ts) - unix_micros(lag(ts, 1).over(w)) > gapMicros, 1)
          .when(lag(ts, 1).over(w).isNull, 1)
          .otherwise(0))
      .withColumn("session_num", sum(col("__new_sess")).over(cum).cast("int"))
      .drop("__new_sess")
  }

  /** j02: 30-minute-gap sessions per user with per-session rollup. */
  val j02 = QueryDef(
    "j02_sessionize",
    """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
      |g AS (SELECT *, CASE WHEN LAG(ts) OVER w IS NULL THEN 1
      |                     WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE THEN 1
      |                     ELSE 0 END AS new_sess
      |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                     ROWS UNBOUNDED PRECEDING) AS INTEGER) AS session_num
      |      FROM g)
      |SELECT user_id, session_num, COUNT(*) AS n_events,
      |  MIN(ts) AS session_start, MAX(ts) AS session_end,
      |  ROUND(SUM(value), 2) AS session_value
      |FROM s GROUP BY user_id, session_num
      |ORDER BY user_id, session_num""".stripMargin) { (spark, dir) =>
    val sessions = sessionize(
      Tables(spark, dir).events.select(col("user_id"), col("event_id"), col("ts"), col("value")),
      col("user_id"), col("ts"), col("event_id"), 30L * 60 * 1000000)
    sessions
      .groupBy(col("user_id"), col("session_num"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        round(sum(col("value")), 2).as("session_value"))
      .orderBy(col("user_id"), col("session_num"))
  }

  /** j03: interval-overlap (time-weighted) aggregation — usage metering:
    * each event becomes a usage interval [ts, ts + value minutes] and
    * every report window accumulates the EXACT overlap duration in
    * integer microseconds (no floats anywhere — the sums hash bit-for-
    * bit on any engine).
    *
    * Join shape = q23's bucket quantization extended to interval×
    * interval: both sides explode to the day buckets they cover and
    * equi-join on the bucket (windows broadcast). A pair sharing
    * several days would match repeatedly, so the join keeps only the
    * bucket holding the overlap's START (`day = date(max(start)))` —
    * an overlapping pair shares that day by construction, making each
    * pair match EXACTLY once with no distinct pass. Validated against
    * the naive theta-join in the spec. */
  val j03: QueryDef = {
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
      "j03_overlap_weighted",
      s"""WITH win(wid, ws, we) AS (VALUES
         |$valuesSql),
         |w AS (SELECT wid, ws, we, EPOCH_US(ws) AS wsm, EPOCH_US(we) AS wem FROM win),
         |wd AS (SELECT wid, wsm, wem,
         |       CAST(UNNEST(GENERATE_SERIES(CAST(ws AS DATE),
         |         CAST(we - INTERVAL 1 MICROSECOND AS DATE), INTERVAL 1 DAY)) AS DATE) AS day
         |       FROM w),
         |e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
         |      EPOCH_US(CAST(ts AS TIMESTAMP)) AS sm,
         |      EPOCH_US(CAST(ts AS TIMESTAMP)) + CAST(FLOOR(value * 60000000) AS BIGINT) AS em
         |      FROM events),
         |ed AS (SELECT event_id, sm, em,
         |       CAST(UNNEST(GENERATE_SERIES(CAST(ts AS DATE),
         |         CAST(MAKE_TIMESTAMP(em) AS DATE), INTERVAL 1 DAY)) AS DATE) AS day FROM e),
         |j AS (SELECT wid, event_id, LEAST(em, wem) - GREATEST(sm, wsm) AS ov
         |      FROM ed JOIN wd ON ed.day = wd.day AND sm < wem AND em > wsm
         |       AND ed.day = CAST(MAKE_TIMESTAMP(GREATEST(sm, wsm)) AS DATE))
         |SELECT wid, CAST(COUNT(*) AS BIGINT) AS n_events,
         |  CAST(SUM(ov) AS BIGINT) AS total_overlap_us
         |FROM j GROUP BY wid ORDER BY wid""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val win = windows.toDF("wid", "ws_s", "we_s")
        .select(col("wid"), to_timestamp(col("ws_s")).as("ws"),
          to_timestamp(col("we_s")).as("we"))
        .select(col("wid"), col("ws"), col("we"),
          unix_micros(col("ws")).as("wsm"), unix_micros(col("we")).as("wem"))
      val winByDay = win.withColumn("wday",
        explode(sequence(to_date(col("ws")), date_add(to_date(col("we")), -1))))
        .select(col("wid"), col("wsm"), col("wem"), col("wday"))
      val ev = Tables(spark, dir).events
        // FLOOR, not a bare cast: Spark's double→long cast truncates but
        // DuckDB's CAST rounds — FLOOR agrees everywhere
        .select(col("event_id"), col("ts"), unix_micros(col("ts")).as("sm"),
          (unix_micros(col("ts")) + floor(col("value") * 60000000d)).as("em"))
        .withColumn("day",
          explode(sequence(to_date(col("ts")), to_date(timestamp_micros(col("em"))))))
      ev.join(broadcast(winByDay),
          col("day") === col("wday") && col("sm") < col("wem") &&
            col("em") > col("wsm") &&
            col("day") === to_date(timestamp_micros(greatest(col("sm"), col("wsm")))))
        .groupBy(col("wid"))
        .agg(count(lit(1)).as("n_events"),
          sum(least(col("em"), col("wem")) - greatest(col("sm"), col("wsm")))
            .as("total_overlap_us"))
        .orderBy(col("wid"))
    }
  }

  /** j04: NEAREST-event join — j01's two-sided sibling: each purchase
    * aligns to the closest click of the same user within ±10 minutes,
    * whichever direction is nearer (ties to the earlier click). This is
    * the observation-alignment shape the reference's multi-source
    * weather world implies (pair each forecast with the nearest
    * station reading), and ASOF JOIN alone can't express it.
    *
    * Implementation: the j01 union+window trick run BOTH ways in one
    * pass — a single shuffle on the user key, then `last(click before)`
    * and `first(click after)` over the same sorted partition; the
    * nearer side wins under the tolerance. Never a range cross-join.
    * The oracle derives the identical answer with the same window
    * construction in DuckDB (IGNORE NULLS frames), so tie-break and
    * tolerance semantics are hash-checked, not eyeballed. */
  val j04 = QueryDef(
    "j04_nearest_join",
    """WITH e AS (SELECT event_id, user_id, EPOCH_US(CAST(ts AS TIMESTAMP)) AS tsu,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS side,
      |    CASE WHEN event_type = 'click'
      |         THEN EPOCH_US(CAST(ts AS TIMESTAMP)) END AS cts,
      |    CASE WHEN event_type = 'click' THEN value END AS cval
      |  FROM events WHERE event_type IN ('purchase', 'click')),
      |w AS (SELECT *,
      |    LAST_VALUE(cts IGNORE NULLS) OVER win_prev AS pts,
      |    LAST_VALUE(cval IGNORE NULLS) OVER win_prev AS pval,
      |    FIRST_VALUE(cts IGNORE NULLS) OVER win_next AS nts,
      |    FIRST_VALUE(cval IGNORE NULLS) OVER win_next AS nval
      |  FROM e
      |  WINDOW win_prev AS (PARTITION BY user_id ORDER BY tsu, side, event_id
      |      ROWS UNBOUNDED PRECEDING),
      |    win_next AS (PARTITION BY user_id ORDER BY tsu, side, event_id
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
      |s AS (SELECT event_id, user_id, tsu - pts AS dp, nts - tsu AS dn, pval, nval,
      |    pts IS NOT NULL AND tsu - pts <= 600000000 AS pok,
      |    nts IS NOT NULL AND nts - tsu <= 600000000 AS nok
      |  FROM w WHERE side = 1)
      |SELECT event_id, user_id,
      |  CASE WHEN pok AND (NOT nok OR dp <= dn) THEN pval
      |       WHEN nok THEN nval END AS nearest_click_value,
      |  CAST(CASE WHEN pok AND (NOT nok OR dp <= dn) THEN dp
      |       WHEN nok THEN dn END AS BIGINT) AS delta_us
      |FROM s ORDER BY event_id""".stripMargin) { (spark, dir) =>
    val tol = 600000000L // ±10 minutes, integer micros
    val ev = Tables(spark, dir).events
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("tsu"),
        when(col("event_type") === "purchase", 1).otherwise(0).as("side"),
        when(col("event_type") === "click", unix_micros(col("ts"))).as("cts"),
        when(col("event_type") === "click", col("value")).as("cval"))
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("tsu"), col("side"), col("event_id"))
    val wPrev = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val s = ev
      .withColumn("pts", last(col("cts"), ignoreNulls = true).over(wPrev))
      .withColumn("pval", last(col("cval"), ignoreNulls = true).over(wPrev))
      .withColumn("nts", first(col("cts"), ignoreNulls = true).over(wNext))
      .withColumn("nval", first(col("cval"), ignoreNulls = true).over(wNext))
      .filter(col("side") === 1)
      .withColumn("dp", col("tsu") - col("pts"))
      .withColumn("dn", col("nts") - col("tsu"))
      // isNotNull first: false && null = false on both engines, so the
      // flags are never three-valued and the CASE below can't leak null
      .withColumn("pok", col("pts").isNotNull && col("dp") <= tol)
      .withColumn("nok", col("nts").isNotNull && col("dn") <= tol)
    val pickPrev = col("pok") && (!col("nok") || col("dp") <= col("dn"))
    s.select(col("event_id"), col("user_id"),
        when(pickPrev, col("pval")).when(col("nok"), col("nval"))
          .as("nearest_click_value"),
        when(pickPrev, col("dp")).when(col("nok"), col("dn")).as("delta_us"))
      .orderBy(col("event_id"))
  }

  /** FORWARD as-of join: for each left row, the EARLIEST right row with
    * rightTs >= leftTs and equal keys — j01's mirror (pandas
    * merge_asof direction='forward'). Same single-shuffle union-window
    * shape; at equal ts the left row sorts first and the frame runs
    * CURRENT ROW → UNBOUNDED FOLLOWING, so an exactly-simultaneous
    * right row matches (inclusive >=). `tieBreak` pins equal-ts right
    * rows (earliest-tiebreak wins here — see asofJoin's note). */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, carryCols: Seq[String],
      tieBreak: Seq[String] = Nil): DataFrame = {
    val lCols = left.columns
    val l = left
      .withColumn("__ts", col(leftTs)).withColumn("__side", lit(0))
      .select(Seq(col(key), col("__ts"), col("__side")) ++
        lCols.filter(_ != key).map(col) ++
        tieBreak.map(c => lit(null).cast(right.schema(c).dataType).as(s"__tb_$c")) ++
        carryCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__carry_$c")): _*)
    val r = right
      .withColumn("__ts", col(rightTs)).withColumn("__side", lit(1))
      .select(Seq(col(key), col("__ts"), col("__side")) ++
        lCols.filter(_ != key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        tieBreak.map(c => col(c).as(s"__tb_$c")) ++
        carryCols.map(c => col(c).as(s"__carry_$c")): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(Seq(col("__ts"), col("__side")) ++
        tieBreak.map(c => col(s"__tb_$c")): _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    l.unionByName(r)
      .select((Seq(col(key)) ++ lCols.filter(_ != key).map(col) ++ Seq(col("__side")) ++
        carryCols.map(c => first(col(s"__carry_$c"), ignoreNulls = true).over(w).as(c))): _*)
      .filter(col("__side") === 0)
      .drop("__side")
  }

  /** j05: forward as-of with TOLERANCE — each purchase picks up the
    * FIRST click within 24 h after it (merge_asof direction='forward',
    * tolerance=1d: the "next follow-up within SLA" lookup — delivery
    * confirmation, next observation, support response). Matches
    * outside the tolerance null out; the wait is exact integer
    * MICROSECONDS (epoch_us difference — no boundary-crossing
    * date_diff semantics to disagree on). The oracle mirrors the
    * union-window construction (j01's determinism note: native ASOF's
    * equal-ts pick is arbitrary; here both engines order
    * (ts, side, click event_id) so earliest-event_id wins a tied
    * instant). One key shuffle, tolerance map-side. */
  val j05 = QueryDef(
    "j05_asof_tolerance",
    """WITH e AS (SELECT event_id, user_id,
      |    EPOCH_US(CAST(ts AS TIMESTAMP)) AS tsu,
      |    CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS side,
      |    CASE WHEN event_type = 'click'
      |         THEN EPOCH_US(CAST(ts AS TIMESTAMP)) END AS cts,
      |    CASE WHEN event_type = 'click' THEN value END AS cval
      |  FROM events WHERE event_type IN ('purchase', 'click')),
      |w AS (SELECT *,
      |    FIRST_VALUE(cts IGNORE NULLS) OVER win_next AS nts,
      |    FIRST_VALUE(cval IGNORE NULLS) OVER win_next AS nval
      |  FROM e
      |  WINDOW win_next AS (PARTITION BY user_id ORDER BY tsu, side, event_id
      |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT event_id, user_id,
      |  CASE WHEN nts - tsu <= 86400000000 THEN nval END AS next_click_value,
      |  CASE WHEN nts - tsu <= 86400000000 THEN CAST(nts - tsu AS BIGINT) END
      |    AS wait_us
      |FROM w WHERE side = 0 ORDER BY event_id""".stripMargin) { (spark, dir) =>
    val ev = Tables(spark, dir).events
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"),
        col("ts").as("click_ts"), col("event_id"))
    val j = asofJoinForward(purchases, clicks, "user_id", "ts", "ts",
      Seq("value", "click_ts"), tieBreak = Seq("event_id"))
    val wait0 = unix_micros(col("click_ts")) - unix_micros(col("ts"))
    j.select(col("event_id"), col("user_id"),
        when(wait0 <= 86400000000L, col("value")).as("next_click_value"),
        when(wait0 <= 86400000000L, wait0).as("wait_us"))
      .orderBy(col("event_id"))
  }

  /** j06: OHLC / TWAP bar downsampling — the canonical time-series
    * reduction (financial candlesticks, sensor-telemetry rollups): per
    * (user, day) bar, event count, OPEN/CLOSE (first/last observation
    * by (ts, event_id) — deterministic under equal timestamps, the j05
    * tiebreak discipline), HIGH/LOW, and the TIME-WEIGHTED average
    * price — each observation holds until the next one in the bar, the
    * last holds to the bar's end, so irregular sampling doesn't bias
    * the mean the way a plain AVG does (the reason TWAP exists).
    *
    * Determinism: timestamps are exact integer microseconds
    * (unix_micros ↔ EPOCH_US), values ride the integer-cents grid for
    * the weighted sum (q34's CAST(ROUND(v·100)) convention) —
    * Σ cents·µs is an exact BIGINT (≤ ~1e5 cents · 8.64e10 µs/day ·
    * events/bar; a production tick stream would bucket to ms before
    * this sum), the bar span telescopes to barEnd − first ts, and the
    * single double division rounds 4-dec biased. OPEN/HIGH/LOW/CLOSE
    * pass the STORED doubles through untouched (j01's stance — no
    * arithmetic, hash-exact by construction); first/last resolve via
    * (ts, event_id, value) struct extrema (i54's struct-min pattern).
    *
    * Plan: ONE (user, day)-keyed shuffle shared by the lead window and
    * the bar aggregation (same key, same sort); skew = one entity's
    * single-day event count. */
  val j06 = QueryDef(
    "j06_ohlc_twap",
    """WITH e AS (
      |  SELECT user_id,
      |    CAST(CAST(CAST(ts AS TIMESTAMP) AS DATE) - DATE '1970-01-01'
      |      AS INTEGER) AS day,
      |    EPOCH_US(CAST(ts AS TIMESTAMP)) AS tsu,
      |    event_id, value,
      |    CAST(ROUND(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |d AS (SELECT *, LEAD(tsu) OVER (PARTITION BY user_id, day
      |    ORDER BY tsu, event_id) AS nxt FROM e),
      |g AS (SELECT user_id, day, tsu, event_id, value, cents,
      |    COALESCE(nxt, (day + 1) * 86400000000) - tsu AS dur FROM d)
      |SELECT user_id, day, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  MIN(struct_pack(tsu := tsu, eid := event_id, v := value)).v AS open,
      |  MAX(value) AS high, MIN(value) AS low,
      |  MAX(struct_pack(tsu := tsu, eid := event_id, v := value)).v AS close,
      |  ROUND(CAST(SUM(cents * dur) AS DOUBLE)
      |    / (100.0 * ((day + 1) * 86400000000 - MIN(tsu))) + 1e-9, 4) AS twap
      |FROM g GROUP BY user_id, day
      |ORDER BY user_id, day""".stripMargin) { (spark, dir) =>
    val e = Tables(spark, dir).events
      .select(col("user_id"),
        expr("datediff(to_date(ts), date'1970-01-01')").cast("int").as("day"),
        unix_micros(col("ts")).as("tsu"),
        col("event_id"), col("value"),
        round(col("value") * 100).cast("long").as("cents"))
    val w = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("tsu"), col("event_id"))
    val barEnd = (col("day") + 1).cast("long") * 86400000000L
    val g = e
      .withColumn("nxt", lead(col("tsu"), 1).over(w))
      .withColumn("dur", coalesce(col("nxt"), barEnd) - col("tsu"))
    val obs = struct(col("tsu"), col("event_id"), col("value").as("v"))
    g.groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n_events"),
        min(obs).getField("v").as("open"),
        max(col("value")).as("high"), min(col("value")).as("low"),
        max(obs).getField("v").as("close"),
        sum(col("cents") * col("dur")).as("wsum"),
        min(col("tsu")).as("first_tsu"))
      .select(col("user_id"), col("day"), col("n_events"),
        col("open"), col("high"), col("low"), col("close"),
        graft.QueryDef.roundBiased(
          col("wsum").cast("double") /
            (lit(100.0) * ((col("day") + 1).cast("long") * 86400000000L -
              col("first_tsu"))), 4).as("twap"))
      .orderBy(col("user_id"), col("day"))
  }

  /** j07: LOCF GRID RESAMPLE — align an irregular event series to a
    * regular 6-hour grid by carrying the last observation forward
    * (the time-series alignment primitive that precedes any
    * multi-series join or model-feature window; j06 aggregates into
    * bars, j07 preserves point-in-time values at grid instants): per
    * user, grid points span midnight of the first event through the
    * last event; each point carries the latest click value at-or-
    * before it plus the STALENESS (whole seconds since that
    * observation — the data-quality column a forecast consumer gates
    * on). Grid points before the first observation keep NULL value
    * and staleness (LOCF is undefined there — emitted, not dropped,
    * so gaps are visible).
    *
    * Implementation = [[asofJoin]] verbatim (union + ONE user-keyed
    * window, never a range cross-join; equal-ts ties pinned by
    * event_id — j01's discipline, mirrored in the oracle's window).
    * The grid explode is calendar-bounded (4 rows/user-day). The
    * carried value is the STORED double untouched; staleness is an
    * exact integer micros difference floor-divided to seconds
    * (non-negative, so truncation ≡ floor on both engines). */
  val j07 = QueryDef(
    "j07_locf_resample",
    """WITH span AS (SELECT user_id,
      |    DATE_TRUNC('day', MIN(CAST(ts AS TIMESTAMP))) AS t0,
      |    MAX(CAST(ts AS TIMESTAMP)) AS t1
      |  FROM events GROUP BY 1),
      |grid AS (SELECT user_id,
      |    UNNEST(generate_series(t0, t1, INTERVAL 6 HOUR)) AS gts FROM span),
      |obs AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value, event_id
      |  FROM events WHERE event_type = 'click'),
      |u AS (
      |  SELECT user_id, EPOCH_US(gts) AS tsu, 1 AS side, gts,
      |    CAST(NULL AS DOUBLE) AS cval, CAST(NULL AS BIGINT) AS cts,
      |    CAST(NULL AS BIGINT) AS ceid
      |  FROM grid
      |  UNION ALL
      |  SELECT user_id, EPOCH_US(ts), 0, NULL, value, EPOCH_US(ts), event_id
      |  FROM obs),
      |w AS (SELECT *,
      |    LAST_VALUE(cval IGNORE NULLS) OVER wd AS v,
      |    LAST_VALUE(cts IGNORE NULLS) OVER wd AS ots
      |  FROM u WINDOW wd AS (PARTITION BY user_id ORDER BY tsu, side, ceid
      |    ROWS UNBOUNDED PRECEDING))
      |SELECT user_id, gts AS grid_ts, v AS value,
      |  CAST((tsu - ots) // 1000000 AS BIGINT) AS staleness_sec
      |FROM w WHERE side = 1 ORDER BY user_id, grid_ts""".stripMargin) {
    (spark, dir) =>
    val ev = Tables(spark, dir).events
    val span = ev.groupBy(col("user_id"))
      .agg(date_trunc("day", min(col("ts"))).as("t0"), max(col("ts")).as("t1"))
    val grid = span.select(col("user_id"),
      explode(sequence(col("t0"), col("t1"), expr("interval 6 hours")))
        .as("grid_ts"))
    val obs = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"), col("event_id"))
    asofJoin(grid, obs, "user_id", "grid_ts", "ts", Seq("value", "ts"),
        tieBreak = Seq("event_id"))
      .select(col("user_id"), col("grid_ts"), col("value"),
        ((unix_micros(col("grid_ts")) - unix_micros(col("ts"))))
          .as("__dmicros"))
      .select(col("user_id"), col("grid_ts"), col("value"),
        expr("CAST(__dmicros div 1000000 AS BIGINT)").as("staleness_sec"))
      .orderBy(col("user_id"), col("grid_ts"))
  }

  /** j08: INTERVAL UNION (coalesce overlapping usage intervals) — the
    * coverage primitive j03 weights and j02 sessionizes around:
    * each event spans [ts, ts + value minutes] (j03's interval
    * convention, FLOOR micros), per user the overlapping/touching
    * spans merge into islands (gaps-and-islands: a span whose start
    * exceeds the running max end opens a new island; equality
    * touches and merges — half-open semantics), and the rollup
    * carries the numbers a billing/uptime consumer wants: island
    * count, raw interval count, total covered time, longest island.
    * Unlike j02's fixed-gap sessions, islands merge by ACTUAL span
    * overlap — an event's duration, not a gap constant, decides.
    *
    * 100 TB shape: ONE user-keyed shuffle serves the running-max
    * window, the island cumsum, the island group (key superset —
    * exchange-free), and the user rollup. All-integer micros. */
  val j08 = QueryDef(
    "j08_interval_union",
    """WITH e AS (SELECT user_id, event_id,
      |    EPOCH_US(CAST(ts AS TIMESTAMP)) AS sm,
      |    EPOCH_US(CAST(ts AS TIMESTAMP))
      |      + CAST(FLOOR(value * 60000000) AS BIGINT) AS em
      |  FROM events),
      |o AS (SELECT *, MAX(em) OVER (PARTITION BY user_id
      |    ORDER BY sm, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
      |  FROM e),
      |i AS (SELECT *, CAST(SUM(CASE WHEN prev_max IS NULL OR sm > prev_max
      |      THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
      |    ORDER BY sm, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
      |  FROM o),
      |g AS (SELECT user_id, island, MIN(sm) AS s, MAX(em) AS e2,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM i GROUP BY 1, 2)
      |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_islands,
      |  CAST(SUM(n) AS BIGINT) AS n_intervals,
      |  CAST(SUM(e2 - s) AS BIGINT) AS covered_us,
      |  CAST(MAX(e2 - s) AS BIGINT) AS longest_us
      |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin) { (spark, dir) =>
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("sm"), col("event_id"))
    val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir).events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("sm"),
        (unix_micros(col("ts")) + floor(col("value") * 60000000d).cast("long"))
          .as("em"))
      .withColumn("prev_max", max(col("em")).over(wPrev))
      .withColumn("island",
        sum(when(col("prev_max").isNull || col("sm") > col("prev_max"), 1)
          .otherwise(0)).over(wCum))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("sm")).as("s"), max(col("em")).as("e2"),
        count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_islands"), sum(col("n")).as("n_intervals"),
        sum(col("e2") - col("s")).as("covered_us"),
        max(col("e2") - col("s")).as("longest_us"))
      .orderBy(col("user_id"))
  }

  val all: Seq[QueryDef] = Seq(j01, j02, j03, j04, j05, j06, j07, j08)
}
