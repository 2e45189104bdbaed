package graft

import org.apache.spark.sql.functions._

/** Scratch profiler (dev tool): i23 phase decomposition — scan vs
  * ray-cast filter vs presentation sort. Usage: runMain graft.ProfileI23
  * [sfDir] [reps]. */
object ProfileI23 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = GraftConf.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val lon = col("value") * 2 % 360.0 - 180.0
    val lat = (col("value") * 1.7 + col("user_id")) % 120.0 - 60.0
    (1 to reps).foreach { rep =>
      println(s"--- rep $rep ---")
      val ev = Tables(spark, sfDir).events
      time("0 scan count")(ev.count())
      val sel = ev.select(col("event_id"), col("value"), col("user_id"))
      val filtered = Tables.spread(sel, "event_id")
        .filter(graft.operators.Ingest.pointInPolygon(lon, lat,
          graft.operators.Ingest.AfricaPolygon))
      if (rep == 1) filtered.explain("formatted")
      time("1 filter count")(filtered.count())
      time("1b filter count NOSPREAD")(sel.filter(
        graft.operators.Ingest.pointInPolygon(lon, lat,
          graft.operators.Ingest.AfricaPolygon)).count())
      time("1c spread-only noop")(Tables.spread(sel, "event_id")
        .write.format("noop").mode("overwrite").save())
      val out = filtered.select(col("event_id"),
        round(lon, 4).as("lon"), round(lat, 4).as("lat"))
      time("2 +round noop")(
        out.write.format("noop").mode("overwrite").save())
      time("3 +orderBy count")(out.orderBy(col("event_id")).count())
    }
    spark.stop()
  }
}
