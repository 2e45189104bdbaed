package graft

import graft.operators.Ingest
import org.apache.spark.sql.functions._

class GridSourceSpec extends SparkSpec {

  private def grid(times: Int = 3, h: Int = 16, w: Int = 16) =
    spark.read.format("graft.sources.GridSource")
      .option("times", times).option("height", h).option("width", w).load()

  test("grid source produces times×h×w rows across one partition per time") {
    val df = grid(4, 8, 8)
    assert(df.count() == 4 * 8 * 8)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.select("time").distinct().count() == 4)
  }

  test("column pruning reaches the source") {
    val pruned = grid().select("u")
    assert(pruned.schema.fieldNames.sameElements(Array("u")))
    // deterministic regeneration: two reads agree
    val s1 = pruned.agg(round(sum("u"), 6)).collect()(0).getDouble(0)
    val s2 = grid().select("u").agg(round(sum("u"), 6)).collect()(0).getDouble(0)
    assert(s1 == s2)
  }

  test("reference pipeline end-to-end on grid data: windspeed → climatology → anomaly → contours") {
    val df = grid(4, 16, 16).cache()
    // derived variable (ecmwf wind_speed)
    val withSpeed = df.withColumn("speed", Ingest.windSpeed(col("u"), col("v")))
    // climatology: per-cell mean over times 0..2; anomaly for time 3
    val normals = withSpeed.filter(col("time") < 3)
      .groupBy("y", "x").agg(avg("speed").as("normal"))
    val current = withSpeed.filter(col("time") === 3)
    val anomalies = current.join(broadcast(normals), Seq("y", "x"), "left")
      .select(col("y"), col("x"),
        Ingest.anomaly(col("speed"), col("normal")).as("anomaly"))
    assert(anomalies.count() == 16 * 16)
    // no cell should hit the sentinel (every cell has a normal)
    assert(anomalies.filter(col("anomaly") === -9999.0).count() == 0)
    // contour classification of the speed field
    val levels = withSpeed
      .groupBy(Ingest.contourLevel(col("speed"), 1.0).as("level"))
      .agg(count(lit(1)).as("n"))
    val total = levels.agg(sum("n")).collect()(0).getLong(0)
    assert(total == 4 * 16 * 16)
    // speeds are in [0, sqrt(50)); levels must be within range
    val lvls = levels.select("level").collect().map(_.getDouble(0))
    assert(lvls.forall(l => l >= 0.0 && l <= 8.0))
  }

  test("time filters prune input partitions at the source") {
    val df = grid(8, 4, 4)
    // equality → exactly one of the 8 time partitions is planned
    val one = df.filter(col("time") === 3)
    assert(one.rdd.getNumPartitions == 1, s"got ${one.rdd.getNumPartitions} partitions")
    assert(one.count() == 4 * 4)
    // range → half the partitions
    val half = df.filter(col("time") >= 4)
    assert(half.rdd.getNumPartitions == 4)
    assert(half.count() == 4 * 4 * 4)
    // IN-list
    val in = df.filter(col("time").isin(0, 7))
    assert(in.rdd.getNumPartitions == 2)
    // non-time filters prune nothing but still return correct results
    val res = df.filter(col("u") > 0)
    assert(res.rdd.getNumPartitions == 8)
    assert(res.count() > 0 && res.count() < 8 * 4 * 4)
  }

  test("grid values match the generator directly") {
    val row = grid(1, 2, 2).filter(col("y") === 1 && col("x") === 1)
      .select("u", "v").collect()(0)
    assert(row.getDouble(0) == graft.sources.GridSource.uAt(0, 1, 1))
    assert(row.getDouble(1) == graft.sources.GridSource.vAt(0, 1, 1))
  }

  test("aggregate pushdown answers dimension stats from metadata, zero cells generated") {
    import graft.sources.GridSource
    val df = grid(6, 16, 8)
    GridSource.cellsGenerated.set(0)
    // grouped inventory: one metadata row per time slice
    val perSlice = df.groupBy(col("time")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perSlice == (0 until 6).map(_ -> 128L).toMap)
    // global dimension stats
    val g = df.agg(count(lit(1)), min(col("y")), max(col("y")), max(col("x"))).collect()(0)
    assert(g.getLong(0) == 6L * 128 && g.getInt(1) == 0 && g.getInt(2) == 15 && g.getInt(3) == 7)
    // pushdown composes with time-partition pruning
    val pruned = df.filter(col("time") >= 4).groupBy(col("time")).count().collect()
    assert(pruned.map(_.getInt(0)).sorted.sameElements(Array(4, 5)))
    assert(GridSource.cellsGenerated.get() == 0,
      s"metadata-answerable aggregates generated ${GridSource.cellsGenerated.get()} cells")
    // value-column aggregates are declined and fall back to the real scan
    val uMax = df.agg(max(col("u"))).collect()(0).getDouble(0)
    assert(uMax > 4.0 && uMax < 5.0)
    assert(GridSource.cellsGenerated.get() == 6L * 128)
  }

  test("reported key-grouped partitioning makes per-time aggregation shuffle-free") {
    val prev = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      // sum(u) is a VALUE aggregate — pushdown declines it, so this is a
      // real per-time aggregation over generated cells; the scan reports
      // KeyGroupedPartitioning(time), so no exchange is needed
      val agg = grid(4, 8, 8).groupBy(col("time"))
        .agg(round(sum(col("u")), 2).as("su"))
      val plan = agg.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange hashpartitioning"),
        s"per-time agg should reuse the source's time partitioning:\n$plan")
      // and the answer is still right (matches the generator)
      val got = agg.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val want = (0 until 4).map { t =>
        t -> BigDecimal((for (y <- 0 until 8; x <- 0 until 8)
          yield graft.sources.GridSource.uAt(t, y, x)).sum)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toMap
      assert(got == want)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
      case None => spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
    }
  }

  test("runtime filtering: a filtered dim join dynamically prunes grid time-partitions") {
    import graft.sources.GridSource
    import spark.implicits._
    val df = grid(16, 8, 8)
    // the dim side only keeps times {3, 11}; DPP must evaluate it first
    // and push the surviving time set into the scan, so only 2 of the
    // 16 time slices ever generate cells. The dim is a REAL stored
    // relation — a local one would have its filter constant-folded
    // away before the pruning rule can see it
    val dimPath = java.nio.file.Files.createTempDirectory("graft_dpp_dim").toString
    (0 until 16).map(t => (t, t % 8)).toDF("t", "tag")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val q = df.join(dim.filter(col("tag") === 3), col("time") === col("t"))
      .agg(count(lit(1)).as("n"), round(sum(col("u")), 2).as("su"))
    GridSource.cellsGenerated.set(0)
    val r = q.collect()(0)
    assert(r.getLong(0) == 2L * 8 * 8)
    val generated = GridSource.cellsGenerated.get()
    assert(generated == 2L * 8 * 8,
      s"runtime filtering should generate 128 cells (2 pruned slices), got $generated")
    // values unchanged vs the statically filtered equivalent
    val want = grid(16, 8, 8).filter(col("time").isin(3, 11))
      .agg(round(sum(col("u")), 2)).collect()(0).getDouble(0)
    assert(r.getDouble(1) == want)
  }

  test("storage-partitioned join: two grid scans join with zero exchanges") {
    val prev = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      // per-time U mass joined to per-time V mass: both sides aggregate
      // inside the connector's reported time partitioning and the join
      // runs partition-to-partition — the whole plan has NO exchange
      // (the 100 TB shape: two date-partitioned stores correlated by
      // date never shuffle)
      val a = grid(4, 8, 8).groupBy(col("time")).agg(round(sum(col("u")), 2).as("su"))
      val b = grid(4, 8, 8).groupBy(col("time")).agg(round(sum(col("v")), 2).as("sv"))
      val j = a.join(b, "time")
      val plan = j.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"),
        s"storage-partitioned join must not shuffle either side:\n$plan")
      assert(plan.contains("Join"), s"expected a real join:\n$plan")
      val rows = j.collect()
      assert(rows.length == 4)
      rows.foreach { r =>
        val t = r.getInt(0)
        def mass(f: (Int, Int, Int) => Double) = BigDecimal(
          (for (y <- 0 until 8; x <- 0 until 8) yield f(t, y, x)).sum)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r.getDouble(1) == mass(graft.sources.GridSource.uAt))
        assert(r.getDouble(2) == mass(graft.sources.GridSource.vAt))
      }
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
      case None => spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
    }
  }

  test("co-listed gz twins plan as ONE archive on all three listing connectors: " +
      "the crash window between gunzip-on-landing's move and delete must never " +
      "double-read") {
    import graft.sources.{GeoTiff, GribGridSource, GribMeta, GridFiles,
      Gz, NcGridSource, NetCdf, TiffGridSource}
    import java.nio.file.{Files, Paths}
    // Gz.gunzipLanding legally leaves BOTH twins on disk between its
    // atomic move and the wrapped-original delete; a listing that kept
    // both would read every record twice. The unwrapped twin must win.
    val dir = Files.createTempDirectory("graft_twins").toString

    // GRIB: a two-message archive planted as both twins — planning
    // must fan out per message of the UNWRAPPED twin only (the gz twin
    // would have added one serial whole-file split re-reading both)
    val grib = (0 until 2).toArray.flatMap(k =>
      GribMeta.encodeSimple(2, 2, 2, 5 + k, 0f, 0, 0, 8,
        Array(1L + k, 2L, 3L, 4L)))
    Files.write(Paths.get(s"$dir/x.grb"), grib)
    Files.write(Paths.get(s"$dir/x.grb.gz"), Gz.gzip(grib))
    assert(GribGridSource.listFiles(dir).map(_.split('/').last) == Seq("x.grb"))
    val g = spark.read.format("graft.sources.GribGridSource")
      .option("path", dir).load()
    assert(g.rdd.getNumPartitions == 2,
      s"expected 2 per-message splits of ONE archive, got ${g.rdd.getNumPartitions}")
    assert(g.count() == 8, "2 messages x 4 points, read once")

    // NetCDF: same fixture as the .nc.gz suite, both twins planted
    val nc = NetCdf.encode(
      Seq(NetCdf.Dim("time", 0), NetCdf.Dim("lat", 2), NetCdf.Dim("lon", 3)),
      Nil,
      Seq(
        NetCdf.VarSpec("time", Seq("time"), NetCdf.NcDouble,
          atts = Seq(NetCdf.Att("units",
            Some("days since 1995-01-01"), Array.empty)),
          values = Array(0.0)),
        NetCdf.VarSpec("lat", Seq("lat"), NetCdf.NcDouble,
          values = Array(10.0, 9.5)),
        NetCdf.VarSpec("lon", Seq("lon"), NetCdf.NcDouble,
          values = Array(-1.0, -0.5, 0.0)),
        NetCdf.VarSpec("qty", Seq("time", "lat", "lon"), NetCdf.NcDouble,
          values = Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))),
      numRecs = 1)
    Files.write(Paths.get(s"$dir/y.nc"), nc)
    Files.write(Paths.get(s"$dir/y.nc.gz"), Gz.gzip(nc))
    assert(NcGridSource.listFiles(dir).map(_.split('/').last) == Seq("y.nc"))
    val n = spark.read.format("graft.sources.NcGridSource")
      .option("path", dir).option("var", "qty").load()
    assert(n.rdd.getNumPartitions == 1)
    assert(n.count() == 6, "one 2x3 slice, read once")

    // GeoTIFF: 2x2 raster, both twins planted
    val tif = GeoTiff.encode(GeoTiff.Raster(2, 2, 1, 1, 10, 20, None,
      Array(1.0, 2.0, 3.0, 4.0)))
    Files.write(Paths.get(s"$dir/z.tif"), tif)
    Files.write(Paths.get(s"$dir/z.tif.gz"), Gz.gzip(tif))
    assert(TiffGridSource.listFiles(dir).map(_.split('/').last) == Seq("z.tif"))
    val t = spark.read.format("graft.sources.TiffGridSource")
      .option("path", dir).load()
    assert(t.rdd.getNumPartitions == 1)
    assert(t.count() == 4, "one 2x2 raster, read once")
    // values identical to a lone-plain-file read (the guard changed
    // WHICH twin is read, never what it contains)
    assert(t.agg(sum("value")).collect()(0).getDouble(0) == 10.0)

    // the guard is twin-scoped, not gz-hostile: a LONE gz (no plain
    // sibling) still lists and reads — and glob expansion (the
    // non-directory listing path) applies the same guard
    val lone = Files.createTempDirectory("graft_lonegz").toString
    Files.write(Paths.get(s"$lone/only.grb.gz"), Gz.gzip(grib))
    assert(GribGridSource.listFiles(lone).map(_.split('/').last) ==
      Seq("only.grb.gz"))
    assert(spark.read.format("graft.sources.GribGridSource")
      .option("path", lone).load().count() == 8)
    assert(GridFiles.list(s"$dir/x.grb*").map(_.split('/').last) == Seq("x.grb"))

    // case parity with gunzip-on-landing: an upper-case .GZ twin pair
    // (which gunzipLanding ACCEPTS and unwraps to the case-exact stem)
    // is guarded too — glob listing, since directory listings only
    // glob the lower-case extension patterns (r16 review)
    val up = Files.createTempDirectory("graft_upgz").toString
    Files.write(Paths.get(s"$up/U.GRB"), grib)
    Files.write(Paths.get(s"$up/U.GRB.GZ"), Gz.gzip(grib))
    assert(GridFiles.list(s"$up/U.*").map(_.split('/').last) == Seq("U.GRB"))
    // and the shared sibling derivation is what the guard mirrors
    assert(Gz.unwrappedSibling(Paths.get(s"$up/U.GRB.GZ")).getFileName
      .toString == "U.GRB")
  }
}
