package graft.sources

/** DDL twins of the reference's vector-publish side (reference
  * `ingest/raster_vector.py:70-115`): the PostGIS feature TABLE (date
  * column, typed geometry, per-dataset REAL data columns, date index)
  * and the dynamic-layer MVT TILE FUNCTION (`ST_TileEnvelope` bounds →
  * `ST_AsMVTGeom` clip in 3857 → `ST_AsMVT` blob for one (z, x, y,
  * date)). The engine computes tiles itself where Spark is the serving
  * side (i15b/i15c compute the same bytes) — these generators cover
  * the deployment where a PostGIS instance serves tiles and the engine
  * publishes rows into it (the [[JdbcUpsert]] path).
  *
  * Statements are GENERATED, not executed: executing needs a live
  * PostGIS (not present here, and never a library dependency) — the
  * caller runs them over its own JDBC connection, the
  * [[JdbcUpsert.upsertDates]] pattern. Unlike the reference's
  * f-strings, every interpolated identifier is validated against a
  * strict `[A-Za-z_][A-Za-z0-9_]*` shape first, so a hostile dataset
  * name cannot smuggle SQL. */
object MvtDdl {

  private val Ident = "^[A-Za-z_][A-Za-z0-9_]{0,62}$".r

  private def checkIdent(what: String, v: String): String = {
    require(Ident.findFirstIn(v).isDefined,
      s"$what '$v' is not a safe SQL identifier " +
        "([A-Za-z_][A-Za-z0-9_]*, max 63 chars)")
    v
  }

  private val GeomTypes = Set("Point", "MultiPoint", "LineString",
    "MultiLineString", "Polygon", "MultiPolygon")

  /** `CREATE TABLE IF NOT EXISTS` + the date index — the reference's
    * `create_table_if_not_exists` pair, one statement per element. */
  def createTableSql(schemaName: String, tableName: String,
      geomType: String, srid: Int, dataColumns: Seq[String]): Seq[String] = {
    checkIdent("schema", schemaName); checkIdent("table", tableName)
    dataColumns.foreach(checkIdent("data column", _))
    require(GeomTypes(geomType),
      s"geometry type '$geomType' not one of ${GeomTypes.toSeq.sorted.mkString(", ")}")
    require(srid > 0 && srid <= 998999, s"implausible SRID $srid")
    val dataCols = dataColumns.map(c => s", $c REAL").mkString
    Seq(
      s"""CREATE TABLE IF NOT EXISTS $schemaName.$tableName
         |  (id SERIAL PRIMARY KEY,
         |   date TIMESTAMP,
         |   geom GEOMETRY($geomType, $srid)$dataCols)""".stripMargin,
      s"CREATE INDEX IF NOT EXISTS ${tableName}_date_idx " +
        s"ON $schemaName.$tableName(date)")
  }

  /** The `(z, x, y, date) → bytea` dynamic-layer tile function — the
    * reference's `create_or_replace_mvt_function`, returning one MVT
    * blob per tile request with the dataset's data columns as feature
    * properties in the `default` layer. `srid` must match the table's
    * geometry SRID (the reference hardcodes 4326 while letting the
    * table take any SRID — a mixed-SRID runtime error for every other
    * choice; here the bounds transform is parameterized). */
  def createTileFunctionSql(schemaName: String, tableName: String,
      dataColumns: Seq[String], srid: Int = 4326): String = {
    checkIdent("schema", schemaName); checkIdent("table", tableName)
    dataColumns.foreach(checkIdent("data column", _))
    require(srid > 0 && srid <= 998999, s"implausible SRID $srid")
    val extra = dataColumns.map(c => s", t.$c").mkString
    s"""CREATE OR REPLACE FUNCTION $schemaName.$tableName(
       |    z integer, x integer, y integer, data_date timestamp)
       |RETURNS bytea
       |AS $$$$
       |  WITH
       |  bounds AS (
       |    SELECT ST_TileEnvelope(z, x, y) AS geom
       |  ),
       |  mvtgeom AS (
       |    SELECT ST_AsMVTGeom(ST_Transform(t.geom, 3857), bounds.geom) AS geom,
       |      t.date$extra
       |    FROM $schemaName.$tableName t, bounds
       |    WHERE ST_Intersects(t.geom, ST_Transform(bounds.geom, $srid))
       |      AND t.date = data_date
       |  )
       |  SELECT ST_AsMVT(mvtgeom, 'default') FROM mvtgeom;
       |$$$$
       |LANGUAGE 'sql'
       |STABLE
       |PARALLEL SAFE""".stripMargin
  }
}
