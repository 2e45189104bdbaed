package graft

import graft.sources.MvtDdl
import org.scalatest.funsuite.AnyFunSuite

/** DDL generators for the PostGIS vector-publish side — structure,
  * column threading, and the injection guard the reference's
  * f-strings lack. */
class MvtDdlSpec extends AnyFunSuite {

  test("table DDL: typed geometry, data columns, date index") {
    val Seq(tbl, idx) = MvtDdl.createTableSql(
      "public", "cap_alerts", "Polygon", 4326, Seq("severity", "urgency"))
    assert(tbl.contains("CREATE TABLE IF NOT EXISTS public.cap_alerts"))
    assert(tbl.contains("GEOMETRY(Polygon, 4326)"))
    assert(tbl.contains(", severity REAL"))
    assert(tbl.contains(", urgency REAL"))
    assert(tbl.contains("date TIMESTAMP"))
    assert(idx ==
      "CREATE INDEX IF NOT EXISTS cap_alerts_date_idx ON public.cap_alerts(date)")
    // no data columns → no trailing comma garbage
    val Seq(bare, _) = MvtDdl.createTableSql("s", "t", "Point", 3857, Nil)
    assert(bare.contains("GEOMETRY(Point, 3857))"))
  }

  test("tile function DDL: (z,x,y,date) → bytea, bounds→clip→MVT pipeline") {
    val fn = MvtDdl.createTileFunctionSql("public", "cap_alerts",
      Seq("severity"))
    assert(fn.contains(
      "CREATE OR REPLACE FUNCTION public.cap_alerts("))
    assert(fn.contains("z integer, x integer, y integer, data_date timestamp"))
    assert(fn.contains("RETURNS bytea"))
    assert(fn.contains("ST_TileEnvelope(z, x, y)"))
    assert(fn.contains("ST_AsMVTGeom(ST_Transform(t.geom, 3857), bounds.geom)"))
    assert(fn.contains("ST_Intersects(t.geom, ST_Transform(bounds.geom, 4326))"))
    assert(fn.contains("t.date = data_date"))
    assert(fn.contains("t.date, t.severity"))
    assert(fn.contains("SELECT ST_AsMVT(mvtgeom, 'default') FROM mvtgeom;"))
    assert(fn.contains("PARALLEL SAFE"))
    // the $$ dollar-quoting survives Scala interpolation intact
    assert(fn.linesIterator.count(_.trim.endsWith("$$")) == 2)
  }

  test("identifiers are validated — injection-shaped names refuse") {
    intercept[IllegalArgumentException] {
      MvtDdl.createTileFunctionSql("public", "x; DROP TABLE y", Nil)
    }
    intercept[IllegalArgumentException] {
      MvtDdl.createTableSql("public", "t", "Polygon", 4326,
        Seq("a, geom GEOMETRY"))
    }
    intercept[IllegalArgumentException] {
      MvtDdl.createTableSql("pub lic", "t", "Polygon", 4326, Nil)
    }
    intercept[IllegalArgumentException] {
      MvtDdl.createTableSql("public", "t", "Circle", 4326, Nil)
    }
  }
}
