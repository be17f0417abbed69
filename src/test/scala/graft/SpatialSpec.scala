package graft

import graft.functions.spatial.{Geom, Ops, Wkt}

/** Geometry kernel tests mirroring the reference's spatial semantics
  * (reference: test/spatial — WKT round-trips and predicate truth tables).
  */
class SpatialSpec extends SparkSpec {

  private def g(w: String): Geom = Wkt.parse(w).get

  test("WKT round-trips every geometry family") {
    Seq(
      "POINT (1 2)",
      "POINT (1.5 -2.25)",
      "LINESTRING (0 0, 1 1, 2 0)",
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
      "MULTIPOINT ((1 2), (3 4))",
      "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))",
      "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))"
    ).foreach(w => assert(Wkt.write(g(w)) == w))
  }

  test("point-in-polygon with a hole") {
    val poly = g("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))")
    assert(Ops.contains(poly, g("POINT (3 3)")))
    assert(!Ops.contains(poly, g("POINT (1.5 1.5)"))) // in the hole
    assert(!Ops.contains(poly, g("POINT (5 5)")))
  }

  test("intersects / within / touches / crosses basics") {
    val box = g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    assert(Ops.intersects(box, g("LINESTRING (-1 5, 11 5)")))
    assert(Ops.within(g("POINT (5 5)"), box))
    assert(Ops.touches(box, g("POINT (0 5)")))
    assert(Ops.crosses(g("LINESTRING (-1 5, 11 5)"), box))
    assert(!Ops.intersects(box, g("POINT (20 20)")))
  }

  test("dwithin uses euclidean distance") {
    assert(Ops.dWithin(g("POINT (0 0)"), g("POINT (3 4)"), 5.0))
    assert(!Ops.dWithin(g("POINT (0 0)"), g("POINT (3 4)"), 4.9))
  }

  test("ST_ expressions work end-to-end in SQL with constant folding") {
    val df = spark.sql(
      "SELECT st_contains(st_geomfromtext('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))'), st_geomfromtext('POINT (2 2)')) AS c")
    assert(df.collect().head.getBoolean(0))
  }
}
