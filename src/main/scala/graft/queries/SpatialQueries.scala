package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Spatial coverage (reference: src/spatial, test/execute/execute.spatial
  * .test.js). Points are derived from integer keys so every predicate has an
  * exact arithmetic oracle in plain SQL: a point lies in the diamond
  * POLYGON ((10 1, 15 6, 10 11, 5 6, 10 1)) iff |x-10|+|y-6| <= 5, in an
  * envelope iff BETWEEN on both axes, and within distance d of a point iff
  * dx²+dy² <= d². Integer coordinates keep the epsilon logic away from
  * boundaries, so both engines agree exactly.
  *
  * Scale note: the geometry argument built from a literal
  * (`st_geomfromtext('POLYGON ...')`) is constant-folded to its binary form
  * at plan time; the per-row cost is one deserialize + point-in-ring test,
  * and the whole filter stays inside the scan's WholeStageCodegen stage
  * (only the ST_ call is interpreted).
  */
object SpatialQueries {

  private def points(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "customer")
      .filter(col("c_custkey") < 500)
      .selectExpr("c_custkey AS id",
        "CAST(c_custkey % 20 AS DOUBLE) AS x",
        "CAST(c_custkey % 13 AS DOUBLE) AS y")

  private val pointsSql =
    """SELECT c_custkey AS id,
      |  CAST(c_custkey % 20 AS DOUBLE) AS x,
      |  CAST(c_custkey % 13 AS DOUBLE) AS y
      |FROM customer WHERE c_custkey < 500""".stripMargin

  val all: Seq[QueryDef] = Seq(

    // ---- WKT round-trip (reference: src/spatial/wkt.js) -----------------
    QueryDef("q_spatial_wkt",
      """SELECT
        |  'POINT (1 2)' AS w_point,
        |  'POINT (1.5 -2.25)' AS w_point_frac,
        |  'LINESTRING (0 0, 1 1, 2 0)' AS w_line,
        |  'POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))' AS w_poly,
        |  'MULTIPOINT ((1 2), (3 4))' AS w_mpoint,
        |  'MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))' AS w_mline,
        |  'MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))' AS w_mpoly,
        |  'GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))' AS w_coll""".stripMargin) {
      (s, _) =>
        s.sql(
          """SELECT
            |  st_astext(st_geomfromtext('POINT (1 2)')) AS w_point,
            |  st_astext(st_geomfromtext('POINT (1.5 -2.25)')) AS w_point_frac,
            |  st_astext(st_geomfromtext('LINESTRING (0 0, 1 1, 2 0)')) AS w_line,
            |  st_astext(st_geomfromtext('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))')) AS w_poly,
            |  st_astext(st_geomfromtext('MULTIPOINT ((1 2), (3 4))')) AS w_mpoint,
            |  st_astext(st_geomfromtext('MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))')) AS w_mline,
            |  st_astext(st_geomfromtext('MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))')) AS w_mpoly,
            |  st_astext(st_geomfromtext('GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))')) AS w_coll""".stripMargin)
    },

    // ---- Envelope containment -------------------------------------------
    QueryDef("q_spatial_envelope",
      s"""SELECT id, x, y,
         |  (x BETWEEN 3 AND 12) AND (y BETWEEN 2 AND 9) AS in_env
         |FROM ($pointsSql) p
         |ORDER BY id""".stripMargin) {
      (s, dir) =>
        points(s, dir).createOrReplaceTempView("pts")
        s.sql(
          """SELECT id, x, y,
            |  st_contains(st_makeenvelope(3.0D, 2.0D, 12.0D, 9.0D),
            |              st_geomfromtext(concat('POINT (', x, ' ', y, ')'))) AS in_env
            |FROM pts ORDER BY id""".stripMargin)
    },

    // ---- Predicate battery against a diamond polygon ---------------------
    QueryDef("q_spatial_predicates",
      s"""SELECT id, x, y,
         |  abs(x - 10) + abs(y - 6) <= 5 AS hits,
         |  abs(x - 10) + abs(y - 6) <= 5 AS contained,
         |  abs(x - 10) + abs(y - 6) < 5 AS strictly_in,
         |  abs(x - 10) + abs(y - 6) <= 5 AS is_within,
         |  (x - 8) * (x - 8) + (y - 5) * (y - 5) <= 16 AS near_anchor
         |FROM ($pointsSql) p
         |ORDER BY id""".stripMargin) {
      (s, dir) =>
        points(s, dir).createOrReplaceTempView("pts")
        s.sql(
          """SELECT id, x, y,
            |  st_intersects(pt, diamond) AS hits,
            |  st_contains(diamond, pt) AS contained,
            |  st_containsproperly(diamond, pt) AS strictly_in,
            |  st_within(pt, diamond) AS is_within,
            |  st_dwithin(pt, st_geomfromtext('POINT (8 5)'), 4.0D) AS near_anchor
            |FROM (
            |  SELECT id, x, y,
            |    st_geomfromtext(concat('POINT (', x, ' ', y, ')')) AS pt,
            |    st_geomfromtext('POLYGON ((10 1, 15 6, 10 11, 5 6, 10 1))') AS diamond
            |  FROM pts
            |) ORDER BY id""".stripMargin)
    },

    // ---- Spatial join: points vs broadcast grid cells --------------------
    QueryDef("q_spatial_join",
      s"""WITH cells(cell_id, x0, y0, x1, y1) AS (
         |  VALUES (0, 0.0, 0.0, 9.0, 6.0), (1, 10.0, 0.0, 19.0, 6.0),
         |         (2, 0.0, 7.0, 9.0, 12.0), (3, 10.0, 7.0, 19.0, 12.0)
         |)
         |SELECT cell_id, CAST(COUNT(*) AS BIGINT) AS n_points
         |FROM ($pointsSql) p JOIN cells
         |  ON p.x BETWEEN x0 AND x1 AND p.y BETWEEN y0 AND y1
         |GROUP BY cell_id ORDER BY cell_id""".stripMargin) {
      (s, dir) =>
        import s.implicits._
        val cells = Seq(
          (0, 0.0, 0.0, 9.0, 6.0), (1, 10.0, 0.0, 19.0, 6.0),
          (2, 0.0, 7.0, 9.0, 12.0), (3, 10.0, 7.0, 19.0, 12.0))
          .toDF("cell_id", "x0", "y0", "x1", "y1")
          .selectExpr("cell_id", "st_makeenvelope(x0, y0, x1, y1) AS cell")
        points(s, dir)
          .selectExpr("id", "st_geomfromtext(concat('POINT (', x, ' ', y, ')')) AS pt")
          .join(broadcast(cells), expr("st_contains(cell, pt)"))
          .groupBy("cell_id")
          .agg(count(lit(1)).cast("bigint").as("n_points"))
          .orderBy("cell_id")
    }
  )
}
