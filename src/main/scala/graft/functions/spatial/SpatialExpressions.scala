package graft.functions.spatial

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the ST_* family (reference:
  * src/spatial/spatial.js:20 evaluateSpatialFunc — same surface, Spark-first
  * execution).
  *
  * Geometries travel as BinaryType (GeomCodec). Every expression also
  * accepts a WKT string directly; `ST_GEOMFROMTEXT` of a literal is
  * deterministic+foldable, so Catalyst's ConstantFolding serializes it once
  * at plan time — the per-row work in a predicate against a literal
  * geometry is a single cheap binary deserialize, no text parsing.
  * CodegenFallback keeps the surrounding operators inside whole-stage
  * codegen (only the ST_ call itself is interpreted).
  */
object SpatialExpressions {

  /** Accept a geometry as binary (preferred) or WKT string. */
  private[spatial] def toGeom(value: Any): Geom = value match {
    case b: Array[Byte] => GeomCodec.deserialize(b)
    case s: UTF8String  => Wkt.parse(s.toString).orNull
    case _              => null
  }

  /** Numeric inputs arrive as whatever type the literal had; widen to Double. */
  private[spatial] def toD(value: Any): Double = value match {
    // a bare SQL literal like 3.1 is DECIMAL at runtime — Spark's
    // Decimal is NOT a java.lang.Number, and falling to NaN made every
    // ST_DWITHIN with a decimal-literal distance silently false
    // (caught by the reference parse-suite replay's distance fixtures)
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case d: java.lang.Number                    => d.doubleValue()
    case _                                      => Double.NaN
  }

  case class StGeomFromText(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String = "st_geomfromtext"
    override def nullSafeEval(input: Any): Any =
      Wkt.parse(input.asInstanceOf[UTF8String].toString)
        .map(GeomCodec.serialize).orNull
    override protected def withNewChildInternal(newChild: Expression): StGeomFromText =
      copy(child = newChild)
  }

  case class StAsText(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "st_astext"
    override def nullSafeEval(input: Any): Any = {
      val g = toGeom(input)
      if (g == null) null else UTF8String.fromString(Wkt.write(g))
    }
    override protected def withNewChildInternal(newChild: Expression): StAsText =
      copy(child = newChild)
  }

  /** Geometry (binary or WKT text) → GeoJSON text — the reference's
    * client-visible geometry shape (spatial.js `{type, coordinates}`).
    * GraftSql renders every binary output column through this, so a
    * dialect user selecting a constructed geometry sees standard
    * GeoJSON, never the engine's internal codec bytes.
    */
  case class StAsGeoJson(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "st_asgeojson"
    override def nullSafeEval(input: Any): Any = {
      val g = toGeom(input)
      if (g == null) null else UTF8String.fromString(GeoJson.write(g))
    }
    override protected def withNewChildInternal(newChild: Expression): StAsGeoJson =
      copy(child = newChild)
  }

  case class StMakeEnvelope(xmin: Expression, ymin: Expression, xmax: Expression, ymax: Expression)
      extends QuaternaryExpression with CodegenFallback {
    override def first: Expression = xmin
    override def second: Expression = ymin
    override def third: Expression = xmax
    override def fourth: Expression = ymax
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String = "st_makeenvelope"
    override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any = {
      val (x0, y0, x1, y1) = (toD(a), toD(b), toD(c), toD(d))
      GeomCodec.serialize(Geom.Polygon(IndexedSeq(IndexedSeq(
        Pt(x0, y0), Pt(x1, y0), Pt(x1, y1), Pt(x0, y1), Pt(x0, y0)))))
    }
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression, q: Expression): StMakeEnvelope =
      copy(xmin = f, ymin = s, xmax = t, ymax = q)
  }

  /** All two-geometry boolean predicates share one shape; the predicate is
    * dispatched by name so the expression tree stays serialization-friendly.
    */
  case class StPredicate(left: Expression, right: Expression, predicate: String)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BooleanType
    override def nullable: Boolean = true
    override def prettyName: String = predicate
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = SpatialExpressions.toGeom(l)
      val b = SpatialExpressions.toGeom(r)
      if (a == null || b == null) null
      else predicate match {
        case "st_intersects"       => Ops.intersects(a, b)
        case "st_contains"         => Ops.contains(a, b)
        case "st_containsproperly" => Ops.containsProperly(a, b)
        case "st_within"           => Ops.within(a, b)
        case "st_overlaps"         => Ops.overlaps(a, b)
        case "st_touches"          => Ops.touches(a, b)
        case "st_equals"           => Ops.geomEquals(a, b)
        case "st_crosses"          => Ops.crosses(a, b)
        case "st_covers"           => Ops.covers(a, b)
        case "st_coveredby"        => Ops.coveredBy(a, b)
      }
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): StPredicate =
      copy(left = l, right = r)
  }

  case class StDWithin(left: Expression, right: Expression, distance: Expression)
      extends TernaryExpression with CodegenFallback {
    override def first: Expression = left
    override def second: Expression = right
    override def third: Expression = distance
    override def dataType: DataType = BooleanType
    override def nullable: Boolean = true
    override def prettyName: String = "st_dwithin"
    override def nullSafeEval(l: Any, r: Any, d: Any): Any = {
      val a = SpatialExpressions.toGeom(l)
      val b = SpatialExpressions.toGeom(r)
      if (a == null || b == null) null
      else Ops.dWithin(a, b, toD(d))
    }
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression, d: Expression): StDWithin =
      copy(left = l, right = r, distance = d)
  }

  val predicateNames: Seq[String] = Seq(
    "st_intersects", "st_contains", "st_containsproperly", "st_within",
    "st_overlaps", "st_touches", "st_equals", "st_crosses",
    "st_covers", "st_coveredby")
}
