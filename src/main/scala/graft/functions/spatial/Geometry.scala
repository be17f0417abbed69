package graft.functions.spatial

import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer

/** 2D geometry model with WKT text codec and a compact binary codec.
  *
  * Capability mirror of the reference's spatial module (reference:
  * src/spatial/wkt.js:11 parse, :70 write; src/spatial/spatial.js:77
  * decompose) — re-implemented as a Scala ADT. Geometries flow between
  * Catalyst expressions as the binary form so `ST_GEOMFROMTEXT` literals
  * are parsed once at constant-folding time, never per row.
  */
final case class Pt(x: Double, y: Double) {
  def distSq(o: Pt): Double = { val dx = x - o.x; val dy = y - o.y; dx * dx + dy * dy }
}

sealed trait Geom
object Geom {
  final case class Point(p: Pt) extends Geom
  final case class MultiPoint(pts: IndexedSeq[Pt]) extends Geom
  final case class LineString(pts: IndexedSeq[Pt]) extends Geom
  final case class MultiLineString(lines: IndexedSeq[IndexedSeq[Pt]]) extends Geom
  /** rings(0) is the exterior; the rest are holes. Rings are closed (first == last). */
  final case class Polygon(rings: IndexedSeq[IndexedSeq[Pt]]) extends Geom
  final case class MultiPolygon(polys: IndexedSeq[IndexedSeq[IndexedSeq[Pt]]]) extends Geom
  final case class Collection(geoms: IndexedSeq[Geom]) extends Geom

  /** Flatten Multi- and Collection geometries into simple Point/LineString/Polygon parts. */
  def parts(g: Geom): IndexedSeq[Geom] = g match {
    case MultiPoint(ps)       => ps.map(Point.apply)
    case MultiLineString(ls)  => ls.map(LineString.apply)
    case MultiPolygon(polys)  => polys.map(Polygon.apply)
    case Collection(gs)       => gs.flatMap(parts)
    case simple               => IndexedSeq(simple)
  }
}

object Wkt {
  import Geom._

  /** Parse WKT; None on malformed input (engine surfaces SQL NULL). */
  def parse(wkt: String): Option[Geom] = {
    val s = wkt.trim
    val u = s.toUpperCase(java.util.Locale.ROOT)
    def body(prefix: Int): Option[String] = {
      val rest = s.substring(prefix).trim
      if (rest.startsWith("(") && rest.endsWith(")")) Some(rest.substring(1, rest.length - 1).trim)
      else None
    }
    try {
      if (u.startsWith("MULTIPOINT")) body(10).flatMap(coordList).map(MultiPoint.apply)
      else if (u.startsWith("MULTILINESTRING")) body(15).flatMap(ringList).map(MultiLineString.apply)
      else if (u.startsWith("MULTIPOLYGON")) body(12).flatMap(polyList).map(MultiPolygon.apply)
      else if (u.startsWith("POINT")) coord(s.substring(5)).map(Point.apply)
      else if (u.startsWith("LINESTRING")) body(10).flatMap(coordList).map(LineString.apply)
      else if (u.startsWith("POLYGON")) body(7).flatMap(ringList).map(Polygon.apply)
      else if (u.startsWith("GEOMETRYCOLLECTION"))
        body(18).map(splitTop).flatMap { parts =>
          val gs = parts.map(p => parse(p))
          if (gs.forall(_.isDefined)) Some(Collection(gs.flatten.toIndexedSeq)) else None
        }
      else None
    } catch { case _: NumberFormatException => None }
  }

  private def coord(s: String): Option[Pt] = {
    val inner = s.trim.stripPrefix("(").stripSuffix(")").trim
    val nums = inner.split("\\s+")
    if (nums.length < 2) None
    else {
      // non-finite coordinates are invalid WKT, not huge ones — the
      // reference's Number.isFinite gate (its wkt.js coordinate parse;
      // "Infinity" would otherwise read as a JVM double too)
      val (x, y) = (nums(0).toDouble, nums(1).toDouble)
      if (java.lang.Double.isFinite(x) && java.lang.Double.isFinite(y)) Some(Pt(x, y))
      else None
    }
  }

  private def coordList(s: String): Option[IndexedSeq[Pt]] = {
    val pts = s.split(",").map(c => coord(c))
    if (pts.forall(_.isDefined) && pts.nonEmpty) Some(pts.flatten.toIndexedSeq) else None
  }

  private def ringList(s: String): Option[IndexedSeq[IndexedSeq[Pt]]] = {
    val rings = splitTop(s).map { r =>
      val t = r.trim
      if (t.startsWith("(") && t.endsWith(")")) coordList(t.substring(1, t.length - 1))
      else None
    }
    if (rings.forall(_.isDefined) && rings.nonEmpty) Some(rings.flatten) else None
  }

  private def polyList(s: String): Option[IndexedSeq[IndexedSeq[IndexedSeq[Pt]]]] = {
    val polys = splitTop(s).map { p =>
      val t = p.trim
      if (t.startsWith("(") && t.endsWith(")")) ringList(t.substring(1, t.length - 1))
      else None
    }
    if (polys.forall(_.isDefined) && polys.nonEmpty) Some(polys.flatten) else None
  }

  /** Split on commas outside parentheses. */
  private def splitTop(s: String): IndexedSeq[String] = {
    val out = ArrayBuffer.empty[String]
    var depth = 0; var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.toIndexedSeq
  }

  /** Integer-valued doubles print without a decimal point (like the
    * reference's JS number formatting), so `POINT (1 2)` round-trips.
    */
  private def num(v: Double): String =
    if (v == v.toLong && math.abs(v) < 1e15) v.toLong.toString else v.toString

  private def pt(p: Pt): String = s"${num(p.x)} ${num(p.y)}"
  private def ptList(ps: Seq[Pt]): String = ps.map(pt).mkString(", ")

  def write(g: Geom): String = g match {
    case Point(p)            => s"POINT (${pt(p)})"
    case MultiPoint(ps)      => s"MULTIPOINT (${ps.map(p => s"(${pt(p)})").mkString(", ")})"
    case LineString(ps)      => s"LINESTRING (${ptList(ps)})"
    case MultiLineString(ls) => s"MULTILINESTRING (${ls.map(l => s"(${ptList(l)})").mkString(", ")})"
    case Polygon(rs)         => s"POLYGON (${rs.map(r => s"(${ptList(r)})").mkString(", ")})"
    case MultiPolygon(ps) =>
      s"MULTIPOLYGON (${ps.map(p => s"(${p.map(r => s"(${ptList(r)})").mkString(", ")})").mkString(", ")})"
    case Collection(gs)      => s"GEOMETRYCOLLECTION (${gs.map(write).mkString(", ")})"
  }
}

/** GeoJSON text codec — the reference's client-visible geometry
  * representation (its evaluator passes GeoJSON objects straight through
  * to collect; reference: src/spatial/spatial.js:84-100 reads
  * `{type, coordinates}` / `GeometryCollection.geometries`). Whole-number
  * ordinates render without a decimal point, like JS JSON.stringify.
  */
object GeoJson {
  import Geom._

  private def num(v: Double): String =
    if (v == v.toLong && math.abs(v) < 1e15) v.toLong.toString else v.toString
  private def pt(p: Pt): String = s"[${num(p.x)},${num(p.y)}]"
  private def ring(ps: Seq[Pt]): String = ps.map(pt).mkString("[", ",", "]")
  private def rings(rs: Seq[Seq[Pt]]): String = rs.map(ring).mkString("[", ",", "]")

  def write(g: Geom): String = g match {
    case Point(p) => s"""{"type":"Point","coordinates":${pt(p)}}"""
    case MultiPoint(ps) => s"""{"type":"MultiPoint","coordinates":${ring(ps)}}"""
    case LineString(ps) => s"""{"type":"LineString","coordinates":${ring(ps)}}"""
    case MultiLineString(ls) => s"""{"type":"MultiLineString","coordinates":${rings(ls)}}"""
    case Polygon(rs) => s"""{"type":"Polygon","coordinates":${rings(rs)}}"""
    case MultiPolygon(ps) =>
      s"""{"type":"MultiPolygon","coordinates":${ps.map(rings).mkString("[", ",", "]")}}"""
    case Collection(gs) =>
      s"""{"type":"GeometryCollection","geometries":${gs.map(write).mkString("[", ",", "]")}}"""
  }
}

/** Compact binary codec: tag byte + counts + packed doubles. Used as the
  * on-wire geometry type between Catalyst expressions (BinaryType).
  */
object GeomCodec {
  import Geom._

  private val TPoint = 1: Byte
  private val TMultiPoint = 2: Byte
  private val TLine = 3: Byte
  private val TMultiLine = 4: Byte
  private val TPolygon = 5: Byte
  private val TMultiPolygon = 6: Byte
  private val TCollection = 7: Byte

  private def sizeOf(g: Geom): Int = g match {
    case Point(_)            => 1 + 16
    case MultiPoint(ps)      => 1 + 4 + 16 * ps.length
    case LineString(ps)      => 1 + 4 + 16 * ps.length
    case MultiLineString(ls) => 1 + 4 + ls.map(l => 4 + 16 * l.length).sum
    case Polygon(rs)         => 1 + 4 + rs.map(r => 4 + 16 * r.length).sum
    case MultiPolygon(ps)    => 1 + 4 + ps.map(p => 4 + p.map(r => 4 + 16 * r.length).sum).sum
    case Collection(gs)      => 1 + 4 + gs.map(sizeOf).sum
  }

  def serialize(g: Geom): Array[Byte] = {
    val buf = ByteBuffer.allocate(sizeOf(g))
    put(buf, g)
    buf.array()
  }

  private def put(buf: ByteBuffer, g: Geom): Unit = g match {
    case Point(p) => buf.put(TPoint); buf.putDouble(p.x); buf.putDouble(p.y)
    case MultiPoint(ps) =>
      buf.put(TMultiPoint); buf.putInt(ps.length)
      ps.foreach { p => buf.putDouble(p.x); buf.putDouble(p.y) }
    case LineString(ps) =>
      buf.put(TLine); buf.putInt(ps.length)
      ps.foreach { p => buf.putDouble(p.x); buf.putDouble(p.y) }
    case MultiLineString(ls) =>
      buf.put(TMultiLine); buf.putInt(ls.length)
      ls.foreach { l => buf.putInt(l.length); l.foreach { p => buf.putDouble(p.x); buf.putDouble(p.y) } }
    case Polygon(rs) =>
      buf.put(TPolygon); buf.putInt(rs.length)
      rs.foreach { r => buf.putInt(r.length); r.foreach { p => buf.putDouble(p.x); buf.putDouble(p.y) } }
    case MultiPolygon(ps) =>
      buf.put(TMultiPolygon); buf.putInt(ps.length)
      ps.foreach { p =>
        buf.putInt(p.length)
        p.foreach { r => buf.putInt(r.length); r.foreach { q => buf.putDouble(q.x); buf.putDouble(q.y) } }
      }
    case Collection(gs) =>
      buf.put(TCollection); buf.putInt(gs.length)
      gs.foreach(put(buf, _))
  }

  def deserialize(bytes: Array[Byte]): Geom = get(ByteBuffer.wrap(bytes))

  private def readPts(buf: ByteBuffer): IndexedSeq[Pt] = {
    val n = buf.getInt
    val out = new Array[Pt](n)
    var i = 0
    while (i < n) { out(i) = Pt(buf.getDouble, buf.getDouble); i += 1 }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }

  private def get(buf: ByteBuffer): Geom = buf.get() match {
    case TPoint        => Point(Pt(buf.getDouble, buf.getDouble))
    case TMultiPoint   => MultiPoint(readPts(buf))
    case TLine         => LineString(readPts(buf))
    case TMultiLine    => MultiLineString(IndexedSeq.fill(buf.getInt)(readPts(buf)))
    case TPolygon      => Polygon(IndexedSeq.fill(buf.getInt)(readPts(buf)))
    case TMultiPolygon => MultiPolygon(IndexedSeq.fill(buf.getInt)(IndexedSeq.fill(buf.getInt)(readPts(buf))))
    case TCollection   => Collection(IndexedSeq.fill(buf.getInt)(get(buf)))
    case other         => throw new IllegalArgumentException(s"bad geometry tag $other")
  }
}
