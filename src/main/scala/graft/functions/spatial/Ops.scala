package graft.functions.spatial

import Geom._

/** Epsilon-tolerant 2D spatial predicates over simple geometry parts.
  *
  * Same predicate semantics as the reference engine (reference:
  * src/spatial/operations.js, src/spatial/spatial.js:150-330): every
  * pairwise relation is classified into Outside / Boundary / Inside
  * ("interiors meet"), and the ST_* predicates are composed from those
  * classifications over the decomposed simple parts. Tolerance is 1e-10,
  * matching the reference (src/spatial/primitives.js:1).
  *
  * Algorithms are the standard toolkit: orientation (cross-product) tests
  * for segment intersection, even-odd ray casting for point-in-ring,
  * midpoint sampling for line/polygon interior classification.
  */
object Ops {
  val Eps = 1e-10
  val EpsSq: Double = Eps * Eps

  sealed trait Rel
  case object Outside extends Rel
  case object Boundary extends Rel
  case object Inside extends Rel

  // ---------- primitives ----------

  /** Cross product of (b-a) × (c-a): >0 left turn, <0 right, ~0 collinear. */
  private def orient(a: Pt, b: Pt, c: Pt): Double =
    (b.x - a.x) * (c.y - a.y) - (b.y - a.y) * (c.x - a.x)

  private def segDistSq(p: Pt, a: Pt, b: Pt): Double = {
    val dx = b.x - a.x; val dy = b.y - a.y
    val lenSq = dx * dx + dy * dy
    if (lenSq == 0) p.distSq(a)
    else {
      val t0 = ((p.x - a.x) * dx + (p.y - a.y) * dy) / lenSq
      val t = math.max(0.0, math.min(1.0, t0))
      val rx = p.x - a.x - t * dx; val ry = p.y - a.y - t * dy
      rx * rx + ry * ry
    }
  }

  /** Collinearity assumed: is c within [a,b]'s bounding box (eps-padded)? */
  private def inSegBox(a: Pt, b: Pt, c: Pt): Boolean =
    math.min(a.x, b.x) - c.x <= Eps && c.x - math.max(a.x, b.x) <= Eps &&
      math.min(a.y, b.y) - c.y <= Eps && c.y - math.max(a.y, b.y) <= Eps

  private def segmentsIntersect(p1: Pt, p2: Pt, p3: Pt, p4: Pt): Boolean = {
    val d1 = orient(p3, p4, p1); val d2 = orient(p3, p4, p2)
    val d3 = orient(p1, p2, p3); val d4 = orient(p1, p2, p4)
    if (((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
        ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))) true
    else (math.abs(d1) < Eps && inSegBox(p3, p4, p1)) ||
      (math.abs(d2) < Eps && inSegBox(p3, p4, p2)) ||
      (math.abs(d3) < Eps && inSegBox(p1, p2, p3)) ||
      (math.abs(d4) < Eps && inSegBox(p1, p2, p4))
  }

  /** Where two segments meet: Inside for a proper crossing or lengthwise
    * overlap, a single shared point otherwise, None when disjoint.
    */
  private def segmentMeet(a1: Pt, a2: Pt, b1: Pt, b2: Pt): Either[Rel, Pt] = {
    val d1 = orient(b1, b2, a1); val d2 = orient(b1, b2, a2)
    val d3 = orient(a1, a2, b1); val d4 = orient(a1, a2, b2)
    if (((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
        ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))) return Left(Inside)
    var found: Option[Pt] = None
    var second = false
    def add(c: Pt): Unit = found match {
      case None => found = Some(c)
      case Some(p) => if (p.distSq(c) >= EpsSq) second = true
    }
    if (math.abs(d1) < Eps && inSegBox(b1, b2, a1)) add(a1)
    if (math.abs(d2) < Eps && inSegBox(b1, b2, a2)) add(a2)
    if (math.abs(d3) < Eps && inSegBox(a1, a2, b1)) add(b1)
    if (math.abs(d4) < Eps && inSegBox(a1, a2, b2)) add(b2)
    found match {
      case None => Left(Outside)
      case Some(p) => if (second) Left(Inside) else Right(p)
    }
  }

  // ---------- point classification ----------

  private def pointInRing(p: Pt, ring: IndexedSeq[Pt]): Rel = {
    var inside = false
    var i = 0; var j = ring.length - 1
    while (i < ring.length) {
      val a = ring(j); val b = ring(i)
      if (segDistSq(p, a, b) < EpsSq) return Boundary
      if ((b.y > p.y) != (a.y > p.y) &&
          p.x < (a.x - b.x) * (p.y - b.y) / (a.y - b.y) + b.x) inside = !inside
      j = i; i += 1
    }
    if (inside) Inside else Outside
  }

  def pointInPolygon(p: Pt, rings: IndexedSeq[IndexedSeq[Pt]]): Rel =
    pointInRing(p, rings.head) match {
      case Outside  => Outside
      case Boundary => Boundary
      case Inside =>
        var i = 1
        while (i < rings.length) {
          pointInRing(p, rings(i)) match {
            case Inside   => return Outside // inside a hole
            case Boundary => return Boundary
            case Outside  =>
          }
          i += 1
        }
        Inside
    }

  private def pointOnLine(p: Pt, line: IndexedSeq[Pt]): Boolean =
    (0 until line.length - 1).exists(i => segDistSq(p, line(i), line(i + 1)) < EpsSq)

  /** Line endpoints are the line's boundary; everything else is interior. */
  private def pointLineRel(p: Pt, line: IndexedSeq[Pt]): Rel =
    if (p.distSq(line.head) < EpsSq || p.distSq(line.last) < EpsSq) Boundary
    else if (pointOnLine(p, line)) Inside
    else Outside

  // ---------- compound relations ----------

  private def mid(a: Pt, b: Pt): Pt = Pt((a.x + b.x) / 2, (a.y + b.y) / 2)

  private def segIntersectsRing(a: Pt, b: Pt, ring: IndexedSeq[Pt]): Boolean =
    (0 until ring.length - 1).exists(i => segmentsIntersect(a, b, ring(i), ring(i + 1)))

  private def linesIntersect(l1: IndexedSeq[Pt], l2: IndexedSeq[Pt]): Boolean =
    (0 until l1.length - 1).exists { i =>
      (0 until l2.length - 1).exists(j => segmentsIntersect(l1(i), l1(i + 1), l2(j), l2(j + 1)))
    }

  private def lineIntersectsPolygon(line: IndexedSeq[Pt], rings: IndexedSeq[IndexedSeq[Pt]]): Boolean =
    pointInPolygon(line.head, rings) != Outside ||
      (0 until line.length - 1).exists(i => rings.exists(r => segIntersectsRing(line(i), line(i + 1), r)))

  private def lineLineRel(l1: IndexedSeq[Pt], l2: IndexedSeq[Pt]): Rel = {
    var boundary = false
    var i = 0
    while (i < l1.length - 1) {
      var j = 0
      while (j < l2.length - 1) {
        segmentMeet(l1(i), l1(i + 1), l2(j), l2(j + 1)) match {
          case Left(Inside) => return Inside
          case Right(p) =>
            val endp1 = p.distSq(l1.head) < EpsSq || p.distSq(l1.last) < EpsSq
            val endp2 = p.distSq(l2.head) < EpsSq || p.distSq(l2.last) < EpsSq
            if (!endp1 && !endp2) return Inside
            boundary = true
          case _ =>
        }
        j += 1
      }
      i += 1
    }
    if (boundary) Boundary else Outside
  }

  private def linePolygonRel(line: IndexedSeq[Pt], rings: IndexedSeq[IndexedSeq[Pt]]): Rel = {
    var boundary = false
    def check(p: Pt): Boolean = pointInPolygon(p, rings) match {
      case Inside   => true
      case Boundary => boundary = true; false
      case Outside  => false
    }
    for (i <- 0 until line.length - 1) if (check(mid(line(i), line(i + 1)))) return Inside
    for (i <- 1 until line.length - 1) if (check(line(i))) return Inside
    if (check(line.head) || check(line.last)) return Inside
    if (!boundary) {
      val hit = (0 until line.length - 1).exists(i =>
        rings.exists(r => segIntersectsRing(line(i), line(i + 1), r)))
      if (hit) boundary = true
    }
    if (boundary) Boundary else Outside
  }

  private def polyPolyRel(r1: IndexedSeq[IndexedSeq[Pt]], r2: IndexedSeq[IndexedSeq[Pt]]): Rel = {
    var boundary = false
    def check(p: Pt, rings: IndexedSeq[IndexedSeq[Pt]]): Boolean = pointInPolygon(p, rings) match {
      case Inside   => true
      case Boundary => boundary = true; false
      case Outside  => false
    }
    val e1 = r1.head; val e2 = r2.head
    for (p <- e1) if (check(p, r2)) return Inside
    for (p <- e2) if (check(p, r1)) return Inside
    for (i <- 0 until e1.length - 1) if (check(mid(e1(i), e1(i + 1)), r2)) return Inside
    for (i <- 0 until e2.length - 1) if (check(mid(e2(i), e2(i + 1)), r1)) return Inside
    // NOTE deliberately NO interior probe beyond vertices + edge
    // midpoints: the reference's sampled-relation model
    // (spatial/operations.js polygonPolygonRelation) classifies
    // IDENTICAL rings as BOUNDARY — every sample lands on the other's
    // ring — so ST_TOUCHES(A, A) is TRUE there. An earlier round added
    // a centroid probe here that "fixed" this to the OGC answer
    // (interiors coincide ⇒ not touching) and silently diverged; the
    // seed-88013 spatial fuzz caught it. Reference behavior wins:
    // sampling parity by construction.
    if (!boundary) {
      val hit = (0 until e1.length - 1).exists { i =>
        (0 until e2.length - 1).exists(j => segmentsIntersect(e1(i), e1(i + 1), e2(j), e2(j + 1)))
      }
      if (hit) boundary = true
    }
    if (boundary) Boundary else Outside
  }

  private def polygonContainsLine(line: IndexedSeq[Pt], rings: IndexedSeq[IndexedSeq[Pt]]): Rel = {
    var res: Rel = Inside
    def fold(p: Pt): Boolean = pointInPolygon(p, rings) match {
      case Outside  => true
      case Boundary => res = Boundary; false
      case Inside   => false
    }
    for (p <- line) if (fold(p)) return Outside
    for (i <- 0 until line.length - 1) if (fold(mid(line(i), line(i + 1)))) return Outside
    res
  }

  private def polygonContainsPolygon(outer: IndexedSeq[IndexedSeq[Pt]],
                                     inner: IndexedSeq[IndexedSeq[Pt]]): Rel = {
    var res: Rel = Inside
    def fold(p: Pt): Boolean = pointInPolygon(p, outer) match {
      case Outside  => true
      case Boundary => res = Boundary; false
      case Inside   => false
    }
    val ring = inner.head
    for (p <- ring) if (fold(p)) return Outside
    for (i <- 0 until ring.length - 1) if (fold(mid(ring(i), ring(i + 1)))) return Outside
    res
  }

  // ---------- pairwise dispatch over simple parts ----------

  private def pairIntersects(a: Geom, b: Geom): Boolean = (a, b) match {
    case (Point(p), Point(q))                 => p.distSq(q) < EpsSq
    case (Point(p), LineString(l))            => pointOnLine(p, l)
    case (LineString(l), Point(p))            => pointOnLine(p, l)
    case (Point(p), Polygon(r))               => pointInPolygon(p, r) != Outside
    case (Polygon(r), Point(p))               => pointInPolygon(p, r) != Outside
    case (LineString(a1), LineString(b1))     => linesIntersect(a1, b1)
    case (LineString(l), Polygon(r))          => lineIntersectsPolygon(l, r)
    case (Polygon(r), LineString(l))          => lineIntersectsPolygon(l, r)
    case (Polygon(r1), Polygon(r2))           => polyPolyRel(r1, r2) != Outside
    case _                                    => false
  }

  /** How do a's and b's point sets meet: interiors, only boundaries, or not. */
  private def pairRelation(a: Geom, b: Geom): Rel = (a, b) match {
    case (Point(p), Point(q))             => if (p.distSq(q) < EpsSq) Inside else Outside
    case (Point(p), LineString(l))        => pointLineRel(p, l)
    case (LineString(l), Point(p))        => pointLineRel(p, l)
    case (Point(p), Polygon(r))           => pointInPolygon(p, r)
    case (Polygon(r), Point(p))           => pointInPolygon(p, r)
    case (LineString(x), LineString(y))   => lineLineRel(x, y)
    case (LineString(l), Polygon(r))      => linePolygonRel(l, r)
    case (Polygon(r), LineString(l))      => linePolygonRel(l, r)
    case (Polygon(x), Polygon(y))         => polyPolyRel(x, y)
    case _                                => Outside
  }

  /** Containment of b in a: Inside strictly interior, Boundary touching. */
  private def pairContainment(a: Geom, b: Geom): Rel = (a, b) match {
    case (Point(p), Point(q))           => if (p.distSq(q) < EpsSq) Boundary else Outside
    case (LineString(l), Point(p))      => pointLineRel(p, l)
    case (Polygon(r), Point(p))         => pointInPolygon(p, r)
    case (Polygon(r), LineString(l))    => polygonContainsLine(l, r)
    case (Polygon(x), Polygon(y))       => polygonContainsPolygon(x, y)
    case (LineString(x), LineString(y)) =>
      if (y.forall(p => pointOnLine(p, x))) Boundary else Outside
    case _                              => Outside
  }

  // ---------- simple-geometry equality ----------

  private def near(a: Pt, b: Pt): Boolean =
    math.abs(a.x - b.x) <= Eps && math.abs(a.y - b.y) <= Eps

  private def lineEqual(a: IndexedSeq[Pt], b: IndexedSeq[Pt]): Boolean =
    a.length == b.length &&
      (a.indices.forall(i => near(a(i), b(i))) ||
        a.indices.forall(i => near(a(i), b(a.length - 1 - i))))

  /** Rings equal under rotation and reversal. */
  private def ringsEqual(r1: IndexedSeq[Pt], r2: IndexedSeq[Pt]): Boolean = {
    if (r1.length != r2.length) return false
    val n = r1.length - 1
    def matches(idx: Int => Int): Boolean = (0 until n).forall(i => near(r1(i), r2(idx(i))))
    (0 until n).exists(off => matches(i => (i + off) % n)) ||
      (0 until n).exists(off => matches(i => (n - i + off) % n))
  }

  private def simpleEqual(a: Geom, b: Geom): Boolean = (a, b) match {
    case (Point(p), Point(q))           => p.distSq(q) < EpsSq
    case (LineString(x), LineString(y)) => lineEqual(x, y)
    case (Polygon(x), Polygon(y))       =>
      x.length == y.length && x.indices.forall(i => ringsEqual(x(i), y(i)))
    case _ => false
  }

  private def dimension(parts: IndexedSeq[Geom]): Int =
    parts.foldLeft(0) {
      case (_, Polygon(_))    => return 2
      case (d, LineString(_)) => math.max(d, 1)
      case (d, _)             => d
    }

  // ---------- public ST_* predicates over whole geometries ----------

  def intersects(ga: Geom, gb: Geom): Boolean = {
    val a = Geom.parts(ga); val b = Geom.parts(gb)
    a.exists(pa => b.exists(pb => pairIntersects(pa, pb)))
  }

  def contains(ga: Geom, gb: Geom): Boolean = {
    val a = Geom.parts(ga); val b = Geom.parts(gb)
    b.forall(pb => a.exists(pa => pairContainment(pa, pb) != Outside))
  }

  def containsProperly(ga: Geom, gb: Geom): Boolean = {
    val a = Geom.parts(ga); val b = Geom.parts(gb)
    b.forall(pb => a.exists(pa => pairContainment(pa, pb) == Inside))
  }

  def within(ga: Geom, gb: Geom): Boolean = contains(gb, ga)
  def covers(ga: Geom, gb: Geom): Boolean = contains(ga, gb)
  def coveredBy(ga: Geom, gb: Geom): Boolean = contains(gb, ga)

  def touches(ga: Geom, gb: Geom): Boolean = {
    val a = Geom.parts(ga); val b = Geom.parts(gb)
    var onlyBoundary = false
    for (pa <- a; pb <- b) pairRelation(pa, pb) match {
      case Inside   => return false
      case Boundary => onlyBoundary = true
      case Outside  =>
    }
    onlyBoundary
  }

  def geomEquals(ga: Geom, gb: Geom): Boolean = {
    val a = Geom.parts(ga); val b = Geom.parts(gb)
    if (a.length != b.length) return false
    val used = Array.fill(b.length)(false)
    a.forall { pa =>
      val i = b.indices.indexWhere(i => !used(i) && simpleEqual(pa, b(i)))
      if (i < 0) false else { used(i) = true; true }
    }
  }

  def overlaps(ga: Geom, gb: Geom): Boolean = {
    val a = Geom.parts(ga); val b = Geom.parts(gb)
    dimension(a) == dimension(b) &&
      intersects(ga, gb) && !geomEquals(ga, gb) &&
      !contains(ga, gb) && !contains(gb, ga)
  }

  def crosses(ga: Geom, gb: Geom): Boolean = {
    val a = Geom.parts(ga); val b = Geom.parts(gb)
    val dimA = dimension(a); val dimB = dimension(b)
    if (!intersects(ga, gb)) return false
    if (dimA == dimB && dimA != 1) return false
    if (dimA == 1 && dimB == 1)
      return !contains(ga, gb) && !contains(gb, ga) && !touches(ga, gb)
    // point vs higher-dim: some point strictly interior
    def pointSideCrosses(pts: IndexedSeq[Geom], other: IndexedSeq[Geom]): Boolean =
      pts.exists {
        case Point(p) => other.exists {
          case LineString(l) => pointLineRel(p, l) == Inside
          case Polygon(r)    => pointInPolygon(p, r) == Inside
          case _             => false
        }
        case _ => false
      }
    if (dimA == 0 && dimB >= 1) return pointSideCrosses(a, b)
    if (dimB == 0 && dimA >= 1) return pointSideCrosses(b, a)
    // line vs polygon: the reference's rule — they intersect (checked
    // above) and the polygon does not CONTAIN the line (reference:
    // src/spatial/spatial.js:323-326, "part of line is inside and part
    // is outside"). Deliberately more lenient than OGC (a boundary-only
    // touch counts); the differential spatial fuzz pinned five
    // integer-grid cases where the previous per-part interior test
    // disagreed with the reference.
    val (lineG, polyG) = if (dimA == 1) (ga, gb) else (gb, ga)
    !contains(polyG, lineG)
  }

  def dWithin(ga: Geom, gb: Geom, dist: Double): Boolean = {
    if (dist < 0) return false
    if (intersects(ga, gb)) return true
    val distSq = dist * dist
    def flatten(parts: IndexedSeq[Geom]): (IndexedSeq[Pt], IndexedSeq[(Pt, Pt)]) = {
      val pts = IndexedSeq.newBuilder[Pt]
      val segs = IndexedSeq.newBuilder[(Pt, Pt)]
      def addLine(cs: IndexedSeq[Pt]): Unit = {
        for (i <- 0 until cs.length - 1) segs += ((cs(i), cs(i + 1)))
        pts ++= cs
      }
      parts.foreach {
        case Point(p)      => pts += p
        case LineString(l) => addLine(l)
        case Polygon(rs)   => rs.foreach(addLine)
        case _             =>
      }
      (pts.result(), segs.result())
    }
    val (ptsA, segsA) = flatten(Geom.parts(ga))
    val (ptsB, segsB) = flatten(Geom.parts(gb))
    ptsA.exists(pa => ptsB.exists(pb => pa.distSq(pb) <= distSq)) ||
      ptsA.exists(p => segsB.exists { case (s, e) => segDistSq(p, s, e) <= distSq }) ||
      ptsB.exists(p => segsA.exists { case (s, e) => segDistSq(p, s, e) <= distSq })
  }
}
