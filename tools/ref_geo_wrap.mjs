// Recording wrapper around the reference's spatial INTERNALS
// (equality.js / pointRelations.js / segments.js): their unit tests are
// the reference's ground truth for geometry predicates, so each direct
// test call records a fixture replayed against graft's ST_ expression
// surface (st_equals / st_containsproperly / st_touches /
// st_intersects / st_dwithin). One wrap file serves all three modules —
// the hooks route each specifier here, and every module's exports are
// re-exported below.
import * as eq from '/root/reference/src/spatial/equality.js'
import * as pr from '/root/reference/src/spatial/pointRelations.js'
import * as seg from '/root/reference/src/spatial/segments.js'
import { geomToWkt } from '/root/reference/src/spatial/wkt.js'

const recs = (globalThis.__graftParseRecs ??= [])
function entry(extra) {
  return {
    file: globalThis.__graftCurrentFile,
    test: globalThis.__graftCurrentTest,
    ...extra,
  }
}

const num = n => String(n)
const ptWkt = p => `POINT (${num(p[0])} ${num(p[1])})`
const coords = cs => cs.map(c => `${num(c[0])} ${num(c[1])}`).join(', ')
const lineWkt = cs => `LINESTRING (${coords(cs)})`
const polyWkt = rings => `POLYGON (${rings.map(r => `(${coords(r)})`).join(', ')})`
const segWkt = (a, b) => lineWkt([a, b])

export function geometryEqual(a, b) {
  const out = eq.geometryEqual(a, b)
  try {
    recs.push(entry({ kind: 'geomeq', a: geomToWkt(a), b: geomToWkt(b), eq: out }))
  } catch { /* unserializable fixture — skip */ }
  return out
}

export function pointInPolygon(point, rings) {
  const out = pr.pointInPolygon(point, rings)
  recs.push(entry({ kind: 'pip', pt: ptWkt(point), poly: polyWkt(rings), rel: out }))
  return out
}

export function pointOnLine(point, line) {
  const out = pr.pointOnLine(point, line)
  recs.push(entry({ kind: 'pol', pt: ptWkt(point), line: lineWkt(line), on: out }))
  return out
}

export function pointLineRelation(point, line) {
  const out = pr.pointLineRelation(point, line)
  recs.push(entry({ kind: 'plr', pt: ptWkt(point), line: lineWkt(line), rel: out }))
  return out
}

export function pointToSegmentDistSq(p, a, b) {
  const out = pr.pointToSegmentDistSq(p, a, b)
  recs.push(entry({ kind: 'pdist', pt: ptWkt(p), seg: segWkt(a, b), d2: out }))
  return out
}

export function segmentsIntersect(p1, p2, p3, p4) {
  const out = seg.segmentsIntersect(p1, p2, p3, p4)
  recs.push(entry({ kind: 'segint', a: segWkt(p1, p2), b: segWkt(p3, p4), hit: out }))
  return out
}

export function segmentIntersectsRing(a, b, ring) {
  const out = seg.segmentIntersectsRing(a, b, ring)
  recs.push(entry({ kind: 'segring', a: segWkt(a, b), b: lineWkt(ring), hit: out }))
  return out
}

// pass-throughs with no clean ST_ analog (they return coordinates, not
// predicates) — not recorded
export const segmentIntersectionPoint = seg.segmentIntersectionPoint
export const segmentTouchPoint = seg.segmentTouchPoint
export const pointOnSegment = seg.pointOnSegment
