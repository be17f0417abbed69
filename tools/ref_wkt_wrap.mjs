// Recording wrapper around the reference's WKT codec: each parseWkt
// fixture records the parsed GeoJSON and the reference's own
// re-serialization (geomToWkt round trip) for Spark-side comparison
// via ST_GEOMFROMTEXT / ST_ASTEXT / ST_ASGEOJSON.
import * as real from '/root/reference/src/spatial/wkt.js'

const recs = (globalThis.__graftParseRecs ??= [])
function entry(extra) {
  return {
    file: globalThis.__graftCurrentFile,
    test: globalThis.__graftCurrentTest,
    ...extra,
  }
}

export function parseWkt(wkt) {
  try {
    const g = real.parseWkt(wkt)
    let round = null
    try { round = real.geomToWkt(g) } catch { /* recorded as null */ }
    if (typeof wkt === 'string') {
      recs.push(entry({ kind: 'wkt', wkt, geojson: g, round }))
    }
    return g
  } catch (e) {
    if (typeof wkt === 'string') {
      recs.push(entry({ kind: 'wkt', wkt, error: String(e?.message ?? e) }))
    }
    throw e
  }
}

export const geomToWkt = real.geomToWkt
