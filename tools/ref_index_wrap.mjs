// Recording wrapper around the reference engine's public surface.
// Re-exports everything; executeSql tags its result with the call's
// (tables, query) and collect records the materialized rows (or the
// thrown error) to globalThis.__graftRecordings. Entries the replay
// cannot reproduce faithfully are recorded with a `skip` reason instead:
//  - parsed-query: query passed as an AST, not SQL text
//  - udfs: caller-supplied JS functions
//  - non-array-table: custom AsyncDataSource (chunking/abort/scan tests)
//  - unserializable-table: rows JSON round-trip loses information
import * as real from '/root/reference/src/index.js'

export {
  executePlan, extractTables, parseSql, planSql, tokenizeSql,
  asyncRow, cachedDataSource, derivedAlias,
} from '/root/reference/src/index.js'

const recordings = (globalThis.__graftRecordings ??= [])
const meta = new WeakMap()

// JSON round-trip that surfaces what it cannot keep: functions/symbols
// are unserializable; Dates become ISO strings (flagged — a Date object
// and its ISO string behave differently in the reference's evaluator).
function snapshotTables(tables) {
  let hasDates = false
  const out = {}
  for (const [name, data] of Object.entries(tables)) {
    if (!Array.isArray(data)) return { skip: 'non-array-table' }
    for (const row of data) {
      if (row === null || typeof row !== 'object') return { skip: 'unserializable-table' }
      for (const v of Object.values(row)) {
        if (typeof v === 'function' || typeof v === 'symbol') return { skip: 'unserializable-table' }
        if (v instanceof Date) hasDates = true
      }
    }
    out[name] = JSON.parse(JSON.stringify(data, (_k, v) => typeof v === 'bigint' ? Number(v) : v))
  }
  return { tables: out, hasDates }
}

function baseEntry(opts) {
  const file = globalThis.__graftCurrentFile ?? 'unknown'
  const testName = globalThis.__graftCurrentTest ?? 'unknown'
  if (typeof opts.query !== 'string') return { file, testName, skip: 'parsed-query' }
  if (opts.functions) return { file, testName, query: opts.query, skip: 'udfs' }
  const snap = snapshotTables(opts.tables ?? {})
  if (snap.skip) return { file, testName, query: opts.query, skip: snap.skip }
  return { file, testName, query: opts.query, tables: snap.tables, hasDates: snap.hasDates }
}

export function executeSql(opts) {
  const res = real.executeSql(opts)
  try { meta.set(res, opts) } catch { /* primitives can't be keys */ }
  return res
}

export async function collect(results) {
  const opts = meta.get(results)
  if (!opts) return real.collect(results)
  const entry = baseEntry(opts)
  try {
    const rows = await real.collect(results)
    if (!entry.skip) {
      entry.rows = JSON.parse(JSON.stringify(rows, (_k, v) => typeof v === 'bigint' ? Number(v) : v))
    }
    recordings.push(entry)
    return rows
  } catch (e) {
    entry.error = String(e && e.message ? e.message : e).slice(0, 300)
    delete entry.rows
    recordings.push(entry)
    // rethrow so `expect(...).rejects` tests still see the failure shape
    throw e
  }
}
