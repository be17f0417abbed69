// Recording wrapper around the reference's planSql (test/plan/*): each
// call records the query, the Scan nodes of the RESULT plan (table name
// + pushed column/limit hints — the reference's pushdown evidence), the
// fixture tables when provided (columns + rows, so graft can rebuild
// them as temp views), and the error when planning throws.
// ParseReplaySpec replays: scan sets must match GraftSql.tables,
// with-tables accept/reject must match validate, and the columns the
// reference pushes into a Scan must match what Catalyst prunes to.
import * as real from '/root/reference/src/plan/plan.js'

const recs = (globalThis.__graftParseRecs ??= [])

function scansOf(plan) {
  const out = []
  const seen = new Set()
  const walk = n => {
    if (n == null || typeof n !== 'object' || seen.has(n)) return
    seen.add(n)
    if (Array.isArray(n)) { n.forEach(walk); return }
    if (n.type === 'Scan' && typeof n.table === 'string') {
      out.push({
        table: n.table,
        columns: n.hints?.columns ?? null,
        limit: n.hints?.limit ?? null,
      })
    }
    Object.values(n).forEach(walk)
  }
  walk(plan)
  return out
}

function tablesOf(tables) {
  if (!tables) return null
  const out = {}
  for (const [name, src] of Object.entries(tables)) {
    out[name] = { columns: src?.columns ?? null, data: src?.__graftData ?? null }
  }
  return out
}

export function planSql(opts) {
  const query = opts?.query
  const rec = {
    kind: 'plan',
    file: globalThis.__graftCurrentFile,
    test: globalThis.__graftCurrentTest,
    query: typeof query === 'string' ? query : null,
    tbls: tablesOf(opts?.tables),
  }
  try {
    const plan = real.planSql(opts)
    if (rec.query != null) recs.push({ ...rec, scans: scansOf(plan) })
    return plan
  } catch (e) {
    if (rec.query != null) recs.push({ ...rec, error: String(e?.message ?? e) })
    throw e
  }
}

export const { planStatement } = real
