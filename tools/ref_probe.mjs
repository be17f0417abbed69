// One-shot probe of the reference engine: run a single query over
// inline JSON tables and print the collected rows (or the thrown
// error) as one JSON line. Used by ReplayResidualSpec to pin, against
// the LIVE reference, the residual replay-classifier cases — so each
// pin's claim about reference behavior is re-verified at test time
// rather than asserted from memory.
//
// Usage: node tools/ref_probe.mjs '{"tables":{...},"query":"SELECT ..."}'
import { collect, executeSql } from '/root/reference/src/index.js'

const { tables, query } = JSON.parse(process.argv[2])
try {
  const rows = await collect(executeSql({ tables, query }))
  // JSON.stringify drops NaN/Infinity to null — tag them first so the
  // JVM side can assert on them faithfully
  const tagged = rows.map(r => Object.fromEntries(Object.entries(r).map(
    ([k, v]) => [k, typeof v === 'number' && !Number.isFinite(v) ? String(v) : v])))
  console.log(JSON.stringify({ rows: tagged }))
} catch (e) {
  console.log(JSON.stringify({ error: String(e?.message ?? e) }))
}
