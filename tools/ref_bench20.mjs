// Run the shared 20-query head-to-head set (tools/h2h_queries.json) on
// the reference engine over the same sf0.1 rows graft reads as parquet.
// Usage: node tools/ref_bench20.mjs [queriesFile]
// Tables are pre-loaded in-memory JS arrays (the reference's native
// mode — no I/O inside the timed run). BEST of two runs per query (the
// reference gets the favorable figure). Output: one JSON line
// {name: {sec, rows}} on stdout; progress on stderr.
import { readFileSync } from 'fs'
import { collect, executeSql } from '/root/reference/src/index.js'

const qfile = process.argv[2] ?? new URL('./h2h_queries.json', import.meta.url).pathname
const queries = JSON.parse(readFileSync(qfile))

const t0 = Date.now()
const tables = {
  lineitem: JSON.parse(readFileSync('/tmp/refdata/lineitem.json')),
  orders: JSON.parse(readFileSync('/tmp/refdata/orders.json')),
  customer: JSON.parse(readFileSync('/tmp/refdata/customer.json')),
  nation: JSON.parse(readFileSync('/tmp/refdata/nation.json')),
}
console.error(`load: ${(Date.now() - t0) / 1000}s`)

const out = {}
for (const [name, query] of Object.entries(queries)) {
  try {
    let best = Infinity
    let rows = []
    for (let i = 0; i < 2; i++) {
      const t = Date.now()
      rows = await collect(executeSql({ tables, query }))
      best = Math.min(best, (Date.now() - t) / 1000)
    }
    out[name] = { sec: Math.round(best * 1000) / 1000, rows: rows.length }
  } catch (e) {
    out[name] = { sec: -1, error: String(e).slice(0, 160) }
  }
  console.error(`${name}: ${JSON.stringify(out[name])}`)
}
console.log(JSON.stringify(out))
