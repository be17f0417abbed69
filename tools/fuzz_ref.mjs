// Differential-fuzz oracle runner: execute a batch of dialect queries on
// the REFERENCE engine (squirreling) over JSON tables, emit results.
//
// Usage: node tools/fuzz_ref.mjs <tablesFile> <queriesFile> <outFile>
//   tablesFile:  {"name": [row, ...], ...}
//   queriesFile: ["SELECT ...", ...]
//   outFile:     [{"rows": [row, ...]} | {"error": "..."}]
import { readFileSync, writeFileSync } from 'fs'
import { collect, executeSql } from '/root/reference/src/index.js'

const [tablesFile, queriesFile, outFile] = process.argv.slice(2)
const tables = JSON.parse(readFileSync(tablesFile))
const queries = JSON.parse(readFileSync(queriesFile))

const out = []
for (const query of queries) {
  try {
    const rows = await collect(executeSql({ tables, query }))
    out.push({ rows })
  } catch (e) {
    out.push({ error: String(e && e.message ? e.message : e).slice(0, 300) })
  }
}
// some reference code paths yield BigInt values; compare them as numbers
writeFileSync(outFile, JSON.stringify(out,
  (k, v) => typeof v === 'bigint' ? Number(v) : v))
console.error(`fuzz_ref: ${queries.length} queries done`)
