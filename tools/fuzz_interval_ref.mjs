// Property-fuzz oracle for interval arithmetic: evaluate the reference's
// applyIntervalToDate (which includes its own toDate) over a batch of
// (raw, value, unit, op) cases and emit each result as UTC epoch millis
// (date-only string results parse to midnight), or null.
//
// Usage: node tools/fuzz_interval_ref.mjs <casesFile> <outFile>
//   casesFile: [ {raw, v, unit, op}, ... ]
//   outFile:   [ epochMillis | null, ... ]
import { readFileSync, writeFileSync } from 'fs'
import { applyIntervalToDate } from '/root/reference/src/expression/date.js'

const [casesFile, outFile] = process.argv.slice(2)
const cases = JSON.parse(readFileSync(casesFile))

// single step {raw, v, unit, op} or chain {raw, steps: [{v, unit, op}…]}:
// chains FOLD like the reference's evaluator — each step's string
// result (date-only or ISO) is the next step's input, so reformatting
// between steps is part of the oracle
const out = cases.map(({ raw, v, unit, op, steps }) => {
  let r = raw
  for (const s of steps ?? [{ v, unit, op }]) {
    r = applyIntervalToDate(r, s.v, s.unit, s.op)
    if (r == null) return null
  }
  const t = r instanceof Date ? r.getTime() : Date.parse(r)
  return Number.isFinite(t) ? t : null
})
writeFileSync(outFile, JSON.stringify(out))
console.error(`fuzz_interval_ref: ${cases.length} cases done`)
