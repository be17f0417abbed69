// Replay-record the reference's OWN test suite: run every
// test/execute/*.test.js under a vitest shim with the engine wrapped so
// each collect(executeSql({tables, query})) emits a (tables, query, rows)
// triple. The output corpus is then executed differentially on
// GraftSql-on-Spark by SuiteReplaySpec — the reference's hand-written
// production-failure corpus, replayed completely rather than sampled.
//
// Usage: node tools/record_ref_suite.mjs <outFile>
import { readdirSync, writeFileSync } from 'fs'
import { register } from 'node:module'
import { pathToFileURL } from 'node:url'

register('./suite_hooks.mjs', import.meta.url)

// `await expect(collect(...)).rejects...` leaves a real rejected promise
// unhandled under the no-op expect shim; that is fine here.
process.on('unhandledRejection', () => {})

const outFile = process.argv[2] ?? '/tmp/ref_suite_corpus.json'
const testDir = '/root/reference/test/execute'

const files = readdirSync(testDir).filter(f => f.endsWith('.test.js')).sort()
const recordings = (globalThis.__graftRecordings ??= [])
const queue = (globalThis.__graftItQueue ??= [])

let testsRun = 0
let testsFailed = 0
for (const f of files) {
  globalThis.__graftCurrentFile = f
  await import(pathToFileURL(`${testDir}/${f}`).href)
  // drain this file's it() queue sequentially
  while (queue.length) {
    const { name, fn } = queue.shift()
    globalThis.__graftCurrentTest = name
    testsRun++
    try {
      await fn()
    } catch {
      // the body threw past our collect wrapper (e.g. non-engine setup
      // errors); any engine calls made before the throw are recorded
      testsFailed++
    }
  }
}

writeFileSync(outFile, JSON.stringify(recordings))
const skips = recordings.filter(r => r.skip).length
const errs = recordings.filter(r => r.error).length
console.error(
  `record_ref_suite: files=${files.length} tests=${testsRun} bodyThrew=${testsFailed} ` +
  `recordings=${recordings.length} (skip=${skips} error=${errs} ` +
  `replayable=${recordings.length - skips - errs})`)
