// Replay-record the reference's TOKENIZER test suite
// (test/parse/tokenize.test.js — the one parse-level file
// record_ref_parse.mjs's parseSql wrapping does not see): run it under
// the vitest shim with tokenizeSql wrapped, emitting one
// {kind:'tokenize', query, tokens|error} entry per call.
// TokenizeReplaySpec then replays every fixture against SqlTok.
//
// Usage: node tools/record_ref_tokenize.mjs <outFile>
import { writeFileSync } from 'fs'
import { register } from 'node:module'
import { pathToFileURL } from 'node:url'

register('./parse_hooks.mjs', import.meta.url)

// make the shim invoke expect(() => ...) thunks — rejection fixtures
// only record when the thunk actually runs
globalThis.__graftInvokeExpectFns = true

process.on('unhandledRejection', () => {})

const outFile = process.argv[2] ?? '/tmp/ref_tokenize_corpus.json'
const file = '/root/reference/test/parse/tokenize.test.js'

const recs = (globalThis.__graftParseRecs ??= [])
const queue = (globalThis.__graftItQueue ??= [])

let testsRun = 0
let testsFailed = 0
globalThis.__graftCurrentFile = file.split('/').pop()
await import(pathToFileURL(file).href)
while (queue.length) {
  const { name, fn } = queue.shift()
  globalThis.__graftCurrentTest = name
  testsRun++
  try {
    await fn()
  } catch {
    // expected: rejection fixtures THROW through the wrapper by
    // design; the recording is already taken
    testsFailed++
  }
}

writeFileSync(outFile, JSON.stringify(recs))
const toks = recs.filter(r => r.kind === 'tokenize')
console.error(
  `record_ref_tokenize: tests=${testsRun} bodyThrew=${testsFailed} ` +
  `recordings=${toks.length} (accepted=${toks.filter(t => !t.error).length} ` +
  `rejected=${toks.filter(t => t.error).length})`)
