// Replay-record the reference's PARSE-level test suites (the sibling of
// record_ref_suite.mjs, which covers test/execute): run every
// test/parse/*.test.js plus test/spatial/wkt.test.js under the vitest
// shim with parseSql / extractTables / parseWkt wrapped, so each call
// emits a recording:
//   {kind:'parse',  query, udf, error?}          — accepted/rejected corpus
//   {kind:'tables', query, tables}               — extractTables fixtures
//   {kind:'wkt',    wkt, geojson, round, error?} — WKT codec fixtures
// ParseReplaySpec then replays: accepted queries must parse through
// GraftSql.rewrite + Spark's parser, rejected ones must reject (pinned
// leniencies aside), tables fixtures must match GraftSql.tables, and
// WKT fixtures must round-trip through ST_GEOMFROMTEXT/ST_ASTEXT/
// ST_ASGEOJSON.
//
// Usage: node tools/record_ref_parse.mjs <outFile>
import { readdirSync, writeFileSync } from 'fs'
import { register } from 'node:module'
import { pathToFileURL } from 'node:url'

register('./parse_hooks.mjs', import.meta.url)

// make the shim invoke expect(() => ...) thunks — rejection fixtures
// only record when the thunk actually runs
globalThis.__graftInvokeExpectFns = true

process.on('unhandledRejection', () => {})

const outFile = process.argv[2] ?? '/tmp/ref_parse_corpus.json'
const parseDir = '/root/reference/test/parse'

const files = readdirSync(parseDir)
  .filter(f => f.endsWith('.test.js'))
  .sort()
  .map(f => `${parseDir}/${f}`)
files.push('/root/reference/test/spatial/wkt.test.js')
// the spatial INTERNAL suites — the reference's ground truth for its
// geometry predicates, replayed against graft's ST_ expressions
files.push('/root/reference/test/spatial/equality.test.js')
files.push('/root/reference/test/spatial/pointRelations.test.js')
files.push('/root/reference/test/spatial/segments.test.js')
// the plan suites — scan sets, with-tables validation, pushdown hints
for (const f of readdirSync('/root/reference/test/plan').sort()) {
  if (f.endsWith('.test.js')) files.push(`/root/reference/test/plan/${f}`)
}

const recs = (globalThis.__graftParseRecs ??= [])
const queue = (globalThis.__graftItQueue ??= [])

let testsRun = 0
let testsFailed = 0
for (const path of files) {
  globalThis.__graftCurrentFile = path.split('/').pop()
  await import(pathToFileURL(path).href)
  while (queue.length) {
    const { name, fn } = queue.shift()
    globalThis.__graftCurrentTest = name
    testsRun++
    try {
      await fn()
    } catch {
      // expected constantly: parse.errors tests THROW through the
      // wrapper by design; the recording is already taken
      testsFailed++
    }
  }
}

writeFileSync(outFile, JSON.stringify(recs))
const by = kind => recs.filter(r => r.kind === kind)
const parses = by('parse')
console.error(
  `record_ref_parse: files=${files.length} tests=${testsRun} bodyThrew=${testsFailed} ` +
  `recordings=${recs.length} (parse=${parses.length} [accepted=${parses.filter(p => !p.error).length} ` +
  `rejected=${parses.filter(p => p.error).length} udf=${parses.filter(p => p.udf).length}] ` +
  `tables=${by('tables').length} wkt=${by('wkt').length} plan=${by('plan').length} ` +
  `geo=${recs.filter(r => ['geomeq', 'pip', 'pol', 'plr', 'pdist', 'segint', 'segring'].includes(r.kind)).length})`)
