// Recording wrapper around the reference's extractTables: pairs each
// call with the most recent parseSql query (every test composes
// extractTables(parseSql({query}))).
import * as real from '/root/reference/src/parse/extractTables.js'

const recs = (globalThis.__graftParseRecs ??= [])

export function extractTables(statement) {
  const out = real.extractTables(statement)
  recs.push({
    kind: 'tables',
    file: globalThis.__graftCurrentFile,
    test: globalThis.__graftCurrentTest,
    query: globalThis.__graftLastParse,
    tables: out,
  })
  return out
}
