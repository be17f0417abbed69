// Recording wrapper around the reference's parseSql: every call from
// its own test suite lands one {kind:'parse', query, error?} entry.
// Queries parsed with a UDF registry are flagged (the parse outcome
// depends on state GraftSql does not model at parse level).
import * as real from '/root/reference/src/parse/parse.js'

const recs = (globalThis.__graftParseRecs ??= [])
function entry(extra) {
  return {
    file: globalThis.__graftCurrentFile,
    test: globalThis.__graftCurrentTest,
    ...extra,
  }
}

export function parseSql(opts) {
  const query = opts?.query
  globalThis.__graftLastParse = query
  const udf = !!(opts && opts.functions && Object.keys(opts.functions).length > 0)
  try {
    const ast = real.parseSql(opts)
    if (typeof query === 'string') {
      recs.push(entry({ kind: 'parse', query, udf }))
    }
    return ast
  } catch (e) {
    if (typeof query === 'string') {
      recs.push(entry({ kind: 'parse', query, udf, error: String(e?.message ?? e) }))
    }
    throw e
  }
}

export const {
  parseStatement,
  isTableFunctionStart,
  parseFromFunction,
  tableFunctionDefaultColumns,
} = real
