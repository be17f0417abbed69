// Recording wrapper around the reference's tokenizeSql: every call from
// its own test suite (test/parse/tokenize.test.js) lands one
// {kind:'tokenize', query, tokens|error} entry. Tokens keep only the
// replay-relevant fields (type, value, positionStart, positionEnd) —
// numericValue can be a BigInt, which JSON.stringify rejects.
import * as real from '/root/reference/src/parse/tokenize.js'

const recs = (globalThis.__graftParseRecs ??= [])
function entry(extra) {
  return {
    file: globalThis.__graftCurrentFile,
    test: globalThis.__graftCurrentTest,
    ...extra,
  }
}

export function tokenizeSql(query) {
  try {
    const tokens = real.tokenizeSql(query)
    if (typeof query === 'string') {
      recs.push(entry({
        kind: 'tokenize',
        query,
        tokens: tokens.map(t => ({
          type: t.type,
          value: t.value,
          positionStart: t.positionStart,
          positionEnd: t.positionEnd,
        })),
      }))
    }
    return tokens
  } catch (e) {
    if (typeof query === 'string') {
      recs.push(entry({ kind: 'tokenize', query, error: String(e?.message ?? e) }))
    }
    throw e
  }
}
