// Module-resolution hooks for record_ref_parse.mjs (the parse-level
// sibling of suite_hooks.mjs): 'vitest' resolves to the local shim; the
// reference test tree's imports of parse.js / extractTables.js / wkt.js
// resolve to recording wrappers (which reach the real modules by
// absolute URL, so no recursion).
import { pathToFileURL } from 'node:url'

const SHIM = pathToFileURL('/root/repo/tools/vitest_shim.mjs').href
const PARSE = pathToFileURL('/root/repo/tools/ref_parse_wrap.mjs').href
const TABLES = pathToFileURL('/root/repo/tools/ref_tables_wrap.mjs').href
const WKT = pathToFileURL('/root/repo/tools/ref_wkt_wrap.mjs').href
const GEO = pathToFileURL('/root/repo/tools/ref_geo_wrap.mjs').href
const PLAN = pathToFileURL('/root/repo/tools/ref_plan_wrap.mjs').href
const SOURCE = pathToFileURL('/root/repo/tools/ref_source_wrap.mjs').href
const TOKENIZE = pathToFileURL('/root/repo/tools/ref_tokenize_wrap.mjs').href

export function resolve(specifier, context, nextResolve) {
  if (specifier === 'vitest') {
    return { url: SHIM, shortCircuit: true }
  }
  const fromRefTest = context.parentURL?.includes('/root/reference/test/')
  if (fromRefTest && specifier.endsWith('/parse/parse.js')) {
    return { url: PARSE, shortCircuit: true }
  }
  if (fromRefTest && specifier.endsWith('/parse/extractTables.js')) {
    return { url: TABLES, shortCircuit: true }
  }
  if (fromRefTest && specifier.endsWith('/parse/tokenize.js')) {
    return { url: TOKENIZE, shortCircuit: true }
  }
  if (fromRefTest && specifier.endsWith('/spatial/wkt.js')) {
    return { url: WKT, shortCircuit: true }
  }
  if (fromRefTest && specifier.endsWith('/plan/plan.js')) {
    return { url: PLAN, shortCircuit: true }
  }
  if (fromRefTest && specifier.endsWith('/backend/dataSource.js')) {
    return { url: SOURCE, shortCircuit: true }
  }
  if (fromRefTest && (specifier.endsWith('/spatial/equality.js') ||
      specifier.endsWith('/spatial/pointRelations.js') ||
      specifier.endsWith('/spatial/segments.js'))) {
    return { url: GEO, shortCircuit: true }
  }
  return nextResolve(specifier, context)
}
