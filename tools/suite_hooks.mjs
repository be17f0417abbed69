// Module-resolution hooks for record_ref_suite.mjs:
//  - 'vitest' (not installed here) resolves to the local shim
//  - the reference test files' '../../src/index.js' resolves to the
//    recording wrapper; the wrapper itself (parent outside the reference
//    test tree) still reaches the real module.
import { pathToFileURL } from 'node:url'

const SHIM = pathToFileURL('/root/repo/tools/vitest_shim.mjs').href
const WRAP = pathToFileURL('/root/repo/tools/ref_index_wrap.mjs').href

export function resolve(specifier, context, nextResolve) {
  if (specifier === 'vitest') {
    return { url: SHIM, shortCircuit: true }
  }
  const fromRefTest = context.parentURL?.includes('/root/reference/test/')
  if (fromRefTest && specifier.endsWith('/src/index.js')) {
    return { url: WRAP, shortCircuit: true }
  }
  return nextResolve(specifier, context)
}
