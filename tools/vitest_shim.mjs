// Minimal vitest shim for replaying the reference's own test suite as a
// recording pass (see record_ref_suite.mjs). The reference's execute tests
// import exactly { describe, expect, it } (verified by grep). Assertions
// are NOT evaluated — the point is to let each test body RUN so the
// wrapped engine (ref_index_wrap.mjs) records every (tables, query, rows)
// triple the suite produces.
function makeNoop() {
  const fn = function () { return proxy }
  const proxy = new Proxy(fn, {
    get(_t, p) {
      // `await expect(...)` must not treat the proxy as a thenable
      if (p === 'then') return undefined
      if (p === Symbol.toPrimitive) return () => ''
      if (p === Symbol.iterator) return function* () {}
      return proxy
    },
    apply() { return proxy },
  })
  return proxy
}

const noopExpect = makeNoop()

// Under record_ref_parse.mjs (flag below), a function passed to
// expect() IS invoked — `expect(() => parseSql(bad)).toThrow(...)` only
// reaches the recording wrapper if the thunk runs. The execute-suite
// recorder leaves the flag unset so its corpus (and SuiteReplaySpec's
// pinned counts) are unchanged.
export function expect(arg) {
  if (globalThis.__graftInvokeExpectFns && typeof arg === 'function') {
    try { arg() } catch { /* the recording is already taken */ }
  }
  return noopExpect
}
expect.any = () => noopExpect
expect.anything = () => noopExpect
expect.arrayContaining = () => noopExpect
expect.objectContaining = () => noopExpect
expect.stringContaining = () => noopExpect
expect.stringMatching = () => noopExpect

// describe registers synchronously; its body runs inline so nested it()
// calls land on the global queue in source order.
export function describe(_name, fn) {
  if (typeof fn === 'function') fn()
}
describe.skip = () => {}
describe.only = describe

const queue = (globalThis.__graftItQueue ??= [])
export function it(name, fn) {
  if (typeof fn === 'function') queue.push({ name, fn })
}
it.skip = () => {}
it.only = it
it.todo = () => {}
export const test = it

export const beforeEach = () => {}
export const afterEach = () => {}
export const beforeAll = () => {}
export const afterAll = () => {}
export const vi = makeNoop()
