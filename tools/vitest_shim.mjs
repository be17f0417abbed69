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

export const expect = makeNoop()

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
