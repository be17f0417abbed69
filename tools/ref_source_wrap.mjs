// Wrapper around the reference's dataSource module: memorySource
// additionally remembers its raw rows (non-enumerably) so the planSql
// recording wrapper can ship fixture tables to the Scala replay.
import * as real from '/root/reference/src/backend/dataSource.js'

export function memorySource(opts) {
  const src = real.memorySource(opts)
  Object.defineProperty(src, '__graftData', { value: opts?.data ?? null })
  return src
}

export const { asyncRow, cachedDataSource } = real
