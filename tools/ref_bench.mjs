// Benchmark the reference engine (squirreling) on the same sf0.1 rows.
import { readFileSync } from 'fs'
import { collect, executeSql } from '/root/reference/src/index.js'

const t0 = Date.now()
const lineitem = JSON.parse(readFileSync('/tmp/refdata/lineitem.json'))
const orders = JSON.parse(readFileSync('/tmp/refdata/orders.json'))
const customer = JSON.parse(readFileSync('/tmp/refdata/customer.json'))
console.error(`load: ${(Date.now() - t0) / 1000}s`)

const queries = {
  b_agg: `SELECT l_returnflag, l_linestatus,
      SUM(l_quantity) AS sum_qty, SUM(l_extendedprice) AS sum_base,
      AVG(l_quantity) AS avg_qty, COUNT(*) AS n
    FROM lineitem WHERE l_shipdate <= '1998-09-02'
    GROUP BY l_returnflag, l_linestatus`,
  b_filter: `SELECT l_returnflag, l_quantity FROM lineitem
    WHERE l_quantity > 45 AND l_discount < 0.05`,
  b_topk: `SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC LIMIT 10`,
  b_join: `SELECT c.c_mktsegment, COUNT(*) AS n, SUM(o.o_totalprice) AS total
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment`,
  b_window: `SELECT o_orderkey, ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS rn
    FROM orders`,
}

const out = {}
for (const [name, query] of Object.entries(queries)) {
  const t = Date.now()
  try {
    const rows = await collect(executeSql({ tables: { lineitem, orders, customer }, query }))
    out[name] = { sec: (Date.now() - t) / 1000, rows: rows.length }
  } catch (e) {
    out[name] = { sec: -1, error: String(e).slice(0, 120) }
  }
  console.error(`${name}: ${JSON.stringify(out[name])}`)
}
console.log(JSON.stringify(out))
