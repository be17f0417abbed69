package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** The classic TPC-H decision-support shapes (Q3 shipping priority, Q5
  * local-supplier volume, Q10 returned items) end-to-end on the bundled
  * tables — the canonical multi-join + aggregate + top-k workloads every
  * warehouse engine is judged on, here as whole named queries rather
  * than the per-operator shapes CoreQueries exercises.
  *
  * Cross-engine money arithmetic: revenue terms round
  * `l_extendedprice · (1 - l_discount)` to exact CENTS per row
  * (identical IEEE products on both engines), sum in DECIMAL(38,0)
  * (associative, partial-agg-order-proof), and cast once to DOUBLE at
  * the end — the SURVEY §5 exact-decimal-sum pattern.
  *
  * Scale shapes (100 TB): the lineitem⋈orders fact-fact join shuffles
  * on the order key ONCE; nation/region (25/5 rows) broadcast
  * explicitly; customer/supplier sides are left to AQE, which
  * broadcasts them at test scale and shuffle-joins (with skew
  * splitting) beyond the threshold. Every filter is pushed into the
  * parquet scan; top-k heads plan as TakeOrderedAndProject, never a
  * global sort.
  */
object TpchQueries {

  /** Per-row revenue in exact cents. The same text runs on both engines. */
  private val revC =
    "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS DECIMAL(38,0))"

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  val all: Seq[QueryDef] = Seq(

    // ---- Q3: shipping priority (unshipped high-value orders) ------------
    QueryDef("q_tpch_q3",
      s"""SELECT l_orderkey, o_orderdate, CAST(sum($revC) AS DOUBLE) AS revenue_c
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue_c DESC, l_orderkey LIMIT 10""".stripMargin) {
      (s, dir) => {
        val c = t(s, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") < expr("TIMESTAMP '1998-03-15 00:00:00'"))
          .select("o_orderkey", "o_custkey", "o_orderdate")
        val l = t(s, dir, "lineitem")
          .filter(col("l_shipdate") > expr("TIMESTAMP '1998-03-15 00:00:00'"))
          .selectExpr("l_orderkey", s"$revC AS rev")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .groupBy("l_orderkey", "o_orderdate")
          .agg(expr("CAST(sum(rev) AS DOUBLE)").as("revenue_c"))
          .orderBy(col("revenue_c").desc, col("l_orderkey"))
          .limit(10)
      }
    },

    // ---- Q5: local-supplier volume per nation ---------------------------
    QueryDef("q_tpch_q5",
      s"""SELECT n_name, CAST(sum($revC) AS DOUBLE) AS revenue_c
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY n_name ORDER BY revenue_c DESC, n_name""".stripMargin) {
      (s, dir) => {
        // nation⋈region pre-reduces to the ≤5-row ASIA nation dim; the
        // dim pre-prunes BOTH fact inputs via broadcast joins BEFORE
        // the one fact-fact shuffle, so the l⋈o orderkey exchange
        // carries only ASIA-supplier lineitem rows (~1/5 of the table
        // at uniform nation spread) and the custkey exchange only
        // ASIA customers — r15 scratch experiment, both shapes
        // measured at sf100 (SCRATCH_SF100 q5 row)
        val n = broadcast(
          t(s, dir, "nation").join(
              t(s, dir, "region").filter(col("r_name") === "ASIA"),
              col("n_regionkey") === col("r_regionkey"))
            .select("n_nationkey", "n_name"))
        // ASIA suppliers: ≤ supplier/5 rows of two ints — broadcastable
        // at any SF where supplier itself fits an executor (sf100: 200k
        // rows ≈ 3 MB); prunes lineitem DURING its scan-side join
        val suA = broadcast(
          t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
            .join(n.select("n_nationkey"),
              col("s_nationkey") === col("n_nationkey"))
            .select("s_suppkey", "s_nationkey"))
        val cA = t(s, dir, "customer").select("c_custkey", "c_nationkey")
          .join(broadcast(n.select(col("n_nationkey").as("cn_key"))),
            col("c_nationkey") === col("cn_key"))
          .select("c_custkey", "c_nationkey")
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") >= expr("TIMESTAMP '1996-01-01 00:00:00'") &&
            col("o_orderdate") < expr("TIMESTAMP '1997-01-01 00:00:00'"))
          .select("o_orderkey", "o_custkey")
        // narrow early: only (orderkey, nationkey, rev) ride the
        // shuffles; n_name joins back over the 5-row dim at the end
        val l = t(s, dir, "lineitem")
          .selectExpr("l_orderkey", "l_suppkey", s"$revC AS rev")
          .join(suA, col("l_suppkey") === col("s_suppkey"))
          .select(col("l_orderkey"), col("s_nationkey"), col("rev"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(cA, col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .groupBy("s_nationkey")
          .agg(expr("CAST(sum(rev) AS DOUBLE)").as("revenue_c"))
          .join(n, col("s_nationkey") === col("n_nationkey"))
          .select("n_name", "revenue_c")
          .orderBy(col("revenue_c").desc, col("n_name"))
      }
    },

    // ---- Q10: returned-item reporting (top 20 lossy customers) ----------
    QueryDef("q_tpch_q10",
      s"""SELECT c_custkey, c_name, CAST(sum($revC) AS DOUBLE) AS revenue_c,
         |  c_acctbal, n_name
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |ORDER BY revenue_c DESC, c_custkey LIMIT 20""".stripMargin) {
      (s, dir) => {
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") >= expr("TIMESTAMP '1997-10-01 00:00:00'") &&
            col("o_orderdate") < expr("TIMESTAMP '1998-01-01 00:00:00'"))
          .select("o_orderkey", "o_custkey")
        val l = t(s, dir, "lineitem")
          .filter(col("l_returnflag") === "R")
          .selectExpr("l_orderkey", s"$revC AS rev")
        val c = t(s, dir, "customer")
          .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
        val n = broadcast(t(s, dir, "nation").select("n_nationkey", "n_name"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(n, col("c_nationkey") === col("n_nationkey"))
          .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
          .agg(expr("CAST(sum(rev) AS DOUBLE)").as("revenue_c"))
          .select("c_custkey", "c_name", "revenue_c", "c_acctbal", "n_name")
          .orderBy(col("revenue_c").desc, col("c_custkey"))
          .limit(20)
      }
    },

    // ---- Q1: pricing summary report (the canonical wide aggregate) ------
    // All money terms are exact cents (per-row IEEE product + round,
    // identical on both engines; sums in DECIMAL). Averages are ONE
    // division of two exact numbers at the end — unrounded, since the
    // same IEEE division of the same inputs is bit-identical anywhere.
    QueryDef("q_tpch_q1",
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(sum(CAST(round(l_quantity * 100) AS DECIMAL(38,0))) AS BIGINT) AS sum_qty_c,
         |  CAST(sum(CAST(round(l_extendedprice * 100) AS DECIMAL(38,0))) AS BIGINT) AS sum_base_c,
         |  CAST(sum($revC) AS BIGINT) AS sum_disc_c,
         |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS DECIMAL(38,0))) AS BIGINT) AS sum_charge_c,
         |  CAST(sum(CAST(round(l_quantity * 100) AS DECIMAL(38,0))) AS DOUBLE) / count(*) AS avg_qty_c,
         |  CAST(sum(CAST(round(l_extendedprice * 100) AS DECIMAL(38,0))) AS DOUBLE) / count(*) AS avg_price_c,
         |  CAST(count(*) AS BIGINT) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin) {
      (s, dir) =>
        // one scan, one map-side-combining aggregate over ≤ 6 groups —
        // the plan every columnar engine benches Q1 on
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") <= expr("TIMESTAMP '1998-09-02 00:00:00'"))
          .selectExpr("l_returnflag", "l_linestatus",
            "CAST(round(l_quantity * 100) AS DECIMAL(38,0)) AS qty_c",
            "CAST(round(l_extendedprice * 100) AS DECIMAL(38,0)) AS base_c",
            s"$revC AS disc_c",
            "CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS DECIMAL(38,0)) AS charge_c")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            expr("CAST(sum(qty_c) AS BIGINT)").as("sum_qty_c"),
            expr("CAST(sum(base_c) AS BIGINT)").as("sum_base_c"),
            expr("CAST(sum(disc_c) AS BIGINT)").as("sum_disc_c"),
            expr("CAST(sum(charge_c) AS BIGINT)").as("sum_charge_c"),
            expr("CAST(sum(qty_c) AS DOUBLE) / count(*)").as("avg_qty_c"),
            expr("CAST(sum(base_c) AS DOUBLE) / count(*)").as("avg_price_c"),
            expr("CAST(count(*) AS BIGINT)").as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
    },

    // ---- Q4: order priority checking (EXISTS semi-join) -----------------
    // Adapted: the bundled lineitem has no commit/receipt dates, so the
    // "late line" predicate is l_shipdate > o_orderdate — same EXISTS
    // + non-equi-condition semi-join shape as the official Q4.
    QueryDef("q_tpch_q4",
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) {
      (s, dir) => {
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") >= expr("TIMESTAMP '1996-01-01 00:00:00'") &&
            col("o_orderdate") < expr("TIMESTAMP '1996-04-01 00:00:00'"))
          .select("o_orderkey", "o_orderdate", "o_orderpriority")
        val l = t(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
        // left_semi with equi-key + residual: the EXISTS shape — hash
        // semi-join on the order key, residual evaluated in the join,
        // no duplication of orders however many lines are late
        o.join(l, col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate"), "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).cast("bigint").as("order_count"))
          .orderBy("o_orderpriority")
      }
    },

    // ---- Q6: forecasting revenue change (pure scan-filter-agg) ----------
    QueryDef("q_tpch_q6",
      """SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100) AS DECIMAL(38,0))) AS BIGINT) AS revenue_c,
        |  CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin) {
      (s, dir) =>
        // every predicate pushes into the parquet scan; the aggregate is
        // a scalar partial+final — the minimal possible plan
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= expr("TIMESTAMP '1996-01-01 00:00:00'") &&
            col("l_shipdate") < expr("TIMESTAMP '1997-01-01 00:00:00'") &&
            col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
          .agg(
            expr("CAST(sum(CAST(round(l_extendedprice * l_discount * 100) AS DECIMAL(38,0))) AS BIGINT)")
              .as("revenue_c"),
            count(lit(1)).cast("bigint").as("n_lines"))
    },

    // ---- Q14: promotion effect (conditional aggregate over a join) ------
    QueryDef("q_tpch_q14",
      s"""SELECT
         |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN $revC ELSE CAST(0 AS DECIMAL(38,0)) END) AS BIGINT) AS promo_c,
         |  CAST(sum($revC) AS BIGINT) AS total_c,
         |  CAST(100 * sum(CASE WHEN p_type = 'PROMO' THEN $revC ELSE CAST(0 AS DECIMAL(38,0)) END) AS DOUBLE)
         |    / CAST(sum($revC) AS DOUBLE) AS promo_pct
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin) {
      (s, dir) => {
        // the month of lineitem shuffles nothing: part projects to two
        // columns and broadcasts; promo share is one conditional sum
        val l = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= expr("TIMESTAMP '1996-09-01 00:00:00'") &&
            col("l_shipdate") < expr("TIMESTAMP '1996-10-01 00:00:00'"))
          .selectExpr("l_partkey", s"$revC AS rev")
        val p = broadcast(t(s, dir, "part").select("p_partkey", "p_type"))
        l.join(p, col("l_partkey") === col("p_partkey"))
          .agg(
            expr("CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE CAST(0 AS DECIMAL(38,0)) END) AS BIGINT)")
              .as("promo_c"),
            expr("CAST(sum(rev) AS BIGINT)").as("total_c"),
            expr("CAST(100 * sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE CAST(0 AS DECIMAL(38,0)) END) AS DOUBLE)" +
              " / CAST(sum(rev) AS DOUBLE)").as("promo_pct"))
      }
    },

    // ---- Q18: large-volume customers (HAVING over a fact-fact join) -----
    // Threshold 250 ≈ the 99th-percentile per-order quantity sum in the
    // bundled data (official Q18 uses 300 at SF1) — selective at every sf.
    QueryDef("q_tpch_q18",
      """WITH big AS (
        |  SELECT l_orderkey, sum(CAST(round(l_quantity * 100) AS DECIMAL(38,0))) AS qty_c
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(CAST(round(l_quantity * 100) AS DECIMAL(38,0))) > 25000)
        |SELECT c_custkey, c_name, o_orderkey, o_orderdate,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_c,
        |  CAST(qty_c AS BIGINT) AS qty_c
        |FROM big
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |ORDER BY totalprice_c DESC, o_orderkey LIMIT 100""".stripMargin) {
      (s, dir) => {
        // the lineitem aggregate pre-reduces to the handful of big
        // orders (partial agg map-side), which then BROADCASTS onto
        // orders — the fact table is never shuffled for the join.
        // r16 scratch diet: the partial-agg shuffle payload is BIGINT,
        // not DECIMAL(38,0) — each term round(qty*100) is an integer
        // ≤ 5000 and per-order sums stay far below 2^63, so the long
        // sum is exact while the shuffle row drops from (long, 16-byte
        // decimal) to (long, long). Measured at sf100: 12.33 → see
        // SCRATCH_SF100_r16.json. The oracle still sums as DECIMAL;
        // both sides cast to BIGINT at output, values identical.
        val big = t(s, dir, "lineitem")
          .groupBy("l_orderkey")
          .agg(expr("sum(CAST(round(l_quantity * 100) AS BIGINT))").as("qty_c"))
          .filter(col("qty_c") > lit(25000L))
        val o = t(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
        val c = t(s, dir, "customer").select("c_custkey", "c_name")
        o.join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .selectExpr("c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_c",
            "CAST(qty_c AS BIGINT) AS qty_c")
          .orderBy(col("totalprice_c").desc, col("o_orderkey"))
          .limit(100)
      }
    },

    // ---- Q7: volume shipping between two nations ------------------------
    QueryDef("q_tpch_q7",
      s"""SELECT supp_nation, cust_nation, l_year,
         |  CAST(sum(rev) AS DOUBLE) AS revenue_c
         |FROM (
         |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |    CAST(year(l_shipdate) AS BIGINT) AS l_year, $revC AS rev
         |  FROM lineitem
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN orders ON o_orderkey = l_orderkey
         |  JOIN customer ON c_custkey = o_custkey
         |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
         |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00')
         |GROUP BY supp_nation, cust_nation, l_year
         |ORDER BY supp_nation, cust_nation, l_year""".stripMargin) {
      (s, dir) => {
        // both 25-row nation dims broadcast pre-filtered to the two
        // nations of interest, so supplier/customer reduce to the two
        // nations' members BEFORE touching the fact-fact l⋈o shuffle
        val pair = Seq("NATION_1", "NATION_2")
        val n1 = broadcast(t(s, dir, "nation")
          .filter(col("n_name").isin(pair: _*))
          .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation")))
        val n2 = broadcast(t(s, dir, "nation")
          .filter(col("n_name").isin(pair: _*))
          .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation")))
        val l = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= expr("TIMESTAMP '1996-01-01 00:00:00'") &&
            col("l_shipdate") < expr("TIMESTAMP '1998-01-01 00:00:00'"))
          .selectExpr("l_orderkey", "l_suppkey",
            "CAST(year(l_shipdate) AS BIGINT) AS l_year", s"$revC AS rev")
        val su = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
          .join(n1, col("s_nationkey") === col("n1_key"))
        val c = t(s, dir, "customer").select("c_custkey", "c_nationkey")
          .join(n2, col("c_nationkey") === col("n2_key"))
        l.join(su, col("l_suppkey") === col("s_suppkey"))
          .join(t(s, dir, "orders").select("o_orderkey", "o_custkey"),
            col("o_orderkey") === col("l_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy("supp_nation", "cust_nation", "l_year")
          .agg(expr("CAST(sum(rev) AS DOUBLE)").as("revenue_c"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      }
    },

    // ---- Q8: national market share within a region ----------------------
    QueryDef("q_tpch_q8",
      s"""WITH all_l AS (
         |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, $revC AS volume,
         |    n1.n_name AS supp_nation
         |  FROM lineitem
         |  JOIN part ON p_partkey = l_partkey
         |  JOIN supplier ON s_suppkey = l_suppkey
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |  JOIN region ON n2.n_regionkey = r_regionkey
         |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
         |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
         |SELECT o_year,
         |  CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE CAST(0 AS DECIMAL(38,0)) END) AS BIGINT) AS nation_c,
         |  CAST(sum(volume) AS BIGINT) AS total_c,
         |  CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE CAST(0 AS DECIMAL(38,0)) END) AS DOUBLE)
         |    / CAST(sum(volume) AS DOUBLE) AS mkt_share
         |FROM all_l GROUP BY o_year ORDER BY o_year""".stripMargin) {
      (s, dir) => {
        // ASIA-customer side pre-reduces via the broadcast nation⋈region
        // dim; the supplier nation arrives as a broadcast name lookup —
        // the fact-fact l⋈o shuffle still happens exactly once
        val asiaN = broadcast(t(s, dir, "nation")
          .join(t(s, dir, "region").filter(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey").as("cn_key")))
        val suppN = broadcast(t(s, dir, "nation")
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation")))
        val p = broadcast(t(s, dir, "part").filter(col("p_type") === "PROMO")
          .select("p_partkey"))
        val l = t(s, dir, "lineitem")
          .selectExpr("l_orderkey", "l_partkey", "l_suppkey", s"$revC AS volume")
          .join(p, col("l_partkey") === col("p_partkey"))
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") >= expr("TIMESTAMP '1996-01-01 00:00:00'") &&
            col("o_orderdate") < expr("TIMESTAMP '1998-01-01 00:00:00'"))
          .selectExpr("o_orderkey", "o_custkey",
            "CAST(year(o_orderdate) AS BIGINT) AS o_year")
        val c = t(s, dir, "customer").select("c_custkey", "c_nationkey")
          .join(asiaN, col("c_nationkey") === col("cn_key"))
        val su = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
          .join(suppN, col("s_nationkey") === col("sn_key"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(su, col("l_suppkey") === col("s_suppkey"))
          .groupBy("o_year")
          .agg(
            expr("CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE CAST(0 AS DECIMAL(38,0)) END) AS BIGINT)")
              .as("nation_c"),
            expr("CAST(sum(volume) AS BIGINT)").as("total_c"),
            expr("CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE CAST(0 AS DECIMAL(38,0)) END) AS DOUBLE)" +
              " / CAST(sum(volume) AS DOUBLE)").as("mkt_share"))
          .orderBy("o_year")
      }
    },

    // ---- Q13: customer order-count distribution -------------------------
    // Adapted: the priority filter stands in for the official comment
    // LIKE (no o_comment in the bundled schema) — same left-outer +
    // two-level aggregate shape.
    QueryDef("q_tpch_q13",
      """WITH c_orders AS (
        |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM c_orders GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin) {
      (s, dir) =>
        // orders pre-filters map-side; count(o_orderkey) over the left
        // join counts matches only (NULL for orderless customers = 0);
        // the second aggregate is over ≤ max-order-count rows
        t(s, dir, "customer").select("c_custkey")
          .join(t(s, dir, "orders")
              .filter(col("o_orderpriority") =!= "1-URGENT")
              .select("o_custkey", "o_orderkey"),
            col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).cast("bigint").as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).cast("bigint").as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // ---- Q22: dormant high-balance customers per nation ------------------
    // Adapted: nation stands in for the phone-prefix country code (no
    // c_phone in the bundled schema), and "dormant" means no order in
    // the trailing window (every customer has SOME order at these
    // scale factors) — same shape: scalar avg threshold, NOT EXISTS
    // anti-join, per-group count + balance sum.
    QueryDef("q_tpch_q22",
      """WITH avg_bal AS (
        |  SELECT CAST(sum(CAST(round(c_acctbal * 100) AS DECIMAL(38,0))) AS DOUBLE)
        |      / count(*) AS ab_c
        |  FROM customer WHERE c_acctbal > 0),
        |elig AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
        |  FROM customer, avg_bal
        |  WHERE CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS DOUBLE) > ab_c
        |    AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'))
        |SELECT n_name, CAST(count(*) AS BIGINT) AS numcust,
        |  CAST(sum(bal_c) AS BIGINT) AS totacctbal_c
        |FROM elig JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin) {
      (s, dir) => {
        // the average is exact cents summed in DECIMAL with ONE IEEE
        // division — the threshold compare is then identical on both
        // engines. NOT EXISTS = left_anti on the order keys; the 1-row
        // threshold broadcasts.
        val cust = t(s, dir, "customer")
          .selectExpr("c_custkey", "c_nationkey",
            "CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c")
        val avgBal = t(s, dir, "customer")
          .filter(col("c_acctbal") > 0)
          .agg(expr(
            "CAST(sum(CAST(round(c_acctbal * 100) AS DECIMAL(38,0))) AS DOUBLE) / count(*)")
            .as("ab_c"))
        val n = broadcast(t(s, dir, "nation").select("n_nationkey", "n_name"))
        cust.crossJoin(broadcast(avgBal))
          .filter(expr("CAST(bal_c AS DOUBLE) > ab_c"))
          .join(t(s, dir, "orders")
              .filter(col("o_orderdate") >= expr("TIMESTAMP '1999-01-01 00:00:00'"))
              .select("o_custkey"),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .join(n, col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(count(lit(1)).cast("bigint").as("numcust"),
            expr("CAST(sum(bal_c) AS BIGINT)").as("totacctbal_c"))
          .orderBy("n_name")
      }
    },

    // ---- Q12: late lines by priority class ------------------------------
    // Adapted: no l_shipmode/commit/receipt dates in the bundled schema —
    // the class column is l_returnflag and "late" is l_shipdate >
    // o_orderdate (the Q4 adaptation); same fact-fact join + dual
    // conditional count shape as the official Q12.
    QueryDef("q_tpch_q12",
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate > o_orderdate
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, dir) => {
        // the year filter pushes into the lineitem scan; the lateness
        // residual rides the single equi-shuffle on the order key
        val l = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= expr("TIMESTAMP '1996-01-01 00:00:00'") &&
            col("l_shipdate") < expr("TIMESTAMP '1997-01-01 00:00:00'"))
          .select("l_orderkey", "l_returnflag", "l_shipdate")
        val o = t(s, dir, "orders")
          .select("o_orderkey", "o_orderdate", "o_orderpriority")
        l.join(o, col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate"))
          .groupBy("l_returnflag")
          .agg(
            expr("CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)")
              .as("high_line_count"),
            expr("CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)")
              .as("low_line_count"))
          .orderBy("l_returnflag")
      }
    },

    // ---- Q15: top supplier by quarterly revenue -------------------------
    // The revenue aggregate appears on BOTH sides (the join input and the
    // scalar max) built from the same `rev` val. The explicit
    // `l_suppkey IS NOT NULL` BELOW the groupBy matters for plan reuse:
    // without it, the supplier inner join pushes isnotnull(l_suppkey)
    // into the probe-side aggregate only (the max side keeps NULL
    // groups), the two shuffle subtrees stop being canonical-equal, and
    // AQE plans TWO lineitem scans. With it, the quarter is scanned and
    // shuffled once and the max side is a ReusedExchange. Equality on
    // exact DECIMAL cents keeps the threshold compare engine-proof; ties
    // all surface (no arbitrary pick), ordered by supplier key.
    QueryDef("q_tpch_q15",
      s"""WITH revenue AS (
         |  SELECT l_suppkey, sum($revC) AS total_c
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
         |    AND l_suppkey IS NOT NULL
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, CAST(total_c AS BIGINT) AS total_c
         |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
         |WHERE total_c = (SELECT max(total_c) FROM revenue)
         |ORDER BY s_suppkey""".stripMargin) {
      (s, dir) => {
        val rev = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= expr("TIMESTAMP '1996-01-01 00:00:00'") &&
            col("l_shipdate") < expr("TIMESTAMP '1996-04-01 00:00:00'") &&
            col("l_suppkey").isNotNull)
          .selectExpr("l_suppkey", s"$revC AS rv")
          .groupBy("l_suppkey")
          .agg(expr("sum(rv)").as("total_c"))
        val maxv = rev.agg(max(col("total_c")).as("m"))
        val su = t(s, dir, "supplier").select("s_suppkey", "s_name")
        rev.join(broadcast(maxv), col("total_c") === col("m"))
          .join(su, col("l_suppkey") === col("s_suppkey"))
          .selectExpr("s_suppkey", "s_name", "CAST(total_c AS BIGINT) AS total_c")
          .orderBy("s_suppkey")
      }
    },

    // ---- Q17: small-quantity-order revenue (correlated avg) -------------
    // Adapted: p_size < 10 stands in for the official p_container filter.
    // The correlated per-part average becomes ONE partitioned window over
    // the joined lines — a single lineitem scan and a single shuffle on
    // the part key, instead of re-scanning lineitem for the subquery. The
    // threshold `qty < 0.2·avg(qty)` cross-multiplies to the integer
    // compare `5·qty·cnt < sum` — zero IEEE division on the hot path.
    QueryDef("q_tpch_q17",
      """SELECT CAST(sum(price_c) AS BIGINT) AS total_c,
        |  CAST(sum(price_c) AS DOUBLE) / 7.0 AS avg_yearly_c
        |FROM (
        |  SELECT CAST(round(l_extendedprice * 100) AS DECIMAL(38,0)) AS price_c,
        |    CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
        |    CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) OVER (PARTITION BY l_partkey) AS BIGINT) AS part_qty_c,
        |    CAST(count(*) OVER (PARTITION BY l_partkey) AS BIGINT) AS part_cnt
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_brand = 'Brand#1' AND p_size < 10)
        |WHERE qty_c * 5 * part_cnt < part_qty_c""".stripMargin) {
      (s, dir) => {
        val p = broadcast(t(s, dir, "part")
          .filter(col("p_brand") === "Brand#1" && col("p_size") < 10)
          .select("p_partkey"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("l_partkey")
        t(s, dir, "lineitem")
          .selectExpr("l_partkey",
            "CAST(round(l_extendedprice * 100) AS DECIMAL(38,0)) AS price_c",
            "CAST(round(l_quantity * 100) AS BIGINT) AS qty_c")
          .join(p, col("l_partkey") === col("p_partkey"))
          .withColumn("part_qty_c", sum(col("qty_c")).over(w).cast("bigint"))
          .withColumn("part_cnt", count(lit(1)).over(w).cast("bigint"))
          .filter(col("qty_c") * 5 * col("part_cnt") < col("part_qty_c"))
          .agg(expr("CAST(sum(price_c) AS BIGINT)").as("total_c"),
            expr("CAST(sum(price_c) AS DOUBLE) / 7.0").as("avg_yearly_c"))
      }
    },

    // ---- Q19: discounted revenue (disjunctive join predicate) -----------
    // Adapted: p_size/l_quantity bands stand in for the official container
    // and ship-mode legs. The part-only arms of the disjunction prune the
    // broadcast build side to three brands' small parts; the mixed
    // part×line residual evaluates inside the hash join.
    QueryDef("q_tpch_q19",
      s"""SELECT CAST(sum($revC) AS BIGINT) AS revenue_c,
         |  CAST(count(*) AS BIGINT) AS n_lines
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin) {
      (s, dir) => {
        val p = broadcast(t(s, dir, "part")
          .filter((col("p_brand") === "Brand#1" && col("p_size").between(1, 5)) ||
            (col("p_brand") === "Brand#2" && col("p_size").between(1, 10)) ||
            (col("p_brand") === "Brand#3" && col("p_size").between(1, 15)))
          .select("p_partkey", "p_brand", "p_size"))
        val l = t(s, dir, "lineitem")
          .selectExpr("l_partkey", "l_quantity", s"$revC AS rev")
        l.join(p, col("l_partkey") === col("p_partkey") && (
            (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
              col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
              col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
              col("l_quantity").between(20, 30))))
          .agg(expr("CAST(sum(rev) AS BIGINT)").as("revenue_c"),
            count(lit(1)).cast("bigint").as("n_lines"))
      }
    },

    // ---- Q9: product-type profit by nation and year ----------------------
    // Adapted: no partsupp/ps_supplycost in the bundled schema — the cost
    // term is the part's retail price times quantity (same per-row
    // rev−cost difference shape); p_name LIKE keeps the official filter.
    QueryDef("q_tpch_q9",
      s"""SELECT n_name, o_year, CAST(sum(amount_c) AS BIGINT) AS profit_c
         |FROM (
         |  SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |    $revC - CAST(round(p_retailprice * l_quantity * 100) AS DECIMAL(38,0)) AS amount_c
         |  FROM lineitem
         |  JOIN part ON p_partkey = l_partkey
         |  JOIN supplier ON s_suppkey = l_suppkey
         |  JOIN orders ON o_orderkey = l_orderkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE p_name LIKE '%red%')
         |GROUP BY n_name, o_year ORDER BY n_name, o_year DESC""".stripMargin) {
      (s, dir) => {
        // the LIKE-filtered part dim broadcasts and prunes lineitem BEFORE
        // the one fact-fact shuffle on the order key; supplier→nation is a
        // broadcast chain; the profit difference is exact cents per row
        val p = broadcast(t(s, dir, "part")
          .filter(col("p_name").like("%red%"))
          .select("p_partkey", "p_retailprice"))
        val su = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
        val n = broadcast(t(s, dir, "nation").select("n_nationkey", "n_name"))
        val o = t(s, dir, "orders")
          .selectExpr("o_orderkey", "CAST(year(o_orderdate) AS BIGINT) AS o_year")
        t(s, dir, "lineitem")
          .selectExpr("l_orderkey", "l_partkey", "l_suppkey", "l_quantity", s"$revC AS rev")
          .join(p, col("l_partkey") === col("p_partkey"))
          .selectExpr("l_orderkey", "l_suppkey",
            "rev - CAST(round(p_retailprice * l_quantity * 100) AS DECIMAL(38,0)) AS amount_c")
          .join(su, col("l_suppkey") === col("s_suppkey"))
          .join(n, col("s_nationkey") === col("n_nationkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy("n_name", "o_year")
          .agg(expr("CAST(sum(amount_c) AS BIGINT)").as("profit_c"))
          .orderBy(col("n_name"), col("o_year").desc)
      }
    },

    // ---- Q16: supplier-count by part attribute ---------------------------
    // Adapted: the part⇄supplier relation is the DISTINCT (partkey,
    // suppkey) pairs observed in lineitem (no partsupp table), and the
    // "complaints" exclusion is s_acctbal < 0 (no s_comment). Same shape:
    // distinct relation → dim filter → anti-join exclusion → COUNT
    // DISTINCT per attribute group.
    QueryDef("q_tpch_q16",
      """SELECT p_brand, p_type, p_size,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
        |  AND NOT EXISTS (SELECT 1 FROM supplier
        |                  WHERE s_suppkey = l_suppkey AND s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin) {
      (s, dir) => {
        // join the filtered part dim BEFORE the distinct so the dedup
        // shuffle carries only qualifying parts' pairs, not all of
        // lineitem's; the negative-balance exclusion list is tiny →
        // broadcast anti-join
        val p = broadcast(t(s, dir, "part")
          .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
          .select("p_partkey", "p_brand", "p_type", "p_size"))
        val bad = broadcast(t(s, dir, "supplier")
          .filter(col("s_acctbal") < 0).select("s_suppkey"))
        t(s, dir, "lineitem").select("l_partkey", "l_suppkey")
          .join(p, col("l_partkey") === col("p_partkey"))
          .join(bad, col("l_suppkey") === col("s_suppkey"), "left_anti")
          .select("p_brand", "p_type", "p_size", "l_suppkey")
          .distinct()
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct(col("l_suppkey")).cast("bigint").as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
      }
    },

    // ---- Q20: suppliers who dominated a promo part's supply --------------
    // Adapted: no partsupp.ps_availqty — "has excess stock to sell" maps
    // to "shipped more than half of the part's 1996 volume": per
    // (part, supplier) sums vs a per-part partitioned-window total,
    // cross-multiplied to the integer compare 2·sup_qty > part_qty. Same
    // overall shape as official Q20: nested qualification → DISTINCT
    // supplier set → semi-join onto the nation-filtered supplier dim.
    QueryDef("q_tpch_q20",
      """WITH shipped AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(sum(CAST(round(l_quantity * 100) AS DECIMAL(38,0))) AS BIGINT) AS sup_qty_c
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_type = 'PROMO'
        |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  GROUP BY l_partkey, l_suppkey),
        |dominant AS (
        |  SELECT DISTINCT l_suppkey FROM (
        |    SELECT l_suppkey, sup_qty_c,
        |      CAST(sum(sup_qty_c) OVER (PARTITION BY l_partkey) AS BIGINT) AS part_qty_c
        |    FROM shipped)
        |  WHERE sup_qty_c * 2 > part_qty_c)
        |SELECT s_suppkey, s_name FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_1'
        |  AND EXISTS (SELECT 1 FROM dominant WHERE l_suppkey = s_suppkey)
        |ORDER BY s_suppkey""".stripMargin) {
      (s, dir) => {
        val p = broadcast(t(s, dir, "part")
          .filter(col("p_type") === "PROMO").select("p_partkey"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("l_partkey")
        val dominant = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= expr("TIMESTAMP '1996-01-01 00:00:00'") &&
            col("l_shipdate") < expr("TIMESTAMP '1997-01-01 00:00:00'"))
          .selectExpr("l_partkey", "l_suppkey",
            "CAST(round(l_quantity * 100) AS DECIMAL(38,0)) AS qty_c")
          .join(p, col("l_partkey") === col("p_partkey"))
          .groupBy("l_partkey", "l_suppkey")
          .agg(expr("CAST(sum(qty_c) AS BIGINT)").as("sup_qty_c"))
          .withColumn("part_qty_c", sum(col("sup_qty_c")).over(w).cast("bigint"))
          .filter(col("sup_qty_c") * 2 > col("part_qty_c"))
          .select("l_suppkey").distinct()
        val n = broadcast(t(s, dir, "nation")
          .filter(col("n_name") === "NATION_1").select("n_nationkey"))
        t(s, dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
          .join(n, col("s_nationkey") === col("n_nationkey"))
          .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select("s_suppkey", "s_name")
          .orderBy("s_suppkey")
      }
    },

    // ---- Q21: suppliers who kept finished orders waiting ------------------
    // Adapted: "late" is l_shipdate > o_orderdate (the Q4 adaptation; no
    // commit/receipt dates). Official shape preserved exactly: late lines
    // of 'F' orders, EXISTS another supplier on the order, NOT EXISTS
    // another LATE supplier on the order — the only-late-supplier count.
    QueryDef("q_tpch_q21",
      """WITH late AS (
        |  SELECT l_orderkey, l_suppkey FROM lineitem
        |  JOIN orders ON o_orderkey = l_orderkey
        |  WHERE o_orderstatus = 'F' AND l_shipdate > o_orderdate)
        |SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM late l1
        |JOIN supplier ON s_suppkey = l1.l_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_1'
        |  AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey
        |              AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late l3 WHERE l3.l_orderkey = l1.l_orderkey
        |                  AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin) {
      (s, dir) => {
        // r16 bloom pre-prune (the r13 aggregate alternative measured
        // WORSE, 55 B/row — this is the other lever). Only lines of
        // NATION_1 suppliers can surface, so:
        //  - the l1 leg pre-reduces lineitem to ~1/25 via a broadcast
        //    join on the NATION_1 supplier keys BEFORE its l⋈o shuffle;
        //  - the EXISTS/NOT-EXISTS legs only matter for l1's orderkeys,
        //    so both are pre-filtered by a bloom of the SUPERSET keys
        //    (any NATION_1-supplier line, no F/late condition — every
        //    l1 orderkey is in the bloom by construction, so the bloom
        //    has no false negatives and the exact semi/anti joins that
        //    follow return identical rows; false positives only let a
        //    few extra rows through to those exact joins).
        // Bloom sizing derives from the input size (≈30 compressed
        // B/lineitem-row; superset keys ≈ 4% of rows), 12 bits/key
        // (~0.3% fp) — at sf100 that is ~22M keys in a 2^28-bit filter,
        // built as one distributed aggregate over the DISTINCT keys
        // (AQE-coalesced, so the per-partition partial blooms stay few)
        // and broadcast as a scalar-subquery constant.
        val liBytes = graft.GraftSession.dirBytes(s"$dir/lineitem.parquet")
        val estKeys = math.max(1L << 12, liBytes / 30L * 4 / 100)
        val numBits = math.min(1L << 30, math.max(1L << 16, estKeys * 12))
        val n = broadcast(t(s, dir, "nation")
          .filter(col("n_name") === "NATION_1").select("n_nationkey"))
        val n1supp = broadcast(t(s, dir, "supplier")
          .select("s_suppkey", "s_name", "s_nationkey")
          .join(n, col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey", "s_name"))
        val view = s"graft_q21_n1keys_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        t(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
          .join(n1supp.select(col("s_suppkey").as("bk")), col("l_suppkey") === col("bk"), "left_semi")
          .select("l_orderkey").distinct()
          .createOrReplaceTempView(view)
        graft.operators.Caches.trackView(s, view)
        def bloomed(df: org.apache.spark.sql.DataFrame, keyCol: String) =
          df.where(expr(s"graft_might_contain((SELECT graft_bloom_agg(l_orderkey, " +
            s"CAST($estKeys AS BIGINT), CAST($numBits AS BIGINT)) FROM $view), $keyCol)"))
        val o = t(s, dir, "orders")
          .filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate")
        val l1 = t(s, dir, "lineitem")
          .select("l_orderkey", "l_suppkey", "l_shipdate")
          .join(n1supp.select(col("s_suppkey").as("n1k")), col("l_suppkey") === col("n1k"), "left_semi")
          .join(o, col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate"))
          .select("l_orderkey", "l_suppkey")
        val others = bloomed(t(s, dir, "lineitem"), "l_orderkey")
          .select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
        val lateOthers = bloomed(t(s, dir, "lineitem"), "l_orderkey")
          .select("l_orderkey", "l_suppkey", "l_shipdate")
          .join(o, col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate"))
          .select(col("l_orderkey").as("ok3"), col("l_suppkey").as("sk3"))
        l1
          .join(others, col("l_orderkey") === col("ok2") &&
            col("l_suppkey") =!= col("sk2"), "left_semi")
          .join(lateOthers, col("l_orderkey") === col("ok3") &&
            col("l_suppkey") =!= col("sk3"), "left_anti")
          .join(n1supp, col("l_suppkey") === col("s_suppkey"))
          .groupBy("s_name")
          .agg(count(lit(1)).cast("bigint").as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(100)
      }
    },

    // ---- Q2: minimum-cost supplier per part in a region -------------------
    // Adapted: no partsupp/ps_supplycost — the (part, supplier) supply
    // relation is the pairs observed in lineitem and the supply cost is
    // the minimum observed line price in exact cents (the Q16 pairs
    // adaptation). Official shape preserved: region-filtered suppliers,
    // part attribute filter, correlated min-cost-per-part subquery →
    // here ONE partitioned window over the already-joined candidates (no
    // re-scan), ties all surface, deterministic order, top 100.
    QueryDef("q_tpch_q2",
      """WITH cost AS (
        |  SELECT l_partkey, l_suppkey,
        |    min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cost_c
        |  FROM lineitem GROUP BY l_partkey, l_suppkey),
        |cand AS (
        |  SELECT p_partkey, s_name, n_name,
        |    CAST(round(s_acctbal * 100) AS BIGINT) AS s_acctbal_c, cost_c,
        |    min(cost_c) OVER (PARTITION BY p_partkey) AS min_cost_c
        |  FROM cost
        |  JOIN part ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'
        |    AND r_name = 'EUROPE')
        |SELECT s_acctbal_c, s_name, n_name, p_partkey, cost_c
        |FROM cand WHERE cost_c = min_cost_c
        |ORDER BY s_acctbal_c DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin) {
      (s, dir) => {
        // the filtered part dim broadcasts and prunes lineitem BEFORE the
        // pair-dedup shuffle (Spark won't push a join through an
        // aggregate itself, and per-pair min is unaffected by filtering
        // parts — the Q16 discipline); nation⋈region collapses to one
        // broadcast 25-row dim; the correlated min is a window over the
        // part key the pairs are ALREADY partitioned by
        val p = broadcast(t(s, dir, "part")
          .filter(col("p_size").between(10, 20) && col("p_type") === "LARGE")
          .select("p_partkey"))
        val cost = t(s, dir, "lineitem")
          .selectExpr("l_partkey", "l_suppkey",
            "CAST(round(l_extendedprice * 100) AS BIGINT) AS lc")
          .join(p, col("l_partkey") === col("p_partkey"))
          .groupBy("l_partkey", "l_suppkey", "p_partkey")
          .agg(min(col("lc")).as("cost_c"))
        val n = broadcast(t(s, dir, "nation")
          .join(broadcast(t(s, dir, "region")
              .filter(col("r_name") === "EUROPE").select("r_regionkey")),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey", "n_name"))
        val su = t(s, dir, "supplier")
          .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
        val w = org.apache.spark.sql.expressions.Window.partitionBy("p_partkey")
        cost.join(su, col("l_suppkey") === col("s_suppkey"))
          .join(n, col("s_nationkey") === col("n_nationkey"))
          .withColumn("min_cost_c", min(col("cost_c")).over(w))
          .filter(col("cost_c") === col("min_cost_c"))
          .selectExpr("CAST(round(s_acctbal * 100) AS BIGINT) AS s_acctbal_c",
            "s_name", "n_name", "p_partkey", "cost_c")
          .orderBy(col("s_acctbal_c").desc, col("n_name"), col("s_name"),
            col("p_partkey"))
          .limit(100)
      }
    },

    // ---- Q11: important part values in a region ---------------------------
    // Adapted: no partsupp — a part's "stock value" is the exact-cents
    // line value shipped by the region's suppliers (region, not a single
    // nation: the bundled sf0.001 supplier table is too thin for one
    // nation to be non-degenerate). The official fixed fraction is
    // scale-variant; the adapted threshold is SCALE-INVARIANT: keep
    // parts whose value exceeds 2× the average part value, as the exact
    // integer cross-multiplication value·n_parts > 2·total. The per-part
    // aggregate feeds both the probe and the 1-row totals (same reused
    // exchange discipline as Q15).
    QueryDef("q_tpch_q11",
      """WITH pv AS (
        |  SELECT l_partkey,
        |    sum(CAST(round(l_extendedprice * 100) AS DECIMAL(38,0))) AS value_d
        |  FROM lineitem
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'
        |  GROUP BY l_partkey),
        |tot AS (SELECT sum(value_d) AS total_d, count(*) AS n_parts FROM pv)
        |SELECT l_partkey AS p_partkey, CAST(value_d AS BIGINT) AS value_c
        |FROM pv, tot
        |WHERE value_d * n_parts > 2 * total_d
        |ORDER BY value_c DESC, p_partkey""".stripMargin) {
      (s, dir) => {
        // region-filtered supplier keys collapse to a broadcast list that
        // prunes lineitem BEFORE its one shuffle on the part key; the
        // totals row is a 1-row broadcast cross (the Q22 threshold shape)
        val nr = broadcast(t(s, dir, "nation")
          .join(broadcast(t(s, dir, "region")
              .filter(col("r_name") === "EUROPE").select("r_regionkey")),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey"))
        val su = broadcast(t(s, dir, "supplier")
          .join(nr, col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey"))
        val pv = t(s, dir, "lineitem")
          .selectExpr("l_partkey", "l_suppkey",
            "CAST(round(l_extendedprice * 100) AS DECIMAL(38,0)) AS lc")
          .join(su, col("l_suppkey") === col("s_suppkey"))
          .groupBy("l_partkey")
          .agg(sum(col("lc")).as("value_d"))
        val tot = pv.agg(sum(col("value_d")).as("total_d"),
          count(lit(1)).as("n_parts"))
        pv.crossJoin(broadcast(tot))
          .filter(col("value_d") * col("n_parts") > lit(2) * col("total_d"))
          .selectExpr("l_partkey AS p_partkey",
            "CAST(value_d AS BIGINT) AS value_c")
          .orderBy(col("value_c").desc, col("p_partkey"))
      }
    }
  )
}
