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
        // nation⋈region pre-reduces to the ≤25-row ASIA nation dim and
        // broadcasts; the fact-fact l⋈o shuffle happens exactly once
        val n = broadcast(
          t(s, dir, "nation").join(
              t(s, dir, "region").filter(col("r_name") === "ASIA"),
              col("n_regionkey") === col("r_regionkey"))
            .select("n_nationkey", "n_name"))
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") >= expr("TIMESTAMP '1996-01-01 00:00:00'") &&
            col("o_orderdate") < expr("TIMESTAMP '1997-01-01 00:00:00'"))
          .select("o_orderkey", "o_custkey")
        val l = t(s, dir, "lineitem")
          .selectExpr("l_orderkey", "l_suppkey", s"$revC AS rev")
        val su = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
        val c = t(s, dir, "customer").select("c_custkey", "c_nationkey")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(su, col("l_suppkey") === col("s_suppkey"))
          .join(c, col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(n, col("s_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(expr("CAST(sum(rev) AS DOUBLE)").as("revenue_c"))
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
        // orders — the fact table is never shuffled for the join
        val big = t(s, dir, "lineitem")
          .groupBy("l_orderkey")
          .agg(expr("sum(CAST(round(l_quantity * 100) AS DECIMAL(38,0)))").as("qty_c"))
          .filter(col("qty_c") > expr("CAST(25000 AS DECIMAL(38,0))"))
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
    }
  )
}
