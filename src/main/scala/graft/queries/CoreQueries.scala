package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables
import graft.operators.PositionalJoin

/** Relational operator coverage — one query per plan-node capability of the
  * reference engine (reference: src/plan/types.d.ts — Scan, Filter, Project,
  * Sort/topK, Distinct, Limit, HashAggregate, ScalarAggregate, HashJoin,
  * NestedLoopJoin, PositionalJoin, SetOperation, Subquery, TableFunction,
  * Window) re-expressed with the DataFrame API so Catalyst supplies
  * pushdown, pruning, broadcast and codegen.
  *
  * Oracle-matching conventions (see SURVEY.md §5):
  *  - doubles are summed exactly via CAST(.. AS DECIMAL(18,2)) then CAST to
  *    DOUBLE so partial-aggregation order cannot change the result;
  *  - every computed column is cast to a canonical type on BOTH sides;
  *  - every query ends in a total-order ORDER BY.
  */
object CoreQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Exact sum of a 2-decimal double expression, as DOUBLE. */
  private def dsum(e: String): String =
    s"CAST(SUM(CAST(($e) AS DECIMAL(18,2))) AS DOUBLE)"

  val all: Seq[QueryDef] = Seq(

    // ---- Scan / Project / pruning -------------------------------------
    QueryDef("q_scan_project",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) {
      (s, dir) =>
        t(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
          .orderBy("l_orderkey", "l_linenumber")
    },

    // ---- Filter -------------------------------------------------------
    QueryDef("q_filter",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_quantity > 30 AND l_returnflag = 'R'
        |  AND l_shipdate >= TIMESTAMP '1995-07-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) {
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_quantity") > 30 && col("l_returnflag") === "R" &&
            col("l_shipdate") >= lit("1995-07-01").cast("timestamp_ntz"))
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
          .orderBy("l_orderkey", "l_linenumber")
    },

    // ---- Hash aggregate (TPC-H Q1 style) ------------------------------
    // Money semantics via scaled int64 ("cents"), the representation
    // columnar engines use for DECIMAL internally: quantities/prices carry
    // <=2 decimals and price*(1-discount) carries exactly <=4, so the
    // scaled sums are EXACT and ~3x faster than Spark's >18-precision
    // decimal aggregation path. Both engines compute the identical ints.
    QueryDef("q_agg",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
        |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
        |  CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_disc_price,
        |  CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
        |  CAST(COUNT(*) AS BIGINT) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) {
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            expr("CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0D").as("sum_qty"),
            expr("CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0D").as("sum_base_price"),
            expr("CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0D").as("sum_disc_price"),
            expr("CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0D / CAST(COUNT(*) AS DOUBLE)").as("avg_qty"),
            count(lit(1)).cast("bigint").as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
    },

    // ---- Scalar (global) aggregate ------------------------------------
    QueryDef("q_scalar_agg",
      """SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
        |  CAST(MAX(o_totalprice) AS DOUBLE) AS max_price,
        |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust
        |FROM orders""".stripMargin) {
      (s, dir) =>
        t(s, dir, "orders").agg(
          count(lit(1)).cast("bigint").as("n"),
          expr(dsum("o_totalprice")).as("total"),
          min("o_totalprice").cast("double").as("min_price"),
          max("o_totalprice").cast("double").as("max_price"),
          countDistinct(col("o_custkey")).cast("bigint").as("n_cust"))
    },

    // ---- GROUP BY expression + HAVING ---------------------------------
    QueryDef("q_having",
      """SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS order_year,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM orders
        |GROUP BY CAST(YEAR(o_orderdate) AS BIGINT)
        |HAVING COUNT(*) > 50
        |ORDER BY order_year""".stripMargin) {
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy(year(col("o_orderdate")).cast("bigint").as("order_year"))
          .agg(count(lit(1)).cast("bigint").as("n"))
          .filter(col("n") > 50)
          .orderBy("order_year")
    },

    // ---- Sort (multi-key, DESC, NULLS ordering) -----------------------
    QueryDef("q_sort",
      """SELECT c_custkey, c_acctbal FROM customer
        |ORDER BY c_acctbal DESC NULLS LAST, c_custkey ASC""".stripMargin) {
      (s, dir) =>
        t(s, dir, "customer")
          .select("c_custkey", "c_acctbal")
          .orderBy(col("c_acctbal").desc_nulls_last, col("c_custkey").asc)
    },

    // ---- Top-K (Sort + LIMIT → TakeOrderedAndProject) -----------------
    QueryDef("q_topk",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) {
      (s, dir) =>
        t(s, dir, "orders")
          .select("o_orderkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10)
    },

    // ---- LIMIT / OFFSET -----------------------------------------------
    QueryDef("q_limit_offset",
      """SELECT o_orderkey, o_orderstatus FROM orders
        |ORDER BY o_orderkey LIMIT 20 OFFSET 40""".stripMargin) {
      (s, dir) =>
        // top-(limit+offset) then drop: plans as TakeOrderedAndProject
        // (per-partition top-60 + driver merge) instead of a full global
        // sort feeding a single-partition offset.
        t(s, dir, "orders")
          .select("o_orderkey", "o_orderstatus")
          .orderBy("o_orderkey")
          .limit(60).offset(40)
    },

    // ---- DISTINCT -----------------------------------------------------
    QueryDef("q_distinct",
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) {
      (s, dir) =>
        t(s, dir, "lineitem")
          .select("l_returnflag", "l_linestatus")
          .distinct()
          .orderBy("l_returnflag", "l_linestatus")
    },

    QueryDef("q_count_distinct",
      """SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps
        |FROM lineitem""".stripMargin) {
      (s, dir) =>
        t(s, dir, "lineitem").agg(
          countDistinct(col("l_partkey")).cast("bigint").as("n_parts"),
          countDistinct(col("l_suppkey")).cast("bigint").as("n_supps"))
    },

    // ---- COUNT(*) fast path -------------------------------------------
    QueryDef("q_count_star",
      "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem") {
      (s, dir) =>
        t(s, dir, "lineitem").agg(count(lit(1)).cast("bigint").as("n"))
    },

    // ---- Inner equi-join (broadcast dim) ------------------------------
    QueryDef("q_join_inner",
      """SELECT c_mktsegment,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) {
      (s, dir) =>
        t(s, dir, "orders")
          .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).cast("bigint").as("n_orders"),
            expr(dsum("o_totalprice")).as("revenue"))
          .orderBy("c_mktsegment")
    },

    // ---- 3-way join through the dimension chain -----------------------
    QueryDef("q_join_3way",
      """SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n_customers
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin) {
      (s, dir) =>
        t(s, dir, "customer")
          .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name")
          .agg(count(lit(1)).cast("bigint").as("n_customers"))
          .orderBy("r_name")
    },

    // ---- LEFT outer join ----------------------------------------------
    QueryDef("q_join_left",
      """SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin) {
      (s, dir) =>
        t(s, dir, "customer")
          .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).cast("bigint").as("n_orders"))
          .orderBy("c_custkey")
    },

    // ---- RIGHT outer join ---------------------------------------------
    QueryDef("q_join_right",
      """SELECT c_custkey, o_orderkey
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |WHERE c_custkey <= 50
        |ORDER BY c_custkey, o_orderkey NULLS FIRST""".stripMargin) {
      (s, dir) =>
        t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"), "right")
          .filter(col("c_custkey") <= 50)
          .select("c_custkey", "o_orderkey")
          .orderBy(col("c_custkey").asc, col("o_orderkey").asc_nulls_first)
    },

    // ---- FULL outer join ----------------------------------------------
    QueryDef("q_join_full",
      """WITH c AS (SELECT c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_cust
        |            FROM customer GROUP BY c_nationkey),
        |     s AS (SELECT s_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_supp
        |            FROM supplier GROUP BY s_nationkey)
        |SELECT COALESCE(c.nk, s.nk) AS nk,
        |  COALESCE(c.n_cust, 0) AS n_cust, COALESCE(s.n_supp, 0) AS n_supp
        |FROM c FULL OUTER JOIN s ON c.nk = s.nk
        |ORDER BY nk""".stripMargin) {
      (s, dir) =>
        val c = t(s, dir, "customer").groupBy(col("c_nationkey").as("cnk"))
          .agg(count(lit(1)).cast("bigint").as("n_cust"))
        val su = t(s, dir, "supplier").groupBy(col("s_nationkey").as("snk"))
          .agg(count(lit(1)).cast("bigint").as("n_supp"))
        c.join(su, col("cnk") === col("snk"), "full_outer")
          .select(coalesce(col("cnk"), col("snk")).as("nk"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"))
          .orderBy("nk")
    },

    // ---- CROSS join ----------------------------------------------------
    QueryDef("q_join_cross",
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin) {
      (s, dir) =>
        t(s, dir, "region").select("r_name")
          .crossJoin(t(s, dir, "nation").select("n_name"))
          .orderBy("r_name", "n_name")
    },

    // ---- Equi-join with non-equi residual ------------------------------
    QueryDef("q_join_residual",
      """SELECT CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem JOIN orders
        |  ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate""".stripMargin) {
      (s, dir) =>
        t(s, dir, "lineitem")
          .join(t(s, dir, "orders"),
            col("l_orderkey") === col("o_orderkey") && col("l_shipdate") > col("o_orderdate"))
          .agg(count(lit(1)).cast("bigint").as("n"))
    },

    // ---- Semi join (IN subquery) ---------------------------------------
    QueryDef("q_join_semi",
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin) {
      (s, dir) =>
        val big = t(s, dir, "orders").filter(col("o_totalprice") > 400000).select("o_custkey")
        t(s, dir, "customer")
          .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
    },

    // ---- Anti join (NOT EXISTS) ----------------------------------------
    QueryDef("q_join_anti",
      """SELECT c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin) {
      (s, dir) =>
        t(s, dir, "customer")
          .join(t(s, dir, "orders").filter(col("o_totalprice") > 450000),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey")
          .orderBy("c_custkey")
    },

    // ---- Positional join -----------------------------------------------
    QueryDef("q_positional_join",
      """WITH l AS (SELECT r_name, CAST(row_number() OVER (ORDER BY r_regionkey) AS BIGINT) AS pos FROM region),
        |     r AS (SELECT n_name, CAST(row_number() OVER (ORDER BY n_nationkey) AS BIGINT) AS pos FROM nation)
        |SELECT pos, l.r_name, r.n_name
        |FROM l FULL OUTER JOIN r USING (pos)
        |ORDER BY pos""".stripMargin) {
      (s, dir) =>
        PositionalJoin(
          t(s, dir, "region").select("r_name"), Seq(col("r_regionkey")),
          t(s, dir, "nation").select("n_name"), Seq(col("n_nationkey")))
          .select("pos", "r_name", "n_name")
          .orderBy("pos")
    },

    // ---- Set operations -------------------------------------------------
    QueryDef("q_union",
      """SELECT c_nationkey AS nk FROM customer
        |UNION SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin) {
      (s, dir) =>
        t(s, dir, "customer").select(col("c_nationkey").as("nk"))
          .union(t(s, dir, "supplier").select(col("s_nationkey").as("nk")))
          .distinct()
          .orderBy("nk")
    },

    QueryDef("q_union_all",
      """SELECT CAST(COUNT(*) AS BIGINT) AS n FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  UNION ALL SELECT s_nationkey AS nk FROM supplier
        |) u""".stripMargin) {
      (s, dir) =>
        t(s, dir, "customer").select(col("c_nationkey").as("nk"))
          .union(t(s, dir, "supplier").select(col("s_nationkey").as("nk")))
          .agg(count(lit(1)).cast("bigint").as("n"))
    },

    QueryDef("q_intersect",
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin) {
      (s, dir) =>
        t(s, dir, "customer").select(col("c_nationkey").as("nk"))
          .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("nk")))
          .orderBy("nk")
    },

    QueryDef("q_except",
      """SELECT o_custkey AS ck FROM orders WHERE o_totalprice > 400000
        |EXCEPT SELECT o_custkey AS ck FROM orders WHERE o_totalprice > 450000
        |ORDER BY ck""".stripMargin) {
      (s, dir) =>
        val orders = t(s, dir, "orders")
        orders.filter(col("o_totalprice") > 400000).select(col("o_custkey").as("ck"))
          .except(orders.filter(col("o_totalprice") > 450000).select(col("o_custkey").as("ck")))
          .orderBy("ck")
    },

    // ---- CTE ------------------------------------------------------------
    QueryDef("q_cte",
      """WITH big_orders AS (
        |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM orders WHERE o_totalprice > 200000 GROUP BY o_custkey
        |)
        |SELECT c_mktsegment, CAST(SUM(n) AS BIGINT) AS big_order_count
        |FROM big_orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) {
      (s, dir) =>
        val bigOrders = t(s, dir, "orders")
          .filter(col("o_totalprice") > 200000)
          .groupBy("o_custkey")
          .agg(count(lit(1)).cast("bigint").as("n"))
        bigOrders
          .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(sum("n").cast("bigint").as("big_order_count"))
          .orderBy("c_mktsegment")
    },

    // ---- Recursive CTE (reference lacks it — syntax.md item 7) ----------
    QueryDef("q_cte_recursive",
      """WITH RECURSIVE nums(i) AS (
        |  SELECT CAST(1 AS BIGINT)
        |  UNION ALL SELECT i + 1 FROM nums WHERE i < 10
        |)
        |SELECT i, CAST(i * i AS BIGINT) AS sq FROM nums ORDER BY i""".stripMargin) {
      (s, _) =>
        s.sql(
          """WITH RECURSIVE nums(i) AS (
            |  SELECT CAST(1 AS BIGINT)
            |  UNION ALL SELECT i + 1 FROM nums WHERE i < 10
            |)
            |SELECT i, CAST(i * i AS BIGINT) AS sq FROM nums ORDER BY i""".stripMargin)
    },

    // ---- Subqueries ------------------------------------------------------
    QueryDef("q_subquery_scalar",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin) {
      (s, dir) =>
        val orders = t(s, dir, "orders")
        orders.createOrReplaceTempView("orders")
        s.sql(
          """SELECT o_orderkey, o_totalprice FROM orders
            |WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders)
            |ORDER BY o_orderkey""".stripMargin)
    },

    QueryDef("q_subquery_corr",
      """SELECT c_custkey,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM orders WHERE o_custkey = c_custkey) AS n_orders
        |FROM customer WHERE c_custkey <= 100
        |ORDER BY c_custkey""".stripMargin) {
      (s, dir) =>
        t(s, dir, "orders").createOrReplaceTempView("orders")
        t(s, dir, "customer").createOrReplaceTempView("customer")
        s.sql(
          """SELECT c_custkey,
            |  (SELECT CAST(COUNT(*) AS BIGINT) FROM orders WHERE o_custkey = c_custkey) AS n_orders
            |FROM customer WHERE c_custkey <= 100
            |ORDER BY c_custkey""".stripMargin)
    },

    QueryDef("q_subquery_from",
      """SELECT status, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(total AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM (
        |  SELECT o_orderstatus AS status,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total
        |  FROM orders WHERE o_totalprice > 100000
        |) sub
        |GROUP BY status ORDER BY status""".stripMargin) {
      (s, dir) =>
        val sub = t(s, dir, "orders")
          .filter(col("o_totalprice") > 100000)
          .select(col("o_orderstatus").as("status"),
            col("o_totalprice").cast("decimal(18,2)").cast("double").as("total"))
        sub.groupBy("status")
          .agg(count(lit(1)).cast("bigint").as("n"),
            expr("CAST(SUM(CAST(total AS DECIMAL(18,2))) AS DOUBLE)").as("revenue"))
          .orderBy("status")
    },

    // ---- Window functions ------------------------------------------------
    QueryDef("q_window_rownum",
      """SELECT * FROM (
        |  SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
        |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
        |    CAST(RANK() OVER w AS BIGINT) AS rnk,
        |    CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity DESC, l_orderkey, l_linenumber)
        |) x WHERE rn <= 5
        |ORDER BY l_returnflag, rn""".stripMargin) {
      (s, dir) =>
        // scale-safe top-N-per-key: TopK.perKey prefilters to the exact
        // top-5 rows per flag with a NARROW partial pass (no shuffle of
        // the fact table into |flags| reducer groups); the ranking window
        // then runs over <= partitions*flags*5 survivors. Exactness: the
        // window ordering key (quantity, orderkey, linenumber) is unique,
        // so rank/dense_rank computed on the reduced set equal the
        // full-table values.
        val ord = Seq(col("l_quantity").desc, col("l_orderkey").asc, col("l_linenumber").asc)
        val reduced = graft.operators.TopK.perKey(
            t(s, dir, "lineitem")
              .select("l_returnflag", "l_orderkey", "l_linenumber", "l_quantity"),
            Seq("l_returnflag"), ord, 5, rankCol = "_pk")
          .drop("_pk")
        val w = Window.partitionBy("l_returnflag")
          .orderBy(col("l_quantity").desc, col("l_orderkey"), col("l_linenumber"))
        reduced
          .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            row_number().over(w).cast("bigint").as("rn"),
            rank().over(w).cast("bigint").as("rnk"),
            dense_rank().over(w).cast("bigint").as("drnk"))
          .filter(col("rn") <= 5)
          .orderBy("l_returnflag", "rn")
    },

    QueryDef("q_window_lag",
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(LAG(o_totalprice) OVER w AS DOUBLE) AS prev_price,
        |  CAST(LEAD(o_totalprice, 1, -1.0) OVER w AS DOUBLE) AS next_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey
        |LIMIT 1000""".stripMargin) {
      (s, dir) =>
        val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            lag(col("o_totalprice"), 1).over(w).cast("double").as("prev_price"),
            lead(col("o_totalprice"), 1, -1.0).over(w).cast("double").as("next_price"))
          .orderBy("o_custkey", "o_orderkey")
          .limit(1000)
    },

    // Aggregate OVER with running frame (syntax.md item 15)
    QueryDef("q_window_agg",
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
        |  CAST(COUNT(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS cust_orders
        |FROM orders
        |ORDER BY o_custkey, o_orderkey LIMIT 1000""".stripMargin) {
      (s, dir) =>
        val wRun = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy("o_custkey")
        t(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            sum(col("o_totalprice").cast("decimal(18,2)")).over(wRun)
              .cast("double").as("running_total"),
            count(lit(1)).over(wAll).cast("bigint").as("cust_orders"))
          .orderBy("o_custkey", "o_orderkey")
          .limit(1000)
    },

    // ---- Table function: UNNEST/EXPLODE of split array -------------------
    QueryDef("q_unnest",
      """SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) w
        |GROUP BY word ORDER BY cnt DESC, word LIMIT 20""".stripMargin) {
      (s, dir) =>
        t(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("word"))
          .groupBy("word")
          .agg(count(lit(1)).cast("bigint").as("cnt"))
          .orderBy(col("cnt").desc, col("word"))
          .limit(20)
    },

    // ---- SELECT without FROM / VALUES ------------------------------------
    QueryDef("q_values",
      """SELECT id, name, CAST(id * 10 AS BIGINT) AS ten
        |FROM (VALUES (CAST(1 AS BIGINT), 'alpha'), (CAST(2 AS BIGINT), 'beta'),
        |             (CAST(3 AS BIGINT), 'gamma')) AS t(id, name)
        |ORDER BY id""".stripMargin) {
      (s, _) =>
        import s.implicits._
        Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "name")
          .select(col("id"), col("name"), (col("id") * 10).cast("bigint").as("ten"))
          .orderBy("id")
    }
  )
}
