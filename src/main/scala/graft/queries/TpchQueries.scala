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
    }
  )
}
