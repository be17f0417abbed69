package graft.queries

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Analytics surface beyond the reference (free capability on Spark,
  * called out as such in SURVEY §2.7): multi-level aggregation
  * (ROLLUP/CUBE/GROUPING SETS), the full window-function family with
  * RANGE frames, and PIVOT.
  */
object AnalyticsQueries {

  val all: Seq[QueryDef] = Seq(

    QueryDef("q_rollup",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS qty,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_ls
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) {
      (s, dir) =>
        Tables.registerAll(s, dir)
        s.sql(
          """SELECT l_returnflag, l_linestatus,
            |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS qty,
            |  CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
            |  CAST(grouping(l_linestatus) AS BIGINT) AS g_ls
            |FROM lineitem
            |GROUP BY ROLLUP(l_returnflag, l_linestatus)
            |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
    },

    QueryDef("q_cube",
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM orders WHERE o_orderkey < 1000
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) {
      (s, dir) =>
        Tables.registerAll(s, dir)
        s.sql(
          """SELECT o_orderstatus, o_orderpriority,
            |  CAST(count(*) AS BIGINT) AS n
            |FROM orders WHERE o_orderkey < 1000
            |GROUP BY CUBE(o_orderstatus, o_orderpriority)
            |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
    },

    QueryDef("q_grouping_sets",
      """SELECT c_mktsegment, c_nationkey, CAST(count(*) AS BIGINT) AS n
        |FROM customer
        |GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
        |ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST""".stripMargin) {
      (s, dir) =>
        Tables.registerAll(s, dir)
        s.sql(
          """SELECT c_mktsegment, c_nationkey, CAST(count(*) AS BIGINT) AS n
            |FROM customer
            |GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
            |ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST""".stripMargin)
    },

    QueryDef("q_window_more",
      """SELECT o_orderkey,
        |  first_value(o_orderkey) OVER w AS fv,
        |  last_value(o_orderkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lv,
        |  CAST(ntile(4) OVER w AS BIGINT) AS nt,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd
        |FROM orders WHERE o_orderkey < 300
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey)
        |ORDER BY o_orderkey""".stripMargin) {
      (s, dir) =>
        Tables.registerAll(s, dir)
        s.sql(
          """SELECT o_orderkey,
            |  first_value(o_orderkey) OVER w AS fv,
            |  last_value(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lv,
            |  CAST(ntile(4) OVER w AS BIGINT) AS nt,
            |  round(percent_rank() OVER w, 6) AS pr,
            |  round(cume_dist() OVER w, 6) AS cd
            |FROM orders WHERE o_orderkey < 300
            |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey)
            |ORDER BY o_orderkey""".stripMargin)
    },

    // RANGE-frame running sum. The naive form — an UNPARTITIONED
    // `ORDER BY k RANGE 10 PRECEDING` window — plans as a single-partition
    // Window that serializes the whole table through one task at scale.
    // A bounded RANGE frame only ever looks `width` back, so it
    // re-expresses exactly as a PARTITIONED window over value buckets of
    // size B >= width: every row is sent to its home bucket plus the next
    // one (boundary spill-in), each bucket computes the same frame locally
    // with all frame members present, and only home-bucket rows are kept.
    // Scales: max(buckets) parallelism, no single-partition window.
    QueryDef("q_window_range",
      """SELECT o_orderkey,
        |  CAST(sum(CAST(o_orderkey AS BIGINT)) OVER (
        |    ORDER BY o_orderkey RANGE BETWEEN 10 PRECEDING AND CURRENT ROW) AS BIGINT) AS rsum
        |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin) {
      (s, dir) =>
        Tables.registerAll(s, dir)
        s.sql(
          """WITH base AS (
            |  SELECT CAST(o_orderkey AS BIGINT) AS k FROM orders WHERE o_orderkey < 500
            |), spread AS (
            |  SELECT k, CAST(floor(k / 100) AS BIGINT) + b AS bucket
            |  FROM base LATERAL VIEW explode(array(0, 1)) t AS b
            |), w AS (
            |  SELECT k, bucket,
            |    sum(k) OVER (PARTITION BY bucket ORDER BY k
            |      RANGE BETWEEN 10 PRECEDING AND CURRENT ROW) AS rsum
            |  FROM spread
            |)
            |SELECT k AS o_orderkey, CAST(rsum AS BIGINT) AS rsum
            |FROM w WHERE bucket = CAST(floor(k / 100) AS BIGINT)
            |ORDER BY o_orderkey""".stripMargin)
    },

    // PIVOT: Spark's relational pivot vs a CASE-based oracle (the portable
    // formulation — reference users write exactly this shape by hand).
    QueryDef("q_pivot",
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS F,
        |  CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS O
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .selectExpr("l_returnflag", "l_linestatus", "CAST(l_quantity AS DECIMAL(18,2)) AS q")
          .groupBy("l_returnflag")
          .pivot("l_linestatus", Seq("F", "O"))
          .agg(sum("q"))
          .selectExpr("l_returnflag", "CAST(F AS DOUBLE) AS F", "CAST(O AS DOUBLE) AS O")
          .orderBy("l_returnflag")
    },

    // ---- UNPIVOT / melt: q_pivot's inverse -------------------------------
    // wide measure columns to long (measure, value) rows via the native
    // Dataset.unpivot (plans as a narrow Expand — no shuffle, no join);
    // measures are exact integers (cents / ppm) so values hash identically.
    QueryDef("q_unpivot",
      """WITH b AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
        |    CAST(round(l_discount * 1000000) AS BIGINT) AS disc_ppm
        |  FROM lineitem WHERE l_orderkey < 300)
        |SELECT l_orderkey, l_linenumber, 'disc_ppm' AS measure, disc_ppm AS v FROM b
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'price_c', price_c FROM b
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'qty_c', qty_c FROM b
        |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin) {
      (s, dir) =>
        Tables(s, dir, "lineitem").filter(col("l_orderkey") < 300)
          .selectExpr("l_orderkey", "l_linenumber",
            "CAST(round(l_quantity * 100) AS BIGINT) AS qty_c",
            "CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c",
            "CAST(round(l_discount * 1000000) AS BIGINT) AS disc_ppm")
          .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
            Array(col("qty_c"), col("price_c"), col("disc_ppm")),
            "measure", "v")
          .orderBy("l_orderkey", "l_linenumber", "measure")
    }
  )
}
