package graft.queries

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Round-2 coverage completion: set-op ALL variants, LATERAL, the
  * remaining function aliases from the reference inventory
  * (reference: src/validation/functions.js), the json_each table
  * function, and the nondeterministic surface (current_date/time/
  * timestamp, rand) as sanity-checkable outputs.
  */
object ExtraQueries {

  /** One dialect string, two engines (see q_dialect). */
  val dialectText: String =
    """SELECT c_custkey AS id,
      |  list_min(list_transform(string_split(c_name, ' '), x -> length(x) :: BIGINT)) AS min_seg,
      |  (c_acctbal :: DOUBLE) AS bal,
      |  CASE WHEN c_mktsegment ILIKE 'b%' THEN 1 ELSE 0 END AS is_b
      |FROM customer
      |WHERE position('1' IN c_name) > 0
      |ORDER BY id LIMIT 100""".stripMargin

  /** JS Date-setter interval arithmetic through the driver gate: the
    * dialect text runs plain `± INTERVAL` while the DuckDB oracle
    * SPELLS the JS semantics by construction — month rollover as
    * make_date(y,1,1) + to_months(m) + to_days(day-1) (never clamped),
    * fractional hours as the truncated summed component (+2.5h = +2h
    * always; -2.5h = -3h when hour >= 3 else -2h). Node-probed against
    * the reference's applyIntervalToDate (date.js:13-41).
    */
  val intervalJsText: String =
    """SELECT o_orderkey AS id,
      |  CAST(EPOCH(o_orderdate + INTERVAL 1 MONTH) AS BIGINT) AS m1,
      |  CAST(EPOCH(o_orderdate + INTERVAL 13 MONTH) AS BIGINT) AS m13,
      |  CAST(EPOCH(o_orderdate + INTERVAL 1 YEAR) AS BIGINT) AS y1,
      |  CAST(EPOCH(o_orderdate + INTERVAL '2.5' HOUR) AS BIGINT) AS h25,
      |  CAST(EPOCH(o_orderdate - INTERVAL '2.5' HOUR) AS BIGINT) AS h25n,
      |  CAST(EPOCH(o_orderdate - INTERVAL 1 MINUTE) AS BIGINT) AS m1n
      |FROM orders WHERE o_orderkey <= 800 ORDER BY id""".stripMargin

  private val intervalJsOracle: String = {
    def shifted(t: String, months: String, years: String) =
      s"CAST(epoch((make_date(CAST(year($t)$years AS INT), 1, 1) + " +
        s"to_months(CAST($months AS INT)) + to_days(CAST(day($t) - 1 AS INT)))::TIMESTAMP + " +
        s"($t - date_trunc('day', $t))) AS BIGINT)"
    val t = "o_orderdate"
    s"""SELECT o_orderkey AS id,
       |  ${shifted(t, s"month($t)", "")} AS m1,
       |  ${shifted(t, s"month($t) + 12", "")} AS m13,
       |  ${shifted(t, s"month($t) - 1", " + 1")} AS y1,
       |  CAST(epoch($t + INTERVAL 2 HOUR) AS BIGINT) AS h25,
       |  CAST(epoch($t - CASE WHEN hour($t) >= 3 THEN INTERVAL 3 HOUR ELSE INTERVAL 2 HOUR END) AS BIGINT) AS h25n,
       |  CAST(epoch($t - INTERVAL 1 MINUTE) AS BIGINT) AS m1n
       |FROM orders WHERE o_orderkey <= 800 ORDER BY id""".stripMargin
  }

  val fromFirstText: String =
    """FROM (FROM nation WHERE n_regionkey < 3) t
      |WHERE n_nationkey % 2 = 0
      |ORDER BY n_nationkey LIMIT 10""".stripMargin

  /** Strict-JS-nulls mode through the driver gate: the dialect text
    * runs under sqlStrictNulls (two-valued comparisons — reference
    * binary.js:32-35) while the oracle SPELLS the two-valued logic
    * with COALESCE(cmp, false). Rows where l_discount = 0 make the
    * NULLIF comparison null: strict mode keeps them (false under NOT),
    * standard three-valued SQL would not.
    */
  val strictNullsText: String =
    """SELECT l_returnflag AS flag, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      |FROM lineitem
      |WHERE NOT (NULLIF(l_discount, 0.0) > 0.04 AND l_quantity < 30)
      |GROUP BY l_returnflag ORDER BY flag""".stripMargin

  private val strictNullsOracle: String =
    """SELECT l_returnflag AS flag, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      |FROM lineitem
      |WHERE NOT (COALESCE((NULLIF(l_discount, 0.0) > 0.04), false)
      |           AND COALESCE((l_quantity < 30), false))
      |GROUP BY l_returnflag ORDER BY flag""".stripMargin

  /** JS Number(v) aggregation through the driver gate: SUM over a
    * STRING column accumulates numeric-looking cells and skips garbage
    * (reference accumulator.js:60-67 — Number(value), isFinite gate,
    * '' counts as 0). The oracle spells the JS coercion with
    * TRY_CAST + an explicit empty-string-is-zero branch. Every value
    * is a multiple of 0.5 far below 2^52, so the double sums are
    * EXACT regardless of fold order.
    */
  val jsNumAggText: String =
    """SELECT l_returnflag AS flag,
      |  SUM(balstr) AS s,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM (SELECT l_returnflag,
      |    CASE WHEN l_linenumber = 3 THEN 'n/a'
      |         WHEN l_linenumber = 4 THEN ''
      |         WHEN l_linenumber = 5 THEN ' 12.5 '
      |         ELSE CAST(l_quantity AS VARCHAR) END AS balstr
      |  FROM lineitem) t
      |GROUP BY l_returnflag ORDER BY flag""".stripMargin

  private val jsNumAggOracle: String =
    """SELECT l_returnflag AS flag,
      |  SUM(CASE WHEN trim(balstr) = '' THEN 0
      |           ELSE TRY_CAST(balstr AS DOUBLE) END) AS s,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM (SELECT l_returnflag,
      |    CASE WHEN l_linenumber = 3 THEN 'n/a'
      |         WHEN l_linenumber = 4 THEN ''
      |         WHEN l_linenumber = 5 THEN ' 12.5 '
      |         ELSE CAST(l_quantity AS VARCHAR) END AS balstr
      |  FROM lineitem) t
      |GROUP BY flag ORDER BY flag""".stripMargin

  val all: Seq[QueryDef] = Seq(

    QueryDef("q_intersect_all",
      """SELECT c_nationkey AS nk FROM customer WHERE c_custkey < 2000
        |INTERSECT ALL SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin) {
      (s, dir) =>
        Tables(s, dir, "customer").filter(col("c_custkey") < 2000)
          .select(col("c_nationkey").as("nk"))
          .intersectAll(Tables(s, dir, "supplier").select(col("s_nationkey").as("nk")))
          .orderBy("nk")
    },

    QueryDef("q_except_all",
      """SELECT c_nationkey AS nk FROM customer WHERE c_custkey < 200
        |EXCEPT ALL SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin) {
      (s, dir) =>
        Tables(s, dir, "customer").filter(col("c_custkey") < 200)
          .select(col("c_nationkey").as("nk"))
          .exceptAll(Tables(s, dir, "supplier").select(col("s_nationkey").as("nk")))
          .orderBy("nk")
    },

    // LATERAL correlated subquery in FROM (reference: NestedLoopJoin with
    // LATERAL — src/execute/join.js; Spark plans it as a correlated join).
    QueryDef("q_lateral",
      """SELECT n.n_name, CAST(t.total AS DOUBLE) AS total
        |FROM nation n, LATERAL (
        |  SELECT CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM supplier WHERE s_nationkey = n.n_nationkey
        |) t
        |WHERE t.total IS NOT NULL
        |ORDER BY n.n_name""".stripMargin) {
      (s, dir) =>
        Tables.registerAll(s, dir)
        s.sql(
          """SELECT n.n_name, CAST(t.total AS DOUBLE) AS total
            |FROM nation n, LATERAL (
            |  SELECT CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total
            |  FROM supplier WHERE s_nationkey = n.n_nationkey
            |) t
            |WHERE t.total IS NOT NULL
            |ORDER BY n.n_name""".stripMargin)
    },

    // Function aliases the reference registry exposes beyond the primary
    // names already covered (CEIL/POW/SUBSTRING/CARDINALITY/COT/COUNTIF/
    // EXTRACT/REGEXP_SUBSTR).
    QueryDef("q_func_aliases",
      """SELECT o_orderkey,
        |  CAST(ceil(o_totalprice) AS DOUBLE) AS ce,
        |  CAST(pow(2, mod(o_orderkey, 5)) AS DOUBLE) AS pw,
        |  substring(o_orderpriority, 1, 3) AS pri,
        |  CAST(len(string_split(o_orderpriority, '-')) AS BIGINT) AS card,
        |  round(cot(1.0 + mod(o_orderkey, 3)), 6) AS ct,
        |  CAST(extract(month FROM o_orderdate) AS BIGINT) AS mo,
        |  regexp_extract(o_orderpriority, '[A-Z]+') AS word
        |FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey""".stripMargin) {
      (s, dir) =>
        Tables(s, dir, "orders").filter(col("o_orderkey") < 200)
          .selectExpr("o_orderkey",
            "CAST(ceil(o_totalprice) AS DOUBLE) AS ce",
            "CAST(pow(2, mod(o_orderkey, 5)) AS DOUBLE) AS pw",
            "substring(o_orderpriority, 1, 3) AS pri",
            "CAST(cardinality(split(o_orderpriority, '-')) AS BIGINT) AS card",
            "round(cot(1.0D + mod(o_orderkey, 3)), 6) AS ct",
            "CAST(extract(month FROM o_orderdate) AS BIGINT) AS mo",
            "regexp_substr(o_orderpriority, '[A-Z]+') AS word")
          .orderBy("o_orderkey")
    },

    // COUNTIF + json aggregate/query/each family.
    QueryDef("q_json_more",
      """WITH e AS (SELECT event_id, event_type, props FROM events WHERE event_id < 500)
        |SELECT event_type,
        |  CAST(count_if(event_id % 2 = 0) AS BIGINT) AS n_even,
        |  to_json(list_sort(list(event_id))) AS ids_json,
        |  min(json_extract_string(props, '$.k')) AS k_min
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, dir) =>
        Tables(s, dir, "events").filter(col("event_id") < 500)
          .groupBy("event_type")
          .agg(
            expr("CAST(count_if(event_id % 2 = 0) AS BIGINT) AS n_even"),
            expr("to_json(array_sort(collect_list(event_id))) AS ids_json"),
            expr("min(get_json_object(props, '$.k')) AS k_min"))
          .orderBy("event_type")
    },

    // json_each analog: one row per key/value of a JSON object column.
    QueryDef("q_json_each",
      """SELECT event_id, k, json_extract_string(props, '$.' || k) AS v
        |FROM (
        |  SELECT event_id, props, unnest(json_keys(props)) AS k
        |  FROM events WHERE event_id < 50
        |) ORDER BY event_id, k""".stripMargin) {
      (s, dir) =>
        Tables(s, dir, "events").filter(col("event_id") < 50)
          .selectExpr("event_id", "explode(from_json(props, 'map<string,string>')) AS (k, v)")
          .orderBy("event_id", "k")
    },

    // Nondeterministic surface pinned to checkable booleans.
    QueryDef("q_current",
      """SELECT
        |  year(current_date) >= 2026 AS cd_ok,
        |  current_timestamp >= CAST(current_date AS TIMESTAMP) AS ct_ok,
        |  current_time IS NOT NULL AS t_ok""".stripMargin) {
      (s, _) =>
        s.sql(
          """SELECT
            |  year(current_date) >= 2026 AS cd_ok,
            |  current_timestamp() >= CAST(current_date AS TIMESTAMP) AS ct_ok,
            |  date_format(current_timestamp(), 'HH:mm:ss') IS NOT NULL AS t_ok""".stripMargin)
    },

    // rand()/random() — value range sanity (rows-only would also pass, but
    // the bounds are assertable cross-engine).
    QueryDef("q_random",
      """SELECT CAST(count(*) AS BIGINT) AS n_in_range FROM (
        |  SELECT random() AS r FROM range(1000)
        |) WHERE r >= 0 AND r < 1""".stripMargin) {
      (s, _) =>
        s.sql(
          """SELECT CAST(count(*) AS BIGINT) AS n_in_range FROM (
            |  SELECT rand() AS r FROM range(1000)
            |) WHERE r >= 0 AND r < 1""".stripMargin)
    },

    // Batch sessionization (gaps-and-islands) — the oracle-checkable twin
    // of streaming EventPipeline.sessionize, same 30-min gap semantics.
    QueryDef("q_sessionize",
      """WITH m AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM m
        |)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin) {
      (s, dir) =>
        graft.operators.Sessionize.sessions(
            Tables.events(s, dir), "user_id", "ts", "value",
            gapSeconds = 1800, tieBreak = Seq("event_id"))
          .selectExpr("user_id", "CAST(session_id AS BIGINT) AS session_id",
            "session_start", "session_end", "n_events",
            "CAST(total AS DOUBLE) AS total")
          .orderBy("user_id", "session_id")
    },

    // Salted two-phase aggregation: skew-safe groupBy, same result as the
    // plain GROUP BY oracle.
    QueryDef("q_salted_agg",
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  CAST(min(value) AS DOUBLE) AS vmin, CAST(max(value) AS DOUBLE) AS vmax
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, dir) =>
        import graft.operators.Skew
        val ev = Tables.events(s, dir)
          .withColumn("value_d", expr("CAST(value AS DECIMAL(18,2))"))
        Skew.saltedAggregate(ev, Seq("event_type"), salt = 8, Seq(
            Skew.count2("n"), Skew.sum2("value_d", "total"),
            Skew.min2("value", "vmin"), Skew.max2("value", "vmax")))
          .selectExpr("event_type", "CAST(n AS BIGINT) AS n",
            "CAST(total AS DOUBLE) AS total",
            "CAST(vmin AS DOUBLE) AS vmin", "CAST(vmax AS DOUBLE) AS vmax")
          .orderBy("event_type")
    },

    // Remaining spatial predicate battery: equal-size axis-aligned boxes
    // make every predicate an exact interval-arithmetic oracle (mirrors
    // Ops semantics: intersects counts boundary contact; overlaps requires
    // same dimension, intersection, and no containment/equality; touches
    // requires boundary-only contact; crosses for a dim-1 vs dim-2 pair
    // is the reference's lenient rule — they intersect (boundary contact
    // counts) and the polygon does not contain the line; this line is
    // always WIDER than the envelope, so containment never holds and
    // crosses reduces to closed-interval intersection).
    // b_touches spells the REFERENCE's sampled-relation model: two
    // congruent envelopes touch when edge-adjacent (zero-width overlap)
    // OR IDENTICAL — identical rings sample entirely onto each other's
    // boundary (spatial/operations.js polygonPolygonRelation), the
    // seed-88013 fuzz find, deliberately mirrored over the OGC answer
    QueryDef("q_spatial_predicates2",
      """WITH p AS (
        |  SELECT c_custkey AS id,
        |    CAST(c_custkey % 20 AS DOUBLE) AS x0,
        |    CAST(c_custkey % 13 AS DOUBLE) AS y0
        |  FROM customer WHERE c_custkey < 500
        |), r AS (
        |  SELECT id, x0, y0,
        |    greatest(x0, 5.0) AS ixl, least(x0 + 7, 12.0) AS ixh,
        |    greatest(y0, 4.0) AS iyl, least(y0 + 5, 9.0) AS iyh
        |  FROM p
        |)
        |SELECT id,
        |  (ixl <= ixh AND iyl <= iyh) AS b_intersects,
        |  (x0 = 5 AND y0 = 4) AS b_equals,
        |  ((ixl <= ixh AND iyl <= iyh) AND NOT (x0 = 5 AND y0 = 4)) AS b_overlaps,
        |  ((ixl <= ixh AND iyl <= iyh)
        |    AND (NOT (ixl < ixh AND iyl < iyh) OR (x0 = 5 AND y0 = 4))) AS b_touches,
        |  (x0 = 5 AND y0 = 4) AS b_covers,
        |  (x0 = 5 AND y0 = 4) AS b_coveredby,
        |  (y0 + 2.5 >= 4 AND y0 + 2.5 <= 9 AND greatest(x0 - 1, 5.0) <= least(x0 + 8, 12.0)) AS b_crosses
        |FROM r ORDER BY id""".stripMargin) {
      (s, dir) =>
        Tables(s, dir, "customer").filter(col("c_custkey") < 500)
          .selectExpr("c_custkey AS id",
            "CAST(c_custkey % 20 AS DOUBLE) AS x0",
            "CAST(c_custkey % 13 AS DOUBLE) AS y0")
          .selectExpr("id",
            "st_makeenvelope(x0, y0, x0 + 7, y0 + 5) AS b",
            "st_makeenvelope(5.0D, 4.0D, 12.0D, 9.0D) AS a",
            "st_geomfromtext(concat('LINESTRING (', x0 - 1, ' ', y0 + 2.5, ', ', x0 + 8, ' ', y0 + 2.5, ')')) AS l")
          .selectExpr("id",
            "st_intersects(a, b) AS b_intersects",
            "st_equals(a, b) AS b_equals",
            "st_overlaps(a, b) AS b_overlaps",
            "st_touches(a, b) AS b_touches",
            "st_covers(a, b) AS b_covers",
            "st_coveredby(b, a) AS b_coveredby",
            "st_crosses(l, a) AS b_crosses")
          .orderBy("id")
    },

    // ---- As-of join (operator AsOfJoin.asof): each click matched to the
    // latest view at-or-before it per user. Oracle is DuckDB's native
    // ASOF LEFT JOIN (inclusive >= semantics, same tie rule).
    QueryDef("q_asof_join",
      """WITH l AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type = 'click'
        |), r AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(value) AS v
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2
        |)
        |SELECT l.user_id AS user_id, epoch_us(l.ts) AS ts_us, round(r.v, 6) AS asof_v
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.user_id, ts_us""".stripMargin) {
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val clicks = ev.filter(col("event_type") === "click").select("user_id", "ts")
        val views = ev.filter(col("event_type") === "view")
          .groupBy("user_id", "ts").agg(max("value").as("v"))
        graft.operators.AsOfJoin.asof(clicks, views, Seq("user_id"), "ts", "ts", Seq("v"))
          .selectExpr("user_id",
            "unix_micros(CAST(ts AS TIMESTAMP)) AS ts_us",
            "round(asof_v, 6) AS asof_v")
          .orderBy("user_id", "ts_us")
      }
    },

    // ---- Range join (operator RangeJoin.within): interval predicate as a
    // bucketed equi-join + residual, never a nested-loop range probe.
    QueryDef("q_range_join",
      """SELECT c_custkey, CAST(count(*) AS BIGINT) AS n
        |FROM customer c JOIN part p
        |  ON p.p_retailprice BETWEEN c.c_acctbal - 50 AND c.c_acctbal + 50
        |WHERE c.c_custkey < 300
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin) {
      (s, dir) => {
        val cust = Tables(s, dir, "customer").filter(col("c_custkey") < 300)
          .select("c_custkey", "c_acctbal")
        val part = Tables(s, dir, "part").select("p_partkey", "p_retailprice")
        graft.operators.RangeJoin.within(cust, part,
            "c_acctbal", "p_retailprice", -50, 50)
          .groupBy("c_custkey").agg(count(lit(1)).cast("bigint").as("n"))
          .orderBy("c_custkey")
      }
    },

    // ---- Interval OVERLAP join (operator RangeJoin.overlaps): intervals
    // on BOTH sides, bucketed equi-join + residual, each true pair kept in
    // exactly one bucket (the overlap's left edge) so no dedup pass.
    // Oracle is the naive cross predicate — two algorithms, one answer.
    QueryDef("q_interval_overlap",
      """WITH l AS (
        |  SELECT o_orderkey AS lid, o_custkey % 500 AS ls,
        |    o_custkey % 500 + o_orderkey % 20 AS le
        |  FROM orders WHERE o_orderkey < 2000
        |), r AS (
        |  SELECT o_orderkey AS rid, o_custkey % 500 AS rs,
        |    o_custkey % 500 + o_orderkey % 15 AS re
        |  FROM orders WHERE o_orderkey >= 2000 AND o_orderkey < 4000
        |)
        |SELECT lid, rid FROM l, r
        |WHERE ls <= re AND rs <= le
        |ORDER BY lid, rid""".stripMargin) {
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        val l = o.filter(col("o_orderkey") < 2000)
          .selectExpr("o_orderkey AS lid", "o_custkey % 500 AS ls",
            "o_custkey % 500 + o_orderkey % 20 AS le")
        val r = o.filter(col("o_orderkey") >= 2000 && col("o_orderkey") < 4000)
          .selectExpr("o_orderkey AS rid", "o_custkey % 500 AS rs",
            "o_custkey % 500 + o_orderkey % 15 AS re")
        graft.operators.RangeJoin.overlaps(l, r, "ls", "le", "rs", "re",
            bucketWidth = 16.0)
          .select("lid", "rid")
          .orderBy("lid", "rid")
      }
    },

    // ---- Time-series resample + LOCF (operator TimeSeries.resample) -----
    // irregular events onto an hourly grid per user, carrying the latest
    // value forward. Grid alignment is integer ceiling arithmetic (epoch
    // micros exceed 2^53 — a double round-trip would misalign grids).
    // Oracle: DuckDB generate_series + native ASOF LEFT JOIN.
    QueryDef("q_ts_resample",
      """WITH e AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tu, max(value) AS v
        |  FROM events WHERE user_id < 20 GROUP BY 1, 2
        |), b AS (
        |  SELECT user_id, min(tu) AS lo, max(tu) AS hi FROM e GROUP BY 1
        |), g AS (
        |  SELECT user_id,
        |    unnest(generate_series(((lo + 3599999999) // 3600000000) * 3600000000,
        |                           hi, 3600000000)) AS tu
        |  FROM b
        |)
        |SELECT g.user_id AS user_id, g.tu AS tu, round(e.v, 6) AS v_locf
        |FROM g ASOF LEFT JOIN e ON g.user_id = e.user_id AND g.tu >= e.tu
        |ORDER BY user_id, tu""".stripMargin) {
      (s, dir) => {
        val e = Tables.events(s, dir).filter(col("user_id") < 20)
          .withColumn("tu", expr("unix_micros(CAST(ts AS TIMESTAMP))"))
          .groupBy("user_id", "tu").agg(max("value").as("v"))
        graft.operators.TimeSeries.resample(e, Seq("user_id"), "tu",
            step = 3600000000L, valueCols = Seq("v"))
          .selectExpr("user_id", "tu", "round(asof_v, 6) AS v_locf")
          .orderBy("user_id", "tu")
      }
    },

    // ---- Time-series linear interpolation (TimeSeries.interpolate) ------
    // the resample grid with straight-line values between neighboring
    // observations: endpoints are exact integer cents, the interpolation
    // is ONE fixed-shape IEEE expression over them (no rounding), so any
    // engine evaluating the same tree produces identical doubles.
    // Oracle: two native ASOF joins (backward-inclusive for t0,
    // strictly-forward for t1) against the generate_series grid.
    QueryDef("q_ts_interpolate",
      """WITH e AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tu,
        |    CAST(round(max(value) * 100) AS BIGINT) AS vc
        |  FROM events WHERE user_id < 20 GROUP BY 1, 2
        |), b AS (
        |  SELECT user_id, min(tu) AS lo, max(tu) AS hi FROM e GROUP BY 1
        |), g AS (
        |  SELECT user_id,
        |    unnest(generate_series(((lo + 3599999999) // 3600000000) * 3600000000,
        |                           hi, 3600000000)) AS tu
        |  FROM b
        |), p AS (
        |  SELECT g.user_id, g.tu, e.tu AS pt, e.vc AS pv
        |  FROM g ASOF LEFT JOIN e ON g.user_id = e.user_id AND g.tu >= e.tu
        |), n AS (
        |  SELECT g.user_id, g.tu, e.tu AS nt, e.vc AS nv
        |  FROM g ASOF LEFT JOIN e ON g.user_id = e.user_id AND g.tu < e.tu
        |)
        |SELECT p.user_id AS user_id, p.tu AS tu,
        |  CASE WHEN nt IS NULL OR pt = p.tu THEN CAST(pv AS DOUBLE)
        |    ELSE CAST(pv AS DOUBLE) + (CAST(nv AS DOUBLE) - CAST(pv AS DOUBLE)) *
        |      (CAST(p.tu - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE)) END AS v_lin
        |FROM p JOIN n ON p.user_id = n.user_id AND p.tu = n.tu
        |ORDER BY user_id, tu""".stripMargin) {
      (s, dir) => {
        val e = Tables.events(s, dir).filter(col("user_id") < 20)
          .withColumn("tu", expr("unix_micros(CAST(ts AS TIMESTAMP))"))
          .groupBy("user_id", "tu")
          .agg(expr("CAST(round(max(value) * 100) AS BIGINT)").as("vc"))
        graft.operators.TimeSeries.interpolate(e, Seq("user_id"), "tu",
            "vc", step = 3600000000L)
          .select("user_id", "tu", "v_lin")
          .orderBy("user_id", "tu")
      }
    },

    // ---- Per-group feature scaling (operator Features.standardize) ------
    // z-score + min-max per group via one partial agg broadcast back —
    // never an avg(...) OVER (PARTITION BY g) window that would buffer
    // every row per group
    QueryDef("q_feature_scale",
      """WITH s AS (
        |  SELECT l_returnflag, avg(l_quantity) AS mu, stddev_samp(l_quantity) AS sd,
        |    min(l_quantity) AS mn, max(l_quantity) AS mx
        |  FROM lineitem WHERE l_orderkey < 2000 GROUP BY 1
        |)
        |SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
        |  round(CASE WHEN sd IS NULL OR sd = 0 THEN 0
        |        ELSE (l.l_quantity::DOUBLE - mu) / sd END, 6) AS qz,
        |  round(CASE WHEN mx = mn THEN 0
        |        ELSE (l.l_quantity::DOUBLE - mn) / (mx::DOUBLE - mn) END, 6) AS qmm
        |FROM lineitem l JOIN s USING (l_returnflag)
        |WHERE l.l_orderkey < 2000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) {
      (s, dir) =>
        graft.operators.Features.standardize(
            Tables(s, dir, "lineitem").filter(col("l_orderkey") < 2000)
              .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"),
            Seq("l_returnflag"), "l_quantity")
          .selectExpr("l_orderkey", "l_linenumber", "l_returnflag",
            "round(l_quantity_z, 6) AS qz", "round(l_quantity_mm, 6) AS qmm")
          .orderBy("l_orderkey", "l_linenumber")
    },

    // ---- Winsorized clipping (operator Features.winsorize) --------------
    // per-group [p5, p95] quantile clip, bounds rounded to 6dp so any
    // engine computing the same interpolated quantiles agrees exactly;
    // same agg + broadcast-join shape as standardize (never a window)
    QueryDef("q_feature_winsorize",
      """WITH s AS (
        |  SELECT l_returnflag,
        |    round(quantile_cont(l_extendedprice::DOUBLE, 0.05), 6) AS plo,
        |    round(quantile_cont(l_extendedprice::DOUBLE, 0.95), 6) AS phi
        |  FROM lineitem GROUP BY 1)
        |SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
        |  round(least(greatest(l.l_extendedprice::DOUBLE, plo), phi), 6) AS price_w
        |FROM lineitem l JOIN s USING (l_returnflag)
        |WHERE l.l_orderkey < 1000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) {
      (s, dir) =>
        graft.operators.Features.winsorize(
            Tables(s, dir, "lineitem")
              .select("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"),
            Seq("l_returnflag"), "l_extendedprice")
          .filter(col("l_orderkey") < 1000)
          .selectExpr("l_orderkey", "l_linenumber", "l_returnflag",
            "l_extendedprice_w AS price_w")
          .orderBy("l_orderkey", "l_linenumber")
    },

    // ---- Data profiling (operator Profile.summarize): one scan ----------
    QueryDef("q_profile",
      """SELECT col_name, n_rows, n_null, n_distinct, min_val, max_val FROM (
        |  SELECT 'c_custkey' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(count(*) FILTER (WHERE c_custkey IS NULL) AS BIGINT) AS n_null,
        |    CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_distinct,
        |    CAST(min(c_custkey) AS VARCHAR) AS min_val,
        |    CAST(max(c_custkey) AS VARCHAR) AS max_val
        |  FROM customer
        |  UNION ALL
        |  SELECT 'c_mktsegment', CAST(count(*) AS BIGINT),
        |    CAST(count(*) FILTER (WHERE c_mktsegment IS NULL) AS BIGINT),
        |    CAST(count(DISTINCT c_mktsegment) AS BIGINT),
        |    CAST(min(c_mktsegment) AS VARCHAR), CAST(max(c_mktsegment) AS VARCHAR)
        |  FROM customer
        |  UNION ALL
        |  SELECT 'c_name', CAST(count(*) AS BIGINT),
        |    CAST(count(*) FILTER (WHERE c_name IS NULL) AS BIGINT),
        |    CAST(count(DISTINCT c_name) AS BIGINT),
        |    CAST(min(c_name) AS VARCHAR), CAST(max(c_name) AS VARCHAR)
        |  FROM customer
        |) ORDER BY col_name""".stripMargin) {
      (s, dir) =>
        graft.operators.Profile.summarize(
            Tables(s, dir, "customer"), Seq("c_custkey", "c_mktsegment", "c_name"))
          .withColumnRenamed("column", "col_name")
          .orderBy("col_name")
    },

    // ---- Snapshot drift report (operator Profile.drift) -----------------
    // week-1 vs week-4 event windows profiled (one scan each) and joined
    // per column; drift flags are cross-multiplied INTEGER compares
    // (null-rate ±5 points, distinct-per-row ±20% relative) — exact on
    // both engines, no float thresholds, no division.
    QueryDef("q_profile_drift", {
      def side(w: String, sfx: String) =
        s"""SELECT 'event_type' AS cn, CAST(count(*) AS BIGINT) AS n_$sfx,
           |    CAST(count(*) FILTER (WHERE event_type IS NULL) AS BIGINT) AS null_$sfx,
           |    CAST(count(DISTINCT event_type) AS BIGINT) AS nd_$sfx,
           |    CAST(min(event_type) AS VARCHAR) AS min_$sfx,
           |    CAST(max(event_type) AS VARCHAR) AS max_$sfx
           |  FROM $w
           |  UNION ALL
           |  SELECT 'user_id', CAST(count(*) AS BIGINT),
           |    CAST(count(*) FILTER (WHERE user_id IS NULL) AS BIGINT),
           |    CAST(count(DISTINCT user_id) AS BIGINT),
           |    CAST(min(user_id) AS VARCHAR), CAST(max(user_id) AS VARCHAR)
           |  FROM $w""".stripMargin
      s"""WITH w1 AS (SELECT user_id, event_type FROM events
         |  WHERE ts < TIMESTAMP '2024-01-08 00:00:00'),
         |w2 AS (SELECT user_id, event_type FROM events
         |  WHERE ts >= TIMESTAMP '2024-01-22 00:00:00'),
         |sa AS (${side("w1", "a")}),
         |sb AS (${side("w2", "b")})
         |SELECT sa.cn AS col_name, n_a, null_a, nd_a, n_b, null_b, nd_b,
         |  CASE WHEN n_a = 0 OR n_b = 0 THEN n_a <> n_b
         |    ELSE 20 * abs(CAST(null_a AS HUGEINT) * n_b - CAST(null_b AS HUGEINT) * n_a)
         |         > CAST(n_a AS HUGEINT) * n_b END AS null_drift,
         |  CASE WHEN n_a = 0 OR n_b = 0 THEN n_a <> n_b
         |    ELSE 5 * abs(CAST(nd_a AS HUGEINT) * n_b - CAST(nd_b AS HUGEINT) * n_a)
         |         > CAST(nd_b AS HUGEINT) * n_a END AS distinct_drift,
         |  NOT (min_a IS NOT DISTINCT FROM min_b
         |       AND max_a IS NOT DISTINCT FROM max_b) AS range_changed
         |FROM sa JOIN sb ON sa.cn = sb.cn ORDER BY col_name""".stripMargin
    }) {
      (s, dir) => {
        val e = Tables.events(s, dir)
        val w1 = e.filter(col("ts") < expr("TIMESTAMP '2024-01-08 00:00:00'"))
          .select("user_id", "event_type")
        val w2 = e.filter(col("ts") >= expr("TIMESTAMP '2024-01-22 00:00:00'"))
          .select("user_id", "event_type")
        graft.operators.Profile.drift(w1, w2, Seq("event_type", "user_id"))
          .withColumnRenamed("column", "col_name")
          .select("col_name", "n_a", "null_a", "nd_a", "n_b", "null_b",
            "nd_b", "null_drift", "distinct_drift", "range_changed")
          .orderBy("col_name")
      }
    },

    // ---- Data-quality constraint gate (operator Profile.checks) ---------
    // Deequ-style declarative rules — completeness, uniqueness, range,
    // domain membership, row-count floor — ALL evaluated in one
    // aggregate pass (rule-by-rule evaluation re-scans the table per
    // rule). Numeric evidence is emitted as integers (cents for the
    // range rule): raw double stringification differs across engines.
    QueryDef("q_quality_checks",
      """WITH a AS (
        |  SELECT count(*) AS n, count(c_custkey) AS nk,
        |    count(DISTINCT c_custkey) AS nd,
        |    CAST(round(min(c_acctbal) * 100) AS BIGINT) AS mn_c,
        |    CAST(round(max(c_acctbal) * 100) AS BIGINT) AS mx_c,
        |    count(*) FILTER (WHERE c_mktsegment NOT IN ('MACHINERY',
        |      'HOUSEHOLD', 'BUILDING', 'FURNITURE', 'AUTOMOBILE')) AS bad_seg
        |  FROM customer)
        |SELECT 'acctbal_range' AS check_name, mn_c >= -100000 AND mx_c <= 1000000 AS pass,
        |  CAST(mn_c AS VARCHAR) AS observed FROM a
        |UNION ALL SELECT 'complete_custkey', nk = n, CAST(n - nk AS VARCHAR) FROM a
        |UNION ALL SELECT 'min_rows', n >= 1000, CAST(n AS VARCHAR) FROM a
        |UNION ALL SELECT 'segment_domain', bad_seg = 0, CAST(bad_seg AS VARCHAR) FROM a
        |UNION ALL SELECT 'unique_custkey', nd = nk, CAST(nk - nd AS VARCHAR) FROM a
        |ORDER BY check_name""".stripMargin) {
      (s, dir) => {
        import graft.operators.Profile.Check
        graft.operators.Profile.checks(Tables(s, dir, "customer"), Seq(
            Check("acctbal_range",
              "CAST(round(min(c_acctbal) * 100) AS BIGINT) >= -100000 AND " +
                "CAST(round(max(c_acctbal) * 100) AS BIGINT) <= 1000000",
              "CAST(round(min(c_acctbal) * 100) AS BIGINT)"),
            Check("complete_custkey", "count(c_custkey) = count(*)",
              "count(*) - count(c_custkey)"),
            Check("min_rows", "count(*) >= 1000", "count(*)"),
            Check("segment_domain",
              "count_if(c_mktsegment NOT IN ('MACHINERY', 'HOUSEHOLD', " +
                "'BUILDING', 'FURNITURE', 'AUTOMOBILE')) = 0",
              "count_if(c_mktsegment NOT IN ('MACHINERY', 'HOUSEHOLD', " +
                "'BUILDING', 'FURNITURE', 'AUTOMOBILE'))"),
            Check("unique_custkey",
              "count(DISTINCT c_custkey) = count(c_custkey)",
              "count(c_custkey) - count(DISTINCT c_custkey)")))
          .orderBy("check_name")
      }
    },

    // ---- Dialect front-end in the driver gate: ONE SQL text -------------
    // the same DuckDB-flavored string runs through GraftSql.sql on Spark
    // and VERBATIM in the oracle — list_* renames, `::` casts (incl.
    // inside a HOF lambda), ILIKE, POSITION-IN all translated, zero
    // per-engine edits
    QueryDef("q_dialect", ExtraQueries.dialectText) {
      (s, dir) => {
        Tables.registerAll(s, dir)
        graft.plans.GraftSql.sql(s, ExtraQueries.dialectText)
      }
    },

    // DuckDB-style FROM-first statements (reference:
    // src/parse/parse.js:193-197 reads a leading FROM as SELECT *) — at
    // the statement head AND inside a parenthesized subquery. The SQL
    // text runs VERBATIM in the DuckDB oracle; on Spark the dialect
    // front-end inserts the star select before parse.
    QueryDef("q_from_first", ExtraQueries.fromFirstText) {
      (s, dir) => {
        Tables.registerAll(s, dir)
        graft.plans.GraftSql.sql(s, ExtraQueries.fromFirstText)
      }
    },

    // JS-semantics interval arithmetic (month rollover, fractional
    // truncation) with the DuckDB oracle spelling the values explicitly
    QueryDef("q_interval_js", ExtraQueries.intervalJsOracle) {
      (s, dir) => {
        Tables.registerAll(s, dir)
        graft.plans.GraftSql.sql(s, ExtraQueries.intervalJsText)
      }
    },

    // Opt-in strict-JS-nulls mode (two-valued comparisons) vs an oracle
    // that spells the coalesce-wrapped logic explicitly
    QueryDef("q_strict_nulls", ExtraQueries.strictNullsOracle) {
      (s, dir) => {
        Tables.registerAll(s, dir)
        graft.plans.GraftSql.sqlStrictNulls(s, ExtraQueries.strictNullsText)
      }
    },

    // JS Number(v) SUM over a string column vs a TRY_CAST oracle
    QueryDef("q_js_num_agg", ExtraQueries.jsNumAggOracle) {
      (s, dir) => {
        Tables.registerAll(s, dir)
        graft.plans.GraftSql.sql(s, ExtraQueries.jsNumAggText)
      }
    },

    // ORDER BY resolution edge cases the reference pins in
    // test/execute/execute.orderby.test.js: GROUP BY ordinal, ordering by
    // an aggregate expression that is NOT in the select list, and an
    // ordinal tiebreaker — visible through the hash because LIMIT makes
    // the ordering semantic, not cosmetic.
    QueryDef("q_orderby_edge",
      """SELECT o_orderpriority AS pri, CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY 1
        |ORDER BY sum(CAST(o_totalprice AS DECIMAL(18,2))) / count(*) DESC, 1
        |LIMIT 3""".stripMargin) {
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql(
          """SELECT o_orderpriority AS pri, CAST(count(*) AS BIGINT) AS cnt,
            |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
            |FROM orders
            |GROUP BY 1
            |ORDER BY sum(CAST(o_totalprice AS DECIMAL(18,2))) / count(*) DESC, 1
            |LIMIT 3""".stripMargin)
      }
    },

    // ---- MERGE / upsert (operators/Merge.upsert) ------------------------
    // the incremental-corpus refresh: updates replace matched target rows,
    // unmatched updates insert. ONE anti-join on the key (updates side
    // broadcasts when small) + union — never a window, never a collect
    QueryDef("q_merge_upsert",
      """WITH t AS (SELECT c_custkey, c_name,
        |    CAST(c_acctbal AS DECIMAL(18,2)) AS bal FROM customer),
        |upd AS (
        |  SELECT c_custkey, c_name || ' *v2' AS c_name,
        |    CAST(bal + 1000 AS DECIMAL(18,2)) AS bal FROM t WHERE c_custkey % 50 = 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, 'new-' || CAST(c_custkey AS VARCHAR),
        |    CAST(0 AS DECIMAL(18,2)) FROM t WHERE c_custkey <= 5),
        |merged AS (
        |  SELECT * FROM t WHERE c_custkey NOT IN (SELECT c_custkey FROM upd)
        |  UNION ALL SELECT * FROM upd)
        |SELECT c_custkey, c_name, CAST(bal AS DOUBLE) AS bal
        |FROM merged ORDER BY c_custkey""".stripMargin) {
      (s, dir) => {
        val t = Tables(s, dir, "customer").select(col("c_custkey"), col("c_name"),
          col("c_acctbal").cast("decimal(18,2)").as("bal"))
        val upd = t.filter(col("c_custkey") % 50 === 0)
          .select(col("c_custkey"), concat(col("c_name"), lit(" *v2")).as("c_name"),
            (col("bal") + 1000).cast("decimal(18,2)").as("bal"))
          .unionByName(t.filter(col("c_custkey") <= 5)
            .select((col("c_custkey") + 1000000).as("c_custkey"),
              concat(lit("new-"), col("c_custkey").cast("string")).as("c_name"),
              lit(java.math.BigDecimal.ZERO).cast("decimal(18,2)").as("bal")))
        graft.operators.Merge.upsert(t, upd, Seq("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("bal").cast("double").as("bal"))
          .orderBy("c_custkey")
      }
    },

    // ---- CDC delta classification (operators/Merge.delta) ---------------
    // inserted / changed / unchanged per update row — what an incremental
    // pipeline consumes to re-embed only what actually changed. NULL-safe
    // payload compare through one struct, one left join
    QueryDef("q_merge_delta",
      """WITH t AS (SELECT c_custkey, c_name,
        |    CAST(c_acctbal AS DECIMAL(18,2)) AS bal FROM customer),
        |upd AS (
        |  SELECT c_custkey, c_name || ' *v2' AS c_name,
        |    CAST(bal + 1000 AS DECIMAL(18,2)) AS bal FROM t WHERE c_custkey % 50 = 0
        |  UNION ALL
        |  SELECT c_custkey, c_name, bal FROM t
        |    WHERE c_custkey % 7 = 0 AND c_custkey % 50 <> 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, 'new-' || CAST(c_custkey AS VARCHAR),
        |    CAST(0 AS DECIMAL(18,2)) FROM t WHERE c_custkey <= 5)
        |SELECT u.c_custkey,
        |  CASE WHEN t.c_custkey IS NULL THEN 'inserted'
        |       WHEN u.c_name = t.c_name AND u.bal = t.bal THEN 'unchanged'
        |       ELSE 'changed' END AS change_kind
        |FROM upd u LEFT JOIN t ON u.c_custkey = t.c_custkey
        |ORDER BY u.c_custkey""".stripMargin) {
      (s, dir) => {
        val t = Tables(s, dir, "customer").select(col("c_custkey"), col("c_name"),
          col("c_acctbal").cast("decimal(18,2)").as("bal"))
        val upd = t.filter(col("c_custkey") % 50 === 0)
          .select(col("c_custkey"), concat(col("c_name"), lit(" *v2")).as("c_name"),
            (col("bal") + 1000).cast("decimal(18,2)").as("bal"))
          .unionByName(t.filter(col("c_custkey") % 7 === 0 && col("c_custkey") % 50 =!= 0))
          .unionByName(t.filter(col("c_custkey") <= 5)
            .select((col("c_custkey") + 1000000).as("c_custkey"),
              concat(lit("new-"), col("c_custkey").cast("string")).as("c_name"),
              lit(java.math.BigDecimal.ZERO).cast("decimal(18,2)").as("bal")))
        graft.operators.Merge.delta(t, upd, Seq("c_custkey"))
          .select("c_custkey", "change_kind")
          .orderBy("c_custkey")
      }
    },

    // ---- Full snapshot diff (operators/Merge.diff) ----------------------
    // the table-level CDC audit delta can't express: added AND removed
    // AND changed AND unchanged across two snapshots in one full-outer
    // equi-join — both snapshots shuffle once on the key, nothing else
    // moves. Snapshots are carved deterministically from documents.
    QueryDef("q_cdc_diff",
      """WITH o AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0),
        |n AS (SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 5 <> 0),
        |d AS (SELECT coalesce(n.doc_id, o.doc_id) AS doc_id,
        |    CASE WHEN o.doc_id IS NULL THEN 'added'
        |         WHEN n.doc_id IS NULL THEN 'removed'
        |         WHEN o.text IS NOT DISTINCT FROM n.text THEN 'unchanged'
        |         ELSE 'changed' END AS change_kind
        |  FROM n FULL OUTER JOIN o ON n.doc_id = o.doc_id)
        |SELECT change_kind, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM d GROUP BY change_kind ORDER BY change_kind""".stripMargin) {
      (s, dir) => {
        val base = Tables(s, dir, "documents").select("doc_id", "text")
        val oldSnap = base.filter(col("doc_id") % 7 =!= 0)
        val newSnap = base.filter(col("doc_id") % 5 =!= 0)
          .selectExpr("doc_id",
            "IF(doc_id % 3 = 0, text || ' v2', text) AS text")
        graft.operators.Merge.diff(oldSnap, newSnap, Seq("doc_id"))
          .groupBy("change_kind")
          .agg(count(lit(1)).cast("bigint").as("n"),
            expr("CAST(sum(doc_id) AS BIGINT)").as("id_sum"))
          .orderBy("change_kind")
      }
    }
  )
}
