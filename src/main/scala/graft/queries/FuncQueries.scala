package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Scalar-function coverage — the reference's full function inventory
  * (reference: src/validation/functions.js FUNCTION_SIGNATURES, plus the
  * syntax.md wishlist: `||`, ILIKE, POSITION(x IN y), split family,
  * TIMESTAMP casts, FILTER clause, aggregate windows).
  *
  * All queries use `selectExpr`/`expr` Columns — Catalyst-resolved, fully
  * codegen'd; no UDFs except q_udf which demonstrates the UDF surface
  * itself. Cross-engine float policy per SURVEY.md §5: transcendentals are
  * ROUND(..,6); sums go through exact decimals; ROUND(x, n>0) on data
  * doubles is avoided (tie-at-scale hazard differs across engines).
  */
object FuncQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  val all: Seq[QueryDef] = Seq(

    // ---- String functions (reference: src/expression/strings.js) -------
    QueryDef("q_string_funcs",
      """SELECT c_custkey,
        |  upper(c_name) AS up, lower(c_name) AS lo,
        |  CAST(length(c_name) AS BIGINT) AS len,
        |  CAST(strlen(c_name) AS BIGINT) AS octets,
        |  substr(c_name, 10, 5) AS sub,
        |  trim('  x  ') AS trimmed, ltrim('  x') AS ltrimmed, rtrim('x  ') AS rtrimmed,
        |  replace(c_name, 'Customer', 'Cust') AS repl,
        |  left(c_name, 8) AS l8, right(c_name, 3) AS r3,
        |  c_name || '-' || c_mktsegment AS cat,
        |  concat(c_mktsegment, '!') AS cat2,
        |  reverse(c_mktsegment) AS rev
        |FROM customer WHERE c_custkey < 200 ORDER BY c_custkey""".stripMargin) {
      (s, dir) =>
        t(s, dir, "customer").filter(col("c_custkey") < 200)
          .selectExpr("c_custkey",
            "upper(c_name) AS up", "lower(c_name) AS lo",
            "CAST(length(c_name) AS BIGINT) AS len",
            "CAST(octet_length(c_name) AS BIGINT) AS octets",
            "substr(c_name, 10, 5) AS sub",
            "trim('  x  ') AS trimmed", "ltrim('  x') AS ltrimmed", "rtrim('x  ') AS rtrimmed",
            "replace(c_name, 'Customer', 'Cust') AS repl",
            "left(c_name, 8) AS l8", "right(c_name, 3) AS r3",
            "c_name || '-' || c_mktsegment AS cat",
            "concat(c_mktsegment, '!') AS cat2",
            "reverse(c_mktsegment) AS rev")
          .orderBy("c_custkey")
    },

    // ---- Split / position family (syntax.md items 1 & 3) ---------------
    QueryDef("q_string_funcs2",
      """SELECT p_partkey,
        |  split_part(p_name, ' ', 1) AS color,
        |  split_part(p_name, ' ', 2) AS noun,
        |  CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words,
        |  CAST(instr(p_name, 'e') AS BIGINT) AS inst,
        |  CAST(strpos(p_name, 'e') AS BIGINT) AS spos,
        |  CAST(position('e' IN p_name) AS BIGINT) AS pos_in,
        |  contains(p_name, 'red') AS has_red,
        |  to_json(string_split(p_name, ' '))::VARCHAR AS words
        |FROM part WHERE p_partkey < 100 ORDER BY p_partkey""".stripMargin) {
      (s, dir) =>
        t(s, dir, "part").filter(col("p_partkey") < 100)
          .selectExpr("p_partkey",
            "split_part(p_name, ' ', 1) AS color",
            "split_part(p_name, ' ', 2) AS noun",
            "CAST(size(split(p_name, ' ')) AS BIGINT) AS n_words",
            "CAST(instr(p_name, 'e') AS BIGINT) AS inst",
            "CAST(position('e', p_name) AS BIGINT) AS spos",
            "CAST(position('e' IN p_name) AS BIGINT) AS pos_in",
            "contains(p_name, 'red') AS has_red",
            // complex columns ship as canonical JSON text: the driver's
            // pandas comparator can't sort/hash raw arrays or structs
            "to_json(split(p_name, ' ')) AS words")
          .orderBy("p_partkey")
    },

    // ---- String distance (fuzzy matching surface) -----------------------
    // classic Levenshtein in both engines — identical integers. The
    // thresholded Spark form (levenshtein(a, b, t) = -1 past t) is the
    // one to use at scale: it abandons a row's DP early, turning the
    // worst case from O(len^2) per pair into O(len*t).
    QueryDef("q_string_distance",
      """SELECT p1.p_partkey AS a_key, p2.p_partkey AS b_key,
        |  CAST(levenshtein(p1.p_name, p2.p_name) AS INT) AS dist,
        |  CAST(CASE WHEN levenshtein(p1.p_name, p2.p_name) <= 5
        |       THEN levenshtein(p1.p_name, p2.p_name) ELSE -1 END AS INT) AS dist_capped
        |FROM part p1 JOIN part p2 ON p2.p_partkey = p1.p_partkey + 1
        |WHERE p1.p_partkey < 100 ORDER BY a_key""".stripMargin) {
      (s, dir) => {
        val p = t(s, dir, "part").select("p_partkey", "p_name")
        val p1 = p.filter(col("p_partkey") < 100)
          .selectExpr("p_partkey AS a_key", "p_name AS a_name")
        val p2 = p.selectExpr("p_partkey AS b_key", "p_name AS b_name")
        p1.join(p2, expr("b_key = a_key + 1"))
          .selectExpr("a_key", "b_key",
            "CAST(levenshtein(a_name, b_name) AS INT) AS dist",
            "CAST(levenshtein(a_name, b_name, 5) AS INT) AS dist_capped")
          .orderBy("a_key")
      }
    },

    // ---- Regexp (reference: src/expression/regexp.js) -------------------
    QueryDef("q_regex_funcs",
      """SELECT c_custkey,
        |  regexp_extract(c_name, '([0-9]+)', 1) AS digits,
        |  regexp_replace(c_name, '0+', '0', 'g') AS squeezed,
        |  regexp_matches(c_name, '[0-9]{9}') AS has9,
        |  regexp_extract(c_name, '[A-Za-z]+') AS word
        |FROM customer WHERE c_custkey < 100 ORDER BY c_custkey""".stripMargin) {
      (s, dir) =>
        t(s, dir, "customer").filter(col("c_custkey") < 100)
          .selectExpr("c_custkey",
            "regexp_extract(c_name, '([0-9]+)', 1) AS digits",
            "regexp_replace(c_name, '0+', '0') AS squeezed",
            "c_name RLIKE '[0-9]{9}' AS has9",
            "regexp_extract(c_name, '[A-Za-z]+', 0) AS word")
          .orderBy("c_custkey")
    },

    // ---- Math (reference: src/expression/math.js) -----------------------
    QueryDef("q_math_funcs",
      """SELECT o_orderkey,
        |  CAST(floor(o_totalprice) AS DOUBLE) AS fl,
        |  CAST(ceiling(o_totalprice) AS DOUBLE) AS ce,
        |  CAST(abs(o_totalprice - 250000) AS DOUBLE) AS ab,
        |  CAST(sign(o_totalprice - 250000) AS DOUBLE) AS sg,
        |  CAST(sqrt(o_totalprice) AS DOUBLE) AS sq,
        |  CAST(mod(o_orderkey, 7) AS BIGINT) AS md,
        |  CAST(power(mod(o_orderkey, 5), 2) AS DOUBLE) AS pw,
        |  CAST(round(o_totalprice) AS DOUBLE) AS rd
        |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin) {
      (s, dir) =>
        t(s, dir, "orders").filter(col("o_orderkey") < 500)
          .selectExpr("o_orderkey",
            "CAST(floor(o_totalprice) AS DOUBLE) AS fl",
            "CAST(ceiling(o_totalprice) AS DOUBLE) AS ce",
            "CAST(abs(o_totalprice - 250000) AS DOUBLE) AS ab",
            "CAST(sign(o_totalprice - 250000) AS DOUBLE) AS sg",
            "CAST(sqrt(o_totalprice) AS DOUBLE) AS sq",
            "CAST(mod(o_orderkey, 7) AS BIGINT) AS md",
            "CAST(power(mod(o_orderkey, 5), 2) AS DOUBLE) AS pw",
            "CAST(round(o_totalprice) AS DOUBLE) AS rd")
          .orderBy("o_orderkey")
    },

    QueryDef("q_trig_funcs",
      """SELECT k,
        |  round(sin(k), 6) AS sn, round(cos(k), 6) AS cs, round(tan(k), 6) AS tn,
        |  round(asin(k / 10.0), 6) AS asn, round(acos(k / 10.0), 6) AS acs,
        |  round(atan(k), 6) AS atn, round(atan2(k, 3), 6) AS at2,
        |  round(exp(k), 6) AS ex, round(ln(k + 1), 6) AS lnn,
        |  round(log10(k + 1), 6) AS lg,
        |  round(degrees(k), 6) AS dg, round(radians(k), 6) AS rd,
        |  CAST(pi() AS DOUBLE) AS p
        |FROM (SELECT CAST(mod(o_orderkey, 10) AS BIGINT) AS k FROM orders WHERE o_orderkey < 20) t
        |ORDER BY k""".stripMargin) {
      (s, dir) =>
        t(s, dir, "orders").filter(col("o_orderkey") < 20)
          .selectExpr("CAST(mod(o_orderkey, 10) AS BIGINT) AS k")
          .selectExpr("k",
            "round(sin(k), 6) AS sn", "round(cos(k), 6) AS cs", "round(tan(k), 6) AS tn",
            "round(asin(k / 10.0), 6) AS asn", "round(acos(k / 10.0), 6) AS acs",
            "round(atan(k), 6) AS atn", "round(atan2(k, 3), 6) AS at2",
            "round(exp(k), 6) AS ex", "round(ln(k + 1), 6) AS lnn",
            "round(log10(k + 1), 6) AS lg",
            "round(degrees(k), 6) AS dg", "round(radians(k), 6) AS rd",
            "CAST(pi() AS DOUBLE) AS p")
          .orderBy("k")
    },

    // ---- Date/time (reference: src/expression/date.js) ------------------
    QueryDef("q_date_funcs",
      """SELECT o_orderkey,
        |  CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start,
        |  CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  CAST(day(o_orderdate) AS BIGINT) AS d,
        |  CAST(date_part('dow', o_orderdate) AS BIGINT) AS dow,
        |  CAST(epoch(o_orderdate) AS DOUBLE) AS ep,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since
        |FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey""".stripMargin) {
      (s, dir) =>
        t(s, dir, "orders").filter(col("o_orderkey") < 300)
          .selectExpr("o_orderkey",
            "CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS STRING) AS month_start",
            "CAST(year(o_orderdate) AS BIGINT) AS y",
            "CAST(month(o_orderdate) AS BIGINT) AS m",
            "CAST(day(o_orderdate) AS BIGINT) AS d",
            "CAST(dayofweek(o_orderdate) - 1 AS BIGINT) AS dow",
            "CAST(unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS DOUBLE) / 1000000.0 AS ep",
            "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01') AS BIGINT) AS days_since")
          .orderBy("o_orderkey")
    },

    // ---- INTERVAL arithmetic (reference: execute.interval.test.js) ------
    QueryDef("q_interval",
      """SELECT o_orderkey,
        |  o_orderdate + INTERVAL 3 DAY AS plus3d,
        |  o_orderdate - INTERVAL 2 HOUR AS minus2h,
        |  o_orderdate + INTERVAL 1 MONTH AS plus1m
        |FROM orders
        |WHERE o_orderdate < TIMESTAMP '1995-01-01 00:00:00' + INTERVAL 30 DAY
        |ORDER BY o_orderkey""".stripMargin) {
      (s, dir) =>
        t(s, dir, "orders")
          .filter(expr("o_orderdate < TIMESTAMP_NTZ '1995-01-01 00:00:00' + INTERVAL 30 DAY"))
          .selectExpr("o_orderkey",
            "o_orderdate + INTERVAL 3 DAY AS plus3d",
            "o_orderdate - INTERVAL 2 HOUR AS minus2h",
            "o_orderdate + INTERVAL 1 MONTH AS plus1m")
          .orderBy("o_orderkey")
    },

    // ---- Nanosecond event timestamps, hourly rollup ---------------------
    QueryDef("q_events_time",
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY date_trunc('hour', CAST(ts AS TIMESTAMP))
        |ORDER BY hour_bucket LIMIT 200""".stripMargin) {
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour_bucket"))
          .agg(count(lit(1)).cast("bigint").as("n"),
            expr("CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)").as("total_value"))
          .orderBy("hour_bucket")
          .limit(200)
    },

    // ---- CAST surface (syntax.md item 5: TIMESTAMP casts) ---------------
    QueryDef("q_cast",
      """SELECT
        |  CAST('42' AS BIGINT) AS i,
        |  CAST('3.5' AS DOUBLE) AS d,
        |  CAST(o_orderkey AS VARCHAR) AS s,
        |  CAST(1 AS BOOLEAN) AS b1, CAST(0 AS BOOLEAN) AS b0,
        |  CAST('2020-01-02 03:04:05' AS TIMESTAMP) AS ts,
        |  CAST(CAST('2020-01-02' AS DATE) AS VARCHAR) AS dt,
        |  CAST(o_orderkey AS DOUBLE) AS kf
        |FROM orders WHERE o_orderkey < 20 ORDER BY o_orderkey""".stripMargin) {
      (s, dir) =>
        t(s, dir, "orders").filter(col("o_orderkey") < 20)
          .selectExpr(
            "CAST('42' AS BIGINT) AS i",
            "CAST('3.5' AS DOUBLE) AS d",
            "CAST(o_orderkey AS STRING) AS s",
            "CAST(1 AS BOOLEAN) AS b1", "CAST(0 AS BOOLEAN) AS b0",
            "CAST('2020-01-02 03:04:05' AS TIMESTAMP_NTZ) AS ts",
            "CAST(CAST('2020-01-02' AS DATE) AS STRING) AS dt",
            "CAST(o_orderkey AS DOUBLE) AS kf")
          .orderBy("s")
    },

    // ---- Conditional functions ------------------------------------------
    QueryDef("q_conditional",
      """SELECT c_custkey,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'N/A') AS seg,
        |  CAST(greatest(c_acctbal, 0.0) AS DOUBLE) AS pos_bal,
        |  CAST(least(c_acctbal, 1000.0) AS DOUBLE) AS capped,
        |  nullif(c_nationkey, c_nationkey) IS NULL AS always_true
        |FROM customer WHERE c_custkey < 200 ORDER BY c_custkey""".stripMargin) {
      (s, dir) =>
        t(s, dir, "customer").filter(col("c_custkey") < 200)
          .selectExpr("c_custkey",
            "coalesce(nullif(c_mktsegment, 'BUILDING'), 'N/A') AS seg",
            "CAST(greatest(c_acctbal, 0.0D) AS DOUBLE) AS pos_bal",
            "CAST(least(c_acctbal, 1000.0D) AS DOUBLE) AS capped",
            "nullif(c_nationkey, c_nationkey) IS NULL AS always_true")
          .orderBy("c_custkey")
    },

    // ---- CASE / BETWEEN / IN / LIKE / ILIKE ------------------------------
    QueryDef("q_case_between_in",
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice BETWEEN 100000 AND 300000 THEN 'mid'
        |       WHEN o_totalprice < 100000 THEN 'low' ELSE 'high' END AS bucket,
        |  o_orderpriority IN ('1-URGENT', '2-HIGH') AS urgent,
        |  o_orderpriority LIKE '%HIGH%' AS has_high,
        |  o_orderpriority ILIKE '%high%' AS has_high_i,
        |  o_orderstatus IS NOT NULL AS nn
        |FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey""".stripMargin) {
      (s, dir) =>
        t(s, dir, "orders").filter(col("o_orderkey") < 300)
          .selectExpr("o_orderkey",
            "CASE WHEN o_totalprice BETWEEN 100000 AND 300000 THEN 'mid' " +
              "WHEN o_totalprice < 100000 THEN 'low' ELSE 'high' END AS bucket",
            "o_orderpriority IN ('1-URGENT', '2-HIGH') AS urgent",
            "o_orderpriority LIKE '%HIGH%' AS has_high",
            "o_orderpriority ILIKE '%high%' AS has_high_i",
            "o_orderstatus IS NOT NULL AS nn")
          .orderBy("o_orderkey")
    },

    // ---- JSON functions (reference JSON_* family; arrows via extraction) -
    QueryDef("q_json_funcs",
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
        |  json_valid(props) AS valid,
        |  lower(json_type(props)) AS jtype,
        |  to_json(json_keys(props))::VARCHAR AS keys,
        |  CAST(json_array_length('[1,2,3]') AS BIGINT) AS alen,
        |  json_object('k', CAST(json_extract_string(props, '$.k') AS BIGINT))::VARCHAR AS rebuilt
        |FROM events WHERE event_id < 100 ORDER BY event_id""".stripMargin) {
      (s, dir) =>
        Tables.events(s, dir).filter(col("event_id") < 100)
          .selectExpr("event_id",
            "CAST(get_json_object(props, '$.k') AS BIGINT) AS k_val",
            "get_json_object(props, '$') IS NOT NULL AS valid",
            "CASE WHEN props LIKE '{%' THEN 'object' WHEN props LIKE '[%' THEN 'array' ELSE 'scalar' END AS jtype",
            "to_json(json_object_keys(props)) AS keys",
            "CAST(json_array_length('[1,2,3]') AS BIGINT) AS alen",
            "to_json(named_struct('k', CAST(get_json_object(props, '$.k') AS BIGINT))) AS rebuilt")
          .orderBy("event_id")
    },

    // ---- JSON inspection through the DIALECT front-end -------------------
    // The round-10 scalar fuzz battery found JSON_VALID/TYPE/KEYS/OBJECT/
    // EXTRACT missing from GraftSql; this query drives them (plus the
    // unanchored-path normalization and the nulls-FIRST bare-DESC
    // ordering) through the driver gate. The SAME text runs on the
    // reference engine verbatim; the oracle below spells DuckDB's
    // differing type names and null-order default explicitly.
    QueryDef("q_json_inspect",
      """SELECT event_id,
        |  json_valid(props) AS jv,
        |  lower(json_type(props)) AS jt,
        |  CASE WHEN json_type(props, '$.k') IN ('BIGINT','UBIGINT','DOUBLE')
        |       THEN 'number' ELSE lower(json_type(props, '$.k')) END AS jtk,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS kv,
        |  CAST(len(json_keys(props)) AS BIGINT) AS nk,
        |  json_object('k', CAST(json_extract_string(props, '$.k') AS BIGINT))::VARCHAR AS jo
        |FROM events WHERE event_id < 150
        |ORDER BY NULLIF(MOD(CAST(json_extract_string(props, '$.k') AS BIGINT), 7), 0)
        |  DESC NULLS FIRST, event_id""".stripMargin) {
      (s, dir) => {
        Tables.registerAll(s, dir)
        graft.plans.GraftSql.sql(s,
          """SELECT event_id,
            |  JSON_VALID(props) AS jv,
            |  JSON_TYPE(props) AS jt,
            |  JSON_TYPE(JSON_EXTRACT(props, 'k')) AS jtk,
            |  CAST(JSON_EXTRACT(props, 'k') AS BIGINT) AS kv,
            |  CAST(ARRAY_LENGTH(JSON_KEYS(props)) AS BIGINT) AS nk,
            |  JSON_OBJECT('k', CAST(JSON_EXTRACT(props, '$.k') AS BIGINT)) AS jo
            |FROM events WHERE event_id < 150
            |ORDER BY NULLIF(MOD(CAST(JSON_EXTRACT(props, 'k') AS BIGINT), 7), 0) DESC,
            |  event_id""".stripMargin)
      }
    },

    // ---- JS stringification through the DIALECT front-end ----------------
    // The reference renders string-context values with ECMAScript
    // String(v) (binary.js `||`, strings.js function-arg coercion,
    // evaluate.js CAST): String(17.0) = '17', 17.0 LIKE '1%' is TRUE.
    // The dialect text drives graft_js_str/graft_js_cast_str and the
    // ||/ILIKE operand wraps; the DuckDB oracle spells the JS rendering
    // explicitly (integral doubles drop the '.0', everything in this
    // value range renders identically otherwise — both engines print
    // shortest-round-trip digits).
    QueryDef("q_js_render",
      """WITH j AS (
        |  SELECT l_orderkey AS k, l_linenumber AS ln,
        |    CASE WHEN l_quantity = trunc(l_quantity)
        |         THEN CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)
        |         ELSE CAST(l_quantity AS VARCHAR) END AS jq,
        |    CASE WHEN l_quantity/2 = trunc(l_quantity/2)
        |         THEN CAST(CAST(l_quantity/2 AS BIGINT) AS VARCHAR)
        |         ELSE CAST(l_quantity/2 AS VARCHAR) END AS jh,
        |    CASE WHEN l_quantity*2 = trunc(l_quantity*2)
        |         THEN CAST(CAST(l_quantity*2 AS BIGINT) AS VARCHAR)
        |         ELSE CAST(l_quantity*2 AS VARCHAR) END AS jd,
        |    CASE WHEN l_quantity+0.5 = trunc(l_quantity+0.5)
        |         THEN CAST(CAST(l_quantity+0.5 AS BIGINT) AS VARCHAR)
        |         ELSE CAST(l_quantity+0.5 AS VARCHAR) END AS jp
        |  FROM lineitem WHERE l_orderkey < 200)
        |SELECT k, ln, 'q' || jq AS a, jh AS b, jd AS c,
        |  substr(jp, 1, 4) AS d, jq LIKE '1%' AS e
        |FROM j ORDER BY k, ln""".stripMargin) {
      (s, dir) => {
        Tables.registerAll(s, dir)
        graft.plans.GraftSql.sql(s,
          """SELECT l_orderkey AS k, l_linenumber AS ln,
            |  'q' || l_quantity AS a,
            |  CAST(l_quantity / 2 AS VARCHAR) AS b,
            |  UPPER(l_quantity * 2) AS c,
            |  LEFT(l_quantity + 0.5, 4) AS d,
            |  l_quantity LIKE '1%' AS e
            |FROM lineitem WHERE l_orderkey < 200
            |ORDER BY l_orderkey, l_linenumber""".stripMargin)
      }
    },

    // ---- Array functions --------------------------------------------------
    QueryDef("q_array_funcs",
      """SELECT vec_id,
        |  CAST(len(embedding) AS BIGINT) AS dim,
        |  embedding[1] AS first_val,
        |  embedding[64] AS last_val,
        |  CAST(list_position([10, 20, 30], 20) AS BIGINT) AS pos,
        |  CAST(list_position([10, 20, 30], 99) AS BIGINT) AS pos_missing,
        |  list_contains([1, 2, 3], 2) AS has2,
        |  to_json(list_sort([3, 1, 2]))::VARCHAR AS sorted_arr,
        |  to_json(array_concat([1, 2], [3]))::VARCHAR AS cat,
        |  to_json(list_append([1, 2], 3))::VARCHAR AS appended
        |FROM embeddings WHERE vec_id < 50 ORDER BY vec_id""".stripMargin) {
      (s, dir) =>
        t(s, dir, "embeddings").filter(col("vec_id") < 50)
          .selectExpr("vec_id",
            "CAST(size(embedding) AS BIGINT) AS dim",
            "element_at(embedding, 1) AS first_val",
            "element_at(embedding, 64) AS last_val",
            "CAST(array_position(array(10, 20, 30), 20) AS BIGINT) AS pos",
            "CAST(array_position(array(10, 20, 30), 99) AS BIGINT) AS pos_missing",
            "array_contains(array(1, 2, 3), 2) AS has2",
            "to_json(array_sort(array(3, 1, 2))) AS sorted_arr",
            "to_json(concat(array(1, 2), array(3))) AS cat",
            "to_json(array_append(array(1, 2), 3)) AS appended")
          .orderBy("vec_id")
    },

    // ---- Struct dot-access + ['key'] (reference: execute.dot.test.js) ----
    QueryDef("q_struct_access",
      """SELECT o_orderkey,
        |  to_json(struct_pack(k := o_orderkey, price := CAST(o_totalprice AS DECIMAL(18,2))::VARCHAR))::VARCHAR AS st,
        |  struct_pack(k := o_orderkey, price := o_totalprice).price AS via_dot,
        |  struct_pack(k := o_orderkey, price := o_totalprice)['k'] AS via_key
        |FROM orders WHERE o_orderkey < 50 ORDER BY o_orderkey""".stripMargin) {
      (s, dir) =>
        // struct column ships as JSON text (driver comparator can't hash
        // raw structs); price is decimal-stringified so the JSON payload is
        // float-format-proof cross-engine
        t(s, dir, "orders").filter(col("o_orderkey") < 50)
          .selectExpr("o_orderkey",
            "to_json(named_struct('k', o_orderkey, 'price', CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS STRING))) AS st",
            "named_struct('k', o_orderkey, 'price', o_totalprice).price AS via_dot",
            "named_struct('k', o_orderkey, 'price', o_totalprice)['k'] AS via_key")
          .orderBy("o_orderkey")
    },

    // ---- MAP type surface (reference: execute.dot.test.js bracket access;
    // the reference's object values map to Spark's MapType) ----------------
    QueryDef("q_map_funcs",
      """WITH b AS (
        |  SELECT o_orderkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |    CAST(year(o_orderdate) AS BIGINT) AS yr
        |  FROM orders WHERE o_orderkey < 2000)
        |SELECT o_orderkey,
        |  CAST(3 AS BIGINT) AS n_keys,
        |  cents AS cents_v,
        |  CAST(NULL AS BIGINT) AS missing_v,
        |  'cents,key,yr' AS keys_sorted,
        |  concat_ws(',',
        |    CASE WHEN cents > 100000 THEN 'cents' END,
        |    CASE WHEN o_orderkey > 100000 THEN 'key' END,
        |    CASE WHEN yr > 100000 THEN 'yr' END) AS big_keys,
        |  yr * 2 AS doubled_yr,
        |  cents // 100 AS extra_v,
        |  cents * 7 AS zip_v,
        |  yr AS from_arr_v,
        |  cents + yr + o_orderkey AS entries_sum
        |FROM b ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      // the whole MapType surface in one pass: construct (map,
      // map_from_arrays), read (element_at present + missing), reshape
      // (map_keys, map_filter, transform_values, map_concat,
      // map_zip_with), and fold (aggregate over map_values). The oracle
      // computes each output's VALUE directly — maps are the machinery
      // under test, not the output type (map columns don't hash stably
      // across engines, so every column extracts to a scalar/string).
      // All narrow per-row expressions: one scan, codegen, zero shuffles.
      t(s, dir, "orders").filter(col("o_orderkey") < 2000)
        .selectExpr("o_orderkey",
          "CAST(round(o_totalprice * 100) AS BIGINT) AS cents",
          "CAST(year(o_orderdate) AS BIGINT) AS yr")
        .selectExpr("o_orderkey", "cents", "yr",
          "map('cents', cents, 'yr', yr, 'key', o_orderkey) AS m")
        .selectExpr("o_orderkey",
          "CAST(size(m) AS BIGINT) AS n_keys",
          "element_at(m, 'cents') AS cents_v",
          "element_at(m, 'nope') AS missing_v",
          "array_join(array_sort(map_keys(m)), ',') AS keys_sorted",
          "array_join(array_sort(map_keys(map_filter(m, (k, v) -> v > 100000))), ',') AS big_keys",
          "element_at(transform_values(m, (k, v) -> v * 2), 'yr') AS doubled_yr",
          "element_at(map_concat(m, map('extra', cents div 100)), 'extra') AS extra_v",
          "element_at(map_zip_with(m, map('cents', CAST(7 AS BIGINT)), " +
            "(k, a, b) -> coalesce(a, CAST(0 AS BIGINT)) * coalesce(b, CAST(1 AS BIGINT))), 'cents') AS zip_v",
          "element_at(map_from_arrays(array('a', 'b'), array(o_orderkey, yr)), 'b') AS from_arr_v",
          "aggregate(map_values(m), CAST(0 AS BIGINT), (acc, x) -> acc + x) AS entries_sum")
        .orderBy("o_orderkey")
    },

    // ---- Statistical aggregates ------------------------------------------
    QueryDef("q_agg_stats",
      """SELECT c_mktsegment,
        |  round(stddev_samp(c_acctbal), 6) AS sd_samp,
        |  round(stddev_pop(c_acctbal), 6) AS sd_pop,
        |  round(median(c_acctbal), 6) AS med,
        |  round(quantile_cont(c_acctbal, 0.25), 6) AS q25,
        |  CAST(count_if(c_acctbal < 0) AS BIGINT) AS n_neg
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) {
      (s, dir) =>
        t(s, dir, "customer")
          .groupBy("c_mktsegment")
          .agg(
            round(stddev_samp(col("c_acctbal")), 6).as("sd_samp"),
            round(stddev_pop(col("c_acctbal")), 6).as("sd_pop"),
            round(expr("median(c_acctbal)"), 6).as("med"),
            round(expr("percentile_cont(0.25) WITHIN GROUP (ORDER BY c_acctbal)"), 6).as("q25"),
            expr("CAST(count_if(c_acctbal < 0) AS BIGINT)").as("n_neg"))
          .orderBy("c_mktsegment")
    },

    // APPROX_QUANTILE / APPROX_COUNT_DISTINCT are approximate by
    // construction, so the cross-engine contract is BOUNDS, not values:
    // Spark checks its own sketches against its own exact answers and
    // emits booleans; the oracle asserts the same bounds hold (trivially
    // TRUE on the exact engine). A hash match means every sketch landed
    // inside its guaranteed error envelope.
    QueryDef("q_agg_approx",
      """SELECT l_returnflag, TRUE AS med_ok, TRUE AS parts_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, dir) =>
        // bounds come from an INDEPENDENT sketch (rank error ±1/accuracy ≈
        // exact at this envelope width), not an exact percentile — Spark's
        // exact Percentile buffers every value per group. The sketch agg
        // and the exact COUNT(DISTINCT) run as SEPARATE aggregations
        // joined on the 3-row group key: a combined agg plans the distinct
        // rewrite (partial keys = (flag, partkey)), which would build a
        // percentile buffer per partkey group — 20x the whole suite's
        // cost. The default-accuracy median (rank ±1e-4) must land inside
        // the [p45, p55] envelope; the distinct sketch (rsd 1%) inside
        // ±5% of the exact distinct count.
        val li = t(s, dir, "lineitem")
        val sketches = li.groupBy("l_returnflag").agg(
          expr("approx_percentile(l_extendedprice, 0.5)").as("am"),
          expr("approx_percentile(l_extendedprice, array(0.45, 0.55))").as("bounds"),
          expr("approx_count_distinct(l_partkey, 0.01)").as("ac"))
        val exact = li.groupBy("l_returnflag")
          .agg(countDistinct(col("l_partkey")).as("exd"))
        sketches.join(exact, "l_returnflag")
          .selectExpr("l_returnflag",
            "am BETWEEN bounds[0] AND bounds[1] AS med_ok",
            "ac BETWEEN CAST(0.95 * exd AS BIGINT) AND CAST(1.05 * exd AS BIGINT) AS parts_ok")
          .orderBy("l_returnflag")
    },

    // ---- Frequent-items sketch (heavy hitters) --------------------------
    // Same bounds-not-values contract as q_agg_approx: the single-pass
    // frequent-items sketch guarantees every item with frequency >
    // support*n survives, so the check is "each EXACT heavy hitter is
    // covered by the sketch" — booleans both engines can assert. The
    // sketch itself is O(1/support) entries (7 here) regardless of data
    // size: the legitimate tiny-driver-result shape at any scale.
    QueryDef("q_agg_freq",
      """WITH h AS (
        |  SELECT o_orderpriority AS item, count(*) AS n FROM orders GROUP BY 1
        |), tot AS (SELECT count(*) AS t FROM orders)
        |SELECT item, TRUE AS covered FROM h, tot
        |WHERE n > 0.15 * t ORDER BY item""".stripMargin) {
      (s, dir) =>
        val d = t(s, dir, "orders")
        val sketch = d.stat.freqItems(Seq("o_orderpriority"), 0.15)
        d.groupBy(col("o_orderpriority").as("item")).agg(count(lit(1)).as("n"))
          .crossJoin(d.select(count(lit(1)).as("t")))
          .filter(col("n") > col("t") * 0.15)
          .crossJoin(broadcast(sketch))
          .selectExpr("item",
            "array_contains(o_orderpriority_freqItems, item) AS covered")
          .orderBy("item")
    },

    // ---- Mergeable HLL sketches (Datasketches surface) ------------------
    // approx_count_distinct answers one query; hll_sketch_agg produces a
    // MERGEABLE binary sketch — the primitive that lets 1000 executors
    // (or 1000 daily partitions) each build partial sketches that union
    // into the global cardinality without re-reading data. Checked two
    // ways, same bounds-boolean contract as q_agg_approx: the one-pass
    // estimate lands within ±5% of the exact distinct count, and so does
    // the estimate from UNIONING 8 shard-level sketches (the union takes
    // its own sparse/dense path through Datasketches, so it need not be
    // bit-identical to the one-pass sketch — measured here: 1991 vs
    // 2006-2019 vs exact 2000 — but it must keep the error contract).
    QueryDef("q_agg_hll",
      """SELECT l_returnflag, TRUE AS est_ok, TRUE AS merge_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, dir) =>
        val li = t(s, dir, "lineitem")
        val whole = li.groupBy("l_returnflag")
          .agg(expr("hll_sketch_estimate(hll_sketch_agg(l_partkey))").as("est"))
        val merged = li.withColumn("shard", expr("pmod(l_orderkey, 8)"))
          .groupBy("l_returnflag", "shard")
          .agg(expr("hll_sketch_agg(l_partkey)").as("sk"))
          .groupBy("l_returnflag")
          .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_m"))
        val exact = li.groupBy("l_returnflag")
          .agg(countDistinct(col("l_partkey")).as("exd"))
        whole.join(merged, "l_returnflag").join(exact, "l_returnflag")
          .selectExpr("l_returnflag",
            "est BETWEEN CAST(0.95 * exd AS BIGINT) AND CAST(1.05 * exd AS BIGINT) AS est_ok",
            "est_m BETWEEN CAST(0.95 * exd AS BIGINT) AND CAST(1.05 * exd AS BIGINT) AS merge_ok")
          .orderBy("l_returnflag")
    },

    // ---- Collecting aggregates (STRING_AGG / ARRAY_AGG / ANY_VALUE / MIN_BY)
    QueryDef("q_agg_collect",
      """SELECT n_regionkey,
        |  string_agg(n_name, ',' ORDER BY n_name) AS names,
        |  to_json(list_sort(array_agg(n_name)))::VARCHAR AS name_arr,
        |  any_value(n_regionkey) AS anyv,
        |  min_by(n_name, n_nationkey) AS first_name,
        |  max_by(n_name, n_nationkey) AS last_name
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin) {
      (s, dir) =>
        t(s, dir, "nation")
          .groupBy("n_regionkey")
          .agg(
            expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").as("names"),
            to_json(sort_array(collect_list(col("n_name")))).as("name_arr"),
            expr("any_value(n_regionkey)").as("anyv"),
            expr("min_by(n_name, n_nationkey)").as("first_name"),
            expr("max_by(n_name, n_nationkey)").as("last_name"))
          .orderBy("n_regionkey")
    },

    // ---- FILTER (WHERE ...) aggregate clause ------------------------------
    QueryDef("q_agg_filter",
      """SELECT l_returnflag,
        |  CAST(COUNT(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_big,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS disc_rev
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            expr("CAST(COUNT(*) FILTER (WHERE l_quantity > 25) AS BIGINT)").as("n_big"),
            expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) FILTER (WHERE l_discount > 0.05) AS DOUBLE)").as("disc_rev"))
          .orderBy("l_returnflag")
    },

    // ---- UDF surface (reference: async UDFs, README "AI_SCORE") ----------
    // The UDF itself is arbitrary Scala; the oracle re-expresses its logic
    // in SQL. Laziness-under-LIMIT comes from Catalyst pushdown instead of
    // async cells.
    QueryDef("q_udf",
      """SELECT doc_id, CAST(mod(strlen(text), 97) AS BIGINT) AS score
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin) {
      (s, dir) =>
        val score = udf((text: String) => (text.getBytes("UTF-8").length % 97).toLong)
        t(s, dir, "documents").filter(col("doc_id") < 100)
          .select(col("doc_id"), score(col("text")).as("score"))
          .orderBy("doc_id")
    },

    // ---- Async batched scoring (reference: src/validation/functions.js —
    // promise-returning UserDefinedFunction). The Spark shape is
    // AsyncScore.mapBatchesAsync: batches of 32 texts per call, ≤4 calls
    // in flight per partition, order-preserving drain. The scorer here is
    // the deterministic q_udf stub (byte length mod 97) standing in for a
    // remote model endpoint; scores are exact small integers so the
    // double sum is order-independent and the BIGINT cast exact.
    QueryDef("q_async_score",
      """WITH s AS (SELECT source, mod(strlen(text), 97) AS sc FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(sc) AS BIGINT) AS score_sum
        |FROM s GROUP BY source ORDER BY source""".stripMargin) {
      (s, dir) =>
        val scored = graft.operators.AsyncScore.mapBatchesAsync(
          t(s, dir, "documents").select("source", "text"),
          inCol = "text", out = "sc", batchSize = 32, maxInFlight = 4) {
          texts => texts.map(tx => (tx.getBytes("UTF-8").length % 97).toDouble)
        }
        scored.groupBy("source")
          .agg(count(lit(1)).cast("bigint").as("n_docs"),
            sum("sc").cast("bigint").as("score_sum"))
          .orderBy("source")
    }
  )
}
