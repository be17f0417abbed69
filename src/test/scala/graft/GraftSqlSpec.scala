package graft

import graft.plans.GraftSql

/** Dialect front-end: squirreling SQL strings run unchanged on Spark
  * (reference: syntax.md — the constructs users actually hit).
  */
class GraftSqlSpec extends SparkSpec {
  import spark.implicits._

  test("json arrows rewrite to get_json_object") {
    // the input side takes the graft_json_input coercion (JSON text
    // passes through; structs/arrays render to JSON the JS way) so
    // arrows work on non-string columns like the reference
    assert(GraftSql.rewrite("SELECT j -> 'a' FROM t")
      == "SELECT get_json_object(graft_json_input(j), '$.a') FROM t")
    assert(GraftSql.rewrite("SELECT j ->> 'a' FROM t")
      == "SELECT get_json_object(graft_json_input(j), '$.a') FROM t")
    assert(GraftSql.rewrite("SELECT j -> 0 FROM t")
      == "SELECT get_json_object(graft_json_input(j), '$[0]') FROM t")
  }

  test("dialect queries execute end to end") {
    Seq((1L, """{"k": 5, "arr": [10, 20]}""", "a b c"))
      .toDF("id", "j", "s").createOrReplaceTempView("t")
    val row = GraftSql.sql(spark,
      """SELECT id,
        |  j ->> 'k' AS k,
        |  j -> 'arr' ->> 0 AS a0,
        |  string_split(s, ' ') AS parts,
        |  len(string_split(s, ' ')) AS n,
        |  regexp_matches(s, 'a.*c') AS m,
        |  s ILIKE 'A%' AS il,
        |  POSITION('b' IN s) AS pos,
        |  id::STRING AS ids
        |FROM t""".stripMargin).collect().head
    assert(row.getAs[String]("k") == "5")
    assert(row.getAs[String]("a0") == "10")
    assert(row.getSeq[String](row.fieldIndex("parts")) == Seq("a", "b", "c"))
    assert(row.getAs[Int]("n") == 3)
    assert(row.getAs[Boolean]("m"))
    assert(row.getAs[Boolean]("il"))
    assert(row.getAs[Int]("pos") == 3)
    assert(row.getAs[String]("ids") == "1")
  }

  test("postgres regex operators and flags (syntax.md items)") {
    Seq((1, "abc123"), (2, "xyz")).toDF("id", "s").createOrReplaceTempView("rx")
    val rows = GraftSql.sql(spark,
      """SELECT id, s ~ '[0-9]+' AS has_d, s !~ '[0-9]+' AS no_d,
        |  regexp_replace(s, '[0-9]+', '#', 'g') AS repl
        |FROM rx ORDER BY id""".stripMargin).collect()
    assert(rows(0).getBoolean(1) && !rows(0).getBoolean(2))
    assert(rows(0).getString(3) == "abc#")
    assert(!rows(1).getBoolean(1) && rows(1).getBoolean(2))
    val ex = GraftSql.sql(spark, "SELECT * EXCLUDE (s) FROM rx ORDER BY id")
    assert(ex.columns.toSeq == Seq("id"))
  }

  test("epoch maps to unix seconds") {
    val r = GraftSql.sql(spark,
      "SELECT epoch(TIMESTAMP '1970-01-02 00:00:00') AS e").collect().head
    assert(r.getAs[Double]("e") == 86400.0)
  }

  test("json arrows inside HOF lambdas are left alone (no false rewrite)") {
    // the lambda arrow survives; || operands pick up the JS-string
    // coercion wrap like everywhere else (no-op on strings)
    assert(GraftSql.rewrite("SELECT list_transform(xs, x -> 'p' || x) FROM t")
      == "SELECT transform(xs, x -> graft_js_str('p') || graft_js_str(x)) FROM t")
    assert(GraftSql.rewrite("SELECT transform(xs, x -> 0) FROM t")
      == "SELECT transform(xs, x -> 0) FROM t")
    // ...while a JSON arrow passed to a NON-HOF call still rewrites
    assert(GraftSql.rewrite("SELECT lower(j -> 'a') FROM t")
      == "SELECT lower(graft_js_str(get_json_object(graft_json_input(j), '$.a'))) FROM t")
    // and executes: lambda bodies starting with a literal work end to end
    Seq((1L, "a b")).toDF("id", "s").createOrReplaceTempView("hof_t")
    val r = GraftSql.sql(spark,
      "SELECT list_transform(string_split(s, ' '), x -> 'p' || x) AS xs FROM hof_t")
      .collect().head
    assert(r.getSeq[String](0) == Seq("pa", "pb"))
  }

  test("struct_pack / struct_extract rewrite and run (incl. nested)") {
    assert(GraftSql.rewrite("SELECT struct_pack(k := 1, v := 'a') AS st")
      == "SELECT named_struct('k', 1, 'v', 'a') AS st")
    assert(GraftSql.rewrite("SELECT struct_extract(struct_extract(x, 'a'), 'b')")
      == "SELECT ((x).a).b")
    Seq((1L, 2.5)).toDF("k", "p").createOrReplaceTempView("sp_t")
    val r = GraftSql.sql(spark,
      """SELECT struct_pack(k := k, price := p) AS st,
        |  struct_pack(k := k, price := p).price AS via_dot,
        |  struct_extract(struct_pack(k := k, price := p), 'k') AS via_ext
        |FROM sp_t""".stripMargin).collect().head
    assert(r.getAs[Double]("via_dot") == 2.5)
    assert(r.getAs[Long]("via_ext") == 1L)
    // the q_struct_access oracle's own dialect SQL must run through the
    // front-end (VERDICT gap: its struct_pack was previously unrunnable)
    graft.sources.Tables.registerAll(spark, "/root/testdata/sf0.001")
    val st = GraftSql.sql(spark,
      """SELECT o_orderkey,
        |  struct_pack(k := o_orderkey, price := o_totalprice) AS st
        |FROM orders ORDER BY o_orderkey LIMIT 3""".stripMargin).collect()
    assert(st.length == 3 && st.head.getStruct(1).getAs[Long]("k") == st.head.getAs[Long]("o_orderkey"))
  }

  test("json_group_array / json_group_object / list() aggregates") {
    // single sorted input partition → deterministic collect order; object
    // keys are distinct within each group (duplicate JSON keys are
    // undefined in both engines)
    Seq(("g1", "a", 1L), ("g1", "b", 2L), ("g2", "c", 3L)).toDF("g", "k", "v")
      .coalesce(1).sortWithinPartitions("v").createOrReplaceTempView("jg_t")
    val rows = GraftSql.sql(spark,
      """SELECT g, json_group_array(v) AS ja, json_group_object(k, v) AS jo,
        |  list(v) AS vs
        |FROM jg_t GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(rows(0).getAs[String]("ja") == "[1,2]")
    assert(rows(1).getAs[String]("ja") == "[3]")
    assert(rows(0).getAs[String]("jo") == """{"a":1,"b":2}""")
    assert(rows(1).getAs[String]("jo") == """{"c":3}""")
    assert(rows(0).getSeq[Long](rows(0).fieldIndex("vs")).sorted == Seq(1L, 2L))
  }

  test("regexp_split_to_array / regexp_split_to_table / charindex") {
    Seq(("a1b22c", 0)).toDF("s", "z").createOrReplaceTempView("rs_t")
    val r = GraftSql.sql(spark,
      "SELECT regexp_split_to_array(s, '[0-9]+') AS parts FROM rs_t").collect().head
    assert(r.getSeq[String](0) == Seq("a", "b", "c"))
    val tbl = GraftSql.sql(spark,
      "SELECT regexp_split_to_table('x,y,z', ',') AS part").collect().map(_.getString(0))
    assert(tbl.toSeq == Seq("x", "y", "z"))
    val ci = GraftSql.sql(spark,
      "SELECT charindex('b', 'abc') AS i, charindex('q', 'abc') AS missing").collect().head
    assert(ci.getAs[Int]("i") == 2 && ci.getAs[Int]("missing") == 0)
  }

  test("to_timestamp / strftime") {
    val r = GraftSql.sql(spark,
      """SELECT CAST(to_timestamp(86400) AS STRING) AS ts,
        |  strftime(TIMESTAMP '2020-03-04 05:06:07', '%Y-%m-%d %H:%M:%S') AS f,
        |  strftime(TIMESTAMP '2020-03-04 05:06:07', '%j %% %y') AS f2""".stripMargin)
      .collect().head
    // CAST(timestamp AS STRING) follows the reference's JSON.stringify
    // path: QUOTED ISO with millis (evaluate.js:703-706 + utils.js:158;
    // probed: CAST(TIMESTAMP '1970-01-02 00:00:00' AS VARCHAR) returns
    // the quotes in the value)
    assert(r.getAs[String]("ts") == "\"1970-01-02T00:00:00.000Z\"")
    assert(r.getAs[String]("f") == "2020-03-04 05:06:07")
    assert(r.getAs[String]("f2") == "064 % 20")
  }

  test("TYPEOF returns dialect type names") {
    val r = GraftSql.sql(spark,
      "SELECT typeof(42) AS i, typeof('x') AS s, typeof(1.5D) AS d, typeof(CAST(1 AS BIGINT)) AS b")
      .collect().head
    assert(r.getAs[String]("i") == "INTEGER")
    assert(r.getAs[String]("s") == "VARCHAR")
    assert(r.getAs[String]("d") == "DOUBLE")
    assert(r.getAs[String]("b") == "BIGINT")
  }

  test("DISTINCT ON keeps the first row per key in ORDER BY order") {
    Seq(("a", 1L, "x"), ("a", 3L, "y"), ("b", 2L, "z"))
      .toDF("k", "v", "tag").createOrReplaceTempView("don_t")
    val rows = GraftSql.sql(spark,
      "SELECT DISTINCT ON (k) k, v, tag FROM don_t ORDER BY k, v DESC").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
      == Seq(("a", 3L, "y"), ("b", 2L, "z")))
    // no ORDER BY: one arbitrary-but-single row per key
    val n = GraftSql.sql(spark, "SELECT DISTINCT ON (k) k, v FROM don_t").collect()
    assert(n.map(_.getString(0)).sorted.toSeq == Seq("a", "b"))
    // the idiomatic Postgres shape: projection does NOT include the
    // ON/ORDER BY columns — they resolve against the base table
    val p = GraftSql.sql(spark,
      "SELECT DISTINCT ON (k) tag FROM don_t ORDER BY k, v DESC").collect()
    assert(p.map(_.getString(0)).toSeq == Seq("y", "z"))
    // ORDER BY ... LIMIT applies AFTER dedup
    val lim = GraftSql.sql(spark,
      "SELECT DISTINCT ON (k) k, v FROM don_t ORDER BY k, v DESC LIMIT 1").collect()
    assert(lim.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("a", 3L)))
    // LIMIT with no ORDER BY also applies after dedup (1 of the 2 keys)
    val lim2 = GraftSql.sql(spark,
      "SELECT DISTINCT ON (k) k, v FROM don_t LIMIT 1").collect()
    assert(lim2.length == 1)
    // LIMIT + OFFSET both survive and apply post-dedup
    val lo = GraftSql.sql(spark,
      "SELECT DISTINCT ON (k) k, v FROM don_t ORDER BY k, v DESC LIMIT 1 OFFSET 1").collect()
    assert(lo.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("b", 2L)))
    // ORDER BY on a select-list ALIAS and by ORDINAL resolve to the
    // underlying expressions (a window can't use lateral aliases/ordinals)
    val al = GraftSql.sql(spark,
      "SELECT DISTINCT ON (k) k, v * 10 AS score FROM don_t ORDER BY k, score DESC").collect()
    assert(al.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("a", 30L), ("b", 20L)))
    val ord = GraftSql.sql(spark,
      "SELECT DISTINCT ON (k) k, v FROM don_t ORDER BY 1, 2 DESC").collect()
    assert(ord.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("a", 3L), ("b", 2L)))
    // identifiers CONTAINING keyword substrings don't confuse the surgery
    Seq(("a", 1L), ("b", 2L)).toDF("k", "ts_offset").createOrReplaceTempView("kw_t")
    val kw = GraftSql.sql(spark,
      "SELECT DISTINCT ON (k) k, ts_offset FROM kw_t ORDER BY k, ts_offset").collect()
    assert(kw.length == 2)
  }

  test("arrows rewrite inside SQL FILTER (WHERE ...) and EXISTS (SELECT ...)") {
    // 'filter'/'exists' are HOF names AND SQL constructs — only the HOF
    // form carries lambdas; the SQL forms must still get arrow rewriting
    Seq((1L, """{"k": 1}"""), (2L, """{"k": 2}""")).toDF("id", "props")
      .createOrReplaceTempView("fw_t")
    val r = GraftSql.sql(spark,
      "SELECT count(*) FILTER (WHERE props ->> 'k' = '1') AS n FROM fw_t").collect().head
    assert(r.getAs[Long]("n") == 1L)
    val e = GraftSql.sql(spark,
      """SELECT id FROM fw_t t WHERE EXISTS (
        |  SELECT 1 FROM fw_t u WHERE u.props ->> 'k' = '2' AND u.id = t.id)
        |ORDER BY id""".stripMargin).collect()
    assert(e.map(_.getLong(0)).toSeq == Seq(2L))
    // ...while the HOF spelling of filter keeps its lambda untouched
    assert(GraftSql.rewrite("SELECT filter(xs, x -> 5) FROM t")
      == "SELECT filter(xs, x -> 5) FROM t")
  }

  test("rewrites leave string literals alone") {
    val r = GraftSql.sql(spark,
      """SELECT 'use strlen( and list( here' AS a,
        |  'x GLOB ''a*'' stays' AS b""".stripMargin).collect().head
    assert(r.getString(0) == "use strlen( and list( here")
    assert(r.getString(1) == "x GLOB 'a*' stays")
  }

  test("GLOB translates to an anchored regex") {
    Seq(("alpha.txt", 1), ("beta.dat", 2), ("a1c", 3)).toDF("s", "id")
      .createOrReplaceTempView("glob_t")
    val rows = GraftSql.sql(spark,
      """SELECT id, s GLOB 'a*.txt' AS t1, s GLOB 'a?c' AS t2, s GLOB '*[0-9]*' AS t3
        |FROM glob_t ORDER BY id""".stripMargin).collect()
    assert(rows(0).getBoolean(1) && !rows(0).getBoolean(2) && !rows(0).getBoolean(3))
    assert(!rows(1).getBoolean(1) && !rows(1).getBoolean(2) && !rows(1).getBoolean(3))
    assert(!rows(2).getBoolean(1) && rows(2).getBoolean(2) && rows(2).getBoolean(3))
    // negated class [!...] means "any char except"
    val neg = GraftSql.sql(spark,
      "SELECT 'abc' GLOB '[!x]bc' AS t1, 'xbc' GLOB '[!x]bc' AS t2").collect().head
    assert(neg.getBoolean(0) && !neg.getBoolean(1))
  }

  test("json_query maps to get_json_object") {
    val r = GraftSql.sql(spark,
      """SELECT json_query('{"a": {"b": 7}}', '$.a') AS frag""").collect().head
    assert(r.getAs[String]("frag") == """{"b":7}""")
  }

  test("numeric array indexing is 0-based (reference JS semantics)") {
    // syntax.md item 2: col[0], col[0].field — Spark SQL arrays are
    // 0-based, exactly the reference's JS semantics; pin it
    Seq((1L, Seq("a", "b"), Seq((10L, "x"), (20L, "y"))))
      .toDF("id", "arr", "st_arr").createOrReplaceTempView("idx_t")
    val r = GraftSql.sql(spark,
      "SELECT arr[0] AS first, arr[1] AS second, st_arr[1]._1 AS nested FROM idx_t")
      .collect().head
    assert(r.getAs[String]("first") == "a")
    assert(r.getAs[String]("second") == "b")
    assert(r.getAs[Long]("nested") == 20L)
  }

  test("DAYOFWEEK / WEEKDAY follow date_part('dow') with Sunday = 0") {
    // 2020-01-05 was a Sunday
    val r = GraftSql.sql(spark,
      """SELECT dayofweek(DATE '2020-01-05') AS sun,
        |  weekday(DATE '2020-01-06') AS mon,
        |  char(65) AS a
        |FROM (SELECT 1)""".stripMargin).collect().head
    assert(r.getAs[Int]("sun") == 0)
    assert(r.getAs[Int]("mon") == 1)
    assert(r.getAs[String]("a") == "A")
  }

  test("reference aliases: JSON_VALUE / JSON_ARRAYAGG / LIST_LENGTH") {
    Seq((1L, """{"a": 7}""", "x y z")).toDF("id", "j", "s")
      .createOrReplaceTempView("alias_t")
    val r = GraftSql.sql(spark,
      """SELECT json_value(j, '$.a') AS jv,
        |  list_length(string_split(s, ' ')) AS ll,
        |  json_arrayagg(id) AS ja
        |FROM alias_t GROUP BY j, s""".stripMargin).collect().head
    assert(r.getAs[String]("jv") == "7")
    assert(r.getAs[Int]("ll") == 3)
    assert(r.getAs[String]("ja") == "[1]")
  }

  test("validate reports analysis errors without executing anything") {
    Seq((1, "a")).toDF("id", "s").createOrReplaceTempView("val_t")
    assert(GraftSql.validate(spark, "SELECT id FROM val_t").isRight)
    // dialect forms validate too (rewrite runs before analysis)
    assert(GraftSql.validate(spark, "SELECT len(string_split(s, ' ')) FROM val_t").isRight)
    val missingTable = GraftSql.validate(spark, "SELECT * FROM no_such_table")
    assert(missingTable.isLeft && missingTable.left.exists(_.contains("TABLE_OR_VIEW_NOT_FOUND")),
      missingTable)
    val missingCol = GraftSql.validate(spark, "SELECT nope FROM val_t")
    assert(missingCol.isLeft && missingCol.left.exists(_.contains("UNRESOLVED_COLUMN")), missingCol)
    val badArity = GraftSql.validate(spark, "SELECT upper(s, s) FROM val_t")
    assert(badArity.isLeft, badArity)
    val badSyntax = GraftSql.validate(spark, "SELECT FROM WHERE")
    assert(badSyntax.isLeft, badSyntax)
  }

  test("validate never throws on adversarial rewrite inputs") {
    Seq((1, "a")).toDF("id", "s").createOrReplaceTempView("val_t")
    // an ORDER BY ordinal wider than Int once crashed the DISTINCT ON
    // rewriter with NumberFormatException before analysis could run —
    // every such input must come back as Either, never an exception
    val hugeOrd = GraftSql.validate(spark,
      "SELECT DISTINCT ON (id) id FROM val_t ORDER BY 9999999999999")
    assert(hugeOrd.isLeft || hugeOrd.isRight) // total: no throw
    // (a bigint ORDER BY literal is outside orderByOrdinal's Int range, so
    // Spark legally orders by a constant — Right is the correct verdict;
    // the defect being pinned was the rewriter crashing before analysis)
    val hugeOrdPlain = GraftSql.validate(spark, "SELECT id FROM val_t ORDER BY 9999999999999")
    assert(hugeOrdPlain.isLeft || hugeOrdPlain.isRight)
    // in-range ordinals still resolve through the rewriter
    assert(GraftSql.validate(spark,
      "SELECT DISTINCT ON (id) id, s FROM val_t ORDER BY 1, 2 DESC").isRight)
  }

  test("plan exposes the optimized logical plan without executing") {
    // a file-backed table (a local Seq view would be constant-folded into
    // a LocalRelation wholesale, hiding the plan shape under test)
    spark.read.parquet("/root/testdata/sf0.001/part.parquet")
      .createOrReplaceTempView("pl_t")
    // pushdown is visible: the filter sits against the relation, constant
    // arithmetic is folded away
    val p = GraftSql.plan(spark,
      "SELECT p_partkey + (1 + 1) AS x FROM pl_t WHERE p_partkey > 1")
    assert(p.contains("Filter"), p)
    assert(p.contains("+ 2"), s"constant folding not visible:\n$p")
    assert(!p.contains("1 + 1"), p)
    // a VALUES-only query optimizes to a LocalRelation — no scan at all
    val v = GraftSql.plan(spark, "SELECT 2 * 3 AS six")
    assert(v.contains("LocalRelation") || v.contains("OneRowRelation"), v)
  }

  test("maxRows mirrors the reference's static result bounds") {
    Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "s").createOrReplaceTempView("mr_t")
    def m(sql: String) = GraftSql.maxRows(spark, sql)
    assert(m("SELECT * FROM mr_t LIMIT 2").contains(2L))
    assert(m("SELECT * FROM mr_t LIMIT 10 OFFSET 2").contains(10L)) // bound, not exact
    assert(m("VALUES (1), (2), (3)").contains(3L))
    assert(m("SELECT count(*) FROM mr_t").contains(1L))   // scalar agg is 1 row
    assert(m("SELECT * FROM mr_t").isEmpty)               // unbounded scan
    // bounds compose through unions of bounded branches
    assert(m("SELECT 1 AS x UNION ALL SELECT 2").contains(2L))
  }

  test("tables() mirrors the reference extractTables semantics") {
    def t(sql: String) = GraftSql.tables(spark, sql)
    assert(t("SELECT * FROM users") == Seq("users"))
    assert(t("SELECT * FROM a JOIN b ON a.id = b.aid LEFT JOIN c ON c.bid = b.id")
      == Seq("a", "b", "c"))
    assert(t("SELECT * FROM a x JOIN a y ON x.id = y.parent_id") == Seq("a"))
    assert(t("SELECT * FROM (SELECT id FROM inner_t) sub") == Seq("inner_t"))
    assert(t("SELECT * FROM a WHERE a.id IN (SELECT b_id FROM b)") == Seq("a", "b"))
    assert(t("SELECT * FROM a WHERE EXISTS (SELECT 1 FROM b WHERE b.aid = a.id)")
      == Seq("a", "b"))
    assert(t("SELECT (SELECT MAX(x) FROM b) AS m FROM a") == Seq("a", "b"))
    assert(t("SELECT id FROM a UNION ALL SELECT id FROM b") == Seq("a", "b"))
    assert(t("SELECT id FROM a INTERSECT SELECT id FROM b EXCEPT SELECT id FROM c")
      == Seq("a", "b", "c"))
    // CTE names are not tables; sibling CTEs may reference earlier ones
    assert(t("WITH cte AS (SELECT * FROM users) SELECT * FROM cte") == Seq("users"))
    assert(t("WITH foo AS (SELECT * FROM users), bar AS (SELECT * FROM foo) SELECT * FROM bar")
      == Seq("users"))
    assert(t("WITH Cte AS (SELECT * FROM users) SELECT * FROM CTE") == Seq("users"))
    assert(t("WITH outer_cte AS (WITH inner_cte AS (SELECT * FROM users) SELECT * FROM inner_cte) SELECT * FROM outer_cte")
      == Seq("users"))
    // a CTE inside a subquery does not shadow the outer scope
    assert(t("SELECT * FROM users WHERE EXISTS (WITH users AS (SELECT * FROM other) SELECT * FROM users)")
      == Seq("users", "other"))
    assert(t("SELECT * FROM a JOIN b ON a.id = (SELECT MAX(x) FROM c)")
      == Seq("a", "b", "c"))
    assert(t("SELECT CASE WHEN x IN (SELECT y FROM b) THEN 1 ELSE (SELECT z FROM c) END FROM a")
      == Seq("a", "b", "c"))
    assert(t("SELECT COUNT(*) FILTER (WHERE id IN (SELECT id FROM b)) FROM a")
      == Seq("a", "b"))
  }

  test("list_slice / array_to_string / list_min / ord translate and run") {
    // list_slice's inclusive 1-based end becomes slice's length argument
    assert(GraftSql.rewrite("SELECT list_slice(xs, 2, 5) FROM t")
      == "SELECT slice(xs, 2, (5) - (2) + 1) FROM t")
    Seq((1L, "a b c d e")).toDF("id", "s").createOrReplaceTempView("slice_t")
    val r = GraftSql.sql(spark,
      """SELECT array_to_string(list_slice(string_split(s, ' '), 2, 4), '-') AS mid,
        |  list_min(list_transform(string_split(s, ' '), x -> ord(x))) AS lo
        |FROM slice_t""".stripMargin).collect().head
    assert(r.getAs[String]("mid") == "b-c-d")
    assert(r.getAs[Int]("lo") == 'a'.toInt)
  }

  test("derivedAlias mirrors the reference's default names (alias.js)") {
    // reference: src/expression/alias.js:11 — hosts round-trip unnamed
    // projection columns through these exact derived names
    assert(GraftSql.derivedAlias("a") == "a")
    assert(GraftSql.derivedAlias("42") == "42")
    assert(GraftSql.derivedAlias("a + b") == "a_+_b")
    assert(GraftSql.derivedAlias("a - b * c") == "a_-_b_*_c")
    assert(GraftSql.derivedAlias("COUNT(*)") == "count_all")
    assert(GraftSql.derivedAlias("SUM(x)") == "sum_x")
    assert(GraftSql.derivedAlias("coalesce(a, b, 0)") == "coalesce_a_b_0")
    assert(GraftSql.derivedAlias("CAST(x AS INT)") == "x_as_int")
    assert(GraftSql.derivedAlias("-x") == "-_x")
    assert(GraftSql.derivedAlias("NOT flag") == "not_flag")
    assert(GraftSql.derivedAlias("a AND b") == "a_and_b")
    assert(GraftSql.derivedAlias("s.field") == "field")
    assert(GraftSql.derivedAlias("arr[1]") == "arr[1]")
    assert(GraftSql.derivedAlias("upper(lower(name))") == "upper_lower_name")
  }

  test("sqlDerived applies derived names to unaliased projections only") {
    Seq((1L, 2L, "x"), (3L, 4L, "y")).toDF("a", "b", "s")
      .createOrReplaceTempView("da_t")
    val df = GraftSql.sqlDerived(spark,
      "SELECT a, a + b, COUNT(*) OVER () , b AS kept, SUM(a) FROM da_t GROUP BY a, b, s")
    assert(df.columns.toSeq == Seq("a", "a_+_b", "count", "kept", "sum_a"))
    // a star keeps Spark's expansion; trailing derived item still renames
    val star = GraftSql.sqlDerived(spark, "SELECT *, a + b FROM da_t")
    assert(star.columns.toSeq == Seq("a", "b", "s", "a_+_b"))
  }

  test("fuzz-found reference semantics: LIKE case-insensitive, POSITION order, array nulls") {
    // reference LIKE compiles with the `i` regex flag
    // (src/expression/binary.js:64) — found by FuzzSpec, pinned here
    val like = GraftSql.sql(spark,
      "SELECT 'EUROPE' LIKE '%e' AS a, 'EUROPE' NOT LIKE 'eur%' AS b").collect().head
    assert(like.getAs[Boolean]("a") && !like.getAs[Boolean]("b"))
    // POSITION/STRPOS are (haystack, needle) in the reference
    // (src/expression/strings.js:172) — Spark's comma-form position is
    // reversed, so both map to instr
    val pos = GraftSql.sql(spark,
      "SELECT POSITION('abcdef', 'cd') AS p, STRPOS('abcdef', 'q') AS s, " +
        "POSITION('cd' IN 'abcdef') AS pin").collect().head
    assert(pos.getAs[Int]("p") == 3 && pos.getAs[Int]("s") == 0 &&
      pos.getAs[Int]("pin") == 3)
    // ARRAY_POSITION returns NULL when absent (evaluate.js:597), not 0;
    // ARRAY_LENGTH / ARRAY_CONCAT spell size / concat
    val arr = GraftSql.sql(spark,
      "SELECT ARRAY_POSITION(STRING_SPLIT('a b c', ' '), 'z') AS miss, " +
        "LIST_POSITION(STRING_SPLIT('a b c', ' '), 'b') AS hit, " +
        "ARRAY_LENGTH(STRING_SPLIT('a b', ' ')) AS al, " +
        "LEN(ARRAY_CONCAT(STRING_SPLIT('a b', ' '), STRING_SPLIT('c', ' '))) AS cc").collect().head
    assert(arr.isNullAt(arr.fieldIndex("miss")))
    // graft_array_position (runtime-dispatched like the reference)
    // returns INT, not Spark array_position's BIGINT
    assert(arr.getAs[Int]("hit") == 2 && arr.getAs[Int]("al") == 2 &&
      arr.getAs[Int]("cc") == 3)
    // PERCENTILE_CONT(fraction, expr) / APPROX_QUANTILE(expr, fraction)
    // both interpolate EXACTLY in the reference (evaluate.js:314-350)
    val pc = GraftSql.sql(spark,
      "SELECT PERCENTILE_CONT(0.5, x) AS m, APPROX_QUANTILE(x, 0.25) AS q " +
        "FROM VALUES (1), (2), (4), (8) AS t(x)").collect().head
    assert(pc.getAs[Double]("m") == 3.0 && pc.getAs[Double]("q") == 1.75)
    // ROUND is float-scaled Math.round (math.js:56): half rounds toward
    // +∞ on the SCALED DOUBLE — Spark's native decimal-string HALF_UP
    // round gives -588.5 and -3 for these; 1.005·100 lands BELOW the
    // half (100.49999...) so it truncates where decimal HALF_UP rounds
    // up. All four values verified against node's Math.round.
    val rd = GraftSql.sql(spark,
      "SELECT ROUND(-588.45, 1) AS a, ROUND(CAST(1.005 AS DOUBLE), 2) AS b, " +
        "ROUND(2.5) AS c, ROUND(-2.5) AS d").collect().head
    assert(rd.getAs[Double]("a") == -588.4, rd)
    assert(rd.getAs[Double]("b") == 1.0, rd)
    // DOUBLE in every branch — the JS number type
    assert(rd.getAs[Double]("c") == 3.0 && rd.getAs[Double]("d") == -2.0, rd)
  }

  test("fuzz-found regexp/split semantics: position args, NULL on miss, literal delimiters") {
    // REGEXP_EXTRACT == REGEXP_SUBSTR in the reference (regexp.js:18):
    // whole match, NULL on miss, 3rd arg = 1-based search POSITION (not
    // Spark's capture-group index), 4th = occurrence
    val r1 = GraftSql.sql(spark,
      "SELECT REGEXP_EXTRACT('abc123def456', '[0-9]+') AS a, " +
        "REGEXP_EXTRACT('abc', '[0-9]+') AS miss, " +
        "REGEXP_EXTRACT('abc123def456', '[0-9]+', 5) AS pos, " +
        "REGEXP_SUBSTR('abc123def456', '[0-9]+', 1, 2) AS occ").collect().head
    assert(r1.getAs[String]("a") == "123")
    assert(r1.isNullAt(r1.fieldIndex("miss")), "no match must be NULL, not ''")
    assert(r1.getAs[String]("pos") == "23", "3rd arg is a search position")
    assert(r1.getAs[String]("occ") == "456")
    // REGEXP_REPLACE 5-arg: replace only the occurrence-th match;
    // position preserves the prefix (regexp.js:126-166)
    val r2 = GraftSql.sql(spark,
      "SELECT REGEXP_REPLACE('a1b2c3', '[0-9]', '#', 1, 2) AS occ2, " +
        "REGEXP_REPLACE('a1b2c3', '[0-9]', '#', 4) AS pos4").collect().head
    assert(r2.getAs[String]("occ2") == "a1b#c3")
    assert(r2.getAs[String]("pos4") == "a1b#c#")
    // STRING_SPLIT's delimiter is a LITERAL (strings.js:165), never a
    // regex: '.' must not split on every character, ' )' must not throw
    val r3 = GraftSql.sql(spark,
      "SELECT LEN(STRING_SPLIT('a.b.c', '.')) AS dots, " +
        "LEN(STRING_SPLIT('x )y )z', ' )')) AS paren, " +
        "LEN(STRING_SPLIT('a|b', SUBSTR('|x', 1, 1))) AS dyn").collect().head
    assert(r3.getAs[Int]("dots") == 3, "literal dot, 3 parts")
    assert(r3.getAs[Int]("paren") == 3)
    assert(r3.getAs[Int]("dyn") == 2, "computed delimiter quotes at runtime")
  }

  test("fuzz-found JSON inspection family: VALID/TYPE/KEYS/OBJECT/EXTRACT semantics") {
    // JSON_VALID is JS-strict (evaluate.js:502): the WHOLE input must be
    // one JSON value — '"a":1}' parses a leading scalar then has
    // trailing garbage, which Spark's lenient variant parser accepted
    // until the scalar fuzz battery flagged it
    val v = GraftSql.sql(spark,
      """SELECT JSON_VALID('{"a":1}') AS ok, JSON_VALID('"a":1}') AS trail,
         JSON_VALID('null') AS jn, JSON_VALID('{bad') AS bad""").collect().head
    assert(v.getAs[Boolean]("ok") && !v.getAs[Boolean]("trail"))
    assert(v.getAs[Boolean]("jn") && !v.getAs[Boolean]("bad"))
    // JSON_TYPE returns the JS typeof of the PARSED value
    // (evaluate.js:514-533)
    val t = GraftSql.sql(spark,
      """SELECT JSON_TYPE('{"a":1}') AS o, JSON_TYPE('[1]') AS a,
         JSON_TYPE('3') AS n, JSON_TYPE('"x"') AS s,
         JSON_TYPE('true') AS b, JSON_TYPE('null') AS z""").collect().head
    assert(Seq("o", "a", "n", "s", "b", "z").map(t.getAs[String]) ==
      Seq("object", "array", "number", "string", "boolean", "null"))
    // JSON_KEYS: document-order keys, null on non-objects
    // (evaluate.js:536); JSON_OBJECT keeps null fields like
    // JSON.stringify (evaluate.js:477); JSON_EXTRACT paths work with or
    // without the $ anchor (evaluate.js:660)
    val k = GraftSql.sql(spark,
      """SELECT JSON_KEYS('{"b":1,"a":2}') AS ks, JSON_KEYS('[1]') AS na,
         JSON_OBJECT('k', CAST(NULL AS INT)) AS obj,
         JSON_EXTRACT('{"a":{"b":7}}', 'a.b') AS noanchor,
         JSON_EXTRACT('{"a":[5,6]}', '$.a[1]') AS idx""").collect().head
    assert(k.getSeq[String](0) == Seq("b", "a"))
    assert(k.isNullAt(1))
    assert(k.getAs[String]("obj") == """{"k":null}""")
    assert(k.getAs[String]("noanchor") == "7")
    assert(k.getAs[String]("idx") == "6")
  }

  test("fuzz-found null ordering: bare DESC sorts nulls FIRST (execute/utils.js:21)") {
    // the reference's comparator handles nulls BEFORE the direction flip,
    // so nulls lead under both ASC and bare DESC; only explicit
    // NULLS LAST moves them to the end. Spark's bare-DESC default is
    // nulls-last — the rewrite adds the modifier.
    Seq((1, Some(5)), (2, None), (3, Some(1)))
      .toDF("k", "x").createOrReplaceTempView("no_t")
    def ks(q: String): Seq[Int] =
      GraftSql.sql(spark, q).collect().map(_.getInt(0)).toSeq
    assert(ks("SELECT k FROM no_t ORDER BY x DESC, k") == Seq(2, 1, 3))
    assert(ks("SELECT k FROM no_t ORDER BY x ASC, k") == Seq(2, 3, 1))
    assert(ks("SELECT k FROM no_t ORDER BY x DESC NULLS LAST, k") == Seq(1, 3, 2))
    assert(ks("SELECT k FROM no_t ORDER BY x NULLS LAST, k") == Seq(3, 1, 2))
    // windows sort through the same comparator — bare DESC inside OVER()
    // gets the modifier too
    val rn = GraftSql.sql(spark,
      "SELECT k, ROW_NUMBER() OVER (ORDER BY x DESC) AS rn FROM no_t")
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(rn(2) == 1, s"null x must rank first under bare DESC, got $rn")
  }

  test("fuzz-found NOT IN null semantics: two-valued logic via NOT EXISTS (join.js:283)") {
    // a NULL in the subquery must not empty the result — the reference
    // walks sqlEquals (JS ==, execute/utils.js:136-139) per probe, so
    // non-matching rows survive; Spark's standard NOT IN null-poisons.
    // And because null == null is TRUE there, a NULL lhs is KEPT only
    // when the subquery carries NO null — with a null-bearing subquery
    // the null probe MATCHES and the row drops (live-probed round 12;
    // this pin previously asserted the null-lhs row kept in both
    // cases, which the reference contradicts). The rewrite also
    // upgrades the plan: plain anti join instead of null-aware.
    Seq(Some(1), Some(2), Some(3), None).toDF("k").createOrReplaceTempView("nin_a")
    Seq(Some(2), None).toDF("v").createOrReplaceTempView("nin_b")
    val r = GraftSql.sql(spark,
      "SELECT k FROM nin_a WHERE k NOT IN (SELECT v FROM nin_b) ORDER BY k")
      .collect().map(r => if (r.isNullAt(0)) -1 else r.getInt(0)).toSeq
    assert(r == Seq(1, 3), s"expected reference two-valued rows, got $r")
    Seq(Some(2)).toDF("v").createOrReplaceTempView("nin_b2")
    val r2 = GraftSql.sql(spark,
      "SELECT k FROM nin_a WHERE k NOT IN (SELECT v FROM nin_b2) ORDER BY k")
      .collect().map(r => if (r.isNullAt(0)) -1 else r.getInt(0)).toSeq
    assert(r2 == Seq(-1, 1, 3), s"null lhs kept when the subquery has no null, got $r2")
    // the plan is a plain LeftAnti, never the null-aware build
    val plan = GraftSql.sql(spark,
      "SELECT k FROM nin_a WHERE k NOT IN (SELECT v FROM nin_b)")
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti") && !plan.contains("NAAJ"), plan)
    // CORRELATED NOT IN falls back to the unrewritten (SQL-semantics)
    // text instead of failing analysis
    val corr = GraftSql.sql(spark,
      "SELECT k FROM nin_a a WHERE k NOT IN (SELECT v FROM nin_b b WHERE b.v = a.k)")
    assert(corr.columns.sameElements(Array("k")))
  }

  test("fuzz-found lenient numeric casts: garbage null, '12.7' truncates, '' is zero") {
    // reference CAST goes through JS Number() (evaluate.js:711-726):
    // NaN → null (never an error), Math.trunc for integer targets, and
    // the Number('') = 0 quirk. Spark's ANSI CAST throws on all three.
    val r = GraftSql.sql(spark,
      """SELECT CAST('abc' AS BIGINT) AS a, CAST('12.7' AS BIGINT) AS b,
         CAST('' AS INT) AS c, CAST('  ' AS DOUBLE) AS d,
         CAST('1e3' AS BIGINT) AS e, CAST(' 8 ' AS INT) AS f,
         CAST(12.9 AS BIGINT) AS g, CAST('x' AS DOUBLE) AS h""").collect().head
    assert(r.isNullAt(0) && r.isNullAt(7))
    assert(r.getAs[Long]("b") == 12L && r.getAs[Int]("c") == 0)
    assert(r.getAs[Double]("d") == 0.0 && r.getAs[Long]("e") == 1000L)
    assert(r.getAs[Int]("f") == 8 && r.getAs[Long]("g") == 12L)
    // non-numeric targets keep ANSI semantics (DECIMAL/STRING untouched)
    val d = GraftSql.sql(spark,
      "SELECT CAST('12.75' AS DECIMAL(10,2)) AS x").collect().head
    assert(d.getDecimal(0).doubleValue() == 12.75)
  }

  test("fuzz-found zero divisors: division/modulo never error (JS Infinity/NaN)") {
    // reference: 5/0 = Infinity, 5%0 = NaN — never an error, and both
    // serialize as null on its JSON surface. Spark ANSI throws
    // DIVIDE_BY_ZERO even for doubles; the divisor guard (nullif) and
    // MOD → try_mod map zero divisors to null.
    val r = GraftSql.sql(spark,
      """SELECT 5 / 0 AS a, 5 % 0 AS b, MOD(5, 0) AS c, 7 / 2 AS d,
         MOD(-7, 3) AS e, -7 % 3 AS f, 10 / (2 - 2) AS g""").collect().head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(6))
    assert(r.getAs[Double]("d") == 3.5)
    assert(r.getAs[Int]("e") == -1 && r.getAs[Int]("f") == -1)
    // strftime %-formats live in string literals — the guard must not
    // touch them
    val f = GraftSql.sql(spark,
      "SELECT STRFTIME(TO_TIMESTAMP(0), '%H') AS h").collect().head
    assert(f.getAs[String]("h") == "00")
  }

  test("fuzz-found REFERENCE bug: ORDER BY expr must not overwrite a select item") {
    // The reference injects the ORDER BY expression as a hidden sort
    // column; when that term and a select item are both
    // NULLIF(<CASE ...>, same-literal) the hidden column collides with
    // the projection and the output column reads back the ORDER BY
    // value (reference returns a = [80, 70] here). graft answers
    // correctly — pinned so the right behavior is explicit.
    Seq(1, 5).toDF("k").createOrReplaceTempView("refbug_t")
    val r = GraftSql.sql(spark,
      "SELECT NULLIF(CASE WHEN k > 2 THEN k ELSE k END, 8) AS a FROM refbug_t " +
        "ORDER BY NULLIF(CASE WHEN k > 2 THEN 70 ELSE 80 END, 8) DESC")
      .collect().map(_.getInt(0)).toSeq
    assert(r == Seq(1, 5), s"projection must keep its own value, got $r")
  }

  test("fuzz-found JS number rendering: CAST-to-string and CONCAT render doubles JS-style") {
    // reference stringifies with JS String(v): 2.0 → '2', 1e21 →
    // '1e+21', 1e-7 → '1e-7'. Spark's CAST says '2.0' / '1.0E21'. The
    // graft_js_str expression re-formats Java's shortest digits under
    // ECMA-262 placement rules.
    val r = GraftSql.sql(spark,
      """SELECT CAST(2.0 AS VARCHAR) AS a, CONCAT('x', 1.5) AS b,
         CAST(0.5 AS STRING) AS c, CAST(-0.0 AS TEXT) AS d,
         CAST(100.0 AS VARCHAR) AS e, CAST(1e21 AS VARCHAR) AS f,
         CAST(1e-7 AS VARCHAR) AS g, CAST(0.000001 AS VARCHAR) AS h,
         CONCAT('n-', 7 / 2) AS i, CAST('s' AS VARCHAR) AS j""").collect().head
    assert(Seq("a", "b", "c", "d", "e", "f", "g", "h", "i", "j").map(r.getAs[String]) ==
      Seq("2", "x1.5", "0.5", "0", "100", "1e+21", "1e-7", "0.000001", "n-3.5", "s"))
    // STRING_AGG accepts numeric input (reference String(v) per element)
    val sa = GraftSql.sql(spark,
      "SELECT STRING_AGG(x, ',') AS s FROM (SELECT 2.0 AS x) t").collect().head
    assert(sa.getAs[String]("s") == "2")
  }

  test("fuzz-found JS string coercion: ||, ILIKE and string-function args") {
    // reference binary.js:27-30: `a || b` is String(a) + String(b) —
    // 'x' || 2.0 is 'x2'; strings.js:66 coerces every string function's
    // first arg the same way (UPPER(6.0) = '6'); binary.js:57 coerces
    // LIKE operands (2.0 LIKE '2' is TRUE). Arrays join JS-style under
    // || ('1,2,' for [1,2,null]) but CAST as JSON ('[1,2,null]').
    val r = GraftSql.sql(spark,
      """SELECT 'x' || 2.0 AS a, 1.5 || 2.5 AS b, 'x' || NULL AS c,
         UPPER(2.0*3) AS d, INSTR(1.0/2, '.') AS e, LEFT(123.456, 4) AS f,
         REPLACE(12.5, '.', '_') AS g, SPLIT_PART(1.25, '.', 2) AS h,
         2.0 LIKE '2' AS i,
         CASE WHEN TRUE THEN 4.0 ELSE 1 END || 'z' AS j,
         TRUE || 'q' AS k""").collect().head
    assert(r.getAs[String]("a") == "x2")
    assert(r.getAs[String]("b") == "1.52.5")
    assert(r.getAs[String]("c") == null)
    assert(r.getAs[String]("d") == "6")
    assert(r.getAs[Int]("e") == 2) // String(1.0/2) = '0.5' — the dot sits at position 2
    assert(r.getAs[String]("f") == "123.")
    assert(r.getAs[String]("g") == "12_5")
    assert(r.getAs[String]("h") == "25")
    assert(r.getAs[Boolean]("i"))
    assert(r.getAs[String]("j") == "4z")
    assert(r.getAs[String]("k") == "trueq")
    // precedence repair: the reference parses `x || a + b` as
    // x || (a+b) (parseConcat over parseAdditive); Spark's grammar puts
    // || at the SAME precedence as +, so ('x' || 1) + 2 would be null.
    // The operand wrap parenthesizes the additive segment, restoring
    // the reference grouping.
    val p = GraftSql.sql(spark, "SELECT 'n-' || 1 + 2 AS a, 'm' || 1 - 2 AS b")
      .collect().head
    assert(p.getAs[String]("a") == "n-3")
    assert(p.getAs[String]("b") == "m-1")
    // array/timestamp stringification: JS join under ||, JSON under CAST
    val arr = GraftSql.sql(spark,
      """SELECT ARRAY_APPEND(ARRAY(1, 2), NULL) || '!' AS a,
         CAST(ARRAY(1.5, 2.0) AS VARCHAR) AS b,
         TIMESTAMP '1970-01-02 00:00:00' || '' AS c""").collect().head
    assert(arr.getAs[String]("a") == "1,2,!")
    assert(arr.getAs[String]("b") == "[1.5,2]")
    assert(arr.getAs[String]("c") ==
      "Fri Jan 02 1970 00:00:00 GMT+0000 (Coordinated Universal Time)")
  }

  test("deliberate divergence: three-valued NULL logic outside NOT IN") {
    // The reference's JS evaluator is two-valued: `NULL = x` evaluates
    // FALSE (never UNKNOWN), so NOT (NULL = x) is TRUE and a projected
    // (1 = NULL) reads false. graft keeps standard SQL three-valued
    // logic for plain comparisons: emulating two-valued logic means
    // wrapping every predicate in coalesce(pred, false), which does not
    // translate to a parquet scan filter — losing pushdown engine-wide
    // is the wrong trade at 100 TB. The one shape real reference
    // queries rely on — NOT IN over a null-bearing subquery — IS
    // matched via the NOT EXISTS rewrite. Pinned so the boundary is
    // explicit and a future change is noticed:
    val r = GraftSql.sql(spark,
      "SELECT (1 = NULL) AS x, NOT (NULL = 1) AS y").collect().head
    assert(r.isNullAt(0) && r.isNullAt(1),
      "graft: UNKNOWN stays NULL (reference projects false / true)")
  }

  test("identity graft_js_str wraps are stripped from the optimized plan") {
    // the rewrite wraps || / ILIKE / string-function operands in
    // graft_js_str unconditionally (the text must run on BOTH engines),
    // but over a STRING child the wrap is identity — StripIdentityJsStr
    // removes it so dialect hot paths keep whole-stage codegen and
    // scans keep their PushedFilters at 100 TB
    spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
      .createOrReplaceTempView("jsstrip_t")
    val df = GraftSql.sql(spark,
      "SELECT n_name || '!' AS c, UPPER(n_name) AS u, " +
        "n_regionkey || '' AS rc " +
        "FROM jsstrip_t WHERE n_name ILIKE 'nation\\_1'")
    val optimized = df.queryExecution.optimizedPlan.toString
    // string-typed operands: wrap gone (projection and filter both)...
    assert(!optimized.contains("graft_js_str(n_name"),
      s"identity wrap over string column survived optimization:\n$optimized")
    // ...non-string operands keep the JS rendering expression
    assert(optimized.contains("graft_js_str(n_regionkey"),
      s"numeric operand lost its JS coercion:\n$optimized")
    // with the filter wrap gone the predicate translates to a data
    // source filter again (ilike pushes as EqualTo-insensitive? no —
    // as a StartsWith-class source filter is version-dependent; assert
    // the weaker invariant that SOME filter reached the scan)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters: [IsNotNull(n_name)"),
      s"no filter reached the parquet scan:\n$physical")
    val r = df.collect()
    assert(r.map(_.getAs[String]("u")).toSeq == Seq("NATION_1"))
    assert(r.head.getAs[String]("c") == "NATION_1!")
    assert(r.head.getAs[String]("rc").matches("\\d+"))
  }

  test("identity graft_js_num wraps are stripped: numeric SUM/AVG keep native aggregation") {
    // the rewrite wraps every SUM/AVG argument in graft_js_num (the
    // reference's Number(v)+isFinite accumulator gate for string
    // columns) — over a NUMERIC child the wrap is identity and
    // StripIdentityJsNum must remove it, or every dialect aggregation
    // would drop out of whole-stage codegen
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .createOrReplaceTempView("jsnum_t")
    val df = GraftSql.sql(spark,
      "SELECT l_returnflag, SUM(l_quantity) AS s, AVG(l_extendedprice) AS a " +
        "FROM jsnum_t GROUP BY l_returnflag")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("graft_js_num"),
      s"identity wrap over numeric column survived optimization:\n$optimized")
    // and the coercion path itself works: string cells accumulate
    // JS-style (numeric-looking counted, garbage skipped, '' = 0)
    import spark.implicits._
    Seq("10", "abc", "", null, "2.5").toDF("v").createOrReplaceTempView("jsnum_s")
    val got = GraftSql.sql(spark,
      "SELECT SUM(v) AS s, AVG(v) AS a FROM jsnum_s").collect().head
    assert(got.getDouble(0) == 12.5, s"sum: $got")
    assert(math.abs(got.getDouble(1) - 12.5 / 3) < 1e-12, s"avg: $got")
  }

  test("comma-joined table functions: implicit CROSS JOIN LATERAL (joins.js:113)") {
    Seq((1L, "a b c")).toDF("id", "txt").createOrReplaceTempView("ctvf_t")
    // alias with column list
    val r1 = GraftSql.sql(spark,
      "SELECT id, part FROM ctvf_t, UNNEST(STRING_SPLIT(txt, ' ')) AS u(part) " +
        "WHERE part <> 'b' ORDER BY part").collect()
    assert(r1.map(_.getAs[String]("part")).toSeq == Seq("a", "c"))
    // no alias: the column takes the function's name (parse.js:543-546)
    val r2 = GraftSql.sql(spark,
      "SELECT unnest FROM ctvf_t, UNNEST(STRING_SPLIT(txt, ' ')) ORDER BY unnest").collect()
    assert(r2.map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    // JSON_EACH: default columns (key, value); also via LATERAL VIEW
    val r3 = GraftSql.sql(spark,
      """SELECT key, value FROM ctvf_t, JSON_EACH('{"a": 1, "b": 2}') AS j ORDER BY key""").collect()
    assert(r3.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("a", "1"), ("b", "2")))
    val r4 = GraftSql.sql(spark,
      """SELECT k, v FROM ctvf_t LATERAL VIEW JSON_EACH('{"x": 9}') j AS k, v""").collect()
    assert(r4.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("x", "9")))
  }

  test("advisor finds: JSON_EACH scalar-literal guard is quote-aware, two reference messages") {
    Seq((1L, "x")).toDF("id", "txt").createOrReplaceTempView("je_t")
    // a comma INSIDE the quoted literal is still ONE scalar literal —
    // the reference's JSON.parse fails → "invalid JSON string"
    // (execute.js:208); pre-fix this silently yielded 0 rows
    def execErr(q: String): String =
      intercept[Exception] {
        GraftSql.sql(spark, q).collect()
      }.getMessage
    assert(execErr("SELECT key, value FROM je_t, JSON_EACH('a,b') AS j")
      .contains("invalid JSON string"), "table-function path, 'a,b'")
    // a bare numeric/boolean literal is valid JSON but not an
    // object/array → the other guard (execute.js:239); pre-fix it
    // never errored
    assert(execErr("SELECT key, value FROM je_t, JSON_EACH(42) AS j")
      .contains("must be a JSON object or array"), "table-function path, 42")
    assert(execErr("SELECT key, value FROM je_t, JSON_EACH('42') AS j")
      .contains("must be a JSON object or array"), "table-function path, '42'")
    // the expression-path rewrite raises the same pair
    assert(execErr("SELECT json_each('a,b') FROM je_t")
      .contains("invalid JSON string"), "expression path, 'a,b'")
    assert(execErr("SELECT json_each(true) FROM je_t")
      .contains("must be a JSON object or array"), "expression path, true")
    // object/array literals and data columns stay lenient
    val ok = GraftSql.sql(spark,
      """SELECT key, value FROM je_t, JSON_EACH('{"a": 1}') AS j""").collect()
    assert(ok.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("a", "1")))
  }

  test("advisor finds: SUM/AVG set quantifier stays outside the js_num wrap in every spelling") {
    import spark.implicits._
    Seq(1, 2, 2, 3).toDF("x").createOrReplaceTempView("sq_t")
    // SUM(DISTINCT(x)) / SUM(ALL x) / SUM(DISTINCT<tab>x) previously
    // wrapped the quantifier INSIDE graft_js_num → analysis error
    val r = GraftSql.sql(spark,
      "SELECT SUM(DISTINCT(x)) AS d1, SUM(DISTINCT\tx) AS d2, " +
        "SUM(ALL x) AS a1, AVG(DISTINCT x) AS d3 FROM sq_t").collect().head
    def num(i: Int): Double = r.getAs[Number](i).doubleValue()
    assert(num(0) == 6.0 && num(1) == 6.0 && num(2) == 8.0 && num(3) == 2.0,
      s"got: $r")
    // identifiers that merely START with a quantifier word are not split
    Seq((1, 4)).toDF("allx", "distinct_vals").createOrReplaceTempView("sq_t2")
    val r2 = GraftSql.sql(spark,
      "SELECT SUM(allx) AS s1, SUM(distinct_vals) AS s2 FROM sq_t2").collect().head
    assert(r2.getAs[Number](0).doubleValue() == 1.0 &&
      r2.getAs[Number](1).doubleValue() == 4.0, s"got: $r2")
  }

  test("implicit alias after ANY close paren ends the || operand wrap (generalized from window specs)") {
    import spark.implicits._
    Seq((1, " a ")).toDF("id", "s").createOrReplaceTempView("ia_t")
    // pre-fix: the alias q2 was swallowed into the operand wrap —
    // graft_js_str(trim(s) q2) — a parse error
    val r = GraftSql.sql(spark,
      "SELECT 'p' || trim(s) q2, rank() OVER (ORDER BY id) r2 FROM ia_t").collect().head
    assert(r.getString(0) == "pa" && r.getInt(1) == 1, s"got: $r")
  }

  test("ILIKE and END after a close paren are NOT implicit aliases (seed-88015 fuzz find)") {
    import spark.implicits._
    // The ordered implicit-alias guard above sits BEFORE the ILIKE/END
    // cases in the token match, so the generalization had it claim
    // `(expr) ILIKE` as `(expr) AS ilike` — dropping the graft_js_str
    // wrap on the parenthesized operand. JS String(251) = '251' (no
    // '0') must NOT match '%0%', while Spark's bare cast '251.0' would.
    Seq((1, 251.0), (2, 250.0), (3, 10.5)).toDF("id", "bal")
      .createOrReplaceTempView("ilk_t")
    val hits = GraftSql.sql(spark,
      "SELECT id FROM ilk_t WHERE (bal / 1) LIKE '%0%' ORDER BY id")
      .collect().map(_.getInt(0)).toSeq
    assert(hits == Seq(2, 3), s"got: $hits") // 250→'250'✓, 10.5→'10.5'✓, 251→'251'✗
    // END directly after a ')' must still pop its CASE frame so a
    // following || wraps the WHOLE CASE expression
    val c = GraftSql.sql(spark,
      "SELECT CASE WHEN id = 1 THEN (bal) END || 'r' AS v FROM ilk_t ORDER BY id")
      .collect().map(_.getString(0)).toSeq
    assert(c == Seq("251r", null, null), s"got: $c")
  }

  test("interval arithmetic: JS Date-setter semantics (month rollover, fractional truncation)") {
    // every expected value probed on the reference engine (node,
    // src/expression/date.js applyIntervalToDate):
    //  - MONTH/YEAR keep day-of-month by ROLLING OVER (MakeDay), where
    //    Spark's add_months would CLAMP: Mar 31 + 1 MONTH = May 1;
    //  - fractional values truncate the SUMMED component toward zero
    //    (setUTCHours(h + adj) under ToIntegerOrInfinity), so
    //    '-1.5' MONTH on March (m0=2) lands trunc(0.5)=0 = January.
    Seq(("2024-03-10T00:00:00", "2024-03-31", "2024-02-29", "2024-01-31T05:00:00", 1711843200000L))
      .toDF("ts", "d", "e", "me", "n").createOrReplaceTempView("ivl_t")
    val r = GraftSql.sql(spark,
      """SELECT
        |  ts + INTERVAL '2.5' HOUR    AS frac_hour,
        |  ts - INTERVAL '2.5' HOUR    AS frac_hour_neg,
        |  d + INTERVAL '1.9' DAY      AS frac_day,
        |  ts + INTERVAL '90.7' SECOND AS frac_sec,
        |  d + INTERVAL '-1.5' MONTH   AS frac_month_neg,
        |  d + INTERVAL 1 MONTH        AS roll_month,
        |  d - INTERVAL 1 MONTH        AS roll_month_back,
        |  e + INTERVAL 1 YEAR         AS roll_year,
        |  me + INTERVAL 1 MONTH       AS roll_ts,
        |  d + INTERVAL 13 MONTH       AS roll_13,
        |  d - INTERVAL 1 MINUTE       AS date_back,
        |  d + INTERVAL 1 MINUTE       AS date_same,
        |  n + INTERVAL 2 HOUR         AS num_null,
        |  d + INTERVAL 1 DAY - INTERVAL 2 HOUR  AS chain_date,
        |  ts + INTERVAL 1 DAY - INTERVAL 2 HOUR AS chain_ts,
        |  INTERVAL 1 MONTH + d                  AS left_form
        |FROM ivl_t""".stripMargin).collect().head
    def g(n: String) =
      r.getAs[java.sql.Timestamp](n).toInstant.toString
    assert(g("frac_hour") == "2024-03-10T02:00:00Z", g("frac_hour"))
    assert(g("frac_hour_neg") == "2024-03-09T22:00:00Z", g("frac_hour_neg"))
    assert(g("frac_day") == "2024-04-01T00:00:00Z", g("frac_day")) // 31+1.9 → 32
    assert(g("frac_sec") == "2024-03-10T00:01:30Z", g("frac_sec"))
    assert(g("frac_month_neg") == "2024-01-31T00:00:00Z", g("frac_month_neg"))
    assert(g("roll_month") == "2024-05-01T00:00:00Z", g("roll_month"))
    assert(g("roll_month_back") == "2024-03-02T00:00:00Z", g("roll_month_back"))
    assert(g("roll_year") == "2025-03-01T00:00:00Z", g("roll_year"))
    assert(g("roll_ts") == "2024-03-02T05:00:00Z", g("roll_ts"))
    assert(g("roll_13") == "2025-05-01T00:00:00Z", g("roll_13"))
    // "same format as input": a date-only string truncates the result
    // back to its UTC date ('2024-03-31' - 1 min = 2024-03-30, not
    // 23:59), and NUMBERS are not dates at all (toDate → null)
    assert(g("date_back") == "2024-03-30T00:00:00Z", g("date_back"))
    assert(g("date_same") == "2024-03-31T00:00:00Z", g("date_same"))
    assert(r.isNullAt(r.fieldIndex("num_null")), "epoch number + interval must be NULL")
    // chained ops reformat per STEP like the reference (node-probed):
    // a date-only string stays date-only through the chain, so
    // '2024-03-31' + 1 DAY - 2 HOUR = '2024-03-31' (Apr 1 → 23:59…
    // truncates back), while a 'T' string keeps its time
    assert(g("chain_date") == "2024-03-31T00:00:00Z", g("chain_date"))
    assert(g("chain_ts") == "2024-03-10T22:00:00Z", g("chain_ts"))
    // left-interval form (evaluate.js:182): commutes, rollover intact
    assert(g("left_form") == "2024-05-01T00:00:00Z", g("left_form"))
    // a typed-constant head with a MONTH tail must NOT take the native
    // fast path — the whole chain keeps JS semantics (Feb 31 rolls to
    // Mar 2; node-probed against applyIntervalToDate)
    val chainTail = GraftSql.sql(spark,
      "SELECT TIMESTAMP '2024-01-31 01:00:00' + INTERVAL 0 DAY + INTERVAL 1 MONTH AS r")
      .collect().head
    assert(chainTail.getAs[java.sql.Timestamp]("r").toInstant.toString
      == "2024-03-02T01:00:00Z", chainTail.toString)
    // DATE literal arithmetic: the typed literal rides whole into the
    // fast path (no dangling DATE keyword), native here is JS-exact
    val dlit = GraftSql.sql(spark,
      "SELECT DATE '1995-06-01' - INTERVAL 30 DAY AS r").collect().head
    assert(String.valueOf(dlit.get(0)).startsWith("1995-05-02"), dlit.toString)
    // Number()-style interval values the reference accepts: '1e2'
    // (100), '.5' (truncates to 0), '+1' — reference parseInterval
    // takes any non-NaN Number(v) (primary.js:388-393)
    val nv = GraftSql.sql(spark,
      "SELECT d + INTERVAL '1e2' DAY AS a, d + INTERVAL '.5' HOUR AS b, " +
        "d + INTERVAL '+1' DAY AS c FROM ivl_t").collect().head
    def nvI(n: String) = nv.getAs[java.sql.Timestamp](n).toInstant.toString
    assert(nvI("a") == "2024-07-09T00:00:00Z", nvI("a")) // 2024-03-31 + 100 days
    assert(nvI("b") == "2024-03-31T00:00:00Z", nvI("b")) // +0.5h truncates, date-only stays
    assert(nvI("c") == "2024-04-01T00:00:00Z", nvI("c"))
    // double-wrapped parens still thread the chain kind
    val dp = GraftSql.sql(spark,
      "SELECT (('2024-03-31' + INTERVAL 1 DAY)) - INTERVAL 2 HOUR AS r").collect().head
    assert(dp.getAs[java.sql.Timestamp]("r").toInstant.toString
      == "2024-03-31T00:00:00Z", dp.toString)
    // V8 acceptance tails (probed): date-only + offset is INVALID,
    // strict-T + trailing space is INVALID, >9 fractional digits are
    // fine (truncate to millis)
    val tails = GraftSql.sql(spark,
      "SELECT '2024-01-01+05:00' + INTERVAL 1 DAY AS a, " +
        "('2024-01-04T10:00:00 ') + INTERVAL 1 DAY AS b, " +
        "'2024-01-01T10:00:00.1234567891Z' + INTERVAL 1 HOUR AS c").collect().head
    assert(tails.isNullAt(0), tails.toString)
    assert(tails.isNullAt(1), tails.toString)
    assert(tails.getAs[java.sql.Timestamp]("c").toInstant.toString
      == "2024-01-01T11:00:00.123Z", tails.toString)
    // parenthesized chain: the kind still threads through the parens
    val paren = GraftSql.sql(spark,
      "SELECT (d + INTERVAL 1 DAY) - INTERVAL 2 HOUR AS r FROM ivl_t").collect().head
    assert(paren.getAs[java.sql.Timestamp]("r").toInstant.toString
      == "2024-03-31T00:00:00Z", paren.toString)
  }

  test("time-window filter bounds stay constant-foldable and push to parquet") {
    // `WHERE ts > now() - INTERVAL 7 DAY` is THE 100 TB filter shape:
    // a typed-constant operand with an integral sub-month unit must
    // stay on native interval arithmetic (bit-identical to the JS
    // Date-object semantics there) so the bound folds to a literal and
    // reaches the scan as a pushed filter — the graft_js_interval UDF
    // would never constant-fold
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .createOrReplaceTempView("push_orders")
    val q = "SELECT o_orderkey FROM push_orders " +
      "WHERE o_orderdate > TIMESTAMP '1995-06-01 00:00:00' - INTERVAL 30 DAY"
    val exec = GraftSql.sql(spark, q).queryExecution
    assert(!exec.optimizedPlan.toString.contains("graft_js_interval"),
      exec.optimizedPlan.toString.take(400))
    val physical = exec.executedPlan.toString
    assert(physical.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThan(o_orderdate"),
      physical.take(800))
    val qNow = "SELECT count(*) AS c FROM push_orders " +
      "WHERE o_orderdate > NOW() - INTERVAL 10000 DAY"
    assert(!GraftSql.sql(spark, qNow).queryExecution.optimizedPlan.toString
      .contains("graft_js_interval"))
    // the paren spellings take the same fast path
    val qCt = "SELECT count(*) AS c FROM push_orders " +
      "WHERE o_orderdate > CURRENT_TIMESTAMP() - INTERVAL 10000 DAY"
    assert(!GraftSql.sql(spark, qCt).queryExecution.optimizedPlan.toString
      .contains("graft_js_interval"))
  }

  test("data-column interval arithmetic is the NATIVE JsInterval expression: codegen'd, no ScalaUDF") {
    // round 12 retired the engine's last per-row ScalaUDF: the
    // data-column interval path is a codegen'd Catalyst expression now
    // a parquet-backed table: a local relation would collapse to
    // LocalTableScan at optimization (itself proof eval() works) and
    // hide the codegen span this pin is about
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .selectExpr("CAST(o_orderdate AS STRING) AS d")
      .createOrReplaceTempView("njsi_t")
    val exec = GraftSql.sql(spark,
      "SELECT d + INTERVAL 1 MONTH AS r FROM njsi_t").queryExecution
    // the analyzed plan carries the native expression, not a ScalaUDF
    assert(!exec.analyzed.toString.contains("UDF"), exec.analyzed.toString.take(400))
    assert(exec.analyzed.toString.contains("graft_js_interval"),
      exec.analyzed.toString.take(400))
    // and the physical plan keeps the projection inside whole-stage
    // codegen (the old ScalaUDF forced an interpreted projection) —
    // the '*(n)' prefix is the codegen marker in the simple plan string
    val physical = exec.executedPlan.toString
    assert(physical.contains("*(1) Project [graft_js_interval"), physical.take(600))
    // the codegen'd kernel computes the same MakeDay rollover
    Seq(("2024-03-31", 1)).toDF("d", "id").createOrReplaceTempView("njsi_lit")
    val row = GraftSql.sql(spark,
      "SELECT d + INTERVAL 1 MONTH AS r FROM njsi_lit").collect().head
    assert(row.getAs[java.sql.Timestamp]("r").toInstant.toString
      == "2024-05-01T00:00:00Z", row.toString)
    // a fully-literal call CONSTANT-FOLDS (foldable children) — the
    // optimized plan carries the folded literal, no expression left
    val folded = GraftSql.sql(spark,
      "SELECT '2024-03-31' + INTERVAL 1 MONTH AS r, d FROM njsi_t")
      .queryExecution.optimizedPlan.toString
    assert(!folded.contains("graft_js_interval"), folded.take(400))
  }

  test("strictLint: comments and literals do not confuse the misparse gate") {
    Seq(Tuple1(1L)).toDF("a").createOrReplaceTempView("lint_t")
    // a '--' INSIDE a literal is content, not a comment — this valid
    // query must pass even though a naive strip would corrupt quote
    // parity and see a fake `AS FROM`
    val ok = GraftSql.sql(spark,
      "SELECT * FROM lint_t WHERE '--x' <> 'AS FROM'").collect()
    assert(ok.length == 1)
    // real trailing comments are fine; a real dangling WHERE is not
    assert(GraftSql.validate(spark, "SELECT a FROM lint_t -- where").isRight)
    assert(GraftSql.validate(spark, "SELECT a FROM lint_t WHERE").isLeft)
    // FROM-first after a CTE body and after a leading comment
    assert(GraftSql.sql(spark,
      "WITH c AS (SELECT 1 AS x) FROM c").collect().map(_.getInt(0)).toSeq == Seq(1))
    assert(GraftSql.sql(spark, "-- hi\nFROM lint_t").collect().length == 1)
    assert(GraftSql.sql(spark, "/* hi */ FROM lint_t").collect().length == 1)
    // a scalar subquery's close-paren before FROM is NOT FROM-first
    assert(GraftSql.sql(spark,
      "SELECT (SELECT 2) FROM lint_t").collect().head.getInt(0) == 2)
    // quote-aware backward scan: a ')' inside a CTE body's string
    // literal must not derail the FROM-first detection
    assert(GraftSql.sql(spark,
      "WITH c AS (SELECT ')' AS x) FROM c").collect().head.getString(0) == ")")
    // '--' inside a double-quoted IDENTIFIER is content, not a comment
    Seq(Tuple1(7L)).toDF("a--b").createOrReplaceTempView("dq_t")
    assert(GraftSql.sql(spark,
      "SELECT \"a--b\" AS v FROM dq_t").collect().head.getLong(0) == 7L)
    // keyword-shaped text inside a double-quoted ALIAS is legal — the
    // lint must not read "AS FROM" as a clause-keyword alias
    assert(GraftSql.sql(spark,
      "SELECT a AS \"AS FROM\" FROM lint_t").collect().length == 1)
  }

  test("double-quoted identifiers select dotted columns, not string literals") {
    // reference: test/execute/execute.dot.test.js — "user.name" is the
    // COLUMN named user.name, never the nested field and never a string
    Seq((1L, "Alice", 30), (2L, "Bob", 25))
      .toDF("id", "user.name", "user.age")
      .createOrReplaceTempView("dotted_t")
    val r = GraftSql.sql(spark,
      """SELECT "user.name" AS n, "user.age" + 1 AS a
        |FROM dotted_t WHERE "user.age" > 26""".stripMargin).collect()
    assert(r.length == 1)
    assert(r.head.getAs[String]("n") == "Alice")
    assert(r.head.getAs[Int]("a") == 31)
  }

  test("review-found: || adjacent to a window function wraps the whole window expr") {
    // node-probed: 'r' || row_number() OVER (ORDER BY x) is 'r1'..'r3'
    // on both sides of the operator. OVER must NOT close the concat
    // segment — the wrap goes around the full window expression, which
    // Spark accepts nested inside a scalar call.
    Seq((1, "a"), (2, "b"), (3, "c")).toDF("x", "s")
      .createOrReplaceTempView("win_cat_t")
    val rows = GraftSql.sql(spark,
      """SELECT 'r' || row_number() OVER (ORDER BY x) AS a,
        |  row_number() OVER (ORDER BY x) || 'r' AS b,
        |  s || lag(x, 1) OVER (ORDER BY x) AS c
        |FROM win_cat_t ORDER BY a""".stripMargin).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("r1", "r2", "r3"))
    assert(rows.map(_.getString(1)).toSeq == Seq("1r", "2r", "3r"))
    // NULL lag at the first row: String(a) + String(b) is null-propagating
    // in the dialect (reference returns null when either side is null)
    assert(rows.map(_.getString(2)).toSeq == Seq(null, "b1", "c2"))
    // a concat INSIDE the window spec still coerces
    val inner = GraftSql.sql(spark,
      """SELECT row_number() OVER (ORDER BY s || x) AS r, s
        |FROM win_cat_t ORDER BY r""".stripMargin).collect()
    assert(inner.map(_.getString(1)).toSeq == Seq("a", "b", "c"))
  }

  test("review-found: GROUP BY alias shadowing expands exactly one level") {
    // node-probed: `price - discount AS price ... GROUP BY price`
    // groups by (price - discount) with the INNER name the base column
    // — naive re-expansion would triple-subtract; and `k AS price ...
    // GROUP BY price` groups by the ALIAS k even though price is a real
    // column (the reference substitutes select aliases into GROUP BY).
    Seq((10, 2, 1), (10, 2, 1), (20, 5, 2)).toDF("price", "discount", "k")
      .createOrReplaceTempView("shadow_t")
    val g1 = GraftSql.sql(spark,
      """SELECT price - discount AS price, count(*) AS c
        |FROM shadow_t GROUP BY price ORDER BY price""".stripMargin).collect()
    assert(g1.map(r => (r.getInt(0), r.getLong(1))).toSeq == Seq((8, 2L), (15, 1L)))
    val g2 = GraftSql.sql(spark,
      """SELECT k AS price, count(*) AS c
        |FROM shadow_t GROUP BY price ORDER BY price""".stripMargin).collect()
    assert(g2.map(r => (r.getInt(0), r.getLong(1))).toSeq == Seq((1, 2L), (2, 1L)))
    // ORDER BY over an aggregate of the shadowing alias: sum of the
    // EXPANDED expression per group (node-probed: [15, 8])
    val g3 = GraftSql.sql(spark,
      """SELECT price - discount AS price
        |FROM shadow_t GROUP BY price ORDER BY sum(price)""".stripMargin).collect()
    assert(g3.map(_.getInt(0)).toSeq == Seq(15, 8))
    // an outer GROUP BY over an AGGREGATE alias errors in the reference
    // too ("Aggregate function SUM is not available in this context") —
    // the expansion surfaces the same rejection through Spark's analyzer
    assertThrows[Exception] {
      GraftSql.sql(spark,
        """SELECT sum(v) AS k FROM (
          |  SELECT k, count(*) AS v FROM shadow_t GROUP BY k
          |) GROUP BY k ORDER BY k""".stripMargin).collect()
    }
    // ...while a subquery's own GROUP BY never inherits outer aliases
    val nested = GraftSql.sql(spark,
      """SELECT mx FROM (
        |  SELECT k, max(price) AS mx FROM shadow_t GROUP BY k
        |) sub ORDER BY mx""".stripMargin).collect()
    assert(nested.map(_.getInt(0)).toSeq == Seq(10, 20))
  }

  test("review-found: ARRAY_CONTAINS/POSITION match decimal literals numerically") {
    // Spark parses `1.5` as DECIMAL(2,1), and sql.types.Decimal is NOT
    // a java.lang.Number — jsEq must still compare it numerically with
    // double elements (reference: JS includes/indexOf, evaluate.js:596)
    val r = GraftSql.sql(spark,
      """SELECT ARRAY_CONTAINS(ARRAY(1.5D, 2.0D), 1.5) AS c,
        |  ARRAY_POSITION(ARRAY(1.5D, 2.0D), 1.5) AS p,
        |  ARRAY_CONTAINS(ARRAY(1.5D, 2.0D), 9.9) AS c2""".stripMargin)
      .collect().head
    assert(r.getAs[Boolean]("c"))
    assert(r.getAs[Int]("p") == 1)
    assert(!r.getAs[Boolean]("c2"))
  }

  test("review-found: ROUND matches V8 Math.round at the half boundary and huge scales") {
    // node-probed: Math.round(0.49999999999999994) is 0 — floor(x+0.5)
    // picks up the IEEE error in the addition and gives 1; 1e19·100
    // exceeds LONG, the reference returns the (already-integral) double
    val r = GraftSql.sql(spark,
      """SELECT ROUND(0.49999999999999994D) AS a, ROUND(-0.5) AS b,
        |  ROUND(1e19, 2) AS c, ROUND(CAST(NULL AS DOUBLE)) AS d,
        |  ROUND(2.345, CAST(NULL AS INT)) AS e""".stripMargin).collect().head
    assert(r.getAs[Double]("a") == 0.0, r)
    assert(r.getAs[Double]("b") == 0.0, r)
    assert(r.getAs[Double]("c") == 1e19, r)
    assert(r.isNullAt(r.fieldIndex("d")), r)
    // Number(null) = 0 in the reference: a NULL decimals arg means round
    // to integer, not NULL
    assert(r.getAs[Double]("e") == 2.0, r)
  }

  test("review-found: equal-length double-quoted CTE names are distinct to the lint") {
    // the lint's keyword checks skip double-quoted identifier tokens,
    // but the duplicate-CTE parse must see the real names — "AA"/"BB"
    // are distinct CTEs and the query is valid
    val ok = GraftSql.sql(spark,
      """WITH "AA" AS (SELECT 1 AS x), "BB" AS (SELECT 2 AS y)
        |SELECT x FROM "AA"""".stripMargin).collect()
    assert(ok.head.getInt(0) == 1)
    // real duplicates still rejected (case-insensitive)
    val err = intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        """WITH "AA" AS (SELECT 1 AS x), "aa" AS (SELECT 2 AS x)
          |SELECT x FROM "AA"""".stripMargin)
    }
    assert(err.getMessage.contains("duplicate CTE"))
  }

  test("DESC converts to NULLS FIRST only inside ORDER BY tails (seed-135555 mutation find)") {
    // the old global regex corrupted DESC used as an IDENTIFIER
    assert(GraftSql.rewrite("SELECT a FROM t ORDER BY a DESC, b DESC LIMIT 2") ==
      "SELECT a FROM t ORDER BY a DESC NULLS FIRST, b DESC NULLS FIRST LIMIT 2")
    assert(GraftSql.rewrite("SELECT rank() OVER (ORDER BY x DESC) r FROM t")
      .contains("ORDER BY x DESC NULLS FIRST)"))
    // explicit NULLS LAST stays; DESC outside ORDER BY passes through
    assert(GraftSql.rewrite("SELECT a FROM t ORDER BY a DESC NULLS LAST")
      .endsWith("DESC NULLS LAST"))
    assert(GraftSql.rewrite("SELECT \"desc\" FROM t") == "SELECT \"desc\" FROM t")
    // ORDER BY state resets at a clause keyword: a LIMIT subquery's
    // outer DESC-named identifier is untouched
    assert(!GraftSql.rewrite("SELECT desc FROM t LIMIT 5").contains("NULLS"))
  }

  test("derived names: || spells _||_ and a bare ref to an earlier alias re-derives (seed-134777 find)") {
    import spark.implicits._
    Seq((1, "Customer#001", "BUILDING")).toDF("c_custkey", "c_name", "c_mktsegment")
      .createOrReplaceTempView("dn_t")
    // node-probed: the reference names the unaliased duplicate from the
    // EXPANDED alias expression, through the operator spelling of ||
    val df = GraftSql.sqlDerived(spark,
      "SELECT (LEFT(c_name, 0) || SUBSTR(c_mktsegment, 1, 4)) AS c1, c1 FROM dn_t")
    assert(df.columns.toSeq ==
      Seq("c1", "left_c_name_0_||_substr_c_mktsegment_1_4"), df.columns.mkString(";"))
    assert(df.collect().head.getString(1) == "BUIL")
    assert(GraftSql.derivedAlias("a || b") == "a_||_b")
  }

  test("implicit alias shadowing a column resolves GROUP BY to the ALIAS (seed-132777 mutation find)") {
    import spark.implicits._
    Seq(1, 2, 3, 4).toDF("k").createOrReplaceTempView("ia2_t")
    // node-probed: the reference substitutes the select-list alias into
    // GROUP BY even when the name shadows a base column — 3 groups
    // (0,2,4), not 4 — and the AS-less spelling resolves identically
    val r = GraftSql.sql(spark,
      "SELECT (k - MOD(k, 2)) k, COUNT(*) AS c FROM ia2_t GROUP BY k ORDER BY k")
      .collect().map(x => (x.getInt(0), x.getLong(1))).toSeq
    assert(r == Seq((0, 1L), (2, 2L), (4, 1L)), r.toString)
    // the bare-column implicit alias form expands the same way
    val r2 = GraftSql.sql(spark,
      "SELECT k kk, COUNT(*) AS c FROM ia2_t GROUP BY kk ORDER BY kk")
      .collect().map(_.getInt(0)).toSeq
    assert(r2 == Seq(1, 2, 3, 4), r2.toString)
  }

  test("LEAD/LAG quoted offsets follow JS Number(v) (seed-131337 mutation find)") {
    import spark.implicits._
    Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "name")
      .createOrReplaceTempView("wo_t")
    // every expectation node-probed on the reference: a non-numeric
    // offset is Number(v) = NaN, which indexes outside the partition —
    // every row reads the default (null when absent); numeric TEXT works
    // like the bare number ('' is 0, '-1' flips direction)
    val r = GraftSql.sql(spark,
      "SELECT id, LEAD(name, 'none') OVER (ORDER BY id) AS nan_off, " +
        "LEAD(name, '2') OVER (ORDER BY id) AS two_off, " +
        "LAG(name, 'x', 'dflt') OVER (ORDER BY id) AS dflt_off, " +
        "LEAD(name, '-1') OVER (ORDER BY id) AS neg_off, " +
        "LEAD(name, '') OVER (ORDER BY id) AS zero_off " +
        "FROM wo_t ORDER BY id").collect()
    assert(r.forall(_.isNullAt(1)), r.mkString(";"))
    assert(r.map(x => String.valueOf(x.get(2))).toSeq == Seq("c", "null", "null"), r.mkString(";"))
    assert(r.forall(_.getString(3) == "dflt"), r.mkString(";"))
    assert(r.map(x => String.valueOf(x.get(4))).toSeq == Seq("null", "a", "b"), r.mkString(";"))
    assert(r.map(_.getString(5)).toSeq == Seq("a", "b", "c"), r.mkString(";"))
  }

  test("type-strict LENGTH/OCTET_LENGTH/JSON_VALUE and SUBSTRING guards raise at EXECUTION (r13 replay-corner closure)") {
    import spark.implicits._
    Seq((1, "abc", java.sql.Date.valueOf("2024-03-01")))
      .toDF("n", "s", "d").createOrReplaceTempView("ts_t")
    // allowed types keep working, guard folds away
    val ok = GraftSql.sql(spark,
      "SELECT LENGTH(s) AS a, OCTET_LENGTH(s) AS b, " +
        "JSON_VALUE('{\"k\":1}', '$.k') AS c, SUBSTRING(s, 1, 2) AS e FROM ts_t")
      .collect().head
    assert(ok.getInt(0) == 3 && ok.getInt(1) == 3 &&
      ok.getString(2) == "1" && ok.getString(3) == "ab", ok.toString)
    // banned STATIC types raise when a row flows (reference strings.js:
    // 38-56, evaluate.js JSON_VALUE) — number, date, and the literal
    // SUBSTRING bound guards
    for (q <- Seq(
        "SELECT LENGTH(n) FROM ts_t",
        "SELECT LENGTH(d) FROM ts_t",
        "SELECT OCTET_LENGTH(n) FROM ts_t",
        "SELECT JSON_VALUE(n, '$.k') FROM ts_t",
        "SELECT SUBSTRING(s, 0, 3) FROM ts_t",
        "SELECT SUBSTRING(s, 1, -1) FROM ts_t")) {
      val e = intercept[Exception] { GraftSql.sql(spark, q).collect() }
      assert(String.valueOf(e.getMessage).nonEmpty, q)
    }
    // ...but an EMPTY relation never raises (the reference throws at
    // row evaluation; zero rows = zero throws on both engines)
    spark.sql("SELECT * FROM ts_t WHERE n > 99").createOrReplaceTempView("ts_e")
    assert(GraftSql.sql(spark, "SELECT LENGTH(n) AS x FROM ts_e").collect().isEmpty)
    assert(GraftSql.sql(spark, "SELECT SUBSTRING(s, 0, 3) AS x FROM ts_e").collect().isEmpty)
    // dirty CELLS in a string column stay lenient — no per-row data
    // validation was added (the 100 TB contract)
    Seq(Tuple1("not json")).toDF("j").createOrReplaceTempView("ts_j")
    assert(GraftSql.sql(spark, "SELECT JSON_VALUE(j, '$.k') AS x FROM ts_j")
      .collect().head.isNullAt(0))
  }

  test("mid-chain set-op arm tails: ORDER BY/LIMIT before UNION bind the ARM (r14, reference probed)") {
    import spark.implicits._
    Seq(1, 2, 3, 4).toDF("k").createOrReplaceTempView("soat_t")
    // reference probes (this round, live): mid-chain ORDER BY+LIMIT
    // slices the left arm; the trailing tail binds the whole statement
    val a = GraftSql.sql(spark,
      "SELECT k FROM soat_t ORDER BY k DESC LIMIT 2 UNION ALL " +
        "SELECT k FROM soat_t WHERE k = 1").collect().map(_.getInt(0)).sorted
    assert(a.toSeq == Seq(1, 3, 4), a.mkString(","))
    val b = GraftSql.sql(spark,
      "SELECT k FROM soat_t ORDER BY k DESC LIMIT 2 UNION ALL " +
        "SELECT k FROM soat_t WHERE k = 1 ORDER BY k LIMIT 2")
      .collect().map(_.getInt(0))
    assert(b.toSeq == Seq(1, 3), b.mkString(","))
    // mid-chain LIMIT alone; 3-op chain stays left-associative for
    // UNION/EXCEPT (probed [1,1,3,4] at the reference)
    val c = GraftSql.sql(spark,
      "SELECT k FROM soat_t WHERE k<3 UNION SELECT k FROM soat_t WHERE k>2 " +
        "EXCEPT SELECT k FROM soat_t WHERE k=2 UNION ALL " +
        "SELECT k FROM soat_t WHERE k=1 ORDER BY k")
      .collect().map(_.getInt(0))
    assert(c.toSeq == Seq(1, 1, 3, 4), c.mkString(","))
    // INTERSECT binds tighter in both engines (probed [1,2,3,4,4])
    val d = GraftSql.sql(spark,
      "SELECT k FROM soat_t UNION ALL SELECT k FROM soat_t WHERE k>3 " +
        "INTERSECT SELECT k FROM soat_t WHERE k>3 ORDER BY k")
      .collect().map(_.getInt(0))
    assert(d.toSeq == Seq(1, 2, 3, 4, 4), d.mkString(","))
    // star-EXCEPT is not a set-op boundary
    val e = GraftSql.sql(spark,
      "SELECT * EXCEPT (k) FROM (SELECT k, k+1 AS m FROM soat_t ORDER BY k LIMIT 1) x")
      .collect()
    assert(e.length == 1 && e.head.getInt(0) == 2, e.mkString(","))
    // a tail on arm 2+ binds the ACCUMULATED left chain (reference
    // parse.js lifts the right operand's tail onto the compound;
    // probed [4,3,2] / [1,2] / [1,2,3])
    val f = GraftSql.sql(spark,
      "SELECT k FROM soat_t WHERE k<2 UNION ALL SELECT k FROM soat_t WHERE k>2 " +
        "ORDER BY k DESC LIMIT 2 UNION ALL SELECT k FROM soat_t WHERE k=2")
      .collect().map(_.getInt(0))
    assert(f.sorted.toSeq == Seq(2, 3, 4), f.mkString(","))
    val g = GraftSql.sql(spark,
      "SELECT k FROM soat_t WHERE k>2 ORDER BY k DESC LIMIT 1 UNION ALL " +
        "SELECT k FROM soat_t WHERE k<3 ORDER BY k LIMIT 2 UNION ALL " +
        "SELECT k FROM soat_t WHERE k=3").collect().map(_.getInt(0))
    assert(g.sorted.toSeq == Seq(1, 2, 3), g.mkString(","))
    // ...but a tail on the LEFT arm of a tighter INTERSECT applies to
    // that arm alone (probed [1,3]), and a tail ending an INTERSECT run
    // lifts through to the union level (probed [1,2,1])
    val h = GraftSql.sql(spark,
      "SELECT k FROM soat_t WHERE k<2 UNION SELECT k FROM soat_t WHERE k>1 " +
        "ORDER BY k LIMIT 2 INTERSECT SELECT k FROM soat_t WHERE k>2")
      .collect().map(_.getInt(0))
    assert(h.sorted.toSeq == Seq(1, 3), h.mkString(","))
    val i = GraftSql.sql(spark,
      "SELECT k FROM soat_t UNION ALL SELECT k FROM soat_t WHERE k>3 " +
        "INTERSECT SELECT k FROM soat_t WHERE k>2 ORDER BY k LIMIT 2 " +
        "UNION ALL SELECT k FROM soat_t WHERE k=1").collect().map(_.getInt(0))
    assert(i.sorted.toSeq == Seq(1, 1, 2), i.mkString(","))
  }

  test("CASE..END ident is an implicit alias, never an alias reference (r14 mutation find)") {
    import spark.implicits._
    Seq(1, 2).toDF("k").createOrReplaceTempView("iea_t")
    // probed live: `END c9` aliases the CASE, and the alias substitutes
    // laterally ({c9:6,d:16},{c9:5,d:15})
    val r = GraftSql.sql(spark,
      "SELECT CASE WHEN k>1 THEN 5 ELSE 6 END c9, c9 + 10 AS d FROM iea_t ORDER BY k")
      .collect()
    assert(r.map(_.getInt(0)).toSeq == Seq(6, 5), r.mkString(";"))
    assert(r.map(_.getInt(1)).toSeq == Seq(16, 15), r.mkString(";"))
    // a duplicate via END-tail alias must not splice an expression into
    // alias position (the r14 corpus find: parse error before the fix)
    val dup = GraftSql.sql(spark,
      "SELECT k+1 AS c1, CASE WHEN k>1 THEN 5 ELSE 6 END c1, k FROM iea_t ORDER BY k")
      .collect()
    assert(dup.length == 2, dup.mkString(";"))
  }

  test("type-strict guards null-check the VALUE before the type throw (advisor r13)") {
    import spark.implicits._
    // reference probed live this round: OCTET_LENGTH / JSON_VALUE over
    // a numeric column whose rows are ALL NULL return NULLs (strings.js
    // val==null short-circuit precedes the class throw); the first
    // NON-null row still raises
    Seq[(Integer, Integer)]((1, null), (2, null))
      .toDF("id", "n").createOrReplaceTempView("tsn_t")
    val r = GraftSql.sql(spark,
      "SELECT OCTET_LENGTH(n) AS a, JSON_VALUE(n, '$.k') AS b FROM tsn_t").collect()
    assert(r.length == 2 && r.forall(x => x.isNullAt(0) && x.isNullAt(1)),
      r.mkString(";"))
    Seq[(Integer, Integer)]((1, null), (2, 7))
      .toDF("id", "n").createOrReplaceTempView("tsn_m")
    for (q <- Seq("SELECT OCTET_LENGTH(n) FROM tsn_m",
        "SELECT JSON_VALUE(n, '$.k') FROM tsn_m")) {
      val e = intercept[Exception] { GraftSql.sql(spark, q).collect() }
      assert(String.valueOf(e.getMessage).nonEmpty, q)
    }
  }

  test("heterogeneous set-op arms raise loudly; same-group widening passes (r15 boundary)") {
    // reference probed: SELECT 1 INTERSECT SELECT '1' is EMPTY there
    // (keyify → Map keys are raw JS values: number 1 ≠ string '1'),
    // and the UNION keeps BOTH rows as a heterogeneous column. Spark
    // widens both arms to one type and would MATCH them — a silent
    // wrong answer; graft refuses with the explained boundary error.
    for (op <- Seq("INTERSECT", "UNION", "EXCEPT ALL")) {
      val err = intercept[IllegalArgumentException] {
        GraftSql.sql(spark, s"SELECT 1 AS c0 $op SELECT '1' AS c0")
      }
      assert(err.getMessage.contains("heterogeneous set operation"), s"$op: ${err.getMessage}")
    }
    // numeric↔numeric widening is harmless (JS numbers have no
    // int/double split) — must NOT trip the guard
    val n = GraftSql.sql(spark,
      "SELECT 1 AS c0 UNION SELECT 2.5 AS c0 ORDER BY c0").collect()
    assert(n.length == 2)
    // NULL-typed arms are wildcard-compatible with any group
    val z = GraftSql.sql(spark,
      "SELECT NULL AS c0 UNION SELECT 'x' AS c0 ORDER BY c0").collect()
    assert(z.length == 2)
    // a nested set op inside a subquery is guarded too
    val nested = intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        "SELECT * FROM (SELECT 1 AS c0 INTERSECT SELECT 'x' AS c0)")
    }
    assert(nested.getMessage.contains("heterogeneous set operation"))
    // CTE-referencing arms can't analyze in isolation — the guard
    // SKIPS them (never a false rejection on a valid query)
    val cte = GraftSql.sql(spark,
      "WITH a AS (SELECT 1 AS c0) SELECT c0 FROM a UNION SELECT 2 AS c0 ORDER BY c0").collect()
    assert(cte.length == 2)
  }
}
