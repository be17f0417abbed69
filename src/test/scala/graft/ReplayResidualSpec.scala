package graft

import graft.plans.GraftSql
import org.apache.spark.sql.functions._

/** The replay classifiers' residual cases, each pinned against the
  * LIVE reference (tools/ref_probe.mjs) instead of passing through a
  * hand-reviewed allow-list. For every residual this spec establishes
  * one of two things, mechanically:
  *
  *   - SAME-INPUT AGREEMENT: when graft is given the same single-typed
  *     inputs the recorded snapshot carries, its rows equal the
  *     reference's rows on those inputs — the replay divergence is an
  *     artifact of the RECORDER's typed snapshot (Spark schema
  *     inference over untyped JS rows), not an engine difference.
  *   - STRUCTURAL IMPOSSIBILITY: the reference's expected OUTPUT is
  *     itself untypeable (one column holding a number in one row and a
  *     string in the next) or the construct sits outside Spark's
  *     correlation scoping — with the boundary demonstrated, not
  *     asserted.
  */
class ReplayResidualSpec extends SparkSpec {

  private lazy val nodeOk =
    try new ProcessBuilder("node", "--version").start().waitFor() == 0
    catch { case _: Exception => false }

  private val om = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Run one query over inline tables on the reference; Left(error) or
    * Right(rows as Jackson nodes).
    */
  private def refProbe(tablesJson: String, query: String):
      Either[String, Seq[com.fasterxml.jackson.databind.JsonNode]] = {
    val payload = s"""{"tables":$tablesJson,"query":${om.writeValueAsString(query)}}"""
    val pb = new ProcessBuilder("node", "tools/ref_probe.mjs", payload)
    pb.environment().put("TZ", "UTC")
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes()).trim
    assert(proc.waitFor() == 0, s"ref_probe failed: ${out.takeRight(500)}")
    val n = om.readTree(out.linesIterator.toSeq.last)
    if (n.has("error")) Left(n.get("error").asText())
    else Right((0 until n.get("rows").size()).map(n.get("rows").get(_)))
  }

  test("SUM/AVG over a string-typed column: same-input agreement (was untyped-artifact)") {
    assume(nodeOk, "node not available")
    // the recorded snapshot of execute.aggregate.test.js »
    // 'should skip non-numeric values in SUM/AVG/MIN/MAX' loads `value`
    // as a STRING column (mixed 10/'abc' has no Spark type). The
    // reference's accumulator folds Number(value) and keeps finite
    // results (accumulator.js:60-67), so on the all-string column it
    // STILL answers 30/15 — and with the graft_js_num wrap, so does
    // graft. Engine agreement on equal inputs; divergence was the
    // recorder's coercion.
    val coerced = """{"data":[{"id":1,"value":"10"},{"id":2,"value":null},
      {"id":3,"value":"abc"},{"id":4,"value":"20"}]}""".stripMargin.replaceAll("\n\\s*", "")
    val q = "SELECT SUM(value) AS total, AVG(value) AS avg FROM data"
    val ref = refProbe(coerced, q).toOption.get
    assert(ref.length == 1 && ref.head.get("total").asDouble() == 30.0 &&
      ref.head.get("avg").asDouble() == 15.0, s"reference changed: $ref")
    import spark.implicits._
    Seq((1, "10"), (2, null), (3, "abc"), (4, "20")).toDF("id", "value")
      .createOrReplaceTempView("data")
    val got = GraftSql.sqlDerived(spark, q).collect().head
    assert(got.getDouble(0) == 30.0 && got.getDouble(1) == 15.0,
      s"graft diverged from the reference on the same string inputs: $got")
  }

  test("GREATEST/LEAST with an all-null column: same-input agreement via NullType load") {
    assume(nodeOk, "node not available")
    // execute.strings.test.js » 'should skip null values' (GREATEST and
    // LEAST describes): column `a` is all-null — no type in the JS rows.
    // Loaded as NullType (the faithful choice, now what loadViews does),
    // Spark's coercion gives it the siblings' type and GREATEST/LEAST
    // skip nulls exactly like the reference.
    val tables = """{"data":[{"id":1,"a":null,"b":3,"c":1}]}"""
    for ((fn, want) <- Seq("GREATEST" -> 3, "LEAST" -> 1)) {
      val q = s"SELECT $fn(a, b, c) AS result FROM data"
      val ref = refProbe(tables, q).toOption.get
      assert(ref.head.get("result").asInt() == want, s"reference changed: $ref")
      spark.range(1).select(lit(null).as("a"), lit(3L).as("b"), lit(1L).as("c"))
        .createOrReplaceTempView("data")
      val got = GraftSql.sqlDerived(spark, q).collect().head
      assert(got.getLong(0) == want, s"graft $fn diverged on NullType input: $got")
    }
  }

  test("COALESCE over a mixed number/string column: the EXPECTED OUTPUT is untypeable") {
    assume(nodeOk, "node not available")
    // execute.strings.test.js » 'should work with mixed types': the
    // reference's expected rows are {result: 42} then {result:
    // 'string'} — ONE output column holding a number in row 1 and a
    // string in row 2. No Spark column type carries that, so no typed
    // engine can replay the triple cell-exactly; this is a structural
    // property of the expectation, not a graft defect. The probe
    // verifies the heterogeneity against the live reference, and that
    // graft's single-typed answer agrees cell-TEXT-wise.
    val tables = """{"data":[{"id":1,"a":null,"b":42},{"id":2,"a":"string","b":42}]}"""
    val q = "SELECT COALESCE(a, b) AS result FROM data"
    val ref = refProbe(tables, q).toOption.get
    assert(ref(0).get("result").isNumber && ref(1).get("result").isTextual,
      s"reference output no longer heterogeneous: $ref")
    import spark.implicits._
    Seq((1, null, 42L), (2, "string", 42L)).toDF("id", "a", "b")
      .createOrReplaceTempView("data")
    // graft's side of the pin: ANSI implicit coercion resolves
    // COALESCE(string, bigint) to BIGINT, and the non-numeric cell
    // rejects at runtime — the typed engine cannot produce a column
    // that is a number in one row and text in the next, and says so
    // rather than silently stringifying. Documented strictness
    // divergence (SURVEY §2.24), structural, not a defect.
    val err = intercept[Exception](
      GraftSql.sqlDerived(spark, q).collect())
    assert(String.valueOf(err.getMessage).contains("CAST_INVALID_INPUT"),
      s"expected the ANSI coercion rejection: ${err.getMessage}")
  }

  test("JSON_KEYS insertion order: engine agrees on text input; loss is read.json's sorted structs") {
    assume(nodeOk, "node not available")
    // execute.json.test.js » 'should return the keys of a JSON object':
    // the reference asserts INSERTION key order. The snapshot (JSON
    // text) still carries that order — it is Spark's read.json schema
    // inference that canonicalizes struct fields to sorted order at
    // LOAD. Given the original text, graft's JSON_KEYS preserves
    // insertion order like the reference. CLOSED in round 12: the
    // replay now loads this entry's object cells as raw JSON text
    // (SuiteReplaySpec.rawJsonTextLoad) and the row is cell-exact; this
    // pin keeps the underlying engine agreement and the loader-artifact
    // demonstration on record.
    val doc = """{"b":1,"a":2,"c":3}"""
    val ref = refProbe("""{"t":[{"x":1}]}""",
      s"SELECT JSON_KEYS('$doc') AS ks FROM t")
    val refKs = ref.toOption.get.head.get("ks")
    assert((0 until refKs.size()).map(refKs.get(_).asText()) == Seq("b", "a", "c"),
      s"reference changed: $refKs")
    import spark.implicits._
    Seq(doc).toDF("j").createOrReplaceTempView("t")
    val got = GraftSql.sqlDerived(spark, "SELECT JSON_KEYS(j) AS ks FROM t")
      .collect().head.getSeq[String](0)
    assert(got == Seq("b", "a", "c"), s"graft lost insertion order on text input: $got")
    // and the loader artifact itself, demonstrated: inference sorts
    val inferred = spark.read.json(Seq(s"""{"o":$doc}""").toDS()).schema
    val fieldOrder = inferred.fields.head.dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSeq
    assert(fieldOrder == Seq("a", "b", "c"),
      "read.json no longer sorts struct fields — the classifier entry may be removable")
  }

  test("JSON_KEYS of an empty object: engine agrees on text input; all-{} columns vanish at load") {
    assume(nodeOk, "node not available")
    // execute.json.test.js » 'should return an empty array for an empty
    // object': an all-{} column infers no fields at all, so the COLUMN
    // disappears from the loaded schema — nothing for any engine to
    // query. On the original text, graft agrees with the reference.
    // CLOSED in round 12 via SuiteReplaySpec.rawJsonTextLoad (see the
    // insertion-order test above) — the row replays cell-exact now.
    val ref = refProbe("""{"t":[{"x":1}]}""", "SELECT JSON_KEYS('{}') AS ks FROM t")
    assert(ref.toOption.get.head.get("ks").size() == 0, "reference changed")
    import spark.implicits._
    Seq("{}").toDF("j").createOrReplaceTempView("t")
    val got = GraftSql.sqlDerived(spark, "SELECT JSON_KEYS(j) AS ks FROM t")
      .collect().head.getSeq[String](0)
    assert(got == Seq(), s"graft: $got")
    val inferred = spark.read.json(Seq("""{"id":1,"o":{}}""").toDS()).schema
    assert(!inferred.fieldNames.contains("o"),
      "read.json now keeps empty-object columns — the classifier entry may be removable")
  }

  test("ORDER BY + LIMIT over fully-tied keys: any subset is legal; graft satisfies the test's own assertions") {
    assume(nodeOk, "node not available")
    // execute.orderby.test.js » 'should sort many groups without
    // overflowing the call stack' (the replay's one tie-limited row):
    // 200k groups, every cnt = 1, ORDER BY cnt DESC LIMIT 5 — the sort
    // key ties COMPLETELY, so which 5 groups survive is unspecified;
    // the reference's own test asserts only length and the cnt values.
    // No engine can be cell-equal to another here. Small-analog probe:
    // the reference keeps ITS arbitrary legal subset...
    val tables = """{"data":[{"g":0},{"g":1},{"g":2},{"g":3},{"g":4},{"g":5}]}"""
    val q = "SELECT g, COUNT(*) AS cnt FROM data GROUP BY g ORDER BY cnt DESC LIMIT 3"
    val ref = refProbe(tables, q).toOption.get
    assert(ref.length == 3 && ref.forall(_.get("cnt").asInt() == 1),
      s"reference changed: $ref")
    // ...and graft, run at the ORIGINAL 200k scale, satisfies exactly
    // the assertions the reference test itself makes: 5 rows, cnt = 1.
    spark.range(200000).selectExpr("id AS g").createOrReplaceTempView("data")
    val got = GraftSql.sqlDerived(spark,
      "SELECT g, COUNT(*) AS cnt FROM data GROUP BY g ORDER BY cnt DESC LIMIT 5")
      .collect()
    assert(got.length == 5 && got.forall(_.getLong(1) == 1L),
      s"graft fails the reference test's own assertions: ${got.toSeq}")
  }

  test("missing struct field: reference resolves per row to null, graft rejects at analysis") {
    assume(nodeOk, "node not available")
    // the replay's one schema-lenient row: the reference resolves
    // object FIELDS lazily per row, so selecting an absent field
    // yields an all-null column; Spark analyzes the schema up front
    // and rejects — the correct behavior at 100 TB (a typo'd field in
    // a petabyte scan should fail in milliseconds, not return a
    // billion nulls). Probed live on the analog shape.
    val tables = """{"t":[{"id":1,"o":{"x":1}},{"id":2,"o":{"x":2}}]}"""
    val q = "SELECT o.y AS y FROM t"
    val ref = refProbe(tables, q).toOption.get
    assert(ref.length == 2 && ref.forall(r => r.get("y") == null || r.get("y").isNull),
      s"reference changed: $ref")
    import spark.implicits._
    spark.read.json(Seq("""{"id":1,"o":{"x":1}}""", """{"id":2,"o":{"x":2}}""").toDS())
      .createOrReplaceTempView("t")
    val err = intercept[Exception](GraftSql.sqlDerived(spark, q).collect())
    assert(String.valueOf(err.getMessage).contains("FIELD_NOT_FOUND") ||
      String.valueOf(err.getMessage).contains("UNRESOLVED"),
      s"expected up-front schema rejection: ${err.getMessage}")
  }

  test("nested lateral UNNEST correlating two levels out: Spark scoping boundary, semantics expressible") {
    assume(nodeOk, "node not available")
    // execute.subquery.test.js » 'should preserve the enclosing
    // correlated row inside nested lateral UNNEST': the scalar subquery
    // joins UNNEST(o.arr) where `o` is the OUTER query's row — a
    // correlation reaching through two query levels. Spark's analyzer
    // scopes lateral/outer references one level deep and rejects the
    // shape; the SEMANTICS (count(t) * size(arr)) are expressible and
    // agree with the reference.
    val tables = """{"outers":[{"id":1,"arr":[10,20]},{"id":2,"arr":[30]}],
      "t":[{"k":1},{"k":2}]}""".replaceAll("\n\\s*", "")
    val q = """SELECT o.arr,
      (SELECT COUNT(*) FROM t JOIN UNNEST(o.arr) AS u(x) ON TRUE) AS n
      FROM outers AS o"""
    val ref = refProbe(tables, q).toOption.get
    assert(ref.map(_.get("n").asInt()) == Seq(4, 2), s"reference changed: $ref")
    import spark.implicits._
    Seq((1, Seq(10, 20)), (2, Seq(30))).toDF("id", "arr")
      .createOrReplaceTempView("outers")
    Seq(1, 2).toDF("k").createOrReplaceTempView("t")
    // the boundary, demonstrated: the reference's shape fails analysis
    val err = intercept[Exception](GraftSql.sqlDerived(spark, q).collect())
    assert(err.getMessage != null, "expected an analysis error")
    // the semantics, expressed within one correlation level, agree
    val equiv = spark.sql(
      "SELECT size(arr) * (SELECT COUNT(*) FROM t) AS n FROM outers ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(equiv == Seq(4L, 2L))
  }
}
