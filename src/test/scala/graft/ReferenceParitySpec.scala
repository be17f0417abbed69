package graft

import graft.plans.GraftSql
import org.apache.spark.sql.Row

/** Parity with the reference engine's own execute tests: the same literal
  * fixtures (reference: test/execute/execute.join.test.js:10 users/orders,
  * execute.math.test.js numbers, execute.strings.test.js users) and the
  * same SQL strings, run through the dialect front-end, must produce the
  * same rows.
  */
class ReferenceParitySpec extends SparkSpec {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    Seq((1, "Alice", 30, "NYC", true), (2, "Bob", 25, "LA", true),
        (3, "Charlie", 35, "NYC", false), (4, "Diana", 28, "LA", true),
        (5, "Eve", 30, "NYC", true))
      .toDF("id", "name", "age", "city", "active").createOrReplaceTempView("users")
    Seq((1, 1, "Laptop", 1000), (2, 1, "Mouse", 50),
        (3, 2, "Keyboard", 100), (4, 4, "Monitor", 500))
      .toDF("id", "user_id", "product", "amount").createOrReplaceTempView("orders")
    Seq((1, Some(5.7), Some(-3.2)), (2, Some(2.3), Some(-8.9)),
        (3, Some(10.0), Some(-10.0)), (4, Some(0.0), Some(0.0)))
      .toDF("id", "value", "negative").createOrReplaceTempView("numbers")
    Seq((1, "Alice", "alice@example.com", "NYC"), (2, "Bob", "bob@test.com", "LA"),
        (3, "Charlie", "charlie@example.org", "NYC"), (4, "diana", "DIANA@EXAMPLE.COM", "LA"))
      .toDF("id", "name", "email", "city").createOrReplaceTempView("susers")
    Seq((1, "Alice", Option.empty[Int]), (2, "Bob", Some(1)),
        (3, "Charlie", Some(1)), (4, "Diana", Some(2)))
      .toDF("id", "name", "manager_id").createOrReplaceTempView("employees")
  }

  private def norm(v: Any): Any = v match {
    case null => "<null>"
    case d: Double => if (d == d.floor && !d.isInfinite) d.toLong.toString else f"$d%.6g"
    case f: Float => norm(f.toDouble)
    case d: java.math.BigDecimal => norm(d.doubleValue())
    case n: Number => n.longValue().toString
    case x => x.toString
  }
  private def rows(sql: String): Seq[Seq[Any]] =
    GraftSql.sql(spark, sql).collect().toSeq.map((r: Row) => r.toSeq.map(norm))

  private def checkSet(sql: String, expected: Seq[Seq[Any]]): Unit =
    assert(rows(sql).toSet == expected.map(_.map(norm)).toSet, s"\nSQL: $sql")
  private def checkOrdered(sql: String, expected: Seq[Seq[Any]]): Unit =
    assert(rows(sql) == expected.map(_.map(norm)), s"\nSQL: $sql")

  test("string functions (execute.strings.test.js)") {
    checkOrdered("SELECT UPPER(name) AS upper_name FROM susers ORDER BY id",
      Seq(Seq("ALICE"), Seq("BOB"), Seq("CHARLIE"), Seq("DIANA")))
    checkSet("SELECT name, UPPER(city) AS upper_city FROM susers WHERE city = 'NYC'",
      Seq(Seq("Alice", "NYC"), Seq("Charlie", "NYC")))
    checkOrdered("SELECT LOWER(email) AS e FROM susers WHERE id = 4",
      Seq(Seq("diana@example.com")))
    checkOrdered(
      "SELECT SUBSTR(name, 1, 3) AS s, LENGTH(name) AS l, name || '!' AS c FROM susers WHERE id = 1",
      Seq(Seq("Ali", 5, "Alice!")))
    checkOrdered("SELECT TRIM('  x  ') AS t, REPLACE('aaa', 'a', 'b') AS r FROM susers WHERE id = 1",
      Seq(Seq("x", "bbb")))
    checkOrdered("SELECT SPLIT_PART(email, '@', 2) AS domain FROM susers WHERE id = 2",
      Seq(Seq("test.com")))
    checkOrdered("SELECT POSITION('@' IN email) AS p FROM susers WHERE id = 1",
      Seq(Seq(6)))
  }

  test("math functions (execute.math.test.js)") {
    checkOrdered("SELECT FLOOR(value) AS floored FROM numbers ORDER BY id",
      Seq(Seq(5), Seq(2), Seq(10), Seq(0)))
    checkOrdered("SELECT CEIL(value) AS ceiled FROM numbers ORDER BY id",
      Seq(Seq(6), Seq(3), Seq(10), Seq(0)))
    checkOrdered("SELECT ROUND(value) AS rounded FROM numbers ORDER BY id",
      Seq(Seq(6), Seq(2), Seq(10), Seq(0)))
    checkOrdered("SELECT ABS(negative) AS a FROM numbers ORDER BY id",
      Seq(Seq(3.2), Seq(8.9), Seq(10), Seq(0)))
    checkOrdered("SELECT id, value FROM numbers WHERE FLOOR(value) = 5", Seq(Seq(1, 5.7)))
    checkOrdered("SELECT MOD(10, 3) AS m, POWER(3, 4) AS p, SQRT(16.0) AS s FROM numbers WHERE id = 1",
      Seq(Seq(1, 81, 4)))
    checkOrdered("SELECT SIGN(-5) AS a, SIGN(0) AS b, SIGN(10) AS c FROM numbers WHERE id = 1",
      Seq(Seq(-1, 0, 1)))
  }

  test("joins (execute.join.test.js)") {
    checkSet(
      """SELECT users.name, orders.product FROM users
        |JOIN orders ON users.id = orders.user_id""".stripMargin,
      Seq(Seq("Alice", "Laptop"), Seq("Alice", "Mouse"),
        Seq("Bob", "Keyboard"), Seq("Diana", "Monitor")))
    checkSet(
      """SELECT users.name, orders.product FROM users
        |LEFT JOIN orders ON users.id = orders.user_id""".stripMargin,
      Seq(Seq("Alice", "Laptop"), Seq("Alice", "Mouse"), Seq("Bob", "Keyboard"),
        Seq("Charlie", "<null>"), Seq("Diana", "Monitor"), Seq("Eve", "<null>")))
    checkSet(
      """SELECT employees.name AS employee, managers.name AS manager
        |FROM employees JOIN employees AS managers
        |  ON employees.manager_id = managers.id""".stripMargin,
      Seq(Seq("Bob", "Alice"), Seq("Charlie", "Alice"), Seq("Diana", "Bob")))
    checkOrdered("SELECT count(*) AS n FROM users CROSS JOIN orders", Seq(Seq(20)))
    checkSet(
      """SELECT u.name, o.amount FROM users u
        |JOIN orders o ON u.id = o.user_id AND o.amount > 100""".stripMargin,
      Seq(Seq("Alice", 1000), Seq("Diana", 500)))
  }

  test("group/having (execute.group.test.js, execute.having.test.js)") {
    checkSet("SELECT city, COUNT(*) AS n FROM users GROUP BY city",
      Seq(Seq("NYC", 3), Seq("LA", 2)))
    checkSet("SELECT city, AVG(age) AS avg_age FROM users GROUP BY city HAVING AVG(age) > 27",
      Seq(Seq("NYC", "31.6667")))
    checkSet("SELECT active, SUM(age) AS total FROM users GROUP BY active",
      Seq(Seq(true, 113), Seq(false, 35)))
    checkOrdered("SELECT COUNT(*) AS n, MIN(age) AS lo, MAX(age) AS hi FROM users",
      Seq(Seq(5, 25, 35)))
  }

  test("where predicates (execute.where.test.js, execute.between.test.js)") {
    checkSet("SELECT name FROM users WHERE age BETWEEN 28 AND 30",
      Seq(Seq("Alice"), Seq("Diana"), Seq("Eve")))
    checkSet("SELECT name FROM users WHERE city IN ('LA')",
      Seq(Seq("Bob"), Seq("Diana")))
    checkSet("SELECT name FROM users WHERE name LIKE 'A%'", Seq(Seq("Alice")))
    checkSet("SELECT name FROM users WHERE NOT active", Seq(Seq("Charlie")))
    checkSet("SELECT name FROM employees WHERE manager_id IS NULL", Seq(Seq("Alice")))
    checkSet("SELECT name FROM users WHERE age > 25 AND city = 'NYC' OR id = 2",
      Seq(Seq("Alice"), Seq("Bob"), Seq("Charlie"), Seq("Eve")))
  }

  test("case/cast (execute.test.js, execute.cast.test.js)") {
    checkSet(
      """SELECT name, CASE WHEN age >= 30 THEN 'senior' ELSE 'junior' END AS level
        |FROM users""".stripMargin,
      Seq(Seq("Alice", "senior"), Seq("Bob", "junior"), Seq("Charlie", "senior"),
        Seq("Diana", "junior"), Seq("Eve", "senior")))
    checkOrdered("SELECT CAST('42' AS BIGINT) AS i, CAST(age AS STRING) AS s FROM users WHERE id = 1",
      Seq(Seq(42, "30")))
    checkOrdered("SELECT id::STRING AS s FROM users WHERE id = 3", Seq(Seq("3")))
  }

  test("order by / limit / distinct (execute.orderby.test.js, topk.test.js)") {
    checkOrdered("SELECT name FROM users ORDER BY age DESC, name LIMIT 2",
      Seq(Seq("Charlie"), Seq("Alice")))
    checkOrdered("SELECT name FROM users ORDER BY age ASC LIMIT 2 OFFSET 1",
      Seq(Seq("Diana"), Seq("Alice")))
    checkSet("SELECT DISTINCT city FROM users", Seq(Seq("NYC"), Seq("LA")))
    checkOrdered("SELECT id, negative FROM numbers ORDER BY ABS(negative)",
      Seq(Seq(4, 0), Seq(1, -3.2), Seq(2, -8.9), Seq(3, -10)))
  }

  test("union (execute.union.test.js)") {
    checkSet(
      "SELECT city FROM users WHERE id <= 2 UNION SELECT city FROM users WHERE id >= 4",
      Seq(Seq("NYC"), Seq("LA")))
    checkOrdered(
      "SELECT city FROM users WHERE id = 1 UNION ALL SELECT city FROM users WHERE id = 5",
      Seq(Seq("NYC"), Seq("NYC")))
  }

  test("window functions (execute.window.test.js)") {
    checkSet(
      """SELECT name, ROW_NUMBER() OVER (PARTITION BY city ORDER BY age DESC, id) AS rn
        |FROM users""".stripMargin,
      Seq(Seq("Charlie", 1), Seq("Alice", 2), Seq("Eve", 3),
        Seq("Diana", 1), Seq("Bob", 2)))
    checkOrdered(
      """SELECT name, LAG(age) OVER (ORDER BY id) AS prev_age FROM users ORDER BY id""",
      Seq(Seq("Alice", "<null>"), Seq("Bob", 30), Seq("Charlie", 25),
        Seq("Diana", 35), Seq("Eve", 28)))
    checkOrdered(
      """SELECT name, SUM(age) OVER (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
        |FROM users ORDER BY id""".stripMargin,
      Seq(Seq("Alice", 30), Seq("Bob", 55), Seq("Charlie", 90),
        Seq("Diana", 118), Seq("Eve", 148)))
  }

  test("subqueries (execute.subquery.test.js)") {
    checkSet(
      "SELECT name FROM users WHERE id IN (SELECT user_id FROM orders WHERE amount > 99)",
      Seq(Seq("Alice"), Seq("Bob"), Seq("Diana")))
    checkSet(
      "SELECT name FROM users u WHERE EXISTS (SELECT 1 FROM orders o WHERE o.user_id = u.id)",
      Seq(Seq("Alice"), Seq("Bob"), Seq("Diana")))
    checkOrdered(
      "SELECT (SELECT MAX(amount) FROM orders) AS mx FROM users WHERE id = 1",
      Seq(Seq(1000)))
  }

  test("unnest and arrays (execute.unnest.test.js, execute.arrays.test.js)") {
    checkOrdered("SELECT UNNEST(STRING_SPLIT('a,b,c', ',')) AS part FROM users WHERE id = 1",
      Seq(Seq("a"), Seq("b"), Seq("c")))
    // reference subscripts are 0-based (JS semantics — reference:
    // src/expression/evaluate.js:133), same as Spark's arr[i]
    checkOrdered(
      "SELECT LEN(STRING_SPLIT(email, '@')) AS n, STRING_SPLIT(email, '@')[0] AS who FROM susers WHERE id = 2",
      Seq(Seq(2, "bob")))
  }

  test("aggregates with FILTER / COUNTIF / ARRAY_AGG (execute.aggregate.test.js)") {
    checkOrdered("SELECT COUNT(*) AS total, COUNT(manager_id) AS non_null FROM employees",
      Seq(Seq(4, 3)))
    checkOrdered("SELECT COUNTIF(active) AS active_count FROM users", Seq(Seq(4)))
    checkOrdered("SELECT COUNTIF(age > 28) AS over_28 FROM users", Seq(Seq(3)))
    checkOrdered(
      "SELECT COUNT(*) FILTER (WHERE amount > 99) AS cnt, SUM(amount) FILTER (WHERE user_id = 1) AS s FROM orders",
      Seq(Seq(3, 1050)))
    checkOrdered("SELECT ARRAY_SORT(ARRAY_AGG(DISTINCT city)) AS cities FROM users",
      Seq(Seq("""ArraySeq(LA, NYC)""")))
    checkOrdered("SELECT COUNT(DISTINCT city) AS unique_cities FROM users", Seq(Seq(2)))
    checkOrdered("SELECT AVG(age) AS a FROM users WHERE age > 100", Seq(Seq("<null>")))
    checkOrdered("SELECT COUNT(*) AS cnt FROM users HAVING COUNT(*) > 10", Seq())
  }

  test("datetime and intervals (execute.datetime.test.js, execute.interval.test.js)") {
    // CAST(timestamp AS STRING) is the JSON.stringify path in the
    // reference — QUOTED ISO with millis (probed; evaluate.js:703-706).
    // The previous expectation here pinned Spark's rendering, not the
    // reference's — fixed by the JS-stringification work.
    checkOrdered(
      "SELECT CAST(TIMESTAMP '2025-01-01 00:00:00' + INTERVAL 14 DAY AS STRING) AS d FROM users WHERE id = 1",
      Seq(Seq("\"2025-01-15T00:00:00.000Z\"")))
    checkOrdered(
      "SELECT DATE_DIFF('day', TIMESTAMP '2025-01-01 12:00:00', TIMESTAMP '2025-01-03 11:00:00') AS d FROM users WHERE id = 1",
      Seq(Seq(1)))
    checkOrdered(
      "SELECT DATE_DIFF('month', TIMESTAMP '2024-11-15 00:00:00', TIMESTAMP '2025-02-01 00:00:00') AS d FROM users WHERE id = 1",
      Seq(Seq(3)))
    checkOrdered(
      "SELECT DATE_DIFF('hour', TIMESTAMP '2025-01-01 00:00:00', TIMESTAMP '2025-01-01 05:30:00') AS d FROM users WHERE id = 1",
      Seq(Seq(5)))
    checkOrdered(
      "SELECT YEAR(TIMESTAMP '2025-06-15 10:30:00') AS y, MONTH(TIMESTAMP '2025-06-15 10:30:00') AS m, DATE_PART('day', TIMESTAMP '2025-06-15 10:30:00') AS dd FROM users WHERE id = 1",
      Seq(Seq(2025, 6, 15)))
  }

  test("CTEs (execute.cte.test.js)") {
    checkSet(
      """WITH nyc AS (SELECT * FROM users WHERE city = 'NYC')
        |SELECT name FROM nyc WHERE age >= 30""".stripMargin,
      Seq(Seq("Alice"), Seq("Charlie"), Seq("Eve")))
    checkSet(
      """WITH a AS (SELECT id, age FROM users WHERE age > 27),
        |     b AS (SELECT id FROM a WHERE age < 31)
        |SELECT id FROM b""".stripMargin,
      Seq(Seq(1), Seq(4), Seq(5)))
  }

  test("regex functions (execute.regex.test.js)") {
    Seq((1, "abc 123 def 456", "ABC-123"), (2, "no digits here", "XYZ-789"))
      .toDF("id", "text", "code").createOrReplaceTempView("rdata")
    checkOrdered("SELECT REGEXP_SUBSTR(text, '[0-9]+') AS num FROM rdata ORDER BY id",
      Seq(Seq("123"), Seq("<null>")))
    checkOrdered("SELECT REGEXP_EXTRACT(text, '[0-9]+') AS num FROM rdata WHERE id = 1",
      Seq(Seq("123")))
    checkOrdered("SELECT REGEXP_MATCHES(text, '[0-9]+') AS has_num FROM rdata ORDER BY id",
      Seq(Seq(true), Seq(false)))
    checkSet("SELECT code FROM rdata WHERE REGEXP_MATCHES(code, '^ABC')",
      Seq(Seq("ABC-123")))
    checkOrdered("SELECT REGEXP_REPLACE(text, '[0-9]+', '#', 'g') AS r FROM rdata WHERE id = 1",
      Seq(Seq("abc # def #")))
  }

  test("string edge cases (execute.strings.test.js)") {
    // negative SUBSTR start is an ERROR in the reference — live-probed:
    // "SUBSTR(string, start[, length]): start position must be a
    // positive integer, got -3. SQL uses 1-based indexing." (This test
    // used to assert DuckDB's from-the-end reading; the r13
    // literal-guard closure aligned graft with the reference's actual
    // row-1 throw, caught here.)
    val e = intercept[Exception] {
      graft.plans.GraftSql.sql(spark,
        "SELECT SUBSTR(name, -3) AS tail FROM susers WHERE id = 1").collect()
    }
    assert(String.valueOf(e.getMessage).contains("start position must be a positive integer"),
      e.getMessage)
    // POSITION not-found returns 0
    checkOrdered("SELECT POSITION('z' IN name) AS p FROM susers WHERE id = 2", Seq(Seq(0)))
    // || propagates NULL
    checkOrdered("SELECT name || NULL AS c FROM susers WHERE id = 1", Seq(Seq("<null>")))
  }

  test("json access (execute.json.test.js, execute.dot.test.js)") {
    Seq((1, """{"name": "widget", "specs": {"weight": 10}, "tags": ["a", "b"]}"""))
      .toDF("id", "doc").createOrReplaceTempView("jdocs")
    checkOrdered(
      "SELECT doc ->> 'name' AS n, doc -> 'specs' ->> 'weight' AS w, doc -> 'tags' ->> 0 AS t FROM jdocs",
      Seq(Seq("widget", 10, "a")))
  }

  test("error semantics (execute.errors.test.js)") {
    // analysis-time errors fail fast with a descriptive exception, like
    // the reference's validation layer (reference: src/validation)
    def fails(sql: String, mustMention: String*): Unit = {
      val e = intercept[Exception](GraftSql.sql(spark, sql).collect())
      val msg = e.getMessage.toUpperCase
      assert(mustMention.exists(m => msg.contains(m.toUpperCase)),
        s"\nSQL: $sql\nexpected one of $mustMention in: ${e.getMessage.take(300)}")
    }
    // table not found
    fails("SELECT * FROM nonexistent_table_xyz", "NONEXISTENT_TABLE_XYZ")
    fails("SELECT u.id FROM users u JOIN no_such_orders o ON u.id = o.user_id",
      "NO_SUCH_ORDERS")
    // unknown column
    fails("SELECT not_a_column FROM users", "NOT_A_COLUMN")
    // wrong argument count (reference: UPPER(name, age) etc.)
    fails("SELECT UPPER(name, age) FROM users", "PARAMETER", "ARGUMENT")
    fails("SELECT LOWER(name, age) FROM users", "PARAMETER", "ARGUMENT")
    // unknown function
    fails("SELECT NO_SUCH_FUNCTION(name) FROM users", "UNRESOLVED_ROUTINE", "NOT")
    // invalid CAST target type
    fails("SELECT CAST(age AS NOTATYPE) FROM users", "NOTATYPE", "PARSE", "DATATYPE")
    // invalid INTERVAL unit (reference: FORTNIGHT)
    fails("SELECT CURRENT_DATE + INTERVAL 1 FORTNIGHT FROM users", "FORTNIGHT", "PARSE", "INTERVAL")
    // malformed-DATA cells differ deliberately: the reference throws with
    // a row number mid-stream; Spark's permissive JSON access yields NULL
    // (a 100 TB scan should not abort on one bad document) — pin that
    Seq((1, "{bad json")).toDF("id", "doc").createOrReplaceTempView("badjson")
    checkOrdered("SELECT doc ->> 'a' AS v FROM badjson", Seq(Seq("<null>")))
  }
}
