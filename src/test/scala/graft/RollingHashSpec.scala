package graft

/** Native fingerprint expression: equals the SQL fold and stays inside
  * whole-stage codegen.
  */
class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  test("matches the SQL aggregate formulation") {
    val df = Seq("hello world", "", "a", "Spark Engine 42!").toDF("t")
    val rows = df.selectExpr(
      "graft_rolling_hash(t) AS native",
      """aggregate(split(t, ''), CAST(0 AS BIGINT),
        |  (h, c) -> (h * 31 + ascii(c)) % 1000000007) AS sql""".stripMargin)
      .as[(Long, Long)].collect()
    rows.foreach { case (n, s) => assert(n == s) }
  }

  test("graft_hash60 equals the md5 hex-substring formulation") {
    val df = Seq("a", "", "hello world", "shingle one two", "日本語テキスト").toDF("t")
    val rows = df.selectExpr(
      "graft_hash60(t) AS native",
      "CAST(conv(substr(md5(t), 1, 15), 16, 10) AS BIGINT) AS sql")
      .as[(Long, Long)].collect()
    rows.foreach { case (n, s) => assert(n == s) }
  }

  test("graft_entropy equals the sorted-distinct SQL fold and known values") {
    val df = Seq("aaaa", "ab", "abcd", "hello world", "日本語日本語").toDF("t")
    val rows = df.selectExpr(
      "graft_entropy(t) AS native",
      """-aggregate(array_sort(array_distinct(split(t, ''))), CAST(0 AS DOUBLE),
        |  (acc, c) -> acc +
        |    (CAST(size(filter(split(t, ''), x -> x = c)) AS DOUBLE) / size(split(t, ''))) *
        |    (ln(CAST(size(filter(split(t, ''), x -> x = c)) AS DOUBLE) / size(split(t, ''))) / ln(2))) AS sql""".stripMargin)
      .as[(Double, Double)].collect()
    rows.foreach { case (n, s) => assert(n == s, s"native $n != sql $s") }
    val known = Seq("aaaa" -> 0.0, "ab" -> 1.0, "abcd" -> 2.0).toDF("t", "want")
      .selectExpr("graft_entropy(t) AS got", "want").as[(Double, Double)].collect()
    known.foreach { case (got, want) => assert(got == want) }
  }

  test("participates in whole-stage codegen") {
    val df = spark.range(100).selectExpr("graft_rolling_hash(CAST(id AS STRING)) AS h")
    // "*(n)" prefixes mark operators compiled into a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_rolling_hash"), plan.take(500))
    assert(df.collect().length == 100)
  }
}
