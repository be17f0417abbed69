package graft

/** Native dot product: equals the SQL fold bit-for-bit and codegens. */
class DotProductSpec extends SparkSpec {
  import spark.implicits._

  test("matches aggregate(zip_with) fold exactly") {
    val df = Seq(
      (Array(1.0, 2.5, -3.25), Array(0.5, 4.0, 2.0)),
      (Array.tabulate(64)(i => math.sin(i + 1)), Array.tabulate(64)(i => math.cos(i * 2 + 1)))
    ).toDF("a", "b")
    val rows = df.selectExpr(
      "graft_dot(a, b) AS native",
      "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v) AS sql")
      .as[(Double, Double)].collect()
    rows.foreach { case (n, s) =>
      assert(java.lang.Double.doubleToLongBits(n) == java.lang.Double.doubleToLongBits(s))
    }
  }

  test("null array yields null") {
    val r = spark.sql("SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS d").collect().head
    assert(r.isNullAt(0))
  }
}
