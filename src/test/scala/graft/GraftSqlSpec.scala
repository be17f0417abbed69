package graft

import graft.plans.GraftSql

/** Dialect front-end: squirreling SQL strings run unchanged on Spark
  * (reference: syntax.md — the constructs users actually hit).
  */
class GraftSqlSpec extends SparkSpec {
  import spark.implicits._

  test("json arrows rewrite to get_json_object") {
    assert(GraftSql.rewrite("SELECT j -> 'a' FROM t")
      == "SELECT get_json_object(j, '$.a') FROM t")
    assert(GraftSql.rewrite("SELECT j ->> 'a' FROM t")
      == "SELECT get_json_object(j, '$.a') FROM t")
    assert(GraftSql.rewrite("SELECT j -> 0 FROM t")
      == "SELECT get_json_object(j, '$[0]') FROM t")
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
}
