package graft.tools

import graft.GraftSession

/** Dev scratchpad: probe cross-engine semantics quickly. Not part of the
  * driver contract.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("probe", 4)
    try {
      val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      events.printSchema()
      events.show(3, truncate = false)
    } catch { case e: Throwable => println(s"EVENTS READ FAILED: ${e.getMessage.take(300)}") }
    spark.sql("SELECT typeof(CAST('2020-01-01' AS TIMESTAMP)) t1, typeof(TIMESTAMP '2020-01-01') t2").show(false)
    spark.sql("SELECT split_part('a,b,c', ',', 2) sp, position('b' IN 'abc') pos, contains('abc','b') c").show(false)
    spark.sql("SELECT regexp_extract('foo123bar', '([0-9]+)', 1) re, 'foo123' RLIKE '[0-9]+' rl").show(false)
    spark.sql("SELECT listagg(x, ',') WITHIN GROUP (ORDER BY x) FROM VALUES ('b'),('a') AS t(x)").show(false)
    spark.sql("SELECT percentile_cont(0.25) WITHIN GROUP (ORDER BY x) FROM VALUES (1.0),(2.0),(3.0),(4.0) AS t(x)").show(false)
    spark.sql("SELECT json_object_keys('{\"a\":1,\"b\":2}') k, json_array_length('[1,2,3]') l").show(false)
    spark.sql("SELECT to_json(named_struct('k', 87)) j").show(false)
    spark.stop()
  }
}
