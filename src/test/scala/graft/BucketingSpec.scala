package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Co-located joins via bucketing: two tables bucketed by the join key
  * sort-merge join with NO shuffle exchange — the 100 TB recipe for
  * repeated large-fact joins (bucket once, join many times shuffle-free).
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def shuffles(p: SparkPlan): Int = {
    def walk(n: SparkPlan): Int = (n match {
      case _: ShuffleExchangeExec => 1
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case _ => 0
    }) + n.children.map(walk).sum
    walk(p)
  }

  test("join of two tables bucketed by the key plans without a shuffle") {
    val a = spark.range(10000).selectExpr("id AS k", "id * 2 AS va")
    val b = spark.range(10000).selectExpr("id AS k", "id * 3 AS vb")
    a.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bk_a")
    b.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bk_b")
    try {
      val joined = spark.sql(
        """SELECT /*+ MERGE(bk_a) */ a.k, va, vb
          |FROM bk_a a JOIN bk_b b ON a.k = b.k""".stripMargin)
      assert(joined.count() == 10000)
      val n = shuffles(joined.queryExecution.executedPlan)
      assert(n == 0, s"expected shuffle-free bucketed join, got $n shuffles:\n" +
        joined.queryExecution.executedPlan.toString.take(1200))
    } finally {
      spark.sql("DROP TABLE IF EXISTS bk_a")
      spark.sql("DROP TABLE IF EXISTS bk_b")
    }
  }

  test("date-partitioned layout prunes partitions at the scan") {
    // the other half of the 100 TB layout story: a time-partitioned table
    // (the standard events/documents layout) must turn a date predicate
    // into PartitionFilters — touching 1 of N directories, not a
    // full-table scan filtered afterwards
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_part_events"
    spark.range(3000)
      .selectExpr("id", "CAST(date_add(DATE '2024-01-01', CAST(id % 30 AS INT)) AS STRING) AS day",
        "CAST(id AS DOUBLE) * 1.5 AS value")
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    val q = spark.read.parquet(dir).filter("day = '2024-01-07'").selectExpr("sum(value)")
    val formatted = q.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val scanLine = formatted.linesIterator.filter(_.contains("PartitionFilters")).mkString
    assert(scanLine.contains("2024-01-07"), s"date predicate not pushed to partitions:\n$scanLine")
    assert(q.collect().head.getDouble(0) > 0)
    // the scan reads exactly one of the 30 day-directories
    val scanned = q.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(!scanned.contains("PushedFilters: [IsNotNull(day)"),
      "day must be a partition column, not a data filter")
  }
}
