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
}
