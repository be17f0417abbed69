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

  test("saved corpus band table: ingest candidates shuffle only the batch") {
    // the repeated-ingest shape at 100 TB — the corpus LSH index is
    // bucketed by the join key (Dedup.saveBandTable), so each arriving
    // batch shuffles its OWN bands to the bucket layout while every
    // corpus-side step (bucket-cap groupBy, cap join-back, candidate
    // join) rides the bucketed partitioning with zero exchanges
    import graft.operators.Dedup
    val corpus = spark.range(400).selectExpr("id AS doc_id",
      s"concat_ws(' ', 'alpha', concat('b', id % 7), concat('c', id % 5), " +
        "concat('d', id % 3), concat('e', id % 11), concat('f', id % 13), 'tail') AS text")
    val batch = spark.range(400, 450).selectExpr("id AS doc_id",
      s"concat_ws(' ', 'alpha', concat('b', id % 7), concat('c', id % 5), " +
        "concat('d', id % 3), concat('e', id % 11), concat('f', id % 13), 'tail') AS text")
    Dedup.saveBandTable(corpus, "doc_id", "text", "bk_corpus_bands", buckets = 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    // broadcast off so the join keys matter; AQE off so the executed plan
    // is a plain tree the walker below can traverse (query stages hide
    // their subtrees from `children`)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val cand = Dedup.candidatesAgainstBands(
        batch, spark.table("bk_corpus_bands"), "doc_id", "text")
      assert(cand.count() > 0)
      val root = cand.queryExecution.executedPlan
      val fmt = cand.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(fmt.contains("bk_corpus_bands"),
        "expected the bucketed corpus scan in the plan:\n" + fmt.take(1200))
      assert(fmt.contains("Bucketed: true"),
        "corpus scan must be a bucketed read:\n" + fmt.take(2000))
      // the join's corpus-side input must be exchange-free: the bucketed
      // scan IS the partitioning. (The batch side and the post-join
      // distinct still shuffle — those are proportional to the batch and
      // to the candidate set, not to the corpus.)
      def findJoin(n: SparkPlan): Option[SparkPlan] = n match {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => Some(j)
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => Some(j)
        case _ => n.children.flatMap(findJoin).headOption
      }
      val join = findJoin(root).getOrElse(
        fail("expected a shuffled join in the candidate plan:\n" + root.toString.take(1500)))
      val corpusSide = join.children.find(_.toString.contains("bk_corpus_bands")).getOrElse(
        fail("no join input scans the corpus band table:\n" + join.toString.take(1500)))
      def shuffleCount(n: SparkPlan): Int =
        (if (n.isInstanceOf[ShuffleExchangeExec]) 1 else 0) + n.children.map(shuffleCount).sum
      assert(shuffleCount(corpusSide) == 0,
        "corpus band table must not be shuffled below the join:\n" + corpusSide.toString.take(2500))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS bk_corpus_bands")
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
