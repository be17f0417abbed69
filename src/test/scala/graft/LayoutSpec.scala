package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.sources.Layout

/** Storage layout: the read-side savings must be OBSERVABLE, not
  * claimed — partition pruning in the scan node, file skipping via
  * which files actually produce rows, compaction via file counts.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_layout_$tag").resolve("t").toString

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
    df.collect() // finalize any adaptive plan before inspecting it
    val plan = df.queryExecution.executedPlan
    val unwrapped = plan.collectFirst { case a: AdaptiveSparkPlanExec => a.executedPlan }
      .getOrElse(plan)
    unwrapped.collectFirst { case s: FileSourceScanExec => s }.get
  }

  test("partitioned write prunes directories at the scan, one file per value") {
    val docs = spark.range(400)
      .selectExpr("id AS doc_id", "CASE id % 4 WHEN 0 THEN 'en' WHEN 1 THEN 'de' WHEN 2 THEN 'es' ELSE 'fr' END AS lang")
    val dir = tmpDir("part")
    Layout.partitionedWrite(docs, dir, Seq("lang"))

    val read = spark.read.parquet(dir).filter($"lang" === "en")
    val scan = scanOf(read)
    // the lang predicate must be a PARTITION filter (directory pruning),
    // not a data filter evaluated after opening every file
    assert(scan.partitionFilters.exists(_.toString.contains("lang")),
      s"no partition filter in ${scan.partitionFilters}")
    assert(read.count() == 100)
    // and only the lang=en directory's files are touched
    val files = read.select(input_file_name()).distinct().as[String].collect()
    assert(files.nonEmpty && files.forall(_.contains("lang=en")), files.mkString(", "))
    // repartition-by-partition-cols holds the file count to one per value
    assert(files.length == 1, s"expected 1 file for lang=en, got ${files.length}")
  }

  test("sorted write gives disjoint per-file ranges and range scans touch one file") {
    val rows = spark.range(10000).selectExpr("id", "id % 97 AS payload")
    val dir = tmpDir("sorted")
    Layout.sortedWrite(rows, dir, Seq("id"), numFiles = 8)

    val all = spark.read.parquet(dir)
    // per-file min/max ranges must not overlap — that is what parquet
    // footer stats skip on
    val ranges = all.groupBy(input_file_name().as("f"))
      .agg(min("id").as("lo"), max("id").as("hi"))
      .as[(String, Long, Long)].collect().sortBy(_._2)
    assert(ranges.length == 8, s"expected 8 files, got ${ranges.length}")
    ranges.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 < lo2, s"overlap: $hi1 >= $lo2")
      case _ =>
    }
    // a selective range predicate produces rows from exactly one file
    val hit = all.filter($"id" >= 100 && $"id" <= 120)
    assert(hit.count() == 21)
    val touched = hit.select(input_file_name()).distinct().count()
    assert(touched == 1, s"range scan produced rows from $touched files")
    // and the predicate is pushed to the scan for row-group skipping
    val scan = scanOf(hit)
    assert(scan.metadata("PushedFilters").contains("GreaterThanOrEqual(id,100)"),
      scan.metadata("PushedFilters"))
  }

  test("z-order write bounds file fan-out for predicates on EITHER column") {
    // 100x100 grid: a single-column sort would give perfect skipping on
    // that column and none on the other; z-order must bound both
    val grid = spark.range(10000).selectExpr("id % 100 AS x", "id DIV 100 AS y")
    val dir = tmpDir("zorder")
    Layout.zorderWrite(grid, dir, "x", "y", numFiles = 16, bits = 8)
    val all = spark.read.parquet(dir)
    assert(all.count() == 10000)
    val totalFiles = all.select(input_file_name()).distinct().count()
    assert(totalFiles == 16L, s"expected 16 files, got $totalFiles")
    def filesTouched(pred: String): Long =
      all.filter(pred).select(input_file_name()).distinct().count()
    // strips along each axis: each must touch a minority of files
    // (a plain x-sort would send the y-strip to ALL 16)
    assert(filesTouched("x >= 10 AND x <= 19") <= 8, "x-strip fan-out too wide")
    assert(filesTouched("y >= 10 AND y <= 19") <= 8, "y-strip fan-out too wide")
    // a 1% box should land in very few z-blocks
    assert(filesTouched("x >= 10 AND x <= 19 AND y >= 10 AND y <= 19") <= 3,
      "box fan-out too wide")
  }

  test("compaction folds a small-file explosion toward the target size") {
    val rows = spark.range(20000).selectExpr("id", "CAST(id AS STRING) AS s")
    val dir = tmpDir("compact")
    // simulate an over-parallel ingest: 40 tiny files
    rows.repartition(40).write.parquet(dir)
    val before = spark.read.parquet(dir)
    val filesBefore = before.select(input_file_name()).distinct().count()
    assert(filesBefore == 40L)
    val sum0 = before.agg(sum("id")).as[Long].head()

    val (nBefore, nAfter) = Layout.compact(spark, dir, targetBytes = 512L * 1024)
    assert(nBefore == 40 && nAfter < 10, s"compacted $nBefore -> $nAfter")
    // contents identical after the rewrite
    val after = spark.read.parquet(dir)
    assert(after.count() == 20000 && after.agg(sum("id")).as[Long].head() == sum0)
  }

  test("compaction of a hive-partitioned dir preserves the pruning layout") {
    val docs = spark.range(4000)
      .selectExpr("id", "CASE id % 2 WHEN 0 THEN 'en' ELSE 'de' END AS lang")
    val dir = tmpDir("compact_part")
    // over-parallel partitioned ingest: many files per lang=... dir
    docs.repartition(20).write.partitionBy("lang").parquet(dir)
    val sum0 = spark.read.parquet(dir).agg(sum("id")).as[Long].head()

    val (nBefore, nAfter) = Layout.compact(spark, dir, targetBytes = 16L * 1024 * 1024)
    assert(nBefore == 40 && nAfter <= 2, s"compacted $nBefore -> $nAfter")
    val after = spark.read.parquet(dir).filter($"lang" === "en")
    // partition column survives as a PARTITION (directory pruning), not
    // a flattened data column
    assert(scanOf(after).partitionFilters.exists(_.toString.contains("lang")),
      "compact flattened the partition layout")
    assert(after.count() == 2000)
    assert(spark.read.parquet(dir).agg(sum("id")).as[Long].head() == sum0)
  }

  test("AtomicSwap: every interrupted-commit state recovers to a complete copy") {
    import org.apache.hadoop.fs.Path
    import graft.sources.AtomicSwap
    val fs = new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)
    def writeDir(p: Path, tag: String): Unit =
      Seq(tag).toDF("v").write.mode("overwrite").parquet(p.toString)
    def readTag(p: Path): String =
      spark.read.parquet(p.toString).as[String].head()

    // normal publish: staging replaces live, leftovers cleared
    val live = new Path(tmpDir("swap") + "/state")
    writeDir(live, "v1")
    writeDir(AtomicSwap.stagingOf(live), "v2")
    AtomicSwap.commit(fs, live)
    assert(readTag(live) == "v2")
    assert(!fs.exists(AtomicSwap.stagingOf(live)) && !fs.exists(new Path(live + "_old")))

    // crash after rename(live, old) but before rename(staging, live):
    // live missing, old + complete staging present -> finish the publish
    val l2 = new Path(tmpDir("swap2") + "/state")
    writeDir(new Path(l2 + "_old"), "v1")
    writeDir(AtomicSwap.stagingOf(l2), "v2")
    AtomicSwap.recover(fs, l2)
    assert(readTag(l2) == "v2" && !fs.exists(new Path(l2 + "_old")))

    // crash mid-write of a NON-first staging after old was renamed is
    // impossible (commit requires complete staging), but a crash that
    // removed staging leaves old only -> roll back
    val l3 = new Path(tmpDir("swap3") + "/state")
    writeDir(new Path(l3 + "_old"), "v1")
    AtomicSwap.recover(fs, l3)
    assert(readTag(l3) == "v1")

    // incomplete first-ever staging (no live, no old) -> dropped
    val l4 = new Path(tmpDir("swap4") + "/state")
    writeDir(AtomicSwap.stagingOf(l4), "partial")
    AtomicSwap.recover(fs, l4)
    assert(!fs.exists(l4) && !fs.exists(AtomicSwap.stagingOf(l4)))

    // live intact with stale leftovers -> leftovers cleared, live kept
    val l5 = new Path(tmpDir("swap5") + "/state")
    writeDir(l5, "v3")
    writeDir(AtomicSwap.stagingOf(l5), "junk")
    writeDir(new Path(l5 + "_old"), "junk")
    AtomicSwap.recover(fs, l5)
    assert(readTag(l5) == "v3")
    assert(!fs.exists(AtomicSwap.stagingOf(l5)) && !fs.exists(new Path(l5 + "_old")))
  }

  test("sharded export: deterministic membership, one file per shard, seed-independent orders") {
    val df = spark.range(2000).toDF("id")
    val d1 = tmpDir("shard1"); val d2 = tmpDir("shard2"); val d3 = tmpDir("shard3")
    Layout.shardedExport(df, "id", d1, shards = 8, seed = "ep1")
    // different input partitioning must rebuild identical membership
    Layout.shardedExport(df.repartition(13), "id", d2, shards = 8, seed = "ep1")
    Layout.shardedExport(df, "id", d3, shards = 8, seed = "ep2")
    def membership(d: String): Map[Long, Int] =
      spark.read.parquet(d).select(col("id"), col("_shard"))
        .as[(Long, Int)].collect().toMap
    val m1 = membership(d1)
    assert(m1.keySet.size == 2000)
    assert(m1.values.toSet.size == 8, s"expected 8 shards, got ${m1.values.toSet}")
    assert(m1 == membership(d2), "membership must not depend on input partitioning")
    assert(m1 != membership(d3), "a different seed must reshuffle")
    // one data file per shard directory
    val shardDirs = new java.io.File(d1).listFiles().filter(_.getName.startsWith("_shard="))
    assert(shardDirs.length == 8)
    assert(shardDirs.forall(_.listFiles().count(_.getName.endsWith(".parquet")) == 1),
      "each shard must be exactly one file")
  }

  test("schema evolution: mergeSchema unions parquet files written with different columns") {
    val dir = tmpDir("evolve")
    Seq((1L, "a")).toDF("id", "name").write.parquet(dir + "/v1")
    Seq((2L, "b", 9.5)).toDF("id", "name", "score").write.parquet(dir + "/v2")
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(dir + "/v1", dir + "/v2")
    assert(merged.columns.toSet == Set("id", "name", "score"))
    val rows = merged.select("id", "name", "score")
      .as[(Long, String, Option[Double])].collect().toSet
    assert(rows == Set((1L, "a", None), (2L, "b", Some(9.5))))
  }
}
