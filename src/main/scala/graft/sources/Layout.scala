package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Storage-layout operators: how a 100 TB table should land on disk so
  * every later scan reads as little of it as possible. The reference
  * engine streams from host-provided arrays and never owns layout; a
  * cluster engine must, because layout is where the three big read-side
  * savings live:
  *
  *  - PARTITION PRUNING — hive-partition by a low-cardinality filter
  *    column (date, language, source) and a matching predicate never
  *    opens non-matching directories at all ([[partitionedWrite]]);
  *  - ROW-GROUP SKIPPING — sort by a selective column before writing and
  *    parquet min/max footers let a range predicate skip whole files and
  *    row groups ([[sortedWrite]]);
  *  - SMALL-FILE COMPACTION — streaming ingest and over-parallel writes
  *    leave thousands of KB-sized files whose per-file open/footer cost
  *    dominates scans; periodic compaction rewrites them near a target
  *    size ([[compact]]).
  */
object Layout {

  /** Hive-style partitioned write. The input is repartitioned BY THE
    * PARTITION COLUMNS first: without that, every one of N write tasks
    * holds rows for every partition value and emits a file into each
    * directory — N×|values| small files from one write (the classic
    * small-file explosion). With it, each partition value's rows land in
    * one task. `subSplits` > 1 spreads one value across that many tasks
    * (and files) when single values are large or skewed — at 100 TB a
    * hot date/language needs more than one writer.
    */
  def partitionedWrite(df: DataFrame, path: String, partitionCols: Seq[String],
                       subSplits: Int = 1): Unit = {
    require(subSplits >= 1, "subSplits must be >= 1")
    val spread =
      if (subSplits == 1) df.repartition(partitionCols.map(col): _*)
      else {
        val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
        df.repartition(parts,
          partitionCols.map(col) :+ org.apache.spark.sql.functions
            .pmod(org.apache.spark.sql.functions.spark_partition_id(),
              org.apache.spark.sql.functions.lit(subSplits)): _*)
      }
    spread.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*).parquet(path)
  }

  /** Range-partition on `sortCols` into `numFiles` files, sorted within
    * each — produces non-overlapping per-file value ranges, so parquet
    * min/max statistics turn any range/equality predicate on the sort
    * prefix into file- and row-group-level skipping. This is the
    * single-dimension form of clustering; for multi-column skipping,
    * sort by the highest-selectivity column first.
    */
  def sortedWrite(df: DataFrame, path: String, sortCols: Seq[String],
                  numFiles: Int): Unit = {
    require(numFiles >= 1, "numFiles must be >= 1")
    df.repartitionByRange(numFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Compact a parquet directory's files toward `targetBytes` each:
    * reads the current layout, computes the file count from the ACTUAL
    * on-disk bytes (never a row-count guess — compression ratios vary
    * wildly), rewrites through a staging directory, then atomically
    * swaps. The staging hop matters: Spark plans lazily, so overwriting
    * a directory while reading it would delete the input before the
    * first task runs. Returns (filesBefore, filesAfter).
    */
  def compact(spark: SparkSession, path: String, targetBytes: Long): (Int, Int) = {
    require(targetBytes > 0, "targetBytes must be > 0")
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(p: Path) =
      fs.listStatus(p).filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val before = dataFiles(hPath)
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val staging = new Path(path + "_compacting")
    spark.read.parquet(path).repartition(nOut)
      .write.mode(SaveMode.Overwrite).parquet(staging.toString)
    fs.delete(hPath, true)
    fs.rename(staging, hPath)
    (before.length, dataFiles(hPath).length)
  }
}
