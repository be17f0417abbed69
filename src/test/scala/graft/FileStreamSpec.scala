package graft

import graft.streaming.EventPipeline
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** End-to-end streaming from a real file source: the driver-generated
  * events table is split into time-ranged parquet files and replayed one
  * file per micro-batch through the watermarked window graph — proving
  * the pipeline is source-agnostic beyond MemoryStream and that the
  * watermark advances across batches.
  */
class FileStreamSpec extends SparkSpec {

  test("parquet file stream feeds the windowed aggregation graph") {
    val dir = "/root/testdata/sf0.001"
    val scratch = s"${System.getProperty("java.io.tmpdir")}/graft_stream_events"
    val batch = graft.sources.Tables.events(spark, dir)
      .withColumn("ts", col("ts").cast("timestamp"))
    // time-ranged part files => file order ~ event-time order
    batch.repartitionByRange(4, col("ts")).write.mode("overwrite").parquet(scratch)

    val stream = spark.readStream
      .schema(batch.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(scratch)
    val q = EventPipeline.windowedCounts(stream, watermark = "30 minutes", window = "15 minutes")
      .writeStream.format("memory").queryName("file_win")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val expected = batch
        .groupBy(window(col("ts"), "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum("value").as("total"))
        .count()
      val got = spark.table("file_win").count()
      // append mode withholds windows inside the trailing watermark horizon
      assert(got > 0, "no windows emitted")
      assert(got <= expected)
      // emitted window contents must equal the batch truth
      val emitted = spark.table("file_win")
        .selectExpr("win_start", "event_type", "n", "CAST(total AS DOUBLE) AS total")
      val truth = batch
        .groupBy(window(col("ts"), "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum("value").as("total"))
        .selectExpr("window.start AS win_start", "event_type", "n", "CAST(total AS DOUBLE) AS total")
      assert(emitted.except(truth).count() == 0, "emitted window disagrees with batch truth")
    } finally q.stop()
  }
}
