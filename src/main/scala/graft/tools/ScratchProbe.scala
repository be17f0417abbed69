package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch-disk characterization for the heaviest TPC-H shuffles at
  * sf100: runs each query in its own isolated `spark.local.dir` with a
  * sampler thread recording the scratch HIGH-WATER mark, and reports
  * peak bytes + bytes-per-lineitem-row per query — turning "exceeds
  * this VM's disk" into the per-executor provisioning number a
  * 1000-executor deployment can size against (each executor shuffles
  * rows/1000, so required local disk ≈ bytes_per_row × rows ÷ 1000 ×
  * safety factor).
  *
  * A query that dies with ENOSPC still reports: the sampler's last
  * peak IS the measurement (the disk line this VM imposes), recorded
  * with `"status":"failed"` rather than discarded.
  *
  * Env: SPARK_GRAFT_SF_DIR (default data/sf100),
  *      SPARK_GRAFT_QUERIES (default q_tpch_q5,q_tpch_q9,q_tpch_q18,
  *      q_tpch_q21 — q5 joined the probe set in r14 as the slowest
  *      sf100 TPC-H query, so the heaviest shuffle shapes are all
  *      characterized),
  *      SPARK_GRAFT_SCRATCH (default /tmp/graft_scratch_probe),
  *      SPARK_GRAFT_OUT (default SCRATCH_SF100.json; also merged into
  *      BENCH_SF100.json under "scratch_probe" when that file exists).
  */
object ScratchProbe {

  private final class Sampler(root: java.nio.file.Path) extends Thread {
    @volatile var peak = 0L
    @volatile private var stopped = false
    setDaemon(true)
    def snapshotAndReset(): Long = { val p = peak; peak = 0L; p }
    def shutdown(): Unit = stopped = true
    private def treeSize(p: java.nio.file.Path): Long = {
      var total = 0L
      // files vanish mid-walk as shuffles release: walk/iterate throw
      // UncheckedIOException (a RuntimeException, NOT IOException — an
      // IOException-only catch let the thread DIE mid-probe and a later
      // query read peak=0) — catch NonFatal at every level
      try {
        val s = java.nio.file.Files.walk(p)
        try {
          val it = s.iterator()
          var more = true
          while (more) {
            try {
              more = it.hasNext
              if (more) {
                val f = it.next()
                if (java.nio.file.Files.isRegularFile(f))
                  total += java.nio.file.Files.size(f)
              }
            } catch { case scala.util.control.NonFatal(_) => more = false }
          }
        } finally s.close()
      } catch { case scala.util.control.NonFatal(_) => }
      total
    }
    override def run(): Unit =
      while (!stopped) {
        try {
          val n = treeSize(root)
          if (n > peak) peak = n
        } catch { case scala.util.control.NonFatal(_) => }
        Thread.sleep(1000)
      }
  }

  private def r3(d: Double): Double = math.round(d * 1000) / 1000.0

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "data/sf100")
    val queries = sys.env.getOrElse("SPARK_GRAFT_QUERIES",
      "q_tpch_q5,q_tpch_q9,q_tpch_q18,q_tpch_q21")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val scratch = sys.env.getOrElse("SPARK_GRAFT_SCRATCH", "/tmp/graft_scratch_probe")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_OUT", "SCRATCH_SF100.json")
    val scratchPath = java.nio.file.Paths.get(scratch)
    java.nio.file.Files.createDirectories(scratchPath)

    // shuffle parallelism + periodic cleaner GC derived from the data
    // size in GraftSession.scaleBuilder (SPARK_GRAFT_SHUFFLE overrides)
    val spark = graft.GraftSession.scaleBuilder("graft-scratch-probe", Seq(sfDir))
      .config("spark.local.dir", scratch)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    val liRows = spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val sampler = new Sampler(scratchPath)
    sampler.start()

    // current on-disk bytes (not the high-water mark) — used to WAIT for
    // the previous query's shuffle files to actually unlink
    def liveBytes(): Long = {
      var total = 0L
      try {
        val s = java.nio.file.Files.walk(scratchPath)
        try {
          val it = s.iterator()
          while (it.hasNext) {
            val f = it.next()
            try if (java.nio.file.Files.isRegularFile(f)) total += java.nio.file.Files.size(f)
            catch { case scala.util.control.NonFatal(_) => }
          }
        } finally s.close()
      } catch { case scala.util.control.NonFatal(_) => }
      total
    }

    val results = queries.map { name =>
      // release the PREVIOUS query's shuffle files before measuring this
      // one: ContextCleaner unlinks on GC, but one gc+2s was not always
      // enough — an r14 run recorded q9 at q5's leftover high-water mark.
      // GC repeatedly and wait until the live tree drains (or 60 s cap),
      // then zero the high-water mark.
      var settle = 0
      while (settle < 30 && liveBytes() > (64L << 20)) {
        System.gc(); Thread.sleep(2000); settle += 1
      }
      sampler.snapshotAndReset()
      val t0 = System.nanoTime()
      val status =
        try {
          graft.SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          "ok"
        } catch {
          case e: Throwable =>
            System.err.println(s"[scratch] $name FAILED: ${e.getMessage}")
            "failed"
        }
      val secs = (System.nanoTime() - t0) / 1e9
      val peak = sampler.peak // high-water across THIS query's run
      val bytesPerRow = math.round(peak.toDouble / liRows * 1000) / 1000.0
      println(s"[scratch] $name: status=$status sec=${r3(secs)} " +
        s"peak_scratch=${peak} (${peak >> 30} GiB) bytes_per_li_row=$bytesPerRow")
      s"""\"$name\":{\"status\":\"$status\",\"sec\":${r3(secs)},""" +
        s"""\"peak_scratch_bytes\":$peak,\"bytes_per_lineitem_row\":$bytesPerRow}"""
    }
    sampler.shutdown()

    val json =
      s"""{\"metric\":\"scratch_probe\",\"dir\":\"$sfDir\",\"lineitem_rows\":$liRows,""" +
        s"""\"shuffle_partitions\":${spark.conf.get("spark.sql.shuffle.partitions")},""" +
        s"""\"note\":\"peak spark.local.dir bytes per query; per-executor disk at E executors ~ bytes_per_lineitem_row * rows / E\",""" +
        s"""\"queries\":{${results.mkString(",")}}}"""
    println(json)
    val w = new java.io.PrintWriter(outPath, "UTF-8")
    try w.println(json) finally w.close()

    // merge into BENCH_SF100.json (additive key) when present
    val benchFile = new java.io.File("BENCH_SF100.json")
    if (benchFile.isFile) try {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = om.readTree(benchFile).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      root.set[com.fasterxml.jackson.databind.JsonNode]("scratch_probe", om.readTree(json))
      om.writerWithDefaultPrettyPrinter().writeValue(benchFile, root)
      println(s"[scratch] merged into ${benchFile.getName}")
    } catch { case e: Exception =>
      System.err.println(s"[scratch] merge into BENCH_SF100.json failed: $e")
    }
    spark.stop()
  }
}
