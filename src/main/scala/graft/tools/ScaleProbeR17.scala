package graft.tools

import org.apache.spark.sql.functions._

/** r17 sf100 probe (VERDICT r16 #3): executes, at a generated sf100,
  * the two r16 optimizations that were only bench-proven at sf0.1 —
  *
  *  1. `spark.sql.optimizer.canChangeCachedPlanOutputPartitioning=true`
  *     on an ITERATIVE operator (Dedup.duplicateClusters — the
  *     entity-resolve / components kernel: persisted label frames read
  *     every propagation round). Run once with the flag (the engine
  *     default) and once with `SPARK_GRAFT_CACHED_AQE=false` to A/B.
  *  2. `Dedup.adaptiveBuckets` — the derived band-index bucket count.
  *     Records the derivation inputs/output at sf100 and runs the index
  *     build plus the first `SPARK_GRAFT_PROBE_SLICES` (default 2)
  *     incremental slices against it.
  *
  * Evidence per phase: wall, tasks, stages, failed tasks, peak task
  * execution memory, max task input, worst max/median task-input skew
  * (BenchSf10.TaskStats). Output JSON: env `SPARK_GRAFT_OUT`
  * (default PROBE_SF100_r17.json). Phases: env `SPARK_GRAFT_PHASES`
  * (clusters,bands; default both). Dir: env `SPARK_GRAFT_SF_DIR`
  * (default data/sf100).
  */
object ScaleProbeR17 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "data/sf100")
    val out = sys.env.getOrElse("SPARK_GRAFT_OUT", "PROBE_SF100_r17.json")
    val cachedAqe = sys.env.getOrElse("SPARK_GRAFT_CACHED_AQE", "true")
    val phases = sys.env.getOrElse("SPARK_GRAFT_PHASES", "clusters,bands")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    val nSlices = sys.env.getOrElse("SPARK_GRAFT_PROBE_SLICES", "2").toInt
    val spark = graft.GraftSession.scaleBuilder("scale-probe-r17", Seq(dir))
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", cachedAqe)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stats = new BenchSf10.TaskStats
    spark.sparkContext.addSparkListener(stats)

    val results = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def timed(name: String)(body: => String): Unit = {
      stats.reset()
      val t0 = System.nanoTime()
      val note =
        try body
        catch { case e: Throwable => s"\"FAILED: ${e.getMessage}\"" }
      val secs = math.round((System.nanoTime() - t0) / 1e6) / 1e3
      org.apache.spark.GraftListenerDrain.drain(spark.sparkContext)
      val (maxIn, worst, stages, tasks) = stats.skewSummary()
      results(name) =
        s"""{"sec":$secs,"tasks":$tasks,"stages":$stages,""" +
          s""""failed_tasks":${stats.failedTasks},""" +
          s""""peak_task_exec_mem_bytes":${stats.peakExecMem},""" +
          s""""max_task_input_bytes":$maxIn,"worst_task_over_median":$worst,""" +
          s""""note":$note}"""
      System.err.println(s"[probe] $name -> ${results(name)}")
      graft.operators.Caches.unpersistAll()
      System.gc(); Thread.sleep(300)
    }

    if (phases("clusters")) timed("clusters_label_propagation") {
      // 20M-vertex / ~150M-edge graph from sf100 orders — the same
      // shape q_components declares at mod 60, at a scale where every
      // propagation round's persisted label frame is GBs, not KBs
      val edges = graft.sources.Tables(spark, dir, "orders")
        .selectExpr("o_custkey % 20000000 AS src",
          "(o_custkey + o_orderkey) % 20000000 AS dst")
      val pairs = graft.operators.Graph.canonicalEdges(edges)
        .selectExpr("a AS a_id", "b AS b_id")
      val clusters = graft.operators.Dedup.duplicateClusters(pairs)
      val n = clusters.count()
      val distinct = clusters.agg(count_distinct(col("cluster"))).head.getLong(0)
      s"""{"vertices":$n,"clusters":$distinct,"cached_plan_aqe":$cachedAqe}"""
    }

    if (phases("bands")) {
      val docs = graft.sources.Tables(spark, dir, "documents")
      val derived = graft.operators.Dedup.adaptiveBuckets(docs)
      val estBytes = docs.queryExecution.optimizedPlan.stats.sizeInBytes
      timed("band_index_build") {
        graft.sources.Warehouse.resetTable(spark, "probe_band_idx_r17")
        graft.operators.Dedup.saveBandTable(docs, "doc_id", "text",
          "probe_band_idx_r17")
        s"""{"derived_buckets":$derived,"corpus_size_estimate_bytes":$estBytes}"""
      }
      timed(s"band_slices_first$nSlices") {
        graft.sources.Warehouse.resetTable(spark, "probe_band_slices_r17")
        val fs = graft.operators.Dedup.minhashLshSliced(docs, "doc_id", "text",
          table = "probe_band_slices_r17", slices = 8)
        var pairs = 0L
        fs.take(nSlices).foreach { mk =>
          graft.operators.Caches.scoped { pairs += mk().count() }
          System.gc(); Thread.sleep(300)
        }
        s"""{"slices_run":$nSlices,"pairs":$pairs}"""
      }
    }

    val body = results.map { case (k, v) => s"\"$k\":$v" }.mkString(
      s"""{"metric":"scale_probe_r17","dir":"$dir","cached_plan_aqe":$cachedAqe,""" +
        s""""shuffle_partitions":${spark.conf.get("spark.sql.shuffle.partitions")},""" +
        "\"phases\":{", ",", "}}")
    val w = new java.io.PrintWriter(out, "UTF-8")
    try w.println(body) finally w.close()
    println(body)
    spark.stop()
  }
}
