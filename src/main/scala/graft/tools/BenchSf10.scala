package graft.tools

import scala.collection.mutable
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.execution.QueryExecution

/** Scale run: executes the headline engine paths at a generated sfN
  * (default sf10 = 100× the sf0.1 bench rows) and records EVIDENCE that
  * the 100 TB design claims hold when actually run, not just
  * plan-asserted:
  *
  *   - wall time per query/phase, at the base sf AND the target sf, so
  *     time-vs-rows scaling is measured inside one harness;
  *   - per-stage task-input balance from a task-metrics listener
  *     (max task input bytes, worst max/median ratio over stages with
  *     meaningful input) — the "no task 10× the median" skew check;
  *   - AQE skew-split activations (final executed plans swept for
  *     `skew=true`) and peak task execution memory — the no-OOM check.
  *
  * Phases: (a) all 22 TPC-H queries, (b) the dedup battery
  * (minhashLsh → dropNearDuplicates → duplicateClusters), (c) the
  * IVF-PQ ANN read path (trained coarse cells + PQ codebook, nprobe
  * pruning, broadcast-LUT ADC scoring, TopK.perKey merge).
  */
object BenchSf10 {

  /** Per-stage task input sizes + global peaks, by listener. */
  final class TaskStats extends SparkListener {
    val byStage = mutable.Map[Int, mutable.ArrayBuffer[Long]]()
    @volatile var peakExecMem = 0L
    @volatile var failedTasks = 0
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
      if (e.reason.toString != "Success") failedTasks += 1
      val m = e.taskMetrics
      if (m != null) {
        val in = m.inputMetrics.bytesRead +
          m.shuffleReadMetrics.remoteBytesRead + m.shuffleReadMetrics.localBytesRead
        byStage.getOrElseUpdate(e.stageId, mutable.ArrayBuffer[Long]()) += in
        if (m.peakExecutionMemory > peakExecMem) peakExecMem = m.peakExecutionMemory
      }
    }
    /** (maxTaskInput, worstMaxOverMedian) over stages with median > 1 MB. */
    def skewSummary(): (Long, Double, Int, Int) = synchronized {
      val maxIn = byStage.values.flatten.foldLeft(0L)(math.max)
      var worst = 0.0
      for (tasks <- byStage.values if tasks.length >= 4) {
        val s = tasks.sorted
        val med = s(s.length / 2)
        if (med > (1L << 20)) worst = math.max(worst, s.last.toDouble / med)
      }
      (maxIn, math.round(worst * 100) / 100.0, byStage.size, byStage.values.map(_.size).sum)
    }
    def reset(): Unit = synchronized { byStage.clear(); peakExecMem = 0L; failedTasks = 0 }
  }

  /** Counts AQE skew-split activations in final executed plans. */
  final class SkewCounter extends QueryExecutionListener {
    @volatile var skewSplits = 0
    override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit = {
      val p = qe.executedPlan.toString
      skewSplits += "skew=true".r.findAllIn(p).size
    }
    override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    /** Per-phase attribution: snapshot-and-zero between phases. */
    def reset(): Int = { val n = skewSplits; skewSplits = 0; n }
  }

  private def time[A](body: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val r = body
    ((System.nanoTime() - t0) / 1e9, r)
  }
  private def r3(d: Double): Double = math.round(d * 1000) / 1000.0

  /** Which sweep sections run — env `SPARK_GRAFT_PHASES` (comma list of
    * tpch,dedup,spans,bpe,ann; default all). Lets an sf100-scale run
    * skip the training-dominated ANN phase (already measured at sf10 —
    * its cost is kmeans+PQ training, which the frozen-codebook
    * streaming design amortizes anyway) without forking the tool.
    */
  private val phases: Set[String] =
    sys.env.getOrElse("SPARK_GRAFT_PHASES", "tpch,dedup,spans,bpe,ann")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet

  /** One full phase sweep against `dir`; returns (name -> seconds). */
  private def sweep(spark: SparkSession, dir: String): Seq[(String, Double)] = {
    import graft.operators.{Dedup, TopK, Vectors}
    val out = mutable.ArrayBuffer[(String, Double)]()
    if (phases("tpch")) for (i <- 1 to 22) {
      val name = s"q_tpch_q$i"
      val (secs, _) = time {
        graft.SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      out += name -> r3(secs)
    }
    val docs = graft.sources.Tables(spark, dir, "documents")
    if (phases("dedup")) {
      val pairs = Dedup.minhashLsh(docs, "doc_id", "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (tPairs, nPairs) = time(pairs.count())
      out += "dedup_minhash_pairs" -> r3(tPairs)
      val (tDrop, nKept) = time(
        Dedup.dropNearDuplicates(docs, "doc_id", "text").count())
      out += "dedup_drop" -> r3(tDrop)
      val (tClust, nClust) = time(
        Dedup.duplicateClusters(pairs.select("a_id", "b_id")).count())
      out += "dedup_clusters" -> r3(tClust)
      pairs.unpersist()
      graft.operators.Caches.unpersistAll()
      println(s"[sf10] $dir dedup: pairs=$nPairs kept=$nKept clustered=$nClust")
    }

    // round-8 operators at scale: exact maximal dup spans (the planted
    // ~10% document duplicates give every sf real span work) and the
    // dictionary-encoded BPE token counting
    if (phases("spans")) {
      val (tSpans, nSpans) = time(
        graft.operators.TextOps.duplicateSpans(docs, "doc_id", "text",
          k = 6, minTokens = 8).count())
      out += "text_dup_spans" -> r3(tSpans)
      graft.operators.Caches.unpersistAll()
      println(s"[sf10] $dir spans=$nSpans")
    }
    if (phases("bpe")) {
      val (tBpe, nBpe) = time(
        graft.operators.Bpe.bpeTokenCounts(docs, "doc_id", "text").count())
      out += "bpe_token_counts" -> r3(tBpe)
      println(s"[sf10] $dir bpe_docs=$nBpe")
    }

    // IVF-PQ: sample-trained coarse cells + codebook (pure functions of
    // vec_id), corpus assigned via broadcast argmin — corpus never
    // shuffles; probe prunes to nprobe/kCells; ADC via broadcast LUT.
    val emb = graft.sources.Tables(spark, dir, "embeddings")
    if (phases("ann")) {
    val (tAnn, nAnn) = time {
      val kCells = 16
      val sample = emb.filter(pmod(col("vec_id"), lit(37)) === 0)
      val cellCents = Vectors.kmeans(sample, "vec_id", "embedding", k = kCells, iters = 2)
        .centroids.select(col("cid"), col("ce").as("qe"))
      val codebook = Vectors.pqTrain(sample, "vec_id", "embedding", m = 4, k = 16, iters = 2)
      val seedRow = cellCents.groupBy().agg(
        sort_array(collect_list(struct(col("cid"), col("qe")))).as("_seeds"))
      val fdist = "aggregate(zip_with(_qe, s.qe, (x, y) -> (x - y) * (x - y)), " +
        "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
      val quant = Vectors.microQuantExpr("embedding", 64, 1000000L, 1000000L, "sf10_ivfpq")
      val corpusCells = emb.filter(col("vec_id") >= 100)
        .crossJoin(broadcast(seedRow))
        .withColumn("_qe", expr(quant))
        .withColumn("cell", expr(
          s"array_min(transform(_seeds, s -> named_struct('d', $fdist, 'cid', s.cid))).cid"))
        .drop("_seeds", "_qe", "label")
      val corpus = Vectors.pqAssign(corpusCells, "vec_id", "embedding",
          codebook, m = 4, dims = 64)
        .select("vec_id", "cell", "pq_codes")
      val queries = emb.filter(col("vec_id") < 100)
        .select(col("vec_id").as("qid"), col("embedding"))
      val probed = queries.crossJoin(broadcast(seedRow))
        .withColumn("_qe", expr(quant))
        .withColumn("cell", explode(expr(
          "transform(slice(array_sort(transform(_seeds, " +
            s"s -> named_struct('d', $fdist, 'cid', s.cid))), 1, 4), p -> p.cid)")))
        .select("qid", "cell")
      val qlut = Vectors.pqLut(queries, "qid", "embedding", codebook,
        m = 4, dims = 64, scale = 1000000L, offset = 1000000L, op = "sf10_ivfpq")
      val scored = corpus.join(broadcast(probed), "cell")
        .join(broadcast(qlut), col("qid") === col("_qid"))
        .withColumn("adc", expr(Vectors.adcExpr("pq_codes", 4)))
        .select("qid", "vec_id", "adc")
      TopK.perKey(scored, Seq("qid"), Seq(col("adc").asc, col("vec_id").asc), 10).count()
    }
    out += "ann_ivfpq" -> r3(tAnn)
    println(s"[sf10] $dir ann rows=$nAnn")
    }
    out.toSeq
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF10_DIR", "data/sf10")
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_BASE_DIR", "/root/testdata/sf0.1")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_SF10_OUT", "BENCH_SF10.json")
    val spark = graft.GraftSession.get("graft-sf10")
    val stats = new TaskStats
    val skews = new SkewCounter
    spark.sparkContext.addSparkListener(stats)
    spark.listenerManager.register(skews)
    spark.range(1000).selectExpr("sum(id)").collect() // JVM/codegen warmup

    def phase(dir: String): String = {
      stats.reset()
      skews.reset() // drop warmup / previous-phase attributions
      val t0 = System.nanoTime()
      val times = sweep(spark, dir)
      val wall = (System.nanoTime() - t0) / 1e9
      // listener queue drains asynchronously; give it a beat before reading
      Thread.sleep(2000)
      val (maxIn, worstRatio, stages, tasks) = stats.skewSummary()
      val qs = times.map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
      s"""{"dir":"$dir","wall_sec":${r3(wall)},"queries":$qs,""" +
        s""""max_task_input_bytes":$maxIn,"worst_task_over_median":$worstRatio,""" +
        s""""stages":$stages,"tasks":$tasks,"failed_tasks":${stats.failedTasks},""" +
        s""""peak_task_exec_mem_bytes":${stats.peakExecMem},""" +
        s""""aqe_skew_splits":${skews.reset()}}"""
    }

    // measured, not assumed: the artifact's scale ratio comes from the
    // actual lineitem row counts of the two (env-overridable) dirs
    def liRows(dir: String): Long =
      spark.read.parquet(s"$dir/lineitem.parquet").count()
    val (baseRows, targetRows) = (liRows(baseDir), liRows(sfDir))
    val ratio = math.round(targetRows.toDouble / math.max(1L, baseRows) * 10) / 10.0

    val baseJson = phase(baseDir)
    val sfJson = phase(sfDir)
    val json =
      s"""{"metric":"sf10_scale_run","unit":"sec","rows_ratio":$ratio,""" +
        s""""base_lineitem_rows":$baseRows,"target_lineitem_rows":$targetRows,""" +
        s""""completed":true,"base":$baseJson,"target":$sfJson}"""
    println(json)
    val w = new java.io.PrintWriter(outPath)
    try w.println(json) finally w.close()
    spark.stop()
  }
}
