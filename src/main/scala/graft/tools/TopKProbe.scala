package graft.tools

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe: old (mapPartitions) vs new (rank-limit) TopK on the
  * q_text_substring_dup hot-pairs input — isolates the r16 shuffle-bytes
  * delta. Not part of the driver contract.
  */
object TopKProbe {
  def oldPerKey(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column], k: Int,
                rankCol: String = "rnk"): DataFrame = {
    val schema = df.schema
    val keyIdx = keyCols.map(schema.fieldIndex)
    val partial = df
      .sortWithinPartitions(orderCols: _*)
      .mapPartitions { it =>
        val seen = scala.collection.mutable.HashMap.empty[Seq[Any], Int]
        it.filter { r =>
          val key = keyIdx.map(r.get)
          val c = seen.getOrElse(key, 0)
          if (c < k) { seen.update(key, c + 1); true } else false
        }
      }(Encoders.row(schema))
    partial
      .withColumn(rankCol, row_number().over(
        Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)))
      .filter(col(rankCol) <= k)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val work = new graft.Bench.WorkStats
    spark.sparkContext.addSparkListener(work)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def hotPairs: DataFrame = {
      val pairs0 = docs
        .withColumn("_tk", expr("filter(split(lower(trim(text)), '\\\\s+'), x -> x <> '')"))
        .withColumn("win", explode(expr(
          "IF(size(_tk) >= 7, transform(sequence(1, size(_tk) - 6), i -> array_join(slice(_tk, i, 7), ' ')), CAST(array() AS ARRAY<STRING>))")))
        .select(col("doc_id"), col("win"))
        .distinct()
      val cached = graft.operators.Caches.track(pairs0)
      val counts = cached.groupBy("win").agg(count(lit(1)).as("n")).filter(col("n") >= 2)
      cached.join(counts.select("win"), Seq("win"), "left_semi")
    }
    def run(tag: String, agg: Boolean = true)(mk: DataFrame => DataFrame): Unit = {
      graft.operators.Caches.unpersistAll()
      val topk = mk(hotPairs)
      val df = if (agg)
        topk.groupBy("win").agg(to_json(sort_array(collect_list(col("doc_id")))).as("ex"))
      else topk
      df.write.format("noop").mode("overwrite").save() // warm
      org.apache.spark.GraftListenerDrain.drain(spark.sparkContext)
      work.reset()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.GraftListenerDrain.drain(spark.sparkContext)
      println(f"TOPKPROBE $tag%-8s $dt%7.3f s work=${work.snapshotJson()}")
      // per-node shuffle metrics of the LAST SQL execution
      try {
        val store = spark.sharedState.statusStore
        val ex = store.executionsList().last
        val metrics = store.executionMetrics(ex.executionId)
        ex.metrics.filter(m => m.name.contains("shuffle bytes written") ||
            m.name.contains("number of output rows")).foreach { m =>
          // find the node this metric belongs to via the plan graph
        }
        val graph = store.planGraph(ex.executionId)
        graph.allNodes.foreach { n =>
          val sh = n.metrics.filter(m => m.name.contains("shuffle bytes written") ||
              m.name.contains("number of output rows"))
            .flatMap(m => metrics.get(m.accumulatorId)
              .map(v => s"${m.name}=${v.replaceAll("\\s+", " ")}"))
          if (sh.nonEmpty &&
              (n.name.contains("Exchange") || n.name.contains("WindowGroupLimit") ||
               n.name.contains("InMemory") || n.name.contains("MapPartitions")))
            println(s"TOPKNODE $tag ${n.name}#${n.id}: ${sh.mkString(", ")}")
        }
      } catch { case e: Throwable => println(s"TOPKPROBE metrics failed: $e") }
      graft.operators.Caches.unpersistAll()
    }
    // cardinalities
    graft.operators.Caches.unpersistAll()
    val hp0 = hotPairs
    println(s"TOPKPROBE hotPairs rows=${hp0.count()} wins=${hp0.select("win").distinct().count()}")
    graft.operators.Caches.unpersistAll()
    // bare TopK, no downstream aggregate
    run("oldBare", agg = false)(hp => oldPerKey(hp, Seq("win"), Seq(col("doc_id")), 3))
    run("newBare", agg = false)(hp => graft.operators.TopK.perKey(hp, Seq("win"), Seq(col("doc_id")), 3))
    run("old")(hp => oldPerKey(hp, Seq("win"), Seq(col("doc_id")), 3).drop("rnk"))
    run("new")(hp => graft.operators.TopK.perKey(hp, Seq("win"), Seq(col("doc_id")), 3).drop("rnk"))
    spark.stop()
  }
}
