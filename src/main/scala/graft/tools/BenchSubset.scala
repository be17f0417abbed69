package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev-only subset bench: same warm+steady noop-sink methodology as
  * graft.Bench, restricted to the query names given in args — for fast
  * optimization iterations. Not part of the driver contract (the driver
  * runs graft.Bench, which is unchanged).
  *
  * Usage: runMain graft.tools.BenchSubset q_a q_b ...
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in Bench.
  */
object BenchSubset {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      // mirror graft.Bench's session exactly (r16 cached-plan AQE flag)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    // A/B experiment confs: SPARK_GRAFT_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); b.config(k, v) })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    try SparkEntry.queries("q_scan_project")(spark, sfDir).count()
    catch { case e: Throwable => System.err.println(s"[benchsub] warmup failed: $e") }
    val work = new graft.Bench.WorkStats
    spark.sparkContext.addSparkListener(work)
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
    })
    val names = if (args.nonEmpty) args.toSeq else Seq("q_scan_project")
    val out = names.map { name =>
      val fn = SparkEntry.queries(name)
      def run(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val warm = run()
      org.apache.spark.GraftListenerDrain.drain(spark.sparkContext)
      work.reset(); jobs.set(0); stages.set(0)
      val steady = run()
      org.apache.spark.GraftListenerDrain.drain(spark.sparkContext)
      val w = work.snapshotJson()
      val (nj, ns) = (jobs.get, stages.get)
      graft.operators.Caches.unpersistAll()
      println(f"SUBSET $name%-28s warm=$warm%8.3f steady=$steady%8.3f jobs=$nj%3d stages=$ns%3d work=$w")
      name -> steady
    }
    println(f"SUBSET_TOTAL steady=${out.map(_._2).sum}%8.3f")
    spark.stop()
  }
}
