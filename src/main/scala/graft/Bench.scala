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
      name -> run()
    }
    val failed = results.collect { case (n, None) => n }
    // The driver's artifact capture truncates long lines and r07 showed it
    // keeps the END — where the previous layout had put top50, wasting the
    // tail budget on mid-rank entries. Hedge BOTH directions: the compact
    // top50 (heaviest, descending) serializes EARLY in the line, and the
    // full map sorts time-ASCENDING so the line's end is also the heaviest.
    val timed = results.collect { case (k, Some(v)) => (k, math.round(v * 1000) / 1000.0) }
    val qs = timed.sortBy { case (k, v) => (v, k) }
      .map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val top50 = timed.sortBy { case (k, v) => (-v, k) }.take(50)
      .map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = math.round(results.flatMap(_._2).sum * 1000) / 1000.0
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","ok":${results.count(_._2.isDefined)},"failed":$failedJson,"sf":"$sfDir","top50":$top50,"queries":$qs}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
