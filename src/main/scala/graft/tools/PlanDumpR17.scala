package graft.tools

import java.nio.file.{Files, Paths}

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dumps `.explain("formatted")` output for named queries to
  * `plans/r17/<query>_<suffix>.txt` — the before/after plan evidence for
  * the round-17 optimization pass. Args: <suffix> <query>...
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object PlanDumpR17 {
  def main(args: Array[String]): Unit = {
    val suffix = args.head
    val names = args.tail.toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get("plans/r17"))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        Files.writeString(Paths.get(s"plans/r17/${name}_$suffix.txt"),
          df.queryExecution.explainString(FormattedMode))
        println(s"PLANDUMP wrote plans/r17/${name}_$suffix.txt")
      } catch {
        case e: Throwable => System.err.println(s"PLANDUMP $name failed: $e")
      }
      graft.operators.Caches.unpersistAll()
    }
    spark.stop()
  }
}
