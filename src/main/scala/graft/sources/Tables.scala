package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry over the driver-generated parquet star schema.
  *
  * Analog of the reference's pluggable `AsyncDataSource` surface
  * (reference: src/backend/dataSource.js) — here a source is anything
  * `spark.read` can produce, and the engine operates on the resulting
  * DataFrame regardless of origin (parquet/csv/json/in-memory).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table from an sf directory. Column pruning + predicate
    * pushdown reach the parquet scan because callers compose Columns on
    * the returned DataFrame (Catalyst handles pushdown declaratively).
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so `spark.sql` queries see the
    * same names the DuckDB oracle uses.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n => apply(spark, dir, n).createOrReplaceTempView(n) }
}
