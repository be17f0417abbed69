package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability under test: a Spark-first implementation plus an
  * equivalent ANSI-SQL oracle the driver runs in DuckDB. `oracle` is None
  * for capabilities DuckDB cannot express (spatial, approx sketches,
  * streaming) — those get rows-only checks plus ScalaTest specs.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Oracle-checked query. */
  def apply(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, Some(oracle))

  /** Rows-only query (no DuckDB-expressible oracle). */
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, None)
}
