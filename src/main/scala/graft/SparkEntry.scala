package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AnalyticsQueries, CoreQueries, DistQueries, ExtraQueries, FuncQueries, PipelineQueries, RankQueries, SourceQueries, SpatialQueries, StatsQueries, TpchQueries, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Every capability in SURVEY.md §2, one QueryDef each. */
  def registry: Seq[QueryDef] =
    CoreQueries.all ++ FuncQueries.all ++ SpatialQueries.all ++ PipelineQueries.all ++ VectorQueries.all ++ SourceQueries.all ++ ExtraQueries.all ++ AnalyticsQueries.all ++ StatsQueries.all ++ RankQueries.all ++ TpchQueries.all ++ DistQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queriesMap("q_agg")(spark, "/root/testdata/sf0.001")

  private lazy val queriesMap: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = queriesMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
