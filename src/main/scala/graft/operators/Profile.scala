package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data profiling: per-column health stats (row/null/distinct counts,
  * min/max) in ONE scan — the operator behind ingest monitoring and
  * schema-drift checks.
  *
  * All columns aggregate in a single `agg` over one pass of the data
  * (profiling column-by-column would re-scan the table per column); the
  * wide 1-row result is then stacked to long form. The multiple
  * COUNT(DISTINCT)s expand the aggregate, which is the documented cost
  * of exact distincts — swap in approx_count_distinct for corpus-scale
  * profiling where ±2% is fine.
  */
object Profile {

  def summarize(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val aggs = count(lit(1)).cast("bigint").as("n_rows") +:
      cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).cast("bigint").as(s"${c}__nnull"),
        countDistinct(col(c)).cast("bigint").as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max")))
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', ${c}__nnull, ${c}__nd, ${c}__min, ${c}__max").mkString(", ")
    row.selectExpr("n_rows",
        s"stack(${cols.length}, $stackArgs) AS (column, n_null, n_distinct, min_val, max_val)")
      .select("column", "n_rows", "n_null", "n_distinct", "min_val", "max_val")
  }
}
