package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series as-of join: match every left row to the LATEST right row
  * with `rightTs <= leftTs` for the same key (the standard
  * feature-lookup / point-in-time-correct join for event and market
  * data; inclusive ties match, like DuckDB's `ASOF JOIN ... ON l.ts >=
  * r.ts`).
  *
  * Spark has no native as-of join, and the naive formulation — an
  * inequality join plus a per-left-row max — plans as a nested-loop
  * range probe. This is the scalable union-merge formulation instead:
  * tag both inputs, union them, and run ONE `last(payload, ignoreNulls)`
  * window over (key, ts, side) order, where `payload` is a struct of
  * every carried column. Physically that is ONE shuffle on the key and
  * one sort — exactly the merge-join shape — with state per partition
  * bounded by the window's running values, never a buffered range.
  * Right rows sort before left rows at equal ts, which is what makes
  * the match inclusive.
  *
  * The struct wrapper is load-bearing for NULL semantics, not just a
  * perf trick: a struct built from a right row is itself non-null even
  * when every field in it is NULL, so `ignoreNulls` skips only
  * genuinely-absent rows (left rows before the union). A matched right
  * row whose value column is NULL therefore carries its NULL forward —
  * it is NOT skipped in favor of an older non-NULL value, matching
  * reference ASOF semantics (the match is on time, never on value
  * presence).
  *
  * Rows are matched left-outer: a left row with no earlier right row
  * keeps NULL carried values. Callers with multiple right rows at the
  * same (key, ts) should pre-aggregate them — "latest" is otherwise
  * ambiguous by definition.
  */
object AsOfJoin {

  /** @param valueCols right-side columns to carry; they appear on the
    *                  output as `asof_<name>`. */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String,
           valueCols: Seq[String]): DataFrame = {
    val carried = valueCols.map(v => s"asof_$v")
    val l = left
      .withColumn("_ats", col(leftTs))
      .withColumn("_side", lit(1))
    val r = right.select(
        keys.map(col) ++ Seq(
          col(rightTs).as("_ats"),
          struct(valueCols.zip(carried).map { case (v, c) => col(v).as(c) }: _*)
            .as("_asof_payload")): _*)
      .withColumn("_side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ats").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = u.withColumn(
      "_asof_payload", last(col("_asof_payload"), ignoreNulls = true).over(w))
    val extracted = carried.foldLeft(matched) { (d, c) =>
      d.withColumn(c, col("_asof_payload").getField(c))
    }
    extracted.filter(col("_side") === 1).drop("_side", "_ats", "_asof_payload")
  }
}
