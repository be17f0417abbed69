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
           valueCols: Seq[String]): DataFrame =
    merge(left, right, keys, leftTs, rightTs, valueCols, forward = false)

  /** Forward as-of: match every left row to the EARLIEST right row with
    * `rightTs >= leftTs` (inclusive) — the "next observation" lookup
    * (next fill after an order, next heartbeat after a probe). Same
    * union-merge shape as [[asof]], mirrored: `first(ignoreNulls)` over
    * the FOLLOWING frame, with left rows sorting before right rows at
    * equal ts so an exact-ts right row is inside the frame.
    *
    * The object-level precondition applies with the same force here:
    * duplicate right rows at one (key, ts) make "earliest" ambiguous and
    * the carried payload partitioning-dependent — pre-aggregate them.
    */
  def asofForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTs: String, rightTs: String,
                  valueCols: Seq[String]): DataFrame =
    merge(left, right, keys, leftTs, rightTs, valueCols, forward = true)

  /** Bounded-staleness as-of (the feature-store freshness contract): a
    * backward match is kept only while `leftTs - rightTs <= maxAge`;
    * staler matches degrade to no-match (all carried values NULL).
    * `leftTs`/`rightTs` must be NUMERIC epoch columns — staleness is an
    * integer subtraction (cast timestamps to unix micros first).
    */
  def asofWithin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 leftTs: String, rightTs: String,
                 valueCols: Seq[String], maxAge: Long): DataFrame = {
    require(maxAge >= 0, "maxAge must be non-negative")
    val carried = valueCols.map(v => s"asof_$v")
    val withMts = merge(left, right, keys, leftTs, rightTs, valueCols,
      forward = false, keepMatchedTs = true)
    val fresh = col("_asof_mts").isNotNull &&
      (col(leftTs) - col("_asof_mts")) <= maxAge
    carried.foldLeft(withMts) { (d, c) =>
        d.withColumn(c, when(fresh, col(c)))
      }
      .drop("_asof_mts")
  }

  private def merge(left: DataFrame, right: DataFrame, keys: Seq[String],
                    leftTs: String, rightTs: String, valueCols: Seq[String],
                    forward: Boolean,
                    keepMatchedTs: Boolean = false): DataFrame = {
    val carried = valueCols.map(v => s"asof_$v")
    // backward: right rows sort BEFORE left at equal ts (side r=0 < l=1)
    // so `last` over the preceding frame sees the tie — and mirrored for
    // forward (side l=0 < r=1, `first` over the following frame)
    val (lSide, rSide) = if (forward) (0, 1) else (1, 0)
    val l = left
      .withColumn("_ats", col(leftTs))
      .withColumn("_side", lit(lSide))
    val payloadFields =
      valueCols.zip(carried).map { case (v, c) => col(v).as(c) } ++
        (if (keepMatchedTs) Seq(col(rightTs).as("_asof_mts")) else Nil)
    val r = right.select(
        keys.map(col) ++ Seq(
          col(rightTs).as("_ats"),
          struct(payloadFields: _*).as("_asof_payload")): _*)
      .withColumn("_side", lit(rSide))
    val u = l.unionByName(r, allowMissingColumns = true)
    val base = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ats").asc, col("_side").asc)
    val matched =
      if (forward)
        u.withColumn("_asof_payload",
          first(col("_asof_payload"), ignoreNulls = true)
            .over(base.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      else
        u.withColumn("_asof_payload",
          last(col("_asof_payload"), ignoreNulls = true)
            .over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val outFields = carried ++ (if (keepMatchedTs) Seq("_asof_mts") else Nil)
    val extracted = outFields.foldLeft(matched) { (d, c) =>
      d.withColumn(c, col("_asof_payload").getField(c))
    }
    extracted.filter(col("_side") === lit(lSide))
      .drop("_side", "_ats", "_asof_payload")
  }
}
