package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization (gaps-and-islands) — the batch twin of
  * `graft.streaming.EventPipeline.sessionize`, with identical gap
  * semantics, expressible in plain SQL on any engine (and therefore
  * oracle-checkable, unlike the streaming variant).
  *
  * Scale notes: both windows partition by the user key, so the only
  * shuffle is the one hash-partition by user — same cost class as any
  * per-user aggregation. Skewed users are bounded by per-user event
  * counts, not total volume; AQE skew handling applies.
  */
object Sessionize {

  /** Tag each event with a 1-based `session_id` per user: a new session
    * starts when the gap to the previous event exceeds `gapSeconds`.
    */
  def withSessionIds(events: DataFrame, userCol: String, tsCol: String,
                     gapSeconds: Long, tieBreak: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy((tsCol +: tieBreak).map(col): _*)
    events
      .withColumn("_prev", lag(col(tsCol), 1).over(w))
      .withColumn("_new",
        when(col("_prev").isNull ||
          unix_micros(col(tsCol).cast("timestamp")) -
            unix_micros(col("_prev").cast("timestamp")) > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum("_new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_prev", "_new")
  }

  /** One row per (user, session): bounds, event count, value total. */
  def sessions(events: DataFrame, userCol: String, tsCol: String,
               valueCol: String, gapSeconds: Long, tieBreak: Seq[String] = Nil): DataFrame =
    withSessionIds(events, userCol, tsCol, gapSeconds, tieBreak)
      .groupBy(col(userCol), col("session_id"))
      .agg(
        min(tsCol).as("session_start"),
        max(tsCol).as("session_end"),
        count(lit(1)).cast("bigint").as("n_events"),
        sum(expr(s"CAST($valueCol AS DECIMAL(18,2))")).as("total"))
}
