package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming analog of the reference's streaming execution
  * model (reference: src/execute — async row streams with incremental
  * aggregation; here: incremental state in Spark's streaming engine).
  *
  * The graphs are source-agnostic: they take any streaming Dataset with
  * the `events` schema (ts TIMESTAMP, user_id BIGINT, event_type STRING,
  * value DOUBLE), whether from files, Kafka, or MemoryStream in tests.
  *
  * Scale notes: windowed aggregation state is partitioned by
  * (event_type, window) — bounded by the watermark horizon; session state
  * by user_id with an idle-timeout eviction, so state size tracks active
  * users, not history.
  */
object EventPipeline {

  /** Tumbling-window counts per event type with a watermark — the
    * streaming analog of the reference's incremental aggregate fast path
    * (reference: src/execute/streamingAggregate.js).
    */
  def windowedCounts(events: DataFrame,
                     watermark: String = "10 minutes",
                     window: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"), col("total"))

  final case class Event(ts: Timestamp, user_id: Long, event_type: String, value: Double)
  final case class SessionState(start: Long, last: Long, n: Int, total: Double)
  final case class Session(user_id: Long, start_ms: Long, end_ms: Long, n_events: Int, total: Double)

  /** Gap-based sessionization with typed state + event-time timeout —
    * the custom-stateful-operator surface (KeyValueGroupedDataset +
    * flatMapGroupsWithState) the reference's hand-rolled state machines
    * map to. Event-time (not processing-time) timeouts: they fire off the
    * watermark, so an idle stream doesn't spin empty micro-batches and
    * state eviction is deterministic w.r.t. data, not wall clock.
    */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", s"${gapMs / 1000} seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(uid, s.start, s.last, s.n, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(SessionState(s.start, t, s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed += Session(uid, s.start, s.last, s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close once the watermark passes the session's gap horizon
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
