package graft

import java.sql.Timestamp

import graft.streaming.EventPipeline
import graft.streaming.EventPipeline.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import scala.util.Random

/** Property fuzz over the streaming surface: SPLIT-INVARIANCE and
  * BATCH-EQUIVALENCE. A correct streaming operator's final output is a
  * pure function of the event sequence — how the sequence is chopped
  * into micro-batches must not matter, and for watermark-closed
  * operators the result must equal the batch computation over the same
  * rows. Seeded random event tables are streamed under several random
  * micro-batch splits and compared (a) across splits and (b) against an
  * independently-written batch oracle. This is the streaming analog of
  * FuzzSpec's differential campaign: the two implementations being
  * diffed are Spark's incremental state machine and the one-shot batch
  * plan.
  */
class StreamFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val base = 3600000L
  private def ts(min: Int): Timestamp = new Timestamp(base + min * 60000L)

  // GRAFT_STREAM_SEED shifts every battery's seeds so a deep audit
  // explores fresh event tables and split patterns (same contract as
  // FuzzSpec's GRAFT_FUZZ_SEED)
  private val seedShift = sys.env.get("GRAFT_STREAM_SEED").map(_.toLong).getOrElse(0L)
  private def sh(seed: Long): Long = seed + seedShift

  /** In-order random events: in-order keeps every row inside the
    * watermark so batch equivalence is exact (late-drop behavior is
    * pinned separately in StreamingSpec).
    */
  private def randomEvents(seed: Long, n: Int): Seq[Event] = {
    val r = new Random(seed)
    (0 until n).map { _ =>
      Event(ts(r.nextInt(120)), 1L + r.nextInt(8),
        Seq("click", "view", "buy")(r.nextInt(3)), (1 + r.nextInt(9)).toDouble)
    }.sortBy(_.ts.getTime)
  }

  /** Chop into 1..6 ordered micro-batches at random cut points. */
  private def randomSplits(seed: Long, events: Seq[Event]): Seq[Seq[Event]] = {
    val r = new Random(seed)
    val cuts = (0 until r.nextInt(5))
      .map(_ => r.nextInt(events.length max 1)).distinct.sorted
    val bounds = (0 +: cuts :+ events.length).distinct.sorted
    bounds.sliding(2).map { case Seq(a, b) => events.slice(a, b) }.toSeq
  }

  /** Stream `events` through `pipe` in the given splits plus a
    * far-future flush event (closes every watermark), return the sink
    * rows minus anything the flush itself produced (caller filters by
    * its marker).
    */
  private def runStream(name: String, splits: Seq[Seq[Event]], flush: Event)(
      pipe: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Seq[org.apache.spark.sql.Row] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = pipe(input.toDF()).writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      splits.foreach { b => if (b.nonEmpty) { input.addData(b); q.processAllAvailable() } }
      input.addData(flush)
      q.processAllAvailable()
      spark.table(name).collect().toSeq
    } finally q.stop()
  }

  test("windowedCounts: batch-equal and split-invariant (3 seeds x 2 splits)") {
    for (seed <- Seq(11L, 12L, 13L).map(sh)) {
      val events = randomEvents(seed, 200)
      // independent batch oracle: same rows, one-shot aggregation
      val expected = events.toDF()
        .groupBy(org.apache.spark.sql.functions.window($"ts", "5 minutes"), $"event_type")
        .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.sum($"value").as("total"))
        .select($"window.start", $"event_type", $"n", $"total")
        .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val flush = Event(ts(100000), 999L, "flush", 0.0)
      val results = Seq(21L, 22L).map(sh).map { splitSeed =>
        val rows = runStream(s"wf_${seed}_$splitSeed",
          randomSplits(splitSeed, events), flush) { df =>
          EventPipeline.windowedCounts(df, watermark = "10 minutes", window = "5 minutes")
        }
        rows.filter(_.getString(1) != "flush")
          .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2), r.getDouble(3)))
          .toSet
      }
      assert(results(0) == results(1),
        s"seed $seed: different splits produced different windows")
      assert(results(0) == expected,
        s"seed $seed: streaming != batch; missing=${expected -- results(0)} extra=${results(0) -- expected}")
    }
  }

  test("dedupStream: surviving key set equals batch DISTINCT under any split (3 seeds)") {
    for (seed <- Seq(31L, 32L, 33L).map(sh)) {
      val r = new Random(seed)
      // force heavy duplication: few distinct (user, type, minute) keys
      val events = (0 until 150).map { _ =>
        Event(ts(r.nextInt(20)), 1L + r.nextInt(3),
          Seq("click", "view")(r.nextInt(2)), 1.0)
      }.sortBy(_.ts.getTime)
      val expected = events.map(e => (e.user_id, e.event_type, e.ts.getTime)).toSet
      val flush = Event(ts(100000), 999L, "flush", 0.0)
      val results = Seq(41L, 42L).map(sh).map { splitSeed =>
        val rows = runStream(s"df_${seed}_$splitSeed",
          randomSplits(splitSeed, events), flush) { df =>
          EventPipeline.dedupStream(df, Seq("user_id", "event_type", "ts"),
            watermark = "600 minutes")
        }
        rows.filter(_.getString(2) != "flush")
          .map(r => (r.getLong(1), r.getString(2), r.getTimestamp(0).getTime)).toSet
      }
      assert(results(0) == results(1), s"seed $seed: split-dependent dedup")
      assert(results(0) == expected,
        s"seed $seed: dedup keys diverge from batch distinct")
    }
  }

  test("slidingCounts: batch-equal and split-invariant (2 seeds)") {
    for (seed <- Seq(71L, 72L).map(sh)) {
      val events = randomEvents(seed, 150)
      val expected = events.toDF()
        .groupBy(org.apache.spark.sql.functions.window($"ts", "10 minutes", "5 minutes"))
        .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.sum($"value").as("total"))
        .select($"window.start", $"n", $"total")
        .collect().map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getDouble(2)))
        .toSet
      val flush = Event(ts(100000), 999L, "flush", 0.0)
      val maxTs = events.map(_.ts.getTime).max
      val results = Seq(81L, 82L).map(sh).map { splitSeed =>
        val rows = runStream(s"sl_${seed}_$splitSeed",
          randomSplits(splitSeed, events), flush) { df =>
          EventPipeline.slidingCounts(df, watermark = "10 minutes",
            width = "10 minutes", slide = "5 minutes")
        }
        // the flush event contributes only to its own far-future windows
        rows.map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getDouble(2)))
          .filter(_._1 <= maxTs).toSet
      }
      assert(results(0) == results(1), s"seed $seed: split-dependent sliding windows")
      assert(results(0) == expected,
        s"seed $seed: sliding streaming != batch; missing=${expected -- results(0)} extra=${results(0) -- expected}")
    }
  }

  test("sessionWindows (native session_window): 3-way agreement with the custom-state twin and the fold oracle") {
    // the same gap semantics implemented THREE independent ways —
    // Spark's native session_window state machine, the
    // flatMapGroupsWithState twin, and a plain Scala fold — must
    // produce identical sessions on random data. Any two agreeing
    // wrongly requires a shared bug across unrelated implementations.
    val gapMs = 10 * 60 * 1000L
    for (seed <- Seq(91L, 92L).map(sh)) {
      val events = randomEvents(seed, 120)
      val oracle = foldSessions(events, gapMs)
        .map { case (u, s, e, n, tot) => (u, s, e + gapMs, n, tot) }
      // native session_window's end is last_event + gap (window extent)
      val flush = Event(ts(100000), 999L, "flush", 0.0)
      val rows = runStream(s"sw_$seed", randomSplits(sh(95L), events), flush) { df =>
        EventPipeline.sessionWindows(df, watermark = "10 minutes", gap = "10 minutes")
      }
      val native = rows.map(r => (r.getLong(2), r.getTimestamp(0).getTime,
          r.getTimestamp(1).getTime, r.getLong(3), r.getDouble(4)))
        .filterNot(_._1 == 999L).toSet
      assert(native == oracle,
        s"seed $seed: native session_window diverges; missing=${oracle -- native} extra=${native -- oracle}")
    }
  }

  /** Shared fold oracle: per-user in-order gap sessions as
    * (user, start_ms, last_ms, n, total).
    */
  private def foldSessions(events: Seq[Event], gapMs: Long): Set[(Long, Long, Long, Long, Double)] =
    events.groupBy(_.user_id).flatMap { case (uid, es) =>
      val sorted = es.sortBy(_.ts.getTime)
      val sessions = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long, Double)]()
      var cur: Option[(Long, Long, Long, Double)] = None
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur = cur match {
          case Some((s, l, n, tot)) if t - l <= gapMs => Some((s, t, n + 1, tot + e.value))
          case Some((s, l, n, tot)) =>
            sessions += ((uid, s, l, n, tot)); Some((t, t, 1L, e.value))
          case None => Some((t, t, 1L, e.value))
        }
      }
      cur.foreach { case (s, l, n, tot) => sessions += ((uid, s, l, n, tot)) }
      sessions
    }.toSet

  test("sessionize (custom flatMapGroupsWithState): equals a fold oracle under any split (3 seeds)") {
    val gapMs = 10 * 60 * 1000L
    for (seed <- Seq(51L, 52L, 53L).map(sh)) {
      val events = randomEvents(seed, 120)
      // independent oracle: per-user in-order fold with the gap rule
      val expected = foldSessions(events, gapMs)
      val flush = Event(ts(100000), 999L, "flush", 0.0)
      val results = Seq(61L, 62L).map(sh).map { splitSeed =>
        implicit val sqlCtx = spark.sqlContext
        val input = MemoryStream[Event]
        val q = EventPipeline.sessionize(input.toDS(), gapMs = gapMs)
          .writeStream.format("memory").queryName(s"sf_${seed}_$splitSeed")
          .outputMode(OutputMode.Append()).start()
        try {
          randomSplits(splitSeed, events).foreach { b =>
            if (b.nonEmpty) { input.addData(b); q.processAllAvailable() }
          }
          input.addData(flush)
          q.processAllAvailable()
          spark.table(s"sf_${seed}_$splitSeed").collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3).toLong, r.getDouble(4)))
            .filterNot(_._1 == 999L).toSet
        } finally q.stop()
      }
      assert(results(0) == results(1), s"seed $seed: split-dependent sessions")
      assert(results(0) == expected,
        s"seed $seed: sessions diverge from the fold oracle; " +
          s"missing=${expected -- results(0)} extra=${results(0) -- expected}")
    }
  }
}
