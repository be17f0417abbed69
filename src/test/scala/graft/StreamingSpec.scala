package graft

import java.sql.Timestamp

import graft.streaming.EventPipeline
import graft.streaming.EventPipeline.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Structured Streaming coverage: watermarked windowed aggregation and
  * custom stateful sessionization over a MemoryStream (reference is a
  * streaming engine; this is the Spark-native analog — SURVEY.md §2.6).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  // offset from epoch 0: the stateful operators' late-row filter drops
  // rows at or below the initial watermark
  private val base = 3600000L
  private def ts(min: Int): Timestamp = new Timestamp(base + min * 60000L)

  test("watermarked tumbling-window aggregation emits finalized windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventPipeline.windowedCounts(input.toDF(), watermark = "10 minutes", window = "5 minutes")
      .writeStream.format("memory").queryName("win_agg").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(ts(1), 1L, "click", 1.0), Event(ts(2), 2L, "click", 2.0),
        Event(ts(3), 1L, "view", 5.0))
      q.processAllAvailable()
      // advance watermark far enough to close the first windows
      input.addData(Event(ts(40), 3L, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("win_agg")
        .selectExpr("event_type", "n", "total").as[(String, Long, Double)].collect().toSet
      assert(rows.contains(("click", 2L, 3.0)))
      assert(rows.contains(("view", 1L, 5.0)))
    } finally q.stop()
  }

  test("file sink + checkpoint restarts exactly-once: no loss, no duplicates") {
    // the durability contract a 100 TB ingest lives on: kill the query,
    // restart from the same checkpoint, and the parquet output holds
    // every event exactly once — offsets already committed are not
    // re-emitted, offsets not yet committed are replayed
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_stream_eo")
    val out = root.resolve("out").toString
    val ckpt = root.resolve("ckpt").toString
    val input = MemoryStream[Event]
    def start() = input.toDF()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()

    val q1 = start()
    try {
      input.addData(Event(ts(1), 1L, "click", 1.0), Event(ts(2), 2L, "view", 2.0))
      q1.processAllAvailable()
    } finally q1.stop()

    // enqueue while DOWN — this batch must be replayed on restart
    input.addData(Event(ts(3), 3L, "click", 3.0))

    val q2 = start()
    try {
      input.addData(Event(ts(4), 4L, "view", 4.0))
      q2.processAllAvailable()
    } finally q2.stop()

    val rows = spark.read.parquet(out)
      .selectExpr("user_id", "value").as[(Long, Double)].collect().toSeq
    assert(rows.sorted == Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0)),
      s"expected exactly-once delivery, got $rows")
  }

  test("streaming dedup suppresses duplicate keys across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventPipeline.dedupStream(input.toDF(), Seq("user_id", "event_type"),
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(ts(1), 1L, "click", 1.0), Event(ts(1), 1L, "click", 1.0), // in-batch dup
        Event(ts(2), 2L, "click", 2.0))
      q.processAllAvailable()
      // cross-batch duplicate within the watermark horizon → suppressed
      input.addData(Event(ts(3), 1L, "click", 9.0))
      q.processAllAvailable()
      val rows = spark.table("dedup_stream")
        .selectExpr("user_id", "event_type").as[(Long, String)].collect().toSeq
      assert(rows.sorted == Seq((1L, "click"), (2L, "click")))
    } finally q.stop()
  }

  test("stream-stream interval join pairs events within the window, bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val views = MemoryStream[Event]
    val q = EventPipeline.correlated(clicks.toDF(), views.toDF(), withinMinutes = 10)
      .writeStream.format("memory").queryName("correlated")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData(Event(ts(0), 1L, "click", 1.0), Event(ts(0), 2L, "click", 2.0))
      views.addData(
        Event(ts(5), 1L, "view", 5.0),   // within 10 min of user 1's click
        Event(ts(30), 2L, "view", 6.0))  // outside user 2's window
      q.processAllAvailable()
      val rows = spark.table("correlated")
        .selectExpr("user_id", "a_type", "b_type", "b_value")
        .as[(Long, String, String, Double)].collect().toSeq
      assert(rows == Seq((1L, "click", "view", 5.0)))
    } finally q.stop()
  }

  test("streaming document ingest gates quality, tags language, dedups at the door") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventPipeline.DocEvent]
    val q = EventPipeline.documentIngest(input.toDF(), minQuality = 0.2)
      .writeStream.format("memory").queryName("doc_ingest")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        EventPipeline.DocEvent(ts(1), 1L, "the cat is on the mat and the dog is in the house"),
        EventPipeline.DocEvent(ts(1), 2L, "%%% ### !!!"), // junk: fails the quality gate
        EventPipeline.DocEvent(ts(2), 3L, "el gato es grande y la casa es bonita en el sol"),
        EventPipeline.DocEvent(ts(2), 5L,
          "write to the mail of bob@corp.example and the dog is in the cold house today"))
      q.processAllAvailable()
      // cross-batch duplicate text (new doc_id) → suppressed by digest
      input.addData(
        EventPipeline.DocEvent(ts(3), 4L, "the cat is on the mat and the dog is in the house"))
      q.processAllAvailable()
      val rows = spark.table("doc_ingest")
        .selectExpr("doc_id", "predicted").as[(Long, String)].collect().toMap
      assert(rows.keySet == Set(1L, 3L, 5L), s"got $rows")
      assert(rows(1L) == "en" && rows(3L) == "es", s"got $rows")
      // PII is scrubbed at the door
      val red = spark.table("doc_ingest").filter("doc_id = 5")
        .selectExpr("redacted").as[String].collect().head
      assert(red.contains("<email>") && !red.contains("bob@corp.example"), red)
    } finally q.stop()
  }

  test("stream-static enrich broadcasts the dim and keeps unmatched events") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val input = MemoryStream[Event]
    val q = EventPipeline.enrich(input.toDF(), dim, "user_id")
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(ts(1), 1L, "click", 1.0),
        Event(ts(2), 3L, "view", 2.0)) // no dim row → tier NULL
      q.processAllAvailable()
      val rows = spark.table("enriched")
        .selectExpr("user_id", "event_type", "tier")
        .collect().map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSet
      assert(rows == Set((1L, "click", Some("gold")), (3L, "view", None)), s"got $rows")
    } finally q.stop()
  }

  test("left-outer stream-stream join emits unmatched rows once the interval is final") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val views = MemoryStream[Event]
    val q = EventPipeline.correlated(clicks.toDF(), views.toDF(),
        withinMinutes = 10, joinType = "left_outer")
      .writeStream.format("memory").queryName("outer_correlated")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData(Event(ts(0), 1L, "click", 1.0), Event(ts(0), 2L, "click", 2.0))
      views.addData(Event(ts(5), 1L, "view", 5.0)) // match for user 1 only
      q.processAllAvailable()
      // push both watermarks far past user 2's interval so its
      // no-match verdict becomes final and the NULL-padded row emits
      clicks.addData(Event(ts(60), 9L, "click", 0.0))
      views.addData(Event(ts(60), 9L, "view", 0.0))
      q.processAllAvailable()
      val rows = spark.table("outer_correlated")
        .filter("user_id IN (1, 2)")
        .selectExpr("user_id", "b_type IS NULL AS unmatched")
        .as[(Long, Boolean)].collect().toSet
      assert(rows == Set((1L, false), (2L, true)), s"got $rows")
    } finally q.stop()
  }

  test("sketch rollup accumulates distinct counts across batches without history") {
    implicit val sqlCtx = spark.sqlContext
    val statePath = java.nio.file.Files.createTempDirectory("graft_hll_state")
      .resolve("state").toString
    val input = MemoryStream[Event]
    val q = EventPipeline.sketchRollup(input.toDF(), "event_type", "user_id", statePath)
    try {
      input.addData(
        Event(ts(1), 1L, "click", 0), Event(ts(1), 2L, "click", 0),
        Event(ts(1), 1L, "view", 0))
      q.processAllAvailable()
      // second batch: one repeat user (must not double-count), two new
      input.addData(
        Event(ts(2), 1L, "click", 0), Event(ts(2), 3L, "click", 0),
        Event(ts(2), 9L, "view", 0))
      q.processAllAvailable()
      val est = EventPipeline.sketchEstimates(spark, statePath, "event_type")
        .as[(String, Long)].collect().toMap
      // HLL is exact at these cardinalities (sparse mode)
      assert(est == Map("click" -> 3L, "view" -> 2L), est.toString)
    } finally q.stop()
  }

  test("streaming decontamination drops only benchmark-overlapping docs, statelessly") {
    import graft.operators.TextOps
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("id", "text")
    val benchGrams = TextOps.ngramHashes(bench, "id", "text", 5)
      .select("gram_hash").distinct()
    val input = MemoryStream[EventPipeline.DocEvent]
    val sink = EventPipeline.decontaminateStream(
        input.toDF(), "text", benchGrams, n = 5)
      .writeStream.format("memory").queryName("decontam_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        EventPipeline.DocEvent(ts(1), 1L, "x alpha beta gamma delta epsilon y"), // contaminated
        EventPipeline.DocEvent(ts(1), 2L, "one two three four five six"),        // clean
        EventPipeline.DocEvent(ts(1), 3L, "alpha beta"))                         // < n tokens: kept
      sink.processAllAvailable()
      val kept = spark.table("decontam_out").select("doc_id").as[Long].collect().toSet
      assert(kept == Set(2L, 3L), kept.toString)
    } finally sink.stop()
  }

  test("streaming upsert maintains a corpus snapshot; highest version wins, replays idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val snapPath = java.nio.file.Files.createTempDirectory("graft_upsert")
      .resolve("snapshot").toString
    val input = MemoryStream[(Long, Long, String)]
    val q = EventPipeline.streamingUpsert(
      input.toDF().toDF("doc_id", "ver", "text"), Seq("doc_id"), "ver", snapPath)
    try {
      input.addData((1L, 1L, "one v1"), (2L, 1L, "two v1"))
      q.processAllAvailable()
      // batch 2: update doc 2, insert doc 3 with an in-batch conflict —
      // the higher ver must win deterministically
      input.addData((2L, 2L, "two v2"), (3L, 2L, "three v2"), (3L, 1L, "three v1"))
      q.processAllAvailable()
      val snap = spark.read.parquet(snapPath)
        .select("doc_id", "ver", "text").as[(Long, Long, String)].collect().toSet
      assert(snap == Set((1L, 1L, "one v1"), (2L, 2L, "two v2"), (3L, 2L, "three v2")),
        snap.toString)
    } finally q.stop()
  }

  test("foreachBatch quality gate blocks a bad micro-batch and passes clean ones") {
    // ingest monitoring composed from the batch operator: every
    // micro-batch runs Profile.checks (ONE aggregate pass) and only
    // batches with zero failing rules reach the sink — the
    // fail-the-pipeline-run contract under Structured Streaming
    import graft.operators.Profile
    import graft.operators.Profile.Check
    implicit val sqlCtx = spark.sqlContext
    val rules = Seq(
      Check("complete_text", "count(text) = count(*)", "count(*) - count(text)"),
      Check("unique_id", "count(DISTINCT doc_id) = count(doc_id)",
        "count(doc_id) - count(DISTINCT doc_id)"))
    val accepted = scala.collection.mutable.ArrayBuffer[Long]()
    val rejectedRules = scala.collection.mutable.ArrayBuffer[String]()
    val input = MemoryStream[EventPipeline.DocEvent]
    val q = input.toDF().select("doc_id", "text")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val failing = Profile.checks(batch, rules)
          .filter("NOT pass").select("check_name").as[String].collect()
        if (failing.isEmpty)
          accepted.synchronized {
            accepted ++= batch.select("doc_id").as[Long].collect()
          }
        else rejectedRules.synchronized { rejectedRules ++= failing }
        ()
      }
      .start()
    try {
      input.addData(
        EventPipeline.DocEvent(ts(1), 1L, "clean document one"),
        EventPipeline.DocEvent(ts(1), 2L, "clean document two"))
      q.processAllAvailable()
      input.addData(
        EventPipeline.DocEvent(ts(2), 3L, "fine"),
        EventPipeline.DocEvent(ts(2), 3L, null)) // dup id AND a null text
      q.processAllAvailable()
      assert(accepted.sorted == Seq(1L, 2L), s"got $accepted")
      assert(rejectedRules.sorted == Seq("complete_text", "unique_id"),
        s"got $rejectedRules")
    } finally {
      q.stop()
    }
  }

  test("custom DataSourceV2 source streams the range in bounded micro-batches") {
    // the plug-in source's streaming face: same table, readStream —
    // rowsPerBatch rows per poll over replayable positional offsets
    val batches = scala.collection.mutable.ArrayBuffer[Array[Long]]()
    val q = spark.readStream.format("graft-range")
      .option("rows", "100").option("rowsPerBatch", "30").load()
      .select("id")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.synchronized { batches += batch.as[Long].collect() }
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      val all = batches.flatten.sorted
      assert(all == (0L until 100L), s"lost/duplicated rows: ${all.length}")
      assert(batches.forall(_.length <= 30), s"batch over rowsPerBatch: ${batches.map(_.length)}")
      assert(batches.count(_.nonEmpty) >= 4, s"expected >= 4 micro-batches, got ${batches.map(_.length)}")
    } finally q.stop()
  }

  test("custom source drains fully under Trigger.AvailableNow and terminates") {
    // the batch-like operational mode: process everything available,
    // then stop on its own — backfills and scheduled catch-up runs
    val got = scala.collection.mutable.ArrayBuffer[Long]()
    val q = spark.readStream.format("graft-range")
      .option("rows", "100").option("rowsPerBatch", "30").load()
      .select("id")
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized { got ++= batch.as[Long].collect() }
        ()
      }
      .start()
    assert(q.awaitTermination(60000), "AvailableNow query did not self-terminate")
    assert(got.sorted == (0L until 100L), s"got ${got.length} rows")
  }

  test("custom source checkpoint restart does not re-emit delivered rows") {
    // the replay contract under test: a NEW stream instance starts its
    // availability at lo, but the committed checkpoint offset must win —
    // a regressing latestOffset would re-serve already-delivered spans
    val ckpt = java.nio.file.Files.createTempDirectory("graft_range_ckpt").toString
    val got = scala.collection.mutable.ArrayBuffer[Long]()
    def run(): Unit = {
      val q = spark.readStream.format("graft-range")
        .option("rows", "100").option("rowsPerBatch", "30").load()
        .select("id")
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          got.synchronized { got ++= batch.as[Long].collect() }
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run() // delivers 0..99
    run() // restart from the checkpoint: nothing new to deliver
    assert(got.sorted == (0L until 100L),
      s"restart re-emitted rows: ${got.length} total, dups=${got.groupBy(identity).count(_._2.length > 1)}")
  }

  test("foreachBatch scores each micro-batch through the async batched scorer") {
    // model-scoring at the ingest door: every micro-batch flows through
    // AsyncScore.mapBatchesAsync (batched calls, bounded in-flight,
    // order-preserving) — the streaming face of the reference's async
    // UDF capability, composed from the batch operator like the quality
    // gate above
    import graft.operators.AsyncScore
    implicit val sqlCtx = spark.sqlContext
    val scored = scala.collection.mutable.ArrayBuffer[(Long, Double)]()
    val input = MemoryStream[EventPipeline.DocEvent]
    val q = input.toDF().select("doc_id", "text")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val out = AsyncScore.mapBatchesAsync(batch, "text", "score",
            batchSize = 2, maxInFlight = 2)(
            ts => ts.map(t => t.length.toDouble))
          .select("doc_id", "score").as[(Long, Double)].collect()
        scored.synchronized { scored ++= out }
        ()
      }
      .start()
    try {
      input.addData(
        EventPipeline.DocEvent(ts(1), 1L, "abc"),
        EventPipeline.DocEvent(ts(1), 2L, "defgh"),
        EventPipeline.DocEvent(ts(1), 3L, "ij"))
      q.processAllAvailable()
      input.addData(EventPipeline.DocEvent(ts(2), 4L, "klmnop"))
      q.processAllAvailable()
      assert(scored.sortBy(_._1) ==
        Seq((1L, 3.0), (2L, 5.0), (3L, 2.0), (4L, 6.0)), s"got $scored")
    } finally q.stop()
  }

  test("foreachBatch ingest drops near-dups against the saved corpus index") {
    // the full ingest story: micro-batches arrive as a stream, candidates
    // come from the BUCKETED on-disk LSH index (Dedup.saveBandTable), and
    // only survivors leave the sink — batch operators composed under
    // Structured Streaming via foreachBatch
    import graft.operators.Dedup
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val corpus = Seq(
      (0L, base),
      (1L, "completely different words about spark query engines and shuffles here")
    ).toDF("doc_id", "text")
    Dedup.saveBandTable(corpus, "doc_id", "text", "st_corpus_bands", buckets = 4)
    val survivors = scala.collection.mutable.ArrayBuffer[Long]()
    val input = MemoryStream[EventPipeline.DocEvent]
    val q = input.toDF().select("doc_id", "text")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val losers = Dedup.minhashLshAgainstSaved(
            batch, corpus, spark.table("st_corpus_bands"),
            "doc_id", "text", threshold = 0.4)
          .selectExpr("new_id AS doc_id").distinct()
        val kept = batch.join(losers, Seq("doc_id"), "left_anti")
        survivors.synchronized {
          survivors ++= kept.select("doc_id").as[Long].collect()
        }
        () // foreachBatch needs a Unit-typed lambda to pick the Scala overload
      }
      .start()
    try {
      input.addData(
        EventPipeline.DocEvent(ts(1), 100L, base),                               // near/exact dup of corpus 0
        EventPipeline.DocEvent(ts(1), 101L, base.replace("today", "tomorrow")),  // near dup of corpus 0
        EventPipeline.DocEvent(ts(2), 102L, "a genuinely fresh document with entirely new content and words inside"))
      q.processAllAvailable()
      input.addData(
        EventPipeline.DocEvent(ts(3), 103L, "another brand new text that matches nothing in the corpus at all"))
      q.processAllAvailable()
      assert(survivors.sorted == Seq(102L, 103L), s"got $survivors")
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS st_corpus_bands")
    }
  }

  test("sessionize closes a session when the gap is exceeded") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventPipeline.sessionize(input.toDS(), gapMs = 10 * 60000L)
      .writeStream.format("memory").queryName("sessions").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(ts(0), 1L, "click", 1.0), Event(ts(5), 1L, "click", 2.0),
        Event(ts(8), 1L, "view", 3.0))
      q.processAllAvailable()
      // a later burst for the same user beyond the gap closes session 1
      input.addData(Event(ts(60), 1L, "click", 4.0))
      q.processAllAvailable()
      val sessions = spark.table("sessions")
        .selectExpr("user_id", "start_ms", "end_ms", "n_events", "total")
        .as[(Long, Long, Long, Int, Double)].collect()
      assert(sessions.length == 1)
      assert(sessions.head == ((1L, base, base + 8 * 60000L, 3, 6.0)))
    } finally q.stop()
  }

  test("drift gate flags a shifted window and passes an in-distribution one") {
    implicit val sqlCtx = spark.sqlContext
    // reference sample: values spread over the low bins (0..2), plus a
    // below-range value (clamped into bin 0, NOT silently uncounted)
    // and a NULL (excluded from bins AND the total — proportions must
    // keep summing to 1)
    val ref = (Seq.tabulate(60)(i => Some((i % 3) * 50.0 + 10.0)) ++
      Seq(Some(-35.0), None)).toDF("value")
    val input = MemoryStream[Event]
    val q = EventPipeline.driftGate(input.toDF(), ref,
        watermark = "10 minutes", window = "5 minutes", threshold = 0.25)
      .writeStream.format("memory").queryName("drift").outputMode(OutputMode.Append()).start()
    try {
      // window 1 (min 0-5): drawn from the reference distribution. The
      // +1-smoothed 7-bin PSI needs a non-trivial sample — a handful of
      // events per window reads as drift by construction, which is the
      // correct behavior for a distribution test, not a bug
      input.addData(Seq.tabulate(36)(i =>
        Event(ts(1 + i % 4), i.toLong, "m", (i % 3) * 50.0 + 10.0)): _*)
      input.addData(Event(ts(2), 99L, "m", -35.0)) // clamps into bin 0
      // window 2 (min 5-10): mass entirely in the top bin — drifted
      input.addData(Seq.tabulate(36)(i =>
        Event(ts(6 + i % 4), i.toLong, "m", 500.0 + i)): _*)
      q.processAllAvailable()
      input.addData(Event(ts(40), 5L, "m", 10.0)) // advance the watermark
      q.processAllAvailable()
      val rows = spark.table("drift")
        .selectExpr("win_start", "n_events", "psi", "drifted")
        .as[(Timestamp, Long, Double, Boolean)].collect()
        .sortBy(_._1.getTime)
      assert(rows.length == 2)
      val (inDist, shifted) = (rows(0), rows(1))
      assert(inDist._2 == 37L && !inDist._4, s"in-dist window: $inDist")
      assert(shifted._2 == 36L && shifted._4, s"shifted window: $shifted")
      assert(shifted._3 > inDist._3)
    } finally q.stop()
  }

  test("ewma monitor flags a spike and absorbs it with integer fixed-point state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventPipeline.ewmaMonitor(input.toDS(), k = 3, warmup = 3)
      .writeStream.format("memory").queryName("ewma_mon")
      .outputMode(OutputMode.Append()).start()
    try {
      // flat line at 10.00, one 100.00 spike, then back to 10.00
      input.addData((1 to 6).map(i => Event(ts(i), 1L, "m", 10.0)): _*)
      q.processAllAvailable()
      input.addData(Event(ts(7), 1L, "m", 100.0), Event(ts(8), 1L, "m", 10.0))
      q.processAllAvailable()
      val rows = spark.table("ewma_mon")
        .selectExpr("ts_ms", "cents", "ewma_cents", "flagged")
        .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
      assert(rows.length == 8)
      // only the spike flags — the flat warmup and the recovery row don't
      assert(rows.map(_._4).toSeq ==
        Seq(false, false, false, false, false, false, true, false))
      // integer fixed-point smoothing: ewma after the spike is exactly
      // (10000 + 3·1000) / 4 = 3250 cents
      assert(rows(6)._3 == 3250L)
      // the recovery row is pulled toward the line, not flagged: the
      // spike inflated the EW variance so a return-to-normal is expected
      assert(rows(7)._3 == (1000L * 1000000L + 3L * 3250L * 1000000L) / 4L / 1000000L)
    } finally q.stop()
  }

  test("quotaGate: prefix admission per key, quota survives batches, no refill") {
    import EventPipeline.QuotaEvent
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[QuotaEvent]
    val q = EventPipeline.quotaGate(input.toDS(), budget = 50L)
      .writeStream.format("memory").queryName("quota_gate")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: srcA spends 40 of 50; srcB's single 60-token doc overflows
      input.addData(
        QuotaEvent(ts(1), "srcA", 1L, 30L), QuotaEvent(ts(2), "srcA", 2L, 10L),
        QuotaEvent(ts(1), "srcB", 3L, 60L))
      q.processAllAvailable()
      // batch 2: srcA's 20-token doc would reach 60 — rejected; a LATER
      // 5-token doc is rejected too (prefix rule: the total kept counting)
      input.addData(
        QuotaEvent(ts(3), "srcA", 4L, 20L), QuotaEvent(ts(4), "srcA", 5L, 5L),
        QuotaEvent(ts(2), "srcB", 6L, 1L))
      q.processAllAvailable()
      val rows = spark.table("quota_gate")
        .selectExpr("id", "cum_tokens", "admitted")
        .as[(Long, Long, Boolean)].collect().sortBy(_._1)
      assert(rows.map(r => (r._1, r._2, r._3)).toSeq == Seq(
        (1L, 30L, true), (2L, 40L, true),   // srcA within budget
        (3L, 60L, false),                   // srcB overflows on row one
        (4L, 60L, false), (5L, 65L, false), // srcA: quota is spent for good
        (6L, 61L, false)))                  // srcB: no refill across batches
    } finally q.stop()
  }

  test("annIngest appends PQ codes per batch; pqAdcTopK sees new vectors, no rebuild") {
    import graft.operators.Vectors
    implicit val sqlCtx = spark.sqlContext
    val idxPath = java.nio.file.Files.createTempDirectory("ann_ingest").toString + "/codes"
    // two well-separated clusters in 4 dims; codebook trained ONCE on the
    // initial corpus and frozen for the stream's lifetime
    def vecA(seed: Float) = Array(0.0f + seed, 0.1f, 0.0f, 0.1f)
    def vecB(seed: Float) = Array(10.0f + seed, 9.9f, 10.0f, 9.9f)
    val train = ((0L to 4L).map(i => (i, vecA(i * 0.01f))) ++
      (5L to 9L).map(i => (i, vecB((i - 5) * 0.01f)))).toDF("vec_id", "embedding")
    val codebook = Vectors.pqTrain(train, "vec_id", "embedding",
      m = 2, k = 2, iters = 2, dims = 4)
    val input = MemoryStream[(Long, Array[Float])]
    val q = EventPipeline.annIngest(input.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", codebook, idxPath, m = 2, dims = 4, buckets = 2)
    try {
      input.addData((0L to 9L).map(i =>
        (i, if (i < 5) vecA(i * 0.01f) else vecB((i - 5) * 0.01f))): _*)
      q.processAllAvailable()
      val query = Seq((1L, vecB(0.02f))).toDF("qid", "embedding") // == vector 7
      def topk(k: Int) = Vectors.pqAdcTopK(
        EventPipeline.annIndex(spark, idxPath), "vec_id", "pq_codes",
        query, "qid", "embedding", codebook, k = k, m = 2, dims = 4)
        .selectExpr("vec_id", "adc").as[(Long, Long)].collect().toSeq
      // batch 1 visible: neighbors all come from cluster B
      assert(EventPipeline.annIndex(spark, idxPath).count() == 10L)
      val t3 = topk(3)
      assert(t3.map(_._1).toSet.subsetOf(Set(5L, 6L, 7L, 8L, 9L)), t3.toString)
      // batch 2: three NEW cluster-B vectors, exact copies of vector 7
      input.addData(Seq(100L, 101L, 102L).map(i => (i, vecB(0.02f))): _*)
      q.processAllAvailable()
      val idx = EventPipeline.annIndex(spark, idxPath)
      assert(idx.count() == 13L)
      val all = topk(13).toMap
      // the new vectors scored through the FROZEN codebook: identical
      // input ⇒ identical code ⇒ identical ADC as the original vector 7
      assert(Seq(100L, 101L, 102L).forall(i => all(i) == all(7L)), all.toString)
      assert(all(100L) == all.values.min)
      // append-only evidence: batch dirs hold only their own rows
      assert(spark.read.parquet(s"$idxPath/batch_0").count() == 10L)
      assert(spark.read.parquet(s"$idxPath/batch_1").count() == 3L)
    } finally q.stop()
  }

  test("spanIngest drops docs with long corpus-duplicated spans at the door; clean docs pass") {
    import graft.operators.TextOps
    implicit val sqlCtx = spark.sqlContext
    val sink = java.nio.file.Files.createTempDirectory("span_ingest").toString + "/kept"
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta one two"),
      (2L, "x alpha beta gamma delta epsilon zeta eta theta y z")
    ).toDF("doc_id", "text")
    TestTables.reset(spark, "span_ingest_grams")
    TextOps.saveDupGramTable(corpus, "doc_id", "text", "span_ingest_grams", k = 6)
    val input = MemoryStream[EventPipeline.DocEvent]
    val q = EventPipeline.spanIngest(
      input.toDF().select("doc_id", "text"), spark.table("span_ingest_grams"),
      "doc_id", "text", sink, k = 6, maxSpanTokens = 8)
    try {
      val ts = new java.sql.Timestamp(0L)
      input.addData(
        // carries the corpus's 8-token duplicated run -> dropped
        EventPipeline.DocEvent(ts, 10L,
          "pre alpha beta gamma delta epsilon zeta eta theta post"),
        // batch-internal repeat only -> kept (frozen-reference contract)
        EventPipeline.DocEvent(ts, 11L,
          "one two three four five six one two three four five six"),
        EventPipeline.DocEvent(ts, 12L, "clean words nothing shared here at all"))
      q.processAllAvailable()
      // a later batch gets the SAME verdicts (frozen reference)
      input.addData(EventPipeline.DocEvent(ts, 20L,
        "again alpha beta gamma delta epsilon zeta eta theta trailing"))
      q.processAllAvailable()
      val kept = spark.read.parquet(s"$sink/batch_*").select("doc_id")
        .as[Long].collect().sorted.toSeq
      assert(kept == Seq(11L, 12L), kept.toString)
      // per-epoch committed dirs: replay-idempotent publication layout
      assert(spark.read.parquet(s"$sink/batch_0").count() == 2L)
    } finally q.stop()
  }

  test("annIngest restart with a checkpoint resumes the epoch sequence — committed batch dirs survive") {
    import graft.operators.Vectors
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("ann_restart").toString
    val idxPath = s"$base/codes"
    val cp = s"$base/ckpt"
    def vec(seed: Float) = Array(seed, 0.1f, 0.0f, 0.1f)
    val train = (0L to 3L).map(i => (i, vec(i * 0.5f))).toDF("vec_id", "embedding")
    val codebook = Vectors.pqTrain(train, "vec_id", "embedding",
      m = 2, k = 2, iters = 1, dims = 4)
    val input = MemoryStream[(Long, Array[Float])]
    val q1 = EventPipeline.annIngest(input.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", codebook, idxPath, m = 2, dims = 4, buckets = 1,
      checkpoint = Some(cp))
    try {
      input.addData((0L to 3L).map(i => (i, vec(i * 0.5f))): _*)
      q1.processAllAvailable()
      assert(spark.read.parquet(s"$idxPath/batch_0").count() == 4L)
    } finally q1.stop()
    // restart from the SAME checkpoint: the next batch must be epoch 1,
    // not a fresh epoch 0 overwriting the committed dir with new rows
    val q2 = EventPipeline.annIngest(input.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", codebook, idxPath, m = 2, dims = 4, buckets = 1,
      checkpoint = Some(cp))
    try {
      input.addData((100L, vec(9.9f)))
      q2.processAllAvailable()
      assert(spark.read.parquet(s"$idxPath/batch_0").count() == 4L)
      assert(spark.read.parquet(s"$idxPath/batch_1").count() == 1L)
      assert(EventPipeline.annIndex(spark, idxPath).count() == 5L)
    } finally q2.stop()
  }

  // ---- corpus-ingest fixture, shared by the gate-composition test and
  // the restart matrix ------------------------------------------------

  // frozen corpus: one distinctive doc for the near-dup gate, and a
  // 10-token run planted in TWO docs so its 6-grams reach dupGrams
  private lazy val ciCorpus = Seq(
    (900L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
    (901L, "one pine oak elm ash birch maple cedar willow poplar fir tail words"),
    (902L, "two pine oak elm ash birch maple cedar willow poplar fir other ending")
  ).toDF("doc_id", "text")
  private lazy val ciBench = Seq((1L, "q1 q2 q3 q4 q5 q6 q7")).toDF("bid", "btext")
  private lazy val ciTables: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import graft.operators.{Dedup, TextOps}
    TestTables.reset(spark, "ci_bands")
    TestTables.reset(spark, "ci_grams")
    Dedup.saveBandTable(ciCorpus, "doc_id", "text", "ci_bands")
    TextOps.saveDupGramTable(ciCorpus, "doc_id", "text", "ci_grams", k = 6)
    (spark.table("ci_bands"), spark.table("ci_grams"))
  }

  private val ciCleanA = "the cat sat on the mat and the dog ran away happily"
  private lazy val ciBatch1 = Seq(
    (10L, ciCleanA, "a", 10L),                     // kept
    (11L, ciCleanA, "a", 10L),                     // in-batch exact dup -> dropped
    (12L, "%%% ### !!!", "a", 3L),                 // junk -> quality gate
    (13L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu",
      "a", 13L))                                   // near-dup of corpus 900 -> dropped
  private lazy val ciBatch2 = Seq(
    (20L, ciCleanA, "b", 10L),                     // cross-batch exact dup -> dropped
    (21L, "my notes describe pine oak elm ash birch maple cedar willow poplar fir among other common trees seen during long autumn hikes", "b", 22L), // span gate
    (22L, "a quiet morning walk beside the river bank with warm light", "b", 10L),
    (23L, "bright market stalls were selling fruit and bread near the gate", "b", 10L),
    (24L, "some children were playing in the park before it started raining", "b", 10L))
    // budget 22 for source b: exactly two of 22/23/24 fit (hash order)
  private lazy val ciBatch3 = Seq(
    (30L, "warning q1 q2 q3 q4 q5 q6 q7 appears verbatim here today", "c", 12L), // contaminated
    (31L, "harvest season brought long evenings and the smell of rain", "c", 10L)) // kept

  /** Start a corpusIngest over `input` into fresh dirs under `root`. */
  private def ciStart(input: MemoryStream[(Long, String, String, Long)],
                      root: String,
                      onStep: (String, Long) => Unit = (_, _) => ()) =
    EventPipeline.corpusIngest(
      input.toDF().toDF("doc_id", "text", "source", "n_tok"),
      "doc_id", "text", "source", "n_tok",
      ciCorpus, ciTables._1, ciTables._2,
      ciBench, "btext", s"$root/sink", s"$root/state",
      minQuality = 0.2, spanK = 6, maxSpanTokens = 8,
      budgetPerSource = 22L, decontamN = 5, checkpoint = Some(s"$root/ckpt"),
      onStep = onStep)

  /** The BATCH pipeline over the same rows, same gate order — the
    * expected kept set every streamed variant must equal.
    * (The input token column is named n_tok: qualityScore ADDS its own
    * n_tokens column, and a caller column with that name would be
    * silently overwritten — both pipelines select the original columns
    * back, so the collision is avoided by naming, as any caller must.)
    */
  private lazy val ciExpectedIds: Set[Long] = {
    import graft.operators.{Dedup, Sampling, TextOps}
    val all = (ciBatch1 ++ ciBatch2 ++ ciBatch3).toDF("doc_id", "text", "source", "n_tok")
    val gated = TextOps.qualityScore(all, "text").filter($"quality" >= 0.2)
      .select("doc_id", "text", "source", "n_tok")
    val deduped = Dedup.dropExact(gated, Seq("text"), "doc_id")
    val nearHits = Dedup.minhashLshAgainstSaved(deduped, ciCorpus,
        ciTables._1, "doc_id", "text")
      .select($"new_id".as("doc_id")).distinct()
    val nearOk = deduped.join(nearHits, Seq("doc_id"), "left_anti")
    val spanHot = TextOps.duplicateSpansAgainst(nearOk, ciTables._2,
        "doc_id", "text", k = 6, minTokens = 8).select("doc_id").distinct()
    val spanOk = nearOk.join(spanHot, Seq("doc_id"), "left_anti")
    val quotaOk = Sampling.tokenBudget(spanOk, "source", "doc_id", "n_tok", 22L)
    val cleanIds = TextOps.decontaminate(quotaOk, "doc_id", "text", ciBench, "btext", n = 5)
      .filter(!$"contaminated").select("doc_id")
    val ids = quotaOk.join(cleanIds, Seq("doc_id"), "left_semi")
      .select("doc_id").as[Long].collect().toSet
    graft.operators.Caches.unpersistAll()
    ids
  }

  test("corpusIngest: full gate composition across 3 micro-batches with a mid-stream restart equals the batch pipeline") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_corpus_ingest").toString

    val input = MemoryStream[(Long, String, String, Long)]
    val q1 = ciStart(input, root)
    try {
      input.addData(ciBatch1: _*); q1.processAllAvailable()
      input.addData(ciBatch2: _*); q1.processAllAvailable()
    } finally q1.stop() // kill mid-stream; epochs 0-1 committed
    val q2 = ciStart(input, root)
    try {
      input.addData(ciBatch3: _*); q2.processAllAvailable()
    } finally q2.stop()

    val streamed = EventPipeline.annIndex(spark, s"$root/sink") // committed batch_* union
    val streamedIds = streamed.select("doc_id").as[Long].collect().toSet

    assert(streamedIds == ciExpectedIds,
      s"streaming kept $streamedIds, batch pipeline kept $ciExpectedIds")
    // every gate fired: the expected drops are all absent
    assert(Set(11L, 12L, 13L, 20L, 21L, 30L).intersect(streamedIds).isEmpty)
    assert(streamedIds.contains(10L) && streamedIds.contains(31L))
    assert(streamedIds.count(Set(22L, 23L, 24L)) == 2, "quota should admit exactly 2 of source b")
    // exactly-once across the restart: one committed dir per epoch, no
    // duplicated rows
    assert(streamed.count() == streamedIds.size.toLong)
  }

  test("corpusIngest restart matrix: a crash at EVERY publication boundary recovers to the same kept set") {
    // the reference's abort semantics (test/abort.test.js) are the
    // single-node analog; this is the distributed version. Epoch 1 (the
    // batch with cross-batch dups AND the quota cliff) is killed at
    // each of the six publication boundaries — after the staging write
    // and after the commit of each of sink / digest-state / quota-state
    // — then restarted from the checkpoint. Every variant must recover
    // to the one-shot batch pipeline's kept set with zero duplicates:
    // epoch replay is idempotent because state reads take strictly
    // EARLIER epochs only and every publication is an atomic swap.
    implicit val sqlCtx = spark.sqlContext
    val failpoints = Seq("sink-staged", "sink", "digests-staged",
      "digests", "quota-staged", "quota")
    for (fp <- failpoints) {
      val root = java.nio.file.Files.createTempDirectory(s"graft_ci_matrix").toString
      val input = MemoryStream[(Long, String, String, Long)]
      val armed = new java.util.concurrent.atomic.AtomicBoolean(true)
      val q1 = ciStart(input, root, onStep = (step, epoch) =>
        if (step == fp && epoch == 1L && armed.getAndSet(false))
          throw new RuntimeException(s"injected crash at $fp"))
      input.addData(ciBatch1: _*)
      q1.processAllAvailable()
      input.addData(ciBatch2: _*)
      val crashed =
        try { q1.processAllAvailable(); false }
        catch { case _: Throwable => true }
      assert(crashed, s"failpoint $fp never fired")
      try q1.stop() catch { case _: Throwable => () }

      val q2 = ciStart(input, root) // no injection: clean restart
      try {
        q2.processAllAvailable() // replays epoch 1
        input.addData(ciBatch3: _*); q2.processAllAvailable()
      } finally q2.stop()

      val streamed = EventPipeline.annIndex(spark, s"$root/sink")
      val ids = streamed.select("doc_id").as[Long].collect()
      assert(ids.toSet == ciExpectedIds,
        s"failpoint $fp: kept ${ids.toSet.toSeq.sorted}, expected ${ciExpectedIds.toSeq.sorted}")
      assert(ids.length == ids.toSet.size, s"failpoint $fp: duplicated rows in the sink")
    }
  }

  test("checkpointed restart of the stateful dedup under the RocksDB state store provider") {
    // the matrix above exercises foreachBatch recovery; this is the
    // STATE-STORE recovery face — dropDuplicatesWithinWatermark state
    // must survive a kill/restart on the scale-path provider (RocksDB),
    // still suppressing a cross-restart duplicate key
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val root = java.nio.file.Files.createTempDirectory("graft_rocks_restart")
      val out = root.resolve("out").toString
      val ckpt = root.resolve("ckpt").toString
      val input = MemoryStream[Event]
      def start() = EventPipeline.dedupStream(input.toDF(),
          Seq("user_id", "event_type"), watermark = "10 minutes")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append()).start()

      val q1 = start()
      try {
        input.addData(Event(ts(1), 1L, "click", 1.0), Event(ts(2), 2L, "click", 2.0))
        q1.processAllAvailable()
        val metrics = q1.lastProgress.stateOperators(0).customMetrics
        assert(metrics.keySet().toArray.exists(_.toString.startsWith("rocksdb")),
          s"store is not RocksDB: $metrics")
      } finally q1.stop() // kill with dedup state holding keys (1,click),(2,click)

      // enqueued while DOWN: a duplicate of a PRE-restart key and one new
      input.addData(Event(ts(3), 1L, "click", 9.0), Event(ts(4), 3L, "view", 3.0))
      val q2 = start()
      try { q2.processAllAvailable() } finally q2.stop()

      val rows = spark.read.parquet(out)
        .selectExpr("user_id", "event_type").as[(Long, String)].collect().toSeq
      assert(rows.sorted == Seq((1L, "click"), (2L, "click"), (3L, "view")),
        s"RocksDB restart lost or re-admitted keys: $rows")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("HofLint sweeps the streaming micro-batch plans (no unbound interpreted HOFs)") {
    // RegistryContractsSpec gates the 243 batch registry plans; this
    // extends the same build-time guard to the streaming surface — the
    // plans each micro-batch will execute. DataFrame-returning
    // transforms lint directly on a MemoryStream source (the optimizer
    // runs CollapseProject on streaming plans too); the foreachBatch
    // writers (annIngest, spanIngest) lint their replicated per-batch
    // plan over a static frame — the HOF-bearing operator composition
    // is identical, only the sink bookkeeping differs.
    import graft.operators.{TextOps, Vectors}
    import graft.plans.HofLint
    implicit val sqlCtx = spark.sqlContext
    def assertClean(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val findings = HofLint.lintStream(df)
      assert(findings.isEmpty, s"$name: ${findings.mkString("; ")}")
    }

    val events = MemoryStream[Event].toDF()
    assertClean("windowedCounts", EventPipeline.windowedCounts(events))
    assertClean("sessionWindows", EventPipeline.sessionWindows(events))
    assertClean("slidingCounts", EventPipeline.slidingCounts(events))
    assertClean("dedupStream", EventPipeline.dedupStream(events, Seq("user_id", "ts")))
    assertClean("enrich", EventPipeline.enrich(
      events, Seq((1L, "us")).toDF("user_id", "geo"), "user_id"))
    val ref = Seq.tabulate(10)(i => i * 30.0).toDF("value")
    assertClean("driftGate", EventPipeline.driftGate(events, ref))

    val docs = MemoryStream[EventPipeline.DocEvent].toDF()
    assertClean("documentIngest", EventPipeline.documentIngest(docs))
    assertClean("decontaminateStream", EventPipeline.decontaminateStream(
      docs, "text", Seq(1L, 2L).toDF("gram_hash")))

    // annIngest per-batch plan: pqAssign against the frozen codebook
    val train = ((0L to 4L).map(i => (i, Array(0.1f * i, 0.2f, 0.3f, 0.4f))) ++
      (5L to 9L).map(i => (i, Array(5.0f + i, 4.0f, 3.0f, 2.0f))))
      .toDF("vec_id", "embedding")
    val codebook = Vectors.pqTrain(train, "vec_id", "embedding", m = 2, k = 2,
      iters = 2, dims = 4)
    assertClean("annIngest(batch)", Vectors.pqAssign(
        train, "vec_id", "embedding", codebook, m = 2, dims = 4)
      .select("vec_id", "pq_codes"))

    // spanIngest per-batch plan: frozen-gram span scan + door anti-join
    val corpus = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    TestTables.reset(spark, "hoflint_grams")
    TextOps.saveDupGramTable(corpus, "doc_id", "text", "hoflint_grams", k = 6)
    val batch = Seq((10L, "pre alpha beta gamma delta epsilon zeta eta theta post"))
      .toDF("doc_id", "text")
    val hot = TextOps.duplicateSpansAgainst(batch, spark.table("hoflint_grams"),
        "doc_id", "text", k = 6, minTokens = 8)
      .select("doc_id").distinct()
    assertClean("spanIngest(batch)", batch.join(hot, Seq("doc_id"), "left_anti"))
    graft.operators.Caches.unpersistAll()
  }
}
