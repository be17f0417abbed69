package graft

import java.sql.Timestamp

import graft.operators.{Graph, Merge, Sampling, TextOps, TimeSeries}
import org.apache.spark.sql.functions._

/** Round-5 operators: SCD2 history, integer PageRank, mixture
  * oversampling, trailing/decayed time-series signals, BM25.
  */
class Round5Spec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(3600000L + min * 60000L)

  test("scd2 collapses consecutive duplicates and opens/closes versions") {
    val changes = Seq(
      (1L, "a", ts(0), 1L), (1L, "a", ts(10), 2L), // duplicate: no new version
      (1L, "b", ts(20), 3L), (1L, "b", ts(30), 4L),
      (1L, "a", ts(40), 5L),                        // back to a: NEW version
      (2L, "x", ts(5), 6L)
    ).toDF("k", "state", "t", "seq")
    val hist = Merge.scd2(changes, Seq("k"), "t", tieBreak = Seq("seq"))
      .select("k", "state", "effective_from", "effective_to", "is_current")
      .as[(Long, String, Timestamp, Option[Timestamp], Boolean)]
      .collect().toSet
    assert(hist == Set(
      (1L, "a", ts(0), Some(ts(20)), false),
      (1L, "b", ts(20), Some(ts(40)), false),
      (1L, "a", ts(40), None, true),
      (2L, "x", ts(5), None, true)))
  }

  test("scd2 is idempotent under state replay (same snapshot twice)") {
    val once = Seq((1L, "a", ts(0), 1L), (1L, "b", ts(10), 2L)).toDF("k", "state", "t", "seq")
    val replayed = Seq(
      (1L, "a", ts(0), 1L), (1L, "a", ts(5), 9L), // replay of unchanged state
      (1L, "b", ts(10), 2L), (1L, "b", ts(15), 9L)
    ).toDF("k", "state", "t", "seq")
    val a = Merge.scd2(once, Seq("k"), "t", Seq("seq"))
      .select("k", "state", "effective_from", "effective_to").collect().map(_.toSeq).toSet
    val b = Merge.scd2(replayed, Seq("k"), "t", Seq("seq"))
      .select("k", "state", "effective_from", "effective_to").collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("fingerprint is partitioning-invariant and detects a changed row") {
    val df = spark.range(2000).selectExpr("CAST(id AS STRING) AS a",
      "CAST(id % 7 AS STRING) AS b")
    def fp(d: org.apache.spark.sql.DataFrame) =
      graft.operators.Checksum.fingerprint(d, Seq("a", "b"))
        .as[(Long, String)].head()
    val base = fp(df)
    assert(fp(df.repartition(13)) == base)           // order/partitioning independent
    val corrupted = spark.range(2000).selectExpr(
      "CAST(id AS STRING) AS a",
      "CAST(CASE WHEN id = 1234 THEN 99 ELSE id % 7 END AS STRING) AS b")
    val bad = fp(corrupted)
    assert(bad._1 == base._1 && bad._2 != base._2)   // same count, different fp
    // empty tables fingerprint as (0, "0") — NULL would make the
    // equality check between two empty copies indeterminate
    val empty = fp(df.filter("a = 'nope'"))
    assert(empty == (0L, "0"))
  }

  test("balanced sampling equalizes strata to the smallest class") {
    val df = spark.range(900).selectExpr("id",
      "CASE WHEN id % 9 = 0 THEN 'rare' WHEN id % 2 = 0 THEN 'mid' ELSE 'big' END AS st")
    val out = Sampling.balanced(df, "st", "id")
    val sizes = out.groupBy("st").count().as[(String, Long)].collect().toMap
    val minc = df.groupBy("st").count().agg(org.apache.spark.sql.functions.min("count"))
      .as[Long].head()
    assert(sizes.values.toSet == Set(minc), sizes.toString)
    // deterministic under repartitioning
    val again = Sampling.balanced(df.repartition(11), "st", "id")
      .select("id").as[Long].collect().toSet
    assert(again == out.select("id").as[Long].collect().toSet)
  }

  test("mergeAggregates over batches equals the one-shot aggregate") {
    val all = spark.range(5000).selectExpr("id % 37 AS k", "id AS v")
    def aggOf(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k").agg(
        count(lit(1)).as("n"), sum("v").as("total"),
        min("v").as("vmin"), max("v").as("vmax"))
    val batches = Seq(
      all.filter("id < 1500"), all.filter("id >= 1500 AND id < 1501"), // 1-row batch
      all.filter("id >= 1501"))
    val ops = Map("vmin" -> "min", "vmax" -> "max")
    val incremental = batches.map(aggOf).reduce(
      (s, d) => Merge.mergeAggregates(s, d, Seq("k"), ops))
    val oneShot = aggOf(all)
    assert(incremental.orderBy("k").collect().map(_.toSeq).toSeq ==
      oneShot.orderBy("k").collect().map(_.toSeq).toSeq)
    // a key whose values are ALL NULL must merge to NULL, not 0 — the
    // one-shot sum over no values is NULL ("no data" != "total 0")
    val nullA = Seq((1L, Option.empty[Long]), (2L, Some(5L))).toDF("k", "v")
      .groupBy("k").agg(sum("v").as("total"))
    val nullB = Seq((1L, Option.empty[Long])).toDF("k", "v")
      .groupBy("k").agg(sum("v").as("total"))
    val merged = Merge.mergeAggregates(nullA, nullB, Seq("k"))
      .as[(Long, Option[Long])].collect().toMap
    assert(merged == Map(1L -> None, 2L -> Some(5L)))
  }

  test("pageRank matches the hand-computed integer recurrence") {
    // A(1)->B(2), B->A, A->C(3); C dangling. Two iterations by hand:
    //   r1: A=1_000_000, B=C=575_000
    //   r2: A=150_000 + 850*575_000/1000 = 638_750, B=C=575_000
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L)).toDF("src", "dst")
    val r = Graph.pageRank(edges, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 638750L, 2L -> 575000L, 3L -> 575000L))
  }

  test("pageRank is invariant under input partitioning") {
    val edges = spark.range(500)
      .selectExpr("id % 37 AS src", "(id * 7) % 31 AS dst")
      .filter("src <> dst")
    val a = Graph.pageRank(edges, iters = 3).collect().map(_.toSeq).toSet
    val b = Graph.pageRank(edges.repartition(13), iters = 3).collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("mixture oversampling: deterministic, monotone, exact integer copies") {
    val docs = spark.range(1000)
      .selectExpr("id", "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS st")
    def pairs(rates: Map[String, Double]) =
      Sampling.mixture(docs, "st", "id", rates, defaultRate = 0.0)
        .select("id", "copy").as[(Long, Long)].collect().toSet
    val base = pairs(Map("a" -> 1.5, "b" -> 0.25))
    // every 'a' row keeps at least its floor copy; 'b' keeps about a quarter
    assert(base.count(_._2 == 0L) >= 500)
    // deterministic under repartitioning
    val repart = Sampling.mixture(docs.repartition(17), "st", "id",
        Map("a" -> 1.5, "b" -> 0.25), defaultRate = 0.0)
      .select("id", "copy").as[(Long, Long)].collect().toSet
    assert(base == repart)
    // monotone: raising a rate never drops an existing (row, copy)
    val raised = pairs(Map("a" -> 1.9, "b" -> 0.5))
    assert(base.subsetOf(raised))
    // fractional rate keeps close to the expected share of single copies
    val bCnt = base.count { case (id, _) => id % 2 == 1 }
    assert(bCnt > 85 && bCnt < 165, s"b kept $bCnt of 500 at rate 0.25")
  }

  test("trailing range window and fixed-horizon decay match hand math") {
    val rows = Seq((1L, 0L, 10L), (1L, 100L, 20L), (1L, 200L, 40L))
      .toDF("k", "t", "v")
    val out = TimeSeries.decayed(
        TimeSeries.trailing(rows, Seq("k"), "t", "v", back = 150L),
        Seq("k"), Seq("t"), "v", terms = 2, out = "d")
      .select("t", "roll_sum", "roll_cnt", "d")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (0L, 10L, 1L, 10.0),           // only itself in range; decay = v
      (100L, 30L, 2L, 25.0),         // 20 + 0.5*10
      (200L, 60L, 2L, 50.0)))        // 40 + 0.5*20; t=0 out of range
  }

  test("asofForward equals the naive inequality-join formulation on random data") {
    val rnd = new scala.util.Random(42)
    val left = (1 to 300).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong)).toDF("k", "lt", "lid")
    // unique (k, rt) per right row so "earliest" is unambiguous
    val right = (1 to 200).map(i =>
      (rnd.nextInt(5).toLong, i * 7L % 997, i * 100L)).toDF("k", "rt", "v")
      .groupBy("k", "rt").agg(min("v").as("v"))
    val op = graft.operators.AsOfJoin
      .asofForward(left, right, Seq("k"), "lt", "rt", Seq("rt", "v"))
      .select("lid", "asof_rt", "asof_v")
      .as[(Long, Option[Long], Option[Long])].collect().toSet
    val naive = {
      left.createOrReplaceTempView("__l")
      right.createOrReplaceTempView("__r")
      spark.sql(
        """SELECT l.lid, m.mt, r2.v
          |FROM __l l
          |LEFT JOIN (
          |  SELECT l2.lid, min(r.rt) AS mt FROM __l l2
          |  JOIN __r r ON l2.k = r.k AND r.rt >= l2.lt GROUP BY l2.lid) m
          |  ON l.lid = m.lid
          |LEFT JOIN __r r2 ON r2.k = l.k AND r2.rt = m.mt""".stripMargin)
        .as[(Long, Option[Long], Option[Long])].collect().toSet
    }
    assert(op == naive)
  }

  test("round-5 operators tolerate degenerate input") {
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextOps.bigramModel(emptyDocs, "text").count() == 0)
    assert(TextOps.bm25(emptyDocs, "doc_id", "text", Seq("x")).count() == 0)
    // single-token docs produce no bigrams
    assert(TextOps.bigramModel(Seq((1L, "solo")).toDF("doc_id", "text"), "text").count() == 0)
    // empty edge set: no nodes, no ranks, no failure
    assert(graft.operators.Graph.pageRank(
      Seq.empty[(Long, Long)].toDF("src", "dst")).count() == 0)
    // scd2 single observation: one open current version
    val one = Merge.scd2(Seq((1L, "a", ts(0), 1L)).toDF("k", "s", "t", "q"),
      Seq("k"), "t", Seq("q")).collect()
    assert(one.length == 1 && one.head.getAs[Boolean]("is_current"))
    // mixture rate 0 everywhere drops everything (empty rates map =
    // default everywhere — was a zero-arm CASE parse error)
    assert(Sampling.mixture(Seq((1L, "a")).toDF("id", "st"), "st", "id",
      Map.empty, defaultRate = 0.0).count() == 0)
    // stratified with an empty rates map had the same zero-arm CASE bug
    assert(Sampling.stratified(Seq((1L, "a")).toDF("id", "st"), "st", "id",
      Map.empty, defaultRate = 1.0).count() == 1)
    // trailing/decayed on an empty frame
    val emptyTs = Seq.empty[(Long, Long, Long)].toDF("k", "t", "v")
    assert(TimeSeries.decayed(
      TimeSeries.trailing(emptyTs, Seq("k"), "t", "v", 10L),
      Seq("k"), Seq("t"), "v").count() == 0)
  }

  test("asofForward matches the earliest at-or-after right row, inclusive") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 35L, "c"), (2L, 5L, "d"))
      .toDF("k", "lt", "tag")
    val right = Seq((1L, 10L, 100L), (1L, 30L, 300L)).toDF("k", "rt", "v")
    val out = graft.operators.AsOfJoin
      .asofForward(left, right, Seq("k"), "lt", "rt", Seq("v"))
      .select("tag", "asof_v").as[(String, Option[Long])].collect().toMap
    assert(out == Map(
      "a" -> Some(100L), // exact tie matches (inclusive)
      "b" -> Some(300L), // next at-or-after 20 is 30
      "c" -> None,       // nothing after 35
      "d" -> None))      // key 2 has no right rows
  }

  test("asofWithin degrades stale matches to no-match") {
    val left = Seq((1L, 100L, "x"), (1L, 250L, "y")).toDF("k", "lt", "tag")
    val right = Seq((1L, 90L, 9L)).toDF("k", "rt", "v")
    val out = graft.operators.AsOfJoin
      .asofWithin(left, right, Seq("k"), "lt", "rt", Seq("v"), maxAge = 50L)
      .select("tag", "asof_v").as[(String, Option[Long])].collect().toMap
    assert(out == Map(
      "x" -> Some(9L), // 10 old, within 50
      "y" -> None))    // 160 old, degraded
  }

  test("quantileBin gives ~equal-count bins and is a pure function of the order") {
    val df = spark.range(800).selectExpr("id % 2 AS k", "CAST(id AS DOUBLE) AS v", "id")
    val binned = graft.operators.Features.quantileBin(
      df, Seq("k"), Seq(col("v"), col("id")), bins = 4)
    val sizes = binned.groupBy("k", "bin").count()
      .as[(Long, Long, Long)].collect().toSet
    // 400 rows per key over 4 bins = exactly 100 each
    assert(sizes == (for (k <- 0 to 1; b <- 1 to 4) yield (k.toLong, b.toLong, 100L)).toSet)
    val again = graft.operators.Features.quantileBin(
        df.repartition(7), Seq("k"), Seq(col("v"), col("id")), bins = 4)
      .select("id", "bin").as[(Long, Long)].collect().toSet
    assert(again == binned.select("id", "bin").as[(Long, Long)].collect().toSet)
  }

  test("bigramModel: conditional probabilities sum to 1 per context") {
    val docs = Seq((1L, "a b a b c"), (2L, "a b")).toDF("doc_id", "text")
    val m = TextOps.bigramModel(docs, "text")
      .as[(String, String, Long, Long, Double)].collect()
    // bigrams: (a,b)x3, (b,a)x1, (b,c)x1
    val counts = m.map(r => (r._1, r._2) -> r._3).toMap
    assert(counts == Map(("a", "b") -> 3L, ("b", "a") -> 1L, ("b", "c") -> 1L))
    val byW1 = m.groupBy(_._1).view.mapValues(_.map(_._5).sum)
    byW1.foreach { case (w1, s) => assert(math.abs(s - 1.0) < 1e-12, s"p(.|$w1) sums to $s") }
  }

  test("streaming sliding windows emit each event into width/slide windows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.EventPipeline
    import graft.streaming.EventPipeline.Event
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Int) = new Timestamp(3600000L + min * 60000L)
    val input = MemoryStream[Event]
    val q = EventPipeline.slidingCounts(input.toDF(), watermark = "10 minutes",
        width = "10 minutes", slide = "5 minutes")
      .writeStream.format("memory").queryName("slide_agg")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Event(ts(1), 1L, "click", 1.0), Event(ts(6), 2L, "click", 2.0))
      q.processAllAvailable()
      input.addData(Event(ts(60), 3L, "click", 0.0)) // advance watermark
      q.processAllAvailable()
      val rows = spark.table("slide_agg")
        .selectExpr("CAST(win_start AS LONG) AS s", "n", "total")
        .as[(Long, Long, Double)].collect().map { case (s, n, t) => s -> (n, t) }.toMap
      val m = 60L // epoch seconds per minute
      // windows: [55,65): event@61 only; [60,70): both; [65,75): event@66 only
      assert(rows(55 * m) == (1L, 1.0))
      assert(rows(60 * m) == (2L, 3.0))
      assert(rows(65 * m) == (1L, 2.0))
    } finally q.stop()
  }

  test("semanticDedup drops the larger-id near-twin only within a cluster") {
    val rows = Seq(
      (1L, 0, Array(1.0, 0.0)), (2L, 0, Array(0.999, 0.01)), // near-twins, same cluster
      (3L, 1, Array(1.0, 0.0)),                              // twin of 1 but OTHER cluster
      (4L, 0, Array(0.0, 1.0))                               // orthogonal, same cluster
    ).toDF("vec_id", "cl", "e")
    val kept = graft.operators.Vectors.semanticDedup(rows, "cl", "vec_id", "e", tau = 0.95)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L)) // 2 dropped: 1 is its smaller-id cluster-mate
  }

  test("native session_window streams gap-based sessions like the custom operator") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.EventPipeline
    import graft.streaming.EventPipeline.Event
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Int) = new Timestamp(3600000L + min * 60000L)
    val input = MemoryStream[Event]
    val q = EventPipeline.sessionWindows(input.toDF(), watermark = "10 minutes",
        gap = "10 minutes")
      .writeStream.format("memory").queryName("sess_win")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(ts(0), 1L, "click", 1.0), Event(ts(5), 1L, "click", 2.0), // one session
        Event(ts(2), 2L, "view", 5.0))
      q.processAllAvailable()
      input.addData(Event(ts(60), 3L, "click", 0.0)) // watermark closes them
      q.processAllAvailable()
      val rows = spark.table("sess_win")
        .selectExpr("user_id", "n_events", "total")
        .as[(Long, Long, Double)].collect().toSet
      assert(rows.contains((1L, 2L, 3.0))) // merged gap-session for user 1
      assert(rows.contains((2L, 1L, 5.0)))
    } finally q.stop()
  }

  test("bm25 ranks higher tf above lower tf at equal length") {
    val docs = Seq((1L, "x x y"), (2L, "x y y"), (3L, "z z z"))
      .toDF("doc_id", "text")
    val scores = TextOps.bm25(docs, "doc_id", "text", Seq("x"))
      .as[(Long, Double)].collect().toMap
    assert(scores.keySet == Set(1L, 2L))      // doc 3 matches no term
    assert(scores(1L) > scores(2L))           // tf 2 beats tf 1
    assert(scores.values.forall(_ > 0.0))
  }
}
