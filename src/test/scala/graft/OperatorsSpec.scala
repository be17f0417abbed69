package graft

import java.sql.Timestamp

import graft.functions.GraftFunctions
import graft.operators.{Sessionize, Skew}
import org.apache.spark.sql.functions._

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(3600000L + min * 60000L)

  test("batch sessionize matches the streaming operator's gap semantics") {
    val events = Seq(
      (1L, ts(0), 1.0), (1L, ts(5), 2.0), (1L, ts(8), 3.0),   // session 1
      (1L, ts(60), 4.0),                                       // session 2
      (2L, ts(1), 5.0)                                         // session 1
    ).toDF("user_id", "ts", "value")
    val out = Sessionize.sessions(events, "user_id", "ts", "value", gapSeconds = 600)
      .selectExpr("user_id", "session_id", "n_events", "CAST(total AS DOUBLE) AS total")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(out == Set((1L, 1L, 3L, 6.0), (1L, 2L, 1L, 4.0), (2L, 1L, 1L, 5.0)))
  }

  test("salted aggregation equals plain groupBy on skewed data") {
    val skewed = spark.range(10000)
      .selectExpr("CASE WHEN id % 100 < 99 THEN 'hot' ELSE concat('k', id % 7) END AS k",
        "CAST(id AS DOUBLE) AS v")
    val salted = Skew.saltedAggregate(skewed, Seq("k"), salt = 16, Seq(
        Skew.count2("n"), Skew.sum2("v", "total"),
        Skew.min2("v", "vmin"), Skew.max2("v", "vmax")))
      .orderBy("k").collect()
    val plain = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("total"),
           min("v").as("vmin"), max("v").as("vmax"))
      .orderBy("k").collect()
    assert(salted.map(_.toSeq).toSeq == plain.map(_.toSeq).toSeq)
  }

  test("salted join equals the plain join and splits the hot key") {
    import graft.operators.Skew
    // 98% of left rows share one key — the plain join funnels them
    // through a single reducer partition
    val left = spark.range(5000)
      .selectExpr("IF(id % 50 = 0, id % 7, 999L) AS k", "id AS lv")
    val right = Seq((999L, "hot"), (0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "rv")
    val salted = Skew.saltedJoin(left, right, Seq("k"), salt = 8)
    val plain = left.join(right, Seq("k"))
    assert(salted.count() == plain.count())
    val a = salted.selectExpr("k", "lv", "rv").as[(Long, Long, String)].collect().toSet
    val b = plain.selectExpr("k", "lv", "rv").as[(Long, Long, String)].collect().toSet
    assert(a == b)
    // the salting expression actually spreads the hot key's rows over
    // multiple (key, salt) groups — the property that splits the reducer
    val saltSpread = left
      .withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(8)))
      .filter("k = 999").select("_salt").distinct().count()
    assert(saltSpread > 1, s"hot key landed on $saltSpread salt group(s)")
  }

  test("chunking covers every character once per stride, edges included") {
    import graft.operators.TextOps
    val docs = Seq(
      (1L, "a" * 250),   // 3 chunks at stride 100
      (2L, "b" * 100),   // exactly one window
      (3L, "c"),         // shorter than one window
      (4L, "")           // empty text still yields one (empty) chunk
    ).toDF("doc_id", "text")
    val out = TextOps.chunk(docs, "text", size = 120, overlap = 20)
      .selectExpr("doc_id", "chunk_id", "length(chunk) AS n").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out == Set(
      (1L, 0L, 120), (1L, 1L, 120), (1L, 2L, 50),
      (2L, 0L, 100), (3L, 0L, 1), (4L, 0L, 0)), s"got $out")
    // overlap: chunk i's last `overlap` chars == chunk i+1's first ones
    val two = TextOps.chunk(Seq((9L, ('a' to 'z').mkString * 10)).toDF("doc_id", "text"),
        "text", size = 120, overlap = 20)
      .orderBy("chunk_id").selectExpr("chunk").as[String].collect()
    assert(two(0).takeRight(20) == two(1).take(20))
  }

  test("token chunking windows the token array with carried overlap") {
    import graft.operators.TextOps
    val text = (1 to 50).map(i => s"w$i").mkString(" ")
    val rows = TextOps.chunkByTokens(Seq((1L, text)).toDF("doc_id", "text"),
        "text", size = 32, overlap = 8)
      .orderBy("chunk_id").selectExpr("chunk", "n_tok").as[(String, Long)].collect()
    // 50 tokens, stride 24: windows at 1..32, 25..50, 49..50
    assert(rows.map(_._2).toSeq == Seq(32L, 26L, 2L), rows.mkString("; "))
    assert(rows(0)._1.split(" ").takeRight(8).toSeq == rows(1)._1.split(" ").take(8).toSeq)
    assert(rows(1)._1.endsWith("w50") && rows(2)._1 == "w49 w50")
  }

  test("as-of join matches latest at-or-before row per key, left-outer") {
    import graft.operators.AsOfJoin
    val trades = Seq((1L, 10L), (1L, 20L), (1L, 5L), (2L, 7L))
      .toDF("k", "ts")
    val q2 = Seq((1L, 10L, 1.0), (1L, 15L, 2.0), (2L, 99L, 9.0)).toDF("k", "ts", "px")
    val out = AsOfJoin.asof(trades, q2, Seq("k"), "ts", "ts", Seq("px"))
      .select("k", "ts", "asof_px").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
      .toSet
    assert(out == Set(
      (1L, 10L, Some(1.0)),  // tie at ts=10 matches (inclusive)
      (1L, 20L, Some(2.0)),  // latest of the two earlier quotes
      (1L, 5L, None),        // before the first quote → NULL
      (2L, 7L, None)), s"got $out")         // key 2's quote is later → NULL
  }

  test("as-of join carries a matched row's NULL instead of leaking older values") {
    import graft.operators.AsOfJoin
    // key 1: quote at ts=10 has px=1.0, quote at ts=15 has px=NULL.
    // A trade at ts=20 matches the ts=15 quote — its NULL must be
    // carried, NOT skipped in favor of the older 1.0 (the match is on
    // time, never on value presence).
    val trades = Seq((1L, 20L), (1L, 12L)).toDF("k", "ts")
    val q2 = Seq((1L, 10L, Some(1.0)), (1L, 15L, None))
      .toDF("k", "ts", "px")
    val out = AsOfJoin.asof(trades, q2, Seq("k"), "ts", "ts", Seq("px"))
      .select("k", "ts", "asof_px").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
      .toSet
    assert(out == Set(
      (1L, 20L, None),       // matched quote exists but its px is NULL
      (1L, 12L, Some(1.0))), // matched the ts=10 quote normally
      s"got $out")
  }

  test("range join equals the naive inequality join") {
    import graft.operators.RangeJoin
    val l = Seq((1L, 0.0), (2L, 100.0), (3L, -250.0)).toDF("lid", "lv")
    val r = Seq((10L, -60.0), (11L, 49.9), (12L, 50.0), (13L, 149.0), (14L, -200.0))
      .toDF("rid", "rv")
    val fast = RangeJoin.within(l, r, "lv", "rv", -50, 50)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val naive = l.crossJoin(r)
      .filter($"rv".between($"lv" - 50, $"lv" + 50))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(fast == naive, s"fast=$fast naive=$naive")
    assert(fast == Set((1L, 11L), (1L, 12L), (2L, 12L), (2L, 13L), (3L, 14L)))
  }

  test("fuzzy join links planted typos, never a pair past the distance budget") {
    import graft.operators.FuzzyJoin
    val l = Seq((1L, "jonathan smith"), (2L, "maria garcia"), (3L, "wei chen"))
      .toDF("a_key", "a_name")
    val r = Seq((10L, "jonathon smith"), (11L, "maria garcia"), (12L, "completely different"),
        (13L, "wie chen"))
      .toDF("b_key", "b_name")
    val out = FuzzyJoin.byEditDistance(l, r, "a_key", "a_name", "b_key", "b_name",
        maxDist = 2)
      .select("a_key", "b_key", "dist").as[(Long, Long, Int)].collect().toSet
    // the typo'd variants (1 sub, exact, 1 transposition = 2 edits) all link
    assert(out.contains((1L, 10L, 1)), out.toString)
    assert(out.contains((2L, 11L, 0)), out.toString)
    assert(out.contains((3L, 13L, 2)), out.toString)
    // precision 1: nothing past the budget survives the verify stage
    assert(out.forall(_._3 <= 2), out.toString)
    assert(!out.exists(_._2 == 12L), out.toString)
  }

  test("interval overlap join equals the naive cross predicate, no duplicate pairs") {
    import graft.operators.RangeJoin
    val l = Seq((1L, 0L, 10L), (2L, 5L, 100L), (3L, 200L, 205L), (4L, 50L, 50L))
      .toDF("lid", "ls", "le")
    val r = Seq((10L, 9L, 12L), (11L, 90L, 210L), (12L, 300L, 310L), (13L, 50L, 50L))
      .toDF("rid", "rs", "re")
    // deliberately small bucket width: long intervals span MANY buckets,
    // exercising the exactly-one-surviving-bucket dedup guard
    val fast = RangeJoin.overlaps(l, r, "ls", "le", "rs", "re", bucketWidth = 4.0)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    val naive = l.join(r, expr("ls <= re AND rs <= le"))
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    assert(fast.sorted == naive.sorted, s"fast=$fast naive=$naive")
    assert(fast.size == fast.toSet.size, "duplicate pairs emitted")
    assert(fast.toSet.contains((4L, 13L)), "point-interval inclusive touch missed")
  }

  test("hash split is a pure function of the id — stable under re-partitioning") {
    import graft.operators.Sampling
    val ids = spark.range(1000).selectExpr("id AS doc_id")
    val a = Sampling.hashSplit(ids, "doc_id").orderBy("doc_id")
      .selectExpr("split").as[String].collect().toSeq
    val b = Sampling.hashSplit(ids.repartition(7), "doc_id").orderBy("doc_id")
      .selectExpr("split").as[String].collect().toSeq
    assert(a == b)
    val nTest = a.count(_ == "test")
    assert(nTest > 50 && nTest < 150, s"10% split wildly off: $nTest/1000")
    // folds partition the id space completely and disjointly
    val folds = Sampling.fold(ids, "doc_id").groupBy("fold").count()
      .as[(Int, Long)].collect().toMap
    assert(folds.keySet == (0 until 10).toSet && folds.values.sum == 1000L)
  }

  test("stratified sampling keeps per-stratum rates and grows monotonically") {
    import graft.operators.Sampling
    val rows = spark.range(4000)
      .selectExpr("id AS doc_id", "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS st")
    val kept = Sampling.stratified(rows, "st", "doc_id", Map("a" -> 0.5, "b" -> 0.1))
    val byStratum = kept.groupBy("st").count().as[(String, Long)].collect().toMap
    assert(byStratum("a") > 800 && byStratum("a") < 1200, byStratum.toString) // ~1000 of 2000
    assert(byStratum("b") > 120 && byStratum("b") < 280, byStratum.toString)  // ~200 of 2000
    // membership is a pure function of the id: raising a rate only ADDS
    // rows, never swaps any out (the property that makes re-runs over a
    // grown corpus reproducible)
    val keptIds = kept.select("doc_id").as[Long].collect().toSet
    val wider = Sampling.stratified(rows, "st", "doc_id", Map("a" -> 0.8, "b" -> 0.3))
      .select("doc_id").as[Long].collect().toSet
    assert(keptIds.subsetOf(wider))
    // and partitioning is irrelevant
    val reshuffled = Sampling.stratified(rows.repartition(13), "st", "doc_id",
      Map("a" -> 0.5, "b" -> 0.1)).select("doc_id").as[Long].collect().toSet
    assert(reshuffled == keptIds)
  }

  test("per-key sample takes the k smallest hashes — stable as the group grows") {
    import graft.operators.Sampling
    val small = spark.range(100).selectExpr("id AS doc_id", "CAST(id % 3 AS STRING) AS k")
    val s1 = Sampling.perKeySample(small, Seq("k"), "doc_id", k = 4)
      .select("k", "doc_id").as[(String, Long)].collect().toSet
    assert(s1.groupBy(_._1).forall(_._2.size == 4), s1.toString)
    // growing a group can only swap members out for smaller-hash rows:
    // the new sample per key is drawn from old sample ∪ new rows
    val grown = spark.range(200).selectExpr("id AS doc_id", "CAST(id % 3 AS STRING) AS k")
    val s2 = Sampling.perKeySample(grown, Seq("k"), "doc_id", k = 4)
      .select("k", "doc_id").as[(String, Long)].collect().toSet
    assert(s2.forall { case (k, id) => id >= 100 || s1.contains((k, id)) }, s2.toString)
  }

  test("repetition signals count the dominant bigram via sorted run lengths") {
    import graft.operators.TextOps
    val df = Seq(
      (1L, "spam spam spam spam eggs"),   // "spam spam" x3 of 4 bigrams
      (2L, "all words here are unique"),  // every bigram once
      (3L, "one"),                        // sub-bigram doc: no bigrams
      (4L, "go go go go")                 // one token repeated
    ).toDF("doc_id", "text")
    val out = TextOps.repetitionSignals(df, "doc_id", "text")
      .orderBy("doc_id")
      .selectExpr("n_tok", "dup_token_frac", "top_bigram_n", "top_bigram_frac")
      .as[(Long, Double, Long, Double)].collect().toSeq
    assert(out(0) == ((5L, 0.6, 3L, 0.75)), out(0).toString)
    assert(out(1) == ((5L, 0.0, 1L, 0.25)), out(1).toString)
    assert(out(2) == ((1L, 0.0, 0L, 0.0)), out(2).toString)
    assert(out(3) == ((4L, 0.75, 3L, 1.0)), out(3).toString)
  }

  test("resample fills an aligned grid per key with last observation carried forward") {
    import graft.operators.TimeSeries
    val obs = Seq(
      (1L, 95L, 10.0), (1L, 130L, 20.0), (1L, 340L, 30.0), // key 1: span 95..340
      (2L, 200L, 5.0)                                      // key 2: single point
    ).toDF("k", "tu", "v")
    val out = TimeSeries.resample(obs, Seq("k"), "tu", step = 100L, Seq("v"))
      .select("k", "tu", "asof_v").as[(Long, Long, Double)].collect().toSet
    // key 1 grid starts at 100 (first multiple of step >= 95), each point
    // carries the latest at-or-before value; key 2 grid is just t=200
    assert(out == Set(
      (1L, 100L, 10.0), (1L, 200L, 20.0), (1L, 300L, 20.0),
      (2L, 200L, 5.0)), s"got $out")
  }

  test("resample grid-start is exact for pre-epoch (negative) timestamps") {
    import graft.operators.TimeSeries
    // lo=-15: ceil(-15/10)*10 = -10. Truncating division's (lo+step-1)
    // form would start the grid at 0 and drop -10 entirely.
    val obs = Seq((1L, -15L, 1.0), (1L, 12L, 2.0)).toDF("k", "tu", "v")
    val out = TimeSeries.resample(obs, Seq("k"), "tu", step = 10L, Seq("v"))
      .select("tu", "asof_v").as[(Long, Double)].collect().toMap
    assert(out.keySet == Set(-10L, 0L, 10L), s"got ${out.keySet}")
    assert(out(-10L) == 1.0 && out(0L) == 1.0 && out(10L) == 1.0)
    // aligned negative lo stays put
    val aligned = Seq((1L, -20L, 1.0), (1L, -1L, 2.0)).toDF("k", "tu", "v")
    val ks = TimeSeries.resample(aligned, Seq("k"), "tu", 10L, Seq("v"))
      .select("tu").as[Long].collect().toSet
    assert(ks == Set(-20L, -10L), s"got $ks")
  }

  test("standardize yields defined zeros for constant groups, unit scaling otherwise") {
    import graft.operators.Features
    val rows = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 7.0), ("b", 7.0))
      .toDF("g", "x")
    val out = Features.standardize(rows, Seq("g"), "x")
      .select("g", "x", "x_z", "x_mm").as[(String, Double, Double, Double)]
      .collect().toSet
    assert(out.contains(("a", 1.0, -1.0, 0.0)) && out.contains(("a", 3.0, 1.0, 1.0)))
    assert(out.contains(("a", 2.0, 0.0, 0.5)))
    // constant group: stddev 0 and min=max must produce 0, never NaN/NULL
    assert(out.filter(_._1 == "b").forall(r => r._3 == 0.0 && r._4 == 0.0), out.toString)
  }

  test("centroids average element-wise and ignore partitioning") {
    import graft.operators.Vectors
    val vecs = Seq(
      (1, Array(1.0f, 2.0f)), (1, Array(3.0f, 6.0f)),
      (2, Array(10.0f, 0.0f))).toDF("label", "embedding")
    val out = Vectors.centroids(vecs, "label", "embedding")
      .selectExpr("label", "n_vecs", "centroid[0] AS c0", "centroid[1] AS c1")
      .as[(Int, Long, Double, Double)].collect().toSet
    assert(out == Set((1, 2L, 2.0, 4.0), (2, 1L, 10.0, 0.0)), s"got $out")
    val repart = Vectors.centroids(vecs.repartition(5), "label", "embedding")
      .selectExpr("label", "centroid[0]", "centroid[1]")
      .as[(Int, Double, Double)].collect().toSet
    assert(repart == Set((1, 2.0, 4.0), (2, 10.0, 0.0)))
  }

  test("weightedMedian crosses half the total weight, lower-median on ties") {
    import graft.operators.Features
    val d = Seq(
      ("g", 1L, 1L, 1L), ("g", 2L, 1L, 2L), ("g", 3L, 10L, 3L), // heavy tail wins
      ("h", 1L, 1L, 4L), ("h", 2L, 1L, 5L)                       // even split: lower
    ).toDF("k", "v", "w", "tb")
    val out = Features.weightedMedian(d, Seq("k"), "v", "w", Seq("tb"))
      .as[(String, Long)].collect().toMap
    assert(out == Map("g" -> 3L, "h" -> 1L), s"got $out")
  }

  test("triangles canonicalizes duplicates/reversals and counts each once") {
    import graft.operators.Graph
    val edges = Seq(
      (2L, 1L), (1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), // one triangle + tail
      (5L, 6L), (5L, 7L), (5L, 8L), (6L, 7L), (6L, 8L), (7L, 8L) // K4: 4 triangles
    ).toDF("src", "dst")
    assert(Graph.triangles(edges).count() == 5)
  }

  test("snapshotAt reads the version effective at the instant, inclusive of from") {
    import graft.operators.Merge
    import java.sql.Timestamp
    def ts(min: Int) = new Timestamp(3600000L + min * 60000L)
    val changes = Seq(
      (1L, "a", ts(0), 1L), (1L, "b", ts(20), 2L), (2L, "x", ts(30), 3L)
    ).toDF("k", "state", "t", "seq")
    val hist = Merge.scd2(changes, Seq("k"), "t", tieBreak = Seq("seq"))
    def at(min: Int) =
      Merge.snapshotAt(hist, lit(ts(min)))
        .select("k", "state").as[(Long, String)].collect().toSet
    assert(at(10) == Set((1L, "a")))
    assert(at(20) == Set((1L, "b")))          // boundary: from is inclusive
    assert(at(40) == Set((1L, "b"), (2L, "x"))) // open current versions
    assert(at(-5) == Set.empty)
  }

  test("drift flags null-rate and distinct-rate shifts with integer compares") {
    import graft.operators.Profile
    val a = Seq.tabulate(100)(i => (i.toLong, "t")).toDF("id", "ty")
    // b: 10% nulls in ty (null_drift), ids all distinct (no distinct drift)
    val b = Seq.tabulate(100)(i =>
      (i.toLong, if (i % 10 == 0) null else "t")).toDF("id", "ty")
    val out = Profile.drift(a, b, Seq("id", "ty"))
      .select("column", "null_drift", "distinct_drift", "range_changed")
      .as[(String, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // nulls appeared (10 points > 5) but distinct count stays 1 on both
    // sides (DISTINCT ignores nulls) and min/max are unchanged
    assert(out("ty") == ((true, false, false)), s"got ${out("ty")}")
    assert(out("id") == ((false, false, false)), s"got ${out("id")}")
    // empty snapshot IS the drift; all-NULL min/max must flag (not NULL
    // through <> and get swallowed by a downstream filter)
    val empt = Profile.drift(a, a.filter(lit(false)), Seq("ty"))
      .select("null_drift", "distinct_drift", "range_changed")
      .as[(Boolean, Boolean, Boolean)].head()
    assert(empt == ((true, true, true)), s"got $empt")
    val nulled = Profile.drift(a,
        a.withColumn("ty", lit(null).cast("string")), Seq("ty"))
      .select("range_changed").as[Boolean].head()
    assert(nulled, "populated -> all-NULL must flag range_changed")
  }

  test("checks reports per-rule verdicts with evidence from one scan") {
    import graft.operators.Profile
    import graft.operators.Profile.Check
    val d = Seq((1L, "a"), (2L, "b"), (2L, "zz"), (3L, null))
      .toDF("id", "seg")
    val out = Profile.checks(d, Seq(
        Check("complete_seg", "count(seg) = count(*)", "count(*) - count(seg)"),
        Check("unique_id", "count(DISTINCT id) = count(id)",
          "count(id) - count(DISTINCT id)"),
        Check("seg_domain", "count_if(seg NOT IN ('a', 'b')) = 0",
          "count_if(seg NOT IN ('a', 'b'))"),
        Check("min_rows", "count(*) >= 2", "count(*)")))
      .as[(String, Boolean, String)].collect().toSet
    assert(out == Set(
      ("complete_seg", false, "1"),
      ("unique_id", false, "1"),
      ("seg_domain", false, "1"),
      ("min_rows", true, "4")), s"got $out")
    // all four rules ride ONE aggregate over one scan of the input
    val plan = Profile.checks(d, Seq(Check("a", "count(*) >= 0", "count(*)"),
        Check("b", "count(*) < 10", "count(*)")))
      .queryExecution.executedPlan.toString
    assert(plan.split("LocalTableScan").length - 1 == 1, plan)
  }

  test("randomProject sums signed micro-coordinates exactly") {
    import graft.operators.Vectors
    val df = Seq((1L, Array(0.5f, -0.25f)), (2L, Array(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = Vectors.randomProject(df, "embedding", outDims = 2, dims = 2)
      .selectExpr("vec_id", "proj[0]", "proj[1]")
      .as[(Long, Long, Long)].collect().map { case (k, a, b) => k -> ((a, b)) }.toMap
    def exp(v: Seq[Long], j: Int) =
      Vectors.projectSigns(j, 2).zip(v).map { case (s, x) => s * x }.sum
    assert(out(1L) == (exp(Seq(500000L, -250000L), 0), exp(Seq(500000L, -250000L), 1)))
    assert(out(2L) == (exp(Seq(1000000L, 1000000L), 0), exp(Seq(1000000L, 1000000L), 1)))
  }

  test("negatives draws k in-domain non-self partners, reproducibly") {
    import graft.operators.{Sampling}
    import graft.functions.text.Hash60
    val n = 10L
    val df = (0L until n).map(Tuple1(_)).toDF("doc_id")
    val out = Sampling.negatives(df, "doc_id", k = 2, seed = "t")
      .select("doc_id", "j", "neg_id").as[(Long, Long, Long)].collect().toSet
    assert(out.size == 20)
    assert(out.forall { case (id, _, neg) => neg >= 0 && neg < n && neg != id })
    // matches the published derivation hash60("t:<id>:<j>") mod n, self-shifted
    val expected = (for (id <- 0L until n; j <- 0L until 2L) yield {
      val c = Hash60.hash(s"t:$id:$j".getBytes("UTF-8")) % n
      (id, j, if (c == id) (c + 1) % n else c)
    }).toSet
    assert(out == expected)
    val re = Sampling.negatives(df.repartition(5), "doc_id", k = 2, seed = "t")
      .select("doc_id", "j", "neg_id").as[(Long, Long, Long)].collect().toSet
    assert(re == out)
  }

  test("interpolate draws the line between neighbors, honors exact hits and negative grids") {
    import graft.operators.TimeSeries
    val obs = Seq(
      ("u1", 5L, 10L), ("u1", 25L, 40L),   // midpoints on the 10-grid
      ("u2", 10L, 7L), ("u2", 20L, 9L),    // observations exactly on-grid
      ("u3", -15L, 2L), ("u3", -5L, 4L)    // pre-epoch: grid must start at -10
    ).toDF("k", "t", "v")
    val out = TimeSeries.interpolate(obs, Seq("k"), "t", "v", step = 10L)
      .as[(String, Long, Double)].collect().toSet
    assert(out == Set(
      ("u1", 10L, 17.5), ("u1", 20L, 32.5),
      ("u2", 10L, 7.0), ("u2", 20L, 9.0),
      ("u3", -10L, 3.0)), s"got $out")
  }

  test("surprisal counts integer bits, flags corpus-unique bigrams, skips short docs") {
    import graft.operators.TextOps
    val corpus = Seq((1L, "a b a b"), (2L, "a c"), (3L, "x")).toDF("doc_id", "text")
    // model: c(a,b)=2 c(b,a)=1 c(a,c)=1; c1(a)=3 c1(b)=1
    val out = TextOps.surprisal(corpus, "doc_id", "text",
        TextOps.bigramModel(corpus, "text"))
      .select("doc_id", "n_bg", "bits_sum", "novel_n", "avg_bits")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    // d1: (a,b)x2 at 3 div 2 = 1 -> 0 bits; (b,a) at 1 div 1 -> 0 bits, unique
    // d2: (a,c) at 3 div 1 = 3 -> 1 bit, unique; d3: no bigrams -> absent
    assert(out == Set((1L, 3L, 0L, 1L, 0.0), (2L, 1L, 1L, 1L, 1.0)), s"got $out")
  }

  test("kmv sketches merge exactly and estimate within the 1/sqrt(k) envelope") {
    import graft.operators.Sketches
    val a = (1L to 3000L).map(i => Tuple1(s"a$i")).toDF("x")
      .selectExpr("graft_hash60(x) AS h")
    val b = (2000L to 6000L).map(i => Tuple1(s"a$i")).toDF("x")
      .selectExpr("graft_hash60(x) AS h")
    val k = 256
    def arr(df: org.apache.spark.sql.DataFrame) =
      df.as[Seq[Long]].head
    val ska = arr(Sketches.kmv(a, "h", k).select("kmv"))
    val skb = arr(Sketches.kmv(b, "h", k).select("kmv"))
    // merge law: merging two shard sketches IS the union's sketch
    val skU = arr(Sketches.kmv(a.union(b), "h", k).select("kmv"))
    val merged = (ska ++ skb).distinct.sorted.take(k)
    assert(merged == skU)
    // pure function of the SET: partitioning cannot change it
    assert(arr(Sketches.kmv(a.repartition(13), "h", k).select("kmv")) == ska)
    // estimator inside a generous 4/sqrt(k) = 25% envelope (|union| = 6000)
    val est = Sketches.kmv(a.union(b), "h", k)
      .selectExpr(Sketches.estimateExpr("kmv", k) + " AS e").as[Long].head
    assert(math.abs(est - 6000L) <= 1500, s"est $est")
  }

  test("kmeans separates two blobs in two Lloyd rounds and ignores partitioning") {
    import graft.operators.Vectors
    // both seeds (the two lowest ids) sit inside blob A — round 1 must
    // split the corpus along the seeds, round 2 must converge on the blobs
    val vecs = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(0.1f, 0.0f)), (2L, Array(0.0f, 0.1f)),
      (3L, Array(1.0f, 1.0f)), (4L, Array(0.9f, 1.0f)), (5L, Array(1.0f, 0.9f))
    ).toDF("vec_id", "embedding")
    val r = Vectors.kmeans(vecs, "vec_id", "embedding", k = 2, iters = 2)
    val got = r.assignments.as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 1L),
      s"got $got")
    assert(r.centroids.count() == 2)
    // integer arithmetic ⇒ identical clustering under any partitioning
    val re = Vectors.kmeans(vecs.repartition(7), "vec_id", "embedding",
      k = 2, iters = 2).assignments.as[(Long, Long)].collect().toMap
    assert(re == got)
  }

  test("packBins walks docs in order and opens a bin when the budget would pass") {
    import graft.operators.TextOps
    val docs = Seq(
      (1L, 0, 80L), (2L, 0, 90L), (3L, 0, 50L), (4L, 0, 100L), // cum 80,170,220,320
      (5L, 1, 250L), (6L, 1, 10L)                               // oversized doc owns bin 0
    ).toDF("doc_id", "shard", "n_tok")
    val out = TextOps.packBins(docs, "n_tok", "doc_id", "shard", budget = 200)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    // bin = tokens BEFORE the doc div budget: doc 3 starts at 170 → bin 0;
    // doc 4 starts at 220 → bin 1; oversized doc 5 fills bin 0, doc 6 → bin 1
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 0L, 6L -> 1L),
      s"got $out")
  }

  test("BPE-ish tokenization splits contractions, numbers, and punctuation") {
    import graft.operators.TextOps
    val out = TextOps.bpeTokens(
        Seq((1L, "I'm ready, 42 dogs!"), (2L, "")).toDF("doc_id", "text"), "text")
      .orderBy("doc_id").selectExpr("bpe", "n_bpe")
      .as[(Seq[String], Long)].collect().toSeq
    // the GPT-2 pre-tokenizer unit: contraction 'm separate, leading
    // space attached to the following word, punctuation its own token
    assert(out(0)._1 == Seq("I", "'m", " ready", ",", " 42", " dogs", "!"),
      out(0)._1.mkString("|"))
    assert(out(0)._2 == 7L)
    assert(out(1) == ((Seq.empty[String], 0L)), out(1).toString)
  }

  test("redact scrubs emails before digit runs, leaves clean text alone") {
    import graft.operators.TextOps
    val msgs = Seq(
      (1L, "mail a123456789@x.org now"),       // email wins over the digit run inside it
      (2L, "call +1 (415) 555-0100 today"),
      (3L, "acct 123456789012 closed"),
      (4L, "a plain sentence with no pii")
    ).toDF("id", "msg")
    val out = TextOps.redact(msgs, "msg").select("id", "redacted")
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "mail <email> now", out(1L))
    assert(out(2L) == "call <phone> today", out(2L))
    assert(out(3L) == "acct <digits> closed", out(3L))
    assert(out(4L) == "a plain sentence with no pii")
  }

  test("registered graft functions are SQL-callable") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_score('hello') AS s, graft_fingerprint('abc') AS f").collect().head
    assert(r.getAs[Long]("s") == 5L)
    assert(r.getAs[Long]("f") == ((('a' * 31L + 'b') % 1000000007L * 31 + 'c') % 1000000007L))
  }

  test("upsert replaces matched keys, inserts new ones, keeps the rest") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "v")
    val updates = Seq((2L, "b2", 99.0), (9L, "i", 1.0)).toDF("id", "name", "v")
    val out = operators.Merge.upsert(target, updates, Seq("id"))
      .as[(Long, String, Double)].collect().toSet
    assert(out == Set((1L, "a", 10.0), (2L, "b2", 99.0), (3L, "c", 30.0), (9L, "i", 1.0)))
  }

  test("upsert with orderCol resolves duplicate-keyed updates to the newest row") {
    val target = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "name", "ver")
    val updates = Seq(
      (2L, "b_old", 21L), (2L, "b_new", 25L), // colliding updates: ver 25 wins
      (9L, "i", 1L)
    ).toDF("id", "name", "ver")
    val out = operators.Merge.upsert(target, updates, Seq("id"), "ver")
      .as[(Long, String, Long)].collect().toSet
    assert(out == Set((1L, "a", 10L), (2L, "b_new", 25L), (9L, "i", 1L)), s"got $out")
  }

  test("delete drops exactly the tombstoned keys") {
    val target = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name")
    val tombstones = Seq((2L, "ignored"), (9L, "absent")).toDF("id", "x")
    val out = operators.Merge.delete(target, tombstones, Seq("id"))
      .as[(Long, String)].collect().toSet
    assert(out == Set((1L, "a"), (3L, "c")))
  }

  test("delta classifies inserted/changed/unchanged with NULL-safe compare") {
    val target = Seq((1L, Option("a")), (2L, None), (3L, Option("c")))
      .toDF("id", "name")
    val updates = Seq(
      (1L, Option("a")),   // unchanged
      (2L, Option.empty[String]), // NULL -> NULL is unchanged, not changed
      (3L, Option("C")),   // changed
      (4L, Option("d"))    // inserted
    ).toDF("id", "name")
    val kinds = operators.Merge.delta(target, updates, Seq("id"))
      .select("id", "change_kind").as[(Long, String)].collect().toMap
    assert(kinds == Map(1L -> "unchanged", 2L -> "unchanged",
      3L -> "changed", 4L -> "inserted"))
  }

  test("decontaminate flags only docs sharing an n-gram with the benchmark") {
    import graft.operators.TextOps
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // contains bench 5-gram
      (2L, "one two three four five six"),         // clean
      (3L, "alpha beta gamma"),                    // shorter than n: never flagged
      (4L, "x alpha beta gamma delta epsilon y")   // bench 5-gram mid-string
    ).toDF("doc_id", "text")
    val bench = Seq("alpha beta gamma delta epsilon" -> 1).toDF("btext", "junk")
    val out = TextOps.decontaminate(corpus, "doc_id", "text", bench, "btext", n = 5)
      .select("doc_id", "contaminated").as[(Long, Boolean)].collect().toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> false, 4L -> true))
  }

  test("resolveEntities clusters transitively and picks the min id as canonical") {
    import graft.operators.FuzzyJoin
    val rows = Seq(
      (5L, "alpha bravo charlie"),
      (2L, "alpha bravo charlee"),   // dist 2 from 5
      (7L, "alpha bravo charleee"),  // dist 1 from 2, dist 3 from 5: transitive only
      (9L, "completely different")
    ).toDF("id", "name")
    val out = FuzzyJoin.resolveEntities(rows, "id", "name", maxDist = 2)
      .select("id", "canonical_id").as[(Long, Long)].collect().toMap
    assert(out == Map(5L -> 2L, 2L -> 2L, 7L -> 2L, 9L -> 9L), out.toString)
  }

  test("weighted sampling is monotone in the weight and deterministic") {
    import graft.operators.Sampling
    val base = spark.range(2000).selectExpr("id", "0.3D AS w")
    val kept1 = Sampling.weighted(base, "id", "w").select("id").as[Long].collect().toSet
    val kept2 = Sampling.weighted(base, "id", "w").select("id").as[Long].collect().toSet
    assert(kept1 == kept2, "same run twice must keep the same set")
    assert(math.abs(kept1.size - 600) < 120, s"~30% of 2000, got ${kept1.size}")
    val raised = Sampling.weighted(
      spark.range(2000).selectExpr("id", "0.6D AS w"), "id", "w")
      .select("id").as[Long].collect().toSet
    assert(kept1.subsetOf(raised), "raising the weight must never drop a kept row")
    // weight 0 keeps nothing, weight 1 (and clamped >1) keeps everything
    assert(Sampling.weighted(spark.range(50).selectExpr("id", "0.0D AS w"), "id", "w").count() == 0)
    assert(Sampling.weighted(spark.range(50).selectExpr("id", "1.5D AS w"), "id", "w").count() == 50)
  }

  test("deterministic shuffle: same seed same order, different seed different order") {
    import graft.operators.Sampling
    val df = spark.range(500).toDF("id")
    val o1 = Sampling.deterministicShuffle(df, "id", "epoch1").as[Long].collect().toSeq
    val o1b = Sampling.deterministicShuffle(df.repartition(7), "id", "epoch1")
      .as[Long].collect().toSeq
    val o2 = Sampling.deterministicShuffle(df, "id", "epoch2").as[Long].collect().toSeq
    assert(o1 == o1b, "order must not depend on input partitioning")
    assert(o1 != o2, "different seeds must give different orders")
    assert(o1.sorted == (0L until 500L), "shuffle is a permutation")
  }

  test("winsorize clips to per-group quantile bounds; constant group is identity") {
    import graft.operators.Features
    val df = (1 to 100).map(i => ("g", i.toDouble))
      .++(Seq(("c", 7.0), ("c", 7.0), ("c", 7.0)))
      .toDF("k", "v")
    val out = Features.winsorize(df, Seq("k"), "v", lo = 0.10, hi = 0.90)
      .select("k", "v", "v_w").as[(String, Double, Double)].collect()
    val g = out.filter(_._1 == "g")
    // p10 of 1..100 = 10.9, p90 = 90.1 (linear interpolation)
    assert(g.forall { case (_, _, w) => w >= 10.9 && w <= 90.1 })
    assert(g.count { case (_, v, w) => v != w } == 20, "10 clipped each tail")
    assert(out.filter(_._1 == "c").forall { case (_, v, w) => v == w })
  }

  test("normalizeUrl canonicalizes scheme, host, port, path, params, fragment") {
    import graft.operators.TextOps
    val urls = Seq(
      1L -> "HTTPS://WWW.Example.COM:443//Path//?utm_source=x&b=2&a=1#frag",
      2L -> "http://example.com:80/",
      3L -> "https://example.com",
      4L -> "https://host.com/a/b/?fbclid=abc",
      5L -> "https://host.com/a//b?z=9&y=8&utm_medium=m",
      6L -> "https://example.com:8443/keep:port"
    ).toDF("id", "url")
    val out = TextOps.normalizeUrl(urls, "url")
      .select("id", "url_norm").as[(Long, String)].collect().toMap
    assert(out(1L) == "https://example.com/Path?a=1&b=2")
    assert(out(2L) == "http://example.com/")
    assert(out(3L) == "https://example.com/")
    assert(out(4L) == "https://host.com/a/b")
    assert(out(5L) == "https://host.com/a/b?y=8&z=9")
    assert(out(6L) == "https://example.com:8443/keep:port", out(6L))
  }

  test("oovRate scores tokens outside the vocabulary") {
    import graft.operators.TextOps
    val docs = Seq((1L, "a b c d"), (2L, "a a a a"), (3L, "x y z q"))
      .toDF("doc_id", "text")
    val vocab = Seq("a", "b").toDF("w")
    val out = TextOps.oovRate(docs, "text", vocab)
      .select("doc_id", "n_oov", "oov_rate").as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((2L, 0.5)))
    assert(out(2L) == ((0L, 0.0)))
    assert(out(3L) == ((4L, 1.0)))
  }
}
