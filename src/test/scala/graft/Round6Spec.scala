package graft

import graft.operators.{Checksum, Features, Sampling, TextOps, Vectors}
import org.apache.spark.sql.functions._

/** Round-6 hardening: SemDeDup cluster cap, fingerprint delimiter
  * safety, null-safe scaler joins, kmeans ragged-input guard, negatives
  * 1-row guard, bounded inverted-index buffers.
  */
class Round6Spec extends SparkSpec {
  import spark.implicits._

  // ---- Vectors.semanticDedup maxCluster -------------------------------

  test("semanticDedup excludes oversized clusters from the pair join (no O(n²) blowup)") {
    // a CONSTANT cluster column — the degenerate case the cap exists for
    val rows = spark.range(500).selectExpr(
      "CAST(0 AS BIGINT) AS cl", "id AS vec_id",
      "array(CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE)) AS e")
    val kept = Vectors.semanticDedup(rows, "cl", "vec_id", "e",
      tau = 0.9, maxCluster = 100)
    // the whole cluster is over the cap ⇒ bypassed un-deduped: every
    // row survives even though all 500 are identical vectors
    assert(kept.count() == 500)
    // and the physical plan's self-join input is size-filtered — the
    // quadratic branch is gated on _csz <= maxCluster
    val plan = kept.queryExecution.optimizedPlan.toString
    assert(plan.contains("_csz"), s"expected cluster-size gate in plan:\n$plan")
  }

  test("semanticDedup keeps NULL-cluster rows (null-safe size join) and dedups within them") {
    val rows = Seq(
      (Some(0L), 1L, Array(1.0, 0.0)),
      (None, 2L, Array(1.0, 0.0)), (None, 3L, Array(1.0, 0.0)), // NULL-cluster twins
      (None, 4L, Array(0.0, 1.0))
    ).toDF("cl", "vec_id", "e")
    val kept = Vectors.semanticDedup(rows, "cl", "vec_id", "e",
      tau = 0.95, maxCluster = 100)
      .select("vec_id").as[Long].collect().toSet
    // NULL cluster is a real group: its twin (id 3) drops, the rest stay
    assert(kept == Set(1L, 2L, 4L))
  }

  test("semanticDedup composes twice in one query (unique observation names)") {
    val rows = Seq((0L, 1L, Array(1.0, 0.0)), (0L, 2L, Array(0.0, 1.0)))
      .toDF("cl", "vec_id", "e")
    val once = Vectors.semanticDedup(rows, "cl", "vec_id", "e", tau = 0.95)
    val twice = Vectors.semanticDedup(once, "cl", "vec_id", "e", tau = 0.95)
    assert(twice.count() == 2) // analysis must not throw on duplicate metric names
  }

  test("semanticDedup under the cap still drops larger-id near-twins only") {
    val rows = Seq(
      (0L, 1L, Array(1.0, 0.0)), (0L, 2L, Array(1.0, 0.0)),  // twins: drop id 2
      (0L, 3L, Array(0.0, 1.0)),                              // orthogonal: keep
      (1L, 4L, Array(1.0, 0.0))                               // other cluster: keep
    ).toDF("cl", "vec_id", "e")
    val kept = Vectors.semanticDedup(rows, "cl", "vec_id", "e",
      tau = 0.95, maxCluster = 100)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L))
  }

  // ---- Checksum.fingerprint delimiter safety --------------------------

  test("fingerprint distinguishes values that differ only by separator placement") {
    // ('a|b','c') vs ('a','b|c') — identical under naive '|' joining
    val x = Seq(("a|b", "c")).toDF("a", "b")
    val y = Seq(("a", "b|c")).toDF("a", "b")
    val fx = Checksum.fingerprint(x, Seq("a", "b")).as[(Long, String)].head()
    val fy = Checksum.fingerprint(y, Seq("a", "b")).as[(Long, String)].head()
    assert(fx._2 != fy._2, "delimiter-shifted rows must fingerprint differently")
    // and the length-prefix itself can't alias either: (':a','') vs ('','a:')
    val p = Checksum.fingerprint(Seq((":a", "")).toDF("a", "b"), Seq("a", "b"))
      .as[(Long, String)].head()
    val q = Checksum.fingerprint(Seq(("", "a:")).toDF("a", "b"), Seq("a", "b"))
      .as[(Long, String)].head()
    assert(p._2 != q._2)
  }

  // ---- Features null-safe stats joins ---------------------------------

  test("standardize/robustScale/winsorize keep NULL-key groups (null-safe join)") {
    val df = Seq(
      (Some("g"), 1.0), (Some("g"), 2.0), (Some("g"), 3.0),
      (None, 10.0), (None, 20.0), (None, 30.0)
    ).toDF("k", "v")
    assert(Features.standardize(df, Seq("k"), "v").count() == 6)
    assert(Features.robustScale(df, Seq("k"), "v").count() == 6)
    assert(Features.winsorize(df, Seq("k"), "v", 0.25, 0.75).count() == 6)
    // NULL-key rows get REAL stats from their own group, not NULLs
    val z = Features.standardize(df, Seq("k"), "v")
      .filter(col("k").isNull).selectExpr("v_z").as[Double].collect()
    assert(z.forall(!_.isNaN) && math.abs(z.sum) < 1e-9)
  }

  // ---- kmeans ragged-embedding guard ----------------------------------

  test("kmeans rejects ragged embeddings loudly instead of corrupting centroids") {
    val ragged = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(1.0f, 1.0f)),
      (2L, Array(0.5f))                                     // wrong dims
    ).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Vectors.kmeans(ragged, "vec_id", "embedding", k = 2, iters = 1)
        .assignments.collect()
    }
    assert(e.getMessage.contains("ragged"), s"got: ${e.getMessage}")
  }

  // ---- Sampling.negatives 1-row guard ---------------------------------

  test("negatives fails loudly on a 1-row corpus and yields empty on empty") {
    val one = Seq(0L).toDF("id")
    val e = intercept[Exception] {
      Sampling.negatives(one, "id", k = 2, seed = "s").collect()
    }
    assert(e.getMessage.contains("non-self partner"), s"got: ${e.getMessage}")
    val empty = spark.range(0).selectExpr("id")
    assert(Sampling.negatives(empty, "id", k = 2, seed = "s").count() == 0)
  }

  // ---- Empty-input edges for the round's new operators -----------------

  test("round-6 operators handle empty inputs without surprises") {
    import graft.operators.{AsyncScore, Merge, TextOps}
    val emptyDocs = spark.range(0).selectExpr("id AS doc_id", "CAST(NULL AS STRING) AS text")
    assert(TextOps.repeatedWindows(emptyDocs, "doc_id", "text").count() == 0)
    val emptyKV = spark.range(0).selectExpr("id AS k", "CAST(NULL AS STRING) AS v")
    // diff of empty vs empty: nothing in any class
    assert(Merge.diff(emptyKV, emptyKV, Seq("k")).count() == 0)
    // diff of empty old vs real new: everything 'added'
    val n = Seq((1L, "x")).toDF("k", "v")
    assert(Merge.diff(emptyKV, n, Seq("k"))
      .select("change_kind").as[String].collect().toSeq == Seq("added"))
    // async scorer on an empty frame never spawns a pool or a batch
    assert(AsyncScore.mapBatchesAsync(
      emptyDocs.selectExpr("doc_id", "coalesce(text, '') AS text"),
      "text", "s")(ts => ts.map(_ => 1.0)).count() == 0)
    // zero-row custom source: batch and aggregate paths both empty-safe
    val zero = spark.read.format("graft-range").option("rows", "0").load()
    assert(zero.count() == 0)
    assert(zero.agg(expr("count(*)")).as[Long].head() == 0L)
    // PQ assignment of an empty corpus against a real codebook
    val vecs = Seq((0L, Array(0.0f, 0.0f)), (1L, Array(1.0f, 1.0f))).toDF("vec_id", "embedding")
    val cb = Vectors.pqTrain(vecs, "vec_id", "embedding", m = 2, k = 2, iters = 1, dims = 2)
    assert(Vectors.pqAssign(vecs.limit(0), "vec_id", "embedding", cb,
      m = 2, dims = 2).count() == 0)
  }

  // ---- Merge.diff ------------------------------------------------------

  test("Merge.diff classifies added/removed/changed/unchanged with the right payloads") {
    import graft.operators.Merge
    val oldS = Seq((1L, Some("a")), (2L, Some("b")), (3L, None: Option[String]), (4L, Some("gone")))
      .toDF("k", "v")
    val newS = Seq((1L, Some("a")), (2L, Some("B")), (3L, None: Option[String]), (5L, Some("new")))
      .toDF("k", "v")
    val d = Merge.diff(oldS, newS, Seq("k"))
      .select("k", "v", "change_kind").as[(Long, Option[String], String)]
      .collect().sortBy(_._1)
    assert(d.toSeq == Seq(
      (1L, Some("a"), "unchanged"),
      (2L, Some("B"), "changed"),       // payload from the NEW snapshot
      (3L, None, "unchanged"),          // NULL <=> NULL is unchanged
      (4L, Some("gone"), "removed"),    // payload from the OLD snapshot
      (5L, Some("new"), "added")))
  }

  // ---- Product quantization -------------------------------------------

  test("pqTrain + pqAssign: codes separate blobs per subspace, invariant to partitioning") {
    // 2 subspaces of 2 dims; blobs differ in subspace 0, agree in 1
    val vecs = Seq(
      (0L, Array(0.0f, 0.0f, 5.0f, 5.0f)), (1L, Array(0.1f, 0.0f, 5.0f, 5.1f)),
      (2L, Array(0.0f, 0.1f, 5.1f, 5.0f)),
      (3L, Array(9.0f, 9.0f, 5.0f, 5.0f)), (4L, Array(9.1f, 9.0f, 5.1f, 5.0f)),
      (5L, Array(9.0f, 9.1f, 5.0f, 5.1f))
    ).toDF("vec_id", "embedding")
    val cb = Vectors.pqTrain(vecs, "vec_id", "embedding", m = 2, k = 2,
      iters = 2, dims = 4)
    assert(cb.count() == 4) // 2 subspaces x 2 codes
    val codes = Vectors.pqAssign(vecs, "vec_id", "embedding", cb, m = 2, dims = 4)
      .selectExpr("vec_id", "pq_codes[0] AS c0", "pq_codes[1] AS c1")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // subspace 0 splits the blobs cleanly (same code within, different
    // across); subspace 1 is a single blob — k=2 still partitions it,
    // so only validity (a code from the codebook) is asserted there
    assert(codes.take(3).map(_._2).distinct.length == 1)
    assert(codes.drop(3).map(_._2).distinct.length == 1)
    assert(codes.take(3).head._2 != codes.drop(3).head._2)
    assert(codes.forall(c => c._3 == 0L || c._3 == 1L))
    // integer arithmetic ⇒ identical codes under any partitioning
    val cb7 = Vectors.pqTrain(vecs.repartition(7), "vec_id", "embedding",
      m = 2, k = 2, iters = 2, dims = 4)
    val codes7 = Vectors.pqAssign(vecs.repartition(5), "vec_id", "embedding",
        cb7, m = 2, dims = 4)
      .selectExpr("vec_id", "pq_codes[0]", "pq_codes[1]")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(codes7.toSeq == codes.toSeq)
    // reconstruction error from the TRAINED codebook beats raw seeds
    val seedCb = Vectors.pqTrain(vecs, "vec_id", "embedding", m = 2, k = 2,
      iters = 1, dims = 4)
    def err(c: org.apache.spark.sql.DataFrame) =
      Vectors.pqAssign(vecs, "vec_id", "embedding", c, m = 2, dims = 4)
        .selectExpr("aggregate(pq_dists, CAST(0 AS BIGINT), (a, v) -> a + v) AS e")
        .agg(sum("e")).as[Long].head()
    assert(err(cb) <= err(seedCb))
  }

  test("pqAdcTopK fails loudly on codes with no codebook entry (never silent rank-1)") {
    // a codebook missing subspace 1 makes pqAssign emit NULL codes
    // there; ADC must name the problem, not sort the row first
    val vecs = Seq((0L, Array(0.0f, 0.0f)), (1L, Array(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val partialCb = Vectors.pqTrain(vecs, "vec_id", "embedding",
        m = 2, k = 2, iters = 1, dims = 2)
      .filter(col("sub") === 0)
    val coded = Vectors.pqAssign(vecs, "vec_id", "embedding", partialCb,
      m = 2, dims = 2)
    val e = intercept[Exception] {
      Vectors.pqAdcTopK(coded.select("vec_id", "pq_codes"), "vec_id",
        "pq_codes", vecs, "vec_id", "embedding", partialCb,
        k = 1, m = 2, dims = 2).collect()
    }
    assert(e.getMessage.contains("no codebook entry"), s"got: ${e.getMessage}")
  }

  test("pqAssign rejects ragged embeddings loudly") {
    val cb = Vectors.pqTrain(
      Seq((0L, Array(0.0f, 0.0f)), (1L, Array(1.0f, 1.0f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", m = 2, k = 2, iters = 1, dims = 2)
    val ragged = Seq((0L, Array(0.0f, 0.0f)), (1L, Array(1.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Vectors.pqAssign(ragged, "vec_id", "embedding", cb, m = 2, dims = 2).collect()
    }
    assert(e.getMessage.contains("pqAssign"), s"got: ${e.getMessage}")
  }

  // ---- TextOps.repeatedWindows ----------------------------------------

  test("repeatedWindows finds cross-doc boilerplate with capped example ids") {
    import graft.operators.TextOps
    // 50 docs sharing one 8-token boilerplate prefix + unique tails;
    // 2 docs with a private shared span; 1 doc with no repeats
    val docsDf = spark.range(50).selectExpr(
      "id AS doc_id",
      "concat('all rights reserved by the example corpus project tail', id) AS text")
      .union(Seq(
        (100L, "a rare span only in two documents exactly x"),
        (101L, "a rare span only in two documents exactly y"),
        (200L, "completely unique words nothing here repeats at all ever")
      ).toDF("doc_id", "text"))
    val r = TextOps.repeatedWindows(docsDf, "doc_id", "text", w = 7, minDocs = 2)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getString(2)))
    // the 8-token boilerplate yields 2 windows of 7, each in all 50 docs
    val hot = r.filter(_._2 == 50L)
    assert(hot.length == 2, s"expected 2 hot windows, got: ${r.toSeq}")
    // example ids are CAPPED at 3 even though 50 docs contain the window
    hot.foreach { case (_, _, ex) => assert(ex == "[0,1,2]", ex) }
    // the 2-doc private span appears; the unique doc contributes nothing
    assert(r.exists { case (w, n, ex) =>
      n == 2L && ex == "[100,101]" && w.startsWith("a rare span") })
    assert(!r.exists(_._3.contains("200")))
    // the example path semi-joins down to REPEATED windows before TopK —
    // TopK's per-partition key map must never see the unique-window tail
    val plan = TextOps.repeatedWindows(docsDf, "doc_id", "text", w = 7, minDocs = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"no pre-TopK semi-join in plan:\n${plan.take(1200)}")
  }

  // ---- GraftRangeSource (DataSourceV2 plug-in) ------------------------

  test("graft-range source: id predicates narrow the scan and columns prune") {
    val df = spark.read.format("graft-range")
      .option("rows", "100000").option("partitions", "8").load()
      .filter(col("id") >= 500 && col("id") < 1500)
      .select("id", "sq")
    val plan = df.queryExecution.executedPlan.toString
    // pushdown reached the custom scan: the generated range itself is
    // narrowed (work pruning, not just row filtering)...
    assert(plan.contains("pushedRange=[500,1500)"), s"plan:\n$plan")
    // ...and the reader emits only the projected columns
    assert(plan.contains("columns=[id,sq]"), s"plan:\n$plan")
    val got = df.agg(count(lit(1)), sum("sq")).as[(Long, Long)].head()
    assert(got._1 == 1000L)
    assert(got._2 == (500L until 1500L).map(i => i * i).sum)
  }

  test("graft-range source: Long.MaxValue bounds don't wrap the pushed range") {
    def src = spark.read.format("graft-range").option("rows", "100").load()
    // vacuously-true predicates must not collapse the scan to empty
    assert(src.filter(col("id") <= Long.MaxValue).count() == 100L)
    assert(src.filter(col("id") >= Long.MinValue).count() == 100L)
    // impossible predicates yield empty, not garbage
    assert(src.filter(col("id") > Long.MaxValue).count() == 0L)
    assert(src.filter(col("id") === Long.MaxValue).count() == 0L)
  }

  test("graft-range source answers count/min/max in closed form at trillion-row scale") {
    // 10^12 rows: if the aggregate were NOT pushed, this test would run
    // for hours — finishing at all proves no row generation happened
    val huge = spark.read.format("graft-range")
      .option("rows", "1000000000000").load()
      .filter(col("id") >= 12345)
    val agg = huge.agg(expr("count(*) AS n"), min("id").as("mn"), max("id").as("mx"))
    assert(agg.queryExecution.executedPlan.toString.contains("pushedAggregates"),
      s"aggregate not pushed:\n${agg.queryExecution.executedPlan.toString.take(1200)}")
    val r = agg.as[(Long, Long, Long)].head()
    assert(r == ((1000000000000L - 12345L, 12345L, 999999999999L)), r)
    // empty narrowed range: count 0, min/max NULL
    val e = spark.read.format("graft-range").option("rows", "10").load()
      .filter(col("id") > 100)
      .agg(expr("count(*)"), min("id"), max("id"))
      .as[(Long, Option[Long], Option[Long])].head()
    assert(e == ((0L, None, None)), e)
  }

  test("graft-range source: slices parallelize and an empty range plans zero work") {
    val df = spark.read.format("graft-range")
      .option("rows", "1000").option("partitions", "4").load()
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 1000L)
    val empty = spark.read.format("graft-range").option("rows", "1000").load()
      .filter(col("id") >= 5000)
    assert(empty.count() == 0L)
  }

  test("negatives never returns a self-pair on a 2-row corpus (the tightest domain)") {
    val two = spark.range(2).selectExpr("id")
    val pairs = Sampling.negatives(two, "id", k = 8, seed = "s")
      .select("id", "neg_id").as[(Long, Long)].collect()
    assert(pairs.length == 16)
    assert(pairs.forall { case (i, n) => i != n })
  }

  // ---- review-pass regressions: q_psi / q_embed_drift edges ------------

  test("psi on an empty events table returns the 0.0 seed, not an index error") {
    // Spark's sequence(1, 0) is the DESCENDING [1, 0] (DuckDB's
    // range(1, 1) is empty) — without the k = 0 guard the fold hits
    // element_at(_, 0) and raises; the oracle returns psi = 0.0
    val tmp = java.nio.file.Files.createTempDirectory("psi_empty").toString
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(0)
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val row = SparkEntry.queries("q_psi")(spark, tmp).collect()
    assert(row.length == 1)
    assert(row(0).getAs[Double]("psi") == 0.0)
    assert(row(0).isNullAt(row(0).fieldIndex("n_ref")))
  }

  test("embed drift keeps a label whose vectors are all one parity") {
    // an all-even (ref-only) label has no 'cur' half: the oracle's
    // max(CASE) pivot emits it with NULL n_cur/drift — an inner join of
    // two filtered halves would silently DROP it; label 9 below exists
    // only at vec_id 4 (even)
    val tmp = java.nio.file.Files.createTempDirectory("drift_parity").toString
    Seq(
      (0L, Array(1.0f, 0.0f), 1), (1L, Array(0.0f, 1.0f), 1),
      (2L, Array(1.0f, 1.0f), 2), (3L, Array(0.5f, 0.5f), 2),
      (4L, Array(0.25f, 0.75f), 9)
    ).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val rows = SparkEntry.queries("q_embed_drift")(spark, tmp).collect()
    assert(rows.map(_.getAs[Int]("label")).toSeq == Seq(1, 2, 9))
    val lone = rows.find(_.getAs[Int]("label") == 9).get
    assert(lone.getAs[Long]("n_ref") == 1L)
    assert(lone.isNullAt(lone.fieldIndex("n_cur")))
    assert(lone.isNullAt(lone.fieldIndex("drift_x")))
    // the balanced labels still report exact integer drift
    val l1 = rows.find(_.getAs[Int]("label") == 1).get
    assert(l1.getAs[Long]("drift_x") == 2000000L)
  }

  // ---- distribution statistics (q_ks_test / q_mutual_info / q_gini) ----

  test("Graph.bfs: shortest hops from a seed set, bounded, unreachable absent") {
    import graft.operators.Graph
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (2L, 1L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val d = Graph.bfs(edges, seeds, maxHops = 6)
      .as[(Long, Long)].collect().toMap
    assert(d == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    // hop bound respected: node 4 is 3 hops out, absent at maxHops = 2
    val d2 = Graph.bfs(edges, seeds, maxHops = 2)
      .as[(Long, Long)].collect().toMap
    assert(d2 == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    // maxHops = 0: the seed set itself, nothing else
    assert(Graph.bfs(edges, seeds, maxHops = 0).count() == 1)
  }

  private def writeEvents(tmp: String, rows: Seq[(Long, Long, Double)]): Unit =
    // (event_id, user_id, value) over the real events schema
    rows.toDF("event_id", "user_id", "value")
      .selectExpr("event_id",
        "timestamp_micros(CAST(1700000000000000 + event_id * 1000000 AS BIGINT)) AS ts",
        "user_id", "'view' AS event_type", "value", "'{}' AS props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")

  test("ks_test: identical halves give D = 0, disjoint halves give D = 1") {
    val tmp = java.nio.file.Files.createTempDirectory("ks").toString
    // same values on both parities → ECDFs coincide everywhere
    writeEvents(tmp, (0L until 40L).map(i => (i, i % 2, (i % 5).toDouble)))
    val same = SparkEntry.queries("q_ks_test")(spark, tmp).collect()(0)
    assert(same.getAs[Double]("ks_d") == 0.0)
    assert(same.getAs[Long]("n_a") == 20L && same.getAs[Long]("n_b") == 20L)
    // even users all at 1.0, odd all at 2.0 → max ECDF gap is 1
    writeEvents(tmp, (0L until 40L).map(i =>
      (i, i % 2, if (i % 2 == 0) 1.0 else 2.0)))
    val far = SparkEntry.queries("q_ks_test")(spark, tmp).collect()(0)
    assert(far.getAs[Double]("ks_d") == 1.0)
  }

  private def writeDocs(tmp: String, rows: Seq[(Long, String, String, Long)]): Unit =
    rows.toDF("doc_id", "lang", "source", "n_chars")
      .selectExpr("doc_id", "repeat('x', CAST(n_chars AS INT)) AS text",
        "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

  test("mutual_info: independent mix scores 0, deterministic mapping scores NMI 1") {
    val tmp = java.nio.file.Files.createTempDirectory("mi").toString
    // 2 langs × 2 sources, all four cells equal ⇒ independence exactly
    writeDocs(tmp, (0L until 40L).map(i =>
      (i, if (i % 2 == 0) "en" else "de", if ((i / 2) % 2 == 0) "web" else "book", 10L)))
    val ind = SparkEntry.queries("q_mutual_info")(spark, tmp).collect()(0)
    assert(ind.getAs[Double]("mi") == 0.0)
    assert(ind.getAs[Double]("nmi") == 0.0)
    // lang DETERMINES source ⇒ MI = H(lang) = H(source), NMI = 1
    writeDocs(tmp, (0L until 40L).map(i =>
      (i, if (i % 2 == 0) "en" else "de", if (i % 2 == 0) "web" else "book", 10L)))
    val det = SparkEntry.queries("q_mutual_info")(spark, tmp).collect()(0)
    assert(det.getAs[Double]("nmi") == 1.0)
    assert(det.getAs[Double]("mi") == det.getAs[Double]("h_lang"))
  }

  test("gini: uniform lengths score 0, one-doc concentration scores (n-1)/n") {
    val tmp = java.nio.file.Files.createTempDirectory("gini").toString
    writeDocs(tmp,
      (0L until 4L).map(i => (i, "en", "even", 10L)) ++
      (4L until 8L).map(i => (i, "en", "spike", if (i == 7L) 10L else 0L)))
    val g = SparkEntry.queries("q_gini")(spark, tmp).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("gini")).toMap
    assert(g("even") == 0.0)
    assert(g("spike") == 0.75) // (n-1)/n with n = 4
  }

  test("rank_test: identical halves score z = 0 and AUC one-half, shifted halves AUC 1") {
    val tmp = java.nio.file.Files.createTempDirectory("mwu").toString
    writeEvents(tmp, (0L until 40L).map(i => (i, i % 2, (i % 5).toDouble)))
    val same = SparkEntry.queries("q_rank_test")(spark, tmp).collect()(0)
    assert(same.getAs[Double]("z") == 0.0)
    assert(same.getAs[Double]("auc") == 0.5)
    // u2_a at its mean: 2·U = ta·tb exactly
    assert(same.getAs[Long]("u2_a") == 400L)
    // every even-user value above every odd one → AUC = 1, 2U = 2·ta·tb
    writeEvents(tmp, (0L until 40L).map(i =>
      (i, i % 2, if (i % 2 == 0) 10.0 else 1.0)))
    val shifted = SparkEntry.queries("q_rank_test")(spark, tmp).collect()(0)
    assert(shifted.getAs[Double]("auc") == 1.0)
    assert(shifted.getAs[Long]("u2_a") == 800L)
  }

  test("source_overlap: identical vocabularies score 1, disjoint pairs are absent") {
    val tmp = java.nio.file.Files.createTempDirectory("overlap").toString
    Seq(
      (0L, "alpha beta", "en", "s1", 10L), (1L, "beta alpha", "en", "s2", 10L),
      (2L, "gamma delta", "en", "s3", 11L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = SparkEntry.queries("q_source_overlap")(spark, tmp).collect()
    // s1/s2 share the whole 2-token vocabulary; s3 overlaps neither
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("s1") == "s1" && rows(0).getAs[String]("s2") == "s2")
    assert(rows(0).getAs[Double]("jaccard") == 1.0)
  }

  test("corr_matrix: exact ±1 on linearly dependent measures") {
    val tmp = java.nio.file.Files.createTempDirectory("corrm").toString
    (1L to 20L).map(i => (i.toDouble, 2.0 * i, 21.0 - i, (i % 2).toDouble))
      .toDF("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val m = SparkEntry.queries("q_corr_matrix")(spark, tmp).collect()
      .map(r => (r.getAs[String]("var1"), r.getAs[String]("var2")) -> r.getAs[Double]("corr"))
      .toMap
    assert(m.size == 6)
    assert(m(("quantity", "price")) == 1.0)   // p = 2q exactly
    assert(m(("quantity", "discount")) == -1.0) // d = 21 - q exactly
  }

  test("robust_stats: discrete quartiles, MAD, and Tukey outlier count by hand") {
    val tmp = java.nio.file.Files.createTempDirectory("robust").toString
    writeDocs(tmp, (1L to 7L).map(i => (i, "en", "s", i)) :+ (8L, "en", "s", 100L))
    val r = SparkEntry.queries("q_robust_stats")(spark, tmp).collect()(0)
    assert(r.getAs[Long]("n") == 8L)
    assert(r.getAs[Long]("q1_c") == 2L)      // rank ceil(8/4) = 2
    assert(r.getAs[Long]("median_c") == 4L)  // rank ceil(8/2) = 4
    assert(r.getAs[Long]("q3_c") == 6L)      // rank ceil(3·8/4) = 6
    assert(r.getAs[Long]("mad_c") == 2L)     // |v-4| sorted: rank 4 → 2
    assert(r.getAs[Long]("n_outliers") == 1L) // only 100 > q3 + 1.5·IQR
  }

  test("ewma: constant series is the identity, ramp-up first row is its own value") {
    val tmp = java.nio.file.Files.createTempDirectory("ewma").toString
    writeEvents(tmp,
      (0L until 12L).map(i => (i, 7L, 42.0)) ++ Seq((100L, 8L, 9.5)))
    val rows = SparkEntry.queries("q_ts_ewma")(spark, tmp).collect()
    // constant input: num = c·Σw, den = Σw — the division is EXACT
    assert(rows.filter(_.getAs[Long]("user_id") == 7L)
      .forall(_.getAs[Double]("ewma_cents") == 4200.0))
    // a 1-row series has only the j = 0 term on both sides
    assert(rows.find(_.getAs[Long]("user_id") == 8L).get
      .getAs[Double]("ewma_cents") == 950.0)
  }

  test("boilerplate: drops high-df lines, keeps bodies in order, all-boiler doc -> ''") {
    val docs = Seq(
      (1L, "head\nbody one alpha\nbody one beta\nfoot"),
      (2L, "head\nbody two\nfoot"),
      (3L, "head\nfoot"), // nothing but boilerplate
      (4L, "head\nbody four\nfoot"),
      (5L, "head\nbody five\nfoot")
    ).toDF("doc_id", "t")
    val out = TextOps.boilerplate(docs, "doc_id", "t", minDf = 4L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_kept"), r.getAs[Long]("n_dropped"), r.getAs[String]("clean"))))
      .toMap
    assert(out(1L) == ((2L, 2L, "body one alpha\nbody one beta"))) // order kept
    assert(out(3L) == ((0L, 2L, "")))                              // fully boiler
    assert(out(2L) == ((1L, 2L, "body two")))
    // duplicated line WITHIN one doc counts that doc once toward df
    val within = Seq(
      (1L, "x\nx"), (2L, "x\ny"), (3L, "x\nz"), (4L, "a\nb")).toDF("doc_id", "t")
    val w = TextOps.boilerplate(within, "doc_id", "t", minDf = 4L).collect()
    assert(w.forall(_.getAs[Long]("n_dropped") == 0L)) // df('x') = 3 docs < 4
    intercept[IllegalArgumentException](TextOps.boilerplate(docs, "doc_id", "t", 1L))
  }

  test("tokenBudget: prefix-inclusive cap, overflow row dropped, partition-invariant") {
    val df = (1L to 30L).map(i => (i, s"s${i % 3}", 10L)).toDF("id", "src", "n")
    val kept = Sampling.tokenBudget(df, "src", "id", "n", budget = 45L)
    val byKey = kept.groupBy("src").agg(count(lit(1)).as("c"), max("cum_tokens").as("m"))
      .collect().map(r => r.getAs[String]("src") -> ((r.getAs[Long]("c"), r.getAs[Long]("m"))))
      .toMap
    // 10 tokens each: 4 rows = 40 <= 45, a 5th would be 50 — dropped
    assert(byKey.values.forall(_ == ((4L, 40L))))
    // kept set is a pure function of (id, n): repartitioning changes nothing
    val kept1 = kept.select("id").as[Long].collect().sorted.toSeq
    val kept2 = Sampling.tokenBudget(df.repartition(7), "src", "id", "n", 45L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept1 == kept2)
    // budget 0 keeps nothing; a row bigger than the whole budget is dropped
    assert(Sampling.tokenBudget(df, "src", "id", "n", 0L).count() == 0L)
    assert(Sampling.tokenBudget(df, "src", "id", "n", 9L).count() == 0L)
  }
}
