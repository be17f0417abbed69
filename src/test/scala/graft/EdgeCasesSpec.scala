package graft

import org.apache.spark.sql.functions._

import graft.operators._

/** Degenerate-input robustness: empty inputs, empty strings, zero
  * vectors, single rows. Spark SQL has sharp edges here (`sequence(1,
  * 0)` counts DOWN; `element_at(_, 0)` throws under ANSI) — each
  * operator must hit them safely, because at corpus scale every rare
  * shape exists somewhere in the data.
  */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  test("resample of an empty frame and of a single observation") {
    val empty = Seq.empty[(Long, Long, Double)].toDF("k", "tu", "v")
    assert(TimeSeries.resample(empty, Seq("k"), "tu", 100L, Seq("v")).count() == 0)
    val one = Seq((1L, 250L, 9.0)).toDF("k", "tu", "v")
    // grid start = first multiple of step >= 250 = 300 > hi=250 → empty
    // grid would lose the observation? No: sequence(300, 250, 100) is
    // empty only if start > stop — the single point grid must be empty
    // (no aligned instant falls inside the span) and must not throw
    val out = TimeSeries.resample(one, Seq("k"), "tu", 100L, Seq("v"))
    assert(out.count() == 0)
    val aligned = Seq((1L, 300L, 9.0)).toDF("k", "tu", "v")
    val out2 = TimeSeries.resample(aligned, Seq("k"), "tu", 100L, Seq("v"))
      .select("k", "tu", "asof_v").as[(Long, Long, Double)].collect().toSeq
    assert(out2 == Seq((1L, 300L, 9.0)))
  }

  test("fuzzy join with an empty side and with empty strings") {
    val l = Seq((1L, "abc"), (2L, "")).toDF("a_key", "a_name")
    val emptyR = Seq.empty[(Long, String)].toDF("b_key", "b_name")
    assert(FuzzyJoin.byEditDistance(l, emptyR, "a_key", "a_name", "b_key", "b_name", 2)
      .count() == 0)
    val r = Seq((10L, ""), (11L, "abc")).toDF("b_key", "b_name")
    val out = FuzzyJoin.byEditDistance(l, r, "a_key", "a_name", "b_key", "b_name", 2)
      .select("a_key", "b_key").as[(Long, Long)].collect().toSet
    // empty-vs-empty is distance 0 and must link (shingle of "" is [""]);
    // identical short strings always share every band. (A 1-edit pair of
    // 3-char strings has bigram Jaccard 1/3 — BELOW reliable LSH recall;
    // that miss is the documented short-string caveat, not a bug.)
    assert(out.contains((2L, 10L)), out.toString)
    assert(out.contains((1L, 11L)), out.toString)
  }

  test("repetition signals on empty and whitespace-only text") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "x")).toDF("doc_id", "text")
    val out = TextOps.repetitionSignals(df, "doc_id", "text")
      .orderBy("doc_id").selectExpr("n_tok", "top_bigram_n")
      .as[(Long, Long)].collect().toSeq
    // split of ""/whitespace yields [""] → 1 token, 0 bigrams — no throw
    assert(out == Seq((1L, 0L), (1L, 0L), (1L, 0L)), out.toString)
  }

  test("stratified sampling honors rate 0 and rate 1 exactly") {
    val rows = spark.range(100)
      .selectExpr("id AS doc_id", "IF(id % 2 = 0, 'keep', 'drop') AS st")
    val kept = Sampling.stratified(rows, "st", "doc_id",
        Map("keep" -> 1.0, "drop" -> 0.0))
      .select("st").as[String].collect()
    assert(kept.length == 50 && kept.forall(_ == "keep"))
  }

  test("interval overlap join with a zero-length interval on both sides") {
    val l = Seq((1L, 5L, 5L)).toDF("lid", "ls", "le")
    val r = Seq((2L, 5L, 5L), (3L, 6L, 6L)).toDF("rid", "rs", "re")
    val out = RangeJoin.overlaps(l, r, "ls", "le", "rs", "re", 4.0)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L)), out.toString)
  }

  test("int8 quantization of the zero vector and the empty vector") {
    val df = Seq(
      (1L, Array(0f, 0f, 0f)),
      (2L, Array.empty[Float]),
      (3L, Array(-1f, 2f))
    ).toDF("vec_id", "embedding")
    val out = Vectors.quantizeInt8(df, "embedding")
      .orderBy("vec_id").selectExpr("q8").as[Seq[Int]].collect().toSeq
    assert(out(0) == Seq(0, 0, 0))   // zero scale → all-zero codes, no divide
    assert(out(1) == Seq.empty[Int]) // empty stays empty (array_max → null scale)
    assert(out(2) == Seq(-63, 127))  // floor(-63.5 + 0.5) = -63; floor(127.5) = 127
  }

  test("standardize on an empty frame and a 1-row group") {
    val empty = Seq.empty[(String, Double)].toDF("g", "x")
    assert(Features.standardize(empty, Seq("g"), "x").count() == 0)
    val one = Seq(("a", 5.0)).toDF("g", "x")
    val out = Features.standardize(one, Seq("g"), "x")
      .selectExpr("x_z", "x_mm").as[(Double, Double)].collect().head
    // stddev_samp of 1 row is NULL → defined 0; min=max → 0
    assert(out == ((0.0, 0.0)), out.toString)
  }

  test("winsorize on a 1-row group is identity") {
    val one = Seq(("a", 5.0)).toDF("g", "x")
    val out = Features.winsorize(one, Seq("g"), "x")
      .selectExpr("x_w").as[Double].collect().head
    assert(out == 5.0)
  }

  test("normalizeUrl yields NULL for non-URL input, not a garbage form") {
    val rows = Seq((1L, "not a url"), (2L, ""), (3L, "ftp://ok.example/x"))
      .toDF("id", "url")
    val out = TextOps.normalizeUrl(rows, "url")
      .select("id", "url_norm").as[(Long, Option[String])].collect().toMap
    assert(out(1L).isEmpty && out(2L).isEmpty)
    assert(out(3L).contains("ftp://ok.example/x"))
  }

  test("decontaminate against an empty or too-short benchmark flags nothing") {
    val corpus = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val emptyBench = Seq.empty[(Long, String)].toDF("id", "btext")
    val out = TextOps.decontaminate(corpus, "doc_id", "text",
        emptyBench, "btext", n = 5)
      .select("contaminated").as[Boolean].collect()
    assert(out.toSeq == Seq(false))
    val shortBench = Seq((1L, "alpha beta")).toDF("id", "btext") // < n tokens
    val out2 = TextOps.decontaminate(corpus, "doc_id", "text",
        shortBench, "btext", n = 5)
      .select("contaminated").as[Boolean].collect()
    assert(out2.toSeq == Seq(false))
  }

  test("containmentPairs on empty and single-doc corpora") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.containmentPairs(empty, "doc_id", "text").count() == 0)
    val one = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    assert(Dedup.containmentPairs(one, "doc_id", "text").count() == 0)
  }
}
