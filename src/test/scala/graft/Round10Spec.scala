package graft

import graft.operators.{Caches, Sampling, TextOps}
import org.apache.spark.sql.functions._

/** Round-10 regressions: the advisor findings (weighted-reservoir key
  * precision at large weight scales, bloom sizing floor, temp-view
  * lifetime, resetTable identifier guard) pinned as tests.
  */
class Round10Spec extends SparkSpec {
  import spark.implicits._

  test("weightedReservoir: selection is invariant to the weight SCALE") {
    // under the old absolute micro-nat quantization every key rounded to
    // 0 for weights ~1e6+, silently degrading selection to smallest-ids-
    // first. Equal weights = uniform sampling, so the selected set must
    // be IDENTICAL whether the common weight is 1.0 or 1e9.
    val ids = (0L until 1000L)
    def sel(w: Double): Set[Long] =
      Sampling.weightedReservoir(
          ids.map(i => (i, "s", w)).toDF("id", "st", "w"),
          "st", "id", "w", k = 10)
        .select("id").as[Long].collect().toSet
    val atOne = sel(1.0)
    assert(atOne.size == 10)
    assert(sel(1e9) == atOne,
      "large weights must not collapse the rank key to the id tiebreak")
    // and NOT the degenerate smallest-ids-first outcome
    assert(atOne != ids.take(10).toSet,
      "selection degenerated to smallest-ids-first")
  }

  test("weightedReservoir: heavy weights still dominate at the 1e6+ scale") {
    // same shape as the Round9 ratio test but with the whole weight
    // column pushed up to the n_chars-of-a-huge-doc scale the advisor
    // flagged: 10 ids at 1e10 vs 990 at 1e6 (ratio 1e4)
    val rows = (0L until 1000L).map(i =>
      (i, "s", if (i < 10) 1e10 else 1e6)).toDF("id", "st", "w")
    val got = Sampling.weightedReservoir(rows, "st", "id", "w", k = 10)
      .select("id").as[Long].collect().toSet
    assert(got.size == 10)
    assert(got.count(_ < 10L) >= 8, s"heavy ids underrepresented: $got")
  }

  test("bloomDecontaminate: refuses starvation sizing (< 8 bits/item)") {
    val corpus = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val bench = Seq((9L, "x y z w v u")).toDF("bid", "text")
    val e = intercept[IllegalArgumentException] {
      TextOps.bloomDecontaminate(corpus, "doc_id", "text", bench, "text",
        n = 5, estimatedItems = 4000000L, numBits = 1L << 23)
    }
    assert(e.getMessage.contains("bits per"), e.getMessage)
  }

  test("bloomDecontaminate: temp views are released with the caches") {
    def bloomViews: Seq[String] =
      spark.catalog.listTables().collect().map(_.name)
        .filter(_.startsWith("graft_bloom_bench_")).toSeq
    Caches.unpersistAll() // start clean
    val before = bloomViews.size
    val corpus = Seq((1L, "a b c d e f g"), (2L, "h i j k l m n"))
      .toDF("doc_id", "text")
    val bench = Seq((9L, "a b c d e f g")).toDF("bid", "text")
    val out = TextOps.bloomDecontaminate(corpus, "doc_id", "text",
      bench, "text", n = 5)
    assert(bloomViews.size == before + 1, "view should exist until released")
    assert(out.count() == 2) // materialize before release (the contract)
    Caches.unpersistAll()
    assert(bloomViews.size == before,
      "unpersistAll must drop operator-internal temp views")
    // scoped: view created inside the scope is gone at exit
    Caches.scoped {
      val r = TextOps.bloomDecontaminate(corpus, "doc_id", "text",
        bench, "text", n = 5)
      assert(r.count() == 2)
      assert(bloomViews.size == before + 1)
    }
    assert(bloomViews.size == before,
      "scoped exit must drop views created inside the scope")
  }

  test("resetTable: rejects qualified and path-like names") {
    for (bad <- Seq("db.tbl", "../escape", "a/b", "a-b", "", "a b"))
      intercept[IllegalArgumentException] {
        graft.sources.Warehouse.resetTable(spark, bad)
      }
    // a simple identifier still works (idempotent on a missing table)
    graft.sources.Warehouse.resetTable(spark, "graft_r10_reset_ok")
  }
}
