package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Bloom-filter decontamination: the membership-sketch gate for benchmark
  * sets too large to broadcast exactly. The load-bearing property is
  * ONE-SIDEDNESS — a bloom filter has no false negatives — so the sketch
  * path must flag a SUPERSET of what the exact path flags, per document
  * and per gram count. (A fixed bloom seed makes runs deterministic, so
  * these are equality/inequality assertions, not probabilistic ones.)
  */
class BloomDecontamSpec extends SparkSpec {
  import spark.implicits._

  private val benchText =
    "the quick brown fox jumps over the lazy dog near the riverbank today"
  private lazy val bench = Seq((900L, benchText)).toDF("doc_id", "text")
  private lazy val corpus = Seq(
    // verbatim benchmark contamination
    (1L, s"prefix words then $benchText and a suffix tail"),
    // clean: fully disjoint vocabulary
    (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"),
    // partial overlap: shares one 5-gram window with the benchmark
    (3L, "the quick brown fox jumps through entirely different territory afterwards now"),
    // too short to produce any 5-gram
    (4L, "tiny doc")
  ).toDF("doc_id", "text")

  test("bloom path flags a SUPERSET of the exact path (no false negatives)") {
    val exact = TextOps.decontaminate(corpus, "doc_id", "text", bench, "text", n = 5)
      .select("doc_id", "n_hit_grams", "contaminated")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val bloom = TextOps.bloomDecontaminate(corpus, "doc_id", "text", bench, "text", n = 5)
      .select("doc_id", "bloom_hit_grams", "bloom_contaminated")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(exact.keySet == bloom.keySet)
    exact.foreach { case (id, (nExact, flagged)) =>
      val (nBloom, bloomFlagged) = bloom(id)
      assert(nBloom >= nExact, s"doc $id: bloom hits $nBloom < exact $nExact")
      assert(!flagged || bloomFlagged, s"doc $id: exact-contaminated but bloom missed it")
    }
    // the planted facts themselves
    assert(exact(1L)._2 && bloom(1L)._2, "verbatim contamination must be flagged")
    assert(exact(3L)._2 && bloom(3L)._2, "one shared 5-gram must be flagged")
    assert(exact(4L) == ((0L, false)) && bloom(4L) == ((0L, false)))
  }

  test("at sized bits the sketch is exact on this corpus (zero false positives)") {
    // 2^23 bits for a handful of grams: FP probability is ~0, and the
    // bloom seed is fixed, so the disjoint-vocabulary doc must pass clean
    val bloom = TextOps.bloomDecontaminate(corpus, "doc_id", "text", bench, "text", n = 5)
      .filter(col("doc_id") === 2L)
      .select("bloom_hit_grams", "bloom_contaminated")
      .as[(Long, Boolean)].head()
    assert(bloom == ((0L, false)), s"disjoint-vocab doc flagged: $bloom")
  }

  test("the probe plans the filter as ONE subquery, no corpus-vs-bench join") {
    val df = TextOps.bloomDecontaminate(corpus, "doc_id", "text", bench, "text", n = 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Subquery") || plan.contains("subquery"), plan.take(800))
    // the corpus side carries no join against benchmark grams — the only
    // joins in the plan are the final per-doc left join back onto corpus
    val joins = "(?i)sortmergejoin|broadcasthashjoin".r.findAllIn(plan).size
    assert(joins <= 1, s"expected at most the per-doc join-back, got $joins:\n${plan.take(1200)}")
  }
}
