package graft

import org.apache.spark.sql.functions._

/** The native integer-vector kernels (IntVec.scala) must be BIT-EQUAL to
  * the higher-order-function formulations they replaced — the HOF text is
  * what the DuckDB oracles replicate, so any divergence would silently
  * break cross-engine determinism. Each test evaluates both forms over
  * real embeddings rows and asserts zero differing rows.
  */
class IntVecSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def emb = graft.sources.Tables(spark, dir, "embeddings")
  private val quant = graft.operators.Vectors.microQuantExpr(
    "embedding", 64, 1000000L, 1000000L, "intvec_spec")

  test("graft_sqdist == aggregate(zip_with(...)) fold, all rows") {
    val q = emb.selectExpr("vec_id", s"$quant AS qe")
    val pairs = q.selectExpr("vec_id AS a_id", "qe AS qa")
      .crossJoin(broadcast(q.orderBy("vec_id").limit(5).selectExpr("qe AS qb")))
    val n = pairs.selectExpr(
        "graft_sqdist(qa, qb) AS nat",
        "aggregate(zip_with(qa, qb, (x, y) -> (x - y) * (x - y)), " +
          "CAST(0 AS BIGINT), (acc, v) -> acc + v) AS hof")
      .filter("nat != hof").count()
    assert(n == 0)
  }

  test("graft_cell == array_min(transform(...)).cid argmin, all rows") {
    val seeds = emb.orderBy("vec_id").limit(7)
      .selectExpr("vec_id AS cid", s"$quant AS ce")
    val seedRow = seeds.groupBy().agg(
      sort_array(collect_list(struct(col("cid"), col("ce")))).as("_seeds"))
    val fdist = "aggregate(zip_with(_qe, s.ce, (x, y) -> (x - y) * (x - y)), " +
      "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    val n = emb.crossJoin(broadcast(seedRow))
      .selectExpr("vec_id", s"$quant AS _qe", "_seeds")
      .selectExpr(
        "graft_cell(_qe, _seeds) AS nat",
        s"array_min(transform(_seeds, s -> named_struct('d', $fdist, 'cid', s.cid))).cid AS hof")
      .filter("nat != hof").count()
    assert(n == 0)
  }

  test("graft_pq_encode == transform/filter/array_min HOF, all rows, codes AND dists") {
    import graft.operators.Vectors
    val seeds = emb.orderBy("vec_id").limit(4).selectExpr("vec_id", s"$quant AS qe")
    val codebook = seeds.selectExpr("CAST(0 AS INT) AS sub", "vec_id AS cid",
        "slice(qe, 1, 32) AS ce")
      .unionAll(seeds.selectExpr("CAST(1 AS INT) AS sub", "vec_id AS cid",
        "slice(qe, 33, 32) AS ce"))
    val cb = codebook.groupBy().agg(
      sort_array(collect_list(struct(col("sub"), col("cid"), col("ce")))).as("_cb"))
    val sd = 32
    val dist =
      s"aggregate(zip_with(slice(_qe, s * $sd + 1, $sd), c.ce, " +
        "(x, y) -> (x - y) * (x - y)), CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    val hof = s"transform(sequence(0, 1), s -> " +
      s"array_min(transform(filter(_cb, c -> c.sub = s), " +
      s"c -> named_struct('d', $dist, 'cid', c.cid))))"
    val n = emb.crossJoin(broadcast(cb))
      .selectExpr("vec_id", s"$quant AS _qe", "_cb")
      .selectExpr(
        "graft_pq_encode(_qe, _cb) AS nat",
        s"$hof AS hof")
      .filter("transform(nat, x -> x.cid) != transform(hof, x -> x.cid) OR " +
        "transform(nat, x -> x.d) != transform(hof, x -> x.d)")
      .count()
    assert(n == 0)
  }

  test("graft_adc == the double-filter aggregate HOF, all (code, lut) rows") {
    import graft.operators.Vectors
    val seeds = emb.orderBy("vec_id").limit(4).selectExpr("vec_id", s"$quant AS qe")
    val codebook = seeds.selectExpr("CAST(0 AS INT) AS sub", "vec_id AS cid",
        "slice(qe, 1, 32) AS ce")
      .unionAll(seeds.selectExpr("CAST(1 AS INT) AS sub", "vec_id AS cid",
        "slice(qe, 33, 32) AS ce"))
    val corpus = Vectors.pqAssign(
      emb.filter(col("vec_id") >= 5).select("vec_id", "embedding"),
      "vec_id", "embedding", codebook, m = 2, dims = 64)
    val qlut = Vectors.pqLut(
      emb.filter(col("vec_id") < 5).select("vec_id", "embedding"),
      "vec_id", "embedding", codebook, m = 2, dims = 64,
      scale = 1000000L, offset = 1000000L, op = "intvec_spec")
    def oldHit(s: String) =
      s"filter(_lut, t -> t.sub = $s AND t.cid = element_at(pq_codes, $s + 1))"
    val oldAdc = s"aggregate(sequence(0, 1), CAST(0 AS BIGINT), (acc, s) -> " +
      s"acc + IF(size(${oldHit("s")}) = 1, element_at(${oldHit("s")}, 1).d, " +
      s"raise_error('missing')))"
    val n = corpus.select("vec_id", "pq_codes")
      .crossJoin(broadcast(qlut))
      .selectExpr("graft_adc(pq_codes, _lut) AS nat", s"$oldAdc AS hof")
      .filter("nat != hof").count()
    assert(n == 0)
  }

  test("ragged/malformed inputs raise loudly, never NULL") {
    import spark.implicits._
    val bad = Seq((Seq(1L, 2L), Seq(1L, 2L, 3L))).toDF("a", "b")
    val e = intercept[Exception](bad.selectExpr("graft_sqdist(a, b)").collect())
    assert(e.getMessage.contains("length mismatch")
      || e.getCause != null && e.getCause.getMessage.contains("length mismatch"))
    val oddLen = Seq((Seq(1L, 2L, 3L), Seq((0, 5L, Seq(9L, 8L))))).toDF("qe", "cb")
      .selectExpr("qe", "transform(cb, c -> named_struct(" +
        "'sub', CAST(c._1 AS INT), 'cid', c._2, 'ce', c._3)) AS cb")
    val e2 = intercept[Exception](
      oddLen.selectExpr("graft_pq_encode(qe, cb)").collect())
    assert(e2.getMessage.contains("multiple of subdim")
      || e2.getCause != null && e2.getCause.getMessage.contains("multiple of subdim"))
  }

  test("graft_adc raises on a NULL LUT distance instead of summing 0") {
    import spark.implicits._
    // a ragged LUT build (m/dims mismatch) pads distances with NULL;
    // getLong on the null slot would unbox to 0 and win rank 1 silently
    val df = Seq((Seq(5L), Seq((0, 5L)))).toDF("codes", "lut")
      .selectExpr("codes", "transform(lut, t -> named_struct(" +
        "'sub', CAST(t._1 AS INT), 'cid', t._2, 'd', CAST(NULL AS BIGINT))) AS lut")
    val e = intercept[Exception](df.selectExpr("graft_adc(codes, lut)").collect())
    assert(e.getMessage.contains("NULL LUT distance")
      || e.getCause != null && e.getCause.getMessage.contains("NULL LUT distance"))
  }

  test("pqAssign raises when the caller's m disagrees with the codebook geometry") {
    import graft.operators.Vectors
    val seeds = emb.orderBy("vec_id").limit(4).selectExpr("vec_id", s"$quant AS qe")
    // codebook trained at m=2 (sd=32); caller claims m=4
    val codebook = seeds.selectExpr("CAST(0 AS INT) AS sub", "vec_id AS cid",
        "slice(qe, 1, 32) AS ce")
      .unionAll(seeds.selectExpr("CAST(1 AS INT) AS sub", "vec_id AS cid",
        "slice(qe, 33, 32) AS ce"))
    val e = intercept[Exception](
      Vectors.pqAssign(emb.select("vec_id", "embedding"), "vec_id", "embedding",
        codebook, m = 4, dims = 64).select("pq_codes").collect())
    assert(e.getMessage.contains("codebook implies 2 subspaces, caller passed 4")
      || e.getCause != null &&
        e.getCause.getMessage.contains("codebook implies 2 subspaces, caller passed 4"))
  }

  test("probe/LUT paths raise on a query-vs-index dims mismatch, never NULL-rank") {
    import spark.implicits._
    import graft.operators.Vectors
    // index geometry: 4 dims, 2 cells, m=2 codebook
    val corpus = Seq((0L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 1.0f, 1.0f, 1.0f))).toDF("vec_id", "embedding")
    val km = Vectors.kmeans(corpus, "vec_id", "embedding", k = 2, iters = 1)
    val cb = Vectors.pqTrain(corpus, "vec_id", "embedding", m = 2, k = 2,
      iters = 1, dims = 4)
    val idx = java.nio.file.Files.createTempDirectory("ivfpq_ragged").toString + "/idx"
    Vectors.buildIvfPqIndex(corpus, "vec_id", "embedding",
      km.centroids.select("cid", "ce"), cb, idx, m = 2, dims = 4)
    // 2-dim queries searched with dims=2 against the 4-dim index: the
    // micro-quant guard passes (queries really are 2-dim), so the loud
    // failure must come from the centroid distance kernel
    val q2 = Seq((0L, Array(0.0f, 0.0f))).toDF("qid", "embedding")
    val e = intercept[Exception](
      Vectors.searchIvfPqIndex(spark, idx, q2, "qid", "embedding",
        k = 1, nprobe = 1, m = 2, dims = 2).collect())
    assert(e.getMessage.contains("length mismatch")
      || e.getCause != null && e.getCause.getMessage.contains("length mismatch"))
  }

  test("typed inputs: INT arrays implicitly widen; non-numeric fails analysis") {
    val r = spark.sql("SELECT graft_sqdist(array(1, 2), array(3, 5)) AS d")
      .collect()(0).getLong(0)
    assert(r == 13L) // 2² + 3² — previously misread unsafe INT slots as LONG
    intercept[Exception](
      spark.sql("SELECT graft_sqdist(array('a'), array('b'))").collect())
    intercept[Exception]( // seeds argument must be the (cid, ce) struct array
      spark.sql("SELECT graft_cell(array(1L), array(1L))").collect())
  }

  test("legacy parity: a subspace missing from the codebook yields a NULL code") {
    import spark.implicits._
    // sd=1, qe has 2 dims -> m=2, but only sub 0 has entries: the HOF
    // array_min(empty) semantics were NULL, kept so ADC (not encode)
    // is the loud failure point
    val df = Seq((Seq(1L, 2L), Seq((0, 5L, Seq(9L))))).toDF("qe", "cb")
      .selectExpr("qe", "transform(cb, c -> named_struct(" +
        "'sub', CAST(c._1 AS INT), 'cid', c._2, 'ce', c._3)) AS cb")
      .selectExpr("transform(graft_pq_encode(qe, cb), x -> x.cid) AS codes")
    val codes = df.as[Seq[Option[Long]]].head()
    assert(codes == Seq(Some(5L), None))
  }
}
