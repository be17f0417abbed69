package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Similarity search over the `embeddings` table (64-dim FLOAT[]): cosine
  * near-duplicate detection, brute-force ANN, LSH-bucketed ANN
  * (random-hyperplane), and IVF-style coarse quantization.
  *
  * Cross-engine float policy: every dot product is a LEFT FOLD in index
  * order on both engines (Spark `aggregate`, DuckDB `list_reduce`) over
  * float-widened-to-double inputs, so the resulting doubles are
  * bit-identical; `round(..., 6)` on top makes the oracle robust.
  * Hyperplane signs come from the shared md5-based hash, so LSH buckets
  * match exactly.
  *
  * Scale notes (100 TB):
  *  - Brute-force ANN broadcasts the (tiny) query set; the corpus is never
  *    shuffled — `TopK.perKey` runs a narrow per-partition partial top-k
  *    (sortWithinPartitions + first-k-per-key, no exchange), then merges
  *    the ≤ partitions×Q×k survivors. No qid-partitioned shuffle of the
  *    scored corpus anywhere.
  *  - LSH: bucket id is computed map-side; the join key is (bucket), so
  *    candidate generation shuffles O(corpus) small rows, never O(n^2).
  *  - IVF: the centroid table is tiny (one row per cell) and broadcast;
  *    cell-restricted search prunes the corpus scan by the cell predicate.
  */
object VectorQueries {

  /** Spark-side dot product: native codegen'd left fold (functions/vector/
    * DotProduct) — bit-identical to the aggregate(zip_with(...)) fold the
    * oracle mirrors, minus the interpreted lambdas.
    */
  private def dotS(a: String, b: String) = s"graft_dot($a, $b)"
  /** DuckDB-side identical left fold. */
  private[queries] def dotD(a: String, b: String) =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, len($a) + 1), i -> ($a)[i] * ($b)[i])), (x, y) -> x + y)"

  private def cosS(a: String, b: String) =
    s"round(${dotS(a, b)} / (sqrt(${dotS(a, a)}) * sqrt(${dotS(b, b)})), 6)"
  private[queries] def cosD(a: String, b: String) =
    s"round(${dotD(a, b)} / (sqrt(${dotD(a, a)}) * sqrt(${dotD(b, b)})), 6)"

  /** Hyperplane sign vectors, precomputed from the SAME md5 derivation the
    * oracle would use (bit 0 of the 60-bit md5 hash of "p:<plane>:<dim>")
    * and inlined as array literals on BOTH engines — the md5 runs once per
    * plan, not once per row per dimension.
    */
  def planeSigns(p: Int, dims: Int = 64): Seq[Double] =
    (1 to dims).map { d =>
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(s"p:$p:$d".getBytes("UTF-8"))
      val hex = digest.map(b => f"$b%02x").mkString.take(15)
      if ((java.lang.Long.parseLong(hex, 16) & 1L) == 1L) 1.0 else -1.0
    }
  private def planeArrS(p: Int) =
    planeSigns(p).map(v => s"${v}D").mkString("array(", ", ", ")")
  private def planeArrD(p: Int) =
    planeSigns(p).mkString("[", ", ", "]::DOUBLE[]")
  private def planeS(p: Int) =
    s"aggregate(zip_with(e, ${planeArrS(p)}, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
  private def planeD(p: Int) =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), d -> e[d] * (${planeArrD(p)})[d])), (x, y) -> x + y)"

  private def vecsS(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS e", "label")

  private[queries] val vecsD =
    "SELECT vec_id, embedding::DOUBLE[] AS e, label FROM embeddings"

  val all: Seq[QueryDef] = Seq(

    // ---- Embedding-cosine near-dup: all pairs in a window ---------------
    QueryDef("q_dedup_cosine",
      s"""WITH v AS ($vecsD)
         |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |  ${cosD("a.e", "b.e")} AS cs,
         |  ${cosD("a.e", "b.e")} >= 0.8 AS is_dup
         |FROM v a JOIN v b ON a.vec_id < b.vec_id AND b.vec_id < 30
         |ORDER BY a_id, b_id""".stripMargin) {
      (s, dir) =>
        val v = vecsS(s, dir)
        v.as("a").join(v.as("b").filter(col("vec_id") < 30),
            expr("a.vec_id < b.vec_id"))
          .selectExpr("a.vec_id AS a_id", "b.vec_id AS b_id",
            s"${cosS("a.e", "b.e")} AS cs",
            s"${cosS("a.e", "b.e")} >= 0.8D AS is_dup")
          .orderBy("a_id", "b_id")
    },

    // ---- ANN: brute-force cosine top-k ----------------------------------
    QueryDef("q_ann_brute",
      s"""WITH v AS ($vecsD),
         |q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 5),
         |c AS (SELECT vec_id, e FROM v WHERE vec_id >= 5),
         |scored AS (
         |  SELECT qid, vec_id, ${cosD("qe", "e")} AS cs FROM q, c
         |), ranked AS (
         |  SELECT qid, vec_id, cs,
         |    row_number() OVER (PARTITION BY qid ORDER BY cs DESC, vec_id) AS rnk
         |  FROM scored
         |)
         |SELECT qid, CAST(rnk AS BIGINT) AS rnk, vec_id, cs
         |FROM ranked WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin) {
      (s, dir) =>
        // norms precomputed per vector (FP-identical to inline sqrt(dot)):
        // the pair loop then does ONE dot product instead of three.
        // The top-k merge is TopK.perKey (partial per-partition top-k then
        // a tiny per-qid merge) — NOT a row_number window over qid, which
        // would shuffle every scored row into |Q| reducer partitions.
        val v = vecsS(s, dir)
        val q = v.filter(col("vec_id") < 5)
          .selectExpr("vec_id AS qid", "e AS qe", s"sqrt(${dotS("e", "e")}) AS qn")
        val c = v.filter(col("vec_id") >= 5)
          .selectExpr("vec_id", "e", s"sqrt(${dotS("e", "e")}) AS cn")
        val scored = c.join(broadcast(q))
          .selectExpr("qid", "vec_id", s"round(${dotS("qe", "e")} / (qn * cn), 6) AS cs")
        graft.operators.TopK.perKey(scored, Seq("qid"),
            Seq(col("cs").desc, col("vec_id").asc), 3)
          .selectExpr("qid", "CAST(rnk AS BIGINT) AS rnk", "vec_id", "cs")
          .orderBy("qid", "rnk")
    },

    // ---- ANN: random-hyperplane LSH buckets + in-bucket search ----------
    QueryDef("q_ann_lsh", {
      val bucketD = (0 until 4).map(p =>
        s"(CASE WHEN ${planeD(p)} >= 0 THEN ${1 << p} ELSE 0 END)").mkString(" + ")
      s"""WITH v AS ($vecsD),
         |hashed AS (SELECT vec_id, e, CAST($bucketD AS BIGINT) AS bucket FROM v),
         |q AS (SELECT vec_id AS qid, e AS qe, bucket FROM hashed WHERE vec_id < 3),
         |c AS (SELECT vec_id, e, bucket FROM hashed WHERE vec_id >= 5),
         |scored AS (
         |  SELECT qid, c.vec_id, ${cosD("qe", "c.e")} AS cs
         |  FROM q JOIN c ON q.bucket = c.bucket
         |), ranked AS (
         |  SELECT qid, vec_id, cs,
         |    row_number() OVER (PARTITION BY qid ORDER BY cs DESC, vec_id) AS rnk
         |  FROM scored
         |)
         |SELECT qid, CAST(rnk AS BIGINT) AS rnk, vec_id, cs
         |FROM ranked WHERE rnk <= 2 ORDER BY qid, rnk""".stripMargin
    }) { (s, dir) =>
      // One spark.sql text mirroring the oracle: DataFrame-side composition
      // of nested-lambda columns across a self-join trips Spark 4's
      // attribute dedup (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND); SQL CTE
      // references re-expand with fresh attributes and plan cleanly.
      val bucketS = (0 until 4).map(p =>
        s"(CASE WHEN ${planeS(p)} >= 0D THEN ${1 << p} ELSE 0 END)").mkString(" + ")
      Tables(s, dir, "embeddings").createOrReplaceTempView("embeddings")
      // SQL text up to the candidate scores (CTE re-expansion — see note
      // above); the top-k merge is the scale-safe TopK.perKey, not a
      // qid-partitioned window
      val scored = s.sql(
        s"""WITH v AS (SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
           |hashed AS (SELECT vec_id, e, CAST($bucketS AS BIGINT) AS bucket FROM v),
           |q AS (SELECT vec_id AS qid, e AS qe, bucket FROM hashed WHERE vec_id < 3),
           |c AS (SELECT vec_id, e, bucket FROM hashed WHERE vec_id >= 5)
           |SELECT /*+ BROADCAST(q) */ qid, c.vec_id, ${cosS("qe", "c.e")} AS cs
           |FROM q JOIN c ON q.bucket = c.bucket""".stripMargin)
      graft.operators.TopK.perKey(scored, Seq("qid"),
          Seq(col("cs").desc, col("vec_id").asc), 2)
        .selectExpr("qid", "CAST(rnk AS BIGINT) AS rnk", "vec_id", "cs")
        .orderBy("qid", "rnk")
    },

    // ---- ANN: IVF coarse quantization with true nearest-centroid
    // assignment: centroids seeded from labels, every corpus vector
    // assigned to its nearest centroid, query probes its best cell only.
    QueryDef("q_ann_ivf",
      s"""WITH v AS ($vecsD),
         |c AS (SELECT vec_id, e, label FROM v WHERE vec_id >= 5),
         |flat AS (
         |  SELECT label, generate_subscripts(e, 1) AS d, unnest(e) AS x FROM c
         |), cent AS (
         |  SELECT label AS clabel, list(round(av, 6) ORDER BY d) AS ce
         |  FROM (SELECT label, d, avg(x) AS av FROM flat GROUP BY label, d)
         |  GROUP BY label
         |), assign AS (
         |  SELECT vec_id, e, clabel,
         |    row_number() OVER (PARTITION BY vec_id
         |      ORDER BY ${cosD("e", "ce")} DESC, clabel) AS arnk
         |  FROM c, cent
         |), cells AS (SELECT vec_id, e, clabel AS cell FROM assign WHERE arnk = 1),
         |q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 5),
         |probe AS (
         |  SELECT qid, qe, clabel,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY ${cosD("qe", "ce")} DESC, clabel) AS prnk
         |  FROM q, cent
         |), best AS (SELECT qid, qe, clabel AS cell FROM probe WHERE prnk = 1),
         |scored AS (
         |  SELECT b.qid, k.vec_id, ${cosD("b.qe", "k.e")} AS cs
         |  FROM best b JOIN cells k ON k.cell = b.cell
         |), ranked AS (
         |  SELECT qid, vec_id, cs, row_number() OVER (
         |    PARTITION BY qid ORDER BY cs DESC, vec_id) AS rnk FROM scored
         |)
         |SELECT qid, CAST(rnk AS BIGINT) AS rnk, vec_id, cs
         |FROM ranked WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin) {
      (s, dir) =>
        // one spark.sql text per stage (CTE re-expansion — see q_ann_lsh
        // note). The centroid table is computed ONCE and persisted — a CTE
        // would be inlined and the posexplode+two-level aggregate would run
        // twice (corpus assignment AND query probe); at scale this is the
        // "train coarse quantizer once, broadcast it" shape. The final
        // merge is TopK.perKey.
        Tables(s, dir, "embeddings").createOrReplaceTempView("embeddings")
        val centn = s.sql(
          s"""WITH v AS (SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS e, label FROM embeddings),
             |c AS (SELECT vec_id, e, label FROM v WHERE vec_id >= 5),
             |flat AS (
             |  SELECT label, d, x FROM c LATERAL VIEW posexplode(e) t AS d, x
             |), cent AS (
             |  SELECT label AS clabel,
             |    transform(array_sort(collect_list(struct(d, av))), p -> round(p.av, 6)) AS ce
             |  FROM (SELECT label, d, avg(x) AS av FROM flat GROUP BY label, d)
             |  GROUP BY label
             |)
             |SELECT clabel, ce, sqrt(${dotS("ce", "ce")}) AS cnrm FROM cent""".stripMargin)
        // deliberately not unpersisted: one tiny row per label, LRU-evicted
        centn.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        centn.createOrReplaceTempView("graft_ivf_centn")
        val scored = s.sql(
          s"""WITH v AS (SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS e, label FROM embeddings),
             |c AS (SELECT vec_id, e, label FROM v WHERE vec_id >= 5),
             |cn AS (SELECT vec_id, e, sqrt(${dotS("e", "e")}) AS nrm, clabel0 FROM (SELECT vec_id, e, label AS clabel0 FROM c)),
             |centn AS (SELECT /*+ BROADCAST */ clabel, ce, cnrm FROM graft_ivf_centn),
             |assign AS (
             |  SELECT vec_id, e, nrm, clabel,
             |    row_number() OVER (PARTITION BY vec_id
             |      ORDER BY round(${dotS("e", "ce")} / (nrm * cnrm), 6) DESC, clabel) AS arnk
             |  FROM cn, centn
             |), cells AS (SELECT vec_id, e, nrm, clabel AS cell FROM assign WHERE arnk = 1),
             |q AS (SELECT vec_id AS qid, e AS qe, sqrt(${dotS("e", "e")}) AS qn FROM v WHERE vec_id < 5),
             |probe AS (
             |  SELECT qid, qe, qn, clabel,
             |    row_number() OVER (PARTITION BY qid
             |      ORDER BY round(${dotS("qe", "ce")} / (qn * cnrm), 6) DESC, clabel) AS prnk
             |  FROM q, centn
             |), best AS (SELECT qid, qe, qn, clabel AS cell FROM probe WHERE prnk = 1)
             |SELECT /*+ BROADCAST(b) */ b.qid, k.vec_id, round(${dotS("b.qe", "k.e")} / (b.qn * k.nrm), 6) AS cs
             |FROM best b JOIN cells k ON k.cell = b.cell""".stripMargin)
        graft.operators.TopK.perKey(scored, Seq("qid"),
            Seq(col("cs").desc, col("vec_id").asc), 3)
          .selectExpr("qid", "CAST(rnk AS BIGINT) AS rnk", "vec_id", "cs")
          .orderBy("qid", "rnk")
    },

    // ---- Per-label centroids (operator Vectors.centroids) ---------------
    // the distributed work — an element-wise aggregate over n×dim values
    // — is verified through the EXACT scaled-int64 sums (associative, so
    // independent of partial-agg order on both engines); the division by
    // (scale × n) is scalar arithmetic the oracle leaves out because a
    // mean landing exactly on a decimal rounding boundary (integer sum /
    // small n does that often) rounds differently per engine
    QueryDef("q_embed_centroid",
      """WITH t AS (
        |  SELECT label, i,
        |    CAST(round(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1000000) AS BIGINT) AS sv
        |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
        |), c AS (
        |  SELECT label, i, CAST(count(*) AS BIGINT) AS n, sum(sv) AS ssum
        |  FROM t GROUP BY 1, 2
        |)
        |SELECT label, max(n) AS n_vecs,
        |  string_agg(CAST(ssum AS VARCHAR), ',' ORDER BY i) AS centroid_micro
        |FROM c GROUP BY label ORDER BY label""".stripMargin) {
      (s, dir) =>
        graft.operators.Vectors.centroidSums(
            Tables(s, dir, "embeddings"), "label", "embedding")
          .selectExpr("label", "CAST(n_vecs AS BIGINT) AS n_vecs",
            "concat_ws(',', transform(sums, v -> CAST(v AS STRING))) AS centroid_micro")
          .orderBy("label")
    },

    // ---- Embedding drift monitor (single-pass snapshot pivot) -----------
    // the ML-ops check a refreshed corpus needs: per label, how far did
    // the centroid move between two snapshots (here the deterministic
    // even/odd vec_id halves)? The drift is EXACT integer arithmetic:
    // per-dimension cross-multiplied mean difference |s_ref·n_cur −
    // s_cur·n_ref| over micro-unit sums — no division, no float
    // fold-order, identical on both engines. ONE scan + explode with
    // conditional per-snapshot sums (two filtered centroidSums calls
    // would scan twice — differently-filtered subplans never reuse an
    // exchange — and their inner join on label would silently DROP a
    // label whose vectors are all one parity; the conditional pivot
    // keeps it, with NULL drift, exactly like the oracle's max(CASE)).
    QueryDef("q_embed_drift",
      """WITH t AS (
        |  SELECT label,
        |    CASE WHEN vec_id % 2 = 0 THEN 'ref'
        |         WHEN vec_id % 2 = 1 THEN 'cur' END AS snap, i,
        |    CAST(round(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1000000) AS BIGINT) AS sv
        |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
        |), c AS (
        |  SELECT label, snap, i, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(sv) AS BIGINT) AS ssum
        |  FROM t GROUP BY 1, 2, 3
        |), w AS (
        |  SELECT label, i,
        |    max(CASE WHEN snap = 'ref' THEN ssum END) AS sr,
        |    max(CASE WHEN snap = 'ref' THEN n END) AS nr,
        |    max(CASE WHEN snap = 'cur' THEN ssum END) AS sc2,
        |    max(CASE WHEN snap = 'cur' THEN n END) AS nc
        |  FROM c GROUP BY 1, 2
        |)
        |SELECT label, max(nr) AS n_ref, max(nc) AS n_cur,
        |  CAST(sum(abs(sr * nc - sc2 * nr)) AS BIGINT) AS drift_x
        |FROM w GROUP BY label ORDER BY label""".stripMargin) {
      (s, dir) => {
        Tables(s, dir, "embeddings")
          .select(col("label"), col("vec_id"),
            posexplode(expr(
              "transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT))"))
              .as(Seq("pos", "sv")))
          .groupBy("label", "pos")
          .agg(
            expr("sum(CASE WHEN vec_id % 2 = 0 THEN sv END)").as("sr"),
            expr("sum(CASE WHEN vec_id % 2 = 0 THEN CAST(1 AS BIGINT) END)").as("nr"),
            expr("sum(CASE WHEN vec_id % 2 = 1 THEN sv END)").as("sc2"),
            expr("sum(CASE WHEN vec_id % 2 = 1 THEN CAST(1 AS BIGINT) END)").as("nc"))
          .groupBy("label")
          .agg(max(col("nr")).as("n_ref"), max(col("nc")).as("n_cur"),
            expr("CAST(sum(abs(sr * nc - sc2 * nr)) AS BIGINT)").as("drift_x"))
          .orderBy("label")
      }
    },

    // ---- Int8 embedding quantization (Vectors.quantizeInt8) -------------
    // the 4x memory/IO lever for embedding columns at corpus scale. The
    // explicit floor(x+0.5) rounding makes the codes bit-identical on any
    // engine evaluating the same expression — verified code-for-code via
    // to_json, plus a reconstruction-error bound both engines assert
    QueryDef("q_embed_quantize",
      """WITH q AS (
        |  SELECT vec_id,
        |    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS q_scale,
        |    embedding
        |  FROM embeddings WHERE vec_id < 200
        |), c AS (
        |  SELECT vec_id, q_scale,
        |    CASE WHEN q_scale = 0 THEN list_transform(embedding, x -> 0)
        |         ELSE list_transform(embedding,
        |           x -> CAST(floor(x::DOUBLE * CAST(127 AS DOUBLE) / q_scale + CAST(0.5 AS DOUBLE)) AS INT))
        |    END AS q8,
        |    embedding
        |  FROM q
        |)
        |SELECT vec_id, round(q_scale, 6) AS q_scale_r, to_json(q8)::VARCHAR AS q8_json,
        |  list_max(list_transform(range(1, len(q8) + 1),
        |    i -> abs(q8[CAST(i AS INT)]::DOUBLE * q_scale / CAST(127 AS DOUBLE)
        |             - embedding[CAST(i AS INT)]::DOUBLE)))
        |    <= q_scale / CAST(254 AS DOUBLE) + CAST(0.000001 AS DOUBLE) AS err_ok
        |FROM c ORDER BY vec_id""".stripMargin) {
      (s, dir) =>
        graft.operators.Vectors.quantizeInt8(
            Tables(s, dir, "embeddings").filter(col("vec_id") < 200), "embedding")
          .selectExpr("vec_id", "round(q_scale, 6) AS q_scale_r",
            "to_json(q8) AS q8_json",
            """array_max(zip_with(q8, embedding,
              |  (q, x) -> abs(CAST(q AS DOUBLE) * q_scale / CAST(127 AS DOUBLE) - CAST(x AS DOUBLE))))
              |  <= q_scale / CAST(254 AS DOUBLE) + CAST(0.000001 AS DOUBLE) AS err_ok""".stripMargin)
          .orderBy("vec_id")
    },

    // ---- SemDeDup: semantic dedup within coarse clusters ----------------
    QueryDef("q_dedup_semantic",
      s"""WITH v AS ($vecsD),
         |drops AS (
         |  SELECT DISTINCT b.vec_id AS drop_id
         |  FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
         |  WHERE ${cosD("a.e", "b.e")} >= 0.85),
         |kept AS (
         |  SELECT v.vec_id, v.label FROM v
         |  LEFT JOIN drops ON v.vec_id = drops.drop_id
         |  WHERE drops.drop_id IS NULL)
         |SELECT vec_id, label FROM kept ORDER BY vec_id""".stripMargin) {
      (s, dir) =>
        graft.operators.Vectors.semanticDedup(
            vecsS(s, dir), clusterCol = "label", idCol = "vec_id",
            vecCol = "e", tau = 0.85)
          .select("vec_id", "label")
          .orderBy("vec_id")
    },

    // ---- Random ±1 projection (Vectors.randomProject) -------------------
    // JL-style dimensionality reduction 64 → 8 in EXACT integer
    // arithmetic: micro-unit BIGINT coordinates, each output dim a
    // BIGINT sum of signed coordinates — no float fold order anywhere.
    // Signs come from the shared md5 derivation ("rp:<j>:<d>", bit 0 of
    // the first digest byte), inlined as literals on BOTH engines.
    QueryDef("q_embed_project", {
      val dims = (0 until 8).map { j =>
        val arr = graft.operators.Vectors.projectSigns(j)
          .mkString("[", ", ", "]")
        "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
          s"list_transform(range(1, 65), i -> qe[i] * ($arr)[i])), (a, v) -> a + v)"
      }.mkString(",\n         |    ")
      s"""WITH q AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(round(x::DOUBLE * 1000000) AS BIGINT)) AS qe
         |  FROM embeddings WHERE vec_id < 200)
         |SELECT vec_id, to_json([
         |    $dims
         |  ])::VARCHAR AS proj_json
         |FROM q ORDER BY vec_id""".stripMargin
    }) {
      (s, dir) =>
        graft.operators.Vectors.randomProject(
            Tables(s, dir, "embeddings").filter(col("vec_id") < 200),
            "embedding", outDims = 8)
          .selectExpr("vec_id", "to_json(proj) AS proj_json")
          .orderBy("vec_id")
    },

    // ---- k-means (operator Vectors.kmeans): integer-exact Lloyd ---------
    // the learned-label clustering primitive (IVF coarse-quantizer
    // training). Same determinism scheme as q_pagerank: micro-unit
    // BIGINT coordinates (offset keeps them non-negative so integer
    // division truncates identically on both engines), BIGINT squared
    // distances, floor-mean centroid updates, (distance, cid)
    // tie-breaks. The oracle unrolls the two Lloyd rounds as CTEs and
    // must agree on every assignment to reproduce the per-cluster
    // member counts, id sums, and centroid-coordinate sums.
    QueryDef("q_kmeans", {
      def distD(v: String, c: String) =
        "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, 65), " +
          s"i -> ($v.qe[CAST(i AS INT)] - $c.ce[CAST(i AS INT)]) * " +
          s"($v.qe[CAST(i AS INT)] - $c.ce[CAST(i AS INT)]))), (x, y) -> x + y)"
      def assignD(vecs: String, cents: String) =
        s"""SELECT vid, qe, min([d, cid])[2] AS cid FROM (
           |    SELECT v.vid, v.qe, c.cid, ${distD("v", "c")} AS d
           |    FROM $vecs v CROSS JOIN $cents c)
           |  GROUP BY vid, qe""".stripMargin
      def updateD(assigned: String) =
        s"""SELECT cid, list(CAST(sv // n AS BIGINT) ORDER BY i) AS ce FROM (
           |    SELECT a.cid, i, count(*) AS n, sum(a.qe[CAST(i AS INT)]) AS sv
           |    FROM $assigned a, unnest(range(1, 65)) AS u(i)
           |    GROUP BY 1, 2)
           |  GROUP BY cid""".stripMargin
      s"""WITH q AS (
         |  SELECT vec_id AS vid,
         |    list_transform(embedding,
         |      x -> CAST(round(x::DOUBLE * 1000000) AS BIGINT) + 1000000) AS qe
         |  FROM embeddings),
         |c0 AS (SELECT vid AS cid, qe AS ce FROM q ORDER BY vid LIMIT 4),
         |a1 AS (${assignD("q", "c0")}),
         |c1 AS (${updateD("a1")}),
         |a2 AS (${assignD("q", "c1")}),
         |c2 AS (${updateD("a2")})
         |SELECT s.cid, s.n_members, s.id_sum, c.csum
         |FROM (SELECT cid, CAST(count(*) AS BIGINT) AS n_members,
         |        CAST(sum(vid) AS BIGINT) AS id_sum FROM a2 GROUP BY cid) s
         |JOIN (SELECT cid, CAST(list_reduce(ce, (x, y) -> x + y) AS BIGINT) AS csum
         |      FROM c2) c USING (cid)
         |ORDER BY cid""".stripMargin
    }) {
      (s, dir) =>
        val r = graft.operators.Vectors.kmeans(
          Tables(s, dir, "embeddings"), "vec_id", "embedding", k = 4, iters = 2)
        val stats = r.assignments.groupBy("cid")
          .agg(expr("CAST(count(*) AS BIGINT)").as("n_members"),
            expr("CAST(sum(vid) AS BIGINT)").as("id_sum"))
        val cs = r.centroids.selectExpr("cid",
          "aggregate(ce, CAST(0 AS BIGINT), (x, y) -> x + y) AS csum")
        stats.join(cs, "cid").orderBy("cid")
    },

    // ---- Product quantization: code assignment (Vectors.pqAssign) -------
    // the 8-32x ANN memory rung past int8: m sub-codebooks, one code per
    // subspace per vector, integer-exact distances. The codebook here is
    // the 4 lowest-id vectors' slices (the kmeans seed convention, so
    // the oracle replicates it in SQL; pqTrain's Lloyd path is pinned by
    // OperatorsSpec against the oracle-proven kmeans). Assignment is a
    // broadcast one-row codebook + narrow HOF argmin — zero shuffle
    // until the per-(sub, cid) rollup.
    QueryDef("q_embed_pq", {
      def sdistD =
        "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, 33), " +
          "i -> (a.sq[CAST(i AS INT)] - c.ce[CAST(i AS INT)]) * " +
          "(a.sq[CAST(i AS INT)] - c.ce[CAST(i AS INT)]))), (x, y) -> x + y)"
      s"""WITH q AS (
         |  SELECT vec_id AS vid,
         |    list_transform(embedding,
         |      x -> CAST(round(x::DOUBLE * 1000000) AS BIGINT) + 1000000) AS qe
         |  FROM embeddings),
         |subs AS (
         |  SELECT vid, CAST(s AS INT) AS sub,
         |    CASE WHEN s = 0 THEN qe[1:32] ELSE qe[33:64] END AS sq
         |  FROM q, unnest(range(0, 2)) u(s)),
         |cb AS (SELECT sub, vid AS cid, sq AS ce FROM subs
         |  WHERE vid IN (SELECT vid FROM q ORDER BY vid LIMIT 4)),
         |d AS (
         |  SELECT a.vid, a.sub, c.cid, $sdistD AS dist
         |  FROM subs a JOIN cb c ON a.sub = c.sub),
         |best AS (
         |  SELECT vid, sub, min([dist, cid])[1] AS d, min([dist, cid])[2] AS cid
         |  FROM d GROUP BY vid, sub)
         |SELECT sub, cid, CAST(count(*) AS BIGINT) AS n_vecs,
         |  CAST(sum(d) AS BIGINT) AS dist_sum
         |FROM best GROUP BY sub, cid ORDER BY sub, cid""".stripMargin
    }) {
      (s, dir) => {
        import graft.operators.Vectors
        val emb = Tables(s, dir, "embeddings")
        // seed codebook: the 4 lowest-id vectors' subspace slices,
        // quantized with the same micro-unit scheme as pqAssign
        val seeds = emb.orderBy("vec_id").limit(4)
          .selectExpr("vec_id",
            graft.operators.Vectors.microQuantExpr(
              "embedding", 64, 1000000L, 1000000L, "pq_seeds") + " AS qe")
        val codebook = seeds.selectExpr("CAST(0 AS INT) AS sub",
            "vec_id AS cid", "slice(qe, 1, 32) AS ce")
          .unionAll(seeds.selectExpr("CAST(1 AS INT) AS sub",
            "vec_id AS cid", "slice(qe, 33, 32) AS ce"))
        Vectors.pqAssign(emb.select("vec_id", "embedding"), "vec_id",
            "embedding", codebook, m = 2, dims = 64)
          .select(col("vec_id"),
            posexplode(expr("arrays_zip(pq_codes, pq_dists)")))
          .selectExpr("CAST(pos AS INT) AS sub",
            "col.pq_codes AS cid", "col.pq_dists AS d")
          .groupBy("sub", "cid")
          .agg(count(lit(1)).cast("bigint").as("n_vecs"),
            expr("CAST(sum(d) AS BIGINT)").as("dist_sum"))
          .orderBy("sub", "cid")
      }
    },

    // ---- PQ asymmetric-distance top-k (Vectors.pqAdcTopK) ---------------
    // the IVF-ADC read path: per query ONE m·k lookup table of integer
    // distances, then m lookups per corpus row; broadcast queries,
    // TopK.perKey merge — the q_ann_brute plan shape at 1/16th the
    // per-row arithmetic. Codebook = the 4 lowest-id vectors' slices
    // (the q_embed_pq convention, SQL-replicable).
    QueryDef("q_ann_pq", {
      def sdistD(a: String, b: String) =
        "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, 33), " +
          s"i -> (($a)[CAST(i AS INT)] - ($b)[CAST(i AS INT)]) * " +
          s"(($a)[CAST(i AS INT)] - ($b)[CAST(i AS INT)]))), (x, y) -> x + y)"
      s"""WITH q0 AS (
         |  SELECT vec_id AS vid,
         |    list_transform(embedding,
         |      x -> CAST(round(x::DOUBLE * 1000000) AS BIGINT) + 1000000) AS qe
         |  FROM embeddings),
         |subs AS (
         |  SELECT vid, CAST(s AS INT) AS sub,
         |    CASE WHEN s = 0 THEN qe[1:32] ELSE qe[33:64] END AS sq
         |  FROM q0, unnest(range(0, 2)) u(s)),
         |cb AS (SELECT sub, vid AS cid, sq AS ce FROM subs
         |  WHERE vid IN (SELECT vid FROM q0 ORDER BY vid LIMIT 4)),
         |codes AS (
         |  SELECT vid, sub, min([${sdistD("a.sq", "c.ce")}, c.cid])[2] AS cid
         |  FROM subs a JOIN cb c USING (sub) WHERE vid >= 5 GROUP BY vid, sub),
         |lut AS (
         |  SELECT qs.vid AS qid, c.sub, c.cid, ${sdistD("qs.sq", "c.ce")} AS d
         |  FROM subs qs JOIN cb c USING (sub) WHERE qs.vid < 5),
         |adc AS (
         |  SELECT l.qid, co.vid, CAST(sum(l.d) AS BIGINT) AS adc
         |  FROM codes co JOIN lut l ON co.sub = l.sub AND co.cid = l.cid
         |  GROUP BY l.qid, co.vid),
         |ranked AS (
         |  SELECT qid, vid, adc,
         |    row_number() OVER (PARTITION BY qid ORDER BY adc, vid) AS rnk
         |  FROM adc)
         |SELECT qid, CAST(rnk AS BIGINT) AS rnk, vid AS vec_id, adc
         |FROM ranked WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin
    }) {
      (s, dir) => {
        import graft.operators.Vectors
        val emb = Tables(s, dir, "embeddings")
        val seeds = emb.orderBy("vec_id").limit(4)
          .selectExpr("vec_id",
            graft.operators.Vectors.microQuantExpr(
              "embedding", 64, 1000000L, 1000000L, "pq_seeds") + " AS qe")
        val codebook = seeds.selectExpr("CAST(0 AS INT) AS sub",
            "vec_id AS cid", "slice(qe, 1, 32) AS ce")
          .unionAll(seeds.selectExpr("CAST(1 AS INT) AS sub",
            "vec_id AS cid", "slice(qe, 33, 32) AS ce"))
        val corpus = Vectors.pqAssign(
          emb.filter(col("vec_id") >= 5).select("vec_id", "embedding"),
          "vec_id", "embedding", codebook, m = 2, dims = 64)
        Vectors.pqAdcTopK(corpus.select("vec_id", "pq_codes"), "vec_id",
            "pq_codes",
            emb.filter(col("vec_id") < 5).select("vec_id", "embedding"),
            "vec_id", "embedding", codebook, k = 3, m = 2, dims = 64)
          .selectExpr("qid", "CAST(rnk AS BIGINT) AS rnk", "vec_id", "adc")
          .orderBy("qid", "rnk")
      }
    },

    // ---- IVF + PQ combined (the billion-scale ANN read path) ------------
    // coarse cells prune the corpus (each query probes its nprobe=2
    // nearest cells), then ADC scores only the survivors — FAISS's
    // IVFPQ shape in pure integer arithmetic. Cells and codebook both
    // come from the 4 lowest-id vectors (seed convention ⇒ the oracle
    // replicates everything in SQL). Scale: cell assignment and probe
    // are narrow HOF argmins over a ONE-ROW broadcast seed set; the
    // only joins are corpus.cell = probe.cell (equi, prunes to
    // ~nprobe/k_cells of the corpus) and the broadcast LUT; merge is
    // TopK.perKey.
    QueryDef("q_ann_ivfpq", ivfpqOracleSql) {
      (s, dir) => ivfpqInMemory(s, dir)
    },

    // ---- IVF-PQ via the ON-DISK index (operator Vectors.buildIvfPqIndex /
    // searchIvfPqIndex): the production read path — train once,
    // materialize (cells, codebook, cell-partitioned codes) atomically,
    // then serve searches off the index with partition pruning to the
    // probed cells. Same seed convention and parameters as q_ann_ivfpq,
    // so the round-trip through parquet must reproduce the in-memory
    // ranking bit-for-bit — which is exactly what the shared oracle
    // checks.
    QueryDef("q_ann_indexed", ivfpqOracleSql) { (s, dir) =>
      import graft.operators.Vectors
      val emb = Tables(s, dir, "embeddings")
      val seeds = emb.orderBy("vec_id").limit(4)
        .selectExpr("vec_id",
          Vectors.microQuantExpr(
            "embedding", 64, 1000000L, 1000000L, "pq_seeds") + " AS qe")
      val cells = seeds.selectExpr("vec_id AS cid", "qe AS ce")
      val codebook = seeds.selectExpr("CAST(0 AS INT) AS sub",
          "vec_id AS cid", "slice(qe, 1, 32) AS ce")
        .unionAll(seeds.selectExpr("CAST(1 AS INT) AS sub",
          "vec_id AS cid", "slice(qe, 33, 32) AS ce"))
      val path = java.nio.file.Files
        .createTempDirectory("graft_annidx").toString + "/index"
      Vectors.buildIvfPqIndex(
        emb.filter(col("vec_id") >= 5).select("vec_id", "embedding"),
        "vec_id", "embedding", cells, codebook, path, m = 2, dims = 64)
      Vectors.searchIvfPqIndex(s, path,
          emb.filter(col("vec_id") < 5).select("vec_id", "embedding"),
          "vec_id", "embedding", k = 3, nprobe = 2, m = 2, dims = 64)
        .selectExpr("qid", "CAST(rnk AS BIGINT) AS rnk", "vec_id", "adc")
        .orderBy("qid", "rnk")
    }
  )

  /** The shared IVF-PQ oracle: seed-convention cells + codebook (4
    * lowest-id vectors), nprobe=2, k=3 — replicated end-to-end in
    * DuckDB SQL. Used by BOTH q_ann_ivfpq (in-memory pipeline) and
    * q_ann_indexed (on-disk index round-trip): the two paths must agree
    * with the oracle AND therefore with each other.
    */
  // lazy: referenced from `all`, which is declared earlier in the file —
  // a strict val here would still be null during `all`'s initialization
  private lazy val ivfpqOracleSql: String = {
      def fd(a: String, b: String, dims: Int) =
        "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
          s"list_transform(range(1, ${dims + 1}), " +
          s"i -> (($a)[CAST(i AS INT)] - ($b)[CAST(i AS INT)]) * " +
          s"(($a)[CAST(i AS INT)] - ($b)[CAST(i AS INT)]))), (x, y) -> x + y)"
      s"""WITH q0 AS (
         |  SELECT vec_id AS vid,
         |    list_transform(embedding,
         |      x -> CAST(round(x::DOUBLE * 1000000) AS BIGINT) + 1000000) AS qe
         |  FROM embeddings),
         |seeds AS (SELECT vid, qe FROM q0 ORDER BY vid LIMIT 4),
         |cellsc AS (
         |  SELECT a.vid, min([${fd("a.qe", "s.qe", 64)}, s.vid])[2] AS cell
         |  FROM q0 a CROSS JOIN seeds s WHERE a.vid >= 5 GROUP BY a.vid),
         |probe AS (
         |  SELECT a.vid AS qid, s.vid AS cell, row_number() OVER (
         |    PARTITION BY a.vid ORDER BY ${fd("a.qe", "s.qe", 64)}, s.vid) AS prnk
         |  FROM q0 a CROSS JOIN seeds s WHERE a.vid < 5),
         |pcells AS (SELECT qid, cell FROM probe WHERE prnk <= 2),
         |subs AS (
         |  SELECT vid, CAST(s AS INT) AS sub,
         |    CASE WHEN s = 0 THEN qe[1:32] ELSE qe[33:64] END AS sq
         |  FROM q0, unnest(range(0, 2)) u(s)),
         |cb AS (SELECT sub, vid AS cid, sq AS ce FROM subs
         |  WHERE vid IN (SELECT vid FROM q0 ORDER BY vid LIMIT 4)),
         |codes AS (
         |  SELECT vid, sub, min([${fd("a.sq", "c.ce", 32)}, c.cid])[2] AS cid
         |  FROM subs a JOIN cb c USING (sub) WHERE vid >= 5 GROUP BY vid, sub),
         |lut AS (
         |  SELECT qs.vid AS qid, c.sub, c.cid, ${fd("qs.sq", "c.ce", 32)} AS d
         |  FROM subs qs JOIN cb c USING (sub) WHERE qs.vid < 5),
         |adc AS (
         |  SELECT l.qid, co.vid, CAST(sum(l.d) AS BIGINT) AS adc
         |  FROM codes co
         |  JOIN cellsc ON cellsc.vid = co.vid
         |  JOIN pcells p ON p.cell = cellsc.cell
         |  JOIN lut l ON l.qid = p.qid AND l.sub = co.sub AND l.cid = co.cid
         |  GROUP BY l.qid, co.vid),
         |ranked AS (
         |  SELECT qid, vid, adc,
         |    row_number() OVER (PARTITION BY qid ORDER BY adc, vid) AS rnk
         |  FROM adc)
         |SELECT qid, CAST(rnk AS BIGINT) AS rnk, vid AS vec_id, adc
         |FROM ranked WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin
  }

  /** The in-memory IVF-PQ pipeline behind q_ann_ivfpq (see the QueryDef
    * comment above for the plan shape).
    */
  private def ivfpqInMemory(s: SparkSession, dir: String): DataFrame = {
        import graft.operators.{TopK, Vectors}
        val emb = Tables(s, dir, "embeddings")
        val seeds = emb.orderBy("vec_id").limit(4)
          .selectExpr("vec_id",
            graft.operators.Vectors.microQuantExpr(
              "embedding", 64, 1000000L, 1000000L, "pq_seeds") + " AS qe")
        val codebook = seeds.selectExpr("CAST(0 AS INT) AS sub",
            "vec_id AS cid", "slice(qe, 1, 32) AS ce")
          .unionAll(seeds.selectExpr("CAST(1 AS INT) AS sub",
            "vec_id AS cid", "slice(qe, 33, 32) AS ce"))
        // ONE-ROW broadcast seed set; cell assignment via the shared
        // native argmin kernel (Vectors.assignCells / graft_cell)
        val seedRow = seeds.groupBy().agg(
          sort_array(collect_list(struct(col("vec_id").as("cid"), col("qe"))))
            .as("_seeds"))
        val fdist = "aggregate(zip_with(_qe, s.qe, (x, y) -> (x - y) * (x - y)), " +
          "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        val quant = Vectors.microQuantExpr(
          "embedding", 64, 1000000L, 1000000L, "q_ann_ivfpq")
        val corpusCells = Vectors.assignCells(
          emb.filter(col("vec_id") >= 5).select(col("vec_id"), col("embedding")),
          "embedding", seeds.selectExpr("vec_id AS cid", "qe AS ce"),
          dims = 64, op = "q_ann_ivfpq")
        val corpus = Vectors.pqAssign(corpusCells, "vec_id", "embedding",
            codebook, m = 2, dims = 64)
          .select("vec_id", "cell", "pq_codes")
        val probed = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding"))
          .crossJoin(broadcast(seedRow))
          .withColumn("_qe", expr(quant))
          .withColumn("cell", explode(expr(
            s"transform(slice(array_sort(transform(_seeds, " +
              s"s -> named_struct('d', $fdist, 'cid', s.cid))), 1, 2), p -> p.cid)")))
          .select("qid", "cell")
        // cell equi-join prunes the corpus to the probed cells; the
        // (qid, cell) probe table is tiny — broadcast
        val cand = corpus.join(broadcast(probed), "cell")
          .select("qid", "vec_id", "pq_codes")
        // LUT + ADC come from the SAME helpers pqAdcTopK uses — the
        // integer-determinism-critical expressions exist in one place
        val qlut = Vectors.pqLut(
          emb.filter(col("vec_id") < 5).select("vec_id", "embedding"),
          "vec_id", "embedding", codebook, m = 2, dims = 64,
          scale = 1000000L, offset = 1000000L, op = "q_ann_ivfpq")
        val scored = cand.join(broadcast(qlut), col("qid") === col("_qid"))
          .withColumn("adc", expr(Vectors.adcExpr("pq_codes", 2)))
          .select("qid", "vec_id", "adc")
        TopK.perKey(scored, Seq("qid"), Seq(col("adc").asc, col("vec_id").asc), 3)
          .selectExpr("qid", "CAST(rnk AS BIGINT) AS rnk", "vec_id", "adc")
          .orderBy("qid", "rnk")
  }
}
