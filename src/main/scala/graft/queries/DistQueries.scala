package graft.queries

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Distribution statistics for corpus health: two-sample KS drift, the
  * mutual-information / entropy battery over the (lang, source) mix, and
  * per-source Gini concentration of document length. All three follow the
  * house numeric policy (q_chisq / q_psi): counts stay EXACT integers on
  * the wire, each transcendental/IEEE term is one shared expression tree
  * over those exact counts, and anything summed across rows is rounded
  * into BIGINT micro-units FIRST so fold order can never perturb the
  * total.
  *
  * Scale shapes:
  *  - q_ks_test: one grouped aggregate by cents bucket, then a one-row
  *    sorted-array fold (the q_psi pattern). The array is bounded by the
  *    VALUE GRID (cents of a bounded metric — 17.8k distinct at sf0.1 and
  *    the same at 100 TB), not by row count, and the fold replaces the
  *    unpartitioned cumulative window the textbook formulation wants —
  *    nothing but (cents, n_a, n_b) triples cross the wire.
  *  - q_mutual_info: contingency table is ONE persisted scan (the
  *    q_chisq lesson), marginals and N are tiny aggregates of it.
  *  - q_gini: rank window is PARTITIONED by source; rank·x sums run in
  *    DECIMAL(38,0) (n·Σx at corpus scale overflows int64).
  *
  * Reference analog: the reference's summarize/describe statistics
  * surface (src/backend/execute.js aggregate paths); these are the
  * distribution-level checks a 100 TB corpus refresh gates on.
  */
object DistQueries {

  val all: Seq[QueryDef] = Seq(

    QueryDef("q_ks_test",
      """WITH e AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
        |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS isr
        |  FROM events WHERE value IS NOT NULL),
        |c AS (
        |  SELECT cents, CAST(sum(isr) AS BIGINT) AS na,
        |    CAST(sum(1 - isr) AS BIGINT) AS nb
        |  FROM e GROUP BY cents),
        |t AS (SELECT CAST(sum(na) AS BIGINT) AS ta, CAST(sum(nb) AS BIGINT) AS tb FROM c),
        |w AS (
        |  SELECT sum(na) OVER (ORDER BY cents) AS ca,
        |    sum(nb) OVER (ORDER BY cents) AS cb
        |  FROM c)
        |SELECT t.ta AS n_a, t.tb AS n_b,
        |  round(CAST(max(abs(CAST(w.ca AS HUGEINT) * t.tb - CAST(w.cb AS HUGEINT) * t.ta)) AS DOUBLE)
        |    / (CAST(t.ta AS DOUBLE) * CAST(t.tb AS DOUBLE)), 6) AS ks_d
        |FROM w CROSS JOIN t GROUP BY t.ta, t.tb""".stripMargin) { (s, dir) =>
      // two-sample Kolmogorov–Smirnov D between the even- and odd-user
      // event value distributions (the q_psi split): D = max over the
      // merged support of |F_a - F_b|, kept exact as |ca·tb - cb·ta| in
      // DECIMAL(38,0) (counts at 100 TB are ~1e12; the cross product
      // needs 128-bit headroom) with ONE IEEE division at the end. The
      // oracle uses the textbook cumulative window; the Spark side folds
      // a sorted (cents, na, nb) array instead — no unpartitioned window
      // (PlanQualitySpec's rule), and the running max rides the same
      // fold state as the running sums.
      Tables(s, dir, "events")
        .filter(col("value").isNotNull)
        .selectExpr("CAST(round(value * 100) AS BIGINT) AS cents",
          "IF(user_id % 2 = 0, 1, 0) AS isr")
        .groupBy("cents")
        .agg(expr("CAST(sum(isr) AS BIGINT)").as("na"),
          expr("CAST(sum(1 - isr) AS BIGINT)").as("nb"))
        .agg(
          expr("array_sort(collect_list(struct(cents, na, nb)))").as("arr"),
          expr("CAST(sum(na) AS BIGINT)").as("ta"),
          expr("CAST(sum(nb) AS BIGINT)").as("tb"))
        .selectExpr("ta AS n_a", "tb AS n_b",
          """round(CAST(aggregate(arr,
            |  named_struct('ca', CAST(0 AS BIGINT), 'cb', CAST(0 AS BIGINT),
            |               'm', CAST(0 AS DECIMAL(38,0))),
            |  (acc, x) -> named_struct(
            |    'ca', acc.ca + x.na,
            |    'cb', acc.cb + x.nb,
            |    'm', greatest(acc.m, abs(
            |      CAST(acc.ca + x.na AS DECIMAL(38,0)) * CAST(tb AS DECIMAL(38,0))
            |      - CAST(acc.cb + x.nb AS DECIMAL(38,0)) * CAST(ta AS DECIMAL(38,0))))),
            |  acc -> acc.m) AS DOUBLE)
            | / (CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE)), 6) AS ks_d""".stripMargin)
    },

    QueryDef("q_mutual_info",
      """WITH o AS (
        |  SELECT lang, source, CAST(count(*) AS BIGINT) AS nij
        |  FROM documents GROUP BY lang, source),
        |rt AS (SELECT lang, CAST(sum(nij) AS BIGINT) AS ni FROM o GROUP BY lang),
        |ct AS (SELECT source, CAST(sum(nij) AS BIGINT) AS nj FROM o GROUP BY source),
        |n AS (SELECT CAST(sum(nij) AS DOUBLE) AS nn, CAST(sum(nij) AS BIGINT) AS nb FROM o),
        |mi AS (
        |  SELECT CAST(sum(CAST(round(
        |    (CAST(o.nij AS DOUBLE) / n.nn)
        |      * ln((n.nn * CAST(o.nij AS DOUBLE)) / (CAST(rt.ni AS DOUBLE) * CAST(ct.nj AS DOUBLE)))
        |    * 1000000) AS BIGINT)) AS BIGINT) AS mi6
        |  FROM o JOIN rt ON o.lang = rt.lang JOIN ct ON o.source = ct.source CROSS JOIN n),
        |hl AS (
        |  SELECT CAST(sum(CAST(round(
        |    -(CAST(ni AS DOUBLE) / n.nn) * ln(CAST(ni AS DOUBLE) / n.nn) * 1000000) AS BIGINT)) AS BIGINT) AS hl6
        |  FROM rt CROSS JOIN n),
        |hs AS (
        |  SELECT CAST(sum(CAST(round(
        |    -(CAST(nj AS DOUBLE) / n.nn) * ln(CAST(nj AS DOUBLE) / n.nn) * 1000000) AS BIGINT)) AS BIGINT) AS hs6
        |  FROM ct CROSS JOIN n),
        |hj AS (
        |  SELECT CAST(sum(CAST(round(
        |    -(CAST(nij AS DOUBLE) / n.nn) * ln(CAST(nij AS DOUBLE) / n.nn) * 1000000) AS BIGINT)) AS BIGINT) AS hj6
        |  FROM o CROSS JOIN n)
        |SELECT n.nb AS n,
        |  CAST(mi.mi6 AS DOUBLE) / 1000000 AS mi,
        |  CAST(hl.hl6 AS DOUBLE) / 1000000 AS h_lang,
        |  CAST(hs.hs6 AS DOUBLE) / 1000000 AS h_source,
        |  CAST(hj.hj6 AS DOUBLE) / 1000000 AS h_joint,
        |  round(CAST(mi.mi6 AS DOUBLE) / CAST(least(hl.hl6, hs.hs6) AS DOUBLE), 6) AS nmi
        |FROM n CROSS JOIN mi CROSS JOIN hl CROSS JOIN hs CROSS JOIN hj""".stripMargin) { (s, dir) =>
      // mutual information (nats) + entropy battery of the lang × source
      // mix — "how much does source determine language" for a corpus
      // blend. Counts exact; every per-cell term is ONE shared IEEE tree
      // over exact counts, scaled into BIGINT micro-units BEFORE the sum
      // (the q_chisq policy: cell order can't move the total); NMI is a
      // final IEEE ratio of the two micro-sums. The contingency table is
      // one persisted scan feeding marginals and all four term sets.
      val o = Tables(s, dir, "documents")
        .groupBy("lang", "source")
        .agg(count(lit(1)).cast("bigint").as("nij"))
      o.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val rt = o.groupBy("lang").agg(sum("nij").cast("bigint").as("ni"))
      val ct = o.groupBy("source").agg(sum("nij").cast("bigint").as("nj"))
      val n = o.agg(sum("nij").cast("double").as("nn"),
        sum("nij").cast("bigint").as("nb"))
      // r17 fold (VERDICT r16 #6): the MI terms and the joint-entropy
      // terms are BOTH per-cell functions of the same joined frame, so
      // they share ONE pass (r16 ran a separate o⋈n branch for h_joint);
      // likewise the two marginal entropies share one pass over the
      // unioned marginals. Each term keeps its exact r16 expression tree
      // (same casts, operand order) and the BIGINT micro-unit sums are
      // fold-order-invariant — identical outputs, 5 aggregate branches
      // over the cached contingency table down to 3.
      val mihj = o.join(rt, Seq("lang")).join(ct, Seq("source"))
        .crossJoin(broadcast(n))
        .selectExpr("""CAST(round(
          |    (CAST(nij AS DOUBLE) / nn)
          |      * ln((nn * CAST(nij AS DOUBLE)) / (CAST(ni AS DOUBLE) * CAST(nj AS DOUBLE)))
          |    * 1000000) AS BIGINT) AS t6""".stripMargin,
          "CAST(round(-(CAST(nij AS DOUBLE) / nn) * ln(CAST(nij AS DOUBLE) / nn) * 1000000) AS BIGINT) AS j6")
        .agg(sum("t6").cast("bigint").as("mi6"),
          sum("j6").cast("bigint").as("hj6"))
      val ent = rt.selectExpr("ni AS cnt", "0 AS wh")
        .union(ct.selectExpr("nj AS cnt", "1 AS wh"))
        .crossJoin(broadcast(n))
        .selectExpr("wh",
          "CAST(round(-(CAST(cnt AS DOUBLE) / nn) * ln(CAST(cnt AS DOUBLE) / nn) * 1000000) AS BIGINT) AS t6")
        .agg(expr("CAST(sum(IF(wh = 0, t6, CAST(NULL AS BIGINT))) AS BIGINT)").as("hl6"),
          expr("CAST(sum(IF(wh = 1, t6, CAST(NULL AS BIGINT))) AS BIGINT)").as("hs6"))
      n.crossJoin(broadcast(mihj)).crossJoin(broadcast(ent))
        .selectExpr("nb AS n",
          "CAST(mi6 AS DOUBLE) / 1000000 AS mi",
          "CAST(hl6 AS DOUBLE) / 1000000 AS h_lang",
          "CAST(hs6 AS DOUBLE) / 1000000 AS h_source",
          "CAST(hj6 AS DOUBLE) / 1000000 AS h_joint",
          "round(CAST(mi6 AS DOUBLE) / CAST(least(hl6, hs6) AS DOUBLE), 6) AS nmi")
    },

    QueryDef("q_gini",
      """WITH d AS (
        |  SELECT source, n_chars,
        |    row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rk
        |  FROM documents),
        |g AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(n_chars AS HUGEINT)) AS HUGEINT) AS sx,
        |    CAST(sum(CAST(rk AS HUGEINT) * n_chars) AS HUGEINT) AS srx
        |  FROM d GROUP BY source)
        |SELECT source, n AS n_docs, CAST(sx AS BIGINT) AS total_chars,
        |  round(CAST(2 * srx - (n + 1) * sx AS DOUBLE)
        |    / CAST(CAST(n AS HUGEINT) * sx AS DOUBLE), 6) AS gini
        |FROM g ORDER BY source""".stripMargin) { (s, dir) =>
      // Gini coefficient of document length per source — the length-
      // concentration signal of a corpus blend (a source whose mass sits
      // in a few giant documents trains differently from an even one).
      // G = (2·Σ rk·x − (n+1)·Σx) / (n·Σx) on length-sorted ranks; tied
      // lengths make the formula ORDER-INVARIANT (equal x under swapped
      // ranks), and doc_id breaks ties so the window itself is still
      // deterministic. Ranks come from a window PARTITIONED by source;
      // rank·length sums run in DECIMAL(38,0) (HUGEINT on the oracle) —
      // n·Σx at 100 TB is ~1e12·1e15, far past int64.
      Tables(s, dir, "documents")
        .select(col("source"), col("n_chars"), col("doc_id"))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("source").orderBy("n_chars", "doc_id")))
        .groupBy("source")
        .agg(count(lit(1)).cast("bigint").as("n"),
          sum(col("n_chars").cast("decimal(38,0)")).as("sx"),
          sum(col("rk").cast("decimal(38,0)") * col("n_chars")).as("srx"))
        .selectExpr("source", "n AS n_docs", "CAST(sx AS BIGINT) AS total_chars",
          """round(CAST(2 * srx - (n + 1) * sx AS DOUBLE)
            | / CAST(CAST(n AS DECIMAL(38,0)) * sx AS DOUBLE), 6) AS gini""".stripMargin)
        .orderBy("source")
    },

    QueryDef("q_rank_test",
      """WITH e AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
        |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS isr
        |  FROM events WHERE value IS NOT NULL),
        |c AS (
        |  SELECT cents, CAST(sum(isr) AS BIGINT) AS na,
        |    CAST(sum(1 - isr) AS BIGINT) AS nb
        |  FROM e GROUP BY cents),
        |w AS (
        |  SELECT na, nb, na + nb AS nv,
        |    coalesce(sum(na + nb) OVER (ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cbefore
        |  FROM c),
        |s AS (
        |  SELECT CAST(sum(na) AS BIGINT) AS ta, CAST(sum(nb) AS BIGINT) AS tb,
        |    CAST(sum(CAST(na AS HUGEINT) * (2 * cbefore + nv + 1)) AS HUGEINT) AS r2a,
        |    CAST(sum(CAST(nv AS HUGEINT) * nv * nv - nv) AS HUGEINT) AS tie3
        |  FROM w)
        |SELECT ta AS n_a, tb AS n_b,
        |  CAST(r2a - CAST(ta AS HUGEINT) * (ta + 1) AS BIGINT) AS u2_a,
        |  CAST(tie3 AS BIGINT) AS tie_t,
        |  round((CAST(r2a - CAST(ta AS HUGEINT) * (ta + 1) AS DOUBLE) - CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE))
        |    / (2 * sqrt((CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE) / 12)
        |        * ((CAST(ta + tb AS DOUBLE) + 1)
        |           - CAST(tie3 AS DOUBLE) / (CAST(ta + tb AS DOUBLE) * (CAST(ta + tb AS DOUBLE) - 1))))), 6) AS z,
        |  round(CAST(r2a - CAST(ta AS HUGEINT) * (ta + 1) AS DOUBLE)
        |    / (2 * CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE)), 6) AS auc
        |FROM s""".stripMargin) { (s, dir) =>
      // Mann–Whitney U between the parity halves — the RANK-based drift
      // test completing the battery (chisq = categorical, KS/PSI =
      // distributional, this = ordinal shift). Tied ranks stay EXACT by
      // working in half-units: 2·avgrank(v) = 2·(count below) + n_v + 1
      // is an integer, so 2·R_a and 2·U_a are exact DECIMAL(38,0) sums
      // (rank sums at corpus scale are ~N², past int64), as is the tie
      // correction Σ(t³ − t). The z and AUC closed forms are one shared
      // IEEE tree each over those exact integers. Same grid-bounded fold
      // as q_ks_test: per-value counts, never per-row ranks, no
      // unpartitioned window on the Spark side.
      Tables(s, dir, "events")
        .filter(col("value").isNotNull)
        .selectExpr("CAST(round(value * 100) AS BIGINT) AS cents",
          "IF(user_id % 2 = 0, 1, 0) AS isr")
        .groupBy("cents")
        .agg(expr("CAST(sum(isr) AS BIGINT)").as("na"),
          expr("CAST(sum(1 - isr) AS BIGINT)").as("nb"))
        .agg(
          expr("array_sort(collect_list(struct(cents, na, nb)))").as("arr"),
          expr("CAST(sum(na) AS BIGINT)").as("ta"),
          expr("CAST(sum(nb) AS BIGINT)").as("tb"))
        .selectExpr("ta", "tb",
          // fold state: c = pooled count so far, r2a = Σ na·(2·before+n+1),
          // t3 = Σ (n³ − n) — all exact
          """aggregate(arr,
            |  named_struct('c', CAST(0 AS BIGINT),
            |               'r2a', CAST(0 AS DECIMAL(38,0)),
            |               't3', CAST(0 AS DECIMAL(38,0))),
            |  (acc, x) -> named_struct(
            |    'c', acc.c + x.na + x.nb,
            |    'r2a', acc.r2a + CAST(x.na AS DECIMAL(38,0))
            |      * CAST(2 * acc.c + x.na + x.nb + 1 AS DECIMAL(38,0)),
            |    't3', acc.t3 + CAST(x.na + x.nb AS DECIMAL(38,0)) * (x.na + x.nb) * (x.na + x.nb)
            |      - CAST(x.na + x.nb AS DECIMAL(38,0))),
            |  acc -> named_struct('r2a', acc.r2a, 't3', acc.t3)) AS f""".stripMargin)
        .selectExpr("ta", "tb",
          "f.r2a - CAST(ta AS DECIMAL(38,0)) * (ta + 1) AS u2a",
          "f.t3 AS tie3")
        .selectExpr("ta AS n_a", "tb AS n_b",
          "CAST(u2a AS BIGINT) AS u2_a",
          "CAST(tie3 AS BIGINT) AS tie_t",
          """round((CAST(u2a AS DOUBLE) - CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE))
            | / (2 * sqrt((CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE) / 12)
            |     * ((CAST(ta + tb AS DOUBLE) + 1)
            |        - CAST(tie3 AS DOUBLE) / (CAST(ta + tb AS DOUBLE) * (CAST(ta + tb AS DOUBLE) - 1))))), 6) AS z""".stripMargin,
          """round(CAST(u2a AS DOUBLE)
            | / (2 * CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE)), 6) AS auc""".stripMargin)
    },

    QueryDef("q_source_overlap",
      """WITH st AS (
        |  SELECT DISTINCT source, unnest(
        |    list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '')) AS token
        |  FROM documents),
        |sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS nv FROM st GROUP BY source),
        |pairs AS (
        |  SELECT a.source AS s1, b.source AS s2, CAST(count(*) AS BIGINT) AS common
        |  FROM st a JOIN st b ON a.token = b.token AND a.source < b.source
        |  GROUP BY a.source, b.source)
        |SELECT p.s1, p.s2, p.common,
        |  x.nv AS nv1, y.nv AS nv2,
        |  round(CAST(p.common AS DOUBLE) / CAST(x.nv + y.nv - p.common AS DOUBLE), 6) AS jaccard
        |FROM pairs p
        |JOIN sizes x ON p.s1 = x.source
        |JOIN sizes y ON p.s2 = y.source
        |ORDER BY s1, s2""".stripMargin) { (s, dir) =>
      // pairwise vocabulary Jaccard between sources — the corpus-mix
      // redundancy matrix (two sources sharing 90% of their vocabulary
      // are near-duplicates at the SOURCE level; complements per-doc
      // dedup). The distinct (source, token) frame is built once and
      // persisted: both self-join sides and the size aggregate read the
      // cached frame (InMemoryTableScan — the distinct computes once,
      // plan-asserted). Per-token fan-out
      // is bounded by |sources|² regardless of corpus size; the pair
      // matrix is ≤ |sources|²/2 rows — driver-tiny at any scale — and
      // SPARSE: a pair sharing zero tokens has no row (jaccard 0 is
      // absence, the join can't see it). The size lookups broadcast.
      val st = Tables(s, dir, "documents")
        .selectExpr("source",
          "explode(filter(split(lower(trim(text)), '\\\\s+'), x -> x != '')) AS token")
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sizes = st.groupBy("source").agg(count(lit(1)).cast("bigint").as("nv"))
      val pairs = st.as("a").join(st.as("b"),
          col("a.token") === col("b.token") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
        .agg(count(lit(1)).cast("bigint").as("common"))
      pairs
        .join(broadcast(sizes.withColumnRenamed("source", "s1").withColumnRenamed("nv", "nv1")), Seq("s1"))
        .join(broadcast(sizes.withColumnRenamed("source", "s2").withColumnRenamed("nv", "nv2")), Seq("s2"))
        .selectExpr("s1", "s2", "common", "nv1", "nv2",
          "round(CAST(common AS DOUBLE) / CAST(nv1 + nv2 - common AS DOUBLE), 6) AS jaccard")
        .orderBy("s1", "s2")
    },

    QueryDef("q_corr_matrix", {
      // shared text both engines: the closed form per pair over exact
      // moment sums (the q_agg_corr policy, multi-pair)
      def corrOf(x: String, y: String, sxy: String) =
        s"""round((nd * CAST($sxy AS DOUBLE) - CAST(s_$x AS DOUBLE) * CAST(s_$y AS DOUBLE))
           | / sqrt((nd * CAST(ss_$x AS DOUBLE) - CAST(s_$x AS DOUBLE) * CAST(s_$x AS DOUBLE))
           |      * (nd * CAST(ss_$y AS DOUBLE) - CAST(s_$y AS DOUBLE) * CAST(s_$y AS DOUBLE))), 6)""".stripMargin
      val pairs = Seq(("q", "p", "sp_qp"), ("q", "d", "sp_qd"), ("q", "t", "sp_qt"),
        ("p", "d", "sp_pd"), ("p", "t", "sp_pt"), ("d", "t", "sp_dt"))
      val names = Map("q" -> "quantity", "p" -> "price", "d" -> "discount", "t" -> "tax")
      val rows = pairs.map { case (x, y, sxy) =>
        s"SELECT '${names(x)}' AS var1, '${names(y)}' AS var2, ${corrOf(x, y, sxy)} AS corr FROM s"
      }.mkString("\n|UNION ALL ")
      s"""WITH b AS (
         |  SELECT CAST(round(l_quantity * 100) AS BIGINT) AS q,
         |    CAST(round(l_extendedprice * 100) AS BIGINT) AS p,
         |    CAST(round(l_discount * 100) AS BIGINT) AS d,
         |    CAST(round(l_tax * 100) AS BIGINT) AS t
         |  FROM lineitem),
         |s AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS nd,
         |    sum(CAST(q AS HUGEINT)) AS s_q, sum(CAST(p AS HUGEINT)) AS s_p,
         |    sum(CAST(d AS HUGEINT)) AS s_d, sum(CAST(t AS HUGEINT)) AS s_t,
         |    sum(CAST(q AS HUGEINT) * q) AS ss_q, sum(CAST(p AS HUGEINT) * p) AS ss_p,
         |    sum(CAST(d AS HUGEINT) * d) AS ss_d, sum(CAST(t AS HUGEINT) * t) AS ss_t,
         |    sum(CAST(q AS HUGEINT) * p) AS sp_qp, sum(CAST(q AS HUGEINT) * d) AS sp_qd,
         |    sum(CAST(q AS HUGEINT) * t) AS sp_qt, sum(CAST(p AS HUGEINT) * d) AS sp_pd,
         |    sum(CAST(p AS HUGEINT) * t) AS sp_pt, sum(CAST(d AS HUGEINT) * t) AS sp_dt
         |  FROM b)
         |$rows
         |ORDER BY var1, var2""".stripMargin
    }) { (s, dir) =>
      // full pairwise Pearson matrix over the four lineitem measures in
      // ONE pass: all 15 moment sums ride a single partial+final scalar
      // aggregate (map-side combine state, nothing else crosses the
      // wire), the 6 closed forms run on the one-row result via stack.
      // Per-row products are BIGINT (cents × cents < 2^63); only the
      // sums widen to DECIMAL(38,0)/HUGEINT — the q_agg_corr policy.
      def corrOf(x: String, y: String, sxy: String) =
        s"""round((nd * CAST($sxy AS DOUBLE) - CAST(s_$x AS DOUBLE) * CAST(s_$y AS DOUBLE))
           | / sqrt((nd * CAST(ss_$x AS DOUBLE) - CAST(s_$x AS DOUBLE) * CAST(s_$x AS DOUBLE))
           |      * (nd * CAST(ss_$y AS DOUBLE) - CAST(s_$y AS DOUBLE) * CAST(s_$y AS DOUBLE))), 6)""".stripMargin
      val names = Map("q" -> "quantity", "p" -> "price", "d" -> "discount", "t" -> "tax")
      val stackArgs = Seq(("q", "p", "sp_qp"), ("q", "d", "sp_qd"), ("q", "t", "sp_qt"),
        ("p", "d", "sp_pd"), ("p", "t", "sp_pt"), ("d", "t", "sp_dt"))
        .map { case (x, y, sxy) =>
          s"'${names(x)}', '${names(y)}', ${corrOf(x, y, sxy)}"
        }.mkString(", ")
      def dsum(e: String) = s"sum(CAST($e AS DECIMAL(38,0)))"
      Tables(s, dir, "lineitem")
        .selectExpr(
          "CAST(round(l_quantity * 100) AS BIGINT) AS q",
          "CAST(round(l_extendedprice * 100) AS BIGINT) AS p",
          "CAST(round(l_discount * 100) AS BIGINT) AS d",
          "CAST(round(l_tax * 100) AS BIGINT) AS t")
        .agg(
          expr("CAST(count(*) AS DOUBLE)").as("nd"),
          expr(dsum("q")).as("s_q"), expr(dsum("p")).as("s_p"),
          expr(dsum("d")).as("s_d"), expr(dsum("t")).as("s_t"),
          expr(dsum("q * q")).as("ss_q"), expr(dsum("p * p")).as("ss_p"),
          expr(dsum("d * d")).as("ss_d"), expr(dsum("t * t")).as("ss_t"),
          expr(dsum("q * p")).as("sp_qp"), expr(dsum("q * d")).as("sp_qd"),
          expr(dsum("q * t")).as("sp_qt"), expr(dsum("p * d")).as("sp_pd"),
          expr(dsum("p * t")).as("sp_pt"), expr(dsum("d * t")).as("sp_dt"))
        .selectExpr(s"stack(6, $stackArgs) AS (var1, var2, corr)")
        .orderBy("var1", "var2")
    },

    QueryDef("q_robust_stats",
      """WITH b AS (
        |  SELECT source, doc_id, CAST(n_chars AS BIGINT) AS v FROM documents),
        |r AS (
        |  SELECT source, v, CAST(row_number() OVER (PARTITION BY source
        |    ORDER BY v, doc_id) AS BIGINT) AS rn
        |  FROM b),
        |c AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY source),
        |q AS (
        |  SELECT r.source,
        |    max(CASE WHEN rn = (n + 3) // 4 THEN v END) AS q1_c,
        |    max(CASE WHEN rn = (n + 1) // 2 THEN v END) AS median_c,
        |    max(CASE WHEN rn = (3 * n + 3) // 4 THEN v END) AS q3_c,
        |    max(n) AS n
        |  FROM r JOIN c ON r.source = c.source GROUP BY r.source),
        |d AS (
        |  SELECT b.source, abs(b.v - q.median_c) AS dv, b.doc_id, q.n
        |  FROM b JOIN q ON b.source = q.source),
        |dr AS (
        |  SELECT source, dv, n, CAST(row_number() OVER (PARTITION BY source
        |    ORDER BY dv, doc_id) AS BIGINT) AS rn
        |  FROM d),
        |m AS (
        |  SELECT source, max(CASE WHEN rn = (n + 1) // 2 THEN dv END) AS mad_c
        |  FROM dr GROUP BY source),
        |o AS (
        |  SELECT b.source, CAST(sum(CASE WHEN 2 * b.v < 2 * q.q1_c - 3 * (q.q3_c - q.q1_c)
        |      OR 2 * b.v > 2 * q.q3_c + 3 * (q.q3_c - q.q1_c) THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |  FROM b JOIN q ON b.source = q.source GROUP BY b.source)
        |SELECT q.source, q.n, q.median_c, m.mad_c, q.q1_c, q.q3_c, o.n_outliers
        |FROM q JOIN m ON q.source = m.source JOIN o ON q.source = o.source
        |ORDER BY q.source""".stripMargin) { (s, dir) =>
      // robust per-source summary: discrete median/quartiles by INTEGER
      // rank (ceil(p·n) — the q_percentile_disc convention, no float
      // percentile arithmetic anywhere), MAD as a second rank pass over
      // exact absolute deviations, and Tukey 1.5·IQR outlier counts as
      // pure integer compares (doubled to avoid halves). Both windows
      // are PARTITIONED by source; the quartile row broadcasts back onto
      // the scan (per-group stats are |sources| rows at any corpus
      // size). The robust twin of q_ts_anomaly's mean/σ gate.
      import org.apache.spark.sql.expressions.Window
      val b = Tables(s, dir, "documents")
        .selectExpr("source", "doc_id", "CAST(n_chars AS BIGINT) AS v")
      val r = b.withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy("v", "doc_id")).cast("bigint"))
      val c = b.groupBy("source").agg(count(lit(1)).cast("bigint").as("n"))
        .withColumnRenamed("source", "_cs")
      val q = r.join(broadcast(c), col("source") === col("_cs"))
        .groupBy("source")
        .agg(expr("max(CASE WHEN rn = (n + 3) div 4 THEN v END)").as("q1_c"),
          expr("max(CASE WHEN rn = (n + 1) div 2 THEN v END)").as("median_c"),
          expr("max(CASE WHEN rn = (3 * n + 3) div 4 THEN v END)").as("q3_c"),
          max("n").as("n"))
      val qb = broadcast(q.withColumnRenamed("source", "_qs"))
      val d = b.join(qb, col("source") === col("_qs"))
        .selectExpr("source", "doc_id", "abs(v - median_c) AS dv", "n")
      val m = d.withColumn("rn", row_number().over(
          Window.partitionBy("source").orderBy("dv", "doc_id")).cast("bigint"))
        .groupBy("source")
        .agg(expr("max(CASE WHEN rn = (n + 1) div 2 THEN dv END)").as("mad_c"))
      val o = b.join(qb, col("source") === col("_qs"))
        .groupBy("source")
        .agg(expr("""CAST(sum(CASE WHEN 2 * v < 2 * q1_c - 3 * (q3_c - q1_c)
          | OR 2 * v > 2 * q3_c + 3 * (q3_c - q1_c) THEN 1 ELSE 0 END) AS BIGINT)""".stripMargin)
          .as("n_outliers"))
      q.join(m, Seq("source")).join(o, Seq("source"))
        .select(col("source"), col("n"), col("median_c"), col("mad_c"),
          col("q1_c"), col("q3_c"), col("n_outliers"))
        .orderBy("source")
    }
  )
}
