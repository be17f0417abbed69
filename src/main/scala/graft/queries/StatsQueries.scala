package graft.queries

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.operators.{AsOfJoin, Merge, Sampling, TimeSeries}
import graft.sources.Tables

/** Round-5 statistical / warehouse surface: correlation & regression
  * aggregates, equi-width histograms, vocabulary building, ordered-step
  * funnel analysis, and SCD Type-2 dimension history.
  *
  * Cross-engine determinism contract (SURVEY §5): every aggregate that
  * feeds a double formula is first an EXACT integer/decimal sum (scaled
  * cents / token counts), so the partial-agg order cannot perturb the
  * result; the closed-form double arithmetic is the SAME expression tree
  * on both engines (IEEE ops on identical inputs are bit-identical),
  * rounded at 6dp only as the final serialization step.
  *
  * Scale notes (100 TB):
  *  - q_agg_corr / q_histogram are single partial+final hash aggregates —
  *    the moment sums (n, Sx, Sy, Sxx, Syy, Sxy) are the map-side combine
  *    state, the closed forms run on the tiny grouped result.
  *  - q_vocab shuffles (token, count) pairs once; the top-25 head is a
  *    TakeOrdered, never a global sort; the 1-row total broadcasts.
  *  - q_funnel is a chain of per-user hash aggregates and equi-joins on
  *    user_id (broadcast when the surviving user set is small).
  *  - q_scd2 windows are partitioned by the dimension key — no
  *    unpartitioned window anywhere (PlanQualitySpec sweeps this).
  */
object StatsQueries {

  /** Moment sums exact, closed forms in identical doubles. The per-ROW
    * products run in BIGINT (cents x cents always fits int64); only the
    * SUM needs 128-bit width — DECIMAL(38,0) on Spark, DuckDB's native
    * HUGEINT sum on the oracle. Keeping the hot multiply out of decimal
    * arithmetic cut the query ~40% at sf0.1.
    */
  private def corrSqlFor(sumOpen: String, sumClose: String) =
    s"""WITH xy AS (
      |  SELECT l_returnflag,
      |    CAST(round(l_quantity * 100) AS BIGINT) AS x,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y
      |  FROM lineitem),
      |sums AS (
      |  SELECT l_returnflag,
      |    CAST(count(*) AS DOUBLE) AS n,
      |    CAST(sum($sumOpen x $sumClose) AS DOUBLE) AS sx,
      |    CAST(sum($sumOpen y $sumClose) AS DOUBLE) AS sy,
      |    CAST(sum($sumOpen x * x $sumClose) AS DOUBLE) AS sxx,
      |    CAST(sum($sumOpen y * y $sumClose) AS DOUBLE) AS syy,
      |    CAST(sum($sumOpen x * y $sumClose) AS DOUBLE) AS sxy
      |  FROM xy GROUP BY l_returnflag),
      |d AS (
      |  SELECT l_returnflag, n, sx, sy,
      |    (n * sxy - sx * sy) AS cxy,
      |    (n * sxx - sx * sx) AS cxx,
      |    (n * syy - sy * sy) AS cyy
      |  FROM sums)
      |SELECT l_returnflag,
      |  CAST(n AS BIGINT) AS n,
      |  round(cxy / sqrt(cxx * cyy), 6) AS corr_qty_price,
      |  round(cxy / cxx, 6) AS slope,
      |  round((sy - (cxy / cxx) * sx) / n, 6) AS intercept,
      |  round(cxy / (n * n), 6) AS covar_pop,
      |  round(cxy / (n * (n - 1.0)), 6) AS covar_samp,
      |  round((cxy / sqrt(cxx * cyy)) * (cxy / sqrt(cxx * cyy)), 6) AS r2
      |FROM d ORDER BY l_returnflag""".stripMargin

  /** Equi-width histogram: bucket id is pure closed-form arithmetic, so
    * it needs no width_bucket builtin and parses identically everywhere.
    */
  private val histSql =
    """SELECT CAST(least(greatest(floor(o_totalprice / 50000), 0), 11) AS BIGINT) AS bucket,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS DECIMAL(18,0))) AS DOUBLE) / 100.0 AS total
      |FROM orders
      |GROUP BY 1
      |ORDER BY bucket""".stripMargin

  /** Ordered-step conversion funnel view -> click -> purchase: each stage
    * requires an event STRICTLY AFTER the previous stage's first hit.
    *
    * Shape note: ONE LINEAR pipeline — per-user first-view, left-join
    * clicks, left-join purchases, then a single global count row
    * unpivoted. The tempting per-stage `UNION ALL SELECT count(*) FROM
    * sK` re-references each CTE, and Spark INLINES CTEs — that
    * formulation re-scans the event table ~6x (measured 4.9 s vs ~1 s
    * at sf0.1). Every stage here is referenced exactly once; each scan
    * pushes its event_type filter into the parquet reader.
    */
  private val funnelSql =
    """WITH v AS (
      |  SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t1
      |  FROM events WHERE event_type = 'view' GROUP BY user_id),
      |vc AS (
      |  SELECT v.user_id, v.t1,
      |    min(CASE WHEN c.event_type = 'click' AND CAST(c.ts AS TIMESTAMP) > v.t1
      |             THEN CAST(c.ts AS TIMESTAMP) END) AS t2
      |  FROM v LEFT JOIN events c
      |    ON v.user_id = c.user_id AND c.event_type = 'click'
      |  GROUP BY v.user_id, v.t1),
      |vcp AS (
      |  SELECT vc.user_id, vc.t1, vc.t2,
      |    min(CASE WHEN vc.t2 IS NOT NULL AND p.event_type = 'purchase'
      |                  AND CAST(p.ts AS TIMESTAMP) > vc.t2
      |             THEN CAST(p.ts AS TIMESTAMP) END) AS t3
      |  FROM vc LEFT JOIN events p
      |    ON vc.user_id = p.user_id AND p.event_type = 'purchase'
      |  GROUP BY vc.user_id, vc.t1, vc.t2)
      |SELECT CAST(count(t1) AS BIGINT) AS n1,
      |       CAST(count(t2) AS BIGINT) AS n2,
      |       CAST(count(t3) AS BIGINT) AS n3
      |FROM vcp""".stripMargin

  /** The DuckDB oracle unpivots the single count row; Spark uses
    * stack() for the same (DuckDB lacks stack, Spark re-runs a
    * 3x-referenced CTE — each engine gets the form that is
    * single-pass FOR IT).
    */
  private val funnelOracle =
    s"""WITH counts AS ($funnelSql)
       |SELECT stage, users FROM (
       |  SELECT '1_view' AS stage, n1 AS users FROM counts
       |  UNION ALL SELECT '2_click', n2 FROM counts
       |  UNION ALL SELECT '3_purchase', n3 FROM counts
       |) f ORDER BY stage""".stripMargin

  val all: Seq[QueryDef] = Seq(

    QueryDef("q_agg_corr",
      corrSqlFor("", "")) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(corrSqlFor("CAST(", " AS DECIMAL(38,0))"))
    },

    QueryDef("q_histogram", histSql) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(histSql)
    },

    QueryDef("q_vocab",
      """WITH tok AS (
        |  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
        |  FROM documents),
        |counts AS (
        |  SELECT token, count(*) AS cnt FROM tok WHERE token <> '' GROUP BY token),
        |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM counts)
        |SELECT token, CAST(cnt AS BIGINT) AS cnt,
        |  round(CAST(cnt AS DOUBLE) / total, 6) AS share
        |FROM counts CROSS JOIN tot
        |ORDER BY cnt DESC, token LIMIT 25""".stripMargin) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """WITH tok AS (
          |  SELECT explode(split(lower(trim(text)), '\\s+')) AS token
          |  FROM documents),
          |counts AS (
          |  SELECT token, count(*) AS cnt FROM tok WHERE token <> '' GROUP BY token),
          |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM counts)
          |SELECT token, CAST(cnt AS BIGINT) AS cnt,
          |  round(CAST(cnt AS DOUBLE) / total, 6) AS share
          |FROM counts CROSS JOIN tot
          |ORDER BY cnt DESC, token LIMIT 25""".stripMargin)
    },

    QueryDef("q_funnel", funnelOracle) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(funnelSql)
        .selectExpr("stack(3, '1_view', n1, '2_click', n2, '3_purchase', n3) AS (stage, users)")
        .orderBy("stage")
    },

    QueryDef("q_scd2",
      """WITH c AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
        |  FROM events WHERE user_id < 30),
        |d AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM c),
        |kept AS (
        |  SELECT user_id, event_type, ts, event_id FROM d
        |  WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id, event_type, ts AS effective_from,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS effective_to,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
        |FROM kept
        |ORDER BY user_id, effective_from, event_type, effective_to""".stripMargin) { (s, dir) =>
      val changes = Tables.events(s, dir)
        .filter(col("user_id") < 30)
        .select("user_id", "event_type", "ts", "event_id")
      Merge.scd2(changes, Seq("user_id"), "ts", tieBreak = Seq("event_id"))
        .select(col("user_id"), col("event_type"),
          col("effective_from").cast("timestamp_ntz").as("effective_from"),
          col("effective_to").cast("timestamp_ntz").as("effective_to"),
          col("is_current"))
        // effective_to completes the total order: two kept versions can
        // share (user, from, type) when observations collide on the
        // microsecond, and only the tieBreak column (dropped here)
        // distinguishes them otherwise
        .orderBy("user_id", "effective_from", "event_type", "effective_to")
    },

    // ---- Discrete percentile (PERCENTILE_DISC analog) ----------------------
    // the value at rank ceil(p·n) per group — an ACTUAL data value, no
    // interpolation, so the whole computation is integer arithmetic
    // (cents, integer ceiling) on both engines. One key-partitioned
    // rank window + broadcast group counts; same scale shape as
    // weightedMedian.
    QueryDef("q_percentile_disc",
      """WITH b AS (
        |  SELECT l_returnflag AS g, l_orderkey, l_linenumber,
        |    CAST(round(l_quantity * 100) AS BIGINT) AS v
        |  FROM lineitem WHERE l_orderkey < 2000),
        |r AS (
        |  SELECT g, v, CAST(row_number() OVER (PARTITION BY g
        |    ORDER BY v, l_orderkey, l_linenumber) AS BIGINT) AS rn
        |  FROM b),
        |c AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY g)
        |SELECT r.g, max(CASE WHEN rn = (9 * n + 9) // 10 THEN v END) AS p90_c,
        |  max(n) AS n
        |FROM r JOIN c ON r.g = c.g
        |GROUP BY r.g ORDER BY r.g""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val b = Tables(s, dir, "lineitem").filter(col("l_orderkey") < 2000)
        .selectExpr("l_returnflag AS g", "l_orderkey", "l_linenumber",
          "CAST(round(l_quantity * 100) AS BIGINT) AS v")
      val w = Window.partitionBy("g")
        .orderBy(col("v"), col("l_orderkey"), col("l_linenumber"))
      val cnt = b.groupBy("g").agg(count(lit(1)).cast("bigint").as("n"))
        .withColumnRenamed("g", "_g")
      b.withColumn("rn", row_number().over(w).cast("bigint"))
        .join(broadcast(cnt), col("g") === col("_g"))
        .groupBy("g")
        .agg(expr("max(CASE WHEN rn = (9 * n + 9) div 10 THEN v END)").as("p90_c"),
          max("n").as("n"))
        .orderBy("g")
    },

    // ---- Deterministic per-group MODE -------------------------------------
    // the most frequent value per group with an explicit (count, value)
    // tie-break — built-in mode() returns an ARBITRARY tie winner on
    // both engines, so the deterministic two-level aggregate is the
    // engine-portable form (and the scalable one: partial counts
    // combine map-side, no value buffering).
    QueryDef("q_agg_mode",
      """WITH c AS (
        |  SELECT o_orderpriority AS g, o_custkey % 25 AS v,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM orders GROUP BY 1, 2)
        |SELECT g, max([n, v])[2] AS mode_v, max(n) AS mode_n
        |FROM c GROUP BY g ORDER BY g""".stripMargin) { (s, dir) =>
      Tables(s, dir, "orders")
        .selectExpr("o_orderpriority AS g", "o_custkey % 25 AS v")
        .groupBy("g", "v").agg(count(lit(1)).cast("bigint").as("n"))
        .groupBy("g")
        .agg(expr("max_by(v, struct(n, v))").as("mode_v"),
          max("n").as("mode_n"))
        .orderBy("g")
    },

    // ---- SCD2 time travel (operator Merge.snapshotAt) --------------------
    // the point-in-time read over the q_scd2 history: each user's state
    // as of 2024-01-15 noon — a pure filter over the history (no join,
    // no window), the feature-store as-of-training-time contract.
    QueryDef("q_scd2_asof",
      """WITH c AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
        |  FROM events WHERE user_id < 30),
        |d AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM c),
        |kept AS (
        |  SELECT user_id, event_type, ts, event_id FROM d
        |  WHERE prev IS NULL OR prev <> event_type),
        |hist AS (
        |  SELECT user_id, event_type, ts AS effective_from,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS effective_to
        |  FROM kept)
        |SELECT user_id, event_type, effective_from
        |FROM hist
        |WHERE effective_from <= TIMESTAMP '2024-01-15 12:00:00'
        |  AND (effective_to IS NULL OR effective_to > TIMESTAMP '2024-01-15 12:00:00')
        |ORDER BY user_id, event_type, effective_from""".stripMargin) { (s, dir) =>
      val changes = Tables.events(s, dir)
        .filter(col("user_id") < 30)
        .select("user_id", "event_type", "ts", "event_id")
      Merge.snapshotAt(
          Merge.scd2(changes, Seq("user_id"), "ts", tieBreak = Seq("event_id")),
          expr("TIMESTAMP '2024-01-15 12:00:00'"))
        .select(col("user_id"), col("event_type"),
          col("effective_from").cast("timestamp_ntz").as("effective_from"))
        .orderBy("user_id", "event_type", "effective_from")
    },

    QueryDef("q_ts_rolling",
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE user_id < 40)
        |SELECT user_id, event_id,
        |  CAST(sum(cents) OVER wr AS DOUBLE) / 100.0 AS roll_sum_10m,
        |  CAST(count(*) OVER wr AS BIGINT) AS roll_cnt_10m,
        |  (CAST(coalesce(lag(cents, 0) OVER wo, 0) AS DOUBLE) * 1.0
        |     + CAST(coalesce(lag(cents, 1) OVER wo, 0) AS DOUBLE) * 0.5
        |     + CAST(coalesce(lag(cents, 2) OVER wo, 0) AS DOUBLE) * 0.25
        |     + CAST(coalesce(lag(cents, 3) OVER wo, 0) AS DOUBLE) * 0.125
        |     + CAST(coalesce(lag(cents, 4) OVER wo, 0) AS DOUBLE) * 0.0625
        |     + CAST(coalesce(lag(cents, 5) OVER wo, 0) AS DOUBLE) * 0.03125) AS decayed_cents
        |FROM e
        |WINDOW wr AS (PARTITION BY user_id ORDER BY tus RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW),
        |       wo AS (PARTITION BY user_id ORDER BY tus, event_id)
        |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      val e = Tables.events(s, dir)
        .filter(col("user_id") < 40)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("tus"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      val rolled = TimeSeries.trailing(e, Seq("user_id"), "tus", "cents",
        back = 600000000L)
      TimeSeries.decayed(rolled, Seq("user_id"), Seq("tus", "event_id"),
          "cents", terms = 6)
        .select(col("user_id"), col("event_id"),
          (col("roll_sum").cast("double") / 100.0).as("roll_sum_10m"),
          col("roll_cnt").cast("bigint").as("roll_cnt_10m"),
          // cents · 2^-j terms are exact multiples of 2^-5 well under
          // 2^53 — the sum is bit-exact on both engines, NO rounding
          // (a /100 + round(...,6) lands on decimal .5 boundaries where
          // engines' rounding modes disagree)
          col("decayed").as("decayed_cents"))
        .orderBy("user_id", "event_id")
    },

    QueryDef("q_asof_forward",
      """WITH l0 AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS lt
        |  FROM events WHERE event_type = 'view' AND user_id < 20),
        |r0 AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS rt,
        |    min(CAST(round(value * 100) AS BIGINT)) AS rval
        |  FROM events WHERE event_type = 'purchase' AND user_id < 20
        |  GROUP BY user_id, CAST(ts AS TIMESTAMP)),
        |m AS (
        |  SELECT l0.event_id, min(r0.rt) AS mt
        |  FROM l0 JOIN r0 ON l0.user_id = r0.user_id AND r0.rt >= l0.lt
        |  GROUP BY l0.event_id)
        |SELECT l0.event_id, l0.user_id, l0.lt,
        |  m.mt AS matched_ts, r2.rval AS rval
        |FROM l0
        |LEFT JOIN m ON l0.event_id = m.event_id
        |LEFT JOIN r0 r2 ON r2.user_id = l0.user_id AND r2.rt = m.mt
        |ORDER BY l0.event_id""".stripMargin) { (s, dir) =>
      // forward as-of: next purchase at-or-after each view. The oracle is
      // the naive inequality-join + min formulation (fine in DuckDB at
      // oracle scale); the Spark side is the union-merge operator — one
      // shuffle + one sort, never a range probe.
      val ev = Tables.events(s, dir).filter(col("user_id") < 20)
      val l0 = ev.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts").as("lt"))
      val r0 = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts").as("rt"))
        .agg(expr("min(CAST(round(value * 100) AS BIGINT))").as("rval"))
      AsOfJoin.asofForward(l0, r0, Seq("user_id"), "lt", "rt", Seq("rt", "rval"))
        .select(col("event_id"), col("user_id"),
          col("lt").cast("timestamp_ntz").as("lt"),
          col("asof_rt").cast("timestamp_ntz").as("matched_ts"),
          col("asof_rval").as("rval"))
        .orderBy("event_id")
    },

    QueryDef("q_attribution",
      """WITH p AS (
        |  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS rtus,
        |    max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click'
        |  GROUP BY user_id, epoch_us(CAST(ts AS TIMESTAMP))),
        |m AS (
        |  SELECT p.event_id, max(c.rtus) AS mt
        |  FROM p JOIN c ON p.user_id = c.user_id
        |    AND c.rtus <= p.tus AND p.tus - c.rtus <= 1800000000
        |  GROUP BY p.event_id)
        |SELECT p.event_id, p.user_id, c2.click_id, p.tus - m.mt AS age_us
        |FROM p
        |LEFT JOIN m ON p.event_id = m.event_id
        |LEFT JOIN c c2 ON c2.user_id = p.user_id AND c2.rtus = m.mt
        |ORDER BY p.event_id""".stripMargin) { (s, dir) =>
      // last-touch attribution: each purchase credits the LATEST click
      // within 30 minutes — AsOfJoin.asofWithin end to end ("latest
      // within maxAge" == "latest overall, degraded when stale", since
      // anything older than the latest is staler). Oracle is the naive
      // bounded inequality join.
      val ev = Tables.events(s, dir)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("tus"))
      val c = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("rtus"))
        .agg(max("event_id").as("click_id"))
      AsOfJoin.asofWithin(p, c, Seq("user_id"), "tus", "rtus",
          Seq("rtus", "click_id"), maxAge = 1800000000L)
        .select(col("event_id"), col("user_id"),
          col("asof_click_id").as("click_id"),
          (col("tus") - col("asof_rtus")).as("age_us"))
        .orderBy("event_id")
    },

    QueryDef("q_skew_profile",
      """WITH k AS (
        |  SELECT l_suppkey AS key, CAST(count(*) AS BIGINT) AS cnt
        |  FROM lineitem GROUP BY l_suppkey),
        |t AS (
        |  SELECT CAST(sum(cnt) AS DOUBLE) AS tot, CAST(count(*) AS BIGINT) AS n_keys,
        |    CAST(max(cnt) AS BIGINT) AS max_cnt
        |  FROM k)
        |SELECT key, cnt, CAST(cnt AS DOUBLE) / tot AS share, n_keys, max_cnt
        |FROM k CROSS JOIN t
        |ORDER BY cnt DESC, key LIMIT 15""".stripMargin) { (s, dir) =>
      // join-key skew diagnostic: the heaviest keys and their share of
      // the table — what you run BEFORE choosing salting/AQE settings.
      // One partial+final count by key, PERSISTED (the key table feeds
      // both the stats row and the head — a twice-referenced CTE would
      // re-scan the fact table); head is TakeOrdered, stats broadcast.
      val k = Tables(s, dir, "lineitem")
        .groupBy(col("l_suppkey").as("key"))
        .agg(count(lit(1)).cast("bigint").as("cnt"))
      // deliberately not unpersisted: one row per key, LRU-evicted
      k.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val t = k.agg(sum("cnt").cast("double").as("tot"),
        count(lit(1)).cast("bigint").as("n_keys"),
        max("cnt").cast("bigint").as("max_cnt"))
      k.crossJoin(broadcast(t))
        .selectExpr("key", "cnt", "CAST(cnt AS DOUBLE) / tot AS share",
          "n_keys", "max_cnt")
        .orderBy(col("cnt").desc, col("key")).limit(15)
    },

    QueryDef("q_chisq",
      """WITH o AS (
        |  SELECT lang, source, CAST(count(*) AS BIGINT) AS obs
        |  FROM documents GROUP BY lang, source),
        |rt AS (SELECT lang, CAST(sum(obs) AS BIGINT) AS rtot FROM o GROUP BY lang),
        |ct AS (SELECT source, CAST(sum(obs) AS BIGINT) AS ctot FROM o GROUP BY source),
        |n AS (SELECT CAST(sum(obs) AS DOUBLE) AS nn FROM o),
        |grid AS (SELECT rt.lang, rt.rtot, ct.source, ct.ctot FROM rt CROSS JOIN ct),
        |cells AS (
        |  SELECT CAST(coalesce(o.obs, 0) AS DOUBLE) AS od,
        |    (CAST(g.rtot AS DOUBLE) * CAST(g.ctot AS DOUBLE)) / n.nn AS e
        |  FROM grid g
        |  LEFT JOIN o ON g.lang = o.lang AND g.source = o.source
        |  CROSS JOIN n),
        |terms AS (
        |  SELECT CAST(round(((od - e) * (od - e) / e) * 1000000) AS BIGINT) AS t6
        |  FROM cells),
        |dims AS (
        |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM rt) AS nr,
        |         (SELECT CAST(count(*) AS BIGINT) FROM ct) AS nc)
        |SELECT CAST(sum(t6) AS DOUBLE) / CAST(1000000 AS DOUBLE) AS chi2,
        |  (SELECT (nr - 1) * (nc - 1) FROM dims) AS dof
        |FROM terms""".stripMargin) { (s, dir) =>
      // chi-square independence of lang x source. Per-cell terms are one
      // shared IEEE tree over exact counts, scaled into BIGINT
      // micro-units BEFORE the sum (cell order can't perturb the total).
      // The contingency table `o` is ONE scan, persisted — four CTE
      // references would otherwise re-scan documents four times
      // (the q_funnel lesson); the oracle keeps the CTE form.
      val o = Tables(s, dir, "documents")
        .groupBy("lang", "source")
        .agg(count(lit(1)).cast("bigint").as("obs"))
      // deliberately not unpersisted: |langs x sources| rows, LRU-evicted
      o.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val rt = o.groupBy("lang").agg(sum("obs").cast("bigint").as("rtot"))
      val ct = o.groupBy("source").agg(sum("obs").cast("bigint").as("ctot"))
      val n = o.agg(sum("obs").cast("double").as("nn"))
      val cells = rt.crossJoin(ct)
        .join(o, Seq("lang", "source"), "left")
        .crossJoin(broadcast(n))
        .selectExpr("CAST(coalesce(obs, 0) AS DOUBLE) AS od",
          "(CAST(rtot AS DOUBLE) * CAST(ctot AS DOUBLE)) / nn AS e")
      val dims = rt.agg(count(lit(1)).cast("bigint").as("nr"))
        .crossJoin(ct.agg(count(lit(1)).cast("bigint").as("nc")))
      cells
        .selectExpr("CAST(round(((od - e) * (od - e) / e) * 1000000) AS BIGINT) AS t6")
        .agg(expr("CAST(sum(t6) AS DOUBLE) / CAST(1000000 AS DOUBLE)").as("chi2"))
        .crossJoin(broadcast(dims))
        .selectExpr("chi2", "(nr - 1) * (nc - 1) AS dof")
    },

    QueryDef("q_ts_anomaly",
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE user_id < 40),
        |w AS (
        |  SELECT user_id, event_id, cents,
        |    count(*) OVER wr AS n,
        |    sum(cents) OVER wr AS s1,
        |    sum(cents * cents) OVER wr AS s2
        |  FROM e
        |  WINDOW wr AS (PARTITION BY user_id ORDER BY tus RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)),
        |z2 AS (
        |  SELECT user_id, event_id,
        |    CASE WHEN n >= 2 AND (n * s2 - s1 * s1) > 0 THEN
        |      round(CAST(n * cents - s1 AS DOUBLE) /
        |        sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE) * (CAST(n AS DOUBLE) / (CAST(n AS DOUBLE) - 1.0))), 6)
        |    END AS z
        |  FROM w)
        |SELECT user_id, event_id, z, (abs(z) > 2.0) AS is_anomaly
        |FROM z2 ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      // trailing z-score anomaly flag: both moments come from the SAME
      // key-partitioned RANGE window (exact integer sums), the z closed
      // form is one shared IEEE expression tree
      val e = Tables.events(s, dir)
        .filter(col("user_id") < 40)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("tus"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        .withColumn("cents2", expr("cents * cents"))
      val m1 = TimeSeries.trailing(e, Seq("user_id"), "tus", "cents",
        back = 600000000L, prefix = "r1")
      val m2 = TimeSeries.trailing(m1, Seq("user_id"), "tus", "cents2",
        back = 600000000L, prefix = "r2")
      m2.withColumn("z", expr(
          """CASE WHEN r1_cnt >= 2 AND (r1_cnt * r2_sum - r1_sum * r1_sum) > 0 THEN
            |  round(CAST(r1_cnt * cents - r1_sum AS DOUBLE) /
            |    sqrt(CAST(r1_cnt * r2_sum - r1_sum * r1_sum AS DOUBLE) * (CAST(r1_cnt AS DOUBLE) / (CAST(r1_cnt AS DOUBLE) - 1.0))), 6)
            |END""".stripMargin))
        .select(col("user_id"), col("event_id"), col("z"),
          (abs(col("z")) > 2.0).as("is_anomaly"))
        .orderBy("user_id", "event_id")
    },

    QueryDef("q_ab_test",
      """WITH assign AS (
        |  SELECT user_id, user_id % 2 AS variant,
        |    max(CASE WHEN event_type = 'purchase' AND value > 400 THEN 1 ELSE 0 END) AS converted
        |  FROM events GROUP BY user_id),
        |arms AS (
        |  SELECT variant,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(converted) AS DOUBLE) AS k
        |  FROM assign GROUP BY variant),
        |wide AS (
        |  SELECT
        |    max(CASE WHEN variant = 0 THEN n END) AS n0,
        |    max(CASE WHEN variant = 0 THEN k END) AS k0,
        |    max(CASE WHEN variant = 1 THEN n END) AS n1,
        |    max(CASE WHEN variant = 1 THEN k END) AS k1
        |  FROM arms)
        |SELECT CAST(n0 AS BIGINT) AS n0, CAST(k0 AS BIGINT) AS k0,
        |  CAST(n1 AS BIGINT) AS n1, CAST(k1 AS BIGINT) AS k1,
        |  round(k0 / n0 - k1 / n1, 6) AS lift,
        |  CASE WHEN (k0 + k1) = 0 OR (k0 + k1) = (n0 + n1) THEN CAST(NULL AS DOUBLE) ELSE
        |  round((k0 / n0 - k1 / n1) /
        |    sqrt(((k0 + k1) / (n0 + n1)) * (1.0 - (k0 + k1) / (n0 + n1)) * (1.0 / n0 + 1.0 / n1)), 6)
        |  END AS z
        |FROM wide""".stripMargin) { (s, dir) =>
      // two-proportion z-test (A/B significance): per-user conversion by
      // a deterministic variant split; counts are exact, the z closed
      // form is one shared IEEE tree over them
      Tables.registerAll(s, dir)
      s.sql(
        """WITH assign AS (
          |  SELECT user_id, user_id % 2 AS variant,
          |    max(CASE WHEN event_type = 'purchase' AND value > 400 THEN 1 ELSE 0 END) AS converted
          |  FROM events GROUP BY user_id),
          |arms AS (
          |  SELECT variant,
          |    CAST(count(*) AS DOUBLE) AS n,
          |    CAST(sum(converted) AS DOUBLE) AS k
          |  FROM assign GROUP BY variant),
          |wide AS (
          |  SELECT
          |    max(CASE WHEN variant = 0 THEN n END) AS n0,
          |    max(CASE WHEN variant = 0 THEN k END) AS k0,
          |    max(CASE WHEN variant = 1 THEN n END) AS n1,
          |    max(CASE WHEN variant = 1 THEN k END) AS k1
          |  FROM arms)
          |SELECT CAST(n0 AS BIGINT) AS n0, CAST(k0 AS BIGINT) AS k0,
          |  CAST(n1 AS BIGINT) AS n1, CAST(k1 AS BIGINT) AS k1,
          |  round(k0 / n0 - k1 / n1, 6) AS lift,
          |  CASE WHEN (k0 + k1) = 0 OR (k0 + k1) = (n0 + n1) THEN CAST(NULL AS DOUBLE) ELSE
          |  round((k0 / n0 - k1 / n1) /
          |    sqrt(((k0 + k1) / (n0 + n1)) * (1.0 - (k0 + k1) / (n0 + n1)) * (1.0 / n0 + 1.0 / n1)), 6)
          |  END AS z
          |FROM wide""".stripMargin)
    },

    QueryDef("q_checksum",
      """WITH cast4 AS (
        |  SELECT CAST(l_orderkey AS VARCHAR) AS c1,
        |    CAST(l_linenumber AS VARCHAR) AS c2,
        |    l_returnflag AS c3,
        |    CAST(CAST(round(l_quantity * 100) AS BIGINT) AS VARCHAR) AS c4
        |  FROM lineitem)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(('0x' || substr(md5(
        |    CAST(length(c1) AS VARCHAR) || ':' || c1
        |    || '|' || CAST(length(c2) AS VARCHAR) || ':' || c2
        |    || '|' || CAST(length(c3) AS VARCHAR) || ':' || c3
        |    || '|' || CAST(length(c4) AS VARCHAR) || ':' || c4
        |  ), 1, 15))::BIGINT) AS VARCHAR) AS fp
        |FROM cast4""".stripMargin) { (s, dir) =>
      // order-independent table fingerprint: the SAME (n_rows, fp) pair
      // from both engines IS the cross-engine data contract — floats
      // enter as exact cents, everything else as portable strings;
      // values are length-prefixed so '|' inside data can't shift a
      // column boundary (Checksum.fingerprint contract)
      graft.operators.Checksum.fingerprint(
        Tables(s, dir, "lineitem").selectExpr(
          "CAST(l_orderkey AS STRING) AS c1",
          "CAST(l_linenumber AS STRING) AS c2",
          "l_returnflag AS c3",
          "CAST(CAST(round(l_quantity * 100) AS BIGINT) AS STRING) AS c4"),
        Seq("c1", "c2", "c3", "c4"))
    },

    QueryDef("q_topn_others",
      """WITH c AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS cnt
        |  FROM documents GROUP BY source),
        |top AS (SELECT source, cnt FROM c ORDER BY cnt DESC, source LIMIT 5),
        |others AS (
        |  SELECT CAST(sum(cnt) AS BIGINT) AS ocnt FROM c
        |  WHERE source NOT IN (SELECT source FROM top))
        |SELECT source, cnt FROM (
        |  SELECT source, cnt, 0 AS grp FROM top
        |  UNION ALL
        |  SELECT 'other' AS source, ocnt AS cnt, 1 AS grp FROM others WHERE ocnt IS NOT NULL
        |) u ORDER BY grp, cnt DESC, source""".stripMargin) { (s, dir) =>
      // BI top-N + "others" rollup: the head is a TakeOrdered over the
      // aggregated counts; the tail folds into one row via an anti-join
      // (never ranked row-by-row). The counts frame is persisted — it
      // feeds the head AND the tail.
      val c = Tables(s, dir, "documents")
        .groupBy("source").agg(count(lit(1)).cast("bigint").as("cnt"))
      // deliberately not unpersisted: one row per source, LRU-evicted
      c.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val top = c.orderBy(col("cnt").desc, col("source")).limit(5)
      val others = c.join(top.select("source"), Seq("source"), "left_anti")
        .agg(sum("cnt").cast("bigint").as("cnt"))
        .filter(col("cnt").isNotNull)
        .select(lit("other").as("source"), col("cnt"), lit(1).as("grp"))
      top.withColumn("grp", lit(0)).unionByName(others)
        .orderBy(col("grp"), col("cnt").desc, col("source"))
        .select("source", "cnt")
    },

    QueryDef("q_ts_gaps",
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus
        |  FROM events WHERE user_id < 60),
        |d AS (
        |  SELECT user_id, event_id, tus,
        |    lead(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS nxt
        |  FROM e)
        |SELECT user_id, event_id, tus AS gap_start_us, nxt - tus AS gap_us
        |FROM d WHERE nxt IS NOT NULL AND nxt - tus > 1800000000
        |ORDER BY user_id, gap_start_us, event_id""".stripMargin) { (s, dir) =>
      // missing-data report: spans over 30 minutes with no events per
      // user — pure integer window arithmetic, key-partitioned
      val e = Tables.events(s, dir).filter(col("user_id") < 60)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("tus"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
      e.withColumn("nxt", lead(col("tus"), 1).over(w))
        .filter(col("nxt").isNotNull && (col("nxt") - col("tus")) > 1800000000L)
        .select(col("user_id"), col("event_id"),
          col("tus").as("gap_start_us"), (col("nxt") - col("tus")).as("gap_us"))
        .orderBy("user_id", "gap_start_us", "event_id")
    },

    QueryDef("q_ts_twap",
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE user_id < 60),
        |d AS (
        |  SELECT user_id, cents,
        |    lead(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) - tus AS dur
        |  FROM e)
        |SELECT user_id, CAST(count(dur) AS BIGINT) AS n_spans,
        |  CAST(sum(cents * dur) AS DOUBLE) / CAST(sum(dur) AS DOUBLE) / 100.0 AS twap
        |FROM d WHERE dur IS NOT NULL AND dur > 0
        |GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      // time-weighted average: each sample weighted by how long it was
      // current (duration to the next sample). Integer cent x micro
      // products sum exactly per key; ONE division at the end.
      val e = Tables.events(s, dir).filter(col("user_id") < 60)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("tus"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
      e.withColumn("dur", lead(col("tus"), 1).over(w) - col("tus"))
        .filter(col("dur").isNotNull && col("dur") > 0)
        .groupBy("user_id")
        .agg(count(lit(1)).cast("bigint").as("n_spans"),
          expr("CAST(sum(cents * dur) AS DOUBLE) / CAST(sum(dur) AS DOUBLE) / 100.0").as("twap"))
        .orderBy("user_id")
    },

    QueryDef("q_retention",
      """WITH f AS (
        |  SELECT user_id, min(date_trunc('week', CAST(ts AS TIMESTAMP))) AS cohort
        |  FROM events GROUP BY user_id),
        |a AS (
        |  SELECT DISTINCT user_id, date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk
        |  FROM events)
        |SELECT CAST(f.cohort AS TIMESTAMP) AS cohort,
        |  CAST((epoch_us(a.wk) - epoch_us(f.cohort)) // 604800000000 AS BIGINT) AS week_n,
        |  CAST(count(*) AS BIGINT) AS active_users
        |FROM f JOIN a ON f.user_id = a.user_id
        |GROUP BY f.cohort, week_n
        |ORDER BY cohort, week_n""".stripMargin) { (s, dir) =>
      // cohort retention: users grouped by first-seen week, counted per
      // active week offset. Two aggregates + one equi-join on user_id
      // (the cohort frame is per-user tiny and broadcasts). Week
      // arithmetic in exact epoch integers — both engines truncate
      // weeks to Monday 00:00, so offsets are exact multiples.
      Tables.registerAll(s, dir)
      s.sql(
        """WITH f AS (
          |  SELECT user_id, min(date_trunc('week', CAST(ts AS TIMESTAMP))) AS cohort
          |  FROM events GROUP BY user_id),
          |a AS (
          |  SELECT DISTINCT user_id, date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk
          |  FROM events)
          |SELECT CAST(f.cohort AS TIMESTAMP_NTZ) AS cohort,
          |  CAST((unix_micros(a.wk) - unix_micros(f.cohort)) div 604800000000 AS BIGINT) AS week_n,
          |  CAST(count(*) AS BIGINT) AS active_users
          |FROM f JOIN a ON f.user_id = a.user_id
          |GROUP BY f.cohort, week_n
          |ORDER BY cohort, week_n""".stripMargin)
    },

    QueryDef("q_sample_balanced",
      """WITH h AS (
        |  SELECT doc_id, lang,
        |    (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT) AS hv
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rnk
        |  FROM h),
        |m AS (
        |  SELECT CAST(min(c) AS BIGINT) AS minc
        |  FROM (SELECT count(*) AS c FROM documents GROUP BY lang) t)
        |SELECT doc_id, lang FROM r CROSS JOIN m
        |WHERE rnk <= minc ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Sampling.balanced(Tables(s, dir, "documents"), "lang", "doc_id")
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    QueryDef("q_sample_mixture",
      """WITH m AS (
        |  SELECT doc_id, lang,
        |    (CASE lang WHEN 'de' THEN 1000000 WHEN 'en' THEN 2500000
        |               WHEN 'zh' THEN 1750000 ELSE 400000 END) AS rppm,
        |    (('0x' || substr(md5('mix1:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000) AS h
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, lang,
        |    (rppm // 1000000) + (CASE WHEN h < (rppm % 1000000) THEN 1 ELSE 0 END) AS copies
        |  FROM m)
        |SELECT doc_id, lang, copy FROM (
        |  SELECT doc_id, lang, CAST(unnest(range(0, copies)) AS BIGINT) AS copy FROM c
        |) t ORDER BY doc_id, copy""".stripMargin) { (s, dir) =>
      Sampling.mixture(
          Tables(s, dir, "documents").select("doc_id", "lang"),
          "lang", "doc_id",
          rates = Map("en" -> 2.5, "zh" -> 1.75, "de" -> 1.0),
          defaultRate = 0.4, seed = "mix1")
        .select(col("doc_id"), col("lang"), col("copy"))
        .orderBy("doc_id", "copy")
    },

    // ---- Population stability index (distribution drift) ----------------
    // the ML-ops drift gate: PSI between two deterministic event
    // snapshots over fixed equi-width value bins, +1-smoothed so empty
    // bins never divide by zero. Counts are exact integers; each bin's
    // contribution is one shared IEEE tree (two divisions, one ln) over
    // those exact counts, rounded at 6dp — the transcendental policy
    // every other stat query uses. One grouped aggregate + a 7-row fold:
    // nothing but bin counts ever crosses the wire.
    QueryDef("q_psi",
      """WITH b AS (
        |  SELECT least(6, CAST(floor(value / 50) AS INT)) AS bucket,
        |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS isr
        |  FROM events),
        |c AS (
        |  SELECT bucket, CAST(sum(isr) AS BIGINT) AS nr,
        |    CAST(sum(1 - isr) AS BIGINT) AS nc
        |  FROM b GROUP BY bucket),
        |one AS (
        |  SELECT list(nr ORDER BY bucket) AS nrs, list(nc ORDER BY bucket) AS ncs,
        |    CAST(sum(nr) AS BIGINT) AS tr, CAST(sum(nc) AS BIGINT) AS tc,
        |    CAST(count(*) AS BIGINT) AS k
        |  FROM c)
        |SELECT tr AS n_ref, tc AS n_cur, k AS n_bins,
        |  round(list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, CAST(k + 1 AS INT)),
        |    i -> ((CAST(nrs[i] + 1 AS DOUBLE) / CAST(tr + k AS DOUBLE))
        |          - (CAST(ncs[i] + 1 AS DOUBLE) / CAST(tc + k AS DOUBLE)))
        |         * ln((CAST(nrs[i] + 1 AS DOUBLE) / CAST(tr + k AS DOUBLE))
        |              / (CAST(ncs[i] + 1 AS DOUBLE) / CAST(tc + k AS DOUBLE))))),
        |    (x, y) -> x + y), 6) AS psi
        |FROM one""".stripMargin) { (s, dir) =>
      Tables(s, dir, "events")
        .selectExpr("least(6, CAST(floor(value / 50) AS INT)) AS bucket",
          "IF(user_id % 2 = 0, 1, 0) AS isr")
        .groupBy("bucket")
        .agg(expr("CAST(sum(isr) AS BIGINT)").as("nr"),
          expr("CAST(sum(1 - isr) AS BIGINT)").as("nc"))
        .agg(
          expr("transform(array_sort(collect_list(struct(bucket, nr))), x -> x.nr)").as("nrs"),
          expr("transform(array_sort(collect_list(struct(bucket, nc))), x -> x.nc)").as("ncs"),
          expr("CAST(sum(nr) AS BIGINT)").as("tr"),
          expr("CAST(sum(nc) AS BIGINT)").as("tc"),
          expr("CAST(count(*) AS BIGINT)").as("k"))
        .selectExpr("tr AS n_ref", "tc AS n_cur", "k AS n_bins",
          // k = 0 guard: sequence(1, 0) is the DESCENDING [1, 0] in
          // Spark (not empty like DuckDB's range), so the fold would hit
          // element_at(_, 0) and raise on an empty events table; the
          // oracle's empty fold yields its 0.0 seed — IF matches that
          // and evaluates the taken branch only. The fold itself is the
          // SHARED Profile.psiFoldExpr, same text the streaming
          // EventPipeline.driftGate evaluates per window
          "round(IF(k = 0, CAST(0 AS DOUBLE), " +
            graft.operators.Profile.psiFoldExpr(
              refNs = "nrs", curNs = "ncs",
              refTot = "tr", curTot = "tc", k = "k") +
            "), 6) AS psi")
    },

    // ---- Exponentially weighted moving average --------------------------
    // trailing 8-term EWMA (α = 1/4) per user series — the smoothing
    // stage under the q_ts_anomaly z-gate. Every weight (3/4)^j is an
    // EXACT dyadic rational (3^j · 2^-2j), cents·weight products stay
    // far under 2^53, and the missing-lag ramp-up excludes a term from
    // numerator AND denominator symmetrically — so num and den are
    // bit-exact on both engines and the single IEEE division needs NO
    // rounding (the q_ts_rolling decayed_cents policy: a round(x, 6)
    // would land on .5 boundaries where engines' modes disagree).
    // Fixed-depth lags keep the window O(1) state per row at any scale;
    // the window is key-partitioned.
    QueryDef("q_ts_ewma", {
      val w = Array("1.0", "0.75", "0.5625", "0.421875", "0.31640625",
        "0.2373046875", "0.177978515625", "0.13348388671875")
      val num = (0 until 8).map {
        case 0 => "CAST(cents AS DOUBLE) * 1.0"
        case j => s"coalesce(CAST(lag(cents, $j) OVER wo AS DOUBLE) * ${w(j)}, 0.0)"
      }.mkString("(", "\n     + ", ")")
      val den = (0 until 8).map {
        case 0 => "1.0"
        case j => s"CASE WHEN lag(cents, $j) OVER wo IS NULL THEN 0.0 ELSE ${w(j)} END"
      }.mkString("(", "\n     + ", ")")
      s"""WITH e AS (
         |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
         |    CAST(round(value * 100) AS BIGINT) AS cents
         |  FROM events WHERE user_id < 40)
         |SELECT user_id, event_id,
         |  $num
         |  / $den AS ewma_cents
         |FROM e
         |WINDOW wo AS (PARTITION BY user_id ORDER BY tus, event_id)
         |ORDER BY user_id, event_id""".stripMargin
    }) { (s, dir) =>
      val w = Array("1.0", "0.75", "0.5625", "0.421875", "0.31640625",
        "0.2373046875", "0.177978515625", "0.13348388671875")
      val num = (0 until 8).map {
        case 0 => "CAST(cents AS DOUBLE) * 1.0"
        case j => s"coalesce(CAST(lag(cents, $j) OVER wo AS DOUBLE) * ${w(j)}, 0.0)"
      }.mkString("(", " + ", ")")
      val den = (0 until 8).map {
        case 0 => "1.0"
        case j => s"CASE WHEN lag(cents, $j) OVER wo IS NULL THEN 0.0 ELSE ${w(j)} END"
      }.mkString("(", " + ", ")")
      // only events is needed — a temp view keeps the query runnable on
      // partial test fixtures (registerAll would demand every table)
      Tables(s, dir, "events").createOrReplaceTempView("_ewma_events")
      s.sql(
        s"""SELECT user_id, event_id, $num / $den AS ewma_cents
           |FROM (
           |  SELECT user_id, event_id,
           |    unix_micros(CAST(ts AS TIMESTAMP)) AS tus,
           |    CAST(round(value * 100) AS BIGINT) AS cents
           |  FROM _ewma_events WHERE user_id < 40)
           |WINDOW wo AS (PARTITION BY user_id ORDER BY tus, event_id)
           |ORDER BY user_id, event_id""".stripMargin)
    }
  )
}
