package graft.queries

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.operators.Merge
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

  /** Moment sums as exact decimals, closed forms in identical doubles. */
  private val corrSql =
    """WITH sums AS (
      |  SELECT l_returnflag,
      |    CAST(count(*) AS DOUBLE) AS n,
      |    CAST(sum(CAST(round(l_quantity * 100) AS DECIMAL(18,0))) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(round(l_extendedprice * 100) AS DECIMAL(18,0))) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(round(l_quantity * 100) AS DECIMAL(18,0)) * CAST(round(l_quantity * 100) AS DECIMAL(18,0))) AS DOUBLE) AS sxx,
      |    CAST(sum(CAST(round(l_extendedprice * 100) AS DECIMAL(18,0)) * CAST(round(l_extendedprice * 100) AS DECIMAL(18,0))) AS DOUBLE) AS syy,
      |    CAST(sum(CAST(round(l_quantity * 100) AS DECIMAL(18,0)) * CAST(round(l_extendedprice * 100) AS DECIMAL(18,0))) AS DOUBLE) AS sxy
      |  FROM lineitem GROUP BY l_returnflag),
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
    */
  private val funnelSql =
    """WITH s1 AS (
      |  SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t1
      |  FROM events WHERE event_type = 'view' GROUP BY user_id),
      |s2 AS (
      |  SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t2
      |  FROM events e JOIN s1 ON e.user_id = s1.user_id
      |  WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > s1.t1
      |  GROUP BY e.user_id),
      |s3 AS (
      |  SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t3
      |  FROM events e JOIN s2 ON e.user_id = s2.user_id
      |  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > s2.t2
      |  GROUP BY e.user_id)
      |SELECT stage, users FROM (
      |  SELECT '1_view' AS stage, CAST(count(*) AS BIGINT) AS users FROM s1
      |  UNION ALL SELECT '2_click', CAST(count(*) AS BIGINT) FROM s2
      |  UNION ALL SELECT '3_purchase', CAST(count(*) AS BIGINT) FROM s3
      |) f ORDER BY stage""".stripMargin

  val all: Seq[QueryDef] = Seq(

    QueryDef("q_agg_corr", corrSql) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(corrSql)
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

    QueryDef("q_funnel", funnelSql) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(funnelSql)
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
        |ORDER BY user_id, effective_from, event_type""".stripMargin) { (s, dir) =>
      val changes = Tables.events(s, dir)
        .filter(col("user_id") < 30)
        .select("user_id", "event_type", "ts", "event_id")
      Merge.scd2(changes, Seq("user_id"), "ts", tieBreak = Seq("event_id"))
        .select(col("user_id"), col("event_type"),
          col("effective_from").cast("timestamp_ntz").as("effective_from"),
          col("effective_to").cast("timestamp_ntz").as("effective_to"),
          col("is_current"))
        .orderBy("user_id", "effective_from", "event_type")
    }
  )
}
