package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data profiling: per-column health stats (row/null/distinct counts,
  * min/max) in ONE scan — the operator behind ingest monitoring and
  * schema-drift checks.
  *
  * All columns aggregate in a single `agg` over one pass of the data
  * (profiling column-by-column would re-scan the table per column); the
  * wide 1-row result is then stacked to long form. The multiple
  * COUNT(DISTINCT)s expand the aggregate, which is the documented cost
  * of exact distincts — swap in approx_count_distinct for corpus-scale
  * profiling where ±2% is fine.
  */
object Profile {

  /** SQL text of the +1-smoothed PSI (population stability index) fold:
    * Σ_bins (p_ref − p_cur) · ln(p_ref/p_cur) with p = (n_i + 1) /
    * (total + k). ONE shared definition for the batch `q_psi` snapshot
    * check and the streaming `EventPipeline.driftGate` — the two are
    * documented twins, and separate copies of the formula would
    * silently desynchronize under a smoothing tweak. `refNs`/`curNs`
    * are SQL expressions for 1-indexed arrays of per-bin BIGINT counts;
    * `refTot`/`curTot`/`k` are SQL expressions for the totals and bin
    * count. Caller guards k = 0 (Spark's sequence(1, 0) is the
    * DESCENDING [1, 0], not empty).
    */
  def psiFoldExpr(refNs: String, curNs: String,
                  refTot: String, curTot: String, k: String): String =
    s"""aggregate(sequence(1, CAST($k AS INT)), CAST(0 AS DOUBLE), (acc, i) -> acc +
       |  ((CAST(element_at($refNs, i) + 1 AS DOUBLE) / CAST($refTot + $k AS DOUBLE))
       |   - (CAST(element_at($curNs, i) + 1 AS DOUBLE) / CAST($curTot + $k AS DOUBLE)))
       |  * ln((CAST(element_at($refNs, i) + 1 AS DOUBLE) / CAST($refTot + $k AS DOUBLE))
       |       / (CAST(element_at($curNs, i) + 1 AS DOUBLE) / CAST($curTot + $k AS DOUBLE))))"""
      .stripMargin

  def summarize(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val aggs = count(lit(1)).cast("bigint").as("n_rows") +:
      cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).cast("bigint").as(s"${c}__nnull"),
        countDistinct(col(c)).cast("bigint").as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max")))
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', ${c}__nnull, ${c}__nd, ${c}__min, ${c}__max").mkString(", ")
    row.selectExpr("n_rows",
        s"stack(${cols.length}, $stackArgs) AS (column, n_null, n_distinct, min_val, max_val)")
      .select("column", "n_rows", "n_null", "n_distinct", "min_val", "max_val")
  }

  /** Snapshot-to-snapshot drift report: [[summarize]] both frames (one
    * scan each), join per column, and flag the distribution shifts that
    * page an ingest on-call — null-rate moves beyond 5 points, distinct-
    * per-row rate moves beyond ±20% relative, min/max boundary changes.
    * Every flag is a CROSS-MULTIPLIED integer compare (e.g.
    * `20·|nullA·rowsB − nullB·rowsA| > rowsA·rowsB` is
    * `|nullRateA − nullRateB| > 0.05` without a division) — exact on
    * any engine, no float thresholds. Columns must avoid raw DOUBLE
    * min/max evidence (stringification differs across engines); profile
    * integer/string columns or pre-scale to cents.
    */
  def drift(a: DataFrame, b: DataFrame, cols: Seq[String]): DataFrame = {
    val sa = summarize(a, cols).select(
      col("column"), col("n_rows").as("n_a"), col("n_null").as("null_a"),
      col("n_distinct").as("nd_a"), col("min_val").as("min_a"),
      col("max_val").as("max_a"))
    val sb = summarize(b, cols).select(
      col("column"), col("n_rows").as("n_b"), col("n_null").as("null_b"),
      col("n_distinct").as("nd_b"), col("min_val").as("min_b"),
      col("max_val").as("max_b"))
    // cross-multiplies run in DECIMAL(38,0): BIGINT products overflow
    // around 3e9 rows per side (ANSI mode raises, non-ANSI silently
    // flips the verdict) and billion-row snapshots are the normal case
    // for this operator. An EMPTY side is itself the drift: the rate
    // compares are vacuously false at n=0, so guard explicitly — and
    // min/max of an all-NULL column is NULL, where `<>` would return
    // NULL and a downstream filter would silently swallow the alarm, so
    // the range compare is null-safe (`<=>`).
    val dec = "CAST(%s AS DECIMAL(38,0))"
    sa.join(sb, "column")
      .withColumn("null_drift", expr(
        "IF(n_a = 0 OR n_b = 0, n_a <> n_b, " +
          s"20 * abs(${dec.format("null_a")} * n_b - ${dec.format("null_b")} * n_a) " +
          s"> ${dec.format("n_a")} * n_b)"))
      .withColumn("distinct_drift", expr(
        "IF(n_a = 0 OR n_b = 0, n_a <> n_b, " +
          s"5 * abs(${dec.format("nd_a")} * n_b - ${dec.format("nd_b")} * n_a) " +
          s"> ${dec.format("nd_b")} * n_a)"))
      .withColumn("range_changed",
        expr("NOT (min_a <=> min_b AND max_a <=> max_b)"))
  }

  /** One declarative data-quality constraint: `pass` and `observed` are
    * AGGREGATE SQL expressions over the checked frame's columns —
    * `pass` must be boolean (the verdict), `observed` is the evidence
    * value reported alongside it (any type; stringified).
    */
  final case class Check(name: String, pass: String, observed: String)

  /** Deequ-style constraint validation in ONE pass: every rule's
    * verdict AND evidence aggregate in a single `agg` over one scan of
    * the data (rule-by-rule evaluation would re-scan the table per
    * rule — at 100 TB the scan IS the cost), then the wide 1-row result
    * stacks to one `(check_name, pass, observed)` row per rule — the
    * gate-an-ingest / fail-a-pipeline-run primitive on top of
    * [[summarize]]'s open-ended profiling.
    *
    * Completeness, uniqueness, ranges, domain membership, and row-count
    * floors all express as plain aggregate pairs, e.g.
    * `Check("unique_id", "count(DISTINCT id) = count(id)",
    * "count(id) - count(DISTINCT id)")`.
    */
  def checks(df: DataFrame, rules: Seq[Check]): DataFrame = {
    require(rules.nonEmpty, "need at least one check")
    val aggs = rules.zipWithIndex.flatMap { case (r, i) =>
      Seq(expr(r.pass).as(s"_p$i"),
        expr(s"CAST((${r.observed}) AS STRING)").as(s"_o$i"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.zipWithIndex
      .map { case (r, i) => s"'${r.name.replace("'", "''")}', _p$i, _o$i" }
      .mkString(", ")
    row.selectExpr(
      s"stack(${rules.length}, $stackArgs) AS (check_name, pass, observed)")
  }
}
