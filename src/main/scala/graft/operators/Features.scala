package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group feature scaling for ML data prep: z-score and min-max
  * normalization computed with one partial-combining aggregate per
  * group, broadcast back onto the rows. No window over the full table
  * (a `avg(...) OVER (PARTITION BY g)` window would sort and buffer
  * every row per group; the agg+join shape is two narrow passes and the
  * group-stats side is tiny — broadcastable at any corpus size so long
  * as the GROUP count, not the row count, stays modest).
  */
object Features {

  /** Attach a per-group stats frame back onto the rows NULL-SAFELY
    * (`<=>`) — the same contract as [[weightedMedian]]: a plain
    * equi-join on the keys rejects NULL = NULL and silently drops every
    * row of a NULL-key group, the 'unknown' bucket a caller scaling an
    * optional dimension still expects output for. Empty `keys` = global
    * stats, attached as a broadcast cross join (one stats row).
    */
  private def attachStats(df: DataFrame, stats: DataFrame,
                          keys: Seq[String]): DataFrame =
    if (keys.isEmpty) df.crossJoin(broadcast(stats))
    else {
      val renamed = stats.select(
        keys.map(k => col(k).as(s"_sk_$k")) ++
          stats.columns.filterNot(keys.contains).map(col): _*)
      val cond = keys.map(k => col(k) <=> col(s"_sk_$k")).reduce(_ && _)
      df.join(broadcast(renamed), cond).drop(keys.map(k => s"_sk_$k"): _*)
    }

  /** Adds `<value>_z` (z-score, sample stddev) and `<value>_mm`
    * (min-max to [0,1]) per `keys` group. Constant groups (stddev 0 or
    * min=max) produce 0 for both — a defined value, not NULL/NaN, so
    * downstream models see a constant feature rather than holes.
    */
  def standardize(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    val stats = df.groupBy(keys.map(col): _*).agg(
      avg(col(valueCol)).as("_mu"),
      stddev_samp(col(valueCol)).as("_sd"),
      min(col(valueCol)).as("_mn"),
      max(col(valueCol)).as("_mx"))
    attachStats(df, stats, keys)
      .withColumn(s"${valueCol}_z",
        expr(s"IF(_sd IS NULL OR _sd = 0D, 0D, (CAST($valueCol AS DOUBLE) - _mu) / _sd)"))
      .withColumn(s"${valueCol}_mm",
        expr(s"IF(_mx = _mn, 0D, (CAST($valueCol AS DOUBLE) - _mn) / (CAST(_mx AS DOUBLE) - _mn))"))
      .drop("_mu", "_sd", "_mn", "_mx")
  }

  /** Robust scaling: `(x − median) / IQR` per group — the outlier-immune
    * alternative to z-scores (mean and stddev both move with every
    * outlier; median and IQR don't). Adds `<value>_r`, rounded to 6
    * decimals; constant groups (IQR 0) produce 0 like [[standardize]].
    * Median/quartiles are rounded to 6dp BEFORE the transform — the
    * same engine-portable bounds contract as [[winsorize]], with the
    * same exact-vs-sketch scale switch.
    */
  def robustScale(df: DataFrame, keys: Seq[String], valueCol: String,
                  exact: Boolean = true): DataFrame = {
    val q = if (exact) "percentile" else "approx_percentile"
    // ONE percentile buffer for all three quantiles — separate calls
    // each hold the group's values again (3x agg memory and merge cost;
    // measured 7.7 s vs 2.8 s on sf0.1 lineitem)
    val stats = df.groupBy(keys.map(col): _*)
      .agg(expr(
        s"transform($q(CAST($valueCol AS DOUBLE), array(0.25D, 0.5D, 0.75D)), v -> round(v, 6))")
        .as("_qs"))
      .selectExpr(keys :+ "_qs[0] AS _q1" :+ "_qs[1] AS _med" :+ "_qs[2] AS _q3": _*)
    attachStats(df, stats, keys)
      .withColumn(s"${valueCol}_r",
        expr(s"IF(_q3 = _q1, 0D, round((CAST($valueCol AS DOUBLE) - _med) / (_q3 - _q1), 6))"))
      .drop("_med", "_q1", "_q3")
  }

  /** Winsorize (clip) `valueCol` to its per-group [`lo`, `hi`] quantiles —
    * the standard outlier-robust prep before scaling. Adds
    * `<value>_w` (clipped, rounded to 6 decimals). Bounds are rounded to
    * 6 decimals BEFORE clipping so the contract is engine-portable: any
    * system computing the same linearly-interpolated quantiles produces
    * identical output.
    *
    * `exact = true` uses the exact interpolated percentile — the group's
    * values pass through one aggregation buffer, fine while groups fit an
    * executor. At 100 TB with huge groups set `exact = false`: a fixed-size
    * mergeable quantile sketch (approx_percentile) replaces the exact agg,
    * same two-pass agg+broadcast-join shape, bounded memory at any scale.
    */
  def winsorize(df: DataFrame, keys: Seq[String], valueCol: String,
                lo: Double = 0.05, hi: Double = 0.95,
                exact: Boolean = true): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo <= hi, "need 0 <= lo <= hi <= 1")
    val pct = if (exact) "percentile" else "approx_percentile"
    // one shared percentile buffer for both bounds (see robustScale)
    val stats = df.groupBy(keys.map(col): _*)
      .agg(expr(
        s"transform($pct(CAST($valueCol AS DOUBLE), array(${lo}D, ${hi}D)), v -> round(v, 6))")
        .as("_ps"))
      .selectExpr(keys :+ "_ps[0] AS _plo" :+ "_ps[1] AS _phi": _*)
    attachStats(df, stats, keys)
      .withColumn(s"${valueCol}_w",
        expr(s"round(least(greatest(CAST($valueCol AS DOUBLE), _plo), _phi), 6)"))
      .drop("_plo", "_phi")
  }

  /** Per-group WEIGHTED median: the smallest value whose cumulative
    * weight reaches half the group's total — the robust center of a
    * weighted distribution (revenue-weighted price points, token-
    * weighted quality medians). `valueCol` and `weightCol` must be
    * exact integers (caller scales to cents): the cumulative sum, the
    * doubled-compare `2·cum >= total`, and the final min are then all
    * integer arithmetic — no interpolation, no rounding, identical on
    * any engine.
    *
    * Scale shape: ONE key-partitioned window pass (ordered by value +
    * `tieBreak` for a total order), the per-key totals broadcast back,
    * and a tiny final min per key. No global sort, no self-join.
    */
  def weightedMedian(df: DataFrame, keys: Seq[String], valueCol: String,
                     weightCol: String, tieBreak: Seq[String],
                     out: String = "wmedian"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((valueCol +: tieBreak).map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the totals join back NULL-SAFELY (`<=>`): a plain equi-join on the
    // keys would reject NULL = NULL and silently drop the whole
    // NULL-key group — the 'unknown' bucket a caller pivoting on an
    // optional dimension still expects a median for
    val tot = df.groupBy(keys.map(col): _*)
      .agg(sum(col(weightCol)).cast("bigint").as("_tw"))
      .select(keys.map(k => col(k).as(s"_tk_$k")) :+ col("_tw"): _*)
    val cond = keys.map(k => col(k) <=> col(s"_tk_$k")).reduce(_ && _)
    df.withColumn("_cum", sum(col(weightCol)).over(w).cast("bigint"))
      .join(broadcast(tot), cond)
      .filter(expr(s"2 * _cum >= _tw"))
      .groupBy(keys.map(col): _*)
      .agg(min(col(valueCol)).as(out))
  }

  /** Per-group equal-frequency (quantile) binning: rows of each key
    * group are assigned to `bins` rank-based buckets — the categorical
    * encoding of a skewed numeric feature (each bin carries ~equal row
    * count, unlike equi-width histograms). `orderCols` must be a TOTAL
    * order within the group (include a unique id as tiebreak): ntile on
    * a non-total order is free to break ties differently per run/engine,
    * and determinism is the whole contract here.
    *
    * One window, partitioned by the key — scale-safe for any key whose
    * group fits a task, which is the same contract every per-group rank
    * statistic has.
    */
  def quantileBin(df: DataFrame, keys: Seq[String],
                  orderCols: Seq[org.apache.spark.sql.Column], bins: Int,
                  out: String = "bin"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(bins >= 2, "need at least 2 bins")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
    df.withColumn(out, ntile(bins).over(w).cast("bigint"))
  }
}
