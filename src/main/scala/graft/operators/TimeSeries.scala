package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series regularization: turn irregular observations into a
  * fixed-step grid per key with last-observation-carried-forward — the
  * feature-engineering step that precedes any window model over event
  * data (and the batch analog of a streaming state store snapshot).
  */
object TimeSeries {

  /** Resample `df` onto a `step`-spaced grid per key, carrying each
    * value column forward from the latest observation at-or-before the
    * grid instant (LOCF). `tsCol` must be a numeric epoch column (pass
    * unix micros for timestamps); the grid starts at the first multiple
    * of `step` at-or-after each key's first observation — integer
    * ceiling arithmetic, because `ceil(x / step) * step` through doubles
    * is not exact above 2^53 and epoch-micros values live there.
    *
    * Physically: a tiny per-key min/max aggregate, a narrow grid
    * explode, then [[AsOfJoin.asof]]'s union-merge (one shuffle on the
    * key + one sort) — never a per-grid-point range probe. Rows per key
    * are span/step grid points; pick `step` accordingly.
    *
    * Keys with multiple observations at the same instant must be
    * pre-aggregated (same contract as [[AsOfJoin.asof]]).
    */
  /** The `step`-aligned grid spanning each key's [min, max] of `tsCol`
    * — the shared first stage of [[resample]] and [[interpolate]].
    *
    * A key whose span holds no aligned instant (start > hi) must yield
    * an empty grid, not a SparkIllegalArgumentException — sequence()
    * throws on start > stop with a positive step.
    *
    * Grid start = ceil(_lo / step) * step. Spark's `div` truncates
    * toward zero, which IS the ceiling for negative _lo (pre-epoch
    * timestamps) and the floor for positive _lo — so add 1 only in
    * the positive-with-remainder case. The (_lo + step - 1) form
    * would be wrong for _lo < 0: lo=-15, step=10 gives 0, not -10,
    * silently dropping valid grid instants.
    */
  private def gridOf(df: DataFrame, keys: Seq[String], tsCol: String,
                     step: Long): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(min(col(tsCol)).as("_lo"), max(col(tsCol)).as("_hi"))
      .withColumn("_start", expr(
        s"((_lo div $step) + IF(_lo % $step != 0 AND _lo > 0, 1, 0)) * $step"))
      .withColumn(tsCol, explode(expr(
        s"IF(_start > _hi, array(), sequence(_start, _hi, $step))")))
      .drop("_lo", "_hi", "_start")

  def resample(df: DataFrame, keys: Seq[String], tsCol: String,
               step: Long, valueCols: Seq[String]): DataFrame = {
    require(step > 0, "step must be positive")
    AsOfJoin.asof(gridOf(df, keys, tsCol, step), df, keys, tsCol, tsCol,
      valueCols)
  }

  /** [[resample]]'s linear twin: resample onto the `step` grid per key,
    * interpolating each grid instant between its neighboring
    * observations instead of carrying the last one forward. `valueCol`
    * must be an exact INTEGER column (caller scales money to cents) so
    * both interpolation endpoints are engine-exact; the interpolated
    * value `v0 + (v1-v0)·(t-t0)/(t1-t0)` is then ONE fixed-shape IEEE
    * expression over exact integers — bit-identical on any engine, no
    * rounding step. A grid instant sitting exactly on an observation
    * returns that observation; the instant at the key's last
    * observation (where no strictly-later neighbor exists) likewise.
    * Grid bounds and alignment are [[resample]]'s integer-ceiling
    * arithmetic; the same duplicate-(key, ts) precondition applies.
    *
    * Physically ONE pass: grid and observation rows union-merge through
    * a single key-partitioned sort, where a PRECEDING-frame `last`
    * finds (t0, v0) and a strictly-FOLLOWING-frame `first` finds
    * (t1, v1) — two frames over one Exchange+Sort, never a per-instant
    * range probe and never a second shuffle.
    */
  def interpolate(df: DataFrame, keys: Seq[String], tsCol: String,
                  valueCol: String, step: Long,
                  out: String = "v_lin"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(step > 0, "step must be positive")
    val grid = gridOf(df, keys, tsCol, step).withColumn("_side", lit(1))
    // observations sort BEFORE grid instants at equal ts (side 0 < 1):
    // the preceding frame then sees an exact-ts observation (inclusive
    // t0) while the following frame does not (strictly-later t1)
    val obs = df
      .select(keys.map(col) :+ col(tsCol) :+ col(valueCol).as("_v"): _*)
      .withColumn("_side", lit(0))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("_side").asc)
    grid.unionByName(obs, allowMissingColumns = true)
      .withColumn("_pay", when(col("_side") === 0,
        struct(col(tsCol).as("_t"), col("_v").as("_vv"))))
      .withColumn("_p", last(col("_pay"), ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_n", first(col("_pay"), ignoreNulls = true)
        .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .filter(col("_side") === 1)
      .withColumn(out, expr(
        s"CASE WHEN _n IS NULL OR _p._t = $tsCol THEN CAST(_p._vv AS DOUBLE) " +
          "ELSE CAST(_p._vv AS DOUBLE) + " +
          "(CAST(_n._vv AS DOUBLE) - CAST(_p._vv AS DOUBLE)) * " +
          s"(CAST($tsCol - _p._t AS DOUBLE) / CAST(_n._t - _p._t AS DOUBLE)) END"))
      .select(keys.map(col) :+ col(tsCol) :+ col(out): _*)
  }

  /** Trailing time-window aggregates per key: for every row, the sum and
    * count of `valueCol` over [t - back, t] of the SAME key — the
    * rate/rolling-metric primitive (trailing 10-minute spend, events per
    * user per hour, ...). `tsCol` must be a numeric epoch column and
    * `valueCol` an exact integer (caller scales money to cents), so the
    * rolling sum is order-independent and engine-portable.
    *
    * One window, PARTITIONED BY the key with a value-RANGE frame — each
    * key streams through its own task; no unpartitioned window, no
    * self-join range probe (the naive `e1 ⋈ e2 ON t BETWEEN ...`
    * formulation this replaces is a quadratic nested loop at scale).
    */
  def trailing(df: DataFrame, keys: Seq[String], tsCol: String,
               valueCol: String, back: Long,
               prefix: String = "roll"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(back >= 0, "trailing window must look backward")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol)).rangeBetween(-back, 0)
    df.withColumn(s"${prefix}_sum", sum(col(valueCol)).over(w))
      .withColumn(s"${prefix}_cnt", count(lit(1)).over(w))
  }

  /** Fixed-horizon exponentially-decayed signal: for every row,
    * Σ_{j<terms} value[t-j] · 0.5^j over the `terms` most recent rows of
    * the key (missing history counts 0). Decay 1/2 is EXACTLY
    * representable, and each term is one lag() multiply — the whole
    * value is a single left-associated expression tree per row, so two
    * engines produce bit-identical doubles (no sum-order ambiguity, the
    * trap an unbounded EWMA recurrence has). `orderCols` must be a total
    * order within the key; window is key-partitioned.
    */
  def decayed(df: DataFrame, keys: Seq[String], orderCols: Seq[String],
              valueCol: String, terms: Int = 6,
              out: String = "decayed"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(terms >= 1 && terms <= 32, "terms must be in [1,32]")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val v = (0 until terms)
      .map(j => coalesce(lag(col(valueCol), j).over(w), lit(0L)).cast("double") *
        lit(math.pow(0.5, j)))
      .reduce(_ + _)
    df.withColumn(out, v)
  }
}
