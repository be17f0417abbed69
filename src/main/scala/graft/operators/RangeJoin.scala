package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: pairs where `rightVal` falls inside
  * `[leftVal + lo, leftVal + hi]`. Spark plans a bare inequality join as
  * BroadcastNestedLoopJoin — a per-row range probe that dies at scale.
  * This operator buckets the value axis instead: bucket width = the
  * window span, each left row explodes to the (at most two) buckets its
  * window can touch, each right row lands in exactly one, and the pair
  * candidates come from an EQUI-join on the bucket id with the exact
  * BETWEEN applied as a residual. Shuffle is O(rows) small keys, the
  * join is hash/merge, and skew on the value axis is just key skew —
  * AQE-splittable. (PlanQualitySpec asserts no nested-loop appears.)
  */
object RangeJoin {

  def within(left: DataFrame, right: DataFrame,
             leftVal: String, rightVal: String,
             lo: Double, hi: Double): DataFrame = {
    require(hi > lo, "need hi > lo")
    val w = hi - lo
    val l = left.withColumn("_b",
      explode(expr(
        s"sequence(CAST(floor(($leftVal + $lo) / $w) AS BIGINT), " +
          s"CAST(floor(($leftVal + $hi) / $w) AS BIGINT))")))
    val r = right.withColumn("_b",
      expr(s"CAST(floor($rightVal / $w) AS BIGINT)"))
    l.join(r, Seq("_b"))
      .filter(col(rightVal).between(col(leftVal) + lo, col(leftVal) + hi))
      .drop("_b")
  }

  /** Interval OVERLAP join: pairs whose intervals `[lStart, lEnd]` and
    * `[rStart, rEnd]` intersect (inclusive ends). Same bucketed-equi-join
    * idea as [[within]], generalized to intervals on BOTH sides: each row
    * explodes to every bucket its interval spans, candidates come from
    * bucket equality, the exact overlap predicate runs as a residual —
    * and each true pair survives in exactly ONE bucket (the one holding
    * `greatest(lStart, rStart)`, the overlap's left edge), so no
    * DISTINCT pass is needed to dedup multi-bucket matches. Shuffle is
    * O(rows × spanned buckets) small keys; pick `bucketWidth` near the
    * typical interval length so that factor stays ~2 (a too-small width
    * multiplies the fan-out, a too-large one degrades candidate
    * selectivity — the usual interval-index trade).
    */
  def overlaps(left: DataFrame, right: DataFrame,
               lStart: String, lEnd: String, rStart: String, rEnd: String,
               bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "need bucketWidth > 0")
    val w = bucketWidth
    def bucketed(df: DataFrame, s: String, e: String) = df.withColumn("_b",
      explode(expr(
        s"sequence(CAST(floor($s / $w) AS BIGINT), CAST(floor($e / $w) AS BIGINT))")))
    bucketed(left, lStart, lEnd)
      .join(bucketed(right, rStart, rEnd), Seq("_b"))
      .filter(expr(s"$lStart <= $rEnd AND $rStart <= $lEnd"))
      .filter(expr(s"_b = CAST(floor(greatest($lStart, $rStart) / $w) AS BIGINT)"))
      .drop("_b")
  }
}
