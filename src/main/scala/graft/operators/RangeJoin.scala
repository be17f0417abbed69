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
}
