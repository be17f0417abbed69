package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation: two-phase salted aggregation. A hot grouping key (a
  * viral document, a bot user) funnels its whole partition through one
  * task in a plain groupBy; salting splits each key across `salt`
  * subtasks, partially aggregates, then combines the partials.
  *
  * Only algebraic aggregates (sum/count/min/max) decompose this way —
  * the API takes (partial, combine) column pairs to keep that explicit.
  * Note Spark's AQE skew handling (`spark.sql.adaptive.skewJoin`) covers
  * joins; salting remains the tool for skewed AGGREGATIONS at scale.
  */
object Skew {

  final case class Agg(partial: Column, combine: String => Column, name: String)

  def sum2(c: String, name: String): Agg =
    Agg(sum(col(c)).as(name), p => sum(col(p)).as(name), name)
  def count2(name: String): Agg =
    Agg(count(lit(1)).as(name), p => sum(col(p)).as(name), name)
  def min2(c: String, name: String): Agg =
    Agg(min(col(c)).as(name), p => min(col(p)).as(name), name)
  def max2(c: String, name: String): Agg =
    Agg(max(col(c)).as(name), p => max(col(p)).as(name), name)

  /** Two-phase aggregation over `keys` with `salt`-way splitting. */
  def saltedAggregate(df: DataFrame, keys: Seq[String], salt: Int,
                      aggs: Seq[Agg]): DataFrame = {
    val salted = df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)))
    val partial = salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(aggs.head.partial, aggs.tail.map(_.partial): _*)
    val combined = partial
      .groupBy(keys.map(col): _*)
      .agg(aggs.head.combine(aggs.head.name),
           aggs.tail.map(a => a.combine(a.name)): _*)
    combined
  }

  /** Salted equi-join for a skewed LEFT side: each left row gets a salt
    * in [0, salt), the right side replicates `salt`-fold (explode of a
    * constant range — cheap when the right side is the smaller one), and
    * the join key becomes (key, salt) — a hot key's rows now land on
    * `salt` reducers instead of one. Inner join, same result set as
    * `left.join(right, keys)`.
    *
    * Prefer AQE's skew-join split where it applies (sort-merge joins in
    * batch); this explicit form is for when it does not — streaming
    * micro-batch joins, or a deliberately hash-partitioned pipeline
    * whose partitioning must survive the join.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 salt: Int): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    val l = left.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)))
    val r = right.withColumn("_salt", explode(expr(s"sequence(0, ${salt - 1})")))
    l.join(r, keys :+ "_salt").drop("_salt")
  }
}
