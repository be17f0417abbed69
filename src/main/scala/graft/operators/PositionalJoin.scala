package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Positional (zip) join — reference: src/execute/join.js (PositionalJoin
  * node, src/plan/types.d.ts:119). Pads the shorter side with NULLs, like
  * DuckDB's POSITIONAL JOIN.
  *
  * Spark has no positional join; the scalable construction is a total-order
  * sort followed by `zipWithIndex` (two narrow passes, no single-partition
  * window), then an equi-join on the index. At 100 TB both sides shuffle
  * once for the sort and once for the index join — same cost class as any
  * large equi-join.
  */
object PositionalJoin {

  /** Attach a 1-based `pos` column following the given total order. */
  def withPosition(df: DataFrame, order: Seq[Column], posName: String = "pos"): DataFrame = {
    val sorted = df.orderBy(order: _*)
    val schema = sorted.schema.add(posName, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Full positional join of two sides, each given a deterministic total
    * order. Result carries merged `pos` plus both sides' columns.
    */
  def apply(left: DataFrame, leftOrder: Seq[Column],
            right: DataFrame, rightOrder: Seq[Column]): DataFrame = {
    val l = withPosition(left, leftOrder)
    val r = withPosition(right, rightOrder)
    l.join(r, Seq("pos"), "full_outer")
  }
}
