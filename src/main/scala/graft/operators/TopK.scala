package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed per-key top-k (the ANN merge kernel — reference:
  * similarity-search result assembly) without shuffling the scored corpus.
  *
  * A plain `row_number() OVER (PARTITION BY key)` merge hash-partitions
  * EVERY scored row by key — with a handful of query keys that is a
  * handful of reducers no matter the cluster size. This operator instead
  * runs two stages:
  *
  *  1. narrow partial pass: `sortWithinPartitions` (no exchange) then a
  *     streaming first-k-per-key filter, so each input partition emits at
  *     most distinctKeys×k rows;
  *  2. tiny merge: a window over the ≤ partitions×keys×k survivors
  *     assigns the final rank.
  *
  * The only exchange therefore moves O(partitions×keys×k) rows — the
  * shape that survives a 1000-executor scale-up. Per-partition state is
  * one counter per distinct key seen in that partition; intended for
  * moderate key cardinality (query batches), not per-row keys.
  */
object TopK {

  /** Global top-k rows per key with a 1-based rank column `rankCol`
    * assigned in `orderCols` order (ties must be broken by `orderCols`
    * for a deterministic result).
    */
  def perKey(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column], k: Int,
             rankCol: String = "rnk"): DataFrame = {
    require(k > 0, "k must be positive")
    val schema = df.schema
    val keyIdx = keyCols.map(schema.fieldIndex)
    val partial = df
      .sortWithinPartitions(orderCols: _*)
      .mapPartitions { it =>
        val seen = scala.collection.mutable.HashMap.empty[Seq[Any], Int]
        it.filter { r =>
          val key = keyIdx.map(r.get)
          val c = seen.getOrElse(key, 0)
          if (c < k) { seen.update(key, c + 1); true } else false
        }
      }(Encoders.row(schema))
    partial
      .withColumn(rankCol, row_number().over(
        Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)))
      .filter(col(rankCol) <= k)
  }
}
