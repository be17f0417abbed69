package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K-minimum-values (bottom-k) distinct sketches over the engine's
  * shared 60-bit hash (functions/text/Hash60) — the mergeable
  * set-cardinality/overlap companion to the HLL count sketch
  * (q_agg_hll): KMV keeps the hash VALUES, so two sketches support
  * union AND intersection estimates (corpus-shard overlap, train/eval
  * contamination volume, cross-snapshot churn), which a pure counter
  * cannot. Reference analog: the DISTINCT-aggregate surface
  * (reference src/execute/aggregates.js:270,435 tracks exact distinct
  * sets per accumulator) — at 100 TB the exact set is the scale
  * bottleneck, so this is the bounded-memory replacement, expressed as
  * plain relational ops + array HOFs so Catalyst plans it.
  *
  * Determinism: the sketch is a pure function of the input SET — the k
  * smallest distinct hashes — so results are bit-identical under any
  * partitioning or engine (no RNG, no insertion-order dependence). The
  * estimator is IEEE double arithmetic on identical inputs.
  *
  * Scale shape (100 TB): `kmv` shuffles DISTINCT hashes only (map-side
  * partial distinct first), then the k smallest survive via
  * TakeOrderedAndProject — per-partition bottom-k, tiny merge; that
  * per-partition-then-merge IS the KMV merge operation. Downstream
  * union/intersection math runs on one-row arrays (broadcast-sized).
  */
object Sketches {

  /** One-row KMV sketch: the `k` smallest DISTINCT values of `hashCol`
    * (a 60-bit non-negative hash, e.g. `graft_hash60(...)`) as a sorted
    * ascending `ARRAY<BIGINT>` column named `kmv`. Empty input yields
    * one row with an empty array.
    */
  def kmv(df: DataFrame, hashCol: String, k: Int): DataFrame = {
    require(k >= 16 && k <= (1 << 20), "need k in [16, 2^20]")
    df.select(col(hashCol).as("h")).distinct()
      .orderBy("h").limit(k)
      .agg(sort_array(collect_list("h")).as("kmv"))
  }

  /** Spark-SQL text for the distinct-count estimate of a KMV array
    * built with capacity `k`: exact size while the sketch isn't full,
    * else `(k-1) · 2^60 / kth_smallest` (hashes uniform on [0, 2^60)).
    * Relative error ≈ 1/√k.
    */
  def estimateExpr(arr: String, k: Int): String =
    s"IF(size($arr) < $k, CAST(size($arr) AS BIGINT), " +
      s"CAST(floor(CAST($k - 1 AS DOUBLE) * 1152921504606846976D" +
      s" / CAST(element_at($arr, $k) AS DOUBLE)) AS BIGINT))"

  /** Spark-SQL text merging two KMV arrays into the sketch of the
    * UNION of the underlying sets (capacity `k`) — the mergeability
    * that lets per-shard sketches roll up without re-reading data.
    */
  def mergeExpr(a: String, b: String, k: Int): String =
    s"slice(array_sort(array_distinct(concat($a, $b))), 1, $k)"
}
