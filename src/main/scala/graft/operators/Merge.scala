package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental-maintenance operators for a continuously refreshed corpus:
  * upsert (MERGE), delete, and a changed/new/unchanged delta classifier.
  * The reference engine's tables are immutable query inputs — it has no
  * UPDATE/MERGE surface — so this is pipeline surface beyond the
  * reference (SURVEY §2.5 family): on Spark the same semantics are a
  * pure transformation producing the next table version — the shape
  * every lakehouse MERGE compiles to underneath.
  *
  * Scale shape (100 TB target, GB-scale daily updates): every operator is
  * ONE equi-join on the key between target and updates. The small updates
  * side broadcasts (AQE picks this up from its actual size); the target is
  * never shuffled in that case — each target partition is scanned once,
  * matched against the broadcast keys map-side, and rewritten. When both
  * sides are large it degrades gracefully to a single shuffle-hash join on
  * the key — still one shuffle of each side, never a cross product, and
  * AQE's skew splitting applies. No collect, no window, no global sort.
  */
object Merge {

  private def requireSameColumns(target: DataFrame, updates: DataFrame): Unit =
    require(target.columns.toSeq == updates.columns.toSeq,
      s"target/updates schemas differ: ${target.columns.mkString(",")} vs ${updates.columns.mkString(",")}")

  /** MERGE semantics: rows of `updates` replace target rows with the same
    * key; update rows with no target match are inserted. Equivalent to
    * `MERGE ... WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN
    * INSERT *`. PRECONDITION: `updates` carries at most one row per key —
    * duplicate-keyed update rows are ALL retained verbatim (this overload
    * does not pick a winner). When updates may collide on the key, use
    * the `orderCol` overload below, which resolves each key to the row
    * with the highest `orderCol` before merging.
    */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    requireSameColumns(target, updates)
    target.join(updates.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .unionByName(updates)
  }

  /** [[upsert]] with last-writer-wins on the update side: duplicate-keyed
    * update rows resolve to the one with the highest `orderCol` (a
    * version / event-time column) via `max_by` — a DETERMINISTIC pick,
    * the same rule [[graft.streaming.EventPipeline.streamingUpsert]]
    * applies per micro-batch. One extra partial+final aggregate on the
    * (small) updates side; the target-side cost is unchanged.
    */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String],
             orderCol: String): DataFrame = {
    requireSameColumns(target, updates)
    val payload = updates.columns.filterNot(keys.contains)
    val deduped = updates
      .groupBy(keys.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*), col(orderCol)).as("_p"))
      .select(keys.map(col) ++ payload.map(c => col(s"_p.$c").as(c)): _*)
      .select(updates.columns.map(col): _*)
    upsert(target, deduped, keys)
  }

  /** Anti-delete: drop target rows whose key appears in `tombstones`
    * (a keys-only frame) — GDPR/right-to-be-forgotten over a corpus as
    * one anti-join.
    */
  def delete(target: DataFrame, tombstones: DataFrame, keys: Seq[String]): DataFrame =
    target.join(tombstones.select(keys.map(col): _*).distinct(), keys, "left_anti")

  /** Incremental aggregate maintenance: merge a new batch's per-key
    * partial aggregates into a running state table WITHOUT re-reading
    * history — the batch analog of
    * [[graft.streaming.EventPipeline.sketchRollup]] for exact metrics.
    * Both frames carry `keys` + identical metric columns; the result has
    * one row per key with metrics merged element-wise. `ops` selects the
    * merge per metric — "sum" (default; counts ARE sums), "min", or
    * "max". Only metrics with an associative+commutative merge belong
    * here (avg = merged sum / merged count downstream; distinct counts
    * ride the HLL sketch path).
    *
    * ONE full-outer equi-join on the key: the small delta side
    * broadcasts, the state table is never shuffled in that case — the
    * same scale contract as [[upsert]].
    */
  def mergeAggregates(state: DataFrame, delta: DataFrame, keys: Seq[String],
                      ops: Map[String, String] = Map.empty): DataFrame = {
    requireSameColumns(state, delta)
    val metrics = state.columns.filterNot(keys.contains)
    val badOps = ops.filterNot { case (c, o) =>
      metrics.contains(c) && Seq("sum", "min", "max").contains(o) }
    require(badOps.isEmpty, s"unknown metric/op: $badOps")
    val s = state.select(keys.map(col) ++ metrics.map(c => col(c).as(s"_s_$c")): _*)
    val d = delta.select(keys.map(col) ++ metrics.map(c => col(c).as(s"_d_$c")): _*)
    val merged = metrics.map { c =>
      (ops.getOrElse(c, "sum") match {
        // least/greatest skip NULLs, which is exactly "absent side"
        case "min" => least(col(s"_s_$c"), col(s"_d_$c"))
        case "max" => greatest(col(s"_s_$c"), col(s"_d_$c"))
        // sum merge must stay NULL when BOTH sides are NULL — a key whose
        // values are all NULL aggregates to NULL in one shot, and
        // coalescing it to 0 would silently turn "no data" into "total 0"
        case _ => coalesce(col(s"_s_$c") + col(s"_d_$c"), col(s"_s_$c"), col(s"_d_$c"))
      }).as(c)
    }
    s.join(d, keys, "full_outer")
      .select(keys.map(col) ++ merged: _*)
  }

  /** Build a slowly-changing-dimension Type-2 history from a change log:
    * each input row is an observation `(keys..., payload..., tsCol)`;
    * output rows carry `effective_from` (the observation time),
    * `effective_to` (the NEXT version's start, NULL while open) and
    * `is_current`. Consecutive observations with an identical payload are
    * collapsed (NULL-safe compare) — only a CHANGE opens a new version,
    * so replaying the same state twice never forks history.
    *
    * `tieBreak` columns make the per-key ordering total when `tsCol`
    * ties (e.g. an event id); they are excluded from the change compare.
    *
    * Scale shape: two windows, both partitioned by the key — per-key
    * history streams through one task per key, never the whole table;
    * key-count parallelism is exactly the dimension's cardinality, which
    * is what any SCD2 MERGE materializes per key anyway. No join, no
    * collect.
    */
  /** Point-in-time read over an [[scd2]] history: the version of each
    * key that was effective at instant `at` — rows with
    * `effective_from <= at < effective_to` (open `effective_to` = still
    * current). This is the feature-store "as-of training time" read and
    * the time-travel SELECT a versioned lakehouse table offers, as a
    * pure filter: no join, no window, fully pushdown-able (on an
    * effective_from-partitioned layout the scan prunes to old
    * partitions).
    */
  def snapshotAt(history: DataFrame, at: org.apache.spark.sql.Column): DataFrame =
    history.filter(col("effective_from") <= at &&
      (col("effective_to").isNull || col("effective_to") > at))

  def scd2(changes: DataFrame, keys: Seq[String], tsCol: String,
           tieBreak: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val payload = changes.columns.filterNot((keys :+ tsCol).contains).filterNot(tieBreak.contains)
    require(payload.nonEmpty, "scd2 needs at least one tracked payload column")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((tsCol +: tieBreak).map(col): _*)
    val cur = struct(payload.map(col): _*)
    changes
      .withColumn("_prev", lag(cur, 1).over(w))
      // NULL-safe: a change is "first observation" or "payload differs"
      .filter(col("_prev").isNull || !(col("_prev") <=> cur))
      .withColumn("effective_from", col(tsCol))
      .withColumn("effective_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("effective_to").isNull)
      .drop("_prev")
  }

  /** Classify `updates` against `target` into `inserted` (key absent from
    * target) / `changed` (key present, any non-key column differs) /
    * `unchanged` — the CDC delta a downstream incremental pipeline (e.g.
    * re-embedding only changed documents) consumes. NULL-safe comparison:
    * NULL -> NULL counts as unchanged.
    */
  def delta(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    requireSameColumns(target, updates)
    val payload = target.columns.filterNot(keys.contains)
    val t = target.select(
      keys.map(col) :+ struct(payload.map(col): _*).as("_t_payload"): _*)
    val same = payload
      .map(c => col("_t_payload")(c) <=> col(c))
      .reduceOption(_ && _).getOrElse(lit(true))
    updates.join(t, keys, "left")
      .withColumn("change_kind",
        when(col("_t_payload").isNull, "inserted")
          .when(same, "unchanged")
          .otherwise("changed"))
      .drop("_t_payload")
  }

  /** Full snapshot diff: classify every key across TWO snapshots into
    * `added` (only in new) / `removed` (only in old) / `changed` /
    * `unchanged` — the table-level CDC audit [[delta]] can't express
    * (delta never sees removals: it walks the updates side only).
    * Payload columns come from the NEW snapshot for added/changed/
    * unchanged rows and from the OLD snapshot for removed rows, so the
    * output is a complete picture of both states. NULL-safe compare
    * (NULL ↔ NULL is unchanged), same contract as [[delta]].
    *
    * Scale shape: ONE full-outer equi-join on the keys — both snapshots
    * shuffle once on the same key, nothing else moves. Keys must be
    * non-NULL (the usual primary-key contract; full-outer on NULL keys
    * would mispair).
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame = {
    requireSameColumns(oldDf, newDf)
    val payload = oldDf.columns.filterNot(keys.contains)
    val o = oldDf.select(
      keys.map(c => col(c).as(s"_ok_$c")) :+
        struct(payload.map(col): _*).as("_o_payload"): _*)
    val n = newDf.select(
      keys.map(col) :+ struct(payload.map(col): _*).as("_n_payload"): _*)
    val cond = keys.map(c => col(c) === col(s"_ok_$c")).reduce(_ && _)
    val same = payload
      .map(c => col("_o_payload")(c) <=> col("_n_payload")(c))
      .reduceOption(_ && _).getOrElse(lit(true))
    val joined = n.join(o, cond, "full_outer")
      .withColumn("change_kind",
        when(col("_o_payload").isNull, "added")
          .when(col("_n_payload").isNull, "removed")
          .when(same, "unchanged")
          .otherwise("changed"))
    val outKeys = keys.map(c => coalesce(col(c), col(s"_ok_$c")).as(c))
    val outPayload = payload.map(c =>
      when(col("change_kind") === "removed", col("_o_payload")(c))
        .otherwise(col("_n_payload")(c)).as(c))
    joined.select(outKeys ++ outPayload :+ col("change_kind"): _*)
  }
}
