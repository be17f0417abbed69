package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Scoped lifetime for the caches operators create internally.
  *
  * Several operators persist intermediate frames they cannot unpersist
  * themselves (the returned plan is still lazy — [[Dedup.minhashLsh]]'s
  * band table, [[TextOps.repeatedWindows]]'s pair table,
  * [[TextOps.duplicateSpans]]'s token table). A single query's session
  * drops them at shutdown, but a long-lived session batching many
  * corpora accumulates disk-tier cache (MEMORY_AND_DISK outlives memory
  * pressure). Operators route those persists through [[track]];
  * repeated-batch drivers call [[unpersistAll]] between corpora —
  * releasing exactly the operator-internal caches without the
  * sledgehammer of `spark.catalog.clearCache()` (which would also drop
  * caches the CALLER owns).
  */
object Caches {
  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  private val scopeTl = new ThreadLocal[java.util.ArrayList[DataFrame]]()
  private val trackedViews =
    new java.util.concurrent.ConcurrentLinkedQueue[(org.apache.spark.sql.SparkSession, String)]()
  private val scopeViewsTl =
    new ThreadLocal[java.util.ArrayList[(org.apache.spark.sql.SparkSession, String)]]()

  /** Register an operator-internal temp view for release with the same
    * lifetime as [[track]]ed caches: inside a [[scoped]] block, at scope
    * exit; otherwise at the next [[unpersistAll]]. Operators that are
    * forced through a temp view (e.g. a scalar-subquery bloom build)
    * route the view here so a long-lived session running repeated
    * batches does not accumulate catalog entries without bound. The view
    * must have been materialized (write/collect) before release fires —
    * the same contract as tracked caches.
    */
  def trackView(spark: org.apache.spark.sql.SparkSession, name: String): Unit = {
    val sc = scopeViewsTl.get()
    if (sc != null) sc.add((spark, name)) else trackedViews.add((spark, name))
  }

  /** Persist `df` and register it for release: inside a [[scoped]]
    * block, with that scope (this thread only); otherwise with the
    * global [[unpersistAll]] registry.
    */
  def track(df: DataFrame,
            lvl: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val sc = scopeTl.get()
    if (sc != null) sc.add(df) else tracked.add(df)
    df.persist(lvl)
  }

  /** Run `body` with a PRIVATE cache scope: operator-internal persists
    * created on THIS thread during `body` are released when it exits
    * (success or failure) — without touching the global registry, so a
    * long-running caller (a streaming foreachBatch, a repeated-batch
    * driver sharing the session with other queries) neither leaks one
    * cache per batch nor clobbers concurrent queries' caches the way a
    * per-batch [[unpersistAll]] would. `body` must MATERIALIZE whatever
    * it returns (write/collect/count) — lazy plans escaping the scope
    * recompute instead of reading the released cache.
    */
  def scoped[A](body: => A): A = {
    val prev = scopeTl.get()
    val prevV = scopeViewsTl.get()
    val mine = new java.util.ArrayList[DataFrame]()
    val mineV = new java.util.ArrayList[(org.apache.spark.sql.SparkSession, String)]()
    scopeTl.set(mine)
    scopeViewsTl.set(mineV)
    try body
    finally {
      scopeTl.set(prev)
      scopeViewsTl.set(prevV)
      mine.forEach(df => df.unpersist(blocking = false))
      mineV.forEach { case (s, v) => s.catalog.dropTempView(v); () }
    }
  }

  /** Number of operator-internal caches currently registered. */
  def trackedCount: Int = tracked.size()

  /** Release every registered operator-internal cache. Non-blocking
    * (executors drop blocks asynchronously); safe to call with queries
    * over previously-returned lazy plans still unmaterialized — they
    * recompute instead of reading the dropped cache.
    */
  def unpersistAll(): Unit = {
    var df = tracked.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = tracked.poll()
    }
    var v = trackedViews.poll()
    while (v != null) {
      v._1.catalog.dropTempView(v._2)
      v = trackedViews.poll()
    }
  }
}
