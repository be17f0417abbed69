package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table registry over the driver-generated parquet star schema.
  *
  * Analog of the reference's pluggable `AsyncDataSource` surface
  * (reference: src/backend/dataSource.js) — here a source is anything
  * `spark.read` can produce, and the engine operates on the resulting
  * DataFrame regardless of origin (parquet/csv/json/in-memory).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Per-(session, dir, table) memo of the inferred parquet SCHEMA —
    * exactly the footer read a catalog table registration would amortize
    * in production. r16 (guide §1.2 per-task work): a 249-query bench
    * session paid a fresh schema inference for every `Tables(...)` call —
    * hundreds of driver-side footer reads per sweep. Only the schema is
    * memoized: each call still builds a FRESH read (fresh file index), so
    * overwriting a path mid-session re-reads the new files (Round6Spec
    * rewrites the same temp dir twice), and no data or file listing goes
    * stale. A SCHEMA-changing rewrite of the same (session, dir, table)
    * would read with the stale schema — none of the suite or the driver
    * does that; a new session or dir always re-infers.
    *
    * r17 (ADVICE r16): the session key is WEAK — the r16 map strongly
    * retained every stopped session (and its schemas) for the process
    * lifetime; a collected session's entries now vanish with it. Each
    * session's map is additionally bounded: past 1024 entries it is
    * cleared outright (a session cycling that many (dir, table) pairs is
    * a test harness, and a clear only costs re-inference).
    * [[invalidate]] drops a dir's entries for callers that rewrite a
    * path with a CHANGED schema mid-session.
    */
  private val schemaMemo = new java.util.WeakHashMap[SparkSession,
    scala.collection.concurrent.TrieMap[(String, String),
      org.apache.spark.sql.types.StructType]]()

  private def memoFor(spark: SparkSession) = schemaMemo.synchronized {
    var m = schemaMemo.get(spark)
    if (m == null) {
      m = scala.collection.concurrent.TrieMap
        .empty[(String, String), org.apache.spark.sql.types.StructType]
      schemaMemo.put(spark, m)
    }
    m
  }

  /** Drop memoized schemas under `dir` (any session, any table) — for
    * callers that overwrite a path with a different schema mid-session.
    */
  def invalidate(dir: String): Unit = schemaMemo.synchronized {
    schemaMemo.values.forEach { m =>
      m.keys.filter(_._1 == dir).foreach(m.remove)
    }
  }

  /** Read one table from an sf directory. Column pruning + predicate
    * pushdown reach the parquet scan because callers compose Columns on
    * the returned DataFrame (Catalyst handles pushdown declaratively).
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val memo = memoFor(spark)
    if (memo.size > 1024) memo.clear()
    val schema = memo.getOrElseUpdate((dir, name),
      spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  /** The events table's `ts` encoding differs across testdata generations:
    * older driver files store TIMESTAMP(NANOS) (which Spark's vectorized
    * reader rejects — we read them as raw nanos via
    * `spark.sql.legacy.parquet.nanosAsLong` and truncate to microsecond
    * TIMESTAMP_NTZ, the same truncation DuckDB applies casting
    * TIMESTAMP_NS → TIMESTAMP), newer ones store TIMESTAMP(MICROS)
    * directly. Adapt on the READ schema, not an assumed file layout.
    * `div` keeps the nanos arithmetic in exact longs (a double division
    * would lose precision above 2^53 ns).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = apply(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      case _ => // TIMESTAMP or TIMESTAMP_NTZ micros
        df.withColumn("ts", col("ts").cast("timestamp_ntz"))
    }
  }

  /** Register every table as a temp view so `spark.sql` queries see the
    * same names the DuckDB oracle uses. Deliberately NOT idempotent: the
    * stored view plan freezes its file listing, so re-registering per
    * call is what keeps mid-session overwrites of a data dir visible
    * (several specs rewrite a temp dir and re-query). The per-call cost
    * is one catalog put per table — the expensive part (schema
    * inference) is memoized in [[apply]].
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else apply(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
