package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A pluggable DataSourceV2 source — the Spark twin of the reference's
  * `AsyncDataSource` plug-in contract (reference: src/backend/
  * dataSource.js — any object implementing the read contract can feed
  * the engine). On Spark the extension point is a [[TableProvider]]:
  * implement schema + scan planning and `spark.read.format(...)` does
  * the rest, with Catalyst driving predicate and column pushdown into
  * the custom scan exactly as it does for parquet.
  *
  * The table is a deterministic generated range — `rows` rows of
  * (id BIGINT, sq = id², bucket = id % 10, name = 'row_<id>') — which
  * keeps the source dependency-free AND oracle-checkable (DuckDB's
  * `range()` reproduces it exactly).
  *
  * Scale design, the part that matters for a real plug-in:
  *  - `planInputPartitions` splits the (pushdown-narrowed) range into
  *    `partitions` independent slices — the parallelism contract a
  *    1000-executor scan needs; no driver-side row generation.
  *  - id-range predicates (`=`, `<`, `<=`, `>`, `>=`) are CONSUMED by
  *    the scan builder: they narrow [lo, hi) before partition planning,
  *    so a selective filter prunes work, not just rows. Everything else
  *    is returned to Spark as a residual.
  *  - `pruneColumns` narrows the reader's emit schema — a 2-column
  *    projection generates 2 columns, not 4.
  *
  * Registered as `graft-range` via DataSourceRegister (META-INF
  * services), so `spark.read.format("graft-range")` resolves with no
  * class-name coupling.
  *
  * The table also serves STREAMING reads (`spark.readStream.format(
  * "graft-range")`): `rowsPerBatch` rows become available per
  * micro-batch over replayable positional offsets — the full Spark twin
  * of the reference's async streaming source contract (batch AND
  * stream from one plug-in).
  */
class GraftRangeSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-range"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftRangeSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val rows = properties.getOrDefault("rows", "1000").toLong
    val parts = properties.getOrDefault("partitions", "4").toInt
    val rowsPerBatch = properties.getOrDefault("rowsPerBatch", "1000").toLong
    require(rows >= 0, s"rows must be >= 0, got $rows")
    require(parts >= 1, s"partitions must be >= 1, got $parts")
    require(rowsPerBatch >= 1, s"rowsPerBatch must be >= 1, got $rowsPerBatch")
    new GraftRangeTable(rows, parts, rowsPerBatch)
  }
}

object GraftRangeSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("sq", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("name", StringType, nullable = false)))
}

private[sources] class GraftRangeTable(rows: Long, parts: Int,
                                       rowsPerBatch: Long)
    extends Table with SupportsRead {
  override def name(): String = s"graft_range($rows)"
  override def schema(): StructType = GraftRangeSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftRangeScanBuilder(rows, parts, rowsPerBatch)
}

private[sources] class GraftRangeScanBuilder(rows: Long, parts: Int,
                                             rowsPerBatch: Long = 1000L)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {
  private var lo = 0L
  private var hi = rows
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = GraftRangeSource.schema
  private var aggFuncs: Option[Seq[AggregateFunc]] = None

  private def bound(v: Any): Option[Long] = v match {
    case n: java.lang.Number => Some(n.longValue())
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val residual = Array.newBuilder[Filter]
    val taken = Array.newBuilder[Filter]
    // consumed filters are TRUSTED (Spark never re-checks them), so the
    // b+1 bound arithmetic must not wrap at Long.MaxValue: `id >
    // MaxValue` matches nothing (empty range), `id <= MaxValue` and
    // `= MaxValue`'s upper bound are vacuous (ids live in [0, rows))
    filters.foreach { f =>
      val consumed = f match {
        case GreaterThan("id", v) => bound(v).exists { b =>
          if (b == Long.MaxValue) lo = hi else lo = math.max(lo, b + 1); true }
        case GreaterThanOrEqual("id", v) => bound(v).exists { b => lo = math.max(lo, b); true }
        case LessThan("id", v) => bound(v).exists { b => hi = math.min(hi, b); true }
        case LessThanOrEqual("id", v) => bound(v).exists { b =>
          if (b < Long.MaxValue) hi = math.min(hi, b + 1); true }
        case EqualTo("id", v) => bound(v).exists { b =>
          lo = math.max(lo, b)
          if (b < Long.MaxValue) hi = math.min(hi, b + 1)
          true }
        // generated columns are never null — the IsNotNull guard Spark
        // emits alongside range predicates is vacuously true here
        case IsNotNull(_) => true
        case _ => false
      }
      if (consumed) taken += f else residual += f
    }
    accepted = taken.result()
    residual.result()
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // ---- aggregate pushdown: COUNT(*) / MIN(id) / MAX(id) are CLOSED
  // FORM over the (filter-narrowed) range — the scan answers without
  // generating a single row, so `count(*)` over a trillion-row table
  // is O(1). Composes with pushFilters (which runs first and narrows
  // [lo, hi)). Complete pushdown: Spark plans no re-aggregation.
  private def isIdRef(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case r: NamedReference => r.fieldNames.sameElements(Array("id"))
      case _ => false
    }

  private def canPush(agg: Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall {
        case _: CountStar => true
        case m: Min => isIdRef(m.column)
        case m: Max => isIdRef(m.column)
        case _ => false
      }

  override def supportCompletePushDown(agg: Aggregation): Boolean = canPush(agg)

  override def pushAggregation(agg: Aggregation): Boolean =
    canPush(agg) && {
      aggFuncs = Some(agg.aggregateExpressions.toSeq)
      true
    }

  override def build(): Scan = aggFuncs match {
    case Some(funcs) => new GraftRangeAggScan(lo, hi, funcs)
    case None => new GraftRangeScan(lo, hi, parts, required, rowsPerBatch)
  }
}

/** One-row scan answering pushed COUNT(*)/MIN(id)/MAX(id) in closed
  * form over [lo, hi) — no row generation at any scale.
  */
private[sources] class GraftRangeAggScan(lo: Long, hi: Long,
                                         funcs: Seq[AggregateFunc])
    extends Scan with Batch {
  private val empty = hi <= lo

  override def readSchema(): StructType = StructType(funcs.zipWithIndex.map {
    case (_: CountStar, i) => StructField(s"agg_$i", LongType, nullable = false)
    case (_, i) => StructField(s"agg_$i", LongType, nullable = true) // min/max: NULL on empty
  })

  override def toBatch: Batch = this
  override def description(): String =
    s"GraftRangeAggScan pushedRange=[$lo,$hi) pushedAggregates=[${funcs.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftRangeSlice(0L, 1L)) // one synthetic row

  override def createReaderFactory(): PartitionReaderFactory = {
    val values: Array[Any] = funcs.map {
      case _: CountStar => math.max(0L, hi - lo): Any
      case _: Min => if (empty) null else lo
      case _: Max => if (empty) null else hi - 1
    }.toArray
    new GraftRangeAggReaderFactory(values)
  }
}

private[sources] class GraftRangeAggReaderFactory(values: Array[Any])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = !emitted && { emitted = true; true }
      override def get(): InternalRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values.clone())
      override def close(): Unit = ()
    }
}

private[sources] class GraftRangeScan(lo: Long, hi: Long, parts: Int,
                                      required: StructType,
                                      rowsPerBatch: Long = 1000L)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  // streaming face of the same table: the (pushdown-narrowed) range is
  // served in bounded micro-batches — replayable offsets over a
  // deterministic domain give exactly-once for free
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftRangeMicroBatchStream(lo, hi, parts, required, rowsPerBatch)
  // the pushed range and pruned columns are the scan's identity — they
  // surface in explain() so a spec (or a user) can SEE the pushdown
  override def description(): String =
    s"GraftRangeScan pushedRange=[$lo,$hi) columns=[${required.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    if (hi <= lo) return Array.empty
    val total = hi - lo
    val n = math.max(1L, math.min(parts.toLong, total)).toInt
    // contiguous even slices; the last absorbs the remainder
    val step = total / n
    (0 until n).map { i =>
      val s = lo + i * step
      val e = if (i == n - 1) hi else s + step
      GraftRangeSlice(s, e): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftRangeReaderFactory(required)
}

private[sources] case class GraftRangeSlice(lo: Long, hi: Long)
    extends InputPartition

/** Offset = exclusive upper bound of rows made available so far. */
private[sources] case class GraftRangeOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

/** Micro-batch stream over the generated range: each poll makes
  * `rowsPerBatch` more rows available past the engine-supplied start
  * offset, and a batch plans the SAME parallel slices as the batch
  * scan over its [start, end) span. Availability is STATELESS — the
  * admission-control `latestOffset(start, limit)` derives the next end
  * from the start the ENGINE tracks, so a checkpoint restart (which
  * constructs a fresh stream instance) cannot regress behind the
  * committed offset and re-emit delivered rows. Offsets are pure
  * positions in a deterministic domain — replaying the last
  * uncommitted batch reproduces identical rows, so end-to-end
  * exactly-once holds with any idempotent/transactional sink. `commit`
  * is a no-op (nothing upstream to acknowledge; the "source" can
  * always re-serve).
  */
private[sources] class GraftRangeMicroBatchStream(
    lo: Long, hi: Long, parts: Int, required: StructType,
    rowsPerBatch: Long) extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset = GraftRangeOffset(lo)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-control latestOffset(start, limit) is the only poll path")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    import org.apache.spark.sql.connector.read.streaming.{ReadAllAvailable, ReadMaxRows}
    val s = math.max(start.asInstanceOf[GraftRangeOffset].v, lo)
    // honor the engine's admission limit: Trigger.AvailableNow drains
    // with ReadAllAvailable (one shot to hi); rate-limited triggers pass
    // ReadMaxRows; anything else falls back to this source's own pace
    val end = limit match {
      case _: ReadAllAvailable => hi
      case m: ReadMaxRows => math.min(hi, s + m.maxRows())
      case _ => math.min(hi, s + rowsPerBatch)
    }
    GraftRangeOffset(end)
  }

  override def reportLatestOffset(): Offset = GraftRangeOffset(hi)

  override def deserializeOffset(json: String): Offset =
    GraftRangeOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftRangeOffset].v
    val e = end.asInstanceOf[GraftRangeOffset].v
    if (e <= s) return Array.empty
    val total = e - s
    val n = math.max(1L, math.min(parts.toLong, total)).toInt
    val step = total / n
    (0 until n).map { i =>
      val a = s + i * step
      val b = if (i == n - 1) e else a + step
      GraftRangeSlice(a, b): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftRangeReaderFactory(required)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] class GraftRangeReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val slice = p.asInstanceOf[GraftRangeSlice]
    // emit only the pruned columns, in the order Spark asked for them
    val emit: Array[Long => Any] = required.fieldNames.map {
      case "id" => (i: Long) => i
      case "sq" => (i: Long) => i * i
      case "bucket" => (i: Long) => (i % 10).toInt
      case "name" => (i: Long) => UTF8String.fromString(s"row_$i")
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
    new PartitionReader[InternalRow] {
      private var cur = slice.lo - 1
      override def next(): Boolean = { cur += 1; cur < slice.hi }
      override def get(): InternalRow = {
        // one fresh values array per row (rows may be buffered upstream,
        // so the array cannot be reused), but no per-row Seq wrappers
        val vals = new Array[Any](emit.length)
        var i = 0
        while (i < emit.length) { vals(i) = emit(i)(cur); i += 1 }
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
      }
      override def close(): Unit = ()
    }
  }
}
