package graft.operators

import java.util.concurrent.Executors

import scala.collection.mutable
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

import org.apache.spark.TaskContext
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.sql.{DataFrame, Encoders, Row}

/** Batched, bounded-concurrency scoring over a column — the honest
  * Spark shape of the reference's async UDF capability (reference:
  * src/validation/functions.js — a UserDefinedFunction may return a
  * promise). Spark has no promise-returning expression: a row-at-a-time
  * async UDF would either block per row (serializing the latency) or
  * float unbounded futures. The pipeline shape a remote model-scoring
  * call actually needs is:
  *
  *  - BATCHING: rows are grouped into `batchSize` inputs per call (the
  *    request shape every inference endpoint amortizes on);
  *  - BOUNDED CONCURRENCY: at most `maxInFlight` batches are
  *    outstanding per partition — total in-flight memory is
  *    `maxInFlight × batchSize` rows, independent of partition size,
  *    and a 1000-executor job presents `executors × maxInFlight`
  *    concurrent requests, a capacity number you can provision for;
  *  - ORDER PRESERVATION: results are emitted in input order (FIFO
  *    drain), so downstream positional semantics survive.
  *
  * `score` runs on executors: it must be serializable and thread-safe.
  * The per-partition thread pool is torn down via the task-completion
  * listener, so failed/cancelled tasks don't leak threads.
  *
  * A deterministic stub stands in for the remote model here (no model
  * runtime in this sandbox) — the PLUMBING (batch shape, back-pressure,
  * ordering, failure propagation) is the real, tested artifact.
  */
object AsyncScore {

  def mapBatchesAsync(df: DataFrame, inCol: String, out: String,
                      batchSize: Int = 64, maxInFlight: Int = 4)(
                      score: Seq[String] => Seq[Double]): DataFrame = {
    require(batchSize >= 1, "batchSize must be >= 1")
    require(maxInFlight >= 1, "maxInFlight must be >= 1")
    val schema = df.schema
    val idx = schema.fieldIndex(inCol)
    val outSchema = schema.add(out, DoubleType, nullable = false)
    val enc = Encoders.row(outSchema)
    df.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val pool = Executors.newFixedThreadPool(maxInFlight)
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
        Option(TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => pool.shutdownNow()))
        val batches = it.grouped(batchSize)
        val inFlight = mutable.Queue.empty[(Seq[Row], Future[Seq[Double]])]
        new Iterator[Row] {
          private var outBuf: Iterator[Row] = Iterator.empty

          private def fill(): Unit =
            while (inFlight.size < maxInFlight && batches.hasNext) {
              val rows = batches.next()
              val inputs = rows.map(_.getString(idx))
              inFlight.enqueue((rows, Future(score(inputs))))
            }

          override def hasNext: Boolean = {
            fill()
            outBuf.hasNext || inFlight.nonEmpty
          }

          override def next(): Row = {
            if (!outBuf.hasNext) {
              fill()
              val (rows, fut) = inFlight.dequeue()
              val scores = Await.result(fut, Duration.Inf)
              require(scores.length == rows.length,
                s"scorer returned ${scores.length} results for ${rows.length} inputs")
              outBuf = rows.iterator.zip(scores.iterator)
                .map { case (r, s) => Row.fromSeq(r.toSeq :+ s) }
              fill() // keep the pipe full while this batch drains
            }
            outBuf.next()
          }
        }
      }
    }(enc).toDF(outSchema.fieldNames.toIndexedSeq: _*)
  }
}
