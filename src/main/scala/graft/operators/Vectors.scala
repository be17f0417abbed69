package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-column operators beyond similarity search: per-group
  * centroids — the building block for IVF coarse quantizer training,
  * cluster summaries, and drift monitoring.
  */
object Vectors {

  /** Element-wise mean embedding per `labelCol` group.
    *
    * Sums run over scaled int64 ("micro-units"), not floats: integer
    * addition is associative, so the result is independent of partial-
    * aggregation order — the property that makes the answer stable
    * across partitionings, engines, and reruns (float sums are not).
    *
    * Scale shape: posexplode → partial-combining hash aggregate on
    * (label, pos). The shuffle carries one row per (label, pos) PER MAP
    * PARTITION — map-side combine collapses the n×dim explode — then a
    * tiny per-label reassembly. No collect, no all-pairs.
    */
  def centroids(df: DataFrame, labelCol: String, embCol: String,
                scale: Long = 1000000L): DataFrame =
    centroidSums(df, labelCol, embCol, scale)
      .withColumn("centroid",
        expr(s"transform(sums, s -> CAST(s AS DOUBLE) / $scale / n_vecs)"))
      .drop("sums")

  /** The exact-arithmetic core of [[centroids]]: per-(label, position)
    * scaled-int64 sums, reassembled into one `sums` array per label
    * (plus `n_vecs`). Exposed separately because the integer sums are
    * reproducible bit-for-bit across engines and partitionings — the
    * form the cross-engine oracle checks — while the division into a
    * mean is left to the caller's precision policy.
    */
  def centroidSums(df: DataFrame, labelCol: String, embCol: String,
                   scale: Long = 1000000L): DataFrame = {
    val ex = df
      .select(col(labelCol), posexplode(col(embCol)).as(Seq("pos", "v")))
      // the DOUBLE cast is load-bearing: FLOAT * INT would multiply in
      // float precision and round a different micro-unit than an engine
      // that promotes to double
      .withColumn("sv", expr(s"CAST(round(CAST(v AS DOUBLE) * $scale) AS BIGINT)"))
    ex.groupBy(col(labelCol), col("pos"))
      .agg(count(lit(1)).as("n"), sum("sv").as("ssum"))
      .groupBy(col(labelCol))
      .agg(max("n").as("n_vecs"),
        expr("transform(array_sort(collect_list(struct(pos, ssum))), x -> x.ssum)")
          .as("sums"))
  }
}
