package graft.tools

import graft.GraftSession

/** Dev scratchpad: probe cross-engine semantics quickly. Not part of the
  * driver contract.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("probe", 8)
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val t0 = System.nanoTime()
    val pairs = graft.operators.Dedup.minhashLsh(
      docs, "doc_id", "text", k = 8, bands = 4, threshold = 0.5)
    val nPairs = pairs.count()
    val t1 = System.nanoTime()
    val clusters = graft.operators.Dedup.duplicateClusters(pairs.select("a_id", "b_id"))
    val nC = clusters.count()
    val t2 = System.nanoTime()
    println(f"PROBE pairs=$nPairs (${(t1 - t0) / 1e9}%.2f s) clustered=$nC (${(t2 - t1) / 1e9}%.2f s)")
    spark.stop()
  }
}
