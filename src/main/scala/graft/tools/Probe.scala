package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Dev scratchpad: probe cross-engine semantics quickly. Not part of the
  * driver contract.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("probe", 8)
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def t[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"PROBE $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    t("gopher_once")(graft.operators.TextOps.gopherSignals(docs, "doc_id", "text").count())
    val sig = graft.operators.TextOps.gopherSignals(docs, "doc_id", "text")
      .filter(col("dup_5gram_frac") < 0.5 && col("alpha_frac") >= 0.5)
      .select("doc_id")
    val gated = docs.join(sig, "doc_id")
    t("gated")(gated.count())
    val deduped = graft.operators.Dedup.dropExact(gated, Seq("text"), "doc_id")
    t("deduped")(deduped.count())
    t("chunks")(graft.operators.TextOps.chunkByTokens(deduped, "text", 64, 8).count())
    t("pipeline_whole") {
      val s2 = graft.operators.TextOps.gopherSignals(docs, "doc_id", "text")
        .filter(col("dup_5gram_frac") < 0.5 && col("alpha_frac") >= 0.5).select("doc_id")
      val g2 = docs.join(s2, "doc_id")
      val d2 = graft.operators.Dedup.dropExact(g2, Seq("text"), "doc_id")
      graft.operators.TextOps.chunkByTokens(d2, "text", 64, 8).count()
    }
    spark.stop()
  }
}
