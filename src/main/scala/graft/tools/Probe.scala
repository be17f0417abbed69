package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Dev scratchpad: probe cross-engine semantics quickly. Not part of the
  * driver contract.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("probe", 8)
    import spark.implicits._
    def t[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"PROBE $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // long docs: the quadratic HOF traps show at realistic doc lengths
    def mkDocs(nDocs: Int, nTok: Int) = spark.range(nDocs)
      .selectExpr("id AS doc_id",
        s"array_join(transform(sequence(1, $nTok), i -> concat('w', pmod(id * 31 + i * 7, 500))), ' ') AS text",
        "CASE WHEN id % 2 = 0 THEN 'src0' ELSE 'src1' END AS source")
    val docs = mkDocs(500, 2000).persist()
    docs.count()
    t("dsir_500x2000tok")(graft.operators.Sampling.dsirWeights(
      docs, "doc_id", "text", "source = 'src0'").count())
    t("bigram_lm_500x2000tok")(graft.operators.TextOps.bigramModel(
      docs, "text").count())
    t("chunk_tokens_500x2000tok")(graft.operators.TextOps.chunkByTokens(
      docs, "text", 64, 8).count())
    t("dup_spans_500x2000tok")(graft.operators.TextOps.duplicateSpans(
      docs, "doc_id", "text").count())
    t("gopher_500x2000tok")(graft.operators.TextOps.gopherSignals(
      docs, "doc_id", "text").selectExpr("sum(n_tok)").collect())
    t("repetition_500x2000tok")(graft.operators.TextOps.repetitionSignals(
      docs, "doc_id", "text").selectExpr("sum(n_tok)").collect())
    spark.stop()
  }
}
