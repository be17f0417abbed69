package graft.functions.text

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass integer counts behind the repetition-signal battery
  * (TextOps.repetitionSignals): given the token array
  * `split(lower(trim(text)), '\s+')`, returns
  * `(n_tok, n_distinct, top2, n_bigrams)` where
  *  - `n_distinct` = count of distinct tokens (array_distinct semantics:
  *    byte equality, a null counts once),
  *  - `top2`   = occurrence count of the most frequent bigram
  *    (space-joined via concat_ws semantics — nulls skipped; the count
  *    the HOF formulation got from run-lengths over the sorted bigram
  *    array; any total order groups equal keys, so a hash count is the
  *    same number),
  *  - `n_bigrams` = max(n_tok − 1, 0), the bigram slot count.
  *
  * r17 optimization (guide §4 / VERDICT r16 #4 — the GopherCounts
  * pattern): the HOF formulation (array_sort + filter + zip_with run-
  * length per row) is interpreted per lambda element; this kernel is one
  * JVM pass per row inside whole-stage codegen. The quotient/round
  * arithmetic stays OUTSIDE in Catalyst (TextOps.repetitionSignals), on
  * the same expression tree as before (same casts, same operand order),
  * so every emitted double is bit-identical to the HOF formulation —
  * pinned by RepetitionSpec's kernel-vs-HOF sweep.
  */
case class RepetitionCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = RepetitionCounts.schema
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_repetition_counts"

  override def nullSafeEval(input: Any): Any =
    RepetitionCounts.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.text.RepetitionCounts.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): RepetitionCounts =
    copy(child = newChild)
}

object RepetitionCounts {
  val schema: StructType = StructType(Seq(
    StructField("n_tok", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top2", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false)))

  private val SPACE = UTF8String.fromString(" ")

  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
    // distinct tokens — array_distinct counts a null element once
    val distinct = new java.util.HashSet[UTF8String](math.max(8, n))
    var sawNull = false
    i = 0
    while (i < n) {
      if (toks(i) == null) sawNull = true else distinct.add(toks(i))
      i += 1
    }
    val nDistinct = distinct.size.toLong + (if (sawNull) 1L else 0L)
    var top2 = 0L
    if (n >= 2) {
      val counts = new java.util.HashMap[UTF8String, Int](math.max(8, n))
      i = 0
      while (i <= n - 2) {
        val g = UTF8String.concatWs(SPACE, toks(i), toks(i + 1))
        val c = counts.merge(g, 1, (a, b) => a + b)
        if (c > top2) top2 = c
        i += 1
      }
    }
    val nBigrams = if (n >= 2) (n - 1).toLong else 0L
    new GenericInternalRow(Array[Any](n.toLong, nDistinct, top2, nBigrams))
  }
}
