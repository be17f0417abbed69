package graft.functions.text

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass integer counts behind the Gopher quality-rule battery
  * (TextOps.gopherSignals): given the token array
  * `split(lower(trim(text)), '\s+')`, returns
  * `(n_tok, top3, dup5x, sumlen, n_alpha)` where
  *  - `top3`   = occurrence count of the most frequent trigram
  *    (space-joined, byte-equality — the count the HOF formulation got
  *    from run-lengths over `array_sort(grams)`; any total order groups
  *    equal keys, so a hash count is the same number),
  *  - `dup5x`  = (total 5-grams) − (distinct 5-grams),
  *  - `sumlen` = Σ length(token) in codepoints (UTF8String.numChars —
  *    exactly Spark's `length`),
  *  - `n_alpha`= tokens matching `^[a-z]+$` (non-empty, every char in
  *    a–z; evaluated on the same `toString` a Java-regex RLike sees).
  *
  * r16 optimization (guide: eliminate non-codegen expressions in the hot
  * path): the HOF formulation was interpreted per lambda element —
  * measured 1.3–2.0 s for 10k ~54-token docs at sf0.1; this kernel is
  * one JVM pass per row inside whole-stage codegen. The quotient/round
  * arithmetic stays OUTSIDE in Catalyst (TextOps.gopherSignals), on the
  * same expression tree as before, so the IEEE results are bit-identical
  * (GopherSpec pins kernel-vs-HOF equality on adversarial inputs).
  */
case class GopherCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = GopherCounts.schema
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_gopher_counts"

  override def nullSafeEval(input: Any): Any =
    GopherCounts.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.text.GopherCounts.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): GopherCounts =
    copy(child = newChild)
}

object GopherCounts {
  val schema: StructType = StructType(Seq(
    StructField("n_tok", LongType, nullable = false),
    StructField("top3", LongType, nullable = false),
    StructField("dup5x", LongType, nullable = false),
    StructField("sumlen", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false)))

  private val SPACE = UTF8String.fromString(" ")

  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
    var sumlen = 0L
    var nAlpha = 0L
    i = 0
    while (i < n) {
      val t = toks(i)
      if (t != null) {
        sumlen += t.numChars()
        val s = t.toString
        var ok = s.length > 0
        var j = 0
        while (ok && j < s.length) {
          val c = s.charAt(j)
          if (c < 'a' || c > 'z') ok = false
          j += 1
        }
        if (ok) nAlpha += 1
      }
      i += 1
    }
    var top3 = 0L
    if (n >= 3) {
      val counts = new java.util.HashMap[UTF8String, Int](math.max(8, n))
      i = 0
      while (i <= n - 3) {
        val g = UTF8String.concatWs(SPACE, toks(i), toks(i + 1), toks(i + 2))
        val c = counts.merge(g, 1, (a, b) => a + b)
        if (c > top3) top3 = c
        i += 1
      }
    }
    var dup5x = 0L
    if (n >= 5) {
      val seen = new java.util.HashSet[UTF8String](math.max(8, n))
      i = 0
      while (i <= n - 5) {
        if (!seen.add(UTF8String.concatWs(SPACE,
            toks(i), toks(i + 1), toks(i + 2), toks(i + 3), toks(i + 4)))) {
          dup5x += 1
        }
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](n.toLong, top3, dup5x, sumlen, nAlpha))
  }
}
