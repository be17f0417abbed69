package graft.functions.text

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Out-of-vocabulary token count (TextOps.oovRate):
  * `graft_oov_count(tokens, sortedVocab)` = number of tokens NOT present
  * in the ASCENDING-sorted vocabulary array, by binary search.
  *
  * Matches `size(filter(tokens, t -> NOT array_contains(vocab, t)))`
  * exactly: a null token yields a null predicate and is dropped by
  * `filter` (never counted); a vocabulary containing null makes
  * array_contains return null for absent tokens, so those are not
  * counted either (sort_array puts nulls FIRST, so the binary search
  * runs over the non-null suffix).
  *
  * r17 optimization (guide §4 / VERDICT r16 #4): the HOF filter was
  * interpreted per token AND array_contains is a linear scan of the
  * vocabulary per token — O(tokens · |vocab|) interpreted. This kernel
  * is one codegen'd JVM pass at O(tokens · log |vocab|). The vocabulary
  * must be sorted ascending (TextOps.oovRate builds it with
  * sort_array(collect_set(...)) — same byte-wise UTF8String order the
  * search uses). Doubles stay on the caller's Catalyst tree.
  */
case class OovCount(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_oov_count"

  override def nullSafeEval(tokens: Any, vocab: Any): Any =
    OovCount.compute(tokens.asInstanceOf[ArrayData], vocab.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, v) =>
      s"${ev.value} = graft.functions.text.OovCount.compute($t, $v);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): OovCount = copy(left = newLeft, right = newRight)
}

object OovCount {
  def compute(tokens: ArrayData, vocab: ArrayData): Long = {
    val vn = vocab.numElements()
    // sort_array(asc) places nulls first; search the non-null suffix
    var lo0 = 0
    while (lo0 < vn && vocab.isNullAt(lo0)) lo0 += 1
    val vocabHasNull = lo0 > 0
    val vs = new Array[UTF8String](vn - lo0)
    var i = lo0
    while (i < vn) { vs(i - lo0) = vocab.getUTF8String(i); i += 1 }
    var oov = 0L
    val tn = tokens.numElements()
    i = 0
    while (i < tn) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        var lo = 0
        var hi = vs.length - 1
        var found = false
        while (lo <= hi && !found) {
          val mid = (lo + hi) >>> 1
          val c = vs(mid).compareTo(t)
          if (c == 0) found = true
          else if (c < 0) lo = mid + 1
          else hi = mid - 1
        }
        // array_contains yields NULL (filter-dropped) for an absent
        // token when the vocab itself contains null
        if (!found && !vocabHasNull) oov += 1L
      }
      i += 1
    }
    oov
  }
}
