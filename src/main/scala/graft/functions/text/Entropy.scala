package graft.functions.text

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (bits) over the codepoints of a string — the
  * perplexity-proxy quality signal (boilerplate and mojibake sit at the
  * entropy extremes). Native codegen'd kernel: one histogram pass, no
  * per-char array materialization.
  *
  * Cross-engine contract: terms are accumulated in ASCENDING codepoint
  * order with exactly `p * (ln p / ln 2)` per term, the same fold a SQL
  * engine runs over `list_sort(list_distinct(chars))` — identical
  * operations in identical order, so the double agrees bit-for-bit
  * before any rounding.
  */
case class Entropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_entropy"

  override def nullSafeEval(input: Any): Any =
    Entropy.entropy(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.text.Entropy.entropy($c);")

  override protected def withNewChildInternal(newChild: Expression): Entropy =
    copy(child = newChild)
}

object Entropy {
  def entropy(s: UTF8String): Double = {
    val str = s.toString
    if (str.isEmpty) return 0.0
    val counts = new java.util.TreeMap[Int, Long]()
    var i = 0
    var total = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      counts.put(cp, counts.getOrDefault(cp, 0L) + 1L)
      total += 1
      i += Character.charCount(cp)
    }
    var h = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / total
      h += p * (Math.log(p) / Math.log(2.0))
    }
    -h
  }
}
