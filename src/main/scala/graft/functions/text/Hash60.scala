package graft.functions.text

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine's shared deterministic 60-bit hash — the top 15 hex digits
  * of md5 — as a native codegen'd expression. Numerically identical to
  * `CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT)` (and to DuckDB's
  * `('0x' || substr(md5(x), 1, 15))::BIGINT`), but computed straight from
  * the digest bytes: no hex string, no substring, no string-to-int parse.
  * This is the hot kernel under MinHash/SimHash/LSH dedup.
  */
case class Hash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_hash60"

  override def nullSafeEval(input: Any): Any =
    Hash60.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.text.Hash60.hash($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)
}

object Hash60 {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of md5: first 7 digest bytes + the high nibble of the
    * 8th — exactly the value of the first 15 hex digits.
    */
  def hash(bytes: Array[Byte]): Long = {
    val d = md5.get()
    d.reset()
    val digest = d.digest(bytes)
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (digest(i) & 0xffL); i += 1 }
    (h << 4) | ((digest(7) & 0xf0L) >> 4)
  }
}
