package graft.functions.text

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** JS String.prototype.trim as a native codegen'd expression: strips
  * the ECMA-262 WhiteSpace + LineTerminator set (tabs, newlines, NBSP,
  * BOM, Unicode spaces) where Spark's trim strips only ' ' (reference:
  * src/expression/strings.js:103-105). Replaces the former
  * graft_js_trim ScalaUDF — TRIM() reaches scan/filter paths through
  * the dialect's string-function rewrite, so it must not break
  * whole-stage codegen.
  */
case class JsTrim(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_js_trim"
  override def foldable: Boolean = child.foldable

  override protected def nullSafeEval(v: Any): Any =
    JsTrim.trim(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.text.JsTrim.trim($c)")

  override protected def withNewChildInternal(newChild: Expression): JsTrim =
    copy(child = newChild)
}

object JsTrim {
  private def ws(c: Char): Boolean = c match {
    case '\t' | '\n' | '\u000B' | '\f' | '\r' | ' ' | '\u00A0' |
         '\u1680' | '\u2028' | '\u2029' | '\u202F' | '\u205F' |
         '\u3000' | '\uFEFF' => true
    case ch => ch >= '\u2000' && ch <= '\u200A'
  }

  /** The per-row kernel, shared by eval and the generated code. */
  def trim(s: UTF8String): UTF8String = {
    val str = s.toString
    var i = 0
    var j = str.length
    while (i < j && ws(str.charAt(i))) i += 1
    while (j > i && ws(str.charAt(j - 1))) j -= 1
    if (i == 0 && j == str.length) s
    else UTF8String.fromString(str.substring(i, j))
  }
}
