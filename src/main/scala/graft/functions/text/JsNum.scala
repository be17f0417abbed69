package graft.functions.text

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** ECMAScript `Number(v)` coercion for aggregate inputs.
  *
  * The reference's SUM/AVG accumulator folds `Number(value)` and keeps
  * only finite results (reference: src/execute/accumulator.js:60-67 —
  * `const num = Number(value); if (Number.isFinite(num)) ...`), so a
  * STRING column accumulates its numeric-looking cells ('10' → 10) and
  * silently skips the rest ('abc' → NaN → skipped; '' → 0 → counted).
  * Spark's ANSI SUM over a string column instead fails the whole query
  * on the first non-numeric cell.
  *
  * This expression reproduces the JS coercion for the child types Spark
  * cannot: strings parse under the StringToNumber grammar (trimmed;
  * empty → 0; 0x/0o/0b integer literals; 'Infinity' forms), booleans
  * map to 0/1, and any non-finite outcome returns NULL so the SQL
  * aggregate skips it exactly like the reference's isFinite gate.
  * Numeric children pass through untouched (and
  * [[graft.plans.StripIdentityJsNum]] removes the wrap at optimization
  * time, so numeric aggregation keeps whole-stage codegen). Cold-path
  * dialect helper — CodegenFallback by design.
  */
case class JsNum(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = child.dataType match {
    case StringType | BooleanType | NullType => DoubleType
    case dt => dt
  }
  override def nullable: Boolean = true
  override def prettyName: String = "graft_js_num"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else child.dataType match {
      case StringType =>
        val d = JsNum.jsStringToNumber(v.toString)
        if (java.lang.Double.isFinite(d)) d else null
      case BooleanType => if (v.asInstanceOf[Boolean]) 1.0 else 0.0
      case _ => v
    }
  }

  override protected def withNewChildInternal(newChild: Expression): JsNum =
    copy(child = newChild)
}

object JsNum {
  // ECMA-262 StringNumericLiteral: optional sign + decimal literal with
  // optional exponent. Hex/octal/binary forms take NO sign in JS.
  private val decimalRe =
    "[+-]?(?:[0-9]+(?:\\.[0-9]*)?|\\.[0-9]+)(?:[eE][+-]?[0-9]+)?".r
  private val hexRe = "0[xX][0-9a-fA-F]+".r
  private val octRe = "0[oO][0-7]+".r
  private val binRe = "0[bB][01]+".r

  /** JS `Number(string)`: NaN for anything outside the grammar. */
  def jsStringToNumber(s: String): Double = {
    val t = s.trim
    if (t.isEmpty) 0.0
    else if (t == "Infinity" || t == "+Infinity") Double.PositiveInfinity
    else if (t == "-Infinity") Double.NegativeInfinity
    else if (hexRe.pattern.matcher(t).matches())
      new java.math.BigInteger(t.substring(2), 16).doubleValue()
    else if (octRe.pattern.matcher(t).matches())
      new java.math.BigInteger(t.substring(2), 8).doubleValue()
    else if (binRe.pattern.matcher(t).matches())
      new java.math.BigInteger(t.substring(2), 2).doubleValue()
    else if (decimalRe.pattern.matcher(t).matches()) t.toDouble
    else Double.NaN
  }
}
