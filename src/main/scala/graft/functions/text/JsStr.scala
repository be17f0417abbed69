package graft.functions.text

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ECMAScript Number-to-String rendering — the reference engine
  * stringifies every value with JS `String(v)` (reference:
  * src/expression/evaluate.js:703-705 CAST to TEXT, strings.js CONCAT),
  * where `String(2.0)` is `"2"`, `String(1e21)` is `"1e+21"` and
  * `String(0.0000001)` is `"1e-7"`. Spark's CAST renders `"2.0"` /
  * `"1.0E21"`. This expression re-formats Java's shortest-digits
  * `Double.toString` output under the ECMA-262 `Number::toString`
  * placement rules (decimal point for -6 < n <= 21, exponent outside),
  * which is exact: both runtimes already agree on the DIGITS (shortest
  * uniquely-decoding form) — only the formatting differs.
  *
  * Non-fractional inputs pass through: integral types via toString
  * (identical in both runtimes), strings unchanged, booleans lowercase,
  * anything else through Spark's own Cast. Cold-path stringification —
  * CodegenFallback is fine here.
  */
case class JsStr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_js_str"

  // timeZoneId is mandatory for timestamp-to-string casts
  private lazy val fallbackCast = Cast(child, StringType,
    Option(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else child.dataType match {
      case DoubleType => UTF8String.fromString(JsStr.render(v.asInstanceOf[Double]))
      case FloatType => UTF8String.fromString(JsStr.render(v.asInstanceOf[Float].toDouble))
      case _: DecimalType =>
        UTF8String.fromString(JsStr.render(v.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble))
      case StringType => v
      case BooleanType | ByteType | ShortType | IntegerType | LongType =>
        UTF8String.fromString(String.valueOf(v))
      case _ => fallbackCast.eval(input)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): JsStr =
    copy(child = newChild)
}

object JsStr {

  /** ECMA-262 Number::toString(x, 10). */
  def render(d: Double): String = {
    if (d.isNaN) "NaN"
    else if (d == Double.PositiveInfinity) "Infinity"
    else if (d == Double.NegativeInfinity) "-Infinity"
    else if (d == 0.0) "0" // String(-0) is "0" in JS
    else {
      val neg = d < 0
      val repr = java.lang.Double.toString(math.abs(d))
      // normalize to (digits, n) with |d| = 0.digits * 10^n
      val (digits0: String, n: Int) =
        if (repr.contains("E")) {
          val parts = repr.split("E")
          (parts(0).replace(".", ""), parts(1).toInt + 1)
        } else {
          val p = repr.indexOf('.')
          val intPart = repr.substring(0, p)
          val frac = repr.substring(p + 1)
          if (intPart == "0") {
            val lead = frac.takeWhile(_ == '0').length
            (frac.substring(lead), -lead)
          } else (intPart + frac, intPart.length)
        }
      val digits = digits0.reverse.dropWhile(_ == '0').reverse.mkString
      val k = digits.length
      val s =
        if (k <= n && n <= 21) digits + "0" * (n - k)
        else if (0 < n && n <= 21) digits.substring(0, n) + "." + digits.substring(n)
        else if (-6 < n && n <= 0) "0." + "0" * (-n) + digits
        else {
          val e = n - 1
          val head = if (k == 1) digits else digits.substring(0, 1) + "." + digits.substring(1)
          head + "e" + (if (e >= 0) "+" else "-") + math.abs(e)
        }
      if (neg) "-" + s else s
    }
  }
}
