package graft.functions.text

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData, DateTimeUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ECMAScript value-to-string rendering — the reference engine
  * stringifies with JS `String(v)` in concatenation contexts
  * (reference: src/expression/binary.js:27-30 `||`, strings.js:31,66
  * CONCAT and every string function's first argument,
  * evaluate.js:371 STRING_AGG) and with `JSON.stringify` in CAST
  * context (evaluate.js:703-706 via execute/utils.js:158 stringify).
  * The two diverge on non-primitives: `[1,2,null] || ''` is
  * `"1,2,"` (JS Array.prototype.toString: join(",") with nulls
  * empty) while `CAST([1,2,null] AS VARCHAR)` is `"[1,2,null]"`;
  * a Date concatenates as the JS long form (`Fri Mar 15 2024
  * 12:34:56 GMT+0000 (Coordinated Universal Time)`) but CASTs to
  * the QUOTED ISO form (`"2024-03-15T12:34:56.789Z"` — the quotes
  * are JSON.stringify's, present in the output).
  *
  * For numbers both contexts agree on ECMA-262 `Number::toString`:
  * `String(2.0)` is `"2"`, `String(1e21)` is `"1e+21"`,
  * `String(0.0000001)` is `"1e-7"` — where Spark's CAST says
  * `"2.0"` / `"1.0E21"`. This expression re-formats Java's
  * shortest-digits `Double.toString` output under the ECMA-262
  * placement rules (decimal point for -6 < n <= 21, exponent
  * outside), which is exact: both runtimes already agree on the
  * DIGITS (shortest uniquely-decoding form) — only the formatting
  * differs.
  *
  * `castMode = false` is `String(v)`; `true` is the CAST surface.
  * Integral types and strings pass through identically in both.
  * Cold-path stringification — CodegenFallback is fine here.
  */
case class JsStr(child: Expression, castMode: Boolean = false)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = if (castMode) "graft_js_cast_str" else "graft_js_str"

  // timeZoneId is mandatory for timestamp-to-string casts
  private lazy val fallbackCast = Cast(child, StringType,
    Option(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else child.dataType match {
      case StringType => v
      case dt if JsStr.renderable(dt) => UTF8String.fromString(JsStr.renderValue(v, dt, castMode))
      case _ => fallbackCast.eval(input)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): JsStr =
    copy(child = newChild)
}

object JsStr {

  def renderable(dt: DataType): Boolean = dt match {
    case DoubleType | FloatType | BooleanType | ByteType | ShortType |
        IntegerType | LongType | StringType | DateType | TimestampType => true
    case _: DecimalType => true
    case ArrayType(et, _) => renderable(et)
    case StructType(fields) => fields.forall(f => renderable(f.dataType))
    case MapType(kt, vt, _) => renderable(kt) && renderable(vt)
    case _ => false
  }

  /** Render a non-null Spark value the way JS would. castMode=false is
    * String(v); castMode=true is the reference CAST path (JSON.stringify
    * for objects and Dates, String(v) for primitives).
    */
  def renderValue(v: Any, dt: DataType, castMode: Boolean): String = dt match {
    case DoubleType => render(v.asInstanceOf[Double])
    case FloatType => render(v.asInstanceOf[Float].toDouble)
    case _: DecimalType => render(v.asInstanceOf[Decimal].toDouble)
    case StringType => v.toString
    case BooleanType | ByteType | ShortType | IntegerType | LongType =>
      String.valueOf(v)
    case TimestampType =>
      val ms = Math.floorDiv(v.asInstanceOf[Long], 1000L)
      if (castMode) "\"" + isoMillis(ms) + "\"" else jsDateLong(ms)
    case DateType =>
      val ms = v.asInstanceOf[Int].toLong * 86400000L
      if (castMode) "\"" + isoMillis(ms) + "\"" else jsDateLong(ms)
    case ArrayType(et, _) =>
      val arr = v.asInstanceOf[ArrayData]
      if (castMode) {
        (0 until arr.numElements()).map { i =>
          if (arr.isNullAt(i)) "null" else renderJson(arr.get(i, et), et)
        }.mkString("[", ",", "]")
      } else {
        // JS Array.prototype.toString: join(",") — nulls render empty,
        // nested arrays recurse through their own toString
        (0 until arr.numElements()).map { i =>
          if (arr.isNullAt(i)) "" else renderValue(arr.get(i, et), et, castMode = false)
        }.mkString(",")
      }
    case st: StructType =>
      if (castMode) renderJson(v, st) else "[object Object]"
    case mt: MapType =>
      if (castMode) renderJson(v, mt) else "[object Object]"
    case _ => String.valueOf(v)
  }

  /** JSON.stringify of a non-null value (the reference CAST path for
    * objects — numbers still render ECMA-style inside).
    */
  private def renderJson(v: Any, dt: DataType): String = dt match {
    case StringType => jsonQuote(v.toString)
    case TimestampType =>
      jsonQuote(isoMillis(Math.floorDiv(v.asInstanceOf[Long], 1000L)))
    case DateType => jsonQuote(isoMillis(v.asInstanceOf[Int].toLong * 86400000L))
    case ArrayType(et, _) =>
      val arr = v.asInstanceOf[ArrayData]
      (0 until arr.numElements()).map { i =>
        if (arr.isNullAt(i)) "null" else renderJson(arr.get(i, et), et)
      }.mkString("[", ",", "]")
    case st: StructType =>
      val row = v.asInstanceOf[InternalRow]
      st.fields.zipWithIndex.map { case (f, i) =>
        val fv = if (row.isNullAt(i)) "null" else renderJson(row.get(i, f.dataType), f.dataType)
        jsonQuote(f.name) + ":" + fv
      }.mkString("{", ",", "}")
    case MapType(kt, vt, _) =>
      val m = v.asInstanceOf[MapData]
      val ks = m.keyArray(); val vs = m.valueArray()
      (0 until m.numElements()).map { i =>
        val k = jsonQuote(renderValue(ks.get(i, kt), kt, castMode = false))
        val mv = if (vs.isNullAt(i)) "null" else renderJson(vs.get(i, vt), vt)
        k + ":" + mv
      }.mkString("{", ",", "}")
    case _ => renderValue(v, dt, castMode = false)
  }

  private def jsonQuote(s: String): String = {
    val sb = new StringBuilder(s.length + 2).append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  /** JS Date.prototype.toISOString: always 3-digit millis, Z suffix. */
  private def isoMillis(epochMs: Long): String = {
    val i = java.time.Instant.ofEpochMilli(epochMs)
    java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
      .withZone(java.time.ZoneOffset.UTC).format(i)
  }

  /** JS Date.prototype.toString under a UTC host (the reference runs
    * node with TZ=UTC in every harness here): `Fri Mar 15 2024
    * 12:34:56 GMT+0000 (Coordinated Universal Time)`.
    */
  private def jsDateLong(epochMs: Long): String = {
    val i = java.time.Instant.ofEpochMilli(epochMs)
    java.time.format.DateTimeFormatter
      .ofPattern("EEE MMM dd yyyy HH:mm:ss 'GMT+0000 (Coordinated Universal Time)'")
      .withZone(java.time.ZoneOffset.UTC)
      .withLocale(java.util.Locale.US).format(i)
  }

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
