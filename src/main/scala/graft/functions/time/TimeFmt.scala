package graft.functions.time

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, TernaryExpression, TimeZoneAwareExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** STRFTIME(ts, '%Y-%m-%d…') — the reference's %-directive formatter
  * (reference: src/expression/date.js STRFTIME: %Y %y %m %d %H %M %S
  * %f %j %%, unknown directives pass through) as a native codegen'd
  * expression. Formats in the SESSION time zone (TimeZoneAwareExpression
  * — the analyzer injects it) so %H agrees with CAST(ts AS STRING) in
  * any environment. Replaces the former graft_strftime ScalaUDF: the
  * expression stays inside whole-stage codegen (static kernel) and
  * constant-folds on literal operands.
  */
case class Strftime(ts: Expression, fmt: Expression,
    timeZoneId: Option[String] = None)
    extends BinaryExpression with ImplicitCastInputTypes
    with TimeZoneAwareExpression {

  override def left: Expression = ts
  override def right: Expression = fmt
  override def inputTypes: Seq[DataType] = Seq(TimestampType, StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_strftime"
  override def foldable: Boolean = children.forall(_.foldable)

  override def withTimeZone(timeZoneId: String): TimeZoneAwareExpression =
    copy(timeZoneId = Option(timeZoneId))

  override protected def nullSafeEval(t: Any, f: Any): Any =
    UTF8String.fromString(Strftime.format(
      t.asInstanceOf[Long], f.toString, zoneId.getId))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val zid = ctx.addReferenceObj("zoneIdStr", zoneId.getId, "java.lang.String")
    nullSafeCodeGen(ctx, ev, (t, f) =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.time.Strftime.format($t, $f.toString(), $zid));")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Strftime =
    copy(ts = newLeft, fmt = newRight)
}

object Strftime {
  /** The per-row kernel: micros-since-epoch → %-formatted text in
    * `zone`. Called from both eval and the generated code.
    */
  def format(micros: Long, fmt: String, zone: String): String = {
    val dt = java.time.Instant
      .ofEpochSecond(Math.floorDiv(micros, 1000000L),
        Math.floorMod(micros, 1000000L) * 1000L)
      .atZone(java.time.ZoneId.of(zone))
    val sb = new java.lang.StringBuilder(fmt.length + 8)
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        fmt.charAt(i + 1) match {
          case 'Y' => sb.append(f"${dt.getYear}%04d")
          case 'y' => sb.append(f"${dt.getYear % 100}%02d")
          case 'm' => sb.append(f"${dt.getMonthValue}%02d")
          case 'd' => sb.append(f"${dt.getDayOfMonth}%02d")
          case 'H' => sb.append(f"${dt.getHour}%02d")
          case 'M' => sb.append(f"${dt.getMinute}%02d")
          case 'S' => sb.append(f"${dt.getSecond}%02d")
          case 'f' => sb.append(f"${dt.getNano / 1000}%06d")
          case 'j' => sb.append(f"${dt.getDayOfYear}%03d")
          case '%' => sb.append('%')
          case other => sb.append('%').append(other)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}

/** DATE_DIFF('unit', a, b) — the reference's calendar diff for
  * YEAR/MONTH (UTC calendar-field subtraction) and truncated elapsed
  * milliseconds for DAY/HOUR/MINUTE/SECOND (reference:
  * src/expression/date.js:110-131) — NOT Spark's datediff. Unknown
  * units are NULL. Replaces the former graft_datediff ScalaUDF with a
  * codegen'd, constant-folding expression; field extraction is UTC like
  * the reference's getUTC* calls, independent of the session zone.
  */
case class DateDiffUnit(unit: Expression, a: Expression, b: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {

  override def first: Expression = unit
  override def second: Expression = a
  override def third: Expression = b
  override def inputTypes: Seq[DataType] =
    Seq(StringType, TimestampType, TimestampType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_datediff"
  override def foldable: Boolean = children.forall(_.foldable)

  override def eval(input: InternalRow): Any = {
    val u = unit.eval(input)
    val av = a.eval(input)
    val bv = b.eval(input)
    if (u == null || av == null || bv == null) null
    else DateDiffUnit.diff(u.toString,
      av.asInstanceOf[Long], bv.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gens = children.map(_.genCode(ctx))
    val boxed = ctx.freshName("ddiff")
    val anyNull = gens.map(_.isNull).mkString(" || ")
    ev.copy(code =
      code"""
        ${gens.map(_.code).mkString("\n")}
        boolean ${ev.isNull} = true;
        long ${ev.value} = 0L;
        if (!($anyNull)) {
          java.lang.Long $boxed = graft.functions.time.DateDiffUnit.diff(
            ${gens(0).value}.toString(), ${gens(1).value}, ${gens(2).value});
          if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.longValue(); }
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): DateDiffUnit =
    copy(unit = newFirst, a = newSecond, b = newThird)
}

object DateDiffUnit {
  /** The per-row kernel over micros-since-epoch operands; null for an
    * unknown unit (the reference's default branch).
    */
  def diff(unit: String, aMicros: Long, bMicros: Long): java.lang.Long = {
    // millis floor exactly like java.sql.Timestamp.getTime did in the
    // UDF this replaced (sub-ms micros floor toward -infinity)
    val aMs = Math.floorDiv(aMicros, 1000L)
    val bMs = Math.floorDiv(bMicros, 1000L)
    def utc(ms: Long) = java.time.Instant.ofEpochMilli(ms)
      .atZone(java.time.ZoneOffset.UTC)
    val ms = bMs - aMs
    // Locale.ROOT: the reference's JS toUpperCase is locale-insensitive;
    // a Turkish default JVM locale would read 'minute' as 'MİNUTE' and
    // fall through to the unknown-unit null branch
    unit.toUpperCase(java.util.Locale.ROOT) match {
      case "YEAR" => java.lang.Long.valueOf(
        (utc(bMs).getYear - utc(aMs).getYear).toLong)
      case "MONTH" =>
        val (za, zb) = (utc(aMs), utc(bMs))
        java.lang.Long.valueOf((zb.getYear - za.getYear) * 12L +
          (zb.getMonthValue - za.getMonthValue))
      case "DAY" => java.lang.Long.valueOf(ms / 86400000L)
      case "HOUR" => java.lang.Long.valueOf(ms / 3600000L)
      case "MINUTE" => java.lang.Long.valueOf(ms / 60000L)
      case "SECOND" => java.lang.Long.valueOf(ms / 1000L)
      case _ => null
    }
  }
}
