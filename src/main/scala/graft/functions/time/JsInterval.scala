package graft.functions.time

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** JS Date-setter interval arithmetic as a NATIVE codegen'd expression —
  * the whole toDate → applyIntervalToDate → "same format as input" chain
  * (reference: src/expression/date.js:13-41,133-143), formerly the
  * engine's last per-row ScalaUDF. Two ways it differs from SQL interval
  * arithmetic:
  *  - the VALUE may be fractional, and ECMA-262 ToIntegerOrInfinity
  *    truncates the SUMMED component toward zero (setUTCHours(h + 2.5)
  *    adds 2 hours — and h - 2.5 depends on h's value);
  *  - MONTH/YEAR keep the day-of-month by ROLLING OVER (MakeDay:
  *    first-of-target-month + dom-1 days; Mar 31 + 1 MONTH = May 1)
  *    where Spark's add_months CLAMPS to Apr 30.
  * Input-format rules, exactly the reference's:
  *  - only ^\d{4}-\d{2}-\d{2}(T…)? strings are dates — NUMBERS and
  *    everything else yield NULL (toDate:136);
  *  - the result keeps its time only when the input contained 'T'
  *    (String(v).includes('T')) — a date-only OR space-separated input
  *    truncates the result to its UTC date.
  * `kind` distinguishes the JS value classes per ROW: 'typed' is the
  * analog of a Date OBJECT (instanceof Date → time kept, date.js:36),
  * 'ts_str' a string containing 'T' (time kept), 'date_str' a string
  * without (result truncates to its UTC date), 'none' everything else
  * (numbers are not dates). Chained ops thread the ORIGINAL operand's
  * kind through, mirroring the reference's per-step string reformatting.
  *
  * Unlike the ScalaUDF this replaced, the expression participates in
  * whole-stage codegen (doGenCode → static kernel) and CONSTANT-FOLDS
  * when every child is foldable, so literal-operand interval arithmetic
  * collapses at optimization time.
  */
case class JsInterval(raw: Expression, v: Expression, unit: Expression,
    op: Expression, kind: Expression)
    extends Expression with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(raw, v, unit, op, kind)
  override def inputTypes: Seq[DataType] =
    Seq(StringType, DoubleType, StringType, StringType, StringType)
  override def dataType: DataType = TimestampType
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)
  override def prettyName: String = "graft_js_interval"

  override def eval(input: InternalRow): Any = {
    val r = raw.eval(input)
    val vv = v.eval(input)
    val u = unit.eval(input)
    val o = op.eval(input)
    val k = kind.eval(input)
    if (r == null || vv == null || u == null || o == null || k == null) null
    else JsInterval.evalMicros(r.toString, vv.asInstanceOf[Double],
      u.toString, o.toString, k.toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gens = children.map(_.genCode(ctx))
    val boxed = ctx.freshName("jsIvl")
    val anyNull = gens.map(_.isNull).mkString(" || ")
    ev.copy(code =
      code"""
        ${gens.map(_.code).mkString("\n")}
        boolean ${ev.isNull} = true;
        long ${ev.value} = 0L;
        if (!($anyNull)) {
          java.lang.Long $boxed = graft.functions.time.JsInterval.evalMicros(
            ${gens(0).value}.toString(), ${gens(1).value},
            ${gens(2).value}.toString(), ${gens(3).value}.toString(),
            ${gens(4).value}.toString());
          if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.longValue(); }
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): JsInterval =
    copy(raw = newChildren(0), v = newChildren(1), unit = newChildren(2),
      op = newChildren(3), kind = newChildren(4))
}

object JsInterval {
  // V8 date-acceptance branches (each probed against node): date-only
  // allows trailing whitespace but NO offset; the strict-ISO 'T' form
  // allows an offset but NO trailing whitespace (fractional digits
  // unbounded, truncated to millis); the legacy space / lowercase-t
  // form allows both. Anchored at the START on the UNTRIMMED string,
  // like the reference's toDate regex (' 2024-01-01' is null there
  // even though bare V8 would parse it). Compiled once — this runs in
  // the per-row kernel.
  private val JsDateOnly = raw"^(\d{4})-(\d{2})-(\d{2})\s*$$".r
  private val JsStrictT = (raw"^(\d{4})-(\d{2})-(\d{2})" +
    raw"T(\d{2}):(\d{2})(?::(\d{2})(?:\.(\d+))?)?([Zz]|[+-]\d{2}:?\d{2})?$$").r
  private val JsLegacyDt = (raw"^(\d{4})-(\d{2})-(\d{2})" +
    raw"[t ](\d{2}):(\d{2})(?::(\d{2})(?:\.(\d+))?)?([Zz]|[+-]\d{2}:?\d{2})?\s*$$").r

  /** The per-row kernel: micros-since-epoch (proleptic Gregorian,
    * straight through — no hybrid-calendar rebase) or null. Called from
    * both eval and the generated code.
    */
  def evalMicros(rawStr: String, v: Double, unit: String, op: String,
      kind: String): java.lang.Long = {
    if (rawStr == null || v.isNaN ||
        !(kind == "date_str" || kind == "ts_str" || kind == "typed")) return null
    val groups = rawStr match {
      case JsDateOnly(yy, mo, dd) =>
        Some((yy, mo, dd, null: String, null: String, null: String,
          null: String, null: String))
      case JsStrictT(yy, mo, dd, hh, mi, ss, fr, off) =>
        Some((yy, mo, dd, hh, mi, ss, fr, off))
      case JsLegacyDt(yy, mo, dd, hh, mi, ss, fr, off) =>
        Some((yy, mo, dd, hh, mi, ss, fr, off))
      case _ => None // toDate: non-date input (numbers included)
    }
    groups match {
      case Some((yy, mo, dd, hh, mi, ss, fr, off)) =>
        try {
          def i(s: String, d: Int = 0) = if (s == null) d else s.toInt
          val millis = if (fr == null) 0 else (fr + "00").take(3).toInt
          val offset = off match {
            case null | "Z" | "z" => java.time.ZoneOffset.UTC
            case o => java.time.ZoneOffset.of(o)
          }
          // V8's parser: month 1-12 and time fields strict, but day
          // 1-31 is accepted REGARDLESS of month length and rolls over
          // ('1989-02-30' is 1989-03-02) — build via first-of-month +
          // (day-1); T24:00:00 exactly is the next midnight
          val h24 = i(hh) == 24 && i(mi) == 0 && i(ss) == 0 && millis == 0
          require(i(mo) >= 1 && i(mo) <= 12 && i(dd) >= 1 && i(dd) <= 31 &&
            (i(hh) <= 23 || h24) && i(mi) <= 59 && i(ss) <= 59)
          val day0 = java.time.LocalDate.of(i(yy), i(mo), 1)
            .plusDays(i(dd) - 1L + (if (h24) 1 else 0))
          val z0 = java.time.ZonedDateTime.of(
            day0,
            java.time.LocalTime.of(if (h24) 0 else i(hh), i(mi), i(ss), millis * 1000000),
            offset).withZoneSameInstant(java.time.ZoneOffset.UTC)
          val adj = if (op == "-") -v else v
          def t(d: Double): Long = d.toLong // ToIntegerOrInfinity
          // MakeDay: target month at day 1 (never clamps), then dom-1
          // days — rolls over like JS
          def makeDay(year: Long, monthIdx: Long): java.time.ZonedDateTime = {
            val first = java.time.LocalDate.of(Math.toIntExact(year), 1, 1)
              .plusMonths(monthIdx)
            z0.`with`(first.plusDays(z0.getDayOfMonth - 1L))
          }
          val out = unit.toUpperCase(java.util.Locale.ROOT) match {
            case "SECOND" => z0.plusSeconds(t(z0.getSecond + adj) - z0.getSecond)
            case "MINUTE" => z0.plusMinutes(t(z0.getMinute + adj) - z0.getMinute)
            case "HOUR"   => z0.plusHours(t(z0.getHour + adj) - z0.getHour)
            case "DAY"    => z0.plusDays(t(z0.getDayOfMonth + adj) - z0.getDayOfMonth)
            case "MONTH"  => makeDay(z0.getYear.toLong, t((z0.getMonthValue - 1) + adj))
            case "YEAR"   => makeDay(t(z0.getYear + adj), (z0.getMonthValue - 1).toLong)
            case _        => z0
          }
          val kept = if (kind != "date_str") out
            else out.toLocalDate.atStartOfDay(java.time.ZoneOffset.UTC)
          // micros straight from the Instant fields: proleptic
          // Gregorian, no java.sql.Timestamp hybrid-Julian rebase
          // (pre-1582 dates would shift by days through Timestamp)
          val inst = kept.toInstant
          java.lang.Long.valueOf(inst.getEpochSecond * 1000000L + inst.getNano / 1000L)
        } catch { case _: Exception => null } // invalid date parts
      case None => null
    }
  }
}
