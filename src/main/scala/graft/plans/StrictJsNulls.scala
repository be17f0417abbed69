package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}

/** Two-valued NULL logic, the reference's comparison semantics
  * (reference: src/expression/binary.js:32-35 — comparison and logical
  * operators return FALSE when either operand is null; evaluate.js:170
  * — `NOT null` is `!null` = true; evaluate.js:750-762 — IN walks
  * sqlEquals and returns false on no match, null never matching).
  *
  * The ENGINE-WIDE default stays standard three-valued SQL: that choice
  * keeps predicates translatable to parquet data-source filters
  * (pushdown) and is pinned with a rationale in SURVEY §2.24. This
  * transform is the documented OPT-IN for users who need the
  * reference's exact rows over scan pushdown, applied per query by
  * [[GraftSql.sqlStrictNulls]] on the ANALYZED plan (the inserted
  * If/IsNull/Coalesce wrappers block filter pushdown for the wrapped
  * predicates — the stated price of the mode).
  *
  * One ambiguity is inherent to plan-level rewriting: Spark's parser
  * desugars `a != b` into `NOT (a = b)`, so the two spellings are
  * indistinguishable here. The reference gives `null != 5` → false but
  * `NOT (null = 5)` → true; this transform implements the `!=` reading
  * (false) for the direct NOT-over-equality shape, by far the common
  * spelling, and the JS `!` reading for every other NOT.
  */
object StrictJsNulls {

  private val F: Expression = Literal.FalseLiteral

  /** false when either side is null, else the expression itself. */
  private def nn(l: Expression, r: Expression, e: Expression): Expression =
    If(Or(IsNull(l), IsNull(r)), F, e)

  /** Disambiguate `a != b` from `NOT (a = b)` — Spark parses BOTH to
    * Not(EqualTo), but the reference gives them different null
    * semantics ('!=' with a null operand is false; unary NOT of the
    * two-valued false is TRUE). The parser's Origin records where the
    * node's text starts: an explicit NOT's span begins with the NOT
    * keyword, a `!=`/`<>` span begins with its left operand. Found by
    * the strict-nulls differential fuzz (4/150 divergences, all this
    * shape). Falls back to the `!=` reading when origin info is absent
    * (plans not built from SQL text).
    */
  private def isTextualNot(n: Not): Boolean = {
    val o = n.origin
    (o.sqlText, o.startIndex) match {
      case (Some(txt), Some(i)) if i >= 0 && i + 3 <= txt.length =>
        // The token must be exactly NOT: a span starting with an
        // identifier like `notes != 5` begins with 'not' too, so also
        // require the next char (if any) to be a non-identifier char.
        txt.regionMatches(true, i, "NOT", 0, 3) &&
          (i + 3 == txt.length || {
            val c = txt.charAt(i + 3)
            !(Character.isLetterOrDigit(c) || c == '_')
          })
      case _ => false
    }
  }

  /** `x NOT BETWEEN …` (operator form) vs `NOT (x BETWEEN …)` (unary
    * JS-!): both spans begin at the NOT keyword, so look at the next
    * token — BETWEEN means the operator form. Plans with no origin
    * default to the operator reading (by far the common spelling).
    */
  private val notBetweenRe =
    java.util.regex.Pattern.compile("(?is)^NOT\\s+BETWEEN\\b")
  private def isNotBetweenForm(nt: Not): Boolean = {
    val o = nt.origin
    (o.sqlText, o.startIndex) match {
      case (Some(txt), Some(i)) if i >= 0 && i < txt.length =>
        notBetweenRe.matcher(txt.substring(i)).lookingAt()
      case _ => true
    }
  }

  private def rw(e: Expression): Expression = e match {
    // `a != b` (parsed as NOT(a = b)): reference '!='/'<>' returns
    // false on a null operand — wrap the pair as ONE unit so the NOT
    // never sees a null-derived false to invert. An explicit textual
    // `NOT (a = b)` instead takes the unary-JS-! route below.
    case nt @ Not(EqualTo(l, r)) if !isTextualNot(nt) =>
      val (l2, r2) = (rw(l), rw(r))
      nn(l2, r2, Not(EqualTo(l2, r2)))
    // `x NOT BETWEEN lo AND hi`: the reference PARSER desugars this to
    // `x < lo OR x > hi` (parse/expression.js:133) — a null operand
    // reads FALSE, not the JS-! TRUE a textual `NOT (x BETWEEN …)`
    // gives (found by the round-12 widened strict fuzz). Spark's parser
    // starts the Not's origin at the NOT keyword for BOTH spellings
    // (the predicate rule owns `NOT? BETWEEN …`), so the disambiguator
    // here is what FOLLOWS the NOT: directly BETWEEN → the operator
    // form, anything else → textual NOT. Mirror the reference desugar
    // with each comparison two-valued.
    case nt @ Not(Between(in, lo, hi, _)) if isNotBetweenForm(nt) =>
      val (in2, lo2, hi2) = (rw(in), rw(lo), rw(hi))
      Or(nn(in2, lo2, LessThan(in2, lo2)), nn(in2, hi2, GreaterThan(in2, hi2)))
    case Not(c) =>
      // JS !v: !null = true — null flips to true, false flips to true,
      // exactly NOT(coalesce(v, false))
      Not(Coalesce(Seq(rw(c), F)))
    case _: EqualNullSafe => e.mapChildren(rw) // <=> is already two-valued
    case cmp: BinaryComparison =>
      val (l2, r2) = (rw(cmp.left), rw(cmp.right))
      nn(l2, r2, cmp.withNewChildren(Seq(l2, r2)))
    case And(l, r) =>
      val (l2, r2) = (rw(l), rw(r))
      nn(l2, r2, And(l2, r2))
    case Or(l, r) =>
      val (l2, r2) = (rw(l), rw(r))
      nn(l2, r2, Or(l2, r2))
    case like: StringRegexExpression => // LIKE / RLIKE
      val (l2, r2) = (rw(like.left), rw(like.right))
      nn(l2, r2, like.withNewChildren(Seq(l2, r2)))
    case il: RuntimeReplaceable
        if il.prettyName == "ilike" && il.children.length == 2 =>
      // ILIKE is RuntimeReplaceable (→ Like(Lower, Lower) only at
      // optimization); wrap the surface form so a null operand is
      // false here too
      val (l2, r2) = (rw(il.children(0)), rw(il.children(1)))
      nn(l2, r2, il.withNewChildren(Seq(l2, r2)))
    // IN walks sqlEquals — JS `==`, under which null == null is TRUE
    // (execute/utils.js:136-139; found by the round-12 widened strict
    // fuzz: `NULLIF(x, k) IN (SELECT NULLIF(y, j) …)` keeps the
    // null-probe row when the list carries a null). Null-safe equality
    // (`<=>`) is exactly sqlEquals for same-typed operands, and an OR
    // of <=> terms is two-valued by construction.
    case In(v, list) =>
      val v2 = rw(v)
      list.map(e => EqualNullSafe(v2, rw(e)): Expression).reduce(Or)
    case InSubquery(values, lq: ListQuery)
        if values.length == 1 && lq.plan.output.length == 1 =>
      // same sqlEquals contract for the subquery form: rebuild as a
      // correlated EXISTS over `probe <=> col`. The probe's attributes
      // become OuterReferences inside the pushed-down filter; the
      // optimizer's decorrelation then plans the usual semi join.
      val v2 = rw(values.head)
      val probe = v2.transformUp {
        case a: AttributeReference => OuterReference(a)
      }
      Exists(
        Filter(EqualNullSafe(probe, lq.plan.output.head), lq.plan),
        (lq.outerAttrs ++ v2.references.toSeq).distinct,
        NamedExpression.newExprId, Seq.empty, lq.hint)
    case ins: InSubquery =>
      // multi-value / degenerate forms keep the conservative wrap:
      // values null → false; an unmatched probe with nulls in the
      // subquery coalesces to false instead of UNKNOWN
      If(ins.values.map(IsNull(_): Expression).reduce(Or),
        F, Coalesce(Seq(ins.mapChildren(rw), F)))
    case other => other.mapChildren(rw)
  }

  def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUpWithSubqueries { case node => node.mapExpressions(rw) }
}
