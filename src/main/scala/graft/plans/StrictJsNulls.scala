package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

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

  private def rw(e: Expression): Expression = e match {
    // `a != b` (parsed as NOT(a = b)): reference '!='/'<>' returns
    // false on a null operand — wrap the pair as ONE unit so the NOT
    // never sees a null-derived false to invert. An explicit textual
    // `NOT (a = b)` instead takes the unary-JS-! route below.
    case nt @ Not(EqualTo(l, r)) if !isTextualNot(nt) =>
      val (l2, r2) = (rw(l), rw(r))
      nn(l2, r2, Not(EqualTo(l2, r2)))
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
    case In(v, list) =>
      val v2 = rw(v)
      If(IsNull(v2), F, Coalesce(Seq(In(v2, list.map(rw)), F)))
    case ins: InSubquery =>
      // values null → false; an unmatched probe with nulls in the
      // subquery coalesces to false instead of UNKNOWN
      If(ins.values.map(IsNull(_): Expression).reduce(Or),
        F, Coalesce(Seq(ins.mapChildren(rw), F)))
    case other => other.mapChildren(rw)
  }

  def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUpWithSubqueries { case node => node.mapExpressions(rw) }
}
