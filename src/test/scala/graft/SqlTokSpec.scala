package graft

import graft.plans.{GraftSql, SqlTok}
import org.scalatest.funsuite.AnyFunSuite

/** The shared lexer ([[graft.plans.SqlTok]]) that every GraftSql
  * text-rewrite pass consumes, plus the three historical guard
  * regressions re-pinned at the TOKEN-CONSUMER level: each of these
  * was a wrong-rows bug produced by the old per-rewrite char/regex
  * guard stacks (window-spec alias, commit 9652458; generalized
  * alias-after-paren, seed-88014; ILIKE-after-paren, seed-88015 /
  * commit 665e7d5). The pins assert the REWRITTEN TEXT, so a tokenizer
  * or segment-classification change that re-breaks them fails without
  * needing a SparkSession.
  */
class SqlTokSpec extends AnyFunSuite {
  import SqlTok._

  private def kinds(s: String) = tokenize(s).map(_.kind)

  test("tokens carry exact source offsets over quotes, comments and idents") {
    val s = "SELECT a||'x--y' -- tail comment\n , b2 /* c */ FROM \"w t\""
    val t = tokenize(s)
    assert(t.map(tok => s.substring(tok.start, tok.end)) ==
      Vector("SELECT", "a", "||", "'x--y'", ",", "b2", "FROM", "\"w t\""))
    assert(t.map(_.kind) ==
      Vector(Word, Word, Op, Str, Comma, Word, Word, DQuot))
    // uppercase cache for words; raw text elsewhere
    assert(t.head.up == "SELECT" && t(3).up == "'x--y'")
  }

  test("doubled '' reads as two adjacent literals (quote parity preserved)") {
    // the dialect has no backslash escapes: 'a''b' is two literals,
    // exactly the parity the lexer preserves
    assert(kinds("'a''b'") == Vector(Str, Str))
    // an unterminated literal runs to end of input, never out of bounds
    val t = tokenize("x = 'open")
    assert(t.last.kind == Str && t.last.end == "x = 'open".length)
  }

  test("multi-char operators lex as single tokens; dots bind members not numbers") {
    val ops = tokenize("a||b->c->>d::e:=f<=>g<=h>=i!=j<>k!~m")
      .filter(_.kind == Op).map(_.up)
    assert(ops == Vector("||", "->", "->>", "::", ":=", "<=>", "<=", ">=", "!=", "<>", "!~"))
    // .5 is a number where no member base precedes; t1.5 is access
    assert(kinds("SELECT .5, t1.c2") ==
      Vector(Word, Num, Comma, Word, Op, Word))
    assert(tokenize("1.5e-2").map(_.up) == Vector("1.5e-2"))
  }

  test("bracketMatch pairs parens/brackets and tolerates strays") {
    val t = tokenize("f(a[1], (b))]")
    val m = bracketMatch(t)
    val open = t.indexWhere(_.kind == LPar)
    assert(t(m(open)).kind == RPar && m(m(open)) == open)
    val brkOpen = t.indexWhere(_.kind == LBrk)
    assert(t(m(brkOpen)).kind == RBrk)
    assert(m.last == -1) // the stray ] maps to nothing
  }

  test("View.primaryBefore / forwardFrom walk the operand shapes the interval passes need") {
    val v = new View("SELECT g(t.x) - INTERVAL 1 DAY, 'lit' + n2")
    val toks = v.toks
    val minus = toks.indexWhere(_.isOp("-"))
    val (_, s1, e1) = v.primaryBefore(minus)
    assert(v.s.substring(s1, e1) == "g(t.x)")
    // a dotted column chain (no call parens) spans whole
    val v2 = new View("x FROM t WHERE t2.c3 + INTERVAL 1 DAY")
    val plus2 = v2.toks.indexWhere(_.isOp("+"))
    val (_, s3, e3) = v2.primaryBefore(plus2)
    assert(v2.s.substring(s3, e3) == "t2.c3")
    val plus = toks.indexWhere(_.isOp("+"))
    val (_, s2, e2) = v.primaryBefore(plus)
    assert(v.s.substring(s2, e2) == "'lit'")
    val end = v.forwardFrom(plus + 1)
    assert(v.s.substring(toks(plus + 1).start, end) == "n2")
  }

  // ---- the three historical guard regressions, pinned on rewrite text ----

  test("regression pin (9652458): implicit alias after a window spec stays OUTSIDE the || wrap") {
    assert(GraftSql.rewrite("SELECT 'r' || row_number() OVER (ORDER BY x) c0 FROM t") ==
      "SELECT graft_js_str('r') || graft_js_str(row_number() OVER (ORDER BY x)) c0 FROM t")
  }

  test("regression pin (seed-88014): implicit alias after ANY close paren ends the wrap") {
    assert(GraftSql.rewrite("SELECT 'p' || trim(s) q2 FROM t") ==
      "SELECT graft_js_str('p') || graft_js_str(graft_js_trim(graft_js_str(s))) q2 FROM t")
  }

  test("regression pin (665e7d5 / seed-88015): ILIKE and END after a close paren are operators, not aliases") {
    // (expr) ILIKE must wrap its parenthesized operand — the alias
    // misread dropped the graft_js_str wrap, so Spark's '251.0'
    // rendering matched '%0%' where JS '251' does not
    assert(GraftSql.rewrite("SELECT (bal / 1) LIKE '%0%' FROM t") ==
      "SELECT graft_js_str((bal / nullif(1, 0))) ILIKE graft_js_str('%0%') FROM t")
    // END after a paren pops its CASE frame instead of reading as an alias
    assert(GraftSql.rewrite("SELECT CASE WHEN a THEN (b) END || c FROM t") ==
      "SELECT graft_js_str(CASE WHEN a THEN (b) END) || graft_js_str(c) FROM t")
    // and the alias branch exclusion composes with a || trigger upstream
    assert(GraftSql.rewrite("SELECT 'x' || (a + 1) ILIKE '%2%' FROM t") ==
      "SELECT graft_js_str('x') || graft_js_str(graft_js_str((a + 1))) ILIKE graft_js_str('%2%') FROM t")
  }

  test("postParenKeywords is the ONE named exclusion set (no ordered ad-hoc guards)") {
    // the fix-shape the advisor flagged: exclusions patched under an
    // ordered guard invite recurrence. The set spelling means a new
    // legal follower is one entry, and this pin documents the contract:
    // every member must keep its own semantic case when following ')'
    val src = java.nio.file.Files.readString(
      java.nio.file.Paths.get("src/main/scala/graft/plans/rewrite/RewriteSupport.scala"))
    assert(src.contains("postParenKeywords = Set(\"ILIKE\", \"END\", \"OVER\")"))
    val pipeline = java.nio.file.Files.readString(
      java.nio.file.Paths.get("src/main/scala/graft/plans/GraftSql.scala"))
    for (s <- Seq(src, pipeline))
      assert(!s.contains("w != \"ILIKE\""), "ad-hoc exclusion crept back under the guard")
  }

  // ---- round-15 advisor findings: the reference parser is TOKEN-based,
  // so whitespace between a primary and its call-paren / subscript /
  // dot-member suffix is insignificant (`f (x)`, `a [1]`, `t . a` — all
  // probed against the live reference). The old char scanners skipped
  // whitespace; the first SqlTok cut required adjacency. ------------------

  test("advisor r15: whitespace-separated call parens are calls (divisor + NOT IN)") {
    assert(GraftSql.rewrite("SELECT a / abs (b) AS r FROM t") ==
      "SELECT a / nullif(abs (b), 0) AS r FROM t")
    // the NULL-semantics NOT-EXISTS rewrite must not silently drop when
    // the lhs call has a spaced paren
    val nin = GraftSql.rewrite(
      "SELECT a FROM t WHERE abs (a) NOT IN (SELECT a FROM t WHERE a > 1)")
    assert(nin.contains("NOT EXISTS") && nin.contains("<=> abs (a)"), nin)
  }

  test("advisor r15: spaced subscripts and dot chains; keywords never take suffixes") {
    assert(GraftSql.rewrite("SELECT a [1] AS r FROM t") ==
      "SELECT graft_get(a , (1)) AS r FROM t")
    assert(GraftSql.rewrite("SELECT f(x) [0] AS r FROM t") ==
      "SELECT graft_get(f(x) , (0)) AS r FROM t")
    // dot member access chains across whitespace
    val v = new View("x FROM t WHERE t2 . c3 + INTERVAL 1 DAY")
    val plus = v.toks.indexWhere(_.isOp("+"))
    val (_, s0, e0) = v.primaryBefore(plus)
    assert(v.s.substring(s0, e0) == "t2 . c3")
    // an operator/clause keyword before ( or [ is NOT a call/subscript
    assert(GraftSql.rewrite("SELECT CASE WHEN a THEN [1] ELSE [2] END AS r FROM t") ==
      "SELECT CASE WHEN a THEN array(1) ELSE array(2) END AS r FROM t")
    assert(GraftSql.rewrite("SELECT x AND (a > 1) AS r FROM t") ==
      "SELECT x AND (a > 1) AS r FROM t")
  }

  test("advisor r15: comma-TVF with a trailing bare ON no longer throws") {
    // strictLint rejects this on host paths; direct rewrite() callers
    // must get text back, not IndexOutOfBoundsException
    val out = GraftSql.rewrite("SELECT * FROM t, UNNEST(x) a ON")
    assert(out.contains("LATERAL"), out)
  }

  test("advisor r15: ORDER BY agg-alias expansion anchors only at top-level ORDER BY") {
    // the window-spec ORDER BY must not anchor the scan: with a FIRST
    // `ORDER BY` inside OVER(...), a later select-list agg(alias) must
    // NOT be textually expanded from that anchor
    val q = "SELECT price - 1 AS p, rank() OVER (ORDER BY q) AS rk, " +
      "sum(p) AS s FROM t GROUP BY p, q"
    val out = GraftSql.rewrite(q)
    // exactly the GROUP-BY-phase expansions; no ORDER-BY-phase rewrite
    // may touch the select list (no doubled expansion of sum(p))
    assert(!out.contains("sum(graft_js_num((("), out)
  }
}
