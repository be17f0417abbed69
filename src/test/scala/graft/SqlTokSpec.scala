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
      java.nio.file.Paths.get("src/main/scala/graft/plans/GraftSql.scala"))
    assert(src.contains("postParenKeywords = Set(\"ILIKE\", \"END\", \"OVER\")"))
    assert(!src.contains("w != \"ILIKE\""), "ad-hoc exclusion crept back under the guard")
  }
}
