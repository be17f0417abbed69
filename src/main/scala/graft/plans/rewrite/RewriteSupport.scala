package graft.plans
package rewrite

/** Shared substrate of the GraftSql rewrite pipeline: the call-site
  * scanner ([[rewriteCall]]/[[callSite]]), token-edit splicing, the
  * strict-type raise helpers, the higher-order-function context guard,
  * and the small keyword/regex tables more than one pass consumes.
  * Every pass module imports this; ALL quote/paren/comment
  * classification stays in [[graft.plans.SqlTok]].
  */
private[plans] object RewriteSupport {

  import SqlTok.{matchParen, splitTopLevel}

  // The legal non-boundary followers of a `)` — each has its own
  // handling wherever a pass must decide whether a bare word after a
  // close-paren is an IMPLICIT ALIAS or part of the expression. Named
  // as ONE set (vs the round-11/12 shape of ad-hoc exclusions ordered
  // under per-pass guards) so a future dialect keyword lands here
  // instead of silently reading as an alias: `(x) ILIKE '%0%'` must
  // wrap its parenthesized operand (seed-88015 fuzz find), `CASE …
  // THEN (x) END` must pop its case-frame / not register a phantom
  // `end` alias, and `rank() OVER (…)` must keep the window expression
  // in one segment. Consumers: rewriteJsConcatOps (segment logic),
  // rewriteAliasExpansion (implicit-alias capture).
  private[plans] val postParenKeywords = Set("ILIKE", "END", "OVER")


  // TYPE-strict arguments (strings.js:38-56 LENGTH/OCTET_LENGTH,
  // evaluate.js JSON_VALUE family): the reference throws AT EXECUTION
  // when the input's runtime CLASS is wrong — number/boolean where JSON
  // text or a string is required. The class is the column's STATIC type
  // here, so the guard is typeof()-keyed and typeof is foldable: for
  // allowed types it constant-folds away entirely (zero runtime cost),
  // for banned ones it folds to a bare per-row raise_error — errors
  // exactly when a row flows, like the reference's row-1 throw, and
  // both engines still accept the query over an empty table. This is
  // TYPE dispatch, not per-row data validation: a dirty CELL in a
  // string column stays lenient. (LENGTH itself gets the same
  // strictness inside LengthAny.)
  // __typeofkeep__ marker, not bare typeof: these guards are emitted
  // BEFORE the user-facing TYPEOF → DuckDB-name rewrite runs, and the
  // marker resolves back to Spark typeof right after it (same dance as
  // the lenient TIMESTAMP cast)
  private[plans] def numericTypeof(x: String): String =
    s"(__typeofkeep__($x) IN ('tinyint','smallint','int','bigint','float'," +
      s"'double','boolean') OR __typeofkeep__($x) LIKE 'decimal%')"


  // the null check nests INSIDE the raise branch: the reference
  // null-checks the VALUE before its type throw (strings.js val==null,
  // evaluate.js jsonArg==null — a numeric column of NULLs returns
  // NULLs, not an error), and keeping the outer CASE typeof-only
  // preserves its foldability — allowed types still fold to zero cost
  private[plans] def strictRaise(x: String, msg: String): String =
    s"(CASE WHEN ($x) IS NULL THEN NULL " +
      s"ELSE CAST(raise_error('$msg') AS STRING) END)"


  private[plans] def jsonStrictInput(fname: String, x: String): String =
    s"(CASE WHEN ${numericTypeof(x)} THEN ${strictRaise(x,
      s"${fname.toUpperCase(java.util.Locale.ROOT)}(expression, path): first argument must be JSON string or object")} " +
      s"ELSE graft_json_input($x) END)"


  private[plans] def octetStrict(x: String): String =
    s"(CASE WHEN __typeofkeep__($x) NOT IN ('string', 'void') THEN ${strictRaise(x,
      "OCTET_LENGTH(string): expected string. Use CAST to convert to a string first.")} " +
      s"ELSE $x END)"


  private[plans] val jsonScalarLit =
    raw"""[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?|true|false|null|"([^"\\]|\\.)*"""".r

  private[plans] def jsonEachScalarErr(arg: String): Option[String] = {
    val a0 = arg.trim
    if (a0.startsWith("'") && a0.endsWith("'") && a0.length >= 2 &&
        !a0.substring(1, a0.length - 1).contains("'")) {
      val body = a0.substring(1, a0.length - 1).trim
      if (body.isEmpty || body.startsWith("{") || body.startsWith("[")) None
      else if (jsonScalarLit.matches(body))
        Some("JSON_EACH(value): argument must be a JSON object or array")
      else
        Some("JSON_EACH(value): invalid JSON string. Argument must be valid JSON.")
    } else if (a0.equalsIgnoreCase("true") || a0.equalsIgnoreCase("false") ||
        a0.matches(raw"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?"))
      Some("JSON_EACH(value): argument must be a JSON object or array")
    else None
  }


  /** True when `s` has a comma OUTSIDE single quotes and parens — i.e.
    * the call really has multiple arguments.
    */
  private[plans] def hasTopLevelComma(s: String): Boolean =
    splitTopLevel(s).lengthIs > 1


  /** One-pass token-edit walker: tokenize once, collect disjoint span
    * replacements, splice. The shape every small keyword/operator
    * rewrite uses (string literals, comments and quoted identifiers are
    * classified by the lexer, never by per-pass guards).
    */
  private[plans] def tokenEdit(s: String)(
      collect: SqlTok.View => Seq[(Int, Int, String)]): String = {
    val v = new SqlTok.View(s)
    SqlTok.applyEdits(s, collect(v))
  }


  /** Call-site scan shared by rewriteCall/rewriteAggFilter: the first
    * `fname (` site (Word token, then LPar, whitespace tolerated)
    * starting at or after char `fromChar`, as (nameTokIdx, closeTokIdx)
    * — or null when none. An unbalanced open paren ends the scan like
    * the char version did.
    */
  private[plans] def callSite(v: SqlTok.View, up: String, fromChar: Int): (Int, Int) = {
    val toks = v.toks
    var k = 0
    while (k + 1 < toks.length) {
      if (toks(k).is(up) && toks(k).start >= fromChar &&
          toks(k + 1).kind == SqlTok.LPar) {
        val close = v.brk(k + 1)
        return if (close < 0) null else (k, close)
      }
      k += 1
    }
    null
  }


  /** Rewrite every `fname(args)` call via `f(splitArgs)` — token-driven,
    * so nested calls, commas inside arguments, string literals and
    * comments are classified by the shared lexer; inner occurrences of
    * `fname` are rewritten on subsequent passes (builders emit markers
    * when their output contains the scanned name).
    */
  private[plans] def rewriteCall(sql: String, fname: String, f: Seq[String] => String): String = {
    val up = fname.toUpperCase(java.util.Locale.ROOT)
    var s = sql
    var guard = 0
    while (guard < 1000) {
      guard += 1
      val v = new SqlTok.View(s)
      val site = callSite(v, up, 0)
      if (site == null) return s
      val (name, close) = site
      val args = splitTopLevel(s.substring(v.toks(name + 1).end, v.toks(close).start))
      s = s.substring(0, v.toks(name).start) + f(args) + s.substring(v.toks(close).end)
    }
    s
  }


  /** Like rewriteCall, but also captures a trailing `FILTER (WHERE ...)`
    * clause so the builder can fold it INSIDE the rewritten aggregate —
    * needed when the aggregate ends up nested in a non-aggregate wrapper
    * (to_json/transform), which reject a FILTER suffix.
    */
  private[plans] def rewriteAggFilter(sql: String, fname: String,
                               f: (Seq[String], Option[String]) => String): String = {
    val up = fname.toUpperCase(java.util.Locale.ROOT)
    var s = sql
    var guard = 0
    while (guard < 1000) {
      guard += 1
      val v = new SqlTok.View(s)
      val site = callSite(v, up, 0)
      if (site == null) return s
      val (name, close) = site
      val toks = v.toks
      val args = splitTopLevel(s.substring(toks(name + 1).end, toks(close).start))
      // optional FILTER ( ... ) suffix, consumed into the builder
      val (filt, endTok) =
        if (close + 2 < toks.length && toks(close + 1).is("FILTER") &&
            toks(close + 2).kind == SqlTok.LPar && v.brk(close + 2) >= 0) {
          val fc = v.brk(close + 2)
          (Some(s.substring(toks(close + 2).start, toks(fc).end)), fc)
        } else (None, close)
      s = s.substring(0, toks(name).start) + f(args, filt) + s.substring(toks(endTok).end)
    }
    s
  }


  /** Higher-order functions whose second/third argument is a lambda — a
    * `x -> 'p'` inside one of these is a lambda body, NOT a JSON access.
    * Both dialect (list_*) and Spark spellings, since arrows rewrite first.
    */
  private[plans] val hofNames = Set(
    "TRANSFORM", "FILTER", "EXISTS", "FORALL", "AGGREGATE", "REDUCE",
    "ZIP_WITH", "MAP_FILTER", "MAP_ZIP_WITH", "TRANSFORM_KEYS",
    "TRANSFORM_VALUES", "ARRAY_SORT", "SORT_ARRAY",
    "LIST_TRANSFORM", "LIST_FILTER", "LIST_REDUCE", "LIST_AGGREGATE",
    "LIST_SORT", "ANY_MATCH", "ALL_MATCH", "NONE_MATCH")


  /** True when token `tokIdx` sits inside a higher-order-function call —
    * its innermost enclosing paren has an adjacent-or-spaced function
    * name from [[hofNames]]. An arrow under a `filter`/`exists` call is
    * only a lambda when that call is the HOF form, not SQL `FILTER
    * (WHERE ...)` / `EXISTS (SELECT ...)` — those open with a keyword, a
    * lambda never does.
    */
  private[plans] def isHofContext(v: SqlTok.View, tokIdx: Int): Boolean = {
    val t = v.toks
    var depth = 0
    var i = tokIdx - 1
    while (i >= 0) {
      t(i).kind match {
        case SqlTok.RPar => depth += 1; i -= 1
        case SqlTok.LPar if depth > 0 => depth -= 1; i -= 1
        case SqlTok.LPar =>
          // innermost enclosing paren: HOF iff its call name says so
          return i > 0 && t(i - 1).kind == SqlTok.Word &&
            hofNames.contains(t(i - 1).up) && {
              val name = t(i - 1).up
              if (name == "FILTER" || name == "EXISTS") {
                val w = if (i + 1 < t.length && t(i + 1).kind == SqlTok.Word)
                  t(i + 1).up else ""
                w != "WHERE" && w != "SELECT"
              } else true
            }
        case _ => i -= 1
      }
    }
    false
  }


  /** Glob pattern → anchored regex (`*` → `.*`, `?` → `.`, classes kept,
    * regex metacharacters escaped).
    */
  private[plans] def globToRegex(g: String): String = {
    val sb = new StringBuilder("^")
    var i = 0
    while (i < g.length) {
      g.charAt(i) match {
        case '*' => sb.append(".*")
        case '?' => sb.append('.')
        case '[' =>
          val j = g.indexOf(']', i + 1)
          if (j < 0) sb.append("\\[")
          else {
            // glob negation is [!...]; regex spells it [^...]
            val body = g.substring(i + 1, j)
            val cls = if (body.startsWith("!")) "^" + body.drop(1) else body
            sb.append('[').append(cls).append(']')
            i = j
          }
        case c if "\\.^$+{}()|".indexOf(c.toInt) >= 0 => sb.append('\\').append(c)
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('$').toString
  }


  /** The [start, end) char span of the TOP-LEVEL select list (first
    * SELECT at paren-depth 0 up to its FROM), or None for
    * non-SELECT-headed text.
    */
  private[plans] def topSelectSpan(s: String): Option[(Int, Int)] = {
    val v = new SqlTok.View(s)
    val sel = v.topIdx(0, v.toks.length)(_.is("SELECT"))
    if (sel < 0) return None
    val from = v.topIdx(sel + 1, v.toks.length)(_.is("FROM"))
    if (from < 0) None else Some((v.toks(sel).end, v.toks(from).start))
  }


  /** Char position of the first of `kws` as a Word token at paren depth
    * 0 within chars `[from, to0)`. Returns -1 when none.
    */
  private[plans] def topKwPos(s: String, from: Int, to0: Int, kws: Seq[String]): Int = {
    val v = new SqlTok.View(s)
    val to = math.min(to0, s.length)
    var i = v.tokAtOrAfter(from)
    while (i < v.toks.length && v.toks(i).start < to) {
      if (v.depth(i) == 0 && v.toks(i).kind == SqlTok.Word &&
          kws.contains(v.toks(i).up)) return v.toks(i).start
      i += 1
    }
    -1
  }
}
