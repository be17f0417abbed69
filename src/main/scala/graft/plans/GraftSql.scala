package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dialect front-end: accepts the reference engine's SQL dialect
  * (DuckDB/Postgres-flavored SELECT-only — reference: src/parse, syntax.md)
  * and executes it on Spark by rewriting the handful of constructs Spark
  * SQL doesn't share, then delegating to `spark.sql`.
  *
  * Spark already covers most of the dialect natively (ILIKE,
  * POSITION(x IN y), `::` casts, `||` concat, LIMIT/OFFSET, FILTER
  * (WHERE ...), QUALIFY-free window queries, lambda-free arrays), so the
  * rewrite list is deliberately small and token-based — a full parser
  * would duplicate what Catalyst does better.
  *
  * Rewrites:
  *  - JSON arrows: `x -> 'k'` / `x ->> 'k'` / `x -> i` (chainable) to
  *    `get_json_object` paths — skipped inside higher-order-function
  *    lambdas (`list_transform(xs, x -> 'p' || x)` is left alone).
  *  - `SELECT DISTINCT ON (k) ...` → row_number window + `__rn = 1`.
  *  - `struct_pack(k := v)` → `named_struct('k', v)`; `struct_extract`.
  *  - `json_group_array` / `json_group_object` aggregates.
  *  - `x GLOB 'pat'` → `x RLIKE '^…$'` (glob→regex on the literal).
  *  - `TYPEOF` → DuckDB-style type names over Spark `typeof`.
  *  - Function renames: string_split/str_split → split, strlen →
  *    octet_length, list_* → array_*, `list(x)` → collect_list,
  *    regexp_split_to_array → split, regexp_split_to_table →
  *    explode(split(..)), charindex → position, to_timestamp →
  *    timestamp_seconds, strftime → %-format helper, json_query →
  *    get_json_object, regexp_matches → RLIKE, epoch(x) → unix seconds.
  */
object GraftSql {

  // ALL quote/paren/comment classification lives in the shared lexer —
  // every rewrite pass consumes its token stream (SqlTok.View); the
  // only character-level helpers left are fragment utilities
  // (splitTopLevel over an extracted argument list, matchParen for
  // unwrapping one extracted primary, stripComments as the pipeline's
  // first pass). No pass keeps a private scanner (the per-rewrite
  // guard stacks produced the alias-after-paren wrong-rows bugs of
  // rounds 11-12).
  import SqlTok.{matchParen, splitTopLevel, stripComments}

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
  private val postParenKeywords = Set("ILIKE", "END", "OVER")

  private val renames: Seq[(String, String)] = Seq(
    // string_split / str_split rewrite in rewrite() (literal-delimiter
    // semantics need regex quoting, not a bare rename)
    "regexp_split_to_array" -> "split",
    "strlen" -> "octet_length",
    "list_value" -> "array",
    // the array family dispatches at RUNTIME in the reference — NULL
    // for any non-array input (evaluate.js:596-635) — where Spark's
    // builtins reject at analysis; the graft_array_* expressions match
    "list_contains" -> "graft_array_contains",
    "array_contains" -> "graft_array_contains",
    "list_distinct" -> "array_distinct",
    "list_sort" -> "graft_array_sort",
    "array_sort" -> "graft_array_sort",
    "list_append" -> "graft_array_append",
    "array_append" -> "graft_array_append",
    "list_concat" -> "graft_array_concat",
    "list_transform" -> "transform",
    "list_filter" -> "filter",
    "list" -> "collect_list",
    // LEN/SIZE/CARDINALITY/LIST_LENGTH: array length with RUNTIME type
    // dispatch — NULL for any non-array (evaluate.js:574-595), where
    // Spark's size rejects non-arrays at analysis. graft_size matches.
    "list_length" -> "graft_size",
    "len" -> "graft_size",
    "size" -> "graft_size",
    "cardinality" -> "graft_size",
    "unnest" -> "explode",
    "countif" -> "count_if",
    "charindex" -> "position",
    "to_timestamp" -> "timestamp_seconds",
    "strftime" -> "graft_strftime",
    // json_query/json_value/json_extract_string rewrite with PATH
    // normalization in rewriteImpl (plain renames left unanchored
    // paths silently NULL — registry-sweep finding)
    "array_to_string" -> "array_join",
    "list_min" -> "array_min",
    "list_max" -> "array_max",
    // reference STRPOS(string, search) = str.indexOf(search)+1
    // (reference: src/expression/strings.js:172) — Spark has no strpos;
    // instr has the SAME argument order. (position is handled as a
    // 2-arg rewrite below: Spark's position(substr, str) is REVERSED.)
    "strpos" -> "instr",
    // reference ARRAY_CONCAT(a, b) (src/expression/evaluate.js:616)
    // is NULL for any non-array side — never string concatenation
    "array_concat" -> "graft_array_concat",
    "ord" -> "ascii",
    // epoch(x) → seconds since epoch as double (nothing downstream
    // treats epoch( specially, so the rename can ride the final pass)
    "epoch" -> "graft_epoch")

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
  private def numericTypeof(x: String): String =
    s"(__typeofkeep__($x) IN ('tinyint','smallint','int','bigint','float'," +
      s"'double','boolean') OR __typeofkeep__($x) LIKE 'decimal%')"

  // the null check nests INSIDE the raise branch: the reference
  // null-checks the VALUE before its type throw (strings.js val==null,
  // evaluate.js jsonArg==null — a numeric column of NULLs returns
  // NULLs, not an error), and keeping the outer CASE typeof-only
  // preserves its foldability — allowed types still fold to zero cost
  private def strictRaise(x: String, msg: String): String =
    s"(CASE WHEN ($x) IS NULL THEN NULL " +
      s"ELSE CAST(raise_error('$msg') AS STRING) END)"

  private def jsonStrictInput(fname: String, x: String): String =
    s"(CASE WHEN ${numericTypeof(x)} THEN ${strictRaise(x,
      s"${fname.toUpperCase(java.util.Locale.ROOT)}(expression, path): first argument must be JSON string or object")} " +
      s"ELSE graft_json_input($x) END)"

  private def octetStrict(x: String): String =
    s"(CASE WHEN __typeofkeep__($x) NOT IN ('string', 'void') THEN ${strictRaise(x,
      "OCTET_LENGTH(string): expected string. Use CAST to convert to a string first.")} " +
      s"ELSE $x END)"

  private val jsonScalarLit =
    raw"""[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?|true|false|null|"([^"\\]|\\.)*"""".r
  private def jsonEachScalarErr(arg: String): Option[String] = {
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
  private def hasTopLevelComma(s: String): Boolean =
    splitTopLevel(s).lengthIs > 1

  /** One-pass token-edit walker: tokenize once, collect disjoint span
    * replacements, splice. The shape every small keyword/operator
    * rewrite uses (string literals, comments and quoted identifiers are
    * classified by the lexer, never by per-pass guards).
    */
  private def tokenEdit(s: String)(
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
  private def callSite(v: SqlTok.View, up: String, fromChar: Int): (Int, Int) = {
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
  private def rewriteCall(sql: String, fname: String, f: Seq[String] => String): String = {
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
  private def rewriteAggFilter(sql: String, fname: String,
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
  private val hofNames = Set(
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
  private def isHofContext(v: SqlTok.View, tokIdx: Int): Boolean = {
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
  private def globToRegex(g: String): String = {
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

  /** `SELECT DISTINCT ON (k, ...) proj FROM ... [ORDER BY o] [LIMIT n]` →
    * row_number() over (PARTITION BY k ORDER BY o) + keep rank 1
    * (Postgres semantics: first row per key in ORDER BY order). Handles
    * the single top-level SELECT shape; ORDER BY columns must be
    * selectable from the base relation.
    */
  private def rewriteDistinctOn(sql: String): String = {
    val v = new SqlTok.View(sql)
    val t = v.toks
    val isHead = t.length > 4 && t(0).is("SELECT") && t(1).is("DISTINCT") &&
      t(2).is("ON") && t(3).kind == SqlTok.LPar && v.brk(3) >= 0
    if (!isHead) return sql
    val close = v.brk(3)
        val onCols = sql.substring(t(3).end, t(close).start).trim
        // FIRST top-level occurrence of each clause keyword after the ON
        // list — subqueries sit inside parens, handled by token depth
        def topTok(kws: Set[String]): Int = v.topIdx(close + 1, t.length)(
          x => x.kind == SqlTok.Word && kws(x.up))
        val fromTok = topTok(Set("FROM"))
        if (fromTok < 0) return sql
        val orderTok = {
          val i = topTok(Set("ORDER"))
          if (i >= 0 && i + 1 < t.length && t(i + 1).is("BY")) i else -1
        }
        // a top-level LIMIT/OFFSET applies AFTER dedup even when there is
        // no ORDER BY — it must leave the inner body either way
        val limitTok = topTok(Set("LIMIT", "OFFSET"))
        if ((orderTok >= 0 && orderTok <= fromTok) ||
            (limitTok >= 0 && limitTok <= fromTok)) return sql
        val cutChar = Seq(orderTok, limitTok).filter(_ >= 0)
          .map(i => t(i).start).minOption.getOrElse(sql.length)
        val windowOrder =
          if (orderTok < 0) onCols
          else if (orderTok + 2 >= t.length) ""
          else {
            val wEnd = if (limitTok >= 0) t(limitTok).start else sql.length
            sql.substring(t(orderTok + 2).start, wEnd).trim
          }
        val limitTail = if (limitTok >= 0) sql.substring(t(limitTok).start) else ""
        val proj = sql.substring(t(close).end, t(fromTok).start)
        val fromPart = sql.substring(t(fromTok).start, cutChar)
        // ORDER BY expressions may reference base-table columns absent from
        // the projection (the idiomatic Postgres shape: SELECT DISTINCT ON
        // (k) payload ... ORDER BY k, ts DESC) — project each ordering
        // expression into the inner query under a reserved alias, order the
        // outer query by the aliases, then EXCEPT them away. Select-list
        // ALIASES and ORDINALS in the ORDER BY are resolved to their
        // underlying projection expressions first (a window cannot
        // reference a lateral alias, and ordinals inside OVER() would be
        // constants).
        val projItems = splitTopLevel(proj)
        val aliasRe = raw"(?is)^(.+?)\s+AS\s+([A-Za-z_]\w*)\s*$$".r
        val aliasMap = projItems.collect { case aliasRe(e, a) => a.toLowerCase(java.util.Locale.ROOT) -> e.trim }.toMap
        def baseExpr(item: String): String = item match {
          case aliasRe(e, _) => e.trim
          case other => other.trim
        }
        def resolveOrd(e: String): String = {
          val t = e.trim
          if (t.forall(_.isDigit) && t.nonEmpty) {
            // toIntOption: an ordinal wider than Int (ORDER BY 9999999999999)
            // must fall through as a plain literal for the analyzer to
            // reject, not crash the rewriter with NumberFormatException
            t.toIntOption match {
              case Some(n) if n >= 1 && n <= projItems.length => baseExpr(projItems(n - 1))
              case _ => t
            }
          } else aliasMap.getOrElse(t.toLowerCase(java.util.Locale.ROOT), t)
        }
        val dirRe = raw"(?is)^(.*?)((?:\s+(?:ASC|DESC))?(?:\s+NULLS\s+(?:FIRST|LAST))?)\s*$$".r
        val ordItems = splitTopLevel(windowOrder).zipWithIndex.map { case (item, i) =>
          item match {
            case dirRe(e, dir) => (resolveOrd(e), dir.trim, s"__ord$i")
            case _ => (resolveOrd(item), "", s"__ord$i")
          }
        }
        val resolvedWindowOrder = ordItems.map { case (e, d, _) => s"$e $d".trim }.mkString(", ")
        val resolvedOn = splitTopLevel(onCols).map(resolveOrd).mkString(", ")
        val innerExtras = ordItems.map { case (e, _, a) => s"$e AS $a" }.mkString(", ")
        val outerOrder =
          if (orderTok < 0) ""
          else "ORDER BY " + ordItems.map { case (_, d, a) => s"$a $d".trim }.mkString(", ")
        val except = ("__rn" +: ordItems.map(_._3)).mkString(", ")
        s"SELECT * EXCEPT ($except) FROM (SELECT $proj, $innerExtras, " +
          s"row_number() OVER (PARTITION BY $resolvedOn ORDER BY $resolvedWindowOrder) AS __rn $fromPart) " +
          s"__distinct_on WHERE __rn = 1 $outerOrder $limitTail"
  }

  /** Comma-joined table functions — the reference's implicit CROSS JOIN
    * LATERAL (`FROM t, UNNEST(x) [AS] alias[(col,...)]`, reference:
    * src/parse/joins.js:113-124). Spark parses a bare comma TVF as
    * UNCORRELATED, so outer columns fail to resolve — the LATERAL
    * keyword restores correlation. Default output columns follow the
    * reference (src/parse/parse.js:543-546): the function name
    * lowercased, or (key, value) for JSON_EACH, whose rows come from
    * exploding the object as a map.
    */
  private def rewriteCommaTvf(sql: String): String = {
    // TVF spellings the reference accepts (src/parse/joins.js):
    //   FROM t, TVF(x) [AS] a[(cols)]                — implicit CROSS JOIN LATERAL
    //   FROM t [CROSS|INNER|LEFT] JOIN TVF(x) [AS] a[(cols)] [ON cond]
    //   FROM TVF(x) [AS] a[(cols)]                   — table-function scan
    // Default output columns follow the reference (parse.js:543-546):
    // the function name lowercased, or (key, value) for JSON_EACH. A
    // TVF alias with ONE output column also answers DOT/subscript
    // access to the element's fields (`tc.name` over exploded structs)
    // — the post-pass qualifies those through the column.
    val tvfNames = Set("UNNEST", "EXPLODE", "JSON_EACH")
    val kw = Set("WHERE", "GROUP", "ORDER", "LIMIT", "OFFSET", "JOIN",
      "INNER", "LEFT", "RIGHT", "FULL", "CROSS", "LATERAL", "UNION",
      "INTERSECT", "EXCEPT", "ON", "HAVING")
    val clauseEnd = Set("WHERE", "GROUP", "ORDER", "LIMIT", "HAVING",
      "UNION", "INTERSECT", "EXCEPT", "JOIN", "INNER", "LEFT", "RIGHT",
      "FULL", "CROSS")
    // TVF aliases that expose a single default column: dot/subscript
    // access through the alias must route through that column
    val singleCol = scala.collection.mutable.ListBuffer[(String, String)]()
    var s = sql
    var guard = 0
    var from = 0
    var continue = true
    while (continue && guard < 200) {
      guard += 1
      val v = new SqlTok.View(s)
      val t = v.toks
      // site: Comma | FROM | [CROSS|INNER|LEFT [OUTER]] JOIN, then TVF (
      var site = -1 // TVF name token
      var sep = "" // ",", "FROM", or the JOIN spelling (normalized)
      var sepTok = -1
      var i = 1
      while (site < 0 && i + 1 < t.length) {
        if (t(i).kind == SqlTok.Word && tvfNames(t(i).up) &&
            t(i).start >= from && t(i + 1).kind == SqlTok.LPar &&
            v.brk(i + 1) >= 0) {
          val p = t(i - 1)
          if (p.kind == SqlTok.Comma) { site = i; sep = ","; sepTok = i - 1 }
          else if (p.is("FROM")) { site = i; sep = "FROM"; sepTok = i - 1 }
          else if (p.is("JOIN")) {
            site = i; sep = "JOIN"; sepTok = i - 1
            if (i >= 2 && (t(i - 2).is("CROSS") || t(i - 2).is("INNER"))) {
              sep = t(i - 2).up + " JOIN"; sepTok = i - 2
            } else if (i >= 2 && t(i - 2).is("OUTER") && i >= 3 && t(i - 3).is("LEFT")) {
              sep = "LEFT OUTER JOIN"; sepTok = i - 3
            } else if (i >= 2 && t(i - 2).is("LEFT")) {
              sep = "LEFT JOIN"; sepTok = i - 2
            }
          }
        }
        if (site < 0) i += 1
      }
      if (site < 0) continue = false
      else {
        val close = v.brk(site + 1)
        val fname = t(site).up
        val args = s.substring(t(site + 1).end, t(close).start)
        def text(k: Int): String = s.substring(t(k).start, t(k).end)
        // [AS] alias [(col, ...)]
        var j = close + 1
        var alias = s"__tvf$guard"
        var cols = Seq.empty[String]
        val aliasIdx =
          if (j < t.length && t(j).is("AS") && j + 1 < t.length &&
              t(j + 1).kind == SqlTok.Word && !kw(t(j + 1).up)) j + 1
          else if (j < t.length && t(j).kind == SqlTok.Word && !kw(t(j).up)) j
          else -1
        if (aliasIdx >= 0) {
          alias = text(aliasIdx)
          j = aliasIdx + 1
          if (j < t.length && t(j).kind == SqlTok.LPar && v.brk(j) >= 0) {
            val ce = v.brk(j)
            val innerToks = (j + 1 until ce).map(t(_))
            val clean = innerToks.nonEmpty && innerToks.zipWithIndex.forall {
              case (x, n) => if (n % 2 == 0) x.kind == SqlTok.Word
                             else x.kind == SqlTok.Comma
            } && innerToks.length % 2 == 1
            if (clean) {
              cols = innerToks.collect { case x if x.kind == SqlTok.Word =>
                s.substring(x.start, x.end) }.toSeq
              j = ce + 1
            }
          }
        }
        // optional ON <cond> after a JOIN form — the condition runs to
        // the next same-level clause keyword, comma, or closing paren
        // (a trailing bare ON with nothing after it is no condition —
        // strictLint rejects it on host paths; direct rewrite callers
        // must not crash)
        var onCond: Option[String] = None
        if (j + 1 < t.length && t(j).is("ON")) {
          var m = j + 1
          var d = 0
          var endTok = t.length
          var scanning = true
          while (scanning && m < t.length) {
            t(m).kind match {
              case SqlTok.LPar => d += 1
              case SqlTok.RPar =>
                d -= 1; if (d < 0) { endTok = m; scanning = false }
              case SqlTok.Comma if d == 0 => endTok = m; scanning = false
              case SqlTok.Word if d == 0 && m > j + 1 && clauseEnd(t(m).up) =>
                endTok = m; scanning = false
              case _ => ()
            }
            if (scanning) m += 1
          }
          val condEnd = if (endTok < t.length) t(endTok).start else s.length
          onCond = Some(s.substring(t(j + 1).start, condEnd).trim)
            .filter(_.nonEmpty)
          j = endTok
        }
        val consumedEnd =
          if (j > close + 1) t(j - 1).end else t(close).end
        val defCols =
          if (fname == "JSON_EACH") Seq("key", "value")
          else Seq(fname.toLowerCase(java.util.Locale.ROOT))
        // a written alias list names the FIRST columns (the
        // reference's j(k) form); the rest keep their defaults
        val colList =
          if (cols.isEmpty) defCols
          else cols ++ defCols.drop(cols.length)
        if (cols.isEmpty && colList.size == 1) singleCol += alias -> colList.head
        // a LITERAL scalar argument ('42') is statically visible:
        // the reference throws at execution (json.js JSON_EACH
        // guard) — data columns stay lenient like the JSON family
        val scalarErr =
          if (fname == "JSON_EACH" && !hasTopLevelComma(args))
            jsonEachScalarErr(args)
          else None
        val inner =
          if (scalarErr.isDefined)
            "explode(map_from_entries(array(struct(CAST(raise_error(" +
              s"'${scalarErr.get}') AS STRING), 'x'))))"
          else if (fname == "JSON_EACH") {
            val x = s"graft_json_input($args)"
            s"explode(coalesce(from_json($x, 'map<string,string>'), " +
              s"map_from_entries(transform(from_json($x, 'array<string>'), " +
              s"(e, i) -> struct(cast(i AS string), e)))))"
          } else s"explode($args)"
        val aliased = s"$inner AS $alias(${colList.mkString(", ")})"
        val replacement = sep match {
          case "FROM" => s"FROM $aliased"
          case "," => s", LATERAL $aliased"
          case jn if onCond.forall(_.equalsIgnoreCase("TRUE")) && !jn.startsWith("LEFT") =>
            s", LATERAL $aliased" // inner join ON TRUE ≡ cross lateral
          case jn =>
            val prefix = if (jn.startsWith("LEFT")) "LEFT " else ""
            s"${prefix}JOIN LATERAL (SELECT * FROM $aliased) AS $alias ON ${onCond.getOrElse("TRUE")}"
        }
        val start = t(sepTok).start
        s = s.substring(0, start) + replacement + s.substring(consumedEnd)
        from = start + replacement.length
      }
    }
    // dot/subscript access through a single-column TVF alias: `tc.name`
    // over exploded structs means field access on the element column
    singleCol.foreach { case (alias, col) =>
      val aliasUp = alias.toUpperCase(java.util.Locale.ROOT)
      val colUp = col.toUpperCase(java.util.Locale.ROOT)
      s = tokenEdit(s) { v =>
        val t = v.toks
        t.indices.flatMap { k =>
          val isRef = t(k).kind == SqlTok.Word && t(k).up == aliasUp &&
            !(k > 0 && t(k - 1).isOp(".") && t(k - 1).end == t(k).start)
          if (!isRef) None
          else if (k + 2 < t.length && t(k + 1).isOp(".") &&
              t(k).end == t(k + 1).start && t(k + 1).end == t(k + 2).start &&
              t(k + 2).kind == SqlTok.Word && t(k + 2).up != colUp)
            Some((t(k).end, t(k).end, s".$col"))
          else if (k + 1 < t.length && t(k + 1).kind == SqlTok.LBrk &&
              t(k).end == t(k + 1).start)
            Some((t(k).end, t(k).end, s".$col"))
          else None
        }
      }
    }
    s
  }

  /** The [start, end) char span of the TOP-LEVEL select list (first
    * SELECT at paren-depth 0 up to its FROM), or None for
    * non-SELECT-headed text.
    */
  private def topSelectSpan(s: String): Option[(Int, Int)] = {
    val v = new SqlTok.View(s)
    val sel = v.topIdx(0, v.toks.length)(_.is("SELECT"))
    if (sel < 0) return None
    val from = v.topIdx(sel + 1, v.toks.length)(_.is("FROM"))
    if (from < 0) None else Some((v.toks(sel).end, v.toks(from).start))
  }

  /** Char position of the first of `kws` as a Word token at paren depth
    * 0 within chars `[from, to0)`. Returns -1 when none.
    */
  private def topKwPos(s: String, from: Int, to0: Int, kws: Seq[String]): Int = {
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

  /** The reference substitutes select aliases SEQUENTIALLY into every
    * later expression — later select items, GROUP BY, HAVING, ORDER BY
    * — even when the alias name shadows a real input column
    * (node-probed: `SELECT k + 1 AS k, k * 2 AS d` gives d = (k+1)·2;
    * `SELECT MOD(k,3) AS k, SUM(k) ... GROUP BY k` sums the ALIAS).
    * Spark's resolution differs on exactly the shadowing cases: select
    * items and GROUP BY prefer the input column, and a bare name inside
    * an ORDER-BY aggregate resolves against the aggregate OUTPUT
    * (circular for a self-shadow). This rewrite expands alias
    * references to the underlying expressions, index-aware: a reference
    * substitutes only aliases defined EARLIER in the select list
    * (forward references error in the reference and must keep
    * erroring), and inside alias `a`'s own expression the name `a` is
    * the base column — the ordering makes the expansion terminate.
    */
  private def rewriteAliasExpansion(sqlIn: String): String = {
    val span = topSelectSpan(sqlIn).getOrElse(return sqlIn)
    val rawItems = splitTopLevel(sqlIn.substring(span._1, span._2))
    val aliasRe = raw"(?is)^(.*\S)\s+AS\s+([A-Za-z_]\w*)\s*$$".r
    // IMPLICIT aliases (the AS dropped) resolve identically in the
    // reference — `(expr) name` / `col name` are the two textually
    // unambiguous shapes (a bare identifier straight after a complete
    // primary can only be an alias; same reading as the concat rewrite's
    // postParen rule). Seed-132777 mutation find: `(k - MOD(k, 5)) k
    // GROUP BY k` groups by the ALIAS in the reference, the shadowed
    // column in Spark — wrong row count without the expansion.
    val implicitParenRe = raw"(?is)^(.*\))\s+([A-Za-z_]\w*)\s*$$".r
    // `CASE … END ident` is an implicit alias too (probed live: dup
    // names resolve to one column, and the alias substitutes laterally)
    // — without this capture, expand() would read the trailing ident as
    // a REFERENCE and splice an expression into alias position
    // (seed-r14 mutation find: `… END c1` after an `AS c1` item)
    val implicitEndRe = raw"(?is)^(.*\bEND)\s+([A-Za-z_]\w*)\s*$$".r
    val implicitColRe = raw"(?is)^([A-Za-z_][\w.]*)\s+([A-Za-z_]\w*)\s*$$".r
    // `DISTINCT x` / `ALL x` are quantified items and `NOT x` is a unary
    // predicate — the only ident-ident select shapes that are NOT an
    // implicit alias
    val notAliasHead = Set("distinct", "all", "not")
    // a keyword straight after `)` is part of the EXPRESSION, never an
    // implicit alias: `CASE WHEN a THEN (b) END` must not register a
    // phantom alias `end` (which would drop the END keyword from the
    // captured expression and suppress a real alias of that name via
    // the dup rule) — same exclusion set as the concat pass's
    // postParenKeywords, the one named home for post-paren keywords
    val notAliasTail = postParenKeywords.map(_.toLowerCase(java.util.Locale.ROOT))
    val aliasSeq: Seq[(String, (String, Int))] = rawItems.zipWithIndex.flatMap {
      case (it, i) => it match {
        case aliasRe(e, a) => Some(a.toLowerCase(java.util.Locale.ROOT) -> (e.trim, i))
        case implicitParenRe(e, a) if !notAliasTail(a.toLowerCase(java.util.Locale.ROOT)) =>
          Some(a.toLowerCase(java.util.Locale.ROOT) -> (e.trim, i))
        case implicitEndRe(e, a) if !notAliasTail(a.toLowerCase(java.util.Locale.ROOT)) =>
          Some(a.toLowerCase(java.util.Locale.ROOT) -> (e.trim, i))
        case implicitColRe(e, a) if !notAliasHead(e.toLowerCase(java.util.Locale.ROOT)) &&
            !notAliasHead(a.toLowerCase(java.util.Locale.ROOT)) =>
          Some(a.toLowerCase(java.util.Locale.ROOT) -> (e.trim, i))
        case _ => None
      }
    }
    // a duplicated alias is ambiguous — leave those names untouched
    // (Spark rejects references to them; the mutation battery counts
    // that rejection as deliberate strictness)
    val dup = aliasSeq.groupBy(_._1).collect { case (n, vs) if vs.size > 1 => n }.toSet
    val aliases: Map[String, (String, Int)] = aliasSeq.filterNot(p => dup(p._1)).toMap
    if (aliases.isEmpty) return sqlIn
    // When the FROM clause is one bare table (optionally aliased), its
    // qualifier lets a BLOCKED self-reference inside an ORDER-BY
    // aggregate bind to the INPUT column: Spark resolves a bare `price`
    // there against the aggregate OUTPUT first (circular reference,
    // analysis error) — `t.price` can only be the input. Joins/derived
    // tables get no qualifier (ambiguous anyway).
    val fromQual: Option[String] = {
      val fromEnd = topKwPos(sqlIn, span._2, sqlIn.length,
        Seq("WHERE", "GROUP", "HAVING", "ORDER", "LIMIT", "OFFSET",
          "WINDOW", "QUALIFY", "UNION", "INTERSECT", "EXCEPT")) match {
        case -1 => sqlIn.length
        case p => p
      }
      raw"(?is)\A([A-Za-z_]\w*)(?:\s+(?:AS\s+)?([A-Za-z_]\w*))?\z".r
        .findFirstMatchIn(sqlIn.substring(span._2, fromEnd).trim)
        .map(m => Option(m.group(2)).getOrElse(m.group(1)))
    }
    // Substitute alias names defined at an index < `allowed`; an alias
    // ref blocked by ordering (self/forward) stays the base column —
    // qualified when `qualifyBlocked` (ORDER-BY-aggregate context). A
    // name followed by `(` is a function call, a name next to `.` is
    // part of a qualified column — neither is an alias ref. Recursion
    // terminates because `allowed` strictly decreases.
    // a nondeterministic alias must not be re-evaluated by textual
    // duplication (two RAND() calls are two values; the reference
    // evaluates the cell once) — leave such references to Spark's
    // native lateral-alias resolution
    val nondet = raw"(?i)\b(RAND|RANDOM|NOW|UUID|CURRENT_DATE|CURRENT_TIME|CURRENT_TIMESTAMP)\b".r
    def expand(e: String, allowed: Int, qualifyBlocked: Boolean): String = {
      val v = new SqlTok.View(e)
      val t = v.toks
      val edits = Seq.newBuilder[(Int, Int, String)]
      var k = 0
      while (k < t.length) {
        val isRef = t(k).kind == SqlTok.Word &&
          !(k > 0 && t(k - 1).isOp(".")) &&
          !(k + 1 < t.length && (t(k + 1).isOp(".") || t(k + 1).kind == SqlTok.LPar))
        if (isRef) aliases.get(t(k).up.toLowerCase(java.util.Locale.ROOT)) match {
          case Some((ex, idx)) if idx < allowed && nondet.findFirstIn(ex).isEmpty =>
            edits += ((t(k).start, t(k).end, s"(${expand(ex, idx, qualifyBlocked)})"))
          case Some((_, idx)) if idx >= allowed && qualifyBlocked && fromQual.isDefined =>
            edits += ((t(k).start, t(k).end,
              s"${fromQual.get}.${e.substring(t(k).start, t(k).end)}"))
          case _ => ()
        }
        k += 1
      }
      SqlTok.applyEdits(e, edits.result())
    }
    var s = sqlIn
    // 1) SELECT items: lateral / shadowing references to EARLIER
    //    aliases. Items containing a subquery are left alone — the
    //    regex cannot tell inner scopes apart.
    val newItems = rawItems.zipWithIndex.map { case (it, i) =>
      if (raw"(?i)\(\s*SELECT\b".r.findFirstIn(it).isDefined) it
      else it match {
        case aliasRe(e, a) =>
          val ne = expand(e, i, qualifyBlocked = false)
          if (ne == e) it else s"$ne AS $a"
        case _ =>
          val ne = expand(it, i, qualifyBlocked = false)
          if (ne == it) it else ne
      }
    }
    if (newItems != rawItems)
      s = s.substring(0, span._1) + " " + newItems.map(_.trim).mkString(", ") +
        " " + s.substring(span._2)
    // re-locate the select span after the item rewrite shifted offsets
    val span2 = topSelectSpan(s).getOrElse(return s)
    // the TOP query block only — a nested subquery's (or a later UNION
    // arm's) GROUP BY / HAVING has its own select list, which these
    // aliases must not leak into
    val regionEnd = topKwPos(s, span2._2, s.length,
      Seq("UNION", "INTERSECT", "EXCEPT")) match {
      case -1 => s.length
      case p => p
    }
    val nItems = rawItems.length
    // 2) GROUP BY: a bare-identifier term that names an alias always
    //    expands (for a non-shadowing name the expansion is a semantic
    //    no-op; for a shadowing one it is the divergence)
    val gPos = topKwPos(s, span2._2, regionEnd, Seq("GROUP"))
    if (gPos >= 0) {
      raw"(?is)\AGROUP\s+BY\s+".r.findPrefixMatchOf(
        s.substring(gPos, regionEnd)).foreach { bm =>
        val termsStart = gPos + bm.end
        val termsEnd = topKwPos(s, termsStart, regionEnd,
          Seq("HAVING", "ORDER", "LIMIT", "OFFSET", "WINDOW", "QUALIFY")) match {
          case -1 => regionEnd
          case p => p
        }
        val terms = splitTopLevel(s.substring(termsStart, termsEnd)).map(_.trim)
        val newTerms = terms.map { t =>
          aliases.get(t.toLowerCase(java.util.Locale.ROOT)) match {
            // a nondeterministic alias stays a bare name: textual
            // duplication would re-evaluate it, and Spark's native
            // groupByAliases resolution keeps the single evaluation
            case Some((ex, idx)) if nondet.findFirstIn(ex).isEmpty =>
              s"(${expand(ex, idx, qualifyBlocked = false)})"
            case _ => t
          }
        }
        if (newTerms != terms)
          s = s.substring(0, termsStart) + newTerms.mkString(", ") + " " +
            s.substring(termsEnd)
      }
    }
    // 3) HAVING: the reference substitutes aliases here too (node-probed:
    //    `... price - discount AS price GROUP BY price HAVING price > 10`
    //    filters on the expanded value). Region bounds recomputed — the
    //    GROUP BY edit above may have shifted every later offset.
    val regionEnd2 = topKwPos(s, span2._2, s.length,
      Seq("UNION", "INTERSECT", "EXCEPT")) match {
      case -1 => s.length
      case p => p
    }
    val hPos = topKwPos(s, span2._2, regionEnd2, Seq("HAVING"))
    if (hPos >= 0) {
      val hStart = hPos + "HAVING".length
      val hEnd = topKwPos(s, hStart, regionEnd2,
        Seq("ORDER", "LIMIT", "OFFSET", "WINDOW", "QUALIFY")) match {
        case -1 => regionEnd2
        case p => p
      }
      val body = s.substring(hStart, hEnd)
      val nb = expand(body, nItems, qualifyBlocked = false)
      if (nb != body) s = s.substring(0, hStart) + nb + s.substring(hEnd)
    }
    // 4) ORDER BY: only aliases INSIDE aggregate calls need expanding —
    //    for a bare (even nested) alias ref Spark's output-first sort
    //    resolution already matches the reference's substitution, but
    //    inside an aggregate the output ref is circular for a shadow
    locally {
      val aggNames = Set("SUM", "MIN", "MAX", "AVG", "COUNT")
      val v = new SqlTok.View(s)
      val t = v.toks
      // only TOP-LEVEL (depth 0) ORDER BY clauses — a window-spec or
      // subquery ORDER BY must not anchor the scan — and each scan
      // stops at the clause end (the next depth-0 LIMIT/OFFSET or
      // set-op keyword), never at-large to end-of-statement
      val clauseStop = Set("LIMIT", "OFFSET", "UNION", "INTERSECT", "EXCEPT")
      val edits = Seq.newBuilder[(Int, Int, String)]
      for (ob <- t.indices
           if v.depth(ob) == 0 && t(ob).is("ORDER") &&
             ob + 1 < t.length && t(ob + 1).is("BY")) {
        var k = ob + 2
        var inClause = true
        while (inClause && k < t.length) {
          if (v.depth(k) == 0 && t(k).kind == SqlTok.Word &&
              clauseStop(t(k).up)) inClause = false
          else {
            if (k + 3 < t.length &&
                t(k).kind == SqlTok.Word && aggNames(t(k).up) &&
                t(k + 1).kind == SqlTok.LPar && t(k + 2).kind == SqlTok.Word &&
                t(k + 3).kind == SqlTok.RPar) {
              aliases.get(t(k + 2).up.toLowerCase(java.util.Locale.ROOT)).foreach {
                case (ex, idx) =>
                  edits += ((t(k + 2).start, t(k + 2).end,
                    s"(${expand(ex, idx, qualifyBlocked = true)})"))
              }
            }
            k += 1
          }
        }
      }
      s = SqlTok.applyEdits(s, edits.result())
    }
    s
  }

  /** Reference null ordering: nulls sort FIRST regardless of direction
    * unless NULLS LAST is explicit (execute/utils.js:19-23 — the null
    * branch returns BEFORE the DESC flip). Spark's bare-DESC default is
    * NULLS LAST, so every bare DESC INSIDE AN ORDER BY TAIL gets the
    * explicit modifier. Token-driven with per-paren-depth ORDER-BY
    * state, so `OVER (ORDER BY x DESC)` window specs convert while a
    * DESC used as an identifier anywhere else passes through.
    */
  private def rewriteBareDesc(sqlIn: String): String = {
    val toks = SqlTok.tokenize(sqlIn)
    val clauseEnd = Set("LIMIT", "OFFSET", "HAVING", "WINDOW", "QUALIFY",
      "UNION", "INTERSECT", "EXCEPT", "FROM", "WHERE", "GROUP", "SELECT",
      "ROWS", "RANGE")
    val edits = scala.collection.mutable.ListBuffer.empty[(Int, String)]
    var stack: List[Boolean] = List(false) // inOrderBy per paren depth
    var k = 0
    while (k < toks.length) {
      val t = toks(k)
      t.kind match {
        case SqlTok.LPar => stack ::= false
        case SqlTok.RPar => if (stack.tail.nonEmpty) stack = stack.tail
        case SqlTok.Word if t.up == "ORDER" &&
            k + 1 < toks.length && toks(k + 1).is("BY") =>
          stack = true :: stack.tail
        case SqlTok.Word if clauseEnd(t.up) =>
          stack = false :: stack.tail
        case SqlTok.Word if t.up == "DESC" && stack.head &&
            !(k + 1 < toks.length && toks(k + 1).is("NULLS")) =>
          edits += ((t.end, " NULLS FIRST"))
        case _ => ()
      }
      k += 1
    }
    SqlTok.applyInserts(sqlIn, edits.toList)
  }

  /** Rewrite one squirreling-dialect statement into Spark SQL. */
  def rewrite(sqlText: String): String = rewriteImpl(sqlText, notInExists = true)

  /** The rewrite is a pure function of its text, and the host-facing
    * entry points run it twice back-to-back (strictLint's parse for the
    * duplicate-CTE check, then rewriteChecked) — a small LRU makes the
    * second pass free without changing any semantics.
    */
  private val rewriteMemo = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(String, Boolean), String](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Boolean), String]): Boolean = size > 64
    })

  /** `lhs NOT IN (SELECT ...)` carries the reference's TWO-VALUED null
    * semantics (execute/join.js:283,310 — null keys are skipped on both
    * build and probe, so a null in the subquery cannot empty the result
    * and a null lhs is KEPT). Spark's NOT IN is standard SQL: one null
    * poisons everything, planned as a null-aware anti join. Rewriting to
    * NOT EXISTS with null-rejecting equality reproduces the reference's
    * rows AND plans as a plain (broadcastable) anti join instead of the
    * NAAJ — faithful and faster. Only simple lhs shapes (qualified
    * column / single call, not the tail of a larger expression) rewrite;
    * a correlated subquery fails analysis inside the derived table, so
    * execution-path callers retry without this rewrite (SQL semantics).
    */
  /** Mid-chain ORDER BY / LIMIT / OFFSET tails on set-operation ARMS.
    * The reference parses each SELECT's own tail, then LIFTS the tail
    * of every RIGHT operand onto the compound node it just built —
    * cascading up right spines (reference: src/parse/parse.js:110-181,
    * parseSetOperations/parseIntersectOperations; probed live this
    * round). So `A UNION B ORDER BY k LIMIT 2 UNION C` sorts and
    * slices (A UNION B), `A UNION B ORDER BY k LIMIT 2 INTERSECT C`
    * slices only B (B is the LEFT of the tighter INTERSECT), and a
    * tail on the final arm binds the whole statement — while Spark
    * rejects every mid-chain tail at parse. Rebuild the chain with the
    * parser's exact grouping: fold INTERSECT runs first, lift each
    * right operand's tail onto the growing compound, and wrap any LEFT
    * operand that still carries a tail into a subquery that applies it.
    * Parenthesized arms are parse errors in the reference ("Expected
    * SELECT but found ("), so only unparenthesized top-level chains
    * arrive here; a set-op inside a derived table keeps Spark
    * semantics. INTERSECT precedence is identical in both engines, so
    * the rebuilt text needs no grouping parens of its own.
    */
  private def rewriteSetOpArmTails(sqlIn: String): String = {
    val v = new SqlTok.View(sqlIn)
    val t = v.toks
    // top-level set-op keywords; `* EXCEPT (cols)` has an adjacent LPar
    val opIdx = t.indices.filter { i =>
      v.depth(i) == 0 && t(i).kind == SqlTok.Word &&
        (t(i).is("UNION") || t(i).is("INTERSECT") || t(i).is("EXCEPT")) &&
        !(i + 1 < t.length && t(i + 1).kind == SqlTok.LPar)
    }
    if (opIdx.isEmpty) return sqlIn
    val tailKw = Set("ORDER", "LIMIT", "OFFSET")
    // arm token ranges and the joining op text (ALL/DISTINCT absorbed)
    case class Arm(fromTok: Int, toTok: Int) {
      val sel: Option[Int] =
        (fromTok until toTok).find(i => v.depth(i) == 0 && t(i).is("SELECT"))
      val tailTok: Option[Int] = sel.flatMap(s0 => (s0 until toTok).find(i =>
        v.depth(i) == 0 && t(i).kind == SqlTok.Word && tailKw(t(i).up)))
    }
    val arms = Seq.newBuilder[Arm]
    val ops = Seq.newBuilder[String]
    var armStart = 0
    for (i <- opIdx) {
      arms += Arm(armStart, i)
      val mod = if (i + 1 < t.length && (t(i + 1).is("ALL") || t(i + 1).is("DISTINCT"))) 1 else 0
      ops += (t(i).up + (if (mod == 1) " " + t(i + 1).up else ""))
      armStart = i + 1 + mod
    }
    arms += Arm(armStart, t.length)
    val armSeq = arms.result()
    val opSeq = ops.result()
    // every arm must have a SELECT, and some arm BEFORE the last must
    // carry a tail — otherwise Spark already parses the text as-is
    if (armSeq.exists(_.sel.isEmpty) || !armSeq.init.exists(_.tailTok.isDefined))
      return sqlIn
    def charEnd(a: Arm): Int = if (a.toTok < t.length) t(a.toTok).start else sqlIn.length
    // core = the arm body without its tail; tail kept separately
    final case class Node(core: String, tail: Option[String])
    def armNode(a: Arm): Node = {
      val bodyStart = t(a.sel.get).start
      a.tailTok match {
        case Some(tt) => Node(sqlIn.substring(bodyStart, t(tt).start).trim,
          Some(sqlIn.substring(t(tt).start, charEnd(a)).trim))
        case None => Node(sqlIn.substring(bodyStart, charEnd(a)).trim, None)
      }
    }
    var wrapN = 0
    // a LEFT operand carrying a tail applies it to ITSELF — as a
    // subquery (the reference executes the arm's own orderBy/limit
    // before the set op)
    def leftText(n: Node): String = n.tail match {
      case Some(tl) =>
        wrapN += 1
        s"SELECT * FROM (${n.core} $tl) __setarm$wrapN"
      case None => n.core
    }
    // a RIGHT operand's tail lifts onto the compound (cascading — the
    // new node carries it until IT becomes a left operand or the end)
    def combine(l: Node, op: String, r: Node): Node =
      Node(s"${leftText(l)} $op ${r.core}", r.tail)
    var unionLeft: Option[Node] = None
    var pendingOp = ""
    var cur = armNode(armSeq.head)
    for (k <- opSeq.indices) {
      val rhs = armNode(armSeq(k + 1))
      if (opSeq(k).startsWith("INTERSECT")) cur = combine(cur, opSeq(k), rhs)
      else {
        unionLeft = Some(unionLeft.fold(cur)(ul => combine(ul, pendingOp, cur)))
        pendingOp = opSeq(k)
        cur = rhs
      }
    }
    val top = unionLeft.fold(cur)(ul => combine(ul, pendingOp, cur))
    // the final (fully lifted) tail binds the whole statement — Spark's
    // native trailing-clause semantics
    val prefix = sqlIn.substring(0, t(armSeq.head.sel.get).start)
    prefix + top.core + top.tail.map(" " + _).getOrElse("")
  }

  private def rewriteNotInSubquery(sqlIn: String): String = {
    var s = sqlIn
    var from = 0
    var n = 0
    var guard = 0
    while (guard < 100) {
      guard += 1
      val v = new SqlTok.View(s)
      val t = v.toks
      var k = -1
      var i = 0
      while (k < 0 && i + 3 < t.length) {
        if (t(i).is("NOT") && t(i).start >= from && t(i + 1).is("IN") &&
            t(i + 2).kind == SqlTok.LPar && v.brk(i + 2) >= 0 &&
            t(i + 3).is("SELECT")) k = i
        else i += 1
      }
      if (k < 0) return s
      val close = v.brk(k + 2)
      val (pIdx, pStart, pEnd) = v.primaryBefore(k)
      // the lhs must be a simple column/call primary, and not the TAIL
      // of a larger expression (`x + y NOT IN (...)` would splice
      // mid-expression) — skip when an operator precedes it
      val headOk = pEnd > pStart && t(pIdx).kind == SqlTok.Word
      val exprTail = pIdx > 0 && t(pIdx - 1).kind == SqlTok.Op &&
        t(pIdx - 1).up.lastOption.exists(c => "+-*/%|&^~".contains(c))
      if (!headOk || exprTail) from = t(k + 2).end
      else {
        val lhs = s.substring(pStart, pEnd)
        val inner = s.substring(t(k + 2).end, t(close).start).trim
        // <=> not =: the reference's IN walks sqlEquals (JS ==,
        // null == null TRUE — execute/utils.js:136-139), so a NULL
        // probe DOES match a null-bearing list and NOT IN drops the
        // row; plain = would read the pair as UNKNOWN and keep it
        val repl = s"NOT EXISTS (SELECT 1 FROM ($inner) " +
          s"AS __nin$n(__nin_c) WHERE __nin_c <=> $lhs)"
        s = s.substring(0, pStart) + repl + s.substring(t(close).end)
        from = pStart + repl.length
        n += 1
      }
    }
    s
  }

  /** Zero divisors never error in the reference (JS: 5/0 = Infinity,
    * 5%0 = NaN — both serialize as null); Spark 4's ANSI mode throws
    * DIVIDE_BY_ZERO / REMAINDER_BY_ZERO even for doubles. Guard every
    * division/modulo DENOMINATOR with nullif(d, 0): a zero divisor
    * yields null — the closest Spark value to the reference's
    * non-finite results, and what its own JSON surface shows. Forward
    * scan: after `/` or `%`, consume one signed primary (number,
    * dotted identifier with optional call/index suffixes, or
    * parenthesized expression) and wrap it. String literals and block
    * comments (slash-star) are untouched.
    */
  private def rewriteZeroDivisors(sqlIn: String): String = {
    val v = new SqlTok.View(sqlIn)
    val t = v.toks
    val edits = Seq.newBuilder[(Int, String)]
    var k = 0
    while (k + 1 < t.length) {
      if (t(k).kind == SqlTok.Op && (t(k).up == "/" || t(k).up == "%")) {
        // denominator: optional sign, then one non-string primary (a
        // CASE head is an expression keyword, not a wrappable primary)
        var p = k + 1
        if (t(p).isOp("-") || t(p).isOp("+")) p += 1
        if (p < t.length && t(p).kind != SqlTok.Str && !t(p).is("CASE")) {
          val end = v.forwardFrom(p)
          if (end > 0) {
            edits += ((t(k + 1).start, "nullif("))
            edits += ((end, ", 0)"))
          }
        }
      }
      k += 1
    }
    SqlTok.applyInserts(sqlIn, edits.result())
  }

  /** Wrap the operands of `||` and ILIKE in graft_js_str — the
    * reference coerces both with JS String(v) (binary.js:27-30
    * `String(a) + String(b)` for `||`, :57-58 for LIKE), so
    * `'x' || 2.0` is `'x2'` and `2.0 LIKE '2'` is TRUE, where Spark's
    * implicit cast renders `'2.0'`. Both grammars give `||` the same
    * precedence (looser than +‑/·/%, tighter than comparisons —
    * reference parse/expression.js:218 parseConcat over parseAdditive),
    * so operands are the maximal "additive segments" adjacent to the
    * operator. Single forward pass: track the current segment per paren
    * depth, treat comparison operators / commas / clause keywords as
    * segment boundaries, keep CASE..END opaque via a saved-segment
    * stack (so `CASE..END || x` wraps the whole CASE), and carry
    * right-operand wraps as "pending" inserts that close at the next
    * boundary. Inserts are collected as (position, text) edits over the
    * ORIGINAL text and applied at the end — no rescans of our own
    * output. The wrap is a no-op on strings, so over-wrapping (an
    * operand that is already a concat result) is harmless.
    */
  private def rewriteJsConcatOps(sqlIn: String): String = {
    val n = sqlIn.length
    val toks = SqlTok.tokenize(sqlIn)
    val brk = SqlTok.bracketMatch(toks)
    val edits = scala.collection.mutable.ListBuffer.empty[(Int, String)]
    // OVER is deliberately NOT a boundary: `row_number() OVER (ORDER BY
    // x) || 'r'` must wrap the WHOLE window expression (Spark allows a
    // window expr nested inside a scalar call, and the reference
    // stringifies the window RESULT). The spec's own keywords
    // (PARTITION/ORDER/ROWS/...) live inside the OVER parens, i.e. in a
    // pushed frame, so they still reset only inner segments.
    val boundary = Set(
      "SELECT", "FROM", "WHERE", "GROUP", "HAVING", "ORDER", "LIMIT", "OFFSET",
      "JOIN", "ON", "USING", "AND", "OR", "IN", "IS", "BETWEEN", "AS", "WHEN",
      "THEN", "ELSE", "DISTINCT", "ALL", "BY", "ASC", "DESC", "NULLS", "FIRST",
      "LAST", "UNION", "EXCEPT", "INTERSECT", "WITH", "VALUES",
      "PARTITION", "ROWS", "RANGE", "PRECEDING", "FOLLOWING", "UNBOUNDED",
      "CURRENT", "ROW", "CROSS", "INNER", "OUTER", "FULL", "SEMI", "ANTI",
      "LATERAL", "NATURAL", "EXISTS", "ANY", "SOME", "FILTER", "ESCAPE",
      "RLIKE", "REGEXP", "GLOB", "QUALIFY", "WINDOW", "NOT")
    final class Frame {
      var segStart: Int = -1 // start of the current additive segment
      var lastNonWs: Int = -1 // last non-whitespace char inside it
      var caseNest: Int = 0
      var caseSaves: List[Int] = Nil // segStart saved at each CASE entry
      var pendings: List[(Int, Int)] = Nil // (openPos, caseNest at open)
      var awaitingOpen: Boolean = false // a trigger wants the next segment
    }
    var stack: List[Frame] = List(new Frame)
    def fr: Frame = stack.head

    def startToken(pos: Int): Unit = {
      if (fr.segStart < 0) fr.segStart = pos
      if (fr.awaitingOpen) { fr.pendings ::= (pos, fr.caseNest); fr.awaitingOpen = false }
    }
    def closePendings(minNest: Int): Unit = {
      val (close, keep) = fr.pendings.partition(_._2 >= minNest)
      close.foreach { case (open, _) =>
        if (fr.lastNonWs >= open) {
          edits += ((open, "graft_js_str(")); edits += ((fr.lastNonWs + 1, ")"))
        }
      }
      fr.pendings = keep
      fr.awaitingOpen = false
    }
    def boundaryReset(): Unit = {
      closePendings(fr.caseNest)
      fr.segStart = -1; fr.lastNonWs = -1
    }
    def trigger(): Unit = {
      closePendings(fr.caseNest)
      if (fr.segStart >= 0 && fr.lastNonWs >= fr.segStart) {
        edits += ((fr.segStart, "graft_js_str(")); edits += ((fr.lastNonWs + 1, ")"))
      }
      fr.segStart = -1; fr.lastNonWs = -1
      fr.awaitingOpen = true
    }

    var k = 0
    while (k < toks.length) {
      val t = toks(k)
      t.kind match {
        case SqlTok.Str | SqlTok.DQuot | SqlTok.Num =>
          startToken(t.start); fr.lastNonWs = t.end - 1
        case SqlTok.LPar =>
          startToken(t.start)
          stack ::= new Frame
        case SqlTok.RPar =>
          closePendings(0)
          if (stack.tail.nonEmpty) stack = stack.tail
          fr.lastNonWs = t.start
        case SqlTok.Comma | SqlTok.Semi =>
          boundaryReset()
        case SqlTok.LBrk =>
          // a bracket group (subscript or array literal) rides along as
          // one opaque blob of the current segment
          startToken(t.start)
          val close = brk(k)
          if (close >= 0) { fr.lastNonWs = toks(close).start; k = close }
          else { fr.lastNonWs = n - 1; k = toks.length }
        case SqlTok.RBrk => // unbalanced stray — plain segment material
          startToken(t.start); fr.lastNonWs = t.start
        case SqlTok.Op if t.up == "||" =>
          trigger()
        case SqlTok.Op if t.up.exists(c => c == '=' || c == '<' || c == '>' || c == '!') =>
          // comparison operators bind looser than || in both grammars
          boundaryReset()
        case SqlTok.Op =>
          // + - * / % . :: etc: additive material stays in-segment
          startToken(t.start); fr.lastNonWs = t.end - 1
        case SqlTok.Word =>
          val afterParen = k > 0 && toks(k - 1).kind == SqlTok.RPar
          t.up match {
            case "OVER" =>
              // `rank() OVER (...)` — OVER keeps the window expression
              // in ONE segment (its postParenKeywords membership keeps
              // the alias branch below from claiming it)
              startToken(t.start); fr.lastNonWs = t.end - 1
            case w if afterParen && !boundary(w) && !postParenKeywords(w) =>
              // a bare non-boundary identifier straight after a ')' can
              // only be an IMPLICIT alias (`trim(s) q2`, `... OVER (...)
              // c0` — the AS dropped): close the operand wrap at the
              // paren, then the alias starts a fresh segment (seed-88014
              // mutation find; generalized from window specs to all
              // parens after the advisor's expectOverParen-leak report).
              boundaryReset()
              startToken(t.start); fr.lastNonWs = t.end - 1
            case "ILIKE" => trigger()
            case "CASE" =>
              startToken(t.start)
              fr.caseSaves ::= fr.segStart
              fr.caseNest += 1
            case "END" =>
              closePendings(fr.caseNest)
              fr.caseNest = math.max(0, fr.caseNest - 1)
              fr.caseSaves match {
                case h :: rest => fr.segStart = h; fr.caseSaves = rest
                case Nil => if (fr.segStart < 0) fr.segStart = t.start
              }
              fr.lastNonWs = t.end - 1
            case "NOT" =>
              // NOT directly before ILIKE belongs to the predicate — keep
              // the segment (and its end) so the operand wrap excludes NOT
              if (!(k + 1 < toks.length && toks(k + 1).is("ILIKE"))) boundaryReset()
            case w if boundary(w) => boundaryReset()
            case _ =>
              startToken(t.start); fr.lastNonWs = t.end - 1
          }
      }
      k += 1
    }
    while (stack.nonEmpty) { closePendings(0); stack = stack.tail }
    SqlTok.applyInserts(sqlIn, edits.toList)
  }

  /** The rewrite the execution-path entry points use: the NOT-IN
    * variant when it analyzes, the plain SQL-semantics text when the
    * subquery turns out to be correlated (outer references cannot live
    * inside the derived table the rewrite introduces).
    */
  /** `[1, 2, 3]` bracket ARRAY literals (reference parse.js array
    * expressions; execute.unnest/arrays tests) → Spark `array(1, 2, 3)`.
    * A `[` directly after an identifier, `)`, `]`, or a quote is a
    * SUBSCRIPT and passes through; anywhere else it opens a literal.
    * Nesting tracks through a stack so `[[1,2],[3]]` converts fully.
    */
  private def rewriteArrayLiterals(sqlIn: String): String = {
    if (!sqlIn.contains("[")) return sqlIn
    val v = new SqlTok.View(sqlIn)
    val toks = v.toks
    // decide each MATCHED bracket pair once off the token stream: a `[`
    // touching its base token (ident/number/close-paren/close-bracket/
    // quote) subscripts; any other `[` opens a literal -> array( ... ).
    // Nested literals convert fully (each pair decides independently);
    // unbalanced brackets pass through and fail at Spark's parser.
    val edits = scala.collection.mutable.ListBuffer.empty[(Int, Int, String)]
    var k = 0
    while (k < toks.length) {
      val t = toks(k)
      if (t.kind == SqlTok.LBrk && v.brk(k) >= 0) {
        val prev = if (k > 0) toks(k - 1) else null
        // whitespace allowed before a subscript `[` (`a [1]` == `a[1]`,
        // token-based like the reference; probed) — but an operator /
        // clause KEYWORD before `[` still opens a literal (`IN [1,2]`),
        // and a string-literal base keeps the old adjacency rule
        val subscript = prev != null &&
          (((prev.kind == SqlTok.Word && !SqlTok.neverCallable(prev.up)) ||
              prev.kind == SqlTok.Num ||
              prev.kind == SqlTok.RPar || prev.kind == SqlTok.RBrk ||
              prev.kind == SqlTok.DQuot) ||
            (prev.kind == SqlTok.Str && prev.end == t.start))
        if (!subscript) {
          edits += ((t.start, t.end, "array("))
          val close = toks(v.brk(k))
          edits += ((close.start, close.end, ")"))
        }
      }
      k += 1
    }
    if (edits.isEmpty) sqlIn
    else {
      val sb = new StringBuilder(sqlIn.length + edits.size * 5)
      var prev = 0
      for ((s0, e0, txt) <- edits.sortBy(_._1)) {
        sb.append(sqlIn.substring(prev, s0)).append(txt); prev = e0
      }
      sb.append(sqlIn.substring(prev))
      sb.toString
    }
  }

  /** EVERY `expr ± INTERVAL v <unit>` runs through graft_js_interval —
    * the exact toDate → applyIntervalToDate → format chain (reference:
    * src/expression/date.js:13-41,133-143), whose semantics diverge
    * from Spark's interval arithmetic in four ways:
    *  - MONTH/YEAR: JS ROLLS month-end over (Mar 31 + 1 MONTH = May 1;
    *    Spark's add_months clamps to Apr 30);
    *  - fractional v: ToIntegerOrInfinity truncates the SUMMED
    *    component toward zero ('-1.5' MONTH on March lands January);
    *  - output format: the result keeps its time only for 'T'-string
    *    and typed (Date-object analog) inputs — a date-only string
    *    truncates back to its UTC date: '1995-01-04' - INTERVAL
    *    1 MINUTE = '1995-01-03', not 23:59 (found by the interval
    *    fuzz shape);
    *  - NUMBERS are not dates (toDate:136 accepts only date-shaped
    *    strings and Date objects) — epoch millis yield NULL.
    * Runs BEFORE rewriteIntervalOperands (which then only sees interval
    * forms this literal-value pattern cannot claim); typed-vs-string
    * dispatch rides on typeof(expr). Chained ops re-wrap the previous
    * call's timestamp output (space form → Date-object semantics).
    */
  // token-level interval-literal readers shared by the three interval
  // passes: value = '…numeric…' | [adjacent -]number (the reference
  // accepts any text Number() converts — src/parse/primary.js:388-393);
  // unit = DAY…YEAR with optional plural S (WEEK where the pass allows)
  private def ivlValueAt(v: SqlTok.View, i: Int): Option[(Int, Double)] = {
    val toks = v.toks
    if (i >= toks.length) return None
    val t = toks(i)
    t.kind match {
      case SqlTok.Str if t.up.length >= 2 && t.up.endsWith("'") =>
        val body = t.up.substring(1, t.up.length - 1)
        if (body.matches(raw"\s*[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?\s*"))
          Some((1, body.trim.toDouble))
        else None
      case SqlTok.Num => Some((1, t.up.toDouble))
      case SqlTok.Op if t.up == "-" && i + 1 < toks.length &&
          toks(i + 1).kind == SqlTok.Num && t.end == toks(i + 1).start =>
        Some((2, -toks(i + 1).up.toDouble))
      case _ => None
    }
  }

  // interval-unit keyword shape shared by the interval passes
  private val unitRe = raw"(?i)^(day|hour|minute|second|month|year|week|millisecond|microsecond)s?$$".r

  private def ivlUnitAt(v: SqlTok.View, i: Int, allowWeek: Boolean): Option[String] = {
    if (i >= v.toks.length) return None
    val t = v.toks(i)
    if (t.kind != SqlTok.Word) return None
    val u = if (t.up.length > 1 && t.up.endsWith("S")) t.up.dropRight(1) else t.up
    val ok = u == "DAY" || u == "HOUR" || u == "MINUTE" || u == "SECOND" ||
      u == "MONTH" || u == "YEAR" || (allowWeek && u == "WEEK")
    if (ok) Some(u) else None
  }

  private def rewriteJsIntervalArith(sqlIn: String): String = {
    // per-row JS value-class of the operand (see the expression's kind param)
    def kindExpr(p: String): String =
      s"(CASE WHEN typeof($p) = 'string' THEN " +
        s"(CASE WHEN try_cast(($p) AS STRING) LIKE '%T%' THEN 'ts_str' ELSE 'date_str' END) " +
        s"WHEN typeof($p) = 'date' OR typeof($p) LIKE 'timestamp%' THEN 'typed' " +
        s"ELSE 'none' END)"
    var s = sqlIn
    // pre-pass: COMMUTE the left-interval form `INTERVAL v U + expr`
    // (reference: evaluate.js:182 — '+' only; '-' with the interval on
    // the left throws there, and throws here too) into the right form
    // the main loop handles. An INTERVAL preceded by +/- is a right
    // form's literal, not a left form.
    var lfrom = 0
    var lguard = 0
    var ldone = false
    while (!ldone && lguard < 1000) {
      lguard += 1
      val v = new SqlTok.View(s)
      val toks = v.toks
      var i = 0
      var site = -1
      var consumed = 0
      var vNum = 0.0
      var unit = ""
      while (site < 0 && i < toks.length) {
        if (toks(i).is("INTERVAL") && toks(i).start >= lfrom) {
          ivlValueAt(v, i + 1).foreach { case (c, value) =>
            ivlUnitAt(v, i + 1 + c, allowWeek = false).foreach { u =>
              if (i + 2 + c < toks.length && toks(i + 2 + c).isOp("+")) {
                site = i; consumed = c; vNum = value; unit = u
              }
            }
          }
        }
        if (site < 0) i += 1
      }
      if (site < 0) ldone = true
      else {
        val plusIdx = site + 2 + consumed
        val precededByOp = site > 0 && toks(site - 1).kind == SqlTok.Op &&
          (toks(site - 1).up.endsWith("+") || toks(site - 1).up.endsWith("-"))
        val opEnd = v.forwardFrom(plusIdx + 1)
        if (precededByOp || opEnd < 0) lfrom = toks(plusIdx).end
        else {
          // normalize the value to plain decimal so the main loop's
          // site scan re-claims the commuted form
          val operand = s.substring(toks(plusIdx + 1).start, opEnd).trim
          val commuted = s"$operand + INTERVAL '$vNum' $unit"
          s = s.substring(0, toks(site).start) + commuted + s.substring(opEnd)
          lfrom = toks(site).start
        }
      }
    }
    // a silent cap would leave the tail on native (clamping) interval
    // semantics — fail loudly instead (1000 sites is far beyond any
    // real statement; batch generated SQL below that)
    if (!ldone)
      throw new IllegalStateException(
        "statement exceeds 1000 left-interval rewrite sites")
    var from = 0
    var guard = 0
    // chained ops (`d + INTERVAL 1 DAY - INTERVAL 2 HOUR`): the outer
    // call's operand is the inner call — thread the ORIGINAL operand's
    // kind through so each step reformats like the reference
    // (a date-only string stays date-only at every step)
    var lastCall: Option[(String, String)] = None
    while (guard < 1000) {
      guard += 1
      val v = new SqlTok.View(s)
      val toks = v.toks
      var i = 0
      var site = -1
      var consumed = 0
      var vNum = 0.0
      var unit = ""
      while (site < 0 && i + 1 < toks.length) {
        val t = toks(i)
        if (t.kind == SqlTok.Op && (t.up == "+" || t.up == "-") && t.start >= from &&
            toks(i + 1).is("INTERVAL")) {
          ivlValueAt(v, i + 2).foreach { case (c, value) =>
            ivlUnitAt(v, i + 2 + c, allowWeek = false).foreach { u =>
              site = i; consumed = c; vNum = value; unit = u
            }
          }
        }
        if (site < 0) i += 1
      }
      if (site < 0) return s
      val opTok = toks(site)
      val siteEnd = toks(site + 2 + consumed).end
      val (pIdx, pStart0, pEnd) = v.primaryBefore(site)
      // a quoted primary may be the tail of a typed literal —
      // absorb the DATE/TIMESTAMP keyword so the whole literal
      // rides into the call (else `DATE graft_js_interval(…)`
      // would be left behind, a parse error)
      val pStart =
        if (pEnd > pStart0 && s.charAt(pStart0) == '\'' && pIdx > 0 &&
            (toks(pIdx - 1).is("DATE") || toks(pIdx - 1).is("TIMESTAMP")))
          toks(pIdx - 1).start
        else pStart0
      val p = s.substring(pStart, pEnd)
      // same chain guards as rewriteIntervalOperands: a primary
      // that is itself a unit keyword / bare number / the quoted
      // value of a preceding INTERVAL literal marks a CHAINED
      // interval op — its left side is the preceding arithmetic
      val quotedAfterInterval = p.startsWith("'") && pIdx > 0 &&
        toks(pIdx - 1).is("INTERVAL")
      // PUSHDOWN fast path: a typed-constant operand
      // (CURRENT_TIMESTAMP / CURRENT_DATE / NOW() / typed
      // literal) with an integral sub-month unit is the common
      // time-window filter bound (`WHERE ts > now() - INTERVAL
      // 7 DAY`). JS Date-object semantics keep the time there,
      // and integral day/hour/minute/second arithmetic is
      // bit-identical to Spark's. The native JsInterval
      // expression DOES constant-fold, but it would round the
      // operand through CAST(ts AS STRING), which truncates
      // sub-millisecond precision (V8 keeps millis only) — native
      // interval arithmetic is both bit-identical at micros AND
      // trivially pushdown-friendly, so the carve-out stays
      // (rewriteIntervalOperands' coercion CASE folds once
      // ComputeCurrentTime makes now() a literal).
      // typed TIMESTAMP literals arrive here ALREADY rewritten by
      // the lenient-cast pass (TIMESTAMP 'x' → try_cast('x' AS
      // TIMESTAMP)); DATE 'x' and the paren spellings of
      // CURRENT_TIMESTAMP/CURRENT_DATE arrive verbatim
      val typedConst = p.trim.matches(
        "(?is)^(CURRENT_TIMESTAMP(\\s*\\(\\s*\\))?|CURRENT_DATE(\\s*\\(\\s*\\))?|" +
          "NOW\\s*\\(\\s*\\)|TIMESTAMP\\s+'[^']*'|DATE\\s+'[^']*'|" +
          "TRY_CAST\\s*\\(\\s*'[^']*'\\s+AS\\s+(TIMESTAMP|DATE)\\s*\\))$")
      def subMonthIntegral(u: String, d: Double): Boolean =
        (u == "DAY" || u == "HOUR" || u == "MINUTE" || u == "SECOND") &&
          d == d.toLong.toDouble // integral ('5e-1' has no dot but is 0.5)
      // the fast path must hold for the WHOLE chain: if a LATER
      // op is MONTH/YEAR/fractional, skipping the head would
      // leave the tail on native (clamping) arithmetic — only
      // stay native when every subsequent interval op is
      // integral sub-month too
      def chainAllSubMonth(fromChar: Int): Boolean = {
        var idx = v.tokAtOrAfter(fromChar)
        var ok = true
        var cont = true
        while (cont && ok) {
          val isTail = idx + 1 < toks.length && toks(idx).kind == SqlTok.Op &&
            (toks(idx).up == "+" || toks(idx).up == "-") &&
            toks(idx + 1).is("INTERVAL")
          val step = if (isTail) ivlValueAt(v, idx + 2).flatMap { case (c, value) =>
            ivlUnitAt(v, idx + 2 + c, allowWeek = false).map(u => (c, value, u))
          } else None
          step match {
            case Some((c, value, u)) =>
              ok = subMonthIntegral(u, value)
              idx = idx + 3 + c
            case None => cont = false
          }
        }
        ok
      }
      val skip = p.trim.isEmpty || unitRe.findFirstIn(p.trim).isDefined ||
        p.trim.matches("[0-9.]+") || quotedAfterInterval ||
        (typedConst && subMonthIntegral(unit, vNum) && chainAllSubMonth(siteEnd))
      if (skip) from = siteEnd
      else {
        // raw string form: the expression implements toDate itself (a
        // typed timestamp/date round-trips its own cast; numbers
        // are NOT dates in the reference — they yield NULL)
        // a chained op's primary may carry wrapping parens:
        // `(d + INTERVAL 1 DAY) - INTERVAL 2 HOUR` rewrites the
        // inside first, leaving `(graft_js_interval(...))`
        val core = {
          var t = p.trim
          while (t.startsWith("(") && t.endsWith(")") &&
              matchParen(t, 0) == t.length - 1)
            t = t.substring(1, t.length - 1).trim
          t
        }
        val kind = lastCall match {
          case Some((inner, k)) if core == inner => k
          case _ => kindExpr(p)
        }
        val call = s"graft_js_interval(try_cast(($p) AS STRING), " +
          s"CAST($vNum AS DOUBLE), '$unit', '${opTok.up}', $kind)"
        s = s.substring(0, pStart) + call + s.substring(siteEnd)
        from = pStart + call.length
        lastCall = Some((call, kind))
      }
    }
    throw new IllegalStateException(
      "statement exceeds 1000 interval rewrite sites") // silent native tails would clamp
  }

  /** Fractional interval values truncate toward zero in the reference:
    * its parser accepts any numeric text (reference:
    * src/parse/primary.js:379-409) and its evaluator feeds the value to
    * a JS Date setter (src/expression/date.js:20-32), which applies
    * ToIntegerOrInfinity — `+ INTERVAL '2.5' HOUR` adds exactly 2
    * hours. Spark's parser rejects non-integral values for the
    * non-second units outright, so rewrite the literal to the truncated
    * integer (all units, SECOND included — Spark would honor 2.5s, the
    * reference does not).
    */
  private def rewriteFractionalIntervals(sqlIn: String): String = {
    val v = new SqlTok.View(sqlIn)
    val toks = v.toks
    // (startChar, endChar, replacement) per site — sites are disjoint,
    // so one left-to-right rebuild applies them all
    val sites = scala.collection.mutable.ListBuffer.empty[(Int, Int, String)]
    var i = 0
    while (i < toks.length) {
      if (toks(i).is("INTERVAL")) {
        ivlValueAt(v, i + 1) match {
          case Some((consumed, value)) =>
            ivlUnitAt(v, i + 1 + consumed, allowWeek = true) match {
              case Some(unit) =>
                // normalize to the truncated integer literal (identity
                // for values already integral; Spark-parseable for
                // '.5'/'1e2'/'+1')
                sites += ((toks(i).start, toks(i + 1 + consumed).end,
                  s"INTERVAL '${value.toLong}' $unit"))
                i += 1 + consumed
              case None => ()
            }
          case None => ()
        }
      }
      i += 1
    }
    if (sites.isEmpty) sqlIn
    else {
      val sb = new StringBuilder(sqlIn.length)
      var prev = 0
      for ((a, b, rep) <- sites) { sb.append(sqlIn.substring(prev, a)).append(rep); prev = b }
      sb.append(sqlIn.substring(prev))
      sb.toString
    }
  }

  /** DuckDB-style FROM-first queries: the reference's parseSelect reads
    * a leading FROM as `SELECT * FROM ...` (reference:
    * src/parse/parse.js:193-197), anywhere a select can start — the
    * statement head, a parenthesized subquery, or a set-operation arm.
    * Spark has no FROM-first form; insert the star select at those
    * positions (a FROM directly at statement start / after `(` / after
    * UNION|INTERSECT|EXCEPT [ALL|DISTINCT] cannot be anything else).
    */
  private def rewriteFromFirst(sqlIn: String): String =
    tokenEdit(sqlIn) { v =>
      val t = v.toks
      def setOp(i: Int): Boolean =
        t(i).is("UNION") || t(i).is("INTERSECT") || t(i).is("EXCEPT")
      t.indices.collect {
        case k if t(k).is("FROM") && (k == 0 || (t(k - 1).kind match {
          case SqlTok.LPar => true
          case SqlTok.RPar =>
            // `WITH c AS (SELECT …) FROM c` — a FROM right after a CTE
            // body's close-paren is FROM-first (the reference accepts
            // it); a close-paren whose opener is NOT preceded by AS
            // (scalar subquery, function call) is a normal FROM
            val open = v.brk(k - 1)
            open > 0 && t(open - 1).is("AS")
          case SqlTok.Word =>
            setOp(k - 1) || ((t(k - 1).is("ALL") || t(k - 1).is("DISTINCT")) &&
              k >= 2 && setOp(k - 2))
          case _ => false
        })) => (t(k).start, t(k).start, "SELECT * ")
      }
    }

  /** Coerce the LEFT operand of `expr ± INTERVAL ...` to a timestamp:
    * the reference runs date arithmetic over date STRINGS and
    * epoch-millis NUMBERS (new Date(...) in its evaluator) where Spark
    * rejects `string + interval` at analysis. Already-typed
    * timestamp/date operands pass through try_cast unchanged. Interval
    * UNIT keywords and bare numbers are skipped so chained arithmetic
    * (`ts + INTERVAL 1 DAY - INTERVAL 2 HOUR`) wraps only the head.
    */
  /** Coerce any date operand to TIMESTAMP the reference's way: all
    * paths go through STRING so every static operand type analyzes
    * (DATE→BIGINT isn't castable even with try_cast): numeric text →
    * epoch millis, anything else → timestamp parse (a typed
    * timestamp/date round-trips its own cast).
    */
  private def coerceTsExpr(p: String): String = {
    val str = s"try_cast(($p) AS STRING)"
    s"(CASE WHEN try_cast($str AS BIGINT) IS NOT NULL " +
      s"THEN timestamp_millis(try_cast($str AS BIGINT)) " +
      s"WHEN try_cast($str AS DOUBLE) IS NOT NULL " +
      s"THEN timestamp_millis(CAST(try_cast($str AS DOUBLE) AS BIGINT)) " +
      s"ELSE try_cast($str AS TIMESTAMP) END)"
  }

  private def rewriteIntervalOperands(sqlIn: String): String = {
    var s = sqlIn
    var from = 0
    var guard = 0
    while (guard < 1000) {
      guard += 1
      val v = new SqlTok.View(s)
      val toks = v.toks
      var i = 0
      var site = -1
      while (site < 0 && i + 1 < toks.length) {
        val t = toks(i)
        if (t.kind == SqlTok.Op && (t.up == "+" || t.up == "-") && t.start >= from &&
            toks(i + 1).is("INTERVAL")) site = i
        else i += 1
      }
      if (site < 0) return s
      val intervalEnd = toks(site + 1).end
      val (pIdx, pStart, pEnd) = v.primaryBefore(site)
      val p = s.substring(pStart, pEnd)
      val quotedAfterInterval = p.startsWith("'") && pIdx > 0 &&
        toks(pIdx - 1).is("INTERVAL")
      val skip = p.trim.isEmpty || unitRe.findFirstIn(p.trim).isDefined ||
        p.trim.matches("[0-9.]+") || quotedAfterInterval
      if (skip) from = intervalEnd
      else {
        val wrapped = coerceTsExpr(p)
        s = s.substring(0, pStart) + wrapped + s.substring(pEnd)
        from = intervalEnd + (wrapped.length - p.length)
      }
    }
    s
  }

  /** Numeric subscripts (`items[5]`, `array(1,2)[0]`) are JS element
    * access in the reference: 0-based, NULL when out of range or
    * negative — Spark's `[]` (GetArrayItem) errors out of range under
    * ANSI, `get()` matches. String subscripts (map/struct keys) pass
    * through untouched.
    */
  private def rewriteSubscripts(sqlIn: String): String = {
    var s = sqlIn
    var guard = 0
    var from = 0
    while (guard < 200) {
      guard += 1
      if (!s.contains("[")) return s
      val v = new SqlTok.View(s)
      val toks = v.toks
      var k = 0
      var site = -1
      while (site < 0 && k < toks.length) {
        val t = toks(k)
        // a bracket after an ident/number/close-paren/close-bracket/
        // double-quoted ident (NOT a string literal) is a subscript —
        // whitespace allowed (`a [1]` == `a[1]`, the reference parser
        // is token-based; probed), but an operator/clause KEYWORD
        // before `[` leaves an array literal (`IN [1,2]`, `THEN [x]`)
        if (t.kind == SqlTok.LBrk && t.start >= from && v.brk(k) >= 0 && k > 0 &&
            ((toks(k - 1).kind == SqlTok.Word &&
               !SqlTok.neverCallable(toks(k - 1).up)) ||
              toks(k - 1).kind == SqlTok.Num ||
              toks(k - 1).kind == SqlTok.RPar || toks(k - 1).kind == SqlTok.RBrk ||
              toks(k - 1).kind == SqlTok.DQuot)) site = k
        else k += 1
      }
      if (site < 0) return s
      val open = toks(site)
      val close = toks(v.brk(site))
      val content = s.substring(open.end, close.start)
      if (content.trim.startsWith("'")) from = close.end
      else {
        val (_, bStart, _) = v.primaryBefore(site)
        val base = s.substring(bStart, open.start)
        val rep = s"graft_get($base, ($content))"
        s = s.substring(0, bStart) + rep + s.substring(close.end)
        from = bStart + rep.length
      }
    }
    s
  }

  /** `A [al] POSITIONAL JOIN B [bl]` (DuckDB-style row-position join;
    * reference: test/execute/positional.test.js — shorter side padded
    * with NULLs): each side gains a row_number over the input order and
    * the join becomes FULL OUTER USING that position. Without this
    * rewrite Spark parses POSITIONAL as a table ALIAS and silently
    * cross-scopes the query — the silent-wrong-answer class. A bare
    * `SELECT *` projection is rewritten to `* EXCEPT (__gpos)` so the
    * helper column never reaches the caller.
    */
  private def rewritePositionalJoin(sqlIn: String): String = {
    if (!sqlIn.toUpperCase(java.util.Locale.ROOT).contains("POSITIONAL")) return sqlIn
    val kw = Set("FROM", "JOIN", "WHERE", "GROUP", "ORDER", "LIMIT",
      "HAVING", "UNION", "ON", "AND", "OR", "SELECT", "CROSS", "INNER",
      "LEFT", "RIGHT", "FULL", "POSITIONAL")
    def side(tbl: String, alias: String): String = {
      val al = if (alias != null) alias else tbl.split('.').last
      s"(SELECT *, row_number() OVER (ORDER BY monotonically_increasing_id()) AS __gpos FROM $tbl) AS $al"
    }
    val v = new SqlTok.View(sqlIn)
    val t = v.toks
    def tableWord(i: Int): Boolean = i >= 0 && i < t.length &&
      t(i).kind == SqlTok.Word && !kw(t(i).up)
    // start of the dotted chain ENDING at token i
    def chainStart(i: Int): Int = {
      var j = i
      while (j >= 2 && t(j - 1).isOp(".") && t(j - 1).end == t(j).start &&
          t(j - 2).end == t(j - 1).start && t(j - 2).kind == SqlTok.Word) j -= 2
      j
    }
    def text(i: Int): String = sqlIn.substring(t(i).start, t(i).end)
    val edits = Seq.newBuilder[(Int, Int, String)]
    var lastEnd = -1
    var rewrote = false
    var k = 0
    while (k + 1 < t.length) {
      if (t(k).is("POSITIONAL") && t(k + 1).is("JOIN")) {
        // LEFT side, backward from POSITIONAL: tbl | tbl alias | tbl AS alias
        var lAlias: String = null
        var lEnd = k - 1 // chain-end token of the left table
        if (tableWord(lEnd)) {
          if (lEnd >= 2 && t(lEnd - 1).is("AS") && tableWord(lEnd - 2)) {
            lAlias = text(lEnd); lEnd -= 2
          } else if (chainStart(lEnd) == lEnd && lEnd >= 1 && tableWord(lEnd - 1)) {
            lAlias = text(lEnd); lEnd -= 1
          }
        }
        val lStart = chainStart(lEnd)
        // RIGHT side, forward from JOIN: tbl [AS] alias
        val rStart = k + 2
        if (tableWord(lStart) && tableWord(rStart) && t(lStart).start > lastEnd) {
          var rTblEnd = rStart
          while (rTblEnd + 2 < t.length && t(rTblEnd + 1).isOp(".") &&
              t(rTblEnd).end == t(rTblEnd + 1).start &&
              t(rTblEnd + 1).end == t(rTblEnd + 2).start &&
              t(rTblEnd + 2).kind == SqlTok.Word) rTblEnd += 2
          var rAlias: String = null
          var rEnd = rTblEnd
          if (rTblEnd + 2 < t.length && t(rTblEnd + 1).is("AS") &&
              tableWord(rTblEnd + 2)) {
            rAlias = text(rTblEnd + 2); rEnd = rTblEnd + 2
          } else if (rTblEnd + 1 < t.length && tableWord(rTblEnd + 1)) {
            rAlias = text(rTblEnd + 1); rEnd = rTblEnd + 1
          }
          val lTbl = sqlIn.substring(t(lStart).start, t(lEnd).end)
          val rTbl = sqlIn.substring(t(rStart).start, t(rTblEnd).end)
          edits += ((t(lStart).start, t(rEnd).end,
            s"${side(lTbl, lAlias)} FULL JOIN ${side(rTbl, rAlias)} USING (__gpos)"))
          lastEnd = t(rEnd).end
          rewrote = true
          k = rEnd
        }
      }
      k += 1
    }
    var s = SqlTok.applyEdits(sqlIn, edits.result())
    // a bare star would surface __gpos — exclude it
    if (rewrote)
      s = tokenEdit(s) { w =>
        val u = w.toks
        if (u.length > 2 && u(0).is("SELECT") && u(1).isOp("*") && u(2).is("FROM"))
          Seq((u(1).end, u(1).end, " EXCEPT (__gpos)"))
        else Seq.empty
      }
    s
  }

  private def rewriteChecked(spark: SparkSession, sqlText: String): String = {
    val full = rewriteImpl(sqlText, notInExists = true)
    if (!full.contains("__nin")) full
    else try {
      spark.sql(full).queryExecution.analyzed
      full
    } catch {
      case _: org.apache.spark.sql.AnalysisException =>
        rewriteImpl(sqlText, notInExists = false)
    }
  }

  private def rewriteImpl(sqlText: String, notInExists: Boolean): String = {
    // compute OUTSIDE the map's lock: computeIfAbsent would hold the
    // single monitor for the whole multi-pass rewrite, serializing
    // concurrent sessions; the rewrite is pure, so a duplicated
    // computation on a race is harmless. Key on the comment-stripped,
    // trailing-trimmed text: strictLint rewrites that form while
    // rewriteChecked passes the original, and both must hit the same
    // entry (stripComments is the pipeline's own first pass, so this
    // changes no output).
    val key = (stripComments(sqlText).stripTrailing(), notInExists)
    val hit = rewriteMemo.get(key)
    if (hit != null) hit
    else {
      val out = rewriteImplUncached(sqlText, notInExists)
      rewriteMemo.put(key, out)
      out
    }
  }

  private def rewriteImplUncached(sqlText: String, notInExists: Boolean): String = {
    var s = sqlText

    // comments go first — they are whitespace to the engine, and every
    // regex rewrite below (and the FROM-first backward scan) is simpler
    // and safer over comment-free text (quote-aware strip)
    s = stripComments(s)

    // FROM-first statements before anything — they restructure the
    // skeleton every later rewrite anchors on (a SELECT list)
    s = rewriteFromFirst(s)

    // mid-chain set-op arm tails next (needs the SELECT the FROM-first
    // pass just inserted; wraps tailed arms into subqueries BEFORE any
    // pass that anchors on the statement skeleton)
    s = rewriteSetOpArmTails(s)

    // bracket array literals first — they can appear inside any later
    // construct ([1,2,3] → array(1,2,3); subscripts like items[1] keep)
    s = rewriteArrayLiterals(s)
    // then numeric subscripts → get() (0-based, null out of range)
    s = rewriteSubscripts(s)

    // POSITIONAL JOIN next (it restructures the FROM — and without the
    // rewrite Spark silently reads POSITIONAL as a table alias)
    s = rewritePositionalJoin(s)

    // DISTINCT ON first — it restructures the statement skeleton
    s = rewriteDistinctOn(s)

    // comma-joined table functions next (they restructure the FROM)
    s = rewriteCommaTvf(s)

    // chained GROUP BY aliases / aliases inside ORDER BY aggregates
    s = rewriteAliasExpansion(s)

    if (notInExists) s = rewriteNotInSubquery(s)

    // zero-divisor guards next, on the user's own text (later rewrites
    // may duplicate subexpressions — guard divisions before that)
    s = rewriteZeroDivisors(s)
    // MOD(a, b) with b = 0: NaN in the reference (null-serialized);
    // try_mod is Spark's exact lenient form
    s = rewriteCall(s, "mod", args =>
      if (args.length == 2) s"try_mod(${args(0)}, ${args(1)})"
      else s"try_mod(${args.mkString(", ")})")

    // LATERAL VIEW JSON_EACH / scalar-position json_each: the map
    // explode spelled directly (LATERAL VIEW explode(...) t AS k, v
    // is native Spark)
    // JSON_EACH handles objects (key = field name) AND arrays (key =
    // index; reference test/execute/execute.json.test.js:636). The
    // object parse wins when non-null; otherwise the array parse
    // builds an index→element map. One Spark column forces STRING keys
    // for arrays where the reference's are numeric — the differential
    // jsonBridge treats '0' ≡ 0, and hosts read keys positionally.
    s = rewriteCall(s, "json_each", args => {
      // a LITERAL scalar argument ('42', 'true') is statically visible
      // and the reference throws at execution (JSON_EACH(value):
      // argument must be a JSON object or array) — match that; data
      // columns stay lenient like the rest of the JSON family
      val scalarErr =
        if (args.length == 1) jsonEachScalarErr(args.head) else None
      if (scalarErr.isDefined)
        "explode(map_from_entries(array(struct(CAST(raise_error(" +
          s"'${scalarErr.get}') AS STRING), 'x'))))"
      else {
        // typed (struct/array) input renders to JSON text first — the
        // reference's JSON family takes strings OR typed values directly
        val x = s"graft_json_input(${args.mkString(", ")})"
        s"explode(coalesce(from_json($x, 'map<string,string>'), " +
          s"map_from_entries(transform(from_json($x, 'array<string>'), " +
          s"(e, i) -> struct(cast(i AS string), e)))))"
      }
    })

    // ->> / -> json access chains (j -> 'a' ->> 0 ...) collapse into ONE
    // get_json_object with a combined path — both more efficient (one
    // parse of the document) and single-pass-tractable. Base: a dotted
    // identifier chain; steps: quoted field names or bare indices.
    // Guard: an arrow whose innermost enclosing call is a higher-order
    // function is a lambda body (list_transform(xs, x -> 'p' || x)), not
    // JSON access — left untouched.
    s = tokenEdit(s) { v =>
      val t = v.toks
      val edits = Seq.newBuilder[(Int, Int, String)]
      var k = 0
      while (k < t.length) {
        val headless = t(k).kind == SqlTok.Word &&
          !(k > 0 && t(k - 1).isOp(".") && t(k - 1).end == t(k).start)
        if (headless) {
          // extend the dotted base: `.word` / `.123` segments, adjacent
          var end = k
          while (end + 2 < t.length && t(end + 1).isOp(".") &&
              t(end).end == t(end + 1).start &&
              t(end + 1).end == t(end + 2).start &&
              (t(end + 2).kind == SqlTok.Word || t(end + 2).kind == SqlTok.Num)) end += 2
          var j = end + 1
          val path = new StringBuilder
          var cont = true
          while (cont && j + 1 < t.length && t(j).kind == SqlTok.Op &&
              (t(j).up == "->" || t(j).up == "->>")) {
            val a = t(j + 1)
            if (a.kind == SqlTok.Str && a.up.length >= 2 && a.up.endsWith("'") &&
                !a.up.substring(1, a.up.length - 1).contains("'")) {
              path.append('.').append(a.up.substring(1, a.up.length - 1)); j += 2
            } else if (a.kind == SqlTok.Num && a.up.forall(_.isDigit)) {
              path.append('[').append(a.up).append(']'); j += 2
            } else cont = false
          }
          if (path.nonEmpty && !isHofContext(v, k)) {
            val base = v.s.substring(t(k).start, t(end).end)
            edits += ((t(k).start, t(j - 1).end,
              s"get_json_object(graft_json_input($base), '$$$path')"))
          }
          k = math.max(j, end + 1)
        } else k += 1
      }
      edits.result()
    }

    // struct_pack(k := v, ...) → named_struct('k', v, ...)
    s = rewriteCall(s, "struct_pack", args => {
      val kv = args.map { a =>
        val parts = a.split(":=", 2)
        if (parts.length == 2) s"'${parts(0).trim}', ${parts(1).trim}" else a
      }
      s"named_struct(${kv.mkString(", ")})"
    })

    // struct_extract(st, 'k') → (st).k  (literal keys — the dialect form)
    s = rewriteCall(s, "struct_extract", args =>
      if (args.length == 2 && args(1).startsWith("'") && args(1).endsWith("'"))
        s"(${args(0)}).${args(1).stripPrefix("'").stripSuffix("'")}"
      else s"struct_extract_unsupported(${args.mkString(", ")})")

    // Null-KEEPING array aggregation: the reference's ARRAY_AGG / LIST /
    // JSON_ARRAYAGG keep null inputs in place (JS array push —
    // execute.aggregate tests "should include nulls"); Spark's array_agg
    // drops them. Values ride inside a struct (never null) and unwrap
    // after; a trailing FILTER clause folds into the inner aggregate
    // (to_json/transform reject a FILTER suffix).
    // __nkagg__ marker: the emitted text contains `array_agg(`, which
    // would re-match the scan and wrap forever (rewriteCall restarts)
    // __nkagg__ marker: the emitted text contains `array_agg(`, which
    // would re-match the scan and wrap forever (rewriteCall restarts).
    // DISTINCT distributes over the struct wrap (distinct structs =
    // distinct values, nulls kept).
    def nullKeepAgg(arg: String, filt: Option[String]): String = {
      val dist = raw"(?is)^\s*DISTINCT\b(.*)$$".r
      val (kw, x) = arg match {
        case dist(e) => ("DISTINCT ", e.trim)
        case e => ("", e)
      }
      s"transform(__nkagg__(${kw}struct(($x) AS __v))${filt.map(" FILTER " + _).getOrElse("")}, s -> s.__v)"
    }
    for (f <- Seq("json_group_array", "json_arrayagg"))
      s = rewriteAggFilter(s, f, (args, filt) =>
        s"to_json(${nullKeepAgg(args.mkString(", "), filt)})")
    for (f <- Seq("array_agg", "list"))
      s = rewriteAggFilter(s, f, (args, filt) =>
        if (args.length == 1) nullKeepAgg(args.head, filt)
        else s"__agg_${f}__(${args.mkString(", ")})${filt.map(" FILTER " + _).getOrElse("")}")
    s = s.replace("__agg_array_agg__(", "array_agg(")
    s = s.replace("__agg_list__(", "collect_list(")
    s = s.replace("__nkagg__(", "array_agg(")
    s = rewriteCall(s, "json_group_object", args =>
      if (args.length == 2)
        s"to_json(map_from_arrays(collect_list(${args(0)}), collect_list(${args(1)})))"
      else s"json_group_object_unsupported(${args.mkString(", ")})")

    // Lenient NUMERIC casts (reference: src/expression/evaluate.js:711-726
    // — Number(val) with NaN → null, Math.trunc for integer targets, a
    // bigint passthrough shortcut). Spark 4's ANSI CAST throws on
    // 'abc'::BIGINT and on '12.7'→BIGINT where the reference returns
    // null and 12. coalesce(try_cast direct, try_cast via DOUBLE)
    // reproduces all three behaviors: exact when the input already fits
    // (the bigint shortcut), truncation-through-double for numeric
    // strings (including the reference's inherent >2^53 precision loss),
    // null for garbage. Non-numeric targets keep ANSI semantics.
    s = rewriteCall(s, "cast", args =>
      if (args.length == 1) {
        val m = raw"(?is)^(.*\S)\s+AS\s+(INTEGER|INT|BIGINT|SMALLINT|TINYINT|FLOAT|REAL|DOUBLE)\s*$$".r
        val ms = raw"(?is)^(.*\S)\s+AS\s+(VARCHAR|STRING|TEXT)\s*$$".r
        val mt = raw"(?is)^(.*\S)\s+AS\s+TIMESTAMP\s*$$".r
        args.head match {
          // TIMESTAMP targets: the reference's new Date(v) reads NUMBERS
          // (and numeric strings) as epoch MILLIS — Spark's numeric→
          // timestamp cast reads SECONDS — and yields null, not an
          // error, for unparseable text (execute.cast tests). typeof
          // dispatches so an already-typed timestamp/date stays exact.
          case mt(e) =>
            s"(CASE WHEN __typeofkeep__(($e)) IN ('timestamp', 'date') " +
              s"THEN try_cast(($e) AS TIMESTAMP) " +
              s"WHEN try_cast(($e) AS BIGINT) IS NOT NULL " +
              s"THEN timestamp_millis(try_cast(($e) AS BIGINT)) " +
              s"WHEN try_cast(($e) AS DOUBLE) IS NOT NULL " +
              s"THEN timestamp_millis(CAST(try_cast(($e) AS DOUBLE) AS BIGINT)) " +
              s"ELSE try_cast(($e) AS TIMESTAMP) END)"
          // string targets render JS-style: String(2.0) = '2', not
          // '2.0' — and objects/Dates via JSON.stringify (cast mode:
          // CAST([1,2] AS VARCHAR) = '[1,2]', a Date casts to the
          // QUOTED ISO form; evaluate.js:703-706)
          case ms(e, _) => s"graft_js_cast_str(($e))"
          case m(e, t) =>
            val tgt = t.toUpperCase(java.util.Locale.ROOT)
            // JS Number('') = 0 — a blank string casts to ZERO, not null
            val blankZero = s"CASE WHEN trim(($e)) = '' THEN try_cast(0 AS $tgt) END"
            if (tgt == "DOUBLE" || tgt == "FLOAT" || tgt == "REAL")
              s"coalesce(try_cast(($e) AS $tgt), $blankZero)"
            else
              s"coalesce(try_cast(($e) AS $tgt), " +
                s"try_cast(try_cast(($e) AS DOUBLE) AS $tgt), $blankZero)"
          // __cast__ marker: emitting `cast(` verbatim would re-match the
          // scan pattern forever (same trick as __position__ below)
          case other => s"__cast__($other)"
        }
      } else s"__cast__(${args.mkString(", ")})")
    s = s.replace("__cast__(", "cast(")

    // CONCAT / STRING_AGG stringify their arguments with JS String(v)
    // (strings.js CONCAT, evaluate.js:371 STRING_AGG): doubles render
    // "2" not "2.0", and STRING_AGG accepts numeric input Spark's
    // string-typed listagg would reject. Wrapping in graft_js_str fixes
    // both (no-op on strings, null-propagating). Runs BEFORE renames so
    // array_concat/list_concat → concat stays untouched array concat.
    // __concat__/__agg__ markers: the replacements contain the scanned
    // names (same trick as __position__).
    s = rewriteCall(s, "concat", args =>
      s"__concat__(${args.map(a => s"graft_js_str($a)").mkString(", ")})")
    s = s.replace("__concat__(", "concat(")
    s = rewriteCall(s, "string_agg", args =>
      if (args.length == 2) {
        val dist = raw"(?is)^DISTINCT\s+(.*)$$".r
        args(0) match {
          case dist(e) => s"__stragg__(DISTINCT graft_js_str($e), ${args(1)})"
          case e => s"__stragg__(graft_js_str($e), ${args(1)})"
        }
      } else s"__stragg__(${args.mkString(", ")})")
    s = s.replace("__stragg__(", "string_agg(")

    // JSON inspection family (reference: src/expression/evaluate.js:502-700).
    // JSON_VALID parse-checks a string with WHOLE-INPUT strictness:
    // Spark's try_parse_json accepts '"a":{...}' (parses the leading
    // scalar, ignores trailing garbage) where JSON.parse rejects — so
    // this one goes through the strict helper, not the variant parser
    // JSON_VALID is FALSE for any non-string input (numbers, objects —
    // execute.json "should return false for non-string input"), so it
    // does NOT take the graft_json_input coercion the rest of the
    // family uses — graft_json_valid_any dispatches on the runtime type
    s = rewriteCall(s, "json_valid", args =>
      s"graft_json_valid_any(${args.mkString(", ")})")
    // JSON_TYPE: typeof of the PARSED value; invalid JSON errors in both
    // engines (hence parse_json, not try_parse_json — the reference
    // throws ArgValueError there)
    s = rewriteCall(s, "json_type", args => {
      val a = s"graft_json_input(${args.head})"
      val sv = s"schema_of_variant(parse_json($a))"
      s"(CASE WHEN ($a) IS NULL THEN NULL " +
        s"WHEN $sv LIKE 'OBJECT%' THEN 'object' " +
        s"WHEN $sv LIKE 'ARRAY%' THEN 'array' " +
        s"WHEN $sv = 'STRING' THEN 'string' " +
        s"WHEN $sv = 'BOOLEAN' THEN 'boolean' " +
        s"WHEN $sv = 'VOID' THEN 'null' ELSE 'number' END)"
    })
    // JSON_KEYS: object keys in document order; null on non-objects
    s = rewriteCall(s, "json_keys", args =>
      s"json_object_keys(graft_json_input(${args.mkString(", ")}))")
    s = rewriteCall(s, "json_array_length", args =>
      s"__jal__(graft_json_input(${args.mkString(", ")}))")
    s = s.replace("__jal__(", "json_array_length(")
    // JSON_OBJECT(k1, v1, ...): keep null-valued fields ({"k":null}),
    // as the reference's JSON.stringify does. Literal keys (incl.
    // numeric — JS object keys stringify) go through named_struct;
    // DYNAMIC keys (column references) need map(), since named_struct
    // requires foldable names.
    s = rewriteCall(s, "json_object", args => {
      val lit = args.grouped(2).forall(p => p.headOption.exists(k =>
        k.trim.matches("'[^']*'") || k.trim.matches("[0-9.]+")))
      if (lit) {
        val quoted = args.zipWithIndex.map { case (a, i) =>
          if (i % 2 == 0 && a.trim.matches("[0-9.]+")) s"'${a.trim}'" else a }
        s"to_json(named_struct(${quoted.mkString(", ")}), map('ignoreNullFields', 'false'))"
      } else
        s"to_json(map(${args.grouped(2).map(p =>
          s"graft_js_str(${p.head}), ${p.last}").mkString(", ")}), " +
          "map('ignoreNullFields', 'false'))"
    })
    // JSON_EXTRACT(j, path): get_json_object requires the $ anchor the
    // reference treats as optional — normalize literal paths
    // unanchored-path normalization, shared by the whole JSON access
    // family: the reference accepts 'a' / 'a.b' / '[0]' paths, Spark's
    // get_json_object needs the '$.' anchor (an unanchored path is
    // silently NULL — the registry sweep caught JSON_VALUE/JSON_QUERY
    // passing paths through unanchored via their old plain renames)
    def normJsonPath(p: String): String =
      if (p.startsWith("'") && p.endsWith("'") && !p.startsWith("'$")) {
        val body = p.substring(1, p.length - 1)
        val anchored = if (body.startsWith("[")) s"$$$body" else s"$$.$body"
        s"'$anchored'"
      } else p
    // first-argument TYPE strictness (round-13 replay-corner closure):
    // a statically numeric/boolean input raises at execution like the
    // reference's "must be JSON string or object" row-1 throw; see
    // jsonStrictInput — the guard folds away for every allowed type
    for (f <- Seq("json_extract", "json_value", "json_query", "json_extract_string"))
      s = rewriteCall(s, f, args =>
        if (args.length == 2)
          s"get_json_object(${jsonStrictInput(f, args(0))}, ${normJsonPath(args(1))})"
        else s"${f}_unsupported(${args.mkString(", ")})")

    // OCTET_LENGTH is string-STRICT in the reference (strings.js:49-56:
    // number/date/object inputs throw) — type-dispatch guard, folds
    // away for string inputs (round-13 replay-corner closure). strlen
    // renames to octet_length only at the very end, so it gets the same
    // guard under its own name here.
    s = rewriteCall(s, "octet_length", args =>
      if (args.length == 1) s"__olen__(${octetStrict(args.head)})"
      else s"__olen__(${args.mkString(", ")})")
    s = s.replace("__olen__(", "octet_length(")
    s = rewriteCall(s, "strlen", args =>
      if (args.length == 1) s"__strlen__(${octetStrict(args.head)})"
      else s"__strlen__(${args.mkString(", ")})")
    s = s.replace("__strlen__(", "strlen(")

    // regexp_split_to_table(x, p) → explode(split(x, p))
    s = rewriteCall(s, "regexp_split_to_table", args =>
      s"explode(split(${args.mkString(", ")}))")

    // Comma-form POSITION(string, search): the reference returns
    // str.indexOf(search)+1 (src/expression/strings.js:172-176) — Spark's
    // position(substr, str) takes the arguments REVERSED, so map to
    // instr, whose order matches. The SQL-standard POSITION(x IN y) form
    // has no top-level comma (one "arg") and passes through to Spark,
    // whose IN-form semantics already agree.
    s = rewriteCall(s, "position", args =>
      if (args.length == 2) s"instr(${args(0)}, ${args(1)})"
      else s"__position__(${args.mkString(", ")})")
    s = s.replace("__position__(", "position(")

    // ARRAY_LENGTH(arr[, dim]): Spark has no array_length; graft_size
    // covers the 1-dimensional form, graft_size_dim the reference's
    // dimensional walk (dim ≥ 1 integer, each level rectangular —
    // evaluate.js:577-592; NULL otherwise)
    s = rewriteCall(s, "array_length", args =>
      if (args.length == 1 || (args.length == 2 && args(1).trim == "1"))
        s"graft_size(${args(0)})"
      else if (args.length == 2)
        s"graft_size_dim(${args(0)}, ${args(1)})"
      else s"array_length_bad_arity(${args.mkString(", ")})")

    // LENGTH: characters for a string, element count for an ARRAY —
    // runtime dispatch (strings.js:38-45); Spark's length rejects
    // arrays at analysis. OCTET_LENGTH stays strict (string-only).
    s = rewriteCall(s, "length", args =>
      if (args.length == 1) s"graft_length(${args.head})"
      else s"__len__(${args.mkString(", ")})")
    s = s.replace("__len__(", "length(")

    // ARRAY_POSITION / LIST_POSITION return NULL when absent in the
    // reference (src/expression/evaluate.js:597-601, indexOf+1 with -1
    // → null) and NULL for non-array input — graft_array_position is
    // both in one runtime-dispatch expression
    for (f <- Seq("array_position", "list_position"))
      s = rewriteCall(s, f, args =>
        s"graft_array_position(${args.mkString(", ")})")

    // ROUND is FLOAT-SCALED in the reference: Math.round(x·10^d)/10^d
    // (src/expression/math.js:56-60) — half rounds toward +∞
    // (round(-588.45, 1) = -588.4) and the scaled double's
    // representation decides edge cases (round(2.675, 2) = 2.67, not
    // Spark's decimal-string 2.68). Found by the deep differential fuzz
    // audit (GRAFT_FUZZ_N=2000). ECMA Math.round is NOT floor(y + 0.5):
    // the addition can pick up IEEE rounding error exactly at the half
    // boundary (Math.round(0.49999999999999994) = 0, floor-form 1), so
    // the half-up step compares the exact fraction y - floor(y)
    // instead. |y| ≥ 2^52 is already integral (and floor→LONG would
    // overflow ANSI beyond 2^63) — those pass through untouched, as do
    // NaN (NOT(abs < 2^52) catches it) and ±Infinity. Result is DOUBLE
    // in all branches, the JS number type. A NULL decimals arg is
    // Number(null) = 0 in the reference (multiplier 1), hence coalesce.
    def jsRound(y: String): String =
      s"(CASE WHEN NOT (abs($y) < 4.503599627370496E15D) THEN CAST($y AS DOUBLE) " +
        s"WHEN CAST($y AS DOUBLE) - CAST(floor($y) AS DOUBLE) >= 0.5D " +
        s"THEN CAST(floor($y) AS DOUBLE) + 1.0D " +
        s"ELSE CAST(floor($y) AS DOUBLE) END)"
    s = rewriteCall(s, "round", args =>
      if (args.length == 2) {
        val mult = s"power(10, coalesce(${args(1)}, 0))"
        s"(${jsRound(s"((${args(0)}) * $mult)")} / $mult)"
      } else if (args.length == 1) jsRound(s"(${args(0)})")
      else s"__round__(${args.mkString(", ")})")
    s = s.replace("__round__(", "round(")

    // PERCENTILE_CONT(fraction, expr): reference argument order
    // (src/validation/functions.js PERCENTILE_CONT) with exact linear
    // interpolation — Spark's exact-interpolating spelling is
    // percentile(expr, fraction). APPROX_QUANTILE(expr, fraction) is
    // computed EXACTLY by the reference (same code path,
    // src/expression/evaluate.js:314-350), so it maps to percentile too.
    s = rewriteCall(s, "percentile_cont", args =>
      if (args.length == 2) s"percentile(${args(1)}, ${args(0)})"
      else s"__pcont__(${args.mkString(", ")})")
    s = s.replace("__pcont__(", "percentile_cont(")
    s = rewriteCall(s, "approx_quantile", args =>
      if (args.length == 2) s"percentile(${args(0)}, ${args(1)})"
      else s"__aq__(${args.mkString(", ")})")
    s = s.replace("__aq__(", "approx_quantile(")

    // SUM/AVG fold JS `Number(value)` and keep only FINITE results
    // (src/execute/accumulator.js:60-67): a string column accumulates
    // its numeric-looking cells ('10' → 10, '' → 0) and skips the rest
    // ('abc' → NaN), never an ANSI cast error. graft_js_num applies
    // that coercion for string/boolean children and is identity on
    // numeric ones, where StripIdentityJsNum removes it at optimization
    // time — typed columns keep native codegen'd aggregation.
    for (f <- Seq("sum", "avg")) {
      s = rewriteCall(s, f, args =>
        // SUM(*)/AVG(*) must stay invalid on both engines — wrapping
        // would let Spark's star expansion accept what the reference's
        // validator rejects
        if (args.length == 1 && args.head.trim != "*") {
          val a = args.head.trim
          // the set quantifier stays OUTSIDE the wrap, in every spelling:
          // DISTINCT x, DISTINCT(x), DISTINCT<tab>x, ALL x
          val quant = raw"(?is)^(DISTINCT|ALL)\b\s*(.*)$$".r
          val (pre, core) = a match {
            case quant(q, rest) => (q + " ", rest)
            case _ => ("", a)
          }
          s"__${f}agg__(${pre}graft_js_num($core))"
        } else s"__${f}agg__(${args.mkString(", ")})")
      s = s.replace(s"__${f}agg__(", s"$f(")
    }

    // list_slice(l, a, b) [1-based inclusive ends] → slice(l, a, b - a + 1)
    s = rewriteCall(s, "list_slice", args =>
      if (args.length == 3)
        s"slice(${args(0)}, ${args(1)}, (${args(2)}) - (${args(1)}) + 1)"
      else s"list_slice_unsupported(${args.mkString(", ")})")

    // TYPEOF → DuckDB-style names over Spark typeof (placeholder avoids
    // rescanning our own output; the doubled upper(typeof(..)) is free —
    // typeof is foldable, so Catalyst constant-folds it at analysis time)
    s = rewriteCall(s, "typeof", args => {
      val t = s"upper(__typeof__(${args.mkString(", ")}))"
      s"(CASE $t WHEN 'STRING' THEN 'VARCHAR' WHEN 'INT' THEN 'INTEGER' ELSE $t END)"
    })
    s = s.replace("__typeof__(", "typeof(")
    // typeof emitted by the lenient TIMESTAMP cast above — kept out of
    // the user-facing TYPEOF rename (which maps to DuckDB-style names)
    s = s.replace("__typeofkeep__(", "typeof(")

    // DAYOFWEEK / WEEKDAY: reference maps both to date_part('dow') —
    // Sunday=0 (syntax.md item 13); Spark's dayofweek is Sunday=1
    // (placeholder avoids rescanning our own output)
    for (f <- Seq("dayofweek", "weekday"))
      s = rewriteCall(s, f, args => s"(__dow__(${args.mkString(", ")}) - 1)")
    s = s.replace("__dow__(", "dayofweek(")

    // DATE_PART('dow', x) / EXTRACT(DOW FROM x) themselves: Spark's DOW
    // field is Sunday=1..Saturday=7, the reference's (and DuckDB's) is
    // Sunday=0 (src/expression/date.js:96 getUTCDay) — found by the
    // deep differential fuzz, the same off-by-one the function forms
    // above already fixed
    s = rewriteCall(s, "date_part", args =>
      if (args.length == 2 && args(0).trim.toLowerCase(java.util.Locale.ROOT).matches("'dow'"))
        s"(__dow__(${args(1)}) - 1)"
      else s"__dpart__(${args.mkString(", ")})")
    s = s.replace("__dpart__(", "date_part(")
    s = tokenEdit(s) { v =>
      val t = v.toks
      t.indices.collect {
        case k if v.at(k, "EXTRACT", "(", "DOW", "FROM") =>
          (t(k).start, t(k + 3).end, "__exdow__(")
      }
    }
    s = rewriteCall(s, "__exdow__", args => s"(__dow__(${args.mkString(", ")}) - 1)")
    s = s.replace("__dow__(", "dayofweek(")

    // LIKE is CASE-INSENSITIVE in the reference dialect — its evaluator
    // compiles the pattern with the `i` regex flag (reference:
    // src/expression/binary.js:57-65) — so dialect LIKE maps to Spark
    // ILIKE (NOT LIKE → NOT ILIKE via the same token). Found by the
    // seeded differential fuzz campaign (FuzzSpec), not the curated list.
    s = tokenEdit(s)(_.toks.collect {
      case t if t.is("LIKE") => (t.start, t.end, "ILIKE")
    })

    // x GLOB 'pat' → x RLIKE '^…$' (literal patterns — the dialect form)
    s = tokenEdit(s) { v =>
      v.toks.indices.collect {
        case k if v.at(k, "GLOB", "'") && v.toks(k + 1).up.endsWith("'") =>
          val pat = v.toks(k + 1).up.stripPrefix("'").stripSuffix("'")
          (v.toks(k).start, v.toks(k + 1).end, s"RLIKE '${globToRegex(pat)}'")
      }
    }

    // EXTRACT(EPOCH FROM x) / EXTRACT(SECOND FROM x): Spark has no
    // EPOCH field, and its SECOND carries the fraction as DECIMAL where
    // the reference floors to INTEGER seconds (date.js getUTCSeconds) —
    // `EXTRACT ( <field> FROM` collapses to a marker call over the
    // remaining argument; epoch(x) itself renames at the end
    s = tokenEdit(s) { v =>
      val t = v.toks
      t.indices.collect {
        case k if v.at(k, "EXTRACT", "(") && v.at(k + 3, "FROM") &&
            (t(k + 2).is("EPOCH") || t(k + 2).is("SECOND") || t(k + 2).is("SECONDS")) =>
          val marker = if (t(k + 2).is("EPOCH")) "__exepoch__(" else "__exsec__("
          (t(k).start, t(k + 3).end, marker)
      }
    }
    s = rewriteCall(s, "__exepoch__", args => s"graft_epoch(${args.mkString(", ")})")
    s = rewriteCall(s, "__exsec__", args =>
      s"floor(extract(second from ${args.mkString(", ")}))")

    // CURRENT_TIME: Spark 4 has no TIME type — the reference renders
    // HH:MM:SS.sss text (date.js), which date_format reproduces.
    s = tokenEdit(s) { v =>
      val t = v.toks
      t.indices.collect {
        case k if t(k).is("CURRENT_TIME") =>
          val end = if (v.at(k + 1, "(", ")")) t(k + 2).end else t(k).end
          (t(k).start, end, "date_format(current_timestamp(), 'HH:mm:ss.SSS')")
      }
    }

    // TIMESTAMP 'lit' typed literals: the reference yields NULL for an
    // unparseable timestamp (new Date → Invalid Date → null) where
    // Spark rejects the literal at analysis
    s = tokenEdit(s) { v =>
      val t = v.toks
      t.indices.collect {
        case k if v.at(k, "TIMESTAMP", "'") && t(k + 1).start > t(k).end =>
          (t(k).start, t(k + 1).end, s"try_cast(${t(k + 1).up} AS TIMESTAMP)")
      }
    }

    // date/timestamp arithmetic with INTERVAL coerces its LEFT operand
    // leniently (the reference parses date STRINGS and epoch-millis
    // NUMBERS with new Date(...)): wrap the primary before +/- INTERVAL
    // everything but integral-DAY interval arithmetic runs through the
    // exact JS Date-setter emulation (month-end rollover, summed-
    // component truncation, date-only format preservation); it coerces
    // its own left primary, so it runs BEFORE the generic operand
    // coercion, which then only sees the remaining integral-DAY sites
    s = rewriteJsIntervalArith(s)
    s = rewriteIntervalOperands(s)
    // any fractional interval literal left standing alone truncates
    // toward zero so it at least parses (the reference errors on a
    // standalone interval at EXECUTION, so no semantics ride on it)
    s = rewriteFractionalIntervals(s)

    // unit-form date_diff('day', a, b): reference semantics are calendar
    // diff for YEAR/MONTH and truncated elapsed time for smaller units
    // (reference: src/expression/date.js:110) — not Spark's datediff;
    // only the string-unit form reroutes (first argument a literal)
    s = tokenEdit(s) { v =>
      val t = v.toks
      t.indices.collect {
        case k if (t(k).is("DATE_DIFF") || t(k).is("DATEDIFF")) &&
            v.at(k + 1, "(", "'") =>
          (t(k).start, t(k).end, "graft_datediff")
      }
    }

    // Postgres regexp operators: a ~ p / a !~ p / a NOT REGEXP p
    // (space-separated operator forms, matching the old regexes: the
    // left operand ends in a word/number/literal/close-paren)
    s = tokenEdit(s) { v =>
      val t = v.toks
      def operand(k: Int): Boolean = k > 0 && {
        val p = t(k - 1)
        (p.kind == SqlTok.Word || p.kind == SqlTok.Num ||
          p.kind == SqlTok.Str || p.kind == SqlTok.RPar) && p.end < t(k).start
      }
      t.indices.collect {
        case k if t(k).isOp("!~") && operand(k) &&
            k + 1 < t.length && t(k).end < t(k + 1).start =>
          (t(k).start, t(k).end, "NOT RLIKE")
        case k if t(k).isOp("~") && operand(k) &&
            k + 1 < t.length && t(k + 1).kind == SqlTok.Str &&
            t(k).end < t(k + 1).start =>
          (t(k).start, t(k).end, "RLIKE")
        case k if t(k).is("REGEXP") && k > 0 && t(k - 1).is("NOT") =>
          (t(k).start, t(k).end, "RLIKE")
      }
    }

    // regexp_replace(..., 'g'): Spark replaces globally by default
    s = rewriteCall(s, "regexp_replace", args =>
      s"__rgflag__(${(if (args.nonEmpty &&
        args.last.equalsIgnoreCase("'g'")) args.init else args).mkString(", ")})")
    s = s.replace("__rgflag__(", "regexp_replace(")

    // DuckDB SELECT * EXCLUDE (...) → Spark SELECT * EXCEPT (...)
    s = tokenEdit(s) { v =>
      val t = v.toks
      t.indices.collect {
        case k if t(k).is("EXCLUDE") && k > 0 && t(k - 1).isOp("*") &&
            v.at(k + 1, "(") =>
          (t(k).start, t(k).end, "EXCEPT")
      }
    }

    // Statically-visible invalid arguments throw at EXECUTION like the
    // reference (regexp.js:29-47,115-130 position/occurrence guards;
    // strings.js:122,137 LEFT/RIGHT length): a LITERAL that violates
    // the guard rewrites to raise_error, so both engines reject the
    // query at run time (and both accept it over an empty table —
    // raise_error is per-row, like the reference's row-0 throw).
    // Non-literal args stay on the lenient path: per-row validation of
    // DATA columns is exactly what a 100 TB scan must not do.
    locally {
      def intLit(a: String): Option[Long] = {
        val t = a.trim
        if (t.matches("[+-]?\\d+")) Some(t.toLong) else None
      }
      def bad(f: String, what: String, got: String): String =
        s"raise_error('$f: $what, got ${got.trim.replace("'", "")}')"
      for (f <- Seq("left", "right"))
        s = rewriteCall(s, f, args =>
          if (args.length == 2 && intLit(args(1)).exists(_ < 0))
            bad(f.toUpperCase(java.util.Locale.ROOT), "length must be a non-negative integer", args(1))
          else s"__argchk_${f}__(${args.mkString(", ")})")
      for (f <- Seq("regexp_extract", "regexp_substr"))
        s = rewriteCall(s, f, args =>
          if (args.length >= 3 && intLit(args(2)).exists(_ < 1))
            bad(f.toUpperCase(java.util.Locale.ROOT), "position must be a positive integer", args(2))
          else if (args.length == 4 && intLit(args(3)).exists(_ < 1))
            bad(f.toUpperCase(java.util.Locale.ROOT), "occurrence must be a positive integer", args(3))
          else s"__argchk_${f}__(${args.mkString(", ")})")
      s = rewriteCall(s, "regexp_replace", args =>
        if (args.length >= 4 && intLit(args(3)).exists(_ < 1))
          bad("REGEXP_REPLACE", "position must be a positive integer", args(3))
        else if (args.length == 5 && intLit(args(4)).exists(_ < 0))
          bad("REGEXP_REPLACE", "occurrence must be a non-negative integer", args(4))
        else s"__argchk_regexp_replace__(${args.mkString(", ")})")
      // SUBSTRING start/length guards (strings.js:118-127: start must be
      // a positive 1-based integer, length non-negative) — round-13
      // replay-corner closure, same literal-only contract as the rest
      for (f <- Seq("substring", "substr"))
        s = rewriteCall(s, f, args =>
          if (args.length >= 2 && intLit(args(1)).exists(_ < 1))
            bad(f.toUpperCase(java.util.Locale.ROOT), "start position must be a positive integer", args(1))
          else if (args.length == 3 && intLit(args(2)).exists(_ < 0))
            bad(f.toUpperCase(java.util.Locale.ROOT), "length must be a non-negative integer", args(2))
          else s"__argchk_${f}__(${args.mkString(", ")})")
      for (f <- Seq("left", "right", "regexp_extract", "regexp_substr",
          "regexp_replace", "substring", "substr"))
        s = s.replace(s"__argchk_${f}__(", f + "(")
    }


    // REGEXP_EXTRACT / REGEXP_SUBSTR are the SAME function in the
    // reference (src/expression/regexp.js:18): whole match, NULL when
    // nothing matches, optional 3rd arg = 1-based search POSITION and
    // 4th = occurrence. Spark's regexp_extract instead reads the 3rd
    // arg as a capture-GROUP index and returns '' on no match — so:
    // 2-arg maps to Spark regexp_substr (whole match, NULL on miss);
    // positional/occurrence forms go through regexp_extract_all over
    // the position-suffix with try_element_at (NULL, never an ANSI
    // out-of-bounds error). Found via reference-source reading during
    // the regexp fuzz battery.
    for (f <- Seq("regexp_extract", "regexp_substr"))
      s = rewriteCall(s, f, args =>
        if (args.length == 2) s"__rsub__(${args(0)}, ${args(1)})"
        else if (args.length == 3)
          s"try_element_at(regexp_extract_all(substring(${args(0)}, CAST(${args(2)} AS INT)), ${args(1)}, 0), 1)"
        else if (args.length == 4)
          s"try_element_at(regexp_extract_all(substring(${args(0)}, CAST(${args(2)} AS INT)), ${args(1)}, 0), CAST(${args(3)} AS INT))"
        else s"__rext_bad__(${args.mkString(", ")})")
    s = s.replace("__rsub__(", "regexp_substr(")
    s = s.replace("__rext_bad__(", "regexp_extract(")

    // REGEXP_REPLACE: both engines replace ALL by default and share the
    // prefix-preserving 4-arg position form; the reference's 5-arg form
    // replaces only the OCCURRENCE-th match (regexp.js:126-166) — no
    // Spark built-in, so a helper UDF carries it.
    s = rewriteCall(s, "regexp_replace", args =>
      if (args.length == 5)
        s"graft_regexp_replace_occ(${args(0)}, ${args(1)}, ${args(2)}, " +
          s"CAST(${args(3)} AS INT), CAST(${args(4)} AS INT))"
      else s"__rrep__(${args.mkString(", ")})")
    s = s.replace("__rrep__(", "regexp_replace(")

    // regexp_matches(x, p) → x RLIKE p — paren-aware (the old regex
    // form mangled nested calls like regexp_matches(try_element_at(...))
    // — found by the regexp fuzz battery)
    s = rewriteCall(s, "regexp_matches", args =>
      if (args.length == 2) s"((${args(0)}) RLIKE ${args(1)})"
      else s"__rmatch__(${args.mkString(", ")})")
    s = s.replace("__rmatch__(", "regexp_matches(")

    // STRING_SPLIT's delimiter is a LITERAL in the reference (and in
    // DuckDB) — indexOf, not a pattern (src/expression/strings.js:165);
    // Spark's split() takes a REGEX, so 'x.y' would split on every char
    // and ' )' would throw a pattern error. Literal delimiters escape
    // textually; computed ones go through \Q...\E quoting.
    // An EMPTY delimiter returns the WHOLE string as one element
    // (strings.js:168 `delim === '' ? [str] : str.split(delim)`) where
    // Spark's split('') explodes per character.
    for (f <- Seq("string_split", "str_split"))
      s = rewriteCall(s, f, args =>
        if (args.length == 2) {
          val d = args(1).trim
          if (d == "''") s"array(graft_js_str(${args(0)}))"
          else if (d.startsWith("'") && d.endsWith("'") && d.length >= 2) {
            // Pattern.quote emits \Q...\E; the SQL literal needs its
            // backslashes doubled (Spark's parser consumes one level)
            val quoted = java.util.regex.Pattern.quote(
                d.substring(1, d.length - 1))
              .replace("\\", "\\\\").replace("'", "''")
            s"split(${args(0)}, '$quoted')"
          } else s"(CASE WHEN (${args(1)}) = '' THEN array(graft_js_str(${args(0)})) " +
            s"ELSE split(${args(0)}, concat('\\\\Q', ${args(1)}, '\\\\E')) END)"
        } else s"split(${args.mkString(", ")})")

    // SPLIT_PART with an empty literal delimiter: one part — index 1
    // (or -1 from the end) answers the whole string, others '' (the
    // reference's parts[idx] ?? '', strings.js:146-162)
    s = rewriteCall(s, "split_part", args =>
      if (args.length == 3 && args(1).trim == "''")
        s"(CASE WHEN CAST(${args(2)} AS INT) IN (1, -1) " +
          s"THEN graft_js_str(${args(0)}) ELSE '' END)"
      else s"__spart__(${args.mkString(", ")})")
    s = s.replace("__spart__(", "split_part(")

    // TRIM is JS String.prototype.trim (strings.js:103): Unicode
    // whitespace including \t \n NBSP FEFF — Spark's trim strips only
    // ' '. The BOTH/LEADING/TRAILING ... FROM form passes through
    // (Spark semantics, no reference analog).
    s = rewriteCall(s, "trim", args =>
      if (args.length == 1 && raw"(?i)\bFROM\b".r.findFirstIn(args.head).isEmpty)
        s"graft_js_trim(graft_js_str(${args.head}))"
      else s"__trim__(${args.mkString(", ")})")
    s = s.replace("__trim__(", "trim(")

    // GREATEST/LEAST accept a single argument in the reference
    // (evaluate.js:434 — reduces over whatever it gets); Spark requires
    // two. ATAN(y, x) is two-argument arctangent (math.js) — Spark's
    // atan is unary, atan2 is the two-arg spelling.
    for (f <- Seq("greatest", "least"))
      s = rewriteCall(s, f, args =>
        if (args.length == 1) s"(${args.head})"
        else s"__1arg_${f}__(${args.mkString(", ")})")
    s = s.replace("__1arg_greatest__(", "greatest(")
    s = s.replace("__1arg_least__(", "least(")
    s = rewriteCall(s, "atan", args =>
      if (args.length == 2) s"atan2(${args.mkString(", ")})"
      else s"__atan__(${args.mkString(", ")})")
    s = s.replace("__atan__(", "atan(")

    // Every string function coerces its text arguments with JS
    // String(v) (strings.js:66 `const str = String(val)`, :112
    // REPLACE's search/replace args, :158-176 SPLIT_PART/STRING_SPLIT/
    // INSTR): UPPER(2.0*3) is '6' and INSTR(1.0/2, '.') probes '0.5' —
    // where Spark's implicit cast renders '6.0'/'1.0' and diverges on
    // every whole-valued double. Wrap the string-ish args in
    // graft_js_str (a no-op on strings, null-propagating). LENGTH and
    // OCTET_LENGTH are STRICT in the reference (they error on
    // non-strings, strings.js:38-56) — deliberately not wrapped.
    // Placed AFTER the rewrites that generate these names (position →
    // instr, string_split → split); strpos is wrapped here pre-rename
    // (renames run last). Markers dodge rewriteCall's rescan.
    locally {
      val wraps: Seq[(String, Seq[String] => Seq[Int])] = Seq(
        "upper" -> (a => if (a.length == 1) Seq(0) else Nil),
        "lower" -> (a => if (a.length == 1) Seq(0) else Nil),
        // trim is handled by its own rewrite above (JS whitespace set)
        "substring" -> (a =>
          if (a.length >= 2) Seq(0)
          else Nil), // FROM..FOR form has no top-level comma — pass through
        "substr" -> (a => if (a.length >= 2) Seq(0) else Nil),
        "replace" -> (a => if (a.length == 3) Seq(0, 1, 2) else Nil),
        "left" -> (a => if (a.length == 2) Seq(0) else Nil),
        "right" -> (a => if (a.length == 2) Seq(0) else Nil),
        "split_part" -> (a => if (a.length == 3) Seq(0, 1) else Nil),
        "split" -> (a => if (a.length == 2) Seq(0) else Nil),
        "instr" -> (a => if (a.length == 2) Seq(0, 1) else Nil),
        "strpos" -> (a => if (a.length == 2) Seq(0, 1) else Nil))
      for ((f, pick) <- wraps) {
        s = rewriteCall(s, f, args => {
          val idx = pick(args).toSet
          val out = args.zipWithIndex.map { case (a, i) =>
            if (idx(i)) s"graft_js_str($a)" else a }
          s"__jsw_${f}__(${out.mkString(", ")})"
        })
        s = s.replace(s"__jsw_${f}__(", f + "(")
      }
    }

    // `a || b` and ILIKE operands coerce the same way (binary.js:27-30
    // `String(a) + String(b)`, :57 LIKE's `String(a)`/`String(b)`):
    // 'x' || 2.0 is 'x2' and 2.0 LIKE '2' is TRUE in the reference.
    s = rewriteJsConcatOps(s)

    // UNNEST(NULL) / EXPLODE(NULL) produce ZERO rows in the reference
    // (nothing to expand); Spark's explode(NULL) is an untyped analysis
    // error — an empty array has the same zero-row semantics
    for (f <- Seq("unnest", "explode"))
      s = rewriteCall(s, f, args =>
        if (args.length == 1 && args.head.trim.equalsIgnoreCase("null"))
          "__unn__(array())"
        else s"__unn__(${args.mkString(", ")})")
    s = s.replace("__unn__(", "explode(")

    // LEAD/LAG offsets run through JS Number(v) in the reference: a
    // QUOTED numeric offset works like the bare number ('' is 0), a
    // non-numeric one is NaN — which indexes outside the partition, so
    // EVERY row reads the default (null when absent; node-probed).
    // Spark requires an integer literal: integral text unquotes,
    // NaN-text becomes a 1e8 offset (outside any real window partition;
    // kept far from INT_MAX so rowIndex+offset cannot overflow).
    // Fractional offsets crash the reference and fail Spark's analysis
    // alike — left alone, agreement on rejection. Seed-131337
    // mutation-fuzz find.
    for (f <- Seq("lead", "lag")) {
      val quotedLit = raw"^'([^']*)'$$".r
      s = rewriteCall(s, f, args => {
        val fixed =
          if (args.length < 2) args
          else args(1).trim match {
            case quotedLit(body) =>
              val b = body.trim
              val off =
                if (b.isEmpty) Some("0")
                else if (b.matches(raw"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?")) {
                  val v = b.toDouble
                  if (v == v.toLong.toDouble) Some(v.toLong.toString) else None
                } else Some("100000000")
              off.map(o => args.updated(1, o)).getOrElse(args)
            case _ => args
          }
        s"__woff_${f}__(${fixed.mkString(", ")})"
      })
      s = s.replace(s"__woff_${f}__(", f + "(")
    }

    // Ranking/offset window functions REQUIRE an ORDER BY in Spark; the
    // reference defaults to the partition's INPUT order (execute.window
    // tests: ROW_NUMBER() OVER () numbers rows as scanned). Inject a
    // monotonic order — input order made explicit. Aggregate windows
    // are NOT touched (an injected ORDER BY would shrink their default
    // frame to running-total semantics).
    locally {
      val needOrder = Set("ROW_NUMBER", "RANK", "DENSE_RANK", "NTILE",
        "LAG", "LEAD", "PERCENT_RANK", "CUME_DIST")
      s = tokenEdit(s) { v =>
        val t = v.toks
        val edits = Seq.newBuilder[(Int, Int, String)]
        var k = 0
        while (k + 1 < t.length) {
          if (t(k).kind == SqlTok.Word && needOrder(t(k).up) &&
              t(k + 1).kind == SqlTok.LPar && v.brk(k + 1) >= 0) {
            val ac = v.brk(k + 1) // args close
            if (ac + 2 < t.length && t(ac + 1).is("OVER") &&
                t(ac + 2).kind == SqlTok.LPar && v.brk(ac + 2) >= 0) {
              val sc = v.brk(ac + 2) // spec close
              val hasOrder = (ac + 3 until sc).exists(i =>
                t(i).is("ORDER") && i + 1 < sc && t(i + 1).is("BY"))
              if (!hasOrder) {
                val ins = (if (sc == ac + 3) "" else " ") +
                  "ORDER BY monotonically_increasing_id()"
                edits += ((t(sc).start, t(sc).start, ins))
              }
            }
          }
          k += 1
        }
        edits.result()
      }
    }

    // Reference null ordering: nulls sort FIRST regardless of direction
    // unless NULLS LAST is explicit (execute/utils.js:19-23 — the null
    // branch returns BEFORE the DESC flip). Spark's bare-DESC default is
    // NULLS LAST, so every bare DESC gets the explicit modifier. (Bare
    // ASC already agrees: both default nulls-first ascending.)
    // ...token-scoped to ORDER BY tails (incl. window-spec ORDER BY):
    // the old global \bDESC\b regex also fired on DESC used as an
    // IDENTIFIER (`SELECT desc …` — the reference reads bare keywords
    // as columns), corrupting the statement (seed-135555 mutation find)
    s = rewriteBareDesc(s)

    // function renames, ONE token pass: a Word followed by `(` whose
    // name is in the map renames in place (no rename target is itself
    // a key, so sequential per-name rescans buy nothing)
    tokenEdit(s) { v =>
      val t = v.toks
      t.indices.collect {
        case k if t(k).kind == SqlTok.Word && k + 1 < t.length &&
            t(k + 1).kind == SqlTok.LPar &&
            renameMap.contains(t(k).up) =>
          (t(k).start, t(k).end, renameMap(t(k).up))
      }
    }
  }

  private val renameMap: Map[String, String] =
    renames.map { case (k, v) => k.toUpperCase(java.util.Locale.ROOT) -> v }.toMap

  /** Run a squirreling-dialect query. Tables must already be registered
    * (e.g. via `graft.sources.Tables.registerAll`).
    */
  /** Constructs Spark parses but silently misreads, where the reference
    * raises a parse error (reference: test/parse/parse.errors.test.js).
    * Spark's non-reserved keywords absorb them as aliases:
    *   - `SELECT * FROM users WHERE` → `users AS WHERE` (the user's
    *     dangling clause vanishes);
    *   - `SELECT name AS FROM users` → a column literally named `AS`;
    *   - duplicate CTE names resolve to the LAST definition, silently.
    * Each would return an answer to a question the user didn't ask, so
    * the host-facing surfaces reject them up front.
    */
  private val clauseKw = Set("WHERE", "LIMIT", "OFFSET", "ORDER", "GROUP",
    "HAVING", "BY", "ON", "AND", "OR", "AS", "FROM", "SELECT", "UNION",
    "INTERSECT", "EXCEPT", "JOIN", "IN", "NOT", "DISTINCT", "WHEN",
    "THEN", "ELSE", "BETWEEN", "LIKE")

  private val aliasBanKw = Set("FROM", "WHERE", "GROUP", "ORDER", "LIMIT",
    "OFFSET", "HAVING", "JOIN", "ON", "UNION", "INTERSECT", "EXCEPT", "SELECT")

  private def strictLint(spark: SparkSession, sqlTextIn: String): Option[String] = {
    // comments can end a statement and double-quoted identifiers can
    // contain keyword-shaped text (`SELECT x AS "AS FROM"` is a legal
    // quoted alias); the token stream classifies both, so the checks
    // read Word tokens directly — no masking pass needed
    val unmasked = stripComments(sqlTextIn).stripTrailing()
    val v = new SqlTok.View(unmasked)
    val t = v.toks
    val lastWord = t.reverseIterator.dropWhile(_.kind == SqlTok.Semi)
      .nextOption().filter(x => x.kind == SqlTok.Word && clauseKw(x.up))
    lastWord
      .map(w => s"query ends in a dangling ${w.up} clause")
      .orElse(t.indices.collectFirst {
        case k if t(k).is("AS") && k + 1 < t.length &&
            t(k + 1).kind == SqlTok.Word && aliasBanKw(t(k + 1).up) =>
          s"alias cannot be the clause keyword ${t(k + 1).up}"
      })
      .orElse {
        // duplicate CTE names (case-insensitive) within one WITH list:
        // Spark would silently resolve to the last definition
        import org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith
        try {
          val plan = spark.sessionState.sqlParser.parsePlan(rewrite(unmasked))
          plan.collectFirst {
            case w: UnresolvedWith
                if w.cteRelations.map(_._1.toLowerCase(java.util.Locale.ROOT)).distinct.size < w.cteRelations.size =>
              val dup = w.cteRelations.map(_._1.toLowerCase(java.util.Locale.ROOT))
                .groupBy(identity).collectFirst { case (n, vs) if vs.size > 1 => n }.get
              s"duplicate CTE name: $dup"
          }
        } catch { case scala.util.control.NonFatal(_) => None } // parse errors surface later
      }
  }

  def sql(spark: SparkSession, sqlText: String): DataFrame = {
    ensureHelpers(spark)
    strictLint(spark, sqlText).foreach(msg =>
      throw new IllegalArgumentException(s"invalid query: $msg"))
    val df = spark.sql(rewriteChecked(spark, sqlText))
    // the dialect's only BinaryType values are geometries (the reference
    // has no binary type) — render them as GeoJSON text, the reference's
    // client-visible geometry shape, never the internal codec bytes
    if (df.schema.exists(_.dataType == org.apache.spark.sql.types.BinaryType)) {
      val cols = df.schema.fields.toIndexedSeq.map { f =>
        val c = org.apache.spark.sql.functions.col(s"`${f.name}`")
        if (f.dataType == org.apache.spark.sql.types.BinaryType)
          org.apache.spark.sql.functions
            .call_function("st_asgeojson", c).as(f.name)
        else c
      }
      df.select(cols: _*)
    } else df
  }

  /** [[sql]] with the reference's TWO-VALUED null comparison logic
    * (binary.js:32-35: comparisons/AND/OR with a null operand are
    * FALSE, `NOT null` is true, IN never matches null) applied to the
    * analyzed plan via [[StrictJsNulls]]. Opt-in per query: the
    * engine-wide default stays three-valued SQL because that keeps
    * predicates translatable to parquet PushedFilters — this mode
    * trades scan pushdown on the wrapped predicates for exact
    * reference rows, for the queries where that matters.
    */
  def sqlStrictNulls(spark: SparkSession, sqlText: String): DataFrame = {
    val df = sql(spark, sqlText)
    org.apache.spark.sql.GraftPlanBridge.ofRows(
      spark, StrictJsNulls(df.queryExecution.analyzed))
  }

  /** Validate a query without executing it — the reference's
    * parse/validation error surface (reference: src/validation/
    * parseErrors.js + functions.js signature checks), which hosts run on
    * user SQL before committing to execution. Parse + analyze only (no
    * jobs): unknown tables/columns, arity and type errors all surface
    * here as `Left(message)`.
    */
  def validate(spark: SparkSession, sqlText: String): Either[String, Unit] =
    try {
      ensureHelpers(spark)
      strictLint(spark, sqlText) match {
        case Some(msg) => return Left(msg)
        case None => ()
      }
      spark.sql(rewriteChecked(spark, sqlText)).queryExecution.analyzed
      Right(())
    } catch {
      // ParseException extends AnalysisException, so one case covers
      // both syntax and semantic errors
      case e: org.apache.spark.sql.AnalysisException => Left(e.getMessage)
      // the pre-parse dialect rewrites are regex surgery over untrusted
      // SQL text — any failure there is a validation failure, never a
      // crash of the host-facing surface
      case scala.util.control.NonFatal(e) =>
        Left(s"invalid query: ${e.getMessage}")
    }

  /** Static upper bound on the result's row count, when one is derivable
    * from the query alone — the reference's `maxRows` surface (its host
    * UI sizes result pagination with it; reference:
    * test/execute/numRows.test.js). Catalyst derives it through LIMIT,
    * VALUES, single-row aggregates, joins and unions of bounded inputs;
    * an unbounded scan yields None. Analysis only — nothing executes.
    */
  def maxRows(spark: SparkSession, sqlText: String): Option[Long] = {
    ensureHelpers(spark)
    spark.sql(rewriteChecked(spark, sqlText)).queryExecution.analyzed.maxRows
  }

  /** The optimized logical plan as text — the reference's `planSql`
    * surface (hosts introspect the plan BEFORE executing: is the filter
    * pushed down, did the LIMIT fold into the sort, how many sources).
    * Catalyst's optimized plan is the honest analog of the reference's
    * post-pushdown logical nodes (reference: src/plan/plan.js). Parse +
    * analyze + optimize only — no jobs run.
    */
  def plan(spark: SparkSession, sqlText: String): String = {
    ensureHelpers(spark)
    spark.sql(rewriteChecked(spark, sqlText)).queryExecution.optimizedPlan.treeString.trim
  }

  /** The physical tables a query reads, first-seen order, CTE names
    * excluded scope-aware (a WITH inside a subquery doesn't shadow the
    * outer scope, and sibling CTEs can reference earlier ones) — the
    * host-tooling surface the reference exposes as `extractTables`
    * (reference: src/parse/extractTables.js) so a host knows which
    * sources to wire before executing. Built on Spark's parser: walk the
    * unresolved plan, children before expression subqueries (FROM tables
    * report before SELECT-list subquery tables).
    */
  def tables(spark: SparkSession, sqlText: String): Seq[String] = {
    ensureHelpers(spark) // "..." must read as an identifier here too
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnresolvedWith}
    val out = scala.collection.mutable.LinkedHashSet[String]()
    def walk(plan: LogicalPlan, scope: Set[String]): Unit = plan match {
      case w: UnresolvedWith =>
        var s = scope
        w.cteRelations.foreach { case (name, body, _) =>
          walk(body, s)
          s = s + name.toLowerCase(java.util.Locale.ROOT)
        }
        walk(w.child, s)
      case r: UnresolvedRelation =>
        val parts = r.multipartIdentifier
        if (!(parts.length == 1 && scope.contains(parts.head.toLowerCase(java.util.Locale.ROOT))))
          out += parts.mkString(".")
      case other =>
        other.children.foreach(walk(_, scope))
        other.expressions.foreach(_.foreach {
          case sq: SubqueryExpression => walk(sq.plan, scope)
          case _ => ()
        })
    }
    walk(spark.sessionState.sqlParser.parsePlan(rewrite(sqlText)), Set.empty)
    out.toSeq
  }

  /** Deterministic default column name for a derived expression — the
    * reference's `derivedAlias` (reference: src/expression/alias.js:11),
    * which its hosts rely on when round-tripping unnamed projection
    * columns (`a + b` → `a_+_b`, `COUNT(*)` → `count_all`,
    * `CAST(x AS INT)` → `x_as_int`, `sum(a)` → `sum_a`). Implemented
    * over Spark's PARSED expression tree, not text surgery, so nesting
    * and whitespace normalize exactly like the reference's AST walk.
    */
  def derivedAlias(exprText: String): String = {
    import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
    // derive from the RAW expression when it parses — the name contract
    // mirrors the reference's surface text (alias.js), and semantic
    // rewrites (lenient casts → coalesce chains) must not leak into it;
    // dialect-only syntax falls back to the rewritten form
    val parsed =
      try CatalystSqlParser.parseExpression(exprText)
      catch { case scala.util.control.NonFatal(_) =>
        CatalystSqlParser.parseExpression(rewrite(exprText)) }
    deriveName(parsed)
  }

  private def deriveName(e: org.apache.spark.sql.catalyst.expressions.Expression): String = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedExtractValue, UnresolvedFunction, UnresolvedStar}
    import org.apache.spark.sql.catalyst.expressions._
    e match {
      case a: UnresolvedAttribute => a.nameParts.last
      case l @ Literal(_, dt)
          if dt.isInstanceOf[org.apache.spark.sql.types.DayTimeIntervalType] ||
            dt.isInstanceOf[org.apache.spark.sql.types.YearMonthIntervalType] ||
            dt == org.apache.spark.sql.types.CalendarIntervalType =>
        // INTERVAL '3' DAY → interval_3_day, via the literal's SQL form
        val s = l.sql.replaceAll("(?i)^INTERVAL\\s+", "").replace("'", "")
        "interval_" + s.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+").mkString("_")
      case Literal(null, _) => "null"
      case Literal(v, _) => v.toString
      case c: Cast =>
        deriveName(c.child) + "_as_" + c.dataType.sql.toLowerCase(java.util.Locale.ROOT)
      case UnaryMinus(c, _) => "-_" + deriveName(c)
      case UnaryPositive(c) => "+_" + deriveName(c)
      case Not(c) => "not_" + deriveName(c)
      case w: WindowExpression => w.windowFunction match {
        // reference window rule: the function NAME alone, no args
        case f: UnresolvedFunction => f.nameParts.last.toLowerCase(java.util.Locale.ROOT)
        case other => deriveName(other)
      }
      case f: UnresolvedFunction =>
        val name = f.nameParts.last.toLowerCase(java.util.Locale.ROOT)
        // Spark's parser rewrites COUNT(*) to count(1) before any rule
        // can see the star — both spell the reference's count_all
        val starLike = f.arguments.length == 1 &&
          (f.arguments.head.isInstanceOf[UnresolvedStar] ||
            (name == "count" && f.arguments.head == Literal(1)))
        if (starLike) name + "_all"
        else (name +: f.arguments.map(deriveName)).mkString("_")
      case UnresolvedExtractValue(_, Literal(fld, org.apache.spark.sql.types.StringType)) =>
        fld.toString // struct field access aliases to the field name
      case ex: UnresolvedExtractValue =>
        s"${deriveName(ex.child)}[${deriveName(ex.extraction)}]"
      case b: BinaryOperator => // sqlOperator: AND/OR spell out, = stays =
        deriveName(b.left) + "_" + b.sqlOperator.toLowerCase(java.util.Locale.ROOT) + "_" + deriveName(b.right)
      case c: Concat =>
        // `a || b` parses straight to Concat (not a BinaryOperator);
        // the reference names it through the operator spelling:
        // a_||_b (seed-134777 find — the CONCAT(...) function spelling
        // still reaches the UnresolvedFunction case above)
        c.children.map(deriveName).mkString("_||_")
      case _ => "expr"
    }
  }

  /** Execute reference-dialect SQL with the reference's derived names
    * applied to UNALIASED projection items (Spark's own derivation names
    * them differently — `(a + b)` vs the reference's `a_+_b`). Aliased
    * items and bare columns keep their names; a star keeps Spark's
    * expansion. Positions are matched through the analyzed schema, so
    * one star anywhere in the list is supported.
    */
  def sqlDerived(spark: SparkSession, sqlText: String): DataFrame = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAlias, UnresolvedAttribute, UnresolvedStar}
    import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression}
    import org.apache.spark.sql.catalyst.plans.logical._
    val df = sql(spark, sqlText)
    // outermost projection list of the PARSED plan (pre-analysis keeps
    // UnresolvedAlias wrappers that mark "no alias written")
    def outerList(p: LogicalPlan): Option[Seq[NamedExpression]] = p match {
      case Project(list, _) => Some(list)
      case a: Aggregate => Some(a.aggregateExpressions)
      case u: UnaryNode => outerList(u.child)
      case _ => None
    }
    // derive names from the RAW text when it parses — the name contract
    // mirrors the reference's surface (alias.js over the user's own
    // expression), and semantic rewrites (graft_js_str wraps, lenient
    // casts) must not leak into derived names (upper_city, never
    // upper_graft_js_str_city); dialect-only syntax falls back to the
    // rewritten form
    val parsed =
      try spark.sessionState.sqlParser.parsePlan(sqlText)
      catch { case scala.util.control.NonFatal(_) =>
        spark.sessionState.sqlParser.parsePlan(rewrite(sqlText)) }
    outerList(parsed) match {
      case Some(list) if list.count(_.isInstanceOf[UnresolvedStar]) <= 1 =>
        val width = df.schema.length
        val starWidth = width - (list.length - list.count(_.isInstanceOf[UnresolvedStar]))
        // an UNALIASED bare reference to an EARLIER select alias derives
        // its name from that alias's EXPRESSION — the reference resolves
        // select-list names laterally before derivedAlias runs
        // (node-probed: `SELECT (k+10) k, k` names the second column
        // `k_+_10`, value k+10; seed-134777 mutation find). First
        // definition wins, matching the expansion pass's dup rule.
        val earlierAlias = scala.collection.mutable.Map[
          String, org.apache.spark.sql.catalyst.expressions.Expression]()
        def lateralName(a: UnresolvedAttribute): Option[String] =
          if (a.nameParts.length == 1)
            earlierAlias.get(a.nameParts.head.toLowerCase(java.util.Locale.ROOT)).map(deriveName)
          else None
        val names = list.flatMap {
          case _: UnresolvedStar => df.columns.slice(
            list.takeWhile(!_.isInstanceOf[UnresolvedStar]).length,
            list.takeWhile(!_.isInstanceOf[UnresolvedStar]).length + starWidth).toSeq
          case a: Alias =>
            earlierAlias.getOrElseUpdate(a.name.toLowerCase(java.util.Locale.ROOT), a.child)
            Seq(a.name)
          case a: UnresolvedAttribute => Seq(lateralName(a).getOrElse(a.nameParts.last))
          case UnresolvedAlias(child: UnresolvedAttribute, _)
              if lateralName(child).isDefined => Seq(lateralName(child).get)
          case UnresolvedAlias(child, _) => Seq(deriveName(child))
          case other => Seq(deriveName(other))
        }
        if (names.length == width) df.toDF(names: _*) else df
      case _ => df
    }
  }

  /** SQL-callable helpers the rewrites target. Every rewrite-emitted
    * graft_* function on a potential scan/filter path is a NATIVE
    * Catalyst expression registered via [[GraftExtensions]] (JsInterval,
    * JsTrim, Strftime, DateDiffUnit, JsStr/JsNum, the array/size
    * dispatch family). The remaining THREE udf.register sites below are
    * cold, host-facing helpers, each with a written justification — a
    * new rewrite target must either be a native expression or carry the
    * same note.
    */
  // ObjectMapper is thread-safe for readTree once configured — one
  // static instance; constructing a mapper is the expensive part of the
  // graft_json_valid kernel and must not happen per row
  private lazy val strictMapper: com.fasterxml.jackson.databind.ObjectMapper = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    om.enable(com.fasterxml.jackson.databind.DeserializationFeature.FAIL_ON_TRAILING_TOKENS)
    om
  }

  def ensureHelpers(spark: SparkSession): Unit = {
    // the reference dialect (like DuckDB/Postgres) reads "..." as an
    // IDENTIFIER — required for columns with dots in their names
    // (reference: test/execute/execute.dot.test.js). Spark's default
    // reads it as a string literal, which would silently select the
    // literal text instead of the column; ANSI mode is on by default in
    // Spark 4 so this conf flips the parse.
    spark.conf.set("spark.sql.ansi.doubleQuotedIdentifiers", "true")
    if (!spark.catalog.functionExists("graft_epoch")) {
      // UDF justification: epoch(ts) surfaces in projections, not in
      // pushable predicates (a filter on epoch(ts) > c is equivalent to
      // a direct ts comparison only after the host rewrites it, which
      // the reference does not do either — its planner has no pushdown
      // over epoch). The kernel is two arithmetic ops on a boxed
      // timestamp; interpreted cost is noise next to the row's
      // deserialization, and millisecond flooring (getTime) is the
      // reference's exact precision.
      spark.udf.register("graft_epoch",
        (ts: java.sql.Timestamp) => if (ts == null) null else {
          java.lang.Double.valueOf(ts.getTime / 1000.0)
        })
    }
    // graft_js_interval / graft_js_trim / graft_strftime /
    // graft_datediff are NATIVE codegen'd expressions
    // (functions/time/JsInterval.scala, functions/text/JsTrim.scala,
    // functions/time/TimeFmt.scala, registered via GraftExtensions) —
    // formerly ScalaUDFs here. Each participates in whole-stage codegen
    // (static kernel) and constant-folds on literal operands.
    if (!spark.catalog.functionExists("graft_json_valid")) {
      // UDF justification: host-facing strict JSON.parse check
      // (FAIL_ON_TRAILING_TOKENS) — the dialect surface routes
      // JSON_VALID through graft_json_valid_any (a typed dispatch in
      // RefDispatch), so this Jackson-backed spelling only serves
      // direct host calls; never emitted into scan predicates.
      spark.udf.register("graft_json_valid",
        (s: String) => if (s == null) null else {
          try { strictMapper.readTree(s); java.lang.Boolean.TRUE }
          catch { case _: Exception => java.lang.Boolean.FALSE }
        })
    }
    if (!spark.catalog.functionExists("graft_regexp_replace_occ")) {
      // UDF justification: only the 5-argument occurrence form of
      // REGEXP_REPLACE lands here (2-4 arg forms stay on Spark's
      // codegen'd builtin); it allocates a Matcher + StringBuffer per
      // row in ANY implementation, so a native Expression would save
      // only the invoke overhead, a rounding error against the regex
      // engine cost. Never part of a pushable predicate (it produces a
      // string, and parquet cannot evaluate regex replaces anyway).
      // reference regexp.js:126-166: position preserves the prefix,
      // occurrence 0 = replace all, occurrence n = only the nth match
      spark.udf.register("graft_regexp_replace_occ",
        (s: String, p: String, r: String, pos: Int, occ: Int) =>
          if (s == null || p == null || r == null) null
          else {
            val cut = math.min(math.max(pos, 1) - 1, s.length)
            val prefix = s.substring(0, cut)
            val m = java.util.regex.Pattern.compile(p).matcher(s.substring(cut))
            if (occ <= 0) prefix + m.replaceAll(java.util.regex.Matcher.quoteReplacement(r))
            else {
              val sb = new StringBuffer
              var count = 0
              while (m.find()) {
                count += 1
                m.appendReplacement(sb,
                  java.util.regex.Matcher.quoteReplacement(
                    if (count == occ) r else m.group()))
              }
              m.appendTail(sb)
              prefix + sb.toString
            }
          })
    }
  }
}
