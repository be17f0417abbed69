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
  *    `get_json_object` paths.
  *  - Function renames: string_split/str_split → split,
  *    strlen/octet_length(utf8) → octet_length, list_* → array_*,
  *    regexp_matches → rlike, epoch(x) → unix seconds, json_each-free
  *    json_extract → get_json_object.
  */
object GraftSql {

  private val renames: Seq[(String, String)] = Seq(
    "string_split" -> "split",
    "str_split" -> "split",
    "strlen" -> "octet_length",
    "list_value" -> "array",
    "list_contains" -> "array_contains",
    "list_distinct" -> "array_distinct",
    "list_sort" -> "array_sort",
    "list_append" -> "array_append",
    "list_concat" -> "concat",
    "len" -> "size",
    "unnest" -> "explode",
    "countif" -> "count_if",
    "json_extract_string" -> "get_json_object")

  /** Rewrite one squirreling-dialect statement into Spark SQL. */
  def rewrite(sqlText: String): String = {
    var s = sqlText

    // ->> / -> json access chains (j -> 'a' ->> 0 ...) collapse into ONE
    // get_json_object with a combined path — both more efficient (one
    // parse of the document) and regex-tractable (no nested parens).
    val chain = raw"([A-Za-z_][A-Za-z0-9_\.]*)((?:\s*->>?\s*(?:'[^']*'|\d+))+)".r
    val step = raw"->>?\s*('([^']*)'|(\d+))".r
    s = chain.replaceAllIn(s, m => {
      val path = step.findAllMatchIn(m.group(2)).map { st =>
        if (st.group(2) != null) s".${st.group(2)}" else s"[${st.group(3)}]"
      }.mkString
      scala.util.matching.Regex.quoteReplacement(
        s"get_json_object(${m.group(1)}, '$$$path')")
    })

    // epoch(x) → seconds since epoch as double
    s = raw"(?i)\bepoch\s*\(".r.replaceAllIn(s, "graft_epoch(")

    // unit-form date_diff('day', a, b): reference semantics are calendar
    // diff for YEAR/MONTH and truncated elapsed time for smaller units
    // (reference: src/expression/date.js:110) — not Spark's datediff
    s = raw"(?i)\b(date_diff|datediff)\s*\(\s*(?=')".r.replaceAllIn(s, "graft_datediff(")

    // Postgres regexp operators: a ~ p / a !~ p / a NOT REGEXP p
    s = raw"(?<=[\w'\)])\s+!~\s+".r.replaceAllIn(s, " NOT RLIKE ")
    s = raw"(?<=[\w'\)])\s+~\s+(?=')".r.replaceAllIn(s, " RLIKE ")
    s = raw"(?i)\bNOT\s+REGEXP\b".r.replaceAllIn(s, "NOT RLIKE")

    // regexp_replace(..., 'g'): Spark replaces globally by default
    s = raw"(?i)(regexp_replace\s*\([^()]*(?:\([^()]*\))?[^()]*),\s*'g'\s*\)".r
      .replaceAllIn(s, m => scala.util.matching.Regex.quoteReplacement(m.group(1) + ")"))

    // DuckDB SELECT * EXCLUDE (...) → Spark SELECT * EXCEPT (...)
    s = raw"(?i)\*\s+EXCLUDE\s*\(".r.replaceAllIn(s, "* EXCEPT (")

    // two-arg regexp_extract returns the WHOLE match in the reference
    // dialect; Spark defaults to capture group 1 — pin group 0
    s = raw"(?i)\bregexp_extract\s*\(([^,()]+),\s*('[^']*')\)".r
      .replaceAllIn(s, m => scala.util.matching.Regex.quoteReplacement(
        s"regexp_extract(${m.group(1)}, ${m.group(2)}, 0)"))

    // regexp_matches(x, p) → x RLIKE p  (two-arg form only)
    s = raw"(?i)\bregexp_matches\s*\(([^,()]*(?:\([^()]*\))?[^,()]*),([^()]*(?:\([^()]*\))?[^()]*)\)".r
      .replaceAllIn(s, m => s"(${m.group(1)} RLIKE ${m.group(2)})")

    renames.foldLeft(s) { case (acc, (from, to)) =>
      raw"(?i)\b$from\s*\(".r.replaceAllIn(acc, s"$to(")
    }
  }

  /** Run a squirreling-dialect query. Tables must already be registered
    * (e.g. via `graft.sources.Tables.registerAll`).
    */
  def sql(spark: SparkSession, sqlText: String): DataFrame = {
    ensureHelpers(spark)
    spark.sql(rewrite(sqlText))
  }

  /** SQL-callable helpers the rewrites target. */
  def ensureHelpers(spark: SparkSession): Unit = {
    if (!spark.catalog.functionExists("graft_epoch")) {
      spark.udf.register("graft_epoch",
        (ts: java.sql.Timestamp) => if (ts == null) null else {
          java.lang.Double.valueOf(ts.getTime / 1000.0)
        })
    }
    if (!spark.catalog.functionExists("graft_datediff")) {
      spark.udf.register("graft_datediff",
        (unit: String, a: java.sql.Timestamp, b: java.sql.Timestamp) =>
          if (unit == null || a == null || b == null) null
          else {
            val (ca, cb) = (java.util.Calendar.getInstance(java.util.TimeZone.getTimeZone("UTC")),
              java.util.Calendar.getInstance(java.util.TimeZone.getTimeZone("UTC")))
            ca.setTime(a); cb.setTime(b)
            val ms = b.getTime - a.getTime
            val out: java.lang.Long = unit.toUpperCase match {
              case "YEAR" => (cb.get(java.util.Calendar.YEAR) - ca.get(java.util.Calendar.YEAR)).toLong
              case "MONTH" =>
                (cb.get(java.util.Calendar.YEAR) - ca.get(java.util.Calendar.YEAR)) * 12L +
                  (cb.get(java.util.Calendar.MONTH) - ca.get(java.util.Calendar.MONTH))
              case "DAY" => ms / 86400000L
              case "HOUR" => ms / 3600000L
              case "MINUTE" => ms / 60000L
              case "SECOND" => ms / 1000L
              case _ => null
            }
            out
          })
    }
  }
}
