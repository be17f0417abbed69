package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Registry-wide contracts every `SparkEntry.queries` entry must hold.
  *
  * 1. Output schema: the driver's comparator sorts result columns with
  *    pandas, which cannot order numpy arrays — a top-level ARRAY /
  *    STRUCT / MAP column crashes the whole correctness row (this is
  *    exactly how q_text_hash_embed went red in round 8 while being
  *    value-correct). The repo policy since round 3: complex outputs
  *    ship as `to_json` text on BOTH engines. This sweep enforces the
  *    policy at build time for every query, present and future.
  *
  * 2. HOF binding: the interpreted-lambda trap (SURVEY §6, measured 19×)
  *    was a hand-applied convention; [[graft.plans.HofLint]] now walks
  *    each optimized plan and flags loop-invariant expensive
  *    subexpressions inside lambda bodies — the signature CollapseProject
  *    leaves when a derived array is referenced per-element instead of
  *    bound as a lambda variable.
  */
class RegistryContractsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // one registry sweep feeds both contract checks (query construction —
  // including the iterative operators that run jobs while building —
  // is the expensive part, not the schema/plan walks)
  private lazy val sweep: Seq[(String, org.apache.spark.sql.DataFrame)] =
    SparkEntry.queries.keys.toSeq.sorted.map { name =>
      name -> SparkEntry.queries(name)(spark, dir)
    }

  test("no query returns a top-level ARRAY/STRUCT/MAP column") {
    val offenders = sweep.flatMap { case (name, df) =>
      df.schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[StructType] ||
          f.dataType.isInstanceOf[MapType] =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(offenders.isEmpty,
      s"comparator contract: serialize complex outputs via to_json on both " +
        s"engines (driver pandas sort crashes on raw arrays). Offenders:\n  " +
        offenders.mkString("\n  "))
  }

  test("no query re-evaluates an expensive loop-invariant inside a HOF lambda") {
    val offenders = sweep.flatMap { case (name, df) =>
      graft.plans.HofLint.lint(df).map(f => s"$name: $f")
    }
    assert(offenders.isEmpty,
      s"interpreted HOF lambdas have no CSE: bind the derived value as a " +
        s"lambda variable via transform(array(x), v -> ...). Offenders:\n  " +
        offenders.mkString("\n  "))
  }

  test("the lint catches a deliberately-unbound derived array") {
    val docs = sources.Tables(spark, dir, "documents")
    // the canonical bad shape: split(text) referenced per element of the
    // sequence — re-runs the whole split for every i when interpreted
    val bad = docs.selectExpr(
      "transform(sequence(1, size(split(text, ' '))), " +
        "i -> element_at(split(text, ' '), i)) AS toks")
    val findings = graft.plans.HofLint.lint(bad)
    assert(findings.nonEmpty, "lint missed the canonical unbound-split fixture")
    assert(findings.exists(_.invariant.contains("split")), findings.mkString("; "))
    // and the bound rewrite of the same computation passes
    val good = docs.selectExpr(
      "element_at(transform(array(split(text, ' ')), " +
        "tk -> transform(sequence(1, size(tk)), i -> element_at(tk, i))), 1) AS toks")
    assert(graft.plans.HofLint.lint(good).isEmpty,
      graft.plans.HofLint.lint(good).mkString("; "))
  }

  test("the lint catches an inner-lambda invariant built from an OUTER variable") {
    val docs = sources.Tables(spark, dir, "documents")
    // split(d) references only the outer lambda's d — constant within the
    // inner per-i loop, so it re-runs once per i when interpreted
    val bad = docs.selectExpr(
      "transform(array(text), d -> " +
        "transform(sequence(1, 3), i -> element_at(split(d, ' '), i))) AS xs")
    val findings = graft.plans.HofLint.lint(bad)
    assert(findings.exists(_.invariant.contains("split")),
      s"lint missed the outer-variable invariant: $findings")
    // bound as a lambda variable at the level it is derived: clean
    val good = docs.selectExpr(
      "transform(array(text), d -> element_at(transform(array(split(d, ' ')), " +
        "tk -> transform(sequence(1, 3), i -> element_at(tk, i))), 1)) AS xs")
    assert(graft.plans.HofLint.lint(good).isEmpty,
      graft.plans.HofLint.lint(good).mkString("; "))
  }
}
