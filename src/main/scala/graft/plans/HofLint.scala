package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Static guard for the interpreted-HOF binding trap (SURVEY §6, the
  * measured 19×): Spark evaluates higher-order-function lambdas
  * interpreted, with NO common-subexpression elimination, and
  * CollapseProject inlines a withColumn's defining expression into every
  * reference — so an expensive derivation (split / regexp_extract_all /
  * a nested HOF chain) that ends up INSIDE a lambda body while not
  * depending on the lambda's variables is re-evaluated once per element,
  * turning a linear pass quadratic in document length.
  *
  * The fix is always the same: bind the derived value as a lambda
  * variable via `transform(array(x), v -> ...)` so it is evaluated once
  * and read by reference. This lint finds the places that rule was
  * missed: it walks a query's OPTIMIZED plan (after CollapseProject has
  * done its damage), and inside every HOF lambda body flags maximal
  * subtrees that (a) reference no lambda variable of any enclosing
  * lambda — i.e. are loop-invariant — and (b) contain an expensive
  * derivation. `ArrayAggregate`'s finish function runs once per array,
  * not per element, so only its merge function is scanned.
  */
object HofLint {

  final case class Finding(hof: String, invariant: String) {
    override def toString: String = s"[$hof] $invariant"
  }

  /** Expensive per-evaluation work: any nested HOF (its own full pass
    * over an array) or a string→array derivation. Cheap invariants
    * (attribute refs, arithmetic, element_at on an attribute) pass.
    */
  private def isExpensive(e: Expression): Boolean = e match {
    case _: HigherOrderFunction => true
    case _ =>
      e.getClass.getSimpleName match {
        case "RegExpExtractAll" | "StringSplit" | "StringSplitSQL" |
             "RegExpReplace" | "JsonToStructs" | "StringToMap" => true
        case _ => false
      }
  }

  private def referencesLambdaVar(e: Expression): Boolean =
    e.exists(_.isInstanceOf[NamedLambdaVariable])

  /** Per-element lambda functions of a HOF (skips ArrayAggregate's
    * run-once finish function).
    */
  private def perElementFunctions(hof: HigherOrderFunction): Seq[Expression] =
    hof match {
      case agg: ArrayAggregate => Seq(agg.merge)
      case other => other.functions
    }

  /** Maximal loop-invariant expensive subtrees inside `body`. */
  private def invariantsIn(body: Expression): Seq[Expression] = {
    val out = scala.collection.mutable.Buffer[Expression]()
    def walk(e: Expression): Unit =
      if (!referencesLambdaVar(e)) {
        // maximal invariant subtree: flag it if anything in it is
        // expensive, and do not descend further either way
        if (e.exists(isExpensive)) out += e
      } else e match {
        // a nested HOF restarts the scan on ITS per-element functions
        // (so an invariant of the inner lambda is found even when it
        // references the outer lambda's variable)
        case inner: HigherOrderFunction =>
          inner.arguments.foreach(walk)
          perElementFunctions(inner).foreach {
            case LambdaFunction(f, _, _) => walk(f)
            case other => walk(other)
          }
        case _ => e.children.foreach(walk)
      }
    walk(body)
    out.toSeq
  }

  /** All findings in one optimized logical plan. */
  def lint(plan: LogicalPlan): Seq[Finding] = {
    val out = scala.collection.mutable.Buffer[Finding]()
    plan.foreach { node =>
      node.expressions.foreach { root =>
        root.foreach {
          case hof: HigherOrderFunction =>
            perElementFunctions(hof).foreach {
              case LambdaFunction(f, _, _) =>
                invariantsIn(f).foreach { inv =>
                  out += Finding(hof.prettyName, inv.simpleString(80))
                }
              case _ => ()
            }
          case _ => ()
        }
      }
    }
    out.toSeq.distinct
  }

  /** Convenience: lint a DataFrame's optimized plan. */
  def lint(df: DataFrame): Seq[Finding] =
    lint(df.queryExecution.optimizedPlan)
}
