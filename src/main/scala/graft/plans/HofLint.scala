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

  /** Per-element lambda functions of a HOF (skips ArrayAggregate's
    * run-once finish function).
    */
  private def perElementFunctions(hof: HigherOrderFunction): Seq[Expression] =
    hof match {
      case agg: ArrayAggregate => Seq(agg.merge)
      case other => other.functions
    }

  private def argIds(args: Seq[NamedExpression]): Set[ExprId] =
    args.collect { case v: NamedLambdaVariable => v.exprId }.toSet

  /** Maximal expensive subtrees inside `body` that are loop-invariant
    * wrt the INNERMOST enclosing lambda — i.e. reference none of that
    * lambda's own variables. An OUTER lambda's variable is a constant
    * within the inner loop, so an expensive derivation built only from
    * outer variables still re-evaluates once per inner element and is
    * flagged. HOF *arguments* met along the way evaluate at the current
    * nesting level (once per current element), so they are scanned
    * against the current variable set; each nested lambda body restarts
    * the scan with its own variable set.
    */
  private def invariantsIn(body: Expression, innerArgs: Set[ExprId],
                           out: scala.collection.mutable.Buffer[Expression]): Unit = {
    def referencesInner(e: Expression): Boolean = e.exists {
      case v: NamedLambdaVariable => innerArgs.contains(v.exprId)
      case _ => false
    }
    def walk(e: Expression): Unit =
      if (!referencesInner(e)) {
        // maximal invariant subtree: flag it if anything in it is
        // expensive, and do not descend further either way
        if (e.exists(isExpensive)) out += e
      } else e match {
        // the binding idiom `transform(array(x), v -> body)` is a
        // ONE-element loop: body runs once per evaluation of THIS
        // context, so invariance stays judged against the current loop
        // (the binding variable joins the current set — it derives from
        // this loop's values)
        case ArrayTransform(CreateArray(Seq(_), _), LambdaFunction(f, args, _)) =>
          invariantsIn(f, innerArgs ++ argIds(args), out)
        case inner: HigherOrderFunction =>
          inner.arguments.foreach(walk)
          perElementFunctions(inner).foreach {
            case LambdaFunction(f, args, _) => invariantsIn(f, argIds(args), out)
            case other => walk(other)
          }
        case _ => e.children.foreach(walk)
      }
    walk(body)
  }

  /** All findings in one optimized logical plan. Only OUTERMOST HOFs
    * start a scan — [[invariantsIn]] then carries the enclosing variable
    * sets through nested lambdas, so an inner binding's body is judged
    * in context (a context-free re-scan of a nested lambda would flag
    * outer-variable references the enclosing loop legitimately binds).
    */
  def lint(plan: LogicalPlan): Seq[Finding] = {
    val out = scala.collection.mutable.Buffer[Finding]()
    def scanRoot(e: Expression): Unit = e match {
      case hof: HigherOrderFunction =>
        // HOF arguments evaluate outside any lambda: HOFs inside them
        // are themselves outermost contexts
        hof.arguments.foreach(scanRoot)
        perElementFunctions(hof).foreach {
          case LambdaFunction(f, args, _) =>
            val invs = scala.collection.mutable.Buffer[Expression]()
            invariantsIn(f, argIds(args), invs)
            invs.foreach(inv =>
              out += Finding(hof.prettyName, inv.simpleString(80)))
          case other => scanRoot(other)
        }
      case _ => e.children.foreach(scanRoot)
    }
    plan.foreach(node => node.expressions.foreach(scanRoot))
    out.toSeq.distinct
  }

  /** Convenience: lint a DataFrame's optimized plan. */
  def lint(df: DataFrame): Seq[Finding] =
    lint(df.queryExecution.optimizedPlan)

  /** Lint a STREAMING DataFrame's plan. The batch QueryExecution
    * refuses streaming sources before it ever optimizes
    * (UnsupportedOperationChecker.checkForBatch), so run the session's
    * optimizer directly on the analyzed plan — the same rule set a
    * micro-batch's IncrementalExecution applies, CollapseProject
    * included, which is the pass that creates the unbound-HOF trap this
    * lint exists to catch. Works on batch frames too.
    */
  def lintStream(df: DataFrame): Seq[Finding] =
    lint(df.sparkSession.sessionState.optimizer.execute(df.queryExecution.analyzed))
}
