package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, IntegerLiteral, LessThan, LessThanOrEqual, NamedExpression, RowNumber, SortOrder, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Session extensions: registers graft's planner strategy, the
  * window-top-k rewrite, and the SQL function surface.
  *
  * Enable with `.config("spark.sql.extensions", classOf[GraftExtensions].getName)`
  * or `GraftExtensions.install(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => TopKStrategy)
    e.injectOptimizerRule(_ => RewriteWindowTopK)
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_cosine"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.CosineSimFloat].getName, "graft_cosine"),
      (exprs: Seq[Expression]) => graft.functions.CosineSimFloat(exprs(0), exprs(1))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.DotProductFloat].getName, "graft_dot"),
      (exprs: Seq[Expression]) => graft.functions.DotProductFloat(exprs(0), exprs(1))))
  }
}

object GraftExtensions {
  /** Post-hoc install on an existing session (extraStrategies +
    * extraOptimizations + SQL functions). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.GraftBridge.addStrategy(spark, TopKStrategy)
    org.apache.spark.sql.GraftBridge.addOptimization(spark, RewriteWindowTopK)
    graft.functions.GraftFunctions.registerAll(spark)
  }
}

/** Rewrites the canonical declarative top-k pattern
  *
  *   Filter(rank_attr <= k, [Project,] Window([row_number() as rn], part, ord))
  *
  * into the TopKPerKey operator, which caps every map partition at k rows
  * per key BEFORE the shuffle — the window form must shuffle and sort the
  * full input first. Conservative by construction: fires only when the
  * Window computes exactly one function and it is row_number(), and the
  * filter bounds that attribute from above with an integer literal
  * (supports `rn <= k`, `rn < k`, `k >= rn`, `k > rn`, `rn = 1`, and an
  * AND with one such conjunct, keeping the remainder as a residual
  * filter). Results are identical: same partition keys, same sort order,
  * same rank values.
  */
object RewriteWindowTopK extends Rule[LogicalPlan] {

  /** Extract the upper bound k if `cond` bounds `rank` from above. */
  private def bound(cond: Expression, rank: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rank) => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rank) => Some(k - 1)
    case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rank) => Some(k)
    case GreaterThan(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rank) => Some(k - 1)
    case EqualTo(a: Attribute, IntegerLiteral(1)) if a.semanticEquals(rank) => Some(1)
    case EqualTo(IntegerLiteral(1), a: Attribute) if a.semanticEquals(rank) => Some(1)
    case _ => None
  }

  private def splitConjuncts(cond: Expression): Seq[Expression] = cond match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** Match a Window node computing exactly row_number() over (part, ord). */
  private object RowNumberWindow {
    def unapply(p: LogicalPlan)
        : Option[(AttributeReference, Seq[Expression], Seq[SortOrder], LogicalPlan)] =
      p match {
        case Window(Seq(a @ Alias(WindowExpression(RowNumber(), WindowSpecDefinition(part, ord, _)), _)),
                    _, _, child, _) =>
          Some((a.toAttribute.asInstanceOf[AttributeReference], part, ord, child))
        case _ => None
      }
  }

  private def rewrite(cond: Expression, inner: LogicalPlan,
                      wrap: LogicalPlan => LogicalPlan): Option[LogicalPlan] =
    inner match {
      case RowNumberWindow(rankAttr, part, ord, child) if ord.nonEmpty =>
        val conjuncts = splitConjuncts(cond)
        val ks = conjuncts.flatMap(c => bound(c, rankAttr).map(c -> _))
        ks.headOption.map { case (matched, k) =>
          val residual = conjuncts.filterNot(_ eq matched)
          val topk = TopKPerKey(part, ord, k, rankAttr, child,
            BoundedTopK.FlushGroups)
          val wrapped = wrap(topk)
          if (residual.isEmpty) wrapped
          else Filter(residual.reduce(And), wrapped)
        }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      rewrite(cond, w, identity).getOrElse(f)
    case f @ Filter(cond, p @ Project(projList, w: Window))
        if projList.forall(_.deterministic) =>
      rewrite(cond, w, topk => Project(projList, topk)).getOrElse(f)
  }
}
