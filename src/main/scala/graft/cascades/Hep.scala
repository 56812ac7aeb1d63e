package graft.cascades

/** Heuristic fixed-point optimizer — mirrors `dolomite/src/heuristic/
  * optimizer.rs:23-249` (Calcite-HepPlanner-style driver, acknowledged at
  * `heuristic/mod.rs:5-6`) on immutable plan trees instead of a petgraph:
  * scan nodes in match order, bind each rule's pattern ([[HepBinding]] ≈
  * `heuristic/binding.rs:5-67`), apply, graft the result, restart; stop at
  * fixed point or `maxIter`.
  *
  * The Spark-production analog is Catalyst's `RuleExecutor` with
  * `Batch(FixedPoint(n))` — this module exists to reproduce the reference's
  * capability explicitly (SURVEY.md §2.4, §7.1).
  */
object MatchOrder {
  sealed trait Value
  case object TopDown extends Value
  case object BottomUp extends Value
}

object HepBinding {
  import OptExpression._

  /** Bind `pattern` at `plan`: wildcard leaves bind the subtree unexpanded. */
  def bind(plan: PlanNode, pattern: Pattern): Option[OptExpression] =
    if (pattern eq Pattern.any) Some(PlanHandle(plan))
    else if (!pattern.matches(plan.op)) None
    else if (pattern.children.length != plan.inputs.length &&
      pattern.children.nonEmpty) None
    else if (pattern.children.isEmpty) {
      if (plan.inputs.isEmpty) Some(Node(plan.op, Nil)) else None
    } else {
      val bound = pattern.children.zip(plan.inputs).map {
        case (p, in) => bind(in, p)
      }
      if (bound.forall(_.isDefined))
        Some(Node(plan.op, bound.map(_.get)))
      else None
    }

  /** Expand a rule result back into a plan tree. */
  def toPlan(e: OptExpression): PlanNode = e match {
    case Node(op, inputs)  => PlanNode(op, inputs.map(toPlan))
    case PlanHandle(plan)  => plan
    case GroupHandle(g) =>
      throw new IllegalStateException(s"unresolved group handle $g in HEP")
  }
}

final class HepOptimizer(
    allRules: Seq[OptRule],
    matchOrder: MatchOrder.Value = MatchOrder.TopDown,
    maxIter: Int = 1000) {

  /** Exploration rules (e.g. join commutation) generate equivalent
    * alternatives, not improvements — on a fixed-point driver with no memo a
    * self-inverse rule would flip the plan every pass until maxIter with a
    * parity-dependent result. They belong to the cascades search; drop them
    * here.
    */
  private val rules: Seq[OptRule] = allRules.filterNot(_.isExploration)

  /** Fixed-point driver (`heuristic/optimizer.rs:50-92`): apply until no rule
    * changes the plan or the iteration cap is hit.
    */
  def optimize(plan: PlanNode): PlanNode = {
    var current = plan
    var iter = 0
    var changed = true
    while (changed && iter < maxIter) {
      iter += 1
      applyOnce(current) match {
        case Some(next) => current = next
        case None       => changed = false
      }
    }
    current
  }

  /** One pass: first successful (node, rule) application in match order —
    * the reference restarts its node scan after every change
    * (`heuristic/optimizer.rs:119-142`).
    */
  private def applyOnce(plan: PlanNode): Option[PlanNode] = {
    def tryNode(p: PlanNode): Option[PlanNode] =
      rules.iterator.flatMap { rule =>
        HepBinding.bind(p, rule.pattern) match {
          case Some(n: OptExpression.Node) =>
            rule.apply(n, RuleContext.empty).map(HepBinding.toPlan)
              .filter(_ != p)
          case _ => None
        }
      }.nextOption()

    def rec(p: PlanNode): Option[PlanNode] = matchOrder match {
      case MatchOrder.TopDown =>
        tryNode(p).orElse(recChildren(p))
      case MatchOrder.BottomUp =>
        recChildren(p).orElse(tryNode(p))
    }

    def recChildren(p: PlanNode): Option[PlanNode] =
      p.inputs.zipWithIndex.iterator.flatMap { case (c, i) =>
        rec(c).map(nc => p.copy(inputs = p.inputs.updated(i, nc)))
      }.nextOption()

    rec(plan)
  }
}
