package graft.cascades

import scala.collection.mutable

/** Cascades optimizer: top-down, cost-guided plan-space search over the memo
  * — mirrors `dolomite/src/cascades/{optimizer,task,binding}.rs` (Columbia /
  * Orca lineage, `cascades/mod.rs:43-54`):
  *
  *  - single-threaded FILO task stack (`task.rs:58-80`);
  *  - task types OptimizeGroup / OptimizeExpression / ExploreGroup /
  *    ApplyRule / OptimizeInputs (`task.rs:22-618`);
  *  - rule bindings via cartesian products across group members
  *    (`binding.rs:59-123`);
  *  - per-expression applied-rule bitmask, promise-ordered rule application
  *    (`memo.rs:760-770`, `task.rs:174`);
  *  - branch-and-bound upper-bound pruning during input optimization
  *    (`task.rs:315,418-421,464-466`);
  *  - enforcer hook deliberately empty, as in the reference
  *    (`properties/physical.rs:16-24`).
  */
final class CascadesOptimizer(
    rules: Seq[OptRule] = Rules.all,
    costModel: CostModel = ConstantCostModel) {

  private sealed trait Task
  private final case class OptimizeGroup(
      g: Int, required: PhysicalPropertySet, upperBound: Double) extends Task
  private final case class OptimizeExpression(
      g: Int, e: GroupExpr, required: PhysicalPropertySet, upperBound: Double)
      extends Task
  private final case class ExploreGroup(
      g: Int, required: PhysicalPropertySet, upperBound: Double) extends Task
  private final case class ApplyRuleTask(
      g: Int, e: GroupExpr, rule: OptRule, required: PhysicalPropertySet,
      upperBound: Double) extends Task
  private final case class OptimizeInputs(
      g: Int, e: GroupExpr, required: PhysicalPropertySet, upperBound: Double,
      round: Int) extends Task

  private val MaxRounds = 10000

  def optimize(
      plan: PlanNode,
      required: PhysicalPropertySet = PhysicalPropertySet.default)
      : Option[PlanNode] = {
    val memo = new Memo
    val root = memo.insertPlan(plan)
    val stack = mutable.Stack[Task](
      OptimizeGroup(root, required, Double.PositiveInfinity))
    var steps = 0
    while (stack.nonEmpty && steps < 1000000) {
      steps += 1
      stack.pop() match {

        // `task.rs:536-585`
        case OptimizeGroup(g, req, bound) =>
          val grp = memo.group(g)
          if (grp.winner(req).isEmpty) {
            grp.physicalExprs.foreach(e =>
              stack.push(OptimizeInputs(g, e, req, bound, 0)))
            grp.logicalExprs.foreach(e =>
              stack.push(OptimizeExpression(g, e, req, bound)))
          }

        // `task.rs:167-208`: ApplyRule per unapplied rule (promise order) +
        // ExploreGroup per input group
        case OptimizeExpression(g, e, req, bound) =>
          val applied = memo.group(g).appliedRules(e)
          // ascending push onto the FILO stack → highest promise pops first
          rules.sortBy(_.promise).foreach { r =>
            if (!applied.contains(r.id))
              stack.push(ApplyRuleTask(g, e, r, req, bound))
          }
          e.inputs.foreach(in => stack.push(ExploreGroup(in, req, bound)))

        // `task.rs:594-618`
        case ExploreGroup(g, req, bound) =>
          val grp = memo.group(g)
          if (!grp.explored) {
            grp.explored = true
            grp.logicalExprs.foreach(e =>
              stack.push(OptimizeExpression(g, e, req, bound)))
          }

        // `task.rs:90-154`: bind over the memo, apply, insert, schedule new
        case ApplyRuleTask(g, e, rule, req, bound) =>
          val applied = memo.group(g).appliedRules(e)
          if (!applied.contains(rule.id)) {
            applied += rule.id
            Binding.bindExpr(memo, e, rule.pattern).foreach { binding =>
              rule.apply(binding).foreach { result =>
                memo.insertOptExpression(result, g).foreach {
                  case (gid, newExpr) =>
                    if (newExpr.op.isLogical)
                      stack.push(OptimizeExpression(gid, newExpr, req, bound))
                    else
                      stack.push(OptimizeInputs(gid, newExpr, req, bound, 0))
                }
              }
            }
          }

        // `task.rs:211-512` (4-state FSM compressed to resumable rounds):
        // derive child required props (default, as the reference's join
        // does), optimize children within the remaining budget, accumulate,
        // update winner; enforcers would be consulted here but the
        // reference's `append_enforcers` returns an empty vec — same here.
        case OptimizeInputs(g, e, req, bound, round) =>
          val selfCost = costModel.operatorCost(e.op.asInstanceOf[PhysicalOp])
          if (selfCost <= bound) { // upper-bound pruning (`task.rs:418-421`)
            val childProp = PhysicalPropertySet.default
            val winners = e.inputs.map(memo.group(_).winner(childProp))
            if (winners.forall(_.isDefined)) {
              val total = selfCost + winners.flatten.map(_.cost).sum
              if (total <= bound) {
                memo.group(g).updateWinner(req, Winner(e, total))
                if (req != childProp)
                  memo.group(g).updateWinner(childProp, Winner(e, total))
              }
            } else if (round < MaxRounds) {
              stack.push(OptimizeInputs(g, e, req, bound, round + 1))
              val spent = selfCost + winners.flatten.map(_.cost).sum
              e.inputs.zip(winners).foreach {
                case (in, None) =>
                  stack.push(OptimizeGroup(in, childProp, bound - spent))
                case _ =>
              }
            }
          }
      }
    }
    memo.bestPlan(root, required)
  }
}

/** Cascades pattern binding: bind a pattern rooted at a group expression,
  * taking the cartesian product of member bindings across input groups —
  * mirrors `dolomite/src/cascades/binding.rs:59-123`
  * (`multi_cartesian_product`).
  */
object Binding {
  import OptExpression._

  def bindExpr(memo: Memo, e: GroupExpr, p: Pattern): Seq[Node] = {
    if (!p.matches(e.op)) Nil
    else if (p.children.isEmpty) {
      if (e.inputs.isEmpty) Seq(Node(e.op, Nil)) else Nil
    } else if (p.children.length != e.inputs.length) Nil
    else {
      val perChild: Seq[Seq[OptExpression]] =
        p.children.zip(e.inputs).map { case (cp, cg) =>
          bindGroup(memo, cg, cp)
        }
      cartesian(perChild).map(children => Node(e.op, children))
    }
  }

  def bindGroup(memo: Memo, g: Int, p: Pattern): Seq[OptExpression] =
    if (p eq Pattern.any) Seq(GroupHandle(g))
    else memo.group(g).logicalExprs.toSeq.flatMap(e => bindExpr(memo, e, p))

  private def cartesian[A](xs: Seq[Seq[A]]): Seq[Seq[A]] =
    xs.foldRight(Seq(Seq.empty[A])) { (options, acc) =>
      options.flatMap(o => acc.map(o +: _))
    }
}
