package graft.cascades

/** Rule framework: pattern-matched transformations decoupled from the
  * optimizers — mirrors `dolomite/src/rules/mod.rs:99-120` (Rule trait),
  * `rules/pattern.rs:27-80` (Pattern), `rules/opt_expr.rs:59-202`
  * (OptExpression).
  */

/** Matcher-function tree with `any` wildcard leaves. */
final case class Pattern(
    matches: Operator => Boolean,
    children: Seq[Pattern] = Nil)

object Pattern {
  /** Wildcard: matches any operator, binds the subtree/group unexpanded. */
  val any: Pattern = Pattern(_ => true)
  def node(f: Operator => Boolean, children: Pattern*): Pattern =
    Pattern(f, children)
}

/** Rule input/output: a partially-bound plan fragment. Leaves that a pattern
  * did not expand are [[OptExpression.GroupHandle]]s (memo group references)
  * or raw subtrees in the heuristic optimizer.
  */
sealed trait OptExpression
object OptExpression {
  final case class Node(op: Operator, inputs: Seq[OptExpression])
      extends OptExpression
  /** Unexpanded memo group (cascades) — `opt_expr.rs` GroupHandleNode. */
  final case class GroupHandle(groupId: Int) extends OptExpression
  /** Unexpanded plan subtree (heuristic) — ExprHandleNode analog. */
  final case class PlanHandle(plan: PlanNode) extends OptExpression
}

sealed trait RuleId
object RuleId {
  case object PushLimitOverProjection extends RuleId
  case object RemoveLimit extends RuleId
  case object PushLimitToTableScan extends RuleId
  case object CommutateJoin extends RuleId
  case object Join2HashJoin extends RuleId
  case object Scan2TableScan extends RuleId
  case object Project2PhysicalProject extends RuleId
  case object Filter2PhysicalFilter extends RuleId
  case object PushFilterThroughJoin extends RuleId
}

trait OptRule {
  def id: RuleId
  def pattern: Pattern
  /** Higher promise → tried earlier (`rules/mod.rs:153-157`). */
  def promise: Int = 1
  /** Logical→logical rewrite/exploration vs logical→physical implementation. */
  def isImplementation: Boolean = false
  /** Exploration rules generate logical alternatives (not strict
    * improvements) — meaningful only inside the memo'd cascades search; a
    * fixed-point heuristic driver would livelock on self-inverse ones.
    */
  def isExploration: Boolean = false
  def apply(expr: OptExpression.Node): Option[OptExpression]
}

object Rules {
  import OptExpression._

  private def isLimit(op: Operator) = op.isInstanceOf[LogicalLimit]
  private def isProject(op: Operator) = op.isInstanceOf[LogicalProject]
  private def isScan(op: Operator) = op.isInstanceOf[LogicalScan]
  private def isInnerJoin(op: Operator) = op match {
    case LogicalJoin(JoinType.Inner, _) => true
    case _                              => false
  }
  private def isJoin(op: Operator) = op.isInstanceOf[LogicalJoin]

  /** `Limit(a, Limit(b, x))` → `Limit(min(a,b), x)` —
    * `dolomite/src/rules/limit.rs:73-115`.
    */
  object RemoveLimitRule extends OptRule {
    val id = RuleId.RemoveLimit
    val pattern = Pattern.node(isLimit, Pattern.node(isLimit, Pattern.any))
    def apply(expr: Node): Option[OptExpression] = expr match {
      case Node(LogicalLimit(a), Seq(Node(LogicalLimit(b), Seq(input)))) =>
        Some(Node(LogicalLimit(math.min(a, b)), Seq(input)))
      case _ => None
    }
  }

  /** `Limit(n, Project(x))` → `Project(Limit(n, x))` —
    * `dolomite/src/rules/limit.rs:33-71`.
    */
  object PushLimitOverProjectionRule extends OptRule {
    val id = RuleId.PushLimitOverProjection
    val pattern = Pattern.node(isLimit, Pattern.node(isProject, Pattern.any))
    def apply(expr: Node): Option[OptExpression] = expr match {
      case Node(LogicalLimit(n), Seq(Node(p: LogicalProject, Seq(input)))) =>
        Some(Node(p, Seq(Node(LogicalLimit(n), Seq(input)))))
      case _ => None
    }
  }

  /** `Limit(n, Scan(t, l?))` → `Scan(t, min(n, l))` —
    * `dolomite/src/rules/limit.rs:117-165`.
    */
  object PushLimitToTableScanRule extends OptRule {
    val id = RuleId.PushLimitToTableScan
    val pattern = Pattern.node(isLimit, Pattern.node(isScan))
    def apply(expr: Node): Option[OptExpression] = expr match {
      case Node(LogicalLimit(n), Seq(Node(LogicalScan(t, l), Nil))) =>
        Some(Node(LogicalScan(t, Some(l.fold(n)(math.min(n, _)))), Nil))
      case _ => None
    }
  }

  /** Inner-join input swap (exploration) — `dolomite/src/rules/join.rs:27-69`.
    * The reference swaps inputs and keeps the condition; with equi conditions
    * the swapped condition is mirrored too.
    */
  object CommutateJoinRule extends OptRule {
    val id = RuleId.CommutateJoin
    override val isExploration = true
    val pattern = Pattern.node(isInnerJoin, Pattern.any, Pattern.any)
    def apply(expr: Node): Option[OptExpression] = expr match {
      case Node(LogicalJoin(JoinType.Inner, EqCond(l, r)), Seq(a, b)) =>
        Some(Node(LogicalJoin(JoinType.Inner, EqCond(r, l)), Seq(b, a)))
      case _ => None
    }
  }

  /** Logical join → physical hash join (implementation) —
    * `dolomite/src/rules/join.rs:71-114`.
    */
  object Join2HashJoinRule extends OptRule {
    val id = RuleId.Join2HashJoin
    override val isImplementation = true
    // ANY join type implements (the reference matches `LogicalJoin(_)`,
    // `rules/join.rs:80-82`) — only COMMUTATION is inner-only. Matching
    // inner here would leave Left/Full joins with no physical member, a
    // silent optimize-to-None found by CascadesPropertySpec.
    val pattern = Pattern.node(isJoin, Pattern.any, Pattern.any)
    def apply(expr: Node): Option[OptExpression] = expr match {
      case Node(LogicalJoin(jt, cond), inputs) =>
        Some(Node(PhysicalHashJoin(jt, cond), inputs))
      case _ => None
    }
  }

  /** Logical scan → physical table scan (implementation) —
    * `dolomite/src/rules/table_scan.rs:20-57`.
    */
  object Scan2TableScanRule extends OptRule {
    val id = RuleId.Scan2TableScan
    override val isImplementation = true
    val pattern = Pattern.node(isScan)
    def apply(expr: Node): Option[OptExpression] = expr match {
      case Node(LogicalScan(t, l), Nil) =>
        Some(Node(PhysicalTableScan(t, l), Nil))
      case _ => None
    }
  }

  /** Beyond the reference: it declares PhysicalFilter/PhysicalProjection but
    * never plans them (`derive_properties` is `todo!()`, `filter.rs:29-36`,
    * `projection.rs:32-39`, and no implementation rule exists in
    * `rules/mod.rs:124-136`). These two complete the implementation-rule set
    * so every limit-free logical plan is physically plannable.
    */
  object Project2PhysicalProjectRule extends OptRule {
    val id = RuleId.Project2PhysicalProject
    override val isImplementation = true
    val pattern = Pattern.node(isProject, Pattern.any)
    def apply(expr: Node): Option[OptExpression] = expr match {
      case Node(LogicalProject(e), inputs) =>
        Some(Node(PhysicalProject(e), inputs))
      case _ => None
    }
  }

  object Filter2PhysicalFilterRule extends OptRule {
    val id = RuleId.Filter2PhysicalFilter
    override val isImplementation = true
    val pattern = Pattern.node(_.isInstanceOf[LogicalFilter], Pattern.any)
    def apply(expr: Node): Option[OptExpression] = expr match {
      case Node(LogicalFilter(p, cols), inputs) =>
        Some(Node(PhysicalFilter(p, cols), inputs))
      case _ => None
    }
  }

  /** Beyond the reference: predicate pushdown through joins, gated on a
    * LOGICAL PROPERTY (which base tables — hence which columns — each join
    * input provides). The reference declares logical-property derivation
    * and leaves it `todo!()` (`memo.rs:781-783` `derive_statistics`; no
    * pushdown rule exists in `rules/mod.rs:124-136`); this is the
    * completed capability in its smallest honest form: table-sets walk the
    * bound subtree, a catalog maps tables to columns, and the filter
    * descends only when its columns resolve to EXACTLY one side.
    *
    * Semantics guard (textbook outer-join rules): the IR's equality
    * predicates are null-rejecting, so pushing into the LEFT input of a
    * LEFT join or either input of an INNER join is equivalence-preserving;
    * pushing into a LEFT join's right input or any FULL-join input would
    * drop null-extended rows and is refused.
    *
    * HEP-only by construction: the heuristic binder exposes subtrees as
    * [[OptExpression.PlanHandle]]s, so the table-set walk can see the
    * scans. The cascades binder yields opaque [[OptExpression.GroupHandle]]s
    * — there the walk returns None and the rule abstains (the dual of
    * exploration rules, which only make sense WITH a memo).
    */
  final case class PushFilterThroughJoinRule(catalog: Map[String, Seq[String]])
      extends OptRule {
    val id = RuleId.PushFilterThroughJoin
    val pattern = Pattern.node(_.isInstanceOf[LogicalFilter],
      Pattern.node(isJoin, Pattern.any, Pattern.any))

    private def tablesOfPlan(p: PlanNode): Set[String] = (p.op match {
      case LogicalScan(t, _)       => Set(t)
      case PhysicalTableScan(t, _) => Set(t)
      case _                       => Set.empty[String]
    }) ++ p.inputs.flatMap(tablesOfPlan)

    /** Tables provided by a bound rule input; None when any leaf is an
      * unexpanded memo group (cascades) — the rule then abstains.
      */
    private def tables(e: OptExpression): Option[Set[String]] = e match {
      case PlanHandle(p)  => Some(tablesOfPlan(p))
      case GroupHandle(_) => None
      case Node(op, inputs) =>
        val own = op match {
          case LogicalScan(t, _)       => Set(t)
          case PhysicalTableScan(t, _) => Set(t)
          case _                       => Set.empty[String]
        }
        inputs.foldLeft(Option(own)) { (acc, in) =>
          for (a <- acc; t <- tables(in)) yield a ++ t
        }
    }

    private def cols(ts: Set[String]): Set[String] =
      ts.flatMap(t => catalog.getOrElse(t, Nil))

    def apply(expr: Node): Option[OptExpression] = expr match {
      case Node(f @ LogicalFilter(EqCond(l, r), Nil),
          Seq(Node(j @ LogicalJoin(jt, _), Seq(a, b)))) =>
        val need = Set(l.name, r.name)
        val leftHas = tables(a).exists(ts => need.subsetOf(cols(ts)))
        val rightHas = tables(b).exists(ts => need.subsetOf(cols(ts)))
        val pushLeft = leftHas && !rightHas && jt != JoinType.Full
        val pushRight = rightHas && !leftHas && jt == JoinType.Inner
        if (pushLeft) Some(Node(j, Seq(Node(f, Seq(a)), b)))
        else if (pushRight) Some(Node(j, Seq(a, Node(f, Seq(b)))))
        else None // ambiguous, opaque, or outer-join-unsafe: abstain
      case _ => None
    }
  }

  val rewriteRules: Seq[OptRule] =
    Seq(RemoveLimitRule, PushLimitOverProjectionRule, PushLimitToTableScanRule)
  val explorationRules: Seq[OptRule] = Seq(CommutateJoinRule)
  val implementationRules: Seq[OptRule] =
    Seq(Join2HashJoinRule, Scan2TableScanRule,
      Project2PhysicalProjectRule, Filter2PhysicalFilterRule)
  val all: Seq[OptRule] = rewriteRules ++ explorationRules ++ implementationRules
}
