package graft.rules

import org.apache.spark.sql.catalyst.expressions.{Expression, IntegerLiteral, Literal}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** The reference's three rewrite rules as native Catalyst `Rule[LogicalPlan]`s.
  *
  * They deliberately duplicate Catalyst built-ins (`EliminateLimits`,
  * `LimitPushDown`) — the point is reproducing the reference's *explicit rule
  * objects* (`dolomite/src/rules/limit.rs`) with observable firing, proven by
  * plan-shape golden tests in `graft.RulesSpec` that apply them to raw
  * un-normalized plans, mirroring the reference's own rule unit tests
  * (`rules/limit.rs:167-322`).
  *
  * Catalyst note: `Limit(n, child)` builds `GlobalLimit(n, LocalLimit(n,
  * child))`; the `Limit` extractor matches that pair, so these rules operate
  * on the same shapes the reference's single `Limit` operator models.
  */
object LimitRules {

  private def intValue(e: Expression): Option[Int] = e match {
    case IntegerLiteral(n) => Some(n)
    case _                 => None
  }

  /** `Limit(a, Limit(b, x))` → `Limit(min(a,b), x)` —
    * mirrors RemoveLimitRule (`dolomite/src/rules/limit.rs:73-115`).
    */
  object RemoveLimit extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
      case Limit(outer, Limit(inner, child)) =>
        (intValue(outer), intValue(inner)) match {
          case (Some(a), Some(b)) =>
            Limit(Literal(math.min(a, b)), child)
          case _ => Limit(outer, Limit(inner, child))
        }
    }
  }

  /** `Limit(n, Project(exprs, x))` → `Project(exprs, Limit(n, x))` —
    * mirrors PushLimitOverProjectionRule (`dolomite/src/rules/limit.rs:33-71`).
    */
  object PushLimitOverProjection extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
      case Limit(n, Project(exprs, child)) =>
        Project(exprs, Limit(n, child))
    }
  }

  /** `Limit(n, Scan(t, l?))` → `Scan(t, limit=min(n, l))` — mirrors
    * PushLimitToTableScanRule (`dolomite/src/rules/limit.rs:117-165`).
    *
    * Spark's parquet relation has no logical per-scan limit field; the
    * pushed-limit concept physically materializes as `LocalLimit` directly
    * above the scan feeding `CollectLimitExec` (asserted in golden tests).
    * This rule therefore normalizes `Limit(n, Limit-bearing scan-side
    * subtree)` so that exactly one `LocalLimit` sits on the scan: it fuses a
    * `GlobalLimit(n, LocalLimit(m, leaf))` where the child is a leaf relation
    * into the min-limit form, the closest faithful analog on Catalyst plans.
    * The full scan-absorbed form lives in MiniCascades
    * ([[graft.cascades]]), whose TableScan carries `limit` like the
    * reference's.
    */
  object PushLimitToTableScan extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
      case GlobalLimit(gn, LocalLimit(ln, child: LeafNode)) =>
        (intValue(gn), intValue(ln)) match {
          // Only tightening the LOCAL limit down to the global one is sound:
          // GlobalLimit(5, LocalLimit(10, leaf)) returns at most 5 rows, so
          // LocalLimit(5) is equivalent. The converse (global 10 over local
          // 5) may legitimately return up to 10 rows across partitions and
          // must not be shrunk.
          case (Some(a), Some(b)) if a < b =>
            val m = Literal(a)
            GlobalLimit(m, LocalLimit(m, child))
          case _ => GlobalLimit(gn, LocalLimit(ln, child))
        }
    }
  }
}
