package graft.cascades

/** Cost model — mirrors `dolomite/src/cost/mod.rs:11-35` +
  * `cost/trivial.rs:9-30`: every physical operator costs 1.0, logical
  * operators are un-costable. (The reference's `Statistics` are declared but
  * never computed — `stat.rs:5-21`; Spark's `plan.stats` is the production
  * counterpart, used by [[graft.rules.Join2HashJoinStrategy]].)
  */
trait CostModel {
  /** Cost of the operator itself, excluding inputs. */
  def operatorCost(op: PhysicalOp): Double
}

object ConstantCostModel extends CostModel {
  def operatorCost(op: PhysicalOp): Double = 1.0
}
