package graft.cascades

/** Cost + statistics models.
  *
  * The reference declares `Statistics { row_count, ndv }` but never computes
  * it (`dolomite/src/stat.rs:5-21`), so its `SimpleCostModel` is a constant
  * per operator (`cost/trivial.rs:9-30`) and provably cannot distinguish a
  * commuted join from the original (its own golden at
  * `cascades/optimizer.rs:97-137` is side-agnostic). MiniCascades keeps the
  * faithful [[ConstantCostModel]] AND completes the stub:
  * [[StatsModel]] derives per-group output cardinality bottom-up and
  * [[CardinalityCostModel]] prices operators by the rows they touch — which
  * is exactly enough for `CommutateJoinRule` + cost search to put the small
  * side of a hash join on the build side. (Spark's `plan.stats` is the
  * production counterpart, used by [[graft.rules.Join2HashJoinStrategy]].)
  */
trait CostModel {
  /** Cost of the operator itself, excluding inputs; `inputRows` are the
    * derived cardinalities of its input groups (empty for leaves).
    */
  def operatorCost(op: PhysicalOp, inputRows: Seq[Long]): Double
}

object ConstantCostModel extends CostModel {
  def operatorCost(op: PhysicalOp, inputRows: Seq[Long]): Double = 1.0
}

/** Output-cardinality derivation: row counts per scan from a catalog,
  * simple textbook factors above (the point is ORDERING costs correctly,
  * not absolute accuracy).
  */
trait StatsModel {
  def tableRows(table: String): Long

  final def derive(op: Operator, inputRows: Seq[Long]): Long = op match {
    case LogicalScan(t, l)       => limited(tableRows(t), l)
    case PhysicalTableScan(t, l) => limited(tableRows(t), l)
    case _: LogicalFilter | _: PhysicalFilter =>
      math.max(1L, inputRows.head / 10) // fixed 10% selectivity
    case _: LogicalProject | _: PhysicalProject => inputRows.head
    case _: LogicalJoin | _: PhysicalHashJoin |
        _: PhysicalBroadcastHashJoin =>
      // FK-join heuristic: |A ⋈ B| ~ max(|A|,|B|) — symmetric, so the
      // commuted join lands in a group with the same cardinality and only
      // the COST (build-side choice) differentiates the two
      math.max(inputRows(0), inputRows(1))
    case LogicalLimit(n)       => math.min(inputRows.head, n.toLong)
    case _: PhysicalSort       => inputRows.head
    case _: PhysicalExchange   => inputRows.head // repartition: same rows
    // textbook reduction factors: a partial (per-partition) aggregate
    // collapses ~5x, the grouped result ~10x of the raw input. The split
    // decision only needs the ORDERING — partial output < raw input — to
    // price the exchanged bytes correctly.
    case PhysicalHashAggregate(AggMode.Partial, g, _) =>
      if (g.isEmpty) 1L else math.max(1L, inputRows.head / 5)
    case _: LogicalAggregate | _: PhysicalHashAggregate =>
      op match {
        case LogicalAggregate(g, _) if g.isEmpty          => 1L
        case PhysicalHashAggregate(_, g, _) if g.isEmpty  => 1L
        case _ => math.max(1L, inputRows.head / 10)
      }
  }

  private def limited(rows: Long, limit: Option[Int]): Long =
    limit.fold(rows)(l => math.min(rows, l.toLong))
}

/** No statistics: every group has cardinality 1 (keeps the constant-model
  * search identical to the reference's).
  */
object NoStats extends StatsModel {
  def tableRows(table: String): Long = 1L
}

final case class TableStats(catalog: Map[String, Long]) extends StatsModel {
  def tableRows(table: String): Long = catalog.getOrElse(table, 1000L)
}

/** Rows-touched cost: scans pay their output, filters/projections pay their
  * input, a hash join pays 2x its BUILD side (hash-table construction +
  * memory residency) plus 1x its probe side, a sort pays n·log2(n). Build
  * side = RIGHT input, matching the Catalyst strategy's default
  * (`graft.rules.Join2HashJoinStrategy` builds right unless stats say
  * otherwise) — so commuting a join to put the small input on the right is
  * strictly cheaper, the decision the constant model cannot make.
  */
final class CardinalityCostModel extends CostModel {
  def operatorCost(op: PhysicalOp, inputRows: Seq[Long]): Double = op match {
    case PhysicalTableScan(_, _)   => 1.0 // output rows priced by parent
    case PhysicalFilter(_, _)      => inputRows.head.toDouble
    case PhysicalProject(_)        => inputRows.head.toDouble
    case PhysicalHashJoin(_, _)    =>
      inputRows(0).toDouble + 2.0 * inputRows(1).toDouble
    // never chosen under this model (replication factor 2W > the hash
    // join's 2x build) — the single-node model sees no shuffle to avoid.
    // ClusterCostModel is where the tradeoff exists.
    case PhysicalBroadcastHashJoin(_, _) =>
      inputRows(0).toDouble +
        2.0 * ClusterCostModel.W * inputRows(1).toDouble
    case PhysicalSort(_)           =>
      val n = inputRows.head.toDouble
      n * (math.log(n + 1.0) / math.log(2.0))
    // a hash aggregate touches every input row once (probe + update)
    case PhysicalHashAggregate(_, _, _) => inputRows.head.toDouble
    // a shuffle serializes + transfers every input row (2x a plain
    // row-touch pass); a gather additionally funnels through one task
    case PhysicalExchange(keys)    =>
      val n = inputRows.head.toDouble
      if (keys.isEmpty) 3.0 * n else 2.0 * n
  }
}

object ClusterCostModel {
  /** Modeled executor count: what broadcast replication multiplies by.
    * Spark's analog is the implicit ratio behind autoBroadcastJoinThreshold
    * — replicating the build side W times must beat shuffling both sides
    * once. Small on purpose: the golden tests want both outcomes reachable
    * with reference-sized catalogs.
    */
  val W = 8
}

/** [[CardinalityCostModel]] plus the terms a CLUSTER pays for a join's
  * data placement, folded into the join operators themselves (the mini IR
  * tracks no base-table partitioning, so a shuffled hash join always pays
  * its two exchanges and a broadcast join always pays W-fold build
  * replication):
  *
  *  - shuffled hash join: both sides exchange once (2 rows-touched each,
  *    the [[PhysicalExchange]] price) + probe + 2x build hash table;
  *  - broadcast hash join: NO exchanges — the build side is serialized
  *    once and materialized on each of W executors (W x 2 build), probe
  *    streams in place.
  *
  * Crossover at build = probe / (2W - 2 - 2) ≈ probe/12 for W=8: a small
  * dimension broadcasts, a comparable-size build side shuffles — decided
  * by the memo's winner comparison, not a size threshold. Opt-in next to
  * [[Rules.joinStrategyRules]].
  */
final class ClusterCostModel extends CostModel {
  private val base = new CardinalityCostModel
  def operatorCost(op: PhysicalOp, inputRows: Seq[Long]): Double = op match {
    case PhysicalHashJoin(_, _) =>
      2.0 * inputRows(0).toDouble + 2.0 * inputRows(1).toDouble +
        inputRows(0).toDouble + 2.0 * inputRows(1).toDouble
    case PhysicalBroadcastHashJoin(_, _) =>
      inputRows(0).toDouble +
        2.0 * ClusterCostModel.W * inputRows(1).toDouble
    case other => base.operatorCost(other, inputRows)
  }
}
