package graft.cascades

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Execute a MiniCascades WINNER end to end — the `to_df_physical` analog
  * (`datafusion-dolomite-integration/src/planner.rs:29-55` hands the
  * cascades-chosen physical plan to the host engine;
  * `conversion/physical.rs:23-117` lowers each physical operator to a
  * DataFusion ExecutionPlan). Here the host engine is Spark: each
  * [[PhysicalOp]] lowers to the DataFrame operator whose Catalyst physical
  * plan realizes exactly the winner's choice — join STRATEGY included
  * (broadcast/shuffle-hash/merge via join hints, which Catalyst honors
  * over its own size estimates), so the executed SparkPlan provably
  * carries the cascades decision, not Catalyst's default. This closes the
  * one lifecycle edge the reference demonstrates that the plan-only
  * cascades module did not: winners EXECUTE, and the CORRECTNESS gate
  * checks their rows against DuckDB ([[graft.ops.CascadesExecOps]]).
  *
  * Aggregation: a winner's Final/Exchange/Partial pyramid (the SplitAgg
  * plan) collapses to ONE `groupBy().agg()` — Spark's HashAggregateExec
  * planning *is* the partial/final split (partial_aggregation always on),
  * so the single declarative aggregate executes precisely the split
  * winner: Partial on raw placement, exchange of partial states, Final
  * merge. The plan-shape specs assert that executed pair. A Complete-mode
  * winner lowers the same way (Spark still splits; the distributed
  * execution of "aggregate over co-partitioned input" and "split
  * aggregate" coincide when the input's partitioning comes from the
  * exchange Spark itself inserts).
  */
object Execution {

  /** Lower a winner plan to a DataFrame. `catalog` resolves base tables;
    * join/aggregate column names must be unambiguous across both sides
    * (the TPC-H-prefixed testdata schemas are).
    */
  def lower(plan: PlanNode, catalog: String => DataFrame): DataFrame =
    plan match {
      // SplitAgg winner: Final over (exchange over) Partial — one
      // declarative aggregate (see scaladoc above)
      case PlanNode(PhysicalHashAggregate(AggMode.Final, g, aggs),
          Seq(PlanNode(PhysicalExchange(_),
            Seq(PlanNode(PhysicalHashAggregate(AggMode.Partial, _, _),
              Seq(child)))))) =>
        aggregate(lower(child, catalog), g, aggs)
      case PlanNode(PhysicalHashAggregate(AggMode.Final, g, aggs),
          Seq(PlanNode(PhysicalHashAggregate(AggMode.Partial, _, _),
            Seq(child)))) =>
        aggregate(lower(child, catalog), g, aggs)
      case PlanNode(op, inputs) =>
        val kids = inputs.map(lower(_, catalog))
        op match {
          case PhysicalTableScan(t, limit, _, _) =>
            limit.foldLeft(catalog(t))(_ limit _)
          case PhysicalFilter(pred, projected) =>
            val f = kids.head.filter(predicate(pred))
            if (projected.isEmpty) f
            else f.select(projected.map(c => col(c.name)): _*)
          case PhysicalProject(exprs) =>
            kids.head.select(exprs.map(exprToColumn): _*)
          case PhysicalHashJoin(jt, cond) =>
            // SHUFFLE_HASH pins ShuffledHashJoinExec (build side = right,
            // the winner's convention) over Catalyst's own strategy pick
            kids(0).join(kids(1).hint("SHUFFLE_HASH"),
              joinCond(cond), joinTypeStr(jt))
          case PhysicalBroadcastHashJoin(jt, cond) =>
            kids(0).join(broadcast(kids(1)), joinCond(cond), joinTypeStr(jt))
          case PhysicalSortMergeJoin(jt, cond) =>
            kids(0).join(kids(1).hint("MERGE"),
              joinCond(cond), joinTypeStr(jt))
          case PhysicalHashAggregate(_, g, aggs) =>
            aggregate(kids.head, g, aggs)
          case PhysicalTopK(n, keys) =>
            // orderBy+limit => Spark's TakeOrderedAndProjectExec, the
            // PhysicalTopK counterpart (no global sort)
            kids.head.orderBy(keys.map(sortColumn): _*).limit(n)
          case PhysicalSort(keys) =>
            kids.head.orderBy(keys.map(sortColumn): _*)
          case PhysicalExchange(keys) =>
            if (keys.isEmpty) kids.head.repartition(1)
            else kids.head.repartition(keys.map(c => col(c.name)): _*)
          case other =>
            throw new IllegalArgumentException(
              s"not a lowerable physical operator: $other")
        }
    }

  private def joinTypeStr(jt: JoinType): String = jt match {
    case JoinType.Inner => "inner"
    case JoinType.Left  => "left_outer"
    case JoinType.Full  => "full_outer"
    case JoinType.Semi  => "left_semi"
    case JoinType.Anti  => "left_anti"
  }

  private def joinCond(cond: EqCond): Column =
    col(cond.left.name) === col(cond.right.name)

  /** A [[SortKey]]'s exact Spark sort column — direction AND null
    * placement explicit, never the dialect default (Spark and DuckDB
    * disagree on default null placement, so the lowering and the oracle
    * SQL both spell it out).
    */
  private def sortColumn(k: SortKey): Column = (k.asc, k.nullsFirst) match {
    case (true, true)   => col(k.col.name).asc_nulls_first
    case (true, false)  => col(k.col.name).asc_nulls_last
    case (false, true)  => col(k.col.name).desc_nulls_first
    case (false, false) => col(k.col.name).desc_nulls_last
  }

  private def exprToColumn(e: Expr): Column = e match {
    case Col(n)    => col(n)
    case Lit(v)    => lit(v)
    case StrLit(v) => lit(v)
    case other     =>
      throw new IllegalArgumentException(s"not a projection expr: $other")
  }

  private def predicate(e: Expr): Column = e match {
    case EqCond(l, r) => col(l.name) === col(r.name)
    case CmpCond(op, l, r) =>
      val (a, b) = (exprToColumn(l), exprToColumn(r))
      op match {
        case "="  => a === b
        case "<"  => a < b
        case ">"  => a > b
        case "<=" => a <= b
        case ">=" => a >= b
      }
    case RangeCond(c, lo, hi) =>
      col(c.name) >= lit(lo) && col(c.name) <= lit(hi)
    case OrCond(ds) => ds.map(predicate).reduce(_ || _)
    case other =>
      throw new IllegalArgumentException(s"not a predicate: $other")
  }

  /** One aggregate call to a NAMED Spark column ([[AggCall.outName]] —
    * the same names the oracle SQL aliases to). `count` is `count(*)`
    * (all rows, matching DuckDB's count(*)); avg casts to DECIMAL(28,6)
    * to stay bit-comparable with the DuckDB oracle on integer inputs.
    */
  private def aggColumn(a: AggCall): Column = a.fn match {
    case "count" => count(lit(1)).as(a.outName)
    // SQL COUNT(x): null-skipping — the outer aggregate of the distinct
    // rewrite (skips the (g, NULL) dedup row; keeps all-NULL groups)
    case "count_nonnull" => count(col(a.col.get.name)).as(a.outName)
    // the direct (Complete, co-partitioned) implementation of a distinct
    // count — only sound because the mode's required Hashed(group) input
    // puts every group in one partition; the usually-cheaper plan is the
    // dedup-first rewrite, which never reaches this case
    case "count_distinct" =>
      count_distinct(col(a.col.get.name)).as(a.outName)
    case "sum"   => sum(col(a.col.get.name)).as(a.outName)
    case "min"   => min(col(a.col.get.name)).as(a.outName)
    case "max"   => max(col(a.col.get.name)).as(a.outName)
    case "avg"   =>
      // quantize through the oracle-contract decimal, then render DOUBLE
      // (graft.ops.Oracle doctrine: the same exact decimal renders to
      // the same double in both engines; a decimal OUTPUT column is the
      // r6 hash-hazard class PlanCheckSpec's type audit blocks)
      avg(col(a.col.get.name)).cast("decimal(28,6)").cast("double")
        .as(a.outName)
    case other =>
      throw new IllegalArgumentException(s"unsupported aggregate: $other")
  }

  private def aggregate(df: DataFrame, g: Seq[Col],
      aggs: Seq[AggCall]): DataFrame = {
    val cols = aggs.map(aggColumn)
    if (g.isEmpty) df.agg(cols.head, cols.tail: _*)
    else df.groupBy(g.map(c => col(c.name)): _*).agg(cols.head, cols.tail: _*)
  }
}
