package graft.rules

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extension entry point — the Spark-native analog of the reference's
  * two host-integration adapters:
  *
  *  - `DFOptimizerAdapterRule` (logical→logical, wraps the HepOptimizer as a
  *    DataFusion `OptimizerRule`, `datafusion-dolomite-integration/src/
  *    rule.rs:18-56`) → `injectOptimizerRule` for the three limit rules;
  *  - `DFQueryPlanner` (logical→physical, wraps the CascadesOptimizer as a
  *    DataFusion `QueryPlanner`, `src/planner.rs:22-56`) →
  *    `injectPlannerStrategy` for the hash-join implementation rule.
  *
  * Usage:
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  *   // or: spark.sql.extensions=graft.rules.GraftExtensions
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => LimitRules.RemoveLimit)
    e.injectOptimizerRule(_ => LimitRules.PushLimitOverProjection)
    e.injectOptimizerRule(_ => LimitRules.PushLimitToTableScan)
    e.injectPlannerStrategy(_ => Join2HashJoinStrategy)
  }
}
