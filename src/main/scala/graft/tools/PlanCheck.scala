package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** User-facing plan audit: the scale checklist ("did my filter reach the
  * scan? how many shuffles? did the dimension broadcast?") as a structured
  * readout instead of eyeballing `explain`. Works on executed plans (runs
  * the query if needed so AQE finalizes).
  */
object PlanCheck {

  final case class Audit(
      shuffles: Int,
      broadcasts: Int,
      scans: Int,
      pushedFilters: Seq[String],
      readSchemas: Seq[String],
      hasSortMergeJoin: Boolean,
      hasShuffledHashJoin: Boolean,
      hasBroadcastHashJoin: Boolean,
      /** Best-effort: counts `*(n)` markers, which AQE-finalized stage text
        * omits — 0 under AQE does not mean codegen is off.
        */
      wholeStageCodegenStages: Int) {
    def summary: String =
      s"shuffles=$shuffles broadcasts=$broadcasts scans=$scans " +
        s"SMJ=$hasSortMergeJoin SHJ=$hasShuffledHashJoin " +
        s"BHJ=$hasBroadcastHashJoin codegenStages=$wholeStageCodegenStages"
  }

  private def countOcc(hay: String, needle: String): Int = {
    var i = 0
    var n = 0
    while ({ i = hay.indexOf(needle, i); i >= 0 }) { n += 1; i += needle.length }
    n
  }

  /** Audit the executed plan (forces execution so AQE settles). */
  def audit(df: DataFrame): Audit = {
    // execute df's OWN QueryExecution — df.count() would build a different
    // one and leave this AdaptiveSparkPlanExec un-finalized (pre-AQE plan)
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }
    val s = plan.toString
    // metadata strings may be truncated (no closing ']'); stop at ']' or EOL
    val pushed =
      "PushedFilters: \\[[^\\]\\n]*\\]?".r.findAllIn(s).toSeq.distinct
    val schemas = "ReadSchema: [^\\n ]*".r.findAllIn(s).toSeq.distinct
    Audit(
      shuffles = countOcc(s, "Exchange hashpartitioning") +
        countOcc(s, "Exchange rangepartitioning") +
        countOcc(s, "Exchange SinglePartition"),
      broadcasts = countOcc(s, "BroadcastExchange"),
      scans = countOcc(s, "FileScan") + countOcc(s, "BatchScan"),
      pushedFilters = pushed,
      readSchemas = schemas,
      hasSortMergeJoin = s.contains("SortMergeJoin"),
      hasShuffledHashJoin = s.contains("ShuffledHashJoin"),
      hasBroadcastHashJoin = s.contains("BroadcastHashJoin"),
      // WSCG shows as "*(n)" stage markers in the compact tree string
      wholeStageCodegenStages =
        "\\*\\((\\d+)\\)".r.findAllMatchIn(s).map(_.group(1)).toSet.size)
  }
}
