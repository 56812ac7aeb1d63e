package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.ops.CascadesExecOps

/** Regenerates CASCADES.md: for every cascades-executed query, the
  * mini-SQL, the WINNER physical plan the memo chose (MiniCascades
  * explain), and the executed SparkPlan it lowered to — the full
  * `planner.rs:29-55` lifecycle on one page. Run:
  * `sbt "Test/runMain graft.DumpCascades"`.
  */
object DumpCascades {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val sb = new StringBuilder
    sb.append("# CASCADES — winners executed end to end\n\n")
    sb.append("For each query: the mini-SQL, the physical plan the " +
      "MiniCascades memo chose (over REAL parquet-footer statistics), " +
      "and the Spark plan the lowering executed — join-strategy hints " +
      "pin Catalyst to the winner's choices, so the executed operators " +
      "ARE the cascades decisions. Regenerate with `sbt \"Test/runMain " +
      "graft.DumpCascades\"` (sf0.01).\n")
    CascadesExecOps.sqls.toSeq.sortBy(_._1).foreach { case (name, sql) =>
      val (winner, df) = CascadesExecOps.planFor(spark, d, name)
      df.collect()
      val plan = (df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p                        => p
      }).toString
      sb.append(s"\n## $name\n\n```sql\n${sql.trim}\n```\n\n")
      sb.append(s"Winner (MiniCascades):\n\n```\n${winner.explain()}\n```\n\n")
      sb.append("Executed (Spark):\n\n```\n")
      sb.append(plan.linesIterator.map(_.take(200)).mkString("\n"))
      sb.append("\n```\n")
      spark.catalog.clearCache()
    }
    Files.writeString(Paths.get("CASCADES.md"), sb.toString)
    println("### wrote CASCADES.md")
  }
}
