package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Plan audit: print executed plans of the headline queries and grep for
  * scale smells (missing pushdown, extra shuffles, non-broadcast dims).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q1_pricing", "q5_region_revenue", "agg_by_partsupp",
      "events_sessionize", "dedup_ngram_jaccard", "sim_topk_bruteforce")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, d)
      df.collect()
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val s = plan.toString
      val nExchange = "Exchange hashpartitioning".r.findAllIn(s).size
      val nBcast = "BroadcastExchange".r.findAllIn(s).size
      val nScan = "FileScan".r.findAllIn(s).size
      println(s"\n===== $n: exchanges=$nExchange broadcasts=$nBcast scans=$nScan")
      println(s.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Join") || l.contains("Scan parquet")
          || l.contains("PushedFilters") && l.length < 400).take(25)
        .map(_.take(220)).mkString("\n"))
    }
  }
}
