package graft

import org.apache.spark.sql.functions._

import graft.ops.Tables
import graft.tools.PlanCheck

class PlanCheckSpec extends GraftSuite {

  test("audit of a star join reports broadcasts and no sort-merge join") {
    val a = PlanCheck.audit(
      SparkEntry.queries("q5_region_revenue")(spark, sfDir))
    assert(a.broadcasts >= 3, a.summary)
    assert(!a.hasSortMergeJoin, a.summary)
    assert(a.scans == 5, a.summary)
  }

  test("audit reports pushed filters and pruned schema for a filtered scan") {
    val df = Tables(spark, sfDir).lineitem
      .filter(col("l_quantity") > 30.0).select("l_orderkey")
    val a = PlanCheck.audit(df)
    assert(a.pushedFilters.exists(_.contains("GreaterThan(l_quantity,30.0)")),
      a.pushedFilters.mkString(";"))
    assert(a.readSchemas.exists(_.contains("l_orderkey")), a.readSchemas)
    assert(a.shuffles == 0, a.summary)
    assert(a.wholeStageCodegenStages >= 1, a.summary)
  }
}
