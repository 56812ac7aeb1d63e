package graft

import org.apache.spark.sql.functions._

import graft.ops.DataOps

/** The partitioned-sink demo's scale contract: the written layout must
  * actually deliver partition pruning on read, and the pre-write
  * repartition must have prevented the files×partitions explosion (one
  * file per partition directory, not one per upstream task).
  */
class SinkSpec extends GraftSuite {

  test("partitioned sink: pruned read-back, one file per partition dir") {
    val rows = DataOps.queries("data_sink_partitioned")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val out = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_sink_demo").toString
    // read-side partition pruning: the lang predicate must land in
    // PartitionFilters (directory-level skip), not post-scan
    val back = spark.read.parquet(out).filter(col("lang") === "en")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.replaceAll("#\\d+", "").contains("(lang = en)"), plan)
    val enRows = back.count()
    val want = graft.ops.Tables(spark, sfDir).documents
      .filter(col("lang") === "en").count()
    assert(enRows == want)
    // layout: exactly one parquet file per lang directory
    val dirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("lang="))
    assert(dirs.nonEmpty, s"no partition dirs under $out")
    dirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1,
        s"${d.getName}: ${files.length} files (files-per-partition explosion)")
    }
  }

  test("bucketed sink: co-located SMJ — zero join-side exchanges, " +
      "bucketed scans on both sides") {
    val df = DataOps.queries("data_sink_bucketed")(spark, sfDir)
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan.toString
    // the join must be the sort-merge form (the hint pins it against the
    // small-scale broadcast fallback)...
    assert(plan.contains("SortMergeJoin"), plan)
    // ...fed directly by bucketed scans — ZERO exchanges at or below the
    // join (the textual subtree from the SMJ down is scans + local
    // sorts only; Spark since 3.0 deliberately re-sorts bucketed input
    // locally rather than trusting file order, but a local sort of
    // already-sorted bucket files is cheap and, critically, not a
    // shuffle)
    val belowJoin = plan.substring(plan.indexOf("SortMergeJoin"))
    assert(!belowJoin
      .substring(0, belowJoin.indexOf("== Initial Plan ==")
        match { case -1 => belowJoin.length; case i => i })
      .contains("Exchange"), plan)
    // whole-plan shuffle budget: exactly the post-join aggregate and the
    // presentation orderBy — nothing join-side
    val a = graft.tools.PlanCheck.audit(df)
    assert(a.shuffles == 2, a.summary + "\n" + plan)
    assert(plan.contains("Bucketed: true"), plan)
    assert(plan.contains("SelectedBucketsCount: 8 out of 8"), plan)
  }
}
