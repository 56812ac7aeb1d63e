package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSv2 SyntheticSource specs: limit/filter/column pushdown must reach the
  * scan (the physical completion of the reference's limit-bearing TableScan).
  */
class SourceSpec extends GraftSuite {

  private def synth(rows: Long): DataFrame =
    spark.read.format("graft.sources.SyntheticSource")
      .option("rows", rows.toString).load()

  private def scanDesc(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.collectLeaves().map(_.toString)
      .mkString("\n")
  }

  test("full scan returns the deterministic sequence") {
    val got = synth(10).collect().map(r => (r.getLong(0), r.getDouble(1),
      r.getString(2)))
    assert(got.length == 10)
    assert(got(3) == ((3L, 1.5, "t3")))
  }

  test("limit is pushed into the scan (PushedLimit visible, count correct)") {
    val df = synth(1000000).limit(7)
    assert(df.count() == 7)
    val desc = scanDesc(df)
    assert(desc.contains("PushedLimit: 7"), s"limit not pushed:\n$desc")
  }

  test("range filters on id narrow the generated interval") {
    val df = synth(1000000).filter(col("id") >= 100L && col("id") < 110L)
    assert(df.count() == 10)
    val desc = scanDesc(df)
    assert(desc.contains("range=[100,110)"), s"filter not pushed:\n$desc")
    assert(desc.contains("GreaterThanOrEqual(id,100)"), desc)
  }

  test("column pruning reaches the scan") {
    val df = synth(100).select("tag")
    df.collect()
    val desc = scanDesc(df)
    assert(desc.contains("ReadSchema: struct<tag:string"),
      s"columns not pruned:\n$desc")
  }

  test("unsupported filters stay in the plan as residuals (correct results)") {
    // tag filter is not pushable; results must still be correct
    val df = synth(100).filter(col("tag") === "t3" && col("id") < 50L)
    val ids = df.collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(3L, 13L, 23L, 33L, 43L))
  }

  test("limit combined with filter composes (min of both constraints)") {
    val df = synth(1000000).filter(col("id") >= 10L).limit(5)
    assert(df.count() == 5)
    val first = df.orderBy("id").collect().map(_.getLong(0))
    assert(first.head >= 10L)
  }
}
