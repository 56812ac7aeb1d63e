package graft

import org.apache.spark.sql.functions._

import graft.ops.{GeoOps, Tables}

class GeoOpsSpec extends GraftSuite {

  private def coord(prefix: String, key: org.apache.spark.sql.Column) =
    pmod(xxhash64(concat(lit(prefix), key.cast("string"))), lit(1000000L))

  test("grid join finds EXACTLY the brute-force pairs (3x3 loses nothing)") {
    // independent ground truth: all-pairs distance join in the test
    val cust = Tables(spark, sfDir).customer.select(
      col("c_custkey"), col("c_nationkey"),
      coord("GXC", col("c_custkey")).as("cx"),
      coord("GYC", col("c_custkey")).as("cy"))
    val supp = Tables(spark, sfDir).supplier.select(
      col("s_suppkey"),
      coord("GXS", col("s_suppkey")).as("sx"),
      coord("GYS", col("s_suppkey")).as("sy"))
    val d2 = (col("cx") - col("sx")) * (col("cx") - col("sx")) +
      (col("cy") - col("sy")) * (col("cy") - col("sy"))
    val brute = cust.crossJoin(supp).withColumn("d2", d2)
      .filter(col("d2") <= 400000000L)
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("s_suppkey")).as("n_suppliers"),
        min(col("d2")).as("min_dist2"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val got = GeoOps.queries("geo_grid_join")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == brute, s"grid=$got brute=$brute")
    assert(got.nonEmpty, "planted radius should yield at least one pair")
  }

  test("grid join plan: broadcast hash join on cell ids, no cartesian") {
    val plan = GeoOps.queries("geo_grid_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("nearest-hub assignment is total and matches a brute-force argmin") {
    val nCust = Tables(spark, sfDir).customer.count()
    val rows = GeoOps.queries("geo_nearest_hub")(spark, sfDir).collect()
    assert(rows.map(_.getLong(1)).sum == nCust)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3),
        s"min > max for hub ${r.get(0)}") // min_dist2 <= max_dist2
    }
    // independent argmin: brute pairs in the test, Scala-side reduction
    val cust = Tables(spark, sfDir).customer.select(
      col("c_custkey"),
      coord("GXC", col("c_custkey")).as("cx"),
      coord("GYC", col("c_custkey")).as("cy")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val hubs = Tables(spark, sfDir).nation.select(
      col("n_nationkey").cast("long").as("hub"),
      coord("HX", col("n_nationkey")).as("hx"),
      coord("HY", col("n_nationkey")).as("hy")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val bruteCounts = cust.map { case (_, cx, cy) =>
      hubs.map { case (hub, hx, hy) =>
        ((cx - hx) * (cx - hx) + (cy - hy) * (cy - hy), hub)
      }.min._2
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val gotCounts = rows.map { r =>
      r.get(0).asInstanceOf[Number].longValue() -> r.getLong(1)
    }.toMap
    assert(gotCounts == bruteCounts, s"got=$gotCounts brute=$bruteCounts")
  }
}
