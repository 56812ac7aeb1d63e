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

  test("knn hubs: k=1 slice IS the nearest-hub assignment; k totals full") {
    val nCust = Tables(spark, sfDir).customer.count()
    val rows = GeoOps.queries("geo_knn_hubs")(spark, sfDir).collect()
    // each k level assigns every customer exactly once
    (1 to 3).foreach { k =>
      val tot = rows.filter(_.getInt(1) == k).map(_.getLong(2)).sum
      assert(tot == nCust, s"k=$k assigns $tot of $nCust")
    }
    val k1 = rows.filter(_.getInt(1) == 1).map { r =>
      r.get(0).asInstanceOf[Number].longValue() -> r.getLong(2)
    }.toMap
    val nearest = GeoOps.queries("geo_nearest_hub")(spark, sfDir).collect()
      .map { r =>
        r.get(0).asInstanceOf[Number].longValue() -> r.getLong(1)
      }.toMap
    assert(k1 == nearest, s"k=1 slice $k1 != nearest-hub $nearest")
  }

  test("bbox containment matches the naive rectangle predicate") {
    val cust = Tables(spark, sfDir).customer.select(
      coord("GXC", col("c_custkey")).as("cx"),
      coord("GYC", col("c_custkey")).as("cy")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val boxes = Tables(spark, sfDir).nation.select(
      col("n_nationkey").cast("long").as("bbox"),
      pmod(xxhash64(concat(lit("BX"), col("n_nationkey").cast("string"))),
        lit(1000000L)).as("bx"),
      pmod(xxhash64(concat(lit("BY"), col("n_nationkey").cast("string"))),
        lit(1000000L)).as("by0"),
      (lit(20000L) + pmod(xxhash64(concat(lit("BW"),
        col("n_nationkey").cast("string"))), lit(80000L))).as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val brute = boxes.map { case (b, bx, by0, w) =>
      b -> cust.count { case (cx, cy) =>
        math.abs(cx - bx) <= w && math.abs(cy - by0) <= w
      }.toLong
    }.filter(_._2 > 0).toMap
    val got = GeoOps.queries("geo_bbox_contain")(spark, sfDir).collect()
      .map { r =>
        r.get(0).asInstanceOf[Number].longValue() -> r.getLong(2)
      }.toMap
    assert(got == brute, s"got=$got brute=$brute")
  }

  test("candidate eval: exact <= candidates <= cross, brute-consistent") {
    val r = GeoOps.queries("geo_candidate_eval")(spark, sfDir).collect()(0)
    val (cand, exact, cross) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(exact <= cand && cand <= cross, s"$exact <= $cand <= $cross")
    assert(r.getLong(3) <= 10000L && r.getLong(4) <= 10000L)
    // the exact count agrees with geo_grid_join's total pair count
    val gridPairs = GeoOps.queries("geo_grid_join")(spark, sfDir)
      .agg(sum("n_pairs")).collect()(0).getLong(0)
    assert(exact == gridPairs, s"exact=$exact grid=$gridPairs")
  }

  test("quadtree occupancy is monotone in level and conserves points") {
    val rows = GeoOps.queries("geo_quadtree_profile")(spark, sfDir)
      .collect().sortBy(_.getInt(0))
    val nCust = Tables(spark, sfDir).customer.count()
    assert(rows.length == 6)
    rows.foreach(r => assert(r.getLong(3) == nCust, s"level ${r.getInt(0)}"))
    rows.sliding(2).foreach { w =>
      assert(w(0).getLong(1) <= w(1).getLong(1),
        s"occupancy dropped ${w(0)} -> ${w(1)}") // splitting never merges
    }
  }

  test("trajectory steps conserve: sum(n_steps) = n_events - n_users") {
    val ev = Tables(spark, sfDir).events
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    val rows = GeoOps.queries("geo_trajectory_len")(spark, sfDir).collect()
    assert(rows.map(_.getLong(1)).sum == nEvents - nUsers)
    rows.foreach(r => assert(r.getLong(3) <= r.getLong(2),
      "max step exceeds total")) // max <= sum for non-negative steps
  }
}
