package graft

import graft.ops.AnalyticsTpch

/** Plan-shape and semantics specs for the adapted TPC-H batch
  * ([[graft.ops.AnalyticsTpch]]): the oracle gate checks values; these pin
  * the SCALE-relevant plan structure (semi/anti join forms, disjunctive
  * pushdown, no subquery-per-row execution) at sf0.001.
  */
class TpchSpec extends GraftSuite {

  private def plan(name: String): String =
    AnalyticsTpch.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("q4: EXISTS becomes a left-semi join, not a per-row subquery") {
    val p = plan("q4_priority_exists")
    assert(p.contains("LeftSemi"), s"no semi join:\n$p")
    assert(!p.toLowerCase.contains("subquery"), s"residual subquery:\n$p")
  }

  test("q21: EXISTS and NOT EXISTS become one semi and one anti self-join") {
    val p = plan("q21_blame_supplier")
    assert(p.contains("LeftSemi"), s"no semi join:\n$p")
    assert(p.contains("LeftAnti"), s"no anti join:\n$p")
    // rows exist: multi-supplier orders with a sole returned supplier
    val n = AnalyticsTpch.queries("q21_blame_supplier")(spark, sfDir).count()
    assert(n > 0, "q21 adaptation is degenerate (empty result)")
  }

  test("q19: disjunctive predicate stays one scan (no union rewrite)") {
    val df = AnalyticsTpch.queries("q19_disjunctive")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    // one lineitem scan, one part scan — the OR did not clone the fact scan
    assert(countOcc(p, "lineitem.parquet") == 1, s"fact scanned twice:\n$p")
    assert(countOcc(p, "part.parquet") == 1, s"part scanned twice:\n$p")
    val row = df.collect()(0)
    assert(row.getLong(1) > 0, "q19 predicates select nothing")
  }

  test("q22: scalar average broadcasts; recent orders anti-join") {
    val p = plan("q22_idle_customers")
    assert(p.contains("LeftAnti"), s"no anti join:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), s"scalar not broadcast:\n$p")
    val n = AnalyticsTpch.queries("q22_idle_customers")(spark, sfDir).count()
    assert(n > 0, "q22 adaptation is degenerate (empty result)")
  }

  test("q13: left join keeps order-less customers in the histogram") {
    import org.apache.spark.sql.functions._
    val t = graft.ops.Tables(spark, sfDir)
    val hist = AnalyticsTpch.queries("q13_order_distribution")(spark, sfDir)
    // total customers across histogram buckets == customer table count
    val total = hist.agg(sum("custdist")).collect()(0).getLong(0)
    assert(total == t.customer.count(), "histogram lost customers")
  }

  test("q8: market share is within [0,1] for every year") {
    val rows = AnalyticsTpch.queries("q8_market_share")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val share = r.getDouble(3)
      assert(share >= 0.0 && share <= 1.0, s"share out of range: $r")
    }
  }

  test("q16: denylist NOT IN becomes a left-anti join") {
    val p = plan("q16_part_suppliers")
    assert(p.contains("LeftAnti"), s"no anti join:\n$p")
  }

  test("q20: HAVING-derived IN set becomes a left-semi join") {
    val p = plan("q20_promo_suppliers")
    assert(p.contains("LeftSemi"), s"no semi join:\n$p")
  }

  test("q15: max-revenue filter keeps at least one supplier, all tied") {
    val rows = graft.ops.AnalyticsTpch
      .queries("q15_top_supplier")(spark, sfDir).collect()
    assert(rows.nonEmpty, "empty top-supplier result")
    val revs = rows.map(_.getDouble(2)).distinct
    assert(revs.length == 1, s"non-tied rows survived: ${revs.toSeq}")
  }

  test("q2: every kept supplier carries its part's max balance") {
    val rows = graft.ops.AnalyticsTpch
      .queries("q2_best_supplier")(spark, sfDir).collect()
    // group by part: all rows of one part share one (max) balance
    rows.groupBy(_.getLong(0)).foreach { case (pk, rs) =>
      assert(rs.map(_.getDouble(3)).distinct.length == 1,
        s"part $pk kept non-max balances")
    }
  }

  test("q11: fact shuffle reused for the scalar; gate broadcasts; prunes") {
    val df = AnalyticsTpch.queries("q11_important_stock")(spark, sfDir)
    val rows = df.collect()
    // final (post-AQE) plan: the global scalar re-aggregates the per-part
    // view, whose shuffle AQE must REUSE — the fact table is physically
    // scanned/shuffled once even though two branches consume it
    val p = df.queryExecution.executedPlan.toString
    assert(countOcc(p, "lineitem.parquet") == 1 ||
      p.contains("ReusedExchange") || p.contains("ReusedQueryStage"),
      s"fact scanned twice, shuffle not reused:\n$p")
    assert(p.contains("LeftSemi"), s"supplier gate not a semi join:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), s"scalar not broadcast:\n$p")
    assert(rows.nonEmpty, "q11 gate selects nothing")
    // the gate must actually prune: kept parts are a strict subset
    val allParts = spark.read.parquet(s"$sfDir/part.parquet").count()
    assert(rows.length < allParts, "q11 gate kept every part")
  }

  test("q12: one scan each, one join, two-way counts partition exactly") {
    val df = AnalyticsTpch.queries("q12_shipmode_priority")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(countOcc(p, "lineitem.parquet") == 1, s"fact scanned twice:\n$p")
    assert(countOcc(p, "orders.parquet") == 1, s"orders scanned twice:\n$p")
    // conditional aggregation, not a pivot/union: exactly one join node
    assert(countOcc(p, "Join") >= 1 && !p.contains("Union"), p)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // high + low == all joined lines per mode (the split is a partition)
    import org.apache.spark.sql.functions._
    val t = graft.ops.Tables(spark, sfDir)
    val totals = t.lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_returnflag").isin("A", "R"))
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) == totals(r.getString(0)), r.toString)
    }
  }

  private def countOcc(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)
}
