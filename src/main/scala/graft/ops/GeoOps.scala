package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spatial operators over hash-derived planar coordinates — the
  * grid-bucketed distance join and nearest-hub assignment every
  * geo-enriched pipeline needs (store/courier matching, geo dedup,
  * point-of-interest rollups). The reference has no spatial surface
  * (its expression layer stops at column equality,
  * `dolomite/src/operator/join.rs:14-75`); this family extends the
  * beyond-reference pipeline checklist like text/dedup/graph.
  *
  * Coordinates are DERIVED, not synthesized ad hoc: each entity's
  * position is `xxh64` of a salted key, reduced to an integer
  * [0, 10^6)² grid — deterministic, order-independent, and replicated
  * exactly in the DuckDB oracle via [[XxhSql]] (same discipline as
  * `data_split_hash`). Integer plane geometry keeps every distance
  * EXACT (no trig, no doubles): dist² fits comfortably in a Long
  * (≤ 2·10^12), so the oracle gate covers values bit-for-bit. A
  * production variant swaps the distance expression for haversine and
  * the grid for a geohash — the plan shape is identical.
  *
  * Scale shape (the signatures → candidates → verify doctrine): the
  * distance join never goes all-pairs. The SMALL side (suppliers =
  * dimension) fans out 9× to its 3×3 neighbor cells and BROADCASTS;
  * the big side (customers = fact) computes its cell in a codegen'd
  * map and equi-joins on the cell id. Candidates are verified with the
  * exact integer distance predicate. At 100 TB the fact side streams
  * map-only — zero shuffle — and the candidate count is bounded by
  * density × 9 cells, not |A|×|B|.
  */
object GeoOps {
  type Q = (SparkSession, String) => DataFrame

  /** Grid span: coordinates live in [0, 10^6)². */
  private val Span = 1000000L
  /** Distance-join radius (2% of span) and its square. */
  private val R = 20000L
  private val R2 = R * R
  /** Number of nearest-hub dimension rows (one per nation). */
  private val NHubs = 25

  private def coord(prefix: String, key: org.apache.spark.sql.Column) =
    pmod(xxhash64(concat(lit(prefix), key.cast("string"))), lit(Span))

  def queries: Map[String, Q] = Map(
    // Grid-bucketed distance join: customer-supplier pairs within R on
    // the integer plane, rolled up per customer nation. Supplier cells
    // fan out to the 3×3 neighborhood (every point within R of a
    // customer lies in one of the 9 cells when cell size = R) and
    // broadcast; candidates verify the exact integer dist².
    "geo_grid_join" -> { (s, d) =>
      val t = Tables(s, d)
      val cust = t.customer.select(col("c_custkey"), col("c_nationkey"),
        coord("GXC", col("c_custkey")).as("cx"),
        coord("GYC", col("c_custkey")).as("cy"))
        .withColumn("gx", expr(s"cx div $R"))
        .withColumn("gy", expr(s"cy div $R"))
      val supp = t.supplier.select(col("s_suppkey"),
        coord("GXS", col("s_suppkey")).as("sx"),
        coord("GYS", col("s_suppkey")).as("sy"))
      val suppCells = supp
        .select(col("s_suppkey"), col("sx"), col("sy"),
          explode(expr(s"sequence(sx div $R - 1, sx div $R + 1)")).as("gx"))
        .select(col("s_suppkey"), col("sx"), col("sy"), col("gx"),
          explode(expr(s"sequence(sy div $R - 1, sy div $R + 1)")).as("gy"))
      val d2 = (col("cx") - col("sx")) * (col("cx") - col("sx")) +
        (col("cy") - col("sy")) * (col("cy") - col("sy"))
      cust.join(broadcast(suppCells), Seq("gx", "gy"))
        .withColumn("d2", d2)
        .filter(col("d2") <= R2)
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("s_suppkey")).as("n_suppliers"),
          min(col("d2")).as("min_dist2"))
        .orderBy("c_nationkey")
    },
    // Nearest-hub assignment: each customer maps to the closest of 25
    // nation hubs (hub positions hash-derived like the entities). The
    // hub table is a 25-row broadcast crossjoin + max(struct) argmin —
    // the spatial twin of the kmeans assignment step. Ties broken by
    // smaller hub id (struct comparison on (-d2, -hub) inverted).
    "geo_nearest_hub" -> { (s, d) =>
      val t = Tables(s, d)
      val hubs = t.nation.select(col("n_nationkey").as("hub"),
        coord("HX", col("n_nationkey")).as("hx"),
        coord("HY", col("n_nationkey")).as("hy"))
      val cust = t.customer.select(col("c_custkey"),
        coord("GXC", col("c_custkey")).as("cx"),
        coord("GYC", col("c_custkey")).as("cy"))
      val d2 = (col("cx") - col("hx")) * (col("cx") - col("hx")) +
        (col("cy") - col("hy")) * (col("cy") - col("hy"))
      cust.crossJoin(broadcast(hubs))
        .select(col("c_custkey"),
          struct(d2.as("d2"), col("hub").as("hub")).as("cand"))
        .groupBy("c_custkey")
        .agg(min(col("cand")).as("best"))
        .groupBy(col("best.hub").as("hub"))
        .agg(count(lit(1)).as("n_customers"),
          min(col("best.d2")).as("min_dist2"),
          max(col("best.d2")).as("max_dist2"),
          sum(col("best.d2")).as("sum_dist2"))
        .orderBy("hub")
    },
    // k-nearest hubs (k=3): the multi-assignment variant of
    // geo_nearest_hub — coverage planning wants each point's top-k
    // facilities, not just the argmin. Same 25-row broadcast fan-out;
    // the rank is a per-customer window over the 25 candidates (bounded
    // state), then the k survivors roll up per (hub, k). Ties broken by
    // hub id for determinism.
    "geo_knn_hubs" -> { (s, d) =>
      val t = Tables(s, d)
      val hubs = t.nation.select(col("n_nationkey").as("hub"),
        coord("HX", col("n_nationkey")).as("hx"),
        coord("HY", col("n_nationkey")).as("hy"))
      val cust = t.customer.select(col("c_custkey"),
        coord("GXC", col("c_custkey")).as("cx"),
        coord("GYC", col("c_custkey")).as("cy"))
      val d2 = (col("cx") - col("hx")) * (col("cx") - col("hx")) +
        (col("cy") - col("hy")) * (col("cy") - col("hy"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("c_custkey").orderBy(col("d2"), col("hub"))
      cust.crossJoin(broadcast(hubs))
        .withColumn("d2", d2)
        .withColumn("k", row_number().over(w))
        .filter(col("k") <= 3)
        .groupBy("hub", "k")
        .agg(count(lit(1)).as("n_customers"),
          min(col("d2")).as("min_dist2"),
          max(col("d2")).as("max_dist2"))
        .orderBy("hub", "k")
    },
    // Rectangle-containment join: 25 hash-derived bboxes (center +
    // half-width in [2%, 10%) of span) against the customer points.
    // NOT a nested-loop range join: each bbox explodes to the grid
    // cells it covers (<= 12x12 at max width) and BROADCASTS; points
    // equi-join on their single cell and verify exact containment —
    // the same cover-cells doctrine as geo_grid_join, so the fact side
    // stays map-only at 100 TB.
    "geo_bbox_contain" -> { (s, d) =>
      val t = Tables(s, d)
      val bbox = t.nation.select(col("n_nationkey").as("bbox"),
        coord("BX", col("n_nationkey")).as("bx"),
        coord("BY", col("n_nationkey")).as("by0"),
        (lit(Span / 50) + pmod(xxhash64(concat(lit("BW"),
          col("n_nationkey").cast("string"))),
          lit(Span / 10 - Span / 50))).as("w"))
      val cells = bbox
        .withColumn("gx", explode(expr(
          s"sequence(greatest(bx - w, 0) div $R, " +
            s"least(bx + w, ${Span - 1}) div $R)")))
        .withColumn("gy", explode(expr(
          s"sequence(greatest(by0 - w, 0) div $R, " +
            s"least(by0 + w, ${Span - 1}) div $R)")))
      val cust = t.customer.select(col("c_custkey"),
        coord("GXC", col("c_custkey")).as("cx"),
        coord("GYC", col("c_custkey")).as("cy"))
        .withColumn("gx", expr(s"cx div $R"))
        .withColumn("gy", expr(s"cy div $R"))
      cust.join(broadcast(cells), Seq("gx", "gy"))
        .filter(abs(col("cx") - col("bx")) <= col("w") &&
          abs(col("cy") - col("by0")) <= col("w"))
        .groupBy("bbox", "w")
        .agg(count(lit(1)).as("n_inside"))
        .orderBy("bbox")
    },
    // Density heatmap: coarse-cell (10% of span) point counts over the
    // combined customer+supplier point set, top-15 cells by density.
    // Pure two-level aggregation — zero joins, the map-side combine
    // carries it at any scale; the top-k is a 100-cell sort.
    "geo_density_grid" -> { (s, d) =>
      val t = Tables(s, d)
      val c = Span / 10
      val cust = t.customer.select(
        coord("GXC", col("c_custkey")).as("x"),
        coord("GYC", col("c_custkey")).as("y"),
        lit("c").as("src"))
      val supp = t.supplier.select(
        coord("GXS", col("s_suppkey")).as("x"),
        coord("GYS", col("s_suppkey")).as("y"),
        lit("s").as("src"))
      cust.unionAll(supp)
        .groupBy(expr(s"x div $c").as("gx"), expr(s"y div $c").as("gy"))
        .agg(count(lit(1)).as("n_points"),
          count(when(col("src") === "c", 1)).as("n_cust"),
          count(when(col("src") === "s", 1)).as("n_supp"))
        .orderBy(desc("n_points"), col("gx"), col("gy"))
        .limit(15)
    },
    // Quadtree occupancy profile: for levels 1..6, how many quadtree
    // cells are occupied, the max cell population and the mean
    // (x100, exact integer) — the stat a spatial-index sizing decision
    // reads (at which level does the tree stop paying?). One explode
    // (6x) + two aggregations; no joins.
    "geo_quadtree_profile" -> { (s, d) =>
      val t = Tables(s, d)
      t.customer.select(
        coord("GXC", col("c_custkey")).as("cx"),
        coord("GYC", col("c_custkey")).as("cy"))
        .withColumn("lvl", explode(expr("sequence(1, 6)")))
        .groupBy(col("lvl"),
          expr(s"cx * shiftleft(1, lvl) div $Span").as("qx"),
          expr(s"cy * shiftleft(1, lvl) div $Span").as("qy"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("lvl")
        .agg(count(lit(1)).as("n_occupied"),
          max(col("cnt")).as("max_cell"),
          sum(col("cnt")).as("n_points"))
        .withColumn("avg_x100",
          expr("n_points * 100 div n_occupied"))
        .orderBy("lvl")
    },
    // Trajectory length: each user's event stream ordered by (ts,
    // event_id), steps between consecutive hash-derived positions,
    // per-user exact step count / total / max squared step. The lag is
    // a per-user window (state bounded by the user's own history);
    // partitioning by user_id shuffles once and scales linearly.
    "geo_trajectory_len" -> { (s, d) =>
      val t = Tables(s, d)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t.events.select(col("user_id"), col("ts"), col("event_id"),
        coord("TX", col("event_id")).as("x"),
        coord("TY", col("event_id")).as("y"))
        .withColumn("px", lag(col("x"), 1).over(w))
        .withColumn("py", lag(col("y"), 1).over(w))
        .filter(col("px").isNotNull)
        .withColumn("d2", (col("x") - col("px")) * (col("x") - col("px")) +
          (col("y") - col("py")) * (col("y") - col("py")))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_steps"),
          sum(col("d2")).as("sum_step_d2"),
          max(col("d2")).as("max_step_d2"))
        .orderBy("user_id")
    },
    // Candidate-set eval: the number that justifies the grid layout —
    // candidates the 3x3 cover join generates vs exact in-radius pairs
    // vs the all-pairs cross count, with precision/selectivity in
    // exact basis points. One row; the scalar combine is two 1-row
    // broadcasts (metadata scale).
    "geo_candidate_eval" -> { (s, d) =>
      val t = Tables(s, d)
      val cust = t.customer.select(col("c_custkey"),
        coord("GXC", col("c_custkey")).as("cx"),
        coord("GYC", col("c_custkey")).as("cy"))
        .withColumn("gx", expr(s"cx div $R"))
        .withColumn("gy", expr(s"cy div $R"))
      val supp = t.supplier.select(col("s_suppkey"),
        coord("GXS", col("s_suppkey")).as("sx"),
        coord("GYS", col("s_suppkey")).as("sy"))
      val suppCells = supp
        .select(col("s_suppkey"), col("sx"), col("sy"),
          explode(expr(s"sequence(sx div $R - 1, sx div $R + 1)")).as("gx"))
        .select(col("s_suppkey"), col("sx"), col("sy"), col("gx"),
          explode(expr(s"sequence(sy div $R - 1, sy div $R + 1)")).as("gy"))
      val d2 = (col("cx") - col("sx")) * (col("cx") - col("sx")) +
        (col("cy") - col("sy")) * (col("cy") - col("sy"))
      val candExact = cust.join(broadcast(suppCells), Seq("gx", "gy"))
        .withColumn("d2", d2)
        .agg(count(lit(1)).as("n_candidates"),
          count(when(col("d2") <= R2, 1)).as("n_exact"))
      val cross = cust.agg(count(lit(1)).as("nc"))
        .crossJoin(supp.agg(count(lit(1)).as("ns")))
        .select((col("nc") * col("ns")).as("n_cross"))
      candExact.crossJoin(cross)
        .select(col("n_candidates"), col("n_exact"), col("n_cross"),
          expr("n_exact * 10000 div n_candidates").as("precision_bp"),
          expr("n_exact * 10000 div n_cross").as("selectivity_bp"))
    }
  )

  private def xh(prefix: String, key: String): String =
    s"(((${XxhSql.expr(s"'$prefix' || CAST($key AS VARCHAR)", "42")}) " +
      s"% $Span) + $Span) % $Span"

  /** xxh64 reduced to [0, m) — the bbox half-width derivation. */
  private def xhMod(prefix: String, key: String, m: Long): String =
    s"(((${XxhSql.expr(s"'$prefix' || CAST($key AS VARCHAR)", "42")}) " +
      s"% $m) + $m) % $m"

  def oracles: Map[String, String] = Map(
    "geo_grid_join" ->
      s"""WITH c AS (SELECT c_custkey, c_nationkey,
         |    ${xh("GXC", "c_custkey")} AS cx,
         |    ${xh("GYC", "c_custkey")} AS cy FROM customer),
         |  sp AS (SELECT s_suppkey,
         |    ${xh("GXS", "s_suppkey")} AS sx,
         |    ${xh("GYS", "s_suppkey")} AS sy FROM supplier),
         |  p AS (SELECT c_nationkey, s_suppkey,
         |      (cx-sx)*(cx-sx) + (cy-sy)*(cy-sy) AS d2
         |    FROM c, sp
         |    WHERE (cx-sx)*(cx-sx) + (cy-sy)*(cy-sy) <= $R2)
         |SELECT c_nationkey, count(*) AS n_pairs,
         |  count(DISTINCT s_suppkey) AS n_suppliers,
         |  CAST(min(d2) AS BIGINT) AS min_dist2
         |FROM p GROUP BY 1 ORDER BY c_nationkey""".stripMargin,
    "geo_nearest_hub" ->
      s"""WITH h AS (SELECT n_nationkey AS hub,
         |    ${xh("HX", "n_nationkey")} AS hx,
         |    ${xh("HY", "n_nationkey")} AS hy FROM nation),
         |  c AS (SELECT c_custkey,
         |    ${xh("GXC", "c_custkey")} AS cx,
         |    ${xh("GYC", "c_custkey")} AS cy FROM customer),
         |  best AS (SELECT c_custkey, hub, d2 FROM (
         |      SELECT c.c_custkey, h.hub,
         |        (cx-hx)*(cx-hx) + (cy-hy)*(cy-hy) AS d2,
         |        row_number() OVER (PARTITION BY c.c_custkey
         |          ORDER BY (cx-hx)*(cx-hx) + (cy-hy)*(cy-hy), hub) AS rn
         |      FROM c, h) WHERE rn = 1)
         |SELECT hub, count(*) AS n_customers,
         |  CAST(min(d2) AS BIGINT) AS min_dist2,
         |  CAST(max(d2) AS BIGINT) AS max_dist2,
         |  CAST(sum(d2) AS BIGINT) AS sum_dist2
         |FROM best GROUP BY hub ORDER BY hub""".stripMargin,
    "geo_knn_hubs" ->
      s"""WITH h AS (SELECT n_nationkey AS hub,
         |    ${xh("HX", "n_nationkey")} AS hx,
         |    ${xh("HY", "n_nationkey")} AS hy FROM nation),
         |  c AS (SELECT c_custkey,
         |    ${xh("GXC", "c_custkey")} AS cx,
         |    ${xh("GYC", "c_custkey")} AS cy FROM customer),
         |  r AS (SELECT hub, d2,
         |      row_number() OVER (PARTITION BY c_custkey
         |        ORDER BY d2, hub) AS rn
         |    FROM (SELECT c.c_custkey, h.hub,
         |        (cx-hx)*(cx-hx) + (cy-hy)*(cy-hy) AS d2 FROM c, h))
         |SELECT hub, CAST(rn AS INTEGER) AS k, count(*) AS n_customers,
         |  CAST(min(d2) AS BIGINT) AS min_dist2,
         |  CAST(max(d2) AS BIGINT) AS max_dist2
         |FROM r WHERE rn <= 3 GROUP BY hub, rn ORDER BY hub, k""".stripMargin,
    "geo_bbox_contain" ->
      s"""WITH b AS (SELECT n_nationkey AS bbox,
         |    ${xh("BX", "n_nationkey")} AS bx,
         |    ${xh("BY", "n_nationkey")} AS by0,
         |    ${Span / 50} + ${xhMod("BW", "n_nationkey", Span / 10 - Span / 50)} AS w
         |  FROM nation),
         |  c AS (SELECT c_custkey,
         |    ${xh("GXC", "c_custkey")} AS cx,
         |    ${xh("GYC", "c_custkey")} AS cy FROM customer)
         |SELECT bbox, CAST(w AS BIGINT) AS w, count(*) AS n_inside
         |FROM c, b
         |WHERE abs(cx - bx) <= w AND abs(cy - by0) <= w
         |GROUP BY bbox, w ORDER BY bbox""".stripMargin,
    "geo_density_grid" ->
      s"""WITH p AS (
         |  SELECT ${xh("GXC", "c_custkey")} AS x,
         |    ${xh("GYC", "c_custkey")} AS y, 'c' AS src FROM customer
         |  UNION ALL
         |  SELECT ${xh("GXS", "s_suppkey")},
         |    ${xh("GYS", "s_suppkey")}, 's' FROM supplier)
         |SELECT CAST(x // ${Span / 10} AS BIGINT) AS gx,
         |  CAST(y // ${Span / 10} AS BIGINT) AS gy,
         |  count(*) AS n_points,
         |  count(*) FILTER (WHERE src = 'c') AS n_cust,
         |  count(*) FILTER (WHERE src = 's') AS n_supp
         |FROM p GROUP BY 1, 2
         |ORDER BY n_points DESC, gx, gy LIMIT 15""".stripMargin,
    "geo_quadtree_profile" ->
      s"""WITH c AS (SELECT
         |    ${xh("GXC", "c_custkey")} AS cx,
         |    ${xh("GYC", "c_custkey")} AS cy FROM customer),
         |  e AS (SELECT lvl,
         |      cx * (1 << lvl) // $Span AS qx,
         |      cy * (1 << lvl) // $Span AS qy
         |    FROM c CROSS JOIN range(1, 7) t(lvl)),
         |  g AS (SELECT lvl, qx, qy, count(*) AS cnt FROM e GROUP BY 1, 2, 3)
         |SELECT CAST(lvl AS INTEGER) AS lvl, count(*) AS n_occupied,
         |  CAST(max(cnt) AS BIGINT) AS max_cell,
         |  CAST(sum(cnt) AS BIGINT) AS n_points,
         |  CAST(sum(cnt) * 100 // count(*) AS BIGINT) AS avg_x100
         |FROM g GROUP BY lvl ORDER BY lvl""".stripMargin,
    "geo_trajectory_len" ->
      s"""WITH e AS (SELECT user_id, ts, event_id,
         |    ${xh("TX", "event_id")} AS x,
         |    ${xh("TY", "event_id")} AS y FROM events),
         |  s AS (SELECT user_id, x, y,
         |      lag(x) OVER w AS px, lag(y) OVER w AS py
         |    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         |SELECT user_id, count(*) AS n_steps,
         |  CAST(sum((x-px)*(x-px) + (y-py)*(y-py)) AS BIGINT) AS sum_step_d2,
         |  CAST(max((x-px)*(x-px) + (y-py)*(y-py)) AS BIGINT) AS max_step_d2
         |FROM s WHERE px IS NOT NULL
         |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "geo_candidate_eval" ->
      s"""WITH c AS (SELECT c_custkey,
         |    ${xh("GXC", "c_custkey")} AS cx,
         |    ${xh("GYC", "c_custkey")} AS cy FROM customer),
         |  sp AS (SELECT s_suppkey,
         |    ${xh("GXS", "s_suppkey")} AS sx,
         |    ${xh("GYS", "s_suppkey")} AS sy FROM supplier),
         |  j AS (SELECT (cx-sx)*(cx-sx) + (cy-sy)*(cy-sy) AS d2
         |    FROM c, sp
         |    WHERE abs(cx // $R - sx // $R) <= 1
         |      AND abs(cy // $R - sy // $R) <= 1),
         |  agg AS (SELECT count(*) AS n_candidates,
         |      count(*) FILTER (WHERE d2 <= $R2) AS n_exact FROM j),
         |  x AS (SELECT (SELECT count(*) FROM c) *
         |      (SELECT count(*) FROM sp) AS n_cross)
         |SELECT n_candidates, n_exact, n_cross,
         |  n_exact * 10000 // n_candidates AS precision_bp,
         |  n_exact * 10000 // n_cross AS selectivity_bp
         |FROM agg, x""".stripMargin
  )
}
