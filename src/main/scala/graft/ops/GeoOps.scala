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
    }
  )

  private def xh(prefix: String, key: String): String =
    s"(((${XxhSql.expr(s"'$prefix' || CAST($key AS VARCHAR)", "42")}) " +
      s"% $Span) + $Span) % $Span"

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
         |FROM best GROUP BY hub ORDER BY hub""".stripMargin
  )
}
