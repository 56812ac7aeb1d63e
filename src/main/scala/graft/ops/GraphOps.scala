package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over a relationally-derived graph — the
  * second iterative-algorithm family next to the pointer-jumping
  * connected components in [[DedupOps]] (reference analogue: the optimizer
  * has no graph operators at all; this is part of the beyond-reference
  * pipeline surface, like PageRank-style importance scoring of domains
  * in a crawl-curation pipeline).
  *
  * The graph: customers and suppliers are nodes, with an undirected edge
  * when a customer's order contains a line item from the supplier (the
  * TPC-H trade graph). Node ids are disjointly encoded as 2*custkey /
  * 2*suppkey+1.
  *
  * EXACT INTEGER PAGERANK: ranks are scaled to 10^9 and every step is
  * integer arithmetic — `contrib = sum(pr DIV outdeg)`, `pr' = 0.15*S +
  * (85*contrib) DIV 100` — so the result is bit-identical regardless of
  * partitioning, join order, or summation order. A floating-point
  * PageRank cannot be oracle-gated (shuffle order changes the sum); the
  * integer form can, and at 100 TB it also makes reruns reproducible
  * across cluster sizes. Long headroom: contrib <= N*S ~ 10^4 nodes *
  * 10^9 at bench scale (10^16 at 10^7 nodes), and 85*contrib stays under
  * 2^63 up to ~10^8 nodes; shrink S for larger graphs.
  *
  * Execution shape (the Pregel-as-join-agg form): the degree-annotated
  * edge list is built once (one shuffle) and persisted partitioned on
  * `src`; each iteration is edges⋈ranks on src (ranks are node-sized —
  * orders of magnitude smaller than edges) followed by one partial+final
  * sum keyed dst. Nothing else shuffles; the final top-k is a
  * TakeOrderedAndProject. 3 fixed iterations, no driver round-trips.
  */
object GraphOps {
  type Q = (SparkSession, String) => DataFrame

  val Scale = 1000000000L           // S = 10^9
  val Base = 150000000L             // (15 * S) / 100, exact

  def queries: Map[String, Q] = Map(
    "graph_pagerank" -> { (s, d) =>
      val t = Tables(s, d)
      val e0 = t.orders
        .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      val nodes = t.customer.select((col("c_custkey") * 2).as("node"))
        .union(t.supplier.select((col("s_suppkey") * 2 + 1).as("node")))
      pageRankFrom(e0, nodes, iters = 3, k = 20)
    }
  )

  /** PageRank core over a planted directed edge list (undirected = pass
    * both directions; the query passes one direction and this mirrors
    * it). `nodes` must list every node, including isolated ones (they
    * hold rank 0.15*S). Separated so specs can plant graphs with
    * hand-computable ranks.
    *
    * CACHE LIFETIME CONTRACT: the degree-annotated edge list is persisted
    * (read every iteration); the CALLER owns release via
    * `spark.catalog.clearCache()`.
    */
  def pageRankFrom(edges: DataFrame, nodes: DataFrame, iters: Int, k: Int)
      : DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val ed = e.join(deg, "src").persist()
    var r = nodes.withColumn("pr", lit(Scale))
    for (_ <- 1 to iters) {
      val contrib = ed.join(r, ed("src") === r("node"))
        .select(col("dst"), expr("pr div outdeg").as("share"))
        .groupBy("dst").agg(sum(col("share")).as("contrib"))
      r = nodes.join(contrib, nodes("node") === contrib("dst"), "left")
        .select(nodes("node"),
          (lit(Base) + expr(
            "(85 * coalesce(contrib, CAST(0 AS BIGINT))) div 100"))
            .as("pr"))
    }
    r.orderBy(col("pr").desc, col("node").asc).limit(k)
  }

  /** The same three unrolled integer iterations, CTE for CTE. */
  def oracles: Map[String, String] = {
    def iter(prev: String, cn: String, rn: String): String =
      s"""$cn AS (SELECT dst AS node, CAST(sum(pr // outdeg) AS BIGINT)
         |    AS contrib
         |  FROM ed JOIN $prev r ON r.node = ed.src GROUP BY 1),
         |$rn AS (SELECT n.node, CAST($Base +
         |      (85 * COALESCE(contrib, 0)) // 100 AS BIGINT) AS pr
         |  FROM n LEFT JOIN $cn USING (node))""".stripMargin
    Map(
      "graph_pagerank" ->
        s"""WITH e0 AS (SELECT DISTINCT o_custkey * 2 AS src,
           |    l_suppkey * 2 + 1 AS dst
           |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
           |e AS (SELECT src, dst FROM e0
           |  UNION ALL SELECT dst, src FROM e0),
           |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
           |ed AS (SELECT e.src, e.dst, deg.outdeg
           |  FROM e JOIN deg USING (src)),
           |n AS (SELECT c_custkey * 2 AS node FROM customer
           |  UNION ALL SELECT s_suppkey * 2 + 1 FROM supplier),
           |r0 AS (SELECT node, CAST($Scale AS BIGINT) AS pr FROM n),
           |${iter("r0", "c1", "r1")},
           |${iter("r1", "c2", "r2")},
           |${iter("r2", "c3", "r3")}
           |SELECT node, pr FROM r3
           |ORDER BY pr DESC, node LIMIT 20""".stripMargin
    )
  }
}
