package graft

import graft.ops.GraphOps

/** Planted-graph tests for the integer PageRank — the synthetic trade
  * graph is too dense to hand-check, so correctness is pinned on a
  * hand-computed star and a plain-Scala integer replay on random
  * bipartite graphs (exact equality: the whole point of the integer
  * formulation is bit-identical results under any execution order).
  */
class GraphOpsSpec extends GraftSuite {

  test("pagerank: hand-computed 3-node star, isolated nodes hold 0.15*S") {
    import spark.implicits._
    // center 0 — leaves 1, 3; node 5 isolated
    val edges = Seq((0L, 1L), (0L, 3L)).toDF("src", "dst")
    val nodes = Seq(0L, 1L, 3L, 5L).toDF("node")
    val got = GraphOps.pageRankFrom(edges, nodes, iters = 3, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    spark.catalog.clearCache()
    // iter1: c(0)=2e9, c(leaf)=5e8 -> 1850000000 / 575000000
    // iter2: c(0)=1.15e9, c(leaf)=925e6 -> 1127500000 / 936250000
    // iter3: c(0)=1872.5e6, c(leaf)=563750000 -> 1741625000 / 629187500
    assert(got == Seq((0L, 1741625000L), (1L, 629187500L),
      (3L, 629187500L), (5L, 150000000L)), got)
  }

  test("pagerank matches a plain-Scala integer replay on random " +
      "bipartite graphs") {
    import spark.implicits._
    for (seed <- Seq(11L, 12L)) {
      val rnd = new scala.util.Random(seed)
      val custs = (0L to 7L).map(_ * 2)
      val supps = (0L to 3L).map(_ * 2 + 1)
      val nodes = custs ++ supps
      val edges = (for {
        c <- custs; s <- supps if rnd.nextInt(3) == 0
      } yield (c, s)).distinct
      val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      val deg = und.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
      var r = nodes.map(_ -> GraphOps.Scale).toMap
      for (_ <- 1 to 3) {
        val contrib = scala.collection.mutable.Map[Long, Long]()
          .withDefaultValue(0L)
        und.foreach { case (s, d) => contrib(d) += r(s) / deg(s) }
        r = nodes.map(n =>
          n -> (GraphOps.Base + 85L * contrib(n) / 100L)).toMap
      }
      val got = GraphOps.pageRankFrom(edges.toDF("src", "dst"),
          nodes.toDF("node"), iters = 3, k = 1000)
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      spark.catalog.clearCache()
      assert(got == r, s"seed=$seed")
    }
  }
}
