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

  test("triangles: K4 + pendant path — 4 triangles, 3 per K4 node, " +
      "path nodes absent") {
    import spark.implicits._
    // K4 on {1,2,3,4} (every node in C(3,2)=3 triangles) plus a pendant
    // path 4-5-6 that forms no triangle
    val k4 = for (u <- 1L to 4L; v <- (u + 1) to 4L) yield (u, v)
    val edges = (k4 ++ Seq((4L, 5L), (5L, 6L))).toDF("u", "v")
    val got = GraphOps.trianglesFrom(edges, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)), got)
  }

  test("triangles match a plain-Scala count on random graphs") {
    import spark.implicits._
    for (seed <- Seq(21L, 22L)) {
      val rnd = new scala.util.Random(seed)
      val n = 12
      val edges = (for {
        u <- 0L until n; v <- (u + 1) until n if rnd.nextInt(3) == 0
      } yield (u, v)).distinct
      val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      val expected = scala.collection.mutable.Map[Long, Long]()
        .withDefaultValue(0L)
      for {
        (u, v) <- edges; w <- (v + 1) until n
        if adj.getOrElse(u, Set.empty)(w) && adj.getOrElse(v, Set.empty)(w)
      } { expected(u) += 1; expected(v) += 1; expected(w) += 1 }
      val got = GraphOps.trianglesFrom(edges.toDF("u", "v"), k = 1000)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected.toMap, s"seed=$seed got=$got exp=$expected")
    }
  }

  test("basket pair lift matches a driver-side basket replay") {
    import org.apache.spark.sql.functions.col
    val li = graft.ops.Tables(spark, sfDir).lineitem
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val nOrders = graft.ops.Tables(spark, sfDir).orders
      .select("o_orderkey").distinct().count()
    val marg = li.groupBy(_._2).map { case (p, xs) => p -> xs.length.toLong }
    val pairs = li.groupBy(_._1).values.flatMap { items =>
      val ps = items.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      .filter(_._2 >= 3L)
    val want = pairs.map { case ((a, b), nab) =>
      val lift = nab.toDouble * nOrders.toDouble /
        (marg(a).toDouble * marg(b).toDouble)
      (a, b, nab, marg(a), marg(b), lift)
    }.toSeq.sortBy { case (a, b, _, _, _, l) => (-l, a, b) }
    val got = GraphOps.queries("basket_pair_lift")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(got == want)
    assert(got.nonEmpty, "support threshold should keep some pairs")
    // lift must actually discriminate: not all values equal
    assert(got.map(_._6).distinct.size > 1)
  }

  test("BFS hop distances match a driver-side frontier replay") {
    val li = graft.ops.Tables(spark, sfDir).lineitem
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val pairs = li.groupBy(_._1).values.flatMap { items =>
      val ps = items.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val src = pairs.map(_._1).min
    val dist = scala.collection.mutable.Map(src -> 0L)
    var frontier = Set(src)
    for (step <- 1 to 4) {
      frontier = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
        .filterNot(dist.contains)
      frontier.foreach(dist(_) = step.toLong)
    }
    val want = dist.toSeq.sorted
    val got = GraphOps.queries("graph_bfs_hops")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong)).toSeq
    assert(got == want)
    // a real expansion, not a one-hop blob
    assert(got.map(_._2).distinct.size >= 3,
      s"expected ≥3 distinct depths, got ${got.map(_._2).distinct}")
  }

  test("degree distribution: K4 + pendant path hand-check") {
    import spark.implicits._
    // K4 on {1,2,3,4} plus path 4-5, 5-6: degrees 3,3,3,4,2,1
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("u", "v")
    val got = GraphOps.degreeDistFrom(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 1L)), got)
  }

  test("common neighbors: path pairs found, adjacent pairs excluded, " +
      "matches a plain-Scala replay on random graphs") {
    import spark.implicits._
    // path 1-2-3-4: non-adjacent (1,3) and (2,4) share exactly one
    // neighbor; (1,4) shares none (no wedge) and must be absent
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val gotPath = GraphOps.commonNeighborsFrom(path, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(gotPath == Seq((1L, 3L, 1L), (2L, 4L, 1L)), gotPath)
    // K4: every pair adjacent -> empty
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)).toDF("u", "v")
    assert(GraphOps.commonNeighborsFrom(k4, k = 10).count() == 0L)
    for (seed <- Seq(21L, 22L)) {
      val rnd = new scala.util.Random(seed)
      val nodes = 0L until 12L
      val es = (for {
        u <- nodes; v <- nodes if u < v && rnd.nextInt(4) == 0
      } yield (u, v)).toSeq
      val adj = es.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      val eset = es.toSet
      val want = (for {
        u <- nodes; v <- nodes if u < v && !eset.contains((u, v))
        n = adj.getOrElse(u, Set.empty[Long])
          .intersect(adj.getOrElse(v, Set.empty[Long])).size
        if n > 0
      } yield (u, v, n.toLong)).toSeq
        .sortBy { case (u, v, n) => (-n, u, v) }.take(10)
      val got = GraphOps.commonNeighborsFrom(es.toDF("u", "v"), k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq
      assert(got == want, s"seed=$seed")
    }
  }

  test("kcore: planted path+triangle peels one node per round to the " +
      "2-core; fixpoint is stable under extra rounds") {
    import spark.implicits._
    // path 1-2-3-4-5 hanging off triangle {5,6,7}: the 2-core is the
    // triangle, and synchronous peeling consumes the path one node per
    // round (1, then 2, then 3, then 4) — multi-round convergence, not
    // just the first peel.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L), (5L, 7L), (6L, 7L)).toDF("u", "v")
    def run(rounds: Int): Seq[(Long, Long)] =
      GraphOps.kcoreFrom(edges, k = 2, rounds = rounds)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // after 3 rounds node 4 is still alive (its pendant-degree 1 shows)
    assert(run(3) == Seq((4L, 1L), (5L, 3L), (6L, 2L), (7L, 2L)))
    // round 4 reaches the fixpoint; rounds beyond it are no-ops
    val core = Seq((5L, 2L), (6L, 2L), (7L, 2L))
    assert(run(4) == core)
    assert(run(7) == core)
    spark.catalog.clearCache()
  }

  test("label propagation: two bridged triangles converge to two " +
      "communities under the min-tie-break, hand-traced rounds") {
    import spark.implicits._
    // triangles {1,2,3} and {4,5,6} bridged by 3-4; hand-traced:
    // r1: 1→2 2→1 3→1 4→3 5→4 6→4
    // r2: 1→1 2→1 3→1 4→4 5→3 6→3   (2's tie {1,2} breaks low)
    // r3: 1→1 2→1 3→1 4→3 5→3 6→3   — two stable communities
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("u", "v")
    val got = GraphOps.labelPropagationFrom(edges, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 3L), (5L, 3L), (6L, 3L)))
    spark.catalog.clearCache()
  }

  test("kcore: K4 with a tail survives 3-core peeling intact") {
    import spark.implicits._
    val k4 = for (u <- 1L to 4L; v <- (u + 1) to 4L) yield (u, v)
    val edges = (k4 ++ Seq((4L, 5L), (5L, 6L))).toDF("u", "v")
    val got = GraphOps.kcoreFrom(edges, k = 3, rounds = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == (1L to 4L).map(_ -> 3L))
    spark.catalog.clearCache()
  }

  test("clustering coefficient: hand-computed K4 with a 2-hop tail") {
    import spark.implicits._
    // K4 {1,2,3,4} + tail 4-5, 5-6: inner K4 nodes are fully clustered
    // (cc=1), node 4 loses half its pairs to the tail (3 triangles over
    // C(4,2)=6), node 5's neighbors {4,6} are non-adjacent (cc=0), and
    // degree-1 node 6 is defined to 0
    val k4 = for (u <- 1L to 4L; v <- (u + 1) to 4L) yield (u, v)
    val edges = (k4 ++ Seq((4L, 5L), (5L, 6L))).toDF("u", "v")
    val got = GraphOps.clusteringCoeffFrom(edges)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == Seq((1L, 3L, 3L, 1.0), (2L, 3L, 3L, 1.0),
      (3L, 3L, 3L, 1.0), (4L, 4L, 3L, 0.5),
      (5L, 2L, 0L, 0.0), (6L, 1L, 0L, 0.0)))
    spark.catalog.clearCache()
  }

  test("random walk: hand-computed star walks") {
    import spark.implicits._
    // star: center 0, leaves 1..3. From 0 the hash-argmin over {1,2,3}
    // of (7919t + v) % p is v = 1 at every t; leaves bounce back to 0.
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("u", "v")
    val got = GraphOps.randomWalkFrom(edges, steps = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    spark.catalog.clearCache()
    assert(got == Seq((0L, 1L, 0L, 1L), (1L, 0L, 1L, 0L),
      (2L, 0L, 1L, 0L), (3L, 0L, 1L, 0L)), got.toList)
  }

  test("random walk matches a plain-Scala replay on random graphs") {
    import spark.implicits._
    for (seed <- Seq(31L, 32L)) {
      val rnd = new scala.util.Random(seed)
      val n = 12L
      val edges = (for {
        u <- 0L until n; v <- (u + 1) until n if rnd.nextInt(3) == 0
      } yield (u, v)).distinct
      val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      def mix(u: Long, t: Int, v: Long): Long =
        (1000003L * u + 7919L * t + v) % 1000000007L
      val want = adj.keys.toSeq.sorted.map { s0 =>
        var cur = s0
        val steps = (1 to 3).map { t =>
          cur = adj(cur).minBy(v => (mix(cur, t, v), v)); cur
        }
        (s0, steps(0), steps(1), steps(2))
      }
      val got = GraphOps.randomWalkFrom(edges.toDF("u", "v"), steps = 3)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
      spark.catalog.clearCache()
      assert(got == want, s"seed=$seed")
    }
  }

  test("mst round: triangle picks the 2-edge forest under hand-computed " +
      "weights") {
    import spark.implicits._
    // w(1,2) = 1015841 % 100003 = 15811; w(1,3) = 23730; w(2,3) = 23703.
    // node1 -> (1,2); node2 -> (1,2); node3 -> (2,3); dedup = 2 edges.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("u", "v")
    val got = GraphOps.mstRoundFrom(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    spark.catalog.clearCache()
    assert(got == Seq((1L, 2L, 15811L), (2L, 3L, 23703L)), got.toList)
  }

  test("mst round matches a plain-Scala argmin replay and spans every " +
      "node on random graphs") {
    import spark.implicits._
    for (seed <- Seq(41L, 42L)) {
      val rnd = new scala.util.Random(seed)
      val n = 12L
      val edges = (for {
        u <- 0L until n; v <- (u + 1) until n if rnd.nextInt(3) == 0
      } yield (u, v)).distinct
      def w(u: Long, v: Long): Long = (1000003L * u + 7919L * v) % 100003L
      val incident = edges.flatMap { case (u, v) =>
        Seq(u -> (u, v), v -> (u, v))
      }.groupBy(_._1).map { case (k, es) => k -> es.map(_._2) }
      val want = incident.values
        .map(_.minBy { case (u, v) => (w(u, v), u, v) })
        .toSeq.distinct.map { case (u, v) => (u, v, w(u, v)) }
        .sortBy { case (u, v, _) => (u, v) }
      val got = GraphOps.mstRoundFrom(edges.toDF("u", "v")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      spark.catalog.clearCache()
      assert(got == want, s"seed=$seed")
      // forest property: every node of the edge list is covered
      val nodes = edges.flatMap { case (u, v) => Seq(u, v) }.toSet
      val covered = got.flatMap { case (u, v, _) => Seq(u, v) }.toSet
      assert(covered == nodes, s"seed=$seed uncovered=${nodes -- covered}")
    }
  }

  test("jaccard link prediction: K4 minus an edge scores the hole 1.0") {
    import spark.implicits._
    // K4 on 1..4 without (1,2): N(1)=N(2)={3,4} -> common 2, degrees 2+2,
    // jaccard 2/(2+2-2) = 1.0; every other pair is adjacent.
    val edges = Seq((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("u", "v")
    val got = GraphOps.jaccardLinkpredFrom(edges, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    spark.catalog.clearCache()
    assert(got == Seq((1L, 2L, 2L, 1.0)), got.toList)
  }

  test("hits: planted bipartite star ranks the shared supplier as top " +
      "authority and the two-supplier customer as top hub, matching an " +
      "integer replay") {
    import spark.implicits._
    // customers 1,2,3; suppliers 10,20. Supplier 10 serves everyone;
    // only customer 1 also buys from 20.
    val edges = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 20L))
      .toDF("c", "s")
    val got = GraphOps.hitsFrom(edges, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    spark.catalog.clearCache()
    // replay: two L1-normalized rounds of the exact integer recurrence
    val e = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 20L))
    def norm(m: Map[Long, BigInt]): Map[Long, Long] = {
      val tot = m.values.sum
      m.map { case (k, v) => k -> ((v * 1000000000L) / tot).toLong }
    }
    var a: Map[Long, Long] = Map(10L -> 1L, 20L -> 1L)
    var h: Map[Long, Long] = Map.empty
    for (_ <- 1 to 2) {
      h = norm(e.groupBy(_._1).map { case (c, es) =>
        c -> es.map(x => BigInt(a(x._2))).sum })
      a = norm(e.groupBy(_._2).map { case (s, es) =>
        s -> es.map(x => BigInt(h(x._1))).sum })
    }
    val wantHubs = h.toSeq.map { case (c, v) => ("hub", c, v) }
      .sortBy(x => (-x._3, x._2))
    val wantAuth = a.toSeq.map { case (s, v) => ("authority", s, v) }
      .sortBy(x => (-x._3, x._2))
    assert(got == (wantAuth ++ wantHubs), got.toList)
    // structural readout: the expected winners
    assert(got.head == wantAuth.head && wantAuth.head._2 == 10L)
    assert(wantHubs.head._2 == 1L)
  }

  test("assortativity: a star is exactly -1, a perfect matching is " +
      "degree-constant (NaN-free guard: matching uses two degrees)") {
    import spark.implicits._
    // K1,3: every edge joins degree 3 to degree 1 -> r = -1 exactly
    // (all sufficient statistics are small exact integers)
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val gotS = GraphOps.assortativityFrom(star).collect()(0)
    assert(gotS.getLong(0) == 6L && gotS.getDouble(1) == -1.0, gotS)
    // path P3 (1-2, 2-3): pairs mix degrees 1 and 2; replay the formula
    val path = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val gotP = GraphOps.assortativityFrom(path).collect()(0)
    val pairs = Seq((1, 2), (2, 1), (2, 1), (1, 2)) // (dx, dy) per dir edge
    val n = pairs.size.toDouble
    val sx = pairs.map(_._1).sum.toDouble
    val sy = pairs.map(_._2).sum.toDouble
    val sxy = pairs.map(p => p._1 * p._2).sum.toDouble
    val sxx = pairs.map(p => p._1 * p._1).sum.toDouble
    val syy = pairs.map(p => p._2 * p._2).sum.toDouble
    val r = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    assert(gotP.getLong(0) == 4L && gotP.getDouble(1) == r, gotP)
  }

  test("scc: planted 4-cycle, 2-cycle, and tail resolve exactly") {
    import spark.implicits._
    // count prefs (customers) and qty prefs (suppliers) disagree on the
    // (10, 11) x (10, 11) block -> a genuine 4-cycle c10-s10-c11-s11;
    // c12 is a tail INTO the cycle; (20, 20) is an isolated mutual pair
    val pairs = Seq(
      (10L, 10L, 9L, 1L), (10L, 11L, 1L, 9L),
      (11L, 10L, 1L, 9L), (11L, 11L, 9L, 1L),
      (12L, 10L, 5L, 1L),
      (20L, 20L, 3L, 3L)).toDF("c", "s", "cnt", "qty")
    val got = GraphOps.sccFrom(pairs, doublings = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    // 4-cycle nodes: c10=20, s10=21, c11=22, s11=23 -> id 20, size 4;
    // 2-cycle nodes: c20=40, s20=41 -> id 40, size 2; the tail node
    // c12=24 is a singleton SCC and is not reported
    assert(got == Seq((20L, 4L, 2L, 2L), (40L, 2L, 1L, 1L)), got.toString)
  }

  test("ppr: planted path ranks by seed proximity; exact integer replay") {
    import spark.implicits._
    // path 0-2-4-6 plus isolated 8; teleport set = {0}
    val edges = Seq((0L, 2L), (2L, 4L), (4L, 6L)).toDF("src", "dst")
    val nodes = Seq((0L, true), (2L, false), (4L, false), (6L, false),
      (8L, false)).toDF("node", "seed")
    val got = GraphOps.pprFrom(edges, nodes, iters = 3, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // driver-side replay of the exact integer iteration
    val adj = Map(0L -> Seq(2L), 2L -> Seq(0L, 4L), 4L -> Seq(2L, 6L),
      6L -> Seq(4L), 8L -> Seq.empty[Long])
    var pr = adj.keys.map(n =>
      n -> (if (n == 0L) GraphOps.Scale else 0L)).toMap
    for (_ <- 1 to 3) {
      val contrib = scala.collection.mutable.Map[Long, Long]()
        .withDefaultValue(0L)
      for ((n, ns) <- adj; m <- ns) contrib(m) += pr(n) / ns.size
      pr = adj.keys.map(n => n ->
        ((if (n == 0L) GraphOps.Base else 0L) + 85L * contrib(n) / 100L))
        .toMap
    }
    val want = pr.toSeq.sortBy { case (n, p) => (-p, n) }.take(5)
    assert(got == want, s"got=$got want=$want")
    // teleport locality: every node connected to the seed carries rank
    // (decaying over hops — though an odd iteration count on a path
    // legitimately concentrates mass on the seed's neighbor, so no
    // strict seed-first ordering is asserted); the isolated non-seed
    // node holds exactly zero — the defining PPR property vs global
    // PageRank, which gives every node base mass
    val rank = got.toMap
    assert(Seq(0L, 2L, 4L, 6L).forall(rank(_) > 0L), got.toString)
    assert(rank(8L) == 0L, got.toString)
  }

  test("reliable checkpointing: spark.graft.checkpointDir switches the " +
      "iterative lineage cuts to DFS checkpoints with identical results") {
    import spark.implicits._
    val pairs = Seq(
      (10L, 10L, 9L, 1L), (10L, 11L, 1L, 9L),
      (11L, 10L, 1L, 9L), (11L, 11L, 9L, 1L),
      (12L, 10L, 5L, 1L),
      (20L, 20L, 3L, 3L)).toDF("c", "s", "cnt", "qty")
    def run() = GraphOps.sccFrom(pairs, doublings = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val base = run()
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt")
    spark.conf.set(graft.ops.Checkpoints.DirConf, dir.toString)
    try {
      assert(run() == base)
      // the cuts really went to the reliable directory, not local blocks
      val nFiles = java.nio.file.Files.walk(dir)
        .filter(p => java.nio.file.Files.isRegularFile(p)).count()
      assert(nFiles > 0, s"no checkpoint files under $dir")
    } finally spark.conf.unset(graft.ops.Checkpoints.DirConf)
  }

  test("scc: derived doubling count converges on a planted >32k-node tail " +
      "(would be silently wrong under the old fixed K = 15)") {
    import org.apache.spark.sql.functions._
    // a single 40,002-node functional path c_0→s_0→c_1→…→c_N→s_N→c_N
    // ending in a {c_N, s_N} 2-cycle: tail length 2N = 40,000 exceeds
    // 2^15, so only a K derived from the node count (here ⌈log₂ 40002⌉
    // = 16) lands every node on the cycle
    val n = 20000L
    // c_i's top supplier by cnt is s_i; s_i's top customer by qty is
    // c_{i+1}, except s_N whose only (and top) customer is c_N
    val self = spark.range(0, n + 1).select(col("id").as("c"),
      col("id").as("s"), lit(9L).as("cnt"),
      when(col("id") === n, 9L).otherwise(1L).as("qty"))
    val next = spark.range(0, n).select((col("id") + 1).as("c"),
      col("id").as("s"), lit(1L).as("cnt"), lit(9L).as("qty"))
    val got = GraphOps.sccFrom(self.union(next)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    // the only SCC is the terminal 2-cycle {c_N = 2N, s_N = 2N+1}
    assert(got == Seq((2 * n, 2L, 1L, 1L)), got.toString)
  }

  test("scc on the trade graph matches a driver-side cycle walk") {
    // independent ground truth: collect the pair table, build f in
    // Scala, walk every node to its cycle, and summarize
    import org.apache.spark.sql.functions._
    val t = graft.ops.Tables(spark, sfDir)
    val pairs = t.orders
      .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast("long")).as("qty"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val fc = pairs.groupBy(_._1).map { case (c, ps) =>
      2 * c -> (2 * ps.minBy(p => (-p._3, p._2))._2 + 1)
    }
    val fs = pairs.groupBy(_._2).map { case (s, ps) =>
      (2 * s + 1) -> 2 * ps.minBy(p => (-p._4, p._1))._1
    }
    val f = fc ++ fs
    // cycle membership: iterate to the cycle, check return
    def onCycle(v: Long): Boolean = {
      var slow = v; var fast = f(v)
      while (slow != fast) { slow = f(slow); fast = f(f(fast)) }
      // slow is on the cycle; v is on it iff walking the cycle hits v
      var u = f(slow); var hit = slow == v
      while (u != slow) { hit ||= u == v; u = f(u) }
      hit
    }
    val cyc = f.keys.filter(onCycle).toSet
    def cycleOf(v: Long): Seq[Long] = {
      val b = collection.mutable.ArrayBuffer(v); var u = f(v)
      while (u != v) { b += u; u = f(u) }
      b.toSeq
    }
    val want = cyc.map(v => cycleOf(v).min).toSeq.distinct.sorted.map {
      id =>
        val c = cycleOf(id)
        (id, c.size.toLong, c.count(_ % 2 == 0).toLong,
          c.count(_ % 2 == 1).toLong)
    }
    val got = GraphOps.queries("graph_scc")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == want, s"got=$got want=$want")
    assert(got.nonEmpty, "a functional graph always has at least one cycle")
    // bipartite alternation: every cycle has equal customer/supplier runs
    got.foreach { case (_, size, nc, ns) =>
      assert(nc == ns && nc + ns == size)
    }
  }

  test("modularity: sufficient statistics match a BigInt replay of the " +
      "partition, degrees tile 2m, and Q is in range") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // a planted barbell: two triangles joined by one bridge — label prop
    // resolves two communities and the hand formula is checkable
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("u", "v")
    val labels = graft.ops.GraphOps.labelPropagationFrom(edges, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = graft.ops.GraphOps.modularityFrom(edges, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    val es = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L))
    val m = es.size.toLong
    val deg = es.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = labels.values.toSeq.distinct.sorted.map { c =>
      val nodes = labels.filter(_._2 == c).keySet
      val dC = nodes.toSeq.map(deg).sum
      val eC = es.count(e => nodes(e._1) && nodes(e._2)).toLong
      (c, nodes.size.toLong, dC, eC,
        (BigInt(4 * m) * BigInt(eC) - BigInt(dC) * BigInt(dC)).toDouble /
          (4.0 * m.toDouble * m.toDouble))
    }
    assert(got.toSeq == want, s"got=${got.toSeq} want=$want")
    // degrees tile every edge twice; total Q positive for real structure
    assert(got.map(_._3).sum == 2 * m)
    val q = got.map(_._5).sum
    assert(q > 0.2 && q <= 1.0, s"Q=$q")
    spark.catalog.clearCache()
    // and on the sf corpus: a valid partition readout end-to-end
    val sf = graft.ops.GraphOps.queries("graph_modularity")(spark, sfDir)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getDouble(4)))
    val mSf = sf.map(_._1).sum / 2
    assert(sf.map(_._2).sum <= mSf && sf.nonEmpty)
    val qSf = sf.map(_._3).sum
    assert(qSf > -0.5 && qSf <= 1.0, s"Q=$qSf")
    spark.catalog.clearCache()
  }

  test("closeness: seeded 6-hop ball scores match a driver-side BFS " +
      "replay with the WF normalization") {
    import org.apache.spark.sql.functions._
    val it = graft.ops.Tables(spark, sfDir).lineitem
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = it.groupBy(_._1).values
    val e0 = byOrder.flatMap { ps =>
      val parts = ps.map(_._2).toSeq
      for (a <- parts; b <- parts if a < b) yield (a, b)
    }.toSeq.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val adj = (e0 ++ e0.map(_.swap)).groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val nodes = adj.keySet
    val seeds = nodes.toSeq.sorted.take(5)
    val want = seeds.map { s0 =>
      var dist = Map(s0 -> 0)
      var frontier = Set(s0)
      for (step <- 1 to 6) {
        frontier = frontier.flatMap(adj(_)).filterNot(dist.contains)
        dist ++= frontier.map(_ -> step)
      }
      val r = dist.size - 1
      val sumD = dist.values.sum.toLong
      (s0, r.toLong, sumD,
        (r.toLong * r).toDouble / ((nodes.size - 1L) * sumD).toDouble)
    }
    val got = graft.ops.GraphOps.queries("graph_closeness")(spark, sfDir)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == want, s"got=$got want=$want")
    // the ball is non-trivial: every seed reaches beyond its neighbors
    assert(got.forall(g => g._2 > adj(g._1).size))
    spark.catalog.clearCache()
  }

  test("path counts: sigma matches a driver-side Brandes forward pass " +
      "and distances agree with graph_bfs_hops on the same graph") {
    val it = graft.ops.Tables(spark, sfDir).lineitem
      .select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairCnt = it.groupBy(_._1).values.toSeq.flatMap { rows =>
      val ps = rows.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.size) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size).toMap
    val und = pairCnt.filter(_._2 >= 2).keys.toSeq
      .flatMap(p => Seq(p, p.swap))
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val seed = und.map(_._1).min
    var dist = Map(seed -> 0)
    var sigma = Map(seed -> 1L)
    for (step <- 1 to 4) {
      val frontier = dist.collect { case (n, d) if d == step - 1 => n }
      val contrib = frontier.toSeq
        .flatMap(u => adj.getOrElse(u, Seq()).map(v => v -> sigma(u)))
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        .filter { case (v, _) => !dist.contains(v) }
      dist ++= contrib.keys.map(_ -> step)
      sigma ++= contrib
    }
    val want = dist.keys.toSeq.sorted.map(n => (n, dist(n), sigma(n)))
    val got = graft.ops.GraphOps.queries("graph_path_counts")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == want, s"got=${got.take(5)} want=${want.take(5)}")
    // distances agree with the BFS operator over the identical graph
    val bfs = graft.ops.GraphOps.queries("graph_bfs_hops")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.forall { case (n, d, _) => bfs(n) == d })
    // path multiplicity is real on this graph: some node has sigma > 1
    assert(got.exists(_._3 > 1L), "no shortest-path multiplicity at all")
    spark.catalog.clearCache()
  }

  test("ktruss: three peel rounds reach the true fixpoint, every edge " +
      "keeps >= 1 supporting triangle, and the truss prunes real edges") {
    val it = graft.ops.Tables(spark, sfDir).lineitem
      .select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val e0 = it.groupBy(_._1).values.toSeq.flatMap { rows =>
      val ps = rows.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.size) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size).toMap
      .filter(_._2 >= 2).keys.toSet
    def peel(es: Set[(Long, Long)]): Set[(Long, Long)] = {
      val adj = (es.toSeq ++ es.toSeq.map(_.swap))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      es.filter { case (u, v) => (adj(u) & adj(v)).nonEmpty }
    }
    // peel to the TRUE fixpoint, counting rounds
    var cur = e0
    var rounds = 0
    var prev = Set.empty[(Long, Long)]
    while (cur != prev) { prev = cur; cur = peel(cur); rounds += 1 }
    assert(rounds <= 3, s"fixpoint needs $rounds rounds — raise the cap")
    val adj = (cur.toSeq ++ cur.toSeq.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val want = cur.toSeq.sorted.map { case (u, v) =>
      (u, v, (adj(u) & adj(v)).size.toLong)
    }
    val got = graft.ops.GraphOps.queries("graph_ktruss")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want, s"got=${got.take(3)} want=${want.take(3)}")
    assert(got.forall(_._3 >= 1L))
    // the truss is a strict subgraph on this corpus (peeling bites)
    assert(got.size < e0.size && got.nonEmpty,
      s"truss ${got.size} vs edges ${e0.size}")
    spark.catalog.clearCache()
  }

  test("conductance: barbell communities score cut/min(vol, 2m-vol) " +
      "exactly, and cut edges tile the cross-community edge count") {
    import spark.implicits._
    // two triangles + one bridge: label prop resolves the two triangles;
    // each community: cut = 1 (the bridge), vol = 7 (3 internal edges
    // doubled + the bridge endpoint), 2m - vol = 7 -> conductance 1/7
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("u", "v")
    val got = GraphOps.conductanceFrom(edges, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // labels under the min-tie-break: 1 (left triangle) and 3 (right —
    // the bridge node's label wins the right triangle's argmax)
    assert(got == Seq((1L, 7L, 1L, 1.0 / 7.0), (3L, 7L, 1L, 1.0 / 7.0)),
      got)
    spark.catalog.clearCache()
    // sf corpus: values in range, cut edges tile (each cross edge is
    // counted once per side, so the total is even)
    val sf = GraphOps.queries("graph_conductance")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(sf.nonEmpty)
    assert(sf.forall(r => r._4 >= 0.0 && r._4 <= 1.0))
    assert(sf.map(_._3).sum % 2 == 0, "cut total must be even (2x cross)")
    spark.catalog.clearCache()
  }

  test("resource allocation: a leaf-shared pair outranks a hub-shared " +
      "pair that plain common-neighbor counts tie") {
    import org.apache.spark.sql.functions._
    val it = graft.ops.Tables(spark, sfDir).lineitem
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val e0 = it.groupBy(_._1).values.flatMap { ps =>
      val parts = ps.map(_._2).toSeq
      for (a <- parts; b <- parts if a < b) yield (a, b)
    }.groupBy(identity).view.mapValues(_.size).toMap
      .filter(_._2 >= 2).keys.toSet
    val adj = (e0.toSeq ++ e0.toSeq.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val want = (for {
      u <- adj.keys; z <- adj(u); v <- adj(z)
      if u < v && !e0((u, v))
    } yield (u, v)).toSeq.distinct.map { case (u, v) =>
      val common = (adj(u) & adj(v)).toSeq
      (u, v, common.size.toLong,
        common.map(z => 1000000000000L / adj(z).size).sum)
    }.sortBy { case (u, v, _, ra) => (-ra, u, v) }.take(20)
    val got = GraphOps.queries("graph_resource_alloc")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == want, s"got=${got.take(3)} want=${want.take(3)}")
    // the index quantifies concentration: every score decomposes into
    // its common neighbors' exact reciprocal masses
    assert(got.forall(r => r._4 > 0L && r._4 <= r._3 * 1000000000000L))
    spark.catalog.clearCache()
  }

  test("louvain move: planted misassignment moves with the hand gain, " +
      "and applying any single positive move raises exact modularity") {
    import spark.implicits._
    // two triangles bridged at 3–4; node 3 is misassigned to the RIGHT
    // community {4,5,6} — its only tie there is the bridge, while two
    // ties pull it left: the pass must move 3 to community 1
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("u", "v")
    val part = Seq((1L, 1L), (2L, 1L), (3L, 4L),
      (4L, 4L), (5L, 4L), (6L, 4L)).toDF("node", "label")
    val got = GraphOps.louvainMoveFrom(edges, part)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        BigInt(r.getString(3)).toLong))
    spark.catalog.clearCache()
    val es = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L))
    val m = es.size.toLong
    val labels = Map(1L -> 1L, 2L -> 1L, 3L -> 4L,
      4L -> 4L, 5L -> 4L, 6L -> 4L)
    val deg = es.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    def exactQnum(lab: Map[Long, Long]): BigInt = {
      // Q·(4m²) = Σ_c 4m·e_c − D_c² — exact integers
      lab.values.toSeq.distinct.map { c =>
        val nodes = lab.filter(_._2 == c).keySet
        val eC = es.count(e => nodes(e._1) && nodes(e._2)).toLong
        val dC = nodes.toSeq.map(deg).sum
        BigInt(4 * m) * BigInt(eC) - BigInt(dC) * BigInt(dC)
      }.sum
    }
    // hand replay of every node's best gain against the frozen partition
    val und = es ++ es.map(_.swap)
    val dsum = labels.groupBy(_._2).view
      .mapValues(_.keySet.toSeq.map(deg).sum).toMap
    val want = labels.keys.toSeq.sorted.map { u =>
      val eTo = und.filter(_._1 == u).groupBy(e => labels(e._2))
        .view.mapValues(_.size.toLong).toMap
      val own = labels(u)
      val cands = eTo.keys.filter(_ != own).toSeq.map { c =>
        val g = BigInt(2 * m) *
          BigInt(eTo(c) - eTo.getOrElse(own, 0L)) -
          BigInt(deg(u)) * BigInt(dsum(c) - dsum(own) + deg(u))
        (g, c)
      }
      val best = cands.sortBy { case (g, c) => (-g, c) }.headOption
      best match {
        case Some((g, c)) if g > 0 => (u, own, c, g.toLong)
        case _                     => (u, own, own, 0L)
      }
    }
    assert(got.toSeq == want, s"got=${got.toSeq} want=$want")
    // the planted misassignment moves, and nodes already home stay
    val row3 = got.find(_._1 == 3L).get
    assert(row3._3 == 1L && row3._4 > 0L, s"node 3: $row3")
    assert(got.count(_._4 > 0L) >= 1)
    // Louvain invariant: each positive-gain move, applied ALONE to the
    // frozen partition, strictly raises exact modularity, and the gain
    // numerator IS the Q·(4m²) delta
    got.filter(_._4 > 0L).foreach { case (u, _, to, g) =>
      val before = exactQnum(labels)
      val after = exactQnum(labels.updated(u, to))
      assert(after - before == BigInt(2) * BigInt(g),
        s"node $u: ΔQnum ${after - before} vs 2·gain ${2 * g}")
    }
  }

  test("bottlenecks: path cut-vertex counts both pairs through it; a " +
      "diamond has none; sf corpus rows are within pair bounds") {
    import spark.implicits._
    // path 1–2–3 plus diamond 3–4/3–5–6? keep two shapes separate:
    // seeds are the 3 smallest nodes = 1, 2, 3
    // graph A: path 1–2–3 and detour-free tail — 2 is unavoidable for
    // (1,3); pairs (1,2) and (2,3) have no interior node
    val path = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val gotPath = GraphOps.bottlenecksFrom(path, nSeeds = 3, hops = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(gotPath == Seq((2L, 1L)), s"got=$gotPath")
    // graph B: diamond 1–4–2, 1–5–2 (two parallel shortest paths) plus
    // seed 3 hanging off 4: neither 4 nor 5 is unavoidable for (1,2)
    // (σ=2 splits), but 4 IS for (1,3) and (2,3)
    val diamond = Seq((1L, 4L), (4L, 2L), (1L, 5L), (5L, 2L), (4L, 3L))
      .toDF("u", "v")
    val gotD = GraphOps.bottlenecksFrom(diamond, nSeeds = 3, hops = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(gotD == Seq((4L, 2L)), s"got=$gotD")
    spark.catalog.clearCache()
    // sf corpus: counts bounded by the 3 pairs, no seed reported
    val sf = GraphOps.queries("graph_bottlenecks")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(sf.forall(r => r._2 >= 1L && r._2 <= 3L), sf.take(5))
    spark.catalog.clearCache()
  }
}
