package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import graft.ops.Checkpoints._
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
    },
    // Per-node triangle counts over the co-supply graph (two suppliers
    // linked when they serve the same order — the trade graph itself is
    // bipartite and triangle-free, so the projection onto one side is the
    // graph with community structure). The pair fan-out is bounded by
    // lines-per-order (~7 → ≤21 pairs), so edge building stays linear in
    // the fact table at any scale.
    // Edges keep only STRONG ties — pairs sharing >= 5 distinct orders.
    // Unthresholded, the projection densifies toward the complete graph
    // as the order count outgrows the supplier count (at sf0.1 it IS
    // K_1000: 500k edges, ~1.7e8 oriented wedges, measured 186 s — no
    // triangle algorithm survives a near-complete input). The support
    // threshold is how production co-occurrence analyses (market-basket,
    // co-authorship) keep the projected graph sparse at scale: pair
    // support averages ~18 shared orders at sf0.01 but ~1.8 at sf0.1, so
    // >= 5 keeps the dense-community core and prunes the Poisson tail.
    // The projection itself is built WITHOUT the textbook fact-table
    // self-join: one shuffle gathers each order's distinct supplier set
    // (bounded by lines-per-order), ordered pairs explode from the sorted
    // set in a codegen'd lambda, and pair support is one more shuffle.
    // The self-join form shuffles the fact table twice and re-distincts
    // the pair fan-out — measured 2x slower at sf0.1.
    "graph_triangles" -> { (s, d) =>
      trianglesFrom(cosupplyEdges(Tables(s, d), minSupport = 5), k = 20)
    },
    // Local clustering coefficient over the same strong-tie co-supply
    // graph — the community-density readout next to the raw triangle
    // counts: cc(v) = 2·T(v)/(d(v)·(d(v)−1)), how close each supplier's
    // trade neighborhood is to a clique. Reuses the degree-ordered
    // triangle kernel verbatim (same O(m^1.5) wedge bound) plus one
    // node-sized left join against the degree table; the division is one
    // IEEE op on exact integers. Full node-sized output (graphs shrink
    // to node scale after the kernel; no top-k cherry-picking here
    // because the profile over ALL nodes is the point).
    "graph_clustering_coeff" -> { (s, d) =>
      clusteringCoeffFrom(cosupplyEdges(Tables(s, d), minSupport = 5))
    },
    // Local bridges over the CO-PURCHASE (part) graph — that projection
    // is sparse (parts outnumber suppliers 20:1, so support >= 2 keeps
    // ~3.4k edges over 2k nodes with real triangle structure), where
    // the co-supply graph is near-complete and bridge-free. See
    // [[localBridgesFrom]] for the kernel.
    "graph_local_bridges" -> { (s, d) =>
      localBridgesFrom(copurchaseEdges(Tables(s, d), minSupport = 2))
    },
    // Bipartiteness certificate per component of the same co-purchase
    // projection: its tree-like fringe components are bipartite, the
    // triangle-bearing cores are not — the structural readout a
    // two-mode-vs-one-mode modeling decision reads. See
    // [[bipartiteCheckFrom]] for the doubled-graph reduction. Bench
    // note: the sf0.1 wall time (~8 s) is ITERATION overhead (the
    // pointer-jumping rounds' jobs + checkpoints on a 3.6k-edge graph),
    // not data volume — the fixed per-round cost amortizes at 100 TB
    // where each round moves real data; rounds stay O(log diameter).
    "graph_bipartite_check" -> { (s, d) =>
      bipartiteCheckFrom(copurchaseEdges(Tables(s, d), minSupport = 2))
    },
    // Market-basket association mining: co-purchased part pairs with
    // support ≥ 3 orders, scored by lift = P(ab)/(P(a)·P(b)) — the
    // classic recommendation readout over the order/item bipartite
    // graph. Shape: one equi-join of the distinct (order, part) stream
    // with itself on the ORDER key (a.p < b.p halves the fan-out and
    // canonicalizes the pair), partial+final pair counts, then the two
    // per-item marginals broadcast back onto the ≥3-support survivors —
    // the order key bounds the shuffle and per-basket width bounds the
    // quadratic fan-out (cap hot baskets at 100 TB; TPC-H baskets are
    // ≤7 items). lift divides exact integers, so the doubles are the
    // same IEEE tree on both engines; ties order by the pair key.
    "basket_pair_lift" -> { (s, d) =>
      // r10: the distinct (order, part) stream feeds BOTH self-join
      // sides and the marginal rollup — persist so the fact-table
      // distinct runs once, not three times
      val it = Tables(s, d).lineitem
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
        .distinct()
        .persist()
      val n = Tables(s, d).orders
        .agg(countDistinct(col("o_orderkey")).as("n_orders"))
      val marg = it.groupBy(col("p")).agg(count(lit(1)).as("n_item"))
      val pairs = it.as("a").join(it.as("b"),
          col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
        .groupBy(col("a.p").as("part_a"), col("b.p").as("part_b"))
        .agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= 3)
      pairs
        .join(broadcast(marg.withColumnRenamed("p", "part_a")
          .withColumnRenamed("n_item", "n_a")), Seq("part_a"))
        .join(broadcast(marg.withColumnRenamed("p", "part_b")
          .withColumnRenamed("n_item", "n_b")), Seq("part_b"))
        .crossJoin(broadcast(n))
        .select(col("part_a"), col("part_b"), col("n_ab"), col("n_a"),
          col("n_b"),
          (col("n_ab").cast("double") * col("n_orders").cast("double") /
            (col("n_a").cast("double") * col("n_b").cast("double")))
            .as("lift"))
        .orderBy(col("lift").desc, col("part_a").asc, col("part_b").asc)
    },
    // Single-source BFS distances (≤ 4 hops) over the support-≥2 part
    // co-purchase graph — the third iterative-graph shape next to
    // pointer-jumping components and integer PageRank: frontier-join
    // BFS, the O(diameter)-round form where each round joins ONLY the
    // newest frontier against the edge list (one equi-join shuffle
    // bounded by frontier × degree) and the running distance table is a
    // node-sized min aggregate. The depth cap bounds work on
    // adversarial graphs; the co-purchase graph at support ≥ 2 is
    // genuinely sparse (avg degree ≈ 3), so the frontier expands
    // 1→3→8→29→94 instead of swallowing the graph in one hop (the
    // co-supply graph is near-complete — wrong fixture for BFS). The
    // oracle is the textbook recursive CTE with the same depth cap.
    "graph_bfs_hops" -> { (s, d) =>
      // r10: the inline pair projection was copurchaseEdges(support>=2)
      // verbatim — use the (now persisted) shared builder so the mirror
      // union below reads the cached edge list instead of re-running the
      // fact-table join per branch
      val e0 = copurchaseEdges(Tables(s, d), minSupport = 2)
      val edges = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
        .repartition(col("u")) // per-round frontier-join key (guide §2.4)
        .persist()
      var dist = edges.agg(min(col("u")).as("node"))
        .withColumn("dist", lit(0))
      for (step <- 1 to 4) {
        val next = dist.filter(col("dist") === step - 1).as("f")
          .join(edges.as("e"), col("f.node") === col("e.u"))
          .select(col("e.v").as("node"), lit(step).as("dist"))
        // dist is consumed TWICE per round (frontier filter + union):
        // without a per-round lineage cut, round k's plan holds 2^k
        // copies of round 0 — the sccFrom/graph_path_counts pattern
        dist = dist.union(next)
          .groupBy("node").agg(min(col("dist")).as("dist"))
          .cutLineage()
      }
      dist.orderBy("node")
    },
    // Degree distribution of the support-≥2 part co-purchase graph — the
    // first statistic any graph pipeline computes (sanity check before the
    // O(m^1.5) algorithms run; a heavy tail here is what forces the df-cap
    // / support-threshold designs above). Shape: pair projection (one
    // shuffle on the order key), per-node degree count (one shuffle on the
    // node), then a degree-keyed histogram (one tiny shuffle — at 100 TB
    // the histogram has at most max-degree rows, not node rows).
    "graph_degree_dist" -> { (s, d) =>
      degreeDistFrom(copurchaseEdges(Tables(s, d), minSupport = 2))
    },
    // Common-neighbor link prediction over the same sparse graph: score
    // every NON-adjacent pair by its count of shared neighbors (the
    // classic link-prediction baseline; also the Jaccard/Adamic-Adar
    // numerator). Each common neighbor w of (u, v) contributes exactly
    // one wedge u-w-v, so a self-join of the directed edge list on the
    // center node counts them without a distinct; the u < v guard
    // canonicalizes pairs, and the anti-join removes already-linked
    // pairs. Work is the wedge count Σ deg(w)² — bounded here by the
    // support threshold exactly as in the triangle kernel; every join is
    // an equi-join (center node, then the canonical pair key). Top-20 by
    // score keeps the output fixed-size at any scale
    // (TakeOrderedAndProject, no global sort).
    "graph_common_neighbors" -> { (s, d) =>
      commonNeighborsFrom(copurchaseEdges(Tables(s, d), minSupport = 2),
        k = 20)
    },
    // 3-core extraction by synchronous peeling — the classic dense-region
    // filter a graph pipeline runs before community/embedding work (and
    // the dedup analogue: cores of the near-dup graph are the clusters
    // worth human review). Semantics are FIXED-ROUND on purpose: six
    // synchronous peel rounds (every round drops all nodes whose degree
    // within the surviving set is < 3, simultaneously), then the
    // survivors with their in-core degrees. Fixed rounds make the
    // operator deterministic and oracle-expressible without recursion
    // (DuckDB's recursive CTE can reference the working table only once,
    // but a peel round needs the alive set on BOTH edge endpoints — so
    // the oracle unrolls the same six rounds CTE for CTE); the planted
    // spec shows six rounds reach the true fixpoint on this corpus, and
    // convergence is monotone (peeling can only shrink), so extra rounds
    // are no-ops once converged. Shape: each round is two semi-joins of
    // the edge list against the (node-sized, shrinking) alive set plus
    // one partial+final count — O(rounds × m) total, every join an
    // equi-join on a node key; no driver round-trips, no collect.
    "graph_kcore" -> { (s, d) =>
      kcoreFrom(copurchaseEdges(Tables(s, d), minSupport = 2),
        k = 3, rounds = 6)
    },
    // Deterministic 3-step random walks from EVERY node of the sparse
    // co-purchase graph — the node2vec/DeepWalk sampling primitive that
    // feeds graph-embedding training (the graph analog of the corpus
    // sampling ops in DataOps). True RNG cannot be oracle-gated (and at
    // 100 TB makes reruns non-reproducible across cluster sizes — the
    // same argument as the integer PageRank), so the neighbor choice is
    // a HASH-SEEDED pick: from node u at step t, walk to the neighbor v
    // minimizing (1000003·u + 7919·t + v) mod 1000000007 — a fixed
    // mixing function both engines evaluate in exact 64-bit arithmetic
    // (injective in v for fixed (u, t) since v < p, so no ties; the id
    // tiebreak is still pinned for safety). Each step is one
    // frontier⋈edges equi-join plus a struct-min argmax that collapses
    // map-side — O(steps × m), no driver round-trips; the walk table
    // stays node-sized because every start's walk is deterministic.
    "graph_random_walk" -> { (s, d) =>
      randomWalkFrom(copurchaseEdges(Tables(s, d), minSupport = 2),
        steps = 3)
    },
    // Jaccard-coefficient link prediction over the same sparse graph —
    // the normalized upgrade of graph_common_neighbors: score non-
    // adjacent pairs by |N(u)∩N(v)| / |N(u)∪N(v)| = common /
    // (deg(u) + deg(v) − common), which de-biases the raw wedge count
    // toward hubs. Reuses the wedge self-join (equi-join on the center
    // node) for the intersection and broadcasts the node-sized degree
    // table twice for the union; the score is ONE IEEE division of
    // exact integers, so ordering is engine-portable. Top-20 keeps the
    // output fixed-size at any scale (TakeOrderedAndProject).
    "graph_jaccard_linkpred" -> { (s, d) =>
      jaccardLinkpredFrom(copurchaseEdges(Tables(s, d), minSupport = 2),
        k = 20)
    },
    // Resource-allocation link prediction (Zhou, Lü & Zhang 2009) —
    // RA(u,v) = Σ_{z ∈ N(u)∩N(v)} 1/deg(z): common neighbors weighted
    // by how CONCENTRATED each shared neighbor's attention is, the index
    // that beats plain counts and Jaccard when hubs dominate (a shared
    // hub is weak evidence, a shared leaf strong). Summing reciprocals
    // is order-sensitive IEEE, so the weight is the EXACT integer
    // 10¹² div deg(z) (floor) — the scaled sum is association-free and
    // hash-gateable; ranking by it equals ranking by the true RA up to
    // the 1e-12 quantization. Same wedge-join + anti-join shape as the
    // Jaccard row; the per-wedge weight joins the node-sized degree
    // table on the CENTER node before grouping.
    "graph_resource_alloc" -> { (s, d) =>
      // edge list persisted once: it feeds the degree rollup, BOTH wedge
      // sides, and the known-edge anti-join (4 consumers — the
      // graph_triangles persist contract)
      val e0 = copurchaseEdges(Tables(s, d), minSupport = 2) // builder persists
      val e = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
        .persist()
      val deg = e.groupBy(col("u").as("z")).agg(count(lit(1)).as("dz"))
      e.as("a").join(e.as("b"),
          col("a.v") === col("b.u") && col("a.u") < col("b.v"))
        .select(col("a.u").as("u"), col("b.v").as("v"), col("a.v").as("z"))
        .join(deg, "z")
        .groupBy("u", "v")
        .agg(count(lit(1)).as("n_common"),
          sum(expr("1000000000000 div dz")).as("ra_scaled"))
        .join(e0, Seq("u", "v"), "left_anti")
        .orderBy(col("ra_scaled").desc, col("u").asc, col("v").asc)
        .limit(20)
    },
    // One Borůvka round of minimum-spanning-forest construction — the
    // selection step of the ONLY MST algorithm that parallelizes cleanly
    // (each round halves the component count, so a full MST is O(log n)
    // such rounds + the pointer-jumping contraction already demonstrated
    // in dedup_components): every node simultaneously picks its minimum-
    // weight incident edge under the total order (w, u, v) — the
    // deterministic tie-break that makes Borůvka correct on non-distinct
    // weights — and the union of picks (each edge chosen by one or both
    // endpoints, dedup'd) is a forest joining every node. Weights are a
    // fixed public mixing function of the canonical edge key, exact in
    // 64-bit on both engines. Shape: one edge-list mirror, one struct-min
    // argmin per node (collapses map-side), one distinct — two shuffles
    // total regardless of graph size.
    "graph_mst_round" -> { (s, d) =>
      mstRoundFrom(copurchaseEdges(Tables(s, d), minSupport = 2))
    },
    // Synchronous label propagation (3 rounds) — the near-linear
    // community detector (Raghavan et al. 2007), made DETERMINISTIC so
    // it can be oracle-gated: every node simultaneously adopts the
    // smallest among its neighbors' most frequent labels (classic LPA
    // breaks ties randomly — min-on-ties is the reproducible-at-scale
    // choice, like the min-label convention in the components kernel).
    // Labels start as node ids. Each round is one edges⋈labels equi-join
    // (labels are node-sized), a (node, label) count, and a struct-max
    // argmax that collapses map-side — O(rounds × m), no driver
    // round-trips. Fixed rounds for the same reason as graph_kcore: the
    // oracle unrolls them CTE for CTE (argmax via row_number).
    "graph_label_propagation" -> { (s, d) =>
      labelPropagationFrom(copurchaseEdges(Tables(s, d), minSupport = 2),
        rounds = 3)
    },
    // Modularity (Newman 2004) of the label-propagation communities —
    // the quality metric the community detector ships without: does the
    // partition beat a random degree-preserving graph? Emitted per
    // community as the EXACT integer sufficient statistics (node count,
    // degree sum, intra-community edge count) plus the one-IEEE-division
    // contribution q_c = (4·m·e_c − d_c²)/(4m²); Σ q_c = Q, the same
    // exact-sufficient-statistic doctrine as graph_assortativity. The
    // cross-product 4·m·e_c is carried in DECIMAL (overflows int64 near
    // 10⁹ edges — the table-checksum lesson). Shape: degrees and
    // intra-edge counts are edge-keyed aggregates; everything after runs
    // label-sized with the 1-row edge total broadcast.
    "graph_modularity" -> { (s, d) =>
      modularityFrom(copurchaseEdges(Tables(s, d), minSupport = 2),
        rounds = 3)
    },
    // Conductance of each label-propagation community — the CUT-quality
    // metric next to modularity's density metric: φ(C) = cut(C) /
    // min(vol(C), 2m − vol(C)), where cut counts edges leaving C and vol
    // sums member degrees. Low conductance = a community that keeps its
    // edges inside — the partition readout spectral methods bound
    // (Cheeger). Exact integer sufficient statistics (cut, vol, 2m) into
    // ONE IEEE division, the modularity doctrine; shape is identical
    // (edge-keyed endpoint tags, label-sized rollup, 1-row edge total
    // broadcast — whitelisted scalar).
    "graph_conductance" -> { (s, d) =>
      conductanceFrom(copurchaseEdges(Tables(s, d), minSupport = 2),
        rounds = 3)
    },
    // HITS hubs & authorities (Kleinberg 1999) on the DIRECTED bipartite
    // trade graph (customer → supplier) — the mutual-reinforcement
    // readout PageRank's single score can't express: a hub customer is
    // one buying from authoritative suppliers, an authority supplier is
    // one bought by hub customers. Two full h/a rounds, EXACT INTEGER:
    // instead of the classic L2 normalization (sqrt of a sum — not
    // bit-portable as a fixpoint), each half-step L1-normalizes to
    // Σ = 10⁹ via v' = (v·10⁹) div Σv with the product and the total in
    // DECIMAL(38,0) (Σv ≤ 10⁹·|E| overflows int64 past ~10⁹ edges; the
    // decimal keeps 38 digits of headroom, same doctrine as the
    // components convergence sum). Each half-step is one edges⋈scores
    // equi-join (scores are node-sized) + a partial+final sum + a
    // broadcast scalar — O(rounds × m) total, no driver round-trips.
    "graph_hits" -> { (s, d) =>
      val e = Tables(s, d).orders
        .join(Tables(s, d).lineitem, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
        .distinct()
      hitsFrom(e, k = 10)
    },
    // Degree assortativity (Newman 2002) of the undirected trade graph —
    // the one-number mixing readout: do high-degree nodes link to other
    // high-degree nodes (r > 0) or to leaves (r < 0)? It is the Pearson
    // correlation of (deg(u), deg(v)) over DIRECTED edge endpoints (both
    // orientations), from the same exact-integer sufficient-statistic
    // doctrine as events_autocorr: five DECIMAL(38,0) sums (Σdxdy ≤
    // m·deg², decimal headroom past int64 at extreme degree), one IEEE
    // combination. Shape: degrees are one edge-keyed count; each edge
    // picks up both endpoint degrees via two node-sized equi-joins; the
    // rollup is a single partial+final aggregate — three shuffles total,
    // all linear in m.
    "graph_assortativity" -> { (s, d) =>
      val e0 = Tables(s, d).orders
        .join(Tables(s, d).lineitem, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      assortativityFrom(e0)
    },
    // Personalized PageRank — the seeded variant behind "related to
    // THESE nodes" rankings (crawl frontier prioritization, related-item
    // panels): teleport mass lands only on a seed set (customers with
    // custkey % 101 = 0 — a deterministic stand-in for the query set),
    // so scores measure proximity to the seeds instead of global
    // importance. Same exact-integer Pregel-as-join-agg machinery as
    // graph_pagerank (bit-identical under any partitioning); the only
    // change is the per-node base term: seeds get 0.15·S, everything
    // else 0, and rank mass decays with hop distance from the seeds.
    "graph_ppr" -> { (s, d) =>
      val t = Tables(s, d)
      val e0 = t.orders
        .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      val nodes = t.customer.select((col("c_custkey") * 2).as("node"))
        .union(t.supplier.select((col("s_suppkey") * 2 + 1).as("node")))
        .withColumn("seed", pmod(col("node"), lit(202L)) === 0)
      pprFrom(e0, nodes, iters = 3, k = 20)
    },
    // Strongly connected components of the FUNCTIONAL trade-preference
    // graph: every trading customer points at their top supplier by
    // lineitem COUNT, every supplier at their top customer by total
    // QUANTITY (ties → smallest key; the metrics must differ — a shared
    // one is a potential along f and collapses all cycles to 2-cycles)
    // — out-degree exactly 1, so the SCCs are precisely the
    // cycles of f, and pointer DOUBLING with a min-carry finds them
    // EXACTLY in ⌈log₂ N⌉ rounds (the directed twin of the
    // dedup_components pointer jumping; a general-graph SCC needs
    // diameter-many forward/backward sweeps — the functional form is
    // the one with a provable log-round bound). After K doublings
    // h = f^(2^K): (a) a node is on a cycle iff it is in the IMAGE of h
    // (2^K ≥ any tail length), and (b) the carried min over the 2^K-step
    // path is then the cycle minimum = the SCC id. K is DERIVED from the
    // node count (K = ⌈log₂ n⌉, one driver-side scalar — the same
    // legitimate convergence-check pattern as dedup_components), so the
    // bound holds at any scale factor; the oracle's fixed 15 doublings
    // agree because the result is K-invariant once 2^K ≥ n. Shape: one
    // fact-table shuffle builds (cust, supp, cnt); two window top-1
    // passes; then K node-sized self-joins with eager checkpoints — at
    // 100 TB the doubling table is node-sized, orders of magnitude
    // smaller than the fact table.
    "graph_scc" -> { (s, d) =>
      val pairs = Tables(s, d).orders
        .join(Tables(s, d).lineitem, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey").as("c"), col("l_suppkey").as("s"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast("long")).as("qty"))
      sccFrom(pairs)
    },
    // Seeded closeness centrality — the "how central is this hub"
    // readout behind influence ranking (Bavelas/Wasserman–Faust, the
    // ≤H-hop ball form a 100 TB run actually uses: exact all-sources
    // closeness is all-pairs BFS, so production computes it from a seed
    // set and a bounded horizon). For each of the 5 smallest nodes:
    // multi-seed frontier-join BFS to 6 hops over the sparse co-purchase
    // graph (one equi-join shuffle per round, the distance table keyed
    // (seed, node) and cut per round), then the WF-normalized score
    // r²/((n−1)·Σd) with r = reached nodes excluding the seed — exact
    // integers into ONE IEEE division. The 6-hop horizon is part of the
    // operator's SEMANTICS (documented ball-closeness, matching the
    // oracle's capped recursion), not a convergence guess.
    "graph_closeness" -> { (s, d) =>
      import Checkpoints.LineageCutOps
      val e0 = copurchaseEdges(Tables(s, d), minSupport = 2)
      val edges = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
        .repartition(col("u")) // per-round frontier-join key (guide §2.4)
        .persist()
      val nodes = edges.select(col("u").as("x")).distinct()
      val n = nodes.agg(count(lit(1)).as("n_nodes"))
      var dist = nodes.orderBy("x").limit(5)
        .select(col("x").as("seed"), col("x").as("node"),
          lit(0).as("dist"))
      for (step <- 1 to 6) {
        val next = dist.filter(col("dist") === step - 1).as("f")
          .join(edges.as("e"), col("f.node") === col("e.u"))
          .select(col("f.seed").as("seed"), col("e.v").as("node"),
            lit(step).as("dist"))
        dist = dist.union(next)
          .groupBy("seed", "node").agg(min(col("dist")).as("dist"))
          .cutLineage() // (seed, node)-sized; feeds filter + union next round
      }
      dist.filter(col("dist") > 0)
        .groupBy("seed")
        .agg(count(lit(1)).as("n_reached"), sum(col("dist")).as("sum_dist"))
        .crossJoin(broadcast(n))
        .select(col("seed"), col("n_reached"), col("sum_dist"),
          ((col("n_reached") * col("n_reached")).cast("double") /
            ((col("n_nodes") - 1L) * col("sum_dist")).cast("double"))
            .as("closeness"))
        .orderBy("seed")
    },
    // Shortest-path COUNTS from a seed (σ in Brandes' betweenness
    // algorithm — the forward pass: σ(v) = Σ σ(u) over v's predecessors
    // on shortest paths) over the support-≥2 co-purchase graph, ≤4 hops
    // like graph_bfs_hops. Distances alone can't rank brokerage; path
    // multiplicity is the input every centrality beyond closeness needs.
    // ALL-INTEGER: σ values are exact long sums, so the result is
    // hash-gateable regardless of partitioning. Shape per round: the
    // newest frontier (only) joins the edge list (one equi-join shuffle
    // bounded by frontier × degree), a dst-keyed partial+final sum
    // accumulates σ, and a node-sized anti-join keeps only UNSEEN nodes
    // (a node first reached at round k has distance k — the BFS
    // invariant that makes the σ recursion correct level by level).
    "graph_path_counts" -> { (s, d) =>
      // r10: inline build was copurchaseEdges(support>=2) verbatim — use
      // the persisted shared builder (see graph_bfs_hops)
      val e0 = copurchaseEdges(Tables(s, d), minSupport = 2)
      val edges = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
        .repartition(col("u")) // per-round frontier-join key (guide §2.4)
        .persist()
      var reach = edges.agg(min(col("u")).as("node"))
        .withColumn("dist", lit(0)).withColumn("sigma", lit(1L))
      for (step <- 1 to 4) {
        val fresh = reach.filter(col("dist") === step - 1).as("f")
          .join(edges.as("e"), col("f.node") === col("e.u"))
          .groupBy(col("e.v").as("node"))
          .agg(sum(col("f.sigma")).as("sigma"))
          .join(reach.select("node"), Seq("node"), "left_anti")
          .select(col("node"), lit(step).as("dist"), col("sigma"))
        // node-sized cut per round — `reach` feeds BOTH the frontier
        // filter and the anti-join; without it each round replans the
        // whole prior chain twice (measured 27 s → ~3 s at sf0.1)
        reach = reach.unionByName(fresh).cutLineage()
      }
      reach.orderBy("node")
    },
    // 3-truss extraction — the EDGE-density filter next to graph_kcore's
    // node filter: keep only edges supported by ≥ 1 triangle (k−2 for
    // k = 3), iterating because removing an unsupported edge can orphan
    // its neighbors' triangles. Trusses are the community-core extractor
    // that survives the "barely attached hub" k-core admits (a hub with
    // many degree-1-style ties has high degree but triangle-free edges).
    // FIXED-ROUND like kcore: three synchronous peel rounds (the spec
    // shows the corpus reaches its fixpoint within them; peeling is
    // monotone, so extra rounds are no-ops), each a wedge equi-join of
    // the surviving edge list against itself — the candidate stream is
    // bounded by Σ deg(u)·deg(v) over surviving edges, kept sparse by
    // the support-≥2 projection exactly as the triangle kernel. Edge-
    // list-sized `cutLineage()` per round (the graph_path_counts
    // lesson: the round frame feeds three consumers).
    "graph_ktruss" -> { (s, d) =>
      var edges = copurchaseEdges(Tables(s, d), minSupport = 2)
        .cutLineage()
      def support(e: DataFrame): DataFrame = {
        val und = e.select(col("u").as("src"), col("v").as("dst"))
          .union(e.select(col("v"), col("u")))
        e.as("e")
          .join(und.as("a"), col("a.src") === col("e.u"))
          .join(und.as("b"),
            col("b.src") === col("e.v") && col("b.dst") === col("a.dst"))
          .groupBy(col("e.u").as("u"), col("e.v").as("v"))
          .agg(count(lit(1)).as("support"))
      }
      for (_ <- 1 to 3) {
        edges = support(edges).filter(col("support") >= 1)
          .select("u", "v").cutLineage()
      }
      support(edges).orderBy("u", "v")
    },
    // One synchronous Louvain refinement pass (Blondel et al. 2008) over
    // the label-propagation partition — the modularity-OPTIMIZING move
    // step graph_modularity only scores: each node weighs moving to a
    // neighboring community by the exact modularity delta
    //   ΔQ ∝ 2m·(e_u→C − e_u→own) − d_u·(D_C − D_own + d_u)
    // (common denominator 2m² dropped — sign and argmax survive), ALL
    // INTEGER via the cross-multiplied numerator (the comparison doctrine
    // of events_bot_flags), carried in DECIMAL(38,0): 2m·e overflows
    // int64 past ~10⁹ edges, the table-checksum lesson. Per-node gains
    // are computed against the FROZEN partition (synchronous variant —
    // each individual move provably improves Q if applied alone, which
    // the spec pins; production Louvain serializes moves, a driver loop
    // this pass is the inner kernel of). Shape: per-(node, neighboring
    // community) edge counts are one edge-keyed aggregate; community
    // degree sums are label-sized; the argmax is a map-side max(struct);
    // the 1-row edge total broadcasts (whitelisted scalar).
    "graph_louvain_move" -> { (s, d) =>
      // persist BEFORE fanning out: the pair-join edge build feeds both
      // the label-propagation substrate and the move pass — unpersisted
      // it would run twice (measured ~30% of the query)
      val e0 = copurchaseEdges(Tables(s, d), minSupport = 2) // builder persists
      louvainMoveFrom(e0, labelPropagationFrom(e0, rounds = 3))
    },
    // Bottleneck (must-pass) nodes between seed pairs — the exact-integer
    // fragment of Brandes betweenness that IS hash-gateable: v lies on
    // EVERY shortest s–t path iff d(s,v)+d(v,t)=d(s,t) AND
    // σ(s,v)·σ(v,t)=σ(s,t) (fractional dependencies δ would need
    // order-sensitive IEEE sums — not portable across engines; the
    // all-paths predicate is pure integers). The readout: per node, how
    // many of the seed pairs it is unavoidable for — cut-vertex risk
    // between those endpoints. 3 seeds (smallest node ids), 4-hop
    // horizon like graph_path_counts; σ tables are one multi-seed
    // forward BFS (seed rides the frontier key), pairs check via two
    // (seed,node)-sized equi-joins; σ products compare in DECIMAL
    // (σ grows multiplicatively with hops).
    "graph_bottlenecks" -> { (s, d) =>
      bottlenecksFrom(copurchaseEdges(Tables(s, d), minSupport = 2),
        nSeeds = 3, hops = 4)
    },
    // Capped eccentricity from the 3 smallest-id seeds — the diameter
    // lower-bound probe (iFUB-style seeding) every graph health check
    // runs before committing to O(n·m) exact diameters: per seed, the
    // max BFS distance within the 4-hop horizon and the reached-set
    // size (a reach far below n flags fragmentation). The multi-seed
    // frontier BFS with the per-round (seed, node)-sized lineage cut —
    // the bottlenecksFrom shape minus the path counting.
    "graph_eccentricity" -> { (s, d) =>
      eccentricityFrom(copurchaseEdges(Tables(s, d), minSupport = 2),
        nSeeds = 3, hops = 4)
    },
    // Two-hop reach — the friend-of-friend audience size behind
    // recommendation fan-out budgeting: per node, |N1| and the EXCLUSIVE
    // |N2| (two-hop neighbors that are not direct neighbors and not the
    // node). One edge self-join (the intrinsic shuffle) + distinct +
    // per-node counts; direct neighbors drop via a left_anti on the edge
    // list. Top-20 by (n2 DESC, node) = TakeOrderedAndProject. At 100 TB
    // the support-2 threshold bounds hub degree like the triangle
    // queries; a production run caps df on the join key first.
    "graph_2hop_reach" -> { (s, d) =>
      val e0 = copurchaseEdges(Tables(s, d), minSupport = 2)
      val und = e0
        .union(e0.select(col("v").as("u"), col("u").as("v")))
        .persist()
      val n1 = und.groupBy("u").agg(count(lit(1)).as("n1"))
      val two = und.as("a").join(und.as("b"), col("a.v") === col("b.u"))
        .select(col("a.u").as("u"), col("b.v").as("w"))
        .filter(col("u") =!= col("w"))
        .distinct()
        .join(und.select(col("u"), col("v").as("w")),
          Seq("u", "w"), "left_anti")
      two.groupBy("u").agg(count(lit(1)).as("n2"))
        .join(n1, "u")
        .select(col("u").as("node"), col("n1"), col("n2"))
        .orderBy(col("n2").desc, col("node").asc)
        .limit(20)
    }
  )

  /** SCC summary of the functional preference graph from a
    * (c, s, cnt, qty) pair table: customers point at their top supplier
    * by lineitem COUNT, suppliers at their top customer by total
    * QUANTITY (see `graph_scc` — the two metrics must differ: a shared
    * metric is a potential function along f and provably collapses every
    * cycle to a mutual-top 2-cycle). Tail nodes are singleton SCCs and
    * are not reported; every reported SCC is a cycle of length >= 2.
    * Separated so the spec can plant pair tables with known cycles.
    *
    * `doublings` <= 0 (the default) derives K = ⌈log₂ n⌉ from the node
    * count — one driver-side scalar count, after which 2^K ≥ n bounds
    * every tail and cycle length, so the fixpoint is provably reached
    * at any scale. A positive value pins K explicitly (specs).
    */
  def sccFrom(pairs: DataFrame, doublings: Int = 0): DataFrame = {
    // r10: `pairs` feeds BOTH window branches (fc, fs) — persist so the
    // upstream pair aggregation runs once, not once per branch
    val pp = pairs.persist()
    val wc = Window.partitionBy("c").orderBy(col("cnt").desc, col("s").asc)
    val ws = Window.partitionBy("s").orderBy(col("qty").desc, col("c").asc)
    val fc = pp.withColumn("rn", row_number().over(wc))
      .filter(col("rn") === 1)
      .select((col("c") * 2).as("node"), (col("s") * 2 + 1).as("ptr"))
    val fs = pp.withColumn("rn", row_number().over(ws))
      .filter(col("rn") === 1)
      .select((col("s") * 2 + 1).as("node"), (col("c") * 2).as("ptr"))
    var g = fc.union(fs)
      .select(col("node"), col("ptr"), least(col("node"), col("ptr")).as("mn"))
      .cutLineage()
    val k =
      if (doublings > 0) doublings
      else { // ceil(log2(n)) over the checkpointed node-sized frame
        val n = math.max(g.count(), 2L)
        64 - java.lang.Long.numberOfLeadingZeros(n - 1L)
      }
    for (_ <- 1 to k)
      // eager node-sized checkpoint per doubling — same lineage-cut
      // rationale as kcoreFrom: g feeds BOTH sides of the self-join
      g = g.as("a")
        .join(g.as("b"), col("a.ptr") === col("b.node"))
        .select(col("a.node").as("node"), col("b.ptr").as("ptr"),
          least(col("a.mn"), col("b.mn")).as("mn"))
        .cutLineage()
    val cyc = g.select(col("ptr").as("node")).distinct()
    g.join(cyc, Seq("node"), "left_semi")
      .groupBy(col("mn").as("scc_id"))
      .agg(count(lit(1)).as("size"),
        count(when(pmod(col("node"), lit(2)) === 0, 1)).as("n_cust"),
        count(when(pmod(col("node"), lit(2)) === 1, 1)).as("n_supp"))
      .orderBy("scc_id")
  }

  /** Per-community conductance of the [[labelPropagationFrom]] partition
    * — see the `graph_conductance` query comment. `edges` must be
    * canonical undirected (u < v, distinct). Separated so specs can
    * plant graphs with hand-computable cuts.
    */
  def conductanceFrom(edges0: DataFrame, rounds: Int): DataFrame = {
    val edges = edges0.persist()
    val labels = labelPropagationFrom(edges, rounds).cutLineage()
    val m = edges.agg(count(lit(1)).as("m_edges"))
    val deg = edges.select(col("u").as("x"))
      .unionAll(edges.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("dg"))
    val vol = deg
      .join(labels.select(col("node").as("x"), col("label")), "x")
      .groupBy("label").agg(sum(col("dg")).as("vol"))
    val cut = edges
      .join(labels.select(col("node").as("u"), col("label").as("lu")), "u")
      .join(labels.select(col("node").as("v"), col("label").as("lv")), "v")
      .filter(col("lu") =!= col("lv"))
    // each cross edge leaves BOTH endpoint communities once
    val cutPer = cut.select(col("lu").as("label"))
      .unionAll(cut.select(col("lv").as("label")))
      .groupBy("label").agg(count(lit(1)).as("cut_edges"))
    vol.join(cutPer, Seq("label"), "left")
      .na.fill(0L, Seq("cut_edges"))
      .crossJoin(broadcast(m))
      .select(col("label"), col("vol"), col("cut_edges"),
        // denominator guard: when LPA collapses to ONE community,
        // least(vol, 2m−vol) = 0 and cut = 0 — Spark double 0/0 is NaN
        // while DuckDB's differs by ieee_floating_point_ops setting;
        // pin 0.0 on both engines (the cosSim zero-norm pattern)
        when(least(col("vol"), col("m_edges") * 2 - col("vol")) === 0,
          lit(0.0))
          .otherwise(col("cut_edges").cast("double") /
            least(col("vol"), col("m_edges") * 2 - col("vol"))
              .cast("double")).as("conductance"))
      .orderBy("label")
  }

  /** One synchronous Louvain move pass over a canonical (u < v, distinct)
    * edge list and a (node, label) partition — see the
    * `graph_louvain_move` query comment. Separated (and taking the
    * partition as an INPUT) so specs can plant a deliberately-suboptimal
    * partition and hand-check the exact gains. Returns
    * (node, from_label, to_label, gain_num) with gain_num = the exact
    * cross-multiplied ΔQ numerator (2m² denominator), 0 when staying.
    */
  def louvainMoveFrom(edges0: DataFrame, partition: DataFrame): DataFrame = {
    val edges = edges0.persist()
    val und = edges.select(col("u").as("src"), col("v").as("dst"))
      .union(edges.select(col("v").as("src"), col("u").as("dst")))
    val labels = partition.cutLineage() // node-sized, read by 3 consumers
    val m = edges.agg(count(lit(1)).as("m_edges"))
    // r10: deg feeds the community-degree rollup AND the gains join;
    // eUC feeds the own-community extract AND the gains join — persist
    // both (node-sized / ≤2m rows) so each aggregate runs once
    val deg = und.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("dg"))
      .persist()
    val dc = labels.join(deg, "node")
      .groupBy("label").agg(sum(col("dg")).as("dsum")) // label-sized
    // per-node edge count into each ADJACENT community (≤ 2m rows total)
    val eUC = und
      .join(labels.select(col("node").as("dst"), col("label").as("cand")),
        "dst")
      .groupBy(col("src").as("node"), col("cand"))
      .agg(count(lit(1)).as("e_uc"))
      .persist()
    val eOwn = eUC.join(labels,
        eUC("node") === labels("node") && eUC("cand") === labels("label"))
      .select(eUC("node"), col("e_uc").as("e_own"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val gains = labels.as("c")
      .join(eUC.as("q"),
        col("q.node") === col("c.node") && col("q.cand") =!= col("c.label"))
      .join(eOwn.as("o"), col("o.node") === col("c.node"), "left")
      .join(deg.as("dg"), col("dg.node") === col("c.node"))
      .join(dc.select(col("label").as("cand"), col("dsum").as("d_cand")),
        Seq("cand"))
      .join(dc.select(col("label"), col("dsum").as("d_own")), Seq("label"))
      .crossJoin(broadcast(m))
      .select(col("c.node").as("node"), col("label"), col("cand"),
        (dec(col("m_edges") * 2) *
          dec(col("e_uc") - coalesce(col("e_own"), lit(0L))) -
          dec(col("dg.dg")) *
            dec(col("d_cand") - col("d_own") + col("dg.dg"))).as("g"))
    val best = gains
      .groupBy("node")
      .agg(max(struct(col("g"), (-col("cand")).as("neg"))).as("b"))
      .select(col("node"), col("b.g").as("g"), (-col("b.neg")).as("cand"))
    // both sides are node-sized and stats-free after the lineage cut —
    // left to itself Spark falls back to a sort-merge join; pin the
    // co-partitioned shuffled-hash shape (one node exchange each side,
    // no sorts) the gate demands
    labels.join(best.hint("shuffle_hash"), Seq("node"), "left")
      .select(col("node"), col("label").as("from_label"),
        when(col("g") > 0, col("cand")).otherwise(col("label"))
          .as("to_label"),
        // exact DECIMAL(38,0) internally, STRING in the OUTPUT: wide
        // decimals canonicalize differently across arrow/duckdb stacks
        // (r6 driver-gate finding — see data_table_checksum)
        coalesce(when(col("g") > 0, col("g")), lit(0L))
          .cast("decimal(38,0)").cast("string").as("gain_num"))
      .orderBy("node")
  }

  /** Multi-seed must-pass-node extraction — see the `graph_bottlenecks`
    * query comment. Seeds are the `nSeeds` smallest node ids; the BFS
    * horizon is `hops` (pairs farther apart are not evaluated, matching
    * the oracle's capped unrolling). Returns (node, n_pairs) for nodes
    * unavoidable on at least one seed pair's shortest paths.
    */
  def bottlenecksFrom(edges0: DataFrame, nSeeds: Int, hops: Int): DataFrame = {
    // cache pre-partitioned on u (guide §2.4): every BFS round joins the
    // frontier on u against this table — one build shuffle buys `hops`
    // round shuffles of the edge side (see pageRankFrom)
    val edges = edges0
      .union(edges0.select(col("v").as("u"), col("u").as("v")))
      .repartition(col("u"))
      .persist()
    val seeds = edges.select(col("u")).distinct()
      .orderBy("u").limit(nSeeds).select(col("u").as("seed"))
    var reach = seeds
      .select(col("seed"), col("seed").as("node"),
        lit(0).as("dist"), lit(1L).as("sigma"))
      .cutLineage()
    for (step <- 1 to hops) {
      val fresh = reach.filter(col("dist") === step - 1).as("f")
        .join(edges.as("e"), col("f.node") === col("e.u"))
        .groupBy(col("f.seed").as("seed"), col("e.v").as("node"))
        .agg(sum(col("f.sigma")).as("sigma"))
        .join(reach.select("seed", "node"), Seq("seed", "node"), "left_anti")
        .select(col("seed"), col("node"), lit(step).as("dist"), col("sigma"))
      // (seed,node)-sized cut per round — the graph_path_counts lesson
      reach = reach.unionByName(fresh).cutLineage()
    }
    val pairs = seeds.as("a")
      .join(seeds.as("b"), col("a.seed") < col("b.seed"))
      .select(col("a.seed").as("s"), col("b.seed").as("t"))
      .join(reach.as("r"),
        col("r.seed") === col("s") && col("r.node") === col("t"))
      .select(col("s"), col("t"),
        col("r.dist").as("d_st"), col("r.sigma").as("s_st"))
    val fromS = reach.select(col("seed").as("s"), col("node"),
      col("dist").as("d_sv"), col("sigma").as("s_sv"))
    val fromT = reach.select(col("seed").as("t"), col("node"),
      col("dist").as("d_tv"), col("sigma").as("s_tv"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    broadcast(pairs)
      .join(fromS, Seq("s"))
      .join(fromT, Seq("t", "node"))
      .filter(col("node") =!= col("s") && col("node") =!= col("t") &&
        col("d_sv") + col("d_tv") === col("d_st") &&
        dec(col("s_sv")) * dec(col("s_tv")) === dec(col("s_st")))
      .groupBy("node").agg(count(lit(1)).as("n_pairs"))
      .orderBy("node")
  }

  /** Capped multi-seed BFS eccentricity — see the `graph_eccentricity`
    * query comment. Seeds are the `nSeeds` smallest node ids; returns
    * (seed, ecc_capped, n_reached) with ecc capped at `hops`. Separated
    * so specs can plant paths/stars with hand-computable eccentricities.
    */
  def eccentricityFrom(edges0: DataFrame, nSeeds: Int, hops: Int)
      : DataFrame = {
    val edges = edges0
      .union(edges0.select(col("v").as("u"), col("u").as("v")))
      .repartition(col("u")) // per-round frontier-join key, see bottlenecksFrom
      .persist()
    val seeds = edges.select(col("u")).distinct()
      .orderBy("u").limit(nSeeds).select(col("u").as("seed"))
    var reach = seeds
      .select(col("seed"), col("seed").as("node"), lit(0).as("dist"))
      .cutLineage()
    for (step <- 1 to hops) {
      val fresh = reach.filter(col("dist") === step - 1).as("f")
        .join(edges.as("e"), col("f.node") === col("e.u"))
        .select(col("f.seed").as("seed"), col("e.v").as("node")).distinct()
        .join(reach.select("seed", "node"), Seq("seed", "node"), "left_anti")
        .select(col("seed"), col("node"), lit(step).as("dist"))
      // (seed, node)-sized cut per round — the graph_path_counts lesson
      reach = reach.unionByName(fresh).cutLineage()
    }
    reach.groupBy("seed")
      .agg(max(col("dist")).as("ecc_capped"),
        count(lit(1)).as("n_reached"))
      .orderBy("seed")
  }

  /** Degree-assortativity coefficient over an undirected edge list given
    * as one orientation — separated so specs can plant graphs with known
    * mixing (a star is maximally disassortative as k grows).
    * CACHE LIFETIME CONTRACT (as [[pageRankFrom]]): persists the caller's
    * edge frame; release is the harness's per-query `clearCache()`.
    */
  def assortativityFrom(edges: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // r10: the caller's fact-table edge build feeds both mirror-union
    // branches, and the mirrored `e` feeds the degree rollup AND the
    // pair join — persist both (edge-sized) so the build runs once
    val e0 = edges.persist()
    val e = e0.select(col("src"), col("dst"))
      .union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .persist()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val pairs = e.join(deg, "src")
      .withColumnRenamed("deg", "dx")
      .join(deg.withColumnRenamed("src", "dst")
        .withColumnRenamed("deg", "dy"), "dst")
      .select(col("dx"), col("dy"))
    val g = pairs.agg(count(lit(1)).as("n_dir_edges"),
      sum(col("dx").cast(DecimalType(38, 0))).as("sx"),
      sum(col("dy").cast(DecimalType(38, 0))).as("sy"),
      sum((col("dx") * col("dy")).cast(DecimalType(38, 0))).as("sxy"),
      sum((col("dx") * col("dx")).cast(DecimalType(38, 0))).as("sxx"),
      sum((col("dy") * col("dy")).cast(DecimalType(38, 0))).as("syy"))
    val nd = col("n_dir_edges").cast("double")
    g.select(col("n_dir_edges"),
      ((nd * col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double")) /
        (sqrt(nd * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double")) *
         sqrt(nd * col("syy").cast("double") -
          col("sy").cast("double") * col("sy").cast("double"))))
        .as("assortativity"))
  }

  /** Two integer HITS rounds over a bipartite (c, s) edge list; top-`k`
    * hubs and authorities. Separated so specs can plant star graphs with
    * known hub/authority structure.
    */
  def hitsFrom(edges: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val e = edges.persist()
    def normalize(df0: DataFrame, id: String): DataFrame = {
      // the raw half-step aggregate feeds BOTH the 1-row L1 total and
      // the normalized select — eager localCheckpoint (node-sized)
      // truncates the lineage so the edges join behind it runs exactly
      // once, not once per consumer. r11 (VERDICT r10 #8): the L1 total
      // is one SYNCHRONOUS scalar collect over the checkpointed
      // node-sized frame, injected as a LITERAL — the per-half-step
      // broadcast build (and the outer lineage cut the broadcast forced
      // at every call site) are gone; the output is a trivial projection
      // of the checkpointed frame, cheap to recompute per consumer.
      // (First tried observe() on the checkpoint job — works, but
      // obs.get waits on the ASYNC listener bus, measured slower than
      // the tiny collect under 32-core task storms.) Same DECIMAL(38,0)
      // integral divide, bit-identical scores.
      val df = df0.cutLineage()
      val tot = Option(
        df.agg(sum(col("v").cast(DecimalType(38, 0))).as("tot"))
          .collect()(0).getDecimal(0))
        .map(_.toPlainString).getOrElse("NULL")
      df.select(col(id),
        expr(s"CAST(v AS DECIMAL(38,0)) * 1000000000 div " +
          s"CAST($tot AS DECIMAL(38,0))").as("v"))
    }
    var a = e.select(col("s")).distinct().withColumn("v", lit(1L))
    var h: DataFrame = null
    for (_ <- 1 to 2) {
      h = normalize(e.join(a, "s").groupBy("c")
        .agg(sum(col("v").cast(DecimalType(38, 0))).as("v")), "c")
      a = normalize(e.join(h, "c").groupBy("s")
        .agg(sum(col("v").cast(DecimalType(38, 0))).as("v")), "s")
    }
    val hubs = h.orderBy(col("v").desc, col("c").asc).limit(k)
      .select(lit("hub").as("role"), col("c").as("id"),
        col("v").as("score"))
    val auths = a.orderBy(col("v").desc, col("s").asc).limit(k)
      .select(lit("authority").as("role"), col("s").as("id"),
        col("v").as("score"))
    hubs.unionAll(auths)
      .orderBy(col("role"), col("score").desc, col("id").asc)
  }

  /** `rounds` synchronous peel rounds toward the k-core of a canonical
    * (u < v, distinct) edge list; returns survivors with their in-core
    * degree. See the `graph_kcore` query comment for the fixed-round
    * semantics.
    */
  def kcoreFrom(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    // pre-partitioned on src (guide §2.4): every peel round's in-core
    // degree count groups by src, so the aggregate exchange is satisfied
    // by the cache layout in all `rounds` rounds — see pageRankFrom
    val und = edges.select(col("u").as("src"), col("v").as("dst"))
      .union(edges.select(col("v").as("src"), col("u").as("dst")))
      .repartition(col("src"))
      .persist()
    def degIn(alive: DataFrame): DataFrame = und
      .join(alive.select(col("node").as("src")), Seq("src"), "left_semi")
      .join(alive.select(col("node").as("dst")), Seq("dst"), "left_semi")
      .groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    var alive = und.select(col("src").as("node")).distinct()
    for (_ <- 1 to rounds)
      // eager node-sized checkpoint per round: degIn consumes `alive`
      // in TWO semi-joins, so a lazy chain re-executes every earlier
      // round 2^rounds times (measured 26 s at sf0.1 for three rounds;
      // a few seconds with the lineage cut per round)
      alive = degIn(alive).filter(col("deg") >= k).select("node")
        .cutLineage()
    degIn(alive).withColumnRenamed("deg", "core_deg").orderBy("node")
  }

  /** `rounds` synchronous LPA rounds over a canonical (u < v, distinct)
    * edge list; labels start as node ids, ties break to the SMALLEST
    * most-frequent neighbor label. Returns (node, label) ordered by node.
    */
  def labelPropagationFrom(edges: DataFrame, rounds: Int): DataFrame = {
    // pre-partitioned on dst (guide §2.4): each round joins the edge list
    // on dst against the label table — the cache layout feeds that join's
    // edge side every round without re-shuffling it
    val und = edges.select(col("u").as("src"), col("v").as("dst"))
      .union(edges.select(col("v").as("src"), col("u").as("dst")))
      .repartition(col("dst"))
      .persist()
    var labels = und.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    for (_ <- 1 to rounds) {
      labels = und
        .join(labels, und("dst") === labels("node"))
        .groupBy(col("src"), col("label"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("src").as("node"))
        .agg(max(struct(col("n"), (-col("label")).as("neg"))).as("m"))
        .select(col("node"), (-col("m.neg")).as("label"))
        // single-reference loop (no recompute blow-up), but an uncut
        // r-round chain grows superlinear analysis/codegen cost and is
        // stats-opaque to AQE — cut the node-sized frame per round
        .cutLineage()
    }
    labels.orderBy("node")
  }

  /** Per-community modularity contributions of the
    * [[labelPropagationFrom]] partition — see the `graph_modularity`
    * query comment. `edges` must be canonical undirected (u < v,
    * distinct).
    */
  def modularityFrom(edges0: DataFrame, rounds: Int): DataFrame = {
    val edges = edges0.persist()
    // node-sized partition read by THREE consumers (degree rollup + both
    // endpoint tags) — cut the 3-round propagation lineage once, or each
    // consumer replans the full chain (measured 156 scans in the
    // un-cut plan)
    val labels = labelPropagationFrom(edges, rounds).cutLineage()
    val m = edges.agg(count(lit(1)).as("m_edges"))
    val deg = edges.select(col("u").as("x"))
      .unionAll(edges.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("dg"))
    val dc = deg.join(labels.select(col("node").as("x"), col("label")), "x")
      .groupBy("label")
      .agg(count(lit(1)).as("n_nodes"), sum(col("dg")).as("degree_sum"))
    val ic = edges
      .join(labels.select(col("node").as("u"), col("label").as("lu")), "u")
      .join(labels.select(col("node").as("v"), col("label").as("lv")), "v")
      .filter(col("lu") === col("lv"))
      .groupBy(col("lu").as("label")).agg(count(lit(1)).as("intra_edges"))
    dc.join(ic, Seq("label"), "left")
      .na.fill(0L, Seq("intra_edges"))
      .crossJoin(broadcast(m))
      .select(col("label"), col("n_nodes"), col("degree_sum"),
        col("intra_edges"),
        (((col("m_edges") * 4).cast("decimal(19,0)") *
          col("intra_edges").cast("decimal(19,0)") -
          col("degree_sum").cast("decimal(19,0)") *
            col("degree_sum").cast("decimal(19,0)")).cast("double") /
          (lit(4.0) * col("m_edges").cast("double") *
            col("m_edges").cast("double"))).as("q_contrib"))
      .orderBy("label")
  }

  /** Deterministic hash-seeded random walks (see the `graph_random_walk`
    * query comment): `steps` synchronous steps from every node of a
    * canonical (u < v, distinct) edge list. Returns
    * (start, s1, ..., s_steps) ordered by start. Every node of the edge
    * list has >= 1 neighbor by construction, so walks never die.
    */
  def randomWalkFrom(edges: DataFrame, steps: Int): DataFrame = {
    val und = edges.select(col("u").as("src"), col("v").as("dst"))
      .union(edges.select(col("v").as("src"), col("u").as("dst")))
      .persist()
    var w = und.select(col("src").as("start")).distinct()
      .withColumn("cur", col("start"))
    var carried = Seq("start")
    for (t <- 1 to steps) {
      val mix = (lit(1000003L) * col("src") + lit(7919L * t) + col("dst")) %
        lit(1000000007L)
      val stepCol = s"s$t"
      w = w.join(und, w("cur") === und("src"))
        .groupBy(carried.map(col): _*)
        .agg(min(struct(mix.as("m"), col("dst").as("v"))).as("pick"))
        .select(carried.map(col) :+ col("pick.v").as(stepCol): _*)
        .withColumn("cur", col(stepCol))
      carried = carried :+ stepCol
    }
    w.select(carried.map(col): _*).orderBy("start")
  }

  /** Jaccard link-prediction scores of non-adjacent pairs over a
    * canonical edge list (see the `graph_jaccard_linkpred` query
    * comment), top `k`.
    */
  def jaccardLinkpredFrom(e0: DataFrame, k: Int): DataFrame = {
    val e = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
    val deg = e.groupBy(col("u").as("x")).agg(count(lit(1)).as("dg"))
    val cand = e.as("a").join(e.as("b"),
        col("a.v") === col("b.u") && col("a.u") < col("b.v"))
      .groupBy(col("a.u").as("u"), col("b.v").as("v"))
      .agg(count(lit(1)).as("n_common"))
      .join(e0, Seq("u", "v"), "left_anti")
    cand
      .join(broadcast(deg.select(col("x").as("u"), col("dg").as("du"))), "u")
      .join(broadcast(deg.select(col("x").as("v"), col("dg").as("dv"))), "v")
      .select(col("u"), col("v"), col("n_common"),
        (col("n_common").cast("double") /
          (col("du") + col("dv") - col("n_common")).cast("double"))
          .as("jaccard"))
      .orderBy(col("jaccard").desc, col("u").asc, col("v").asc)
      .limit(k)
  }

  /** Borůvka selection round over a canonical (u < v, distinct) edge
    * list (see the `graph_mst_round` query comment): the dedup'd union
    * of every node's (w, u, v)-minimal incident edge, with
    * w = (1000003·u + 7919·v) mod 100003.
    */
  def mstRoundFrom(edges: DataFrame): DataFrame = {
    val wE = edges.withColumn("w",
      (lit(1000003L) * col("u") + lit(7919L) * col("v")) % lit(100003L))
    val dir = wE.select(col("u").as("node"), col("u"), col("v"), col("w"))
      .union(wE.select(col("v").as("node"), col("u"), col("v"), col("w")))
    dir.groupBy("node")
      .agg(min(struct(col("w"), col("u"), col("v"))).as("pick"))
      .select(col("pick.u").as("u"), col("pick.v").as("v"),
        col("pick.w").as("w"))
      .distinct()
      .orderBy("u", "v")
  }

  /** Degree histogram over a canonical (u < v, distinct) edge list. */
  def degreeDistFrom(edges: DataFrame): DataFrame = {
    val und = edges.select(col("u").as("x"))
      .union(edges.select(col("v").as("x")))
    und.groupBy("x").agg(count(lit(1)).as("degree"))
      .groupBy("degree").agg(count(lit(1)).as("n_nodes"))
      .orderBy("degree")
  }

  /** Common-neighbor scores of non-adjacent pairs over a canonical edge
    * list (see the `graph_common_neighbors` query comment), top `k`.
    */
  def commonNeighborsFrom(e0: DataFrame, k: Int): DataFrame = {
    val e = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
    val cand = e.as("a").join(e.as("b"),
        col("a.v") === col("b.u") && col("a.u") < col("b.v"))
      .groupBy(col("a.u").as("u"), col("b.v").as("v"))
      .agg(count(lit(1)).as("n_common"))
    cand.join(e0, Seq("u", "v"), "left_anti")
      .orderBy(col("n_common").desc, col("u").asc, col("v").asc)
      .limit(k)
  }

  /** Canonical (u < v, distinct) part co-purchase edges with pair support
    * >= `minSupport` — the shared fixture graph of the BFS, degree, and
    * link-prediction kernels (see the support-threshold discussion on
    * `graph_triangles` for why the projection must be thresholded at
    * scale).
    */
  /** Canonical (u < v) supplier co-supply edges with pair support >=
    * `minSupport` shared orders — the strong-tie trade graph of the
    * triangle and clustering-coefficient kernels. collect_set dedups in
    * its partial state — a pre-distinct would be a second full shuffle
    * on a wider key for nothing.
    */
  /** r10 (optimization round, guide §2.4/§5): both edge builders PERSIST
    * their output. Every consumer mirror-unions the canonical list
    * (`(u,v) ∪ (v,u)`) or reads it from several join branches, and the
    * mirrored projections differ map-side, so exchange reuse does NOT
    * dedupe them — un-persisted, the full fact-table pair projection
    * (a multi-million-row shuffle at sf0.1, the dominant cost of every
    * graph query) re-executed once per branch (measured: lineitem
    * scanned 3x in graph_kcore's `und` materialization). The edge list
    * itself is support-thresholded and tiny relative to the fact table
    * at any scale — persisting it is the "write the signature table
    * once" pattern, and the cache is released by the harness's
    * per-query `clearCache()`.
    */
  private def cosupplyEdges(t: Tables, minSupport: Long): DataFrame = {
    val bySupp = t.lineitem.select(col("l_orderkey").as("ok"),
        col("l_suppkey").as("sk"))
      .groupBy("ok").agg(sort_array(collect_set(col("sk"))).as("ss"))
    bySupp
      .select(explode(flatten(transform(col("ss"), (x, i) =>
        transform(slice(col("ss"), i + lit(2), size(col("ss"))),
          y => struct(x.as("u"), y.as("v")))))).as("p"))
      .select(col("p.u").as("u"), col("p.v").as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport).select("u", "v")
      .persist()
  }

  private def copurchaseEdges(t: Tables, minSupport: Long): DataFrame = {
    // r11: pair enumeration via per-order sorted item sets (the
    // cosupplyEdges shape) instead of a self-join — one shuffle of the
    // (ok, p) projection + map-side pair expansion replaces two passes
    // and a join. Same pair multiset: collect_set = the old distinct,
    // sorted ascending so slice(i+2..) enumerates exactly the a.p < b.p
    // pairs; per-order item counts are bounded (≤7 here, bounded at any
    // scale), so the expansion is linear in the pair count.
    val byOrder = t.lineitem
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      .groupBy("ok").agg(sort_array(collect_set(col("p"))).as("ps"))
    byOrder
      .select(explode(flatten(transform(col("ps"), (x, i) =>
        transform(slice(col("ps"), i + lit(2), size(col("ps"))),
          y => struct(x.as("u"), y.as("v")))))).as("pr"))
      .select(col("pr.u").as("u"), col("pr.v").as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minSupport)
      .select("u", "v")
      .persist()
  }

  /** Degree-ordered triangle counting (the MapReduce-optimal formulation,
    * Suri & Vassilvitskii 2011): orient every edge from its lower-ranked
    * endpoint under the total order (degree, id) — a DAG where each
    * node's out-degree is O(sqrt(m)) — enumerate wedges by self-joining
    * oriented edges on their source, and close each wedge against the
    * oriented edge list. Work is O(m^1.5) regardless of hub skew (a
    * plain neighbor self-join would be O(Σdeg²), quadratic in the hub);
    * every join is an equi-join on a key column, so the whole count is
    * three hash-partitioned shuffles + one count. Each triangle is
    * produced exactly once (its corners appear in strict rank order), so
    * per-node counts are a union of the three corner projections.
    *
    * `edges` must be canonical undirected: u < v, distinct. Returns the
    * top-`k` nodes by triangle participation (ties to smaller node id).
    *
    * CACHE LIFETIME CONTRACT (as [[pageRankFrom]]): the edge list is read
    * twice (degrees, orientation) and the oriented list three times (both
    * wedge legs + the closing probe) — both are persisted or the entire
    * upstream re-executes per read (measured 5x the edge-build cost at
    * sf0.1). The CALLER owns release via `spark.catalog.clearCache()`.
    */
  def trianglesFrom(edges0: DataFrame, k: Int): DataFrame =
    triangleCountsFrom(edges0)
      .orderBy(col("n_tri").desc, col("node").asc)
      .limit(k)

  /** Per-node triangle counts (no ordering/limit) — the shared kernel of
    * `trianglesFrom` and [[clusteringCoeffFrom]].
    */
  def triangleCountsFrom(edges0: DataFrame): DataFrame = {
    // r10: the corner-projection union consumes the triple stream THREE
    // times with differing projections (no exchange reuse) — persist, or
    // the wedge join (the O(m^1.5) bulk of the query) runs three times
    val tri = triangleTriplesFrom(edges0).persist()
    tri.select(col("a").as("node"))
      .union(tri.select(col("b").as("node")))
      .union(tri.select(col("c").as("node")))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
  }

  /** Each triangle exactly once as an (a, b, c) corner triple in strict
    * (degree, id) rank order — the shared enumeration stage of
    * [[triangleCountsFrom]] and [[localBridgesFrom]]. Same cache
    * contract as `trianglesFrom`: caller releases via `clearCache()`.
    */
  def triangleTriplesFrom(edges0: DataFrame): DataFrame = {
    val edges = edges0.persist()
    val und = edges.select(col("u").as("x"))
      .union(edges.select(col("v").as("x")))
    val deg = und.groupBy("x").agg(count(lit(1)).as("dg"))
    val ranked = edges
      .join(deg.select(col("x").as("u"), col("dg").as("du")), "u")
      .join(deg.select(col("x").as("v"), col("dg").as("dv")), "v")
    val lowFirst = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
    // NOT pre-partitioned on src (measured r11): unlike the iterative
    // loops, the wedge SELF-join's two exchange subtrees are identical,
    // so ReusedExchange already executes only one — a src repartition at
    // build moved the shuffle rather than removing one (total shuffle
    // read 17.2 -> 17.5 MB, walls flat); reverted.
    val o = ranked.select(
      when(lowFirst, col("u")).otherwise(col("v")).as("src"),
      when(lowFirst, col("v")).otherwise(col("u")).as("dst"),
      when(lowFirst, col("dv")).otherwise(col("du")).as("ddst"))
      .persist()
    val o1 = o.select(col("src"), col("dst").as("b"), col("ddst").as("db"))
    val o2 = o.select(col("src"), col("dst").as("c"), col("ddst").as("dc"))
    val wedges = o1.join(o2, "src")
      .filter(struct(col("db"), col("b")) < struct(col("dc"), col("c")))
    wedges.join(
      o.select(col("src").as("b"), col("dst").as("c")), Seq("b", "c"))
      .select(col("src").as("a"), col("b"), col("c"))
  }

  /** Local bridges (Granovetter's weak ties): edges whose endpoints
    * share NO common neighbor — equivalently, edges in no triangle.
    * Removing one lengthens its endpoints' distance to >= 3, so these
    * are the inter-community conduits; in a crawl/citation graph they
    * are the links worth protecting from dedup/pruning. Implementation
    * rides the degree-ordered triangle kernel (O(m^1.5) bound): the
    * triangle corner triples map back to their three canonical edges,
    * and bridges are one ANTI-join of the edge list against that set —
    * no wedge enumeration per edge, no neighborhood intersections.
    */
  /** Per-component bipartiteness via the DOUBLED-GRAPH reduction: split
    * every node v into (v,0)/(v,1) = 2v/2v+1, connect each edge (u,v) as
    * (u,0)-(v,1) and (u,1)-(v,0); G's component is bipartite iff no node
    * has its two copies in one doubled component (an odd cycle is exactly
    * a walk that flips parity back to itself). Fully distributed and
    * EXACT at any diameter — two pointer-jumping component runs
    * (O(log d) rounds each, [[DedupOps.minLabelComponents]]) replace the
    * sequential BFS 2-coloring a single machine would use; no round cap
    * that could mis-certify a deep component. Output one row per
    * component: (rep, n_nodes, n_conflicted, bipartite).
    */
  def bipartiteCheckFrom(edges0: DataFrame): DataFrame = {
    val e0 = edges0.persist()
    val dbl = e0.select((col("u") * 2).as("src"), (col("v") * 2 + 1).as("dst"))
      .union(e0.select((col("v") * 2 + 1).as("src"), (col("u") * 2).as("dst")))
      .union(e0.select((col("u") * 2 + 1).as("src"), (col("v") * 2).as("dst")))
      .union(e0.select((col("v") * 2).as("src"), (col("u") * 2 + 1).as("dst")))
    val c2 = DedupOps.minLabelComponents(dbl)
    // ONE component run suffices — the BASE component rep falls out of
    // the doubled labels: a bipartite base component splits into exactly
    // two doubled components each holding one copy of every node, a
    // non-bipartite one is a single doubled component holding both, so
    // in either case min(lab(2v), lab(2v+1)) is the same for every v of
    // a base component and equals 2x its minimum node id.
    val even = c2.filter(col("id") % 2 === 0)
      .select(expr("id div 2").as("vv"), col("lab").as("l0"))
    val odd = c2.filter(col("id") % 2 === 1)
      .select(expr("id div 2").as("vv"), col("lab").as("l1"))
    even.join(odd, "vv")
      .groupBy(expr("least(l0, l1) div 2").as("rep"))
      .agg(count(lit(1)).as("n_nodes"),
        count(when(col("l0") === col("l1"), 1)).as("n_conflicted"))
      .withColumn("bipartite", col("n_conflicted") === 0)
      .orderBy("rep")
  }

  def localBridgesFrom(edges0: DataFrame): DataFrame = {
    val edges = edges0.persist()
    // tri is consumed THREE times (one union branch per triangle edge);
    // uncut, each branch re-expands the whole wedge-join tree into the
    // plan (5k+ plan lines, superlinear analysis/codegen cost) — the
    // multi-consumer pattern the lineage-cut doctrine exists for
    val tri = triangleTriplesFrom(edges).cutLineage()
    val triEdges = tri.select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .union(tri.select(least(col("a"), col("c")).as("u"),
        greatest(col("a"), col("c")).as("v")))
      .union(tri.select(least(col("b"), col("c")).as("u"),
        greatest(col("b"), col("c")).as("v")))
      .distinct()
    val und = edges.select(col("u").as("x"))
      .union(edges.select(col("v").as("x")))
    val deg = und.groupBy("x").agg(count(lit(1)).as("dg"))
    edges.join(triEdges, Seq("u", "v"), "left_anti")
      .join(deg.select(col("x").as("u"), col("dg").as("deg_u")), "u")
      .join(deg.select(col("x").as("v"), col("dg").as("deg_v")), "v")
      .select(col("u"), col("v"), col("deg_u"), col("deg_v"))
      .orderBy("u", "v")
  }

  /** Local clustering coefficient cc = 2·T/(d·(d−1)) per node of a
    * canonical edge list (0.0 for degree < 2); all nodes, ordered by id.
    */
  def clusteringCoeffFrom(edges: DataFrame): DataFrame = {
    val und = edges.select(col("u").as("x"))
      .union(edges.select(col("v").as("x")))
    val deg = und.groupBy("x").agg(count(lit(1)).as("degree"))
    val tc = triangleCountsFrom(edges)
    deg.join(tc, deg("x") === tc("node"), "left")
      .select(col("x").as("node"), col("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("cc",
        when(col("degree") < 2, lit(0.0))
          .otherwise((col("n_tri") * 2L).cast("double") /
            (col("degree") * (col("degree") - 1L)).cast("double")))
      .orderBy("node")
  }

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
    // r10: the caller's edge build is consumed twice by the mirror union
    // (differing projections defeat exchange reuse) — persist it so the
    // fact-table join behind it runs once; `nodes` is re-read every
    // iteration's rank rebuild — persist the node-sized frame too
    val e0 = edges.persist()
    val np = nodes.persist()
    val e = e0.select(col("src"), col("dst"))
      .union(e0.select(col("dst").as("src"), col("src").as("dst")))
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // r11 (guide §2.4): the cached edge table is PRE-PARTITIONED on src —
    // each iteration joins it on src against the (stats-opaque, never
    // broadcast) rank table, so the edge-sized join exchange is satisfied
    // by the cache layout every round (one build-time shuffle buys iters
    // round shuffles — the bucketed-table trade at 100 TB)
    val ed = e.join(deg, "src").repartition(col("src")).persist()
    var r = np.withColumn("pr", lit(Scale))
    for (_ <- 1 to iters) {
      val contrib = ed.join(r, ed("src") === r("node"))
        .select(col("dst"), expr("pr div outdeg").as("share"))
        .groupBy("dst").agg(sum(col("share")).as("contrib"))
      r = np.join(contrib, np("node") === contrib("dst"), "left")
        .select(np("node"),
          (lit(Base) + expr(
            "(85 * coalesce(contrib, CAST(0 AS BIGINT))) div 100"))
            .as("pr"))
        // node-sized per-round cut: single-reference chain, but uncut
        // depth grows superlinear analysis/codegen cost (stats-opaque
        // to AQE) — same rationale as labelPropagationFrom
        .cutLineage()
    }
    r.orderBy(col("pr").desc, col("node").asc).limit(k)
  }

  /** Personalized PageRank over an undirected edge list: identical
    * integer iteration to [[pageRankFrom]] except the per-node base term
    * is `Base` only where `nodes.seed` holds (teleport-to-seed-set), and
    * rank starts at `Scale` on seeds / 0 elsewhere. Separated so specs
    * can plant seed/non-seed graphs with known proximity orderings.
    * CACHE LIFETIME CONTRACT (as [[pageRankFrom]]): persists the caller's
    * frames; release is the harness's per-query `clearCache()`.
    */
  def pprFrom(edges: DataFrame, nodes: DataFrame, iters: Int, k: Int)
      : DataFrame = {
    // r10: persist the mirror-union input + the per-iteration node frame
    // (see pageRankFrom)
    val e0 = edges.persist()
    val np = nodes.persist()
    val e = e0.select(col("src"), col("dst"))
      .union(e0.select(col("dst").as("src"), col("src").as("dst")))
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // pre-partitioned on src for the per-iteration join — see pageRankFrom
    val ed = e.join(deg, "src").repartition(col("src")).persist()
    var r = np.withColumn("pr",
      when(col("seed"), lit(Scale)).otherwise(lit(0L)))
    for (_ <- 1 to iters) {
      val contrib = ed.join(r, ed("src") === r("node"))
        .select(col("dst"), expr("pr div outdeg").as("share"))
        .groupBy("dst").agg(sum(col("share")).as("contrib"))
      r = np.join(contrib, np("node") === contrib("dst"), "left")
        .select(np("node"), np("seed"),
          (when(np("seed"), lit(Base)).otherwise(lit(0L)) + expr(
            "(85 * coalesce(contrib, CAST(0 AS BIGINT))) div 100"))
            .as("pr"))
        .cutLineage() // per-round node-sized cut, see pageRankFrom
    }
    r.select(col("node"), col("pr"))
      .orderBy(col("pr").desc, col("node").asc).limit(k)
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
    def iterP(prev: String, cn: String, rn: String): String =
      s"""$cn AS (SELECT dst AS node, CAST(sum(pr // outdeg) AS BIGINT)
         |    AS contrib
         |  FROM ed JOIN $prev r ON r.node = ed.src GROUP BY 1),
         |$rn AS (SELECT n.node, CAST(
         |      CASE WHEN n.node % 202 = 0 THEN $Base ELSE 0 END +
         |      (85 * COALESCE(contrib, 0)) // 100 AS BIGINT) AS pr
         |  FROM n LEFT JOIN $cn USING (node))""".stripMargin
    Map(
      "graph_ppr" ->
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
           |r0 AS (SELECT node, CAST(CASE WHEN node % 202 = 0
           |    THEN $Scale ELSE 0 END AS BIGINT) AS pr FROM n),
           |${iterP("r0", "c1", "r1")},
           |${iterP("r1", "c2", "r2")},
           |${iterP("r2", "c3", "r3")}
           |SELECT node, pr FROM r3
           |ORDER BY pr DESC, node LIMIT 20""".stripMargin,
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
           |ORDER BY pr DESC, node LIMIT 20""".stripMargin,
      // the same degree-ordered orientation, CTE for CTE; DuckDB's row
      // comparison (a, b) < (c, d) mirrors Spark's struct ordering
      "graph_triangles" ->
        """WITH pe AS (SELECT DISTINCT a.l_orderkey AS ok,
          |    a.l_suppkey AS u, b.l_suppkey AS v
          |  FROM lineitem a JOIN lineitem b
          |    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey),
          |e AS (SELECT u, v FROM pe GROUP BY u, v HAVING count(*) >= 5),
          |und AS (SELECT u AS x FROM e UNION ALL SELECT v FROM e),
          |deg AS (SELECT x, count(*) AS dg FROM und GROUP BY 1),
          |o AS (SELECT
          |    CASE WHEN (du.dg, e.u) < (dv.dg, e.v) THEN e.u ELSE e.v END
          |      AS src,
          |    CASE WHEN (du.dg, e.u) < (dv.dg, e.v) THEN e.v ELSE e.u END
          |      AS dst,
          |    CASE WHEN (du.dg, e.u) < (dv.dg, e.v) THEN dv.dg ELSE du.dg END
          |      AS ddst
          |  FROM e JOIN deg du ON du.x = e.u JOIN deg dv ON dv.x = e.v),
          |tri AS (SELECT o1.src AS a, o1.dst AS b, o2.dst AS c
          |  FROM o o1
          |  JOIN o o2 ON o1.src = o2.src
          |    AND (o1.ddst, o1.dst) < (o2.ddst, o2.dst)
          |  JOIN o e3 ON e3.src = o1.dst AND e3.dst = o2.dst),
          |corners AS (SELECT a AS node FROM tri
          |  UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
          |SELECT node, count(*) AS n_tri FROM corners GROUP BY 1
          |ORDER BY n_tri DESC, node LIMIT 20""".stripMargin,
      // triangle-free edges of the co-purchase graph: each triangle is
      // enumerated once in id order (canonical edges make the degree
      // ordering unnecessary in the oracle), its three edges collected,
      // and bridges are the anti-set
      "graph_local_bridges" ->
        """WITH it AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
          |  FROM lineitem),
          |e AS (SELECT a.p AS u, b.p AS v FROM it a
          |  JOIN it b ON a.ok = b.ok AND a.p < b.p
          |  GROUP BY 1, 2 HAVING count(*) >= 2),
          |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
          |  FROM e e1 JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
          |  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
          |te AS (SELECT a AS u, b AS v FROM tri
          |  UNION SELECT a, c FROM tri UNION SELECT b, c FROM tri),
          |und AS (SELECT u AS x FROM e UNION ALL SELECT v FROM e),
          |deg AS (SELECT x, count(*) AS dg FROM und GROUP BY 1)
          |SELECT e.u, e.v, du.dg AS deg_u, dv.dg AS deg_v
          |FROM e JOIN deg du ON du.x = e.u JOIN deg dv ON dv.x = e.v
          |WHERE NOT EXISTS (SELECT 1 FROM te
          |  WHERE te.u = e.u AND te.v = e.v)
          |ORDER BY u, v""".stripMargin,
      // the doubled-graph reduction replayed with recursive label
      // closures: node copies 2v/2v+1, conflict = both copies share a
      // doubled component, rolled up per base component
      "graph_bipartite_check" ->
        """WITH RECURSIVE it AS (SELECT DISTINCT l_orderkey AS ok,
          |    l_partkey AS p FROM lineitem),
          |e0 AS (SELECT a.p AS u, b.p AS v FROM it a
          |  JOIN it b ON a.ok = b.ok AND a.p < b.p
          |  GROUP BY 1, 2 HAVING count(*) >= 2),
          |d AS (SELECT 2*u AS a, 2*v+1 AS b FROM e0
          |  UNION ALL SELECT 2*v+1, 2*u FROM e0
          |  UNION ALL SELECT 2*u+1, 2*v FROM e0
          |  UNION ALL SELECT 2*v, 2*u+1 FROM e0),
          |dn AS (SELECT DISTINCT a AS id FROM d),
          |r2(id, lab) AS (
          |  SELECT id, id FROM dn
          |  UNION
          |  SELECT d.b, r2.lab FROM r2 JOIN d ON d.a = r2.id),
          |c2 AS (SELECT id, min(lab) AS rep2 FROM r2 GROUP BY id),
          |pairs AS (SELECT a.id // 2 AS vv, a.rep2 AS l0, b.rep2 AS l1
          |  FROM c2 a JOIN c2 b ON b.id = a.id + 1
          |  WHERE a.id % 2 = 0)
          |SELECT CAST(least(l0, l1) // 2 AS BIGINT) AS rep,
          |  count(*) AS n_nodes,
          |  count(*) FILTER (WHERE l0 = l1) AS n_conflicted,
          |  (count(*) FILTER (WHERE l0 = l1) = 0) AS bipartite
          |FROM pairs GROUP BY 1 ORDER BY rep""".stripMargin,
      // the same triangle pipeline, joined back to degrees for cc
      "graph_clustering_coeff" ->
        """WITH pe AS (SELECT DISTINCT a.l_orderkey AS ok,
          |    a.l_suppkey AS u, b.l_suppkey AS v
          |  FROM lineitem a JOIN lineitem b
          |    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey),
          |e AS (SELECT u, v FROM pe GROUP BY u, v HAVING count(*) >= 5),
          |und AS (SELECT u AS x FROM e UNION ALL SELECT v FROM e),
          |deg AS (SELECT x, count(*) AS dg FROM und GROUP BY 1),
          |o AS (SELECT
          |    CASE WHEN (du.dg, e.u) < (dv.dg, e.v) THEN e.u ELSE e.v END
          |      AS src,
          |    CASE WHEN (du.dg, e.u) < (dv.dg, e.v) THEN e.v ELSE e.u END
          |      AS dst,
          |    CASE WHEN (du.dg, e.u) < (dv.dg, e.v) THEN dv.dg ELSE du.dg END
          |      AS ddst
          |  FROM e JOIN deg du ON du.x = e.u JOIN deg dv ON dv.x = e.v),
          |tri AS (SELECT o1.src AS a, o1.dst AS b, o2.dst AS c
          |  FROM o o1
          |  JOIN o o2 ON o1.src = o2.src
          |    AND (o1.ddst, o1.dst) < (o2.ddst, o2.dst)
          |  JOIN o e3 ON e3.src = o1.dst AND e3.dst = o2.dst),
          |corners AS (SELECT a AS node FROM tri
          |  UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri),
          |tcnt AS (SELECT node, count(*) AS n_tri FROM corners GROUP BY 1)
          |SELECT d.x AS node, d.dg AS degree,
          |  COALESCE(t.n_tri, 0) AS n_tri,
          |  CASE WHEN d.dg < 2 THEN 0.0
          |       ELSE CAST(2 * COALESCE(t.n_tri, 0) AS DOUBLE) /
          |            CAST(d.dg * (d.dg - 1) AS DOUBLE) END AS cc
          |FROM deg d LEFT JOIN tcnt t ON t.node = d.x
          |ORDER BY node""".stripMargin,
      "basket_pair_lift" ->
        """WITH it AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
          |  FROM lineitem),
          |n AS (SELECT count(DISTINCT o_orderkey) AS n_orders FROM orders),
          |marg AS (SELECT p, count(*) AS n_item FROM it GROUP BY 1),
          |pairs AS (SELECT a.p AS part_a, b.p AS part_b, count(*) AS n_ab
          |  FROM it a JOIN it b ON a.ok = b.ok AND a.p < b.p
          |  GROUP BY 1, 2 HAVING count(*) >= 3)
          |SELECT part_a, part_b, n_ab, ma.n_item AS n_a, mb.n_item AS n_b,
          |  CAST(n_ab AS DOUBLE) * CAST(n.n_orders AS DOUBLE) /
          |    (CAST(ma.n_item AS DOUBLE) * CAST(mb.n_item AS DOUBLE))
          |    AS lift
          |FROM pairs
          |JOIN marg ma ON ma.p = part_a
          |JOIN marg mb ON mb.p = part_b, n
          |ORDER BY lift DESC, part_a ASC, part_b ASC""".stripMargin,
      // recursive-CTE BFS: UNION (not UNION ALL) dedups the closure per
      // step, the outer min collapses multi-path discoveries — same
      // depth cap as the frontier-join loop
      "graph_bfs_hops" ->
        """WITH RECURSIVE it AS (SELECT DISTINCT l_orderkey AS ok,
          |    l_partkey AS p FROM lineitem),
          |e0 AS (SELECT a.p AS u, b.p AS v FROM it a
          |  JOIN it b ON a.ok = b.ok AND a.p < b.p
          |  GROUP BY 1, 2 HAVING count(*) >= 2),
          |e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
          |s AS (SELECT min(u) AS s FROM e),
          |d AS (SELECT s AS node, 0 AS dist FROM s
          |  UNION
          |  SELECT e.v, d.dist + 1 FROM d JOIN e ON e.u = d.node
          |  WHERE d.dist < 4)
          |SELECT node, min(dist) AS dist FROM d
          |GROUP BY node ORDER BY node""".stripMargin,
      // σ recursion unrolled level by level (the BFS invariant: a node
      // first reached at round k has distance k, so each level's σ sums
      // ONLY the previous level's σ over incoming edges)
      "graph_path_counts" ->
        """WITH it AS (SELECT DISTINCT l_orderkey AS ok,
          |    l_partkey AS p FROM lineitem),
          |e0 AS (SELECT a.p AS u, b.p AS v FROM it a
          |  JOIN it b ON a.ok = b.ok AND a.p < b.p
          |  GROUP BY 1, 2 HAVING count(*) >= 2),
          |e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
          |l0 AS (SELECT min(u) AS node, 0 AS dist,
          |    CAST(1 AS BIGINT) AS sigma FROM e),
          |l1 AS (SELECT e.v AS node, 1 AS dist,
          |    CAST(sum(f.sigma) AS BIGINT) AS sigma
          |  FROM l0 f JOIN e ON e.u = f.node
          |  WHERE e.v NOT IN (SELECT node FROM l0)
          |  GROUP BY e.v),
          |l2 AS (SELECT e.v AS node, 2 AS dist,
          |    CAST(sum(f.sigma) AS BIGINT) AS sigma
          |  FROM l1 f JOIN e ON e.u = f.node
          |  WHERE e.v NOT IN (SELECT node FROM l0
          |    UNION ALL SELECT node FROM l1)
          |  GROUP BY e.v),
          |l3 AS (SELECT e.v AS node, 3 AS dist,
          |    CAST(sum(f.sigma) AS BIGINT) AS sigma
          |  FROM l2 f JOIN e ON e.u = f.node
          |  WHERE e.v NOT IN (SELECT node FROM l0
          |    UNION ALL SELECT node FROM l1
          |    UNION ALL SELECT node FROM l2)
          |  GROUP BY e.v),
          |l4 AS (SELECT e.v AS node, 4 AS dist,
          |    CAST(sum(f.sigma) AS BIGINT) AS sigma
          |  FROM l3 f JOIN e ON e.u = f.node
          |  WHERE e.v NOT IN (SELECT node FROM l0
          |    UNION ALL SELECT node FROM l1
          |    UNION ALL SELECT node FROM l2
          |    UNION ALL SELECT node FROM l3)
          |  GROUP BY e.v)
          |SELECT node, CAST(dist AS INT) AS dist, sigma FROM (
          |  SELECT * FROM l0 UNION ALL SELECT * FROM l1
          |  UNION ALL SELECT * FROM l2 UNION ALL SELECT * FROM l3
          |  UNION ALL SELECT * FROM l4)
          |ORDER BY node""".stripMargin,
      "graph_degree_dist" ->
        s"""WITH $copurchaseSql,
           |und AS (SELECT u AS x FROM e0 UNION ALL SELECT v FROM e0),
           |deg AS (SELECT x, count(*) AS degree FROM und GROUP BY 1)
           |SELECT degree, count(*) AS n_nodes FROM deg
           |GROUP BY 1 ORDER BY degree""".stripMargin,
      "graph_common_neighbors" ->
        s"""WITH $copurchaseSql,
           |e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
           |cand AS (SELECT a.u AS u, b.v AS v, count(*) AS n_common
           |  FROM e a JOIN e b ON a.v = b.u AND a.u < b.v
           |  GROUP BY 1, 2)
           |SELECT u, v, n_common FROM cand
           |WHERE NOT EXISTS (SELECT 1 FROM e0
           |  WHERE e0.u = cand.u AND e0.v = cand.v)
           |ORDER BY n_common DESC, u ASC, v ASC LIMIT 20""".stripMargin,
      "graph_kcore" -> {
        // the same six synchronous peel rounds, CTE for CTE
        def peel(prev: String, an: String): String =
          s"""$an AS (SELECT src AS node FROM und
             |  WHERE src IN (SELECT node FROM $prev)
             |    AND dst IN (SELECT node FROM $prev)
             |  GROUP BY 1 HAVING count(*) >= 3)""".stripMargin
        val chain = (1 to 6)
          .map(i => peel(s"a${i - 1}", s"a$i")).mkString(",\n")
        s"""WITH $copurchaseSql,
           |und AS (SELECT u AS src, v AS dst FROM e0
           |  UNION ALL SELECT v, u FROM e0),
           |a0 AS (SELECT DISTINCT src AS node FROM und),
           |$chain
           |SELECT src AS node, count(*) AS core_deg FROM und
           |WHERE src IN (SELECT node FROM a6)
           |  AND dst IN (SELECT node FROM a6)
           |GROUP BY 1 ORDER BY node""".stripMargin
      },
      "graph_ktruss" -> {
        // the same three synchronous edge-peel rounds, CTE for CTE:
        // each round keeps edges with >= 1 wedge closing over the
        // SURVIVING edge set
        def round(prev: String, tn: String): String =
          s"""u$tn AS (SELECT u AS src, v AS dst FROM $prev
             |  UNION ALL SELECT v, u FROM $prev),
             |$tn AS (SELECT e.u, e.v FROM $prev e
             |  JOIN u$tn a ON a.src = e.u
             |  JOIN u$tn b ON b.src = e.v AND b.dst = a.dst
             |  GROUP BY 1, 2 HAVING count(*) >= 1)""".stripMargin
        val chain = (1 to 3)
          .map(i => round(s"t${i - 1}", s"t$i")).mkString(",\n")
        s"""WITH $copurchaseSql,
           |t0 AS (SELECT u, v FROM e0),
           |$chain,
           |uf AS (SELECT u AS src, v AS dst FROM t3
           |  UNION ALL SELECT v, u FROM t3)
           |SELECT e.u, e.v, count(*) AS support FROM t3 e
           |JOIN uf a ON a.src = e.u
           |JOIN uf b ON b.src = e.v AND b.dst = a.dst
           |GROUP BY 1, 2 ORDER BY u, v""".stripMargin
      },
      // the label-propagation chain verbatim, then cut/vol exact integers
      // and the single pinned division
      "graph_conductance" ->
        s"""WITH $copurchaseSql,
           |$labelPropChainSql,
           |m AS (SELECT count(*) AS m_edges FROM e0),
           |deg AS (SELECT src AS node, count(*) AS dg FROM und
           |  GROUP BY 1),
           |vol AS (SELECT l.label, CAST(sum(dg) AS BIGINT) AS vol
           |  FROM deg d JOIN l3 l ON l.node = d.node GROUP BY 1),
           |x AS (SELECT lu.label AS lu, lv.label AS lv
           |  FROM e0 JOIN l3 lu ON lu.node = e0.u
           |    JOIN l3 lv ON lv.node = e0.v
           |  WHERE lu.label <> lv.label),
           |cp AS (SELECT label, count(*) AS cut_edges FROM (
           |    SELECT lu AS label FROM x UNION ALL SELECT lv FROM x)
           |  GROUP BY 1)
           |SELECT vol.label, vol, COALESCE(cut_edges, 0) AS cut_edges,
           |  CASE WHEN least(vol, m_edges * 2 - vol) = 0 THEN 0.0
           |    ELSE CAST(COALESCE(cut_edges, 0) AS DOUBLE) /
           |      CAST(least(vol, m_edges * 2 - vol) AS DOUBLE)
           |    END AS conductance
           |FROM vol LEFT JOIN cp ON cp.label = vol.label CROSS JOIN m
           |ORDER BY vol.label""".stripMargin,
      // the label-propagation chain verbatim, then the exact
      // cross-multiplied gain numerators; arithmetic in HUGEINT (the
      // Spark side uses DECIMAL(38,0)), argmax via row_number with the
      // identical (gain DESC, community ASC) tie order
      "graph_louvain_move" ->
        s"""WITH $copurchaseSql,
           |$labelPropChainSql,
           |m AS (SELECT count(*) AS m_edges FROM e0),
           |deg AS (SELECT src AS node, count(*) AS dg FROM und
           |  GROUP BY 1),
           |dc AS (SELECT l.label, CAST(sum(dg) AS HUGEINT) AS dsum
           |  FROM deg d JOIN l3 l ON l.node = d.node GROUP BY 1),
           |euc AS (SELECT e.src AS node, l.label AS cand,
           |    count(*) AS e_uc
           |  FROM und e JOIN l3 l ON l.node = e.dst GROUP BY 1, 2),
           |own AS (SELECT c.node, COALESCE(euc.e_uc, 0) AS e_own
           |  FROM l3 c LEFT JOIN euc
           |    ON euc.node = c.node AND euc.cand = c.label),
           |gain AS (SELECT c.node, euc.cand,
           |    CAST(2 * m_edges AS HUGEINT) * (euc.e_uc - own.e_own)
           |      - CAST(deg.dg AS HUGEINT) *
           |        (dcc.dsum - dco.dsum + deg.dg) AS g
           |  FROM l3 c
           |  JOIN euc ON euc.node = c.node AND euc.cand <> c.label
           |  JOIN own ON own.node = c.node
           |  JOIN deg ON deg.node = c.node
           |  JOIN dc dcc ON dcc.label = euc.cand
           |  JOIN dc dco ON dco.label = c.label
           |  CROSS JOIN m),
           |best AS (SELECT node, cand, g, row_number() OVER (
           |    PARTITION BY node ORDER BY g DESC, cand ASC) AS rk
           |  FROM gain)
           |SELECT c.node, c.label AS from_label,
           |  CASE WHEN b.g > 0 THEN b.cand ELSE c.label END AS to_label,
           |  CAST(CAST(CASE WHEN b.g > 0 THEN b.g ELSE 0 END
           |    AS DECIMAL(38,0)) AS VARCHAR) AS gain_num
           |FROM l3 c LEFT JOIN best b ON b.node = c.node AND b.rk = 1
           |ORDER BY c.node""".stripMargin,
      // the graph_path_counts unrolling with the seed riding the key,
      // then the exact all-shortest-paths membership predicate
      "graph_bottlenecks" -> {
        def level(prev: String, acc: String, ln: String,
            an: String, k: Int): String =
          s"""$ln AS (SELECT f.seed, e.v AS node, $k AS dist,
             |    CAST(sum(f.sigma) AS BIGINT) AS sigma
             |  FROM $prev f JOIN e ON e.u = f.node
             |  WHERE NOT EXISTS (SELECT 1 FROM $acc p
             |    WHERE p.seed = f.seed AND p.node = e.v)
             |  GROUP BY 1, 2),
             |$an AS (SELECT * FROM $acc UNION ALL SELECT * FROM $ln)"""
            .stripMargin
        val chain = (1 to 4)
          .map(k => level(s"l${k - 1}", s"a${k - 1}", s"l$k", s"a$k", k))
          .mkString(",\n")
        s"""WITH $copurchaseSql,
           |e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
           |sd AS (SELECT DISTINCT u AS seed FROM e ORDER BY 1 LIMIT 3),
           |l0 AS (SELECT seed, seed AS node, 0 AS dist,
           |    CAST(1 AS BIGINT) AS sigma FROM sd),
           |a0 AS (SELECT * FROM l0),
           |$chain,
           |p AS (SELECT a.seed AS s, b.seed AS t,
           |    r.dist AS d_st, r.sigma AS s_st
           |  FROM sd a JOIN sd b ON a.seed < b.seed
           |  JOIN a4 r ON r.seed = a.seed AND r.node = b.seed),
           |bt AS (SELECT fv.node
           |  FROM p
           |  JOIN a4 fv ON fv.seed = p.s
           |    AND fv.node <> p.s AND fv.node <> p.t
           |  JOIN a4 tv ON tv.seed = p.t AND tv.node = fv.node
           |  WHERE fv.dist + tv.dist = p.d_st
           |    AND CAST(fv.sigma AS HUGEINT) * CAST(tv.sigma AS HUGEINT)
           |      = CAST(p.s_st AS HUGEINT))
           |SELECT node, count(*) AS n_pairs FROM bt
           |GROUP BY 1 ORDER BY node""".stripMargin
      },
      // the bottlenecks level-chain minus the sigma accounting
      "graph_eccentricity" -> {
        def level(prev: String, acc: String, ln: String,
            an: String, k: Int): String =
          s"""$ln AS (SELECT DISTINCT f.seed, e.v AS node, $k AS dist
             |  FROM $prev f JOIN e ON e.u = f.node
             |  WHERE NOT EXISTS (SELECT 1 FROM $acc p
             |    WHERE p.seed = f.seed AND p.node = e.v)),
             |$an AS (SELECT * FROM $acc UNION ALL SELECT * FROM $ln)"""
            .stripMargin
        val chain = (1 to 4)
          .map(k => level(s"l${k - 1}", s"a${k - 1}", s"l$k", s"a$k", k))
          .mkString(",\n")
        s"""WITH $copurchaseSql,
           |e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
           |sd AS (SELECT DISTINCT u AS seed FROM e ORDER BY 1 LIMIT 3),
           |l0 AS (SELECT seed, seed AS node, 0 AS dist FROM sd),
           |a0 AS (SELECT * FROM l0),
           |$chain
           |SELECT seed, CAST(max(dist) AS INT) AS ecc_capped,
           |  count(*) AS n_reached
           |FROM a4 GROUP BY 1 ORDER BY seed""".stripMargin
      },
      "graph_2hop_reach" ->
        s"""WITH $copurchaseSql,
           |und AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
           |n1 AS (SELECT u, count(*) AS n1 FROM und GROUP BY 1),
           |two AS (SELECT DISTINCT a.u, b.v AS w
           |  FROM und a JOIN und b ON b.u = a.v
           |  WHERE a.u <> b.v
           |    AND NOT EXISTS (SELECT 1 FROM und d
           |      WHERE d.u = a.u AND d.v = b.v)),
           |n2 AS (SELECT u, count(*) AS n2 FROM two GROUP BY 1)
           |SELECT n2.u AS node, n1, n2
           |FROM n2 JOIN n1 ON n1.u = n2.u
           |ORDER BY n2 DESC, node ASC LIMIT 20""".stripMargin,
      "graph_random_walk" -> {
        // the same three hash-seeded argmin steps, CTE for CTE
        // (row_number over the identical mixing function)
        def step(prev: String, wn: String, t: Int,
            prevCols: String, curCol: String): String =
          s"""$wn AS (SELECT $prevCols, v AS s$t FROM (
             |  SELECT w.*, e.dst AS v, row_number() OVER (
             |      PARTITION BY w.start
             |      ORDER BY (1000003 * e.src + ${7919L * t} + e.dst)
             |        % 1000000007, e.dst) AS rk
             |  FROM $prev w JOIN und e ON e.src = w.$curCol) WHERE rk = 1)"""
            .stripMargin
        s"""WITH $copurchaseSql,
           |und AS (SELECT u AS src, v AS dst FROM e0
           |  UNION ALL SELECT v, u FROM e0),
           |w0 AS (SELECT DISTINCT src AS start FROM und),
           |${step("w0", "w1", 1, "start", "start")},
           |${step("w1", "w2", 2, "start, s1", "s1")},
           |${step("w2", "w3", 3, "start, s1, s2", "s2")}
           |SELECT start, s1, s2, s3 FROM w3 ORDER BY start""".stripMargin
      },
      "graph_jaccard_linkpred" ->
        s"""WITH $copurchaseSql,
           |e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
           |deg AS (SELECT u AS x, count(*) AS dg FROM e GROUP BY 1),
           |cand AS (SELECT a.u AS u, b.v AS v, count(*) AS n_common
           |  FROM e a JOIN e b ON a.v = b.u AND a.u < b.v
           |  GROUP BY 1, 2)
           |SELECT u, v, n_common,
           |  CAST(n_common AS DOUBLE) /
           |    CAST(du.dg + dv.dg - n_common AS DOUBLE) AS jaccard
           |FROM cand
           |JOIN deg du ON du.x = cand.u
           |JOIN deg dv ON dv.x = cand.v
           |WHERE NOT EXISTS (SELECT 1 FROM e0
           |  WHERE e0.u = cand.u AND e0.v = cand.v)
           |ORDER BY jaccard DESC, u ASC, v ASC LIMIT 20""".stripMargin,
      // the same wedge stream with the integer-scaled reciprocal weight
      "graph_resource_alloc" ->
        s"""WITH $copurchaseSql,
           |e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
           |deg AS (SELECT u AS z, count(*) AS dz FROM e GROUP BY 1),
           |w AS (SELECT a.u AS u, b.v AS v, a.v AS z
           |  FROM e a JOIN e b ON a.v = b.u AND a.u < b.v),
           |sc AS (SELECT u, v, count(*) AS n_common,
           |    CAST(sum(1000000000000 // dz) AS BIGINT) AS ra_scaled
           |  FROM w JOIN deg ON deg.z = w.z GROUP BY 1, 2)
           |SELECT u, v, n_common, ra_scaled FROM sc
           |WHERE NOT EXISTS (SELECT 1 FROM e0
           |  WHERE e0.u = sc.u AND e0.v = sc.v)
           |ORDER BY ra_scaled DESC, u ASC, v ASC LIMIT 20""".stripMargin,
      "graph_mst_round" ->
        s"""WITH $copurchaseSql,
           |we AS (SELECT u, v, (1000003 * u + 7919 * v) % 100003 AS w
           |  FROM e0),
           |dir AS (SELECT u AS node, u, v, w FROM we
           |  UNION ALL SELECT v, u, v, w FROM we),
           |pick AS (SELECT node, u, v, w, row_number() OVER (
           |    PARTITION BY node ORDER BY w, u, v) AS rk FROM dir)
           |SELECT DISTINCT u, v, w FROM pick WHERE rk = 1
           |ORDER BY u, v""".stripMargin,
      "graph_label_propagation" ->
        s"""WITH $copurchaseSql,
           |$labelPropChainSql
           |SELECT node, label FROM l3 ORDER BY node""".stripMargin,
      // the label-propagation chain verbatim, then the exact-integer
      // sufficient statistics and the pinned q_contrib division tree
      "graph_modularity" ->
        s"""WITH $copurchaseSql,
           |$labelPropChainSql,
           |m AS (SELECT count(*) AS m_edges FROM e0),
           |deg AS (SELECT src AS node, count(*) AS dg FROM und
           |  GROUP BY 1),
           |dc AS (SELECT l.label, count(*) AS n_nodes,
           |    CAST(sum(dg) AS BIGINT) AS degree_sum
           |  FROM deg d JOIN l3 l ON l.node = d.node GROUP BY 1),
           |ic AS (SELECT lu.label, count(*) AS e_c
           |  FROM e0 JOIN l3 lu ON lu.node = e0.u
           |    JOIN l3 lv ON lv.node = e0.v
           |  WHERE lu.label = lv.label GROUP BY 1),
           |c AS (SELECT dc.label, n_nodes, degree_sum,
           |    CAST(COALESCE(e_c, 0) AS BIGINT) AS intra_edges
           |  FROM dc LEFT JOIN ic ON ic.label = dc.label)
           |SELECT label, CAST(n_nodes AS BIGINT) AS n_nodes, degree_sum,
           |  intra_edges,
           |  CAST(CAST(m_edges * 4 AS DECIMAL(19,0)) *
           |      CAST(intra_edges AS DECIMAL(19,0)) -
           |      CAST(degree_sum AS DECIMAL(19,0)) *
           |      CAST(degree_sum AS DECIMAL(19,0)) AS DOUBLE) /
           |    (4.0 * CAST(m_edges AS DOUBLE) * CAST(m_edges AS DOUBLE))
           |    AS q_contrib
           |FROM c CROSS JOIN m ORDER BY label""".stripMargin,
      "graph_hits" -> {
        // the same two L1-normalized h/a rounds, CTE for CTE; sums are
        // HUGEINT (the Spark side uses DECIMAL(38,0)) and the normalize
        // step is (v * 10^9) // tot
        def half(src: String, from: String, to: String,
            out: String): String =
          s"""${out}r AS (SELECT e.$to, sum(v) AS v
             |  FROM e JOIN $src ON $src.$from = e.$from GROUP BY 1),
             |${out}t AS (SELECT sum(v) AS tot FROM ${out}r),
             |$out AS (SELECT $to, CAST((v::HUGEINT * 1000000000) // tot
             |    AS BIGINT) AS v
             |  FROM ${out}r, ${out}t)""".stripMargin
        s"""WITH e AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
           |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
           |a0 AS (SELECT DISTINCT s, CAST(1 AS BIGINT) AS v FROM e),
           |${half("a0", "s", "c", "h1")},
           |${half("h1", "c", "s", "a1")},
           |${half("a1", "s", "c", "h2")},
           |${half("h2", "c", "s", "a2")}
           |SELECT * FROM (
           |  (SELECT 'hub' AS role, c AS id, v AS score FROM h2
           |    ORDER BY v DESC, c ASC LIMIT 10)
           |  UNION ALL
           |  (SELECT 'authority', s, v FROM a2
           |    ORDER BY v DESC, s ASC LIMIT 10))
           |ORDER BY role, score DESC, id ASC""".stripMargin
      },
      "graph_assortativity" ->
        """WITH e0 AS (SELECT DISTINCT o_custkey * 2 AS src,
          |    l_suppkey * 2 + 1 AS dst
          |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
          |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
          |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
          |p AS (SELECT dx.deg AS dx, dy.deg AS dy
          |  FROM e JOIN deg dx ON e.src = dx.src
          |  JOIN deg dy ON e.dst = dy.src),
          |g AS (SELECT count(*) AS n, CAST(sum(dx) AS HUGEINT) AS sx,
          |    CAST(sum(dy) AS HUGEINT) AS sy,
          |    CAST(sum(dx * dy) AS HUGEINT) AS sxy,
          |    CAST(sum(dx * dx) AS HUGEINT) AS sxx,
          |    CAST(sum(dy * dy) AS HUGEINT) AS syy
          |  FROM p)
          |SELECT n AS n_dir_edges,
          |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
          |    CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
          |  (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
          |    CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
          |   sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
          |    CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
          |    AS assortativity
          |FROM g""".stripMargin,
      // replicates the doubling move for move: d0 = (f, min(node, f)),
      // d(k) = d(k-1) composed with itself carrying the path min; cycle
      // nodes = image of d15's pointer; scc id = the carried min.
      // MATERIALIZED is load-bearing: each d(k) references d(k-1) twice,
      // so an inlining planner would expand d15 into 2^15 scan copies
      "graph_scc" -> {
        val dK = (1 to 15).map { k =>
          s"""d$k AS MATERIALIZED (SELECT a.node, b.ptr, least(a.mn, b.mn) AS mn
             |  FROM d${k - 1} a JOIN d${k - 1} b ON b.node = a.ptr)"""
            .stripMargin
        }.mkString(",\n")
        s"""WITH pr AS (SELECT o_custkey AS c, l_suppkey AS s,
           |    count(*) AS cnt,
           |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
           |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           |  GROUP BY 1, 2),
           |fc AS (SELECT c * 2 AS node, s * 2 + 1 AS ptr FROM (
           |    SELECT c, s, row_number() OVER (PARTITION BY c
           |      ORDER BY cnt DESC, s ASC) AS rn FROM pr) t WHERE rn = 1),
           |fs AS (SELECT s * 2 + 1 AS node, c * 2 AS ptr FROM (
           |    SELECT c, s, row_number() OVER (PARTITION BY s
           |      ORDER BY qty DESC, c ASC) AS rn FROM pr) t WHERE rn = 1),
           |d0 AS MATERIALIZED (SELECT node, ptr, least(node, ptr) AS mn
           |  FROM (SELECT * FROM fc UNION ALL SELECT * FROM fs) u),
           |$dK,
           |cyc AS (SELECT DISTINCT ptr AS node FROM d15),
           |g AS (SELECT d.node, d.mn FROM d15 d
           |  JOIN cyc ON cyc.node = d.node)
           |SELECT mn AS scc_id, count(*) AS size,
           |  count(CASE WHEN node % 2 = 0 THEN 1 END) AS n_cust,
           |  count(CASE WHEN node % 2 = 1 THEN 1 END) AS n_supp
           |FROM g GROUP BY 1 ORDER BY scc_id""".stripMargin
      },
      // the graph_bfs_hops recursive-CTE pattern, multi-seed (seed rides
      // the recursion key), capped at the operator's 6-hop horizon
      "graph_closeness" ->
        s"""WITH RECURSIVE $copurchaseSql,
           |e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
           |nodes AS (SELECT DISTINCT u AS x FROM e),
           |nn AS (SELECT count(*) AS n_nodes FROM nodes),
           |s AS (SELECT x AS seed FROM nodes ORDER BY x LIMIT 5),
           |d AS (SELECT seed, seed AS node, 0 AS dist FROM s
           |  UNION
           |  SELECT d.seed, e.v, d.dist + 1 FROM d JOIN e ON e.u = d.node
           |  WHERE d.dist < 6),
           |md AS (SELECT seed, node, min(dist) AS dist FROM d
           |  GROUP BY 1, 2),
           |g AS (SELECT seed, count(*) AS n_reached,
           |    CAST(sum(dist) AS BIGINT) AS sum_dist
           |  FROM md WHERE dist > 0 GROUP BY 1)
           |SELECT seed, n_reached, sum_dist,
           |  CAST(n_reached * n_reached AS DOUBLE) /
           |    CAST((n_nodes - 1) * sum_dist AS DOUBLE) AS closeness
           |FROM g, nn ORDER BY seed""".stripMargin
    )
  }

  /** Oracle spelling of [[copurchaseEdges]] at support >= 2 (CTE body). */
  private val copurchaseSql: String =
    """it AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
      |  FROM lineitem),
      |e0 AS (SELECT a.p AS u, b.p AS v FROM it a
      |  JOIN it b ON a.ok = b.ok AND a.p < b.p
      |  GROUP BY 1, 2 HAVING count(*) >= 2)""".stripMargin

  /** The three synchronous label-propagation argmax rounds over e0, CTE
    * for CTE against [[labelPropagationFrom]] — shared by the
    * label_propagation and modularity oracles so the partition they
    * check is the same text. Exposes `und` and `l3`.
    */
  private val labelPropChainSql: String = {
    def round(prev: String, ln: String): String =
      s"""$ln AS (SELECT src AS node, label FROM (
         |  SELECT e.src, l.label,
         |    row_number() OVER (PARTITION BY e.src
         |      ORDER BY count(*) DESC, l.label ASC) AS rk
         |  FROM und e JOIN $prev l ON e.dst = l.node
         |  GROUP BY e.src, l.label) WHERE rk = 1)""".stripMargin
    val chain = (1 to 3)
      .map(i => round(s"l${i - 1}", s"l$i")).mkString(",\n")
    s"""und AS (SELECT u AS src, v AS dst FROM e0
       |  UNION ALL SELECT v, u FROM e0),
       |l0 AS (SELECT DISTINCT src AS node, src AS label FROM und),
       |$chain""".stripMargin
  }
}
