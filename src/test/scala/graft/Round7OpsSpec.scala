package graft

import org.apache.spark.sql.functions._

import graft.ops._

/** Semantics pins for the round-7 operator batch. Planted-input tests
  * where a helper is separable (eccentricity); cross-query and
  * arithmetic invariants on the shared sf frame elsewhere (each pins a
  * property the DuckDB oracle alone cannot: internal consistency across
  * queries, set-containment between configurations, and edge-case
  * conventions).
  */
class Round7OpsSpec extends GraftSuite {

  test("eccentricity: planted path respects the hop cap and the " +
      "reached-set accounting") {
    import spark.implicits._
    // path 0-1-2-3: seeds are the 3 smallest ids (0, 1, 2)
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("u", "v")
    def run(hops: Int): Seq[(Long, Int, Long)] =
      GraphOps.eccentricityFrom(edges, nSeeds = 3, hops = hops)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .toSeq
    // uncapped (hops=4 > diameter): true eccentricities
    assert(run(4) == Seq((0L, 3, 4L), (1L, 2, 4L), (2L, 2, 4L)))
    // capped at 2: seed 0 reaches only {0,1,2}, ecc clips to the cap
    assert(run(2) == Seq((0L, 2, 3L), (1L, 2, 4L), (2L, 2, 4L)))
    spark.catalog.clearCache()
  }

  test("band tuning: re-banding the same signature is monotone — " +
      "an r-row band match implies its sub-band matches") {
    val rows = DedupOps.queries("dedup_band_tuning")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq // (bands, n_candidates, n_hit, n_truth)
    assert(rows.map(_._1) == Seq(2, 4, 8))
    // candidates(2x8) ⊆ candidates(4x4) ⊆ candidates(8x2): a match on a
    // wide band is a match on both its halves
    assert(rows(0)._2 <= rows(1)._2 && rows(1)._2 <= rows(2)._2, rows)
    assert(rows(0)._3 <= rows(1)._3 && rows(1)._3 <= rows(2)._3, rows)
    // the exact ground truth is config-independent and equals the
    // shipped dedup_lsh_recall row's truth count
    assert(rows.map(_._4).distinct.size == 1, rows)
    val recallTruth = DedupOps.queries("dedup_lsh_recall")(spark, sfDir)
      .collect().head.getLong(0)
    assert(rows.head._4 == recallTruth)
    spark.catalog.clearCache()
  }

  test("uplift segments: per-segment user accounting reconciles with " +
      "the unsegmented A/B row") {
    val seg = EventOps.queries("events_uplift_segments")(spark, sfDir)
      .collect()
    val ab = EventOps.queries("events_ab_lift")(spark, sfDir)
      .collect().head
    // segments PARTITION the user base: per-arm users and conversions
    // sum to the unsegmented lift row's totals
    assert(seg.map(_.getLong(1)).sum == ab.getLong(0)) // users_a
    assert(seg.map(_.getLong(2)).sum == ab.getLong(1)) // conv_a
    assert(seg.map(_.getLong(3)).sum == ab.getLong(2)) // users_b
    assert(seg.map(_.getLong(4)).sum == ab.getLong(3)) // conv_b
    spark.catalog.clearCache()
  }

  test("quarantine: the reason mask is exactly the flag bits, and " +
      "clean documents never appear") {
    val rows = DataOps.queries("data_quarantine")(spark, sfDir).collect()
    rows.foreach { r =>
      val mask = (if (r.getBoolean(2)) 1L else 0L) +
        (if (r.getBoolean(3)) 2L else 0L) +
        (if (r.getBoolean(4)) 4L else 0L)
      assert(r.getLong(5) == mask && mask > 0L, r)
    }
    spark.catalog.clearCache()
  }

  test("cdc net-effect: the collapse matrix is total and op counts " +
      "reconcile with the filtered changelog") {
    val rows = DataOps.queries("data_cdc_net_effect")(spark, sfDir)
      .collect()
    val nOps = Tables(spark, sfDir).events
      .filter(col("event_type").isin("signup", "click", "error")).count()
    assert(rows.map(_.getLong(1)).sum == nOps)
    rows.foreach { r =>
      val (f, l, net) = (r.getString(2), r.getString(3), r.getString(4))
      val want =
        if (l == "D") { if (f == "I") "none" else "delete" }
        else { if (f == "I") "insert" else "upsert" }
      assert(net == want, r)
    }
    spark.catalog.clearCache()
  }

  test("silence trim: lead + kept + trail tiles the sample stream; " +
      "all-silent assets follow the border-crop convention") {
    val rows = MultimodalOps.queries("mm_silence_trim")(spark, sfDir)
      .collect()
    rows.foreach { r =>
      val (n, lead, trail, kept) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      if (kept > 0) assert(lead + kept + trail == n, r)
      else assert(lead == n && trail == 0L, r)
    }
    spark.catalog.clearCache()
  }

  test("patch plan: the reshape is the minimal covering grid with " +
      "w <= h, and padding closes the identity") {
    val rows = MultimodalOps.queries("mm_patch_plan")(spark, sfDir)
      .collect()
    rows.foreach { r =>
      val (l, w, h, pad) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5))
      assert(w * h - l == pad && pad >= 0, r)
      if (l > 0) {
        assert(w <= h, r)        // floor(sqrt) is the short side
        assert(w * (h - 1) < l, r) // h is minimal for this w
      }
    }
    spark.catalog.clearCache()
  }

  test("percent_rank/cume_dist: standard-definition bounds and the " +
      "per-partition terminal value 1.0") {
    val rows = Analytics.queries("window_percent_rank")(spark, sfDir)
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0, r)
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0, r)
    }
    val maxCume = rows.groupBy(_.getString(0))
      .map { case (_, rs) => rs.map(_.getDouble(4)).max }
    assert(maxCume.forall(_ == 1.0))
    spark.catalog.clearCache()
  }

  test("centroid affinity: k(k-1)/2 pairs, cosine bounded, symmetric " +
      "to the label-swap by construction") {
    val rows = SimilarityOps.queries("sim_centroid_affinity")(spark, sfDir)
      .collect()
    val k = SimilarityOps.queries("sim_cluster_balance")(spark, sfDir)
      .count()
    // cluster_balance excludes the 10 query vectors; affinity uses all
    // labels — both see every label on this frame
    assert(rows.length == (k * (k - 1)) / 2, s"${rows.length} vs k=$k")
    rows.foreach { r =>
      assert(r.getDouble(2) >= -1.0000001 && r.getDouble(2) <= 1.0000001, r)
      assert(r.getInt(0) < r.getInt(1), r)
    }
    spark.catalog.clearCache()
  }

  test("ttr buckets: pooled ratio is the quotient of the published " +
      "sufficient statistics") {
    val rows = TextOps.queries("text_ttr_buckets")(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getDouble(4) ==
        r.getLong(3).toDouble / r.getLong(2).toDouble, r)
      assert(r.getLong(3) <= r.getLong(2), r) // types never exceed tokens
    }
    spark.catalog.clearCache()
  }

  test("zipf check: rank-1 normalizer makes c_norm(1) exactly 1.0 and " +
      "counts are nonincreasing in rank") {
    val rows = TextOps.queries("text_zipf_check")(spark, sfDir).collect()
    assert(rows.length == 20)
    assert(rows.head.getDouble(4) == 1.0)
    val ns = rows.map(_.getLong(2))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, ns.toSeq)
    spark.catalog.clearCache()
  }

  // --- session-3 additions ---

  test("motion: shifts stay in {-1,0,1} and the argmin never beats " +
      "the zero-shift SAD it was chosen against") {
    val rows = MultimodalOps.queries("mm_motion")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(Set(-1, 0, 1)(r.getInt(2)), r.toString)
      assert(r.getLong(3) <= r.getLong(4),
        s"sad_best > sad_zero: $r") // best is a min over a set incl. 0
      if (r.getInt(2) == 0) assert(r.getLong(3) == r.getLong(4))
    }
  }

  test("autocorr: lag in [4,16] and R(best) <= R(0) (Cauchy-Schwarz)") {
    val rows = MultimodalOps.queries("mm_audio_autocorr")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(1) >= 4 && r.getInt(1) <= 16, r.toString)
      assert(r.getLong(2) <= r.getLong(3),
        s"R(tau) > R(0): $r") // |R(tau)| <= R(0) for any real signal
    }
  }

  test("heaps law: both curves are monotone, the final vocab is the " +
      "corpus distinct-word count and final tokens the corpus total") {
    val rows = TextOps.queries("text_heaps_law")(spark, sfDir).collect()
      .sortBy(_.getInt(0))
    assert(rows.length == 10)
    val toks = Tables(spark, sfDir).documents
      .select(explode(split(col("text"), " ")).as("w"))
    assert(rows.last.getLong(1) == toks.count())
    assert(rows.last.getLong(2) == toks.distinct().count())
    rows.sliding(2).foreach { p =>
      assert(p(0).getLong(1) < p(1).getLong(1)) // tokens strictly grow
      assert(p(0).getLong(2) <= p(1).getLong(2)) // vocab never shrinks
    }
  }

  test("local bridges: no reported edge participates in any triangle " +
      "(independent adjacency-intersection recompute)") {
    val bridges = GraphOps.queries("graph_local_bridges")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    spark.catalog.clearCache()
    assert(bridges.nonEmpty)
    // independent ground truth: undirected adjacency sets in the test
    val t = Tables(spark, sfDir)
    val it = t.lineitem.select(col("l_orderkey").as("ok"),
      col("l_partkey").as("p")).distinct()
    val edges = it.as("a").join(it.as("b"),
        col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("u"), col("b.p").as("v"))
      .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
      .select("u", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    bridges.foreach { case (u, v) =>
      assert((adj(u) & adj(v)).isEmpty, s"($u,$v) shares a neighbor")
    }
    // and completeness: every triangle-free edge IS reported
    val want = edges.filter { case (u, v) => (adj(u) & adj(v)).isEmpty }
    assert(bridges.toSet == want.toSet,
      s"missing ${want.toSet -- bridges.toSet}")
  }

  test("bipartite check: a planted even cycle certifies bipartite, a " +
      "triangle does not, and an odd-cycle-with-tail flags the whole " +
      "component") {
    import spark.implicits._
    // component A: 4-cycle 1-2-3-4-1 (bipartite); component B: triangle
    // 10-11-12 with tail 12-13 (odd cycle poisons the tail's component)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L),
      (10L, 11L), (10L, 12L), (11L, 12L), (12L, 13L)).toDF("u", "v")
    val got = GraphOps.bipartiteCheckFrom(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq
    spark.catalog.clearCache()
    assert(got == Seq((1L, 4L, 0L, true), (10L, 4L, 4L, false)), got)
  }

  test("curriculum stages: stages partition the corpus ~equally (within " +
      "one length-bucket's mass) and cum_tokens telescopes") {
    val rows = DataOps.queries("data_curriculum_stages")(spark, sfDir)
      .collect().sortBy(_.getLong(0))
    val nDocs = Tables(spark, sfDir).documents.count()
    assert(rows.map(_.getLong(1)).sum == nDocs) // stages partition
    assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length))
    var cum = 0L
    rows.foreach { r =>
      cum += r.getLong(2)
      assert(r.getLong(3) == cum, s"cum_tokens breaks at stage ${r.get(0)}")
      assert(r.getLong(4) <= r.getLong(5)) // min_len <= max_len
    }
    // stage lengths ascend: a later stage never starts below an earlier
    rows.sliding(2).foreach { p =>
      assert(p(0).getLong(5) <= p(1).getLong(4) + 15,
        s"stage overlap beyond bucket width: ${p(0)} vs ${p(1)}")
    }
  }
}
