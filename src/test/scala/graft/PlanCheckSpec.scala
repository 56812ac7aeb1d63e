package graft

import org.apache.spark.sql.functions._

import graft.ops.Tables
import graft.tools.PlanCheck

class PlanCheckSpec extends GraftSuite {

  test("audit of a star join reports broadcasts and no sort-merge join") {
    val a = PlanCheck.audit(
      SparkEntry.queries("q5_region_revenue")(spark, sfDir))
    assert(a.broadcasts >= 3, a.summary)
    assert(!a.hasSortMergeJoin, a.summary)
    assert(a.scans == 5, a.summary)
  }

  // --- the CI regression gate: plan invariants across EVERY contract query ---

  /** Queries allowed a cartesian/broadcast-nested-loop join: all of them
    * join a side that is tiny BY CONSTRUCTION (a <=25-row dimension table
    * or a 1-row scalar aggregate), where a nested-loop broadcast is the
    * correct plan. Anything else going cartesian is a scale regression.
    */
  private val cartesianWhitelist: Set[String] = Set(
    // the MINIMAL set, pinned by running the gate with an empty whitelist:
    // each entry below actually plans a CartesianProduct/BNLJ today, and
    // each is correct by construction. Notably NOT here: non_equi_join and
    // q6_revenue_delta (their tiny sides broadcast-hash on an equi key)
    // and agg_approx_sketch (all equi-joins on l_returnflag) — keeping
    // them out means the gate catches a future degradation of exactly
    // those queries.
    "cross_join",         // region x nation, 5 x 25 rows, the demo itself
    "fuzzy_nation_pairs", // nation x nation, 25 x 25, Levenshtein all-pairs
    "subquery_scalar",    // 1-row scalar aggregate broadcast under all rows
    "sim_topk_bruteforce", // 10-query vector set broadcast against corpus
    "sim_centroid_affinity", // label_a < label_b pair join of TWO 10-row
                          // centroid tables (k x k metadata scale; the
                          // corpus touches only the centroid aggregate)
    "sim_ann_ivf",        // coarse assignment: 10 queries x per-label
                          // centroids (bounded by label cardinality)
    "sim_ann_recall_ivf", // the same IVF coarse assignment (shared
                          // ivfTopkFrom) plus the sim_topk_bruteforce
                          // ground-truth side — both bounded broadcasts
    "sim_kmeans_step",    // assignment scoring: corpus x 10 broadcast
                          // centroids (bounded by cluster count k)
    "dedup_semantic",     // SemDeDup cluster assignment: the same corpus x
                          // 10-broadcast-centroid argmax as sim_kmeans_step
                          // (the pair join itself is a cluster equi-join)
    "dedup_embedding_bruteforce", // the HONEST all-pairs baseline, kept
                          // deliberately quadratic; the named scale path
                          // is dedup_embedding (LSH-bucketed equi-join)
    "text_rarity",        // 1-row corpus-totals aggregate broadcast
                          // under every token row
    "data_upsample_epochs", // 1-row max-mass aggregate broadcast under
                          // the 5-row per-language factor table
    "sim_ann_pq",         // 1-row codebook broadcast under the corpus
                          // (encoding) + 10-query set broadcast (ADC)
    "sim_ann_ivfpq",      // the same 1-row codebook broadcast (encoding)
                          // + the sim_kmeans_step-style 10-centroid
                          // broadcast (coarse probe)
    "sim_ann_mips",       // 1-row corpus-max-norm scalar broadcast under
                          // the corpus (the augmentation coordinate); the
                          // candidate probe itself is a bucket equi-join
    "q22_idle_customers", // 1-row average-balance scalar broadcast under
                          // the customer table (the Q22 gating predicate)
    "q11_important_stock", // 1-row global-value scalar broadcast under the
                          // per-part aggregate (the Q11 fraction gate)
    "data_bloom_dedup",   // 1-row bloom blob broadcast under the new-epoch
                          // scan (the probe side of the prefilter)
    "text_tfidf_topk",    // 1-row corpus-count aggregate broadcast under
                          // the scored token stream
    "text_unigram_em",    // 1-row corpus-total broadcast under the
                          // per-piece cost table, then the 1-row vocab
                          // blob (pieces+costs) broadcast under the
                          // distinct-word Viterbi pass — both bounded by
                          // vocabulary size, never the corpus
    "agg_cms_union",      // 1-row merged sketch x 1-row direct sketch
    "sim_ann_recall",     // contains the brute-force side: 10-query set
                          // broadcast against the corpus (the ground
                          // truth the LSH side is measured against)
    "text_bpe_merge",     // 1-row argmax-pair broadcast under the
                          // vocabulary (the merge target)
    "agg_kmv_intersect",  // 1-row sketch x 1-row sketch combine (the
                          // whole point: set algebra on two O(k) rows)
    "basket_pair_lift",   // 1-row order-count scalar broadcast under the
                          // ≥3-support pair survivors
    "data_range_partition_plan", // 1-row total-count scalar broadcast
                          // under the quantized histogram (metadata-scale)
    "text_cooccurrence_assoc", // 1-row total-pairs scalar broadcast under
                          // the ≥support pair survivors (as basket_pair_lift)
    "text_bm25",          // 1-row corpus-stats (N, Σdl) scalar broadcast
                          // under the two query terms' posting rows
    "events_cusum_changepoint", // 1-row (days, total) scalar broadcast
                          // under the day-sized daily series
    "events_markov_stationary", // 1-row type-count scalar broadcast under
                          // the |types|-sized initial distribution
    "data_inclusion_check", // 1-row count x 1-row anti-join-count combine
                          // per FK candidate (three scalar pairs)
    "graph_hits",         // 1-row L1-total scalar broadcast under the
                          // node-sized score table (each normalize step)
    "sim_silhouette",     // label-sized centroid table broadcast under
                          // every vector (the kmeans-step fan-out)
    "geo_nearest_hub",    // 25-row hub dimension broadcast under every
                          // customer (the spatial argmin assignment);
                          // geo_grid_join deliberately NOT here — its
                          // candidate join is a cell-id equi-join
    "geo_knn_hubs",       // the same 25-row hub dimension broadcast
                          // (top-3 variant of geo_nearest_hub)
    "geo_candidate_eval", // two 1-row scalar combines (candidate/exact
                          // counts x cross-size); the candidate join
                          // itself is the geo_grid_join cell equi-join
    "text_zipf_check",    // 1-row rank-1-count scalar broadcast under
                          // the 20-row top-k frame (the Zipf normalizer)
    "data_schema_drift",  // two 1-row scalar broadcasts (corpus midpoint
                          // day; half totals) under day-sized rollups
    "events_inactivity_churn", // 1-row corpus-max-timestamp scalar
                          // broadcast under the per-user last-seen table
    "events_session_depth_dist", // 1-row session-total scalar broadcast
                          // under the depth histogram (share column)
    "sim_cluster_balance", // 1-row list-total scalar broadcast under the
                          // k-row per-label list sizes (skew readout)
    "dedup_band_tuning",  // per-config 1-row candidate/hit/truth count
                          // combines (three scalar frames per banding)
    "text_heaps_law",     // 1-row max-doc-id scalar broadcast under the
                          // token stream (the decile bucketing bound)
    "data_curriculum_stages", // 1-row doc-total scalar broadcast under
                          // the bounded length-bucket histogram
    "events_freshness",   // 1-row corpus-watermark scalar broadcast under
                          // the |types|-sized last-seen table
    "sim_pq_train_step",  // the sim_ann_pq 1-row codebook broadcast under
                          // the corpus (shared pqEncode assignment stage)
    "text_spell_candidates", // 10-row dictionary broadcast under the vocab
                          // (length-band + banded-kernel fuzzy match)
    "sim_recall_matryoshka", // two sim_topk_bruteforce sides (full + 16-dim
                          // prefix): 10-query set broadcast against corpus
    "data_split_balance", // 1-row split-totals scalar broadcast under the
                          // langs-sized cell table (χ² expectations)
    "events_activity_pareto", // two 1-row scalar broadcasts (totals, cuts)
                          // over the tiny activity histogram
    "sim_ann_hamming",    // 10-query packed-code set (2 BIGINT words each)
                          // broadcast against the corpus code scan — the
                          // binary-quantization stage-1 linear scan; the
                          // stage-2 rerank joins are equi-joins
    "data_t_closeness",   // band-dimension (B rows) densify under the
                          // QI-sized group table + 1-row totals scalar —
                          // all metadata-scale after the first aggregate
    "sim_ann_recall_hamming", // both measured pipelines inside: the
                          // brute-force ground truth and the Hamming
                          // stage-1 scan each broadcast the 10-query set
    "graph_modularity",   // 1-row edge-count scalar broadcast under the
                          // label-sized community table
    "sim_mmr_diversify",  // the sim_topk_bruteforce 10-query broadcast
                          // for the relevance stage; the greedy rounds
                          // are equi-joins on (queries x 10) frames
    "sim_ann_recall_mips", // the exact max-dot ground truth inside: the
                          // 10-query set broadcast against the corpus
                          // (the MIPS side itself is bucket equi-joins)
    "events_did",         // 1-row midpoint-boundary scalar broadcast under
                          // the corpus scan (single-row DiD rollup)
    "sim_ann_recall_pq",  // the sim_ann_pq side (1-row codebook + 10-query
                          // broadcasts) plus the brute ground-truth side
    "sim_ann_recall_ivfpq", // the sim_ann_ivfpq side (codebook + coarse
                          // probe broadcasts) plus the brute ground truth
    "graph_closeness",    // 1-row node-count scalar broadcast under the
                          // 5-seed closeness rollup (BFS is equi-joins)
    "data_group_kfold",   // 1-row total-docs scalar broadcast under the
                          // 5-row fold rollup
    "data_token_budget",  // 1-row waterfilling-cap scalar broadcast under
                          // the source-sized allocation table
    "sim_ivf_nprobe_curve", // three sim_ann_ivf coarse assignments (10
                          // queries x label centroids) + the brute
                          // ground-truth broadcast, unioned per nprobe
    "dedup_lsh_recall",   // three 1-row scalar aggregates (truth /
                          // candidate / hit counts) combined into the
                          // single readout row
    "sim_ann_filtered",   // the label-blind post-filter side broadcasts
                          // the 10-query set against the corpus (the
                          // sim_topk_bruteforce shape); the pre-filter
                          // side is a label equi-join
    "text_kn_bigram",     // 1-row distinct-bigram-count scalar broadcast
                          // under the ≥3-support bigram survivors (the
                          // continuation-probability denominator — same
                          // shape as text_cooccurrence_assoc)
    "sim_range_recall",   // the exact-radius ground truth inside: the
                          // 10-query set broadcast against the corpus
                          // (the range search itself is bucket equi-joins)
    "sim_kmeans_convergence", // two sim_kmeans_step-style assignment
                          // rounds: corpus x 10 broadcast centroids each
                          // (bounded by cluster count k)
    "sim_knn_classify",   // the bruteTopkFrom ground-truth side: the
                          // 10-query set broadcast against the corpus
                          // (voting/argmax are k-row equi-joins)
    "sim_recall_vs_k",    // the brute top-10 ground-truth side: the
                          // 10-query set broadcast against the corpus
                          // (the LSH side is bucket equi-joins)
    "data_split_temporal", // 1-row boundary-day scalar broadcast under
                          // the corpus scan (the events_did shape)
    "dedup_method_overlap", // six 1-row scalar pair-count aggregates
                          // combined into the single audit row (the
                          // dedup_lsh_recall shape)
    "graph_louvain_move", // 1-row edge-count scalar broadcast under the
                          // node-sized gain table (the graph_modularity
                          // shape)
    "graph_bottlenecks",  // 3-row seed frame self-paired on an inequality
                          // (seed-pair enumeration); everything data-sized
                          // is equi-joined on (seed, node)
    "sim_ann_graph_greedy", // the sim_ann_ivf coarse-assignment shape: 10
                          // queries x label centroids broadcast; graph
                          // build and walk are label/vec_id equi-joins
    "graph_conductance",  // 1-row edge-count scalar broadcast under the
                          // label-sized cut/vol table (the
                          // graph_modularity shape)
    "sim_ann_recall_graph" // both measured pipelines inside: the greedy
                          // walk's coarse assignment and the brute-force
                          // ground truth each broadcast the 10-query set
  )

  /** Queries allowed a sort-merge join: full-outer needs both sides
    * materialized and unmatched rows emitted from each — SMJ is Spark's
    * robust full-outer shape (hash variants buffer an unbounded unmatched
    * side). Everything else must plan hash or broadcast joins.
    */
  private val smjWhitelist = Set("join_full",
    // bucket-co-located SMJ with zero exchanges IS the demonstrandum:
    // the write-side bucket layout replaces the join shuffle
    "data_sink_bucketed",
    // the cascades WINNER chose an enforcer-free SortMergeJoin over
    // clustered layouts and the lowering executes exactly that choice —
    // CascadesExecSpec additionally pins zero exchanges AND zero sorts
    "cascades_exec_smj_clustered")
  // data_snapshot_diff deliberately NOT here (r5): rewritten join-free —
  // a single pre-filtered scan; the gate now catches any regression back
  // to the full-outer SMJ shape.

  /** OUTPUT-TYPE hazards: types whose canonicalization is known to
    * differ across arrow/duckdb consumer stacks, so a provably-correct
    * result can hash-mismatch at a driver-side gate. The r6 round's only
    * 3 driver-gate fails were exactly its only DECIMAL(38,0) output
    * columns; `agg_quantiles_multi`'s arrow-metadata lesson is the list
    * case; TIMESTAMP_NTZ round-trips differently by session zone config.
    * Queries must render such columns as STRING (exact, collation-free)
    * or split them into BIGINT limbs before they reach the gate.
    */
  private def outputTypeHazards(
      schema: org.apache.spark.sql.types.StructType): Seq[String] = {
    import org.apache.spark.sql.types._
    def walk(name: String, dt: DataType): Seq[String] = dt match {
      case d: DecimalType if d.precision > 18 =>
        Seq(s"$name: DECIMAL(${d.precision},${d.scale}) > 18 digits")
      case _: ArrayType => Seq(s"$name: array-typed output")
      case _: MapType   => Seq(s"$name: map-typed output")
      case _: TimestampNTZType => Seq(s"$name: timestamp_ntz output")
      case s: StructType =>
        s.fields.toSeq.flatMap(f => walk(s"$name.${f.name}", f.dataType))
      case _ => Nil
    }
    schema.fields.toSeq.flatMap(f => walk(f.name, f.dataType))
  }

  test("gate: no unplanned cartesian joins, no sort-merge joins, and no " +
      "hazardous output types, anywhere") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val df = fn(spark, sfDir)
        df.queryExecution.toRdd.count()
        val a = PlanCheck.audit(df)
        val s = df.queryExecution.executedPlan.toString
        val cartesian = s.contains("CartesianProduct") ||
          s.contains("BroadcastNestedLoopJoin")
        val bad = Seq(
          (cartesian && !cartesianWhitelist(name)) -> "cartesian/BNLJ",
          (a.hasSortMergeJoin && !smjWhitelist(name)) -> "sort-merge join")
          .collect { case (true, what) => s"$name: $what" } ++
          outputTypeHazards(df.schema).map(h => s"$name: $h")
        spark.catalog.clearCache()
        bad
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }

  test("lateral top-k join decorrelates to WindowGroupLimit + hash join, " +
      "never a per-row apply") {
    val df = SparkEntry.queries("lateral_topk_join")(spark, sfDir)
    df.queryExecution.toRdd.count()
    val s = df.queryExecution.executedPlan.toString
    // the partial+final rank-limit pushdown IS the decorrelation proof:
    // top-2-per-customer is computed as a distributed group limit, and
    // the lateral becomes ONE equi-join
    assert(s.contains("WindowGroupLimit"), s)
    assert(s.contains("BroadcastHashJoin") || s.contains("ShuffledHashJoin"),
      s)
    assert(!s.contains("BroadcastNestedLoopJoin") &&
      !s.contains("CartesianProduct"), s)
    spark.catalog.clearCache()
  }

  test("audit reports pushed filters and pruned schema for a filtered scan") {
    val df = Tables(spark, sfDir).lineitem
      .filter(col("l_quantity") > 30.0).select("l_orderkey")
    val a = PlanCheck.audit(df)
    assert(a.pushedFilters.exists(_.contains("GreaterThan(l_quantity,30.0)")),
      a.pushedFilters.mkString(";"))
    assert(a.readSchemas.exists(_.contains("l_orderkey")), a.readSchemas)
    assert(a.shuffles == 0, a.summary)
    assert(a.wholeStageCodegenStages >= 1, a.summary)
  }
}
