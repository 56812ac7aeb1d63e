package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Regenerates PLANS.md: the executed physical plans of the headline
  * queries with a one-line scale rationale each. Run:
  * `sbt "Test/runMain graft.DumpPlans"`.
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val picks = Seq(
      "q1_pricing" -> ("single scan, pushed shipdate filter, partial+final " +
        "hash aggregate, one shuffle on the group keys"),
      "q5_region_revenue" -> ("star join: every dimension broadcasts, zero " +
        "shuffle joins; one shuffle for the final aggregate"),
      "inner_hash_join" -> ("fact-to-fact equi join; above the broadcast " +
        "threshold Join2HashJoinStrategy plans a shuffled hash join"),
      "events_sessionize" -> ("one shuffle on user_id shared by the lag " +
        "window, the running-sum window, and the session aggregate"),
      "dedup_minhash_lsh" -> ("signature table materialized once; " +
        "candidates from an equi-join on (band, signature); exact " +
        "verification only on candidates"),
      "dedup_ngram_jaccard" -> ("df-ordered PPJoin: one linear shuffle to " +
        "attach document frequencies, prefix index keyed by each doc's " +
        "RAREST shingles (hot keys never indexed), candidate equi-join + " +
        "position/size filters, exact merge verify on candidates"),
      "dedup_embedding" -> ("OR-amplified LSH: one codegen'd kernel pass " +
        "computes all 16x4-bit table signatures; candidates from an " +
        "equi-join on (table, bucket); exact quantized-cosine verify"),
      "join_skew_aqe" -> ("75% of probe rows share one join key: AQE's " +
        "skew-join split handles the hot partition at runtime (the " +
        "complement to the manual salting in agg_salted)"),
      "sim_topk_bruteforce" -> ("query set broadcast against the corpus " +
        "scan; quantized-cosine kernel inside whole-stage codegen; top-k " +
        "via rank window"),
      "topk" -> "TakeOrderedAndProject: per-partition top-k, no global sort",
      "agg_approx_sketch" -> ("KMV order statistic via the kmin_kth_long " +
        "O(k)-state aggregate fused into the sketch pass — no distinct " +
        "shuffle, no row_number window over the hash table; the only " +
        "windows left are the 150-row cumulative-median ones"),
      "sim_label_centroid" -> ("one vec_sum_longs aggregation pass: the " +
        "shuffle carries a single D-length partial per (partition, label) " +
        "— no posexplode of NxD rows, no (label, dim) self-join"),
      "data_decontaminate" -> ("benchmark grams broadcast; corpus-side " +
        "candidate generation is a map + broadcast hash join + partial " +
        "aggregate — no corpus shuffle"),
      "data_vocab_topk" -> ("vocab build: partial+final bigram count, " +
        "then WindowGroupLimit prunes to k rows per (lang, partition) " +
        "BEFORE the per-lang rank sort — the corpus-scale top-k shape"),
      "events_retention" -> ("event volume collapses to distinct " +
        "user-weeks first; cohort week attaches via a per-user window " +
        "min on the SAME frame — one source scan, no self-join"),
      "events_interval_join" -> ("range join as a bucketed equi-join: " +
        "click intervals explode to <=2 covered buckets, purchases own " +
        "exactly one, residual range filter after the hash join — " +
        "linear shuffle, no nested-loop theta join"),
      "q17_small_quantity" -> ("agg-rejoin on the fact key: partial " +
        "per-part aggregate below its exchange, final aggregate's " +
        "partitioning feeds the join — two hash exchanges total"),
      "sim_kmeans_step" -> ("Lloyd iteration: centroids broadcast, " +
        "argmax assignment via partial+final max(struct) aggregate " +
        "(map-side collapse of the k-way fan-out), centroid recompute " +
        "via the one-pass vec_sum_longs aggregate"),
      "data_bloom_dedup" -> ("epoch dedup prefilter: old epoch reduces " +
        "to ONE bloom blob (partial+final OR-merge aggregate), blob " +
        "broadcasts, codegen'd probe on the new-epoch scan; only " +
        "bloom-maybe candidates reach the exact anti-join"),
      "q21_blame_supplier" -> ("EXISTS + NOT EXISTS over the same fact " +
        "table: one left-semi and one left-anti self-join, both " +
        "shuffling on the order key with supplier-mismatch residuals"),
      "data_snapshot_diff" -> ("CDC diff, join-free: both snapshots " +
        "derive from one table, so a single scan computes membership " +
        "flags + both md5s conditionally; cheap modulo/update-set " +
        "pre-filter prunes ~4/5 of the corpus before any md5; only the " +
        "delta reaches the presentation sort"),
      "text_tfidf_topk" -> ("tf aggregate on (doc, token), df over the " +
        "tf table, 1-row corpus count broadcast, WindowGroupLimit top-3 " +
        "per doc before the rank sort"),
      "q11_important_stock" -> ("fraction-of-global gate: ONE fact " +
        "shuffle builds the per-part aggregate; the global scalar " +
        "re-aggregates that view through an AQE-reused shuffle stage " +
        "and broadcasts under the integer-scaled compare"),
      "agg_quantile_hist" -> ("mergeable histogram quantiles: " +
        "partial+final bin counts (<= groups x 128 rows shuffle), " +
        "cumulative window over the tiny hist table, integer " +
        "cross-multiplied thresholds — the data is scanned once, " +
        "windowed never"),
      "data_sample_systematic" -> ("weighted systematic sample: " +
        "per-stratum running-mass window + total window share one " +
        "shuffle on lang; pick = pure integer stride arithmetic in a " +
        "codegen'd filter"),
      "dedup_semantic" -> ("SemDeDup: 10 broadcast centroids assign " +
        "clusters via a partial+final max(struct) argmax; the pair join " +
        "is a cluster-keyed equi-join — the cluster count bounds the " +
        "quadratic term, never corpus all-pairs"),
      "sim_ann_ivfpq" -> ("IVF-PQ: coarse probe picks nprobe lists per " +
        "query from broadcast centroids; candidates are a list-keyed " +
        "equi-join ranked by ADC over the one-row broadcast codebook — " +
        "only codes feed the search, never raw corpus vectors"),
      "events_attribution" -> ("conversions broadcast against touches on " +
        "user_id with the 7-day band as residual; last/first credits via " +
        "one max/min(struct) aggregate (map-side collapsible); per-type " +
        "aggregates recombine by union + re-aggregate, no join of " +
        "aggregates"),
      "text_ngram_novelty" -> ("first-occurrence attribution: distinct " +
        "(doc, gram) frame cached once and reduced twice — per-doc " +
        "counts and gram-wise min(doc_id) — with only the two doc-keyed " +
        "aggregates joining; the gram stream is never joined back"),
      "data_compaction_plan" -> ("OPTIMIZE planner at metadata scale: " +
        "one row per file, prefix-sum window partitioned by the table " +
        "partition key, one tiny aggregate — no join, one scan"),
      "mm_phash_dedup" -> ("perceptual-hash dedup: aHash from the " +
        "RLE1-decoded pixels is a map stage; Hamming<=3 candidates from " +
        "a banded equi-join with first-shared-band exactly-once " +
        "emission — never image all-pairs"),
      "text_bpe_merge" -> ("BPE merge step: pair counts over the " +
        "VOCABULARY (not the corpus), 1-row argmax-pair broadcast, " +
        "greedy-merge position arithmetic in one (sym)-partitioned " +
        "window sort, recount — the corpus is scanned once, for the " +
        "vocab build"),
      "graph_pagerank" -> ("integer PageRank, Pregel-as-join-agg: " +
        "degree-annotated edges persisted once; per iteration one " +
        "contrib shuffle (edges join the node-sized rank frame, " +
        "partial+final sum on dst); top-k via TakeOrdered — exact " +
        "integer arithmetic makes the result order-independent"),
      "data_sink_bucketed" -> ("bucket-co-located fact join: both " +
        "sides written bucketBy(8, doc_id) sortBy, read-back SMJ fed " +
        "directly by bucketed scans — zero join-side exchanges; the " +
        "only shuffles are the post-join aggregate and the " +
        "presentation sort"),
      "text_heavy_hitters" -> ("two-pass exact heavy hitters: pass 1 " +
        "is a zero-shuffle map-side Misra–Gries candidate aggregate " +
        "(tokens consumed inside update, no explode); pass 2 " +
        "exact-counts only the ≤k candidates via broadcast semi-join " +
        "— the vocabulary never shuffles"),
      "text_gopher_quality" -> ("Gopher rule panel: the top-2/3/4-gram " +
        "masses fold over each doc's own sorted shingle array inside " +
        "whole-stage codegen — zero exchanges, zero joins, one scan; " +
        "the whole filter is a map stage at any corpus size"),
      "sim_ann_filtered" -> ("filtered search both ways: pre-filter is " +
        "a label equi-join before the rank window (partition-prunable " +
        "at scale); post-filter ranks the blind broadcast top-20 then " +
        "filters — every metadata-scale rollup join explicitly " +
        "broadcast"),
      "data_token_budget" -> ("waterfilling: the corpus collapses to " +
        "one row per source, every window runs over that source-sized " +
        "frame, and the 1-row cap broadcasts back — the planner costs " +
        "one aggregate regardless of corpus size"),
      "agg_kmv_intersect" -> ("KMV set algebra: one O(k)-state sketch " +
        "aggregate per side, a 1×1 cross of the two sketch rows, array " +
        "math for θ/c — union AND intersection estimates with no " +
        "second scan of either input"),
      "skyline_pareto" -> ("2-D Pareto frontier as the two-level " +
        "distributed prefix max: within-band windows partitioned by " +
        "price band (parallel), per-band carry-in cumulated on a " +
        "metadata-sized frame and broadcast back — no global " +
        "single-partition sort"),
      "graph_bfs_hops" -> ("frontier-join BFS: per round one equi-join " +
        "of ONLY the newest frontier against the persisted edge list, " +
        "node-sized min-dist aggregate, and a per-round lineage cut " +
        "(dist is consumed twice per round — uncut, round k's plan " +
        "held 2^k copies of round 0); depth cap bounds rounds"),
      "text_bm25" -> ("BM25 retrieval: the posting filter runs BEFORE " +
        "the shuffle (only the two query terms' postings move), df and " +
        "corpus stats broadcast as scalars, per-doc term sum pivoted " +
        "into one fixed-order addition"),
      "graph_hits" -> ("integer HITS: per half-step one edges-scores " +
        "equi-join + partial+final sum, then a 1-row L1-total broadcast " +
        "for the normalize — O(rounds x m), no driver round-trips"),
      "sim_dbscan_core" -> ("approximate DBSCAN core points: LSH " +
        "signatures computed map-side, candidate pairs from a bucket " +
        "equi-join (never all-pairs), exact-cosine verify on candidates " +
        "only, endpoint fan-out is a map-side explode"),
      "dedup_substring_spans" -> ("ExactSubstr dedup: the token-count-" +
        "sized window stream collapses in ONE groupBy(shingle) shuffle " +
        "(the distributed suffix-array stand-in); only duplicated " +
        "instances reach the per-doc islands window"),
      "graph_path_counts" -> ("Brandes sigma forward pass: per round one " +
        "frontier-edges equi-join + a dst-keyed sum, node-sized lineage " +
        "cut per round (without it the chain replans ~2^k times — " +
        "measured 27 s -> 3 s at sf0.1)"),
      "pipeline_release" -> ("the release flagship: ONE persisted " +
        "tokenized base read by the quality gate, the PPJoin pair graph " +
        "and the split rollup; decontamination broadcasts the bench " +
        "grams; the manifest is one split-keyed aggregate"),
      "sim_ann_graph_greedy" -> ("graph ANN: within-cell kNN edges from " +
        "a label-keyed equi self-join (cell-bounded quadratic), walk " +
        "rounds are 10-row frames joining the persisted edge list — " +
        "the corpus is scored only at visited candidates"),
      "graph_louvain_move" -> ("Louvain move pass: per-(node, adjacent " +
        "community) edge counts in one edge-keyed aggregate, label-sized " +
        "degree sums, map-side max(struct) argmax, shuffle_hash-pinned " +
        "final node join (both sides node-sized and stats-free after " +
        "their lineage cuts — SMJ fallback caught by the plan gate)"),
      "data_length_buckets" -> ("padding-waste eval: both strategies are " +
        "per-shard row_number windows (no global sort) over one token " +
        "count scan; rollups are two-level aggregates"),
      "geo_grid_join" -> ("spatial distance join: the supplier dimension " +
        "fans out to its 3x3 neighbor cells and broadcasts; the fact " +
        "side computes its cell in a codegen'd map and equi-joins — " +
        "map-only at any fact size, candidates bounded by density x 9"),
      "graph_local_bridges" -> ("weak-tie detection: the degree-ordered " +
        "triangle kernel (O(m^1.5) wedge bound) enumerates triangle " +
        "edges once; bridges are one anti-join of the edge list against " +
        "that set — no per-edge neighborhood intersections"),
      "text_skipgrams" -> ("skip-gram pair generation: pairs built " +
        "array-locally per document (slice + arrays_zip at both " +
        "offsets), zero joins — the only shuffle is the final " +
        "partial+final pair count"),
      "text_unigram_em" -> ("unigram-LM hard-EM step: vocabulary costs " +
        "from two count-over-vocabulary aggregates, then ONE broadcast " +
        "(vocab blob) codegen'd Viterbi pass over distinct words — no " +
        "join touches the corpus stream; bigger vocab changes the blob, " +
        "not the plan"),
      "text_quality_classifier" -> ("fastText-shape inference: hashed " +
        "unigram+bigram features and the weight dot product are one " +
        "codegen'd map stage over the token stream; one partial+final " +
        "aggregate per doc — classifier cost is marginal over the scan"),
      "cascades_exec_broadcast_dim" -> ("a MiniCascades WINNER executed: " +
        "parquet-footer stats chose BroadcastHashJoin(build=nation) in " +
        "the cascades memo; the lowered DataFrame plan carries exactly " +
        "that choice (broadcast exchange on the 25-row side, zero " +
        "shuffles on the fact side) — the planner.rs:29-55 lifecycle " +
        "closed"))
    val sb = new StringBuilder
    sb.append("# PLANS — executed physical plans of headline queries\n\n")
    sb.append("Regenerate with `sbt \"Test/runMain graft.DumpPlans\"` " +
      "(sf0.01, AQE on, GraftExtensions installed).\n")
    picks.foreach { case (name, why) =>
      val df = SparkEntry.queries(name)(spark, d)
      df.collect()
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p                        => p
      }
      sb.append(s"\n## $name\n\n$why\n\n```\n")
      sb.append(plan.toString.linesIterator.map(_.take(200)).mkString("\n"))
      sb.append("\n```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println("### wrote PLANS.md")
  }
}
