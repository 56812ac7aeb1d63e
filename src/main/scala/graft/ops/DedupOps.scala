package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.functions.{jaccard_sim, minhash_sig, quant_dot, simhash64}
import graft.ops.Checkpoints._

/** Deduplication operators over `documents` / `embeddings` — the core of a
  * training-data pipeline at 100 TB.
  *
  * Scale design:
  *  - exact dedup = hash-aggregate on a content digest (one shuffle on the
  *    digest; the digest, not the full text, is the shuffle key).
  *  - n-gram Jaccard = PPJoin prefix-filtered inverted-index self-join under
  *    a document-frequency-ascending global shingle order (rarest shingles
  *    index each doc; hot "stop shingles" never reach a prefix), with
  *    position + size filters and a df-cap that isolates residual hot keys
  *    into their own exchange — see [[jaccardDupPairs]].
  *  - MinHash/LSH = the scale path: signatures via the single-pass
  *    [[graft.functions.MinHashSignature]] expression (no explode/shuffle),
  *    candidates from an equi-join on (band, band-signature), then exact
  *    verification only on candidates — linear-ish shuffle instead of
  *    all-pairs.
  *  - SimHash = 64-bit signature via [[graft.functions.SimHash64]]; near-dup
  *    = Hamming ≤ 3 found by pigeonhole banding on 16-bit chunks (pairs
  *    within Hamming ≤ 3 must agree on ≥ 1 of 4 chunks) — an equi-join.
  *  - embedding near-dup = OR-amplified LSH bucketing (16 tables x 4
  *    hyperplane bits) for candidates, exact quantized cosine (codegen'd
  *    [[graft.functions.QuantizedCosine]] kernel) for verification;
  *    brute-force all-pairs kept as the exact baseline
  *    (`dedup_embedding_bruteforce`).
  */
object DedupOps {
  type Q = (SparkSession, String) => DataFrame

  /** doc_id + distinct 3-token shingle set. */
  private[graft] def shingleSets(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      array_distinct(TextOps.shingles(col("text"), 3)).as("sh"))

  /** EXACT Jaccard >= p/q duplicate pairs via PPJoin prefix filtering under
    * a DOCUMENT-FREQUENCY-ascending global shingle order.
    *
    * Why df-ascending (vs the arbitrary hash order of a naive prefix
    * filter): any consistent global total order preserves PPJoin
    * completeness, and ordering by (df asc, hash asc) puts each document's
    * RAREST shingles into its prefix. The inverted index is then keyed
    * almost exclusively by low-frequency shingles, so the per-key candidate
    * blowup (k docs on one key → k² pairs) collapses: a corpus-wide "stop
    * shingle" sorts LAST in every document and never enters a prefix at
    * all. This is the Chaudhuri/Xiao PPJoin design; without it a single hot
    * shingle makes candidate generation quadratic at 100 TB.
    *
    * Exactness chain (each step keeps a superset of true pairs, the final
    * verify is exact):
    *  - prefix length n - ceil(t·n) + 1, integer form of ceil(n·p/q) =
    *    (n·p + q - 1) div q — the double form floor(n(1-t))+1 is one short
    *    when t·n is integral;
    *  - size filter: J >= p/q forces q·min(na,nb) >= p·max(na,nb);
    *  - position filter: a collision at (0-based) prefix positions (i, j)
    *    under one shared order bounds the overlap by
    *    min(i,j) + 1 + min(na-i-1, nb-j-1); the pair is kept only if the
    *    TIGHTEST such bound reaches ceil(p·(na+nb)/(p+q)), the minimum
    *    overlap J >= p/q requires;
    *  - exact verify: linear merge over the full sorted hash sets.
    *
    * df-cap routing: index entries with df > `dfCap` are joined in their own
    * exchange instead of the main one. Both paths are the same exact
    * equi-join — the routing exists so a residual hot key (possible only
    * when a document's ENTIRE prefix is hot, i.e. near-stop-shingle-only
    * docs) skews a small isolated join that AQE can split, not the main
    * candidate exchange.
    *
    * Input: (doc_id, sh: array<string>) with sh distinct per doc.
    * Output: (id1, id2, jaccard) for all pairs with J >= p/q, ordered.
    *
    * MULTIPLICITY GROUPING (r10, the dbscan r9 fix applied to text —
    * VERDICT r9 directive #3): exact-duplicate documents have IDENTICAL
    * shingle sets, so they share every df rank, prefix, candidate key
    * and verify outcome — enumerating them through the PPJoin multiplies
    * every within-group candidate by m² for groups of size m (the r9
    * skew leg measured 11.8×/8.7×/5.9× wall at 10× group growth on the
    * family). The join now runs over one REPRESENTATIVE per distinct
    * shingle set ([[shingleGroups]]); the output is reconstructed
    * exactly: cross-group pairs fan out by membership (same jaccard —
    * the kernel value depends only on the two sets), within-group pairs
    * are the C(m,2) clique at jaccard = 1.0 (identical sets; the kernel
    * returns exactly 1.0 on them, so the constant is bit-identical).
    */
  private[graft] def jaccardDupPairs(
      shingleSets: DataFrame, p: Int, q: Int, dfCap: Int = 64): DataFrame =
    jaccardDupPairsUnsorted(shingleSets, p, q, dfCap).orderBy("id1", "id2")

  /** [[jaccardDupPairs]] without the terminal global sort — for consumers
    * that aggregate or join the pair set (recall/tuning truth sets, drop
    * lists), where sorting the expanded pairs is a wasted exchange+sort
    * (r10). Same rows, unspecified order.
    */
  private[graft] def jaccardDupPairsUnsorted(
      shingleSets: DataFrame, p: Int, q: Int, dfCap: Int = 64): DataFrame = {
    val grouped = shingleGroups(shingleSets)
    val repPairs = jaccardRepPairs(
      grouped.select(col("rep_id").as("doc_id"), col("sh")), p, q, dfCap)
    val members = groupMembers(grouped)
    val cross = repPairs
      .join(members.as("ma"), col("id1") === col("ma.rep_id"))
      .join(members.as("mb"), col("id2") === col("mb.rep_id"))
      .select(
        least(col("ma.doc_id"), col("mb.doc_id")).as("id1"),
        greatest(col("ma.doc_id"), col("mb.doc_id")).as("id2"),
        col("jaccard"))
    val within = members.as("a")
      .join(members.as("b"),
        col("a.rep_id") === col("b.rep_id") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        lit(1.0).as("jaccard"))
    cross.unionAll(within)
  }

  /** One row per DISTINCT shingle set: (sh sorted, rep_id = min member
    * doc_id, ids = every member). The group identity is the full sorted
    * array — value equality, no hash-collision risk. Persisted: read by
    * the rep-side pair join and the member fan-out.
    */
  private[graft] def shingleGroups(shingleSets: DataFrame): DataFrame =
    shingleSets
      .select(col("doc_id"), sort_array(col("sh")).as("sh"))
      .groupBy(col("sh"))
      .agg(min(col("doc_id")).as("rep_id"),
        collect_list(col("doc_id")).as("ids"))
      .persist()

  /** (rep_id, doc_id) membership rows of a [[shingleGroups]] frame. */
  private[graft] def groupMembers(grouped: DataFrame): DataFrame =
    grouped.select(col("rep_id"), explode(col("ids")).as("doc_id"))

  /** Symmetric (src, dst) edge set whose connected components EQUAL the
    * full [[jaccardDupPairs]] pair graph's, built group-first: rep-pair
    * edges plus one member→rep STAR edge per non-representative member
    * (m−1 edges where the expanded clique has m(m−1)/2 — identical
    * connectivity: every member reaches its rep directly and the rep
    * carries the cross-group pairs). Node set is also identical: a
    * member of a group with m ≥ 2 is in ≥ 1 within-group pair, a
    * singleton appears iff its rep pairs across groups. This is what the
    * component consumers (dedup_components / cluster_sizes / canonical /
    * savings) iterate over — the graph stays linear in the corpus under
    * exact-dup group growth instead of quadratic.
    */
  private[graft] def jaccardDupEdges(
      shingleSets: DataFrame, p: Int, q: Int, dfCap: Int = 64): DataFrame = {
    val grouped = shingleGroups(shingleSets)
    val repPairs = jaccardRepPairs(
      grouped.select(col("rep_id").as("doc_id"), col("sh")), p, q, dfCap)
      .select(col("id1"), col("id2"))
    val star = groupMembers(grouped)
      .filter(col("doc_id") =!= col("rep_id"))
      .select(col("rep_id").as("id1"), col("doc_id").as("id2"))
    // r10 (optimization round): persist before the symmetrizing union —
    // its two branches project differently, so exchange reuse cannot
    // dedupe them and the FULL PPJoin upstream would otherwise execute
    // twice (measured as ~2x the edge-build cost in every component
    // consumer: dedup_components / cluster_sizes / canonical / savings)
    val e = repPairs.unionAll(star).persist()
    e.select(col("id1").as("src"), col("id2").as("dst"))
      .unionAll(e.select(col("id2").as("src"), col("id1").as("dst")))
  }

  /** The PPJoin itself, over a frame of UNIQUE shingle sets (one doc per
    * distinct set — [[jaccardDupPairs]] wraps this with the multiplicity
    * grouping and exact fan-out).
    */
  private def jaccardRepPairs(
      shingleSets: DataFrame, p: Int, q: Int, dfCap: Int): DataFrame = {
    val t = p.toDouble / q.toDouble
    val sh = shingleSets
      .select(col("doc_id"), explode(col("sh")).as("sr"))
      .select(col("doc_id"), xxhash64(col("sr")).as("s"))
    val dfTbl = sh.groupBy("s").agg(count(lit(1)).as("df"))
    // one row per doc: shingle hashes ordered by (df asc, hash asc) for
    // prefix extraction, plus the plain hash-sorted set for the merge
    // verify. Persisted: read by the prefix index and both verify sides.
    // r11: ss is a PROJECTION of ord (re-sort of the extracted hashes) —
    // one sort_array(collect_list) per doc instead of two identical
    // collects in the aggregate; same longs, bit-identical output
    val docs = sh.join(dfTbl, "s")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("s")))).as("ord"))
      .withColumn("ss", sort_array(transform(col("ord"), e => e("s"))))
      .withColumn("n", size(col("ss")))
      .withColumn("plen",
        (col("n") - expr(s"(n * $p + ${q - 1}) div $q") + lit(1)).cast("int"))
      .persist()
    val prefix = docs
      .select(col("doc_id"), col("n"),
        posexplode(slice(col("ord"), lit(1), col("plen"))).as(Seq("pos", "e")))
      .select(col("doc_id"), col("n"), col("pos"),
        col("e.df").as("df"), col("e.s").as("s"))
    def candJoin(px: DataFrame): DataFrame =
      px.as("a").join(px.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id") &&
          least(col("a.n"), col("b.n")) * q >=
            greatest(col("a.n"), col("b.n")) * p)
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
          (least(col("a.pos"), col("b.pos")) + lit(1) +
            least(col("a.n") - col("a.pos") - 1,
              col("b.n") - col("b.pos") - 1)).as("ub"),
          (col("a.n") + col("b.n")).as("nsum"))
    val cold = candJoin(prefix.filter(col("df") <= dfCap))
    val hot = candJoin(prefix.filter(col("df") > dfCap))
    val cand = cold.unionAll(hot)
      .groupBy("id1", "id2")
      .agg(min(col("ub")).as("ub"), first(col("nsum")).as("nsum"))
      .filter(col("ub") >= expr(s"($p * nsum + ${p + q - 1}) div ${p + q}"))
      .select("id1", "id2")
    cand
      .join(docs.as("x"), col("id1") === col("x.doc_id"))
      .join(docs.as("y"), col("id2") === col("y.doc_id"))
      .select(col("id1"), col("id2"),
        graft.functions.functions
          .jaccard_sorted_longs(col("x.ss"), col("y.ss")).as("jaccard"))
      .filter(col("jaccard") >= t)
    // r10: no terminal orderBy here — every caller either re-sorts
    // (jaccardDupPairs ends with its own orderBy) or is order-free
    // (jaccardDupEdges feeds components); the global sort exchange was
    // pure waste inside 8+ queries
  }

  /** Asymmetric CONTAINMENT near-dup pairs: C(A→B) = |S(A)∩S(B)| / |S(A)|
    * >= p/q — the superset/subset case symmetric Jaccard structurally
    * misses (a paragraph quoted inside a much larger document has high
    * containment but low Jaccard). Prefix-filter adapted to containment:
    * only the PROBE side (the potentially-contained A) gets a prefix —
    * its |A| − ceil(t·|A|) + 1 df-rarest shingles (missing all of them
    * caps the overlap below t·|A|) — while the container side B is the
    * full linear shingle inventory (containment puts no lower bound on
    * |B|'s overlap fraction, so B cannot be prefix-pruned). Candidates
    * also require |B| ≥ t·|A| (the intersection can't exceed |B|).
    * Verify = one codegen'd sorted-merge intersection; the accept test is
    * the cross-multiplied integer compare (no float boundary). Same
    * df-cap hot-key isolation as [[jaccardDupPairs]].
    *
    * Input: (doc_id, sh) as jaccardDupPairs. Output: (contained_id,
    * container_id, containment) for all ordered pairs with C >= p/q.
    *
    * Multiplicity-grouped like [[jaccardDupPairs]]: the probe/index join
    * runs over unique shingle sets; expansion is exact — a rep-level
    * ordered pair (r1 ⊂ r2, c) fans to every (a ∈ G1, b ∈ G2) at the
    * same c (containment depends only on the sets), and within a group
    * every ORDERED pair (a, b), a ≠ b, holds at containment 1.0 exactly
    * (identical sets contain each other; the kernel's |A∩A|/|A| = 1.0).
    */
  private[graft] def containmentDupPairs(
      shingleSets: DataFrame, p: Int, q: Int, dfCap: Int = 64): DataFrame = {
    val grouped = shingleGroups(shingleSets)
    val repPairs = containmentRepPairs(
      grouped.select(col("rep_id").as("doc_id"), col("sh")), p, q, dfCap)
    val members = groupMembers(grouped)
    val cross = repPairs
      .join(members.as("ma"), col("contained_id") === col("ma.rep_id"))
      .join(members.as("mb"), col("container_id") === col("mb.rep_id"))
      .select(col("ma.doc_id").as("contained_id"),
        col("mb.doc_id").as("container_id"), col("containment"))
    val within = members.as("a")
      .join(members.as("b"),
        col("a.rep_id") === col("b.rep_id") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("contained_id"),
        col("b.doc_id").as("container_id"), lit(1.0).as("containment"))
    cross.unionAll(within).orderBy("contained_id", "container_id")
  }

  /** The containment prefix join itself, over UNIQUE shingle sets (see
    * [[containmentDupPairs]] for the grouping wrapper).
    */
  private def containmentRepPairs(
      shingleSets: DataFrame, p: Int, q: Int, dfCap: Int): DataFrame = {
    val sh = shingleSets
      .select(col("doc_id"), explode(col("sh")).as("sr"))
      .select(col("doc_id"), xxhash64(col("sr")).as("s"))
    val dfTbl = sh.groupBy("s").agg(count(lit(1)).as("df"))
    val docs = sh.join(dfTbl, "s")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("s")))).as("ord"))
      // ss derived from ord, not a second collect — see jaccardRepPairs
      .withColumn("ss", sort_array(transform(col("ord"), e => e("s"))))
      .withColumn("n", size(col("ss")))
      .withColumn("plen",
        (col("n") - expr(s"(n * $p + ${q - 1}) div $q") + lit(1)).cast("int"))
      .persist() // read by the prefix, the index, and both verify sides
    val prefix = docs
      .select(col("doc_id").as("a_id"), col("n").as("na"),
        explode(slice(col("ord"), lit(1), col("plen"))).as("e"))
      .select(col("a_id"), col("na"), col("e.df").as("df"),
        col("e.s").as("s"))
    val index = docs
      .select(col("doc_id").as("b_id"), col("n").as("nb"),
        explode(col("ss")).as("s"))
    def candJoin(px: DataFrame): DataFrame =
      px.join(index,
        px("s") === index("s") && col("a_id") =!= col("b_id") &&
          col("nb") * q >= col("na") * p)
        .select("a_id", "b_id")
    val cand = candJoin(prefix.filter(col("df") <= dfCap))
      .unionAll(candJoin(prefix.filter(col("df") > dfCap)))
      .distinct()
    cand
      .join(docs.as("x"), col("a_id") === col("x.doc_id"))
      .join(docs.as("y"), col("b_id") === col("y.doc_id"))
      .select(col("a_id").as("contained_id"),
        col("b_id").as("container_id"),
        graft.functions.functions
          .intersect_sorted_longs(col("x.ss"), col("y.ss")).as("inter"),
        col("x.n").as("na"))
      .filter(col("inter") * q >= col("na") * p)
      .select(col("contained_id"), col("container_id"),
        (col("inter").cast("double") / col("na").cast("double"))
          .as("containment"))
    // r10: terminal orderBy dropped — containmentDupPairs re-sorts after
    // the membership fan-out (see jaccardRepPairs)
  }

  /** Connected components of an undirected edge set `(src, dst)` (both
    * directions present) via min-label propagation WITH pointer jumping:
    * each step every node takes the minimum of its own label and its
    * neighbors' (one join + aggregate), then shortcuts `lab <- lab(lab)`
    * (one more join). The shortcut roughly doubles the distance a minimum
    * travels per step, so steps = O(log diameter) instead of O(diameter) —
    * a diameter-64 path converges in ~8 steps, and a 100 TB pair graph
    * with an adversarial million-node chain stays in tens of jobs
    * (DedupSpec pins the bound on a planted 65-node path).
    *
    * Convergence is detected through the label-sum invariant: labels never
    * increase (neighbor-min takes a `least`; the jump applies lab(lab) <=
    * lab, which follows inductively from lab <= id), so sum(lab) is
    * strictly decreasing while anything changes and the loop terminates
    * mathematically with no iteration cap that could silently return a
    * split component. The sum is taken as DECIMAL(38,0) — a 64-bit sum
    * could wrap on billions of large ids and falsely converge. TWO
    * propagation steps run per driver-side convergence check, halving
    * job-launch overhead (the check itself is one scalar per batch).
    *
    * Each step cuts lineage on its frames ([[Checkpoints]]:
    * `localCheckpoint` by default, reliable `checkpoint` under
    * `spark.graft.checkpointDir`) — REQUIRED, not an
    * optimization: the step-k logical plan references step k-1 multiple
    * times (own label, neighbor min, jump target), so without lineage
    * truncation the plan tree grows geometrically (OOMs near diameter 20).
    * Mid-loop `unpersist` of persisted frames is equally wrong in the
    * other direction: it invalidates dependent cache entries and silently
    * recomputes the whole chain each action (measured 3-5x slower).
    * Checkpoint blocks are O(nodes) per step and are reclaimed by the
    * context cleaner once the frames are unreferenced; a 100 TB run with
    * huge label tables would use reliable `checkpoint` with an explicit
    * cleanup policy instead.
    *
    * Returns (id, lab = component minimum), one row per node.
    */
  /** Keep-best canonical per component: (rep_id, n_members,
    * canonical_chars, canonical_id) with the quality rule
    * (n_chars DESC, doc_id ASC) expressed as one max(struct) — a
    * partial+final aggregate, never a per-cluster sort. Separated so
    * specs can plant memberships with hand-checkable winners.
    */
  private[graft] def canonicalFrom(comp: DataFrame, docs: DataFrame)
      : DataFrame =
    comp.join(docs, Seq("doc_id"))
      .groupBy("rep_id")
      .agg(count(lit(1)).as("n_members"),
        max(struct(col("n_chars"), (-col("doc_id")).as("neg_id"))).as("m"))
      .select(col("rep_id"), col("n_members"),
        col("m.n_chars").as("canonical_chars"),
        (-col("m.neg_id")).as("canonical_id"))
      .orderBy("rep_id")

  private[graft] def minLabelComponents(edges: DataFrame): DataFrame =
    minLabelComponentsCounted(edges)._1

  /** [[minLabelComponents]] plus the number of propagation steps executed
    * (spec surface for the O(log diameter) convergence bound). */
  private[graft] def minLabelComponentsCounted(
      edges: DataFrame): (DataFrame, Int) = {
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("lab", col("id")).cutLineage()
    var prevSum: Option[java.math.BigDecimal] = None
    var steps = 0
    var converged = false
    while (!converged) {
      val nbrMin = edges.join(labels, col("dst") === col("id"))
        .groupBy(col("src")).agg(min(col("lab")).as("nlab"))
      // r11 (driver-loop floor cut, VERDICT r10 #5): prop is PERSISTED,
      // not checkpointed — the jump's single materialization job below
      // computes it once and caches it (the r10 2x-slower measurement was
      // the UNCACHED double-execute; identical-subtree ReusedExchange is
      // unreliable across AQE stage planning). One lineage-cut job per
      // step instead of two; the cache is dropped as soon as labels is
      // materialized, so no storage accumulates across rounds.
      val prop = labels
        .join(nbrMin, col("id") === col("src"), "left")
        .select(col("id"),
          least(col("lab"), coalesce(col("nlab"), col("lab"))).as("lab"))
        .cutLineage()
      // pointer jump: lab <- lab(lab). Every lab IS a node id (a min over
      // ids), so the inner self-join keeps every row. The convergence sum
      // rides the SAME materialization job via observe() — the per-check
      // collect job of the r10 loop is gone, and the check now runs every
      // step (earlier stop, never a wasted extra step-pair).
      val obs = org.apache.spark.sql.Observation()
      labels = prop
        .join(prop.select(col("id").as("jid"), col("lab").as("jlab")),
          col("lab") === col("jid"))
        .select(col("id"), col("jlab").as("lab"))
        .observe(obs, sum(col("lab").cast("decimal(38,0)")).as("s"))
        .cutLineage()
      steps += 1
      // sum over an EMPTY graph is null — normalize to 0 so a pair-free
      // corpus converges to an empty result instead of throwing
      val s = obs.get.get("s").filter(_ != null).map {
        case d: java.math.BigDecimal => d
        case d: scala.math.BigDecimal => d.bigDecimal
        case d => new java.math.BigDecimal(d.toString)
      }.getOrElse(java.math.BigDecimal.ZERO)
      converged = prevSum.exists(_.compareTo(s) == 0)
      prevSum = Some(s)
    }
    (labels, steps)
  }

  def queries: Map[String, Q] = Map(
    // Exact dedup: group by content digest, keep the minimum doc_id.
    "dedup_exact" -> { (s, d) =>
      Tables(s, d).documents
        .groupBy(md5(col("text")).as("content_hash"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select("keep_id", "n_copies")
        .orderBy("keep_id")
    },
    // n-gram Jaccard near-dup, EXACT at threshold t=0.8 = 4/5, via
    // df-ordered PPJoin prefix filtering — see [[jaccardDupPairs]].
    "dedup_ngram_jaccard" -> { (s, d) =>
      jaccardDupPairs(shingleSets(Tables(s, d).documents), 4, 5)
    },
    // Asymmetric containment at t = 0.7 — catches a document quoted
    // inside a larger one, which symmetric Jaccard structurally cannot
    // (J caps at |A|/|B|). See [[containmentDupPairs]].
    "dedup_containment" -> { (s, d) =>
      containmentDupPairs(shingleSets(Tables(s, d).documents), 7, 10)
    },
    // MinHash + LSH banding (4 bands x 4 rows), candidates verified exactly.
    // The xxh64-seeded signatures are replicated in the DuckDB oracle via
    // XxhSql (oracle-checked end to end); DedupSpec additionally asserts
    // the pair set equals the exact-Jaccard pairs at this threshold.
    "dedup_minhash_lsh" -> { (s, d) =>
      // persist: the signature table is read by both sides of the band
      // self-join and the shingle sets by the verification join — without
      // materialization every element_at(sig, _) re-runs the MinHash pass
      // (no CSE across the generator boundary). At 100 TB this is the
      // "write the signature table once" pattern.
      //
      // Multiplicity-grouped (r10): signatures, bands and verification
      // run over one representative per DISTINCT shingle set — identical
      // sets hash to identical signatures, so enumerating exact dups
      // through the band self-join multiplied every within-group
      // candidate by m². Exact fan-out as [[jaccardDupPairs]]: cross
      // pairs inherit the rep pair's jaccard (set-function), within-group
      // pairs are the clique at exactly 1.0 (always LSH candidates —
      // equal sets share every band — and always ≥ 0.8).
      val grouped = shingleGroups(shingleSets(Tables(s, d).documents))
      val reps = grouped.select(col("rep_id").as("doc_id"), col("sh"))
        .persist()
      val sig = reps.select(col("doc_id"),
        minhash_sig(col("sh"), 16).as("sig")).persist()
      val bands = sig.select(col("doc_id"),
        posexplode(array((0 until 4).map { b =>
          struct((0 until 4).map(r =>
            element_at(col("sig"), b * 4 + r + 1)): _*)
        }: _*)).as(Seq("band", "bsig")))
      val cand = bands.as("x")
        .join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.bsig") === col("y.bsig") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
        .distinct()
      val repPairs = cand
        .join(reps.as("s1"), col("id1") === col("s1.doc_id"))
        .join(reps.as("s2"), col("id2") === col("s2.doc_id"))
        .select(col("id1"), col("id2"),
          jaccard_sim(col("s1.sh"), col("s2.sh")).as("jaccard"))
        .filter(col("jaccard") >= 0.8)
      val members = groupMembers(grouped)
      val cross = repPairs
        .join(members.as("ma"), col("id1") === col("ma.rep_id"))
        .join(members.as("mb"), col("id2") === col("mb.rep_id"))
        .select(least(col("ma.doc_id"), col("mb.doc_id")).as("id1"),
          greatest(col("ma.doc_id"), col("mb.doc_id")).as("id2"),
          col("jaccard"))
      val within = members.as("a")
        .join(members.as("b"),
          col("a.rep_id") === col("b.rep_id") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
          lit(1.0).as("jaccard"))
      cross.unionAll(within).orderBy("id1", "id2")
    },
    // NEAR-DUP decontamination: the MinHash/LSH completion of the exact
    // 8-gram `data_decontaminate` family — a paraphrased or lightly-edited
    // benchmark document shares few exact 8-grams but keeps a high shingle
    // Jaccard, so leakage checking needs the near-dup path too (the
    // standard eval-contamination practice for LLM corpora). Per benchmark
    // doc (doc_id < 20 stands in for the eval set): LSH candidates from
    // the corpus, exact-Jaccard verification at t = 0.5, and a per-bench
    // readout (candidate count, contaminated count, worst overlap) that is
    // always |bench| rows — the audit artifact, not just the hit list.
    // Scale: the corpus side is a map (signatures) + an equi-join against
    // the BROADCAST bench bands + verification joins keyed by candidate
    // doc ids only — the corpus is never shuffled for candidate
    // generation, same contract as `data_decontaminate`. Banding recall at
    // the 0.5 borderline is probabilistic-by-construction but
    // deterministic given the xxh64 signatures, and the oracle replicates
    // the bucketing, so the gate checks the SHIPPED search path.
    "data_decontaminate_neardup" -> { (s, d) =>
      val docs = Tables(s, d).documents
      val sh = shingleSets(docs).persist()
      val sig = sh.select(col("doc_id"),
        minhash_sig(col("sh"), 16).as("sig"))
      val bands = sig.select(col("doc_id"),
        posexplode(array((0 until 4).map { b =>
          struct((0 until 4).map(r =>
            element_at(col("sig"), b * 4 + r + 1)): _*)
        }: _*)).as(Seq("band", "bsig")))
      val benchBands = bands.filter(col("doc_id") < 20)
        .select(col("doc_id").as("bench_id"), col("band"), col("bsig"))
      val cand = bands.filter(col("doc_id") >= 20)
        .join(broadcast(benchBands), Seq("band", "bsig"))
        .select(col("bench_id"), col("doc_id").as("corp_id"))
        .distinct()
      val verified = cand
        .join(sh.as("s1"), col("bench_id") === col("s1.doc_id"))
        .join(sh.as("s2"), col("corp_id") === col("s2.doc_id"))
        .select(col("bench_id"), col("corp_id"),
          jaccard_sim(col("s1.sh"), col("s2.sh")).as("jac"))
      docs.filter(col("doc_id") < 20)
        .select(col("doc_id").as("bench_id"))
        .join(verified, Seq("bench_id"), "left")
        .groupBy("bench_id")
        .agg(count(col("corp_id")).as("n_candidates"),
          count(when(col("jac") >= 0.5, 1)).as("n_contaminated"),
          coalesce(max(when(col("jac") >= 0.5, col("jac"))), lit(0.0))
            .as("max_jaccard"))
        .orderBy("bench_id")
    },
    // SimHash near-dup: signatures in one codegen'd pass, Hamming <= 3 via
    // 16-bit chunk banding + exact Hamming verification. A pair agreeing
    // on several chunks is emitted only from its FIRST shared chunk, so no
    // candidate-distinct shuffle — and since the shared chunks are exactly
    // the zero 16-bit chunks of sig_x XOR sig_y, the emit test is plain
    // bit arithmetic on the two sigs (no extra array rides the shuffle).
    "dedup_simhash" -> { (s, d) =>
      simhashPairs(Tables(s, d).documents).orderBy("id1", "id2")
    },
    // Method-agreement audit over the three shipped near-dup detectors —
    // the calibration table a curation owner reads before picking ONE:
    // exact (md5 identity), shingle-Jaccard ≥ 0.8 (LSH-verified), and
    // SimHash Hamming ≤ 3 pair sets, with every pairwise overlap. The
    // containments are provable (an exact clone has Jaccard 1 and
    // Hamming 0 — spec-pinned); the interesting numbers are the two
    // exclusive regions: Jaccard-only pairs are reordered/partial
    // overlaps SimHash's global fingerprint smears out, SimHash-only
    // pairs are sub-0.8 lookalikes with aligned token mixes. One row of
    // scalar combines over three already-bucketed pair frames
    // (whitelisted 1-row pattern, as dedup_lsh_recall).
    "dedup_method_overlap" -> { (s, d) =>
      val docs = Tables(s, d).documents
      val jp = jaccardDupPairsUnsorted(shingleSets(docs), 4, 5)
        .select("id1", "id2").persist()
      val sp = simhashPairs(docs).select("id1", "id2").persist()
      val dig = docs.select(col("doc_id"), md5(col("text")).as("dg"))
      val ep = dig.as("a")
        .join(dig.as("b"),
          col("a.dg") === col("b.dg") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
        .persist()
      val jAndS = jp.join(sp, Seq("id1", "id2"), "left_semi")
      val eAndJ = ep.join(jp, Seq("id1", "id2"), "left_semi")
      val eAndS = ep.join(sp, Seq("id1", "id2"), "left_semi")
      ep.agg(count(lit(1)).as("n_exact"))
        .crossJoin(broadcast(jp.agg(count(lit(1)).as("n_jaccard"))))
        .crossJoin(broadcast(sp.agg(count(lit(1)).as("n_simhash"))))
        .crossJoin(broadcast(jAndS.agg(count(lit(1)).as("n_jac_and_sim"))))
        .crossJoin(broadcast(eAndJ.agg(count(lit(1)).as("n_exact_in_jac"))))
        .crossJoin(broadcast(eAndS.agg(count(lit(1)).as("n_exact_in_sim"))))
        .select(col("n_exact"), col("n_jaccard"), col("n_simhash"),
          col("n_jac_and_sim"), col("n_exact_in_jac"),
          col("n_exact_in_sim"),
          (col("n_jaccard") - col("n_jac_and_sim")).as("n_jaccard_only"),
          (col("n_simhash") - col("n_jac_and_sim")).as("n_simhash_only"))
    },
    // End-to-end corpus cleaning — the composed training-data pipeline:
    // quality gate (length + stopword ratio) THEN near-dup removal (drop
    // the higher doc_id of every exact-Jaccard>=0.8 pair). The text is
    // tokenized ONCE into a persisted base (doc stats + shingle sets);
    // both the quality gate and the pair join read that base — previously
    // each branch re-split the text.
    "pipeline_clean_corpus" -> { (s, d) =>
      val toks = split(col("text"), " ")
      val nTok = size(toks)
      val base = Tables(s, d).documents
        .select(col("doc_id"), nTok.as("n_tokens"),
          (size(filter(toks,
            x => x.isin("the", "a", "of", "and", "to", "in"))).cast("double") /
            nTok.cast("double")).as("stop_ratio"),
          array_distinct(
            graft.functions.functions.word_shingles(toks, 3)).as("sh"))
        .persist()
      val dupPairs = jaccardDupPairsUnsorted(
          base.select(col("doc_id"), col("sh")), 4, 5)
        .select(col("id2").as("drop_id")).distinct()
      base
        .filter(col("n_tokens") >= 50 && col("stop_ratio") <= 0.35)
        .join(dupPairs, col("doc_id") === col("drop_id"), "left_anti")
        .select("doc_id", "n_tokens")
        .orderBy("doc_id")
    },
    // Transitive dedup: connected components over the near-dup pair graph
    // via [[minLabelComponents]] — A~B and B~C must dedup {A,B,C} to ONE
    // representative even though A and C never paired. Output:
    // (doc_id, rep_id = component minimum) for every doc in >= 1 pair.
    "dedup_components" -> { (s, d) =>
      // group-first star edges ([[jaccardDupEdges]]): identical
      // components, but exact-dup groups contribute m-1 edges, not the
      // m(m-1)/2 clique — the graph stays corpus-linear under group
      // growth. The dup graph is orders of magnitude smaller than the
      // corpus — partition it to ITS size (500k edges/partition over the
      // symmetrized set), not the corpus's: a few hundred edges iterate
      // in single-task rounds while a billion-edge graph at 100 TB still
      // spreads over thousands of partitions
      val e = jaccardDupEdges(shingleSets(Tables(s, d).documents), 4, 5)
        .persist()
      val nParts = math.max(1L, e.count() / 500000L).toInt
      val edges = e.repartition(nParts).persist()
      minLabelComponents(edges)
        .select(col("id").as("doc_id"), col("lab").as("rep_id"))
        .orderBy("doc_id")
    },
    // Cluster-size histogram of the near-dup components — the dedup
    // REPORT a curation run actually reads ("how much mass sits in
    // clusters of size k, how much would dedup reclaim"). Rides the same
    // component build; the membership frame collapses twice (per-label
    // size, then per-size cluster count) — both metadata-scale
    // aggregates. reclaimable = Σ (size−1) per bucket: the rows a
    // keep-one policy would drop.
    "dedup_cluster_sizes" -> { (s, d) =>
      val e = jaccardDupEdges(shingleSets(Tables(s, d).documents), 4, 5)
        .persist()
      val nParts = math.max(1L, e.count() / 500000L).toInt
      val edges = e.repartition(nParts).persist()
      minLabelComponents(edges)
        .groupBy(col("lab")).agg(count(lit(1)).as("sz"))
        .groupBy(col("sz").as("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"),
          sum(col("sz") - 1).as("n_reclaimable"))
        .orderBy("cluster_size")
    },
    // Canonical-representative selection: the pipeline step AFTER
    // transitive dedup — for each near-dup cluster keep the best
    // member (longest text, ties to the smallest doc_id), not merely
    // the smallest id. Drop-lists answer "which rows go"; this answers
    // "which row stays", which is what a curation pipeline actually
    // writes out. The argmax is one max(struct) — collapses map-side,
    // so the only shuffle beyond the component build is one pass over
    // the (graph-sized, not corpus-sized) membership frame.
    "dedup_canonical" -> { (s, d) =>
      val docs = Tables(s, d).documents
      val e = jaccardDupEdges(shingleSets(docs), 4, 5).persist()
      val nParts = math.max(1L, e.count() / 500000L).toInt
      val edges = e.repartition(nParts).persist()
      val comp = minLabelComponents(edges)
        .select(col("id").as("doc_id"), col("lab").as("rep_id"))
      canonicalFrom(comp, docs.select(col("doc_id"), col("n_chars")))
    },
    // Embedding-cosine near-dup, the NAMED scale path: OR-amplified LSH
    // bucketing (L=16 tables x 4 hyperplane sign bits) generates candidates
    // via an equi-join on (table, bucket); the exact quantized-cosine
    // kernel verifies only candidates. The DuckDB oracle replicates the
    // bucketing ALGORITHM (integer hyperplanes are plain SQL), so the
    // hash compare is exact regardless of recall.
    //
    // Measured honesty (DedupSpec): at this corpus's borderline threshold
    // (0.45 — true pairs sit at cos 0.45..0.51, barely above the random
    // background) hyperplane LSH trades ~7% recall for ~2x candidate
    // pruning; at realistic near-dup thresholds (>= 0.9, where planted
    // duplicates live) the same machinery is recall-complete with far
    // fewer tables. The exact all-pairs baseline remains available as
    // [[dedup_embedding_bruteforce]].
    "dedup_embedding" -> { (s, d) =>
      val L = 16
      val b = 4
      val emb = quantizedEmbeddings(Tables(s, d).embeddings)
        .withColumn("bkts", SimilarityOps.lshBuckets(col("q"), L, b))
        .persist()
      // candidate rows stay NARROW (id + the 16-long signature vector);
      // the "emit from the FIRST table where both collide" kernel makes
      // each pair appear exactly once, so no candidate-distinct shuffle —
      // a pair colliding in k tables costs k cheap long-compares, not a
      // k-row shuffle + dedup
      val keys = emb.select(col("vec_id"), col("bkts"),
        posexplode(col("bkts")).as(Seq("tb", "bkt")))
      val cand = keys.as("a")
        .join(keys.as("b"),
          col("a.tb") === col("b.tb") && col("a.bkt") === col("b.bkt") &&
            col("a.vec_id") < col("b.vec_id") &&
            graft.functions.functions
              .first_match(col("a.bkts"), col("b.bkts")) === col("a.tb"))
        .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"))
      verifyCosine(cand, emb, 0.45)
    },
    // DBSCAN core-point detection over the embedding space — the density
    // primitive under density-based clustering and outlier removal (a
    // point is CORE when >= minPts neighbors sit within the eps ball;
    // everything else is border/noise). Neighborhood search reuses the
    //16x4 OR-amplified LSH bucketing + exactly-once pair emission +
    // exact-cosine verification from dedup_embedding verbatim — the
    // candidate-restricted neighbor count is the documented approximate-
    // DBSCAN contract at scale (missed-by-LSH neighbors undercount
    // exactly like dedup_embedding's recall note), and the oracle
    // replicates the bucketing so the gate checks the DECLARED
    // semantics. Each surviving pair fans out to both endpoints
    // (explode of a 2-array — map-side), then one id-keyed count.
    // eps sits BELOW dedup_embedding's 0.45 near-dup bar: density asks
    // "does this point have company", not "is it a duplicate" — 0.35
    // yields a selective-but-populated core set on the i.i.d. corpus
    "sim_dbscan_core" -> { (s, d) =>
      dbscanCoreFrom(Tables(s, d).embeddings, t = 0.35, minPts = 2)
    },
    // Exact all-pairs baseline (block-partitioned triangular join): the
    // correctness oracle for the bucketed path, and the honest exact
    // option when the threshold sits below LSH's separation power.
    "dedup_embedding_bruteforce" -> { (s, d) =>
      val emb = quantizedEmbeddings(Tables(s, d).embeddings).persist()
      val cand = emb.select(col("vec_id").as("id1")).as("a")
        .join(emb.select(col("vec_id").as("id2")).as("b"),
          col("id1") < col("id2"))
      verifyCosine(cand, emb, 0.45)
    },
    // MinHash estimator-quality report — the calibration readout that
    // justifies trusting signature agreement at 100 TB (where exact
    // verification of every candidate is the budget item): for each LSH
    // candidate pair, compare the 16-component signature agreement
    // fraction (the estimator) against the exact shingle Jaccard (the
    // truth it estimates, E[agreement] = J), bucketed by true-similarity
    // decile. SUM-OF-DOUBLES is deliberately absent: the per-pair error
    // lives exactly on a 1/(16·10⁶) grid (est_micro = m16·62500; exact
    // rounds once to jmicro through an identical double on both
    // engines), so every per-band statistic is an exact-integer sum with
    // ONE final IEEE division — a double mean would associate
    // differently across engines. Same candidate generation as
    // dedup_minhash_lsh (banded equi-join); the report adds one
    // signature equi-join and a band-sized rollup.
    "dedup_minhash_quality" -> { (s, d) =>
      minhashQualityFrom(Tables(s, d).documents)
    },
    // Dedup savings BY SOURCE — the ROI report that decides where dedup
    // effort goes (crawl snapshots duplicate heavily, curated sources
    // barely): per source, how many documents a keep-canonical policy
    // drops and what fraction of the source's characters that reclaims.
    // Rides the same component build as dedup_components; the canonical
    // rule is dedup_canonical's (longest, ties to smallest id), so the
    // three reports describe ONE consistent policy. Shape: the pair
    // graph + components are graph-sized; the drop set joins back to
    // the corpus on doc_id (equi) and collapses per source.
    "dedup_savings_by_source" -> { (s, d) =>
      val docs = Tables(s, d).documents
      val e = jaccardDupEdges(shingleSets(docs), 4, 5).persist()
      val nParts = math.max(1L, e.count() / 500000L).toInt
      val edges = e.repartition(nParts).persist()
      val comp = minLabelComponents(edges)
        .select(col("id").as("doc_id"), col("lab").as("rep_id"))
      val keep = canonicalFrom(comp,
        docs.select(col("doc_id"), col("n_chars")))
        .select(col("rep_id"), col("canonical_id"))
      val dropped = comp.join(broadcast(keep), Seq("rep_id"))
        .filter(col("doc_id") =!= col("canonical_id"))
        .select("doc_id")
      val dropStats = dropped.join(docs, Seq("doc_id"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_dropped"),
          sum(col("n_chars")).as("chars_dropped"))
      docs.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("tot_chars"))
        .join(dropStats, Seq("source"), "left")
        .select(col("source"), col("n_docs"),
          coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
          coalesce(col("chars_dropped"), lit(0L)).as("chars_dropped"),
          (coalesce(col("chars_dropped"), lit(0L)).cast("double") /
            col("tot_chars").cast("double")).as("savings_frac"))
        .orderBy("source")
    },
    // LSH candidate recall — the banding-tuning readout
    // dedup_minhash_quality (signature calibration) doesn't answer: of
    // the TRUE near-dup pairs (exact Jaccard ≥ 0.8, the complete PPJoin
    // ground truth — exact, not sampled, because the prefix filter makes
    // completeness affordable), what fraction does the 4×4 banding
    // surface as candidates (recall — pairs the LSH pipeline can never
    // recover once missed), and what fraction of candidates survives the
    // exact verify (the verify-stage efficiency — the cost knob: low
    // efficiency means the bands are too loose and the verify pays for
    // it). One row, five numbers; the two ratios are single IEEE
    // divisions of exact counts. Scale: both pair sets are the already-
    // bucketed operators' shapes; the rollup is three scalar aggregates.
    "dedup_lsh_recall" -> { (s, d) =>
      val sh = shingleSets(Tables(s, d).documents).persist()
      val truth = jaccardDupPairsUnsorted(sh, 4, 5).select("id1", "id2")
        .persist()
      val cand = minhashCandidates(sh).persist()
      val hits = truth.join(cand, Seq("id1", "id2"), "left_semi")
      truth.agg(count(lit(1)).as("n_truth"))
        .crossJoin(broadcast(cand.agg(count(lit(1)).as("n_candidates"))))
        .crossJoin(broadcast(hits.agg(count(lit(1)).as("n_hit"))))
        .select(col("n_truth"), col("n_candidates"), col("n_hit"),
          (col("n_hit").cast("double") / col("n_truth").cast("double"))
            .as("recall"),
          (col("n_hit").cast("double") /
            col("n_candidates").cast("double")).as("verify_efficiency"))
    },
    // LSH band/row tuning curve — the (b, r) knob behind every MinHash
    // deployment: the SAME 16-hash signature table re-banded three ways
    // (2x8 precise, 4x4 balanced, 8x2 recall-heavy), each config's
    // candidate count, recall and precision measured against the exact
    // Jaccard >= 0.8 ground truth. The S-curve P(cand) = 1-(1-j^r)^b
    // says 8x2 floods candidates and 2x8 starves recall — this query is
    // the measured version of that tradeoff, the number a curation owner
    // reads before fixing the config. One signature pass (signatures are
    // the expensive part — re-banding is free), three banded equi-joins.
    "dedup_band_tuning" -> { (s, d) =>
      val sh = shingleSets(Tables(s, d).documents).persist()
      val sig = sh.select(col("doc_id"),
        minhash_sig(col("sh"), 16).as("sig")).persist()
      val truth = jaccardDupPairsUnsorted(sh, 4, 5).select("id1", "id2").persist()
      val tcount = truth.agg(count(lit(1)).as("n_truth"))
      def config(b: Int, r: Int): DataFrame = {
        val bands = sig.select(col("doc_id"),
          posexplode(array((0 until b).map { bi =>
            struct((0 until r).map(ri =>
              element_at(col("sig"), bi * r + ri + 1)): _*)
          }: _*)).as(Seq("band", "bsig")))
        val cand = bands.as("x")
          .join(bands.as("y"),
            col("x.band") === col("y.band") &&
              col("x.bsig") === col("y.bsig") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
          .distinct().persist()
        val hits = truth.join(cand, Seq("id1", "id2"), "left_semi")
        cand.agg(count(lit(1)).as("n_candidates"))
          .crossJoin(broadcast(hits.agg(count(lit(1)).as("n_hit"))))
          .crossJoin(broadcast(tcount))
          .select(lit(b).as("bands"), lit(r).as("rows_per_band"),
            col("n_candidates"), col("n_hit"), col("n_truth"),
            when(col("n_candidates") === 0L, lit(0.0))
              .otherwise(col("n_hit").cast("double") /
                col("n_candidates").cast("double")).as("precision"),
            when(col("n_truth") === 0L, lit(0.0))
              .otherwise(col("n_hit").cast("double") /
                col("n_truth").cast("double")).as("recall"))
      }
      config(2, 8).unionAll(config(4, 4)).unionAll(config(8, 2))
        .orderBy("bands")
    },
    // Exact duplicated-SUBSTRING accounting (the ExactSubstr dedup of
    // Lee et al., "Deduplicating Training Data Makes Language Models
    // Better"): document-level hashing misses the verbatim passage
    // pasted inside an otherwise-new page, and segment dedup only sees
    // aligned 3-word blocks — this operator finds EVERY 8-token window
    // duplicated anywhere in the corpus (keep-first: the lowest
    // (doc_id, pos) instance is the retained original), merges each
    // doc's duplicated windows into maximal spans (gaps-and-islands on
    // the token intervals: a window opens a new span only when it
    // starts past the running max end), and reports the per-doc
    // duplicated-token mass — the removal plan an ExactSubstr scrubber
    // executes. Scale shape: the instance stream is token-count-sized
    // and the groupBy(shingle) shuffle is the intrinsic cost (the
    // distributed stand-in for the paper's suffix array); only
    // duplicated instances (a tiny fraction) reach the per-doc window,
    // which is bounded by that doc's own window count. The paper uses
    // 50-token windows at trillion-token scale; 8 fits this corpus's
    // ~30-token documents — the plan is length-agnostic.
    "dedup_substring_spans" -> { (s, d) =>
      substringSpansFrom(Tables(s, d).documents, 8)
    },
    // Threshold tuning curve — the knob-setting readout for the MinHash
    // pipeline: from ONE candidate generation pass (the 4×4 banding),
    // how many pairs survive exact-Jaccard verification at t = 0.7 / 0.8
    // / 0.9? The curve's slope is what a curation owner reads to pick
    // the dedup aggressiveness (a cliff between 0.8 and 0.9 means the
    // corpus has a near-exact-clone mode; a flat curve means template
    // noise). Candidates are generated ONCE and each pair's Jaccard is
    // computed once — the three thresholds are conditional counts over
    // the same scored pair stream, not three pipeline runs.
    "dedup_threshold_curve" -> { (s, d) =>
      val sh = shingleSets(Tables(s, d).documents).persist()
      val scored = minhashCandidates(sh)
        .join(sh.as("s1"), col("id1") === col("s1.doc_id"))
        .join(sh.as("s2"), col("id2") === col("s2.doc_id"))
        .select(jaccard_sim(col("s1.sh"), col("s2.sh")).as("jac"))
      scored.agg(
        count(when(col("jac") >= 0.7, 1)).as("n7"),
        count(when(col("jac") >= 0.8, 1)).as("n8"),
        count(when(col("jac") >= 0.9, 1)).as("n9"),
        count(lit(1)).as("nc"))
        .selectExpr(
          "stack(3, CAST(0.7 AS DOUBLE), n7, CAST(0.8 AS DOUBLE), n8, " +
            "CAST(0.9 AS DOUBLE), n9) AS (threshold, n_pairs)",
          "nc AS n_candidates")
        .orderBy("threshold")
    },
    // Incremental near-dup ingest — the DAILY shape of the dedup family:
    // a new crawl batch (doc_id % 10 == 7 stands in for today's arrivals)
    // is screened against the EXISTING corpus without ever re-pairing the
    // corpus with itself. Stage 1: exact — the batch's md5 digests probe
    // the corpus digest table (broadcast of the BATCH side: the corpus,
    // the 100 TB side, is a map-only scan). Stage 2: near — the batch's
    // MinHash bands broadcast under the corpus band stream (same 16-sig /
    // 4x4 layout as dedup_minhash_lsh), candidates verified by exact
    // shingle Jaccard at 0.8. Verdict precedence exact > near > new, with
    // candidate count and best verified overlap per batch doc — the
    // admission ticket a curation pipeline attaches to every new
    // document. At steady state the corpus band/digest tables are
    // precomputed artifacts of previous ingests; only the batch-sized
    // side is ever built fresh.
    "dedup_incremental_ingest" -> { (s, d) =>
      incrementalIngestFrom(Tables(s, d).documents,
        pmod(col("doc_id"), lit(10)) === 7)
    }
  )

  /** The `dedup_substring_spans` core over any (doc_id, text) frame with
    * a parameterized window length — separated so specs can plant shared
    * passages with known span geometry.
    */
  def substringSpansFrom(docs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val inst = docs
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        posexplode(graft.functions.functions.word_shingles(
          split(col("text"), " "), k)).as(Seq("pos", "sh")))
    val dupSh = inst.groupBy("sh")
      .agg(count(lit(1)).as("cnt"),
        min(col("doc_id") * 1000000L + col("pos")).as("firstk"))
      .filter(col("cnt") > 1)
    val dup = inst.join(dupSh, "sh")
      .filter(col("doc_id") * 1000000L + col("pos") =!= col("firstk"))
      .select(col("doc_id"), col("n_tokens"), col("pos"))
    val wOrd = Window.partitionBy("doc_id").orderBy("pos")
    val spans = dup
      .withColumn("prevmax", max(col("pos") + k)
        .over(wOrd.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("ni",
        when(col("prevmax").isNull || col("pos") > col("prevmax"), 1L)
          .otherwise(0L))
      .withColumn("isl", sum(col("ni")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("n_tokens"), col("isl"))
      .agg(min(col("pos")).as("st"), max(col("pos") + k).as("en"))
    spans.groupBy("doc_id", "n_tokens")
      .agg(count(lit(1)).as("n_dup_spans"),
        sum(col("en") - col("st")).cast("long").as("dup_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("n_dup_spans"),
        col("dup_tokens"),
        (col("dup_tokens").cast("double") / col("n_tokens").cast("double"))
          .as("dup_frac"))
      .orderBy("doc_id")
  }

  /** The `dedup_incremental_ingest` core: screen the `isBatch` rows of a
    * (doc_id, text) frame against the rest — exact digest probe, then
    * LSH-banded near-dup candidates verified at Jaccard 0.8.
    */
  def incrementalIngestFrom(docs: DataFrame,
      isBatch: org.apache.spark.sql.Column): DataFrame = {
    val dig = docs.select(col("doc_id"), md5(col("text")).as("digest"),
      isBatch.as("is_batch"))
    val exactIds = dig.filter(!col("is_batch")).select(col("digest"))
      .join(broadcast(dig.filter(col("is_batch"))), Seq("digest"))
      .select(col("doc_id")).distinct()
      .withColumn("is_exact", lit(1L))
    val sh = shingleSets(docs).persist()
    val sig = sh.select(col("doc_id"), minhash_sig(col("sh"), 16).as("sig"))
    val bands = sig.select(col("doc_id"),
      posexplode(array((0 until 4).map { b =>
        struct((0 until 4).map(r =>
          element_at(col("sig"), b * 4 + r + 1)): _*)
      }: _*)).as(Seq("band", "bsig")))
      .join(docs.select(col("doc_id"), isBatch.as("is_batch")), "doc_id")
    val batchBands = bands.filter(col("is_batch"))
      .select(col("doc_id").as("new_id"), col("band"), col("bsig"))
    val cand = bands.filter(!col("is_batch"))
      .join(broadcast(batchBands), Seq("band", "bsig"))
      .select(col("new_id"), col("doc_id").as("old_id"))
      .distinct()
    val verified = cand
      .join(sh.as("s1"), col("new_id") === col("s1.doc_id"))
      .join(sh.as("s2"), col("old_id") === col("s2.doc_id"))
      .select(col("new_id"), col("old_id"),
        jaccard_sim(col("s1.sh"), col("s2.sh")).as("jac"))
      .groupBy("new_id")
      .agg(count(lit(1)).as("n_candidates"),
        max(when(col("jac") >= 0.8, col("jac"))).as("best_near"))
    docs.filter(isBatch).select(col("doc_id"))
      .join(verified, col("doc_id") === col("new_id"), "left")
      .join(exactIds, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("is_exact").isNotNull, lit("exact_dup"))
          .when(col("best_near").isNotNull, lit("near_dup"))
          .otherwise(lit("new")).as("verdict"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("best_near"), lit(0.0)).as("best_jaccard"))
      .orderBy("doc_id")
  }

  /** SimHash Hamming ≤ 3 pairs over a (doc_id, text) frame: signatures
    * in one codegen'd pass, 16-bit chunk banding with first-shared-chunk
    * exactly-once emission, exact Hamming verify (the `dedup_simhash`
    * core — separated for the method-agreement audit). Unordered.
    */
  private[graft] def simhashPairs(docs: DataFrame): DataFrame = {
    val sig = docs
      .select(col("doc_id"), simhash64(split(col("text"), " ")).as("sig"))
      .persist()
    val chunks = sig.select(col("doc_id"), col("sig"),
      posexplode(array((0 until 4).map(c =>
        shiftrightunsigned(col("sig"), c * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("chunk", "ck")))
    val x = col("x.sig").bitwiseXOR(col("y.sig"))
    def chunkZero(c: Int) =
      shiftrightunsigned(x, c * 16).bitwiseAND(lit(0xFFFFL)) === 0
    val firstSharedChunk = when(chunkZero(0), 0)
      .when(chunkZero(1), 1).when(chunkZero(2), 2).otherwise(3)
    chunks.as("x")
      .join(chunks.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.ck") === col("y.ck") &&
          col("x.doc_id") < col("y.doc_id") &&
          firstSharedChunk === col("x.chunk"))
      .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"),
        bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).as("hamming"))
      .filter(col("hamming") <= 3)
  }

  /** MinHash 4×4-band candidate pairs over a (doc_id, sh) shingle-set
    * frame — the candidate stage of the LSH pipeline in isolation (the
    * same 16-sig/4-band layout as `dedup_minhash_lsh`), for evals that
    * measure the banding itself.
    */
  private[graft] def minhashCandidates(sh: DataFrame): DataFrame = {
    val sig = sh.select(col("doc_id"),
      graft.functions.functions.minhash_sig(col("sh"), 16).as("sig"))
    val bands = sig.select(col("doc_id"),
      posexplode(array((0 until 4).map { b =>
        struct((0 until 4).map(r =>
          element_at(col("sig"), b * 4 + r + 1)): _*)
      }: _*)).as(Seq("band", "bsig")))
    bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") &&
          col("x.bsig") === col("y.bsig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
      .distinct()
  }

  /** The `dedup_minhash_quality` core over any (doc_id, text) frame —
    * separated so specs can plant pairs with known exact Jaccard.
    */
  def minhashQualityFrom(docs: DataFrame): DataFrame = {
    {
      val sh = shingleSets(docs).persist()
      val sig = sh.select(col("doc_id"),
        minhash_sig(col("sh"), 16).as("sig")).persist()
      val bands = sig.select(col("doc_id"),
        posexplode(array((0 until 4).map { b =>
          struct((0 until 4).map(r =>
            element_at(col("sig"), b * 4 + r + 1)): _*)
        }: _*)).as(Seq("band", "bsig")))
      val cand = bands.as("x")
        .join(bands.as("y"),
          col("x.band") === col("y.band") &&
            col("x.bsig") === col("y.bsig") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
        .distinct()
      val withSig = cand
        .join(sig.as("sa"), col("id1") === col("sa.doc_id"))
        .join(sig.as("sb"), col("id2") === col("sb.doc_id"))
        .select(col("id1"), col("id2"),
          aggregate(zip_with(col("sa.sig"), col("sb.sig"),
            (a, b) => when(a === b, 1L).otherwise(0L)),
            lit(0L), (acc, x) => acc + x).as("m16"))
      withSig
        .join(sh.as("s1"), col("id1") === col("s1.doc_id"))
        .join(sh.as("s2"), col("id2") === col("s2.doc_id"))
        .select(col("m16"),
          round(jaccard_sim(col("s1.sh"), col("s2.sh")) * 1000000)
            .cast("long").as("jmicro"))
        .groupBy(expr("jmicro div 100000").as("j_band"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("m16") * 62500L).as("est_sum_micro"),
          sum(col("jmicro")).as("exact_sum_micro"),
          sum(abs(col("m16") * 62500L - col("jmicro")))
            .as("err_sum_micro"))
        .select(col("j_band"), col("n_pairs"),
          (col("est_sum_micro").cast("double") /
            (col("n_pairs") * 1000000L).cast("double")).as("mean_est"),
          (col("exact_sum_micro").cast("double") /
            (col("n_pairs") * 1000000L).cast("double")).as("mean_exact"),
          (col("err_sum_micro").cast("double") /
            (col("n_pairs") * 1000000L).cast("double"))
            .as("mean_abs_err"))
        .orderBy("j_band")
    }
  }

  /** vec_id + 1000x-quantized vector + squared norm, computed once per row
    * so pair loops only run the integer dot kernel.
    */
  private def quantizedEmbeddings(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"),
        graft.functions.functions.quantize1000(col("embedding")).as("q"))
      .withColumn("nn",
        aggregate(transform(col("q"), x => x * x), lit(0L), (a, x) => a + x))

  /** Exact quantized-cosine verification of candidate (id1, id2) pairs. */
  /** The `sim_dbscan_core` pipeline over any (vec_id, embedding) frame —
    * separated so specs can plant dense clusters with known core sets.
    *
    * MULTIPLICITY GROUPING (r9, found by the skew scaling leg): the
    * LSH-candidate pair join runs over UNIQUE quantized vectors, each
    * carrying its duplicate count `m` — identical vectors (cos = 1,
    * always mutual eps-neighbors, identically bucketed) contribute through
    * arithmetic instead of pair enumeration: a member of a group of
    * size m has (m - 1) twin neighbors plus the sum of neighbor-group
    * multiplicities, and every member of a group shares one flag. Without
    * this, k exact copies per vector made the intermediate pair set
    * grow k² per group (the r9 skew leg measured 15.2× wall for 10×
    * data); with it the pair join is over distinct vectors, whose count
    * the duplication does not grow. Output is IDENTICAL: twin pairs
    * pass verification trivially (cos = 1 ≥ t) and LSH never misses
    * them (equal vectors share every bucket), so enumerating vs
    * counting them is a pure plan choice.
    */
  def dbscanCoreFrom(embeddings: DataFrame, t: Double,
      minPts: Int): DataFrame = {
    // quantize ONCE (the fan-back join at the end reuses this frame —
    // without the persist the final join would re-scan and re-quantize)
    val qe = quantizedEmbeddings(embeddings).persist()
    // one representative per distinct quantized vector + its member count
    val groups = qe
      .groupBy(col("q"), col("nn"))
      .agg(min(col("vec_id")).as("vec_id"), count(lit(1)).as("m"))
      .persist()
    val emb = groups
      .withColumn("bkts", SimilarityOps.lshBuckets(col("q"), 16, 4))
      .persist()
    val keys = emb.select(col("vec_id"), col("bkts"),
      posexplode(col("bkts")).as(Seq("tb", "bkt")))
    val cand = keys.as("a")
      .join(keys.as("b"),
        col("a.tb") === col("b.tb") && col("a.bkt") === col("b.bkt") &&
          col("a.vec_id") < col("b.vec_id") &&
          graft.functions.functions
            .first_match(col("a.bkts"), col("b.bkts")) === col("a.tb"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"))
    val mOf = groups.select(col("vec_id"), col("m"), col("nn"))
    // each verified cross-group pair contributes the OTHER side's
    // multiplicity to each endpoint's neighbor count
    val crossCounts = verifyCosine(cand, emb, t)
      .join(mOf.as("m1"), col("id1") === col("m1.vec_id"))
      .join(mOf.as("m2"), col("id2") === col("m2.vec_id"))
      .select(explode(array(
        struct(col("id1").as("rep"), col("m2.m").as("w")),
        struct(col("id2").as("rep"), col("m1.m").as("w")))).as("e"))
      .groupBy(col("e.rep").as("rep")).agg(sum(col("e.w")).as("cross"))
    // per-representative neighbor count = twins + cross; fan back out to
    // every member of the group (a row per original vec_id, as before)
    val perRep = mOf.join(crossCounts,
        mOf("vec_id") === crossCounts("rep"), "left")
      .select(mOf("vec_id").as("rep"), col("m"),
        // twin credit gated on nn > 0: verifyCosine's zero-norm guard
        // yields cos 0 for a zero vector, so the enumerated path never
        // admitted twin pairs of zero-norm groups — the arithmetic
        // credit must not either (ADVICE r9)
        (coalesce(col("cross"), lit(0L)) +
          when(mOf("nn") > 0L, col("m") - 1L).otherwise(lit(0L)))
          .as("n_neighbors"))
      .filter(col("n_neighbors") >= minPts)
    qe
      .join(groups.select(col("q"), col("nn"), col("vec_id").as("rep")),
        Seq("q", "nn"))
      .join(perRep, Seq("rep"))
      .select(col("vec_id"), col("n_neighbors"))
      .orderBy("vec_id")
  }

  private def verifyCosine(
      cand: DataFrame, emb: DataFrame, t: Double): DataFrame =
    cand
      .join(emb.as("x"), col("id1") === col("x.vec_id"))
      .join(emb.as("y"), col("id2") === col("y.vec_id"))
      .select(col("id1"), col("id2"),
        // zero-norm guard (matches Kernels.quantCosine): 0/0 would be NaN,
        // and Spark treats NaN as greater than any number, so an unguarded
        // zero vector would pass the >= threshold and flood the output
        when(col("x.nn") === 0L || col("y.nn") === 0L, lit(0.0))
          .otherwise(quant_dot(col("x.q"), col("y.q")).cast("double") /
            (sqrt(col("x.nn").cast("double")) *
              sqrt(col("y.nn").cast("double")))).as("cos"))
      .filter(col("cos") >= t)
      .orderBy("id1", "id2")

  def oracles: Map[String, String] = Map(
    // Full replication of the MinHash+LSH pipeline in DuckDB SQL: xxh64
    // per (distinct shingle, seed 0..15) via XxhSql, per-doc per-seed min,
    // 4x4 banding as ordered-list equality, then the same exact-Jaccard
    // verification — so the oracle checks signatures AND banding recall,
    // not just the final pair set.
    "dedup_minhash_lsh" ->
      s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS L FROM documents),
         |sh AS (SELECT DISTINCT doc_id,
         |         L[i] || ' ' || L[i+1] || ' ' || L[i+2] AS s
         |       FROM tok,
         |         LATERAL (SELECT unnest(generate_series(1, len(L) - 2)) AS i) g),
         |hs AS (SELECT s, sd, ${XxhSql.expr("s", "sd")} AS h
         |       FROM (SELECT DISTINCT s FROM sh)
         |       CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS sd) k),
         |sig AS (SELECT doc_id, sd, min(h) AS mh
         |        FROM sh JOIN hs USING (s) GROUP BY 1, 2),
         |band AS (SELECT doc_id, sd // 4 AS band,
         |           array_agg(mh ORDER BY sd) AS bsig
         |         FROM sig GROUP BY 1, 2),
         |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |         FROM band a JOIN band b
         |           ON a.band = b.band AND a.bsig = b.bsig
         |          AND a.doc_id < b.doc_id),
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT c.id1, c.id2, count(*) AS i
         |          FROM cand c
         |          JOIN sh x ON x.doc_id = c.id1
         |          JOIN sh y ON y.doc_id = c.id2 AND y.s = x.s
         |          GROUP BY 1, 2)
         |SELECT id1, id2,
         |  CAST(i AS DOUBLE) / CAST(ca.n + cb.n - i AS DOUBLE) AS jaccard
         |FROM inter JOIN cnt ca ON ca.doc_id = id1
         |           JOIN cnt cb ON cb.doc_id = id2
         |WHERE CAST(i AS DOUBLE) / CAST(ca.n + cb.n - i AS DOUBLE) >= 0.8
         |ORDER BY id1, id2""".stripMargin,
    // the same signature/banding CTE chain restricted to bench x corpus
    // candidates, exact-Jaccard verified, rolled up per benchmark doc
    "data_decontaminate_neardup" ->
      s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS L FROM documents),
         |sh AS (SELECT DISTINCT doc_id,
         |         L[i] || ' ' || L[i+1] || ' ' || L[i+2] AS s
         |       FROM tok,
         |         LATERAL (SELECT unnest(generate_series(1, len(L) - 2)) AS i) g),
         |hs AS (SELECT s, sd, ${XxhSql.expr("s", "sd")} AS h
         |       FROM (SELECT DISTINCT s FROM sh)
         |       CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS sd) k),
         |sig AS (SELECT doc_id, sd, min(h) AS mh
         |        FROM sh JOIN hs USING (s) GROUP BY 1, 2),
         |band AS (SELECT doc_id, sd // 4 AS band,
         |           array_agg(mh ORDER BY sd) AS bsig
         |         FROM sig GROUP BY 1, 2),
         |cand AS (SELECT DISTINCT a.doc_id AS bench_id, b.doc_id AS corp_id
         |         FROM band a JOIN band b
         |           ON a.band = b.band AND a.bsig = b.bsig
         |         WHERE a.doc_id < 20 AND b.doc_id >= 20),
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT c.bench_id, c.corp_id, count(*) AS i
         |          FROM cand c
         |          JOIN sh x ON x.doc_id = c.bench_id
         |          JOIN sh y ON y.doc_id = c.corp_id AND y.s = x.s
         |          GROUP BY 1, 2),
         |j AS (SELECT c.bench_id, c.corp_id,
         |        CAST(COALESCE(i.i, 0) AS DOUBLE) /
         |          CAST(ca.n + cb.n - COALESCE(i.i, 0) AS DOUBLE) AS jac
         |      FROM cand c
         |      LEFT JOIN inter i
         |        ON i.bench_id = c.bench_id AND i.corp_id = c.corp_id
         |      JOIN cnt ca ON ca.doc_id = c.bench_id
         |      JOIN cnt cb ON cb.doc_id = c.corp_id)
         |SELECT d.doc_id AS bench_id,
         |  CAST(count(j.corp_id) AS BIGINT) AS n_candidates,
         |  CAST(count(CASE WHEN j.jac >= 0.5 THEN 1 END) AS BIGINT)
         |    AS n_contaminated,
         |  COALESCE(max(CASE WHEN j.jac >= 0.5 THEN j.jac END), 0.0)
         |    AS max_jaccard
         |FROM documents d LEFT JOIN j ON j.bench_id = d.doc_id
         |WHERE d.doc_id < 20
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // same pipeline through `cand`, then signature-agreement counts and
    // the integer-grid calibration rollup (see the query comment)
    "dedup_minhash_quality" ->
      s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS L FROM documents),
         |sh AS (SELECT DISTINCT doc_id,
         |         L[i] || ' ' || L[i+1] || ' ' || L[i+2] AS s
         |       FROM tok,
         |         LATERAL (SELECT unnest(generate_series(1, len(L) - 2)) AS i) g),
         |hs AS (SELECT s, sd, ${XxhSql.expr("s", "sd")} AS h
         |       FROM (SELECT DISTINCT s FROM sh)
         |       CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS sd) k),
         |sig AS (SELECT doc_id, sd, min(h) AS mh
         |        FROM sh JOIN hs USING (s) GROUP BY 1, 2),
         |band AS (SELECT doc_id, sd // 4 AS band,
         |           array_agg(mh ORDER BY sd) AS bsig
         |         FROM sig GROUP BY 1, 2),
         |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |         FROM band a JOIN band b
         |           ON a.band = b.band AND a.bsig = b.bsig
         |          AND a.doc_id < b.doc_id),
         |m AS (SELECT c.id1, c.id2,
         |        count(CASE WHEN a.mh = b.mh THEN 1 END) AS m16
         |      FROM cand c
         |      JOIN sig a ON a.doc_id = c.id1
         |      JOIN sig b ON b.doc_id = c.id2 AND b.sd = a.sd
         |      GROUP BY 1, 2),
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT c.id1, c.id2, count(*) AS i
         |          FROM cand c
         |          JOIN sh x ON x.doc_id = c.id1
         |          JOIN sh y ON y.doc_id = c.id2 AND y.s = x.s
         |          GROUP BY 1, 2),
         |jm AS (SELECT m.m16, CAST(round(1000000 * (CAST(COALESCE(i.i, 0)
         |          AS DOUBLE) / CAST(ca.n + cb.n - COALESCE(i.i, 0)
         |          AS DOUBLE))) AS BIGINT) AS jmicro
         |       FROM m LEFT JOIN inter i
         |         ON i.id1 = m.id1 AND i.id2 = m.id2
         |       JOIN cnt ca ON ca.doc_id = m.id1
         |       JOIN cnt cb ON cb.doc_id = m.id2)
         |SELECT jmicro // 100000 AS j_band, count(*) AS n_pairs,
         |  CAST(sum(m16 * 62500) AS DOUBLE) /
         |    CAST(count(*) * 1000000 AS DOUBLE) AS mean_est,
         |  CAST(sum(jmicro) AS DOUBLE) /
         |    CAST(count(*) * 1000000 AS DOUBLE) AS mean_exact,
         |  CAST(sum(abs(m16 * 62500 - jmicro)) AS DOUBLE) /
         |    CAST(count(*) * 1000000 AS DOUBLE) AS mean_abs_err
         |FROM jm GROUP BY 1 ORDER BY j_band""".stripMargin,
    // SimHash oracle: xxh64(token, 42) per distinct token, 64
    // frequency-weighted bit sums per doc, sign -> signature; the chunk
    // banding is complete for Hamming <= 3 (pigeonhole over 4 chunks), so
    // the expected output is simply ALL pairs at Hamming <= 3.
    "dedup_simhash" ->
      s"""WITH tc AS (SELECT doc_id, tok, count(*) AS cnt
         |            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |                  FROM documents) GROUP BY 1, 2),
         |th AS (SELECT tok, ${XxhSql.expr("tok", "42")} AS h
         |       FROM (SELECT DISTINCT tok FROM tc)),
         |thu AS (SELECT tok,
         |          CASE WHEN h < 0 THEN h::HUGEINT + 18446744073709551616
         |               ELSE h::HUGEINT END AS hu
         |        FROM th),
         |bits AS (SELECT doc_id, bit,
         |           sum(CASE WHEN (hu // (${XxhSql.pow2List})[bit + 1]) % 2 = 1
         |               THEN cnt ELSE -cnt END) AS bsum
         |         FROM tc JOIN thu USING (tok)
         |         CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS bit) bb
         |         GROUP BY 1, 2),
         |sigu AS (SELECT doc_id,
         |           sum(CASE WHEN bsum > 0 THEN (${XxhSql.pow2List})[bit + 1]
         |               ELSE 0::HUGEINT END) AS su
         |         FROM bits GROUP BY 1),
         |sigs AS (SELECT doc_id, ${XxhSql.signed("su")} AS sig FROM sigu)
         |SELECT a.doc_id AS id1, b.doc_id AS id2,
         |  CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
         |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sig, b.sig)) <= 3
         |ORDER BY id1, id2""".stripMargin,
    "dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,
    // the dedup_canonical recursive-CTE chain through the rank-1 keep,
    // the rn > 1 rows as the drop set, rolled up per source
    "dedup_savings_by_source" ->
      """WITH RECURSIVE tok AS (SELECT doc_id, string_split(text, ' ') AS L
        |             FROM documents),
        |sh AS (SELECT DISTINCT doc_id, L[i] || ' ' || L[i+1] || ' ' || L[i+2] AS s
        |       FROM tok,
        |         LATERAL (SELECT unnest(generate_series(1, len(L)-2)) AS i) g),
        |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |pair AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
        |         FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |         GROUP BY 1, 2),
        |dp AS (SELECT id1, id2
        |  FROM pair JOIN cnt ca ON ca.doc_id = id1
        |            JOIN cnt cb ON cb.doc_id = id2
        |  WHERE CAST(inter AS DOUBLE) / CAST(ca.n + cb.n - inter AS DOUBLE)
        |    >= 0.8),
        |e AS (SELECT id1 AS a, id2 AS b FROM dp
        |      UNION ALL SELECT id2, id1 FROM dp),
        |nodes AS (SELECT DISTINCT a AS id FROM e),
        |r(id, lab) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT e.b, r.lab FROM r JOIN e ON e.a = r.id
        |),
        |comp AS (SELECT id AS doc_id, min(lab) AS rep_id FROM r GROUP BY id),
        |sel AS (SELECT rep_id, d.doc_id,
        |    row_number() OVER (PARTITION BY rep_id
        |      ORDER BY d.n_chars DESC, d.doc_id ASC) AS rn
        |  FROM comp JOIN documents d USING (doc_id)),
        |dropped AS (SELECT doc_id FROM sel WHERE rn > 1),
        |ds AS (SELECT source, count(*) AS n_dropped,
        |    CAST(sum(n_chars) AS BIGINT) AS chars_dropped
        |  FROM dropped JOIN documents USING (doc_id) GROUP BY 1),
        |tot AS (SELECT source, count(*) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS tot_chars
        |  FROM documents GROUP BY 1)
        |SELECT t.source, n_docs, COALESCE(n_dropped, 0) AS n_dropped,
        |  COALESCE(chars_dropped, 0) AS chars_dropped,
        |  CAST(COALESCE(chars_dropped, 0) AS DOUBLE) /
        |    CAST(tot_chars AS DOUBLE) AS savings_frac
        |FROM tot t LEFT JOIN ds ON ds.source = t.source
        |ORDER BY t.source""".stripMargin,
    // the dedup_ngram_jaccard truth pairs + the minhash banding candidate
    // CTEs, rolled into the recall/efficiency scalar row
    "dedup_lsh_recall" ->
      s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS L
         |  FROM documents),
         |sh AS (SELECT DISTINCT doc_id,
         |         L[i] || ' ' || L[i+1] || ' ' || L[i+2] AS s
         |       FROM tok,
         |         LATERAL (SELECT unnest(generate_series(1, len(L) - 2)) AS i) g),
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |pair AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
         |         FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |         GROUP BY 1, 2),
         |truth AS (SELECT id1, id2
         |  FROM pair JOIN cnt ca ON ca.doc_id = id1
         |            JOIN cnt cb ON cb.doc_id = id2
         |  WHERE CAST(inter AS DOUBLE) /
         |    CAST(ca.n + cb.n - inter AS DOUBLE) >= 0.8),
         |hs AS (SELECT s, sd, ${XxhSql.expr("s", "sd")} AS h
         |       FROM (SELECT DISTINCT s FROM sh)
         |       CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS sd) k),
         |sig AS (SELECT doc_id, sd, min(h) AS mh
         |        FROM sh JOIN hs USING (s) GROUP BY 1, 2),
         |band AS (SELECT doc_id, sd // 4 AS band,
         |           array_agg(mh ORDER BY sd) AS bsig
         |         FROM sig GROUP BY 1, 2),
         |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |         FROM band a JOIN band b
         |           ON a.band = b.band AND a.bsig = b.bsig
         |          AND a.doc_id < b.doc_id),
         |g AS (SELECT
         |    (SELECT count(*) FROM truth) AS n_truth,
         |    (SELECT count(*) FROM cand) AS n_candidates,
         |    (SELECT count(*) FROM truth t JOIN cand c
         |       ON c.id1 = t.id1 AND c.id2 = t.id2) AS n_hit)
         |SELECT n_truth, n_candidates, n_hit,
         |  CAST(n_hit AS DOUBLE) / CAST(n_truth AS DOUBLE) AS recall,
         |  CAST(n_hit AS DOUBLE) / CAST(n_candidates AS DOUBLE)
         |    AS verify_efficiency
         |FROM g""".stripMargin,
    // the dedup_lsh_recall truth + signature CTEs, re-banded per config
    // (band = sd // r) — three one-row configs unioned. Every heavy CTE
    // is AS MATERIALIZED and every count is taken ONCE in a 1-row CTE:
    // DuckDB inlines plain CTEs per reference, and the first cut of
    // this oracle (scalar subqueries re-reading cand_*) recomputed the
    // full minhash pipeline ~45x — minutes instead of seconds.
    "dedup_band_tuning" -> {
      def cfg(b: Int, r: Int): String =
        s"""cand_$b AS MATERIALIZED (
           |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           |  FROM (SELECT doc_id, sd // $r AS band,
           |      array_agg(mh ORDER BY sd) AS bsig FROM sig GROUP BY 1, 2) a
           |  JOIN (SELECT doc_id, sd // $r AS band,
           |      array_agg(mh ORDER BY sd) AS bsig FROM sig GROUP BY 1, 2) b
           |    ON a.band = b.band AND a.bsig = b.bsig
           |   AND a.doc_id < b.doc_id),
           |c_$b AS (SELECT count(*) AS n_c FROM cand_$b),
           |h_$b AS (SELECT count(*) AS n_h FROM truth t JOIN cand_$b c
           |  ON c.id1 = t.id1 AND c.id2 = t.id2)""".stripMargin
      def row(b: Int, r: Int): String =
        s"""SELECT $b AS bands, $r AS rows_per_band,
           |  n_c AS n_candidates, n_h AS n_hit, n_t AS n_truth,
           |  CASE WHEN n_c = 0 THEN 0.0
           |    ELSE CAST(n_h AS DOUBLE) / CAST(n_c AS DOUBLE) END
           |    AS precision,
           |  CASE WHEN n_t = 0 THEN 0.0
           |    ELSE CAST(n_h AS DOUBLE) / CAST(n_t AS DOUBLE) END
           |    AS recall
           |FROM c_$b, h_$b, t0""".stripMargin
      s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS L
         |  FROM documents),
         |sh AS MATERIALIZED (SELECT DISTINCT doc_id,
         |         L[i] || ' ' || L[i+1] || ' ' || L[i+2] AS s
         |       FROM tok,
         |         LATERAL (SELECT unnest(generate_series(1, len(L) - 2))
         |           AS i) g),
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |pair AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
         |           count(*) AS inter
         |         FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |         GROUP BY 1, 2),
         |truth AS MATERIALIZED (SELECT id1, id2
         |  FROM pair JOIN cnt ca ON ca.doc_id = id1
         |            JOIN cnt cb ON cb.doc_id = id2
         |  WHERE CAST(inter AS DOUBLE) /
         |    CAST(ca.n + cb.n - inter AS DOUBLE) >= 0.8),
         |t0 AS (SELECT count(*) AS n_t FROM truth),
         |hs AS (SELECT s, sd, ${XxhSql.expr("s", "sd")} AS h
         |       FROM (SELECT DISTINCT s FROM sh)
         |       CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS sd) k),
         |sig AS MATERIALIZED (SELECT doc_id, sd, min(h) AS mh
         |        FROM sh JOIN hs USING (s) GROUP BY 1, 2),
         |${cfg(2, 8)},
         |${cfg(4, 4)},
         |${cfg(8, 2)}
         |${row(2, 8)}
         |UNION ALL
         |${row(4, 4)}
         |UNION ALL
         |${row(8, 2)}
         |ORDER BY bands""".stripMargin
    },
    "dedup_ngram_jaccard" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS L FROM documents),
        |sh AS (SELECT DISTINCT doc_id, L[i] || ' ' || L[i+1] || ' ' || L[i+2] AS s
        |       FROM tok,
        |         LATERAL (SELECT unnest(generate_series(1, len(L)-2)) AS i) g),
        |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |pair AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
        |         FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |         GROUP BY 1, 2)
        |SELECT id1, id2,
        |  CAST(inter AS DOUBLE) / CAST(ca.n + cb.n - inter AS DOUBLE) AS jaccard
        |FROM pair JOIN cnt ca ON ca.doc_id = id1 JOIN cnt cb ON cb.doc_id = id2
        |WHERE CAST(inter AS DOUBLE) / CAST(ca.n + cb.n - inter AS DOUBLE) >= 0.8
        |ORDER BY id1, id2""".stripMargin,
    // Brute-force containment replication: ordered pairs, intersection
    // over the contained side's size, the same cross-multiplied integer
    // accept test (inter * 10 >= n * 7 — no float boundary).
    "dedup_containment" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS L FROM documents),
        |sh AS (SELECT DISTINCT doc_id, L[i] || ' ' || L[i+1] || ' ' || L[i+2] AS s
        |       FROM tok,
        |         LATERAL (SELECT unnest(generate_series(1, len(L)-2)) AS i) g),
        |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |pair AS (SELECT a.doc_id AS contained_id, b.doc_id AS container_id,
        |           count(*) AS inter
        |         FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
        |         GROUP BY 1, 2)
        |SELECT contained_id, container_id,
        |  CAST(inter AS DOUBLE) / CAST(ca.n AS DOUBLE) AS containment
        |FROM pair JOIN cnt ca ON ca.doc_id = contained_id
        |WHERE inter * 10 >= ca.n * 7
        |ORDER BY contained_id, container_id""".stripMargin,
    // Component membership via recursive CTE: r holds (node, l) whenever
    // label l can reach the node along dup-pair edges; min per node is the
    // component representative — an independent formulation of the
    // engine's iterative min-label propagation.
    "dedup_components" ->
      """WITH RECURSIVE tok AS (SELECT doc_id, string_split(text, ' ') AS L
        |             FROM documents),
        |sh AS (SELECT DISTINCT doc_id, L[i] || ' ' || L[i+1] || ' ' || L[i+2] AS s
        |       FROM tok,
        |         LATERAL (SELECT unnest(generate_series(1, len(L)-2)) AS i) g),
        |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |pair AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
        |         FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |         GROUP BY 1, 2),
        |dp AS (SELECT id1, id2
        |  FROM pair JOIN cnt ca ON ca.doc_id = id1
        |            JOIN cnt cb ON cb.doc_id = id2
        |  WHERE CAST(inter AS DOUBLE) / CAST(ca.n + cb.n - inter AS DOUBLE)
        |    >= 0.8),
        |e AS (SELECT id1 AS a, id2 AS b FROM dp
        |      UNION ALL SELECT id2, id1 FROM dp),
        |nodes AS (SELECT DISTINCT a AS id FROM e),
        |r(id, lab) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT e.b, r.lab FROM r JOIN e ON e.a = r.id
        |)
        |SELECT id AS doc_id, CAST(min(lab) AS BIGINT) AS rep_id
        |FROM r GROUP BY id ORDER BY doc_id""".stripMargin,
    // the components CTE, collapsed to the size histogram
    "dedup_cluster_sizes" ->
      """WITH RECURSIVE tok AS (SELECT doc_id, string_split(text, ' ') AS L
        |             FROM documents),
        |sh AS (SELECT DISTINCT doc_id, L[i] || ' ' || L[i+1] || ' ' || L[i+2] AS s
        |       FROM tok,
        |         LATERAL (SELECT unnest(generate_series(1, len(L)-2)) AS i) g),
        |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |pair AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
        |         FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |         GROUP BY 1, 2),
        |dp AS (SELECT id1, id2
        |  FROM pair JOIN cnt ca ON ca.doc_id = id1
        |            JOIN cnt cb ON cb.doc_id = id2
        |  WHERE CAST(inter AS DOUBLE) / CAST(ca.n + cb.n - inter AS DOUBLE)
        |    >= 0.8),
        |e AS (SELECT id1 AS a, id2 AS b FROM dp
        |      UNION ALL SELECT id2, id1 FROM dp),
        |nodes AS (SELECT DISTINCT a AS id FROM e),
        |r(id, lab) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT e.b, r.lab FROM r JOIN e ON e.a = r.id
        |),
        |m AS (SELECT id, min(lab) AS lab FROM r GROUP BY id),
        |c AS (SELECT lab, count(*) AS sz FROM m GROUP BY lab)
        |SELECT sz AS cluster_size, count(*) AS n_clusters,
        |  CAST(sum(sz - 1) AS BIGINT) AS n_reclaimable
        |FROM c GROUP BY sz ORDER BY cluster_size""".stripMargin,
    // The same recursive-CTE component formulation, extended with the
    // keep-best rule as a rank-1 window (the engine's max(struct) and a
    // row_number argmax agree exactly on integer keys).
    "dedup_canonical" ->
      """WITH RECURSIVE tok AS (SELECT doc_id, string_split(text, ' ') AS L
        |             FROM documents),
        |sh AS (SELECT DISTINCT doc_id, L[i] || ' ' || L[i+1] || ' ' || L[i+2] AS s
        |       FROM tok,
        |         LATERAL (SELECT unnest(generate_series(1, len(L)-2)) AS i) g),
        |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |pair AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
        |         FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |         GROUP BY 1, 2),
        |dp AS (SELECT id1, id2
        |  FROM pair JOIN cnt ca ON ca.doc_id = id1
        |            JOIN cnt cb ON cb.doc_id = id2
        |  WHERE CAST(inter AS DOUBLE) / CAST(ca.n + cb.n - inter AS DOUBLE)
        |    >= 0.8),
        |e AS (SELECT id1 AS a, id2 AS b FROM dp
        |      UNION ALL SELECT id2, id1 FROM dp),
        |nodes AS (SELECT DISTINCT a AS id FROM e),
        |r(id, lab) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT e.b, r.lab FROM r JOIN e ON e.a = r.id
        |),
        |comp AS (SELECT id AS doc_id, CAST(min(lab) AS BIGINT) AS rep_id
        |  FROM r GROUP BY id),
        |sel AS (SELECT rep_id, d.doc_id, d.n_chars,
        |    row_number() OVER (PARTITION BY rep_id
        |      ORDER BY d.n_chars DESC, d.doc_id ASC) AS rn,
        |    count(*) OVER (PARTITION BY rep_id) AS n_members
        |  FROM comp JOIN documents d USING (doc_id))
        |SELECT rep_id, CAST(n_members AS BIGINT) AS n_members,
        |  n_chars AS canonical_chars, doc_id AS canonical_id
        |FROM sel WHERE rn = 1 ORDER BY rep_id""".stripMargin,
    "pipeline_clean_corpus" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS L FROM documents),
        |q AS (SELECT doc_id, len(L) AS n_tokens,
        |    CAST(len(list_filter(L,
        |      x -> x IN ('the','a','of','and','to','in'))) AS DOUBLE)
        |      / CAST(len(L) AS DOUBLE) AS stop_ratio
        |  FROM tok),
        |quality AS (SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens FROM q
        |  WHERE n_tokens >= 50 AND stop_ratio <= 0.35),
        |sh AS (SELECT DISTINCT doc_id, L[i] || ' ' || L[i+1] || ' ' || L[i+2] AS s
        |       FROM tok,
        |         LATERAL (SELECT unnest(generate_series(1, len(L)-2)) AS i) g),
        |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |pair AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
        |         FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |         GROUP BY 1, 2),
        |dups AS (SELECT DISTINCT id2 AS drop_id
        |  FROM pair JOIN cnt ca ON ca.doc_id = id1
        |            JOIN cnt cb ON cb.doc_id = id2
        |  WHERE CAST(inter AS DOUBLE) / CAST(ca.n + cb.n - inter AS DOUBLE)
        |    >= 0.8)
        |SELECT doc_id, n_tokens FROM quality
        |WHERE doc_id NOT IN (SELECT drop_id FROM dups)
        |ORDER BY doc_id""".stripMargin,
    // Replication of the OR-amplified bucketing: 64 integer hyperplanes,
    // 16 x 4-bit table signatures, candidate equi-join on (table, bucket),
    // exact quantized-cosine verify — the oracle checks bucket assignment,
    // not just the verified scores.
    "dedup_embedding" ->
      """WITH q AS (SELECT vec_id, i,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000.0 + 0.5) AS BIGINT) AS v
        |  FROM embeddings,
        |    LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) g),
        |n AS (SELECT vec_id, sum(v * v) AS nn FROM q GROUP BY vec_id),
        |dots AS (SELECT vec_id, k,
        |           sum(v * (((k * 131 + (i - 1) * 31 + 7) % 61) - 30)) AS dt
        |         FROM q CROSS JOIN
        |           (SELECT unnest(generate_series(0, 63)) AS k) pl
        |         GROUP BY 1, 2),
        |bkt AS (SELECT vec_id, k // 4 AS tb,
        |          CAST(sum(CASE WHEN dt > 0 THEN 1 << (k % 4) ELSE 0 END)
        |            AS BIGINT) AS bucket
        |        FROM dots GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
        |         FROM bkt a JOIN bkt b
        |           ON a.tb = b.tb AND a.bucket = b.bucket
        |          AND a.vec_id < b.vec_id),
        |p AS (SELECT id1, id2, sum(a.v * b.v) AS dot
        |      FROM cand JOIN q a ON a.vec_id = id1
        |                JOIN q b ON b.vec_id = id2 AND b.i = a.i
        |      GROUP BY 1, 2),
        |scored AS (SELECT id1, id2,
        |    CASE WHEN na.nn = 0 OR nb.nn = 0 THEN 0.0
        |         ELSE CAST(dot AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) *
        |           sqrt(CAST(nb.nn AS DOUBLE))) END AS cos
        |  FROM p JOIN n na ON na.vec_id = id1 JOIN n nb ON nb.vec_id = id2)
        |SELECT id1, id2, cos FROM scored WHERE cos >= 0.45
        |ORDER BY id1, id2""".stripMargin,
    // the dedup_embedding pipeline (bucketing replicated identically)
    // with the endpoint fan-out + core threshold on top
    "sim_dbscan_core" ->
      """WITH q AS (SELECT vec_id, i,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000.0 + 0.5) AS BIGINT) AS v
        |  FROM embeddings,
        |    LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) g),
        |n AS (SELECT vec_id, sum(v * v) AS nn FROM q GROUP BY vec_id),
        |dots AS (SELECT vec_id, k,
        |           sum(v * (((k * 131 + (i - 1) * 31 + 7) % 61) - 30)) AS dt
        |         FROM q CROSS JOIN
        |           (SELECT unnest(generate_series(0, 63)) AS k) pl
        |         GROUP BY 1, 2),
        |bkt AS (SELECT vec_id, k // 4 AS tb,
        |          CAST(sum(CASE WHEN dt > 0 THEN 1 << (k % 4) ELSE 0 END)
        |            AS BIGINT) AS bucket
        |        FROM dots GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
        |         FROM bkt a JOIN bkt b
        |           ON a.tb = b.tb AND a.bucket = b.bucket
        |          AND a.vec_id < b.vec_id),
        |p AS (SELECT id1, id2, sum(a.v * b.v) AS dot
        |      FROM cand JOIN q a ON a.vec_id = id1
        |                JOIN q b ON b.vec_id = id2 AND b.i = a.i
        |      GROUP BY 1, 2),
        |scored AS (SELECT id1, id2,
        |    CASE WHEN na.nn = 0 OR nb.nn = 0 THEN 0.0
        |         ELSE CAST(dot AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) *
        |           sqrt(CAST(nb.nn AS DOUBLE))) END AS cos
        |  FROM p JOIN n na ON na.vec_id = id1 JOIN n nb ON nb.vec_id = id2),
        |sym AS (SELECT id1 AS vec_id FROM scored WHERE cos >= 0.35
        |        UNION ALL SELECT id2 FROM scored WHERE cos >= 0.35)
        |SELECT vec_id, count(*) AS n_neighbors FROM sym
        |GROUP BY 1 HAVING count(*) >= 2 ORDER BY vec_id""".stripMargin,
    "dedup_embedding_bruteforce" ->
      """WITH q AS (SELECT vec_id, i,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000.0 + 0.5) AS BIGINT) AS v
        |  FROM embeddings,
        |    LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) g),
        |n AS (SELECT vec_id, sum(v * v) AS nn FROM q GROUP BY vec_id),
        |p AS (SELECT a.vec_id AS id1, b.vec_id AS id2, sum(a.v * b.v) AS dot
        |      FROM q a JOIN q b ON a.i = b.i AND a.vec_id < b.vec_id
        |      GROUP BY 1, 2),
        |scored AS (SELECT id1, id2,
        |    CASE WHEN na.nn = 0 OR nb.nn = 0 THEN 0.0
        |         ELSE CAST(dot AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) *
        |           sqrt(CAST(nb.nn AS DOUBLE))) END AS cos
        |  FROM p JOIN n na ON na.vec_id = id1 JOIN n nb ON nb.vec_id = id2)
        |SELECT id1, id2, cos FROM scored WHERE cos >= 0.45
        |ORDER BY id1, id2""".stripMargin,
    // full replication: 8-token windows, keep-first by packed (doc,pos)
    // key, the same running-max islands merge, the same per-doc rollup
    "dedup_substring_spans" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS L FROM documents),
        |inst AS (SELECT doc_id, len(L) AS n_tokens, i - 1 AS pos,
        |    L[i]||' '||L[i+1]||' '||L[i+2]||' '||L[i+3]||' '||L[i+4]||' '||
        |      L[i+5]||' '||L[i+6]||' '||L[i+7] AS sh
        |  FROM tok,
        |    LATERAL (SELECT unnest(generate_series(1, len(L) - 7)) AS i) g),
        |gd AS (SELECT sh, count(*) AS cnt,
        |    min(doc_id * 1000000 + pos) AS firstk
        |  FROM inst GROUP BY sh HAVING count(*) > 1),
        |dup AS (SELECT i.doc_id, i.n_tokens, i.pos
        |  FROM inst i JOIN gd ON gd.sh = i.sh
        |  WHERE i.doc_id * 1000000 + i.pos <> gd.firstk),
        |m AS (SELECT doc_id, n_tokens, pos,
        |    max(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
        |  FROM dup),
        |isl AS (SELECT doc_id, n_tokens, pos,
        |    sum(CASE WHEN prevmax IS NULL OR pos > prevmax THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY pos) AS isl
        |  FROM m),
        |sp AS (SELECT doc_id, n_tokens, isl AS island,
        |    min(pos) AS st, max(pos + 8) AS en
        |  FROM isl GROUP BY doc_id, n_tokens, island)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  count(*) AS n_dup_spans,
        |  CAST(sum(en - st) AS BIGINT) AS dup_tokens,
        |  CAST(sum(en - st) AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS dup_frac
        |FROM sp GROUP BY doc_id, n_tokens ORDER BY doc_id""".stripMargin,
    // the exact-Jaccard pair chain + the full simhash signature chain +
    // text-identity pairs, combined as scalar counts
    "dedup_method_overlap" ->
      s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS L FROM documents),
         |sh AS (SELECT DISTINCT doc_id, L[i] || ' ' || L[i+1] || ' ' || L[i+2] AS s
         |       FROM tok,
         |         LATERAL (SELECT unnest(generate_series(1, len(L)-2)) AS i) g),
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |pair AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
         |         FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |         GROUP BY 1, 2),
         |jp AS (SELECT id1, id2
         |  FROM pair JOIN cnt ca ON ca.doc_id = id1
         |            JOIN cnt cb ON cb.doc_id = id2
         |  WHERE CAST(inter AS DOUBLE) / CAST(ca.n + cb.n - inter AS DOUBLE)
         |    >= 0.8),
         |tc AS (SELECT doc_id, tok2 AS tok, count(*) AS cnt
         |       FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok2
         |             FROM documents) GROUP BY 1, 2),
         |th AS (SELECT tok, ${XxhSql.expr("tok", "42")} AS h
         |       FROM (SELECT DISTINCT tok FROM tc)),
         |thu AS (SELECT tok,
         |          CASE WHEN h < 0 THEN h::HUGEINT + 18446744073709551616
         |               ELSE h::HUGEINT END AS hu
         |        FROM th),
         |bits AS (SELECT doc_id, bit,
         |           sum(CASE WHEN (hu // (${XxhSql.pow2List})[bit + 1]) % 2 = 1
         |               THEN cnt ELSE -cnt END) AS bsum
         |         FROM tc JOIN thu USING (tok)
         |         CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS bit) bb
         |         GROUP BY 1, 2),
         |sigu AS (SELECT doc_id,
         |           sum(CASE WHEN bsum > 0 THEN (${XxhSql.pow2List})[bit + 1]
         |               ELSE 0::HUGEINT END) AS su
         |         FROM bits GROUP BY 1),
         |sigs AS (SELECT doc_id, ${XxhSql.signed("su")} AS sig FROM sigu),
         |sp AS (SELECT a.doc_id AS id1, b.doc_id AS id2
         |       FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
         |       WHERE bit_count(xor(a.sig, b.sig)) <= 3),
         |ep AS (SELECT a.doc_id AS id1, b.doc_id AS id2
         |       FROM documents a JOIN documents b
         |         ON md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id),
         |ne AS (SELECT count(*) AS n FROM ep),
         |nj AS (SELECT count(*) AS n FROM jp),
         |ns AS (SELECT count(*) AS n FROM sp),
         |njs AS (SELECT count(*) AS n FROM jp JOIN sp USING (id1, id2)),
         |nej AS (SELECT count(*) AS n FROM ep JOIN jp USING (id1, id2)),
         |nes AS (SELECT count(*) AS n FROM ep JOIN sp USING (id1, id2))
         |SELECT ne.n AS n_exact, nj.n AS n_jaccard, ns.n AS n_simhash,
         |  njs.n AS n_jac_and_sim, nej.n AS n_exact_in_jac,
         |  nes.n AS n_exact_in_sim,
         |  nj.n - njs.n AS n_jaccard_only, ns.n - njs.n AS n_simhash_only
         |FROM ne, nj, ns, njs, nej, nes""".stripMargin,
    // the full banding chain once, per-pair Jaccard once (zero-overlap
    // candidates kept via the left join), three conditional counts
    "dedup_threshold_curve" ->
      s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS L FROM documents),
         |sh AS (SELECT DISTINCT doc_id,
         |         L[i] || ' ' || L[i+1] || ' ' || L[i+2] AS s
         |       FROM tok,
         |         LATERAL (SELECT unnest(generate_series(1, len(L) - 2)) AS i) g),
         |hs AS (SELECT s, sd, ${XxhSql.expr("s", "sd")} AS h
         |       FROM (SELECT DISTINCT s FROM sh)
         |       CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS sd) k),
         |sig AS (SELECT doc_id, sd, min(h) AS mh
         |        FROM sh JOIN hs USING (s) GROUP BY 1, 2),
         |band AS (SELECT doc_id, sd // 4 AS band,
         |           array_agg(mh ORDER BY sd) AS bsig
         |         FROM sig GROUP BY 1, 2),
         |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |         FROM band a JOIN band b
         |           ON a.band = b.band AND a.bsig = b.bsig
         |          AND a.doc_id < b.doc_id),
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT c.id1, c.id2, count(*) AS i
         |          FROM cand c
         |          JOIN sh x ON x.doc_id = c.id1
         |          JOIN sh y ON y.doc_id = c.id2 AND y.s = x.s
         |          GROUP BY 1, 2),
         |j AS (SELECT CAST(COALESCE(i.i, 0) AS DOUBLE) /
         |        CAST(ca.n + cb.n - COALESCE(i.i, 0) AS DOUBLE) AS jac
         |      FROM cand c
         |      LEFT JOIN inter i ON i.id1 = c.id1 AND i.id2 = c.id2
         |      JOIN cnt ca ON ca.doc_id = c.id1
         |      JOIN cnt cb ON cb.doc_id = c.id2),
         |g AS (SELECT
         |    count(CASE WHEN jac >= 0.7 THEN 1 END) AS n7,
         |    count(CASE WHEN jac >= 0.8 THEN 1 END) AS n8,
         |    count(CASE WHEN jac >= 0.9 THEN 1 END) AS n9,
         |    count(*) AS nc
         |  FROM j)
         |SELECT CAST(0.7 AS DOUBLE) AS threshold, n7 AS n_pairs,
         |  nc AS n_candidates FROM g
         |UNION ALL SELECT CAST(0.8 AS DOUBLE), n8, nc FROM g
         |UNION ALL SELECT CAST(0.9 AS DOUBLE), n9, nc FROM g
         |ORDER BY threshold""".stripMargin,
    // the minhash band CTE chain restricted to batch x corpus candidates,
    // exact-Jaccard verified, plus the text-equality exact stage (md5
    // stands for text identity) and the verdict precedence
    "dedup_incremental_ingest" ->
      s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS L FROM documents),
         |sh AS (SELECT DISTINCT doc_id,
         |         L[i] || ' ' || L[i+1] || ' ' || L[i+2] AS s
         |       FROM tok,
         |         LATERAL (SELECT unnest(generate_series(1, len(L) - 2)) AS i) g),
         |hs AS (SELECT s, sd, ${XxhSql.expr("s", "sd")} AS h
         |       FROM (SELECT DISTINCT s FROM sh)
         |       CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS sd) k),
         |sig AS (SELECT doc_id, sd, min(h) AS mh
         |        FROM sh JOIN hs USING (s) GROUP BY 1, 2),
         |band AS (SELECT doc_id, sd // 4 AS band,
         |           array_agg(mh ORDER BY sd) AS bsig
         |         FROM sig GROUP BY 1, 2),
         |cand AS (SELECT DISTINCT b.doc_id AS new_id, a.doc_id AS old_id
         |         FROM band a JOIN band b
         |           ON a.band = b.band AND a.bsig = b.bsig
         |         WHERE b.doc_id % 10 = 7 AND a.doc_id % 10 <> 7),
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT c.new_id, c.old_id, count(*) AS i
         |          FROM cand c
         |          JOIN sh x ON x.doc_id = c.new_id
         |          JOIN sh y ON y.doc_id = c.old_id AND y.s = x.s
         |          GROUP BY 1, 2),
         |j AS (SELECT c.new_id, c.old_id,
         |        CAST(COALESCE(i.i, 0) AS DOUBLE) /
         |          CAST(ca.n + cb.n - COALESCE(i.i, 0) AS DOUBLE) AS jac
         |      FROM cand c
         |      LEFT JOIN inter i
         |        ON i.new_id = c.new_id AND i.old_id = c.old_id
         |      JOIN cnt ca ON ca.doc_id = c.new_id
         |      JOIN cnt cb ON cb.doc_id = c.old_id),
         |ex AS (SELECT DISTINCT b.doc_id FROM documents b
         |       JOIN documents o ON o.text = b.text AND o.doc_id % 10 <> 7
         |       WHERE b.doc_id % 10 = 7),
         |agg AS (SELECT d.doc_id,
         |    CAST(count(j.old_id) AS BIGINT) AS n_candidates,
         |    max(CASE WHEN j.jac >= 0.8 THEN j.jac END) AS best_near
         |  FROM documents d LEFT JOIN j ON j.new_id = d.doc_id
         |  WHERE d.doc_id % 10 = 7 GROUP BY 1)
         |SELECT a.doc_id,
         |  CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
         |       WHEN a.best_near IS NOT NULL THEN 'near_dup'
         |       ELSE 'new' END AS verdict,
         |  a.n_candidates, COALESCE(a.best_near, 0.0) AS best_jaccard
         |FROM agg a LEFT JOIN ex e ON e.doc_id = a.doc_id
         |ORDER BY a.doc_id""".stripMargin
  )
}
