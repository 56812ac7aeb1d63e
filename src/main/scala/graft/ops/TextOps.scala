package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — the pieces of a
  * large-scale training-data pipeline: token statistics, quality scoring,
  * heuristic language ID, document fingerprinting.
  *
  * All pure per-row expressions (whole-stage-codegen'd, no UDFs, no shuffle
  * except the final presentation sort) — at 100 TB these are embarrassingly
  * parallel map stages over the document scan.
  */
object TextOps {
  type Q = (SparkSession, String) => DataFrame

  /** Tokens of the whitespace-separated document text. */
  private def toks(c: Column): Column = split(c, " ")

  /** Pinned merge table for `text_bpe_encode`, in rank order: later
    * rules consume earlier outputs (t a → ta, ta b → tab, tab le →
    * table). Keys/values are space-separated symbol strings.
    */
  private val BpeMerges: Seq[(String, String)] = Seq(
    "t a" -> "ta", "ta b" -> "tab", "l e" -> "le", "tab le" -> "table",
    "a n" -> "an", "i n" -> "in", "e r" -> "er", "s c" -> "sc")

  private val stopwords = Seq("the", "a", "of", "and", "to", "in")

  /** BPE inference over one whitespace word: the pinned [[BpeMerges]]
    * applied in rank order as left-to-right rewrites over a
    * DOUBLED-separator symbol string (see `text_bpe_encode` for why the
    * doubling is what makes `replace` implement true merge semantics on
    * adjacent repeats); returns the token array. Separated so the spec
    * can pin the adjacency cases ('tata' → [ta, ta]).
    */
  def bpeEncode(word: Column): Column = bpeEncodeK(word, BpeMerges.size)

  /** [[bpeEncode]] under only the first `k` merge rules — the
    * vocabulary-size knob behind `text_bpe_compression_curve`.
    */
  def bpeEncodeK(word: Column, k: Int): Column = {
    val seq0 = concat(lit("  "), regexp_replace(word, "(.)", "$1  "))
    val chain = BpeMerges.take(k).foldLeft(seq0) { case (acc, (from, to)) =>
      call_function("replace", acc,
        lit(s" ${from.replace(" ", "  ")} "), lit(s" $to "))
    }
    filter(split(trim(chain), " "), t => t =!= "")
  }

  /** n-token shingles (contiguous token n-grams) of the text; empty array if
    * the document has fewer than n tokens. Single-pass kernel expression —
    * see [[graft.functions.WordShingles]].
    */
  def shingles(text: Column, n: Int): Column =
    graft.functions.functions.word_shingles(toks(text), n)

  def queries: Map[String, Q] = Map(
    // Token counting: whitespace tokens, a BPE-ish regex tokenization
    // (GPT-2-style pattern: letter runs / digit runs / punctuation runs,
    // leading space attached), and a bytes-per-token estimate.
    "text_tokens" -> { (s, d) =>
      val t = toks(col("text"))
      val bpeish = regexp_extract_all(col("text"),
        lit(" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"), lit(0))
      Tables(s, d).documents.select(
        col("doc_id"),
        size(t).as("n_tokens"),
        length(col("text")).as("n_chars_obs"),
        size(bpeish).as("n_bpeish"),
        aggregate(t, lit(0), (acc, x) => acc + ceil(length(x) / lit(4.0)).cast("int"))
          .as("n_subtokens"))
        .orderBy("doc_id")
    },
    // Skip-bigram co-occurrence association — the word2vec/GloVe corpus
    // statistic: count ordered token pairs within a ±2 window (distance-1
    // and distance-2 skip-grams), then score each surviving pair by the
    // observed/expected ratio n_ab·T / (n_a·n_b) — PMI without the log
    // (log is monotone, so the RANKING is identical, and dropping it
    // keeps the score ONE IEEE division of exact integers — ln is not
    // bit-portable across engines). The pair stream is built WITHOUT a
    // positions self-join: zip_with over two slices of the token array
    // emits each window pair in a codegen'd map (zero joins, zero
    // shuffles until the pair count), and the marginals derive from the
    // (much smaller) pair-count table itself, broadcast back. Support
    // ≥ 5 prunes the Poisson tail, top-30 bounds the output.
    // (n_ab·T overflows a long only past ~3·10^9 pairs per shard —
    // switch the score to DECIMAL(38,0) rationals at that scale.)
    "text_cooccurrence_assoc" -> { (s, d) =>
      cooccurrenceAssocFrom(Tables(s, d).documents, minSupport = 5, k = 30)
    },
    // Skip-gram training-pair generation (word2vec/GloVe data prep):
    // every (center, context) pair within a ±2 token window, counted
    // corpus-wide, top-30. The scale shape is the point: pairs are
    // built ARRAY-LOCALLY per document (slice + arrays_zip at offsets
    // 1 and 2, then both orientations) — zero joins, zero extra
    // shuffles; the only shuffle is the final pair count's
    // partial+final aggregate. The positional self-join formulation
    // the oracle uses would shuffle the token stream twice and skew on
    // hot documents at 100 TB.
    "text_skipgrams" -> { (s, d) =>
      val t = toks(col("text"))
      val n = size(t)
      def fwd(o: Int) =
        arrays_zip(slice(t, lit(1), greatest(n - lit(o), lit(0))),
          slice(t, lit(o + 1), greatest(n - lit(o), lit(0))))
      Tables(s, d).documents
        .select(explode(concat(fwd(1), fwd(2))).as("p"))
        .select(explode(array(
          struct(col("p.0").as("center"), col("p.1").as("ctx")),
          struct(col("p.1").as("center"), col("p.0").as("ctx")))).as("q"))
        .select(col("q.center"), col("q.ctx"))
        .groupBy("center", "ctx").agg(count(lit(1)).as("n_pairs"))
        .orderBy(desc("n_pairs"), col("center"), col("ctx"))
        .limit(30)
    },
    // Quality scoring: stopword ratio, mean token length, type-token ratio.
    "text_quality" -> { (s, d) =>
      val t = toks(col("text"))
      val nTok = size(t)
      val nStop = size(filter(t, x => x.isin(stopwords: _*)))
      val nUniq = size(array_distinct(t))
      // mean token len = (chars - spaces) / tokens, exact integer inputs
      val meanLen = (length(col("text")) - (nTok - lit(1))).cast("double") /
        nTok.cast("double")
      Tables(s, d).documents.select(
        col("doc_id"),
        nTok.as("n_tokens"),
        (nStop.cast("double") / nTok.cast("double")).as("stopword_ratio"),
        (nUniq.cast("double") / nTok.cast("double")).as("type_token_ratio"),
        meanLen.as("mean_token_len"))
        .orderBy("doc_id")
    },
    // Term BURSTINESS (Church & Gale): function words spread evenly
    // across documents, content words clump — the variance-to-mean ratio
    // of per-document counts over the documents CONTAINING the term
    // separates them, which is a real curation feature (burstiness-
    // weighted vocabularies beat raw df for topic keys). Exact integer
    // sufficient statistics per term (df, Σc, Σc²) folded into
    //   mean = Σc/df,  VMR = (df·Σc² − (Σc)²) / (df·Σc)
    // — cross products in DECIMAL(38,0) (df·Σc² outgrows int64 at corpus
    // scale), ONE IEEE division each. Top-20 by (df DESC, term ASC)
    // keeps the output fixed-size; the term stream is one explode +
    // partial+final aggregate.
    "text_burstiness" -> { (s, d) =>
      val perDoc = Tables(s, d).documents
        .select(col("doc_id"), explode(toks(col("text"))).as("term"))
        .groupBy("term", "doc_id").agg(count(lit(1)).as("c"))
      val dec = (c: Column) => c.cast("decimal(38,0)")
      perDoc.groupBy("term")
        .agg(count(lit(1)).as("df"), sum(col("c")).as("cf"),
          sum(col("c") * col("c")).as("cf2"))
        .select(col("term"), col("df"), col("cf"),
          (col("cf").cast("double") / col("df").cast("double"))
            .as("mean_per_doc"),
          ((dec(col("df")) * dec(col("cf2")) -
            dec(col("cf")) * dec(col("cf"))).cast("double") /
            (dec(col("df")) * dec(col("cf"))).cast("double")).as("vmr"))
        .orderBy(col("df").desc, col("term").asc)
        .limit(20)
    },
    // Readability panel (Flesch reading ease + Flesch-Kincaid grade):
    // the published formulas over exact-integer counts — words (the
    // shared tokenizer), syllables (vowel-run count [aeiouy]+, the
    // standard heuristic), and sentences. The corpus carries no sentence
    // punctuation (verified), so sentences fall back to fixed 16-word
    // segments — ceil(words/16), the documented degradation; a punctuated
    // corpus would count [.!?] runs instead. Both scores are one pinned
    // IEEE tree over the integer counts (literal constants exponent-form
    // in the oracle so DuckDB parses them as DOUBLE — the LnTable
    // lesson). Pure map stage, zero shuffles beyond the presentation
    // sort.
    "text_readability" -> { (s, d) =>
      val w = size(toks(col("text"))).cast("long")
      Tables(s, d).documents
        .select(col("doc_id"), w.as("n_words"),
          regexp_count(lower(col("text")), lit("[aeiouy]+"))
            .cast("long").as("n_syllables"))
        .withColumn("n_sentences", expr("(n_words + 15) div 16"))
        .select(col("doc_id"), col("n_words"), col("n_sentences"),
          col("n_syllables"),
          (lit(206.835) -
            lit(1.015) * (col("n_words").cast("double") /
              col("n_sentences").cast("double")) -
            lit(84.6) * (col("n_syllables").cast("double") /
              col("n_words").cast("double"))).as("flesch_ease"),
          (lit(0.39) * (col("n_words").cast("double") /
            col("n_sentences").cast("double")) +
            lit(11.8) * (col("n_syllables").cast("double") /
              col("n_words").cast("double")) -
            lit(15.59)).as("fk_grade"))
        .orderBy("doc_id")
    },
    // Heuristic language ID: score candidate languages by marker-token hit
    // counts (an n-gram-profile scorer degenerated to unigram markers — the
    // corpus vocabulary is synthetic); deterministic argmax with fixed
    // preference order on ties.
    "text_lang_id" -> { (s, d) =>
      val t = toks(col("text"))
      def score(markers: Seq[String]): Column =
        size(filter(t, x => x.isin(markers: _*)))
      val sEn = score(Seq("the", "a", "fast", "slow"))
      val sQl = score(Seq("query", "table", "scan", "filter"))
      val sDf = score(Seq("data", "stream", "batch", "window"))
      val pred = when(sEn >= sQl && sEn >= sDf, lit("en"))
        .when(sQl >= sDf, lit("ql"))
        .otherwise(lit("df"))
      Tables(s, d).documents.select(
        col("doc_id"), col("lang"),
        sEn.as("score_en"), sQl.as("score_ql"), sDf.as("score_df"),
        pred.as("pred_lang"))
        .orderBy("doc_id")
    },
    // Classifier-eval confusion matrix for the lang-id heuristic against
    // the stored ground-truth label — the eval artifact any labeling
    // heuristic ships with (text_lang_id reports predictions; this
    // reports HOW WRONG they are, per class). Cells are exact counts;
    // frac_of_true (the per-true-class recall row profile) divides each
    // cell by its row total over the |langs|²-sized cell table — the
    // corpus collapses in one aggregate, the window runs on metadata.
    // The marker predictor scores poorly against the real labels on this
    // corpus (markers are synthetic-domain unigrams) — honest readout;
    // the EVAL machinery, not the toy predictor, is the operator.
    "text_langid_confusion" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val t = toks(col("text"))
      def score(markers: Seq[String]): Column =
        size(filter(t, x => x.isin(markers: _*)))
      val sEn = score(Seq("the", "a", "fast", "slow"))
      val sQl = score(Seq("query", "table", "scan", "filter"))
      val sDf = score(Seq("data", "stream", "batch", "window"))
      val pred = when(sEn >= sQl && sEn >= sDf, lit("en"))
        .when(sQl >= sDf, lit("ql"))
        .otherwise(lit("df"))
      val w = Window.partitionBy("true_lang")
      Tables(s, d).documents
        .select(col("lang").as("true_lang"), pred.as("pred_lang"))
        .groupBy("true_lang", "pred_lang")
        .agg(count(lit(1)).as("n"))
        .withColumn("frac_of_true",
          col("n").cast("double") / sum(col("n")).over(w).cast("double"))
        .orderBy("true_lang", "pred_lang")
    },
    // Rolling-hash winnowing fingerprints (k=16 bytes, window 8): the
    // MOSS-style scheme — any shared >=23-byte substring yields a shared
    // fingerprint. The base-257 mod-2^64 rolling hash and the window minima
    // are replicated in the DuckDB oracle (HUGEINT arithmetic + window
    // min); FunctionsSpec pins overlap behavior on planted near-dups.
    "text_winnow" -> { (s, d) =>
      import graft.functions.functions.winnow_fingerprints
      Tables(s, d).documents
        .select(col("doc_id"),
          winnow_fingerprints(col("text"), 16, 8).as("fps"))
        .select(col("doc_id"), size(col("fps")).as("n_fp"),
          // try_element_at: texts shorter than k yield an empty fingerprint
          // array — NULL min, not an ANSI index error
          try_element_at(col("fps"), lit(1)).as("fp_min"))
        .orderBy("doc_id")
    },
    // Shared-fingerprint pair detection — what the winnowing fingerprints
    // are FOR (Schleimer et al. 2003, MOSS): any two documents sharing a
    // >=23-byte substring share a fingerprint, so the pair join over the
    // fingerprint index IS the plagiarism/quote detector. df-capped
    // (fingerprints in > 50 docs are boilerplate "stop-fingerprints" —
    // the same hot-key discipline as the PPJoin df-cap), pairs require
    // >= 2 shared prints (one can be chance), top-20 by shared count.
    // Scale: the join is an equi-join on the fingerprint value over the
    // df-capped index — bounded fan-out per key, never all-pairs.
    "text_winnow_pairs" -> { (s, d) =>
      import graft.functions.functions.winnow_fingerprints
      val fp = Tables(s, d).documents
        .select(col("doc_id"),
          explode(winnow_fingerprints(col("text"), 16, 8)).as("m"))
        .persist()
      val dfq = fp.groupBy("m").agg(count(lit(1)).as("df"))
      val f2 = fp.join(dfq, "m").filter(col("df") <= 50)
        .select("doc_id", "m")
      f2.as("a").join(f2.as("b"),
          col("a.m") === col("b.m") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 2)
        .orderBy(col("n_shared").desc, col("id1").asc, col("id2").asc)
        .limit(20)
    },
    // Document fingerprinting: full-content hash + winnowing-style minimum
    // shingle hash (stable under local edits away from the minimum).
    "text_fingerprint" -> { (s, d) =>
      Tables(s, d).documents.select(
        col("doc_id"),
        md5(col("text")).as("content_hash"),
        array_min(transform(shingles(col("text"), 5), x => md5(x)))
          .as("min_shingle_hash"))
        .orderBy("doc_id")
    },
    // Unigram-LM rarity scoring: each document scored by the corpus-wide
    // frequency of its tokens — mean token corpus-frequency (common-text
    // detector) and the fraction of below-mean-frequency tokens (rare-text
    // detector; "rare" = cf·V < N, exact integer compare against the mean
    // frequency N/V — no division). This is the vocab-join pipeline shape:
    // explode → groupBy(token) builds the LM, then tokens re-join their
    // corpus counts and re-group per document. Scale: three token-volume
    // shuffles (count, join, regroup); the corpus totals ride a broadcast
    // single-row aggregate, and AQE broadcasts the vocab side when it fits.
    "text_rarity" -> { (s, d) => rarityFrom(Tables(s, d).documents) },
    // PII-style scrubbing: redact email addresses and a denylist of
    // sensitive terms, reporting per-document hit counts and the hash of
    // the scrubbed text. Pure per-row regex map stage (codegen'd, zero
    // shuffles beyond the presentation sort) — the redaction pass a
    // training pipeline runs over every document at 100 TB. The regex
    // subset used (\b, alternation, classes) behaves identically in Java
    // regex and DuckDB's RE2, so the oracle replays the exact scrub.
    "text_pii_scrub" -> { (s, d) => scrubFrom(Tables(s, d).documents) },
    // Repetition-based quality signals (the Gopher-rules family): the share
    // of tokens taken by the single most frequent token, and the fraction
    // of duplicated token bigrams. Highly repetitive machine-generated text
    // scores high on both. top_token_count is a per-row codegen'd hash-map
    // kernel — the explode + groupBy(doc, token) formulation would shuffle
    // N×tokens rows; this stays a map stage over the scan.
    "text_repetition" -> { (s, d) =>
      val base = Tables(s, d).documents
        .select(col("doc_id"), toks(col("text")).as("t"))
      val bigrams = graft.functions.functions.word_shingles(col("t"), 2)
      base.select(
          col("doc_id"), size(col("t")).as("n_tokens"),
          graft.functions.functions.top_token_count(col("t"))
            .as("top_tok_cnt"),
          size(bigrams).as("n_bigrams"),
          size(array_distinct(bigrams)).as("n_distinct_bigrams"))
        .select(col("doc_id"), col("n_tokens"), col("top_tok_cnt"),
          (col("top_tok_cnt").cast("double") /
            col("n_tokens").cast("double")).as("top_tok_share"),
          when(col("n_bigrams") === 0, lit(0.0))
            .otherwise(lit(1.0) - col("n_distinct_bigrams").cast("double") /
              col("n_bigrams").cast("double")).as("dup_bigram_frac"))
        .orderBy("doc_id")
    },
    // Per-document top-3 tf-idf terms (keyword extraction / topic
    // signature). idf here is the raw N/df ratio — the ranking is identical
    // to log-idf (log is monotone) but stays in exact integer-derived
    // arithmetic, so the oracle matches bit-for-bit without trusting libm.
    // Scale shape: tf aggregates on (doc, token) — one shuffle of the
    // exploded stream's PARTIAL counts; df aggregates over the (much
    // smaller) tf table; the corpus size is a 1-row broadcast; the top-3 is
    // a rank-limit window (WindowGroupLimit: per-partition top-k before the
    // doc_id shuffle, never a full sort of the scored stream).
    "text_tfidf_topk" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables(s, d).documents
      val tf = docs
        .select(col("doc_id"), explode(toks(col("text"))).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val score = (col("tf") * col("n_docs")).cast("double") / col("df")
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("tok").asc)
      tf.join(df, "tok")
        .crossJoin(broadcast(n))
        .withColumn("score", score)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("doc_id", "tok", "score", "rn")
        .orderBy("doc_id", "rn")
    },
    // Corpus bigram-LM familiarity scoring — the exact-arithmetic core of
    // CC-net-style perplexity bucketing: train a bigram model ON the corpus
    // (one groupBy over the exploded bigrams), score every document by how
    // familiar its transitions are under that model, and bucket documents
    // into quality quintiles. All per-doc statistics are INTEGER sums of
    // corpus bigram counts (no log-space floats — ln() is not
    // bit-portable across engines), so the gate checks the full train →
    // score → bucket pipeline exactly. Scale: bigram explode + count is
    // one shuffle on the bigram key; the scoring join reuses that same
    // hash partitioning (exchange reuse); the per-doc re-agg shuffles on
    // doc_id. The quintile ntile is a single-partition window over one row
    // per DOCUMENT (already reduced) — at 100 TB you'd swap it for bucket
    // thresholds computed via the data_winsorize rank trick and a
    // broadcast compare, same semantics.
    "text_lm_familiarity" -> { (s, d) =>
      lmFamiliarityFrom(Tables(s, d).documents)
    },
    // Token frequency-distribution stats per document: token count, type
    // count, the MODAL token (ties broken lexicographically) with its
    // count, and the exact Simpson collision sum Σ c·(c−1) — the integer
    // numerator of the repeated-token probability, the log-free
    // repetitiveness signal (text_quality's type-token ratio sees only
    // distinctness; this sees the shape of the frequency curve). Two
    // shuffles: (doc_id, tok) counting, then the per-doc rollup; the
    // modal token collapses map-side as a (count, reversed-tok) max
    // struct, never a sort.
    "text_token_dist" -> { (s, d) =>
      tokenDistFrom(Tables(s, d).documents)
    },
    // Cross-document n-gram novelty: the fraction of a document's
    // DISTINCT 3-grams not seen in any earlier document (doc_id order =
    // corpus arrival order) — the shard-novelty/diversity readout a
    // curation pipeline tracks as it appends shards. First-occurrence
    // attribution: one shuffle keys (doc, gram) for the distinct, the
    // gram-wise min(doc_id) reuses that gram partitioning (exchange
    // reuse), the join back is gram-co-located, and only the final
    // per-doc rollup reshuffles. Counts are exact integers; the ratio
    // divides two of them.
    "text_ngram_novelty" -> { (s, d) =>
      ngramNoveltyFrom(Tables(s, d).documents)
    },
    // BPE tokenizer training, step 1 (Sennrich et al. 2016,
    // arXiv:1508.07909): corpus-weighted adjacent-symbol pair counts.
    // The classic trainer trick is what makes this scale: pairs are
    // counted over the word VOCABULARY weighted by word frequency, not
    // over the raw token stream — at 100 TB the vocab is ~10^6 rows
    // while the corpus is ~10^11 tokens, so the quadratic-ish pair
    // stage runs on a frame five orders smaller than the scan. Shape:
    // one shuffle to build the vocab (map-side combine on the word),
    // a fan-out over vocab rows only, one partial+final pair count,
    // and a TakeOrdered top-k. All weights are exact integers.
    "text_bpe_pairs" -> { (s, d) =>
      bpeTopPairs(charVocab(Tables(s, d).documents), 20)
    },
    // BPE training, one FULL merge step: find the argmax pair (weight
    // desc, then lexicographic — fully deterministic), merge it into a
    // single symbol everywhere under BPE's greedy LEFT-TO-RIGHT
    // non-overlap rule, and recount pairs over the merged vocabulary.
    // Post-merge counts prove the merge applied: the winning pair
    // vanishes and new pairs containing the merged symbol appear.
    // Greedy-overlap resolution (a run 'a a a a' under pair (a,a) must
    // become [aa, aa], never [aa, a, aa]) is pure position arithmetic —
    // mark matching positions, split marks into consecutive runs, keep
    // the odd offsets within each run — NOT a string replace(), whose
    // scan-resume point gets the shared-separator case wrong in both
    // engines. The argmax pair is a 1-row broadcast, never a driver
    // round-trip.
    "text_bpe_merge" -> { (s, d) =>
      bpeMergeStep(charVocab(Tables(s, d).documents), 10)
    },
    // BPE tokenizer APPLY: encode the corpus with a pinned 8-rule merge
    // table (the inference-time half of the trainer above — a production
    // run feeds the learned ranks in; a pinned table keeps the oracle
    // byte-exact). Each word becomes a symbol sequence with DOUBLED
    // space separators and the ranked merges apply in order as
    // left-to-right string rewrites. The doubling is what makes
    // `replace` implement true BPE merge semantics: a single-space
    // encoding loses adjacent repeats (' t a t a ' merges only the
    // first 't a' because the match consumes the shared separator
    // before scan-resume), while with two spaces per boundary each
    // match consumes one space from each side and leaves the
    // neighbouring occurrence's separator intact — so ' t a t a '
    // correctly becomes [ta, ta]. `replace` scan-resume semantics are
    // IDENTICAL in Spark (UTF8String.replace) and DuckDB, which is the
    // parity contract; chained merges (t a→ta, ta b→tab, tab le→table)
    // exercise the iterative-application path. Scale shape: encode is
    // ONE codegen'd map stage over the token stream (zero shuffles
    // until the final token count), exactly how a tokenizer runs over
    // 100 TB; top-30 is a partial+final count into TakeOrdered.
    "text_bpe_encode" -> { (s, d) =>
      Tables(s, d).documents
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .select(explode(bpeEncode(col("word"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token").asc)
        .limit(30)
    },
    // CCNet-style quality buckets (Wenzek et al. 2020: corpora split
    // into head/middle/tail by per-language score terciles before
    // mixing): docs score by type-token ratio, and the tercile CUTS are
    // derived per language from the (lang, score) COUNT table — the
    // score is a ratio of two small ints, so its value space is tiny
    // and the cumulative window runs over that counts table, never the
    // corpus (the same two-pass shape as agg_quantile_hist; a naive
    // per-lang ntile window would drag every document of a language
    // into one partition). Threshold semantics: ties at a cut share a
    // bucket — deterministic, and exactly how CCNet applies its
    // perplexity cutoffs. Cuts broadcast back; output is
    // langs×3 rows.
    "text_quality_buckets" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val t = toks(col("text"))
      val docs = Tables(s, d).documents
        .select(col("doc_id"), col("lang"), col("n_chars"),
          (size(array_distinct(t)).cast("double") /
            size(t).cast("double")).as("score"))
      val counts = docs.groupBy("lang", "score").agg(count(lit(1)).as("c"))
      val wc = Window.partitionBy("lang").orderBy(col("score").desc)
      val wt = Window.partitionBy("lang")
      val cuts = counts
        .withColumn("cum", sum(col("c")).over(wc))
        .withColumn("n", sum(col("c")).over(wt))
        .groupBy("lang")
        .agg(max(when(col("cum") * 3 >= col("n"), col("score"))).as("c1"),
          max(when(col("cum") * 3 >= col("n") * 2, col("score"))).as("c2"))
      docs.join(broadcast(cuts), Seq("lang"))
        .withColumn("bucket",
          when(col("score") >= col("c1"), lit("head"))
            .when(col("score") >= col("c2"), lit("middle"))
            .otherwise(lit("tail")))
        .groupBy("lang", "bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          min(col("score")).as("min_score"),
          max(col("score")).as("max_score"))
        .orderBy("lang", "bucket")
    },
    // Spelling-variant candidates against a curated dictionary — the
    // fuzzy-match shape that scales: corpus text collapses to its VOCAB
    // (map-side-combined word counts — at 100 TB the vocab is ~10^6 rows
    // while the corpus is ~10^11 tokens), the dictionary (here top-10 by
    // frequency; production feeds a curated lexicon) BROADCASTS under
    // it, the O(1) length band rejects most candidates before any
    // distance work, and the survivor pairs verify with the banded
    // O(k·n) [[graft.functions.LevenshteinWithin]] codegen kernel —
    // never the built-in O(n·m) full matrix, which wastes the whole
    // band the threshold can never accept.
    "text_spell_candidates" -> { (s, d) =>
      import graft.functions.functions.levenshtein_within
      val words = Tables(s, d).documents
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word").agg(count(lit(1)).as("n"))
      val dict = words.orderBy(col("n").desc, col("word").asc).limit(10)
        .select(col("word").as("dict_word"))
      words.join(broadcast(dict),
          abs(length(col("word")) - length(col("dict_word"))) <= 2 &&
            col("word") =!= col("dict_word"))
        .withColumn("dist",
          levenshtein_within(col("word"), col("dict_word"), 2))
        .filter(col("dist") <= 2)
        .select(col("word"), col("n"), col("dict_word"), col("dist"))
        .orderBy("word", "dict_word")
    },
    // Tokenizer encode→decode roundtrip gate — the invariant every BPE
    // implementation must hold: concatenating a word's tokens
    // reconstructs the word exactly (merges only ever JOIN adjacent
    // symbols; any separator-handling bug — like the shared-separator
    // loss the doubled-space encoding exists to prevent — breaks this
    // loudly as n_ok < n_words). Pure map stage + language rollup.
    "text_bpe_roundtrip" -> { (s, d) =>
      Tables(s, d).documents
        .select(col("lang"), explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .select(col("lang"), col("word"),
          concat_ws("", bpeEncode(col("word"))).as("rt"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_words"),
          count(when(col("rt") === col("word"), 1)).as("n_ok"))
        .orderBy("lang")
    },
    // Tokenizer vocabulary coverage — the fertility/compression readout
    // every tokenizer change is judged by before a retrain: per language,
    // word and token counts under the pinned merge table, how many
    // emitted tokens are MERGED symbols (vs single-character fallbacks —
    // the OOV-ish residue), and chars-per-token (the compression ratio
    // that prices a 100 TB corpus in tokens). One codegen'd map stage
    // (the same bpeEncode chain as text_bpe_encode) into a
    // language-keyed partial+final aggregate; the double division happens
    // once per language row.
    "text_vocab_coverage" -> { (s, d) =>
      Tables(s, d).documents
        .select(col("lang"), explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .select(col("lang"), length(col("word")).as("nc"),
          bpeEncode(col("word")).as("toks"))
        .select(col("lang"), col("nc"), size(col("toks")).as("nt"),
          size(filter(col("toks"), t => length(t) > 1)).as("nm"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_words"),
          sum(col("nc")).as("n_chars"),
          sum(col("nt")).as("n_tokens"),
          sum(col("nm")).as("n_merged"))
        .select(col("lang"), col("n_words"), col("n_tokens"),
          col("n_merged"),
          (col("n_chars").cast("double") / col("n_tokens"))
            .as("chars_per_token"))
        .orderBy("lang")
    },
    // Segment-level (CCNet-style "paragraph") dedup: chunk every document
    // into non-overlapping 3-word segments, keep each distinct segment's
    // FIRST occurrence corpus-wide (first = lowest (doc_id, seg_id)), and
    // reassemble each document from its surviving segments. This is the
    // within-and-across-document boilerplate/quote scrub a pretraining
    // pipeline runs after document-level dedup: document-level hashing
    // (dedup_exact) misses the copied paragraph inside an otherwise-new
    // page. Scale shape: segment construction is a pure map stage; the
    // keeper table is a map-side-combined min aggregate (one row per
    // DISTINCT segment — far smaller than the instance stream); the
    // instance⋈keeper equi-join on segment text is AQE-skew-splittable
    // (a window over segtext would pin each hot segment's instances to
    // one partition with no split available); reassembly is one shuffle
    // on doc_id.
    "text_segment_dedup" -> { (s, d) =>
      segmentDedupFrom(Tables(s, d).documents)
    },
    // Boilerplate scrub: a segment that appears in >= 3 DISTINCT documents
    // is boilerplate (header/footer/licence text) and is removed from
    // EVERY document, first occurrence included — the complement of
    // text_segment_dedup's keep-first rule, and the rule CCNet actually
    // applies to over-shared paragraphs. Same scale shape; the distinct-doc
    // count is a two-phase countDistinct over (segtext, doc_id) pairs.
    "text_boilerplate_scrub" -> { (s, d) =>
      boilerplateScrubFrom(Tables(s, d).documents, minDocs = 3)
    },
    // Exact φ-heavy hitters (φ = 1/200 of the token stream) by the
    // two-pass sketch-then-verify plan — the only exact formulation that
    // scales: a single-pass exact count would shuffle the ENTIRE vocab
    // (billions of grams at 100 TB) to answer a question about ~dozens
    // of tokens. Pass 1 is a zero-shuffle map-side Misra–Gries summary
    // (k=1000 counters per partial, tokens consumed inside the aggregate
    // — no explode), whose candidate set provably contains every token
    // with frequency > n/1001 ⊇ all φ-heavy hitters; the total token
    // count rides the same aggregate. Pass 2 exact-counts ONLY the ≤1000
    // candidates via a broadcast semi-join — the groupBy shuffles
    // candidate tokens alone, vocab never moves. The φ cut is the
    // all-integer `cnt · 200 > n`: no doubles anywhere.
    "text_heavy_hitters" -> { (s, d) =>
      import graft.functions.aggregates.misra_gries_tokens
      val docs = Tables(s, d).documents.select(toks(col("text")).as("tk"))
      val summary = docs.agg(
        misra_gries_tokens(col("tk"), 1000).as("cand"),
        sum(size(col("tk"))).cast("long").as("n"))
      val cand = summary
        .select(explode(col("cand")).as("token"), col("n"))
      docs.select(explode(col("tk")).as("token"))
        .join(broadcast(cand), "token")
        .groupBy("token", "n").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * 200 > col("n"))
        .select("token", "cnt")
        .orderBy("token")
    },
    // Shannon entropy of the character and token distributions — the
    // compression-based quality signal (low char entropy ⇒ repetitive /
    // boilerplate text; token entropy is the unigram "information density"
    // used alongside the Gopher repetition cuts). Pure per-row map stage:
    // counts come from the row's own arrays (≤25 distinct chars here), no
    // shuffle, embarrassingly parallel at 100 TB.
    //
    // BIT-PARITY DESIGN: H = (N·ln N − Σ c·ln c) / (N·ln 2) keeps every
    // log ARGUMENT an integer count — but runtime ln still can't cross
    // engines: Spark's `log` is StrictMath (fdlibm) while DuckDB's is
    // libm, and they differ by 1 ulp already at ln(3) (117 integers
    // below 10⁴ disagree; measured). So NO runtime log at all: both
    // sides index the SAME ln(1..1024) literal table ([[lnTable]] here,
    // rendered digit-for-digit into the oracle SQL — shortest-roundtrip
    // doubles parse back to identical bits). The fold then runs in
    // sorted char/token order on both sides (array_sort / list_sort);
    // Spark's 0.0 init is an IEEE no-op, so the sums associate
    // identically and every node of the tree is bit-equal. Documents
    // longer than 1024 chars fail loudly (ANSI element_at), not wrongly.
    "text_entropy" -> { (s, d) => entropyFrom(Tables(s, d).documents) },
    // Per-language distinctive vocabulary (keyness) — the corpus-linguist
    // readout behind language-balance debugging: rank each language's
    // tokens by the PMI-style lift P(token|lang)/P(token) =
    // (c_lt·N)/(c_t·c_l), support-thresholded. ONE tokenize+count
    // shuffle builds the (lang, token) class table; the three marginals
    // are window sums OVER THAT class-sized table (no second corpus
    // scan), and top-k per language is a rank pushdown
    // (WindowGroupLimit), never a global sort. The lift is a single IEEE
    // division of exact integer products (≤ N² < 2⁵³ — exact in double),
    // so the ranking is bit-identical across engines.
    "text_keyness" -> { (s, d) =>
      keynessFrom(Tables(s, d).documents, minCount = 5L, k = 10)
    },
    // BM25 ranked retrieval for a fixed two-term query — the length-
    // normalized, saturating relevance score tf-idf lacks (tf-idf grows
    // linearly with tf and ignores document length; BM25's k1 saturation
    // and b normalization are why it is the default first-stage ranker).
    // RATIONAL-IDF variant: idf = (N−df+0.5)/(df+0.5) instead of its
    // logarithm — ln() is not bit-portable across engines (the lnTable
    // trick caps at 1024 < df here), and for a FIXED query the monotone
    // ln changes neither per-term ordering nor saturation behavior; the
    // per-document sum over the two terms is pinned to one IEEE order by
    // PIVOTING the terms into columns (s1 + s2), never a float SUM whose
    // association the engine chooses. Everything upstream is exact
    // integers (tf, df, dl, N, Σdl). Scale shape: the posting filter
    // runs BEFORE the shuffle, so only the two query terms' postings
    // move; dl is a map-side projection joined on doc_id; df and the
    // corpus stats are broadcast scalars.
    "text_bm25" -> { (s, d) =>
      bm25From(Tables(s, d).documents, "hash", "join", k = 20)
    },
    // Positional inverted-index phrase search: exact "hash join"
    // adjacency matches via a self-join of the two terms' POSITIONAL
    // posting lists on (doc_id, pos+1) — the operator behind quoted-
    // phrase queries in a search engine, and the adjacency primitive
    // n-gram novelty/dedup don't expose. The posting lists are built
    // with the term filter BEFORE the shuffle (only 'hash'/'join'
    // positions leave the scan), the adjacency join is equi on
    // (doc_id, pos) — linear in posting size, never all-pairs — and the
    // per-doc rollup reuses the same doc_id partitioning.
    "text_phrase_search" -> { (s, d) =>
      phraseSearchFrom(Tables(s, d).documents, "hash", "join")
    },
    // Tokenizer compression curve — the vocabulary-size tradeoff every
    // tokenizer training run plots (Gage 1994 BPE; the curve is why
    // vocabularies stop at 32k/50k: marginal merges buy less compression):
    // corpus token count and chars-per-token under merge-table prefixes
    // of 0, 2, 4 and 8 rules. ONE corpus pass computes all four encodings
    // per word (four codegen'd replace chains side by side — no second
    // scan per point), one partial+final aggregate, a 4-row stack. The
    // division is one IEEE op per row.
    "text_bpe_compression_curve" -> { (s, d) =>
      val ks = Seq(0, 2, 4, 8)
      val words = Tables(s, d).documents
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
      val aggs = ks.map(k =>
        sum(size(bpeEncodeK(col("word"), k)).cast("long")).as(s"t_$k")) ++
        Seq(sum(length(col("word")).cast("long")).as("nc"),
          count(lit(1)).as("nw"))
      val a = words.agg(aggs.head, aggs.tail: _*)
      val stackArgs = ks.map(k => s"$k, t_$k").mkString(", ")
      a.selectExpr(s"stack(${ks.size}, $stackArgs) AS (n_merges, n_tokens)",
          "nc", "nw")
        .select(col("n_merges"), col("nw").as("n_words"), col("n_tokens"),
          (col("nc").cast("double") / col("n_tokens").cast("double"))
            .as("chars_per_token"))
        .orderBy("n_merges")
    },
    // Character-trigram PROFILES per language — the statistic real
    // language identifiers (TextCat, CLD) are built from: the top-5
    // trigrams by frequency per language, with their in-language share.
    // text_lang_id consumes a hand-pinned marker table; this query BUILDS
    // the profile from data — the training half of that detector. One
    // explode (per-position substring over a sequence — the shingle
    // machinery's shape), a (lang, gram) partial+final count, and a
    // WindowGroupLimit top-5 per lang; share is one IEEE division of
    // exact counts.
    "text_char_trigrams" -> { (s, d) =>
      val g2 = Tables(s, d).documents
        .filter(length(col("text")) >= 3)
        .select(col("lang"), expr(
          "explode(transform(sequence(1, length(text) - 2), " +
            "i -> substring(text, i, 3)))").as("g"))
      val counts = g2.groupBy("lang", "g").agg(count(lit(1)).as("n"))
      val tot = counts.groupBy("lang").agg(sum(col("n")).as("n_lang"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("lang")
        .orderBy(col("n").desc, col("g").asc)
      counts.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .join(tot, "lang")
        .select(col("lang"), col("rk"), col("g"), col("n"),
          (col("n").cast("double") / col("n_lang").cast("double"))
            .as("share"))
        .orderBy("lang", "rk")
    },
    // Tokenizer FERTILITY by language — the standard multilingual
    // tokenizer eval (tokens emitted per word; SentencePiece/HF report
    // exactly this): a vocabulary trained on one language family inflates
    // token counts (and training cost) for the others, and the per-lang
    // fertility table is the evidence. Full pinned merge table, per-lang
    // exact integer sums, two IEEE divisions (fertility, chars/token).
    // Same one-scan explode + partial+final aggregate as the compression
    // curve — lang just joins the group key.
    "text_bpe_fertility" -> { (s, d) =>
      Tables(s, d).documents
        .select(col("lang"), explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_words"),
          sum(size(bpeEncode(col("word"))).cast("long")).as("n_tokens"),
          sum(length(col("word")).cast("long")).as("n_chars"))
        .select(col("lang"), col("n_words"), col("n_tokens"),
          (col("n_tokens").cast("double") / col("n_words").cast("double"))
            .as("fertility"),
          (col("n_chars").cast("double") / col("n_tokens").cast("double"))
            .as("chars_per_token"))
        .orderBy("lang")
    },
    // Gopher-style quality rule panel (Rae et al. 2021, arXiv:2112.11446,
    // Table A1 — the published heuristic suite behind MassiveText, and the
    // de-facto default first filter of every open pretraining corpus
    // since): per document, the word-count bounds, mean-word-length
    // bounds, minimum stopword count, and the top-2/3/4-gram character-
    // mass caps (the repetition rules, thresholds 0.20/0.18/0.16 as
    // published; the word-count bounds are corpus-adapted to [20, 90] so
    // both verdicts exist at this synthetic length distribution). EVERY
    // verdict is an exact-integer cross-multiplication (mass·5 > chars,
    // never mass/chars > 0.2) — the readout fractions are single IEEE
    // divisions of those same integers, identical trees on both engines.
    // Zero shuffle: each top-gram mass folds over the doc's OWN sorted
    // shingle array (array_sort + one codegen'd aggregate pass — run-
    // length max over the sorted runs), so the whole panel is a pure map
    // stage, embarrassingly parallel over the 100 TB scan.
    "text_gopher_quality" -> { (s, d) =>
      val f = gopherFlagsFrom(Tables(s, d).documents)
      f.select(
        col("doc_id"), col("n_words"), col("n_stop"),
        (col("sum_wlen").cast("double") / col("n_words").cast("double"))
          .as("mean_word_len"),
        (col("mass2").cast("double") / col("chars").cast("double"))
          .as("top2_frac"),
        (col("mass3").cast("double") / col("chars").cast("double"))
          .as("top3_frac"),
        (col("mass4").cast("double") / col("chars").cast("double"))
          .as("top4_frac"),
        (!(col("f_words") || col("f_mwl") || col("f_stop") ||
          col("f_top2") || col("f_top3") || col("f_top4"))).as("keep"))
        .orderBy("doc_id")
    },
    // Rule-attribution waterfall over the Gopher panel — the filter-audit
    // readout a corpus curator reads BEFORE shipping thresholds: per rule
    // (in the pinned application order), how many documents fail it, how
    // many fail ONLY it (the rule's unique contribution — dropping the
    // rule recovers exactly these), and how many documents survive the
    // rules applied so far (the cumulative funnel). One partial+final
    // aggregate over the corpus (18 conditional counts ride a single
    // pass) into a 6-row stack — at 100 TB the panel is the same map
    // stage as text_gopher_quality plus one scalar-sized rollup.
    "text_gopher_funnel" -> { (s, d) =>
      val rules = Seq("words" -> "f_words", "mwl" -> "f_mwl",
        "stop" -> "f_stop", "top2" -> "f_top2", "top3" -> "f_top3",
        "top4" -> "f_top4")
      val aggs = rules.zipWithIndex.flatMap { case ((_, c), i) =>
        val uniq = rules.map(_._2)
          .map(o => if (o == c) col(o) else !col(o)).reduce(_ && _)
        val surv = rules.take(i + 1).map(r => !col(r._2)).reduce(_ && _)
        Seq(sum(when(col(c), 1L).otherwise(0L)).as(s"f_$i"),
          sum(when(uniq, 1L).otherwise(0L)).as(s"u_$i"),
          sum(when(surv, 1L).otherwise(0L)).as(s"c_$i"))
      }
      val a = gopherFlagsFrom(Tables(s, d).documents)
        .agg(aggs.head, aggs.tail: _*)
      val stackArgs = rules.zipWithIndex.map { case ((name, _), i) =>
        s"$i, '$name', f_$i, u_$i, c_$i"
      }.mkString(", ")
      a.selectExpr(s"stack(6, $stackArgs) AS " +
          "(rule_ord, rule, n_fail, n_unique_fail, n_survive_cum)")
        .orderBy("rule_ord")
    },
    // Kneser–Ney smoothed bigram LM — the n-gram language model behind
    // the lm-familiarity quality signal, with the smoothing the field
    // actually uses (absolute discounting + continuation probability:
    // "Francisco" is frequent but only ever follows "San", so its
    // continuation mass is low). P(w2|w1) = max(c(w1w2)−d, 0)/c(w1·) +
    // d·N1+(w1·)/c(w1·) · N1+(·w2)/|bigrams|, d = 0.75 (the published
    // default). Every count is exact (adjacent pairs via zip_with over
    // two token-array slices — zero joins to build the stream); the
    // probability is ONE fixed IEEE tree per row, and c ≥ 1 makes the
    // max() vanish. Shape: one pair-keyed aggregate collapses the corpus
    // to the bigram table; both marginals and the continuation counts
    // derive from THAT table (never the corpus) and broadcast back under
    // the ≥3-support survivors; |bigrams| is a 1-row scalar broadcast
    // (whitelisted pattern). Top-30 by count bounds the output.
    "text_kn_bigram" -> { (s, d) =>
      val t = toks(col("text"))
      val pairs = Tables(s, d).documents
        .select(explode(zip_with(
          slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("pr"))
        .select(col("pr.w1").as("w1"), col("pr.w2").as("w2"))
      val bg = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
        .persist()
      val left = bg.groupBy("w1")
        .agg(sum(col("c_ab")).as("c_left"), count(lit(1)).as("n_right"))
      val right = bg.groupBy("w2").agg(count(lit(1)).as("n_left"))
      val nbi = bg.agg(count(lit(1)).as("n_bigrams"))
      bg.filter(col("c_ab") >= 3)
        .join(broadcast(left), "w1")
        .join(broadcast(right), "w2")
        .crossJoin(broadcast(nbi))
        .select(col("w1"), col("w2"), col("c_ab"),
          ((col("c_ab").cast("double") - lit(0.75)) /
            col("c_left").cast("double") +
            (lit(0.75) * col("n_right").cast("double") /
              col("c_left").cast("double")) *
            (col("n_left").cast("double") /
              col("n_bigrams").cast("double"))).as("p_kn"))
        .orderBy(col("c_ab").desc, col("w1").asc, col("w2").asc)
        .limit(30)
    },
    // Zipf-law conformance check — the corpus-health statistic: under
    // Zipf, rank x frequency is ~constant, so the top-20 tokens' rank·n
    // products (EXACT integers) and their ratio to the rank-1 count
    // (ONE IEEE division) expose a truncated or synthetic vocabulary at
    // a glance (flat c_norm = healthy; collapsing c_norm = head-heavy).
    // No logs anywhere — ln is not bit-portable across engines and the
    // rank·n form carries the same information. Shape: one explode +
    // partial+final token count, distributed top-20 (TakeOrderedAnd-
    // Project, never a global sort), then a 20-row window for the rank.
    // Heaps-law vocabulary growth: cumulative distinct-word count vs
    // cumulative token count over the corpus in doc_id order, by doc-id
    // decile — the curve that sizes a tokenizer vocabulary (does the
    // vocab saturate, and where?). The scale trick: "distinct words
    // seen by decile i" never re-scans prefixes — each word contributes
    // ONE row at its FIRST-occurrence decile (min over its postings),
    // and the curve is a 10-row cumulative window. One explode, two
    // hash aggregations, a 1-row max-doc broadcast; nothing quadratic.
    "text_heaps_law" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables(s, d).documents
      val tok = docs.select(col("doc_id"), explode(toks(col("text"))).as("w"))
      val md = docs.agg(max(col("doc_id")).as("maxd"))
      val tb = tok.crossJoin(broadcast(md))
        .withColumn("b", expr("int(doc_id * 10 div (maxd + 1)) + 1"))
      val tokensPerB = tb.groupBy("b").agg(count(lit(1)).as("toks"))
      val firstB = tb.groupBy("w").agg(min(col("b")).as("fb"))
        .groupBy(col("fb").as("b")).agg(count(lit(1)).as("new_words"))
      val w10 = Window.orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tokensPerB.join(firstB, Seq("b"), "left")
        .select(col("b"),
          sum(col("toks")).over(w10).as("tokens_cum"),
          sum(coalesce(col("new_words"), lit(0L))).over(w10).as("vocab_cum"),
          coalesce(col("new_words"), lit(0L)).as("new_words"))
        .orderBy("b")
    },
    "text_zipf_check" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val tf = Tables(s, d).documents
        .select(explode(toks(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("n"))
      val top = tf.orderBy(col("n").desc, col("tok").asc).limit(20)
      val n1 = top.agg(max(col("n")).as("n1")) // rank-1 count (20 rows in)
      top
        .withColumn("rank", row_number().over(
          Window.orderBy(col("n").desc, col("tok").asc)))
        .crossJoin(broadcast(n1))
        .select(col("rank"), col("tok"), col("n"),
          (col("rank") * col("n")).as("rank_x_n"),
          ((col("rank") * col("n")).cast("double") /
            col("n1").cast("double")).as("c_norm"))
        .orderBy("rank")
    },
    // Pooled type-token ratio by document-length bucket — the lexical-
    // diversity QC panel: TTR falls with length by construction, so the
    // comparable statistic is POOLED within 50-token buckets (Σ types /
    // Σ tokens per bucket — exact integer sufficient statistics, ONE
    // IEEE division per bucket; never an average of per-doc ratios,
    // which is order-dependent float summation across partitions).
    "text_ttr_buckets" -> { (s, d) =>
      val t = toks(col("text"))
      Tables(s, d).documents
        .select((size(t) - pmod(size(t), lit(50))).cast("long")
            .as("len_bucket"),
          size(t).cast("long").as("n_tok"),
          size(array_distinct(t)).cast("long").as("n_uniq"))
        .groupBy("len_bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("sum_tokens"),
          sum(col("n_uniq")).as("sum_types"))
        .select(col("len_bucket"), col("n_docs"), col("sum_tokens"),
          col("sum_types"),
          (col("sum_types").cast("double") /
            col("sum_tokens").cast("double")).as("pooled_ttr"))
        .orderBy("len_bucket")
    },
    // Token-length distribution by language — the tokenizer-budget
    // input: mean bytes/token by language decides vocabulary allocation
    // (agglutinative languages shift the histogram right). Per-language
    // share is count x cross-multiplied against the language total
    // (lang-sized, broadcast back). One explode + one aggregate.
    "text_word_len_dist" -> { (s, d) =>
      val hist = Tables(s, d).documents
        .select(col("lang"), explode(toks(col("text"))).as("tok"))
        .select(col("lang"), length(col("tok")).as("len"))
        .groupBy("lang", "len").agg(count(lit(1)).as("n"))
      val tot = hist.groupBy("lang").agg(sum(col("n")).as("n_lang"))
      hist.join(broadcast(tot), "lang")
        .select(col("lang"), col("len"), col("n"),
          (col("n").cast("double") / col("n_lang").cast("double"))
            .as("share"))
        .orderBy("lang", "len")
    },
    // Stopword-rate decile histogram by language — the CCNet-style
    // filter-calibration readout: where a corpus' stopword-ratio mass
    // sits decides the quality threshold per language. The bucket is
    // EXACT integer arithmetic ((n_stop*10) div n_tok — floor(ratio*10)
    // computed without touching a float, so no last-ulp boundary flips
    // between engines). Pure map stage + one aggregate.
    "text_stopword_buckets" -> { (s, d) =>
      val t = toks(col("text"))
      Tables(s, d).documents
        .select(col("lang"),
          size(filter(t, x => x.isin(stopwords: _*)))
            .cast("long").as("ns"),
          size(t).cast("long").as("nt"))
        .select(col("lang"), expr("ns * 10 div nt").as("decile"))
        .groupBy("lang", "decile").agg(count(lit(1)).as("n_docs"))
        .orderBy("lang", "decile")
    },
    // Shared-prefix boilerplate detection — duplicated 32-char document
    // heads (scraped headers, injected banners) that full-document dedup
    // misses because the bodies differ. Exact groupBy on the prefix
    // (map-side combine; at 100 TB the prefix table is cluster-count
    // sized after the filter), canonical keep = smallest doc_id.
    "text_prefix_dup" -> { (s, d) =>
      Tables(s, d).documents
        .select(substring(col("text"), 1, 32).as("prefix"), col("doc_id"))
        .groupBy("prefix")
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_doc"))
        .filter(col("n_docs") >= 2)
        .orderBy("prefix")
    },
    // Hapax-legomena share by source — the vocabulary-health ratio: a
    // source whose vocabulary is mostly once-seen tokens is either
    // genuinely diverse or noisy (OCR garbage, IDs); either way its
    // n-gram statistics are untrustworthy and the curation owner reads
    // this panel before weighting the source. Two partial+final
    // aggregates (term counts, then per-source rollup), ONE division.
    "text_hapax_share" -> { (s, d) =>
      Tables(s, d).documents
        .select(col("source"), explode(toks(col("text"))).as("tok"))
        .groupBy("source", "tok").agg(count(lit(1)).as("n"))
        .groupBy("source")
        .agg(count(lit(1)).as("vocab"),
          count(when(col("n") === 1L, 1)).as("hapax"))
        .select(col("source"), col("vocab"), col("hapax"),
          (col("hapax").cast("double") / col("vocab").cast("double"))
            .as("hapax_share"))
        .orderBy("source")
    },
    // Character-case profile by language — the shouting/boilerplate
    // signal word-level filters miss (ALL-CAPS legal headers, lowercase
    // chat logs): exact per-class character counts via regexp_replace
    // deletion (codegen'd, one pass over the scan), pooled per language,
    // ONE division for the headline upper-case share.
    "text_case_profile" -> { (s, d) =>
      val upper = length(regexp_replace(col("text"), "[^A-Z]", ""))
      val lower = length(regexp_replace(col("text"), "[^a-z]", ""))
      val digit = length(regexp_replace(col("text"), "[^0-9]", ""))
      Tables(s, d).documents
        .select(col("lang"), upper.cast("long").as("u"),
          lower.cast("long").as("l"), digit.cast("long").as("g"),
          length(col("text")).cast("long").as("n"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_chars"),
          sum(col("u")).as("n_upper"), sum(col("l")).as("n_lower"),
          sum(col("g")).as("n_digit"))
        .select(col("lang"), col("n_docs"), col("n_chars"),
          col("n_upper"), col("n_lower"), col("n_digit"),
          (col("n_upper").cast("double") / col("n_chars").cast("double"))
            .as("upper_share"))
        .orderBy("lang")
    },
    // Unigram-LM tokenizer, one HARD-EM step (SentencePiece's training
    // loop, Kudo 2018, over a char+top-30-bigram lattice): piece costs
    // quantize -ln p(piece) through the SHARED 1025-entry ln table (the
    // text_entropy parity doctrine — both engines read identical doubles,
    // never their own libm), the E step Viterbi-segments every DISTINCT
    // word once ([[graft.functions.Kernels.unigramViterbi]], a codegen'd
    // integer DP; occurrence counts re-weight after), and the M step IS
    // the output: piece usage counts, the renormalization numerators.
    // Scale shape: vocabulary build = two count-over-vocabulary
    // aggregates; the encode pass is one broadcast (vocab blob) map stage
    // over distinct words — zero joins on the corpus stream; a bigger
    // vocab changes the blob, not the plan. Bigrams beat their two chars
    // exactly when quantized PMI > 0 — the collocation criterion, so the
    // learned pieces are the corpus' real digraphs ('th', 'in', 'er').
    "text_unigram_em" -> { (s, d) =>
      val words = Tables(s, d).documents
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "" && length(col("word")) <= 16)
        .groupBy("word").agg(count(lit(1)).as("wn"))
        .persist() // read 3x: char freqs, bigram freqs, the encode pass
      val chars = words
        .select(explode(split(col("word"), "")).as("p"), col("wn"))
        .filter(col("p") =!= "")
        .groupBy("p").agg(sum(col("wn")).as("f"))
      val bigrams = words
        .select(explode(expr(
          "CASE WHEN length(word) >= 2 THEN transform(" +
            "sequence(1, length(word) - 1), i -> substring(word, i, 2)) " +
            "ELSE array() END")).as("p"), col("wn"))
        .groupBy("p").agg(sum(col("wn")).as("f"))
        .orderBy(col("f").desc, col("p").asc).limit(30)
      val tot = chars.agg(sum(col("f")).as("t"))
      val lnArr = typedLit(lnTable.toSeq)
      // q in [1, 1024] by exact integer division; cost =
      // round(1000 * ln(1024 / q)) via the shared table — integer DP after
      def withCost(df: DataFrame): DataFrame = df.crossJoin(broadcast(tot))
        .select(col("p"),
          floor(lit(1000.0) * (element_at(lnArr, lit(1025)) -
            element_at(lnArr,
              (expr("(1023 * f) div t") + lit(2)).cast("int"))) +
            lit(0.5)).cast("long").as("cost"))
      val vocab = withCost(chars).unionAll(withCost(bigrams))
        .agg(collect_list(col("p")).as("ps"),
          collect_list(col("cost")).as("cs"))
      words.crossJoin(broadcast(vocab))
        .select(explode(graft.functions.functions.unigram_viterbi(
          col("word"), col("ps"), col("cs"))).as("piece"), col("wn"))
        .groupBy("piece").agg(sum(col("wn")).as("em_count"))
        .orderBy(col("em_count").desc, col("piece").asc)
        .limit(40)
    },
    // Linear quality-classifier INFERENCE, fastText shape (Joulin et al.
    // 2016): hashed unigram + bigram features (xxh64 mod 4096 — the
    // hashing trick; bigram ids by seed chaining, Spark's multi-arg
    // xxhash64 contract) dotted with a deterministic weight vector
    // (pseudo-weights derived from the feature id — a production run
    // broadcasts learned weights; the pinned ones keep the oracle
    // integer-exact). One codegen'd map stage over the token stream plus
    // one partial+final aggregate per doc — at 100 TB the classifier is
    // a marginal cost over the scan, exactly fastText's design point.
    // Integer weights, integer score, exact parity.
    "text_quality_classifier" -> { (s, d) =>
      val dim = 4096
      val ts = Tables(s, d).documents
        .select(col("doc_id"),
          filter(split(col("text"), " "), t => t =!= "").as("ts"))
        .filter(size(col("ts")) >= 1)
      val uni = ts.select(col("doc_id"), explode(col("ts")).as("t"))
        .select(col("doc_id"), pmod(xxhash64(col("t")), lit(dim)).as("fid"))
      val bi = ts.filter(size(col("ts")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(ts) - 1), " +
            "i -> struct(element_at(ts, i) AS a, element_at(ts, i + 1) AS b))"
          )).as("pr"))
        .select(col("doc_id"),
          pmod(xxhash64(col("pr.a"), col("pr.b")), lit(dim)).as("fid"))
      uni.unionAll(bi)
        .select(col("doc_id"),
          ((col("fid") * lit(2654435761L)) % 2001 - 1000).as("w"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_feats"), sum(col("w")).as("score"))
        .withColumn("flagged_low_quality", col("score") < 0)
        .orderBy("doc_id")
    }
  )

  /** Character mass of the most repeated n-token shingle of the text:
    * max over distinct shingles of len(shingle)·occurrences, occurrences
    * counted over the sliding shingle multiset (overlaps included — the
    * Gopher convention). Computed WITHOUT a shuffle: sort the doc's own
    * shingle array, then one aggregate pass tracks the current run length
    * and the best mass (len·run grows monotonically within a run, so
    * maxing the partial products is exact). 0 for docs shorter than n
    * tokens (empty shingle array → init state).
    */
  private def topGramMass(text: Column, n: Int): Column = {
    val init = struct(lit("").as("prev"), lit(0L).as("run"),
      lit(0L).as("best"))
    aggregate(array_sort(shingles(text, n)), init,
      (acc, g) => {
        val run = when(g === acc.getField("prev"),
          acc.getField("run") + lit(1L)).otherwise(lit(1L))
        struct(g.as("prev"), run.as("run"),
          greatest(acc.getField("best"), length(g).cast("long") * run)
            .as("best"))
      },
      acc => acc.getField("best"))
  }

  /** Per-document Gopher rule statistics and verdict flags — the shared
    * substrate of `text_gopher_quality` (readout) and
    * `text_gopher_funnel` (attribution rollup). All flags are exact
    * integer comparisons; thresholds documented at the query.
    */
  private[graft] def gopherFlagsFrom(docs: DataFrame): DataFrame = {
    val t = toks(col("text"))
    val nw = size(t).as("n_words")
    docs.select(
      col("doc_id"),
      nw,
      size(filter(t, x => x.isin(stopwords: _*))).as("n_stop"),
      length(col("text")).cast("long").as("chars"),
      (length(col("text")) - (size(t) - lit(1))).cast("long")
        .as("sum_wlen"),
      topGramMass(col("text"), 2).as("mass2"),
      topGramMass(col("text"), 3).as("mass3"),
      topGramMass(col("text"), 4).as("mass4"))
    .withColumn("f_words", col("n_words") < 20 || col("n_words") > 90)
    .withColumn("f_mwl",
      col("sum_wlen") < lit(3L) * col("n_words") ||
        col("sum_wlen") > lit(10L) * col("n_words"))
    .withColumn("f_stop", col("n_stop") < 2)
    .withColumn("f_top2", col("mass2") * 5L > col("chars"))
    .withColumn("f_top3", col("mass3") * 50L > col("chars") * 9L)
    .withColumn("f_top4", col("mass4") * 25L > col("chars") * 4L)
  }

  /** BM25 (k1 = 1.2, b = 0.75, rational idf) of the two-term query
    * (`t1`, `t2`), top `k` documents — separated so specs can plant
    * corpora with hand-computed scores. Literals are pre-folded
    * ((k1+1) = 2.2, (1−b) = 0.25) so both engines evaluate the
    * IDENTICAL IEEE tree; see the `text_bm25` query comment.
    */
  def bm25From(docs: DataFrame, t1: String, t2: String,
      k: Int): DataFrame = {
    val stats = docs.agg(count(lit(1)).as("n"),
      sum(size(toks(col("text")))).as("total_tok"))
    val dl = docs.select(col("doc_id"),
      size(toks(col("text"))).as("dl"))
    val tf = docs
      .select(col("doc_id"), explode(toks(col("text"))).as("tok"))
      .filter(col("tok").isin(t1, t2))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val avgdl = col("total_tok").cast("double") / col("n").cast("double")
    val idf = (col("n").cast("double") - col("df").cast("double") +
      lit(0.5)) / (col("df").cast("double") + lit(0.5))
    val tfd = col("tf").cast("double")
    val score = idf * ((tfd * lit(2.2)) / (tfd +
      lit(1.2) * (lit(0.25) + lit(0.75) *
        (col("dl").cast("double") / avgdl))))
    tf.join(broadcast(df), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("score", score)
      .groupBy("doc_id")
      .agg(
        coalesce(max(when(col("tok") === t1, col("tf"))), lit(0L))
          .as("tf_1"),
        coalesce(max(when(col("tok") === t2, col("tf"))), lit(0L))
          .as("tf_2"),
        (coalesce(max(when(col("tok") === t1, col("score"))), lit(0.0)) +
          coalesce(max(when(col("tok") === t2, col("score"))), lit(0.0)))
          .as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Adjacent-pair phrase matches of (`t1`, `t2`) per document via
    * positional postings — separated so specs can plant exact phrase
    * placements.
    */
  def phraseSearchFrom(docs: DataFrame, t1: String,
      t2: String): DataFrame = {
    val pos = docs
      .select(col("doc_id"),
        posexplode(toks(col("text"))).as(Seq("pos", "tok")))
      .filter(col("tok").isin(t1, t2))
    pos.as("a").join(pos.as("b"),
        col("a.doc_id") === col("b.doc_id") &&
          col("a.tok") === t1 && col("b.tok") === t2 &&
          col("b.pos") === col("a.pos") + 1)
      .groupBy(col("a.doc_id").as("doc_id"))
      .agg(count(lit(1)).as("n_phrase"), min(col("a.pos")).as("first_pos"))
      .orderBy("doc_id")
  }

  /** The `text_keyness` core: top-`k` tokens per language by lift
    * (c_lt·N)/(c_t·c_l) with support `c_lt >= minCount`.
    */
  def keynessFrom(docs: DataFrame, minCount: Long, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lt = docs
      .select(col("lang"), explode(toks(col("text"))).as("token"))
      .groupBy("lang", "token").agg(count(lit(1)).as("c_lt"))
    val scored = lt
      .withColumn("c_t", sum(col("c_lt")).over(Window.partitionBy("token")))
      .withColumn("c_l", sum(col("c_lt")).over(Window.partitionBy("lang")))
      .withColumn("n_total", sum(col("c_lt")).over(Window.partitionBy()))
      .filter(col("c_lt") >= minCount)
      .withColumn("lift",
        (col("c_lt") * col("n_total")).cast("double") /
          (col("c_t") * col("c_l")).cast("double"))
    val wRank = Window.partitionBy("lang")
      .orderBy(col("lift").desc, col("token").asc)
    scored.withColumn("rk", row_number().over(wRank))
      .filter(col("rk") <= k)
      .select(col("lang"), col("rk").cast("long").as("rk"), col("token"),
        col("c_lt"), col("lift"))
      .orderBy("lang", "rk")
  }

  /** Shannon entropy of a row-local multiset: H = (N·lnN − Σ c·ln c) /
    * (N·ln 2), all logs via the shared [[lnTable]] — computed by the
    * codegen'd [[graft.functions.EntropyBits]] kernel, which replicates
    * the original sorted-distinct HOF fold bit for bit in one pass
    * (Spark HOFs evaluate interpreted per element; the O(distinct × N)
    * filter-per-distinct form measured ~10 s at sf0.1, the kernel ~1 s).
    */
  private def entropyOf(items: Column): Column =
    graft.functions.functions.entropy_bits(items)

  /** The `text_entropy` core over any (doc_id, text) frame — separated so
    * specs can plant texts with hand-computable entropies.
    */
  def entropyFrom(docs: DataFrame): DataFrame = {
    val chars = regexp_extract_all(col("text"), lit("."), lit(0))
    docs.select(
      col("doc_id"),
      length(col("text")).as("n_chars_obs"),
      entropyOf(chars).as("h_char"),
      size(toks(col("text"))).as("n_tokens"),
      entropyOf(toks(col("text"))).as("h_token"))
      .orderBy("doc_id")
  }

  /** Width of the non-overlapping word segments the segment-dedup family
    * chunks documents into. 3 keeps the synthetic corpus's duplicate
    * signal strong (19% duplicate instances at sf0.01, 71% at sf0.1);
    * a real pipeline would use sentence/paragraph boundaries instead.
    */
  private val SegW = 3

  /** (doc_id, seg_id, segtext) instance stream: non-overlapping SegW-word
    * segments in document order (the last segment keeps the 1..SegW-word
    * remainder). Pure map stage — the word array is materialized as a
    * column BEFORE the transform lambda so the split runs once per row,
    * not once per segment (see [[graft.functions.Kernels]]' lambda-CSE
    * note; 4x measured on text_ngram_novelty).
    */
  private[graft] def segmentsOf(docs: DataFrame): DataFrame = {
    val nSegs = floor((size(col("wds")) + lit(SegW - 1)) / lit(SegW.toDouble))
      .cast("int")
    docs
      .select(col("doc_id"), toks(col("text")).as("wds"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), nSegs - lit(1)),
          j => concat_ws(" ", slice(col("wds"), j * lit(SegW) + lit(1),
            lit(SegW)))))
          .as(Seq("seg_id", "segtext")))
  }

  /** First-occurrence key: lexicographic (doc_id, seg_id) packed into one
    * BIGINT so both engines take a plain min. seg_id < 1e6 is guaranteed
    * by any per-document segment count (a 3e6-word document would split
    * upstream long before this).
    */
  private def segKey: Column = col("doc_id") * lit(1000000L) + col("seg_id")

  /** Segment-dedup core over any frame with (doc_id, text) — separated so
    * specs can plant corpora with known duplicate segments.
    */
  def segmentDedupFrom(docs: DataFrame): DataFrame = {
    val segs = segmentsOf(docs)
    val keep = segs.groupBy("segtext").agg(min(segKey).as("firstk"))
    segs.withColumn("k", segKey)
      .join(keep, Seq("segtext"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_segs"),
        sum(when(col("k") =!= col("firstk"), 1L).otherwise(0L))
          .as("n_dropped"),
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("k") === col("firstk"),
            struct(col("seg_id"), col("segtext"))))),
          x => x("segtext"))).as("clean_text"))
      .orderBy("doc_id")
  }

  /** Boilerplate-scrub core: segments in >= minDocs distinct documents are
    * dropped everywhere. Separated for planted specs.
    */
  def boilerplateScrubFrom(docs: DataFrame, minDocs: Int): DataFrame = {
    val segs = segmentsOf(docs)
    val hot = segs.groupBy("segtext")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("segtext"), lit(1L).as("boiler"))
    segs.join(hot, Seq("segtext"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_segs"),
        sum(when(col("boiler").isNotNull, 1L).otherwise(0L)).as("n_boiler"),
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("boiler").isNull,
            struct(col("seg_id"), col("segtext"))))),
          x => x("segtext"))).as("clean_text"))
      .orderBy("doc_id")
  }

  /** Token-distribution core over any frame with (doc_id, text) —
    * separated so specs can plant documents with known frequency curves.
    */
  def tokenDistFrom(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(toks(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
    // modal token: the tie rule is count DESC then tok ASC, which a
    // single max-struct cannot express (it would need a reversed string
    // collation inside the struct). Instead: take max(c) in the rollup,
    // join it back onto the SAME (doc_id, tok) frame — co-partitioned,
    // no extra shuffle — and min(tok) over the argmax rows. Never sorts.
    val stats = tf.groupBy("doc_id")
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_types"),
        max(col("c")).as("top_freq"),
        sum(col("c") * (col("c") - 1)).as("collisions"))
    val modal = tf.join(stats.select(col("doc_id"), col("top_freq")),
        Seq("doc_id"))
      .filter(col("c") === col("top_freq"))
      .groupBy("doc_id").agg(min(col("tok")).as("top_tok"))
    stats.join(modal, Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        col("top_tok"), col("top_freq"), col("collisions"))
      .orderBy("doc_id")
  }

  /** N-gram novelty core over any frame with (doc_id, text) — separated
    * so specs can plant a corpus with known first occurrences.
    *
    * Never joins back on the gram key: a doc's novel-gram count is just
    * "how many grams have first_doc = this doc", so the wide (doc, gram)
    * frame reduces twice — per doc (n_grams) and per gram then per
    * first-doc (n_novel) — and only the two doc-keyed aggregates join
    * (5 orders of magnitude smaller than the gram stream at corpus
    * scale). The r6 first cut joined first-occurrences back onto the
    * gram stream and was the slowest query in the suite (4.7 s); this
    * form is the same answer with the gram-keyed join deleted.
    *
    * CACHE LIFETIME CONTRACT: the distinct (doc, gram) frame is
    * persisted (read by both reductions); the CALLER owns release via
    * `spark.catalog.clearCache()`.
    */
  def ngramNoveltyFrom(docs: DataFrame): DataFrame = {
    // tk MUST be a materialized column, not the inline split expression:
    // Catalyst does not common-subexpression-eliminate inside lambda
    // bodies, so an inline `split(text)` under `transform`'s element_at
    // re-splits the document PER GRAM PER TOKEN ACCESS (3x per gram) —
    // measured 4x slower on the sf0.1 corpus (4.8 s -> 1.2 s).
    val tk = col("tk")
    val n = size(tk)
    val grams = when(n >= 3, transform(sequence(lit(1), n - 2),
      i => concat(element_at(tk, i), lit(" "), element_at(tk, i + 1),
        lit(" "), element_at(tk, i + 2)))).otherwise(
      array().cast("array<string>"))
    val dg = docs
      .select(col("doc_id"), toks(col("text")).as("tk"))
      .select(col("doc_id"), explode(grams).as("gram"))
      .distinct()
      .persist() // read twice: per-doc counts + first-occurrence counts
    val nd = dg.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    val nv = dg.groupBy("gram").agg(min(col("doc_id")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_novel"))
    nd.join(nv, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty",
        col("n_novel").cast("double") / col("n_grams").cast("double"))
      .orderBy("doc_id")
  }

  /** Word vocabulary with corpus frequencies, each word exploded to its
    * space-joined character-symbol form ("hello" -> "h e l l o") — the
    * starting state of a BPE trainer. Empty tokens (consecutive
    * delimiters) are dropped in both engines.
    */
  def charVocab(docs: DataFrame): DataFrame =
    docs.select(explode(toks(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("wc"))
      .select(trim(regexp_replace(col("w"), "(.)", "$1 ")).as("sym"),
        col("wc"))

  /** Adjacent-symbol pair counts over a (sym, wc) vocabulary frame,
    * weighted by word count. `sym` is the space-joined symbol string;
    * symbols may be multi-character after merges. The symbol array is
    * materialized as a column before indexing — see the lambda-CSE note
    * in [[ngramNoveltyFrom]].
    */
  def bpePairCounts(vocab: DataFrame): DataFrame =
    vocab.select(col("wc"), split(col("sym"), " ").as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("wc"), col("tk"),
        explode(sequence(lit(1), size(col("tk")) - 1)).as("i"))
      .select(element_at(col("tk"), col("i")).as("left_sym"),
        element_at(col("tk"), col("i") + 1).as("right_sym"), col("wc"))
      .groupBy("left_sym", "right_sym").agg(sum(col("wc")).as("weight"))

  /** Top-k pairs with the deterministic BPE tiebreak (weight desc, then
    * lexicographic) — a TakeOrderedAndProject, never a full sort.
    */
  def bpeTopPairs(vocab: DataFrame, k: Int): DataFrame =
    bpePairCounts(vocab)
      .orderBy(col("weight").desc, col("left_sym").asc,
        col("right_sym").asc)
      .limit(k)

  /** One full BPE merge step: argmax pair -> greedy left-to-right merge
    * over the vocabulary -> recounted pair table.
    *
    * The merge applies the BPE greedy rule exactly: scan each word left
    * to right, merge every occurrence of the winning pair whose left
    * symbol was not itself consumed by the previous merge. Two facts
    * make this pure position arithmetic: (1) positions where the pair
    * matches are consecutive ONLY when left==right (an 'a a a a' run) —
    * for left!=right a match at i forces tk(i+1)=right!=left, so i+1
    * cannot match; (2) within a consecutive run the greedy rule keeps
    * exactly the 1st, 3rd, 5th... match. So: mark matches, carry the
    * head position of the current run forward with a running max, keep
    * marks at even distance from the head, drop the position after each
    * kept mark. All three window passes share one (sym)-partitioned
    * sort, so the whole merge is a single extra shuffle over the
    * position-exploded VOCABULARY (not corpus) frame.
    */
  def bpeMergeStep(vocab: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val best = bpeTopPairs(vocab, 1)
      .select(col("left_sym").as("bl"), col("right_sym").as("br"))
    val tk = col("tk")
    val pos = vocab.crossJoin(broadcast(best))
      .select(col("sym"), col("wc"), col("bl"), col("br"),
        split(col("sym"), " ").as("tk"))
      .select(col("sym"), col("wc"), col("bl"), col("br"),
        explode(sequence(lit(1), size(tk))).as("i"),
        element_at(tk, col("i")).as("s_i"),
        // ANSI-safe lookahead: element_at past the end would throw
        when(col("i") < size(tk), element_at(tk, col("i") + 1)).as("s_next"))
      // when/otherwise(0) rather than boolean casts: the lookahead is
      // NULL at the last position and last_head is NULL before the
      // first run — the flags must be 0 there, never NULL
      .withColumn("mark",
        when(col("s_i") === col("bl") && col("s_next") === col("br"), 1)
          .otherwise(0))
    val w = Window.partitionBy("sym").orderBy("i")
    val sel = pos
      .withColumn("is_head",
        when(col("mark") === 1 && lag(col("mark"), 1, 0).over(w) === 0, 1)
          .otherwise(0))
      .withColumn("last_head",
        max(when(col("is_head") === 1, col("i"))).over(w))
      .withColumn("selected",
        when(col("mark") === 1 &&
          (col("i") - col("last_head")) % 2 === 0, 1).otherwise(0))
    val out = sel
      .withColumn("prev_sel", lag(col("selected"), 1, 0).over(w))
      .filter(col("prev_sel") === 0)
      .select(col("sym"), col("wc"), col("i"),
        when(col("selected") === 1, concat(col("bl"), col("br")))
          .otherwise(col("s_i")).as("o"))
    val merged = out.groupBy("sym")
      .agg(min(col("wc")).as("wc"),
        concat_ws(" ", transform(
          sort_array(collect_list(struct(col("i"), col("o")))),
          x => x.getField("o"))).as("msym"))
      .select(col("msym").as("sym"), col("wc"))
    bpePairCounts(merged)
      .orderBy(col("weight").desc, col("left_sym").asc,
        col("right_sym").asc)
      .limit(k)
  }

  /** The bigram-LM familiarity core over any frame with (doc_id, text) —
    * see the `text_lm_familiarity` notes above. Separated so specs can
    * plant documents with hand-computable bigram counts.
    *
    * CACHE LIFETIME CONTRACT: the exploded bigram frame is persisted (read
    * by the model build and the scoring join); the CALLER owns release via
    * `spark.catalog.clearCache()`.
    */
  def lmFamiliarityFrom(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tk = toks(col("text"))
    // adjacent-token bigrams in one pass: zip tokens with their
    // successors (slice from position 2); the trailing zip pairs the
    // last token with null, concat nulls it out, filter drops it —
    // a <2-token document yields no bigrams (explode drops it, and the
    // oracle's generate_series(1, len-1) is empty likewise)
    val bigrams = filter(
      zip_with(tk, slice(tk, lit(2), size(tk)),
        (a, b) => concat(a, lit(" "), b)),
      x => x.isNotNull)
    val bg = docs
      .select(col("doc_id"), explode(bigrams).as("bigram"))
      .persist() // read twice: model build + scoring join
    val model = bg.groupBy("bigram").agg(count(lit(1)).as("c2"))
    bg.join(model, Seq("bigram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("c2")).as("familiarity"),
        min(col("c2")).as("rarest"),
        sum(when(col("c2") <= 2, 1L).otherwise(0L)).as("n_rare"))
      .withColumn("avg_c2",
        col("familiarity").cast("double") / col("n_bigrams").cast("double"))
      .withColumn("quality_bucket",
        ntile(5).over(Window.orderBy(col("avg_c2").desc, col("doc_id").asc)))
      .orderBy("doc_id")
  }

  /** The unigram-LM rarity core over any frame with (doc_id, text) — see
    * the `text_rarity` notes above. Separated so specs can plant a corpus
    * with known token frequencies.
    */
  def rarityFrom(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(toks(col("text"))).as("w"))
    val cf = tok.groupBy("w").agg(count(lit(1)).as("c"))
    val tot = cf.agg(sum(col("c")).as("n_total"),
      count(lit(1)).as("v_size"))
    tok.join(cf, "w").crossJoin(broadcast(tot))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"),
        sum(when(col("c") * col("v_size") < col("n_total"), 1L)
          .otherwise(0L)).as("nr"))
      .select(col("doc_id"), col("n").cast("int").as("n_tokens"),
        (col("sc").cast("double") / col("n").cast("double"))
          .as("mean_tok_cf"),
        (col("nr").cast("double") / col("n").cast("double"))
          .as("rare_frac"))
      .orderBy("doc_id")
  }

  private[ops] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[ops] val TermRe = "\\b(customer|supplier|account)\\b"

  /** The PII-scrub core over any frame with (doc_id, text) — the synthetic
    * corpus contains no emails, so planted specs exercise that path.
    */
  def scrubFrom(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(TermRe), lit(0)))
        .as("n_terms"),
      size(regexp_extract_all(col("text"), lit(EmailRe), lit(0)))
        .as("n_emails"),
      md5(regexp_replace(
        regexp_replace(col("text"), EmailRe, "<EMAIL>"),
        TermRe, "<REDACTED>")).as("scrub_hash"))
      .orderBy("doc_id")

  /** Scrubbed text itself (not hashed) — spec-only readout used to assert
    * the actual redaction output on planted documents.
    */
  def scrubbedText(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      regexp_replace(
        regexp_replace(col("text"), EmailRe, "<EMAIL>"),
        TermRe, "<REDACTED>").as("scrubbed"))

  /** Skip-bigram association kernel of `text_cooccurrence_assoc` (see the
    * query comment) — separated so specs can drive it with planted
    * corpora at a low support threshold.
    */
  def cooccurrenceAssocFrom(docs: DataFrame, minSupport: Long, k: Int)
      : DataFrame = {
    val tk = toks(col("text"))
    val n = size(tk)
    def skip(dist: Int) = when(n > dist, zip_with(
        slice(tk, lit(1), n - dist), slice(tk, lit(dist + 1), n - dist),
        (x, y) => struct(x.as("w1"), y.as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    val pc = docs
      .select(explode(concat(skip(1), skip(2))).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("n_ab"))
      .persist()
    val m1 = pc.groupBy("w1").agg(sum(col("n_ab")).as("n_a"))
    val m2 = pc.groupBy("w2").agg(sum(col("n_ab")).as("n_b"))
    val tot = pc.agg(sum(col("n_ab")).as("t_pairs"))
    pc.filter(col("n_ab") >= minSupport)
      .join(broadcast(m1), "w1")
      .join(broadcast(m2), "w2")
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("n_ab"), col("n_a"), col("n_b"),
        ((col("n_ab") * col("t_pairs")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("assoc"))
      .orderBy(col("assoc").desc, col("w1").asc, col("w2").asc)
      .limit(k)
  }

  private val tokSql = "string_split(text, ' ')"

  /** Winnowing fingerprint rows (doc_id, m) as a DuckDB CTE body — the
    * oracle replica of `winnow_fingerprints(text, 16, 8)`: per-position
    * base-257 mod-2^64 rolling hashes, signed reinterpretation, window-8
    * minima, distinct. Exposes `d` (all docs) and `fp`. Shared by the
    * text_winnow and text_winnow_pairs oracles.
    */
  private lazy val winnowFpCteSql: String =
    s"""d AS (SELECT doc_id, text, length(text) AS L FROM documents),
       |b AS (SELECT doc_id, L,
       |        list_transform(string_split(text, ''),
       |          x -> ord(x)::HUGEINT) AS bs
       |      FROM d WHERE L >= 16),
       |h AS (SELECT doc_id, j,
       |        list_reduce(list_prepend(0::HUGEINT, list_slice(bs, j, j + 15)),
       |          (acc, c) -> (acc * 257 + c) % 18446744073709551616) AS hu
       |      FROM b,
       |        LATERAL (SELECT unnest(generate_series(1, L - 15)) AS j) g),
       |hs AS (SELECT doc_id, j, ${XxhSql.signed("hu")} AS h FROM h),
       |wm AS (SELECT doc_id, j,
       |         min(h) OVER (PARTITION BY doc_id ORDER BY j
       |           ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS m,
       |         count(*) OVER (PARTITION BY doc_id) AS nh
       |       FROM hs),
       |fp AS (SELECT DISTINCT doc_id, m FROM wm
       |  WHERE j <= greatest(1, nh - 7))""".stripMargin

  /** ln(i) for i in 0..1024 (entry 0 unused) — the shared log table that
    * makes [[queries text_entropy]] engine-independent: both engines read
    * these EXACT doubles (the oracle embeds their shortest-roundtrip
    * rendering) instead of calling their own libm/fdlibm ln.
    */
  private[ops] val lnTable: Array[Double] = graft.functions.Kernels.LnTable

  /** The same table as a DuckDB list literal (1-based, so l[c+1]=ln(c)).
    * The `e0` exponent suffix is load-bearing: a bare decimal literal
    * parses as DECIMAL(18,16) in DuckDB — silently truncating the 17th
    * significant digit — while an exponent-form literal parses as DOUBLE
    * and round-trips Java's shortest rendering bit-exactly (verified).
    */
  private val lnTableSql: String =
    lnTable.map(_.toString + "e0").mkString("[", ",", "]")

  def oracles: Map[String, String] = Map(
    "text_tokens" ->
      s"""SELECT doc_id, CAST(len($tokSql) AS INT) AS n_tokens,
         |  CAST(length(text) AS INT) AS n_chars_obs,
         |  CAST(len(regexp_extract_all(text,
         |    ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+')) AS INT) AS n_bpeish,
         |  CAST(list_sum(list_transform($tokSql,
         |    x -> CAST(ceil(length(x) / 4.0) AS INT))) AS INT) AS n_subtokens
         |FROM documents ORDER BY doc_id""".stripMargin,
    // the same distance-1/distance-2 skip-bigram stream via list indexing
    // (tk[j], tk[j+d]) — set-identical to the engine's slice/zip_with
    // construction — and the same integer-ratio score
    "text_cooccurrence_assoc" ->
      s"""WITH tk AS (SELECT doc_id, $tokSql AS tk FROM documents),
         |pr AS (
         |  SELECT tk[j] AS w1, tk[j + 1] AS w2 FROM tk,
         |    LATERAL (SELECT unnest(generate_series(1, len(tk) - 1)) AS j) g
         |  WHERE len(tk) > 1
         |  UNION ALL
         |  SELECT tk[j] AS w1, tk[j + 2] AS w2 FROM tk,
         |    LATERAL (SELECT unnest(generate_series(1, len(tk) - 2)) AS j) g
         |  WHERE len(tk) > 2),
         |pc AS (SELECT w1, w2, count(*) AS n_ab FROM pr GROUP BY 1, 2),
         |m1 AS (SELECT w1, CAST(sum(n_ab) AS BIGINT) AS n_a
         |  FROM pc GROUP BY 1),
         |m2 AS (SELECT w2, CAST(sum(n_ab) AS BIGINT) AS n_b
         |  FROM pc GROUP BY 1),
         |t AS (SELECT CAST(sum(n_ab) AS BIGINT) AS t_pairs FROM pc)
         |SELECT w1, w2, n_ab, n_a, n_b,
         |  CAST(n_ab * t_pairs AS DOUBLE) / CAST(n_a * n_b AS DOUBLE)
         |    AS assoc
         |FROM pc JOIN m1 USING (w1) JOIN m2 USING (w2), t
         |WHERE n_ab >= 5
         |ORDER BY assoc DESC, w1 ASC, w2 ASC LIMIT 30""".stripMargin,
    "text_quality" ->
      s"""SELECT doc_id, CAST(len($tokSql) AS INT) AS n_tokens,
         |  CAST(len(list_filter($tokSql,
         |      x -> x IN ('the','a','of','and','to','in'))) AS DOUBLE)
         |    / CAST(len($tokSql) AS DOUBLE) AS stopword_ratio,
         |  CAST(len(list_distinct($tokSql)) AS DOUBLE)
         |    / CAST(len($tokSql) AS DOUBLE) AS type_token_ratio,
         |  CAST(length(text) - (len($tokSql) - 1) AS DOUBLE)
         |    / CAST(len($tokSql) AS DOUBLE) AS mean_token_len
         |FROM documents ORDER BY doc_id""".stripMargin,
    // the same per-(term, doc) counts and exact sufficient statistics;
    // cross products in HUGEINT (the Spark side uses DECIMAL(38,0))
    "text_burstiness" ->
      s"""WITH pd AS (SELECT term, doc_id, count(*) AS c FROM (
         |    SELECT doc_id, unnest($tokSql) AS term FROM documents)
         |  GROUP BY 1, 2),
         |st AS (SELECT term, count(*) AS df,
         |    CAST(sum(c) AS BIGINT) AS cf,
         |    CAST(sum(c * c) AS HUGEINT) AS cf2
         |  FROM pd GROUP BY 1)
         |SELECT term, df, cf,
         |  CAST(cf AS DOUBLE) / CAST(df AS DOUBLE) AS mean_per_doc,
         |  CAST(CAST(df AS HUGEINT) * cf2
         |      - CAST(cf AS HUGEINT) * CAST(cf AS HUGEINT) AS DOUBLE) /
         |    CAST(CAST(df AS HUGEINT) * CAST(cf AS HUGEINT) AS DOUBLE)
         |    AS vmr
         |FROM st ORDER BY df DESC, term ASC LIMIT 20""".stripMargin,
    // the same exact-integer counts and the same pinned IEEE trees;
    // constants exponent-form so DuckDB parses DOUBLE, not DECIMAL
    "text_readability" ->
      s"""WITH c AS (SELECT doc_id,
         |    CAST(len($tokSql) AS BIGINT) AS n_words,
         |    (CAST(len($tokSql) AS BIGINT) + 15) // 16 AS n_sentences,
         |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
         |      AS BIGINT) AS n_syllables
         |  FROM documents)
         |SELECT doc_id, n_words, n_sentences, n_syllables,
         |  206.835e0 - 1.015e0 * (CAST(n_words AS DOUBLE) /
         |      CAST(n_sentences AS DOUBLE)) -
         |    84.6e0 * (CAST(n_syllables AS DOUBLE) /
         |      CAST(n_words AS DOUBLE)) AS flesch_ease,
         |  0.39e0 * (CAST(n_words AS DOUBLE) /
         |      CAST(n_sentences AS DOUBLE)) +
         |    11.8e0 * (CAST(n_syllables AS DOUBLE) /
         |      CAST(n_words AS DOUBLE)) - 15.59e0 AS fk_grade
         |FROM c ORDER BY doc_id""".stripMargin,
    "text_lang_id" ->
      s"""WITH sc AS (
         |  SELECT doc_id, lang,
         |    CAST(len(list_filter($tokSql,
         |      x -> x IN ('the','a','fast','slow'))) AS INT) AS score_en,
         |    CAST(len(list_filter($tokSql,
         |      x -> x IN ('query','table','scan','filter'))) AS INT) AS score_ql,
         |    CAST(len(list_filter($tokSql,
         |      x -> x IN ('data','stream','batch','window'))) AS INT) AS score_df
         |  FROM documents)
         |SELECT doc_id, lang, score_en, score_ql, score_df,
         |  CASE WHEN score_en >= score_ql AND score_en >= score_df THEN 'en'
         |       WHEN score_ql >= score_df THEN 'ql'
         |       ELSE 'df' END AS pred_lang
         |FROM sc ORDER BY doc_id""".stripMargin,
    // the text_lang_id scorer + the confusion rollup with row-profile
    "text_langid_confusion" ->
      s"""WITH sc AS (
         |  SELECT lang AS true_lang,
         |    CAST(len(list_filter($tokSql,
         |      x -> x IN ('the','a','fast','slow'))) AS INT) AS s_en,
         |    CAST(len(list_filter($tokSql,
         |      x -> x IN ('query','table','scan','filter'))) AS INT) AS s_ql,
         |    CAST(len(list_filter($tokSql,
         |      x -> x IN ('data','stream','batch','window'))) AS INT) AS s_df
         |  FROM documents),
         |pr AS (SELECT true_lang,
         |    CASE WHEN s_en >= s_ql AND s_en >= s_df THEN 'en'
         |         WHEN s_ql >= s_df THEN 'ql'
         |         ELSE 'df' END AS pred_lang
         |  FROM sc),
         |cells AS (SELECT true_lang, pred_lang, count(*) AS n
         |  FROM pr GROUP BY 1, 2)
         |SELECT true_lang, pred_lang, n,
         |  CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY true_lang)
         |    AS DOUBLE) AS frac_of_true
         |FROM cells ORDER BY true_lang, pred_lang""".stripMargin,
    // Winnowing replication: per-position base-257 rolling hash mod 2^64
    // (HUGEINT fold over the 16-byte gram), signed reinterpretation, then
    // the window-8 minima — fp_min is the global min (every window minimum
    // covers it), n_fp counts distinct window minima.
    "text_winnow" ->
      s"""WITH $winnowFpCteSql,
         |agg AS (SELECT doc_id, CAST(count(*) AS INT) AS n_fp, min(m) AS fp_min
         |        FROM fp GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(agg.n_fp, 0) AS n_fp, agg.fp_min
         |FROM d LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin,
    // the same winnow fingerprint CTEs, joined into pairs on shared
    // fingerprints (df-capped), counted per pair
    "text_winnow_pairs" ->
      s"""WITH $winnowFpCteSql,
         |dfq AS (SELECT m, count(*) AS df FROM fp GROUP BY 1),
         |f2 AS (SELECT doc_id, fp.m FROM fp JOIN dfq USING (m)
         |  WHERE df <= 50),
         |pr AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
         |    count(*) AS n_shared
         |  FROM f2 a JOIN f2 b ON a.m = b.m AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id1, id2, n_shared FROM pr WHERE n_shared >= 2
         |ORDER BY n_shared DESC, id1 ASC, id2 ASC LIMIT 20""".stripMargin,
    // Rarity: same unigram LM (token → corpus count) rebuilt in SQL; the
    // rare test is the exact integer compare c·V < N, and the two ratios
    // are single double divisions of exact integers.
    "text_rarity" ->
      s"""WITH tok AS (SELECT doc_id, unnest($tokSql) AS w FROM documents),
         |cf AS (SELECT w, count(*) AS c FROM tok GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total,
         |               CAST(count(DISTINCT w) AS BIGINT) AS v_size FROM tok),
         |j AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS sc, count(*) AS n,
         |        CAST(sum(CASE WHEN c * v_size < n_total THEN 1 ELSE 0 END)
         |          AS BIGINT) AS nr
         |      FROM tok JOIN cf USING (w) CROSS JOIN tot GROUP BY 1)
         |SELECT doc_id, CAST(n AS INT) AS n_tokens,
         |  CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) AS mean_tok_cf,
         |  CAST(nr AS DOUBLE) / CAST(n AS DOUBLE) AS rare_frac
         |FROM j ORDER BY doc_id""".stripMargin,
    // Scrub replay: identical regexes (Java regex ∩ RE2 common subset),
    // DuckDB's regexp_replace needs the explicit 'g' flag to match Spark's
    // replace-all semantics.
    "text_pii_scrub" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '\b(customer|supplier|account)\b')) AS INT) AS n_terms,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT)
        |    AS n_emails,
        |  md5(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b(customer|supplier|account)\b', '<REDACTED>', 'g'))
        |    AS scrub_hash
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Repetition signals: exact small-int counts then one double division —
    // token-for-token the same arithmetic as the Spark side.
    "text_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(tk) AS w FROM t),
        |cnt AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY 1, 2),
        |top AS (SELECT doc_id, CAST(max(c) AS INT) AS top_tok_cnt
        |  FROM cnt GROUP BY 1),
        |bg AS (SELECT doc_id, list_transform(
        |    generate_series(1, len(tk) - 1),
        |    i -> tk[i] || ' ' || tk[i + 1]) AS bgs
        |  FROM t)
        |SELECT t.doc_id, CAST(len(tk) AS INT) AS n_tokens, top_tok_cnt,
        |  CAST(top_tok_cnt AS DOUBLE) / CAST(len(tk) AS DOUBLE)
        |    AS top_tok_share,
        |  CASE WHEN len(bgs) = 0 THEN 0.0
        |       ELSE 1.0 - CAST(len(list_distinct(bgs)) AS DOUBLE) /
        |            CAST(len(bgs) AS DOUBLE) END AS dup_bigram_frac
        |FROM t JOIN top ON top.doc_id = t.doc_id
        |JOIN bg ON bg.doc_id = t.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    "text_fingerprint" ->
      """WITH tok AS (SELECT doc_id, text, string_split(text, ' ') AS L
        |             FROM documents),
        |sh AS (SELECT doc_id,
        |         L[i] || ' ' || L[i+1] || ' ' || L[i+2] || ' ' || L[i+3]
        |           || ' ' || L[i+4] AS s
        |       FROM tok,
        |         LATERAL (SELECT unnest(generate_series(1, len(L)-4)) AS i) g)
        |SELECT t.doc_id, md5(t.text) AS content_hash,
        |  (SELECT min(md5(s)) FROM sh WHERE sh.doc_id = t.doc_id)
        |    AS min_shingle_hash
        |FROM tok t ORDER BY t.doc_id""".stripMargin,
    // tf-idf: tf*N and df are exact integers; the single double division is
    // IEEE-correctly-rounded in both engines, so scores AND the rank order
    // they induce are engine-identical.
    "text_tfidf_topk" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |             FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT doc_id, tok, score, CAST(rn AS INT) AS rn FROM (
        |  SELECT doc_id, tok,
        |    CAST(tf * n_docs AS DOUBLE) / df AS score,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY CAST(tf * n_docs AS DOUBLE) / df DESC, tok ASC) AS rn
        |  FROM tf JOIN df USING (tok) CROSS JOIN n) t
        |WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin,
    // Full replication of the bigram-LM pipeline: same bigram extraction,
    // same corpus model, same integer scoring, same quintile assignment
    // (ntile over a total order — avg_c2 DESC then doc_id — is
    // deterministic and SQL-standard in both engines).
    "text_lm_familiarity" ->
      s"""WITH t AS (SELECT doc_id, $tokSql AS tk
         |           FROM documents),
        |bg AS (SELECT doc_id, tk[i] || ' ' || tk[i + 1] AS bigram
        |       FROM t, LATERAL (SELECT unnest(generate_series(1,
        |         len(tk) - 1)) AS i) g),
        |m AS (SELECT bigram, count(*) AS c2 FROM bg GROUP BY 1),
        |sc AS (SELECT doc_id, count(*) AS n_bigrams,
        |         CAST(sum(c2) AS BIGINT) AS familiarity,
        |         min(c2) AS rarest,
        |         CAST(sum(CASE WHEN c2 <= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_rare
        |       FROM bg JOIN m USING (bigram) GROUP BY 1)
        |SELECT doc_id, n_bigrams, familiarity, rarest, n_rare,
        |  CAST(familiarity AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS avg_c2,
        |  CAST(ntile(5) OVER (ORDER BY CAST(familiarity AS DOUBLE) /
        |    CAST(n_bigrams AS DOUBLE) DESC, doc_id ASC) AS INT)
        |    AS quality_bucket
        |FROM sc ORDER BY doc_id""".stripMargin,
    // Same count/argmax/tie arithmetic; the modal tie resolves by min(tok)
    // over the argmax rows in both engines.
    "text_token_dist" ->
      s"""WITH tf AS (SELECT doc_id, tok, count(*) AS c FROM (
         |    SELECT doc_id, unnest($tokSql) AS tok FROM documents) u
         |  GROUP BY 1, 2),
         |st AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |    count(*) AS n_types, max(c) AS top_freq,
         |    CAST(sum(c * (c - 1)) AS BIGINT) AS collisions
         |  FROM tf GROUP BY 1),
         |md AS (SELECT tf.doc_id AS doc_id, min(tok) AS top_tok
         |  FROM tf JOIN st ON st.doc_id = tf.doc_id AND tf.c = st.top_freq
         |  GROUP BY 1)
         |SELECT doc_id, n_tokens, n_types, top_tok, top_freq, collisions
         |FROM st JOIN md USING (doc_id) ORDER BY doc_id""".stripMargin,
    // DISTINCT per-doc grams, gram-wise min(doc_id) first occurrence, and
    // the per-doc novel fraction; generate_series(1, len-2) is empty for
    // <3-token documents exactly as the engine's empty-array explode.
    "text_ngram_novelty" ->
      s"""WITH t AS (SELECT doc_id, $tokSql AS tk FROM documents),
         |g AS (SELECT DISTINCT doc_id,
         |    tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2] AS gram
         |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(tk) - 2))
         |    AS i) s),
         |nd AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY 1),
         |nv AS (SELECT first_doc AS doc_id, count(*) AS n_novel FROM (
         |    SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY 1) f
         |  GROUP BY 1)
         |SELECT doc_id, n_grams, COALESCE(n_novel, 0) AS n_novel,
         |  CAST(COALESCE(n_novel, 0) AS DOUBLE) / CAST(n_grams AS DOUBLE)
         |    AS novelty
         |FROM nd LEFT JOIN nv USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    // Same vocab-weighted pair arithmetic: spaced char symbols over the
    // word vocabulary, adjacent-pair fan-out, exact integer weights.
    "text_bpe_pairs" ->
      s"""WITH $bpeVocabSql,
         |c AS (${bpePairSql("v")})
         |SELECT left_sym, right_sym, weight FROM c
         |ORDER BY weight DESC, left_sym, right_sym LIMIT 20""".stripMargin,
    // Replicates the greedy merge position arithmetic move for move:
    // mark / run-head / running-max carry / parity select / drop-next.
    "text_bpe_merge" ->
      s"""WITH $bpeVocabSql,
         |c0 AS (${bpePairSql("v")}),
         |best AS (SELECT left_sym AS bl, right_sym AS br FROM c0
         |  ORDER BY weight DESC, left_sym, right_sym LIMIT 1),
         |pos AS (SELECT sym, wc, i, tk[i] AS s_i,
         |    CASE WHEN i < len(tk) THEN tk[i + 1] END AS s_next
         |  FROM (SELECT sym, wc, string_split(sym, ' ') AS tk FROM v) t,
         |    LATERAL (SELECT unnest(generate_series(1, len(tk))) AS i) s),
         |mk AS (SELECT pos.*, b.bl, b.br,
         |    CASE WHEN s_i = b.bl AND s_next = b.br THEN 1 ELSE 0 END
         |      AS mark
         |  FROM pos, best b),
         |hd AS (SELECT *, CASE WHEN mark = 1 AND
         |      lag(mark, 1, 0) OVER (PARTITION BY sym ORDER BY i) = 0
         |    THEN 1 ELSE 0 END AS is_head FROM mk),
         |lh AS (SELECT *, max(CASE WHEN is_head = 1 THEN i END)
         |    OVER (PARTITION BY sym ORDER BY i) AS last_head FROM hd),
         |sl AS (SELECT *, CASE WHEN mark = 1 AND (i - last_head) % 2 = 0
         |    THEN 1 ELSE 0 END AS selected FROM lh),
         |ot AS (SELECT sym, wc, i,
         |    CASE WHEN selected = 1 THEN bl || br ELSE s_i END AS o,
         |    lag(selected, 1, 0) OVER (PARTITION BY sym ORDER BY i)
         |      AS prev_sel
         |  FROM sl),
         |m AS (SELECT string_agg(o, ' ' ORDER BY i) AS sym, min(wc) AS wc
         |  FROM ot WHERE prev_sel = 0 GROUP BY sym),
         |c1 AS (${bpePairSql("m")})
         |SELECT left_sym, right_sym, weight FROM c1
         |ORDER BY weight DESC, left_sym, right_sym LIMIT 10""".stripMargin,
    // same two-pass cut derivation over the (lang, score) counts table
    "text_quality_buckets" ->
      s"""WITH sc AS (SELECT doc_id, lang, n_chars,
         |    CAST(len(list_distinct($tokSql)) AS DOUBLE) / len($tokSql)
         |      AS score
         |  FROM documents),
         |cnt AS (SELECT lang, score, count(*) AS c FROM sc GROUP BY 1, 2),
         |cum AS (SELECT lang, score,
         |    sum(c) OVER (PARTITION BY lang ORDER BY score DESC) AS cum,
         |    sum(c) OVER (PARTITION BY lang) AS n
         |  FROM cnt),
         |cuts AS (SELECT lang,
         |    max(CASE WHEN cum * 3 >= n THEN score END) AS c1,
         |    max(CASE WHEN cum * 3 >= n * 2 THEN score END) AS c2
         |  FROM cum GROUP BY 1)
         |SELECT s.lang,
         |  CASE WHEN score >= c1 THEN 'head'
         |       WHEN score >= c2 THEN 'middle' ELSE 'tail' END AS bucket,
         |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |  min(score) AS min_score, max(score) AS max_score
         |FROM sc s JOIN cuts USING (lang)
         |GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin,
    // the built-in levenshtein capped at k+1 replicates the banded kernel
    "text_spell_candidates" ->
      """WITH w AS (SELECT word, count(*) AS n FROM (
        |    SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
        |  WHERE word <> '' GROUP BY 1),
        |dict AS (SELECT word AS dict_word FROM w
        |  ORDER BY n DESC, word ASC LIMIT 10)
        |SELECT w.word, w.n, dict_word,
        |  CAST(least(levenshtein(w.word, dict_word), 3) AS INT) AS dist
        |FROM w JOIN dict ON abs(length(w.word) - length(dict_word)) <= 2
        |  AND w.word <> dict_word
        |WHERE levenshtein(w.word, dict_word) <= 2
        |ORDER BY word, dict_word""".stripMargin,
    "text_bpe_roundtrip" -> {
      val chain = BpeMerges.foldLeft(
        "'  ' || regexp_replace(word, '(.)', '\\1  ', 'g')") {
        case (acc, (from, to)) =>
          s"replace($acc, ' ${from.replace(" ", "  ")} ', ' $to ')"
      }
      s"""WITH w AS (SELECT lang, unnest(string_split(text, ' ')) AS word
         |    FROM documents),
         |enc AS (SELECT lang, word,
         |    array_to_string(list_filter(string_split(trim($chain), ' '),
         |      x -> x <> ''), '') AS rt
         |  FROM w WHERE word <> '')
         |SELECT lang, count(*) AS n_words,
         |  count(CASE WHEN rt = word THEN 1 END) AS n_ok
         |FROM enc GROUP BY lang ORDER BY lang""".stripMargin
    },
    // same doubled-separator chain as text_bpe_encode, rolled up per lang
    "text_vocab_coverage" -> {
      val chain = BpeMerges.foldLeft(
        "'  ' || regexp_replace(word, '(.)', '\\1  ', 'g')") {
        case (acc, (from, to)) =>
          s"replace($acc, ' ${from.replace(" ", "  ")} ', ' $to ')"
      }
      s"""WITH w AS (SELECT lang, unnest(string_split(text, ' ')) AS word
         |    FROM documents),
         |enc AS (SELECT lang, length(word) AS nc,
         |    list_filter(string_split(trim($chain), ' '), x -> x <> '')
         |      AS toks
         |  FROM w WHERE word <> ''),
         |g AS (SELECT lang, count(*) AS n_words,
         |    CAST(sum(nc) AS BIGINT) AS n_chars,
         |    CAST(sum(len(toks)) AS BIGINT) AS n_tokens,
         |    CAST(sum(len(list_filter(toks, t -> length(t) > 1)))
         |      AS BIGINT) AS n_merged
         |  FROM enc GROUP BY lang)
         |SELECT lang, n_words, n_tokens, n_merged,
         |  CAST(n_chars AS DOUBLE) / n_tokens AS chars_per_token
         |FROM g ORDER BY lang""".stripMargin
    },
    // the four prefix-k replace chains side by side, as the operator
    "text_bpe_compression_curve" -> {
      def chainK(k: Int): String =
        BpeMerges.take(k).foldLeft(
          "'  ' || regexp_replace(word, '(.)', '\\1  ', 'g')") {
          case (acc, (from, to)) =>
            s"replace($acc, ' ${from.replace(" ", "  ")} ', ' $to ')"
        }
      def tokLen(k: Int): String =
        s"len(list_filter(string_split(trim(${chainK(k)}), ' '), " +
          s"x -> x <> ''))"
      s"""WITH w AS (SELECT unnest(string_split(text, ' ')) AS word
         |    FROM documents),
         |e AS (SELECT length(word) AS nc, ${tokLen(0)} AS t0,
         |    ${tokLen(2)} AS t2, ${tokLen(4)} AS t4, ${tokLen(8)} AS t8
         |  FROM w WHERE word <> ''),
         |g AS (SELECT count(*) AS nw, CAST(sum(nc) AS BIGINT) AS nc,
         |    CAST(sum(t0) AS BIGINT) AS t0, CAST(sum(t2) AS BIGINT) AS t2,
         |    CAST(sum(t4) AS BIGINT) AS t4, CAST(sum(t8) AS BIGINT) AS t8
         |  FROM e)
         |SELECT CAST(0 AS INT) AS n_merges, nw AS n_words, t0 AS n_tokens,
         |  CAST(nc AS DOUBLE) / CAST(t0 AS DOUBLE) AS chars_per_token
         |FROM g
         |UNION ALL SELECT 2, nw, t2, CAST(nc AS DOUBLE) / CAST(t2 AS DOUBLE)
         |FROM g
         |UNION ALL SELECT 4, nw, t4, CAST(nc AS DOUBLE) / CAST(t4 AS DOUBLE)
         |FROM g
         |UNION ALL SELECT 8, nw, t8, CAST(nc AS DOUBLE) / CAST(t8 AS DOUBLE)
         |FROM g
         |ORDER BY n_merges""".stripMargin
    },
    // the same per-position substring fan-out and (lang, gram) counts
    "text_char_trigrams" ->
      """WITH g AS (SELECT lang, text[i:i+2] AS g
        |  FROM documents,
        |    LATERAL (SELECT unnest(generate_series(1, length(text) - 2))
        |      AS i) p
        |  WHERE length(text) >= 3),
        |c AS (SELECT lang, g, count(*) AS n FROM g GROUP BY 1, 2),
        |t AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_lang FROM c
        |  GROUP BY 1),
        |r AS (SELECT lang, g, n, CAST(row_number() OVER (
        |    PARTITION BY lang ORDER BY n DESC, g ASC) AS INT) AS rk
        |  FROM c)
        |SELECT r.lang, rk, g, n,
        |  CAST(n AS DOUBLE) / CAST(n_lang AS DOUBLE) AS share
        |FROM r JOIN t ON t.lang = r.lang
        |WHERE rk <= 5 ORDER BY r.lang, rk""".stripMargin,
    // the same doubled-separator encode chain, grouped by lang
    "text_bpe_fertility" -> {
      val chain = BpeMerges.foldLeft(
        "'  ' || regexp_replace(word, '(.)', '\\1  ', 'g')") {
        case (acc, (from, to)) =>
          s"replace($acc, ' ${from.replace(" ", "  ")} ', ' $to ')"
      }
      s"""WITH w AS (SELECT lang, unnest(string_split(text, ' ')) AS word
         |    FROM documents),
         |e AS (SELECT lang, length(word) AS nc,
         |    len(list_filter(string_split(trim($chain), ' '),
         |      x -> x <> '')) AS nt
         |  FROM w WHERE word <> ''),
         |g AS (SELECT lang, count(*) AS n_words,
         |    CAST(sum(nt) AS BIGINT) AS n_tokens,
         |    CAST(sum(nc) AS BIGINT) AS nc
         |  FROM e GROUP BY 1)
         |SELECT lang, n_words, n_tokens,
         |  CAST(n_tokens AS DOUBLE) / CAST(n_words AS DOUBLE) AS fertility,
         |  CAST(nc AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS chars_per_token
         |FROM g ORDER BY lang""".stripMargin
    },
    // doubled separators mirror the operator's shared-boundary fix
    "text_bpe_encode" -> {
      val chain = BpeMerges.foldLeft(
        "'  ' || regexp_replace(word, '(.)', '\\1  ', 'g')") {
        case (acc, (from, to)) =>
          s"replace($acc, ' ${from.replace(" ", "  ")} ', ' $to ')"
      }
      s"""WITH w AS (SELECT unnest(string_split(text, ' ')) AS word
         |    FROM documents),
         |enc AS (SELECT $chain AS s FROM w WHERE word <> ''),
         |tok AS (SELECT unnest(string_split(trim(s), ' ')) AS token
         |    FROM enc)
         |SELECT token, count(*) AS n FROM tok WHERE token <> ''
         |GROUP BY token ORDER BY n DESC, token ASC LIMIT 30""".stripMargin
    },
    // Same packed (doc_id, seg_id) min key; string_agg/CASE drops NULLs
    // exactly as collect_list does, and the all-segments-dropped document
    // renders as '' under both engines (coalesce / concat_ws-over-empty).
    "text_segment_dedup" ->
      s"""WITH $segCteSql,
         |keep AS (SELECT segtext, min(doc_id * 1000000 + seg_id) AS firstk
         |  FROM seg GROUP BY segtext)
         |SELECT s.doc_id, count(*) AS n_segs,
         |  CAST(sum(CASE WHEN s.doc_id * 1000000 + s.seg_id <> k.firstk
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
         |  coalesce(string_agg(
         |    CASE WHEN s.doc_id * 1000000 + s.seg_id = k.firstk
         |      THEN s.segtext END, ' ' ORDER BY s.seg_id), '') AS clean_text
         |FROM seg s JOIN keep k ON s.segtext = k.segtext
         |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,
    "text_boilerplate_scrub" ->
      s"""WITH $segCteSql,
         |hot AS (SELECT segtext FROM (
         |    SELECT segtext, count(DISTINCT doc_id) AS nd
         |    FROM seg GROUP BY segtext) c
         |  WHERE nd >= 3)
         |SELECT s.doc_id, count(*) AS n_segs,
         |  CAST(sum(CASE WHEN h.segtext IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_boiler,
         |  coalesce(string_agg(CASE WHEN h.segtext IS NULL THEN s.segtext END,
         |    ' ' ORDER BY s.seg_id), '') AS clean_text
         |FROM seg s LEFT JOIN hot h ON s.segtext = h.segtext
         |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,
    // exact counts over the full token stream with the same integer cut —
    // the sketch is invisible to the semantics, which is the point
    "text_heavy_hitters" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |tot AS (SELECT count(*) AS n FROM tok)
        |SELECT token, count(*) AS cnt FROM tok, tot
        |GROUP BY token, tot.n HAVING count(*) * 200 > n
        |ORDER BY token""".stripMargin,
    // shared-ln-table entropy (see the query comment): identical fold
    // order via list_sort, identical IEEE tree, zero runtime logs —
    // LN[c+1] is the same literal double Spark's element_at reads
    "text_entropy" ->
      s"""WITH b AS (SELECT doc_id, length(text) AS n,
         |    regexp_extract_all(text, '.') AS cs, $tokSql AS tk,
         |    $lnTableSql AS LN
         |  FROM documents),
         |c AS (SELECT doc_id, n, LN,
         |    list_transform(list_sort(list_distinct(cs)),
         |      x -> len(list_filter(cs, c -> c = x))) AS cc,
         |    CAST(len(tk) AS INT) AS n_tokens,
         |    list_transform(list_sort(list_distinct(tk)),
         |      x -> len(list_filter(tk, c -> c = x))) AS tc
         |  FROM b)
         |SELECT doc_id, CAST(n AS INT) AS n_chars_obs,
         |  (CAST(n AS DOUBLE) * LN[n + 1] -
         |   list_reduce(list_transform(cc, c -> CAST(c AS DOUBLE) * LN[c + 1]),
         |     (a, b) -> a + b))
         |   / (CAST(n AS DOUBLE) * LN[3]) AS h_char,
         |  n_tokens,
         |  (CAST(n_tokens AS DOUBLE) * LN[n_tokens + 1] -
         |   list_reduce(list_transform(tc, c -> CAST(c AS DOUBLE) * LN[c + 1]),
         |     (a, b) -> a + b))
         |   / (CAST(n_tokens AS DOUBLE) * LN[3]) AS h_token
         |FROM c ORDER BY doc_id""".stripMargin,
    "text_keyness" ->
      """WITH tok AS (SELECT lang,
        |    unnest(string_split(text, ' ')) AS token FROM documents),
        |lt AS (SELECT lang, token, count(*) AS c_lt FROM tok GROUP BY 1, 2),
        |sc AS (SELECT lang, token, c_lt,
        |    sum(c_lt) OVER (PARTITION BY token) AS c_t,
        |    sum(c_lt) OVER (PARTITION BY lang) AS c_l,
        |    sum(c_lt) OVER () AS n_total
        |  FROM lt),
        |r AS (SELECT lang, token, c_lt,
        |    CAST(c_lt * n_total AS DOUBLE) / CAST(c_t * c_l AS DOUBLE)
        |      AS lift
        |  FROM sc WHERE c_lt >= 5),
        |rk AS (SELECT lang, token, c_lt, lift,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY lift DESC, token ASC) AS rk
        |  FROM r)
        |SELECT lang, rk, token, c_lt, lift FROM rk
        |WHERE rk <= 10 ORDER BY lang, rk""".stripMargin,
    // e0-suffixed literals parse as DOUBLE (bare decimals are DECIMAL in
    // DuckDB — see lnTableSql); the operand tree mirrors bm25From exactly
    "text_bm25" ->
      s"""WITH d AS (SELECT doc_id, $tokSql AS L FROM documents),
         |stats AS (SELECT count(*) AS n,
         |    CAST(sum(len(L)) AS BIGINT) AS total_tok FROM d),
         |tf AS (SELECT doc_id, tok, count(*) AS tf
         |  FROM (SELECT doc_id, unnest(L) AS tok FROM d)
         |  WHERE tok IN ('hash', 'join') GROUP BY 1, 2),
         |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
         |dl AS (SELECT doc_id, len(L) AS dl FROM d),
         |sc AS (SELECT tf.doc_id, tf.tok, tf.tf,
         |    ((CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5e0) /
         |      (CAST(df AS DOUBLE) + 0.5e0)) *
         |    ((CAST(tf AS DOUBLE) * 2.2e0) / (CAST(tf AS DOUBLE) +
         |      1.2e0 * (0.25e0 + 0.75e0 * (CAST(dl AS DOUBLE) /
         |        (CAST(total_tok AS DOUBLE) / CAST(n AS DOUBLE))))))
         |      AS score
         |  FROM tf JOIN df USING (tok) JOIN dl USING (doc_id)
         |  CROSS JOIN stats)
         |SELECT doc_id,
         |  CAST(coalesce(max(CASE WHEN tok = 'hash' THEN tf END), 0)
         |    AS BIGINT) AS tf_1,
         |  CAST(coalesce(max(CASE WHEN tok = 'join' THEN tf END), 0)
         |    AS BIGINT) AS tf_2,
         |  coalesce(max(CASE WHEN tok = 'hash' THEN score END), 0e0) +
         |    coalesce(max(CASE WHEN tok = 'join' THEN score END), 0e0)
         |    AS score
         |FROM sc GROUP BY doc_id
         |ORDER BY score DESC, doc_id ASC LIMIT 20""".stripMargin,
    "text_phrase_search" ->
      s"""WITH t AS (SELECT doc_id, $tokSql AS L FROM documents),
         |p AS (SELECT doc_id, CAST(i - 1 AS INT) AS pos, L[i] AS tok
         |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(L)))
         |    AS i) g
         |  WHERE L[i] IN ('hash', 'join'))
         |SELECT a.doc_id, count(*) AS n_phrase, min(a.pos) AS first_pos
         |FROM p a JOIN p b ON a.doc_id = b.doc_id
         |  AND a.tok = 'hash' AND b.tok = 'join' AND b.pos = a.pos + 1
         |GROUP BY 1 ORDER BY a.doc_id""".stripMargin,
    // Gopher replication: per-doc top n-gram masses via unnest+group
    // (equivalent to the Spark sorted-run fold: both compute max over
    // distinct shingles of len·count), exact-integer rule flags.
    "text_gopher_quality" ->
      s"""WITH $gopherCteSql
         |SELECT doc_id, CAST(nw AS INT) AS n_words,
         |  CAST(nstop AS INT) AS n_stop,
         |  CAST(sumw AS DOUBLE) / CAST(nw AS DOUBLE) AS mean_word_len,
         |  CAST(mass2 AS DOUBLE) / CAST(chars AS DOUBLE) AS top2_frac,
         |  CAST(mass3 AS DOUBLE) / CAST(chars AS DOUBLE) AS top3_frac,
         |  CAST(mass4 AS DOUBLE) / CAST(chars AS DOUBLE) AS top4_frac,
         |  NOT (fw OR fm OR fs OR f2 OR f3 OR f4) AS keep
         |FROM flags ORDER BY doc_id""".stripMargin,
    "text_gopher_funnel" ->
      s"""WITH $gopherCteSql,
         |a AS (SELECT
         |  CAST(sum(CASE WHEN fw THEN 1 ELSE 0 END) AS BIGINT) AS f0,
         |  CAST(sum(CASE WHEN fw AND NOT fm AND NOT fs AND NOT f2
         |    AND NOT f3 AND NOT f4 THEN 1 ELSE 0 END) AS BIGINT) AS u0,
         |  CAST(sum(CASE WHEN NOT fw THEN 1 ELSE 0 END) AS BIGINT) AS c0,
         |  CAST(sum(CASE WHEN fm THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         |  CAST(sum(CASE WHEN fm AND NOT fw AND NOT fs AND NOT f2
         |    AND NOT f3 AND NOT f4 THEN 1 ELSE 0 END) AS BIGINT) AS u1,
         |  CAST(sum(CASE WHEN NOT fw AND NOT fm THEN 1 ELSE 0 END)
         |    AS BIGINT) AS c1,
         |  CAST(sum(CASE WHEN fs THEN 1 ELSE 0 END) AS BIGINT) AS f2_,
         |  CAST(sum(CASE WHEN fs AND NOT fw AND NOT fm AND NOT f2
         |    AND NOT f3 AND NOT f4 THEN 1 ELSE 0 END) AS BIGINT) AS u2,
         |  CAST(sum(CASE WHEN NOT fw AND NOT fm AND NOT fs THEN 1
         |    ELSE 0 END) AS BIGINT) AS c2,
         |  CAST(sum(CASE WHEN f2 THEN 1 ELSE 0 END) AS BIGINT) AS f3_,
         |  CAST(sum(CASE WHEN f2 AND NOT fw AND NOT fm AND NOT fs
         |    AND NOT f3 AND NOT f4 THEN 1 ELSE 0 END) AS BIGINT) AS u3,
         |  CAST(sum(CASE WHEN NOT fw AND NOT fm AND NOT fs AND NOT f2
         |    THEN 1 ELSE 0 END) AS BIGINT) AS c3,
         |  CAST(sum(CASE WHEN f3 THEN 1 ELSE 0 END) AS BIGINT) AS f4_,
         |  CAST(sum(CASE WHEN f3 AND NOT fw AND NOT fm AND NOT fs
         |    AND NOT f2 AND NOT f4 THEN 1 ELSE 0 END) AS BIGINT) AS u4,
         |  CAST(sum(CASE WHEN NOT fw AND NOT fm AND NOT fs AND NOT f2
         |    AND NOT f3 THEN 1 ELSE 0 END) AS BIGINT) AS c4,
         |  CAST(sum(CASE WHEN f4 THEN 1 ELSE 0 END) AS BIGINT) AS f5,
         |  CAST(sum(CASE WHEN f4 AND NOT fw AND NOT fm AND NOT fs
         |    AND NOT f2 AND NOT f3 THEN 1 ELSE 0 END) AS BIGINT) AS u5,
         |  CAST(sum(CASE WHEN NOT fw AND NOT fm AND NOT fs AND NOT f2
         |    AND NOT f3 AND NOT f4 THEN 1 ELSE 0 END) AS BIGINT) AS c5
         |  FROM flags)
         |SELECT CAST(0 AS INT) AS rule_ord, 'words' AS rule, f0 AS n_fail,
         |  u0 AS n_unique_fail, c0 AS n_survive_cum FROM a
         |UNION ALL SELECT 1, 'mwl', f1, u1, c1 FROM a
         |UNION ALL SELECT 2, 'stop', f2_, u2, c2 FROM a
         |UNION ALL SELECT 3, 'top2', f3_, u3, c3 FROM a
         |UNION ALL SELECT 4, 'top3', f4_, u4, c4 FROM a
         |UNION ALL SELECT 5, 'top4', f5, u5, c5 FROM a
         |ORDER BY rule_ord""".stripMargin,
    // the same bigram/marginal/continuation counts and the identical
    // discounting tree (c >= 1 makes the max() vanish on both sides)
    "text_kn_bigram" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS L
        |  FROM documents),
        |pr AS (SELECT L[i] AS w1, L[i + 1] AS w2
        |  FROM tok,
        |    LATERAL (SELECT unnest(generate_series(1, len(L) - 1)) AS i) g),
        |bg AS (SELECT w1, w2, count(*) AS c_ab FROM pr GROUP BY 1, 2),
        |lft AS (SELECT w1, CAST(sum(c_ab) AS BIGINT) AS c_left,
        |    count(*) AS n_right
        |  FROM bg GROUP BY 1),
        |rgt AS (SELECT w2, count(*) AS n_left FROM bg GROUP BY 1),
        |nb AS (SELECT count(*) AS n_bigrams FROM bg)
        |SELECT bg.w1, bg.w2, bg.c_ab,
        |  (CAST(bg.c_ab AS DOUBLE) - 0.75) / CAST(lft.c_left AS DOUBLE) +
        |    (0.75 * CAST(lft.n_right AS DOUBLE) /
        |      CAST(lft.c_left AS DOUBLE)) *
        |    (CAST(rgt.n_left AS DOUBLE) / CAST(nb.n_bigrams AS DOUBLE))
        |    AS p_kn
        |FROM bg JOIN lft USING (w1) JOIN rgt USING (w2), nb
        |WHERE bg.c_ab >= 3
        |ORDER BY bg.c_ab DESC, bg.w1 ASC, bg.w2 ASC LIMIT 30""".stripMargin,
    // same count/rank/cross-product arithmetic; rank assigned AFTER the
    // top-20 cut on the identical (n DESC, tok ASC) total order
    // the naive positional self-join the array-local plan must equal:
    // all pairs with |Δpos| in {1, 2}
    "text_skipgrams" ->
      s"""WITH t AS (SELECT doc_id, $tokSql AS L FROM documents),
         |tok AS (SELECT doc_id, i AS pos, L[i] AS w
         |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(L))) AS i)
         |    g),
         |p AS (SELECT a.w AS center, b.w AS ctx
         |  FROM tok a JOIN tok b
         |    ON a.doc_id = b.doc_id AND abs(a.pos - b.pos) BETWEEN 1 AND 2)
         |SELECT center, ctx, count(*) AS n_pairs
         |FROM p GROUP BY 1, 2
         |ORDER BY n_pairs DESC, center, ctx LIMIT 30""".stripMargin,
    "text_heaps_law" ->
      s"""WITH tok AS (SELECT doc_id, unnest($tokSql) AS w FROM documents),
         |md AS (SELECT max(doc_id) AS maxd FROM documents),
         |tb AS (SELECT doc_id, w,
         |    CAST(doc_id * 10 // (maxd + 1) AS INTEGER) + 1 AS b
         |  FROM tok, md),
         |tpb AS (SELECT b, count(*) AS toks FROM tb GROUP BY b),
         |fb AS (SELECT b, count(*) AS new_words FROM (
         |    SELECT w, min(b) AS b FROM tb GROUP BY w) GROUP BY b)
         |SELECT b,
         |  CAST(sum(toks) OVER (ORDER BY b) AS BIGINT) AS tokens_cum,
         |  CAST(sum(coalesce(new_words, 0)) OVER (ORDER BY b) AS BIGINT)
         |    AS vocab_cum,
         |  coalesce(new_words, CAST(0 AS BIGINT)) AS new_words
         |FROM tpb LEFT JOIN fb USING (b) ORDER BY b""".stripMargin,
    "text_zipf_check" ->
      s"""WITH tf AS (SELECT unnest($tokSql) AS tok FROM documents),
         |c AS (SELECT tok, count(*) AS n FROM tf GROUP BY 1),
         |top AS (SELECT tok, n FROM c ORDER BY n DESC, tok ASC LIMIT 20),
         |r AS (SELECT tok, n, CAST(row_number() OVER (
         |    ORDER BY n DESC, tok ASC) AS INT) AS rank FROM top),
         |f AS (SELECT max(n) AS n1 FROM top)
         |SELECT rank, tok, n, rank * n AS rank_x_n,
         |  CAST(rank * n AS DOUBLE) / CAST(n1 AS DOUBLE) AS c_norm
         |FROM r, f ORDER BY rank""".stripMargin,
    "text_ttr_buckets" ->
      s"""WITH tk AS (SELECT CAST(len($tokSql) AS BIGINT) AS n,
         |    CAST(len(list_distinct($tokSql)) AS BIGINT) AS u
         |  FROM documents)
         |SELECT n - (n % 50) AS len_bucket, count(*) AS n_docs,
         |  CAST(sum(n) AS BIGINT) AS sum_tokens,
         |  CAST(sum(u) AS BIGINT) AS sum_types,
         |  CAST(sum(u) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS pooled_ttr
         |FROM tk GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_word_len_dist" ->
      s"""WITH t AS (SELECT lang, unnest($tokSql) AS tok FROM documents),
         |h AS (SELECT lang, CAST(length(tok) AS INT) AS len,
         |    count(*) AS n
         |  FROM t GROUP BY 1, 2),
         |tot AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_lang
         |  FROM h GROUP BY 1)
         |SELECT h.lang, len, n,
         |  CAST(n AS DOUBLE) / CAST(n_lang AS DOUBLE) AS share
         |FROM h JOIN tot ON tot.lang = h.lang
         |ORDER BY h.lang, len""".stripMargin,
    "text_stopword_buckets" ->
      s"""WITH tk AS (SELECT lang,
         |    CAST(len(list_filter($tokSql,
         |      x -> x IN ('the','a','of','and','to','in'))) AS BIGINT)
         |      AS ns,
         |    CAST(len($tokSql) AS BIGINT) AS nt
         |  FROM documents)
         |SELECT lang, (ns * 10) // nt AS decile, count(*) AS n_docs
         |FROM tk GROUP BY 1, 2 ORDER BY lang, decile""".stripMargin,
    "text_prefix_dup" ->
      """SELECT substr(text, 1, 32) AS prefix, count(*) AS n_docs,
        |  min(doc_id) AS keep_doc
        |FROM documents GROUP BY 1 HAVING count(*) >= 2
        |ORDER BY prefix""".stripMargin,
    "text_hapax_share" ->
      s"""WITH tf AS (SELECT source, tok, count(*) AS n FROM (
         |    SELECT source, unnest($tokSql) AS tok FROM documents)
         |  GROUP BY 1, 2)
         |SELECT source, count(*) AS vocab,
         |  count(CASE WHEN n = 1 THEN 1 END) AS hapax,
         |  CAST(count(CASE WHEN n = 1 THEN 1 END) AS DOUBLE) /
         |    CAST(count(*) AS DOUBLE) AS hapax_share
         |FROM tf GROUP BY source ORDER BY source""".stripMargin,
    // regexp_replace needs the 'g' flag in DuckDB (Spark replaces all
    // matches by default)
    "text_case_profile" ->
      """WITH c AS (SELECT lang,
        |    CAST(length(regexp_replace(text, '[^A-Z]', '', 'g'))
        |      AS BIGINT) AS u,
        |    CAST(length(regexp_replace(text, '[^a-z]', '', 'g'))
        |      AS BIGINT) AS l,
        |    CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
        |      AS BIGINT) AS g,
        |    CAST(length(text) AS BIGINT) AS n
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS n_chars,
        |  CAST(sum(u) AS BIGINT) AS n_upper,
        |  CAST(sum(l) AS BIGINT) AS n_lower,
        |  CAST(sum(g) AS BIGINT) AS n_digit,
        |  CAST(sum(u) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS upper_share
        |FROM c GROUP BY lang ORDER BY lang""".stripMargin,
    // Same quantized cost table (exact integer division into the shared
    // ln list), same Viterbi DP (forward recursion carries best[i] and
    // best[i-1]; backtrack recomputes the <=-prefers-bigram tie rule
    // against the stored forward values) — DuckDB's recursive CTEs play
    // the role of the codegen'd integer DP kernel.
    "text_unigram_em" ->
      s"""WITH RECURSIVE
         |lt AS (SELECT $lnTableSql AS l),
         |w0 AS (SELECT unnest($tokSql) AS word FROM documents),
         |words AS (SELECT word, count(*) AS wn FROM w0
         |  WHERE word <> '' AND length(word) <= 16 GROUP BY word),
         |cf AS (SELECT substr(word, CAST(g AS INT), 1) AS p,
         |    CAST(sum(wn) AS BIGINT) AS f
         |  FROM (SELECT word, wn, unnest(range(1, length(word)+1)) AS g
         |    FROM words) GROUP BY 1),
         |bf AS (SELECT substr(word, CAST(g AS INT), 2) AS p,
         |    CAST(sum(wn) AS BIGINT) AS f
         |  FROM (SELECT word, wn, unnest(range(1, length(word))) AS g
         |    FROM words)
         |  GROUP BY 1 ORDER BY f DESC, p ASC LIMIT 30),
         |tot AS (SELECT CAST(sum(f) AS BIGINT) AS t FROM cf),
         |vocab AS (
         |  SELECT p, CAST(floor(1000.0*(l[1025] -
         |      l[CAST((1023*f) // t AS INT) + 2]) + 0.5) AS BIGINT) AS cost
         |    FROM cf, tot, lt
         |  UNION ALL
         |  SELECT p, CAST(floor(1000.0*(l[1025] -
         |      l[CAST((1023*f) // t AS INT) + 2]) + 0.5) AS BIGINT) AS cost
         |    FROM bf, tot, lt),
         |dp AS (
         |  SELECT word, 0 AS i, CAST(0 AS BIGINT) AS best,
         |    CAST(NULL AS BIGINT) AS prevb FROM words
         |  UNION ALL
         |  SELECT d.word, d.i + 1,
         |    CASE WHEN d.i + 1 >= 2 AND b.cost IS NOT NULL
         |        AND d.prevb + b.cost <= d.best + c.cost
         |      THEN d.prevb + b.cost ELSE d.best + c.cost END,
         |    d.best
         |  FROM dp d
         |  JOIN vocab c ON c.p = substr(d.word, d.i + 1, 1)
         |  LEFT JOIN vocab b ON d.i + 1 >= 2
         |    AND b.p = substr(d.word, d.i, 2)
         |  WHERE d.i < length(d.word)),
         |bt AS (
         |  SELECT word, length(word) AS pos, CAST(NULL AS VARCHAR) AS piece
         |    FROM words
         |  UNION ALL
         |  SELECT t.word,
         |    t.pos - CASE WHEN t.pos >= 2 AND b.cost IS NOT NULL
         |        AND d2.best + b.cost <= d1.best + c.cost THEN 2 ELSE 1 END,
         |    CASE WHEN t.pos >= 2 AND b.cost IS NOT NULL
         |        AND d2.best + b.cost <= d1.best + c.cost
         |      THEN substr(t.word, t.pos - 1, 2)
         |      ELSE substr(t.word, t.pos, 1) END
         |  FROM bt t
         |  JOIN dp d1 ON d1.word = t.word AND d1.i = t.pos - 1
         |  JOIN vocab c ON c.p = substr(t.word, t.pos, 1)
         |  LEFT JOIN dp d2 ON t.pos >= 2 AND d2.word = t.word
         |    AND d2.i = t.pos - 2
         |  LEFT JOIN vocab b ON t.pos >= 2
         |    AND b.p = substr(t.word, t.pos - 1, 2)
         |  WHERE t.pos > 0)
         |SELECT bt.piece, CAST(sum(words.wn) AS BIGINT) AS em_count
         |FROM bt JOIN words ON bt.word = words.word
         |WHERE bt.piece IS NOT NULL
         |GROUP BY bt.piece ORDER BY em_count DESC, piece ASC
         |LIMIT 40""".stripMargin,
    // Unigram ids: xxh64(token, 42) mod 4096. Bigram ids: seed CHAINING,
    // xxh64(tok2, seed = unsigned(xxh64(tok1, 42))) — exactly Spark's
    // multi-column xxhash64 contract (each column hashed with the running
    // hash as seed); the CASE re-biases the signed BIGINT back to the
    // unsigned seed domain. Weights derive from the id by the pinned
    // integer formula — fully integer downstream.
    "text_quality_classifier" -> {
      val h1 = XxhSql.expr("a", "42")
      val chained = XxhSql.expr("b",
        "CASE WHEN h1 < 0 THEN h1::HUGEINT + 18446744073709551616 " +
          "ELSE h1::HUGEINT END")
      s"""WITH tk AS (SELECT doc_id, list_filter($tokSql, x -> x <> '') AS ts
         |    FROM documents),
         |tk1 AS (SELECT doc_id, ts FROM tk WHERE len(ts) >= 1),
         |uni AS (SELECT doc_id, unnest(ts) AS a FROM tk1),
         |uh AS (SELECT doc_id,
         |    ((${XxhSql.expr("a", "42")}) % 4096 + 4096) % 4096 AS fid
         |  FROM uni),
         |pr AS (SELECT doc_id, ts[g] AS a, ts[g + 1] AS b
         |  FROM (SELECT doc_id, ts, CAST(unnest(range(1, len(ts))) AS INT)
         |      AS g FROM tk1 WHERE len(ts) >= 2)),
         |ph0 AS (SELECT doc_id, b, ($h1) AS h1 FROM pr),
         |ph AS (SELECT doc_id, (($chained) % 4096 + 4096) % 4096 AS fid
         |  FROM ph0),
         |f AS (SELECT doc_id, fid FROM uh UNION ALL
         |      SELECT doc_id, fid FROM ph),
         |w AS (SELECT doc_id, (fid * 2654435761) % 2001 - 1000 AS w FROM f)
         |SELECT doc_id, count(*) AS n_feats,
         |  CAST(sum(w) AS BIGINT) AS score,
         |  CAST(sum(w) AS BIGINT) < 0 AS flagged_low_quality
         |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin
    }
  )

  /** The Gopher flags table as a DuckDB CTE body — the oracle replica of
    * [[gopherFlagsFrom]]: per-doc word/stopword/char stats, the three
    * top-gram masses, and the six exact-integer rule flags.
    */
  private val gopherCteSql =
    """tk AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS chars,
      |    string_split(text, ' ') AS t FROM documents),
      |base AS (SELECT doc_id, chars, len(t) AS nw,
      |    len(list_filter(t,
      |      x -> x IN ('the','a','of','and','to','in'))) AS nstop,
      |    chars - (len(t) - 1) AS sumw FROM tk),
      |g2 AS (SELECT doc_id, max(length(g) * cnt) AS mass2 FROM (
      |    SELECT doc_id, t[i] || ' ' || t[i + 1] AS g,
      |      CAST(count(*) AS BIGINT) AS cnt
      |    FROM tk, LATERAL (SELECT
      |      unnest(generate_series(1, len(t) - 1)) AS i) s
      |    GROUP BY 1, 2) q GROUP BY 1),
      |g3 AS (SELECT doc_id, max(length(g) * cnt) AS mass3 FROM (
      |    SELECT doc_id, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS g,
      |      CAST(count(*) AS BIGINT) AS cnt
      |    FROM tk, LATERAL (SELECT
      |      unnest(generate_series(1, len(t) - 2)) AS i) s
      |    GROUP BY 1, 2) q GROUP BY 1),
      |g4 AS (SELECT doc_id, max(length(g) * cnt) AS mass4 FROM (
      |    SELECT doc_id,
      |      t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3]
      |        AS g,
      |      CAST(count(*) AS BIGINT) AS cnt
      |    FROM tk, LATERAL (SELECT
      |      unnest(generate_series(1, len(t) - 3)) AS i) s
      |    GROUP BY 1, 2) q GROUP BY 1),
      |flags AS (SELECT b.doc_id, nw, nstop, sumw, chars,
      |    coalesce(mass2, 0) AS mass2, coalesce(mass3, 0) AS mass3,
      |    coalesce(mass4, 0) AS mass4,
      |    (nw < 20 OR nw > 90) AS fw,
      |    (sumw < 3 * nw OR sumw > 10 * nw) AS fm,
      |    (nstop < 2) AS fs,
      |    (coalesce(mass2, 0) * 5 > chars) AS f2,
      |    (coalesce(mass3, 0) * 50 > chars * 9) AS f3,
      |    (coalesce(mass4, 0) * 25 > chars * 4) AS f4
      |  FROM base b LEFT JOIN g2 USING (doc_id)
      |    LEFT JOIN g3 USING (doc_id) LEFT JOIN g4 USING (doc_id))"""
      .stripMargin

  /** The 3-word segment instance stream as a DuckDB CTE body — the oracle
    * replica of [[segmentsOf]]: 1-based word index i maps to segment
    * (i-1)//3, remainder segment included, space-rejoined in word order.
    */
  private val segCteSql =
    """t AS (SELECT doc_id, string_split(text, ' ') AS L FROM documents),
      |w AS (SELECT doc_id, (i - 1) // 3 AS seg_id, i, L[i] AS w
      |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(L))) AS i) g),
      |seg AS (SELECT doc_id, seg_id, string_agg(w, ' ' ORDER BY i) AS segtext
      |  FROM w GROUP BY doc_id, seg_id)""".stripMargin

  /** BPE starting vocabulary as a DuckDB CTE body: word frequencies with
    * each word in its space-joined character-symbol form.
    */
  private val bpeVocabSql =
    """v AS (SELECT trim(regexp_replace(word, '(.)', '\1 ', 'g')) AS sym,
      |    CAST(count(*) AS BIGINT) AS wc FROM (
      |    SELECT unnest(string_split(text, ' ')) AS word FROM documents) u
      |  WHERE len(word) > 0 GROUP BY 1)""".stripMargin

  /** Weighted adjacent-pair counts over a (sym, wc) relation. */
  private def bpePairSql(rel: String): String =
    s"""SELECT tk[i] AS left_sym, tk[i + 1] AS right_sym,
       |    CAST(sum(wc) AS BIGINT) AS weight
       |  FROM (SELECT string_split(sym, ' ') AS tk, wc FROM $rel) t,
       |    LATERAL (SELECT unnest(generate_series(1, len(tk) - 1)) AS i) s
       |  GROUP BY 1, 2""".stripMargin
}
