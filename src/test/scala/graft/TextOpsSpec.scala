package graft

import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** Planted-corpus tests for the text-pipeline operators whose behavior the
  * uniform synthetic corpus cannot distinguish (no emails exist in it, and
  * its token frequencies are near-uniform).
  */
class TextOpsSpec extends GraftSuite {

  test("rarity: planted rare token scores exactly one rare hit") {
    import spark.implicits._
    // corpus: "common" appears 9 times (3 docs x 3), "zebra" once.
    // N = 10 tokens, V = 2 types; rare means c*V < N: common 9*2=18 >= 10
    // (not rare), zebra 1*2=2 < 10 (rare).
    val docs = Seq(
      (0L, "common common common"),
      (1L, "common common common"),
      (2L, "common common common zebra")).toDF("doc_id", "text")
    val got = TextOps.rarityFrom(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
    // doc 0/1: 3 tokens, all cf=9 → mean 9, rare_frac 0
    assert(got(0) == ((0L, 3, 9.0, 0.0)), got.toSeq.toString)
    assert(got(1) == ((1L, 3, 9.0, 0.0)), got.toSeq.toString)
    // doc 2: 4 tokens (9+9+9+1)/4 = 7, one rare of 4
    assert(got(2) == ((2L, 4, 7.0, 0.25)), got.toSeq.toString)
  }

  test("scrub: planted emails and denylist terms are redacted") {
    import spark.implicits._
    val docs = Seq(
      (0L, "contact alice.smith+x@example.org about the account"),
      (1L, "the customer met a supplier yesterday"),
      (2L, "accounting is NOT redacted nor is customers"), // \b boundaries
      (3L, "plain text with nothing sensitive")).toDF("doc_id", "text")
    val counts = TextOps.scrubFrom(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(counts.toSeq == Seq((0L, 1, 1), (1L, 2, 0), (2L, 0, 0),
      (3L, 0, 0)), counts.toSeq.toString)
    val scrubbed = TextOps.scrubbedText(docs).orderBy("doc_id").collect()
      .map(_.getString(1))
    assert(scrubbed(0) == "contact <EMAIL> about the <REDACTED>")
    assert(scrubbed(1) == "the <REDACTED> met a <REDACTED> yesterday")
    // word boundaries: substrings of denylist terms survive untouched
    assert(scrubbed(2) == "accounting is NOT redacted nor is customers")
    assert(scrubbed(3) == "plain text with nothing sensitive")
  }

  test("scrub hash equals md5 of the scrubbed text") {
    import spark.implicits._
    val docs = Seq((0L, "customer a@b.co x")).toDF("doc_id", "text")
    val hash = TextOps.scrubFrom(docs).collect()(0).getString(3)
    val text = TextOps.scrubbedText(docs).collect()(0).getString(1)
    val want = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(hash == want, s"text=$text")
  }

  test("lm familiarity: planted bigram counts, scoring, and quintile " +
      "assignment; a 1-token doc yields no row") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "a b d"), (3L, "x y"), (4L, "z"))
      .toDF("doc_id", "text")
    val out = TextOps.lmFamiliarityFrom(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getInt(6)))).toMap
    spark.catalog.clearCache()
    // model: "a b"->2, "b c"/"b d"/"x y"->1; doc 4 has no bigram
    assert(out.size == 3, out.toString)
    assert(out(1L) == ((2L, 3L, 1L, 2L, 1.5, 1)))
    assert(out(2L) == ((2L, 3L, 1L, 2L, 1.5, 2)))
    assert(out(3L) == ((1L, 1L, 1L, 1L, 1.0, 3)))
  }

  test("token dist: planted frequency curve — counts, modal tie to the " +
      "lexicographically smallest token, and the Simpson collision sum") {
    import spark.implicits._
    // doc 1: b b b a a c  -> n=6, types=3, top=b(3), coll=3*2+2*1+0=8
    // doc 2: z y z y      -> tie at 2; modal must be y (lex smallest)
    val docs = Seq((1L, "b b b a a c"), (2L, "z y z y"))
      .toDF("doc_id", "text")
    val out = TextOps.tokenDistFrom(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(out(1L) == ((6L, 3L, "b", 3L, 8L)))
    assert(out(2L) == ((4L, 2L, "y", 2L, 2L + 2L)))
  }

  test("ngram novelty: first document is all-novel, a verbatim repeat is " +
      "zero-novel, and a <3-token doc yields no row") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps"), // 3 grams, all first occurrences
      (2L, "the quick brown fox jumps"), // same grams -> novelty 0
      (3L, "the quick brown cat naps"),  // grams: 1 seen, 2 new -> 2/3
      (4L, "too short")).toDF("doc_id", "text")
    val out = TextOps.ngramNoveltyFrom(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(out.size == 3, out.toString)
    assert(out(1L) == ((3L, 3L, 1.0)))
    assert(out(2L) == ((3L, 0L, 0.0)))
    assert(out(3L) == ((3L, 2L, 2.0 / 3.0)))
  }

  test("ngram novelty matches a plain-Scala replay on a randomized corpus") {
    import spark.implicits._
    for (seed <- Seq(41L, 42L)) {
      val rnd = new scala.util.Random(seed)
      // tiny vocabulary forces heavy cross-doc gram sharing
      val vocab = Array("a", "b", "c", "d")
      val docs = (1 to 60).map { i =>
        (i.toLong,
          Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(4))).mkString(" "))
      }
      val grams = docs.flatMap { case (id, text) =>
        val tk = text.split(" ", -1).toSeq
        if (tk.length < 3) Nil
        else tk.sliding(3).map(g => (id, g.mkString(" "))).toSeq
      }.distinct
      val firstDoc = grams.groupBy(_._2).map { case (g, xs) =>
        g -> xs.map(_._1).min
      }
      val want = grams.groupBy(_._1).map { case (id, gs) =>
        val novel = gs.count { case (_, g) => firstDoc(g) == id }
        id -> ((gs.size.toLong, novel.toLong,
          novel.toDouble / gs.size.toDouble))
      }
      val got = TextOps.ngramNoveltyFrom(docs.toDF("doc_id", "text"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getDouble(3)))).toMap
      spark.catalog.clearCache()
      assert(got == want, s"seed=$seed: got=${got.size} want=${want.size}")
    }
  }

  test("bpe pairs: vocab-weighted counts with the lexicographic tiebreak") {
    import spark.implicits._
    // vocab: low x2, lot x1 -> (l,o)=3, (o,w)=2, (o,t)=1
    val docs = Seq((1L, "low  low"), (2L, "lot")).toDF("doc_id", "text")
    val got = TextOps.bpeTopPairs(TextOps.charVocab(docs), 20).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(("l", "o", 3L), ("o", "w", 2L), ("o", "t", 1L)), got)
  }

  test("bpe merge: greedy left-to-right on a same-symbol run " +
      "(aaaa -> [aa,aa], aaaaa -> [aa,aa,a], never [aa,a,aa])") {
    import spark.implicits._
    val docs = Seq((1L, "aaaa aaaaa")).toDF("doc_id", "text")
    // best pair (a,a) weight 3+4=7; post-merge: (aa,aa)=2, (aa,a)=1
    val got = TextOps.bpeMergeStep(TextOps.charVocab(docs), 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(("aa", "aa", 2L), ("aa", "a", 1L)), got)
  }

  test("bpe merge: adjacent occurrences both merge (xababx -> x ab ab x)") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab xababx")).toDF("doc_id", "text")
    // best (a,b) weight 4; merged vocab: [ab], [x,ab,ab,x]
    val got = TextOps.bpeMergeStep(TextOps.charVocab(docs), 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(("ab", "ab", 1L), ("ab", "x", 1L), ("x", "ab", 1L)),
      got)
  }

  test("bpe merge matches a plain-Scala BPE replay on a randomized corpus") {
    import spark.implicits._
    def mergeWord(cs: List[String], bl: String, br: String): List[String] =
      cs match {
        case a :: b :: rest if a == bl && b == br =>
          (bl + br) :: mergeWord(rest, bl, br)
        case a :: rest => a :: mergeWord(rest, bl, br)
        case Nil => Nil
      }
    def pairCounts(vocab: Map[List[String], Long])
        : Map[(String, String), Long] =
      vocab.toSeq.flatMap { case (sym, wc) =>
        sym.sliding(2).collect { case List(a, b) => ((a, b), wc) }
      }.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
    for (seed <- Seq(7L, 8L)) {
      val rnd = new scala.util.Random(seed)
      val docs = (1 to 40).map { i =>
        (i.toLong, Seq.fill(1 + rnd.nextInt(8))(
          Seq.fill(1 + rnd.nextInt(5))("abcd" (rnd.nextInt(4)).toString)
            .mkString).mkString(" "))
      }
      val vocab = docs.flatMap(_._2.split(" ", -1)).filter(_.nonEmpty)
        .groupBy(x => x).map { case (w, xs) =>
          w.map(_.toString).toList -> xs.size.toLong
        }
      val c0 = pairCounts(vocab)
      val best = c0.toSeq.minBy { case ((l, r), w) => (-w, l, r) }._1
      val merged = vocab.toSeq.map { case (sym, wc) =>
        mergeWord(sym, best._1, best._2) -> wc
      }.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
      val want = pairCounts(merged)
      val got = TextOps.bpeMergeStep(
        TextOps.charVocab(docs.toDF("doc_id", "text")), 10000).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got == want, s"seed=$seed: got=${got.size} want=${want.size}")
    }
  }

  test("segment dedup: first occurrence wins within and across documents") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c d e f"), // both segments first → untouched
      (1L, "a b c x y z"), // "a b c" already seen at (0,0) → dropped
      (2L, "a b c d e f"), // full duplicate of doc 0 → emptied
      (3L, "p q"), // single remainder segment, kept
      (4L, "d e f g h"), // "d e f" seen at (0,1); remainder "g h" kept
      (5L, "m n o m n o") // WITHIN-doc dup: seg 1 dropped by seg 0
    ).toDF("doc_id", "text")
    val got = TextOps.segmentDedupFrom(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (0L, 2L, 0L, "a b c d e f"),
      (1L, 2L, 1L, "x y z"),
      (2L, 2L, 2L, ""),
      (3L, 1L, 0L, "p q"),
      (4L, 2L, 1L, "g h"),
      (5L, 2L, 1L, "m n o")), got.toSeq.toString)
  }

  test("boilerplate scrub: >=3-doc segments vanish everywhere, repeats " +
    "within one doc do not") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c d e f"),
      (1L, "a b c x y z"),
      (2L, "a b c d e f"),
      (3L, "p q"),
      (4L, "d e f g h"),
      (5L, "m n o m n o")
    ).toDF("doc_id", "text")
    // "a b c" in docs {0,1,2}, "d e f" in {0,2,4} → both boilerplate;
    // "m n o" appears twice but in ONE doc → kept both times.
    val got = TextOps.boilerplateScrubFrom(docs, minDocs = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (0L, 2L, 2L, ""),
      (1L, 2L, 1L, "x y z"),
      (2L, 2L, 2L, ""),
      (3L, 1L, 0L, "p q"),
      (4L, 2L, 1L, "g h"),
      (5L, 2L, 0L, "m n o m n o")), got.toSeq.toString)
  }

  test("segment dedup and boilerplate scrub match plain-Scala replays on " +
    "random corpora") {
    import spark.implicits._
    for (seed <- Seq(51L, 52L)) {
      val rnd = new scala.util.Random(seed)
      // 8-word vocabulary, 1..11-word docs → dense segment collisions,
      // remainder segments of every width
      val docs = (0L until 60L).map { id =>
        id -> (1 to (rnd.nextInt(11) + 1))
          .map(_ => s"w${rnd.nextInt(8)}").mkString(" ")
      }
      val segsOf = (text: String) =>
        text.split(" ").grouped(3).map(_.mkString(" ")).toVector
      // first-occurrence replay: global (doc_id, seg_id) scan order
      val seen = scala.collection.mutable.Set.empty[String]
      val wantDedup = docs.map { case (id, text) =>
        val segs = segsOf(text)
        val kept = segs.filter(s => seen.add(s))
        (id, segs.size.toLong, (segs.size - kept.size).toLong,
          kept.mkString(" "))
      }
      val gotDedup = TextOps.segmentDedupFrom(docs.toDF("doc_id", "text"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSeq
      assert(gotDedup == wantDedup, s"seed=$seed dedup")
      // boilerplate replay: distinct-doc counts first, then scrub
      val nd = docs.flatMap { case (id, t) => segsOf(t).distinct.map(_ -> id) }
        .groupBy(_._1).view.mapValues(_.size).toMap
      val wantScrub = docs.map { case (id, text) =>
        val segs = segsOf(text)
        val kept = segs.filter(s => nd(s) < 3)
        (id, segs.size.toLong, (segs.size - kept.size).toLong,
          kept.mkString(" "))
      }
      val gotScrub = TextOps.boilerplateScrubFrom(
        docs.toDF("doc_id", "text"), minDocs = 3).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSeq
      assert(gotScrub == wantScrub, s"seed=$seed scrub")
    }
  }

  test("entropy: hand-computed planted documents (uniform=log2 k, " +
      "constant=0), exact doubles") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaaa"),          // one symbol: H_char = 0 exactly
      (2L, "abab"),          // two equi-frequent chars: H_char = 1.0
      (3L, "x y x y")        // two equi-frequent tokens: H_token = 1.0
    ).toDF("doc_id", "text")
    val got = TextOps.entropyFrom(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getInt(3),
        r.getDouble(4))).toSeq
    assert(got(0) == ((1L, 4, 0.0, 1, 0.0)), got(0))
    assert(got(1)._3 == 1.0, got(1))
    // "x y x y": 7 chars {x:2, y:2, space:3}; tokens {x:2, y:2} of 4
    assert(got(2)._5 == 1.0, got(2))
    assert(got(2)._4 == 4)
  }

  test("entropy matches a plain-Scala replay on random word docs, and a " +
      "doc over 1024 chars fails loudly (ANSI table bound)") {
    import spark.implicits._
    val words = Seq("alpha", "beta", "gamma", "delta", "x")
    for (seed <- Seq(7L, 8L)) {
      val rnd = new scala.util.Random(seed)
      val docs = (0L until 20L).map { id =>
        (id, Seq.fill(rnd.nextInt(40) + 2)(words(rnd.nextInt(words.size)))
          .mkString(" "))
      }
      def h(items: Seq[String]): Double = {
        val n = items.size
        val s = items.groupBy(identity).toSeq.sortBy(_._1)
          .foldLeft(0.0) { case (acc, (_, g)) =>
            acc + g.size.toDouble * math.log(g.size.toDouble) }
        (n.toDouble * math.log(n.toDouble) - s) /
          (n.toDouble * math.log(2.0))
      }
      val want = docs.map { case (id, t) =>
        (id, t.length, h(t.map(_.toString)), t.split(' ').length,
          h(t.split(' ').toSeq)) }
      val got = TextOps.entropyFrom(docs.toDF("doc_id", "text")).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getInt(3),
          r.getDouble(4))).toSeq
      assert(got == want, s"seed=$seed")
    }
    val big = Seq((9L, "a" * 1025)).toDF("doc_id", "text")
    val e = intercept[Exception] {
      TextOps.entropyFrom(big).collect()
    }
    assert(e.getMessage != null)
  }

  test("keyness: plain-Scala replay — marginals, lift, support cut, " +
      "per-language top-10 with the deterministic tie-break") {
    val got = TextOps.queries("text_keyness")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getDouble(4))).toSeq
    val rows = graft.ops.Tables(spark, sfDir).documents
      .select("lang", "text").collect()
      .flatMap(r => r.getString(1).split(" ", -1).map(r.getString(0) -> _))
    val cLT = rows.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cT = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val cL = rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val n = rows.length.toLong
    val want = cLT.toSeq.collect { case ((lang, tok), clt) if clt >= 5 =>
      (lang, tok, clt,
        (clt * n).toDouble / (cT(tok) * cL(lang)).toDouble)
    }.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (_, xs) =>
      xs.sortBy { case (_, tok, _, lift) => (-lift, tok) }.take(10)
        .zipWithIndex.map { case ((lang, tok, clt, lift), i) =>
          (lang, (i + 1).toLong, tok, clt, lift)
        }
    }
    assert(got == want)
  }

  test("cooccurrence assoc: hand-computed skip-bigrams on a planted corpus") {
    import spark.implicits._
    // doc1 d1-pairs: (a,b),(b,a),(a,b); d2-pairs: (a,a),(b,b);
    // doc2 d1-pairs: (c,c) -> T=6
    val docs = Seq((1L, "a b a b"), (2L, "c c")).toDF("doc_id", "text")
    val got = graft.ops.TextOps
      .cooccurrenceAssocFrom(docs, minSupport = 1, k = 100)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    spark.catalog.clearCache()
    assert(got == Seq(
      ("c", "c", 1L, 1L, 1L, 6.0),
      ("b", "a", 1L, 2L, 2L, 6.0 / 4.0),
      ("a", "b", 2L, 3L, 3L, 12.0 / 9.0),
      ("a", "a", 1L, 3L, 2L, 1.0),
      ("b", "b", 1L, 2L, 3L, 1.0)), got.toList)
  }

  test("cooccurrence assoc: single-token docs emit no pairs") {
    import spark.implicits._
    val docs = Seq((1L, "solo"), (2L, "x y")).toDF("doc_id", "text")
    val got = graft.ops.TextOps
      .cooccurrenceAssocFrom(docs, minSupport = 1, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    spark.catalog.clearCache()
    assert(got == Seq(("x", "y")), got.toList)
  }

  test("bm25: planted corpus matches a hand replay of the rational-idf " +
      "formula, and saturation ranks the two-term doc first") {
    import spark.implicits._
    // N=3, total=9, avgdl=3; df(hash)=1, df(join)=2
    val docs = Seq(
      (1L, "hash join hash"),
      (2L, "join x y z"),
      (3L, "x y")).toDF("doc_id", "text")
    val got = graft.ops.TextOps.bm25From(docs, "hash", "join", k = 20)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    def term(tf: Long, df: Long, dl: Long): Double = {
      val n = 3.0; val avgdl = 9.0 / 3.0
      val idf = (n - df.toDouble + 0.5) / (df.toDouble + 0.5)
      idf * ((tf.toDouble * 2.2) /
        (tf.toDouble + 1.2 * (0.25 + 0.75 * (dl.toDouble / avgdl))))
    }
    val s1 = term(2, 1, 3) + term(1, 2, 3) // doc 1: both terms
    val s2 = 0.0 + term(1, 2, 4)           // doc 2: join only
    assert(s1 > s2)
    assert(got == Seq((1L, 2L, 1L, s1), (2L, 0L, 1L, s2)), got.toList)
  }

  test("phrase search: only exact adjacency in order matches") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hash join hash join"), // matches at pos 0 and 2
      (2L, "join hash"),           // reversed - no match
      (3L, "hash x join")).toDF("doc_id", "text") // gap - no match
    val got = graft.ops.TextOps.phraseSearchFrom(docs, "hash", "join")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == Seq((1L, 2L, 0)), got.toList)
  }

  test("bpe encode: chained merges produce whole-word tokens with " +
      "independently-counted frequencies") {
    import org.apache.spark.sql.functions._
    val got = graft.ops.TextOps.queries("text_bpe_encode")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(got.length == 30)
    // descending-count, token-ascending-on-tie ordering is pinned
    assert(got.sliding(2).forall { case Array((t1, n1), (t2, n2)) =>
      n1 > n2 || (n1 == n2 && t1 < t2) },
      got.toSeq.toString)
    // the 4-rule chain t a->ta->tab->table must fire: every occurrence
    // of the word "table" becomes ONE token; count it independently
    val gotMap = got.toMap
    val nTable = graft.ops.Tables(spark, sfDir).documents
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") === "table").count()
    assert(nTable > 0 && gotMap.get("table").contains(nTable),
      s"table=$nTable got=${gotMap.get("table")}")
    // single-char survivors and merged tokens may coexist, but no token
    // contains a space (the separator never leaks into tokens)
    assert(got.forall(t => !t._1.contains(" ")))
  }

  test("bpe roundtrip: token concatenation reconstructs every corpus " +
      "word (and the gate catches a lossy encoder)") {
    val got = graft.ops.TextOps.queries("text_bpe_roundtrip")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    // the invariant: merges only JOIN symbols, so n_ok == n_words
    got.foreach { case (lang, n, ok) =>
      assert(ok == n, s"$lang: $ok of $n words survived the roundtrip") }
    // counts tile the corpus word stream
    import org.apache.spark.sql.functions._
    val nWords = graft.ops.Tables(spark, sfDir).documents
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").count()
    assert(got.map(_._2).sum == nWords)
  }

  test("quality buckets: threshold cuts match a driver-side tercile fold " +
      "and buckets tile each language") {
    import org.apache.spark.sql.functions.col
    val docs = graft.ops.Tables(spark, sfDir).documents
      .select(col("lang"), col("n_chars").cast("long"), col("text"))
      .collect()
      .map { r =>
        val toks = r.getString(2).split(" ", -1)
        (r.getString(0), r.getLong(1),
          toks.distinct.length.toDouble / toks.length)
      }
    val want = docs.groupBy(_._1).view.mapValues { ds =>
      val n = ds.size.toLong
      // cuts from the score-count table, exactly the operator's rule:
      // max score whose top-cumulative count crosses n/3 resp. 2n/3
      val byScore = ds.groupBy(_._3).view.mapValues(_.size.toLong).toSeq
        .sortBy(-_._1)
      val cum = byScore.scanLeft(0L)(_ + _._2).tail
      val c1 = byScore.zip(cum).filter { case (_, c) => c * 3 >= n }
        .map(_._1._1).max
      val c2 = byScore.zip(cum).filter { case (_, c) => c * 3 >= 2 * n }
        .map(_._1._1).max
      ds.groupBy { case (_, _, s) =>
        if (s >= c1) "head" else if (s >= c2) "middle" else "tail"
      }.view.mapValues { xs =>
        (xs.size.toLong, xs.map(_._2).sum,
          xs.map(_._3).min, xs.map(_._3).max)
      }.toMap
    }.toMap
    val got = graft.ops.TextOps.queries("text_quality_buckets")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    val wantFlat = for {
      (l, bs) <- want; (b, v) <- bs } yield (l, b) -> v
    assert(got == wantFlat.toMap, s"got=$got want=$wantFlat")
    // buckets tile: per-language doc counts sum to the corpus
    val perLang = docs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    got.keys.map(_._1).toSeq.distinct.foreach { l =>
      assert(got.filter(_._1._1 == l).values.map(_._1).sum == perLang(l))
    }
  }

  test("vocab coverage matches an independent driver-side greedy-merge " +
      "BPE replay") {
    import org.apache.spark.sql.functions._
    // independent implementation: list-based greedy left-to-right
    // non-overlapping merge per rule, no string replace at all
    val merges = Seq("t a" -> "ta", "ta b" -> "tab", "l e" -> "le",
      "tab le" -> "table", "a n" -> "an", "i n" -> "in", "e r" -> "er",
      "s c" -> "sc")
    def enc(word: String): List[String] =
      merges.foldLeft(word.map(_.toString).toList) {
        case (syms, (fr, to)) =>
          val Array(f1, f2) = fr.split(" ")
          val out = scala.collection.mutable.ListBuffer[String]()
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == f1 && syms(i + 1) == f2) {
              out += to; i += 2
            } else { out += syms(i); i += 1 }
          }
          out.toList
      }
    val words = graft.ops.Tables(spark, sfDir).documents
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val want = words.groupBy(_._1).view.mapValues { ws =>
      val toks = ws.map { case (_, w) => enc(w) }
      val nTok = toks.map(_.size.toLong).sum
      (ws.size.toLong, nTok, toks.map(_.count(_.length > 1).toLong).sum,
        ws.map(_._2.length.toLong).sum.toDouble / nTok)
    }.toMap
    val got = graft.ops.TextOps.queries("text_vocab_coverage")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got == want, s"got=$got want=$want")
    // merges actually fire on the corpus
    assert(got.values.exists(_._3 > 0L))
  }

  test("bpe encode: adjacent repeated pairs merge (doubled-separator " +
      "rewrite implements true greedy BPE, not single-pass replace)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 'tata' must become [ta, ta] — a single-space encoding loses the
    // second merge because the first match consumes the shared
    // separator; 'tatab' additionally chains into the 'ta b'->'tab'
    // rule; 'aaa' has no matching rule and stays single chars
    val got = Seq("tata", "tatab", "tale", "aaa").toDF("w")
      .select(col("w"), graft.ops.TextOps.bpeEncode(col("w")).as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList)
      .toMap
    assert(got("tata") == List("ta", "ta"), got("tata"))
    assert(got("tatab") == List("ta", "tab"), got("tatab"))
    assert(got("tale") == List("ta", "le"), got("tale"))
    assert(got("aaa") == List("a", "a", "a"), got("aaa"))
  }

  /** Driver-side replica of the Gopher panel statistics: word count,
    * stopword count, chars, and the top-2/3/4-gram character masses
    * (max over distinct shingles of len·occurrences, overlaps counted).
    */
  private def gopherReplay(text: String): (Int, Int, Long, Long, Long, Long) = {
    val t = text.split(" ", -1)
    val n = t.length
    val stop = Set("the", "a", "of", "and", "to", "in")
    val nStop = t.count(stop)
    val chars = text.length.toLong
    def mass(k: Int): Long =
      if (n < k) 0L
      else (0 to n - k).map(i => t.slice(i, i + k).mkString(" "))
        .groupBy(identity).map { case (g, o) => g.length.toLong * o.size }
        .max
    (n, nStop, chars, mass(2), mass(3), mass(4))
  }

  private def gopherFlags(st: (Int, Int, Long, Long, Long, Long))
      : Seq[Boolean] = {
    val (n, nStop, chars, m2, m3, m4) = st
    val sumw = chars - (n - 1)
    Seq(n < 20 || n > 90, sumw < 3L * n || sumw > 10L * n, nStop < 2,
      m2 * 5 > chars, m3 * 50 > chars * 9, m4 * 25 > chars * 4)
  }

  test("gopher quality: planted violations flag exactly one rule each; " +
      "all stats match a driver replay") {
    import spark.implicits._
    val filler = (1 to 50).map(i => s"word${('a' + i % 23).toChar}$i")
    val docs = Seq(
      // 0: keeper — 52 varied words, two stopwords, no repetition
      (0L, (filler.take(50) ++ Seq("the", "a")).mkString(" ")),
      // 1: too short (word-count rule only)
      (1L, "the a brief line of ten small words here"),
      // 2: top-2-gram repetition (alpha beta x12) with stopwords kept
      (2L, (Seq.fill(12)("alpha beta") ++ filler.take(30)
        ++ Seq("the", "a")).mkString(" ")),
      // 3: no stopwords at all, otherwise clean
      (3L, filler.take(40).mkString(" ")),
      // 4: mean word length out of bounds (long pseudo-words)
      (4L, (1 to 30).map(i => s"supercalifragilistic$i").mkString(" ")))
      .toDF("doc_id", "text")
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = graft.ops.TextOps.gopherFlagsFrom(docs).orderBy("doc_id")
      .collect().map { r =>
        r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3),
          r.getLong(5), r.getLong(6), r.getLong(7),
          Seq(r.getBoolean(8), r.getBoolean(9), r.getBoolean(10),
            r.getBoolean(11), r.getBoolean(12), r.getBoolean(13))))
      }.toMap
    for ((id, text) <- texts) {
      val st = gopherReplay(text)
      val (n, nStop, chars, m2, m3, m4) = st
      val (gn, gs, gc, gm2, gm3, gm4, gf) = got(id)
      assert((gn, gs, gc, gm2, gm3, gm4) == ((n, nStop, chars, m2, m3, m4)),
        s"doc $id stats")
      assert(gf == gopherFlags(st), s"doc $id flags got=$gf")
    }
    // the planted design holds: each doc trips its target rule, keeper clean
    assert(got(0L)._7.forall(!_), got(0L)._7.toString)
    // short docs trip the repetition caps too (a 4-gram window is >= 4/n
    // of the chars), so pin only the rule under test
    assert(got(1L)._7(0), "word-count must fire on doc 1")
    assert(got(2L)._7(3), "top2 must fire on doc 2")
    assert(got(3L)._7 == Seq(false, false, true, false, false, false))
    assert(got(4L)._7(1), "mean-word-length must fire on doc 4")
  }

  test("winnow pairs: a planted long quote surfaces the pair; unrelated " +
      "docs share nothing") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.functions.winnow_fingerprints
    // doc 1 quotes a 64-char span of doc 0 verbatim (>= 23-byte shared
    // substrings guarantee shared fingerprints; 64 chars yields several);
    // docs 2/3 are unrelated fillers
    val quote = "the quick brown fox jumps over the lazy dog again and again yes"
    val docs = Seq(
      (0L, s"prefix words here $quote and a tail of original content"),
      (1L, s"a completely different opening $quote closing remarks differ"),
      (2L, "unrelated filler text one with its own vocabulary entirely"),
      (3L, "another disjoint document about other things altogether now"))
      .toDF("doc_id", "text")
    val fp = docs.select(col("doc_id"),
      explode(winnow_fingerprints(col("text"), 16, 8)).as("m"))
    val pairs = fp.as("a").join(fp.as("b"),
        col("a.m") === col("b.m") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(pairs.getOrElse((0L, 1L), 0L) >= 2L, pairs.toString)
    assert(!pairs.contains((2L, 3L)), pairs.toString)
    // corpus run is non-degenerate and honors the ordering contract
    val got = graft.ops.TextOps.queries("text_winnow_pairs")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.forall(_._3 >= 2L))
    assert(got.map(_._3).toSeq == got.map(_._3).toSeq.sorted.reverse)
    spark.catalog.clearCache()
  }

  test("bpe compression curve: token counts are monotone in the merge " +
      "count and match per-word encodes at every prefix") {
    import org.apache.spark.sql.functions._
    val got = graft.ops.TextOps
      .queries("text_bpe_compression_curve")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got.map(_._1) == Seq(0, 2, 4, 8))
    // more merges never produce more tokens; chars/token never shrinks
    assert(got.map(_._3) == got.map(_._3).sorted.reverse)
    assert(got.map(_._4) == got.map(_._4).sorted)
    // k=0 is character tokenization: tokens == chars exactly
    val chars = graft.ops.Tables(spark, sfDir).documents
      .select(sum(length(col("text")) -
        (size(split(col("text"), " ")) - 1)))
      .collect()(0).getLong(0)
    assert(got.head._3 == chars, s"${got.head._3} vs $chars")
    // the full-table point agrees with an independent per-word encode
    val t8 = graft.ops.Tables(spark, sfDir).documents
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .select(size(graft.ops.TextOps.bpeEncode(col("word"))).as("n"))
      .agg(sum(col("n"))).collect()(0).getLong(0)
    assert(got.last._3 == t8)
  }

  test("gopher funnel: corpus waterfall matches a driver-side replay; " +
      "the cumulative column is monotone and ends at the keep count") {
    import org.apache.spark.sql.functions._
    val texts = graft.ops.Tables(spark, sfDir).documents
      .select(col("text")).collect().map(_.getString(0))
    val flags = texts.map(t => gopherFlags(gopherReplay(t)))
    val want = (0 until 6).map { i =>
      (i, flags.count(_(i)).toLong,
        flags.count(f => f(i) && f.zipWithIndex.forall {
          case (v, j) => j == i || !v
        }).toLong,
        flags.count(f => (0 to i).forall(j => !f(j))).toLong)
    }
    val got = graft.ops.TextOps.queries("text_gopher_funnel")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want, s"got=$got want=$want")
    val cum = got.map(_._4)
    assert(cum == cum.sorted.reverse, "cumulative survivors must decrease")
    assert(cum.last == flags.count(_.forall(!_)).toLong)
  }

  test("kn bigram: counts and the discounted probability match a replay; " +
      "probabilities are proper and continuation mass matters") {
    val texts = graft.ops.Tables(spark, sfDir).documents
      .select("text").collect().map(_.getString(0))
    val prs = texts.flatMap(t => t.split(" ").sliding(2).collect {
      case Array(a, b) => (a, b)
    })
    val c2 = prs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val c1 = c2.groupBy(_._1._1).view
      .mapValues(m => (m.values.sum, m.size.toLong)).toMap
    val nl = c2.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val nbi = c2.size.toLong
    def pkn(w1: String, w2: String): Double = {
      val (cl, nr) = c1(w1)
      (c2((w1, w2)).toDouble - 0.75) / cl.toDouble +
        (0.75 * nr.toDouble / cl.toDouble) * (nl(w2).toDouble / nbi.toDouble)
    }
    val want = c2.toSeq.filter(_._2 >= 3)
      .map { case ((a, b), c) => (a, b, c, pkn(a, b)) }
      .sortBy { case (a, b, c, _) => (-c, a, b) }.take(30)
    val got = graft.ops.TextOps.queries("text_kn_bigram")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == want, s"got=${got.take(3)} want=${want.take(3)}")
    assert(got.forall(g => g._4 > 0.0 && g._4 < 1.0))
    // discounting bites: the smoothed probability is strictly below the
    // raw MLE for every reported bigram (mass was reserved for unseen
    // continuations beyond the c/c1 estimate... unless the continuation
    // term gives it back; assert the DISCOUNT term alone is below MLE)
    got.foreach { case (a, _, c, _) =>
      val (cl, _) = c1(a)
      assert((c.toDouble - 0.75) / cl.toDouble < c.toDouble / cl.toDouble)
    }
    spark.catalog.clearCache()
  }

  test("langid confusion: cells tile the corpus and agree with the " +
      "per-doc predictions; row profiles sum to one") {
    val preds = graft.ops.TextOps.queries("text_lang_id")(spark, sfDir)
      .collect().map(r => (r.getString(1), r.getString(5)))
    val want = preds.groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.map { case ((t, p), n) => (t, p, n) }
      .sortBy(c => (c._1, c._2))
    val got = graft.ops.TextOps
      .queries("text_langid_confusion")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got.map(c => (c._1, c._2, c._3)) == want,
      s"got=${got.take(4)} want=${want.take(4)}")
    assert(got.map(_._3).sum == preds.length.toLong)
    got.groupBy(_._1).values.foreach { row =>
      assert(math.abs(row.map(_._4).sum - 1.0) < 1e-12)
      val tot = row.map(_._3).sum
      row.foreach(c => assert(c._4 == c._3.toDouble / tot.toDouble))
    }
    spark.catalog.clearCache()
  }

  test("char trigrams: top-5 per lang match a driver replay, shares are " +
      "the exact count ratios, ranks are count-ordered") {
    import org.apache.spark.sql.functions._
    val docs = graft.ops.Tables(spark, sfDir).documents
      .select(col("lang"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val grams = docs.filter(_._2.length >= 3).flatMap { case (l, t) =>
      (0 to t.length - 3).map(i => (l, t.substring(i, i + 3)))
    }
    val counts = grams.groupBy(identity).view.mapValues(_.size.toLong)
    val want = grams.map(_._1).distinct.sorted.flatMap { l =>
      val cs = counts.filter(_._1._1 == l).toSeq
        .map { case ((_, g), n) => (g, n) }
      val tot = cs.map(_._2).sum
      cs.sortBy { case (g, n) => (-n, g) }.take(5).zipWithIndex.map {
        case ((g, n), i) => (l, i + 1, g, n, n.toDouble / tot.toDouble)
      }
    }.toSeq
    val got = graft.ops.TextOps.queries("text_char_trigrams")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got == want, s"got=${got.take(3)} want=${want.take(3)}")
    got.groupBy(_._1).values.foreach { rows =>
      val byRank = rows.sortBy(_._2).map(_._4)
      assert(byRank == byRank.sorted.reverse)
    }
    spark.catalog.clearCache()
  }

  test("fertility: per-lang sums match a driver replay through the real " +
      "encoder, and fertility is bounded by 1 and word length") {
    import org.apache.spark.sql.functions._
    val rows = graft.ops.Tables(spark, sfDir).documents
      .select(col("lang"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    // drive the SAME encoder column on a driver-built frame per word
    import spark.implicits._
    val words = rows.flatMap { case (l, t) =>
      t.split(" ", -1).filter(_.nonEmpty).map(w => (l, w)) }
    val enc = words.toSeq.toDF("lang", "word")
      .select(col("lang"), length(col("word")).as("nc"),
        size(graft.ops.TextOps.bpeEncode(col("word"))).as("nt"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    val want = enc.groupBy(_._1).toSeq.sortBy(_._1).map { case (l, es) =>
      val nw = es.size.toLong
      val nt = es.map(_._3.toLong).sum
      val nchars = es.map(_._2.toLong).sum
      (l, nw, nt, nt.toDouble / nw.toDouble, nchars.toDouble / nt.toDouble)
    }
    val got = graft.ops.TextOps.queries("text_bpe_fertility")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == want, s"got=${got.take(3)} want=${want.take(3)}")
    // every word emits >= 1 token; merges only shrink
    got.foreach { case (l, nw, nt, f, _) =>
      assert(nt >= nw && f >= 1.0, s"$l fertility $f")
    }
    spark.catalog.clearCache()
  }

  test("burstiness: sufficient statistics match a driver replay and the " +
      "VMR identity holds against per-doc variance") {
    import org.apache.spark.sql.functions._
    val docs = graft.ops.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val perDoc = docs.flatMap { case (id, t) =>
      t.split(" ", -1).groupBy(identity).map { case (w, o) =>
        (w, id, o.length.toLong) }
    }
    val want = perDoc.groupBy(_._1).map { case (term, rs) =>
      val df = rs.size.toLong
      val cf = rs.map(_._3).sum
      val cf2 = rs.map(c => c._3 * c._3).sum
      (term, df, cf, cf.toDouble / df.toDouble,
        (BigInt(df) * BigInt(cf2) - BigInt(cf) * BigInt(cf)).toDouble /
          (BigInt(df) * BigInt(cf)).toDouble)
    }.toSeq.sortBy { case (t, df, _, _, _) => (-df, t) }.take(20)
    val got = graft.ops.TextOps.queries("text_burstiness")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == want, s"got=${got.take(3)} want=${want.take(3)}")
    // VMR is a variance over containing docs: nonnegative, and zero only
    // when every containing doc has the identical count
    got.foreach { case (term, df, _, _, vmr) =>
      val counts = perDoc.filter(_._1 == term).map(_._3)
      assert(vmr >= -1e-12, s"$term vmr=$vmr")
      if (counts.distinct.size == 1) assert(vmr == 0.0, term)
      else assert(vmr > 0.0, term)
    }
    spark.catalog.clearCache()
  }

  test("readability: counts match a driver-side replay and the scores " +
      "are the exact pinned formula trees") {
    import org.apache.spark.sql.functions._
    val docs = graft.ops.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val want = docs.sortBy(_._1).map { case (id, text) =>
      val w = text.split(" ", -1).length.toLong
      val s = (w + 15) / 16
      val syl = "[aeiouy]+".r.findAllIn(text.toLowerCase).size.toLong
      val ease = 206.835 - 1.015 * (w.toDouble / s.toDouble) -
        84.6 * (syl.toDouble / w.toDouble)
      val grade = 0.39 * (w.toDouble / s.toDouble) +
        11.8 * (syl.toDouble / w.toDouble) - 15.59
      (id, w, s, syl, ease, grade)
    }.toSeq
    val got = graft.ops.TextOps.queries("text_readability")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == want, s"got=${got.take(2)} want=${want.take(2)}")
    // every doc has vowels (the scores are live, not a degenerate 0/w)
    assert(got.forall(_._4 > 0L))
    spark.catalog.clearCache()
  }
}
