package graft

import graft.ops.{DedupOps, SimilarityOps}

/** Semantics specs for the non-SQL-expressible dedup/ANN operators (the
  * driver's check for these is rows-only; these tests pin their behavior
  * against the exact ground truth).
  */
class DedupSpec extends GraftSuite {

  private def pairs(name: String): Set[(Long, Long)] =
    DedupOps.queries(name)(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash-LSH candidates, verified, equal the exact Jaccard pairs") {
    val exact = pairs("dedup_ngram_jaccard")
    val lsh = pairs("dedup_minhash_lsh")
    // verification guarantees precision; banding (4x4 over j>=0.8 pairs)
    // must reach full recall on this corpus
    assert(lsh == exact, s"lsh=$lsh exact=$exact")
    assert(exact.nonEmpty) // corpus contains planted near-duplicates
  }

  test("simhash near-dup pairs are plausible near-duplicates") {
    val sim = pairs("dedup_simhash")
    val exact = pairs("dedup_ngram_jaccard")
    assert(sim.nonEmpty)
    // simhash(hamming<=3) should be dominated by true near-dups: precision
    // against the j>=0.8 ground truth stays high on this synthetic corpus
    val precision = sim.count(exact.contains).toDouble / sim.size
    assert(precision >= 0.7, s"precision $precision, sim=$sim")
  }

  test("LSH ANN recall vs brute-force top-5") {
    val bf = SimilarityOps.queries("sim_topk_bruteforce")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = SimilarityOps.queries("sim_ann_lsh")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every ANN hit is a real vector pairing and per-query results exist
    assert(ann.nonEmpty)
    val recall = bf.count(ann.contains).toDouble / bf.size
    // 8-plane single-probe LSH on random vectors: recall is modest but
    // must be far above chance (bucket fraction ~ 1/2^8)
    assert(recall >= 0.1, s"recall $recall")
  }

  test("df-ordered PPJoin is exact on a df-skewed planted corpus") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 120 docs, each ending in the SAME hot tail (a corpus-wide stop
    // shingle with df = 120 — the skew adversary: under a hash-ordered
    // prefix this key alone would emit up to 120²/2 candidate pairs).
    // Distinct heads make most docs unrelated; 10 planted near-dup pairs
    // share long heads with a one-token edit.
    val hot = "the quick brown fox jumps over the lazy dog again and again"
    val docs = (0 until 100).map { i =>
      (i.toLong, (0 until 12).map(j => s"w${i}_$j").mkString(" ") + " " + hot)
    } ++ (0 until 10).flatMap { i =>
      val head = (0 until 40).map(j => s"dup${i}_$j")
      Seq((200L + 2 * i, head.mkString(" ") + " " + hot),
        (201L + 2 * i, head.updated(20, "EDITED").mkString(" ") + " " + hot))
    }
    val df = docs.toDF("doc_id", "text")
    // brute-force ground truth over token-3-shingle sets
    val shingled = df.select(col("doc_id"),
      array_distinct(graft.functions.functions
        .word_shingles(split(col("text"), " "), 3)).as("sh"))
    val bruteForce = shingled.as("a").join(shingled.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        graft.functions.functions.jaccard_sim(col("a.sh"), col("b.sh"))
          .as("j"))
      .filter(col("j") >= 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ppjoin = ops.DedupOps.jaccardDupPairs(shingled, 4, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bruteForce.nonEmpty, "planted corpus must contain true pairs")
    assert(ppjoin == bruteForce, s"ppjoin=$ppjoin brute=$bruteForce")
  }

  test("df-ordering keeps the hot stop-shingle out of every prefix") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // same construction, smaller: each doc = 12 distinct head tokens + the
    // shared 12-token hot tail → 10 hot tail-shingles (df=n) vs 12+ rare
    // head shingles (df=1). Prefix length = ceil(n/5) <= 5 < 12, so every
    // prefix is filled entirely by df=1 head shingles — the inverted index
    // must contain no key with df above the doc count / 10.
    val hot = "the quick brown fox jumps over the lazy dog again and again"
    val docs = (0 until 50).map { i =>
      (i.toLong, (0 until 12).map(j => s"w${i}_$j").mkString(" ") + " " + hot)
    }
    val shingled = docs.toDF("doc_id", "text").select(col("doc_id"),
      array_distinct(graft.functions.functions
        .word_shingles(split(col("text"), " "), 3)).as("sh"))
    val sh = shingled.select(col("doc_id"), explode(col("sh")).as("sr"))
      .select(col("doc_id"), xxhash64(col("sr")).as("s"))
    val dfTbl = sh.groupBy("s").agg(count(lit(1)).as("df"))
    val maxPrefixDf = sh.join(dfTbl, "s")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("s")))).as("ord"),
        count(lit(1)).as("n"))
      .select(posexplode(slice(col("ord"), lit(1),
        (col("n") - expr("(n * 4 + 4) div 5") + lit(1)).cast("int")))
        .as(Seq("pos", "e")))
      .agg(max(col("e.df"))).collect()(0).getLong(0)
    assert(maxPrefixDf == 1L,
      s"hot shingle leaked into a prefix (max df in index = $maxPrefixDf)")
  }

  test("PPJoin prefix length matches n - ceil(t*n) + 1 exactly (t=0.8)") {
    // the floating-point formulation floor(n*(1-t))+1 is one short whenever
    // t*n is integral (n % 5 == 0 for t=0.8) — regression for that bug
    (1 to 1000).foreach { n =>
      val integer = n - (n * 4 + 4) / 5 + 1
      val mathematical = n - math.ceil(0.8 * n).toInt + 1
      assert(integer == mathematical, s"n=$n: $integer != $mathematical")
    }
  }

  test("exact dedup keeps one representative per content hash") {
    val df = DedupOps.queries("dedup_exact")(spark, sfDir)
    val n = df.count()
    val total = graft.ops.Tables(spark, sfDir).documents.count()
    assert(n <= total && n > 0)
  }
}
