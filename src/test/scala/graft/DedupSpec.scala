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
