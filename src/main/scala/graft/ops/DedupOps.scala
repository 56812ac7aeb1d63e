package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` / `embeddings` — the core of a
  * training-data pipeline at 100 TB.
  *
  * Scale design notes:
  *  - exact dedup = hash-aggregate on a content digest (one shuffle on the
  *    digest, map-side partial agg; the digest, not the full text, is the
  *    shuffle key so shuffled bytes stay small).
  *  - n-gram Jaccard = inverted-index self-join on shingles (shuffle on the
  *    shingle hash; high-document-frequency shingles are the skew risk — at
  *    scale a `df <= maxDf` prefilter caps the quadratic blowup per shingle,
  *    which is exact for thresholds > (maxDf-reachable) similarity).
  *  - MinHash/LSH = the scale path: signature bytes per doc are O(perms);
  *    candidate generation is an equi-join on (band, band-signature) —
  *    linear-ish shuffle instead of the quadratic all-pairs.
  *  - SimHash = 64-bit signature; near-dup = Hamming distance ≤ k, found by
  *    pigeonhole banding (4 chunks of 16 bits: pairs within Hamming ≤ 3 must
  *    agree on ≥1 chunk) — again an equi-join, not a cross join.
  *  - embedding near-dup = quantized-integer cosine (exact, engine-portable);
  *    brute-force all-pairs here, LSH-bucketed variant in [[SimilarityOps]].
  */
object DedupOps {
  type Q = (SparkSession, String) => DataFrame

  /** Exact Jaccard similarity on distinct 3-token shingles for all candidate
    * pairs produced by `candidates` (columns id1, id2).
    */
  private def jaccardOnShingles(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val sh = docs
      .select(col("doc_id"), explode(TextOps.shingles(col("text"), 3)).as("s"))
      .distinct()
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.as("a")
      .join(sh.as("b"), col("a.s") === col("b.s") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(pairs, Seq("id1", "id2"), "left_semi")
      .join(cnt.as("ca"), col("id1") === col("ca.doc_id"))
      .join(cnt.as("cb"), col("id2") === col("cb.doc_id"))
      .select(col("id1"), col("id2"),
        (col("inter").cast("double") /
          (col("ca.n") + col("cb.n") - col("inter")).cast("double"))
          .as("jaccard"))
  }

  /** MinHash signature entry: min over shingles of xxhash64(perm-salt ++ s).
    * One row per (doc_id, perm). perms permutations via salt variation.
    */
  private def minhash(docs: DataFrame, perms: Int): DataFrame = {
    val sh = docs
      .select(col("doc_id"), explode(TextOps.shingles(col("text"), 3)).as("s"))
      .distinct()
    val permCols = (0 until perms).map(k =>
      min(xxhash64(lit(k), col("s"))).as(s"h$k"))
    sh.groupBy("doc_id").agg(permCols.head, permCols.tail: _*)
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
    // n-gram Jaccard near-dup: exact all-pairs via shingle inverted index.
    "dedup_ngram_jaccard" -> { (s, d) =>
      val docs = Tables(s, d).documents
      val sh = docs
        .select(col("doc_id"), explode(TextOps.shingles(col("text"), 3)).as("s"))
        .distinct()
      val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      sh.as("a")
        .join(sh.as("b"), col("a.s") === col("b.s") &&
          col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
        .agg(count(lit(1)).as("inter"))
        .join(cnt.as("ca"), col("id1") === col("ca.doc_id"))
        .join(cnt.as("cb"), col("id2") === col("cb.doc_id"))
        .select(col("id1"), col("id2"),
          (col("inter").cast("double") /
            (col("ca.n") + col("cb.n") - col("inter")).cast("double"))
            .as("jaccard"))
        .filter(col("jaccard") >= 0.8)
        .orderBy("id1", "id2")
    },
    // MinHash + LSH banding (4 bands x 4 rows), candidates verified with the
    // exact Jaccard — the linear-shuffle scale path. Not SQL-expressible
    // (xxhash64 seeds) → rows-only driver check; ScalaTest asserts it finds
    // exactly the exact-Jaccard pairs at this threshold.
    "dedup_minhash_lsh" -> { (s, d) =>
      val docs = Tables(s, d).documents
      val sig = minhash(docs, 16)
      val bands = (0 until 4).map { b =>
        sig.select(col("doc_id"), lit(b).as("band"),
          struct((0 until 4).map(r => col(s"h${b * 4 + r}")): _*).as("bsig"))
      }.reduce(_ union _)
      val cand = bands.as("x")
        .join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.bsig") === col("y.bsig") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
        .distinct()
      jaccardOnShingles(docs, cand)
        .filter(col("jaccard") >= 0.8)
        .orderBy("id1", "id2")
    },
    // SimHash near-dup: 64-bit signatures from token hashes; Hamming <= 3
    // via 16-bit chunk banding + exact Hamming verification.
    "dedup_simhash" -> { (s, d) =>
      val docs = Tables(s, d).documents
      val tok = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
        .groupBy("doc_id", "t").agg(count(lit(1)).as("w"))
        .withColumn("h", xxhash64(col("t")))
      // signature bit i = sign of sum over tokens of w * (bit_i(h) ? 1 : -1)
      val bitSums = (0 until 64).map { i =>
        sum(when(shiftrightunsigned(col("h"), i).bitwiseAND(lit(1L)) === 1,
          col("w")).otherwise(-col("w"))).as(s"b$i")
      }
      val withBits = tok.groupBy("doc_id")
        .agg(bitSums.head, bitSums.tail: _*)
      val sigCol = (0 until 64).map { i =>
        when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L))
      }.reduce((a, b) => a.bitwiseOR(b))
      val sig = withBits.select(col("doc_id"), sigCol.as("sig"))
      val chunks = (0 until 4).map { c =>
        sig.select(col("doc_id"), col("sig"), lit(c).as("chunk"),
          shiftrightunsigned(col("sig"), c * 16).bitwiseAND(lit(0xFFFFL))
            .as("ck"))
      }.reduce(_ union _)
      chunks.as("x")
        .join(chunks.as("y"),
          col("x.chunk") === col("y.chunk") && col("x.ck") === col("y.ck") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"),
          bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).as("hamming"))
        .distinct()
        .filter(col("hamming") <= 3)
        .orderBy("id1", "id2")
    },
    // Embedding-cosine near-dup on quantized integer vectors (exact in both
    // engines). Brute-force all-pairs — correctness baseline; the LSH-bucketed
    // scale path is sim_ann_lsh.
    "dedup_embedding" -> { (s, d) =>
      val emb = Tables(s, d).embeddings
        .select(col("vec_id"),
          transform(col("embedding"),
            x => floor(x * lit(1000.0) + lit(0.5)).cast("long")).as("q"))
      val withNorm = emb.withColumn("nn",
        aggregate(transform(col("q"), x => x * x), lit(0L), (a, x) => a + x))
      withNorm.as("a")
        .join(withNorm.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
          (aggregate(zip_with(col("a.q"), col("b.q"), (x, y) => x * y),
            lit(0L), (acc, x) => acc + x).cast("double") /
            (sqrt(col("a.nn").cast("double")) * sqrt(col("b.nn").cast("double"))))
            .as("cos"))
        .filter(col("cos") >= 0.45)
        .orderBy("id1", "id2")
    }
  )

  def oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,
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
    "dedup_embedding" ->
      """WITH q AS (SELECT vec_id, i,
        |    CAST(floor(embedding[i] * 1000.0 + 0.5) AS BIGINT) AS v
        |  FROM embeddings,
        |    LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) g),
        |n AS (SELECT vec_id, sum(v * v) AS nn FROM q GROUP BY vec_id),
        |p AS (SELECT a.vec_id AS id1, b.vec_id AS id2, sum(a.v * b.v) AS dot
        |      FROM q a JOIN q b ON a.i = b.i AND a.vec_id < b.vec_id
        |      GROUP BY 1, 2)
        |SELECT id1, id2,
        |  CAST(dot AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) *
        |    sqrt(CAST(nb.nn AS DOUBLE))) AS cos
        |FROM p JOIN n na ON na.vec_id = id1 JOIN n nb ON nb.vec_id = id2
        |WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) *
        |    sqrt(CAST(nb.nn AS DOUBLE))) >= 0.45
        |ORDER BY id1, id2""".stripMargin
  )
}
