package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * The similarity kernel works on 1000x-quantized integer vectors so the
  * arithmetic is exact and engine-portable (same doubles from the same exact
  * integers in Spark and the DuckDB oracle).
  *
  * Scale design: brute-force top-k is the correctness baseline — a broadcast
  * of the (small) query set against the full corpus scan, one shuffle for the
  * per-query top-k (TakeOrderedAndProject-like via window row_number). The
  * LSH path buckets vectors by random-hyperplane signature first: candidate
  * generation becomes an equi-join on the bucket id, shrinking the pair count
  * from |Q|x|N| to |Q|x|bucket|; at 100 TB the bucketed corpus would be
  * written pre-partitioned by signature so probes touch one partition each.
  */
object SimilarityOps {
  type Q = (SparkSession, String) => DataFrame

  /** Quantized integer embedding + its squared norm. */
  private def quantized(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("label"),
      transform(col("embedding"),
        x => floor(x * lit(1000.0) + lit(0.5)).cast("long")).as("q"))
      .withColumn("nn",
        aggregate(transform(col("q"), x => x * x), lit(0L), (a, x) => a + x))

  /** Exact cosine between two quantized vectors (columns qa/qb, na/nb). */
  private def cosine(qa: Column, qb: Column, na: Column, nb: Column): Column =
    aggregate(zip_with(qa, qb, (x, y) => x * y), lit(0L), (acc, x) => acc + x)
      .cast("double") / (sqrt(na.cast("double")) * sqrt(nb.cast("double")))

  /** Deterministic integer random-hyperplane weight for (plane k, dim i) —
    * a fixed LCG-style formula both engines could reproduce.
    */
  private def planeWeight(k: Int, i: Column): Column =
    ((lit(k) * lit(131) + i * lit(31) + lit(7)) % lit(61)) - lit(30)

  /** Sign-bit signature of `q` under `planes` random integer hyperplanes. */
  private def lshSignature(q: Column, planes: Int): Column =
    (0 until planes).map { k =>
      val dot = aggregate(
        zip_with(q, sequence(lit(0), size(q) - 1),
          (x, i) => x * planeWeight(k, i).cast("long")),
        lit(0L), (acc, x) => acc + x)
      when(dot > 0, lit(1L << k)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  def queries: Map[String, Q] = Map(
    // Brute-force cosine top-5 for query vectors (vec_id < 10) over the rest.
    "sim_topk_bruteforce" -> { (s, d) =>
      val e = quantized(Tables(s, d).embeddings)
      val qs = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("q").as("qq"),
          col("nn").as("qn"))
      val corpus = e.filter(col("vec_id") >= 10)
      val scored = corpus.join(broadcast(qs))
        .select(col("query_id"), col("vec_id"),
          cosine(col("qq"), col("q"), col("qn"), col("nn")).as("cos"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("query_id")
        .orderBy(col("cos").desc, col("vec_id").asc)
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select("query_id", "vec_id", "cos", "rk")
        .orderBy("query_id", "rk")
    },
    // LSH-bucketed ANN: 8-plane signature buckets; probe only the query's
    // bucket. Approximate (recall < 1) but linear shuffle — the scale path.
    // Deterministic (integer planes) but not SQL-expressible concisely →
    // rows-only driver check; ScalaTest checks bucket recall vs brute force.
    "sim_ann_lsh" -> { (s, d) =>
      val e = quantized(Tables(s, d).embeddings)
        .withColumn("bucket", lshSignature(col("q"), 8))
      val qs = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("q").as("qq"),
          col("nn").as("qn"), col("bucket"))
      val corpus = e.filter(col("vec_id") >= 10)
      val scored = corpus.join(broadcast(qs), Seq("bucket"))
        .select(col("query_id"), col("vec_id"),
          cosine(col("qq"), col("q"), col("qn"), col("nn")).as("cos"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("query_id")
        .orderBy(col("cos").desc, col("vec_id").asc)
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select("query_id", "vec_id", "cos", "rk")
        .orderBy("query_id", "rk")
    },
    // Per-label centroid similarity: an IVF-style coarse quantizer readout —
    // mean quantized vector per label, then each vector's cosine to its own
    // label centroid, aggregated. Exact integer/decimal math end-to-end.
    "sim_label_centroid" -> { (s, d) =>
      val e = quantized(Tables(s, d).embeddings)
      val byDim = e.select(col("vec_id"), col("label"),
          posexplode(col("q")).as(Seq("i", "v")))
      val cent = byDim.groupBy("label", "i")
        .agg(sum(col("v")).as("sv"), count(lit(1)).as("cnt"))
      // integer-scaled centroid: floor(1000 * sum / cnt) keeps exactness
      val centQ = cent.select(col("label"), col("i"),
        floor(col("sv") * lit(1000) / col("cnt")).cast("long").as("cv"))
      byDim.join(centQ, Seq("label", "i"))
        .groupBy("label")
        .agg(sum(col("v") * col("cv")).as("dot_sum"),
          count(lit(1)).as("n_terms"))
        .orderBy("label")
    }
  )

  def oracles: Map[String, String] = Map(
    "sim_topk_bruteforce" ->
      """WITH q AS (SELECT vec_id, i,
        |    CAST(floor(embedding[i] * 1000.0 + 0.5) AS BIGINT) AS v
        |  FROM embeddings,
        |    LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) g),
        |n AS (SELECT vec_id, sum(v * v) AS nn FROM q GROUP BY vec_id),
        |p AS (SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
        |        sum(a.v * b.v) AS dot
        |      FROM q a JOIN q b ON a.i = b.i
        |      WHERE a.vec_id < 10 AND b.vec_id >= 10
        |      GROUP BY 1, 2),
        |scored AS (SELECT query_id, p.vec_id AS vec_id,
        |    CAST(dot AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) *
        |      sqrt(CAST(nb.nn AS DOUBLE))) AS cos
        |  FROM p JOIN n na ON na.vec_id = query_id
        |         JOIN n nb ON nb.vec_id = p.vec_id),
        |ranked AS (SELECT query_id, vec_id, cos,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos DESC, vec_id ASC) AS INT) AS rk
        |  FROM scored)
        |SELECT query_id, vec_id, cos, rk FROM ranked
        |WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,
    "sim_label_centroid" ->
      """WITH q AS (SELECT vec_id, label, i,
        |    CAST(floor(embedding[i] * 1000.0 + 0.5) AS BIGINT) AS v
        |  FROM embeddings,
        |    LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) g),
        |cent AS (SELECT label, i, sum(v) AS sv, count(*) AS cnt
        |         FROM q GROUP BY label, i),
        |centq AS (SELECT label, i,
        |    CAST(floor(CAST(sv * 1000 AS DOUBLE) / cnt) AS BIGINT) AS cv
        |  FROM cent)
        |SELECT q.label, CAST(sum(q.v * c.cv) AS BIGINT) AS dot_sum,
        |  count(*) AS n_terms
        |FROM q JOIN centq c ON q.label = c.label AND q.i = c.i
        |GROUP BY q.label ORDER BY q.label""".stripMargin
  )
}
