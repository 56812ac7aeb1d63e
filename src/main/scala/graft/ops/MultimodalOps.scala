package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed metadata,
  * partition-level batch "decode", and frame sampling.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB (byte statistics stand in for decoded
  * features); everything Spark-side — the binary column handling, schema,
  * partition-level batching, and the sampling plan shape — is real. At scale
  * the binary payloads stay columnar in parquet, the decode is a
  * mapPartitions batch (the Scala analog of mapInPandas), and nothing
  * shuffles until after feature extraction reduces width.
  */
object MultimodalOps {
  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    // Binary payload + metadata extraction (pure expressions, codegen'd).
    "mm_binary_meta" -> { (s, d) =>
      Tables(s, d).documents
        .select(col("doc_id"),
          encode(col("text"), "UTF-8").as("payload"))
        .select(col("doc_id"),
          octet_length(col("payload")).as("n_bytes"),
          md5(col("payload")).as("digest"))
        .orderBy("doc_id")
    },
    // STUB decode: partition-batched feature extraction over the binary
    // payload. A real pipeline would decode images/audio per batch here; the
    // deterministic fake computes byte-level statistics with the same
    // batch shape (mapPartitions = Scala analog of mapInPandas).
    "mm_decode_features" -> { (s, d) =>
      val spark = s
      import spark.implicits._
      Tables(s, d).documents
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions { batch =>
          batch.map { case (id, b) =>
            // --- STUB: stands in for image/audio decode + feature extract ---
            val bytes = if (b == null) Array.empty[Byte] else b
            var sumB = 0L
            var i = 0
            while (i < bytes.length) { sumB += bytes(i) & 0xFF; i += 1 }
            val mean = if (bytes.length == 0) 0.0
              else sumB.toDouble / bytes.length
            (id, bytes.length, mean)
          }
        }
        .toDF("doc_id", "n_bytes", "mean_byte")
        .orderBy("doc_id")
    },
    // Fixed-size RESIZE: variable-length payloads downsampled to 8 equal
    // byte-range buckets (mean per bucket) — the resize/thumbnail shape: a
    // real image resize has the same partition-batched structure with a
    // codec in place of the byte mean. Bucket boundaries are exact integer
    // arithmetic (floor(j*L/8)) so the oracle reproduces them bit-for-bit.
    "mm_resize_fixed" -> { (s, d) =>
      val spark = s
      import spark.implicits._
      Tables(s, d).documents
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions { batch =>
          batch.flatMap { case (id, b) =>
            // null payload -> empty (a codec would skip/flag); the oracle's
            // codepoint arithmetic equals the byte arithmetic here only
            // because the corpus is ASCII (verified; non-ASCII would fail
            // the hash compare loudly, not silently)
            val bytes = if (b == null) Array.empty[Byte] else b
            val L = bytes.length
            (0 until 8).iterator.map { j =>
              val from = (j.toLong * L / 8).toInt
              val until = ((j + 1).toLong * L / 8).toInt
              var sum = 0L
              var i = from
              while (i < until) { sum += bytes(i) & 0xFF; i += 1 }
              (id, j,
                if (until > from) sum.toDouble / (until - from) else 0.0)
            }
          }
        }
        .toDF("doc_id", "bucket", "mean_byte")
        .orderBy("doc_id", "bucket")
    },
    // Frame sampling plan: every 2nd "frame" of a fake video whose frame
    // count derives from the payload size — the explode/sequence shape a real
    // frame sampler would use.
    "mm_frame_sample" -> { (s, d) =>
      Tables(s, d).documents
        .select(col("doc_id"),
          explode(sequence(lit(0L), (col("n_chars") / lit(100L)).cast("long"),
            lit(2L))).as("frame_idx"))
        .orderBy("doc_id", "frame_idx")
    }
  )

  def oracles: Map[String, String] = Map(
    "mm_binary_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  md5(text) AS digest
        |FROM documents ORDER BY doc_id""".stripMargin,
    // The decode STUB's byte statistics are reproducible from the text
    // (ASCII corpus: byte value = codepoint), so the oracle recomputes
    // them — checking the mapPartitions plumbing end to end. A real codec
    // would be unverifiable here by construction; the stub is not.
    // COALESCE(text, '') encodes the engine's NULL-payload -> empty-bytes
    // guard, so oracle and engine agree on the same NULL contract (not
    // just on NULL-free corpora).
    "mm_decode_features" ->
      """WITH t AS (SELECT doc_id, COALESCE(text, '') AS text FROM documents)
        |SELECT doc_id, CAST(length(text) AS INT) AS n_bytes,
        |  CASE WHEN length(text) = 0 THEN 0.0
        |       ELSE CAST(list_sum(list_transform(string_split(text, ''),
        |         x -> ord(x))) AS DOUBLE) / length(text) END AS mean_byte
        |FROM t ORDER BY doc_id""".stripMargin,
    "mm_resize_fixed" ->
      """WITH b AS (SELECT doc_id, length(COALESCE(text, '')) AS L,
        |    list_transform(string_split(COALESCE(text, ''), ''), x -> ord(x))
        |      AS bs
        |  FROM documents),
        |g AS (SELECT doc_id, L, bs, j,
        |    (j * L) // 8 AS s, ((j + 1) * L) // 8 AS e
        |  FROM b CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS j) jj)
        |SELECT doc_id, CAST(j AS INT) AS bucket,
        |  CASE WHEN e > s
        |       THEN CAST(list_sum(list_slice(bs, s + 1, e)) AS DOUBLE) / (e - s)
        |       ELSE 0.0 END AS mean_byte
        |FROM g ORDER BY doc_id, bucket""".stripMargin,
    "mm_frame_sample" ->
      """SELECT doc_id, unnest(generate_series(0, n_chars // 100, 2))
        |  AS frame_idx
        |FROM documents ORDER BY doc_id, frame_idx""".stripMargin
  )
}
