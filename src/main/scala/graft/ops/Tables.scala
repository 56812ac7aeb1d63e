package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * The reference resolves tables by name through a catalog
  * (`dolomite/src/optimizer.rs:12-14`, registration at
  * `dolomite/src/test_utils.rs:19-24`); our catalog is simply the parquet
  * directory for the requested scale factor. Reads go through
  * `spark.read.parquet`, which gives the vectorized columnar scan, predicate
  * pushdown and column pruning for free — at 100 TB these tables would be
  * partitioned directories, and the same code paths apply unchanged.
  */
final class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Scale-adaptive post-scan rebalance for CPU-heavy per-row kernels
    * (r10, guide §2.5 "input skew — one huge unsplittable file ...
    * repartition immediately after the read"): a parquet file smaller
    * than the scan split size is ONE row group, so its scan is a single
    * task and a fused codegen kernel behind it runs on ONE core — at
    * sf0.1 every table is a single-row-group file, so kernel queries
    * serialized regardless of core count (measured: sim_pq_train_step
    * 1.8 s of executorRunTime in 1 task). The repartition costs one
    * shuffle of the (tiny, provably sub-split-size) input and buys
    * kernel-stage parallelism. Apply only where downstream aggregation
    * is partition-order-insensitive (exact integer/decimal sums, counts,
    * min/max, set-semantics collects) — the repo-wide doctrine.
    *
    * r11 rework of the r10 version (both VERDICT r10 defects):
    *  - SIZE IS DIRECTORY-AWARE: leaf-file bytes are summed via Hadoop
    *    `getContentSummary` — `java.io.File.length()` on a parquet
    *    DIRECTORY (the production layout) returned the ~4 KB dirent
    *    size, so the old `bytes < cores × maxSplit` gate would have
    *    fired at ANY scale and shuffled a 100 TB table.
    *  - THE PARTITION COUNT IS BYTE-CAPPED: `min(cores, ceil(bytes /
    *    chunk))` (chunk = `spark.graft.rebalance.chunkBytes`) instead of
    *    a flat `repartition(cores)`, which put 32 partitions under a
    *    600 KB file at local[32] — every one of ~170 small consumers
    *    paid a 32-task wave for no kernel gain (driver r10: mm_binary_meta
    *    0.24→0.45 s, sim_ann_recall 0.77→1.22 s). Tiny inputs now get
    *    few partitions; the 4–8-core kernel wins survive at 32.
    *  - HASH, NOT ROUND-ROBIN: keyless `repartition(n)` pays a local
    *    sort of its input (`spark.sql.execution.sortBeforeRepartition`,
    *    on by default so retries are deterministic — guide §2.5), which
    *    for the 10.8 MB lineitem was the dominant hidden cost of the
    *    r10 flip at 32c. Hashing the table's unique key is deterministic
    *    under retry BY CONSTRUCTION (no sort needed) and spreads evenly
    *    (millions of distinct ids ≫ partitions).
    *
    * The rebalance fires only when it adds parallelism the scan cannot
    * provide: `want > scanTasks` where scanTasks is what the file layout
    * already yields (≥ file count, ≥ bytes/maxPartitionBytes). At 100 TB
    * the scan spans many splits, want ≤ cores ≪ scanTasks, and the frame
    * is returned untouched — no shuffle is ever added at scale.
    */
  private[graft] def rebalanced(name: String, df: DataFrame,
      keys: Seq[String]): DataFrame = {
    val (bytes, nFiles) = Tables.dataSize(spark, s"$dir/$name.parquet")
    val cores = spark.sparkContext.defaultParallelism
    val chunk = spark.conf
      .get(Tables.RebalanceChunkKey, Tables.DefaultChunkBytes.toString).toLong
    val want = math.min(cores.toLong,
      math.max(1L, (bytes + chunk - 1) / chunk)).toInt
    val maxSplit = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    val scanTasks = math.max(nFiles, (bytes + maxSplit - 1) / maxSplit)
    if (want > scanTasks) df.repartition(want, keys.map(df(_)): _*) else df
  }

  /** [[lineitem]] rebalanced for kernel-stage parallelism — opt-in (the
    * relational family's aggregates shuffle early anyway; the rebalance
    * pays off only where per-row kernel work dominates the scan stage).
    */
  def lineitemPar: DataFrame =
    rebalanced("lineitem", lineitem, Seq("l_orderkey", "l_linenumber"))

  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")
  /** `ts` is microsecond-precision INT64 (NTZ-annotated) in the parquet
    * footer since the round-5 testdata regeneration (it was nanoseconds
    * through round 4, which needed a raw-LONG read). Microseconds are
    * Spark's native timestamp precision, so it reads as a real
    * TimestampType column; the schema is still declared explicitly so the
    * NTZ annotation can never flip the read to TimestampNTZType under
    * `spark.sql.parquet.inferTimestampNTZ.enabled` — the session runs in
    * UTC, where LTZ-vs-NTZ is the identity and `unix_millis` agrees with
    * DuckDB's `epoch_ms` (see [[EventOps.withMs]]).
    */
  // events deliberately NOT rebalanced (r10, measured): the family is 64
  // mostly-tiny queries whose heavy work happens post-shuffle (windows /
  // grouped state), so the extra round-robin exchange cost more than the
  // parallel-decode gain (family total 36.2 s -> 44.1 s in the flipped
  // capture; e.g. events_slo_burn 0.17 -> 0.41 s isolated). The
  // documents/embeddings flip stays: their consumers are per-row CPU
  // kernels where the same trade measured a large net win.
  def events: DataFrame =
    spark.read.schema(Tables.eventsSchema).parquet(s"$dir/events.parquet")
  /** Documents and embeddings feed the CPU-kernel families (text/dedup/
    * sim/mm) — rebalanced by default (r10): every aggregate over them is
    * partition-order-insensitive by the repo's DuckDB-parity doctrine
    * (exact integer/decimal sums, set-semantics collects, length-tie
    * Viterbi — audited this round), so the round-robin split changes no
    * result, only kernel-stage parallelism. At production scale the
    * rebalance is the identity (see [[rebalanced]]).
    */
  def documents: DataFrame =
    rebalanced("documents", t("documents"), Seq("doc_id"))
  def embeddings: DataFrame =
    rebalanced("embeddings", t("embeddings"), Seq("vec_id"))
}

object Tables {
  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)

  /** Chunk size (bytes) that caps the [[Tables.rebalanced]] partition
    * count: partitions = min(cores, ceil(bytes / chunk)). The default is
    * a measured local sweet spot (OPTIMIZATION_r11.md sweep at 8/32
    * cores); a production deployment sizes it to the per-core kernel
    * throughput of its hardware — larger chunk = fewer, bigger kernel
    * partitions.
    */
  val RebalanceChunkKey = "spark.graft.rebalance.chunkBytes"
  val DefaultChunkBytes: Long = 64L * 1024

  /** (total leaf-file bytes, leaf-file count) of a table path — correct
    * for both a single parquet file and a parquet DIRECTORY (the
    * production layout), unlike `java.io.File.length()` which returns
    * the dirent size for a directory.
    */
  private[graft] def dataSize(
      spark: SparkSession, path: String): (Long, Long) = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    if (st.isFile) (st.getLen, 1L)
    else {
      // recursive walk, DATA files only — `_SUCCESS`/`.crc` markers must
      // not inflate the scan-task estimate (Spark's scan skips them too)
      var bytes = 0L
      var n = 0L
      val it = fs.listFiles(p, true)
      while (it.hasNext) {
        val f = it.next()
        val nm = f.getPath.getName
        if (!nm.startsWith("_") && !nm.startsWith(".")) {
          bytes += f.getLen; n += 1
        }
      }
      (bytes, math.max(1L, n))
    }
  }

  /** events.parquet physical schema (`ts`: microsecond TimestampType). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))
}
