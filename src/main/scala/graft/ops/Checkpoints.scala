package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage cuts for the iterative operator family (components, SCC,
  * PageRank, k-core, HITS, BFS, pointer-jumping dedup).
  *
  * Every iterative operator cuts its per-round lineage — required, not an
  * optimization: the round frame feeds both sides of a self-join (or
  * multiple consumers), and a lazy chain re-executes every earlier round
  * per consumer. Two cut mechanisms exist with a real tradeoff at scale:
  *
  *  - `localCheckpoint()` (the DEFAULT): eager, materializes to
  *    executor-local storage blocks. Fast (no DFS round-trip), but the
  *    blocks die with their executor — on a 1000-executor cluster a
  *    single executor loss mid-iteration fails the job, because the
  *    truncated lineage cannot be recomputed.
  *  - `checkpoint()` (opt-in): eager, writes the frame to the reliable
  *    checkpoint directory (DFS). One write+read per round on a
  *    node-sized frame — orders of magnitude smaller than the fact
  *    table — buys survival of any executor loss.
  *
  * Opt in by setting `spark.graft.checkpointDir` to a DFS path (runtime
  * conf, no session restart needed); the first cut wires it into the
  * SparkContext. Default behavior is unchanged when the conf is absent.
  * The tradeoff is documented in BASELINE.md (the local harness cannot
  * demonstrate the executor-loss failure mode — single JVM).
  */
object Checkpoints {

  /** Runtime conf key: when set to a directory, iterative lineage cuts
    * use reliable `checkpoint()` into it instead of `localCheckpoint()`.
    */
  val DirConf = "spark.graft.checkpointDir"

  implicit class LineageCutOps(private val df: DataFrame) extends AnyVal {

    /** Eagerly materialize this frame and truncate its lineage —
      * executor-local by default, reliable-to-DFS when
      * `spark.graft.checkpointDir` is set.
      */
    def cutLineage(): DataFrame = {
      val spark = df.sparkSession
      val dir = spark.conf.get(DirConf, "")
      if (dir.isEmpty) df.localCheckpoint()
      else {
        val sc = spark.sparkContext
        if (!sc.getCheckpointDir.contains(dir)) sc.setCheckpointDir(dir)
        df.checkpoint()
      }
    }
  }
}
