package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the full operator inventory: the reference's relational surface
  * ([[graft.ops.Relational]]), the analytic extensions ([[graft.ops.Analytics]]),
  * and the training-data pipeline operators (text/dedup/similarity/events
  * modules). Every entry has a DuckDB oracle unless the operator is not
  * SQL-expressible (hash-seeded MinHash/SimHash/LSH), per the driver contract.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.queries("q1_pricing")(spark, "/root/testdata/sf0.001")

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame],
    Map[String, String])] = Seq(
    (Relational.queries, Relational.oracles),
    // cascades winners executed end to end (planner.rs:29-55 lifecycle)
    (CascadesExecOps.queries, CascadesExecOps.oracles),
    (Analytics.queries, Analytics.oracles),
    (AnalyticsTpch.queries, AnalyticsTpch.oracles),
    (AnalyticsExt.queries, AnalyticsExt.oracles),
    (TextOps.queries, TextOps.oracles),
    (DedupOps.queries, DedupOps.oracles),
    (SimilarityOps.queries, SimilarityOps.oracles),
    (EventOps.queries, EventOps.oracles),
    (GraphOps.queries, GraphOps.oracles),
    (GeoOps.queries, GeoOps.oracles),
    (MultimodalOps.queries, MultimodalOps.oracles),
    (DataOps.queries, DataOps.oracles),
    // streaming parity IS part of the contract: the hourly aggregate runs
    // through the memory sink and checks against the batch oracle
    (graft.streaming.StreamingOps.queries, graft.streaming.StreamingOps.oracles)
  )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
