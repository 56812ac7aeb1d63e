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
  def events: DataFrame =
    spark.read.schema(Tables.eventsSchema).parquet(s"$dir/events.parquet")
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)

  /** events.parquet physical schema (`ts`: microsecond TimestampType). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))
}
