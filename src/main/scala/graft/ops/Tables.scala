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
  /** `ts` is nanosecond-precision INT64 in the parquet footer, which Spark's
    * vectorized reader rejects by default; read it as a raw nanosecond long
    * (exact) and let callers convert (see [[EventOps.withMs]]). Declaring the
    * schema explicitly (ts as LONG) makes the vectorized reader accept the
    * raw INT64 without the session-global
    * `spark.sql.legacy.parquet.nanosAsLong` conf — no mutation of shared
    * session state, no behavior change for other nanos parquet reads.
    */
  def events: DataFrame =
    spark.read.schema(Tables.eventsSchema).parquet(s"$dir/events.parquet")
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)

  /** events.parquet physical schema with `ts` as raw nanosecond LONG. */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))
}
