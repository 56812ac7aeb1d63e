package graft.sources

import java.util.{Map => JMap}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Minimal DataSource V2 table with REAL pushdown: the physical completion
  * of the reference's `TableScan { limit, table_name }`
  * (`dolomite/src/operator/table_scan.rs:13-19`) — where the reference's
  * optimizer rewrites `Limit(Scan)` into a limit-bearing scan *operator*,
  * this source lets Catalyst's `V2ScanRelationPushDown` push the limit,
  * range filters on `id`, and required columns into the scan itself
  * (observable as `PushedFilters`/`PushedLimit` in the scan description and
  * as fewer rows actually generated).
  *
  * Rows are a deterministic synthetic sequence: id BIGINT, val DOUBLE =
  * id * 0.5, tag STRING = "t" + id % 10. Usage:
  * `spark.read.format("graft.sources.SyntheticSource").option("rows", n).load()`.
  *
  * Scale design: the row range is split into fixed-size partitions; limit
  * pushdown caps the generated range, filter pushdown narrows it — the scan
  * does O(returned) work, not O(table).
  */
class SyntheticSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new SyntheticTable(properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("byTag", "false").toBoolean)
}

object SyntheticSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("val", DoubleType, nullable = false),
    StructField("tag", StringType, nullable = false)))

  /** Test-only observability: the last runtime filter each scan received
    * via [[SupportsRuntimeFiltering]] and the range it narrowed to —
    * runtime filtering happens DURING execution (AQE re-plans the batch
    * scan's partitions), so a plan-string assertion can't see the effect;
    * this hook records it. Not consulted by any production path.
    */
  @volatile var lastRuntimeFilter: Option[(Seq[Long], Long, Long)] = None
}

final class SyntheticTable(rows: Long, byTag: Boolean = false)
    extends Table with SupportsRead {
  override def name(): String = s"synthetic($rows)"
  override def schema(): StructType = SyntheticSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(rows, byTag)
}

final class SyntheticScanBuilder(rows: Long, byTag: Boolean = false)
  extends ScanBuilder
  with SupportsPushDownLimit
  with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns
  with SupportsPushDownAggregates {

  private var lo: Long = 0L
  private var hi: Long = rows // exclusive
  private var limit: Option[Long] = None
  private var pushed: mutable.ArrayBuffer[Filter] = mutable.ArrayBuffer.empty
  private var readSchema: StructType = SyntheticSource.schema
  private var aggFuncs: Option[Seq[String]] = None

  /** `Limit(n, Scan)` absorbed into the scan — the reference's
    * PushLimitToTableScanRule made physical.
    */
  override def pushLimit(n: Int): Boolean = {
    limit = Some(limit.fold(n.toLong)(math.min(_, n.toLong)))
    true // fully pushed: Spark may still keep a safety limit above
  }

  /** Range predicates on `id` narrow the generated interval exactly. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, rest) = filters.partition {
      case GreaterThan("id", _: Long) | GreaterThanOrEqual("id", _: Long) |
           LessThan("id", _: Long) | LessThanOrEqual("id", _: Long) => true
      case _ => false
    }
    supported.foreach {
      // v+1 must not wrap at Long.MaxValue: these filters are absorbed
      // (no residual in the plan), so an overflow would silently flip the
      // result set instead of erroring
      case GreaterThan("id", v: Long) =>
        lo = if (v == Long.MaxValue) hi else math.max(lo, v + 1)
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case LessThan("id", v: Long)           => hi = math.min(hi, v)
      case LessThanOrEqual("id", v: Long) =>
        if (v != Long.MaxValue) hi = math.min(hi, v + 1)
      case _ =>
    }
    pushed ++= supported
    rest // residual filters stay in the plan
  }

  override def pushedFilters(): Array[Filter] = pushed.toArray

  override def pruneColumns(requiredSchema: StructType): Unit = {
    readSchema = requiredSchema
  }

  /** Whole-aggregate pushdown (the DSv2 capability a metadata-bearing
    * source earns): ungrouped COUNT(*) / MIN(id) / MAX(id) are answered
    * from the pushed range in O(1) — the scan emits ONE row and generates
    * ZERO data rows. Complete pushdown: the framework trusts the row as
    * the final aggregate (Catalyst only re-wraps it), so this must only
    * accept shapes the range arithmetic answers EXACTLY — any filter is
    * already absorbed into [lo, hi) before aggregates are offered (pushdown
    * order), residual filters block the offer framework-side, and a pushed
    * limit bails out here (count-after-limit ≠ span).
    */
  private def canPushAgg(agg: Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && limit.isEmpty && !byTag &&
      agg.aggregateExpressions.forall {
        case _: CountStar => true
        case m: Min => m.column match {
          case f: NamedReference => f.fieldNames.sameElements(Array("id"))
          case _ => false
        }
        case m: Max => m.column match {
          case f: NamedReference => f.fieldNames.sameElements(Array("id"))
          case _ => false
        }
        case _ => false
      }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    canPushAgg(agg)

  override def pushAggregation(agg: Aggregation): Boolean = {
    if (!canPushAgg(agg)) return false
    aggFuncs = Some(agg.aggregateExpressions.toSeq.map {
      case _: CountStar => "count_star"
      case _: Min       => "min_id"
      case _: Max       => "max_id"
    })
    true
  }

  override def build(): Scan = aggFuncs match {
    case Some(funcs) => new SyntheticAggScan(lo, hi, funcs, pushed.toArray)
    case None =>
      new SyntheticScan(lo, hi, limit, readSchema, pushed.toArray, byTag)
  }
}

/** The aggregate-pushdown scan: one partition, one row, zero generated
  * data rows — count/min/max fall out of the [lo, hi) range arithmetic.
  */
final class SyntheticAggScan(lo: Long, hi: Long, funcs: Seq[String],
    pushed: Array[Filter]) extends Scan with Batch {

  override def readSchema(): StructType = StructType(funcs.map {
    case "count_star" => StructField("count_star", LongType, nullable = false)
    case n            => StructField(n, LongType, nullable = true)
  })

  override def toBatch: Batch = this
  override def description(): String =
    s"SyntheticAggScan range=[$lo,$hi) " +
      s"PushedAggregation: [${funcs.mkString(", ")}] " +
      s"PushedFilters: [${pushed.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] =
    Array(SyntheticPartition(0L, 1L))

  override def createReaderFactory(): PartitionReaderFactory = {
    val span = math.max(0L, hi - lo)
    val values: Array[Any] = funcs.map {
      case "count_star" => span: Any
      case "min_id"     => if (span > 0) (lo: Any) else null
      case "max_id"     => if (span > 0) ((hi - 1): Any) else null
    }.toArray
    new SingleRowReaderFactory(values)
  }
}

/** Emits exactly one pre-computed row. */
final class SingleRowReaderFactory(values: Array[Any])
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = InternalRow.fromSeq(values.toIndexedSeq)
      override def close(): Unit = ()
    }
}

/** `byTag = true` switches the layout to KEY-GROUPED partitions — one
  * partition per tag value, each generating the stride `id ≡ b (mod 10)`
  * — and reports it via [[SupportsReportPartitioning]] +
  * [[HasPartitionKey]]. With `spark.sql.sources.v2.bucketing.enabled`,
  * a join of two such scans on `tag` plans as a STORAGE-PARTITIONED
  * JOIN: zero exchanges, because the source's layout IS the join
  * distribution — the DSv2 analog of the bucketed-sink demo
  * (`data_sink_bucketed`), and at 100 TB the difference between
  * shuffling both sides and shuffling neither.
  */
final class SyntheticScan(lo: Long, hi: Long, limit: Option[Long],
    schema: StructType, pushed: Array[Filter], byTag: Boolean = false)
  extends Scan with Batch with SupportsReportPartitioning
  with SupportsRuntimeFiltering {

  // RUNTIME (post-planning) range, narrowed by dynamic partition pruning:
  // Spark collects the join's build-side keys at execution time and hands
  // them here as an In filter; BatchScanExec then re-plans input
  // partitions against the narrowed range. Pruning-only semantics — the
  // join above re-checks the keys, so collapsing the In-set to its
  // [min, max] envelope is safe (same contract as parquet row-group
  // pruning) and keeps partitions contiguous ranges. At 100 TB this is
  // the difference between scanning the fact table's full id range and
  // only the slice the dimension actually references.
  @volatile private var rtLo: Long = Long.MinValue
  @volatile private var rtHi: Long = Long.MaxValue // exclusive

  // only while `id` survives column pruning: PartitionPruning resolves
  // these against the scan OUTPUT and throws on a pruned column
  override def filterAttributes(): Array[NamedReference] =
    if (schema.fieldNames.contains("id"))
      Array(org.apache.spark.sql.connector.expressions.Expressions
        .column("id"))
    else Array.empty

  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case org.apache.spark.sql.sources.In("id", values) =>
      val ids = values.collect { case v: Long => v }
      if (ids.nonEmpty) {
        rtLo = math.max(rtLo, ids.min)
        rtHi = math.min(rtHi, ids.max + 1)
      } else { rtLo = 0L; rtHi = 0L } // empty build side: nothing to scan
      SyntheticSource.lastRuntimeFilter =
        Some((ids.toSeq.sorted, math.max(lo, rtLo),
          math.min(effectiveHi, rtHi)))
    case _ => // unsupported runtime filter shapes are advisory: ignore
  }

  private val effectiveHi: Long =
    limit.fold(hi)(n => math.min(hi, lo + n))

  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"SyntheticScan range=[$lo,$effectiveHi) " +
      s"PushedLimit: ${limit.getOrElse(-1L)} " +
      s"PushedFilters: [${pushed.mkString(", ")}] " +
      (if (byTag) "KeyGroupedBy: tag " else "") +
      s"ReadSchema: ${schema.catalogString}"

  private def keyGrouped: Boolean =
    byTag && schema.fieldNames.contains("tag")

  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    if (keyGrouped)
      new org.apache.spark.sql.connector.read.partitioning
        .KeyGroupedPartitioning(
          Array(org.apache.spark.sql.connector.expressions.Expressions
            .identity("tag")), 10)
    else
      new org.apache.spark.sql.connector.read.partitioning
        .UnknownPartitioning(planInputPartitions().length)

  override def planInputPartitions(): Array[InputPartition] = {
    // runtime-narrowed bounds: identical to the planning-time range until
    // a dynamic filter arrives, after which AQE re-plans through here
    val rLo = math.max(lo, rtLo)
    val rHi = math.min(effectiveHi, rtHi)
    if (keyGrouped) {
      (0 until 10).map { b =>
        TagPartition(b, rLo, rHi): InputPartition
      }.toArray
    } else {
      val span = math.max(0L, rHi - rLo)
      val partSize = 4096L
      val n = math.max(1L, (span + partSize - 1) / partSize)
      (0L until n).map { i =>
        SyntheticPartition(rLo + i * partSize,
          math.min(rHi, rLo + (i + 1) * partSize)): InputPartition
      }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticReaderFactory(schema)
}

final case class SyntheticPartition(start: Long, end: Long)
  extends InputPartition

/** One tag value's rows: the stride `id ≡ b (mod 10)` over [start, end).
  * `partitionKey` is what lets Spark group/align partitions by key for
  * the storage-partitioned join.
  */
final case class TagPartition(b: Int, start: Long, end: Long)
  extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    InternalRow(UTF8String.fromString("t" + b))
}

final class SyntheticReaderFactory(schema: StructType)
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    // resolve column dispatch once per reader, not per row
    val generators: Array[Long => Any] = schema.fields.map(_.name).map {
      case "id"  => (cur: Long) => cur
      case "val" => (cur: Long) => cur * 0.5
      case "tag" => (cur: Long) => UTF8String.fromString("t" + (cur % 10))
    }
    val (first, step, end) = p match {
      case SyntheticPartition(s, e) => (s, 1L, e)
      case TagPartition(b, s, e) =>
        // smallest id >= s with id % 10 == b
        val off = (b - s % 10 + 10) % 10
        (s + off, 10L, e)
    }
    new PartitionReader[InternalRow] {
      private var cur = first - step
      private val row = new Array[Any](generators.length)
      override def next(): Boolean = { cur += step; cur < end }
      override def get(): InternalRow = {
        var i = 0
        while (i < generators.length) { row(i) = generators(i)(cur); i += 1 }
        InternalRow.fromSeq(row.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
