package graft.sources

import java.util.{Map => JMap}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
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
    new SyntheticTable(properties.getOrDefault("rows", "1000").toLong)
}

object SyntheticSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("val", DoubleType, nullable = false),
    StructField("tag", StringType, nullable = false)))
}

final class SyntheticTable(rows: Long) extends Table with SupportsRead {
  override def name(): String = s"synthetic($rows)"
  override def schema(): StructType = SyntheticSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(rows)
}

final class SyntheticScanBuilder(rows: Long)
  extends ScanBuilder
  with SupportsPushDownLimit
  with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns {

  private var lo: Long = 0L
  private var hi: Long = rows // exclusive
  private var limit: Option[Long] = None
  private var pushed: mutable.ArrayBuffer[Filter] = mutable.ArrayBuffer.empty
  private var readSchema: StructType = SyntheticSource.schema

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

  override def build(): Scan =
    new SyntheticScan(lo, hi, limit, readSchema, pushed.toArray)
}

final class SyntheticScan(lo: Long, hi: Long, limit: Option[Long],
    schema: StructType, pushed: Array[Filter]) extends Scan with Batch {

  private val effectiveHi: Long =
    limit.fold(hi)(n => math.min(hi, lo + n))

  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"SyntheticScan range=[$lo,$effectiveHi) " +
      s"PushedLimit: ${limit.getOrElse(-1L)} " +
      s"PushedFilters: [${pushed.mkString(", ")}] " +
      s"ReadSchema: ${schema.catalogString}"

  override def planInputPartitions(): Array[InputPartition] = {
    val span = math.max(0L, effectiveHi - lo)
    val partSize = 4096L
    val n = math.max(1L, (span + partSize - 1) / partSize)
    (0L until n).map { i =>
      SyntheticPartition(lo + i * partSize,
        math.min(effectiveHi, lo + (i + 1) * partSize)): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticReaderFactory(schema)
}

final case class SyntheticPartition(start: Long, end: Long)
  extends InputPartition

final class SyntheticReaderFactory(schema: StructType)
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[SyntheticPartition]
    // resolve column dispatch once per reader, not per row
    val generators: Array[Long => Any] = schema.fields.map(_.name).map {
      case "id"  => (cur: Long) => cur
      case "val" => (cur: Long) => cur * 0.5
      case "tag" => (cur: Long) => UTF8String.fromString("t" + (cur % 10))
    }
    new PartitionReader[InternalRow] {
      private var cur = part.start - 1
      private val row = new Array[Any](generators.length)
      override def next(): Boolean = { cur += 1; cur < part.end }
      override def get(): InternalRow = {
        var i = 0
        while (i < generators.length) { row(i) = generators(i)(cur); i += 1 }
        InternalRow.fromSeq(row.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
