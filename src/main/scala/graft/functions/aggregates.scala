package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Analysis-time input typing for the custom aggregates: every eval path
  * below reads the child through an unchecked cast (`getLong`, `getInt`,
  * `asInstanceOf[Long]`) — on a mistyped child (say ArrayType(IntegerType)
  * where longs are expected) `UnsafeArrayData.getLong` would silently read
  * garbage bytes instead of failing. `ExpectsInputTypes`/`AbstractDataType`
  * are private[sql] in Spark 4, so the check is spelled directly.
  */
private[functions] trait StrictInputType { self: TypedImperativeAggregate[_] =>
  def child: Expression
  /** The exact child type required (nullability on array elements ignored). */
  def requiredInputType: DataType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (requiredInputType, child.dataType) match {
      case (ArrayType(et, _), ArrayType(at, _)) => at == et
      case (t, a) => a == t
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ${requiredInputType.simpleString}, " +
        s"got ${child.dataType.simpleString}")
  }
}

/** Custom native aggregate: exact top-k values via a bounded min-heap —
  * the `TypedImperativeAggregate` path the engine uses for sketch-style
  * aggregation state (SURVEY.md §7.3: custom aggregates beat UDAFs beat
  * UDFs). State is O(k) per group; partial aggregation merges heaps, so the
  * shuffle carries at most k doubles per (partition, group) — the same
  * shape an HLL or quantile sketch would use at 100 TB.
  */
case class TopKDoubles(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[Double]]
  with StrictInputType {

  override def requiredInputType: DataType = DoubleType

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "topk_doubles"

  // min-heap: head is the smallest retained value (eviction candidate)
  private def minOrdering: Ordering[Double] = Ordering.Double.TotalOrdering.reverse

  override def createAggregationBuffer(): mutable.PriorityQueue[Double] =
    mutable.PriorityQueue.empty[Double](minOrdering)

  override def update(
      buf: mutable.PriorityQueue[Double], input: InternalRow)
      : mutable.PriorityQueue[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      // NaN is skipped outright: update/merge compare with primitive `>`
      // (NaN comparisons are all false) while the heap orders with
      // TotalOrdering (NaN sorts largest) — an admitted NaN would never be
      // evicted and would surface in the top-k
      if (!d.isNaN) {
        if (buf.size < k) buf.enqueue(d)
        else if (d > buf.head) { buf.dequeue(); buf.enqueue(d) }
      }
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[Double],
      other: mutable.PriorityQueue[Double]): mutable.PriorityQueue[Double] = {
    other.foreach { d =>
      if (buf.size < k) buf.enqueue(d)
      else if (d > buf.head) { buf.dequeue(); buf.enqueue(d) }
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[Double]): Any =
    new GenericArrayData(buf.toArray.sorted(Ordering.Double.TotalOrdering.reverse))

  override def serialize(buf: mutable.PriorityQueue[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue(bb.getDouble); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKDoubles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKDoubles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** KMV sketch order statistic: the k-th smallest DISTINCT long in the
  * group, or NULL when the group holds fewer than k distinct values.
  *
  * One bounded `TreeSet` of at most k longs per (partition, group): `update`
  * admits a value only when it is below the current k-th smallest (set
  * semantics dedupe for free), `merge` folds partial sets, `eval` reads the
  * set maximum. Replaces the KMV pipeline's `distinct()` shuffle + window
  * sort (which materialized and sorted EVERY distinct hash per group) with
  * one ordinary partial+final aggregate carrying ≤ k values per partial —
  * the O(k)-state sketch shape that survives a 100 TB scan. Reference
  * declares sketch-style stats but never computes them
  * (`dolomite/src/stat.rs:5-21`); this is the scale-correct realization.
  */
case class KMinKthLong(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]]
  with StrictInputType {

  override def requiredInputType: DataType = LongType

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "kmin_kth_long"

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  private def admit(buf: mutable.TreeSet[Long], x: Long): Unit = {
    if (buf.size < k) {
      buf += x
    } else if (x < buf.last) {
      // below the current k-th smallest: insert, then evict the (possibly
      // new) maximum iff the insert actually grew the set (x was fresh)
      if (buf.add(x)) buf -= buf.last
    }
  }

  override def update(
      buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) admit(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: mutable.TreeSet[Long],
      other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach(admit(buf, _))
    buf
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    if (buf.size < k) null else buf.last

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf += bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinKthLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinKthLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object HllNdv256 {
  /** Standard HLL alpha for m = 256. */
  val Alpha: Double = 0.7213 / (1.0 + 1.079 / 256.0)
  /** 2^57 as double (exact). */
  val Two57: Double = 144115188075855872.0
  /** Single pre-folded numerator α·m²·2^57: the estimate is then ONE
    * division. The oracle interpolates this exact double (shortest
    * round-trip repr) so both engines perform the identical IEEE op. */
  val EstNumerator: Double = Alpha * 65536.0 * Two57
  /** 2^64 as double (exact). */
  val Two64: Double = 1.8446744073709552E19
  private[functions] val Mask64: BigInt = (BigInt(1) << 64) - 1

  /** The harmonic sum converted to double with DUCKDB'S semantics: DuckDB
    * casts HUGEINT to DOUBLE as (double)upper·2^64 + (double)lower — a
    * TWO-step, double-rounded conversion — while `BigInt.toDouble` rounds
    * correctly once. The two CAN differ by 1 ulp once the sum crosses 2^64
    * (reachable by any group with ≲200 distinct values: ≥128 zero
    * registers push Σ 2^(57-M) past 2^64), when the low 64 bits land in a
    * double-rounding window; most sums above 2^64 still agree, so gate
    * data passing is no proof — AggregatesSpec pins a diverging
    * counterexample. The engine must mimic the oracle's conversion, not
    * the mathematically better one.
    */
  def sumToDoubleDuckdb(sum: BigInt): Double =
    (sum >> 64).toDouble * Two64 + (sum & Mask64).toDouble
}

/** HyperLogLog distinct sketch, m = 256 registers (p = 8), over the
  * xxh64-hashed input: bucket = top 8 hash bits, register = max over
  * ρ(remaining 56 bits) = leading-zero count + 1 (capped 57). State is 256
  * BYTES per (partition, group) with element-wise-max partial merge — the
  * mergeable-sketch shape at any scale, and `max` is idempotent so NO
  * distinct pre-shuffle is needed (duplicates cannot move a register).
  *
  * Unlike `approx_count_distinct` (engine-private HLL++ internals, only
  * checkable as a bounded-error contract), every part of this sketch is
  * deterministic public arithmetic: the DuckDB oracle replicates bucket
  * extraction, the ρ leading-zero cascade, per-bucket maxima, the exact
  * integer harmonic sum Σ 2^(57-M_j), and the raw-estimate division —
  * bit-for-bit. Output: (raw_est, zero_regs); the raw estimator carries
  * HLL's documented small-range bias, so readers below ~2.5m apply linear
  * counting m·ln(m/V) themselves — ln is NOT cross-engine deterministic,
  * which is exactly why the correction stays out of the oracle-checked
  * surface (AggregatesSpec applies it and pins accuracy vs exact NDV).
  */
case class HllNdv256(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with StrictInputType {

  override def requiredInputType: DataType = LongType

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("raw_est", DoubleType, nullable = false),
    StructField("zero_regs", IntegerType, nullable = false)))
  override def prettyName: String = "hll_ndv256"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](256)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val bucket = (h >>> 56).toInt
      val w = h << 8
      val rho = if (w == 0L) 57 else java.lang.Long.numberOfLeadingZeros(w) + 1
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < 256) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    var zeros = 0
    var sum = BigInt(0)
    var i = 0
    while (i < 256) {
      val m = buf(i).toInt
      if (m == 0) zeros += 1
      sum += BigInt(1) << (57 - m)
      i += 1
    }
    // NOT sum.toDouble: see [[HllNdv256.sumToDoubleDuckdb]] — the oracle's
    // HUGEINT cast is double-rounded above 2^64 and the engine must match
    val sumD = HllNdv256.sumToDoubleDuckdb(sum)
    val est = HllNdv256.EstNumerator / sumD
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](est, zeros))
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(newOffset: Int): HllNdv256 =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllNdv256 =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Element-wise sum of long-array columns: O(D) state per group with
  * partial merge, so a centroid build shuffles one D-length vector per
  * (partition, label) instead of exploding N×D (vector, dimension) rows
  * through the exchange — D× less shuffle volume at any scale. Arrays of
  * unequal length sum as if zero-padded; NULL elements count as zero.
  */
case class VecSumLongs(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with StrictInputType {

  override def requiredInputType: DataType = ArrayType(LongType)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "vec_sum_longs"

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  /** `buf` grown (copy) to hold at least `n` elements, zero-padded. */
  private def grownTo(buf: Array[Long], n: Int): Array[Long] =
    if (n <= buf.length) buf
    else {
      val grown = new Array[Long](n)
      System.arraycopy(buf, 0, grown, 0, buf.length)
      grown
    }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val out = grownTo(buf, n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) out(i) += arr.getLong(i)
      i += 1
    }
    out
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    val out = grownTo(buf, other.length)
    var i = 0
    while (i < other.length) { out(i) += other(i); i += 1 }
    out
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Count-min sketch counters: `depth`×`width` long counters over a
  * per-row array of `depth` bucket indices (the caller hashes the key once
  * per sketch row with independent seeds — codegen'd column expressions,
  * so the aggregate itself is hash-agnostic). `update` is `depth`
  * increments; `merge` is element-wise addition, so partials carry one
  * depth×width vector per (partition, group) — the mergeable
  * frequency-sketch shape (CMS estimates overcount, never undercount:
  * est(k) = min over rows of the k-bucket counter). Every counter is an
  * exact integer, so the DuckDB oracle replicates estimates through the
  * equivalent formulation est(p) = min_r count(rows colliding with p in
  * row r) without materializing the sketch. Completes the sketch family
  * next to KMV ([[KMinKthLong]]) and HLL ([[HllNdv256]]); the reference
  * declares sketch-style stats but never computes them
  * (`dolomite/src/stat.rs:5-21`).
  */
case class CmsCounters(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with StrictInputType {

  override def requiredInputType: DataType = ArrayType(IntegerType)

  require(depth > 0 && width > 0, "depth and width must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cms_counters"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    // a NULL ARRAY skips the row. NOTE this is the caller's NULL-key hook:
    // hashing a NULL key does NOT produce a NULL array (xxhash64(NULL)
    // returns the seed), so callers must gate explicitly —
    // when(key.isNotNull, array(...)) — to keep NULL keys out of the
    // sketch (the oracle's FILTER clauses drop them)
    if (v == null) return buf
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    require(arr.numElements() == depth,
      s"expected $depth bucket indices, got ${arr.numElements()}")
    var r = 0
    while (r < depth) {
      // fail loudly on a null element: ArrayData.getInt would read it as
      // 0 and silently inflate bucket 0
      require(!arr.isNullAt(r), s"null bucket index at sketch row $r")
      val b = arr.getInt(r)
      require(b >= 0 && b < width, s"bucket $b out of [0, $width)")
      buf(r * width + b) += 1L
      r += 1
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    // loud failure on mismatched sketch configs: deserialize sizes the
    // buffer from the byte blob, so a stale partial from a different
    // depth*width would otherwise be silently truncated or throw AIOOBE
    require(other.length == buf.length,
      s"CMS partial size ${other.length} != ${buf.length} (depth*width)")
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    require(bytes.length == 8 * depth * width,
      s"CMS blob ${bytes.length}B != ${8 * depth * width}B (8*depth*width)")
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsCounters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsCounters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Bloom filter over a pre-hashed 64-bit key column — the epoch-dedup
  * prefilter shape for 100 TB pipelines: the filter builds as an ordinary
  * partial+final aggregate (byte-array OR-merge, so the shuffle carries one
  * `numBits/8`-byte blob per partition), the single result row broadcasts,
  * and the probe side runs inside codegen ([[MightContainBloom]]). A
  * `false` probe is DEFINITELY absent — only the (tiny) maybe-present
  * candidate set needs the exact confirm join. Bit layout is owned by
  * [[Kernels.bloomSet]]/[[Kernels.bloomMightContain]] on both sides.
  */
case class BloomBits(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with StrictInputType {

  override def requiredInputType: DataType = LongType

  require(numBits > 0 && (numBits & (numBits - 1)) == 0,
    s"numBits must be a positive power of two, got $numBits")
  require(numBits % 8 == 0, s"numBits must be byte-aligned, got $numBits")
  require(numHashes > 0, "numHashes must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_bits"

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](numBits / 8)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    // NULL key hash skips the row (same caller contract as CmsCounters)
    if (v != null) Kernels.bloomSet(buf, v.asInstanceOf[Long], numHashes)
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    require(other.length == buf.length,
      s"bloom partial size ${other.length}B != ${buf.length}B (numBits/8)")
    var i = 0
    while (i < buf.length) { buf(i) = (buf(i) | other(i)).toByte; i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = buf.clone()

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = {
    require(bytes.length == numBits / 8,
      s"bloom blob ${bytes.length}B != ${numBits / 8}B (numBits/8)")
    bytes
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBits =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBits =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** EXACT distinct count of a bounded-domain long column via a fixed-width
  * bitmap — the dense-id production form of distinct counting (user ids,
  * enum codes, dictionary-encoded keys): the aggregation state is
  * `numBits/8` bytes regardless of row count, partials merge by bitwise
  * OR (fully associative/commutative — any partial aggregation tree gives
  * the same bits), and the VALUES themselves never shuffle. Compare
  * [[HllNdv256]]: same merge shape, but this one is exact because the
  * domain is enumerable. At 100 TB with sparse/unbounded ids the scale
  * path is a compressed (roaring-style) bitmap with the same OR-merge
  * algebra; this flat form keeps the buffer a single byte array and the
  * domain contract LOUD — an id outside [0, numBits) throws rather than
  * estimating or silently wrapping.
  */
case class BitmapDistinct(
    child: Expression,
    numBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with StrictInputType {

  override def requiredInputType: DataType = LongType

  require(numBits > 0 && numBits % 8 == 0,
    s"numBits must be positive and byte-aligned, got $numBits")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_distinct"

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](numBits / 8)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val id = v.asInstanceOf[Long]
      require(id >= 0 && id < numBits,
        s"bitmap_distinct id $id outside domain [0, $numBits) — widen " +
          "numBits or switch to a compressed bitmap for sparse ids")
      buf((id >>> 3).toInt) =
        (buf((id >>> 3).toInt) | (1 << (id & 7)).toByte).toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    require(other.length == buf.length,
      s"bitmap partial size ${other.length}B != ${buf.length}B")
    var i = 0
    while (i < buf.length) { buf(i) = (buf(i) | other(i)).toByte; i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    var n = 0L
    var i = 0
    while (i < buf.length) {
      n += java.lang.Integer.bitCount(buf(i) & 0xff)
      i += 1
    }
    n
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = {
    require(bytes.length == numBits / 8,
      s"bitmap blob ${bytes.length}B != ${numBits / 8}B (numBits/8)")
    bytes
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** The k smallest DISTINCT longs as a sorted array — the KMV sketch
  * CONTENTS, where [[KMinKthLong]] evals only the k-th value. Emitting the
  * set is what makes sketches composable ACROSS queries: two KMV arrays
  * support union/intersection estimation (Beyer et al., "On Synopses for
  * Distinct-Value Estimation Under Multiset Operations", SIGMOD 2007 —
  * public literature) with no second scan of either input. Same O(k)
  * TreeSet state and merge discipline as KMinKthLong.
  */
case class KMinSetLong(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]]
  with StrictInputType {

  override def requiredInputType: DataType = LongType

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmin_set_long"

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  private def admit(buf: mutable.TreeSet[Long], x: Long): Unit = {
    if (buf.size < k) {
      buf += x
    } else if (x < buf.last) {
      if (buf.add(x)) buf -= buf.last
    }
  }

  override def update(
      buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) admit(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: mutable.TreeSet[Long],
      other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach(admit(buf, _))
    buf
  }

  /** Ascending array; fewer than k elements when the input had fewer
    * distinct values (the sketch then IS the exact set).
    */
  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf += bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinSetLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinSetLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Misra–Gries heavy-hitter candidate summary over per-row token arrays
  * (Misra & Gries 1982; mergeable form per Agarwal et al., "Mergeable
  * Summaries", PODS 2012 — both public literature). State is k counters
  * per partial; `update` folds a row's tokens WITHOUT an explode (the
  * array is consumed inside the aggregate, so pass 1 of the two-pass
  * heavy-hitter plan is a zero-shuffle map-side scan), `merge` sums
  * counter maps then subtracts the (k+1)-th largest count and drops ≤0
  * (the mergeability trick that preserves the undercount bound), `eval`
  * emits the sorted candidate tokens.
  *
  * Guarantee: each counter undercounts its token by at most n/(k+1), so
  * every token with true frequency > n/(k+1) is present — the candidate
  * set is a SUPERSET of the φ-heavy hitters for any φ > 1/(k+1). The
  * exact-count verification pass makes the final answer exact; this
  * aggregate only bounds what that pass must count.
  */
case class MisraGriesTokens(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with StrictInputType {

  override def requiredInputType: DataType = ArrayType(StringType)

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "misra_gries_tokens"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  private def admit(buf: mutable.HashMap[String, Long], t: String): Unit = {
    buf.get(t) match {
      case Some(c) => buf.update(t, c + 1)
      case None if buf.size < k => buf.update(t, 1L)
      case None =>
        // decrement-all: pays k only after k distinct inserts — amortized
        // O(1) per token
        val dead = mutable.ArrayBuffer.empty[String]
        buf.mapValuesInPlace((_, c) => c - 1)
        buf.foreach { case (key, c) => if (c <= 0) dead += key }
        dead.foreach(buf.remove)
    }
  }

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        // copy out of the unsafe row — the UTF8String view is transient
        admit(buf, arr.getUTF8String(i).toString)
        i += 1
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (t, c) =>
      buf.update(t, buf.getOrElse(t, 0L) + c)
    }
    if (buf.size > k) {
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - k - 1) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[String]
      buf.mapValuesInPlace((_, c) => c - cut)
      buf.foreach { case (key, c) => if (c <= 0) dead += key }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val keys = buf.keys.toArray
    java.util.Arrays.sort(keys, Ordering[String])
    new GenericArrayData(
      keys.map(org.apache.spark.unsafe.types.UTF8String.fromString(_)))
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buf.toArray
    val bytes = entries.map { case (t, _) =>
      t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    }
    val bb = ByteBuffer.allocate(
      4 + bytes.map(_.length + 12).sum)
    bb.putInt(entries.length)
    entries.indices.foreach { i =>
      bb.putInt(bytes(i).length)
      bb.put(bytes(i))
      bb.putLong(entries(i)._2)
    }
    bb.array()
  }

  override def deserialize(
      bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      val t = new String(b, java.nio.charset.StandardCharsets.UTF_8)
      buf.update(t, bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTokens =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTokens =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object aggregates {
  /** Exact top-k of a double column, sorted descending. */
  def topk_doubles(c: Column, k: Int): Column =
    ColumnBridge.column(
      TopKDoubles(ColumnBridge.expression(c), k).toAggregateExpression())

  /** k-th smallest distinct long, NULL if fewer than k distinct values. */
  def kmin_kth_long(c: Column, k: Int): Column =
    ColumnBridge.column(
      KMinKthLong(ColumnBridge.expression(c), k).toAggregateExpression())

  /** Element-wise sum of long arrays (zero-padded to the longest). */
  def vec_sum_longs(c: Column): Column =
    ColumnBridge.column(
      VecSumLongs(ColumnBridge.expression(c)).toAggregateExpression())

  /** HLL-256 sketch of a long-hash column → struct(raw_est, zero_regs). */
  def hll_ndv256(c: Column): Column =
    ColumnBridge.column(
      HllNdv256(ColumnBridge.expression(c)).toAggregateExpression())

  /** Count-min counters over a per-row array of depth bucket indices. */
  def cms_counters(c: Column, depth: Int, width: Int): Column =
    ColumnBridge.column(
      CmsCounters(ColumnBridge.expression(c), depth, width)
        .toAggregateExpression())

  /** Bloom filter bits (BINARY) over a pre-hashed long key column. */
  def bloom_bits(c: Column, numBits: Int, numHashes: Int): Column =
    ColumnBridge.column(
      BloomBits(ColumnBridge.expression(c), numBits, numHashes)
        .toAggregateExpression())

  /** Misra–Gries heavy-hitter candidates over token-array rows (sorted). */
  def misra_gries_tokens(c: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesTokens(ColumnBridge.expression(c), k).toAggregateExpression())

  /** The k smallest distinct longs, ascending (KMV sketch contents). */
  def kmin_set_long(c: Column, k: Int): Column =
    ColumnBridge.column(
      KMinSetLong(ColumnBridge.expression(c), k).toAggregateExpression())

  /** Exact distinct count of longs in [0, numBits) via a flat bitmap. */
  def bitmap_distinct(c: Column, numBits: Int): Column =
    ColumnBridge.column(
      BitmapDistinct(ColumnBridge.expression(c), numBits)
        .toAggregateExpression())
}
