package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Capped distinct-long accumulator: an open-addressing set that stops
  * STORING the moment a group's distinct count exceeds `maxSize` and
  * only carries a one-bit overflow flag from then on. The memory
  * contract is the point: per-group state is O(maxSize) regardless of
  * the group's true cardinality, so a degree-10⁷ hub key costs the same
  * 2·maxSize longs as a degree-3 key — where `collect_set` would
  * faithfully materialize all 10⁷ elements before any downstream filter
  * could discard the group.
  *
  * Occupancy is a parallel byte array (ids may legitimately be 0 or
  * negative, so no value doubles as an empty sentinel). Capacity is the
  * smallest power of two ≥ 2·(maxSize+1), fixed at construction — the
  * set can never grow past maxSize+1 live entries, so load stays ≤ 0.5
  * and linear probing stays short. */
final class BoundedSetBuffer(val maxSize: Int) {
  require(maxSize <= BoundedSetBuffer.MaxCap,
    s"BoundedSetBuffer maxSize must be <= ${BoundedSetBuffer.MaxCap}, got $maxSize")
  private val cap = Integer.highestOneBit(math.max(2 * (maxSize + 1), 16) * 2 - 1)
  private val mask = cap - 1
  private var keys = new Array[Long](cap)
  private var used = new Array[Byte](cap)
  var size = 0
  var overflow = false

  @inline private def mix(v: Long): Int = {
    var h = v * 0x9e3779b97f4a7c15L
    h ^= h >>> 32
    (h ^ (h >>> 16)).toInt
  }

  /** Adds `v`; on exceeding maxSize flips to overflow and frees storage. */
  def add(v: Long): Unit = {
    if (overflow) return
    var i = mix(v) & mask
    while (used(i) != 0) {
      if (keys(i) == v) return
      i = (i + 1) & mask
    }
    if (size == maxSize) {
      markOverflow()
      return
    }
    keys(i) = v; used(i) = 1; size += 1
  }

  def foreach(f: Long => Unit): Unit = {
    if (overflow) return
    var i = 0
    while (i < cap) { if (used(i) != 0) f(keys(i)); i += 1 }
  }

  /** Flips to overflow and frees storage (merge-side twin of add()'s
    * overflow branch, so a poisoned group never retains its O(maxSize)
    * arrays). */
  def markOverflow(): Unit = {
    overflow = true
    keys = null; used = null; size = 0
  }
}

object BoundedSetBuffer {
  /** Upper bound on maxSize: keeps the power-of-two capacity arithmetic
    * inside Int (2·(maxSize+1)·2 must not overflow) and caps per-group
    * allocation at ~2 GiB of longs well before it silently balloons. */
  val MaxCap: Int = 1 << 26
}

/** `bounded_distinct_set(v, maxSize)`: per group, the distinct values of
  * `v` as `array<bigint>` iff the group has at most `maxSize` distinct
  * values — NULL otherwise. Element order is unspecified (map-internal);
  * callers either sort or feed an order-insensitive consumer
  * ([[IdPairs]] sorts internally).
  *
  * This is the hub-guard fusion for "collect each key's neighbor set,
  * but only for keys below a degree cap" ([[graft.operators.Graph.adamicAdar]]):
  * the unfused form needs a distinct pass, a separate degree aggregate,
  * a filter, and a re-join before `collect_list` can safely run — three
  * extra exchanges whose only purpose is to know, before collecting,
  * that no group is a hub. Here the cap is enforced DURING collection
  * with O(maxSize) per-group state (see [[BoundedSetBuffer]]), partial
  * buffers combine map-side under ObjectHashAggregate, and an
  * overflowed partial poisons the merged group with one flag bit. At
  * 100 TB that difference is structural: the worst key costs maxSize
  * longs per map partition, never its true degree. */
case class BoundedDistinctSet(
    child: Expression,
    maxSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedSetBuffer] {

  require(maxSize >= 1, s"bounded_distinct_set requires maxSize >= 1, got $maxSize")
  require(maxSize <= BoundedSetBuffer.MaxCap,
    s"bounded_distinct_set requires maxSize <= ${BoundedSetBuffer.MaxCap}, got $maxSize")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bounded_distinct_set expects bigint, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "bounded_distinct_set"

  override def createAggregationBuffer(): BoundedSetBuffer =
    new BoundedSetBuffer(maxSize)

  override def update(buf: BoundedSetBuffer, input: InternalRow): BoundedSetBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BoundedSetBuffer, other: BoundedSetBuffer): BoundedSetBuffer = {
    if (other.overflow) {
      buf.markOverflow()
    } else if (!buf.overflow) {
      other.foreach(buf.add)
    }
    buf
  }

  override def eval(buf: BoundedSetBuffer): Any = {
    if (buf.overflow) return null
    val out = new Array[Long](buf.size)
    var k = 0
    buf.foreach { v => out(k) = v; k += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: BoundedSetBuffer): Array[Byte] = {
    if (buf.overflow) return Array[Byte](1)
    val bb = ByteBuffer.allocate(1 + 4 + buf.size * 8)
    bb.put(0: Byte)
    bb.putInt(buf.size)
    buf.foreach(v => bb.putLong(v))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedSetBuffer = {
    val buf = new BoundedSetBuffer(maxSize)
    if (bytes(0) == 1) { buf.overflow = true; return buf }
    val bb = ByteBuffer.wrap(bytes)
    bb.get()
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedDistinctSet =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedDistinctSet =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedDistinctSet =
    copy(child = newChildren(0))
}
