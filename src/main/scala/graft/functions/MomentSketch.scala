package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Exact fixed-point moment accumulator: row count, d first moments and
  * d(d+1)/2 upper-triangle second moments, each quantized per row as
  * `floor(x·scale + 0.5)` (resp. `floor(x·y·scale + 0.5)`) and summed
  * in longs — the bit-reproducible, fold-order-free contract the DuckDB
  * covariance oracle mirrors. Layout: `s(0..d-1)` first moments, then
  * pairs (i ≤ j) row-major at `d + i·d − i(i−1)/2 + (j−i)`. */
final class MomentBuffer(val dim: Int) {
  val s = new Array[Long](dim * (dim + 3) / 2)
  var n = 0L
}

/** The one-pass covariance-input aggregate behind [[graft.operators.Pca]]:
  * a d-dim embedding row contributes its d(d+3)/2 moment cells in a
  * tight primitive loop (~µs/row) instead of a generated-and-exploded
  * struct array (~40 ms/row interpreted at d = 64 — measured; the HOF
  * lambda path allocates a struct per cell). Partial aggregation under
  * ObjectHashAggregate keeps the shuffle at one O(d²) buffer per map
  * partition regardless of corpus size.
  *
  * Output: `struct(n bigint, cells array<struct<i int, j int, s bigint>>)`
  * with first moments tagged j = −1 (the [[graft.operators.Pca.FirstMomentTag]]
  * convention), ready to explode into the (i, j, n_vecs, s) moment
  * table. Rows that are null or not exactly `dim` long are skipped
  * (callers also filter, keeping the oracle's WHERE in lockstep). */
case class MomentSketch(
    emb: Expression,
    dim: Int,
    scale: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MomentBuffer] {

  require(dim >= 1 && dim <= 4096, s"moment sketch dim out of range: $dim")

  override def children: Seq[Expression] = Seq(emb)

  override def checkInputDataTypes(): TypeCheckResult = emb.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"moment_sketch expects array<double>, got ${t.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("cells", ArrayType(StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("j", IntegerType, nullable = false),
      StructField("s", LongType, nullable = false))), containsNull = false),
      nullable = false)))

  override def nullable: Boolean = false
  override def prettyName: String = "moment_sketch"

  override def createAggregationBuffer(): MomentBuffer = new MomentBuffer(dim)

  override def update(buf: MomentBuffer, input: InternalRow): MomentBuffer = {
    val v = emb.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() == dim) {
        val x = arr.toDoubleArray()
        buf.n += 1L
        var i = 0
        var p = dim
        while (i < dim) {
          val xi = x(i)
          buf.s(i) += math.floor(xi * scale + 0.5).toLong
          var j = i
          while (j < dim) {
            buf.s(p) += math.floor((xi * x(j)) * scale + 0.5).toLong
            p += 1
            j += 1
          }
          i += 1
        }
      }
    }
    buf
  }

  override def merge(buf: MomentBuffer, other: MomentBuffer): MomentBuffer = {
    buf.n += other.n
    var i = 0
    while (i < buf.s.length) { buf.s(i) += other.s(i); i += 1 }
    buf
  }

  override def eval(buf: MomentBuffer): Any = {
    val cells = new Array[Any](buf.s.length)
    var i = 0
    while (i < dim) {
      cells(i) = new GenericInternalRow(Array[Any](i, -1, buf.s(i)))
      i += 1
    }
    i = 0
    var p = dim
    while (i < dim) {
      var j = i
      while (j < dim) {
        cells(p) = new GenericInternalRow(Array[Any](i, j, buf.s(p)))
        p += 1
        j += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](buf.n, new GenericArrayData(cells)))
  }

  override def serialize(buf: MomentBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.s.length * 8)
    bb.putLong(buf.n)
    var i = 0
    while (i < buf.s.length) { bb.putLong(buf.s(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MomentBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new MomentBuffer(dim)
    buf.n = bb.getLong
    var i = 0
    while (i < buf.s.length) { buf.s(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MomentSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MomentSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MomentSketch =
    copy(emb = newChildren(0))
}
