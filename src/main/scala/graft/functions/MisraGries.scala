package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter summary (Misra & Gries 1982 "Finding
  * repeated elements"; merge rule per Agarwal et al. 2012 "Mergeable
  * summaries"): at most `k` (item, count) counters, with the invariant
  * that every item's stored count undercounts its true frequency by at
  * most n/(k+1) — so every item with true frequency > n/(k+1) is
  * guaranteed PRESENT in the summary. The summary itself is
  * partitioning-dependent (which sub-threshold items survive varies
  * with merge order); the guarantee — the candidate SUPERSET — is not,
  * which is why [[graft.operators.Sketches.heavyHitters]] rescores
  * candidates exactly and only the rescored output is declared.
  *
  * One shrink discipline covers both paths: when the map exceeds `k`
  * entries (an update miss on a full map, or a merge union), find the
  * (k+1)-th largest count `d`, subtract `d` from every counter, drop
  * the non-positive ones. Each shrink destroys ≥ (k+1)·d units of
  * stored count while charging every item's undercount only `d`, so
  * the total undercount stays ≤ n/(k+1) across any tree of merges —
  * the mergeable-summaries argument verbatim. Work is O(k log k) per
  * shrink and a shrink consumes ≥ k+1 input units, so the amortized
  * update cost is O(log k). */
final class MisraGriesBuffer(val k: Int) {
  var counts = new java.util.HashMap[String, java.lang.Long](k * 2)

  def add(v: String, c: Long): Unit = {
    val cur = counts.get(v)
    if (cur != null) counts.put(v, cur + c)
    else {
      counts.put(v, c)
      if (counts.size > k) shrink()
    }
  }

  /** Subtract the (k+1)-th largest count from everything, drop ≤ 0. */
  private def shrink(): Unit = {
    val arr = new Array[Long](counts.size)
    val it0 = counts.values().iterator()
    var i = 0
    while (it0.hasNext) { arr(i) = it0.next(); i += 1 }
    java.util.Arrays.sort(arr)
    val d = arr(arr.length - 1 - k) // (k+1)-th largest
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nc = e.getValue - d
      if (nc <= 0) it.remove() else e.setValue(nc)
    }
  }
}

/** `misra_gries_candidates(item, k)`: per group, the Misra–Gries
  * candidate items as `array<string>` — a guaranteed superset of every
  * item with frequency > n_group/(k+1), held in O(k) state per group
  * regardless of group cardinality and merged map-side under
  * ObjectHashAggregate. NOT directly declarable output (the
  * sub-threshold survivors are merge-order-dependent); feed it to the
  * exact rescore in [[graft.operators.Sketches.heavyHitters]]. */
case class MisraGriesCandidates(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesBuffer] {

  require(k >= 1 && k <= (1 << 22),
    s"misra_gries_candidates requires 1 <= k <= ${1 << 22}, got $k")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"misra_gries_candidates expects string, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "misra_gries_candidates"

  override def createAggregationBuffer(): MisraGriesBuffer =
    new MisraGriesBuffer(k)

  override def update(buf: MisraGriesBuffer, input: InternalRow): MisraGriesBuffer = {
    val v = child.eval(input)
    // UTF8String backs a reused buffer inside codegen'd producers —
    // copy to an owned JVM String before storing across rows
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: MisraGriesBuffer, other: MisraGriesBuffer): MisraGriesBuffer = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      buf.add(e.getKey, e.getValue)
    }
    buf
  }

  override def eval(buf: MisraGriesBuffer): Any = {
    val out = new Array[AnyRef](buf.counts.size)
    val it = buf.counts.keySet().iterator()
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: MisraGriesBuffer): Array[Byte] = {
    var bytes = 4
    val entries = new Array[(Array[Byte], Long)](buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes(StandardCharsets.UTF_8)
      entries(i) = (b, e.getValue)
      bytes += 4 + b.length + 8
      i += 1
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(entries.length)
    entries.foreach { case (b, c) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MisraGriesBuffer = {
    val buf = new MisraGriesBuffer(k)
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      val c = bb.getLong
      buf.counts.put(new String(b, StandardCharsets.UTF_8), c)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesCandidates =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesCandidates =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesCandidates =
    copy(child = newChildren(0))
}
