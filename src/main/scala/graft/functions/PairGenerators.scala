package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native within-bucket pair generators — the lazy replacements for the
  * interpreted-HOF `bucketPairs` pattern
  * (`explode(flatten(transform(transform(slice(...)))))`), which
  * materializes the whole O(bucket²) pair set as ONE array value before
  * the explode. For a `maxBucket`-sized degenerate bucket that array is
  * ~50M structs held by a single task at once; these generators emit
  * pairs row-at-a-time from a primitive loop, so peak memory is O(bucket)
  * regardless of pair count, and the per-pair filter (Hamming radius)
  * runs before a row is ever created.
  *
  * Both sort the bucket by id internally (callers drop their upstream
  * `array_sort`), so emitted pairs always satisfy id_a < id_b.
  * CodegenFallback: the per-row work IS the fused loop; GenerateExec
  * keeps surrounding stages codegen'd.
  */

/** All unordered id pairs (a < b) from `array<bigint>` — the MinHash-band
  * candidate enumeration. */
case class IdPairs(child: Expression)
  extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"id_pairs expects array<bigint>, got ${t.catalogString}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("doc_a", LongType, nullable = false),
    StructField("doc_b", LongType, nullable = false)))

  override def prettyName: String = "id_pairs"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input)
    if (arr == null) return Nil
    val data = arr.asInstanceOf[ArrayData]
    // skip null elements: toLongArray would silently read each null
    // slot as id 0, fabricating phantom (0, x) candidate edges that
    // could merge unrelated docs downstream
    val ids = (0 until data.numElements())
      .filter(!data.isNullAt(_)).map(data.getLong).toArray.sorted
    val n = ids.length
    if (n < 2) return Nil
    new Iterator[InternalRow] {
      private var i = 0
      private var j = 1
      override def hasNext: Boolean = i < n - 1
      override def next(): InternalRow = {
        val r = new GenericInternalRow(Array[Any](ids(i), ids(j)))
        j += 1
        if (j >= n) { i += 1; j = i + 1 }
        r
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): IdPairs =
    copy(child = newChild)
}

/** [[IdPairs]] with the pair PACKED into one non-negative long,
  * `(a << 32) | b` — for pair streams that immediately hit a
  * pair-keyed exchange + aggregate (Adamic–Adar), where the residual
  * cost is shuffle volume: one 8-byte key instead of two halves the
  * key bytes per row and gives the aggregate a single-long group key.
  * Because a < b and both fit in 31 bits, the packed long sorts exactly
  * as the (a, b) lexicographic pair, so downstream `ORDER BY score
  * DESC, packed` reproduces the two-column total order and unpacking
  * (`shiftright`/`& 0xFFFFFFFF`) can wait until after the top-k.
  *
  * Ids MUST lie in [0, 2^31): anything else FAILS LOUDLY here — a
  * silent wraparound would alias unrelated pairs. Callers with wider
  * id spaces use the generic [[IdPairs]] path. */
case class IdPairsPacked(child: Expression)
  extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"id_pairs_packed expects array<bigint>, got ${t.catalogString}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("pair", LongType, nullable = false)))

  override def prettyName: String = "id_pairs_packed"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input)
    if (arr == null) return Nil
    val data = arr.asInstanceOf[ArrayData]
    // null slots skipped for the same phantom-(0,x)-edge reason as
    // IdPairs
    val ids = (0 until data.numElements())
      .filter(!data.isNullAt(_)).map(data.getLong).toArray.sorted
    val n = ids.length
    if (n < 2) return Nil
    if (ids(0) < 0L || ids(n - 1) >= (1L << 31))
      throw new IllegalArgumentException(
        s"id_pairs_packed requires ids in [0, 2^31); got " +
          s"[${ids(0)}, ${ids(n - 1)}] — use the unpacked id_pairs path")
    new Iterator[InternalRow] {
      private var i = 0
      private var j = 1
      override def hasNext: Boolean = i < n - 1
      override def next(): InternalRow = {
        val r = new GenericInternalRow(
          Array[Any]((ids(i) << 32) | ids(j)))
        j += 1
        if (j >= n) { i += 1; j = i + 1 }
        r
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): IdPairsPacked =
    copy(child = newChild)
}

/** Unordered pairs (doc_a < doc_b) from
  * `array<struct<doc: bigint, sh: bigint>>` whose signature Hamming
  * distance is ≤ `maxHamming`, emitted as (doc_a, doc_b, hamming) — the
  * SimHash-band candidate enumeration with the radius filter fused into
  * the loop, so far pairs never become rows at all. */
case class HammingPairsWithin(child: Expression, maxHamming: Int)
  extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(a, b)), _)
        if a.dataType == LongType && b.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hamming_pairs_within expects array<struct<bigint, bigint>>, got ${t.catalogString}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("doc_a", LongType, nullable = false),
    StructField("doc_b", LongType, nullable = false),
    StructField("hamming", IntegerType, nullable = false)))

  override def prettyName: String = "hamming_pairs_within"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input)
    if (arr == null) return Nil
    val data = arr.asInstanceOf[ArrayData]
    val n = data.numElements()
    if (n < 2) return Nil
    val docs = new Array[Long](n)
    val sigs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val st = data.getStruct(i, 2)
      docs(i) = st.getLong(0); sigs(i) = st.getLong(1)
      i += 1
    }
    val order = Array.range(0, n).sortBy(k => docs(k))
    // lazy: survivors stream out one at a time — a permissive radius
    // cannot re-materialize the O(bucket²) pair set this generator
    // exists to avoid
    new Iterator[InternalRow] {
      private var a = 0
      private var b = 1
      private var pending: InternalRow = _
      advance()

      private def advance(): Unit = {
        pending = null
        while (pending == null && a < n - 1) {
          val ia = order(a); val ib = order(b)
          val h = java.lang.Long.bitCount(sigs(ia) ^ sigs(ib))
          if (h <= maxHamming)
            pending = new GenericInternalRow(Array[Any](docs(ia), docs(ib), h))
          b += 1
          if (b >= n) { a += 1; b = a + 1 }
        }
      }

      override def hasNext: Boolean = pending != null
      override def next(): InternalRow = {
        val r = pending; advance(); r
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): HammingPairsWithin =
    copy(child = newChild)
}

/** Unordered pairs (doc_a < doc_b) from
  * `array<struct<doc: bigint, sig: array<bigint>>>` with the count of
  * AGREEING signature positions — the MinHash agreement estimator fused
  * into the bucket pair loop. Signatures ride through the banding
  * aggregation, so the estimate never joins back to the corpus: the
  * signature subplan runs exactly ONCE in the whole query (the
  * alternative — re-attaching signatures to the emitted pairs — plans
  * the signature aggregate once per join side and relies on runtime
  * exchange reuse to dedupe them). */
case class SigAgreePairs(child: Expression)
  extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(a, b)), _)
        if a.dataType == LongType && b.dataType == ArrayType(LongType, false) =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(StructType(Array(a, b)), _)
        if a.dataType == LongType && b.dataType == ArrayType(LongType, true) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sig_agree_pairs expects array<struct<bigint, array<bigint>>>, got ${t.catalogString}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("doc_a", LongType, nullable = false),
    StructField("doc_b", LongType, nullable = false),
    StructField("n_agree", IntegerType, nullable = false)))

  override def prettyName: String = "sig_agree_pairs"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input)
    if (arr == null) return Nil
    val data = arr.asInstanceOf[ArrayData]
    val n = data.numElements()
    if (n < 2) return Nil
    val docs = new Array[Long](n)
    val sigs = new Array[Array[Long]](n)
    var i = 0
    while (i < n) {
      val st = data.getStruct(i, 2)
      docs(i) = st.getLong(0)
      sigs(i) = st.getArray(1).toLongArray()
      i += 1
    }
    val order = Array.range(0, n).sortBy(k => docs(k))
    new Iterator[InternalRow] {
      private var a = 0
      private var b = 1
      override def hasNext: Boolean = a < n - 1
      override def next(): InternalRow = {
        val ia = order(a); val ib = order(b)
        val sa = sigs(ia); val sb = sigs(ib)
        var agree = 0
        var p = 0
        val m = math.min(sa.length, sb.length)
        while (p < m) { if (sa(p) == sb(p)) agree += 1; p += 1 }
        val r = new GenericInternalRow(Array[Any](docs(ia), docs(ib), agree))
        b += 1
        if (b >= n) { a += 1; b = a + 1 }
        r
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): SigAgreePairs =
    copy(child = newChild)
}
