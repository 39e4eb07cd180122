package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Native within-bucket near-dup pair generator: given one LSH bucket as
  * `array<struct<id: bigint, emb: array<float|double>>>`, emits every
  * unordered pair (id_a < id_b) whose cosine similarity — rounded to 6
  * decimals exactly like `round(col, 6)` — exceeds `threshold`, as rows
  * `(vec_a, vec_b, cos_sim)`.
  *
  * Why a custom Generator instead of
  * `explode(flatten(transform(...)))` + projection + filter (the round-2
  * shape): that pipeline materializes ALL O(bucket²) pairs as an
  * interpreted-HOF array — each element copying two 64-float embeddings —
  * explodes them into rows, and only then scores and filters. For a
  * 200-doc bucket that is ~20k struct copies (~2.5 MB) per bucket just to
  * throw almost all of it away. This generator extracts each embedding
  * once per bucket, precomputes norms, runs the O(b²) dot products as a
  * primitive fused loop, and emits ONLY surviving pairs (3 scalars each).
  * Survivors are rare by construction (the threshold is the point), so
  * the generated row volume drops from O(Σ bucket²) to O(matches).
  *
  * Determinism contract (DuckDB oracle parity): the cosine accumulates
  * left-to-right in double precision (identical to
  * [[CosineSimilarity]]), and rounding replicates Spark's `Round` on
  * DoubleType bit-for-bit (`BigDecimal.valueOf(v).setScale(6,
  * HALF_UP)`). Pairs are ordered by sorting the bucket by id here, so
  * callers don't need an upstream `array_sort`.
  *
  * CodegenFallback: a Generator's per-row work here IS the fused Scala
  * loop — wrapping it in generated Java would save only the eval call
  * itself. GenerateExec keeps the surrounding stages codegen'd.
  */
case class CosinePairsWithin(child: Expression, threshold: Double)
  extends UnaryExpression with Generator with CodegenFallback {

  private def embType: DataType = child.dataType match {
    case ArrayType(StructType(fields), _) if fields.length == 2 => fields(1).dataType
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(a, b)), _)
        if a.dataType == LongType &&
          (b.dataType == ArrayType(FloatType, false) ||
            b.dataType == ArrayType(FloatType, true) ||
            b.dataType == ArrayType(DoubleType, false) ||
            b.dataType == ArrayType(DoubleType, true)) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cosine_pairs_within expects array<struct<bigint, array<float|double>>>, " +
        s"got ${t.catalogString}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("vec_a", LongType, nullable = false),
    StructField("vec_b", LongType, nullable = false),
    StructField("cos_sim", DoubleType, nullable = false)))

  override def prettyName: String = "cosine_pairs_within"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input)
    if (arr == null) return Nil
    val data = arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = data.numElements()
    if (n < 2) return Nil
    val isFloat = embType.asInstanceOf[ArrayType].elementType == FloatType

    // extract once: ids, dense double embeddings, norms. Dirty data
    // degrades, never lies or kills (the CosineSimilarity contract): a
    // NULL struct/id/emb or a NULL *element* inside the embedding marks
    // the vector poisoned (embs slot stays null) — its pairs are
    // skipped, exactly as a NULL cosine filters them in both engines —
    // where reading the slots raw would have treated a NULL element as
    // 0.0 (a wrong finite cosine) or NPE'd on a NULL array.
    val ids = new Array[Long](n)
    val embs = new Array[Array[Double]](n)
    val norms = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (!data.isNullAt(i)) {
        val st = data.getStruct(i, 2)
        if (!st.isNullAt(0) && !st.isNullAt(1)) {
          ids(i) = st.getLong(0)
          val e = st.getArray(1)
          val d = e.numElements()
          val v = new Array[Double](d)
          var j = 0
          var nrm = 0.0
          var clean = true
          while (clean && j < d) {
            if (e.isNullAt(j)) clean = false
            else {
              val x = if (isFloat) e.getFloat(j).toDouble else e.getDouble(j)
              v(j) = x; nrm += x * x; j += 1
            }
          }
          if (clean) { embs(i) = v; norms(i) = math.sqrt(nrm) }
        }
      }
      i += 1
    }
    // id-sorted iteration order => emitted pairs always have vec_a < vec_b
    val order = Array.range(0, n).sortBy(i => ids(i))

    // lazy: survivors stream to GenerateExec one at a time, so peak
    // memory stays O(bucket) even if a permissive threshold lets the
    // whole O(bucket²) pair set through
    new Iterator[InternalRow] {
      private var a = 0
      private var b = 1
      private var pending: InternalRow = _
      advance()

      private def advance(): Unit = {
        pending = null
        while (pending == null && a < n - 1) {
          val ia = order(a); val ib = order(b)
          val ea = embs(ia); val eb = embs(ib)
          // length mismatch or zero norm => NULL cosine (the
          // CosineSimilarity contract, mirroring DuckDB's x/0.0 = NULL
          // division), and NULL > threshold filters the pair in both
          // engines: skip it. A NaN/Infinity element (bad upstream
          // embedding) passes the norm guard (NaN != 0.0 is true) and
          // must ALSO skip: the composable round(cosine) > t form
          // filters it (Spark's Round guards non-finite), and
          // BigDecimal.valueOf would throw NumberFormatException on it.
          if (ea != null && eb != null &&
            ea.length == eb.length && norms(ia) != 0.0 && norms(ib) != 0.0) {
            var dot = 0.0
            var j = 0
            while (j < ea.length) { dot += ea(j) * eb(j); j += 1 }
            val sim = dot / (norms(ia) * norms(ib))
            if (java.lang.Double.isFinite(sim)) {
              val rounded = JBigDecimal.valueOf(sim)
                .setScale(6, RoundingMode.HALF_UP).doubleValue()
              if (rounded > threshold)
                pending = new GenericInternalRow(Array[Any](ids(ia), ids(ib), rounded))
            }
          }
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

  override protected def withNewChildInternal(newChild: Expression): CosinePairsWithin =
    copy(child = newChild)
}
