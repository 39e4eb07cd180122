package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native all-pairs Jensen–Shannon divergence over per-source token
  * distributions: given ONE row holding the token-ascending top-K
  * vocabulary as `array<struct<tok: string, __es: array<struct<src:
  * string, c: bigint>>>>` (each token carrying its per-source count
  * entries), emits one row `(source_a, source_b, n_tokens_support,
  * jsd)` per unordered source pair (source_a < source_b in binary
  * UTF8 order — the same ordering Spark's `<` on strings uses).
  *
  * Why a native Generator instead of the column-HOF pair fold (the
  * round-6 first cut): the nested-lambda formulation duplicates the
  * whole per-pair fold for every struct-field access, and the
  * resulting multi-thousand-node projection pays a fresh ~270 ms
  * codegen/compile on EVERY execution (fresh lambda-variable ids defeat
  * the codegen cache) — measured at sf0.1, where the actual evaluation
  * touches K·S² ≈ 2000 values on one row. Here the same arithmetic is
  * a plain Scala loop: extract the K tokens once, derive sorted
  * sources and their in-vocabulary totals, then fold each pair's terms
  * in token-ascending order.
  *
  * Determinism contract (DuckDB oracle parity — the values are
  * bit-identical to the column formulation this replaced):
  *  - `pa = c / tot` in double division, term
  *    `(pa>0 ? pa·ln(pa·2/(pa+pb)) : 0)·0.5 + (pb>0 ? …)·0.5`, with
  *    `Math.log` — the same JVM ln Spark's `log` evaluates;
  *  - the jsd sum folds token-ascending over the pair's SUPPORT set
  *    (a token absent from both sides adds an exact +0.0, which no
  *    finite double accumulator observes — so support-only == full-K);
  *  - rounding replicates Spark's `Round` on DoubleType bit-for-bit
  *    (`BigDecimal.valueOf(v).setScale(6, HALF_UP)`).
  *
  * Dirty data degrades, never lies or kills: a NULL vocabulary array
  * emits nothing; NULL tokens or entry lists are skipped; an entry
  * with a NULL source is excluded from pairing (Spark's `null < x` is
  * null, so the relational form never paired it either) though its
  * counts never pollute other sources' totals; a NULL count reads as
  * absent.
  *
  * CodegenFallback: evaluated once per vocabulary row (exactly one per
  * query) — generated Java would save one virtual call. */
case class SourceJsdPairs(child: Expression)
  extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(t, es)), _)
        if t.dataType == StringType &&
          (es.dataType match {
            case ArrayType(StructType(Array(s, c)), _) =>
              s.dataType == StringType && c.dataType == LongType
            case _ => false
          }) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      "source_jsd_pairs expects array<struct<string, array<struct<string, bigint>>>>, " +
        s"got ${other.catalogString}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("source_a", StringType, nullable = false),
    StructField("source_b", StringType, nullable = false),
    StructField("n_tokens_support", LongType, nullable = false),
    StructField("jsd", DoubleType, nullable = false)))

  override def prettyName: String = "source_jsd_pairs"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input)
    if (arr == null) return Nil
    val vocab = arr.asInstanceOf[ArrayData]
    val k = vocab.numElements()
    // per token: parallel arrays of (srcs, counts); srcs are UTF8String
    val tokSrcs = new Array[Array[UTF8String]](k)
    val tokCnts = new Array[Array[Long]](k)
    var i = 0
    while (i < k) {
      if (!vocab.isNullAt(i)) {
        val st = vocab.getStruct(i, 2)
        if (!st.isNullAt(1)) {
          val es = st.getArray(1)
          val m = es.numElements()
          val ss = new Array[UTF8String](m)
          val cs = new Array[Long](m)
          var kept = 0
          var j = 0
          while (j < m) {
            if (!es.isNullAt(j)) {
              val e = es.getStruct(j, 2)
              if (!e.isNullAt(0) && !e.isNullAt(1)) {
                // copy out of the (possibly reused) aggregate buffer
                ss(kept) = e.getUTF8String(0).clone()
                cs(kept) = e.getLong(1)
                kept += 1
              }
            }
            j += 1
          }
          tokSrcs(i) = if (kept == m) ss else ss.take(kept)
          tokCnts(i) = if (kept == m) cs else cs.take(kept)
        }
      }
      if (tokSrcs(i) == null) { tokSrcs(i) = Array.empty; tokCnts(i) = Array.empty }
      i += 1
    }
    // distinct sources, binary-UTF8 ascending (Spark's string ordering)
    val srcs = tokSrcs.iterator.flatten.toSet.toArray
      .sortWith((x, y) => x.compareTo(y) < 0)
    val nS = srcs.length
    if (nS < 2) return Nil
    // per-source totals over the in-vocabulary counts
    val tots = new Array[Long](nS)
    i = 0
    while (i < k) {
      val ss = tokSrcs(i); val cs = tokCnts(i)
      var j = 0
      while (j < ss.length) {
        val si = java.util.Arrays.binarySearch(
          srcs.asInstanceOf[Array[AnyRef]], ss(j))
        if (si >= 0) tots(si) += cs(j)
        j += 1
      }
      i += 1
    }
    // dense per-token count lookup: cnt(token, sourceIdx), -1 = absent
    val dense = Array.ofDim[Long](k, nS)
    i = 0
    while (i < k) {
      java.util.Arrays.fill(dense(i), -1L)
      val ss = tokSrcs(i); val cs = tokCnts(i)
      var j = 0
      while (j < ss.length) {
        val si = java.util.Arrays.binarySearch(
          srcs.asInstanceOf[Array[AnyRef]], ss(j))
        if (si >= 0) dense(i)(si) = cs(j)
        j += 1
      }
      i += 1
    }
    val out = Vector.newBuilder[InternalRow]
    var a = 0
    while (a < nS - 1) {
      var b = a + 1
      while (b < nS) {
        val ta = tots(a).toDouble
        val tb = tots(b).toDouble
        var jsd = 0.0
        var ns = 0L
        var t = 0
        while (t < k) {
          val ca = dense(t)(a)
          val cb = dense(t)(b)
          if (ca >= 0 || cb >= 0) {
            ns += 1
            val pa = if (ca >= 0) ca.toDouble / ta else 0.0
            val pb = if (cb >= 0) cb.toDouble / tb else 0.0
            val term =
              (if (pa > 0.0) pa * Math.log(pa * 2.0 / (pa + pb)) else 0.0) * 0.5 +
              (if (pb > 0.0) pb * Math.log(pb * 2.0 / (pa + pb)) else 0.0) * 0.5
            jsd += term
          }
          t += 1
        }
        val rounded = JBigDecimal.valueOf(jsd)
          .setScale(6, RoundingMode.HALF_UP).doubleValue()
        out += new GenericInternalRow(Array[Any](srcs(a), srcs(b), ns, rounded))
        b += 1
      }
      a += 1
    }
    out.result()
  }

  override protected def withNewChildInternal(newChild: Expression): SourceJsdPairs =
    copy(child = newChild)
}
