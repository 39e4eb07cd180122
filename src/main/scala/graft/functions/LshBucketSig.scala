package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expression: random-hyperplane LSH bucket of a numeric
  * array — bit `b` of the result is the sign of the projection onto the
  * md5-derived hyperplane `(table, b)`.
  *
  * Why a custom `Expression`: the composable formulation builds
  * `nBits × dim` column nodes per table (2048 for 8 bits × 64 dims × 4
  * tables). Although the md5 weights constant-fold, the optimized plan is
  * a ~100 KB expression tree whose generated code blows past Janino's
  * method limits — measured 13 s (and an OOM in a 1 GiB shell) for a
  * 2000-row input at sf0.1. This expression precomputes the weight matrix
  * once at plan construction ([[Hashing.hexLongJvm]], bit-identical to
  * the folded md5 constants) and emits one tight two-level loop.
  *
  * Weight `w(bit, d) = (hexLong("table:bit:d") mod 1000) / 500 − 1`, and
  * the projection accumulates left-to-right in double precision starting
  * from +0.0 — IEEE-identical to the explicit `e0·w0 + e1·w1 + …` chain
  * the DuckDB oracle uses (adding a +0.0 seed never changes a double sum,
  * and the sign test is unaffected by the −0.0 edge).
  *
  * Returns null for a null array; an array shorter than `dim` is also
  * null (an explicit guard — the composable weight-chain form would
  * instead throw INVALID_ARRAY_INDEX under Spark 4 ANSI `getItem`, so
  * prefer this expression on possibly-ragged data). Null ELEMENTS are
  * not supported (embedding columns are dense — same contract as
  * [[CosineSimilarity]]); a null slot reads as 0.0 here where the
  * composable form would null-poison the whole projection.
  */
case class LshBucketSig(child: Expression, table: Int, nBits: Int, dim: Int)
    extends UnaryExpression {

  require(nBits >= 1 && nBits <= 63, s"nBits must be in [1,63], got $nBits")
  // dim <= 0 would either throw NegativeArraySize from the weight table
  // (no hint which arg is wrong) or, at 0, silently hash every row into
  // bucket 0 — one degenerate LSH bucket for the whole corpus
  require(dim >= 1, s"dim must be >= 1, got $dim")

  // bit-major weight matrix, fixed at plan construction
  private lazy val weights: Array[Double] = Array.tabulate(nBits * dim) { i =>
    val bit = i / dim
    val d = i % dim
    (Hashing.hexLongJvm(s"$table:$bit:$d") % 1000L).toDouble / 500.0 - 1.0
  }

  private def isNumericArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isNumericArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lsh_bucket expects array<float>/array<double>, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = s"lsh_bucket_t$table"

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() < dim) return null
    val isF = elemIsFloat
    var bucket = 0L
    var b = 0
    while (b < nBits) {
      var acc = 0.0
      val base = b * dim
      var d = 0
      while (d < dim) {
        val xd = if (isF) x.getFloat(d).toDouble else x.getDouble(d)
        acc += xd * weights(base + d)
        d += 1
      }
      if (acc > 0) bucket |= (1L << b)
      b += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val w = ctx.addReferenceObj("lshWeights", weights, "double[]")
      val b = ctx.freshName("b"); val d = ctx.freshName("d")
      val acc = ctx.freshName("acc"); val bucket = ctx.freshName("bucket")
      val base = ctx.freshName("base")
      val getX =
        if (elemIsFloat) s"(double) $a.getFloat($d)" else s"$a.getDouble($d)"
      s"""
         |if ($a.numElements() < $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $bucket = 0L;
         |  for (int $b = 0; $b < $nBits; $b++) {
         |    double $acc = 0.0;
         |    final int $base = $b * $dim;
         |    for (int $d = 0; $d < $dim; $d++) {
         |      $acc += $getX * $w[$base + $d];
         |    }
         |    if ($acc > 0) $bucket |= (1L << $b);
         |  }
         |  ${ev.value} = $bucket;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshBucketSig =
    copy(child = newChild)
}
