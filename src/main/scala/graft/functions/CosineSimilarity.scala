package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two numeric arrays in
  * one fused loop — dot product and both norms accumulated together, then
  * `dot / (sqrt(na) * sqrt(nb))`.
  *
  * Why a custom `Expression` (SURVEY.md §7.3 lists none as *required*;
  * this is the performance tier): the composable form
  * (`aggregate(zip_with(...))`, graft.operators.Similarity.cosine) walks
  * both arrays three times through interpreted higher-order lambdas and
  * allocates an intermediate product array. This expression generates a
  * single primitive loop inside whole-stage codegen — no allocation, no
  * virtual calls — and `eval` mirrors it exactly for interpreted paths.
  *
  * Accumulation order matches the sequential fold of the composable form
  * (left-to-right adds in double precision), so results are bit-identical
  * to it and to the DuckDB oracle's `list_reduce` formulation.
  *
  * Returns null if either array is null, lengths differ (the zip_with
  * analogue: a length mismatch nullifies the fold), EITHER VECTOR HAS
  * ZERO NORM — the degenerate-input contract that keeps engine parity:
  * the result would be 0/0, which DuckDB's division defines as NULL and
  * Spark's ANSI `/` refuses outright, so a silent NaN here would
  * diverge from every SQL formulation of the same cosine — or ANY
  * ELEMENT IS NULL: the composable zip_with/aggregate form (and the
  * DuckDB list_reduce oracle) null-poison the whole fold, and reading
  * the slot raw would silently treat it as 0.0 and return a wrong
  * finite number. Embedding columns are dense in practice, so the
  * per-element null branch never fires on real data; it exists so
  * dirty data degrades to NULL like every SQL formulation.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isNumericArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isNumericArray(left.dataType) && isNumericArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects array<float>/array<double>, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val xf = elemIsFloat(left); val yf = elemIsFloat(right)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      val getX = if (elemIsFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY = if (elemIsFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |    } else {
         |      final double $xi = $getX;
         |      final double $yi = $getY;
         |      $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    if ($na == 0.0 || $nb == 0.0) {
         |      ${ev.isNull} = true;
         |    } else {
         |      ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |    }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
