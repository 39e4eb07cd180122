package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native expression — the missing half
  * of EXACT dedup on multilingual corpora: "café" ships as both the
  * precomposed U+00E9 and the decomposed e + U+0301 (keyboards, OCR,
  * and HTML entity decoding disagree), the two byte sequences render
  * identically, and a byte-level fingerprint (q28's md5 key) treats
  * them as distinct documents. Canonical composition (Unicode TR #15,
  * public) makes the key content-addressed rather than
  * encoding-addressed — the same distinction the perceptual tier draws
  * for images/audio, here exact by standard.
  *
  * Spark has no built-in NFC (DuckDB ships `nfc_normalize`, which is
  * the oracle's side); this wraps `java.text.Normalizer` — both
  * implement the same Unicode standard, so outputs are bit-identical
  * on every input. Codegen'd via a static call (the [[Md5Long]]
  * pattern), with a pure-ASCII fast path: `Normalizer.isNormalized` is
  * O(n) with no allocation, and real corpora are overwhelmingly
  * already-NFC, so the hot path allocates nothing.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects a string, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.normalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
